"""Import PyTorch/diffusers Wan weights into the native NNX model.

The reference consumes diffusers' WanTransformer3DModel checkpoints directly;
we map the same state_dict onto our stacked-block layout:

  * torch Linear (out, in) -> flax kernel (in, out)
  * torch Conv3d (out, in, kt, kh, kw) -> flax NDHWC kernel (kt, kh, kw, in, out)
  * per-block keys ``blocks.{i}.*`` stack along axis 0 of our scanned params
  * router checkpoints (the reference's router.pt, keys
    ``blocks.{i}.router.linear.{weight,bias}``) import the same way

Accepts a single .safetensors/.pt file, or a directory of diffusers
``diffusion_pytorch_model*.safetensors`` shards.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import jax.numpy as jnp
import numpy as np
from flax import nnx


def load_state_dict(path) -> Dict[str, np.ndarray]:
    path = Path(path)
    files = []
    if path.is_dir():
        files = sorted(path.glob("*.safetensors")) or sorted(path.glob("*.bin"))
        if not files:
            raise FileNotFoundError(f"no weight files under {path}")
    else:
        files = [path]
    out: Dict[str, np.ndarray] = {}
    for f in files:
        if f.suffix == ".safetensors":
            from safetensors.numpy import load_file

            out.update(load_file(str(f)))
        else:
            import torch

            sd = torch.load(f, map_location="cpu", weights_only=True)
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
            out.update({k: v.float().numpy() for k, v in sd.items()})
    return out


def _f32(x) -> np.ndarray:
    # ml_dtypes (bundled with jax) teaches numpy bf16, so astype just works
    return np.asarray(x).astype(np.float32)


def _linear(sd, prefix):
    return {
        "kernel": _f32(sd[f"{prefix}.weight"]).T,
        "bias": _f32(sd[f"{prefix}.bias"]),
    }


def _stack(blocks):
    """list of dicts (same structure) -> dict of stacked arrays."""
    out = {}
    for k in blocks[0]:
        if isinstance(blocks[0][k], dict):
            out[k] = _stack([b[k] for b in blocks])
        else:
            out[k] = np.stack([b[k] for b in blocks])
    return out


def _perm_half(d: dict, head_dim: int) -> dict:
    """Permute a q/k projection's output channels (kernel cols + bias) or a
    qk-norm's gains from the interleaved-pair to the contiguous-half RoPE
    layout (ops/rope.py) — the models apply ``apply_rope_half`` internally,
    which is bit-identical to interleaved RoPE under this permutation."""
    from ..ops.rope import permute_qk_to_half

    return {k: permute_qk_to_half(v, head_dim, axis=-1) for k, v in d.items()}


def wan_state_dict_to_tree(
    sd: Dict[str, np.ndarray], num_layers: int, head_dim: int = 128
) -> dict:
    """diffusers WanTransformer3DModel state_dict -> pure dict matching our
    WanModel parameter tree (missing router keys are simply absent).

    ``head_dim`` drives the self-attention q/k half-RoPE permutation."""
    tree: dict = {}

    conv_w = _f32(sd["patch_embedding.weight"])  # (dim, in, kt, kh, kw)
    tree["patch_embedding"] = {
        "kernel": np.transpose(conv_w, (2, 3, 4, 1, 0)),
        "bias": _f32(sd["patch_embedding.bias"]),
    }
    ce = "condition_embedder"
    tree[ce] = {
        "time_embedder": {
            "linear_1": _linear(sd, f"{ce}.time_embedder.linear_1"),
            "linear_2": _linear(sd, f"{ce}.time_embedder.linear_2"),
        },
        "time_proj": _linear(sd, f"{ce}.time_proj"),
        "text_embedder": {
            "linear_1": _linear(sd, f"{ce}.text_embedder.linear_1"),
            "linear_2": _linear(sd, f"{ce}.text_embedder.linear_2"),
        },
    }
    if f"{ce}.image_embedder.norm1.weight" in sd:  # I2V variants
        tree[ce]["image_embedder"] = {
            "norm1": {
                "scale": _f32(sd[f"{ce}.image_embedder.norm1.weight"]),
                "bias": _f32(sd[f"{ce}.image_embedder.norm1.bias"]),
            },
            "proj_in": _linear(sd, f"{ce}.image_embedder.ff.net.0.proj"),
            "proj_out": _linear(sd, f"{ce}.image_embedder.ff.net.2"),
            "norm2": {
                "scale": _f32(sd[f"{ce}.image_embedder.norm2.weight"]),
                "bias": _f32(sd[f"{ce}.image_embedder.norm2.bias"]),
            },
        }

    def attn(prefix, has_added_kv, rope_half=False):
        # rope_half: self-attention q/k (and their norm gains) move to the
        # contiguous-half RoPE column layout; cross-attention stays as-is
        # (no RoPE — q and k just need to agree, which untouched does)
        perm = (lambda d: _perm_half(d, head_dim)) if rope_half else (lambda d: d)
        d = {
            "to_q": perm(_linear(sd, f"{prefix}.to_q")),
            "to_k": perm(_linear(sd, f"{prefix}.to_k")),
            "to_v": _linear(sd, f"{prefix}.to_v"),
            "to_out": _linear(sd, f"{prefix}.to_out.0"),
        }
        if f"{prefix}.norm_q.weight" in sd:
            d["norm_q"] = perm({"weight": _f32(sd[f"{prefix}.norm_q.weight"])})
            d["norm_k"] = perm({"weight": _f32(sd[f"{prefix}.norm_k.weight"])})
        if has_added_kv and f"{prefix}.add_k_proj.weight" in sd:
            d["add_k_proj"] = _linear(sd, f"{prefix}.add_k_proj")
            d["add_v_proj"] = _linear(sd, f"{prefix}.add_v_proj")
            d["norm_added_k"] = {"weight": _f32(sd[f"{prefix}.norm_added_k.weight"])}
        return d

    blocks = []
    for i in range(num_layers):
        p = f"blocks.{i}"
        blk = {
            "attn1": attn(f"{p}.attn1", has_added_kv=False, rope_half=True),
            "attn2": attn(f"{p}.attn2", has_added_kv=True),
            "ffn": {
                "proj_in": _linear(sd, f"{p}.ffn.net.0.proj"),
                "proj_out": _linear(sd, f"{p}.ffn.net.2"),
            },
            "scale_shift_table": _f32(sd[f"{p}.scale_shift_table"]),
        }
        if f"{p}.norm2.weight" in sd:
            blk["norm2"] = {
                "scale": _f32(sd[f"{p}.norm2.weight"]),
                "bias": _f32(sd[f"{p}.norm2.bias"]),
            }
        if f"{p}.router.linear.weight" in sd:
            blk["router"] = {"linear": _linear(sd, f"{p}.router.linear")}
        blocks.append(blk)
    tree["blocks"] = _stack(blocks)

    tree["proj_out"] = _linear(sd, "proj_out")
    tree["scale_shift_table"] = _f32(sd["scale_shift_table"])
    return tree


def _apply_tree(state: nnx.State, tree: dict, path=""):
    """Copy arrays from `tree` into matching State entries (dtype-cast)."""
    applied, missing = [], []

    def rec(st, tr, p):
        for k, v in tr.items():
            kk = k if k in st else None
            if kk is None and isinstance(k, str) and k.isdigit() and int(k) in st:
                kk = int(k)  # nnx.List children are int-keyed
            if kk is None:
                missing.append(f"{p}{k}")
                continue
            if isinstance(v, dict):
                rec(st[kk], v, f"{p}{k}.")
            else:
                cur = st[kk]
                arr = jnp.asarray(v)
                target = cur[...] if hasattr(cur, "set_value") else cur
                if target.shape != arr.shape:
                    raise ValueError(
                        f"shape mismatch at {p}{k}: model {target.shape} vs import {arr.shape}"
                    )
                if hasattr(cur, "set_value"):
                    cur.set_value(arr.astype(target.dtype))
                else:
                    st[kk] = arr.astype(target.dtype)
                applied.append(f"{p}{k}")

    rec(state, tree, path)
    return applied, missing


def load_wan_torch_weights(model, path, strict_shapes: bool = True):
    """Import diffusers Wan weights (and router keys if present) into model."""
    cfg = model.cfg
    sd = load_state_dict(path)
    tree = wan_state_dict_to_tree(sd, cfg.num_layers, cfg.head_dim)
    graphdef, state = nnx.split(model)
    applied, missing = _apply_tree(state, tree)
    nnx.update(model, state)
    return applied, missing


def hunyuan_state_dict_to_tree(sd: Dict[str, np.ndarray], dual_layers: int,
                               single_layers: int, refiner_layers: int,
                               head_dim: int = 128) -> dict:
    """diffusers HunyuanVideoTransformer3DModel state_dict -> our tree.

    ``head_dim`` drives the joint-attention q/k half-RoPE permutation (both
    the video projections and the no-RoPE text projections, which must share
    the video side's channel relabeling for the joint q·k dots); the token
    refiner's attention has no RoPE and stays unpermuted."""
    tree: dict = {}
    conv_w = _f32(sd["x_embedder.proj.weight"])  # (dim, in, kt, kh, kw)
    tree["x_embedder"] = {
        "kernel": np.transpose(conv_w, (2, 3, 4, 1, 0)),
        "bias": _f32(sd["x_embedder.proj.bias"]),
    }
    tte = "time_text_embed"
    tree["time_text_embed"] = {
        "timestep_embedder": {
            "linear_1": _linear(sd, f"{tte}.timestep_embedder.linear_1"),
            "linear_2": _linear(sd, f"{tte}.timestep_embedder.linear_2"),
        },
        "text_embedder_1": _linear(sd, f"{tte}.text_embedder.linear_1"),
        "text_embedder_2": _linear(sd, f"{tte}.text_embedder.linear_2"),
    }
    if f"{tte}.guidance_embedder.linear_1.weight" in sd:
        tree["time_text_embed"]["guidance_embedder"] = {
            "linear_1": _linear(sd, f"{tte}.guidance_embedder.linear_1"),
            "linear_2": _linear(sd, f"{tte}.guidance_embedder.linear_2"),
        }

    ce = "context_embedder"
    refiner_blocks = []
    for i in range(refiner_layers):
        p = f"{ce}.token_refiner.refiner_blocks.{i}"
        refiner_blocks.append({
            "norm1": {"scale": _f32(sd[f"{p}.norm1.weight"]), "bias": _f32(sd[f"{p}.norm1.bias"])},
            "to_q": _linear(sd, f"{p}.attn.to_q"),
            "to_k": _linear(sd, f"{p}.attn.to_k"),
            "to_v": _linear(sd, f"{p}.attn.to_v"),
            "to_out": _linear(sd, f"{p}.attn.to_out.0"),
            "norm2": {"scale": _f32(sd[f"{p}.norm2.weight"]), "bias": _f32(sd[f"{p}.norm2.bias"])},
            "ff": {
                "proj_in": _linear(sd, f"{p}.ff.net.0.proj"),
                "proj_out": _linear(sd, f"{p}.ff.net.2"),
            },
            "gates": {"linear": _linear(sd, f"{p}.norm_out.linear")},
        })
    tree["context_embedder"] = {
        "proj_in": _linear(sd, f"{ce}.proj_in"),
        "time_embedder": {
            "linear_1": _linear(sd, f"{ce}.time_text_embed.timestep_embedder.linear_1"),
            "linear_2": _linear(sd, f"{ce}.time_text_embed.timestep_embedder.linear_2"),
        },
        "text_pool_embedder": _linear(sd, f"{ce}.time_text_embed.text_embedder.linear_1"),
        "text_pool_out": _linear(sd, f"{ce}.time_text_embed.text_embedder.linear_2"),
        "blocks": {str(i): b for i, b in enumerate(refiner_blocks)},
    }

    def rms(prefix):
        return {"weight": _f32(sd[f"{prefix}.weight"])}

    def ph(d):
        return _perm_half(d, head_dim)

    duals = []
    for i in range(dual_layers):
        p = f"transformer_blocks.{i}"
        duals.append({
            "norm1_mod": {"linear": _linear(sd, f"{p}.norm1.linear")},
            "norm1_context_mod": {"linear": _linear(sd, f"{p}.norm1_context.linear")},
            "attn": {
                "to_q": ph(_linear(sd, f"{p}.attn.to_q")),
                "to_k": ph(_linear(sd, f"{p}.attn.to_k")),
                "to_v": _linear(sd, f"{p}.attn.to_v"),
                "add_q_proj": ph(_linear(sd, f"{p}.attn.add_q_proj")),
                "add_k_proj": ph(_linear(sd, f"{p}.attn.add_k_proj")),
                "add_v_proj": _linear(sd, f"{p}.attn.add_v_proj"),
                "norm_q": ph(rms(f"{p}.attn.norm_q")),
                "norm_k": ph(rms(f"{p}.attn.norm_k")),
                "norm_added_q": ph(rms(f"{p}.attn.norm_added_q")),
                "norm_added_k": ph(rms(f"{p}.attn.norm_added_k")),
                "to_out": _linear(sd, f"{p}.attn.to_out.0"),
                "to_add_out": _linear(sd, f"{p}.attn.to_add_out"),
            },
            "ff": {
                "proj_in": _linear(sd, f"{p}.ff.net.0.proj"),
                "proj_out": _linear(sd, f"{p}.ff.net.2"),
            },
            "ff_context": {
                "proj_in": _linear(sd, f"{p}.ff_context.net.0.proj"),
                "proj_out": _linear(sd, f"{p}.ff_context.net.2"),
            },
        })
        if f"{p}.router.linear.weight" in sd:
            duals[-1]["router"] = {"linear": _linear(sd, f"{p}.router.linear")}
    tree["dual_blocks"] = _stack(duals)

    singles = []
    for i in range(single_layers):
        p = f"single_transformer_blocks.{i}"
        singles.append({
            "norm_mod": {"linear": _linear(sd, f"{p}.norm.linear")},
            "attn": {
                "to_q": ph(_linear(sd, f"{p}.attn.to_q")),
                "to_k": ph(_linear(sd, f"{p}.attn.to_k")),
                "to_v": _linear(sd, f"{p}.attn.to_v"),
                "norm_q": ph(rms(f"{p}.attn.norm_q")),
                "norm_k": ph(rms(f"{p}.attn.norm_k")),
            },
            "proj_mlp": _linear(sd, f"{p}.proj_mlp"),
            "proj_out": _linear(sd, f"{p}.proj_out"),
        })
        if f"{p}.router.linear.weight" in sd:
            singles[-1]["router"] = {"linear": _linear(sd, f"{p}.router.linear")}
    tree["single_blocks"] = _stack(singles)

    tree["norm_out_mod"] = {"linear": _linear(sd, "norm_out.linear")}
    tree["proj_out"] = _linear(sd, "proj_out")
    return tree


def hunyuan_expected_keys(dual_layers: int, single_layers: int,
                          refiner_layers: int, guidance: bool = True,
                          routers: bool = False) -> set:
    """The exact diffusers HunyuanVideoTransformer3DModel state-dict key set
    this importer consumes.

    Pinned against the sharded-checkpoint *index* format
    (``diffusion_pytorch_model.safetensors.index.json`` -> ``weight_map``
    keys) so a real checkpoint can be validated key-for-key BEFORE import —
    see validate_hunyuan_checkpoint_keys.  Reference model surface:
    /root/reference/vorta/patch/modeling_hunyuan.py:621-645 (embedder) and
    the diffusers class it patches."""
    keys = set()

    def lin(prefix):
        keys.add(f"{prefix}.weight")
        keys.add(f"{prefix}.bias")

    lin("x_embedder.proj")
    for e in ("timestep_embedder", "text_embedder") + (
            ("guidance_embedder",) if guidance else ()):
        lin(f"time_text_embed.{e}.linear_1")
        lin(f"time_text_embed.{e}.linear_2")
    lin("context_embedder.proj_in")
    lin("context_embedder.time_text_embed.timestep_embedder.linear_1")
    lin("context_embedder.time_text_embed.timestep_embedder.linear_2")
    lin("context_embedder.time_text_embed.text_embedder.linear_1")
    lin("context_embedder.time_text_embed.text_embedder.linear_2")
    for i in range(refiner_layers):
        p = f"context_embedder.token_refiner.refiner_blocks.{i}"
        lin(f"{p}.norm1")
        lin(f"{p}.norm2")
        for a in ("to_q", "to_k", "to_v"):
            lin(f"{p}.attn.{a}")
        lin(f"{p}.attn.to_out.0")
        lin(f"{p}.ff.net.0.proj")
        lin(f"{p}.ff.net.2")
        lin(f"{p}.norm_out.linear")
    for i in range(dual_layers):
        p = f"transformer_blocks.{i}"
        lin(f"{p}.norm1.linear")
        lin(f"{p}.norm1_context.linear")
        for a in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                  "add_v_proj", "to_add_out"):
            lin(f"{p}.attn.{a}")
        lin(f"{p}.attn.to_out.0")
        for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            keys.add(f"{p}.attn.{n}.weight")
        lin(f"{p}.ff.net.0.proj")
        lin(f"{p}.ff.net.2")
        lin(f"{p}.ff_context.net.0.proj")
        lin(f"{p}.ff_context.net.2")
        if routers:
            lin(f"{p}.router.linear")
    for i in range(single_layers):
        p = f"single_transformer_blocks.{i}"
        lin(f"{p}.norm.linear")
        for a in ("to_q", "to_k", "to_v"):
            lin(f"{p}.attn.{a}")
        keys.add(f"{p}.attn.norm_q.weight")
        keys.add(f"{p}.attn.norm_k.weight")
        lin(f"{p}.proj_mlp")
        lin(f"{p}.proj_out")
        if routers:
            lin(f"{p}.router.linear")
    lin("norm_out.linear")
    lin("proj_out")
    return keys


def validate_hunyuan_checkpoint_keys(keys, dual_layers: int,
                                     single_layers: int, refiner_layers: int):
    """Compare a checkpoint's key set (a state dict's keys, or the
    ``weight_map`` keys of a diffusers ``*.index.json``) against what the
    importer expects.  Returns (missing, unexpected) sorted lists — both
    empty for a conforming HunyuanVideo checkpoint."""
    keys = set(keys)
    guidance = any("guidance_embedder" in k for k in keys)
    routers = any(".router." in k for k in keys)
    expected = hunyuan_expected_keys(dual_layers, single_layers,
                                     refiner_layers, guidance=guidance,
                                     routers=routers)
    return sorted(expected - keys), sorted(keys - expected)


def load_hunyuan_torch_weights(model, path):
    """Import diffusers HunyuanVideo weights into models.hunyuan.HunyuanModel."""
    cfg = model.cfg
    sd = load_state_dict(path)
    tree = hunyuan_state_dict_to_tree(
        sd, cfg.dual_layers, cfg.single_layers, cfg.refiner_layers,
        cfg.head_dim,
    )
    graphdef, state = nnx.split(model)
    applied, missing = _apply_tree(state, tree)
    nnx.update(model, state)
    return applied, missing


def load_router_torch_checkpoint(model, path):
    """Import only router params from a reference-style router.pt."""
    sd = load_state_dict(path)
    router_sd = {k: v for k, v in sd.items() if "router" in k}
    if not router_sd:
        raise ValueError(f"no router keys in {path}")
    blocks = []
    for i in range(model.cfg.num_layers):
        blocks.append(
            {"router": {"linear": _linear(router_sd, f"blocks.{i}.router.linear")}}
        )
    tree = {"blocks": _stack(blocks)}
    graphdef, state = nnx.split(model)
    applied, missing = _apply_tree(state, tree)
    nnx.update(model, state)
    return applied, missing


def load_hunyuan_router_torch_checkpoint(model, path):
    """Import only router params from a reference-style Hunyuan router.pt.

    The reference saves every state-dict key containing 'router' from the
    patched HunyuanVideoTransformer3DModel (vorta/train/checkpoint.py:23-48),
    so keys are ``transformer_blocks.{i}.router.linear.*`` (20 dual) and
    ``single_transformer_blocks.{i}.router.linear.*`` (40 single)."""
    sd = load_state_dict(path)
    router_sd = {k.split("module.")[-1]: v for k, v in sd.items() if "router" in k}
    if not router_sd:
        raise ValueError(f"no router keys in {path}")
    duals = [
        {"router": {"linear": _linear(router_sd, f"transformer_blocks.{i}.router.linear")}}
        for i in range(model.cfg.dual_layers)
    ]
    singles = [
        {"router": {"linear": _linear(
            router_sd, f"single_transformer_blocks.{i}.router.linear")}}
        for i in range(model.cfg.single_layers)
    ]
    tree = {"dual_blocks": _stack(duals), "single_blocks": _stack(singles)}
    graphdef, state = nnx.split(model)
    applied, missing = _apply_tree(state, tree)
    nnx.update(model, state)
    return applied, missing


def umt5_state_dict_to_tree(sd: Dict[str, np.ndarray], num_layers: int) -> dict:
    """transformers UMT5EncoderModel state_dict -> models.umt5.UMT5Encoder tree."""
    pref = "encoder." if any(k.startswith("encoder.") for k in sd) else ""
    tree = {
        "embed": {"embedding": _f32(sd.get("shared.weight", sd.get(f"{pref}embed_tokens.weight")))},
        "final_norm": {"weight": _f32(sd[f"{pref}final_layer_norm.weight"])},
        "blocks": {},
    }

    def nb_linear(prefix):  # T5 linears have no bias
        return {"kernel": _f32(sd[f"{prefix}.weight"]).T}

    for i in range(num_layers):
        p = f"{pref}block.{i}"
        tree["blocks"][str(i)] = {
            "norm1": {"weight": _f32(sd[f"{p}.layer.0.layer_norm.weight"])},
            "attn": {
                "q": nb_linear(f"{p}.layer.0.SelfAttention.q"),
                "k": nb_linear(f"{p}.layer.0.SelfAttention.k"),
                "v": nb_linear(f"{p}.layer.0.SelfAttention.v"),
                "o": nb_linear(f"{p}.layer.0.SelfAttention.o"),
                "rel_bias": {
                    "embedding": _f32(
                        sd[f"{p}.layer.0.SelfAttention.relative_attention_bias.weight"]
                    )
                },
            },
            "norm2": {"weight": _f32(sd[f"{p}.layer.1.layer_norm.weight"])},
            "ffn": {
                "wi_0": nb_linear(f"{p}.layer.1.DenseReluDense.wi_0"),
                "wi_1": nb_linear(f"{p}.layer.1.DenseReluDense.wi_1"),
                "wo": nb_linear(f"{p}.layer.1.DenseReluDense.wo"),
            },
        }
    return tree


def load_umt5_torch_weights(model, path):
    sd = load_state_dict(path)
    tree = umt5_state_dict_to_tree(sd, model.cfg.num_layers)
    graphdef, state = nnx.split(model)
    applied, missing = _apply_tree(state, tree)
    nnx.update(model, state)
    return applied, missing


def llama_state_dict_to_tree(sd: Dict[str, np.ndarray], num_layers: int) -> dict:
    """transformers LlamaModel state_dict -> models.text_encoders.LlamaTextEncoder."""
    pref = "model." if any(k.startswith("model.") for k in sd) else ""

    def nb(prefix):
        return {"kernel": _f32(sd[f"{prefix}.weight"]).T}

    tree = {
        "embed_tokens": {"embedding": _f32(sd[f"{pref}embed_tokens.weight"])},
        "norm": {"weight": _f32(sd[f"{pref}norm.weight"])},
        "layers": {},
    }
    for i in range(num_layers):
        p = f"{pref}layers.{i}"
        tree["layers"][str(i)] = {
            "input_layernorm": {"weight": _f32(sd[f"{p}.input_layernorm.weight"])},
            "q_proj": nb(f"{p}.self_attn.q_proj"),
            "k_proj": nb(f"{p}.self_attn.k_proj"),
            "v_proj": nb(f"{p}.self_attn.v_proj"),
            "o_proj": nb(f"{p}.self_attn.o_proj"),
            "post_attention_layernorm": {
                "weight": _f32(sd[f"{p}.post_attention_layernorm.weight"])
            },
            "gate_proj": nb(f"{p}.mlp.gate_proj"),
            "up_proj": nb(f"{p}.mlp.up_proj"),
            "down_proj": nb(f"{p}.mlp.down_proj"),
        }
    return tree


def load_llama_torch_weights(model, path):
    sd = load_state_dict(path)
    tree = llama_state_dict_to_tree(sd, model.cfg.num_layers)
    graphdef, state = nnx.split(model)
    applied, missing = _apply_tree(state, tree)
    nnx.update(model, state)
    return applied, missing


def clip_text_state_dict_to_tree(sd: Dict[str, np.ndarray], num_layers: int) -> dict:
    """transformers CLIPTextModel -> models.text_encoders.CLIPTextEncoder."""
    pref = "text_model." if any(k.startswith("text_model.") for k in sd) else ""
    tree = {
        "token_embedding": {"embedding": _f32(sd[f"{pref}embeddings.token_embedding.weight"])},
        "position_embedding": _f32(sd[f"{pref}embeddings.position_embedding.weight"]),
        "final_layer_norm": {
            "scale": _f32(sd[f"{pref}final_layer_norm.weight"]),
            "bias": _f32(sd[f"{pref}final_layer_norm.bias"]),
        },
        "blocks": {},
    }
    for i in range(num_layers):
        p = f"{pref}encoder.layers.{i}"
        tree["blocks"][str(i)] = {
            "layer_norm1": {
                "scale": _f32(sd[f"{p}.layer_norm1.weight"]),
                "bias": _f32(sd[f"{p}.layer_norm1.bias"]),
            },
            "q_proj": _linear(sd, f"{p}.self_attn.q_proj"),
            "k_proj": _linear(sd, f"{p}.self_attn.k_proj"),
            "v_proj": _linear(sd, f"{p}.self_attn.v_proj"),
            "out_proj": _linear(sd, f"{p}.self_attn.out_proj"),
            "layer_norm2": {
                "scale": _f32(sd[f"{p}.layer_norm2.weight"]),
                "bias": _f32(sd[f"{p}.layer_norm2.bias"]),
            },
            "fc1": _linear(sd, f"{p}.mlp.fc1"),
            "fc2": _linear(sd, f"{p}.mlp.fc2"),
        }
    return tree


def load_clip_text_torch_weights(model, path):
    sd = load_state_dict(path)
    tree = clip_text_state_dict_to_tree(sd, model.cfg.num_layers)
    graphdef, state = nnx.split(model)
    applied, missing = _apply_tree(state, tree)
    nnx.update(model, state)
    return applied, missing


# ---------------------------------------------------------------------------
# VAE weight import (decode-first; encoder too)
# ---------------------------------------------------------------------------
#
# The reference drives both VAEs through diffusers (AutoencoderKLWan /
# AutoencoderKLHunyuanVideo) and never touches their weights itself, so the
# key schema below is the diffusers module layout as documented/observed:
# flat down_blocks/up_blocks ModuleLists of residual blocks interleaved with
# resample modules, WanRMS_norm ".gamma" / GroupNorm ".weight/.bias", causal
# Conv3d ".weight/.bias".  Real-checkpoint verification is pending weight
# availability in this environment (same caveat as the model importers); the
# mapping is pinned by synthetic-oracle tests and import failures list every
# unmatched key so a divergent layout is diagnosable at a glance.


def _conv3d(sd, prefix):
    """torch Conv3d (out,in,kt,kh,kw) -> nnx.Conv kernel (kt,kh,kw,in,out)."""
    w = _f32(sd[f"{prefix}.weight"])
    return {"conv": {"kernel": w.transpose(2, 3, 4, 1, 0),
                     "bias": _f32(sd[f"{prefix}.bias"])}}


def _conv2d_as3d(sd, prefix):
    """torch Conv2d (out,in,kh,kw) -> nnx.Conv kernel (1,kh,kw,in,out)."""
    w = _f32(sd[f"{prefix}.weight"])
    return {"kernel": w.transpose(2, 3, 1, 0)[None],
            "bias": _f32(sd[f"{prefix}.bias"])}


def _conv1x1_as_linear(sd, prefix):
    """torch Conv2d 1x1 (out,in,1,1) -> Linear kernel (in,out)."""
    w = _f32(sd[f"{prefix}.weight"])
    return {"kernel": w[:, :, 0, 0].T, "bias": _f32(sd[f"{prefix}.bias"])}


def _wan_vae_resblock(sd, p):
    blk = {
        "norm1": {"gamma": _f32(sd[f"{p}.norm1.gamma"]).reshape(-1)},
        "conv1": _conv3d(sd, f"{p}.conv1"),
        "norm2": {"gamma": _f32(sd[f"{p}.norm2.gamma"]).reshape(-1)},
        "conv2": _conv3d(sd, f"{p}.conv2"),
    }
    if f"{p}.conv_shortcut.weight" in sd:
        blk["shortcut"] = _conv3d(sd, f"{p}.conv_shortcut")
    return blk


def _wan_vae_attn(sd, p):
    return {
        "norm": {"gamma": _f32(sd[f"{p}.norm.gamma"]).reshape(-1)},
        "to_qkv": _conv1x1_as_linear(sd, f"{p}.to_qkv"),
        "proj": _conv1x1_as_linear(sd, f"{p}.proj"),
    }


def wan_vae_state_dict_to_tree(sd: Dict[str, np.ndarray], cfg) -> dict:
    """diffusers AutoencoderKLWan state_dict -> models.wan_vae.WanVAE tree."""
    n_res = cfg.num_res_blocks
    n_stages = len(cfg.dim_mult)

    # ---- decoder: flat up_blocks list = per stage [res x (n_res+1)] then an
    # upsampler (temporal variants included); iterate by construction order
    dec = {
        "conv_in": _conv3d(sd, "decoder.conv_in"),
        "mid_block1": _wan_vae_resblock(sd, "decoder.mid_block.resnets.0"),
        "mid_attn": _wan_vae_attn(sd, "decoder.mid_block.attentions.0"),
        "mid_block2": _wan_vae_resblock(sd, "decoder.mid_block.resnets.1"),
        "norm_out": {"gamma": _f32(sd["decoder.norm_out.gamma"]).reshape(-1)},
        "conv_out": _conv3d(sd, "decoder.conv_out"),
        "stages": {},
    }
    k = 0
    rev_tdown = list(reversed(cfg.temporal_downsample))
    for i in range(n_stages):
        stage = {"blocks": {}}
        for j in range(n_res + 1):
            stage["blocks"][str(j)] = _wan_vae_resblock(sd, f"decoder.up_blocks.{k}")
            k += 1
        t_up = rev_tdown[i] if i < len(rev_tdown) else False
        last = i == n_stages - 1
        if t_up:
            # TemporalUpsample wraps a CausalConv3d (extra .conv level)
            stage["t_up"] = {"conv": _conv3d(sd, f"decoder.up_blocks.{k}.time_conv")}
        if not last:
            stage["s_up"] = {"conv": _conv2d_as3d(sd, f"decoder.up_blocks.{k}.resample.1")}
            k += 1
        elif t_up:
            k += 1
        dec["stages"][str(i)] = stage

    # ---- encoder: flat down_blocks = per stage [res x n_res] then resample
    enc = {
        "conv_in": _conv3d(sd, "encoder.conv_in"),
        "mid_block1": _wan_vae_resblock(sd, "encoder.mid_block.resnets.0"),
        "mid_attn": _wan_vae_attn(sd, "encoder.mid_block.attentions.0"),
        "mid_block2": _wan_vae_resblock(sd, "encoder.mid_block.resnets.1"),
        "norm_out": {"gamma": _f32(sd["encoder.norm_out.gamma"]).reshape(-1)},
        "conv_out": _conv3d(sd, "encoder.conv_out"),
        "stages": {},
    }
    k = 0
    for i in range(n_stages):
        stage = {"blocks": {}}
        for j in range(n_res):
            stage["blocks"][str(j)] = _wan_vae_resblock(sd, f"encoder.down_blocks.{k}")
            k += 1
        last = i == n_stages - 1
        if not last:
            stage["s_down"] = {"conv": _conv2d_as3d(sd, f"encoder.down_blocks.{k}.resample.1")}
            if cfg.temporal_downsample[i] and f"encoder.down_blocks.{k}.time_conv.weight" in sd:
                stage["t_down"] = {"conv": _conv3d(sd, f"encoder.down_blocks.{k}.time_conv")}
            k += 1
        enc["stages"][str(i)] = stage

    return {"decoder": dec, "encoder": enc}


def load_wan_vae_torch_weights(model, path):
    """Import diffusers AutoencoderKLWan weights into models.wan_vae.WanVAE."""
    sd = load_state_dict(path)
    tree = wan_vae_state_dict_to_tree(sd, model.cfg)
    graphdef, state = nnx.split(model)
    applied, missing = _apply_tree(state, tree)
    if missing:
        raise ValueError(
            f"WanVAE import: {len(missing)} keys did not match the model "
            f"(first few: {missing[:8]}) — the checkpoint layout differs from "
            "the documented diffusers schema"
        )
    nnx.update(model, state)
    return applied, missing


def _hy_vae_resblock(sd, p):
    blk = {
        "norm1": {"scale": _f32(sd[f"{p}.norm1.weight"]),
                  "bias": _f32(sd[f"{p}.norm1.bias"])},
        "conv1": _conv3d(sd, f"{p}.conv1"),
        "norm2": {"scale": _f32(sd[f"{p}.norm2.weight"]),
                  "bias": _f32(sd[f"{p}.norm2.bias"])},
        "conv2": _conv3d(sd, f"{p}.conv2"),
    }
    if f"{p}.conv_shortcut.weight" in sd:
        blk["shortcut"] = _conv3d(sd, f"{p}.conv_shortcut")
    return blk


def _hy_vae_attn(sd, p):
    out = {
        "norm": {"scale": _f32(sd[f"{p}.group_norm.weight"]),
                 "bias": _f32(sd[f"{p}.group_norm.bias"])},
        "proj": _linear(sd, f"{p}.to_out.0"),
    }
    qkv = np.concatenate(
        [_f32(sd[f"{p}.to_{n}.weight"]) for n in ("q", "k", "v")], axis=0
    )
    qkv_b = np.concatenate(
        [_f32(sd[f"{p}.to_{n}.bias"]) for n in ("q", "k", "v")], axis=0
    )
    out["to_qkv"] = {"kernel": qkv.T, "bias": qkv_b}
    return out


def hunyuan_vae_state_dict_to_tree(sd: Dict[str, np.ndarray], cfg) -> dict:
    """diffusers AutoencoderKLHunyuanVideo state_dict ->
    models.hunyuan_vae.HunyuanVAE tree."""
    n_res = cfg.layers_per_block
    n_stages = len(cfg.base_dims)

    dec = {
        "conv_in": _conv3d(sd, "decoder.conv_in"),
        "mid_block1": _hy_vae_resblock(sd, "decoder.mid_block.resnets.0"),
        "mid_attn": _hy_vae_attn(sd, "decoder.mid_block.attentions.0"),
        "mid_block2": _hy_vae_resblock(sd, "decoder.mid_block.resnets.1"),
        "norm_out": {"scale": _f32(sd["decoder.conv_norm_out.weight"]),
                     "bias": _f32(sd["decoder.conv_norm_out.bias"])},
        "conv_out": _conv3d(sd, "decoder.conv_out"),
        "stages": {},
    }
    for i in range(n_stages):
        p = f"decoder.up_blocks.{i}"
        stage = {"blocks": {}}
        for j in range(n_res + 1):
            stage["blocks"][str(j)] = _hy_vae_resblock(sd, f"{p}.resnets.{j}")
        if f"{p}.upsamplers.0.conv.weight" in sd:
            # CausalUpsample wraps a CausalConv3d (extra .conv level)
            stage["up"] = {"conv": _conv3d(sd, f"{p}.upsamplers.0.conv")}
        dec["stages"][str(i)] = stage

    enc = {
        "conv_in": _conv3d(sd, "encoder.conv_in"),
        "mid_block1": _hy_vae_resblock(sd, "encoder.mid_block.resnets.0"),
        "mid_attn": _hy_vae_attn(sd, "encoder.mid_block.attentions.0"),
        "mid_block2": _hy_vae_resblock(sd, "encoder.mid_block.resnets.1"),
        "norm_out": {"scale": _f32(sd["encoder.conv_norm_out.weight"]),
                     "bias": _f32(sd["encoder.conv_norm_out.bias"])},
        "conv_out": _conv3d(sd, "encoder.conv_out"),
        "stages": {},
    }
    for i in range(n_stages):
        p = f"encoder.down_blocks.{i}"
        stage = {"blocks": {}}
        for j in range(n_res):
            stage["blocks"][str(j)] = _hy_vae_resblock(sd, f"{p}.resnets.{j}")
        if f"{p}.downsamplers.0.conv.weight" in sd:
            stage["down"] = {"conv": _conv3d(sd, f"{p}.downsamplers.0.conv")}
        enc["stages"][str(i)] = stage

    return {"decoder": dec, "encoder": enc}


def load_hunyuan_vae_torch_weights(model, path):
    """Import diffusers AutoencoderKLHunyuanVideo weights into
    models.hunyuan_vae.HunyuanVAE."""
    sd = load_state_dict(path)
    tree = hunyuan_vae_state_dict_to_tree(sd, model.cfg)
    graphdef, state = nnx.split(model)
    applied, missing = _apply_tree(state, tree)
    if missing:
        raise ValueError(
            f"HunyuanVAE import: {len(missing)} keys did not match the model "
            f"(first few: {missing[:8]}) — the checkpoint layout differs from "
            "the documented diffusers schema"
        )
    nnx.update(model, state)
    return applied, missing
