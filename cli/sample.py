#!/usr/bin/env python
"""Text-to-video sampling CLI (reference: scripts/{wan}/inference.py).

Runs the jitted denoise loop with full or routed-sparse attention, reading
the attention geometry persisted by the trainer (config.json contract), and
optionally decodes through the Wan VAE.

Prompt conditioning, in precedence order: --prompt with --tokenizer_dir
(on-the-fly encoding through the native UMT5/Llama+CLIP encoders; pass
--text_encoder_checkpoint/--clip_checkpoint for real weights), --prompt_embeds
(a .pt/.npy of precomputed states), --prompt_embeds_dir (batch mode), or
--random_embeds for smoke runs.

Example smoke run:
  python cli/sample.py --model wan-tiny --random_embeds --num_frames 13 \
      --height 64 --width 64 --num_inference_steps 4 --output /tmp/out.npy
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="wan-1_3B",
                   choices=["wan-1_3B", "wan-14B", "wan-tiny", "hunyuan-13B", "hunyuan-tiny"])
    p.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--torch_checkpoint", default=None, help="DiT weights (diffusers safetensors/pt)")
    p.add_argument("--resume_dir", default=None,
                   help="training exp dir: reads config.json attention geometry")
    p.add_argument("--router_checkpoint", default=None,
                   help="orbax step dir or torch router.pt")
    p.add_argument("--native_attention", action="store_true",
                   help="full 3D attention baseline (speedup denominator)")
    p.add_argument("--tau_sparse", type=float, default=0.3)
    p.add_argument("--mm", default="bf16", choices=["bf16", "int8"],
                   help="int8: W8A8 serving mode for block FFN/projections "
                        "(~2x MXU rate, small quality trade; ops/qmm.py)")
    p.add_argument("--qk_int8", action="store_true",
                   help="serving mode: run the full/lowres experts' QK^T on "
                        "the int8 MXU path (dynamic per-head scales; ~1.16-"
                        "1.18x those experts on v5e, ~0.3%% rel error; the "
                        "STA expert stays bf16)")
    p.add_argument("--cfg_batch", action="store_true",
                   help="run CFG cond+uncond as one batch-2 forward "
                        "(2x activation memory, fewer dispatch gaps)")
    p.add_argument("--act_scales", default=None,
                   help="npz of calibrated static activation scales "
                        "(tools/calibrate_int8.py) — removes the dynamic "
                        "amax passes when --mm int8")
    p.add_argument("--cache_threshold", type=float, default=0.0,
                   help="step-residual caching (ops/stepcache.py): skip the "
                        "DiT block stack when the accumulated timestep-"
                        "embedding distance stays under this (0 = off; "
                        "TeaCache-style values ~0.05-0.3)")
    p.add_argument("--cache_warmup", type=int, default=1,
                   help="denoise steps at the start that always compute")
    p.add_argument("--cache_poly", default=None,
                   help="npz from tools/fit_cache_poly.py; its fitted "
                        "polynomial rescales the cache indicator distance")
    p.add_argument("--quantize_blocks", default=None, choices=["int4", "int8"],
                   help="over-HBM serving (Wan-14B / Hunyuan-13B on one "
                        "chip): keep the stacked frozen block weights in HBM "
                        "at int4/int8 and dequantize one block per scan step "
                        "(ops/quant; io/quant_serving). Replaces the "
                        "reference's model CPU offload "
                        "(scripts/wan/inference.py:156-162)")
    # generation
    p.add_argument("--prompt", default=None,
                   help="text prompt; needs --tokenizer_dir (+ encoder ckpt)")
    p.add_argument("--tokenizer_dir", default=None,
                   help="dir with a HF fast tokenizer.json for the text encoder")
    p.add_argument("--text_encoder_checkpoint", default=None,
                   help="UMT5 (wan) / Llama (hunyuan) torch weights")
    p.add_argument("--clip_tokenizer_dir", default=None)
    p.add_argument("--clip_checkpoint", default=None)
    p.add_argument("--prompt_embeds", default=None, help=".npy/.pt UMT5 states (L, 4096)")
    p.add_argument("--negative_prompt_embeds", default=None)
    p.add_argument("--image_embeds", default=None,
                   help="I2V: .npy/.pt CLIP image tokens (257, image_dim); "
                        "enables the image-KV branch (wan.py:119-139)")
    p.add_argument("--random_embeds", action="store_true")
    p.add_argument("--num_frames", type=int, default=77)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=5.0)
    p.add_argument("--flow_shift", type=float, default=5.0)
    p.add_argument("--scheduler", default=None, choices=["unipc", "euler"],
                   help="default: unipc for wan (reference inference), euler for hunyuan")
    p.add_argument("--seed", type=int, default=1234)
    # output
    p.add_argument("--output", default="results/sample.npy",
                   help=".npy latents, or .mp4/.gif with --decode")
    p.add_argument("--decode", action="store_true", help="decode via the model's VAE")
    p.add_argument("--vae_tiling", action="store_true",
                   help="tiled VAE decode (reference: vae.enable_tiling())")
    p.add_argument("--vae_checkpoint", default=None)
    # sequence-parallel sampling (reference: torchrun --nproc_per_node N + sp)
    p.add_argument("--sp_size", type=int, default=1,
                   help="shard latent frames over an sp mesh axis (Ulysses)")
    p.add_argument("--dp_size", type=int, default=None)
    # batch inference over a directory of prompt embeddings (reference
    # iterates a prompt file with per-prompt seeds and skip-existing —
    # scripts/wan/inference.py:165-193; our conditioning contract takes
    # precomputed embeddings)
    p.add_argument("--prompt_embeds_dir", default=None,
                   help="directory of .npy/.pt embeds; one video per file")
    p.add_argument("--skip_existing", action="store_true")
    return p.parse_args(argv)


def load_act_scales(args):
    """{site: (L,) static int8 activation scales} from --act_scales npz."""
    if not getattr(args, "act_scales", None):
        return None
    import numpy as np

    data = np.load(args.act_scales)
    scales = {k: data[k] for k in data.files}
    print(f"[sample] static int8 scales: {len(scales)} sites from {args.act_scales}")
    return scales


def load_cache_poly(args):
    """Fitted TeaCache rescale coefficients (tools/fit_cache_poly.py npz)."""
    if not getattr(args, "cache_poly", None):
        return None
    import numpy as np
    return tuple(float(c) for c in np.load(args.cache_poly)["coefficients"])


def make_mesh_or_none(args):
    if args.sp_size <= 1 and not args.dp_size:
        return None
    from vorta_tpu.parallel.mesh import make_mesh

    return make_mesh(sp_size=args.sp_size, dp_size=args.dp_size)


def run_batch(args, generate, load_fn):
    """One video per embedding file, fixed seed per prompt and skip-existing
    (reference loop: scripts/wan/inference.py:165-193)."""
    import jax.numpy as jnp

    files = sorted(
        p for p in Path(args.prompt_embeds_dir).iterdir()
        if p.suffix in (".npy", ".pt")
    )
    if not files:
        raise SystemExit(f"no .npy/.pt embeds in {args.prompt_embeds_dir}")
    out_base = Path(args.output)
    suffix = out_base.suffix or ".npy"
    out_dir = out_base.parent if out_base.suffix else out_base
    neg = load_fn(args.negative_prompt_embeds) if args.negative_prompt_embeds else None
    for f in files:
        out = out_dir / (f.stem + suffix)
        if args.skip_existing and (out.exists() or out.with_suffix(".npy").exists()):
            print(f"[sample] skip existing {out}")
            continue
        pe = load_fn(f)
        generate(pe, neg if neg is not None else jnp.zeros_like(pe), out)


def load_embeds(path, cfg):
    path = Path(path)
    if path.suffix == ".npy":
        arr = np.load(path)
    else:
        import torch

        arr = torch.load(path, map_location="cpu", weights_only=True).float().numpy()
    if arr.ndim == 2:
        arr = arr[None]
    if arr.shape[1] < cfg.text_len:
        arr = np.pad(arr, ((0, 0), (0, cfg.text_len - arr.shape[1]), (0, 0)))
    return arr[:, : cfg.text_len]


def main(argv=None):
    args = parse_args(argv)
    import jax

    from vorta_tpu.parallel.mesh import pin_platform_from_env

    pin_platform_from_env()
    import jax.numpy as jnp
    from flax import nnx

    from vorta_tpu.config import WAN_1_3B, WAN_14B, WAN_TINY, AttentionConfig
    from vorta_tpu.geometry import WAN_GEOMETRY
    from vorta_tpu.models.wan import WanModel
    from vorta_tpu.pipelines.wan_t2v import SamplingConfig, WanT2VPipeline

    interpret = jax.default_backend() not in ("tpu",)
    if args.model.startswith("hunyuan"):
        return _main_hunyuan(args, interpret)
    model_cfg = {"wan-1_3B": WAN_1_3B, "wan-14B": WAN_14B, "wan-tiny": WAN_TINY}[args.model]
    # tiny configs have head_dim < 128 (TPU lane width): run the kernels in
    # interpret mode rather than refusing
    interpret = interpret or model_cfg.head_dim % 128 != 0
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    grid = WAN_GEOMETRY.tokens((args.num_frames, args.height, args.width))
    if args.resume_dir and (Path(args.resume_dir) / "config.json").exists():
        attn_cfg = AttentionConfig.load(Path(args.resume_dir) / "config.json")
        if attn_cfg.latent_shape != grid:
            raise ValueError(
                f"config.json geometry {attn_cfg.latent_shape} != requested video grid {grid}"
            )
        attn_cfg = AttentionConfig(**{**attn_cfg.__dict__, "tau_sparse": args.tau_sparse})
    else:
        tile = (2, 2, 2) if args.model == "wan-tiny" else (4, 6, 4)
        blocks = dict(block_q=16, block_kv=16, sta_block_q=8, sta_block_kv=8) \
            if args.model == "wan-tiny" else {}
        attn_cfg = AttentionConfig(
            latent_shape=grid, sta_tile=tile,
            sta_window=(3, 3, 1) if args.model == "wan-tiny" else (3, 3, 3),
            lowres_window=(2, 2, 2) if args.model == "wan-tiny" else (2, 3, 2),
            tau_sparse=args.tau_sparse, **blocks,
        )
    if args.qk_int8:
        import dataclasses as _dc

        attn_cfg = _dc.replace(attn_cfg, qk_int8=True)

    image_embeds = None
    if args.image_embeds:
        import dataclasses

        arr = np.load(args.image_embeds) if args.image_embeds.endswith(".npy") else None
        if arr is None:
            import torch

            arr = torch.load(args.image_embeds, map_location="cpu",
                             weights_only=True).float().numpy()
        if arr.ndim == 2:
            arr = arr[None]
        if model_cfg.image_dim is None:
            model_cfg = dataclasses.replace(model_cfg, image_dim=int(arr.shape[-1]))
        image_embeds = arr

    print(f"[sample] model={args.model} grid={grid} routing="
          f"{'off' if args.native_attention else 'hard'} backend={jax.default_backend()}")
    qblocks = None
    if args.quantize_blocks:
        from vorta_tpu.io.quant_serving import build_quantized_wan

        model, qblocks = build_quantized_wan(
            model_cfg, bits=int(args.quantize_blocks[3:]),
            checkpoint=args.torch_checkpoint,
            router_checkpoint=args.router_checkpoint, dtype=dtype,
        )
    else:
        model = WanModel(model_cfg, dtype=dtype, param_dtype=dtype, rngs=nnx.Rngs(0))
    if args.torch_checkpoint and not args.quantize_blocks:
        from vorta_tpu.io.torch_import import load_wan_torch_weights

        applied, missing = load_wan_torch_weights(model, args.torch_checkpoint)
        print(f"[sample] imported {len(applied)} tensors ({len(missing)} missing)")
    if args.router_checkpoint and not args.quantize_blocks:
        rp = Path(args.router_checkpoint)
        if rp.suffix in (".pt", ".bin", ".safetensors"):
            from vorta_tpu.io.torch_import import load_router_torch_checkpoint

            load_router_torch_checkpoint(model, rp)
        else:
            from vorta_tpu.io.checkpoint import load_router_checkpoint
            from vorta_tpu.training.step import router_partition

            graphdef, router_state, frozen = router_partition(model)
            router_state, _ = load_router_checkpoint(rp, router_state)
            nnx.update(model, router_state)
        print(f"[sample] router loaded from {args.router_checkpoint}")

    pe = ne = None
    if args.prompt and args.tokenizer_dir:
        # on-the-fly encoding (reference: pipeline_wan.py:267-276 via UMT5)
        from vorta_tpu.io.text import encode_prompt_wan, load_tokenizer
        from vorta_tpu.models.umt5 import UMT5Config, UMT5Encoder

        tok = load_tokenizer(args.tokenizer_dir)
        if model_cfg.text_dim == 4096:
            enc_cfg = UMT5Config()  # UMT5-XXL (the real Wan text encoder)
        else:  # tiny smoke models: match the DiT's text_dim
            enc_cfg = UMT5Config(vocab_size=512, d_model=model_cfg.text_dim,
                                 d_kv=16, num_heads=max(1, model_cfg.text_dim // 16),
                                 d_ff=2 * model_cfg.text_dim, num_layers=2)
        enc = UMT5Encoder(enc_cfg, dtype=dtype, param_dtype=dtype,
                          rngs=nnx.Rngs(0))
        if args.text_encoder_checkpoint:
            from vorta_tpu.io.torch_import import load_umt5_torch_weights

            load_umt5_torch_weights(enc, args.text_encoder_checkpoint)
        else:
            print("[sample] WARNING: encoding with random UMT5 weights "
                  "(--text_encoder_checkpoint not given)")
        pe = encode_prompt_wan(args.prompt, tok, enc, max_len=model_cfg.text_len)
    elif args.prompt_embeds:
        pe = jnp.asarray(load_embeds(args.prompt_embeds, model_cfg))
    elif args.random_embeds:
        pe = jax.random.normal(
            jax.random.PRNGKey(args.seed + 1),
            (1, model_cfg.text_len, model_cfg.text_dim),
        )
    elif not args.prompt_embeds_dir:
        raise SystemExit("need --prompt_embeds, --prompt_embeds_dir or "
                         "--random_embeds (no tokenizer weights in env)")
    if pe is not None:
        ne = (jnp.asarray(load_embeds(args.negative_prompt_embeds, model_cfg))
              if args.negative_prompt_embeds else jnp.zeros_like(pe))

    pipe = WanT2VPipeline(
        model, attn_cfg=attn_cfg, interpret=interpret,
        mesh=make_mesh_or_none(args), act_scales=load_act_scales(args),
        quantized_blocks=qblocks,
    )
    sampling = SamplingConfig(
        num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale,
        flow_shift=args.flow_shift,
        scheduler=args.scheduler or "unipc",  # reference wan default
        routing_mode="off" if args.native_attention else "hard",
        mm_precision=args.mm,
        cfg_batch=args.cfg_batch,
        cache_threshold=args.cache_threshold,
        cache_warmup=args.cache_warmup,
        cache_coefficients=load_cache_poly(args),
    )

    vae = None
    if args.decode:
        from vorta_tpu.models.wan_vae import WAN_VAE, WanVAE

        vae = WanVAE(WAN_VAE, dtype=dtype, rngs=nnx.Rngs(0))
        if args.vae_checkpoint:
            from vorta_tpu.io.torch_import import load_wan_vae_torch_weights

            applied, _ = load_wan_vae_torch_weights(vae, args.vae_checkpoint)
            print(f"[sample] VAE imported ({len(applied)} tensors)")

    def generate(pe, ne, out):
        latents = pipe.prepare_latents(
            jax.random.PRNGKey(args.seed), 1, args.num_frames, args.height, args.width
        )
        t0 = time.time()
        img = jnp.asarray(image_embeds, dtype) if image_embeds is not None else None
        final, _ = pipe(latents, pe, ne, sampling=sampling, image_embeds=img)
        final.block_until_ready()
        print(f"[sample] denoised in {time.time() - t0:.1f}s "
              f"({(time.time() - t0) / args.num_inference_steps:.2f}s/step)")
        out.parent.mkdir(parents=True, exist_ok=True)
        if args.decode:
            from vorta_tpu.io.video import save_video

            z = vae.denormalize_latents(final)
            if args.vae_tiling:
                from vorta_tpu.models.vae_tiling import tiled_decode

                video = tiled_decode(lambda zz: vae.decode(zz, denormalize=False), z)
            else:
                video = vae.decode(z, denormalize=False)
            save_video(np.asarray(video[0], dtype=np.float32), out)
        else:
            np.save(out.with_suffix(".npy"), np.asarray(final))
        print(f"[sample] wrote {out}")

    if args.prompt_embeds_dir:
        run_batch(args, generate, lambda p: jnp.asarray(load_embeds(p, model_cfg)))
    else:
        generate(pe, ne, Path(args.output))




def _main_hunyuan(args, interpret):
    """HunyuanVideo sampling (reference: scripts/hunyuan/inference.py)."""
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from vorta_tpu.config import AttentionConfig
    from vorta_tpu.geometry import HUNYUAN_GEOMETRY
    from vorta_tpu.models.hunyuan import HUNYUAN_13B, HUNYUAN_TINY, HunyuanModel
    from vorta_tpu.pipelines.hunyuan_t2v import HunyuanSamplingConfig, HunyuanT2VPipeline

    model_cfg = HUNYUAN_13B if args.model == "hunyuan-13B" else HUNYUAN_TINY
    interpret = interpret or model_cfg.head_dim % 128 != 0
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    grid = HUNYUAN_GEOMETRY.tokens((args.num_frames, args.height, args.width))
    if args.model == "hunyuan-tiny":
        attn_cfg = AttentionConfig(
            latent_shape=grid, sta_window=(3, 3, 3), sta_tile=(2, 2, 2),
            lowres_window=(2, 2, 2), block_q=32, block_kv=32,
            sta_block_q=8, sta_block_kv=8, tau_sparse=args.tau_sparse,
        )
    else:
        attn_cfg = AttentionConfig(
            latent_shape=grid, sta_window=(3, 3, 3), sta_tile=(6, 9, 8),
            lowres_window=(2, 3, 2), tau_sparse=args.tau_sparse,
        )
    if args.resume_dir and (Path(args.resume_dir) / "config.json").exists():
        attn_cfg = AttentionConfig.load(Path(args.resume_dir) / "config.json")
    if args.qk_int8:
        import dataclasses as _dc

        attn_cfg = _dc.replace(attn_cfg, qk_int8=True)

    print(f"[sample] model={args.model} grid={grid} routing="
          f"{'off' if args.native_attention else 'hard'} backend={jax.default_backend()}")
    qblocks = None
    if args.quantize_blocks:
        from vorta_tpu.io.quant_serving import build_quantized_hunyuan

        model, qblocks = build_quantized_hunyuan(
            model_cfg, bits=int(args.quantize_blocks[3:]),
            checkpoint=args.torch_checkpoint,
            router_checkpoint=args.router_checkpoint, dtype=dtype,
        )
    else:
        model = HunyuanModel(model_cfg, dtype=dtype, param_dtype=dtype, rngs=nnx.Rngs(0))
    if args.torch_checkpoint and not args.quantize_blocks:
        from vorta_tpu.io.torch_import import load_hunyuan_torch_weights

        applied, missing = load_hunyuan_torch_weights(model, args.torch_checkpoint)
        print(f"[sample] imported {len(applied)} tensors ({len(missing)} missing)")
    if args.router_checkpoint and not args.quantize_blocks:
        rp = Path(args.router_checkpoint)
        if rp.suffix in (".pt", ".bin", ".safetensors"):
            from vorta_tpu.io.torch_import import load_hunyuan_router_torch_checkpoint

            applied, _ = load_hunyuan_router_torch_checkpoint(model, rp)
            print(f"[sample] hunyuan routers imported ({len(applied)} tensors)")
        else:
            from vorta_tpu.io.checkpoint import load_router_checkpoint
            from vorta_tpu.training.step import router_partition

            graphdef, router_state, frozen = router_partition(model)
            router_state, _ = load_router_checkpoint(rp, router_state)
            nnx.update(model, router_state)
        print(f"[sample] router loaded from {args.router_checkpoint}")

    import numpy as np

    text = mask = pooled = None
    if args.prompt and args.tokenizer_dir:
        from vorta_tpu.io.text import encode_prompt_hunyuan, load_tokenizer
        from vorta_tpu.models.text_encoders import (
            CLIPTextConfig, CLIPTextEncoder, LlamaConfig, LlamaTextEncoder,
        )

        ltok = load_tokenizer(args.tokenizer_dir)
        ctok = load_tokenizer(args.clip_tokenizer_dir or args.tokenizer_dir)
        if model_cfg.text_dim == 4096:
            lcfg, ccfg = LlamaConfig(), CLIPTextConfig()
        else:  # tiny smoke models: match the DiT's conditioning dims
            lcfg = LlamaConfig(vocab_size=512, dim=model_cfg.text_dim,
                               num_layers=2, num_heads=2, num_kv_heads=2,
                               ffn_dim=2 * model_cfg.text_dim)
            ccfg = CLIPTextConfig(vocab_size=512, dim=model_cfg.pooled_dim,
                                  num_layers=2, num_heads=2,
                                  ffn_dim=2 * model_cfg.pooled_dim, max_len=77)
        llama = LlamaTextEncoder(lcfg, dtype=dtype, param_dtype=dtype,
                                 rngs=nnx.Rngs(0))
        clip = CLIPTextEncoder(ccfg, dtype=dtype, param_dtype=dtype,
                               rngs=nnx.Rngs(1))
        if args.text_encoder_checkpoint:
            from vorta_tpu.io.torch_import import load_llama_torch_weights

            load_llama_torch_weights(llama, args.text_encoder_checkpoint)
        if args.clip_checkpoint:
            from vorta_tpu.io.torch_import import load_clip_text_torch_weights

            load_clip_text_torch_weights(clip, args.clip_checkpoint)
        if not (args.text_encoder_checkpoint and args.clip_checkpoint):
            print("[sample] WARNING: encoding with random text-encoder weights")
        text, mask, pooled = encode_prompt_hunyuan(
            args.prompt, ltok, llama, ctok, clip, max_len=model_cfg.text_len)
    elif args.random_embeds:
        text = jax.random.normal(
            jax.random.PRNGKey(args.seed + 1), (1, model_cfg.text_len, model_cfg.text_dim))
        pooled = jax.random.normal(jax.random.PRNGKey(args.seed + 2), (1, model_cfg.pooled_dim))
        mask = jnp.ones((1, model_cfg.text_len), bool)
    elif args.prompt_embeds:
        arr = load_embeds(args.prompt_embeds, model_cfg)
        text = jnp.asarray(arr)
        pooled = text[:, 0, : model_cfg.pooled_dim]
        mask = jnp.any(text != 0, axis=-1)
    elif not args.prompt_embeds_dir:
        raise SystemExit("need --prompt, --prompt_embeds, --prompt_embeds_dir "
                         "or --random_embeds")

    vae = None
    if args.decode:
        from vorta_tpu.models.hunyuan_vae import (
            HUNYUAN_VAE,
            HUNYUAN_VAE_TINY,
            HunyuanVAE,
        )

        vae_cfg = HUNYUAN_VAE if args.model == "hunyuan-13B" else HUNYUAN_VAE_TINY
        vae = HunyuanVAE(vae_cfg, dtype=dtype, rngs=nnx.Rngs(0))
        if args.vae_checkpoint:
            from vorta_tpu.io.torch_import import load_hunyuan_vae_torch_weights

            applied, _ = load_hunyuan_vae_torch_weights(vae, args.vae_checkpoint)
            print(f"[sample] VAE imported ({len(applied)} tensors)")
    pipe = HunyuanT2VPipeline(
        model, attn_cfg=attn_cfg, interpret=interpret,
        mesh=make_mesh_or_none(args), vae=vae, act_scales=load_act_scales(args),
        quantized_blocks=qblocks,
    )
    sampling = HunyuanSamplingConfig(
        num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale,
        flow_shift=args.flow_shift,
        scheduler=args.scheduler or "euler",  # reference hunyuan default
        routing_mode="off" if args.native_attention else "hard",
        mm_precision=args.mm,
        cfg_batch=args.cfg_batch,
        cache_threshold=args.cache_threshold,
        cache_warmup=args.cache_warmup,
        cache_coefficients=load_cache_poly(args),
    )

    def generate(text, mask, pooled, out):
        latents = pipe.prepare_latents(
            jax.random.PRNGKey(args.seed), 1, args.num_frames, args.height, args.width)
        t0 = time.time()
        final = pipe(latents, text, mask, pooled, sampling=sampling)
        final.block_until_ready()
        print(f"[sample] denoised in {time.time() - t0:.1f}s")
        out.parent.mkdir(parents=True, exist_ok=True)
        if args.decode:
            from vorta_tpu.io.video import save_video

            # tiled decode bounds HBM at 720p x 129f (reference enables VAE
            # tiling for hunyuan: scripts/hunyuan/inference.py:100)
            video = pipe.decode(final, tiled=args.vae_tiling)
            save_video(np.asarray(video[0], dtype=np.float32), out)
        else:
            np.save(out.with_suffix(".npy"), np.asarray(final))
        print(f"[sample] wrote {out}")

    if args.prompt_embeds_dir:
        def load_fn(path):
            return jnp.asarray(load_embeds(path, model_cfg))

        def gen_wrap(pe, ne, out):
            pooled = pe[:, 0, : model_cfg.pooled_dim]
            mask = jnp.any(pe != 0, axis=-1)
            generate(pe, mask, pooled, out)

        run_batch(args, gen_wrap, load_fn)
    else:
        generate(text, mask, pooled, Path(args.output))

if __name__ == "__main__":
    main()
