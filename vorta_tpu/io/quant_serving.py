"""Build servable over-HBM model stacks: depth-1 device model + quantized
block weights.

The reference serves Wan-14B / Hunyuan-13B on one GPU via model CPU offload
(scripts/wan/inference.py:156-162).  The TPU-native equivalent keeps the
stacked frozen block weights resident in HBM at int4/int8 (ops/quant) and
dequantizes one block per scan step inside the denoise jit.  This module is
the serving-side assembly: it produces

  (depth1_model, quantized_blocks)

ready for ``WanT2VPipeline(..., quantized_blocks=...)`` /
``HunyuanT2VPipeline(..., quantized_blocks=...)``.  The depth-1 model carries
the non-block modules (embedders, head) on device in bf16 and supplies the
per-block graphdef; its own block weights are placeholders the quantized
stack overrides.

All full-depth weight materialization happens HOST-SIDE in numpy — a 14B
bf16 model never touches the chip, only its ~7 GB int4 image does.  With a
torch checkpoint the real weights are imported (reusing the torch_import
key mapping, including the half-RoPE column permutation); without one the
stack is random-init (speed benchmarking / smoke runs).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


def _host_random_state(abs_state, seed: int, scale: float = 0.05):
    """Fill an abstract (eval_shape) state with small host-side uniform noise.

    Uniform instead of normal: ~10x faster at 1e10 elements and the values
    only matter for speed benchmarks."""
    rng = np.random.default_rng(seed)

    def init(leaf):
        arr = (rng.random(leaf.shape, dtype=np.float32) - 0.5) * scale
        # stay f32 on host for bf16 targets: quantize records the dequant
        # dtype separately; exotic dtypes cast here
        if leaf.dtype not in (jnp.bfloat16, jnp.float32):
            arr = arr.astype(np.dtype(leaf.dtype))
        return arr

    return jax.tree.map(init, abs_state)


def _overwrite_from_tree(state, tree: dict, path: str = ""):
    """Copy host numpy arrays from an importer dict tree into a host state
    (same key layout as io.torch_import._apply_tree, but pure host arrays)."""
    applied, missing = [], []

    def rec(st, tr, p):
        for k, v in tr.items():
            kk = k if k in st else None
            if kk is None and isinstance(k, str) and k.isdigit() and int(k) in st:
                kk = int(k)
            if kk is None:
                missing.append(f"{p}{k}")
                continue
            if isinstance(v, dict):
                rec(st[kk], v, f"{p}{k}.")
            else:
                cur = st[kk]
                target = cur[...] if hasattr(cur, "set_value") else cur
                if tuple(np.shape(target)) != tuple(np.shape(v)):
                    raise ValueError(
                        f"shape mismatch at {p}{k}: model {np.shape(target)} "
                        f"vs import {np.shape(v)}"
                    )
                arr = np.asarray(v, dtype=np.float32)
                if hasattr(cur, "set_value"):
                    cur.set_value(arr)
                else:
                    st[kk] = arr
                applied.append(f"{p}{k}")

    rec(state, tree, path)
    return applied, missing


def _merge_router_npz(host_state, path: str, loaded_prefix: str):
    """Merge a tools/train_bench_router.py npz (stacked full-model-state key
    paths, e.g. ``['blocks']['router']['linear']['kernel'].value``) into a
    blocks-only host state by key-path suffix match."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(host_state)
    leaves, loaded = [], 0
    for kp, leaf in flat:
        key = jax.tree_util.keystr(kp)
        hit = None
        if "router" in key:
            for f in data.files:
                if f.endswith(key) and f.startswith(loaded_prefix):
                    hit = f
                    break
        if hit is not None:
            arr = np.asarray(data[hit], np.float32)
            if arr.shape != np.shape(leaf):
                raise ValueError(f"router npz shape mismatch at {key}: "
                                 f"{arr.shape} vs {np.shape(leaf)}")
            leaves.append(arr)
            loaded += 1
        else:
            leaves.append(leaf)
    if loaded == 0:
        raise ValueError(f"no router keys matched in {path}")
    return jax.tree_util.tree_unflatten(treedef, leaves), loaded


def _quantize_and_put(host_state, bits: int):
    import ml_dtypes

    from ..ops.quant import quantize_stacked_tree, quantized_bytes

    qtree = quantize_stacked_tree(host_state, bits=bits,
                                  out_dtype=ml_dtypes.bfloat16)
    nbytes = quantized_bytes(qtree)
    qtree = jax.tree.map(jnp.asarray, qtree)
    jax.block_until_ready(jax.tree.leaves(qtree))
    return qtree, nbytes


def _random_quantized_tiled(abs_blocks, depth: int, bits: int, seed: int):
    """Random-init fast path: init + quantize ONE layer host-side, tile it
    across the depth, device_put.  ~40x faster than full-random init (a 14B
    f32 init is ~56 GB / ~55 min of host time); values only matter for
    speed smoke runs, and routers merged afterwards still differ per layer.
    Returns the device qtree."""
    from ..ops.quant import QTensor

    abs1 = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct((1,) + a.shape[1:], a.dtype), abs_blocks
    )
    # min_bytes scaled by 1/depth: the threshold is defined on the FULL
    # (depth, ...) stack; quantizing a depth-1 slice must make the same
    # quantized/unquantized decision per leaf as the checkpoint path.
    q1, _ = _quantize_and_put_host(
        _host_random_state(abs1, seed), bits,
        min_bytes=max(1, (1 << 22) // depth))

    def tile(leaf):
        if isinstance(leaf, QTensor):
            return QTensor(
                q=np.repeat(np.asarray(leaf.q), depth, axis=0),
                scale=np.repeat(np.asarray(leaf.scale), depth, axis=0),
                shape=(depth,) + tuple(leaf.shape[1:]),
                dtype=leaf.dtype, bits=leaf.bits)
        return np.repeat(np.asarray(leaf), depth, axis=0)

    return jax.tree.map(tile, q1, is_leaf=lambda x: isinstance(x, QTensor))


def _quantize_and_put_host(host_state, bits: int, min_bytes: int = 1 << 22):
    """quantize_stacked_tree without the device_put (host numpy qtree)."""
    import ml_dtypes

    from ..ops.quant import quantize_stacked_tree, quantized_bytes

    qtree = quantize_stacked_tree(host_state, bits=bits, min_bytes=min_bytes,
                                  out_dtype=ml_dtypes.bfloat16)
    return qtree, quantized_bytes(qtree)


def _cast_unquantized_to(tree, dtype=None):
    """Cast non-QTensor floating leaves (routers, norms, biases) to the
    serving dtype — mirrors quantize_stacked_tree's out_dtype cast so the
    random-init fast path (which merges routers AFTER quantization) ends
    with the same leaf dtypes as the checkpoint path (merge-then-quantize)."""
    import ml_dtypes

    from ..ops.quant import QTensor

    dtype = ml_dtypes.bfloat16 if dtype is None else dtype

    def visit(leaf):
        if isinstance(leaf, QTensor):
            return leaf
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) or str(arr.dtype) == "bfloat16":
            return arr.astype(dtype)
        return leaf

    return jax.tree.map(visit, tree, is_leaf=lambda x: isinstance(x, QTensor))


def build_quantized_wan(
    cfg,
    bits: int = 4,
    checkpoint: Optional[str] = None,
    router_checkpoint: Optional[str] = None,
    seed: int = 0,
    dtype=jnp.bfloat16,
) -> Tuple[object, object]:
    """(depth-1 WanModel on device, quantized 40-block stack in HBM).

    Router weights ride the quantized stack (they are tiny and stay
    unquantized bf16 inside it).  ``router_checkpoint``: a reference-style
    router.pt (``blocks.N.router.linear.*`` keys) or a
    tools/train_bench_router.py npz, merged into the host stack BEFORE
    quantization.  Routers inside ``checkpoint`` itself (diffusers-format
    ``blocks.N.router.linear``) are picked up automatically."""
    from ..models.wan import WanModel

    cfg1 = dataclasses.replace(cfg, num_layers=1)
    model = WanModel(cfg1, dtype=dtype, param_dtype=dtype, rngs=nnx.Rngs(0))

    abs_model = nnx.eval_shape(
        lambda: WanModel(cfg, dtype=dtype, param_dtype=dtype, rngs=nnx.Rngs(0))
    )
    _, abs_blocks = nnx.split(abs_model.blocks)

    if checkpoint:
        host_blocks = _host_random_state(abs_blocks, seed)
        from .torch_import import load_state_dict, wan_state_dict_to_tree

        sd = load_state_dict(checkpoint)
        tree = wan_state_dict_to_tree(sd, cfg.num_layers, cfg.head_dim)
        blocks_tree = tree.pop("blocks")
        applied, missing = _overwrite_from_tree(host_blocks, blocks_tree)
        # non-block modules go straight onto the device model
        from .torch_import import _apply_tree

        _, state1 = nnx.split(model)
        a2, _ = _apply_tree(state1, tree)
        nnx.update(model, state1)
        print(f"[quant-serve] wan: {len(applied)} block tensors + "
              f"{len(a2)} non-block tensors imported ({len(missing)} missing)")
        stack = host_blocks
        quantize = True
    else:
        # random-init smoke/bench: one quantized layer tiled across depth
        # (host arrays; routers below still merge per-layer)
        stack = _random_quantized_tiled(abs_blocks, cfg.num_layers, bits, seed)
        quantize = False

    if router_checkpoint:
        rp = str(router_checkpoint)
        if rp.endswith(".npz"):
            stack, n = _merge_router_npz(stack, rp, "['blocks']")
        else:
            from .torch_import import _linear, _stack, load_state_dict

            rsd = {k.split("module.")[-1]: v
                   for k, v in load_state_dict(rp).items() if "router" in k}
            rtree = _stack([
                {"router": {"linear": _linear(rsd, f"blocks.{i}.router.linear")}}
                for i in range(cfg.num_layers)
            ])
            a, _ = _overwrite_from_tree(stack, rtree)
            n = len(a)
        print(f"[quant-serve] wan routers from {rp} ({n} tensors)")

    if quantize:
        qtree, nbytes = _quantize_and_put(stack, bits)
    else:
        from ..ops.quant import quantized_bytes

        stack = _cast_unquantized_to(stack)
        nbytes = quantized_bytes(stack)
        qtree = jax.tree.map(jnp.asarray, stack)
        jax.block_until_ready(jax.tree.leaves(qtree))
    print(f"[quant-serve] wan {cfg.num_layers}-block stack quantized to "
          f"int{bits}: {nbytes / 2**30:.2f} GiB in HBM")
    return model, qtree


def build_quantized_hunyuan(
    cfg,
    bits: int = 4,
    checkpoint: Optional[str] = None,
    router_checkpoint: Optional[str] = None,
    seed: int = 0,
    dtype=jnp.bfloat16,
) -> Tuple[object, object]:
    """(depth-(1,1) HunyuanModel on device, (dual, single) quantized stacks)."""
    from ..models.hunyuan import HunyuanModel

    cfg1 = dataclasses.replace(cfg, dual_layers=1, single_layers=1)
    model = HunyuanModel(cfg1, dtype=dtype, param_dtype=dtype, rngs=nnx.Rngs(0))

    abs_model = nnx.eval_shape(
        lambda: HunyuanModel(cfg, dtype=dtype, param_dtype=dtype,
                             rngs=nnx.Rngs(0))
    )
    _, abs_dual = nnx.split(abs_model.dual_blocks)
    _, abs_single = nnx.split(abs_model.single_blocks)
    if checkpoint:
        host_dual = _host_random_state(abs_dual, seed)
        host_single = _host_random_state(abs_single, seed + 1)
    else:
        # random-init smoke/bench fast path (see build_quantized_wan)
        host_dual = _random_quantized_tiled(abs_dual, cfg.dual_layers, bits, seed)
        host_single = _random_quantized_tiled(
            abs_single, cfg.single_layers, bits, seed + 1)

    if checkpoint:
        from .torch_import import (
            _apply_tree,
            hunyuan_state_dict_to_tree,
            load_state_dict,
        )

        sd = load_state_dict(checkpoint)
        tree = hunyuan_state_dict_to_tree(
            sd, cfg.dual_layers, cfg.single_layers, cfg.refiner_layers,
            cfg.head_dim,
        )
        a1, m1 = _overwrite_from_tree(host_dual, tree.pop("dual_blocks"))
        a2, m2 = _overwrite_from_tree(host_single, tree.pop("single_blocks"))
        _, state1 = nnx.split(model)
        a3, _ = _apply_tree(state1, tree)
        nnx.update(model, state1)
        print(f"[quant-serve] hunyuan: {len(a1)}+{len(a2)} block tensors + "
              f"{len(a3)} non-block tensors imported "
              f"({len(m1) + len(m2)} missing)")

    if router_checkpoint:
        rp = str(router_checkpoint)
        if rp.endswith(".npz"):
            host_dual, n1 = _merge_router_npz(host_dual, rp, "['dual_blocks']")
            host_single, n2 = _merge_router_npz(host_single, rp,
                                                "['single_blocks']")
        else:
            from .torch_import import _linear, _stack, load_state_dict

            rsd = {k.split("module.")[-1]: v
                   for k, v in load_state_dict(rp).items() if "router" in k}
            dt = _stack([
                {"router": {"linear": _linear(
                    rsd, f"transformer_blocks.{i}.router.linear")}}
                for i in range(cfg.dual_layers)
            ])
            st = _stack([
                {"router": {"linear": _linear(
                    rsd, f"single_transformer_blocks.{i}.router.linear")}}
                for i in range(cfg.single_layers)
            ])
            a1r, _ = _overwrite_from_tree(host_dual, dt)
            a2r, _ = _overwrite_from_tree(host_single, st)
            n1, n2 = len(a1r), len(a2r)
        print(f"[quant-serve] hunyuan routers from {rp} ({n1}+{n2} tensors)")

    if checkpoint:
        q_dual, nb1 = _quantize_and_put(host_dual, bits)
        q_single, nb2 = _quantize_and_put(host_single, bits)
    else:
        from ..ops.quant import quantized_bytes

        host_dual = _cast_unquantized_to(host_dual)
        host_single = _cast_unquantized_to(host_single)
        nb1, nb2 = quantized_bytes(host_dual), quantized_bytes(host_single)
        q_dual = jax.tree.map(jnp.asarray, host_dual)
        q_single = jax.tree.map(jnp.asarray, host_single)
        jax.block_until_ready(jax.tree.leaves((q_dual, q_single)))
    print(f"[quant-serve] hunyuan {cfg.dual_layers}+{cfg.single_layers} "
          f"stacks quantized to int{bits}: {(nb1 + nb2) / 2**30:.2f} GiB in HBM")
    return model, (q_dual, q_single)
