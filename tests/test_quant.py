"""Weight-only quantization (ops/quant) roundtrip + tree machinery."""

import numpy as np
import jax
import jax.numpy as jnp

from vorta_tpu.ops.quant import (
    QTensor,
    dequantize,
    dequantize_tree,
    quantize_stacked_tree,
    quantized_bytes,
)


def test_int8_roundtrip_error():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((4, 16, 32)).astype(np.float32)
    qt = quantize_stacked_tree({"w": w}, bits=8, min_bytes=0)["w"]
    assert isinstance(qt, QTensor) and qt.q.dtype == np.int8
    back = np.asarray(dequantize(qt))
    # symmetric per-channel int8: max error <= scale/2
    scale = np.abs(w).max(axis=1, keepdims=True) / 127.0
    assert np.all(np.abs(back - w) <= scale / 2 + 1e-7)


def test_int4_roundtrip_error_and_packing():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((4, 16, 32)).astype(np.float32)
    qt = quantize_stacked_tree({"w": w}, bits=4, min_bytes=0)["w"]
    assert qt.q.dtype == np.int32 and qt.q.shape == (4, 2, 32)  # 8 nibbles/word
    back = np.asarray(dequantize(qt))
    scale = np.abs(w).max(axis=1, keepdims=True) / 7.0
    assert np.all(np.abs(back - w) <= scale / 2 + 1e-7)
    assert quantized_bytes({"w": qt}) < w.nbytes // 4  # int4 + per-channel scales


def test_scan_slicing_dequantizes_per_layer():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((3, 8, 16)).astype(np.float32)
    tree = quantize_stacked_tree({"w": w, "small": np.ones((3, 4), np.float32)},
                                 bits=4, min_bytes=0)
    assert isinstance(tree["small"], np.ndarray)  # too small / 2-D: untouched

    def body(c, sl):
        dq = dequantize_tree(sl)
        return c + dq["w"].sum() + dq["small"].sum(), dq["w"]

    tree_j = jax.tree.map(jnp.asarray, tree)  # QTensor is a pytree node
    total, per_layer = jax.lax.scan(body, jnp.zeros(()), tree_j)
    ref = dequantize(tree_j["w"])
    np.testing.assert_allclose(np.asarray(per_layer), np.asarray(ref), rtol=1e-6)


def test_bfloat16_leaf():
    import ml_dtypes

    w = np.asarray(np.random.default_rng(3).standard_normal((2, 8, 16)),
                   ml_dtypes.bfloat16)
    qt = quantize_stacked_tree({"w": w}, bits=4, min_bytes=0)["w"]
    back = dequantize(qt)
    assert back.dtype == jnp.bfloat16


def test_wan_quantized_blocks_forward_matches_dequantized():
    """model(quantized_blocks=...) == forward with host-dequantized weights."""
    from flax import nnx

    from vorta_tpu.config import AttentionConfig, WanModelConfig
    from vorta_tpu.models.wan import WanModel

    cfg = WanModelConfig(
        dim=64, ffn_dim=128, num_heads=2, head_dim=32, num_layers=2,
        text_dim=32, text_len=8, freq_dim=32,
    )
    attn = AttentionConfig(
        latent_shape=(2, 4, 4), sta_window=(3, 3, 1), sta_tile=(1, 2, 2),
        lowres_window=(2, 2, 2), block_q=8, block_kv=8,
        sta_block_q=4, sta_block_kv=4,
    )
    model = WanModel(cfg, rngs=nnx.Rngs(0))
    latents = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 2, 8, 8, cfg.in_channels)),
        jnp.float32)
    ctx = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, cfg.text_len, cfg.text_dim)),
        jnp.float32)
    t = jnp.asarray([500.0])

    gd, bstate = nnx.split(model.blocks)
    host = jax.tree.map(np.asarray, bstate)
    qtree = jax.tree.map(jnp.asarray, quantize_stacked_tree(host, bits=8, min_bytes=0))

    out_q = model(latents, t, ctx, attn_cfg=attn, routing_mode="off",
                  interpret=True, quantized_blocks=qtree).sample

    deq = dequantize_tree(qtree)
    nnx.update(model.blocks, deq)
    out_ref = model(latents, t, ctx, attn_cfg=attn, routing_mode="off",
                    interpret=True).sample
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)


def test_hunyuan_quantized_blocks_forward_matches_dequantized():
    from flax import nnx

    from vorta_tpu.config import AttentionConfig
    from vorta_tpu.models.hunyuan import HUNYUAN_TINY, HunyuanModel

    cfg = HUNYUAN_TINY
    attn = AttentionConfig(
        latent_shape=(4, 4, 4), sta_window=(3, 3, 1), sta_tile=(2, 2, 2),
        lowres_window=(2, 2, 2), block_q=16, block_kv=16,
        sta_block_q=8, sta_block_kv=8,
    )
    model = HunyuanModel(cfg, rngs=nnx.Rngs(0))
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.standard_normal((1, 4, 8, 8, cfg.in_channels)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)), jnp.float32)
    mask = jnp.ones((1, cfg.text_len), bool)
    pooled = jnp.asarray(rng.standard_normal((1, cfg.pooled_dim)), jnp.float32)
    t = jnp.asarray([500.0])

    qtrees = []
    for mod in (model.dual_blocks, model.single_blocks):
        _, bstate = nnx.split(mod)
        host = jax.tree.map(np.asarray, bstate)
        qtrees.append(jax.tree.map(jnp.asarray,
                                   quantize_stacked_tree(host, bits=8, min_bytes=0)))

    out_q = model(lat, t, text, mask, pooled, attn_cfg=attn, routing_mode="off",
                  interpret=True, quantized_blocks=tuple(qtrees)).sample

    for mod, qt in zip((model.dual_blocks, model.single_blocks), qtrees):
        nnx.update(mod, dequantize_tree(qt))
    out_ref = model(lat, t, text, mask, pooled, attn_cfg=attn, routing_mode="off",
                    interpret=True).sample
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)


def test_qtensor_depth_slice_consistency():
    """Slicing a quantized stack's leading (layer) dim preserves dequant
    values for the kept layers (the 13B bench --depth_frac mechanism)."""
    import jax
    from vorta_tpu.ops.quant import QTensor, dequantize, quantize_stacked_tree

    rng = np.random.default_rng(0)
    w = rng.standard_normal((4, 16, 32)).astype(np.float32)
    qt = quantize_stacked_tree({"w": w}, bits=4, min_bytes=0)["w"]
    assert isinstance(qt, QTensor)
    full = np.asarray(dequantize(qt))
    l2 = 2
    sliced = QTensor(q=qt.q[:l2], scale=qt.scale[:l2],
                     shape=(l2,) + tuple(qt.shape[1:]), dtype=qt.dtype,
                     bits=qt.bits)
    np.testing.assert_array_equal(np.asarray(dequantize(sliced)), full[:l2])
