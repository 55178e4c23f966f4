"""Hunyuan causal 3D VAE + tiled decoding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vorta_tpu.models.hunyuan_vae import HUNYUAN_VAE_TINY, HunyuanVAE
from vorta_tpu.models.vae_tiling import tiled_decode


@pytest.fixture(scope="module")
def vae():
    return HunyuanVAE(HUNYUAN_VAE_TINY, rngs=nnx.Rngs(0))


def test_decode_shape_and_causal_frames(vae):
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 4, 4, 16))
    px = vae.decode(z)
    # 4(T-1)+1 frames, x8 spatial
    assert px.shape == (1, 9, 32, 32, 3)
    assert np.isfinite(np.asarray(px)).all()


def test_encode_shape(vae):
    video = jax.random.normal(jax.random.PRNGKey(1), (1, 9, 32, 32, 3))
    mean, logvar = vae.encode(video)
    assert mean.shape == (1, 3, 4, 4, 16)
    assert logvar.shape == mean.shape


def test_decode_conv_causality(vae):
    """The conv stack pads only the past; GroupNorm statistics span T (torch
    GroupNorm semantics), so causality is statistical, not strict: a late
    latent perturbation must move late frames far more than early ones."""
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 4, 16))
    z2 = z.at[:, -1].add(1.0)
    a = np.asarray(vae.decode(z))
    b = np.asarray(vae.decode(z2))
    early = np.abs(a[:, :5] - b[:, :5]).mean()
    late = np.abs(a[:, -4:] - b[:, -4:]).mean()
    assert late > 5 * early, (early, late)


def test_scaling_factor_denormalize(vae):
    z = jnp.ones((1, 1, 2, 2, 16))
    assert np.allclose(
        np.asarray(vae.denormalize_latents(z)), 1.0 / HUNYUAN_VAE_TINY.scaling_factor
    )


def _local_decode(z):
    """VAE-shaped linear, local decode stub: nearest-neighbour x8 spatial and
    the causal 4(T-1)+1 temporal pattern.  Because it is local, tiled and
    whole-clip decodes must agree EXACTLY, which pins tiled_decode's
    placement and blend-normalization logic."""
    px = jnp.mean(z, axis=-1, keepdims=True) * jnp.ones((1, 1, 1, 1, 3))
    px = jnp.repeat(jnp.repeat(px, 8, axis=2), 8, axis=3)
    px = jnp.repeat(px, 4, axis=1)[:, 3:]
    return px


def test_tiled_decode_matches_whole_for_local_decoder():
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 6, 12, 16, 4))
    whole = np.asarray(_local_decode(z))
    tiled = np.asarray(
        tiled_decode(_local_decode, z, tile_latent=(4, 6, 8),
                     overlap_latent=(2, 2, 4))
    )
    assert tiled.shape == whole.shape
    np.testing.assert_allclose(tiled, whole, rtol=1e-5, atol=1e-5)


def test_tiled_decode_vae_shape(vae):
    """Real (random-weight) VAE: tiling bounds memory; GroupNorm statistics
    are tile-local so values differ from whole-clip (same as diffusers'
    enable_tiling) — assert the shape/finiteness contract only."""
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 8, 8, 16)) * 0.1
    tiled = np.asarray(
        tiled_decode(
            lambda zz: vae.decode(zz, denormalize=False), z,
            tile_latent=(8, 6, 6), overlap_latent=(2, 4, 4),
        )
    )
    assert tiled.shape == (1, 5, 64, 64, 3)
    assert np.isfinite(tiled).all()


def test_tiled_decode_single_tile_exact(vae):
    z = jax.random.normal(jax.random.PRNGKey(4), (1, 2, 4, 4, 16))
    whole = np.asarray(vae.decode(z, denormalize=False))
    tiled = np.asarray(
        tiled_decode(lambda zz: vae.decode(zz, denormalize=False), z)
    )
    np.testing.assert_allclose(tiled, whole, rtol=1e-5, atol=1e-5)


def test_pipeline_decode_stage():
    from vorta_tpu.config import AttentionConfig
    from vorta_tpu.models.hunyuan import HUNYUAN_TINY, HunyuanModel
    from vorta_tpu.pipelines.hunyuan_t2v import (
        HunyuanSamplingConfig,
        HunyuanT2VPipeline,
    )

    cfg = HUNYUAN_TINY
    model = HunyuanModel(cfg, rngs=nnx.Rngs(0))
    vae = HunyuanVAE(HUNYUAN_VAE_TINY, rngs=nnx.Rngs(1))
    attn = AttentionConfig(
        latent_shape=(2, 2, 2), sta_window=(3, 3, 1), sta_tile=(2, 2, 2),
        lowres_window=(2, 2, 2), block_q=8, block_kv=8,
        sta_block_q=8, sta_block_kv=8,
    )
    pipe = HunyuanT2VPipeline(model, attn_cfg=attn, interpret=True, vae=vae)
    key = jax.random.PRNGKey(0)
    latents = pipe.prepare_latents(key, 1, frames=5, height=32, width=32)
    text = jax.random.normal(key, (1, cfg.text_len, cfg.text_dim))
    mask = jnp.ones((1, cfg.text_len), bool)
    pooled = jax.random.normal(key, (1, cfg.pooled_dim))
    out = pipe(latents, text, mask, pooled,
               sampling=HunyuanSamplingConfig(num_inference_steps=2))
    px = pipe.decode(out)
    assert px.shape == (1, 5, 32, 32, 3)
    assert np.isfinite(np.asarray(px)).all()


def test_pipeline_unipc_scheduler_runs():
    from vorta_tpu.config import AttentionConfig
    from vorta_tpu.models.hunyuan import HUNYUAN_TINY, HunyuanModel
    from vorta_tpu.pipelines.hunyuan_t2v import (
        HunyuanSamplingConfig,
        HunyuanT2VPipeline,
    )

    cfg = HUNYUAN_TINY
    model = HunyuanModel(cfg, rngs=nnx.Rngs(0))
    attn = AttentionConfig(
        latent_shape=(2, 2, 2), sta_window=(3, 3, 1), sta_tile=(2, 2, 2),
        lowres_window=(2, 2, 2), block_q=8, block_kv=8,
        sta_block_q=8, sta_block_kv=8,
    )
    pipe = HunyuanT2VPipeline(model, attn_cfg=attn, interpret=True)
    key = jax.random.PRNGKey(0)
    latents = pipe.prepare_latents(key, 1, frames=5, height=32, width=32)
    text = jax.random.normal(key, (1, cfg.text_len, cfg.text_dim))
    mask = jnp.ones((1, cfg.text_len), bool)
    pooled = jax.random.normal(key, (1, cfg.pooled_dim))
    out = pipe(latents, text, mask, pooled,
               sampling=HunyuanSamplingConfig(num_inference_steps=3,
                                              scheduler="unipc"))
    assert np.isfinite(np.asarray(out)).all()


def test_tiled_decode_no_seam_discontinuity():
    """A decode stub returning its tile's mean exposes blend discontinuities:
    adjacent tiles produce different constants, and the crossfade must
    transition between them smoothly (the old one-sided ramp left a jump of
    half the difference at each tile boundary)."""
    def const_decode(z):
        px = jnp.mean(z) * jnp.ones((z.shape[0], 4 * (z.shape[1] - 1) + 1,
                                     8 * z.shape[2], 8 * z.shape[3], 3))
        return px

    # latent gradient along w -> neighbouring tiles decode to different values
    z = jnp.broadcast_to(
        jnp.linspace(0.0, 1.0, 16)[None, None, None, :, None], (1, 2, 4, 16, 4)
    )
    tiled = np.asarray(tiled_decode(const_decode, z, tile_latent=(2, 4, 8),
                                    overlap_latent=(1, 2, 4)))
    along_w = np.abs(np.diff(tiled[0, 0, 0, :, 0]))
    total_span = tiled[0, 0, 0, :, 0].max() - tiled[0, 0, 0, :, 0].min()
    # smooth crossfade: largest single-pixel step stays far below the
    # half-difference jump the one-sided blend produced
    assert along_w.max() < 0.25 * total_span, (along_w.max(), total_span)
