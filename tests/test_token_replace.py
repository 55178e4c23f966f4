"""Hunyuan I2V token-replace conditioning (reference modeling_hunyuan.py:
206,264-341,633-641): first-frame tokens get the t=0 AdaLN embedding."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

from vorta_tpu.config import AttentionConfig
from vorta_tpu.models.hunyuan import HUNYUAN_TINY, HunyuanModel

ATTN = AttentionConfig(
    latent_shape=(4, 4, 4), sta_window=(3, 3, 1), sta_tile=(2, 2, 2),
    lowres_window=(2, 2, 2), block_q=16, block_kv=16,
    sta_block_q=8, sta_block_kv=8,
)


def _inputs(cfg, seed=0):
    rng = np.random.default_rng(seed)
    lat = jnp.asarray(rng.standard_normal((1, 4, 8, 8, cfg.in_channels)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)), jnp.float32)
    mask = jnp.ones((1, cfg.text_len), bool)
    pooled = jnp.asarray(rng.standard_normal((1, cfg.pooled_dim)), jnp.float32)
    return lat, text, mask, pooled


def _models():
    cfg_tr = dataclasses.replace(HUNYUAN_TINY, image_condition_type="token_replace",
                                 guidance_embeds=False)
    cfg_off = dataclasses.replace(HUNYUAN_TINY, guidance_embeds=False)
    m_tr = HunyuanModel(cfg_tr, rngs=nnx.Rngs(0))
    m_off = HunyuanModel(cfg_off, rngs=nnx.Rngs(0))
    return m_tr, m_off, cfg_tr


def test_identity_at_t0():
    """At timestep 0 (no guidance) tr_emb == temb, so token-replace must be
    a no-op relative to the plain model."""
    m_tr, m_off, cfg = _models()
    lat, text, mask, pooled = _inputs(cfg)
    t = jnp.asarray([0.0])
    a = m_tr(lat, t, text, mask, pooled, attn_cfg=ATTN, routing_mode="off",
             interpret=True).sample
    b = m_off(lat, t, text, mask, pooled, attn_cfg=ATTN, routing_mode="off",
              interpret=True).sample
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_changes_output_at_nonzero_t():
    m_tr, m_off, cfg = _models()
    lat, text, mask, pooled = _inputs(cfg)
    t = jnp.asarray([500.0])
    a = m_tr(lat, t, text, mask, pooled, attn_cfg=ATTN, routing_mode="off",
             interpret=True).sample
    b = m_off(lat, t, text, mask, pooled, attn_cfg=ATTN, routing_mode="off",
              interpret=True).sample
    assert np.isfinite(np.asarray(a)).all()
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-5


def test_sp_matches_single_device():
    """token-replace first-frame mask is computed with the global position
    (the reference's SP + token-replace combination mis-conditions rank>0)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from vorta_tpu.parallel.mesh import make_mesh

    m_tr, _, cfg = _models()
    lat, text, mask, pooled = _inputs(cfg)
    t = jnp.asarray([500.0])
    ref = m_tr(lat, t, text, mask, pooled, attn_cfg=ATTN, routing_mode="hard",
               interpret=True).sample

    mesh = make_mesh(sp_size=2, dp_size=1)
    graphdef, state = nnx.split(m_tr)

    def fwd(state, lat, text, mask, pooled):
        m = nnx.merge(graphdef, state)
        return m(lat, t, text, mask, pooled, attn_cfg=ATTN, routing_mode="hard",
                 interpret=True, sp_axis="sp").sample

    out = shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), P(None, "sp"), P(), P(), P()),
        out_specs=P(None, "sp"),
        check_vma=False,
    )(state, lat, text, mask, pooled)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)
