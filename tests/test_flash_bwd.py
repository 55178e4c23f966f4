"""Pallas backward kernels vs the chunked-XLA gradient oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vorta_tpu.ops.flash import (
    dense_tables,
    make_sparse_attention,
    tables_from_block_mask,
)
from vorta_tpu.ops.flash_bwd import transpose_tables


def grads_of(attn, q, k, v, seed=0):
    g_out = jax.random.normal(jax.random.PRNGKey(seed), q.shape, jnp.float32)

    def loss(q, k, v):
        return jnp.sum(attn(q, k, v).astype(jnp.float32) * g_out)

    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


def _rand_qkv(b=1, h=2, s=64, d=32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    mk = lambda k: jax.random.normal(k, (b, h, s, d), jnp.float32)
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


def test_transpose_tables_roundtrip():
    rng = np.random.default_rng(0)
    mask = rng.random((1, 6, 8)) < 0.4
    mask[:, :, 0] = True  # no empty rows
    tab = tables_from_block_mask(mask)
    q_index, q_count = transpose_tables(tab.kv_index, tab.kv_count, 8)
    # rebuild the mask from the transposed tables
    rebuilt = np.zeros((6, 8), bool)
    for j in range(8):
        for w in range(q_count[0, j]):
            rebuilt[q_index[0, j, w], j] = True
    np.testing.assert_array_equal(rebuilt, mask[0])


@pytest.mark.parametrize("sparse", [False, True])
def test_grads_match_xla_oracle(sparse):
    q, k, v = _rand_qkv(s=64, d=32)
    if sparse:
        rng = np.random.default_rng(1)
        mask = rng.random((1, 4, 4)) < 0.6
        mask[:, :, 0] = True
        tab = tables_from_block_mask(mask)
    else:
        tab = dense_tables(4, 4)
    kw = dict(n_kv_blocks=4, block_q=16, block_kv=16, interpret=True)
    attn_kernel = make_sparse_attention(tab, **kw)
    attn_xla = make_sparse_attention(tab, xla_bwd=True, **kw)

    out_k = attn_kernel(q, k, v)
    out_x = attn_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x), rtol=2e-4, atol=2e-4)

    gk = grads_of(attn_kernel, q, k, v)
    gx = grads_of(attn_xla, q, k, v)
    for a, b, name in zip(gk, gx, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3,
            err_msg=f"d{name} mismatch",
        )


def test_grads_with_kv_tail_masking():
    """kv_valid_len < padded length: padded kv must receive zero grads."""
    q, k, v = _rand_qkv(s=64, d=32)
    tab = dense_tables(4, 4)
    kw = dict(n_kv_blocks=4, block_q=16, block_kv=16, kv_valid_len=50,
              interpret=True)
    attn_kernel = make_sparse_attention(tab, **kw)
    attn_xla = make_sparse_attention(tab, xla_bwd=True, **kw)
    gk = grads_of(attn_kernel, q, k, v)
    gx = grads_of(attn_xla, q, k, v)
    for a, b, name in zip(gk, gx, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3,
            err_msg=f"d{name} mismatch",
        )
    assert np.all(np.asarray(gk[1])[:, :, 50:] == 0)
    assert np.all(np.asarray(gk[2])[:, :, 50:] == 0)


def test_soft_routed_training_grads_still_flow():
    """End-to-end: the soft-routing expert mix backprops through the new
    kernels (router-gradient path used by the train step)."""
    from vorta_tpu.config import AttentionConfig
    from vorta_tpu.ops.experts import routed_attention

    cfg = AttentionConfig(
        latent_shape=(4, 4, 4), sta_window=(3, 3, 1), sta_tile=(2, 2, 2),
        lowres_window=(2, 2, 2), block_q=16, block_kv=16,
        sta_block_q=8, sta_block_kv=8,
    )
    b, h, s, d = 1, 2, 64, 16
    q, k, v = _rand_qkv(b, h, s, d)
    scores = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(5), (b, h, 3)), axis=-1
    )

    def loss(scores):
        out = routed_attention(q, k, v, scores, cfg, mode="soft", interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(scores)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
