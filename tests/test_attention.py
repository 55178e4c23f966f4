import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vorta_tpu.geometry import expand_tile_mask, sta_tile_mask
from vorta_tpu.ops.attention_ref import (
    attention_chunked,
    attention_dense,
    expand_block_mask,
)
from vorta_tpu.ops.flash import (
    BlockTables,
    dense_tables,
    make_sparse_attention,
    sparse_flash_attention_raw,
    tables_from_block_mask,
)

BQ = BKV = 8


def rand_qkv(key, b=1, h=2, sq=32, skv=32, d=8, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, sq, d), dtype)
    k = jax.random.normal(kk, (b, h, skv, d), dtype)
    v = jax.random.normal(kv, (b, h, skv, d), dtype)
    return q, k, v


def test_chunked_matches_dense():
    q, k, v = rand_qkv(jax.random.PRNGKey(0))
    ref = attention_dense(q, k, v)
    out = attention_chunked(q, k, v, block_q=BQ, block_kv=BKV)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_chunked_with_block_mask():
    q, k, v = rand_qkv(jax.random.PRNGKey(1))
    h, nq, nkv = 2, 4, 4
    rng = np.random.default_rng(0)
    bm = rng.random((h, nq, nkv)) < 0.5
    bm[:, :, 0] = True  # no fully-masked rows
    out = attention_chunked(q, k, v, block_mask=jnp.asarray(bm), block_q=BQ, block_kv=BKV)
    ref = attention_dense(q, k, v, mask=expand_block_mask(jnp.asarray(bm), BQ, BKV))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_chunked_kv_valid_len():
    q, k, v = rand_qkv(jax.random.PRNGKey(2))
    valid = 27
    out = attention_chunked(q, k, v, block_q=BQ, block_kv=BKV, kv_valid_len=valid)
    ref = attention_dense(q, k[:, :, :valid], v[:, :, :valid])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pallas_dense_matches_oracle():
    q, k, v = rand_qkv(jax.random.PRNGKey(3))
    tab = dense_tables(4, 4)
    out = sparse_flash_attention_raw(
        q, k, v, jnp.asarray(tab.kv_index), jnp.asarray(tab.kv_count),
        block_q=BQ, block_kv=BKV, interpret=True,
    )
    ref = attention_dense(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pallas_sparse_matches_masked_oracle():
    q, k, v = rand_qkv(jax.random.PRNGKey(4))
    rng = np.random.default_rng(1)
    bm = rng.random((2, 4, 4)) < 0.6
    bm[:, :, 1] = True
    tab = tables_from_block_mask(bm)
    out = sparse_flash_attention_raw(
        q, k, v, jnp.asarray(tab.kv_index), jnp.asarray(tab.kv_count),
        block_q=BQ, block_kv=BKV, interpret=True,
    )
    ref = attention_dense(q, k, v, mask=expand_block_mask(jnp.asarray(bm), BQ, BKV))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pallas_per_head_tables():
    # head 0 dense, head 1 only sees kv block 2: per-head tables in one call
    q, k, v = rand_qkv(jax.random.PRNGKey(5))
    bm = np.zeros((2, 4, 4), dtype=bool)
    bm[0] = True
    bm[1, :, 2] = True
    tab = tables_from_block_mask(bm)
    out = sparse_flash_attention_raw(
        q, k, v, jnp.asarray(tab.kv_index), jnp.asarray(tab.kv_count),
        block_q=BQ, block_kv=BKV, interpret=True,
    )
    ref = attention_dense(q, k, v, mask=expand_block_mask(jnp.asarray(bm), BQ, BKV))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pallas_kv_valid_len():
    q, k, v = rand_qkv(jax.random.PRNGKey(6))
    valid = 27
    tab = dense_tables(4, 4)
    out = sparse_flash_attention_raw(
        q, k, v, jnp.asarray(tab.kv_index), jnp.asarray(tab.kv_count),
        block_q=BQ, block_kv=BKV, kv_valid_len=valid, interpret=True,
    )
    ref = attention_dense(q, k[:, :, :valid], v[:, :, :valid])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pallas_traced_tables():
    # tables as traced (data-dependent) arrays inside jit — the routed path
    q, k, v = rand_qkv(jax.random.PRNGKey(7))
    tab = dense_tables(4, 4)

    @jax.jit
    def f(q, k, v, idx, cnt):
        return sparse_flash_attention_raw(
            q, k, v, idx, cnt, block_q=BQ, block_kv=BKV, interpret=True
        )

    out = f(q, k, v, jnp.asarray(tab.kv_index), jnp.asarray(tab.kv_count))
    ref = attention_dense(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_sta_tables_match_dense_mask():
    # end-to-end STA geometry: tiled sequence + tables vs dense element mask
    latent, window, tile = (4, 4, 4), (3, 3, 1), (2, 2, 2)
    tokens_per_tile = 8
    tile_mask = sta_tile_mask(latent, window, tile)
    bm = expand_tile_mask(tile_mask, tokens_per_tile, BQ, BKV)
    s = int(np.prod(latent))
    q, k, v = rand_qkv(jax.random.PRNGKey(8), sq=s, skv=s)
    tab = tables_from_block_mask(bm)
    out = sparse_flash_attention_raw(
        q, k, v, jnp.asarray(tab.kv_index), jnp.asarray(tab.kv_count),
        block_q=BQ, block_kv=BKV, interpret=True,
    )
    ref = attention_dense(
        q, k, v, mask=expand_block_mask(jnp.asarray(bm[None]), BQ, BKV)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_make_sparse_attention_grad():
    q, k, v = rand_qkv(jax.random.PRNGKey(9))
    rng = np.random.default_rng(2)
    bm = rng.random((1, 4, 4)) < 0.7
    bm[:, :, 0] = True
    tab = tables_from_block_mask(bm)
    attn = make_sparse_attention(
        tab, n_kv_blocks=4, block_q=BQ, block_kv=BKV, interpret=True
    )

    def loss(q, k, v):
        return jnp.sum(attn(q, k, v) ** 2)

    def ref_loss(q, k, v):
        m = expand_block_mask(jnp.asarray(bm), BQ, BKV)
        return jnp.sum(attention_dense(q, k, v, mask=m) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_block_tables_hashable():
    t1 = dense_tables(4, 4)
    t2 = dense_tables(4, 4)
    assert t1 == t2 and hash(t1) == hash(t2)
    t3 = dense_tables(4, 5)
    assert t1 != t3
