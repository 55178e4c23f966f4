"""Fused Pallas pool/unpool (ops/coreset_pallas) vs the XLA path (ops/coreset)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vorta_tpu.geometry import build_lowres_groups
from vorta_tpu.ops.coreset import Matching, pool_by_similarity, unpool_by_similarity
from vorta_tpu.ops.coreset_pallas import pool_qkv, unpool

LATENT = (4, 6, 16)
WINDOW = (2, 3, 2)


def _mk(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape), jnp.float32)


@pytest.mark.parametrize("kv_from_k", [False, True])
def test_pool_matches_xla(kv_from_k):
    groups = build_lowres_groups(LATENT, WINDOW)
    b, h, d = 1, 2, 32
    s = int(np.prod(LATENT))
    q, k, v = _mk((b, h, s, d), 0), _mk((b, h, s, d), 1), _mk((b, h, s, d), 2)

    pq, pk, pv = pool_qkv(q, k, v, groups, kv_matching_from_k=kv_from_k,
                          interpret=True)

    rq, m_q = pool_by_similarity(q, groups)
    if kv_from_k:
        rk, m_k = pool_by_similarity(k, groups)
        rv, _ = pool_by_similarity(v, groups, m_k)
    else:
        rk, _ = pool_by_similarity(k, groups, m_q)
        rv, _ = pool_by_similarity(v, groups, m_q)

    np.testing.assert_allclose(np.asarray(pq), np.asarray(rq), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pk), np.asarray(rk), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pv), np.asarray(rv), rtol=1e-5, atol=1e-5)


def test_unpool_matches_xla():
    groups = build_lowres_groups(LATENT, WINDOW)
    b, h, d = 1, 2, 32
    s = int(np.prod(LATENT))
    q = _mk((b, h, s, d), 3)
    attn_out = _mk((b, h, groups.pooled_length, d), 4)

    out = unpool(attn_out, q, groups, interpret=True)
    _, m_q = pool_by_similarity(q, groups)
    ref = unpool_by_similarity(attn_out, groups, m_q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_masked_heads_match_unmasked_and_zero():
    groups = build_lowres_groups(LATENT, WINDOW)
    b, h, d = 1, 3, 32
    s = int(np.prod(LATENT))
    q, k, v = _mk((b, h, s, d), 7), _mk((b, h, s, d), 8), _mk((b, h, s, d), 9)
    active = jnp.asarray([1, 0, 1], jnp.int32)

    pq, pk, pv = pool_qkv(q, k, v, groups, active=active, interpret=True)
    rq, rk, rv = pool_qkv(q, k, v, groups, interpret=True)
    for got, ref in ((pq, rq), (pk, rk), (pv, rv)):
        np.testing.assert_allclose(np.asarray(got)[:, 0], np.asarray(ref)[:, 0],
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got)[:, 2], np.asarray(ref)[:, 2],
                                   rtol=1e-6, atol=1e-6)
        assert np.abs(np.asarray(got)[:, 1]).max() == 0

    out = unpool(pq, q, groups, active=active, interpret=True)
    ref_out = unpool(rq, q, groups, interpret=True)
    np.testing.assert_allclose(np.asarray(out)[:, 0], np.asarray(ref_out)[:, 0],
                               rtol=1e-6, atol=1e-6)
    assert np.abs(np.asarray(out)[:, 1]).max() == 0


def test_headmap_matches_plain_on_routed_heads():
    """head_map mode: routed heads' rows equal the plain all-head pool;
    non-routed rows are unspecified (callers mask them)."""
    groups = build_lowres_groups(LATENT, WINDOW)
    b, h, d = 1, 4, 32
    s = int(np.prod(LATENT))
    q, k, v = _mk((b, h, s, d), 10), _mk((b, h, s, d), 11), _mk((b, h, s, d), 12)
    routed = [1, 3]  # heads routed to lowres
    n_act = jnp.asarray(len(routed), jnp.int32)
    head_map = jnp.asarray([1, 3, 3, 3], jnp.int32)  # packed + repeat-last pad

    pq, pk, pv = pool_qkv(q, k, v, groups, head_map=head_map, num_active=n_act,
                          interpret=True)
    rq, rk, rv = pool_qkv(q, k, v, groups, interpret=True)
    for got, ref in ((pq, rq), (pk, rk), (pv, rv)):
        for hh in routed:
            np.testing.assert_allclose(np.asarray(got)[:, hh],
                                       np.asarray(ref)[:, hh],
                                       rtol=1e-6, atol=1e-6)

    attn_out = _mk((b, h, groups.pooled_length, d), 13)
    out = unpool(attn_out, q, groups, head_map=head_map, num_active=n_act,
                 interpret=True)
    ref_out = unpool(attn_out, q, groups, interpret=True)
    for hh in routed:
        np.testing.assert_allclose(np.asarray(out)[:, hh],
                                   np.asarray(ref_out)[:, hh],
                                   rtol=1e-6, atol=1e-6)


def test_pool_unpool_roundtrip_keeps_selected():
    """Kept tokens and centers survive a pool->unpool round trip."""
    groups = build_lowres_groups(LATENT, WINDOW)
    b, h, d = 1, 1, 16
    s = int(np.prod(LATENT))
    q = _mk((b, h, s, d), 5)
    pq, _, _ = pool_qkv(q, q, q, groups, interpret=True)
    back = unpool(pq, q, groups, interpret=True)
    # every kept position gets its own value back; dropped get the center
    rq, m_q = pool_by_similarity(q, groups)
    ref = unpool_by_similarity(rq, groups, m_q)
    np.testing.assert_allclose(np.asarray(back), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_picks_passthrough_matches_rederive():
    """pool_qkv(return_picks) + unpool(picks=) == unpool re-deriving from q."""
    groups = build_lowres_groups(LATENT, WINDOW)
    b, h, d = 1, 2, 32
    s = int(np.prod(LATENT))
    q, k, v = _mk((b, h, s, d), 11), _mk((b, h, s, d), 12), _mk((b, h, s, d), 13)
    attn_out = _mk((b, h, groups.pooled_length, d), 14)

    pq, pk, pv, picks = pool_qkv(q, k, v, groups, return_picks=True,
                                 interpret=True)
    rq, rk, rv = pool_qkv(q, k, v, groups, interpret=True)
    np.testing.assert_array_equal(np.asarray(pq), np.asarray(rq))
    np.testing.assert_array_equal(np.asarray(pk), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(pv), np.asarray(rv))

    out_fast = unpool(attn_out, q, groups, picks=picks, interpret=True)
    out_ref = unpool(attn_out, q, groups, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_fast), np.asarray(out_ref))


def test_picks_passthrough_headmap_mode():
    groups = build_lowres_groups(LATENT, WINDOW)
    b, h, d = 1, 3, 32
    s = int(np.prod(LATENT))
    q, k, v = _mk((b, h, s, d), 15), _mk((b, h, s, d), 16), _mk((b, h, s, d), 17)
    attn_out = _mk((b, h, groups.pooled_length, d), 18)

    head_map = jnp.asarray([0, 2, 2], jnp.int32)  # heads {0, 2} routed
    na = jnp.asarray(2, jnp.int32)
    outs = pool_qkv(q, k, v, groups, head_map=head_map, num_active=na,
                    return_picks=True, interpret=True)
    picks = outs[3]
    fast = unpool(attn_out, q, groups, head_map=head_map, num_active=na,
                  picks=picks, interpret=True)
    ref = unpool(attn_out, q, groups, head_map=head_map, num_active=na,
                 interpret=True)
    for hh in (0, 2):  # rows outside head_map are uninitialized by contract
        np.testing.assert_array_equal(np.asarray(fast[:, hh]),
                                      np.asarray(ref[:, hh]))
