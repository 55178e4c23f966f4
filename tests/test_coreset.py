import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vorta_tpu.geometry import build_lowres_groups
from vorta_tpu.ops.coreset import pool_by_similarity, unpool_by_similarity


def brute_force_pool(x: np.ndarray, groups):
    """Independent numpy oracle for similarity pooling (per batch/head)."""
    b, h, s, d = x.shape
    g, m = groups.margins.shape
    u = groups.num_kept_margins
    centers = x[:, :, groups.center]  # (b,h,g,d)
    margins = x[:, :, groups.margins.reshape(-1)].reshape(b, h, g, m, d)

    def norm(v):
        return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)

    sim = np.einsum("bhgd,bhgmd->bhgm", norm(centers), norm(margins))
    order = np.argsort(sim, axis=-1, kind="stable")
    kept_idx = order[..., :u]
    kept = np.take_along_axis(margins, kept_idx[..., None], axis=-2)
    pooled = np.concatenate([centers, kept.reshape(b, h, g * u, d)], axis=2)
    return pooled, kept_idx


@pytest.fixture
def setup():
    rng = np.random.default_rng(0)
    groups = build_lowres_groups((4, 6, 4), (2, 3, 2), reduction_rate=0.5)
    x = rng.standard_normal((2, 3, groups.full_length, 8)).astype(np.float32)
    return groups, x


def test_pool_matches_oracle(setup):
    groups, x = setup
    pooled, matching = pool_by_similarity(jnp.asarray(x), groups)
    ref_pooled, ref_kept = brute_force_pool(x, groups)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(matching.kept), ref_kept)


def test_pool_reuses_matching(setup):
    groups, x = setup
    _, matching = pool_by_similarity(jnp.asarray(x), groups)
    y = np.random.default_rng(1).standard_normal(x.shape).astype(np.float32)
    pooled_y, matching_y = pool_by_similarity(jnp.asarray(y), groups, matching)
    assert matching_y is matching
    # K/V pooled with Q's matching: gather y at Q's kept slots
    b, h, s, d = y.shape
    g, m = groups.margins.shape
    margins_y = y[:, :, groups.margins.reshape(-1)].reshape(b, h, g, m, d)
    kept = np.take_along_axis(
        margins_y, np.asarray(matching.kept)[..., None], axis=-2
    )
    expected = np.concatenate(
        [y[:, :, groups.center], kept.reshape(b, h, -1, d)], axis=2
    )
    np.testing.assert_allclose(np.asarray(pooled_y), expected, rtol=1e-5, atol=1e-6)


def test_unpool_roundtrip(setup):
    groups, x = setup
    xj = jnp.asarray(x)
    pooled, matching = pool_by_similarity(xj, groups)
    out = np.asarray(unpool_by_similarity(pooled, groups, matching))

    # centers and kept margins come back exactly; dropped get center value
    np.testing.assert_allclose(
        out[:, :, groups.center], x[:, :, groups.center], rtol=1e-5
    )
    b, h = x.shape[:2]
    kept_np = np.asarray(matching.kept)
    for bi in range(b):
        for hi in range(h):
            for gi in range(groups.num_groups):
                kept_slots = set(kept_np[bi, hi, gi].tolist())
                center_val = x[bi, hi, groups.center[gi]]
                for slot in range(groups.margins.shape[1]):
                    pos = groups.margins[gi, slot]
                    if slot in kept_slots:
                        np.testing.assert_allclose(
                            out[bi, hi, pos], x[bi, hi, pos], rtol=1e-5, atol=1e-6
                        )
                    else:
                        np.testing.assert_allclose(
                            out[bi, hi, pos], center_val, rtol=1e-5, atol=1e-6
                        )


def test_unpool_identity_when_nothing_dropped():
    # reduction_rate 0 keeps every margin -> unpool(pool(x)) == x
    groups = build_lowres_groups((2, 2, 2), (2, 2, 2), reduction_rate=0.0)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 2, groups.full_length, 4)),
        dtype=jnp.float32,
    )
    pooled, matching = pool_by_similarity(x, groups)
    assert pooled.shape == x.shape  # same token count, reordered
    out = unpool_by_similarity(pooled, groups, matching)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5, atol=1e-6)


def test_pool_is_jittable(setup):
    groups, x = setup
    fn = jax.jit(lambda v: pool_by_similarity(v, groups)[0])
    np.testing.assert_allclose(
        np.asarray(fn(jnp.asarray(x))),
        np.asarray(pool_by_similarity(jnp.asarray(x), groups)[0]),
        rtol=1e-6,
    )
