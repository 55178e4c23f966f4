import jax.numpy as jnp
import numpy as np

from vorta_tpu.geometry import tile_permutation
from vorta_tpu.ops.layout import tile_sequence, untile_sequence


def test_tile_sequence_matches_permutation():
    shape, tile = (4, 6, 8), (2, 3, 4)
    s = int(np.prod(shape))
    x = np.arange(s, dtype=np.float32).reshape(1, 1, s, 1)
    perm = tile_permutation(shape, tile)
    out = np.asarray(tile_sequence(jnp.asarray(x), shape, tile))
    np.testing.assert_array_equal(out[0, 0, :, 0], x[0, 0, perm, 0])


def test_tile_untile_roundtrip():
    shape, tile = (4, 4, 8), (2, 2, 4)
    s = int(np.prod(shape))
    x = np.random.default_rng(0).standard_normal((2, 3, s, 5)).astype(np.float32)
    y = untile_sequence(tile_sequence(jnp.asarray(x), shape, tile), shape, tile)
    np.testing.assert_array_equal(np.asarray(y), x)


def test_tile_sequence_leading_dims():
    shape, tile = (2, 2, 4), (1, 2, 2)
    s = int(np.prod(shape))
    x = np.random.default_rng(1).standard_normal((s, 3)).astype(np.float32)
    y2 = tile_sequence(jnp.asarray(x)[None], shape, tile)
    y1 = tile_sequence(jnp.asarray(x), shape, tile)
    np.testing.assert_array_equal(np.asarray(y2)[0], np.asarray(y1))
