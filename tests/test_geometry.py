import numpy as np
import pytest

from vorta_tpu.geometry import (
    TokenGeometry,
    WAN_GEOMETRY,
    block_mask_to_tables,
    build_lowres_groups,
    expand_tile_mask,
    full_block_tables,
    inverse_permutation,
    sta_tile_mask,
    tile_permutation,
)


def test_token_geometry_wan_720p():
    # 77 frames x 720 x 1280 -> 20 x 45 x 80 latent tokens (SURVEY §6)
    assert WAN_GEOMETRY.tokens((77, 720, 1280)) == (20, 45, 80)
    assert WAN_GEOMETRY.tokens((77, 480, 832)) == (20, 30, 52)
    assert WAN_GEOMETRY.latent_frames(77) == 20


def test_token_geometry_hunyuan_720p():
    geo = TokenGeometry(temporal_vae=4, spatial_vae=8)
    assert geo.tokens((117, 720, 1280)) == (30, 45, 80)


def test_token_geometry_rejects_bad_mod():
    with pytest.raises(ValueError):
        WAN_GEOMETRY.tokens((78, 480, 832))


def test_lowres_groups_structure():
    groups = build_lowres_groups((4, 6, 4), (2, 3, 2), reduction_rate=0.5)
    gsize = 2 * 3 * 2
    assert groups.group_size == gsize
    assert groups.num_groups == (4 // 2) * (6 // 3) * (4 // 2)
    assert groups.num_kept_margins == int(gsize * 0.5) - 1
    # center slot inside the window: (wt//2, wh//2, ww//2) = (1, 1, 1)
    # first group covers t in {0,1}, h in {0,1,2}, w in {0,1}
    # center = raster index of (1, 1, 1) in a (4, 6, 4) grid = 1*24 + 1*4 + 1
    assert groups.center[0] == 29
    # groups partition the grid
    all_idx = np.sort(
        np.concatenate([groups.center[:, None], groups.margins], axis=1).reshape(-1)
    )
    np.testing.assert_array_equal(all_idx, np.arange(4 * 6 * 4))
    # margins exclude the center and preserve raster order within the window
    assert np.all(np.diff(groups.margins, axis=1) > 0)


def test_tile_permutation_roundtrip():
    shape, tile = (4, 6, 8), (2, 3, 4)
    perm = tile_permutation(shape, tile)
    inv = inverse_permutation(perm)
    s = np.arange(np.prod(shape))
    np.testing.assert_array_equal(s[perm][inv], s)
    # first tile = raster window (0:2, 0:3, 0:4)
    grid = s.reshape(shape)
    np.testing.assert_array_equal(
        s[perm][: 2 * 3 * 4], grid[0:2, 0:3, 0:4].reshape(-1)
    )


def test_sta_tile_mask_center_clamping():
    # 1D-like case: latent (6,1,1) tiles of (1,1,1), window 3 tiles
    mask = sta_tile_mask((6, 1, 1), (3, 1, 1), (1, 1, 1))
    # every query sees exactly 3 tiles (clamped at borders)
    np.testing.assert_array_equal(mask.sum(axis=1), np.full(6, 3))
    # border query 0 is clamped to center 1 -> sees {0,1,2}
    np.testing.assert_array_equal(np.nonzero(mask[0])[0], [0, 1, 2])
    np.testing.assert_array_equal(np.nonzero(mask[5])[0], [3, 4, 5])


def test_sta_tile_mask_full_window_axis():
    # window covers the whole axis -> all visible on that axis
    mask = sta_tile_mask((2, 4, 4), (3, 1, 1), (1, 2, 2))
    nt, nh, nw = 2, 2, 2
    m = mask.reshape(nt, nh, nw, nt, nh, nw)
    # along t everything visible; h/w windows are size 1
    assert m[0, 0, 0, 1, 0, 0]
    assert not m[0, 0, 0, 0, 1, 0]


def test_sta_mask_symmetric_interior():
    mask = sta_tile_mask((8, 8, 8), (3, 3, 3), (2, 2, 2))
    n = 4 * 4 * 4
    assert mask.shape == (n, n)
    # every query attends to exactly 27 tiles
    np.testing.assert_array_equal(mask.sum(axis=1), np.full(n, 27))


def test_expand_tile_mask_and_tables():
    tile_mask = np.array([[True, False], [False, True]])
    block = expand_tile_mask(tile_mask, tokens_per_tile=4, block_q=2, block_kv=2)
    assert block.shape == (4, 4)
    assert block[0, 0] and block[0, 1] and not block[0, 2]

    kv_index, counts = block_mask_to_tables(block)
    np.testing.assert_array_equal(counts, [2, 2, 2, 2])
    np.testing.assert_array_equal(kv_index[0], [0, 1])
    np.testing.assert_array_equal(kv_index[2], [2, 3])

    kv_index, counts = block_mask_to_tables(block, pad_to=4)
    np.testing.assert_array_equal(kv_index[0], [0, 1, 1, 1])  # padded by repeat


def test_full_block_tables():
    kv_index, counts = full_block_tables(3, 5)
    assert kv_index.shape == (3, 5)
    np.testing.assert_array_equal(counts, [5, 5, 5])
    np.testing.assert_array_equal(kv_index[1], np.arange(5))
