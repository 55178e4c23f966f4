"""Quality metric suite (io/quality) sanity checks."""

import numpy as np

from vorta_tpu.io.quality import psnr, routing_mix, ssim


def test_psnr_identical_inf():
    a = np.random.default_rng(0).standard_normal((2, 8, 8))
    assert psnr(a, a) == float("inf")
    assert psnr(a, a + 0.1) < 30


def test_ssim_bounds_and_identity():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((3, 16, 16))
    assert abs(ssim(a, a) - 1.0) < 1e-9
    b = rng.standard_normal((3, 16, 16))
    assert ssim(a, b) < 0.5


def test_ssim_latent_layout():
    rng = np.random.default_rng(2)
    lat = rng.standard_normal((1, 4, 16, 16, 4))  # (B,T,H,W,C)
    assert abs(ssim(lat, lat) - 1.0) < 1e-9


def test_routing_mix_tau_fallback():
    # scores (steps, layers, B, H, 3)
    s = np.zeros((2, 3, 1, 4, 3))
    s[..., 2] = 0.6  # all heads STA above tau
    mix = routing_mix(s, tau=0.3)
    assert mix == {"full": 0.0, "lowres": 0.0, "sta": 1.0}
    mix_hi = routing_mix(s, tau=0.7)  # below tau -> fall back to full
    assert mix_hi == {"full": 1.0, "lowres": 0.0, "sta": 0.0}


def test_temporal_flicker_and_consistency():
    from vorta_tpu.io.quality import temporal_consistency, temporal_flicker

    rng = np.random.default_rng(0)
    still = np.broadcast_to(rng.standard_normal((1, 1, 8, 8, 4)),
                            (1, 6, 8, 8, 4)).copy()
    assert temporal_flicker(still) == 0.0
    vid = rng.standard_normal((1, 6, 8, 8, 4))
    assert temporal_flicker(vid) > 0.1
    # identical motion profile -> correlation 1; value drift is fine
    assert temporal_consistency(vid, vid * 1.5 + 0.2) > 0.999
    # frozen-then-jump (cache artifact shape) decorrelates from smooth motion
    frozen = vid.copy()
    frozen[:, 1:4] = frozen[:, 1:2]
    assert temporal_consistency(frozen, vid) < 0.9


def test_highfreq_energy_ratio_detects_blur():
    from vorta_tpu.io.quality import highfreq_energy_ratio

    rng = np.random.default_rng(1)
    vid = rng.standard_normal((1, 4, 16, 16, 4))
    assert abs(highfreq_energy_ratio(vid, vid) - 1.0) < 1e-9
    # 2x2 box blur along H, W kills high-frequency energy
    b = np.asarray(vid)
    blurred = (b + np.roll(b, 1, 2) + np.roll(b, 1, 3)
               + np.roll(np.roll(b, 1, 2), 1, 3)) / 4
    assert highfreq_energy_ratio(blurred, vid) < 0.6


def test_weightfree_video_metrics_schema():
    from vorta_tpu.io.quality import weightfree_video_metrics

    rng = np.random.default_rng(2)
    a = rng.standard_normal((1, 4, 8, 8, 4))
    m = weightfree_video_metrics(a, a)
    assert set(m) == {"flicker_sample", "flicker_baseline",
                      "temporal_consistency", "highfreq_energy_ratio"}
    assert m["temporal_consistency"] == 1.0
    assert m["highfreq_energy_ratio"] == 1.0
