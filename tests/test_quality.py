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
