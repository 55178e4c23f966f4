"""Quality metrics for the baseline-vs-routed comparison protocol.

The reference's protocol is visual/e2e (README.md:36-69: generate baseline
and routed videos at the same seed, compare).  The north star asks for
matched VBench/PSNR; this module supplies the metric suite the comparison
CLI reports:

  * psnr      — on latents or decoded frames
  * ssim      — standard windowed SSIM (uniform 7x7 window), per frame,
                averaged over frames/channels
  * lpips     — perceptual distance via a torch LPIPS net when weights are
                available locally (``lpips_weights``); this environment has
                no pretrained nets, so callers must pass a path or skip
  * VBench    — scaffolding only: requires the official prompt suite +
                pretrained scorers (not available offline); the CLI records
                per-dimension placeholders so downstream tooling has a
                stable schema

All numpy, float64 accumulation, no device dependencies.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR in dB with the peak taken from the data range of the pair."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    peak = float(max(np.abs(a).max(), np.abs(b).max()))
    return 10.0 * np.log10(peak * peak / mse)


def _ssim_2d(a: np.ndarray, b: np.ndarray, win: int, data_range: float) -> float:
    """SSIM of two 2-D float64 images with a uniform ``win``x``win`` window."""
    from numpy.lib.stride_tricks import sliding_window_view

    if a.shape[0] < win or a.shape[1] < win:
        win = min(a.shape[0], a.shape[1])
    wa = sliding_window_view(a, (win, win)).reshape(-1, win * win)
    wb = sliding_window_view(b, (win, win)).reshape(-1, win * win)
    mu_a = wa.mean(axis=1)
    mu_b = wb.mean(axis=1)
    var_a = wa.var(axis=1)
    var_b = wb.var(axis=1)
    cov = (wa * wb).mean(axis=1) - mu_a * mu_b
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    return float(np.mean(num / den))


def ssim(a: np.ndarray, b: np.ndarray, win: int = 7) -> float:
    """Mean SSIM over the leading axes of two (..., H, W) arrays.

    Latents (B, T, H, W, C) are moved to (..., H, W) automatically when the
    trailing axis looks like channels (size < 8).
    """
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    if a.ndim >= 3 and a.shape[-1] < 8 <= a.shape[-2]:
        a = np.moveaxis(a, -1, 0)
        b = np.moveaxis(b, -1, 0)
    lead = a.shape[:-2]
    a2 = a.reshape((-1,) + a.shape[-2:])
    b2 = b.reshape((-1,) + b.shape[-2:])
    rng = float(max(a.max() - a.min(), b.max() - b.min(), 1e-8))
    vals = [_ssim_2d(a2[i], b2[i], win, rng) for i in range(a2.shape[0])]
    return float(np.mean(vals))


def lpips(a: np.ndarray, b: np.ndarray, weights_path: Optional[str] = None) -> Optional[float]:
    """LPIPS perceptual distance on (T, H, W, 3) frame arrays in [0, 1].

    Needs a locally available pretrained LPIPS net (torch state dict at
    ``weights_path``); returns None when no weights are given — this
    environment ships no pretrained perceptual models, so the comparison
    CLI records ``lpips: null`` rather than a fake number.
    """
    if weights_path is None:
        return None
    import torch  # CPU-only in this environment

    try:
        import lpips as lpips_pkg  # optional dependency
    except ImportError:
        return None
    net = lpips_pkg.LPIPS(net="alex", model_path=weights_path)
    ta = torch.from_numpy(np.moveaxis(a, -1, 1).astype(np.float32)) * 2 - 1
    tb = torch.from_numpy(np.moveaxis(b, -1, 1).astype(np.float32)) * 2 - 1
    with torch.no_grad():
        return float(net(ta, tb).mean())


def temporal_flicker(x: np.ndarray) -> float:
    """Mean absolute frame-to-frame difference, normalized by the signal's
    mean absolute value — a weight-free proxy for temporal flicker.

    Accepts latents (B, T, H, W, C) or frames (T, H, W, C); the time axis is
    the one after an optional leading batch axis.  Lower = smoother.  Step
    caching and aggressive routing both tend to RAISE this (replayed
    residuals freeze, then jump), so it discriminates between speed knobs in
    a way PSNR-to-baseline alone does not."""
    x = np.asarray(x, np.float64)
    if x.ndim == 5:
        x = x[0]
    d = np.abs(np.diff(x, axis=0)).mean()
    return float(d / (np.abs(x).mean() + 1e-12))


def temporal_consistency(a: np.ndarray, b: np.ndarray) -> float:
    """Correlation of the two videos' frame-difference energy profiles.

    Computes per-step frame-difference energy e_t = mean|x_{t+1} - x_t| for
    each video and returns their Pearson correlation: 1.0 means the routed/
    cached sample moves exactly when the baseline moves (motion structure
    preserved) even if pixel values drift; low values mean motion was
    redistributed (e.g. frozen-then-jump cache artifacts)."""
    def profile(x):
        x = np.asarray(x, np.float64)
        if x.ndim == 5:
            x = x[0]
        return np.abs(np.diff(x, axis=0)).mean(axis=tuple(range(1, x.ndim)))

    pa, pb = profile(a), profile(b)
    if pa.size < 2:
        return 1.0
    sa, sb = pa.std(), pb.std()
    if sa < 1e-12 or sb < 1e-12:
        return 1.0 if sa < 1e-12 and sb < 1e-12 else 0.0
    return float(np.corrcoef(pa, pb)[0, 1])


def highfreq_energy_ratio(a: np.ndarray, b: np.ndarray) -> float:
    """Ratio of high-spatial-frequency energy, sample ``a`` over baseline
    ``b`` (1.0 = detail preserved, <1 = blurred, >1 = noise/ringing added).

    High band = the outer half of the 2-D DFT radius per frame.  Weight-free
    stand-in for the detail axis of perceptual metrics: lowres-expert
    over-routing and cache replay both blur, which PSNR under-penalizes."""
    def hf(x):
        x = np.asarray(x, np.float64)
        if x.ndim == 5:
            x = x[0]
        if x.ndim == 4:  # (T, H, W, C) -> fold C into T
            x = np.moveaxis(x, -1, 1).reshape(-1, x.shape[1], x.shape[2])
        f = np.fft.fftshift(np.fft.fft2(x, axes=(-2, -1)), axes=(-2, -1))
        h, w = x.shape[-2:]
        yy, xx = np.mgrid[:h, :w]
        r = np.hypot((yy - h / 2) / (h / 2), (xx - w / 2) / (w / 2))
        band = r >= 0.5
        return float((np.abs(f) ** 2)[..., band].sum())

    return float(hf(a) / max(hf(b), 1e-12))


def weightfree_video_metrics(sample: np.ndarray,
                             baseline: np.ndarray) -> Dict[str, float]:
    """The weight-free trio reported alongside PSNR/SSIM by the comparison
    CLI (LPIPS/VBench need pretrained nets unavailable offline)."""
    return {
        "flicker_sample": round(temporal_flicker(sample), 4),
        "flicker_baseline": round(temporal_flicker(baseline), 4),
        "temporal_consistency": round(temporal_consistency(sample, baseline), 4),
        "highfreq_energy_ratio": round(highfreq_energy_ratio(sample, baseline), 4),
    }


def routing_mix(scores: np.ndarray, tau: float) -> Dict[str, float]:
    """Expert usage fractions from per-step routing scores.

    ``scores``: (steps, layers, B, H, 3) soft scores (pipeline
    ``return_scores=True``).  Hard top-1 with the tau fallback-to-full
    (reference: wan.py:398-416) is applied per (step, layer, head).
    """
    s = np.asarray(scores)
    s0 = s[..., 0, :, :]  # first batch row, like the eval processor
    top = s0.max(axis=-1)
    idx = s0.argmax(axis=-1)
    idx = np.where(top < tau, 0, idx)
    n = idx.size
    return {
        "full": round(float((idx == 0).sum()) / n, 4),
        "lowres": round(float((idx == 1).sum()) / n, 4),
        "sta": round(float((idx == 2).sum()) / n, 4),
    }


def vbench_scaffold() -> Dict[str, Optional[float]]:
    """Stable schema for VBench dimensions; populated only when the official
    scorers + prompt suite are available (not offline)."""
    return {dim: None for dim in (
        "subject_consistency", "background_consistency", "motion_smoothness",
        "dynamic_degree", "aesthetic_quality", "imaging_quality",
    )}
