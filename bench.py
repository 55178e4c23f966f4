"""Benchmark: Wan-1.3B DiT denoise-step time, routed sparse vs full attention.

Prints ONE JSON line:
  {"metric": "...", "value": <routed forward ms>, "unit": "ms",
   "vs_baseline": <full_ms / routed_ms speedup>, ...}

Protocol mirrors the reference's baseline-vs-vorta wall-clock comparison
(README.md:36-69): same model, same shapes, full 3D attention vs hard-routed
sparse attention **with a router trained by the reference recipe** (100
steps, lr 1e-2, reg 0.02, last-distill 20.0 — scripts/wan/train.sh:5-26;
reproduced by tools/train_bench_router.py, checkpoint committed under
assets/).  The reference benchmarks routed inference from a trained
router.pt the same way; a random-init router's expert mix is arbitrary, so
it is reported only as a secondary number (vs_baseline_random_router).

Config: Wan2.1-T2V-1.3B shapes at 720p x 77 frames (latent grid 20x45x80,
72000 tokens), bf16, random weights.  Runs on whatever jax.default_backend()
provides (the real TPU chip under the driver); uses scan-inside-jit timing
because per-dispatch tunnel latency would otherwise dominate.
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from vorta_tpu.config import WAN_1_3B, AttentionConfig

_ASSETS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets")
# Prefer the router trained at the serving tile/window geometry (VERDICT
# round-3 item 8): 720p_half = the 720p spatial grid + serving STA tile
# [5,9,8] at half the frames — the largest train geometry whose step fits
# the remote tunnel's 60 s single-dispatch kill (72k-token teacher+student
# steps exceed it; routers input only the timestep embedding, but the
# distill targets are geometry-dependent).
_ROUTER_CANDIDATES = (
    ("720p_half-trained", os.path.join(
        _ASSETS, "bench_router_wan1_3b_720p_half.npz")),
    ("small-grid-trained", os.path.join(
        _ASSETS, "bench_router_wan1_3b.npz")),
)
ROUTER_CKPT = next(
    (p for _, p in _ROUTER_CANDIDATES if os.path.exists(p)),
    _ROUTER_CANDIDATES[-1][1],
)
ROUTER_GEOM = next(
    (g for g, p in _ROUTER_CANDIDATES if os.path.exists(p)), "none")


def device_seconds(fn, *args, iters: int = 2) -> float:
    """Per-iteration device time of fn, amortizing dispatch latency."""

    @jax.jit
    def run(*args):
        def body(c, i):
            out = fn(c, i, *args)
            return out, ()
        c0 = jnp.zeros((), jnp.float32)
        cf, _ = jax.lax.scan(body, c0, jnp.arange(iters))
        return cf

    float(run(*args))  # compile + warm
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / iters


V5E_PEAK_BF16_TFLOPS = 197.0  # per-chip MXU peak (v5e: 394 int8)


def wan_flops_per_forward(cfg, attn, mix):
    """Analytic matmul FLOPs of one Wan denoise forward at routing ``mix``
    (= {"full": f, "lowres": f, "sta": f} head fractions).

    Counts the MXU work only (projections, FFN, attention dots); norms,
    RoPE, softmax and pooling are VPU work excluded from the MFU ratio —
    this matches how "speed of light" is defined for the systolic array.
    """
    from vorta_tpu.geometry import sta_tile_mask
    from vorta_tpu.ops.experts import lowres_groups_for

    t, h, w = attn.latent_shape
    S = t * h * w
    D = cfg.dim
    F = cfg.ffn_dim
    L = cfg.text_len
    d = cfg.head_dim
    H = cfg.num_heads
    Sp = lowres_groups_for(attn).pooled_length
    tile_mask = sta_tile_mask(attn.latent_shape, attn.sta_window, attn.sta_tile)
    tpt = attn.tokens_per_tile
    sta_pairs = int(tile_mask.sum()) * tpt * tpt

    proj = 4 * 2 * S * D * D            # self qkv + out
    ffn = 2 * 2 * S * D * F             # proj_in + proj_out
    cross = 2 * 2 * S * D * D + 2 * 2 * L * D * D + 4 * S * L * D
    pairs = (mix.get("full", 0.0) * S * S
             + mix.get("lowres", 0.0) * Sp * Sp
             + mix.get("sta", 0.0) * sta_pairs)
    self_attn = 4 * d * H * pairs       # QK^T + PV, 2 matmuls x 2 flops/MAC
    per_block = proj + ffn + cross + self_attn
    head = 2 * S * D * cfg.out_channels * np.prod(cfg.patch_size)
    return cfg.num_layers * per_block + head


def load_router_npz(router_state, path):
    """Merge tools/train_bench_router.py's npz into a router state pytree."""
    data = np.load(path)
    flat = jax.tree_util.tree_flatten_with_path(router_state)
    loaded = 0
    leaves = []
    for key_path, leaf in flat[0]:
        key = jax.tree_util.keystr(key_path)
        if key in data.files:
            arr = jnp.asarray(data[key], dtype=leaf.dtype)
            assert arr.shape == leaf.shape, (key, arr.shape, leaf.shape)
            leaves.append(arr)
            loaded += 1
        else:
            leaves.append(leaf)
    if loaded == 0:
        raise ValueError(f"no router keys matched in {path}")
    return jax.tree_util.tree_unflatten(flat[1], leaves)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geom", default="720p", choices=["720p", "480p"],
                    help="480p variant reported for the routed-not-slower check")
    ap.add_argument("--mm", default="bf16", choices=["bf16", "int8", "int8_static"],
                    help="int8: opt-in W8A8 serving mode for FFN/projections "
                         "(ops/qmm.py) — secondary number, primary stays bf16; "
                         "int8_static self-calibrates static activation scales "
                         "first (no amax passes — quantize fuses into producers)")
    ap.add_argument("--composed", default="auto", choices=["auto", "off"],
                    help="auto: at 720p with a trained router, also measure "
                         "the composed serving arm (routing + int8_static + "
                         "step cache over a real flow-match trajectory, one "
                         "dispatch) and report vs_baseline_composed")
    ap.add_argument("--composed_steps", type=int, default=20)
    ap.add_argument("--cache_threshold", type=float, default=0.7)
    ap.add_argument("--qk", default="bf16", choices=["bf16", "int8"],
                    help="int8: run the full/lowres experts' QK^T on the "
                         "int8 MXU path (AttentionConfig.qk_int8) in the "
                         "routed arm — secondary serving number; the primary "
                         "protocol and the full baseline stay bf16. The "
                         "composed serving arm always uses it.")
    args = ap.parse_args()
    try:
        interpret = jax.default_backend() != "tpu"
    except RuntimeError as e:  # tunnel down: backend init raises UNAVAILABLE
        interpret = True
        print(f"[bench] backend init failed: {e}", flush=True)
    if interpret:
        print(
            json.dumps({"metric": "skipped", "value": 0, "unit": "ms",
                        "vs_baseline": 0, "note": "no TPU backend"}),
            flush=True,
        )
        return

    from vorta_tpu.models.wan import WanModel
    from vorta_tpu.training.step import router_partition

    # Reference flagship geometry: Wan 720p x 77f -> latent grid (20, 45, 80)
    # = 72000 tokens, STA tile [5, 9, 8] (train.sh), lowres window [2, 3, 2].
    # Model: Wan-1.3B shapes (the 14B does not fit a single v5e; heads/head_dim
    # and the attention geometry — where the speedup lives — are identical).
    if args.geom == "720p":
        attn = AttentionConfig(
            latent_shape=(20, 45, 80),
            sta_window=(3, 3, 3),
            sta_tile=(5, 9, 8),
            lowres_window=(2, 3, 2),
            block_q=1024,
            block_kv=1024,
            tau_sparse=0.3,
        )
        px = (90, 160)
    else:  # 480p x 77f: latent grid (20, 30, 52); tile_w is not 8-aligned
        # so STA runs the tiled-layout fallback kernel
        attn = AttentionConfig(
            latent_shape=(20, 30, 52),
            sta_window=(3, 3, 3),
            sta_tile=(4, 6, 4),
            lowres_window=(2, 3, 2),
            block_q=1024,
            block_kv=1024,
            sta_block_q=480,
            sta_block_kv=576,
            tau_sparse=0.3,
        )
        px = (60, 104)
    model = WanModel(WAN_1_3B, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                     rngs=nnx.Rngs(0))
    graphdef, router_state, frozen_state = router_partition(model)
    random_router_state = router_state
    trained = False
    if os.path.exists(ROUTER_CKPT):
        router_state = load_router_npz(router_state, ROUTER_CKPT)
        trained = True

    b = 1
    latents = jax.random.normal(
        jax.random.PRNGKey(0), (b, 20, px[0], px[1], WAN_1_3B.in_channels),
        jnp.bfloat16,
    )
    context = jax.random.normal(
        jax.random.PRNGKey(1), (b, WAN_1_3B.text_len, WAN_1_3B.text_dim), jnp.bfloat16
    )

    def calibrate_static_scales():
        # self-calibrate: collect per-(site, layer) amaxes at a few
        # timesteps under the measured routing mode (tools/calibrate_int8.py
        # is the standalone workflow)
        @jax.jit
        def calib_fwd(rstate, fstate, lat, ctx, t):
            m = nnx.merge(graphdef, rstate, fstate)
            return m(lat, t, ctx, attn_cfg=attn, routing_mode="hard",
                     calibrate_mm=True).mm_calibration

        amax = None
        for ts in (200.0, 500.0, 800.0):
            a = jax.tree.map(
                np.asarray,
                calib_fwd(router_state, frozen_state, latents, context,
                          jnp.full((b,), ts)),
            )
            amax = a if amax is None else {
                k: np.maximum(amax[k], a[k]) for k in amax
            }
        return {k: v / 127.0 for k, v in amax.items()}

    mm = args.mm
    act_scales = None
    if args.mm == "int8_static":
        mm = "int8"
        act_scales = calibrate_static_scales()

    import dataclasses as _dc

    attn_routed = (_dc.replace(attn, qk_int8=True) if args.qk == "int8"
                   else attn)

    # all big tensors ride as jit ARGS: closure constants would be baked into
    # the compile request (the frozen DiT state alone is ~2.9GB)
    def fwd(c, i, rstate, fstate, lat, ctx, mode, acfg):
        m = nnx.merge(graphdef, rstate, fstate)
        t = jnp.full((b,), 500.0) + i.astype(jnp.float32)  # vary per iter
        out = m(lat, t, ctx, attn_cfg=acfg, routing_mode=mode,
                mm_precision=mm, act_scales=act_scales)
        return c + out.sample.astype(jnp.float32).mean()

    big = (frozen_state, latents, context)
    full_s = device_seconds(
        lambda c, i, s, f, l, x: fwd(c, i, s, f, l, x, "off", attn),
        router_state, *big)
    routed_s = device_seconds(
        lambda c, i, s, f, l, x: fwd(c, i, s, f, l, x, "hard", attn_routed),
        router_state, *big)

    # --- MFU: analytic matmul FLOPs over measured time (VERDICT round-3
    # item 10 — the speedup ceiling argument lives on the floor's MFU)
    @jax.jit
    def scores_fwd(rstate, fstate, lat, ctx):
        m = nnx.merge(graphdef, rstate, fstate)
        out = m(lat, jnp.full((b,), 500.0), ctx, attn_cfg=attn,
                routing_mode="hard", return_scores=True)
        return out.routing_scores

    from vorta_tpu.io.quality import routing_mix

    mix = routing_mix(
        np.asarray(scores_fwd(router_state, frozen_state, latents, context)),
        attn.tau_sparse,
    )
    full_fl = wan_flops_per_forward(WAN_1_3B, attn,
                                    {"full": 1.0, "lowres": 0.0, "sta": 0.0})
    routed_fl = wan_flops_per_forward(WAN_1_3B, attn, mix)
    full_tfs = full_fl / full_s / 1e12
    routed_tfs = routed_fl / routed_s / 1e12

    result = {
        "metric": f"wan1.3b_{args.geom}_77f_denoise_fwd_ms_routed"
                  + ("" if args.mm == "bf16" else f"_{args.mm}")
                  + ("" if args.qk == "bf16" else "_qk8"),
        "value": round(routed_s * 1e3, 2),
        "unit": "ms",
        "vs_baseline": round(full_s / routed_s, 4),
        "full_ms": round(full_s * 1e3, 2),
        "router": ("trained-100step-reference-recipe" if trained
                   else "random-init"),
        "router_geom": ROUTER_GEOM if trained else "none",
        "routing_mix": mix,
        "full_tflops": round(full_tfs, 1),
        "full_mfu": round(full_tfs / V5E_PEAK_BF16_TFLOPS, 3),
        "routed_tflops": round(routed_tfs, 1),
        "routed_mfu": round(routed_tfs / V5E_PEAK_BF16_TFLOPS, 3),
    }
    if trained:
        random_s = device_seconds(
            lambda c, i, s, f, l, x: fwd(c, i, s, f, l, x, "hard", attn_routed),
            random_router_state, *big)
        result["routed_ms_random_router"] = round(random_s * 1e3, 2)
        result["vs_baseline_random_router"] = round(full_s / random_s, 4)

    # --- composed serving arm: routing + W8A8-static + step cache over a
    # REAL flow-match trajectory in ONE scan dispatch.  This is the
    # production serving config and the composition the reference's 14.4x
    # headline refers to (arXiv 2505.18809: VORTA combined with other
    # accelerations); the 14B-scale equivalent lives in
    # tools/bench_wan14b.py --cache_threshold.
    poly_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "assets", "cache_poly_wan1_3b_720p.npz")
    if (args.composed == "auto" and args.geom == "720p" and trained
            and os.path.exists(poly_path)):
        from vorta_tpu.ops.stepcache import init_step_cache
        from vorta_tpu.schedulers.flow_match import FlowMatchEulerSchedule

        steps = args.composed_steps
        schedule = FlowMatchEulerSchedule.create(steps, shift=5.0)
        sig = jnp.asarray(schedule.sigmas)
        tsteps = jnp.asarray(schedule.timesteps)
        coeffs = tuple(float(c) for c in np.load(poly_path)["coefficients"])
        c_scales = act_scales if act_scales is not None else calibrate_static_scales()
        seq = attn.seq_len
        ind_dim = 6 * WAN_1_3B.dim
        # serving config: int8 QK^T on the full/lowres experts rides along
        # with W8A8 FFN/projections (both are int8-MXU serving quantizations)
        attn_c = _dc.replace(attn, qk_int8=True)

        @jax.jit
        def composed_run(rstate, fstate, lat0, ctx):
            def body(carry, i):
                lat, cache = carry
                m = nnx.merge(graphdef, rstate, fstate)
                force = (i < 1) | (i == steps - 1)
                out = m(lat.astype(jnp.bfloat16), jnp.full((b,), tsteps[i]),
                        ctx, attn_cfg=attn_c, routing_mode="hard",
                        mm_precision="int8", act_scales=c_scales,
                        step_cache=cache,
                        cache_threshold=args.cache_threshold,
                        cache_force_compute=force,
                        cache_coefficients=coeffs)
                v = out.sample.astype(jnp.float32)
                lat = lat + (sig[i + 1] - sig[i]) * v
                # a computed step resets acc to 0; a skipped step carries >0
                skipped = (out.step_cache.acc > 0).astype(jnp.int32)
                return (lat, out.step_cache), skipped

            cache0 = init_step_cache(b, seq, WAN_1_3B.dim, ind_dim,
                                     jnp.bfloat16)
            (latf, _), skips = jax.lax.scan(
                body, (lat0.astype(jnp.float32), cache0), jnp.arange(steps))
            return latf.mean(), skips.sum()

        _m, _s = composed_run(router_state, frozen_state, latents, context)
        jax.block_until_ready((_m, _s))  # compile + warm
        t0 = time.perf_counter()
        _m, n_skip = composed_run(router_state, frozen_state, latents, context)
        jax.block_until_ready((_m, n_skip))
        composed_s = (time.perf_counter() - t0) / steps
        result["composed_ms_per_step"] = round(composed_s * 1e3, 2)
        result["vs_baseline_composed"] = round(full_s / composed_s, 4)
        result["composed"] = {
            "mm": "int8_static",
            "qk": "int8",
            "cache_threshold": args.cache_threshold,
            "steps": steps, "skips": int(n_skip),
            "note": "routing + W8A8 static + step cache on a real "
                    "trajectory; skip rate from the random-weight-fitted "
                    "cache polynomial — refit on real checkpoints before "
                    "quoting quality",
        }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
