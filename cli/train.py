#!/usr/bin/env python
"""Router-distillation trainer CLI.

TPU-native counterpart of the reference's scripts/{wan}/train.py: same
training recipe (frozen DiT + trainable routers, flow-match distillation,
interval curriculum, router-only checkpoints, attention geometry persisted to
config.json) on a (dp, sp) jax mesh instead of torchrun+FSDP+NCCL.

Example (2-device SP, tiny smoke):
  python cli/train.py --model wan-tiny --sp_size 2 --max_train_steps 10 \
      --synthetic_data --output_dir /tmp/exp
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    # model
    p.add_argument("--model", default="wan-1_3B",
                   choices=["wan-1_3B", "wan-14B", "wan-tiny",
                            "hunyuan-13B", "hunyuan-tiny"])
    p.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--torch_checkpoint", default=None,
                   help="path to torch/safetensors DiT weights to import")
    # data
    p.add_argument("--data_json_path", default=None)
    p.add_argument("--synthetic_data", action="store_true",
                   help="random latents/embeds (smoke testing)")
    p.add_argument("--num_latent_t", type=int, default=20)
    p.add_argument("--video_height", type=int, default=480)
    p.add_argument("--video_width", type=int, default=832)
    p.add_argument("--cfg_rate", type=float, default=0.1)
    # attention geometry (persisted to config.json)
    p.add_argument("--sta_window", type=int, nargs=3, default=[3, 3, 3])
    p.add_argument("--sta_tile", type=int, nargs=3, default=[4, 6, 4])
    p.add_argument("--lowres_window", type=int, nargs=3, default=[2, 3, 2])
    p.add_argument("--lowres_reduction_rate", type=float, default=0.5)
    p.add_argument("--tau_sparse", type=float, default=0.3)
    # parallelism
    p.add_argument("--sp_size", type=int, default=1)
    p.add_argument("--shard_frozen", action="store_true",
                   help="FSDP-style fallback: layer-shard the frozen DiT "
                        "params over the dp axis (per-block psum fetch) for "
                        "models that exceed per-chip HBM")
    p.add_argument("--dp_size", type=int, default=None)
    # optimization (reference defaults: train.sh)
    p.add_argument("--train_batch_size", type=int, default=1,
                   help="per-step global batch (before grad accumulation)")
    p.add_argument("--gradient_accumulation_steps", type=int, default=4)
    p.add_argument("--max_train_steps", type=int, default=100)
    p.add_argument("--learning_rate", type=float, default=1e-2)
    p.add_argument("--lr_scheduler", default="constant",
                   choices=["constant", "linear", "cosine"])
    p.add_argument("--lr_warmup_steps", type=int, default=0)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--flow_shift", type=float, default=5.0)
    p.add_argument("--precondition_outputs", action="store_true")
    # losses (reference train.sh)
    p.add_argument("--diffusion_loss_weight", type=float, default=1.0)
    p.add_argument("--reg_loss_weight", type=float, default=0.02)
    p.add_argument("--last_layer_distill_loss_weight", type=float, default=20.0)
    p.add_argument("--hidden_layer_distill_loss_weight", type=float, default=0.0)
    # run management
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--checkpointing_steps", type=int, default=100)
    p.add_argument("--report_interval", type=int, default=1)
    p.add_argument("--resume_from_checkpoint", default=None,
                   help="'latest' or a step dir path")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from vorta_tpu.parallel.mesh import pin_platform_from_env

    pin_platform_from_env()
    from flax import nnx
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from vorta_tpu.config import WAN_1_3B, WAN_14B, WAN_TINY, AttentionConfig
    from vorta_tpu.geometry import WAN_GEOMETRY
    from vorta_tpu.io.checkpoint import (
        latest_checkpoint,
        load_router_checkpoint,
        save_router_checkpoint,
    )
    from vorta_tpu.io.metrics import MetricsLogger
    from vorta_tpu.models.wan import WanModel
    from vorta_tpu.parallel.mesh import make_mesh
    from vorta_tpu.schedulers.flow_match import train_sigmas
    from vorta_tpu.training.data import LatentDataset, epoch_iterator
    from vorta_tpu.training.step import (
        LossWeights,
        make_optimizer,
        make_router_train_step,
        router_partition,
    )

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    interpret = jax.default_backend() != "tpu"

    from vorta_tpu.models.hunyuan import HUNYUAN_13B, HUNYUAN_TINY, HunyuanModel
    from vorta_tpu.training.step import make_hunyuan_router_train_step

    is_hunyuan = args.model.startswith("hunyuan")
    model_cfg = {
        "wan-1_3B": WAN_1_3B, "wan-14B": WAN_14B, "wan-tiny": WAN_TINY,
        "hunyuan-13B": HUNYUAN_13B, "hunyuan-tiny": HUNYUAN_TINY,
    }[args.model]
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    if args.model == "hunyuan-tiny":
        latent_shape = (4, 4, 8)
        attn_cfg = AttentionConfig(
            latent_shape=latent_shape, sta_window=(3, 3, 3), sta_tile=(2, 2, 2),
            lowres_window=(2, 2, 2), block_q=32, block_kv=32,
            sta_block_q=8, sta_block_kv=8, tau_sparse=args.tau_sparse,
        )
    elif args.model == "hunyuan-13B":
        _, lh, lw = WAN_GEOMETRY.tokens((1, args.video_height, args.video_width))
        latent_shape = (args.num_latent_t, lh, lw)
        attn_cfg = AttentionConfig(
            latent_shape=latent_shape,
            sta_window=tuple(args.sta_window),
            sta_tile=(6, 9, 8),  # reference hunyuan train.sh tile
            lowres_window=tuple(args.lowres_window),
            lowres_reduction=args.lowres_reduction_rate,
            tau_sparse=args.tau_sparse,
        )
    elif args.model == "wan-tiny":
        latent_shape = (4, 4, 4)
        attn_cfg = AttentionConfig(
            latent_shape=latent_shape, sta_window=(3, 3, 1), sta_tile=(2, 2, 2),
            lowres_window=(2, 2, 2), block_q=16, block_kv=16,
            sta_block_q=8, sta_block_kv=8, tau_sparse=args.tau_sparse,
        )
    else:
        _, lh, lw = WAN_GEOMETRY.tokens((1, args.video_height, args.video_width))
        latent_shape = (args.num_latent_t, lh, lw)
        attn_cfg = AttentionConfig(
            latent_shape=latent_shape,
            sta_window=tuple(args.sta_window),
            sta_tile=tuple(args.sta_tile),
            lowres_window=tuple(args.lowres_window),
            lowres_reduction=args.lowres_reduction_rate,
            tau_sparse=args.tau_sparse,
        )
    # the geometry contract: persisted at train time, re-read at inference
    attn_cfg.save(out_dir / "config.json")
    (out_dir / "args.json").write_text(json.dumps(vars(args), indent=2, default=str))

    print(f"[train] model={args.model} latent={latent_shape} "
          f"mesh=(dp={args.dp_size or 'auto'}, sp={args.sp_size}) backend={jax.default_backend()}")

    if is_hunyuan:
        model = HunyuanModel(model_cfg, dtype=dtype, param_dtype=dtype, rngs=nnx.Rngs(args.seed))
        if args.torch_checkpoint:
            from vorta_tpu.io.torch_import import load_hunyuan_torch_weights

            load_hunyuan_torch_weights(model, args.torch_checkpoint)
    else:
        model = WanModel(model_cfg, dtype=dtype, param_dtype=dtype, rngs=nnx.Rngs(args.seed))
        if args.torch_checkpoint:
            from vorta_tpu.io.torch_import import load_wan_torch_weights

            load_wan_torch_weights(model, args.torch_checkpoint)
    graphdef, router_state, frozen_state = router_partition(model)
    # routers train in f32 regardless of model dtype
    router_state = jax.tree.map(lambda x: x.astype(jnp.float32), router_state)

    optimizer = make_optimizer(
        lr=args.learning_rate,
        weight_decay=args.weight_decay,
        max_grad_norm=args.max_grad_norm,
        warmup_steps=args.lr_warmup_steps,
        total_steps=args.max_train_steps,
        schedule=args.lr_scheduler,
    )
    import optax

    optimizer = optax.MultiSteps(optimizer, args.gradient_accumulation_steps)
    opt_state = optimizer.init(router_state)

    init_step = 0
    if args.resume_from_checkpoint:
        path = (latest_checkpoint(out_dir / "ckpt")
                if args.resume_from_checkpoint == "latest"
                else Path(args.resume_from_checkpoint))
        if path is not None and path.exists():
            router_state, opt_restored = load_router_checkpoint(path, router_state, opt_state)
            if opt_restored is not None:
                opt_state = opt_restored
            init_step = int(path.name.split("-")[1])
            print(f"[train] resumed from {path} at step {init_step}")

    sigmas = train_sigmas(shift=args.flow_shift)
    weights = LossWeights(
        diffusion=args.diffusion_loss_weight,
        reg=args.reg_loss_weight,
        last_layer_distill=args.last_layer_distill_loss_weight,
        hidden_layer_distill=args.hidden_layer_distill_loss_weight,
        precondition_outputs=args.precondition_outputs,
    )

    sp = args.sp_size
    mesh = make_mesh(sp_size=sp, dp_size=args.dp_size)
    dp = mesh.shape["dp"]
    use_mesh = dp * sp > 1

    make_step = make_hunyuan_router_train_step if is_hunyuan else make_router_train_step
    step_fn = make_step(
        graphdef, attn_cfg, optimizer, weights=weights,
        timestep_table=sigmas * 1000.0, sigma_table=sigmas,
        sp_axis="sp" if (use_mesh and sp > 1) else None,
        dp_axis="dp" if use_mesh else None,
        frozen_sharded_axis="dp" if (use_mesh and args.shard_frozen) else None,
        interpret=interpret,
    )
    if use_mesh:
        from vorta_tpu.training.step import frozen_sharding_specs

        batch_specs = (
            (P("dp", "sp"), P("dp"), P("dp"), P("dp")) if is_hunyuan
            else (P("dp", "sp"), P("dp"))
        )
        fspecs = (
            frozen_sharding_specs(frozen_state, axis="dp")
            if args.shard_frozen else P()
        )
        step_fn = jax.jit(
            shard_map(
                step_fn, mesh=mesh,
                in_specs=(P(), fspecs, P()) + batch_specs + (P(),),
                out_specs=(P(), P(), P()),
                check_vma=False,
            )
        )
        # restored checkpoints come back committed to a single device;
        # place every state onto the mesh before stepping (frozen params
        # layer-sharded when --shard_frozen, else replicated)
        from jax.sharding import NamedSharding

        replicated = NamedSharding(mesh, P())
        router_state, opt_state = jax.tree.map(
            lambda x: jax.device_put(x, replicated), (router_state, opt_state)
        )
        if args.shard_frozen:
            frozen_state = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                frozen_state, fspecs,
            )
        else:
            frozen_state = jax.tree.map(
                lambda x: jax.device_put(x, replicated), frozen_state
            )
    else:
        step_fn = jax.jit(step_fn)

    # data
    batch = args.train_batch_size * dp
    if args.synthetic_data or args.data_json_path is None:
        t, lh, lw = latent_shape
        pt, ph, pw = model_cfg.patch_size
        rng = np.random.default_rng(args.seed)

        def batches():
            while True:
                latents = rng.standard_normal(
                    (batch, t * pt, lh * ph, lw * pw, model_cfg.in_channels), np.float32)
                text = rng.standard_normal(
                    (batch, model_cfg.text_len, model_cfg.text_dim), np.float32)
                if is_hunyuan:
                    mask = np.ones((batch, model_cfg.text_len), bool)
                    mask[:, model_cfg.text_len // 2:] = False
                    pooled = rng.standard_normal((batch, model_cfg.pooled_dim), np.float32)
                    yield (latents, text, mask, pooled)
                else:
                    yield (latents, text)

        data_iter = batches()
    else:
        ds = LatentDataset(args.data_json_path, args.num_latent_t, args.cfg_rate, args.seed)
        base_iter = epoch_iterator(ds, batch, seed=args.seed)

        def adapt():
            for latents, embeds, mask in base_iter:
                if is_hunyuan:
                    # reference: pooled projection is the first row of the
                    # prompt embed (scripts/hunyuan/train_one_step.py:90-92)
                    pooled = embeds[:, 0, : model_cfg.pooled_dim]
                    m = (mask if mask is not None
                         else np.ones(embeds.shape[:2], bool))
                    yield (latents, embeds[:, : model_cfg.text_len], m.astype(bool), pooled)
                else:
                    yield (latents, embeds)

        data_iter = adapt()

    logger = MetricsLogger(out_dir)
    key = jax.random.PRNGKey(args.seed)
    micro_per_step = args.gradient_accumulation_steps
    t_start = time.time()

    # Preemption-safe recovery: SIGTERM/SIGINT request a checkpoint at the
    # next step boundary instead of dying mid-optimizer-step, so `--resume
    # latest` always finds consistent state.  (The reference's only recovery
    # is restart + resume from the last periodic checkpoint — misc.py:52-65;
    # torchrun offers no save-on-preempt either.)
    import signal

    stop_requested = {"flag": False}

    def _request_stop(signum, frame):
        stop_requested["flag"] = True
        print(f"[train] signal {signum}: checkpoint + exit at step boundary",
              flush=True)

    prev_handlers = {
        s: signal.signal(s, _request_stop)
        for s in (signal.SIGTERM, signal.SIGINT)
    }

    step = init_step
    try:
        for step in range(init_step, args.max_train_steps):
            for _ in range(micro_per_step):
                batch_arrays = next(data_iter)
                key, sub = jax.random.split(key)
                router_state, opt_state, metrics = step_fn(
                    router_state, frozen_state, opt_state,
                    *[jnp.asarray(a) for a in batch_arrays], sub,
                )
            if (step + 1) % args.report_interval == 0:
                line = logger.log(step + 1, jax.tree.map(float, metrics))
                print(f"[train] {line} ({(time.time()-t_start)/(step-init_step+1):.2f}s/step)")
            if (step + 1) % args.checkpointing_steps == 0 or step + 1 == args.max_train_steps:
                path = save_router_checkpoint(out_dir / "ckpt", step + 1, router_state, opt_state)
                print(f"[train] checkpoint -> {path}")
            if stop_requested["flag"]:
                path = save_router_checkpoint(out_dir / "ckpt", step + 1, router_state, opt_state)
                print(f"[train] preempted: checkpoint -> {path}")
                break
    finally:
        for s, h in prev_handlers.items():
            signal.signal(s, h)
    logger.close()
    print("[train] done")


if __name__ == "__main__":
    main()
