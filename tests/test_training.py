import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vorta_tpu.config import WAN_TINY, AttentionConfig
from vorta_tpu.models.wan import WanModel
from vorta_tpu.schedulers.flow_match import FlowMatchEulerSchedule, train_sigmas
from vorta_tpu.training.sampling import (
    rebalance_loss_weights,
    renormalize_uniform,
    sample_timesteps,
)
from vorta_tpu.training.step import (
    LossWeights,
    make_optimizer,
    make_router_train_step,
    router_partition,
)

ATTN = AttentionConfig(
    latent_shape=(4, 4, 4),
    sta_window=(3, 3, 1),
    sta_tile=(2, 2, 2),
    lowres_window=(2, 2, 2),
    block_q=16,
    block_kv=16,
    sta_block_q=8,
    sta_block_kv=8,
)


def test_renormalize_uniform_interval():
    u = jnp.asarray([0.0, 0.5, 1.0])
    out = np.asarray(renormalize_uniform(u, jnp.asarray(2), n_intervals=5))
    np.testing.assert_allclose(out, [0.4, 0.5, 0.6], rtol=1e-6)


def test_sample_timesteps_in_table():
    sig = train_sigmas(shift=3.0)
    tt = sig * 1000.0
    t, s = sample_timesteps(jax.random.PRNGKey(0), 8, jnp.asarray(tt), jnp.asarray(sig))
    assert t.shape == (8,) and s.shape == (8,)
    # every sampled timestep/sigma pair comes from the table
    for ti, si in zip(np.asarray(t), np.asarray(s)):
        j = np.argmin(np.abs(tt - ti))
        np.testing.assert_allclose(si, sig[j], rtol=1e-6)


def test_rebalance_low_noise_interval():
    dw, (wr, wl, wh) = rebalance_loss_weights(
        1.0, (0.02, 20.0, 0.0), jnp.asarray([100.0]), n_intervals=5
    )
    assert float(dw) == 0.0
    np.testing.assert_allclose(float(wl), 20.0 * 1.5)  # 2 active -> boost 1.5
    assert float(wh) == 0.0
    dw2, (wr2, wl2, _) = rebalance_loss_weights(
        1.0, (0.02, 20.0, 0.0), jnp.asarray([800.0]), n_intervals=5
    )
    assert float(dw2) == 1.0 and float(wl2) == 20.0


@pytest.fixture(scope="module")
def setup():
    model = WanModel(WAN_TINY, rngs=nnx.Rngs(0))
    graphdef, router_state, frozen_state = router_partition(model)
    sig = train_sigmas(shift=3.0)
    opt = make_optimizer(lr=1e-2)
    step = make_router_train_step(
        graphdef, ATTN, opt,
        weights=LossWeights(hidden_layer_distill=1.0),
        timestep_table=sig * 1000.0, sigma_table=sig,
        interpret=True,
    )
    latents = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8, WAN_TINY.in_channels))
    embeds = jax.random.normal(jax.random.PRNGKey(2), (2, WAN_TINY.text_len, WAN_TINY.text_dim))
    return model, graphdef, router_state, frozen_state, opt, step, latents, embeds


def test_train_step_updates_router_only(setup):
    _, _, router_state, frozen_state, opt, step, latents, embeds = setup
    opt_state = opt.init(router_state)
    step_j = jax.jit(step)
    new_router, new_opt, metrics = step_j(
        router_state, frozen_state, opt_state, latents, embeds, jax.random.PRNGKey(0)
    )
    for name in ("loss", "l_fm", "l_reg", "l_last", "l_hidden", "grad_norm"):
        assert np.isfinite(float(metrics[name])), name
    assert float(metrics["grad_norm"]) > 0
    # router changed
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), new_router, router_state
    )
    assert max(jax.tree.leaves(diff)) > 0


def test_train_step_deterministic(setup):
    _, _, router_state, frozen_state, opt, step, latents, embeds = setup
    opt_state = opt.init(router_state)
    step_j = jax.jit(step)
    r1, _, m1 = step_j(router_state, frozen_state, opt_state, latents, embeds, jax.random.PRNGKey(3))
    r2, _, m2 = step_j(router_state, frozen_state, opt_state, latents, embeds, jax.random.PRNGKey(3))
    assert float(m1["loss"]) == float(m2["loss"])


def test_loss_decreases_over_steps(setup):
    _, _, router_state, frozen_state, opt, step, latents, embeds = setup
    opt_state = opt.init(router_state)
    step_j = jax.jit(step)
    losses = []
    for i in range(8):
        router_state, opt_state, metrics = step_j(
            router_state, frozen_state, opt_state, latents, embeds,
            jax.random.PRNGKey(100),  # same batch/noise: pure optimization
        )
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_checkpoint_roundtrip(tmp_path, setup):
    from vorta_tpu.io.checkpoint import (
        latest_checkpoint,
        load_router_checkpoint,
        save_router_checkpoint,
    )

    _, _, router_state, _, opt, _, _, _ = setup
    opt_state = opt.init(router_state)
    save_router_checkpoint(tmp_path, 100, router_state, opt_state)
    save_router_checkpoint(tmp_path, 200, router_state, opt_state)
    assert latest_checkpoint(tmp_path).name == "step-000200"

    restored, opt_restored = load_router_checkpoint(
        tmp_path / "step-000200", router_state, opt_state
    )
    a = jax.tree.leaves(router_state)
    b = jax.tree.leaves(restored)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert opt_restored is not None


def test_latent_dataset(tmp_path):
    import torch

    from vorta_tpu.training.data import LatentDataset, epoch_iterator

    (tmp_path / "latent").mkdir()
    (tmp_path / "prompt_embed").mkdir()
    items = []
    for i in range(4):
        torch.save(torch.randn(16, 6, 8, 8), tmp_path / "latent" / f"{i}.pt")
        torch.save(torch.randn(16, 32), tmp_path / "prompt_embed" / f"{i}.pt")
        items.append({"latent_path": f"{i}.pt", "prompt_embed_path": f"{i}.pt"})
    manifest = tmp_path / "videos.json"
    manifest.write_text(json.dumps(items))

    ds = LatentDataset(str(manifest), num_latent_t=4, cfg_rate=0.0)
    lat, emb, mask = ds[0]
    assert lat.shape == (4, 8, 8, 16)  # cropped to last 4 frames, channels-last
    assert emb.shape == (16, 32)
    assert mask is None

    it = epoch_iterator(ds, batch_size=2, seed=0)
    lats, embs, _ = next(it)
    assert lats.shape == (2, 4, 8, 8, 16)
    assert embs.shape == (2, 16, 32)

    # cfg dropout zeroes embeds
    ds_cfg = LatentDataset(str(manifest), num_latent_t=4, cfg_rate=1.0)
    _, emb2, _ = ds_cfg[0]
    assert np.all(emb2 == 0)
