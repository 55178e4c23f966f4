import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from vorta_tpu.models.umt5 import UMT5_TINY, UMT5Encoder, relative_position_bucket
from vorta_tpu.models.wan_vae import WAN_VAE_TINY, WanVAE


def test_umt5_shapes_and_masking():
    enc = UMT5Encoder(UMT5_TINY, rngs=nnx.Rngs(0))
    ids = jnp.asarray([[1, 5, 9, 2, 0, 0, 0, 0]])
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0, 0, 0]], dtype=bool)
    out = enc(ids, mask)
    assert out.shape == (1, 8, UMT5_TINY.d_model)
    assert np.isfinite(np.asarray(out)).all()
    # padded positions zeroed
    assert np.all(np.asarray(out[0, 4:]) == 0)
    # changing a padded token id does not affect valid outputs
    ids2 = ids.at[0, 6].set(3)
    out2 = enc(ids2, mask)
    np.testing.assert_allclose(np.asarray(out[0, :4]), np.asarray(out2[0, :4]), rtol=1e-6)


def test_relative_position_buckets():
    rel = np.arange(-10, 11)[None, :] * np.ones((1, 1), dtype=np.int64)
    b = relative_position_bucket(rel, 32, 128)
    assert b.min() >= 0 and b.max() < 32
    # symmetric structure: positive offsets land in the upper half
    assert b[0, -1] >= 16


def test_wan_vae_decode_shape_and_causality():
    vae = WanVAE(WAN_VAE_TINY, rngs=nnx.Rngs(0))
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4, WAN_VAE_TINY.z_dim))
    video = vae.decode(z, denormalize=False)
    # 4 latent frames -> 4*(4-1)+1 = 13 pixel frames; x8 spatial... tiny cfg
    # uses dim_mult of len 4 with 3 spatial upsamples -> x8
    assert video.shape == (1, 13, 32, 32, 3)
    assert np.isfinite(np.asarray(video)).all()

    # causality: perturbing the LAST latent frame must not change the first
    # output frames
    z2 = z.at[:, -1].add(10.0)
    video2 = vae.decode(z2, denormalize=False)
    np.testing.assert_allclose(
        np.asarray(video[:, :5]), np.asarray(video2[:, :5]), atol=1e-5
    )
    assert np.abs(np.asarray(video2[:, -1]) - np.asarray(video[:, -1])).max() > 1e-3


def test_wan_vae_encode_shape():
    vae = WanVAE(WAN_VAE_TINY, rngs=nnx.Rngs(0))
    video = jax.random.normal(jax.random.PRNGKey(1), (1, 13, 32, 32, 3))
    mean, logvar = vae.encode(video)
    assert mean.shape == (1, 4, 4, 4, WAN_VAE_TINY.z_dim)
    assert logvar.shape == mean.shape


def test_wan_vae_denormalize_roundtrip():
    vae = WanVAE(WAN_VAE_TINY, rngs=nnx.Rngs(0))
    z = jnp.ones((1, 2, 2, 2, 16))
    dz = vae.denormalize_latents(z)
    expect = np.ones(16) * np.asarray(vae.cfg.latents_std) + np.asarray(vae.cfg.latents_mean)
    np.testing.assert_allclose(np.asarray(dz[0, 0, 0, 0]), expect, rtol=1e-6)
