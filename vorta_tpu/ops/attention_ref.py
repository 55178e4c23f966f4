"""Pure-XLA attention: small-shape oracle + memory-bounded chunked version.

Two roles:
  * ``attention_dense`` — materializes the score matrix; the numerical oracle
    for the Pallas kernels at small shapes.
  * ``attention_chunked`` — online-softmax over kv chunks via ``lax.scan``
    with rematerialization; differentiable, so it is also the training-time
    fallback path (router training backprops activations through attention —
    reference: scripts/wan/train_one_step.py) and the backward rule for the
    Pallas forward kernel until a dedicated backward kernel lands.

Both accept an optional *block mask* with the same semantics as the Pallas
kernel's block tables: visibility constant within (block_q x block_kv) tiles.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = float(-1e30)


def attention_dense(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Reference attention. q/k/v: (B, H, S, D); mask broadcastable to
    (B, H, Sq, Skv), True = attend."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    if mask is not None:
        s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return out.astype(q.dtype)


def expand_block_mask(
    block_mask: jax.Array, block_q: int, block_kv: int
) -> jax.Array:
    """(H, nq, nkv) bool -> (1, H, Sq, Skv) element mask (for the oracle)."""
    m = jnp.repeat(jnp.repeat(block_mask, block_q, axis=-2), block_kv, axis=-1)
    return m[None]


@partial(jax.jit, static_argnames=("scale", "block_q", "block_kv", "kv_valid_len"))
def attention_chunked(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_kv: int = 256,
    kv_valid_len: Optional[int] = None,
    kv_bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Online-softmax attention scanning kv chunks; O(S * block) memory.

    q: (B, H, Sq, D), k/v: (B, H, Skv, D); Sq % block_q == Skv % block_kv == 0.
    block_mask: optional (H, Sq // block_q, Skv // block_kv) bool.
    kv_valid_len: mask kv positions >= this logical length.
    kv_bias: optional (B, Skv) additive logits bias (traced padding masks).
    Fully-masked q rows produce zeros.
    """
    b, h, sq, d = q.shape
    skv = k.shape[2]
    if sq % block_q or skv % block_kv:
        raise ValueError(f"seq lengths ({sq},{skv}) not divisible by blocks ({block_q},{block_kv})")
    if scale is None:
        scale = d**-0.5
    nq, nkv = sq // block_q, skv // block_kv

    qf = (q.astype(jnp.float32) * scale).reshape(b, h, nq, block_q, d)
    kf = k.astype(jnp.float32).reshape(b, h, nkv, block_kv, d)
    vf = v.astype(jnp.float32).reshape(b, h, nkv, block_kv, d)
    # scan over kv chunks: move chunk axis to front
    kf = jnp.moveaxis(kf, 2, 0)  # (nkv, B, H, block_kv, D)
    vf = jnp.moveaxis(vf, 2, 0)
    if block_mask is not None:
        bm = jnp.moveaxis(block_mask, -1, 0)  # (nkv, H, nq)
    else:
        bm = jnp.ones((nkv, h, nq), dtype=bool)
    if kv_valid_len is None:
        kv_valid_len = skv
    col_valid = (jnp.arange(skv) < kv_valid_len).reshape(nkv, block_kv)
    if kv_bias is None:
        bias = jnp.zeros((nkv, 1, block_kv), jnp.float32)
    else:
        bias = jnp.moveaxis(
            kv_bias.astype(jnp.float32).reshape(-1, nkv, block_kv), 1, 0
        )  # (nkv, B, block_kv)

    def body(carry, chunk):
        m_prev, l_prev, acc_prev = carry
        kj, vj, mj, cj, bj = chunk
        s = jnp.einsum("bhnqd,bhkd->bhnqk", qf, kj)  # (B,H,nq,block_q,block_kv)
        s = s + bj[:, None, None, None, :]
        s = jnp.where(mj[None, :, :, None, None], s, NEG_INF)
        s = jnp.where(cj[None, None, None, None, :], s, NEG_INF)
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        # guard fully-masked-so-far rows: keep exp argument finite
        m_safe = jnp.where(m_new <= NEG_INF, 0.0, m_new)
        p = jnp.exp(s - m_safe[..., None])
        p = jnp.where(mj[None, :, :, None, None], p, 0.0)
        alpha = jnp.exp(jnp.where(m_prev <= NEG_INF, NEG_INF, m_prev - m_safe))
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc_new = acc_prev * alpha[..., None] + jnp.einsum(
            "bhnqk,bhkd->bhnqd", p, vj
        )
        return (m_new, l_new, acc_new), None

    m0 = jnp.full((b, h, nq, block_q), NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((b, h, nq, block_q), dtype=jnp.float32)
    acc0 = jnp.zeros((b, h, nq, block_q, d), dtype=jnp.float32)

    (m_f, l_f, acc_f), _ = jax.lax.scan(
        jax.checkpoint(body), (m0, l0, acc0), (kf, vf, bm, col_valid, bias)
    )
    out = acc_f / jnp.where(l_f == 0.0, 1.0, l_f)[..., None]
    return out.reshape(b, h, sq, d).astype(q.dtype)
