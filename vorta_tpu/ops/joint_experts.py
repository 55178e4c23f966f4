"""Routed sparse attention for joint video+text sequences (HunyuanVideo).

HunyuanVideo's MMDiT attends over ``[video tokens | text tokens]`` jointly
(reference: vorta/attention/hunyuan.py).  The three experts become:
  * full    — dense over the joint sequence
  * low-res — video tokens pooled by similarity (Q pooled with Q's matching,
              K/V with K's matching — hunyuan.py:433-438 differs from Wan
              here), text tokens kept verbatim
  * sliding-tile — video in tiled layout with the window mask; text rows and
              columns are dense (sliding_attn_flex.py:101-128)

Per-prompt text padding is a *traced* mask, expressed as an additive kv-bias
streamed to the kernels (static tables cannot encode it); padded query rows
are zeroed after the fact, matching the reference's output padding
(hunyuan.py:176).

Internal layouts insert static alignment padding between the video and text
segments so every segment starts on a kernel-block boundary; the bias masks
the padding.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AttentionConfig
from ..geometry import cdiv, sta_tile_mask
from .attention_ref import attention_chunked
from .coreset import pool_by_similarity, unpool_by_similarity
from .experts import FULL, LOWRES, STA, lowres_groups_for
from .flash_manual import sparse_flash_attention_manual
from .layout import tile_sequence, untile_sequence
from .routed_fused import _quantize_per_head, _sta_blocks, route_expert_ids
from .sta_batched import sta_flash_headbatched
from .sta_row import sta_row_attention, supports_row_dense
from .sta_window import sta_window_attention

NEG = float(-1e30)


@dataclasses.dataclass(frozen=True)
class JointConfig:
    video: AttentionConfig
    text_len: int  # padded (static) text length

    def __hash__(self):
        return hash((self.video, self.text_len))


class JointLayout(NamedTuple):
    """Segment offsets for one expert's internal layout."""

    video_len: int  # logical video tokens at offset 0
    text_off: int  # text segment start (block aligned)
    total: int  # padded total length
    block_q: int
    block_kv: int


def _aligned_layout(video_len: int, text_len: int, bq: int, bkv: int) -> JointLayout:
    align = int(np.lcm(bq, bkv))
    text_off = align * cdiv(video_len, align)
    total = text_off + align * cdiv(text_len, align)
    return JointLayout(video_len, text_off, total, bq, bkv)


@functools.lru_cache(maxsize=16)
def joint_layouts(jcfg: JointConfig):
    cfg = jcfg.video
    b0 = cfg.block_q
    pooled = lowres_groups_for(cfg).pooled_length
    sq, skv = _sta_blocks(cfg)
    return {
        "full": _aligned_layout(cfg.seq_len, jcfg.text_len, b0, b0),
        "lowres": _aligned_layout(pooled, jcfg.text_len, b0, b0),
        "sta": _aligned_layout(cfg.seq_len, jcfg.text_len, sq, skv),
    }


def _dense_tables(layout: JointLayout):
    nq = layout.total // layout.block_q
    nkv = layout.total // layout.block_kv
    idx = np.broadcast_to(np.arange(nkv, dtype=np.int32), (1, nq, nkv)).copy()
    cnt = np.full((1, nq), nkv, np.int32)
    return idx, cnt


@functools.lru_cache(maxsize=16)
def _joint_sta_tables(jcfg: JointConfig):
    """Tables + pair bits for the tiled-video-plus-text layout.

    Video q rows see their tile window plus every text block; text q rows see
    everything.  Sub-tile bits mark video alignment padding invisible; text
    blocks get all-ones bits (the kv bias masks their padding).
    """
    cfg = jcfg.video
    layout = joint_layouts(jcfg)["sta"]
    bq, bkv = layout.block_q, layout.block_kv
    tpt = cfg.tokens_per_tile
    m_sub, k_sub = bq // tpt, bkv // tpt
    tile_mask = sta_tile_mask(cfg.latent_shape, cfg.sta_window, cfg.sta_tile)
    n_tiles = tile_mask.shape[0]
    nq = layout.total // bq
    nkv = layout.total // bkv
    first_text_kv = layout.text_off // bkv
    all_ones = np.int32(-1)

    rows = []
    width = 1
    for qi in range(nq):
        q_tok = qi * bq
        active = []
        if q_tok < layout.text_off:  # video (or video-pad) q row
            for kj in range(nkv):
                if kj >= first_text_kv:
                    active.append((kj, all_ones))
                    continue
                bits = 0
                for mi in range(m_sub):
                    qt = qi * m_sub + mi
                    if qt >= n_tiles:
                        continue
                    for ki in range(k_sub):
                        kt = kj * k_sub + ki
                        if kt >= n_tiles:
                            continue
                        if tile_mask[qt, kt]:
                            bits |= 1 << (mi * k_sub + ki)
                if bits:
                    active.append((kj, np.int32(np.uint32(bits).view(np.int32))))
        else:  # text q row: dense, but mask padded video subtiles
            for kj in range(nkv):
                if kj >= first_text_kv:
                    active.append((kj, all_ones))
                else:
                    bits = 0
                    for ki in range(k_sub):
                        if kj * k_sub + ki < n_tiles:
                            for mi in range(m_sub):
                                bits |= 1 << (mi * k_sub + ki)
                    if bits:
                        active.append((kj, np.int32(np.uint32(bits).view(np.int32))))
        rows.append(active)
        width = max(width, len(active))

    idx = np.zeros((1, nq, width), np.int32)
    bits_arr = np.zeros((1, nq, width), np.int32)
    cnt = np.zeros((1, nq), np.int32)
    for qi, active in enumerate(rows):
        for j, (kj, bb) in enumerate(active):
            idx[0, qi, j] = kj
            bits_arr[0, qi, j] = bb
        if active:
            idx[0, qi, len(active):] = active[-1][0]
        cnt[0, qi] = len(active)
    return idx, cnt, bits_arr


def _assemble(video: jax.Array, text: jax.Array, layout: JointLayout) -> jax.Array:
    """Place (B,H,Sv,D) video and (B,H,L,D) text into the aligned layout."""
    b, h, _, d = video.shape
    out = jnp.zeros((b, h, layout.total, d), video.dtype)
    out = jax.lax.dynamic_update_slice_in_dim(out, video, 0, axis=2)
    return jax.lax.dynamic_update_slice_in_dim(out, text, layout.text_off, axis=2)


def _split(joint: jax.Array, layout: JointLayout, video_len: int, text_len: int):
    return (
        joint[:, :, :video_len],
        joint[:, :, layout.text_off : layout.text_off + text_len],
    )


def _bias(text_mask: jax.Array, layout: JointLayout, video_valid: int) -> jax.Array:
    """(B, L) bool text mask -> (1, total) additive bias for batch row 0.

    Like the reference (hunyuan.py:169, batch-1 assert; wan.py:398 uses the
    first batch row for routing), the joint kernels currently share one
    padding mask across the batch: CFG pairs carry identical masks.
    """
    total = layout.total
    pos = jnp.arange(total)
    video_ok = pos < video_valid
    in_text = (pos >= layout.text_off) & (pos < layout.text_off + text_mask.shape[-1])
    text_idx = jnp.clip(pos - layout.text_off, 0, text_mask.shape[-1] - 1)
    text_ok = in_text & jnp.take(text_mask[0], text_idx)
    ok = video_ok | text_ok
    return jnp.where(ok, 0.0, NEG)[None, :]


def joint_full_attention(
    qv, kv_, vv, qt, kt, vt, text_mask, jcfg: JointConfig,
    active=None, scale=None, interpret=False,
):
    layout = joint_layouts(jcfg)["full"]
    h = qv.shape[1]
    q = _assemble(qv, qt, layout)
    k = _assemble(kv_, kt, layout)
    v = _assemble(vv, vt, layout)
    idx, cnt = _dense_tables(layout)
    if active is None:
        active = jnp.ones((h,), bool)
    cnt_t = jnp.where(active[:, None], jnp.broadcast_to(jnp.asarray(cnt), (h,) + cnt.shape[1:]), 0)
    bias = _bias(text_mask, layout, jcfg.video.seq_len)
    out_dtype = q.dtype
    qk_scale = None
    if getattr(jcfg.video, "qk_int8", False):
        # serving mode: int8 QK^T with dynamic per-head scales (video and
        # text tokens share the head's scale); see ops/routed_fused.py
        q, sq = _quantize_per_head(q)
        k, sk = _quantize_per_head(k)
        qk_scale = sq * sk
    out = sparse_flash_attention_manual(
        q, k, v, jnp.asarray(idx), cnt_t,
        scale=scale, block_q=layout.block_q, block_kv=layout.block_kv,
        kv_bias=bias, interpret=interpret, softmax="fast", qk_scale=qk_scale,
    ).astype(out_dtype)
    return _split(out, layout, jcfg.video.seq_len, jcfg.text_len)


def joint_lowres_attention(
    qv, kv_, vv, qt, kt, vt, text_mask, jcfg: JointConfig,
    active=None, scale=None, interpret=False,
):
    cfg = jcfg.video
    groups = lowres_groups_for(cfg)
    layout = joint_layouts(jcfg)["lowres"]
    h = qv.shape[1]
    # fused Pallas pool; hunyuan keys get their own matching (hunyuan.py:433-438)
    from .coreset_pallas import pool_qkv, unpool as unpool_pallas

    hm_kw = {}
    if active is not None:
        # head-scaled pool: DMA + matching run only for the routed heads
        # (padded grid positions revisit the last routed head's blocks);
        # non-routed pooled rows are uninitialized but their attention
        # counts are zeroed below and the unpooled rows masked at the end
        n_act = jnp.maximum(jnp.sum(active.astype(jnp.int32)), 1)
        order = jnp.argsort(~active)
        hm = jnp.take(order, jnp.minimum(jnp.arange(h), n_act - 1))
        hm_kw = dict(head_map=hm, num_active=n_act)
    pq, pk, pv, picks = pool_qkv(qv, kv_, vv, groups, kv_matching_from_k=True,
                                 return_picks=True, interpret=interpret,
                                 **hm_kw)
    q = _assemble(pq, qt, layout)
    k = _assemble(pk, kt, layout)
    v = _assemble(pv, vt, layout)
    idx, cnt = _dense_tables(layout)
    if active is None:
        active = jnp.ones((h,), bool)
    cnt_t = jnp.where(active[:, None], jnp.broadcast_to(jnp.asarray(cnt), (h,) + cnt.shape[1:]), 0)
    bias = _bias(text_mask, layout, groups.pooled_length)
    out_dtype = q.dtype
    qk_scale = None
    if getattr(jcfg.video, "qk_int8", False):
        q, sq = _quantize_per_head(q)
        k, sk = _quantize_per_head(k)
        qk_scale = sq * sk
    out = sparse_flash_attention_manual(
        q, k, v, jnp.asarray(idx), cnt_t,
        scale=scale, block_q=layout.block_q, block_kv=layout.block_kv,
        kv_bias=bias, interpret=interpret, softmax="fast", qk_scale=qk_scale,
    ).astype(out_dtype)
    pooled_out, text_out = _split(out, layout, groups.pooled_length, jcfg.text_len)
    video_out = unpool_pallas(pooled_out, qv, groups, picks=picks,
                              interpret=interpret, **hm_kw).astype(qv.dtype)
    if active is not None:
        # non-routed heads' unpool rows are uninitialized in head-map mode
        video_out = jnp.where(active[None, :, None, None], video_out, 0)
    return video_out, text_out


def joint_sta_attention(
    qv, kv_, vv, qt, kt, vt, text_mask, jcfg: JointConfig,
    active=None, scale=None, interpret=False,
):
    cfg = jcfg.video
    layout = joint_layouts(jcfg)["sta"]
    h = qv.shape[1]
    shape, tile = cfg.latent_shape, cfg.sta_tile
    if active is None:
        active = jnp.ones((h,), bool)
    from .sta_window import prefer_window_dense

    if prefer_window_dense(shape, tile) and jcfg.text_len % 8 == 0:
        return _joint_sta_window_dense(
            qv, kv_, vv, qt, kt, vt, text_mask, jcfg, active, scale, interpret
        )
    # pack routed heads into leading head groups so the kernel can skip
    # fully-inactive groups (compute scales with the routed head count)
    perm = jnp.argsort(~active)
    inv_perm = jnp.argsort(perm)

    def prep(video, text):
        return jnp.take(
            _assemble(tile_sequence(video, shape, tile), text, layout), perm, axis=1
        )

    q = prep(qv, qt)
    k = prep(kv_, kt)
    v = prep(vv, vt)
    idx, cnt, bits = _joint_sta_tables(jcfg)
    bias = _bias(text_mask, layout, cfg.seq_len)
    out = sta_flash_headbatched(
        q, k, v, jnp.asarray(idx), jnp.asarray(cnt), jnp.take(active, perm),
        pair_bits=jnp.asarray(bits), tokens_per_tile=cfg.tokens_per_tile,
        kv_bias=bias, scale=scale,
        block_q=layout.block_q, block_kv=layout.block_kv, interpret=interpret,
        softmax="fast",
    )
    out = jnp.take(out, inv_perm, axis=1)
    tiled_out, text_out = _split(out, layout, cfg.seq_len, jcfg.text_len)
    return untile_sequence(tiled_out, shape, tile), text_out


def _joint_sta_window_dense(
    qv, kv_, vv, qt, kt, vt, text_mask, jcfg, active, scale, interpret
):
    """Zero-relayout joint STA: video queries run the window-dense kernel
    with a dense text-KV tail; text queries (a few hundred rows) attend
    densely over [raster video | text] through the manual-DMA kernel —
    no tile relayouts, no assemble copies of the video tensors."""
    cfg = jcfg.video
    h = qv.shape[1]
    text_bias = jnp.where(text_mask[0], 0.0, NEG)[None, :].astype(jnp.float32)

    sta_kw = dict(
        latent_shape=cfg.latent_shape, tile=cfg.sta_tile, window=cfg.sta_window,
        scale=scale, text_k=kt, text_v=vt, text_bias=text_bias,
        interpret=interpret,
    )
    from .sta_pipe import sta_pipe_attention, supports_pipe

    if supports_pipe(cfg.latent_shape, cfg.sta_tile, qv.shape[-1],
                     qv.dtype.itemsize, text_len=kt.shape[2],
                     window=cfg.sta_window):
        video_out = sta_pipe_attention(qv, kv_, vv, active, **sta_kw)
    elif supports_row_dense(cfg.latent_shape, cfg.sta_tile, qv.shape[-1],
                            qv.dtype.itemsize, text_len=kt.shape[2],
                            window=cfg.sta_window):
        video_out = sta_row_attention(qv, kv_, vv, active, **sta_kw)
    else:
        video_out = sta_window_attention(qv, kv_, vv, active, **sta_kw)

    # text rows: dense joint attention (a fraction of a percent of the work)
    k_joint = jnp.concatenate([kv_, kt], axis=2)
    v_joint = jnp.concatenate([vv, vt], axis=2)
    s_all = k_joint.shape[2]
    lt = jcfg.text_len
    bq = max(8, 1 << (lt - 1).bit_length())
    bkv = cfg.block_kv
    nq, nkv = cdiv(lt, bq), cdiv(s_all, bkv)
    idx = np.broadcast_to(np.arange(nkv, dtype=np.int32), (1, nq, nkv)).copy()
    cnt = jnp.where(
        active[:, None], jnp.full((1, nq), nkv, np.int32), 0
    ).astype(jnp.int32)
    bias_joint = jnp.concatenate(
        [jnp.zeros((1, cfg.seq_len), jnp.float32), text_bias], axis=1
    )

    def pad_to(x, target):
        if x.shape[2] == target:
            return x
        padc = [(0, 0)] * x.ndim
        padc[2] = (0, target - x.shape[2])
        return jnp.pad(x, padc)

    out_t = sparse_flash_attention_manual(
        pad_to(qt, nq * bq),
        pad_to(k_joint, nkv * bkv),
        pad_to(v_joint, nkv * bkv),
        jnp.asarray(idx), cnt,
        scale=scale, block_q=bq, block_kv=bkv,
        kv_valid_len=s_all,
        kv_bias=jnp.pad(bias_joint, ((0, 0), (0, nkv * bkv - s_all)),
                        constant_values=NEG),
        interpret=interpret, softmax="fast",
    )
    return video_out, out_t[:, :, :lt]


# ---------------------------------------------------------------------------
# Differentiable (training) paths via the chunked reference
# ---------------------------------------------------------------------------


def _chunked_joint(q, k, v, block_mask, bias, block, scale, video_dtype):
    out = attention_chunked(
        q, k, v, block_mask=block_mask, scale=scale,
        block_q=block, block_kv=block, kv_bias=bias,
    )
    return out.astype(video_dtype)


def joint_full_attention_ref(qv, kv_, vv, qt, kt, vt, text_mask, jcfg, scale=None):
    layout = joint_layouts(jcfg)["full"]
    q = _assemble(qv, qt, layout)
    k = _assemble(kv_, kt, layout)
    v = _assemble(vv, vt, layout)
    bias = _bias(text_mask, layout, jcfg.video.seq_len)
    out = _chunked_joint(q, k, v, None, bias, layout.block_q, scale, qv.dtype)
    return _split(out, layout, jcfg.video.seq_len, jcfg.text_len)


def joint_lowres_attention_ref(qv, kv_, vv, qt, kt, vt, text_mask, jcfg, scale=None):
    cfg = jcfg.video
    groups = lowres_groups_for(cfg)
    layout = joint_layouts(jcfg)["lowres"]
    pq, q_match = pool_by_similarity(qv, groups)
    pk, k_match = pool_by_similarity(kv_, groups)
    pv, _ = pool_by_similarity(vv, groups, k_match)
    q = _assemble(pq, qt, layout)
    k = _assemble(pk, kt, layout)
    v = _assemble(pv, vt, layout)
    bias = _bias(text_mask, layout, groups.pooled_length)
    out = _chunked_joint(q, k, v, None, bias, layout.block_q, scale, qv.dtype)
    pooled_out, text_out = _split(out, layout, groups.pooled_length, jcfg.text_len)
    return unpool_by_similarity(pooled_out, groups, q_match).astype(qv.dtype), text_out


def joint_sta_attention_ref(qv, kv_, vv, qt, kt, vt, text_mask, jcfg, scale=None):
    cfg = jcfg.video
    layout = joint_layouts(jcfg)["sta"]
    idx, cnt, bits = _joint_sta_tables(jcfg)
    # densify tables at sub-tile granularity for the chunked path
    tpt = cfg.tokens_per_tile
    n_sub = layout.total // tpt
    bm = np.zeros((1, n_sub, n_sub), bool)
    bq, bkv = layout.block_q, layout.block_kv
    m_sub, k_sub = bq // tpt, bkv // tpt
    for qi in range(idx.shape[1]):
        for j in range(cnt[0, qi]):
            kj = idx[0, qi, j]
            word = np.uint32(bits[0, qi, j])
            for mi in range(m_sub):
                for ki in range(k_sub):
                    if (word >> np.uint32(mi * k_sub + ki)) & np.uint32(1):
                        bm[0, qi * m_sub + mi, kj * k_sub + ki] = True
    shape, tile = cfg.latent_shape, cfg.sta_tile
    q = _assemble(tile_sequence(qv, shape, tile), qt, layout)
    k = _assemble(tile_sequence(kv_, shape, tile), kt, layout)
    v = _assemble(tile_sequence(vv, shape, tile), vt, layout)
    bias = _bias(text_mask, layout, cfg.seq_len)
    out = _chunked_joint(q, k, v, jnp.asarray(bm), bias, tpt, scale, qv.dtype)
    tiled_out, text_out = _split(out, layout, cfg.seq_len, jcfg.text_len)
    return untile_sequence(tiled_out, shape, tile), text_out


def routed_joint_attention(
    qv, kv_, vv, qt, kt, vt,
    scores: jax.Array,
    text_mask: jax.Array,
    jcfg: JointConfig,
    mode: str = "soft",
    scale: Optional[float] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (video_out (B,H,Sv,D), text_out (B,H,L,D)); padded text rows
    are zeroed like the reference (hunyuan.py:176).

    Modes: "hard" (per-head masked fast kernels), "soft" (differentiable
    weighted mixture via the chunked reference), "off" (full attention, fast
    kernel), "off_ref" (full attention, differentiable — the frozen-teacher
    pass runs under grad tracing so it cannot touch vjp-less kernels even
    though its gradients are discarded)."""
    h = qv.shape[1]
    if mode == "off":
        video, text = joint_full_attention(
            qv, kv_, vv, qt, kt, vt, text_mask, jcfg, scale=scale, interpret=interpret
        )
    elif mode == "off_ref":
        video, text = joint_full_attention_ref(
            qv, kv_, vv, qt, kt, vt, text_mask, jcfg, scale=scale
        )
    elif mode == "hard":
        ids = jax.lax.stop_gradient(route_expert_ids(scores, jcfg.video.tau_sparse))
        from .sta_window import prefer_window_dense

        if prefer_window_dense(jcfg.video.latent_shape, jcfg.video.sta_tile):
            # per-head lax.switch (same rationale as ops/routed_fused): each
            # head runs exactly its expert — the lowres pool/unpool data
            # movement scales with the heads actually routed there, and the
            # cross-expert combine adds/zero-fills disappear
            one = jnp.ones((1,), bool)

            def head_out(hh):
                sl = slice(hh, hh + 1)
                args = (qv[:, sl], kv_[:, sl], vv[:, sl],
                        qt[:, sl], kt[:, sl], vt[:, sl], text_mask, jcfg)

                def full_h():
                    return joint_full_attention(
                        *args, active=one, scale=scale, interpret=interpret)

                def lowres_h():
                    return joint_lowres_attention(
                        *args, active=one, scale=scale, interpret=interpret)

                def sta_h():
                    return joint_sta_attention(
                        *args, active=one, scale=scale, interpret=interpret)

                return jax.lax.switch(ids[hh], [full_h, lowres_h, sta_h])

            outs = [head_out(hh) for hh in range(h)]
            video = jnp.concatenate([o[0] for o in outs], axis=1)
            text = jnp.concatenate([o[1] for o in outs], axis=1)
        else:
            def branch(fn, e):
                active = ids == e
                zero = (jnp.zeros_like(qv), jnp.zeros_like(qt))
                return jax.lax.cond(
                    jnp.any(active),
                    lambda: fn(qv, kv_, vv, qt, kt, vt, text_mask, jcfg,
                               active=active, scale=scale, interpret=interpret),
                    lambda: zero,
                )

            fv, ft = branch(joint_full_attention, FULL)
            lv, lt = branch(joint_lowres_attention, LOWRES)
            sv, st = branch(joint_sta_attention, STA)
            video = fv + lv + sv
            text = ft + lt + st
    elif mode == "soft":
        outs = [
            joint_full_attention_ref(qv, kv_, vv, qt, kt, vt, text_mask, jcfg, scale=scale),
            joint_lowres_attention_ref(qv, kv_, vv, qt, kt, vt, text_mask, jcfg, scale=scale),
            joint_sta_attention_ref(qv, kv_, vv, qt, kt, vt, text_mask, jcfg, scale=scale),
        ]
        w = scores.astype(jnp.float32)  # (B, H, 3)
        video = sum(
            w[:, :, e, None, None] * o[0].astype(jnp.float32) for e, o in enumerate(outs)
        ).astype(qv.dtype)
        text = sum(
            w[:, :, e, None, None] * o[1].astype(jnp.float32) for e, o in enumerate(outs)
        ).astype(qt.dtype)
    else:
        raise ValueError(f"unknown mode {mode!r}")

    text = text * text_mask[0][None, None, :, None].astype(text.dtype)
    return video, text
