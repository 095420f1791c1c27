"""Fused (flash-style) attention Pallas kernel for TPU.

The 'native tier' of this framework (SURVEY.md 2.9): the reference's
performance-critical ops are stock cuDNN/cuBLAS calls; here the hot
self-attention of the U-Nets becomes a tiled Pallas kernel that never
materializes the [T, T] logits matrix in HBM (classic online-softmax
flash attention), with fp32 softmax matching the reference's AttentionOp
(`networks_edm.py:105-118`) and guided-diffusion QKVAttention
(`guided_diffusion/unet.py:328-392`).

Layout: q, k, v are [B, T, d] per (batch*head); d is zero-padded to a lane
multiple of 128 outside the kernel.  The backward pass is a pair of Pallas
kernels (FlashAttention-2 style: dQ over k-tiles, dK/dV over q-tiles,
recomputing P from the forward's saved logsumexp) whenever the [B, T, T]
f32 logits would exceed _FLASH_BWD_MIN_LOGITS_BYTES, so the logits never
touch HBM in training either -- and with the transposed dK/dV kernel the
flash backward is also 2.3-2.7x FASTER than the einsum recompute there;
smaller shapes fall back to the einsum recompute under custom_vjp.  The
multi-head entry point has its own native backward on the channel-packed
layout (_flash_bwd_mh: same k-major trick per head, no HBM transpose
passes) with the flat kernels as fallback where its VMEM plan doesn't fit.

Measured on one v5e chip (chained, delta-timed; d=64, bf16):
  T=4096 (SD 512px): 1.08 ms vs 2.97 ms einsum (2.7x);
  T=1024 (256px models): 0.20 ms vs 0.62 ms at the old (256,256) blocks.
Block defaults (512, 1024) came from that sweep; they clamp to the padded
sequence length, so short-T shapes are unaffected.  Matmuls take the
storage dtype (bf16 at full MXU rate, exact f32 accumulation) and the
softmax weights are cast to the storage dtype before p@v -- exactly the
reference AttentionOp's `.softmax(dim).to(q.dtype)`.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "flash_attention_mh", "sdpa"]

_NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, block_k,
                 seq_len, kv_len):
    """One (bh, q_tile) program: online softmax over K tiles.

    kv_len is the zero-padded key count; key positions >= seq_len are masked
    to -inf so ragged sequence lengths stay exact."""
    # inputs stay in their storage dtype: bf16 x bf16 -> f32-accumulate runs
    # at full MXU rate and computes the same products as an f32 matmul over
    # bf16-valued inputs; the scale is applied to the f32 logits (exact,
    # slightly MORE precise than pre-scaling q in f32)
    q = q_ref[0]  # [bq, d]
    bq = q.shape[0]
    d = q.shape[1]
    num_k = kv_len // block_k
    masked = kv_len != seq_len

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        logits = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bq, bk]
        if masked:
            col = i * block_k + jax.lax.broadcasted_iota(
                jnp.int32, logits.shape, 1)
            logits = jnp.where(col < seq_len, logits, _NEG_INF)
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + p.sum(axis=-1, keepdims=True)
        # weights cast to the storage dtype before p@v -- exactly the
        # reference AttentionOp's `.softmax(...).to(q.dtype)` semantics
        # (networks_edm.py:105-118); accumulation stays f32
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_k, body, (acc, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    # per-row logsumexp, saved for the flash backward (P = exp(S - lse));
    # [B, 1, TQ] layout: a 2-D [B, TQ] block would violate the TPU (8, 128)
    # sublane/lane block rule, a singleton middle dim satisfies it exactly
    lse_ref[0, 0] = (m + jnp.log(l)).reshape(-1)


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x, size
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), size


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "interpret"))
def _flash_fwd_res(q, k, v, scale, block_q=512, block_k=1024,
                   interpret=False):
    """q, k, v: [B, T, d] -> (out [B, T, d], lse [B, Tq_padded] f32)."""
    b, t, d = q.shape
    q, _ = _pad_to(q, 2, 128)
    k, _ = _pad_to(k, 2, 128)
    v, _ = _pad_to(v, 2, 128)
    dp = q.shape[2]
    block_q = min(block_q, ((t + 127) // 128) * 128)
    block_k = min(block_k, ((t + 127) // 128) * 128)
    # ragged T: zero-pad q rows (garbage rows sliced off below) and k/v keys
    # (masked to -inf inside the kernel via their global column index)
    q, _ = _pad_to(q, 1, block_q)
    k, _ = _pad_to(k, 1, block_k)
    v, _ = _pad_to(v, 1, block_k)
    tq, tk = q.shape[1], k.shape[1]

    grid = (b, tq // block_q)
    out, lse = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, block_k=block_k,
                          seq_len=t, kv_len=tk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda bi, qi: (bi, qi, 0)),
            pl.BlockSpec((1, tk, dp), lambda bi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, tk, dp), lambda bi, qi: (bi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dp), lambda bi, qi: (bi, qi, 0)),
            pl.BlockSpec((1, 1, block_q), lambda bi, qi: (bi, 0, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, tq, dp), q.dtype),
            jax.ShapeDtypeStruct((b, 1, tq), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return out[:, :t, :d], lse


def _flash_fwd(q, k, v, scale, block_q=512, block_k=1024, interpret=False):
    """q, k, v: [B, T, d] -> [B, T, d]."""
    return _flash_fwd_res(q, k, v, scale, block_q, block_k, interpret)[0]


def _attn_kernel_mh(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, num_heads,
                    block_k, seq_len, kv_len):
    """One (b, q_tile) program over channel-packed [B, T, H*d] inputs.

    The U-Net's native token layout is consumed directly -- no
    [B,T,H,d]->[B*H,T,d] HBM transpose pass and no d->128 zero-pad copies.
    Heads live side by side on the lane axis (full-lane blocks keep the
    Mosaic (8,128) block rule happy for ANY head count -- a singleton head
    block dim would violate it for H not divisible by 8); the kernel loops
    heads with static lane slices, so each head's qk contraction runs over
    its true d (half MXU rate at d=64 -- still strictly cheaper than
    doubling both matmuls on padded lanes, and HBM never sees it)."""
    bq = q_ref.shape[1]
    d = q_ref.shape[2] // num_heads
    num_k = kv_len // block_k
    masked = kv_len != seq_len

    for h in range(num_heads):
        q = q_ref[0, :, h * d:(h + 1) * d]  # [bq, d] static lane slice

        def body(i, carry, q=q, h=h):
            acc, m_prev, l_prev = carry
            k = k_ref[0, pl.ds(i * block_k, block_k), h * d:(h + 1) * d]
            v = v_ref[0, pl.ds(i * block_k, block_k), h * d:(h + 1) * d]
            logits = scale * jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [bq, bk]
            if masked:
                col = i * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, logits.shape, 1)
                logits = jnp.where(col < seq_len, logits, _NEG_INF)
            m_cur = jnp.max(logits, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(logits - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + p.sum(axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc, m_new, l_new

        acc = jnp.zeros((bq, d), jnp.float32)
        m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((bq, 1), jnp.float32)
        acc, m, l = jax.lax.fori_loop(0, num_k, body, (acc, m0, l0))
        o_ref[0, :, h * d:(h + 1) * d] = (acc / l).astype(o_ref.dtype)
        lse_ref[0, h, :] = (m + jnp.log(l)).reshape(-1)


# Small-d head packing.  At head dim d < 128 every per-head matmul pads its
# contraction lanes (q@k^T) or output lanes (p@v) to the MXU's 128 anyway,
# so the per-head loop wastes 128/d of the array by construction (the
# measured 25% cap at the LDM tier's d=32, BENCH_NOTES).  The packed kernel
# fuses P = 128//d heads into ONE matmul pair per k-tile: a block-diagonal
# Q is laid out along the SUBLANE (query) axis ([P*bq, P*d], row block j
# keeps lanes j*d:(j+1)*d), so q_bd @ k_group^T yields [P*bq, bk] logits
# whose rows are independent (head, query) pairs -- the row-wise online
# softmax is unchanged, the zero lanes contribute exact zeros (results
# identical up to f32 reduction order), and p @ v_group computes all P
# diagonal blocks in one product.  Total padded MXU MACs are identical to the per-head loop; the
# win is P-times fewer matmul issues and no per-k-iteration odd-lane-offset
# slices (block-diagonal build + output extraction amortize once per
# q-tile).  Toggle for A/B probes; production dispatch uses _pack_factor.
_PACK_SMALL_D = True


def _pack_factor(d):
    return max(1, 128 // d) if _PACK_SMALL_D else 1


def _attn_kernel_mh_packed(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale,
                           num_heads, block_k, seq_len, kv_len, pack):
    """One (b, q_tile) program over channel-packed [B, T, H*d] inputs with
    `pack` heads fused per matmul (see _PACK_SMALL_D note above)."""
    bq = q_ref.shape[1]
    d = q_ref.shape[2] // num_heads
    num_k = kv_len // block_k
    masked = kv_len != seq_len

    h0 = 0
    while h0 < num_heads:
        p = min(pack, num_heads - h0)
        w = p * d
        qg = q_ref[0, :, h0 * d:h0 * d + w]  # [bq, w]
        lane = jax.lax.broadcasted_iota(jnp.int32, (bq, w), 1) // d
        qbd = jnp.concatenate(
            [jnp.where(lane == j, qg, 0) for j in range(p)], axis=0)

        def body(i, carry, qbd=qbd, h0=h0, w=w):
            acc, m_prev, l_prev = carry
            kg = k_ref[0, pl.ds(i * block_k, block_k), h0 * d:h0 * d + w]
            vg = v_ref[0, pl.ds(i * block_k, block_k), h0 * d:h0 * d + w]
            logits = scale * jax.lax.dot_general(
                qbd, kg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [p*bq, bk]
            if masked:
                col = i * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, logits.shape, 1)
                logits = jnp.where(col < seq_len, logits, _NEG_INF)
            m_cur = jnp.max(logits, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            pw = jnp.exp(logits - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + pw.sum(axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                pw.astype(vg.dtype), vg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [p*bq, w]
            return acc, m_new, l_new

        acc = jnp.zeros((p * bq, w), jnp.float32)
        m0 = jnp.full((p * bq, 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((p * bq, 1), jnp.float32)
        acc, m, l = jax.lax.fori_loop(0, num_k, body, (acc, m0, l0))
        out = acc / l  # [p*bq, w]
        lse = (m + jnp.log(l)).reshape(-1)  # [p*bq]
        for j in range(p):
            o_ref[0, :, (h0 + j) * d:(h0 + j + 1) * d] = out[
                j * bq:(j + 1) * bq, j * d:(j + 1) * d].astype(o_ref.dtype)
            lse_ref[0, h0 + j, :] = lse[j * bq:(j + 1) * bq]
        h0 += p


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "block_q",
                                             "block_k", "interpret", "pack"))
def _flash_fwd_mh_res(q, k, v, num_heads, scale, block_q=512, block_k=1024,
                      interpret=False, pack=1):
    """q, k, v: [B, T, H*d] -> (out [B, T, H*d], lse [B, H, Tq] f32)."""
    b, t, c = q.shape
    block_q = min(block_q, ((t + 127) // 128) * 128)
    block_k = min(block_k, ((t + 127) // 128) * 128)
    q, _ = _pad_to(q, 1, block_q)
    k, _ = _pad_to(k, 1, block_k)
    v, _ = _pad_to(v, 1, block_k)
    tq, tk = q.shape[1], k.shape[1]

    if pack > 1:
        kernel = functools.partial(
            _attn_kernel_mh_packed, scale=scale, num_heads=num_heads,
            block_k=block_k, seq_len=t, kv_len=tk, pack=pack)
    else:
        kernel = functools.partial(
            _attn_kernel_mh, scale=scale, num_heads=num_heads,
            block_k=block_k, seq_len=t, kv_len=tk)
    grid = (b, tq // block_q)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda bi, qi: (bi, qi, 0)),
            pl.BlockSpec((1, tk, c), lambda bi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, tk, c), lambda bi, qi: (bi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, c), lambda bi, qi: (bi, qi, 0)),
            pl.BlockSpec((1, num_heads, block_q), lambda bi, qi: (bi, 0, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, tq, c), q.dtype),
            jax.ShapeDtypeStruct((b, num_heads, tq), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return out[:, :t], lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention_mh(q, k, v, scale, interpret=False, block_q=512,
                       block_k=1024):
    """Multi-head fused attention on the native token layout.

    q, k, v: [B, T, H, d], attention within each (batch, head) pair.
    Forward never touches HBM beyond the inputs/outputs themselves (the
    [B,T,H,d]->[B,T,H*d] view is a free reshape of contiguous memory; no
    head flattening, no lane padding).  Backward dispatch (_mh_bwd):
    native k-major mh kernels on the packed layout when _mh_bwd_plan fits
    (no HBM transposes in training either), else the grid-STREAMED mh
    kernels when _mh_bwd_stream_plan fits (no full-length VMEM residency
    -- SD's T=4096 levels), else flatten to the [B*H, T, d] kernels
    (4 transpose passes), else the einsum VJP below the logits-bytes
    crossover."""
    b, t, h, d = q.shape
    out, _ = _flash_fwd_mh_res(q.reshape(b, t, h * d), k.reshape(b, t, h * d),
                               v.reshape(b, t, h * d), h, scale,
                               block_q=block_q, block_k=block_k,
                               interpret=interpret, pack=_pack_factor(d))
    return out.reshape(b, t, h, d)


def _mh_fwd(q, k, v, scale, interpret, block_q, block_k):
    b, t, h, d = q.shape
    out, lse = _flash_fwd_mh_res(q.reshape(b, t, h * d),
                                 k.reshape(b, t, h * d),
                                 v.reshape(b, t, h * d), h, scale,
                                 block_q=block_q, block_k=block_k,
                                 interpret=interpret, pack=_pack_factor(d))
    out = out.reshape(b, t, h, d)
    return out, (q, k, v, out, lse)


def _mh_bwd(scale, interpret, block_q, block_k, res, g):
    """mh backward dispatch: native k-major mh kernels when their VMEM plan
    fits (no [B,T,H,d]<->[B*H,T,d] HBM transpose passes -- 4 per backward
    otherwise), then the flat flash kernels via transposes, then the einsum
    VJP recompute below the logits-bytes crossover."""
    q, k, v, out, lse = res
    b, t, h, d = q.shape

    if _use_flash_bwd(b * h, t):
        plan = _mh_bwd_plan(t, h * d, h, jnp.dtype(q.dtype).itemsize)
        if plan is not None:
            return _flash_bwd_mh(q.reshape(b, t, h * d),
                                 k.reshape(b, t, h * d),
                                 v.reshape(b, t, h * d),
                                 out.reshape(b, t, h * d), lse,
                                 g.reshape(b, t, h * d), h, scale,
                                 block_q=plan[0], block_k=plan[1],
                                 interpret=interpret, out_shape=(b, t, h, d))
        plan = _mh_bwd_stream_plan(t, h * d, h, jnp.dtype(q.dtype).itemsize)
        if plan is not None:
            # grid-streamed: no full-length VMEM residency (SD's T=4096
            # level lands here instead of the flat 4-transpose fallback)
            return _flash_bwd_mh_stream(
                q.reshape(b, t, h * d), k.reshape(b, t, h * d),
                v.reshape(b, t, h * d), out.reshape(b, t, h * d), lse,
                g.reshape(b, t, h * d), h, scale,
                block_q=plan[0], block_k=plan[1],
                interpret=interpret, out_shape=(b, t, h, d))

    def flat(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, t, d)

    def unflat(x):
        return x.reshape(b, h, t, d).transpose(0, 2, 1, 3)

    if _use_flash_bwd(b * h, t):
        dq, dk, dv = _flash_bwd(flat(q), flat(k), flat(v), flat(out),
                                lse.reshape(b * h, 1, -1), flat(g), scale,
                                interpret=interpret)
    else:
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _reference_sdpa(q_, k_, v_, scale),
            flat(q), flat(k), flat(v))
        dq, dk, dv = vjp(flat(g))
    return unflat(dq), unflat(dk), unflat(dv)


flash_attention_mh.defvjp(_mh_fwd, _mh_bwd)


def _bwd_dq_kernel_mh(q_ref, k_ref, v_ref, do_ref, stats_ref, dq_ref,
                      *, scale, num_heads, block_k, kv_len):
    """dQ for one (b, q_tile) over channel-packed [B, T, H*d] inputs.

    Per head: loop k tiles, recompute P from the forward's lse, accumulate
    dQ.  stats rows: [0, H) = lse per head, [H, 2H) = delta per head.
    Zero-padded keys have zero k/v rows, so dP and dS @ k vanish there."""
    d = q_ref.shape[2] // num_heads
    num_k = kv_len // block_k

    for h in range(num_heads):
        q = q_ref[0, :, h * d:(h + 1) * d]
        do = do_ref[0, :, h * d:(h + 1) * d]
        lse = stats_ref[0, h].reshape(-1, 1)
        delta = stats_ref[0, num_heads + h].reshape(-1, 1)

        def body(i, dq_acc, q=q, do=do, lse=lse, delta=delta, h=h):
            k = k_ref[0, pl.ds(i * block_k, block_k), h * d:(h + 1) * d]
            v = v_ref[0, pl.ds(i * block_k, block_k), h * d:(h + 1) * d]
            logits = scale * jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            p = jnp.exp(logits - lse)
            dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = p * (dp - delta)
            return dq_acc + scale * jax.lax.dot_general(
                ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        dq = jax.lax.fori_loop(
            0, num_k, body, jnp.zeros((q.shape[0], d), jnp.float32))
        dq_ref[0, :, h * d:(h + 1) * d] = dq.astype(dq_ref.dtype)


def _bwd_dq_kernel_mh_packed(q_ref, k_ref, v_ref, do_ref, stats_ref, dq_ref,
                             *, scale, num_heads, block_k, kv_len, pack):
    """dQ with `pack` heads fused per matmul (see _PACK_SMALL_D): q and do
    become block-diagonal along sublanes, stats rows concatenate to
    [p*bq, 1], and the three matmuls per k-tile run once per GROUP; the
    off-diagonal lanes of ds @ k are garbage and sliced away at the end."""
    bq = q_ref.shape[1]
    d = q_ref.shape[2] // num_heads
    num_k = kv_len // block_k

    h0 = 0
    while h0 < num_heads:
        p = min(pack, num_heads - h0)
        w = p * d
        qg = q_ref[0, :, h0 * d:h0 * d + w]
        dog = do_ref[0, :, h0 * d:h0 * d + w]
        lane = jax.lax.broadcasted_iota(jnp.int32, (bq, w), 1) // d
        qbd = jnp.concatenate(
            [jnp.where(lane == j, qg, 0) for j in range(p)], axis=0)
        dobd = jnp.concatenate(
            [jnp.where(lane == j, dog, 0) for j in range(p)], axis=0)
        lse = jnp.concatenate(
            [stats_ref[0, h0 + j].reshape(-1, 1) for j in range(p)], axis=0)
        delta = jnp.concatenate(
            [stats_ref[0, num_heads + h0 + j].reshape(-1, 1)
             for j in range(p)], axis=0)

        def body(i, dq_acc, qbd=qbd, dobd=dobd, lse=lse, delta=delta,
                 h0=h0, w=w):
            kg = k_ref[0, pl.ds(i * block_k, block_k), h0 * d:h0 * d + w]
            vg = v_ref[0, pl.ds(i * block_k, block_k), h0 * d:h0 * d + w]
            logits = scale * jax.lax.dot_general(
                qbd, kg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [p*bq, bk]
            pm = jnp.exp(logits - lse)
            dp = jax.lax.dot_general(dobd, vg, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = pm * (dp - delta)
            return dq_acc + scale * jax.lax.dot_general(
                ds.astype(kg.dtype), kg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [p*bq, w]

        dq = jax.lax.fori_loop(
            0, num_k, body, jnp.zeros((p * bq, w), jnp.float32))
        for j in range(p):
            dq_ref[0, :, (h0 + j) * d:(h0 + j + 1) * d] = dq[
                j * bq:(j + 1) * bq, j * d:(j + 1) * d].astype(dq_ref.dtype)
        h0 += p


def _bwd_dkv_kernel_mh_packed(q_ref, k_ref, v_ref, do_ref, stats_ref,
                              dk_ref, dv_ref, *, scale, num_heads, block_q,
                              q_len, pack):
    """dK/dV (k-major) with `pack` heads fused per matmul: k and v become
    block-diagonal along sublanes (amortized once per k-tile), the per-head
    lse/delta row vectors broadcast-concatenate to [p*bk, bq] per q-tile,
    and the diagonal blocks of the [p*bk, w] accumulators are extracted at
    the end."""
    bk = k_ref.shape[1]
    d = q_ref.shape[2] // num_heads
    num_q = q_len // block_q

    h0 = 0
    while h0 < num_heads:
        p = min(pack, num_heads - h0)
        w = p * d
        kg = k_ref[0, :, h0 * d:h0 * d + w]
        vg = v_ref[0, :, h0 * d:h0 * d + w]
        lane = jax.lax.broadcasted_iota(jnp.int32, (bk, w), 1) // d
        kbd = jnp.concatenate(
            [jnp.where(lane == j, kg, 0) for j in range(p)], axis=0)
        vbd = jnp.concatenate(
            [jnp.where(lane == j, vg, 0) for j in range(p)], axis=0)

        def body(i, carry, kbd=kbd, vbd=vbd, h0=h0, w=w, p=p):
            dk_acc, dv_acc = carry
            qg = q_ref[0, pl.ds(i * block_q, block_q), h0 * d:h0 * d + w]
            dog = do_ref[0, pl.ds(i * block_q, block_q), h0 * d:h0 * d + w]
            lse = jnp.concatenate(
                [jnp.broadcast_to(
                    stats_ref[0, h0 + j,
                              pl.ds(i * block_q, block_q)].reshape(1, -1),
                    (bk, block_q)) for j in range(p)], axis=0)
            delta = jnp.concatenate(
                [jnp.broadcast_to(
                    stats_ref[0, num_heads + h0 + j,
                              pl.ds(i * block_q, block_q)].reshape(1, -1),
                    (bk, block_q)) for j in range(p)], axis=0)
            logits_t = scale * jax.lax.dot_general(
                kbd, qg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [p*bk, bq]
            p_t = jnp.exp(logits_t - lse)
            dv_acc = dv_acc + jax.lax.dot_general(
                p_t.astype(dog.dtype), dog, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp_t = jax.lax.dot_general(vbd, dog, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            ds_t = p_t * (dp_t - delta)
            dk_acc = dk_acc + scale * jax.lax.dot_general(
                ds_t.astype(qg.dtype), qg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return dk_acc, dv_acc

        zero = jnp.zeros((p * bk, w), jnp.float32)
        dk, dv = jax.lax.fori_loop(0, num_q, body, (zero, zero))
        for j in range(p):
            dk_ref[0, :, (h0 + j) * d:(h0 + j + 1) * d] = dk[
                j * bk:(j + 1) * bk, j * d:(j + 1) * d].astype(dk_ref.dtype)
            dv_ref[0, :, (h0 + j) * d:(h0 + j + 1) * d] = dv[
                j * bk:(j + 1) * bk, j * d:(j + 1) * d].astype(dv_ref.dtype)
        h0 += p


def _bwd_dkv_kernel_mh(q_ref, k_ref, v_ref, do_ref, stats_ref,
                       dk_ref, dv_ref, *, scale, num_heads, block_q, q_len):
    """dK/dV for one (b, k_tile), k-major per head (the transposed
    formulation that keeps every matmul a lane-dim contraction or a
    row-major product -- the same trick as the flat _bwd_dkv_kernel).
    Zero-padded q rows have do == 0 and delta == 0, so they contribute
    nothing; padded key rows are sliced off outside."""
    d = q_ref.shape[2] // num_heads
    num_q = q_len // block_q

    for h in range(num_heads):
        k = k_ref[0, :, h * d:(h + 1) * d]
        v = v_ref[0, :, h * d:(h + 1) * d]

        def body(i, carry, k=k, v=v, h=h):
            dk_acc, dv_acc = carry
            q = q_ref[0, pl.ds(i * block_q, block_q), h * d:(h + 1) * d]
            do = do_ref[0, pl.ds(i * block_q, block_q), h * d:(h + 1) * d]
            lse = stats_ref[0, h, pl.ds(i * block_q, block_q)].reshape(1, -1)
            delta = stats_ref[0, num_heads + h,
                              pl.ds(i * block_q, block_q)].reshape(1, -1)
            logits_t = scale * jax.lax.dot_general(
                k, q, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [bk, bq]
            p_t = jnp.exp(logits_t - lse)
            dv_acc = dv_acc + jax.lax.dot_general(
                p_t.astype(do.dtype), do, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp_t = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            ds_t = p_t * (dp_t - delta)
            dk_acc = dk_acc + scale * jax.lax.dot_general(
                ds_t.astype(q.dtype), q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return dk_acc, dv_acc

        zero = jnp.zeros((k.shape[0], d), jnp.float32)
        dk, dv = jax.lax.fori_loop(0, num_q, body, (zero, zero))
        dk_ref[0, :, h * d:(h + 1) * d] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, h * d:(h + 1) * d] = dv.astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "block_q",
                                             "block_k", "interpret",
                                             "out_shape"))
def _flash_bwd_mh(q, k, v, out, lse, g, num_heads, scale, block_q=256,
                  block_k=256, interpret=False, out_shape=None):
    """Native mh flash backward over [B, T, H*d]: (dq, dk, dv) as
    [B, T, H, d] without any HBM transpose pass.

    lse: [B, H, Tq] from the mh forward; delta is computed per head with a
    segment-reshape einsum (one fused pass over g*out)."""
    b, t, c = q.shape
    d = c // num_heads
    delta = jnp.einsum(
        "bthd,bthd->bht",
        g.reshape(b, t, num_heads, d).astype(jnp.float32),
        out.reshape(b, t, num_heads, d).astype(jnp.float32))  # [B, H, T]
    g = g.astype(q.dtype)
    block_q = min(block_q, ((t + 127) // 128) * 128)
    block_k = min(block_k, ((t + 127) // 128) * 128)
    q, _ = _pad_to(q, 1, block_q)
    g, _ = _pad_to(g, 1, block_q)
    delta, _ = _pad_to(delta, 2, block_q)
    k, _ = _pad_to(k, 1, block_k)
    v, _ = _pad_to(v, 1, block_k)
    tq, tk = q.shape[1], k.shape[1]
    if lse.shape[2] != tq:  # fwd block_q may differ from bwd block_q
        lse = _pad_to(lse, 2, block_q)[0][:, :, :tq]
    # stats: [B, 2H, TQ] -- lse rows then delta rows (the middle dim is FULL
    # in every BlockSpec, satisfying the TPU block rule)
    stats = jnp.concatenate([lse, delta], axis=1)

    pack = _pack_factor(d)
    if pack > 1:
        dq_kernel = functools.partial(
            _bwd_dq_kernel_mh_packed, scale=scale, num_heads=num_heads,
            block_k=block_k, kv_len=tk, pack=pack)
        dkv_kernel = functools.partial(
            _bwd_dkv_kernel_mh_packed, scale=scale, num_heads=num_heads,
            block_q=block_q, q_len=tq, pack=pack)
    else:
        dq_kernel = functools.partial(
            _bwd_dq_kernel_mh, scale=scale, num_heads=num_heads,
            block_k=block_k, kv_len=tk)
        dkv_kernel = functools.partial(
            _bwd_dkv_kernel_mh, scale=scale, num_heads=num_heads,
            block_q=block_q, q_len=tq)
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b, tq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda bi, qi: (bi, qi, 0)),
            pl.BlockSpec((1, tk, c), lambda bi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, tk, c), lambda bi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, block_q, c), lambda bi, qi: (bi, qi, 0)),
            pl.BlockSpec((1, 2 * num_heads, block_q),
                         lambda bi, qi: (bi, 0, qi)),
        ],
        out_specs=pl.BlockSpec((1, block_q, c), lambda bi, qi: (bi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, tq, c), q.dtype),
        interpret=interpret,
    )(q, k, v, g, stats)

    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b, tk // block_k),
        in_specs=[
            pl.BlockSpec((1, tq, c), lambda bi, ki: (bi, 0, 0)),
            pl.BlockSpec((1, block_k, c), lambda bi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, block_k, c), lambda bi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, tq, c), lambda bi, ki: (bi, 0, 0)),
            pl.BlockSpec((1, 2 * num_heads, tq), lambda bi, ki: (bi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, c), lambda bi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, block_k, c), lambda bi, ki: (bi, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, tk, c), q.dtype),
            jax.ShapeDtypeStruct((b, tk, c), q.dtype),
        ],
        interpret=interpret,
    )(q, k, v, g, stats)
    bs, ts, hs, ds = out_shape
    return (dq[:, :t].reshape(bs, ts, hs, ds),
            dk[:, :t].reshape(bs, ts, hs, ds),
            dv[:, :t].reshape(bs, ts, hs, ds))


# ---------------------------------------------------------------------------
# Grid-STREAMED mh backward (VERDICT r4 item 7): the resident kernels above
# hold the full-length opposite operand in VMEM ([tk, H*d] k/v for dq,
# [tq, H*d] q/do for dkv), which exceeds the budget at SD's T=4096 level
# (w=320 H=8: ~21 MB demanded vs 15 MB) and forced the flat fallback with
# its 4 HBM transpose passes.  Here the streamed operand walks a THIRD grid
# dimension in chunks; f32 accumulators live in VMEM scratch across the
# sweep (TPU grids run sequentially on one core, so scratch persists), and
# the output block -- whose index map ignores the stream dim -- is written
# once at the final step.  Trade-off vs resident: k/v are re-fetched from
# HBM once per q-tile (and vice versa), the classic flash-backward traffic
# shape; at T=4096 that extra traffic is far cheaper than 4 full transpose
# passes of [B,T,H,d].


def _bwd_dq_kernel_mh_stream(q_ref, k_ref, v_ref, do_ref, stats_ref, dq_ref,
                             acc_ref, *, scale, num_heads, pack):
    """dQ for one (b, q_tile, k_chunk) grid step; packing as in the
    resident packed kernel (block-diagonal q/do along sublanes, `pack`
    heads per matmul).  Zero-padded key rows have zero k/v, so dp and
    ds @ k vanish there (same argument as _bwd_dq_kernel_mh)."""
    ki = pl.program_id(2)
    bq = q_ref.shape[1]
    d = q_ref.shape[2] // num_heads

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    h0 = 0
    while h0 < num_heads:
        p = min(pack, num_heads - h0)
        w = p * d
        qg = q_ref[0, :, h0 * d:h0 * d + w]
        dog = do_ref[0, :, h0 * d:h0 * d + w]
        if p > 1:
            lane = jax.lax.broadcasted_iota(jnp.int32, (bq, w), 1) // d
            qbd = jnp.concatenate(
                [jnp.where(lane == j, qg, 0) for j in range(p)], axis=0)
            dobd = jnp.concatenate(
                [jnp.where(lane == j, dog, 0) for j in range(p)], axis=0)
            lse = jnp.concatenate(
                [stats_ref[0, h0 + j].reshape(-1, 1) for j in range(p)],
                axis=0)
            delta = jnp.concatenate(
                [stats_ref[0, num_heads + h0 + j].reshape(-1, 1)
                 for j in range(p)], axis=0)
        else:
            qbd, dobd = qg, dog
            lse = stats_ref[0, h0].reshape(-1, 1)
            delta = stats_ref[0, num_heads + h0].reshape(-1, 1)
        kg = k_ref[0, :, h0 * d:h0 * d + w]
        vg = v_ref[0, :, h0 * d:h0 * d + w]
        logits = scale * jax.lax.dot_general(
            qbd, kg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [p*bq, bk]
        pm = jnp.exp(logits - lse)
        dp = jax.lax.dot_general(dobd, vg, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = pm * (dp - delta)
        contrib = scale * jax.lax.dot_general(
            ds.astype(kg.dtype), kg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [p*bq, w]
        for j in range(p):
            sl = slice((h0 + j) * d, (h0 + j + 1) * d)
            acc_ref[:, sl] += contrib[j * bq:(j + 1) * bq, j * d:(j + 1) * d]
        h0 += p

    @pl.when(ki == pl.num_programs(2) - 1)
    def _fin():
        dq_ref[0] = acc_ref[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel_mh_stream(q_ref, k_ref, v_ref, do_ref, stats_ref,
                              dk_ref, dv_ref, acc_dk, acc_dv, *, scale,
                              num_heads, pack):
    """dK/dV for one (b, k_tile, q_chunk) grid step, k-major transposed
    formulation with packing; zero-padded q rows have do == 0 and
    delta == 0 so they contribute nothing."""
    qi = pl.program_id(2)
    bk = k_ref.shape[1]
    bq = q_ref.shape[1]
    d = q_ref.shape[2] // num_heads

    @pl.when(qi == 0)
    def _init():
        acc_dk[...] = jnp.zeros_like(acc_dk)
        acc_dv[...] = jnp.zeros_like(acc_dv)

    h0 = 0
    while h0 < num_heads:
        p = min(pack, num_heads - h0)
        w = p * d
        kg = k_ref[0, :, h0 * d:h0 * d + w]
        vg = v_ref[0, :, h0 * d:h0 * d + w]
        qg = q_ref[0, :, h0 * d:h0 * d + w]
        dog = do_ref[0, :, h0 * d:h0 * d + w]
        if p > 1:
            lane = jax.lax.broadcasted_iota(jnp.int32, (bk, w), 1) // d
            kbd = jnp.concatenate(
                [jnp.where(lane == j, kg, 0) for j in range(p)], axis=0)
            vbd = jnp.concatenate(
                [jnp.where(lane == j, vg, 0) for j in range(p)], axis=0)
            lse = jnp.concatenate(
                [jnp.broadcast_to(stats_ref[0, h0 + j].reshape(1, -1),
                                  (bk, bq)) for j in range(p)], axis=0)
            delta = jnp.concatenate(
                [jnp.broadcast_to(
                    stats_ref[0, num_heads + h0 + j].reshape(1, -1),
                    (bk, bq)) for j in range(p)], axis=0)
        else:
            kbd, vbd = kg, vg
            lse = stats_ref[0, h0].reshape(1, -1)
            delta = stats_ref[0, num_heads + h0].reshape(1, -1)
        logits_t = scale * jax.lax.dot_general(
            kbd, qg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [p*bk, bq]
        p_t = jnp.exp(logits_t - lse)
        dv_c = jax.lax.dot_general(p_t.astype(dog.dtype), dog,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        dp_t = jax.lax.dot_general(vbd, dog, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        ds_t = p_t * (dp_t - delta)
        dk_c = scale * jax.lax.dot_general(
            ds_t.astype(qg.dtype), qg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [p*bk, w]
        for j in range(p):
            sl = slice((h0 + j) * d, (h0 + j + 1) * d)
            acc_dk[:, sl] += dk_c[j * bk:(j + 1) * bk, j * d:(j + 1) * d]
            acc_dv[:, sl] += dv_c[j * bk:(j + 1) * bk, j * d:(j + 1) * d]
        h0 += p

    @pl.when(qi == pl.num_programs(2) - 1)
    def _fin():
        dk_ref[0] = acc_dk[...].astype(dk_ref.dtype)
        dv_ref[0] = acc_dv[...].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "block_q",
                                             "block_k", "interpret",
                                             "out_shape"))
def _flash_bwd_mh_stream(q, k, v, out, lse, g, num_heads, scale,
                         block_q=256, block_k=256, interpret=False,
                         out_shape=None):
    """Grid-streamed mh flash backward over [B, T, H*d]: (dq, dk, dv) as
    [B, T, H, d] with NO full-length VMEM residency and no HBM transposes."""
    b, t, c = q.shape
    d = c // num_heads
    delta = jnp.einsum(
        "bthd,bthd->bht",
        g.reshape(b, t, num_heads, d).astype(jnp.float32),
        out.reshape(b, t, num_heads, d).astype(jnp.float32))
    g = g.astype(q.dtype)
    block_q = min(block_q, ((t + 127) // 128) * 128)
    block_k = min(block_k, ((t + 127) // 128) * 128)
    q, _ = _pad_to(q, 1, block_q)
    g, _ = _pad_to(g, 1, block_q)
    delta, _ = _pad_to(delta, 2, block_q)
    k, _ = _pad_to(k, 1, block_k)
    v, _ = _pad_to(v, 1, block_k)
    tq, tk = q.shape[1], k.shape[1]
    if lse.shape[2] != tq:
        lse = _pad_to(lse, 2, block_q)[0][:, :, :tq]
    stats = jnp.concatenate([lse, delta], axis=1)
    pack = _pack_factor(d)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel_mh_stream, scale=scale,
                          num_heads=num_heads, pack=pack),
        grid=(b, tq // block_q, tk // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, block_k, c), lambda bi, qi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, block_k, c), lambda bi, qi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, block_q, c), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, 2 * num_heads, block_q),
                         lambda bi, qi, ki: (bi, 0, qi)),
        ],
        out_specs=pl.BlockSpec((1, block_q, c),
                               lambda bi, qi, ki: (bi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, tq, c), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, c), jnp.float32)],
        interpret=interpret,
    )(q, k, v, g, stats)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel_mh_stream, scale=scale,
                          num_heads=num_heads, pack=pack),
        grid=(b, tk // block_k, tq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda bi, ki, qi: (bi, qi, 0)),
            pl.BlockSpec((1, block_k, c), lambda bi, ki, qi: (bi, ki, 0)),
            pl.BlockSpec((1, block_k, c), lambda bi, ki, qi: (bi, ki, 0)),
            pl.BlockSpec((1, block_q, c), lambda bi, ki, qi: (bi, qi, 0)),
            pl.BlockSpec((1, 2 * num_heads, block_q),
                         lambda bi, ki, qi: (bi, 0, qi)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, c), lambda bi, ki, qi: (bi, ki, 0)),
            pl.BlockSpec((1, block_k, c), lambda bi, ki, qi: (bi, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, tk, c), q.dtype),
            jax.ShapeDtypeStruct((b, tk, c), q.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((block_k, c), jnp.float32),
                        pltpu.VMEM((block_k, c), jnp.float32)],
        interpret=interpret,
    )(q, k, v, g, stats)
    bs, ts, hs, ds = out_shape
    return (dq[:, :t].reshape(bs, ts, hs, ds),
            dk[:, :t].reshape(bs, ts, hs, ds),
            dv[:, :t].reshape(bs, ts, hs, ds))


def _mh_bwd_stream_plan(t, width, num_heads, itemsize, block_q=256,
                        block_k=1024):
    """(block_q, block_k) for the STREAMED mh backward, or None.

    Only block-sized operands are resident (q/do/k/v/out blocks + two f32
    accumulators at [block, width]) plus the same ~0.75 f32 [bq, bk] stack
    temporaries per head as every mh kernel.

    The default is ASYMMETRIC (bq=256, bk=1024): big streamed blocks cut
    the per-step block-diagonal rebuild + re-fetch count.  Swept on chip
    at the SD shape (B=2, T=4096, H=8, d=40, bf16; scripts/
    stream_bwd_probe.py): flat 4.50 ms, stream (256,256) 4.57, (512,512)
    4.51, (128,2048) 4.35, **(256,1024) 4.27 ms** -- the symmetric plan
    LOSES to the flat fallback, the asymmetric one beats it by 5%."""
    tpad = ((t + 127) // 128) * 128
    bq, bk = _snap128(min(block_q, tpad)), _snap128(min(block_k, tpad))
    while True:
        io = 2 * itemsize * (2 * bq + 2 * bk + 2 * bk) * width \
            + 2 * max(bq, bk) * width * 4 \
            + 2 * itemsize * 2 * num_heads * max(bq, bk)
        stack = int(0.75 * num_heads * bq * bk * 4)
        if io + stack <= _MH_VMEM_BUDGET_BYTES:
            return bq, bk
        if bk > 128:
            bk = _snap128(bk // 2)
        elif bq > 128:
            bq = _snap128(bq // 2)
        else:
            return None


def _mh_bwd_plan(t, width, num_heads, itemsize, block_q=256, block_k=256):
    """(block_q, block_k) for the native mh backward, or None -> flat path.

    The dkv program holds full-length q AND do ([tq, width] each) plus the
    k/v/dk/dv blocks and the 2H stats rows; the unrolled head loop adds the
    same ~0.75 f32 [bq, bk] stack temporaries per head as the forward
    (shared model until separate anchors exist).  Default blocks start at
    (256, 256): the backward keeps ~2x the forward's IO resident, so the
    forward's (512, 1024) start would rarely fit anyway."""
    tpad = ((t + 127) // 128) * 128
    bq, bk = _snap128(min(block_q, tpad)), _snap128(min(block_k, tpad))
    while True:
        tq = ((t + bq - 1) // bq) * bq
        tk = ((t + bk - 1) // bk) * bk
        io = 2 * itemsize * (
            (2 * tq + 2 * tk) * width        # dkv: full q, do + k, v blocks
            + (2 * bk) * width               # dkv: dk, dv out blocks
            + 2 * num_heads * max(tq, bk))   # stats
        stack = int(0.75 * num_heads * bq * bk * 4)
        if io + stack <= _MH_VMEM_BUDGET_BYTES:
            return bq, bk
        if bk > 128:
            bk = _snap128(bk // 2)
        elif bq > 128:
            bq = _snap128(bq // 2)
        else:
            return None


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, stats_ref, dq_ref,
                   *, scale, block_k, kv_len):
    """dQ for one (bh, q_tile): loop over k tiles, recompute P from lse.

    stats: [1, 2, bq] -- row 0 = lse, row 1 = delta (packed to satisfy the
    TPU block-shape rule with one array).
    Zero-padded keys contribute nothing: their k/v rows are zero, so both
    dP (do @ v^T) and the dS @ k product vanish for those columns."""
    q = q_ref[0]
    do = do_ref[0]
    lse = stats_ref[0, 0].reshape(-1, 1)
    delta = stats_ref[0, 1].reshape(-1, 1)
    num_k = kv_len // block_k

    def body(i, dq_acc):
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        logits = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        p = jnp.exp(logits - lse)  # [bq, bk] f32
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dq_acc = dq_acc + scale * jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dq_acc

    dq = jax.lax.fori_loop(
        0, num_k, body, jnp.zeros(q.shape[:1] + (q.shape[1],), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, stats_ref,
                    dk_ref, dv_ref, *, scale, block_q, q_len):
    """dK/dV for one (bh, k_tile): loop over q tiles, TRANSPOSED layout.

    All quantities are computed k-major ([bk, bq] logits via k @ q^T) so
    every matmul is either a lane-dim contraction or a standard row-major
    product -- the original q-major formulation needed dim-0 x dim-0
    contractions (P^T @ dO, dS^T @ q) that cost Mosaic an in-kernel
    transpose each (see BENCH_NOTES for the measured delta).

    Zero-padded q rows have do == 0 and delta == 0, so their P_T @ do and
    dS_T @ q contributions vanish; padded key rows are sliced off outside."""
    k = k_ref[0]
    v = v_ref[0]
    num_q = q_len // block_q

    def body(i, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :]
        do = do_ref[0, pl.ds(i * block_q, block_q), :]
        lse = stats_ref[0, 0, pl.ds(i * block_q, block_q)].reshape(1, -1)
        delta = stats_ref[0, 1, pl.ds(i * block_q, block_q)].reshape(1, -1)
        logits_t = scale * jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bk, bq]
        p_t = jnp.exp(logits_t - lse)
        dv_acc = dv_acc + jax.lax.dot_general(
            p_t.astype(do.dtype), do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bk, d]
        dp_t = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        ds_t = p_t * (dp_t - delta)
        dk_acc = dk_acc + scale * jax.lax.dot_general(
            ds_t.astype(q.dtype), q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bk, d]
        return dk_acc, dv_acc

    zero = jnp.zeros(k.shape, jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_q, body, (zero, zero))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "interpret"))
def _flash_bwd(q, k, v, out, lse, g, scale, block_q=512, block_k=512,
               interpret=False):
    """Flash backward: (dq, dk, dv) without materializing [T, T] in HBM."""
    b, t, d = q.shape
    delta = jnp.einsum("btd,btd->bt", g.astype(jnp.float32),
                       out.astype(jnp.float32))  # rowsum(dO * O)
    g = g.astype(q.dtype)
    q, _ = _pad_to(q, 2, 128)
    k, _ = _pad_to(k, 2, 128)
    v, _ = _pad_to(v, 2, 128)
    g, _ = _pad_to(g, 2, 128)
    dp = q.shape[2]
    block_q = min(block_q, ((t + 127) // 128) * 128)
    block_k = min(block_k, ((t + 127) // 128) * 128)
    q, _ = _pad_to(q, 1, block_q)
    g, _ = _pad_to(g, 1, block_q)
    delta, _ = _pad_to(delta, 1, block_q)
    k, _ = _pad_to(k, 1, block_k)
    v, _ = _pad_to(v, 1, block_k)
    tq, tk = q.shape[1], k.shape[1]
    if lse.shape[2] != tq:  # fwd/bwd block_q may differ
        lse = _pad_to(lse, 2, block_q)[0][:, :, :tq]
    # stats rows: 0 = lse, 1 = delta ([B, 2, TQ] satisfies the TPU block
    # rule via the middle dim being FULL in every BlockSpec)
    stats = jnp.concatenate([lse, delta[:, None, :]], axis=1)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, block_k=block_k,
                          kv_len=tk),
        grid=(b, tq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda bi, qi: (bi, qi, 0)),
            pl.BlockSpec((1, tk, dp), lambda bi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, tk, dp), lambda bi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, block_q, dp), lambda bi, qi: (bi, qi, 0)),
            pl.BlockSpec((1, 2, block_q), lambda bi, qi: (bi, 0, qi)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda bi, qi: (bi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, tq, dp), q.dtype),
        interpret=interpret,
    )(q, k, v, g, stats)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, block_q=block_q,
                          q_len=tq),
        grid=(b, tk // block_k),
        in_specs=[
            pl.BlockSpec((1, tq, dp), lambda bi, ki: (bi, 0, 0)),
            pl.BlockSpec((1, block_k, dp), lambda bi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, block_k, dp), lambda bi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, tq, dp), lambda bi, ki: (bi, 0, 0)),
            pl.BlockSpec((1, 2, tq), lambda bi, ki: (bi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, dp), lambda bi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, block_k, dp), lambda bi, ki: (bi, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, tk, dp), q.dtype),
            jax.ShapeDtypeStruct((b, tk, dp), q.dtype),
        ],
        interpret=interpret,
    )(q, k, v, g, stats)
    return dq[:, :t, :d], dk[:, :t, :d], dv[:, :t, :d]


def _reference_sdpa(q, k, v, scale):
    # bf16 inputs hit the MXU at full rate with exact f32 accumulation
    # (identical products to upcasting first); softmax stays f32 and the
    # weights are cast to the storage dtype as in the reference AttentionOp
    logits = scale * jnp.einsum("btd,bsd->bts", q, k,
                                preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bts,bsd->btd", w, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, scale, interpret=False):
    """Fused attention: softmax(q k^T * scale) v, fp32 softmax.

    q, k, v: [B, T, d] (B folds batch*heads).  Any T: ragged lengths are
    zero-padded and masked in-kernel (use sdpa() for automatic dispatch)."""
    return _flash_fwd(q, k, v, scale, interpret=interpret)


# Backward dispatch by [B, T, T] f32 logits size.  With the transposed
# (k-major) dK/dV kernel the Pallas backward is both faster AND O(T d)
# memory once the logits are large (v5e, d=64 bf16, chained fori_loop,
# compile-excluded median delta timing, fwd+bwd per call):
#   B=8  T=4096 (512 MB): flash 2.15 ms vs einsum 5.01 ms (2.3x)
#   B=8  T=2048 (128 MB): flash 0.59 ms vs einsum 1.50 ms (2.5x)
#   B=16 T=1024 ( 64 MB): flash 0.25 ms vs einsum 0.30 ms (1.2x)
#   B=8  T=1024 ( 32 MB): flash 0.17 ms vs einsum 0.12 ms (einsum wins)
# The crossover tracks the logits BYTES, not T alone (B=2 T=4096 and
# B=32 T=1024, both 128 MB, both ~2.7x) -- the einsum VJP is HBM-bound on
# the materialized logits.  64 MB is the measured crossover; below it the
# fused XLA recompute wins, above it the flash backward wins outright and
# at SD-tier shapes (T=4096, microbatch x heads >= 32) it also avoids the
# 4+ GB logits that would OOM a 16 GB chip.  Tests monkeypatch this to 0.
_FLASH_BWD_MIN_LOGITS_BYTES = 64 * 1024**2


def _use_flash_bwd(b, t):
    return b * t * t * 4 >= _FLASH_BWD_MIN_LOGITS_BYTES


def _fwd(q, k, v, scale, interpret):
    if _use_flash_bwd(q.shape[0], q.shape[1]):
        out, lse = _flash_fwd_res(q, k, v, scale, interpret=interpret)
        return out, (q, k, v, out, lse)
    return _flash_fwd(q, k, v, scale, interpret=interpret), (q, k, v, None, None)


def _bwd(scale, interpret, res, g):
    q, k, v, out, lse = res
    if lse is not None:
        return _flash_bwd(q, k, v, out, lse, g, scale, interpret=interpret)
    _, vjp = jax.vjp(lambda q_, k_, v_: _reference_sdpa(q_, k_, v_, scale),
                     q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)


# Both forward kernels keep the FULL (padded) K and V for one batch row in
# VMEM and stream only the q tiles; with Pallas double-buffering the scoped
# VMEM cost is ~2x the block bytes.  The v5e scoped-vmem limit is 16 MB
# (measured: [B,T,H*d]=[2,4096,512] bf16 fails at 18.04M), so estimate the
# footprint and fall back (mh -> flat -> einsum) instead of ever OOMing.
_VMEM_BUDGET_BYTES = 12 * 1024**2


def _fwd_vmem_bytes(block_q, tk, width, itemsize):
    # double-buffered {k, v} at [1, tk, width] + {q, o} at [1, block_q, width]
    return 2 * (2 * tk * width + 2 * block_q * width) * itemsize


def _fits_vmem(t, width, itemsize, block_q=512, block_k=1024):
    tpad = ((t + 127) // 128) * 128
    bq = min(block_q, tpad)
    tk = ((t + min(block_k, tpad) - 1) // min(block_k, tpad)) * min(block_k, tpad)
    return _fwd_vmem_bytes(bq, tk, width, itemsize) <= _VMEM_BUDGET_BYTES


# The mh kernel's Python head loop unrolls, and Mosaic's kernel STACK keeps
# ~0.7 live f32 [block_q, block_k] logit-sized temporaries per unrolled
# head on top of the double-buffered IO blocks.  Calibrated on chip
# (2026-08-18): width=448 H=14 bq=512 bk=1024 demanded 24.25 MB (= 5.5 IO
# + 18.75 stack = 0.67*H*bq*bk*4) against the 16 MB scoped limit and OOMed
# at compile; width=384 H=6 (est 13.1 MB) compiled and ran.  The guard
# that only counted IO dispatched the OOM case (found by ldm_probe).
_MH_VMEM_BUDGET_BYTES = 15 * 1024**2


def _mh_vmem_bytes(block_q, block_k, tk, width, num_heads, itemsize):
    io = 2 * (2 * tk * width + 2 * block_q * width) * itemsize
    # stack coefficient rounded UP from the single measured anchor (0.67)
    # to 0.75 until more anchors exist; on TPU the estimate is only a
    # prefilter -- _mh_plan_verified compile-probes the plan before use
    stack = int(0.75 * num_heads * block_q * block_k * 4)
    return io + stack


def _snap128(v):
    """Round down to a multiple of 128, floored at 128 (the TPU lane/block
    granularity both kernels assume)."""
    return max(128, v // 128 * 128)


def _mh_plan(t, width, num_heads, itemsize, block_q=512, block_k=1024):
    """Largest (block_q, block_k) whose estimated mh-kernel VMEM fits, or
    None (-> flat kernel) if even 128x128 blocks do not.

    Blocks stay multiples of 128: halving snaps down via _snap128 (a
    non-power-of-two padded T like 384 would otherwise halve to 192/96,
    shapes never calibrated against the stack model)."""
    tpad = ((t + 127) // 128) * 128
    bq, bk = _snap128(min(block_q, tpad)), _snap128(min(block_k, tpad))
    while True:
        tk = ((t + bk - 1) // bk) * bk
        if _mh_vmem_bytes(bq, bk, tk, width, num_heads, itemsize) \
                <= _MH_VMEM_BUDGET_BYTES:
            return bq, bk
        if bq > 128:
            bq = _snap128(bq // 2)
        elif bk > 128:
            bk = _snap128(bk // 2)
        else:
            return None


# The stack-size estimate behind _mh_plan is a 2-anchor heuristic (one OOM,
# one pass -- see above); a Mosaic/libtpu update could shift the constant
# and turn an estimate-approved plan into a compile-time OOM in production.
# On TPU the plan is therefore VERIFIED by AOT-compiling the kernel
# standalone at B=1 (scoped-VMEM demand is per-program, so B=1 probes the
# real footprint) and shrunk until a plan actually compiles; results are
# cached per (t, width, heads, itemsize, backend).  Off-TPU (interpret
# mode) nothing can OOM, so the estimate alone is used.
_MH_PLAN_CACHE: dict = {}


def _probe_enabled():
    # interpret mode can't OOM; tests monkeypatch this to exercise the
    # shrink-on-compile-failure path off-TPU
    return jax.default_backend() == "tpu"


def _mh_probe_compiles(t, width, num_heads, itemsize, bq, bk) -> bool:
    dtype = jnp.bfloat16 if itemsize == 2 else jnp.float32
    arg = jax.ShapeDtypeStruct((1, t, width), dtype)
    try:
        jax.jit(functools.partial(
            _flash_fwd_mh_res, num_heads=num_heads, scale=1.0,
            block_q=bq, block_k=bk,
            pack=_pack_factor(width // num_heads))).lower(
                arg, arg, arg).compile()
        return True
    except Exception:
        return False


def _mh_plan_verified(t, width, num_heads, itemsize):
    """_mh_plan + compile-probe fallback (TPU only).  Returns a plan whose
    kernel is KNOWN to compile, or None for the flat/einsum path."""
    key = (t, width, num_heads, itemsize, jax.default_backend(),
           _pack_factor(width // num_heads))
    if key in _MH_PLAN_CACHE:
        return _MH_PLAN_CACHE[key]
    plan = _mh_plan(t, width, num_heads, itemsize)
    if _probe_enabled():
        while plan is not None and not _mh_probe_compiles(
                t, width, num_heads, itemsize, *plan):
            bq, bk = plan
            if bq > 128:
                bq = _snap128(bq // 2)
            elif bk > 128:
                bk = _snap128(bk // 2)
            else:
                plan = None
                break
            plan = (bq, bk)
    _MH_PLAN_CACHE[key] = plan
    return plan


# Tensor-parallel context: set by the CLIs/tests when a (data, model) mesh
# is active.  A Pallas call is an opaque custom call to GSPMD -- without
# this, TP attention either replicates (gathers the head-sharded q/k/v) or
# falls back to einsum with materialized [T,T] logits.  With it, sdpa wraps
# the kernel in shard_map over the mesh: attention is embarrassingly
# parallel over heads, so the body runs the SAME kernels on the local
# [B/dp, T, H/tp, d] block with zero collectives.
_TP_CTX = None


def set_tp_context(mesh, data_axis: str = "data", model_axis: str = "model"):
    """Install (or clear, mesh=None) the tensor-parallel mesh used by sdpa
    to shard_map the flash kernels over the model axis."""
    global _TP_CTX
    _TP_CTX = None if mesh is None else (mesh, data_axis, model_axis)


def _sdpa_tp_shard_map(q, k, v, scale, min_flash_tokens):
    """shard_map(sdpa) over the TP mesh, or None if shapes don't divide."""
    from jax.sharding import PartitionSpec as P
    shard_map = jax.shard_map

    mesh, da, ma = _TP_CTX
    b, t, h, d = q.shape
    tp = mesh.shape[ma]
    dp = mesh.shape[da]
    if tp <= 1 or h % tp or b % dp:
        return None
    spec = P(da, None, ma, None)

    def body(ql, kl, vl):
        return sdpa(ql, kl, vl, scale, min_flash_tokens=min_flash_tokens,
                    force_flash=True, _local=True)

    # check_vma off: the body is a pallas_call whose ShapeDtypeStructs carry
    # no varying-mesh-axes annotation (and the body needs none -- attention
    # is head-parallel, zero collectives)
    fn = shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                   out_specs=spec, check_vma=False)
    return fn(q, k, v)


def sdpa(q, k, v, scale=None, *, min_flash_tokens: int = 256,
         force_flash: bool = False, _local: bool = False):
    """Scaled-dot-product attention dispatcher.

    q, k, v: [B, T, H, d] (multi-head, NHWC-style token layout).
    Uses the Pallas flash kernel on TPU for T >= min_flash_tokens and the
    einsum path otherwise.  Threshold note (v5e, d=64 bf16): ISOLATED, the
    einsum wins slightly at T=256 (0.115 vs 0.137 ms) and flash wins 3x+
    from T=512; IN-MODEL, flash at T=256 is the faster choice (CIFAR
    SongUNet eval 70.2 vs 71.7 ms/batch-256 with einsum) -- XLA schedules
    the materialized [T,T] logits worse inside the larger program.  The
    256 default is the model-level optimum; below it einsum wins both ways
    (T=128: 0.024 vs 0.127 ms).
    Returns [B, T, H, d].
    """
    b, t, h, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    on_tpu = jax.default_backend() == "tpu"
    use_flash = force_flash or (on_tpu and t >= min_flash_tokens)
    if not _local:
        # sequence-parallel context (ring attention over a token-sharded
        # mesh axis, ops/ring_attention.py) -- checked before TP: both are
        # installed explicitly and SP is the more specific intent
        import diff_sampler_tpu.ops.ring_attention as RA
        if RA._SP_CTX is not None:
            # min-tokens and divisibility gates live in sp_sdpa so every
            # decline lands in its dispatch ledger (sp_dispatch_counts)
            out = RA.sp_sdpa(q, k, v, float(scale))
            if out is not None:
                return out
    if use_flash and _TP_CTX is not None and not _local:
        out = _sdpa_tp_shard_map(q, k, v, float(scale), min_flash_tokens)
        if out is not None:
            return out
    itemsize = jnp.dtype(q.dtype).itemsize
    plan = _mh_plan_verified(t, h * d, h, itemsize) \
        if (use_flash and d % 8 == 0) else None
    if plan is not None:
        # multi-head kernel on the native [B, T, H, d] layout: no HBM
        # transposes, no d->128 pad.  In-model this is where the ADM
        # tier's 46%-MXU gap lived (BENCH_NOTES round-3 ADM probe).
        return flash_attention_mh(q, k, v, float(scale), not on_tpu,
                                  plan[0], plan[1])
    if use_flash and _fits_vmem(t, ((d + 127) // 128) * 128, itemsize):
        qf = q.transpose(0, 2, 1, 3).reshape(b * h, t, d)
        kf = k.transpose(0, 2, 1, 3).reshape(b * h, t, d)
        vf = v.transpose(0, 2, 1, 3).reshape(b * h, t, d)
        out = flash_attention(qf, kf, vf, float(scale),
                              not on_tpu)  # interpret off-TPU (tests)
        return out.reshape(b, h, t, d).transpose(0, 2, 1, 3)
    # Small-T einsum path on the NATIVE layout: batched dims stay batched
    # and XLA picks the layouts -- no explicit [B,T,H,d]->[B*H,T,d] HBM
    # transpose passes (ADM-64's 8x8 attention lives here).
    logits = scale * jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)
