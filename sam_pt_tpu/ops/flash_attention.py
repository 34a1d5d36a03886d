"""Fused attention Pallas kernel for the SAM ViT encoder's global blocks.

The naive global attention at 64x64 tokens materializes [B*heads, 4096, 4096]
logit/probability tensors in HBM — gigabytes of traffic per frame and the
dominant cost of SAM encoding. This kernel keeps each attention row block
resident in VMEM: K and V for the full 4096-token sequence fit on-chip
(~1 MB each at head_dim 128 bf16), each grid step computes an entire
[TQ, N] logits block on the MXU, softmaxes in f32 on the VPU, and multiplies
by V — logits never touch HBM.

Decomposed relative-position bias trick: with bias(i, j) =
Bh[i, y_j] + Bw[i, x_j] (the factored per-query projections onto the rel-pos
tables), augmenting

    q_aug = [q * scale, Bh, Bw]            # [B, N, D + Kh + Kw]
    k_aug = [k, onehot(y), onehot(x)]      # [B, N, D + Kh + Kw]

makes `q_aug @ k_aug^T` equal `scale * q k^T + bias` in ONE matmul — the
bias costs 128 extra contraction lanes instead of any gather/reshape.

Falls back to interpret mode off-TPU (tests run on CPU).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]  # [TQ, Da]  (augmented)
    k = k_ref[0]  # [N, Da]
    v = v_ref[0]  # [N, Dp]

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TQ, N]

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom

    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _grouped_attention_kernel(q_ref, k_ref, v_ref, o_ref, *, group):
    """Small-sequence variant: a group of `group` independent windows per
    grid step, each window's attention computed fully in VMEM."""

    def body(g, _):
        q = q_ref[0, g]  # [N, Da]
        k = k_ref[0, g]
        v = v_ref[0, g]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, g] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, group, body, 0)


def _pad_last(x, target):
    d = x.shape[-1]
    if d == target:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, target - d)])


def fused_relpos_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias_h: jnp.ndarray,
    bias_w: jnp.ndarray,
    *,
    scale: float,
    q_tile: int = 256,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Attention with factored rel-pos bias, logits kept in VMEM.

    q, k, v: [B, N, D] (B = batch*heads; N = Kh*Kw tokens, row-major).
    bias_h: [B, N, Kh]; bias_w: [B, N, Kw] with
        bias(i, j) = bias_h[i, y_j] + bias_w[i, x_j], j = y_j * Kw + x_j.
    Returns [B, N, D].
    """
    b, n, d = q.shape
    kh = bias_h.shape[-1]
    kw = bias_w.shape[-1]
    assert kh * kw == n, (kh, kw, n)

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    dp = ((d + 127) // 128) * 128
    dtype = q.dtype

    # one-hot row/column indicators of each key token (constants)
    ys = np.arange(n) // kw
    xs = np.arange(n) % kw
    eh = jnp.asarray(np.eye(kh, dtype=np.float32)[ys], dtype)  # [N, Kh]
    ew = jnp.asarray(np.eye(kw, dtype=np.float32)[xs], dtype)  # [N, Kw]

    q_aug = jnp.concatenate(
        [_pad_last(q * scale, dp), bias_h.astype(dtype), bias_w.astype(dtype)],
        axis=-1,
    )
    k_aug = jnp.concatenate(
        [_pad_last(k, dp),
         jnp.broadcast_to(eh[None], (b, n, kh)),
         jnp.broadcast_to(ew[None], (b, n, kw))],
        axis=-1,
    )
    v_p = _pad_last(v, dp)
    da = q_aug.shape[-1]

    if n >= 1024:
        # large sequences: tile queries, K/V resident for the whole sequence
        tq = min(q_tile, n)
        assert n % tq == 0
        out = pl.pallas_call(
            _attention_kernel,
            grid=(b, n // tq),
            in_specs=[
                pl.BlockSpec((1, tq, da), lambda bi, qi: (bi, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, da), lambda bi, qi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, dp), lambda bi, qi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tq, dp), lambda bi, qi: (bi, qi, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n, dp), dtype),
            interpret=interpret,
        )(q_aug, k_aug, v_p)
        return out[..., :d]

    # small sequences (ViT windows): group many windows per grid step so the
    # [N, N] attention tensors never exist outside VMEM
    group = 1
    for g in (16, 8, 4, 2, 1):  # 16 fits VMEM with double buffering
        if b % g == 0:
            group = g
            break
    qg = q_aug.reshape(b // group, group, n, da)
    kg = k_aug.reshape(b // group, group, n, da)
    vg = v_p.reshape(b // group, group, n, dp)
    out = pl.pallas_call(
        functools.partial(_grouped_attention_kernel, group=group),
        grid=(b // group,),
        in_specs=[
            pl.BlockSpec((1, group, n, da), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, n, da), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, n, dp), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, group, n, dp), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b // group, group, n, dp), dtype),
        interpret=interpret,
    )(qg, kg, vg)
    return out.reshape(b, n, dp)[..., :d]


def _qkv_relpos_kernel(q_ref, k_ref, v_ref, b_ref, oh_ref, o_ref, *, scale):
    """One (frame, head, q-tile) step: logits live only in VMEM.

    The decomposed rel-pos bias arrives PRECOMPUTED per query token
    (b_ref: [TQ, KH+KW(padded)] = q . Rh rows concat q . Rw rows — two tiny
    well-shaped einsums at the XLA level), and the bias ADD rides the main
    logits matmul as channel augmentation: q gains its bias columns, k gains
    a static one-hot (y, x) block, and one MXU matmul produces
    q.k*scale + bias_h[yk] + bias_w[xk]. (The previous in-kernel bias
    construction ran `rows` batched mat-vec dots per step at ~2% MXU row
    utilization — ~40% of the kernel's time at ViT-H shapes.)"""
    q = q_ref[0]  # [TQ, Dp]
    k = k_ref[0]  # [N, Dp]
    v = v_ref[0]  # [N, Dp]
    bias = b_ref[0]  # [TQ, BP]
    oh = oh_ref[...]  # [N, BP] static one-hot(y), one-hot(x), zero pad cols

    q_aug = jnp.concatenate([(q * scale).astype(q.dtype), bias], 1)
    k_aug = jnp.concatenate([k, oh], 1)  # [N, Dp+BP]
    logits = jax.lax.dot_general(
        q_aug, k_aug, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TQ, N] = q.k*scale + bias_h[yk] + bias_w[xk]

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def fused_qkv_relpos_attention(
    qkv: jnp.ndarray,
    rel_pos_h: jnp.ndarray,
    rel_pos_w: jnp.ndarray,
    *,
    scale: float,
    kh: int,
    kw: int,
    heads: int,
    q_tile: int = 256,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Global ViT rel-pos attention straight from the fused qkv projection.

    qkv: [B, N, 3*H*Dp] — the raw qkv Dense output (N = kh*kw tokens
    row-major; Dp = head dim, padded to a multiple of 128 in the converted
    weights so every per-head column slice is lane-aligned and no runtime
    pad op exists). The same array is passed three times to pallas_call with
    per-head column BlockSpecs, so q/k/v are never materialized separately
    in HBM.
    rel_pos_h: [kh, kh, Dp] table already resolved for q_size == k_size
    (rel_pos_h_table[y_q, y_k] = Rh row); rel_pos_w: [kw, kw, Dp].
    Returns [B, N, H*Dp].
    """
    b, n, chans = qkv.shape
    assert chans % (3 * heads) == 0
    dp = chans // (3 * heads)
    assert kh * kw == n

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    # q-tile: largest divisor of n within the budget (no kw-multiple
    # constraint — the bias is precomputed per token, not per grid row).
    tq = max(d for d in range(1, min(q_tile, n) + 1) if n % d == 0)
    if tq < 8:
        # Degenerate sublane tiles (prime-ish n from cropped rectangular
        # grids): the kernel would run q-rows nearly one at a time. The
        # plain XLA composition of the same math is faster there (ADVICE
        # r3); correctness is unaffected either way.
        qkv5 = qkv.reshape(b, n, 3, heads, dp)
        q = qkv5[:, :, 0].transpose(0, 2, 1, 3)  # [B, H, N, Dp]
        k = qkv5[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv5[:, :, 2].transpose(0, 2, 1, 3)
        rq = q.reshape(b, heads, kh, kw, dp)
        bias_h = jnp.einsum("bhywd,ykd->bhywk", rq, rel_pos_h.astype(q.dtype))
        bias_w = jnp.einsum("bhywd,wkd->bhywk", rq, rel_pos_w.astype(q.dtype))
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q * scale, k,
            preferred_element_type=jnp.float32,
        ).reshape(b, heads, kh, kw, kh, kw)
        logits = logits + bias_h[..., :, None] + bias_w[..., None, :]
        p = jax.nn.softmax(
            logits.reshape(b, heads, n, n), axis=-1
        ).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        return out.transpose(0, 2, 1, 3).reshape(b, n, heads * dp)

    # Per-token decomposed bias, computed at the XLA level as two batched
    # einsums (batch = grid row/col, contraction = head dim — clean MXU
    # shapes; ~34 GFLOP at ViT-H vs the kernel's old per-step mat-vecs):
    # bias[b, (y,x), h, :] = [q . Rh[y], q . Rw[x]], padded to a
    # 128-multiple so per-head HBM blocks tile.
    q4 = qkv[..., :heads * dp].reshape(b, kh, kw, heads, dp)
    bias_h = jnp.einsum(
        "byxhd,ykd->byxhk", q4, rel_pos_h.astype(q4.dtype),
        preferred_element_type=jnp.float32,
    )  # [B, kh, kw, H, kh]
    bias_w = jnp.einsum(
        "byxhd,xkd->byxhk", q4, rel_pos_w.astype(q4.dtype),
        preferred_element_type=jnp.float32,
    )  # [B, kh, kw, H, kw]
    bp = -(-(kh + kw) // 128) * 128
    bias = jnp.concatenate([bias_h, bias_w], -1).astype(qkv.dtype)
    if bp > kh + kw:
        bias = jnp.pad(
            bias, ((0, 0),) * 4 + ((0, bp - kh - kw),))
    bias = bias.reshape(b, n, heads * bp)

    # Static augmentation one-hot: key token y*kw + x contributes
    # bias_h[., y] + bias_w[., x] to its logit via the augmented matmul.
    idx = np.arange(n)
    oh = np.zeros((n, bp), np.float32)
    oh[idx, idx // kw] = 1.0
    oh[idx, kh + idx % kw] = 1.0
    oh = jnp.asarray(oh, qkv.dtype)

    out = pl.pallas_call(
        functools.partial(_qkv_relpos_kernel, scale=scale),
        grid=(b, heads, n // tq),
        in_specs=[
            pl.BlockSpec((1, tq, dp),
                         lambda bi, hi, qi: (bi, qi, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, dp),
                         lambda bi, hi, qi: (bi, 0, heads + hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, dp),
                         lambda bi, hi, qi: (bi, 0, 2 * heads + hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, bp),
                         lambda bi, hi, qi: (bi, qi, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, bp),
                         lambda bi, hi, qi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, dp),
                               lambda bi, hi, qi: (bi, qi, hi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, heads * dp), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv, bias, oh)
    return out


def _cross_attention_kernel(q_ref, k_ref, v_ref, m_ref, o_ref,
                            *, divisor, heads, group, masked):
    """`group` batch elements per grid step; per-head attention with logits
    and probabilities entirely in VMEM.

    Built for the SAM mask decoder's TwoWayTransformer cross-attentions
    (8 heads x head_dim 16, 55 tokens x 4096 image tokens): the XLA
    composition materializes [B, H, Nq, Nk] probability tensors in HBM
    (~290 MB f32 per attention at the decode-chain chunk shape) — ~0.97 ms
    each, 5 per decoder pass, and the decode chain runs up to 14 passes. The
    FLOPs are trivial; this kernel exists purely to keep that traffic
    on-chip.

    Numerics mirror the XLA path exactly: the logits dot is rounded to the
    input dtype (XLA's bf16 dot output), scaled in that dtype, masked via
    select to the same -1e9 constant, softmaxed in f32, and the probability
    matrix is cast back to the input dtype for the PV dot.
    """
    for g in range(group):
        if masked:
            # f32 compare: Mosaic's vector cmpf doesn't support bf16
            mrow = m_ref[g].astype(jnp.float32) > 0  # [1, Nk] validity
        for h in range(heads):
            dh = q_ref.shape[-1] // heads
            sl = slice(h * dh, (h + 1) * dh)
            q = q_ref[g, :, sl]  # [Nq, dh]
            k = k_ref[g, :, sl]  # [Nk, dh]
            v = v_ref[g, :, sl]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(q.dtype) / divisor  # [Nq, Nk], input-dtype rounding
            if masked:
                logits = jnp.where(
                    mrow, logits, jnp.asarray(-1e9, logits.dtype)
                )
            lf = logits.astype(jnp.float32)
            m = jnp.max(lf, axis=-1, keepdims=True)
            p = jnp.exp(lf - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o_ref[g, :, sl] = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)


def fused_cross_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    heads: int,
    divisor: float,
    kv_valid: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Multi-head attention on pre-projected q/k/v with heads kept merged.

    q: [B, Nq, H*dh]; k, v: [B, Nk, H*dh]; kv_valid: [B, Nk] bool or None.
    Returns [B, Nq, H*dh] — replaces the head-split -> attention ->
    head-merge composition (and its HBM probability tensors) with one
    VMEM-resident kernel. `divisor` mirrors the reference's
    `logits / sqrt(head_dim)` (a true division, kept bit-identical).
    See `_cross_attention_kernel` for numerics.
    """
    b, nq, ch = q.shape
    nk = k.shape[1]
    assert ch % heads == 0

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    masked = kv_valid is not None
    mask = (
        kv_valid.astype(q.dtype)[:, None, :]
        if masked else jnp.zeros((b, 1, 1), q.dtype)
    )  # [B, 1, Nk]

    # VMEM per batch element: q/out Nq*ch, k/v Nk*ch at the INPUT dtype's
    # width (bf16 on the bench path, f32 in tests/debug runs — sizing for
    # bf16 under f32 inputs doubled the real footprint) + f32 logits scratch.
    itemsize = jnp.dtype(q.dtype).itemsize
    per_elem = itemsize * (2 * nq * ch + 2 * nk * ch) + 8 * nq * nk
    budget = int(10 * 1024 * 1024)
    group = next((g for g in (8, 6, 4, 3, 2, 1)
                  if b % g == 0 and g * per_elem <= budget), 1)

    out = pl.pallas_call(
        functools.partial(_cross_attention_kernel, divisor=divisor,
                          heads=heads, group=group, masked=masked),
        grid=(b // group,),
        in_specs=[
            pl.BlockSpec((group, nq, ch), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, nk, ch), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, nk, ch), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (group, 1, mask.shape[-1]),
                (lambda bi: (bi, 0, 0)) if masked else (lambda bi: (0, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((group, nq, ch), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nq, ch), q.dtype),
        interpret=interpret,
    )(q, k, v, mask)
    return out


def _qkv_window_kernel(q_ref, k_ref, v_ref, b_ref, oh_ref, o_ref,
                       *, scale, group, dp):
    """`group` windows × a head block per grid step, entirely in VMEM.

    The decomposed rel-pos bias arrives PRECOMPUTED per (window, token,
    head) — two tiny XLA einsums against the resolved tables — and rides
    the single logits matmul as channel augmentation (q gains its 2W bias
    columns, k gains a static one-hot (y, x) block). The previous in-kernel
    construction spent two extra matmuls per (window, head) on bias
    assembly (~68 of ~88 GFLOP at ViT-H shapes); the augmentation lanes
    here are FREE on the MXU: contraction dim 80+32 pads to the same
    128-lane tile the bare head dim already occupied."""
    oh = oh_ref[...]  # [N, BP] static one-hot(y), one-hot(x), zero pads
    bp = oh.shape[-1]
    hh = q_ref.shape[-1] // dp  # heads handled per grid step

    # Per-head lane slices at dp offsets. dp need NOT be 128-aligned:
    # Mosaic lowers unaligned in-VMEM lane slices (measured no slower than
    # aligned ones), which is what lets the encoder keep its native head
    # dim (e.g. 80 for ViT-H) instead of padding 80 -> 128 — the HBM block
    # is a group of `hh` heads sized to a 128-lane multiple.
    for h in range(hh):  # static unroll
        sl = slice(h * dp, (h + 1) * dp)
        bl = slice(h * bp, (h + 1) * bp)
        for g in range(group):
            q = q_ref[g, :, sl]  # [N, Dp]
            k = k_ref[g, :, sl]
            v = v_ref[g, :, sl]
            bias = b_ref[g, :, bl]  # [N, BP]

            q_aug = jnp.concatenate([(q * scale).astype(q.dtype), bias], 1)
            k_aug = jnp.concatenate([k, oh], 1)  # [N, Dp+BP]
            logits = jax.lax.dot_general(
                q_aug, k_aug, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [N, N] = q.k*scale + bias_h[yk] + bias_w[xk]

            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o_ref[g, :, sl] = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)


def _qkv_window_kernel_batched(q_ref, k_ref, v_ref, b_ref, oh_ref, o_ref,
                               *, scale, group, dp):
    """Like `_qkv_window_kernel` but the window loop is a G-BATCHED
    dot_general per head instead of `group` separately-scheduled tiny dots:
    3 MXU ops + 1 softmax per head-iteration rather than 3*G + G. The
    per-(window, head) [196, dp] matmuls under-fill the MXU individually
    (measured 1.0 ms/layer vs a 0.13 ms floor at ViT-H shapes — the unrolled
    schedule serializes VPU softmax against MXU phases); batching the window
    dim pipelines them inside single ops.

    The bias one-hot selection runs as a SEPARATE [G*N, BP] @ [BP, N] matmul
    (leading-dim reshapes lower in Mosaic; lane-splitting ones do not), then
    adds into the f32 logits."""
    oh = oh_ref[...]  # [N, BP]
    bp = oh.shape[-1]
    hh = q_ref.shape[-1] // dp
    g = q_ref.shape[0]
    n = q_ref.shape[1]

    for h in range(hh):  # static unroll over the head block
        sl = slice(h * dp, (h + 1) * dp)
        bl = slice(h * bp, (h + 1) * bp)
        q = q_ref[:, :, sl]  # [G, N, Dp]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        bias = b_ref[:, :, bl]  # [G, N, BP]

        logits = jax.lax.dot_general(
            (q * scale).astype(q.dtype), k,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [G, N, N]
        bias_sel = jax.lax.dot_general(
            bias.reshape(g * n, bp), oh,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(g, n, n)  # bias_h[yk] + bias_w[xk] per key token
        logits = logits + bias_sel

        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[:, :, sl] = jax.lax.dot_general(
            p.astype(v.dtype), v,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def fused_qkv_window_attention(
    qkv: jnp.ndarray,
    rel_h: jnp.ndarray,
    rel_w: jnp.ndarray,
    *,
    scale: float,
    heads: int,
    group: int = 0,
    interpret: Optional[bool] = None,
    batched_kernel: bool = True,
) -> jnp.ndarray:
    """Windowed ViT rel-pos attention straight from the fused qkv projection.

    qkv: [BW, N, 3*H*Dp] — qkv Dense output over window-partitioned tokens
    (BW = batch*windows, N = window*window, Dp = head dim padded to a
    128-lane multiple in the converted weights). Per-head q/k/v are read by
    column BlockSpecs from the same array (no head-split transpose in HBM),
    logits and softmax stay in VMEM.
    rel_h, rel_w: [W, W, Dp] resolved rel-pos tables for the window
    (rel_h[y_q, y_k] = Rh row); the bias q_i . (rel_h[y_i, y_j] +
    rel_w[x_i, x_j]) is precomputed per token by two XLA einsums and rides
    the logits matmul as channel augmentation (see `_qkv_window_kernel`).
    Returns [BW, N, H*Dp].
    """
    bw, n, chans = qkv.shape
    assert chans % (3 * heads) == 0, (chans, heads)
    dp = chans // (3 * heads)
    win = rel_h.shape[0]
    assert win * win == n and rel_w.shape[0] == win, (rel_h.shape, n)

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    # Mosaic HBM->VMEM blocks need a 128-divisible last dim: group the
    # smallest run of heads whose combined width hits a 128-lane multiple
    # (1 head at dp=128; 8 heads at ViT-H's native dp=80) and slice
    # per-head inside the kernel (unaligned VMEM lane slices lower fine).
    hb = 128 // np.gcd(dp, 128)
    assert heads % hb == 0, (heads, dp)

    # Per-head bias width: 2*win columns, padded so hb heads tile to a
    # 128-lane multiple (32 at ViT-H: hb=8 -> 16-lane unit, 2*14=28 -> 32).
    bp_unit = 128 // hb
    bp = -(-2 * win // bp_unit) * bp_unit

    ys = np.arange(n) // win
    xs = np.arange(n) % win

    # Precomputed decomposed bias: bias[w, i, h, :] = [q . rel_h[y_i],
    # q . rel_w[x_i]] — two einsums batched over the token index (tiny:
    # ~1.4 GFLOP at ViT-H vs the ~68 GFLOP the in-kernel assembly cost).
    q4 = qkv[..., :heads * dp].reshape(bw, n, heads, dp)
    rh_tok = rel_h[jnp.asarray(ys)]  # [N, W, Dp]
    rw_tok = rel_w[jnp.asarray(xs)]
    bias_h = jnp.einsum(
        "bnhd,nkd->bnhk", q4, rh_tok.astype(q4.dtype),
        preferred_element_type=jnp.float32,
    )  # [BW, N, H, W]
    bias_w = jnp.einsum(
        "bnhd,nkd->bnhk", q4, rw_tok.astype(q4.dtype),
        preferred_element_type=jnp.float32,
    )
    bias = jnp.concatenate([bias_h, bias_w], -1).astype(qkv.dtype)
    if bp > 2 * win:
        bias = jnp.pad(bias, ((0, 0),) * 3 + ((0, bp - 2 * win),))
    bias = bias.reshape(bw, n, heads * bp)

    # Static augmentation one-hot: key token (y, x) picks bias_h[., y] +
    # bias_w[., x] out of the augmented columns.
    oh = np.zeros((n, bp), np.float32)
    oh[np.arange(n), ys] = 1.0
    oh[np.arange(n), win + xs] = 1.0
    oh = jnp.asarray(oh, qkv.dtype)

    if not group:
        # VMEM: q/k/v/out 4 arrays x group*n*hb*dp bf16 + bias group*n*hb*bp,
        # double-buffered, plus f32 logits scratch per unrolled head.
        per_win = n * hb * (4 * dp + bp) * 2 * 2
        budget = int(9.5 * 1024 * 1024)
        group = next(
            (g for g in (10, 8, 6, 5, 4, 3, 2, 1)
             if bw % g == 0 and g * per_win <= budget), 1)

    nhb = heads // hb  # head-group blocks per q/k/v section
    kernel = _qkv_window_kernel_batched if batched_kernel else _qkv_window_kernel
    out = pl.pallas_call(
        functools.partial(kernel, scale=scale, group=group,
                          dp=dp),
        grid=(bw // group, nhb),
        in_specs=[
            pl.BlockSpec((group, n, hb * dp),
                         lambda wi, hi: (wi, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, n, hb * dp),
                         lambda wi, hi: (wi, 0, nhb + hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, n, hb * dp),
                         lambda wi, hi: (wi, 0, 2 * nhb + hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, n, hb * bp),
                         lambda wi, hi: (wi, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, bp), lambda wi, hi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, n, hb * dp),
                               lambda wi, hi: (wi, 0, hi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bw, n, heads * dp), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv, bias, oh)
    return out
