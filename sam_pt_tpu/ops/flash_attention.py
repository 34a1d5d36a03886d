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


def _qkv_relpos_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, oh_ref, o_ref, *,
                       scale, kw):
    """One (frame, head, q-tile) step: logits live only in VMEM and the
    rel-pos bias is computed here from the raw tables.

    Mosaic constraints shape the formulation: batched `dot_general` needs
    lhs/rhs batch dims at the SAME index, lane-splitting reshapes
    ([TQ, N] -> [rows, kw, kh, kw]) don't lower, and leading-dim transposes
    are unreliable. So the per-row bias tables are built with 2D/bat-0 dots
    (static unroll over the few rows in a q tile), and the bias ADD rides
    the main logits matmul as channel augmentation: q gains its [KH]+[KW]
    bias rows, k gains a static one-hot (y, x) block, and one MXU matmul
    produces q.k + bias_h[yk] + bias_w[xk]."""
    q = q_ref[0]  # [TQ, Dp]
    k = k_ref[0]  # [N, Dp]
    v = v_ref[0]  # [N, Dp]
    rh = rh_ref[...]  # [rows, KH, Dp]
    rw = rw_ref[...]  # [KW, KW, Dp]
    oh = oh_ref[...]  # [N, KH+KW] static one-hot(y), one-hot(x)
    tq = q.shape[0]
    rows = tq // kw

    # bias_h[r*kw + wq, yk] = q[r*kw + wq] . rh[r, yk]
    # bias_w[r*kw + wq, xk] = q[r*kw + wq] . rw[wq, xk]
    bh, bw = [], []
    for r in range(rows):
        q_r = q[r * kw:(r + 1) * kw, :]  # [KW, Dp]
        bh.append(jax.lax.dot_general(
            q_r, rh[r], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))  # [KW, KH]
        bw_r = jax.lax.dot_general(
            q_r[:, None, :], rw, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [KW, 1, KW], batch dims at index 0 on both sides
        bw.append(bw_r.reshape(kw, kw))
    bias = jnp.concatenate(
        [jnp.concatenate(bh, 0), jnp.concatenate(bw, 0)], 1
    )  # [TQ, KH+KW]

    q_aug = jnp.concatenate(
        [(q * scale).astype(q.dtype), bias.astype(q.dtype)], 1
    )  # [TQ, Dp+KH+KW]
    k_aug = jnp.concatenate([k, oh.astype(k.dtype)], 1)  # [N, Dp+KH+KW]
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

    # q-tile = (rows of the key grid) x kw: take the largest row count g
    # dividing kh with kw*g <= q_tile, falling back to one row when kw
    # alone exceeds q_tile. (The previous power-of-two halving reached 0
    # and divided by it when kw divides no halved tile — e.g. rectangular
    # cropped global grids with kw=36.)
    g_max = max(1, q_tile // kw)
    rows = max(d for d in range(1, kh + 1) if kh % d == 0 and d <= g_max)
    tq = kw * rows

    # Static augmentation one-hot: key token y*kw + x contributes
    # bias_h[., y] + bias_w[., x] to its logit via the augmented matmul.
    idx = np.arange(n)
    oh = np.zeros((n, kh + kw), np.float32)
    oh[idx, idx // kw] = 1.0
    oh[idx, kh + idx % kw] = 1.0
    oh = jnp.asarray(oh, qkv.dtype)

    out = pl.pallas_call(
        functools.partial(_qkv_relpos_kernel, scale=scale, kw=kw),
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
            pl.BlockSpec((rows, kh, dp),
                         lambda bi, hi, qi: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kw, kw, dp),
                         lambda bi, hi, qi: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, kh + kw),
                         lambda bi, hi, qi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, dp),
                               lambda bi, hi, qi: (bi, qi, hi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, heads * dp), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv, rel_pos_h, rel_pos_w, oh)
    return out


def _qkv_window_kernel(q_ref, k_ref, v_ref, wb_ref, sel_ref, ohk_ref, o_ref,
                       *, scale, group):
    """`group` windows × one head per grid step, entirely in VMEM.

    Decomposed rel-pos bias via compact matmuls + static masks. The naive
    per-window bias dot is N batched mat-vecs ([G, Dp] x [Dp, N] per token)
    — ~2% MXU row utilization and 3/4 of the kernel's time. Instead:

        ab[i, y*W + yk]   = q_i . rh[y, yk]          (ALL rows y at once)
        ab               *= sel  (static: keep y == y_i block)
        bias[i, j]        = ab @ ohk  (static one-hot: yk == y_j)

    Both matmuls are well shaped ([N, Dp] x [Dp, 2W²] and [N, 2W²] x
    [2W², N]) — ~2.7x fewer MXU tile-ops than the batched mat-vec, and the
    10 MB [N, N, Dp] full table is gone from VMEM (tables here are ~0.5 MB).
    The masked ab is cast to the input dtype before the expansion matmul:
    one extra bf16 rounding of the final bias value, inside the noise of the
    bf16 q/k inputs themselves (f32 runs are unaffected — no-op cast)."""
    wb = wb_ref[...]   # [Dp, 2*W*W]
    sel = sel_ref[...]  # [N, 2*W*W] f32 0/1
    ohk = ohk_ref[...]  # [2*W*W, N] input dtype 0/1
    dp = wb.shape[0]
    hh = q_ref.shape[-1] // dp  # heads handled per grid step

    # Per-head lane slices at dp offsets. dp need NOT be 128-aligned:
    # Mosaic lowers unaligned in-VMEM lane slices (measured no slower than
    # aligned ones), which is what lets the encoder keep its native head
    # dim (e.g. 80 for ViT-H) instead of padding 80 -> 128 — the HBM block
    # is a group of `hh` heads sized to a 128-lane multiple.
    for h in range(hh):  # static unroll
        sl = slice(h * dp, (h + 1) * dp)
        for g in range(group):
            q = q_ref[g, :, sl]  # [N, Dp]
            k = k_ref[g, :, sl]
            v = v_ref[g, :, sl]

            ab = jax.lax.dot_general(
                q, wb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [N, 2W²]
            ab = (ab * sel).astype(q.dtype)
            bias = jax.lax.dot_general(
                ab, ohk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [N, N]

            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + bias

            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o_ref[g, :, sl] = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
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
) -> jnp.ndarray:
    """Windowed ViT rel-pos attention straight from the fused qkv projection.

    qkv: [BW, N, 3*H*Dp] — qkv Dense output over window-partitioned tokens
    (BW = batch*windows, N = window*window, Dp = head dim padded to a
    128-lane multiple in the converted weights). Per-head q/k/v are read by
    column BlockSpecs from the same array (no head-split transpose in HBM),
    logits and softmax stay in VMEM.
    rel_h, rel_w: [W, W, Dp] resolved rel-pos tables for the window
    (rel_h[y_q, y_k] = Rh row); the bias q_i . (rel_h[y_i, y_j] +
    rel_w[x_i, x_j]) is computed in-kernel via compact matmuls against
    static selection/one-hot masks (see `_qkv_window_kernel`).
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

    if not group:
        # VMEM: 4 arrays x group*n*hb*dp bf16, double-buffered, plus ~2 MB
        # of f32 scratch (ab/bias/logits) per unrolled head — group 6 at
        # hb=8 measured 1.58 MB over the 16 MB scoped limit, so budget 9.5
        per_win = n * hb * dp * 2 * 4 * 2
        budget = int(9.5 * 1024 * 1024)
        group = next(
            (g for g in (10, 8, 6, 5, 4, 3, 2, 1)
             if bw % g == 0 and g * per_win <= budget), 1)

    nb = win * win
    # wb[d, y*W + yk] = rel_h[y, yk, d]  (h block), same for w block
    wb = jnp.concatenate(
        [rel_h.reshape(nb, dp).T, rel_w.reshape(nb, dp).T], axis=1
    ).astype(qkv.dtype)  # [Dp, 2*W*W]

    ys = np.arange(n) // win
    xs = np.arange(n) % win
    blk = np.arange(nb) // win   # y (or x) of each table lane
    within = np.arange(nb) % win  # yk (or xk) of each table lane
    sel = np.concatenate(
        [(ys[:, None] == blk[None, :]), (xs[:, None] == blk[None, :])], axis=1
    ).astype(np.float32)  # [N, 2W²]
    ohk = np.concatenate(
        [(within[:, None] == ys[None, :]), (within[:, None] == xs[None, :])],
        axis=0,
    ).astype(np.float32)  # [2W², N]
    sel = jnp.asarray(sel)
    ohk = jnp.asarray(ohk, qkv.dtype)

    nhb = heads // hb  # head-group blocks per q/k/v section
    out = pl.pallas_call(
        functools.partial(_qkv_window_kernel, scale=scale, group=group),
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
            pl.BlockSpec((dp, 2 * nb), lambda wi, hi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 2 * nb), lambda wi, hi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * nb, n), lambda wi, hi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, n, hb * dp),
                               lambda wi, hi: (wi, 0, hi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bw, n, heads * dp), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv, wb, sel, ohk)
    return out
