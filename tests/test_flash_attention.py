"""Fused rel-pos attention kernel vs naive reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam_pt_tpu.ops.flash_attention import fused_relpos_attention


def naive(q, k, v, bias_h, bias_w, scale):
    b, n, d = q.shape
    kh = bias_h.shape[-1]
    kw = bias_w.shape[-1]
    logits = (q * scale) @ np.swapaxes(k, -1, -2)
    bias = (bias_h[:, :, :, None] + bias_w[:, :, None, :]).reshape(b, n, n)
    logits = logits + bias
    logits = logits - logits.max(-1, keepdims=True)
    p = np.exp(logits)
    p = p / p.sum(-1, keepdims=True)
    return p @ v


class TestFusedAttention:
    def test_matches_naive(self, rng):
        b, kh, kw, d = 2, 8, 16, 40  # N = 128, head_dim padded 40 -> 128
        n = kh * kw
        q = rng.standard_normal((b, n, d)).astype(np.float32)
        k = rng.standard_normal((b, n, d)).astype(np.float32)
        v = rng.standard_normal((b, n, d)).astype(np.float32)
        bh = rng.standard_normal((b, n, kh)).astype(np.float32) * 0.5
        bw = rng.standard_normal((b, n, kw)).astype(np.float32) * 0.5
        scale = d ** -0.5

        got = fused_relpos_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(bh), jnp.asarray(bw), scale=scale, q_tile=64,
        )
        ref = naive(q, k, v, bh, bw, scale)
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)

    def test_encoder_fused_matches_unfused(self, rng):
        """Global ViT attention block: fused kernel vs naive path."""
        from sam_pt_tpu.models.sam.image_encoder import Attention

        h = w = 32  # 1024 tokens -> fused path
        c, heads = 32, 2
        x = jnp.asarray(rng.standard_normal((1, h, w, c)).astype(np.float32))
        attn = Attention(num_heads=heads, input_size=(h, w))
        params = attn.init(jax.random.PRNGKey(0), x)
        # non-trivial rel pos tables
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(
                rng.standard_normal(a.shape).astype(np.float32) * 0.1
            ),
            params,
        )
        fused = attn.apply(params, x)

        import sam_pt_tpu.models.sam.image_encoder as ie
        orig = ie.fused_min_tokens if hasattr(ie, "fused_min_tokens") else None
        # force the naive path by shrinking the image under the threshold:
        # instead, monkeypatch the module flag via a tiny wrapper
        class NaiveAttention(Attention):
            @property
            def _naive(self):
                return True
        # simplest: recompute naive with the same params via the non-fused
        # branch by calling with use_rel_pos math manually
        from sam_pt_tpu.models.sam.image_encoder import (
            _add_decomposed_rel_pos,
        )
        p = params["params"]
        qkv = x.reshape(1, h * w, c) @ p["qkv"]["kernel"] + p["qkv"]["bias"]
        qkv = qkv.reshape(1, h * w, 3, heads, c // heads)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4)).reshape(
            3, heads, h * w, c // heads)
        q, k, v = qkv[0], qkv[1], qkv[2]
        scale = (c // heads) ** -0.5
        logits = (q * scale) @ jnp.swapaxes(k, -1, -2)
        logits = _add_decomposed_rel_pos(
            logits, q, p["rel_pos_h"], p["rel_pos_w"], (h, w), (h, w))
        probs = jax.nn.softmax(logits, axis=-1)
        out = (probs @ v).reshape(1, heads, h * w, c // heads)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(1, h * w, c)
        ref = out @ p["proj"]["kernel"] + p["proj"]["bias"]
        np.testing.assert_allclose(
            np.asarray(fused).reshape(1, h * w, c), np.asarray(ref), atol=2e-4
        )


class TestWindowVariants:
    def test_grouped_small_n_path(self, rng):
        """N < 1024 routes through the grouped kernel; must match naive."""
        b, kh, kw, d = 8, 4, 8, 24  # N = 32
        n = kh * kw
        q = rng.standard_normal((b, n, d)).astype(np.float32)
        k = rng.standard_normal((b, n, d)).astype(np.float32)
        v = rng.standard_normal((b, n, d)).astype(np.float32)
        bh = rng.standard_normal((b, n, kh)).astype(np.float32) * 0.3
        bw = rng.standard_normal((b, n, kw)).astype(np.float32) * 0.3
        got = fused_relpos_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(bh), jnp.asarray(bw), scale=0.2,
        )
        ref = naive(q, k, v, bh, bw, 0.2)
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)


class TestQkvRelposKernel:
    """New fused path: q/k/v read straight from the qkv projection layout,
    rel-pos bias computed inside the kernel from the raw tables."""

    def test_matches_naive(self, rng):
        from sam_pt_tpu.ops.flash_attention import fused_qkv_relpos_attention

        b, kh, kw, heads, dp = 2, 32, 32, 2, 128
        n = kh * kw
        qkv = rng.standard_normal((b, n, 3, heads, dp)).astype(np.float32)
        qkv_flat = qkv.reshape(b, n, 3 * heads * dp)
        rh = rng.standard_normal((kh, kh, dp)).astype(np.float32) * 0.3
        rw = rng.standard_normal((kw, kw, dp)).astype(np.float32) * 0.3
        scale = 0.11

        got = fused_qkv_relpos_attention(
            jnp.asarray(qkv_flat), jnp.asarray(rh), jnp.asarray(rw),
            scale=scale, kh=kh, kw=kw, heads=heads,
        ).reshape(b, n, heads, dp)

        ys = np.arange(n) // kw
        xs = np.arange(n) % kw
        for bi in range(b):
            for hi in range(heads):
                q = qkv[bi, :, 0, hi]
                k = qkv[bi, :, 1, hi]
                v = qkv[bi, :, 2, hi]
                logits = (q * scale) @ k.T
                bias_h = np.einsum("nc,nkc->nk", q, rh[ys])  # [N, kh]
                bias_w = np.einsum("nc,nkc->nk", q, rw[xs])  # [N, kw]
                logits = logits + bias_h[:, ys] + bias_w[:, xs]
                logits -= logits.max(-1, keepdims=True)
                p = np.exp(logits)
                p /= p.sum(-1, keepdims=True)
                ref = p @ v
                np.testing.assert_allclose(
                    np.asarray(got[bi, :, hi]), ref, atol=3e-4
                )

    def test_rectangular_grid_awkward_kw(self, rng):
        """kw that divides no power-of-two q-tile (e.g. 36, from cropped
        rectangular global grids) must still tile — the old halving search
        reached tq=0 and raised ZeroDivisionError."""
        from sam_pt_tpu.ops.flash_attention import fused_qkv_relpos_attention

        b, kh, kw, heads, dp = 1, 16, 36, 1, 128
        n = kh * kw
        qkv = rng.standard_normal((b, n, 3, heads, dp)).astype(np.float32)
        qkv_flat = qkv.reshape(b, n, 3 * heads * dp)
        rh = rng.standard_normal((kh, kh, dp)).astype(np.float32) * 0.3
        rw = rng.standard_normal((kw, kw, dp)).astype(np.float32) * 0.3
        scale = 0.13

        got = fused_qkv_relpos_attention(
            jnp.asarray(qkv_flat), jnp.asarray(rh), jnp.asarray(rw),
            scale=scale, kh=kh, kw=kw, heads=heads,
        ).reshape(b, n, heads, dp)

        ys = np.arange(n) // kw
        xs = np.arange(n) % kw
        q = qkv[0, :, 0, 0]
        k = qkv[0, :, 1, 0]
        v = qkv[0, :, 2, 0]
        logits = (q * scale) @ k.T
        logits = logits + np.einsum("nc,nkc->nk", q, rh[ys])[:, ys]
        logits = logits + np.einsum("nc,nkc->nk", q, rw[xs])[:, xs]
        logits -= logits.max(-1, keepdims=True)
        p = np.exp(logits)
        p /= p.sum(-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(got[0, :, 0]), p @ v, atol=3e-4)

    def test_encoder_padded_global_block(self, rng):
        """Attention with padded_head_dim: padded-weight fused path must match
        the unpadded XLA math."""
        from sam_pt_tpu.models.sam.image_encoder import (
            Attention, _add_decomposed_rel_pos,
        )

        h = w = 32
        c, heads = 32, 2
        hd = c // heads  # 16
        hdp = 128
        x = jnp.asarray(rng.standard_normal((1, h, w, c)).astype(np.float32))

        attn = Attention(num_heads=heads, input_size=(h, w),
                         padded_head_dim=hdp)
        params = attn.init(jax.random.PRNGKey(0), x)
        # build padded params from dense random originals (zeros in pads)
        qkv_w = rng.standard_normal((c, 3 * c)).astype(np.float32) * 0.1
        qkv_b = rng.standard_normal((3 * c,)).astype(np.float32) * 0.1
        proj_w = rng.standard_normal((c, c)).astype(np.float32) * 0.1
        proj_b = rng.standard_normal((c,)).astype(np.float32) * 0.1
        rel_h = rng.standard_normal((2 * h - 1, hd)).astype(np.float32) * 0.1
        rel_w = rng.standard_normal((2 * w - 1, hd)).astype(np.float32) * 0.1

        from sam_pt_tpu.utils.checkpoint import _pad_attn_heads

        pqkv_w, pqkv_b, pproj_w, prel_h, prel_w = _pad_attn_heads(
            qkv_w, qkv_b, proj_w, rel_h, rel_w, num_heads=heads
        )
        params = {"params": {
            "qkv": {"kernel": jnp.asarray(pqkv_w), "bias": jnp.asarray(pqkv_b)},
            "proj": {"kernel": jnp.asarray(pproj_w), "bias": jnp.asarray(proj_b)},
            "rel_pos_h": jnp.asarray(prel_h),
            "rel_pos_w": jnp.asarray(prel_w),
        }}
        got = attn.apply(params, x)

        # unpadded reference math
        qkv = x.reshape(1, h * w, c) @ qkv_w + qkv_b
        qkv = qkv.reshape(1, h * w, 3, heads, hd)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4)).reshape(
            3, heads, h * w, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        scale = hd ** -0.5
        logits = (q * scale) @ jnp.swapaxes(k, -1, -2)
        logits = _add_decomposed_rel_pos(
            logits, q, jnp.asarray(rel_h), jnp.asarray(rel_w), (h, w), (h, w))
        probs = jax.nn.softmax(logits, axis=-1)
        out = (probs @ v).reshape(1, heads, h * w, hd)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(1, h * w, c)
        ref = out @ proj_w + proj_b
        np.testing.assert_allclose(
            np.asarray(got).reshape(1, h * w, c), np.asarray(ref), atol=3e-4
        )


class TestFusedQkvWindowAttention:
    """Window variant: decomposed rel-pos bias via compact matmuls + static
    selection/one-hot masks, per-head column reads of the raw qkv
    projection."""

    def test_matches_naive(self, rng):
        from sam_pt_tpu.ops.flash_attention import fused_qkv_window_attention

        win, heads, dp, d, bw = 7, 2, 128, 80, 6
        n = win * win
        qkv = np.zeros((bw, n, 3 * heads * dp), np.float32)
        qkv_real = rng.standard_normal((bw, n, 3, heads, d)).astype(
            np.float32) * 0.4
        qkv.reshape(bw, n, 3, heads, dp)[..., :d] = qkv_real
        rh = np.zeros((win, win, dp), np.float32)
        rw = np.zeros((win, win, dp), np.float32)
        rh[..., :d] = rng.standard_normal((win, win, d)) * 0.2
        rw[..., :d] = rng.standard_normal((win, win, d)) * 0.2
        rfull = (rh[:, None, :, None, :] + rw[None, :, None, :, :]).reshape(
            n, n, dp)
        scale = d ** -0.5

        out = fused_qkv_window_attention(
            jnp.asarray(qkv), jnp.asarray(rh), jnp.asarray(rw),
            scale=scale, heads=heads)
        out = np.asarray(out).reshape(bw, n, heads, dp)[..., :d]

        q = qkv_real[:, :, 0]
        k = qkv_real[:, :, 1]
        v = qkv_real[:, :, 2]
        for w in range(bw):
            for h in range(heads):
                logits = (q[w, :, h] * scale) @ k[w, :, h].T
                logits = logits + np.einsum(
                    "qc,qkc->qk", q[w, :, h], rfull[..., :d])
                p = np.exp(logits - logits.max(-1, keepdims=True))
                p /= p.sum(-1, keepdims=True)
                ref = p @ v[w, :, h]
                np.testing.assert_allclose(
                    out[w, :, h], ref, atol=2e-3,
                    err_msg=f"window {w} head {h}")

    def test_group_sizes_match(self, rng):
        from sam_pt_tpu.ops.flash_attention import fused_qkv_window_attention

        win, heads, dp, bw = 7, 2, 128, 8
        n = win * win
        qkv = jnp.asarray(
            rng.standard_normal((bw, n, 3 * heads * dp)).astype(np.float32)
            * 0.2)
        rh = jnp.asarray(
            rng.standard_normal((win, win, dp)).astype(np.float32) * 0.1)
        rw = jnp.asarray(
            rng.standard_normal((win, win, dp)).astype(np.float32) * 0.1)
        a = fused_qkv_window_attention(qkv, rh, rw, scale=0.2, heads=heads)
        b = fused_qkv_window_attention(qkv, rh, rw, scale=0.2, heads=heads,
                                       group=2)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


class TestFusedCrossAttention:
    """Decoder cross-attention kernel vs the head-split XLA composition."""

    def _xla_ref(self, qp, kp, vp, heads, kv_valid=None):
        b, nq, ch = qp.shape
        dh = ch // heads

        def split(x):
            bb, n, _ = x.shape
            return jnp.transpose(x.reshape(bb, n, heads, dh), (0, 2, 1, 3))

        qh, kh, vh = split(qp), split(kp), split(vp)
        logits = (qh @ jnp.swapaxes(kh, -1, -2)) / (dh ** 0.5)
        if kv_valid is not None:
            logits = jnp.where(kv_valid[:, None, None, :], logits, -1e9)
        p = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(qp.dtype)
        out = p @ vh
        bb, h, n, d = out.shape
        return jnp.transpose(out, (0, 2, 1, 3)).reshape(bb, n, h * d)

    def test_t2i_shape_unmasked(self, rng):
        from sam_pt_tpu.ops.flash_attention import fused_cross_attention

        b, nq, nk, heads, dh = 3, 55, 4096, 8, 16
        qp = jnp.asarray(rng.standard_normal((b, nq, heads * dh)), jnp.float32) * 0.3
        kp = jnp.asarray(rng.standard_normal((b, nk, heads * dh)), jnp.float32) * 0.3
        vp = jnp.asarray(rng.standard_normal((b, nk, heads * dh)), jnp.float32) * 0.3
        out = fused_cross_attention(qp, kp, vp, heads=heads, divisor=dh ** 0.5)
        ref = self._xla_ref(qp, kp, vp, heads)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_i2t_shape_masked(self, rng):
        from sam_pt_tpu.ops.flash_attention import fused_cross_attention

        b, nq, nk, heads, dh = 2, 4096, 55, 8, 16
        qp = jnp.asarray(rng.standard_normal((b, nq, heads * dh)), jnp.float32) * 0.3
        kp = jnp.asarray(rng.standard_normal((b, nk, heads * dh)), jnp.float32) * 0.3
        vp = jnp.asarray(rng.standard_normal((b, nk, heads * dh)), jnp.float32) * 0.3
        valid = jnp.asarray(rng.random((b, nk)) > 0.3)
        out = fused_cross_attention(qp, kp, vp, heads=heads,
                                    divisor=dh ** 0.5, kv_valid=valid)
        ref = self._xla_ref(qp, kp, vp, heads, valid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_bf16_close(self, rng):
        from sam_pt_tpu.ops.flash_attention import fused_cross_attention

        b, nq, nk, heads, dh = 2, 16, 1024, 4, 16
        qp = jnp.asarray(rng.standard_normal((b, nq, heads * dh)),
                         jnp.bfloat16) * 0.3
        kp = jnp.asarray(rng.standard_normal((b, nk, heads * dh)),
                         jnp.bfloat16) * 0.3
        vp = jnp.asarray(rng.standard_normal((b, nk, heads * dh)),
                         jnp.bfloat16) * 0.3
        out = fused_cross_attention(qp, kp, vp, heads=heads, divisor=dh ** 0.5)
        ref = self._xla_ref(qp, kp, vp, heads)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=0.05, atol=0.05)
