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

    def test_blockdiag_window_attention(self, rng):
        from sam_pt_tpu.ops.flash_attention import fused_window_attention

        b, kh, kw, d = 8, 4, 8, 24
        n = kh * kw
        q = rng.standard_normal((b, n, d)).astype(np.float32)
        k = rng.standard_normal((b, n, d)).astype(np.float32)
        v = rng.standard_normal((b, n, d)).astype(np.float32)
        bh = rng.standard_normal((b, n, kh)).astype(np.float32) * 0.3
        bw = rng.standard_normal((b, n, kw)).astype(np.float32) * 0.3
        got = fused_window_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(bh), jnp.asarray(bw), scale=0.2, group=4,
        )
        ref = naive(q, k, v, bh, bw, 0.2)
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)
