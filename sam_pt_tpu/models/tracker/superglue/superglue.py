"""SuperGlue attentional keypoint matcher, TPU-native.

Re-implements the reference's vendored SuperGlue
(sam_pt/point_tracker/superglue/models/superglue.py): keypoint MLP encoder,
9 rounds of alternating self/cross attentional message passing (4 heads,
dim 256), final projection, score matrix + learned-dustbin Sinkhorn
(`log_optimal_transport`, reference :154), mutual-max matching with a
confidence threshold.

TPU-first: fixed K keypoints per image with validity masks; invalid slots are
masked out of attention and the transport problem (their rows route to the
dustbin), so the whole matcher is one static-shape jitted program.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..raft.model import InferenceBatchNorm


class BNDense(nn.Module):
    """Linear + inference BatchNorm + optional ReLU (torch Conv1d+BN stack)."""

    features: int
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.features, name="lin", dtype=self.dtype)(x)
        x = InferenceBatchNorm(self.features, name="bn")(x)
        return nn.relu(x) if self.relu else x


class KeypointEncoder(nn.Module):
    """magicleap MLP([3] + layers + [descriptor_dim]): BN+ReLU after every
    hidden conv, plain conv out (superglue.py:54-86)."""

    layers: Sequence[int] = (32, 64, 128, 256)
    out_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, kpts01, scores):  # [K, 2] normalized, [K]
        x = jnp.concatenate([kpts01, scores[:, None]], axis=-1)
        for i, ch in enumerate(self.layers):
            x = BNDense(ch, name=f"layer_{i}", dtype=self.dtype)(x)
        return nn.Dense(self.out_dim, name="out", dtype=self.dtype)(x)


class MultiHeadAttention(nn.Module):
    num_heads: int = 4
    dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q_x, kv_x, kv_valid):
        hd = self.dim // self.num_heads
        q = nn.Dense(self.dim, name="q_proj", dtype=self.dtype)(q_x)
        k = nn.Dense(self.dim, name="k_proj", dtype=self.dtype)(kv_x)
        v = nn.Dense(self.dim, name="v_proj", dtype=self.dtype)(kv_x)

        def split(t):
            return t.reshape(-1, self.num_heads, hd).transpose(1, 0, 2)

        qh, kh, vh = split(q), split(k), split(v)
        logits = (qh @ kh.transpose(0, 2, 1)) / (hd ** 0.5)
        logits = jnp.where(kv_valid[None, None, :], logits, -1e9)
        attn = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(self.dtype)
        out = (attn @ vh).transpose(1, 0, 2).reshape(-1, self.dim)
        return nn.Dense(self.dim, name="merge", dtype=self.dtype)(out)


class AttentionalPropagation(nn.Module):
    dim: int = 256
    num_heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, source, source_valid):
        msg = MultiHeadAttention(self.num_heads, self.dim, name="attn",
                                 dtype=self.dtype)(x, source, source_valid)
        y = jnp.concatenate([x, msg], axis=-1)
        # magicleap MLP([2d, 2d, d]): conv(2d->2d)+BN+ReLU, conv(2d->d)
        y = BNDense(2 * self.dim, name="mlp_0", dtype=self.dtype)(y)
        y = nn.Dense(self.dim, name="mlp_out", dtype=self.dtype)(y)
        return x + y


def log_sinkhorn(scores: jnp.ndarray, alpha: jnp.ndarray, iters: int):
    """Log-domain Sinkhorn with a learned dustbin row/column.

    scores: [M, N] pair scores; returns [M+1, N+1] log transport plan
    (reference log_optimal_transport semantics).
    """
    m, n = scores.shape
    ms, ns = jnp.float32(m), jnp.float32(n)

    bins0 = jnp.full((m, 1), alpha)
    bins1 = jnp.full((1, n), alpha)
    alpha_c = jnp.full((1, 1), alpha)
    couplings = jnp.concatenate(
        [
            jnp.concatenate([scores, bins0], axis=1),
            jnp.concatenate([bins1, alpha_c], axis=1),
        ],
        axis=0,
    )  # [M+1, N+1]

    norm = -jnp.log(ms + ns)
    log_mu = jnp.concatenate(
        [jnp.full((m,), norm), jnp.array([jnp.log(ns) + norm])]
    )
    log_nu = jnp.concatenate(
        [jnp.full((n,), norm), jnp.array([jnp.log(ms) + norm])]
    )

    u = jnp.zeros_like(log_mu)
    v = jnp.zeros_like(log_nu)
    for _ in range(iters):
        u = log_mu - jax.nn.logsumexp(couplings + v[None, :], axis=1)
        v = log_nu - jax.nn.logsumexp(couplings + u[:, None], axis=0)
    return couplings + u[:, None] + v[None, :] - norm


def normalize_keypoints(kpts, hw):
    h, w = hw
    size = jnp.array([w, h], jnp.float32)
    center = size / 2
    scaling = jnp.max(size) * 0.7
    return (kpts - center[None]) / scaling


class SuperGlue(nn.Module):
    descriptor_dim: int = 256
    gnn_layers: int = 9  # pairs of (self, cross)
    num_heads: int = 4
    sinkhorn_iterations: int = 100
    match_threshold: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, data: Dict) -> Dict:
        """data: keypoints{0,1} [K, 2], scores{0,1} [K], valid{0,1} [K] bool,
        descriptors{0,1} [K, D], image_shape (h, w).

        Returns matches0 [K] int (-1 = unmatched), matching_scores0 [K].
        """
        hw = data["image_shape"]
        kenc = KeypointEncoder(dtype=self.dtype, name="kenc")
        d0 = data["descriptors0"] + kenc(
            normalize_keypoints(data["keypoints0"], hw), data["scores0"]
        )
        d1 = data["descriptors1"] + kenc(
            normalize_keypoints(data["keypoints1"], hw), data["scores1"]
        )
        v0 = data["valid0"]
        v1 = data["valid1"]

        for i in range(self.gnn_layers):
            sa = AttentionalPropagation(
                self.descriptor_dim, self.num_heads, name=f"self_{i}",
                dtype=self.dtype)
            d0 = sa(d0, d0, v0)
            d1 = sa(d1, d1, v1)
            ca = AttentionalPropagation(
                self.descriptor_dim, self.num_heads, name=f"cross_{i}",
                dtype=self.dtype)
            d0n = ca(d0, d1, v1)
            d1n = ca(d1, d0, v0)
            d0, d1 = d0n, d1n

        proj = nn.Dense(self.descriptor_dim, name="final_proj",
                        dtype=self.dtype)
        m0 = proj(d0)
        m1 = proj(d1)

        scores = (m0 @ m1.T) / (self.descriptor_dim ** 0.5)
        scores = jnp.where(v0[:, None] & v1[None, :], scores, -1e9)

        bin_score = self.param("bin_score", nn.initializers.ones, ())
        z = log_sinkhorn(
            scores.astype(jnp.float32), bin_score, self.sinkhorn_iterations
        )

        # mutual-max matching with threshold (reference :232-248)
        inner = z[:-1, :-1]
        max0 = inner.max(axis=1)
        idx0 = inner.argmax(axis=1)
        idx1 = inner.argmax(axis=0)
        mutual0 = jnp.arange(inner.shape[0]) == idx1[idx0]
        mscores0 = jnp.where(mutual0, jnp.exp(max0), 0.0)
        valid_match = mutual0 & (mscores0 > self.match_threshold) & v0
        matches0 = jnp.where(valid_match, idx0, -1)
        return {"matches0": matches0, "matching_scores0": mscores0}
