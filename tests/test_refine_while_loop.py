"""The box-refinement while_loop must EQUAL the reference's unrolled loop.

The r5 decode chain runs the 12 refinement passes (reference
sam_pt/modeling/sam_pt.py:809-828) as a `lax.while_loop` with an exact
fixed-point early exit: when a pass leaves (low, iou) bit-identical, every
remaining pass — a deterministic function of that state — provably
reproduces it, so stopping early cannot change the output. This test pins
that guarantee by re-running the SAME while_loop with the early-exit flag
ignored (unconditional `refine_iters` trips) and bit-comparing full
forward outputs.

(A python-unrolled comparison is deliberately NOT used: XLA does not
promise bit-identical floats between a rolled loop body and an unrolled
chain — fusion/reassociation differ — and with random weights the iou~0
gate amplifies ulp differences into -inf plane flips. The production
guarantee is early-exit == unconditional run OF THE SAME COMPILED BODY,
and that is what this asserts.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam_pt_tpu.utils.testing import build_tiny_sam_pt

pytestmark = pytest.mark.slow  # ~4 min of tiny-model forwards on CPU


def _make_video(t=5, h=48, w=64, n_masks=2):
    rng = np.random.default_rng(7)
    masks = np.zeros((n_masks, h, w), np.float32)
    masks[0, 10:25, 8:30] = 1
    masks[1, 28:45, 35:60] = 1
    return {
        "video_name": "synthetic",
        "video_id": 0,
        "image": rng.integers(0, 255, size=(t, h, w, 3)).astype(np.uint8),
        "target_hw": (h, w),
        "query_masks": masks,
        "query_point_timestep": np.zeros((n_masks,), np.float32),
    }


REFINE_ITERS = 3


class TestRefineWhileLoopEquivalence:
    def test_early_exit_matches_unconditional_unroll(self, monkeypatch):
        video = _make_video()

        model = build_tiny_sam_pt(
            iterative_refinement_iterations=REFINE_ITERS)
        out_prod = model.forward(video)

        # Reference semantics: the SAME while_loop, but the cond ignores
        # the early-exit flag — always runs all REFINE_ITERS passes. Only
        # the box-refine loop is intercepted (4-tuple carry ending in a
        # bool scalar); any other while_loop in the stack runs untouched.
        real_while = jax.lax.while_loop

        def unconditional(cond, body, init):
            if (isinstance(init, tuple) and len(init) == 4
                    and getattr(init[3], "dtype", None) == jnp.bool_):
                return real_while(
                    lambda c: c[0] < REFINE_ITERS, body, init)
            return real_while(cond, body, init)

        monkeypatch.setattr(jax.lax, "while_loop", unconditional)
        try:
            model_ref = build_tiny_sam_pt(
                iterative_refinement_iterations=REFINE_ITERS)
            out_ref = model_ref.forward(video)
        finally:
            monkeypatch.setattr(jax.lax, "while_loop", real_while)

        np.testing.assert_array_equal(
            np.asarray(out_prod["logits"]), np.asarray(out_ref["logits"]))
        np.testing.assert_array_equal(
            np.asarray(out_prod["scores"]), np.asarray(out_ref["scores"]))
        np.testing.assert_array_equal(
            np.asarray(out_prod["scores_per_frame"]),
            np.asarray(out_ref["scores_per_frame"]))


class TestUploadChunk:
    def test_upload_chunk_multiple_matches_default(self):
        video = _make_video()
        base = build_tiny_sam_pt().forward(video)
        big = build_tiny_sam_pt(upload_chunk=8).forward(video)
        np.testing.assert_array_equal(
            np.asarray(base["logits"]), np.asarray(big["logits"]))

    def test_upload_chunk_must_divide_encode_chunk(self):
        video = _make_video()
        model = build_tiny_sam_pt(upload_chunk=6)  # encode chunk is 4
        with pytest.raises(AssertionError):
            model.forward(video)
