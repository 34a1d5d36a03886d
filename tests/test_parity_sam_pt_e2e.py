"""End-to-end composed-pipeline parity vs the REFERENCE torch `SamPt`.

Every component (SAM stack, trackers, samplers, ops) has its own numerical
oracle; this suite runs the COMPOSITION side by side with the reference
orchestrator (/root/reference/sam_pt/modeling/sam_pt.py:122-236): visible
-point selection order, negative-point two-pass chaining, other-object
negatives, iterative box refinement, patch-similarity filtering + cascade
rejection, IoU gating, scoring, reinit windowing and bidirectional
stitching — the exact surface where silent deviations survive
component-level tests (VERDICT.md round 2, "Next round" item 1).

Both stacks share: the same torch SAM weights (the repo side through the
converter, fp32), a deterministic bit-identical fake tracker, and a
deterministic sampler — so any output difference is an orchestration
deviation (up to fp32 accumulation noise).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

pytestmark = pytest.mark.slow

from e2e_reference_stack import build_reference_sam_pt, fake_track  # noqa: E402
from tiny_hf_sam import IMAGE_SIZE, build_tiny_hf_and_flax  # noqa: E402

T, H, W = 7, IMAGE_SIZE, IMAGE_SIZE


@pytest.fixture(scope="module")
def stack():
    hf, flax_model, flax_params = build_tiny_hf_and_flax(seed=1)
    return hf, flax_model, flax_params


def make_video(t=T, n_masks=2, qts=None, seed=7):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 255, size=(t, H, W, 3)).astype(np.uint8)
    masks = np.zeros((n_masks, H, W), np.float32)
    masks[0, 10:30, 8:30] = 1
    if n_masks > 1:
        masks[1, 30:55, 35:60] = 1
    if qts is None:
        qts = np.zeros((n_masks,), np.float32)
    return frames, masks, np.asarray(qts, np.float32)


def build_our_sam_pt(flax_model, flax_params, **flags):
    from sam_pt_tpu.models.sam.predictor import SamPredictor
    from sam_pt_tpu.models.sam_pt import SamPt
    from e2e_reference_stack import det_extract_query_points
    from sam_pt_tpu.models.tracker.api import PointTracker

    class OurFakeTracker(PointTracker):
        def forward(self, rgbs, query_points):
            b, t = rgbs.shape[0], rgbs.shape[1]
            h, w = rgbs.shape[2], rgbs.shape[3]
            assert b == 1
            traj, vis = fake_track(np.asarray(query_points)[0], t, h, w)
            return traj[None], vis[None]

    class OurSamPtDet(SamPt):
        def extract_query_points(self, images, query_masks, timesteps):
            return det_extract_query_points(
                np.asarray(query_masks), np.asarray(timesteps),
                self.positive_points_per_mask, self.negative_points_per_mask,
            )

    defaults = dict(
        sam_iou_threshold=-100.0,
        positive_point_selection_method="det",
        negative_point_selection_method="det",
        positive_points_per_mask=4,
        negative_points_per_mask=1,
        add_other_objects_positive_points_as_negative_points=False,
        max_other_objects_positive_points=None,
        point_tracker_mask_batch_size=8,
        iterative_refinement_iterations=0,
        use_patch_matching_filtering=False,
        patch_size=3,
        patch_similarity_threshold=0.01,
        use_point_reinit=False,
        reinit_point_tracker_horizon=24,
        reinit_horizon=24,
        reinit_variant="reinit-at-median-of-area-diff",
        logits_dtype="float32",  # bit-level audit: no fp16 transfer rounding
        sam_decode_chunk=16,
        sam_encode_chunk=4,
    )
    defaults.update(flags)
    return OurSamPtDet(
        point_tracker=OurFakeTracker(),
        sam_predictor=SamPredictor(flax_model, flax_params),
        **defaults,
    )


def run_reference(hf, frames, masks, qts, target_hw=None, query_points=None,
                  **flags):
    model = build_reference_sam_pt(hf, IMAGE_SIZE, **flags).eval()
    video = {
        "video_name": "e2e",
        "video_id": 0,
        "image": [torch.from_numpy(f.transpose(2, 0, 1).copy())
                  for f in frames],
        "target_hw": target_hw or (H, W),
    }
    if query_points is not None:
        video["query_points"] = torch.from_numpy(query_points)
    else:
        video["query_masks"] = torch.from_numpy(masks)
        video["query_point_timestep"] = torch.from_numpy(qts)
    with torch.no_grad():
        return model.forward(video)


def run_ours(stack, frames, masks, qts, target_hw=None, query_points=None,
             **flags):
    _, flax_model, flax_params = stack
    model = build_our_sam_pt(flax_model, flax_params, **flags)
    video = {
        "video_name": "e2e",
        "video_id": 0,
        "image": frames,
        "target_hw": target_hw or (H, W),
    }
    if query_points is not None:
        video["query_points"] = query_points
    else:
        video["query_masks"] = masks
        video["query_point_timestep"] = qts
    return model.forward(video)


def assert_outputs_match(ref, ours, logits_atol=6e-3, score_atol=3e-3):
    ref_logits = np.stack([m.numpy() for m in ref["logits"]])
    our_logits = np.stack([np.asarray(m, np.float32) for m in ours["logits"]])
    # Documented benign deviation: when target_hw != source resolution the
    # reference F.interpolate's zero-weight border taps turn -inf sentinel
    # planes into NaN stripes (0 * inf; verified: 255 NaN px per 64->128
    # plane). Our resize keeps those planes cleanly -inf. Normalize the
    # reference artifact before comparing.
    ref_logits = np.where(np.isnan(ref_logits), -np.inf, ref_logits)
    assert ref_logits.shape == our_logits.shape
    # -inf sentinel placement must be IDENTICAL (empty-prompt frames, IoU
    # gating, reinit failure) — np.allclose treats equal infs as equal but
    # we want a crisp error for placement mismatches
    ref_inf = np.isneginf(ref_logits)
    our_inf = np.isneginf(our_logits)
    np.testing.assert_array_equal(ref_inf, our_inf)
    np.testing.assert_allclose(
        our_logits[~our_inf], ref_logits[~ref_inf], atol=logits_atol)

    ref_traj = np.asarray(ref["trajectories"])
    np.testing.assert_allclose(
        np.asarray(ours["trajectories"]), ref_traj, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(ours["visibilities"]), np.asarray(ref["visibilities"]))

    ref_spf = np.asarray(ref["scores_per_frame"], np.float64)
    our_spf = np.asarray(ours["scores_per_frame"], np.float64)
    inf_mask = np.isneginf(ref_spf)
    np.testing.assert_array_equal(np.isneginf(our_spf), inf_mask)
    np.testing.assert_allclose(
        our_spf[~inf_mask], ref_spf[~inf_mask], atol=score_atol)

    ref_scores = np.asarray(ref["scores"], np.float64)
    our_scores = np.asarray(ours["scores"], np.float64)
    sc_inf = np.isneginf(ref_scores)
    np.testing.assert_array_equal(np.isneginf(our_scores), sc_inf)
    np.testing.assert_allclose(
        our_scores[~sc_inf], ref_scores[~sc_inf], atol=score_atol)


FLAG_MATRIX = {
    "neg-chain": dict(),
    "no-negatives": dict(negative_points_per_mask=0),
    "other-objects": dict(
        add_other_objects_positive_points_as_negative_points=True),
    "box-refine": dict(iterative_refinement_iterations=2),
    "patch-filter": dict(use_patch_matching_filtering=True),
    "all-on": dict(
        add_other_objects_positive_points_as_negative_points=True,
        iterative_refinement_iterations=2,
        use_patch_matching_filtering=True,
    ),
}


class TestPlainForwardParity:
    @pytest.mark.parametrize("name", list(FLAG_MATRIX))
    def test_flags(self, stack, name):
        flags = FLAG_MATRIX[name]
        frames, masks, qts = make_video()
        ref = run_reference(stack[0], frames, masks, qts, **flags)
        ours = run_ours(stack, frames, masks, qts, **flags)
        assert_outputs_match(ref, ours)


REINIT_VARIANTS = [
    "reinit-on-horizon-and-sync-masks",
    "reinit-at-median-of-area-diff",
    "reinit-on-similar-mask-area",
    "reinit-on-similar-mask-area-and-sync-masks",
]


class TestReinitParity:
    @pytest.mark.parametrize("variant", REINIT_VARIANTS)
    def test_variants(self, stack, variant):
        flags = dict(
            use_point_reinit=True,
            reinit_point_tracker_horizon=4,
            reinit_horizon=3,
            reinit_variant=variant,
            iterative_refinement_iterations=1,
        )
        frames, masks, qts = make_video(t=9)
        ref = run_reference(stack[0], frames, masks, qts, **flags)
        ours = run_ours(stack, frames, masks, qts, **flags)
        assert_outputs_match(ref, ours)

    def test_bidirectional_stitch_mid_video_query(self, stack):
        """Mid-video query timesteps drive BOTH temporal directions and the
        per-mask stitch (reference :355-408)."""
        flags = dict(
            use_point_reinit=True,
            reinit_point_tracker_horizon=4,
            reinit_horizon=3,
        )
        frames, masks, qts = make_video(t=9, qts=[3.0, 3.0])
        ref = run_reference(stack[0], frames, masks, qts, **flags)
        ours = run_ours(stack, frames, masks, qts, **flags)
        assert_outputs_match(ref, ours)


class TestAuxPathParity:
    def test_query_points_path(self, stack):
        """`query_points` input: SAM extracts the query masks (:308-335)."""
        qp = np.array(
            [[[0, 15.0, 16.0], [0, 20.0, 18.0], [0, 25.0, 20.0],
              [0, 18.0, 14.0], [0, 50.0, 50.0]]], np.float32
        )
        frames, masks, qts = make_video(n_masks=1)
        ref = run_reference(stack[0], frames, masks, qts, query_points=qp,
                            negative_points_per_mask=1)
        ours = run_ours(stack, frames, masks, qts, query_points=qp,
                        negative_points_per_mask=1)
        assert_outputs_match(ref, ours)

    def test_target_hw_upscale(self, stack):
        """2x isotropic target_hw exercises the final logits interpolation
        and trajectory scaling (:201-207)."""
        frames, masks, qts = make_video()
        target = (2 * H, 2 * W)
        ref = run_reference(stack[0], frames, masks, qts, target_hw=target)
        ours = run_ours(stack, frames, masks, qts, target_hw=target)
        assert_outputs_match(ref, ours)

    def test_iou_gating(self, stack):
        """IoU-threshold gating blanks low-scoring frames to -inf (:833-835).
        The threshold is placed at the largest gap between the reference's
        observed per-frame IoUs so fp noise cannot flip a decision."""
        frames, masks, qts = make_video()
        probe = run_reference(stack[0], frames, masks, qts)
        spf = np.asarray(probe["scores_per_frame"], np.float64).ravel()
        finite = np.sort(spf[np.isfinite(spf)])
        assert len(finite) >= 4
        gaps = np.diff(finite)
        k = int(np.argmax(gaps[1:-1])) + 1  # interior gap: gates some frames
        thr = float((finite[k] + finite[k + 1]) / 2)
        ref = run_reference(stack[0], frames, masks, qts,
                            sam_iou_threshold=thr)
        ours = run_ours(stack, frames, masks, qts, sam_iou_threshold=thr)
        ref_logits = np.stack([m.numpy() for m in ref["logits"]])
        assert np.isneginf(ref_logits).any()  # gating actually fired
        assert_outputs_match(ref, ours)
