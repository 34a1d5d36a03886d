"""End-to-end orchestrator tests on tiny random models.

Checks the forward contract the reference asserts at runtime
(sam_pt/modeling/sam_pt.py:222-226) plus prompt-assembly semantics.
"""
import jax
import numpy as np
import pytest

from sam_pt_tpu.utils.testing import build_tiny_sam_pt
from sam_pt_tpu.utils.util import PointVisibilityType


@pytest.fixture(scope="module")
def model():
    return build_tiny_sam_pt()


def make_video(t=5, h=48, w=64, with_masks=True, n_masks=2):
    rng = np.random.default_rng(3)
    video = {
        "video_name": "synthetic",
        "video_id": 0,
        "image": rng.integers(0, 255, size=(t, h, w, 3)).astype(np.uint8),
        "target_hw": (h, w),
    }
    if with_masks:
        masks = np.zeros((n_masks, h, w), np.float32)
        masks[0, 10:25, 8:30] = 1
        masks[1, 28:45, 35:60] = 1
        video["query_masks"] = masks
        video["query_point_timestep"] = np.zeros((n_masks,), np.float32)
    else:
        video["query_points"] = np.array(
            [[[0, 15.0, 16.0], [0, 20.0, 18.0], [0, 25.0, 20.0],
              [0, 18.0, 14.0], [0, 40.0, 40.0]]], np.float32
        )
    return video


class TestForwardContract:
    def test_query_masks_path(self, model):
        video = make_video(with_masks=True)
        out = model.forward(video)
        t, h, w = 5, 48, 64
        m, p = 2, 5  # 4 positive + 1 negative
        assert len(out["logits"]) == m
        assert out["logits"][0].shape == (t, h, w)
        assert out["trajectories"].shape == (t, m, p, 2)
        assert out["visibilities"].shape == (t, m, p)
        assert len(out["scores"]) == m
        # query-frame trajectory must hold the query points
        assert np.isfinite(out["trajectories"]).all()

    def test_query_points_path(self, model):
        video = make_video(with_masks=False)
        out = model.forward(video)
        assert len(out["logits"]) == 1
        assert out["logits"][0].shape == (5, 48, 64)

    def test_target_hw_resize(self, model):
        video = make_video(with_masks=True)
        video["target_hw"] = (96, 128)
        out = model.forward(video)
        assert out["logits"][0].shape == (5, 96, 128)
        # trajectories are reported in the 2x-scaled target frame: clearly
        # larger than the 48x64 source extent, bounded by the target extent
        # plus a small off-frame drift margin (random-weight tracker)
        assert out["trajectories"].max() > 66
        assert out["trajectories"].max() <= 160


class TestPromptAssembly:
    def test_labels_and_padding(self, model):
        t, m, p = 3, 2, 5
        traj = np.zeros((t, m, p, 2), np.float32)
        vis = np.ones((t, m, p), np.float32)
        vis[1, 0, 2] = 0.0  # invisible -> pad label
        vis[2, 1, 4] = float(PointVisibilityType.OUTSIDE_FRAME)
        pts, lbl = model._build_prompts(traj, vis)
        assert lbl.shape == (t, m, p)
        assert lbl[0, 0, 0] == 1  # visible positive
        assert lbl[0, 0, 4] == 0  # visible negative (tail point)
        assert lbl[1, 0, 2] == -1  # invisible -> padding
        assert lbl[2, 1, 4] == -1  # OOB -> padding

    def test_other_objects_negatives(self, model):
        model.add_other_objects_positive_points_as_negative_points = True
        try:
            t, m, p = 2, 3, 5
            traj = np.arange(t * m * p * 2, dtype=np.float32).reshape(t, m, p, 2)
            vis = np.ones((t, m, p), np.float32)
            pts, lbl = model._build_prompts(traj, vis)
            n_pos = model.positive_points_per_mask
            extra = (m - 1) * n_pos
            assert pts.shape == (t, m, p + extra, 2)
            assert (lbl[:, :, p:] == 0).all()  # all others visible -> negatives
            # mask 0's extra points come from masks 1 and 2 positives
            np.testing.assert_allclose(
                pts[0, 0, p : p + n_pos], traj[0, 1, :n_pos]
            )
        finally:
            model.add_other_objects_positive_points_as_negative_points = False


class TestReinit:
    @pytest.mark.parametrize("variant", [
        "reinit-on-horizon-and-sync-masks",
        "reinit-at-median-of-area-diff",
        "reinit-on-similar-mask-area",
        "reinit-on-similar-mask-area-and-sync-masks",
    ])
    def test_reinit_variants_contract(self, variant):
        model = build_tiny_sam_pt(
            use_point_reinit=True,
            reinit_point_tracker_horizon=4,
            reinit_horizon=3,
            reinit_variant=variant,
        )
        video = make_video(t=7, with_masks=True)
        out = model.forward(video)
        t, h, w = 7, 48, 64
        assert len(out["logits"]) == 2
        assert out["logits"][0].shape == (t, h, w)
        assert np.isfinite(out["trajectories"]).all()
        assert out["visibilities"].shape[0] == t


class TestReinitMidVideoQuery:
    def test_bidirectional_stitch_with_nonzero_timestep(self):
        """Queries at a mid-video frame exercise the BACKWARD (flipped)
        direction and the stitch — including the device-reversed shared
        embeddings path (the backward pass is skipped entirely when every
        query starts at frame 0)."""
        model = build_tiny_sam_pt(
            use_point_reinit=True,
            reinit_point_tracker_horizon=4,
            reinit_horizon=3,
        )
        t, h, w = 7, 48, 64
        video = make_video(t=t, with_masks=True)
        video["query_point_timestep"] = np.full((2,), 3.0, np.float32)
        out = model.forward(video)
        assert len(out["logits"]) == 2
        assert out["logits"][0].shape == (t, h, w)
        assert np.isfinite(out["trajectories"]).all()
        # frames strictly before the query frame come from the backward
        # pass; they must be populated (not NaN/zero-visibility everywhere)
        vis = np.asarray(out["visibilities"])
        assert vis[:3].shape == (3, 2, vis.shape[2])
        assert np.isfinite(np.stack(out["scores_per_frame"])).any()


class TestReinitFailure:
    def test_empty_masks_mark_reinit_failed(self):
        """When every candidate reinit mask in a horizon window is empty,
        the object must be marked REINIT_FAILED (points pushed past the
        video end, -inf logits) instead of being silently re-tracked from
        degenerate query points. OPT-IN extension: the reference authored
        this branch (sam_pt.py:508-539) but its trigger is dead code there
        (NaN <= 0 is False in torch), so parity default is off."""
        model = build_tiny_sam_pt(
            use_point_reinit=True,
            reinit_point_tracker_horizon=4,
            reinit_horizon=3,
            reinit_variant="reinit-at-median-of-area-diff",
            fail_on_empty_reinit_mask=True,
        )
        t, h, w = 7, 48, 64
        video = make_video(t=t, h=h, w=w, with_masks=True)

        def empty_apply_sam(images, traj, vis, embeddings=None,
                            device_images=None):
            m = traj.shape[1]
            ti = np.asarray(images).shape[0]
            logits = np.full((m, ti, h, w), -10.0, np.float32)
            spf = np.full((ti, m), 0.1, np.float32)
            return np.full((m,), 0.1), logits, spf

        model._apply_sam = empty_apply_sam
        out = model.forward(video)

        vis = np.asarray(out["visibilities"])  # [t, m, p]
        horizon_end = 3  # first window = frames [0, 3)
        assert (
            vis[horizon_end:] == float(PointVisibilityType.REINIT_FAILED)
        ).all(), "frames past the failed window must be REINIT_FAILED"
        logits = np.stack([np.asarray(l) for l in out["logits"]])  # [m,t,h,w]
        assert (logits[:, horizon_end:] < 0).all()


class TestPatchSimilarities:
    def test_matches_per_pair_reference(self):
        """sim[t, i] = exp(-||patch(lab_t, traj[t,i]) - patch(lab_{q_t(i)},
        qp_xy(i))|| / (2 p^2)) — checks the template patch is taken from each
        point's own query frame (BGR->LAB per the reference quirk)."""
        import jax.numpy as jnp
        from sam_pt_tpu.models.sam_pt import _patch_similarities_jit
        from sam_pt_tpu.ops.color import rgb_to_lab
        from sam_pt_tpu.ops.sampling import patch_sample

        rng = np.random.default_rng(11)
        t, h, w, n, ps = 4, 24, 32, 5, 3
        images = rng.integers(0, 255, size=(t, h, w, 3)).astype(np.uint8)
        traj = rng.uniform([2, 2], [w - 3, h - 3], (t, n, 2)).astype(
            np.float32)
        qp = np.concatenate(
            [rng.integers(0, t, (n, 1)).astype(np.float32),
             traj[0, :, :]], axis=1).astype(np.float32)

        got = np.asarray(_patch_similarities_jit(
            jnp.asarray(images), jnp.asarray(traj), jnp.asarray(qp), ps))

        lab = np.asarray(rgb_to_lab(jnp.asarray(images[..., ::-1])))
        for i in range(n):
            qt = int(qp[i, 0])
            q_patch = np.asarray(patch_sample(
                jnp.asarray(lab[qt]), jnp.asarray(qp[None, i, 1:]), ps))[0]
            for ti in range(t):
                t_patch = np.asarray(patch_sample(
                    jnp.asarray(lab[ti]), jnp.asarray(traj[None, ti, i]),
                    ps))[0]
                ref = np.exp(
                    -np.linalg.norm((t_patch - q_patch).ravel())
                    / (2 * ps ** 2))
                np.testing.assert_allclose(got[ti, i], ref, rtol=1e-4,
                                           atol=1e-5)


class TestDeterminism:
    def test_forward_is_deterministic(self):
        """Same video + fresh identically-seeded models -> identical outputs
        (the reference relies on seed_all + re-seeding, SURVEY.md §4.6)."""
        video = make_video(with_masks=True)
        out1 = build_tiny_sam_pt().forward(dict(video))
        out2 = build_tiny_sam_pt().forward(dict(video))
        np.testing.assert_array_equal(out1["trajectories"], out2["trajectories"])
        for a, b in zip(out1["logits"], out2["logits"]):
            np.testing.assert_array_equal(a, b)


class TestDeviceFlow:
    """The fully device-resident fast path (_use_device_flow) must match the
    host path's outputs: same logits decisions, same scores."""

    def test_device_flow_matches_host_flow(self, rng):
        from sam_pt_tpu.models.sam_pt import SamPt
        from sam_pt_tpu.models.tracker.cotracker.model import CoTracker
        from sam_pt_tpu.models.tracker.cotracker.tracker import (
            CoTrackerPointTracker,
        )
        from sam_pt_tpu.utils.testing import build_tiny_sam

        h, w, t = 48, 64, 6
        tracker = CoTrackerPointTracker(
            interp_shape=(32, 40), visibility_threshold=0.5,
            support_grid_size=0, s=4, stride=4, iters=2,
        )
        tracker.model = CoTracker(s=4, stride=4, latent_dim=16, input_dim=456,
                                  hidden_size=32, num_heads=2, space_depth=1,
                                  time_depth=2)
        tracker.init_params(jax.random.PRNGKey(0), 32, 40)

        from sam_pt_tpu.models.sam.predictor import SamPredictor

        sam_model, sam_params = build_tiny_sam(64)
        predictor = SamPredictor(sam_model, sam_params)

        def build(**kw):
            return SamPt(
                point_tracker=tracker,
                sam_predictor=predictor,
                positive_points_per_mask=3,
                negative_points_per_mask=1,
                positive_point_selection_method="random",
                negative_point_selection_method="random",
                add_other_objects_positive_points_as_negative_points=True,
                iterative_refinement_iterations=2,
                sam_decode_chunk=8,
                seed=7,
                **kw,
            )

        masks = np.zeros((2, h, w), np.float32)
        masks[0, 8:22, 6:28] = 1
        masks[1, 26:44, 34:60] = 1
        video = {
            "image": rng.integers(0, 255, size=(t, h, w, 3)).astype(np.uint8),
            "target_hw": (h, w),
            "query_masks": masks,
            "query_point_timestep": np.zeros((2,), np.float32),
        }

        host = build().forward(dict(video))
        sam_pt_dev = build()
        dev = sam_pt_dev.forward(
            dict(video, keep_logits_on_device=True)
        )
        assert sam_pt_dev._use_device_flow()

        host_logits = np.stack(host["logits"])  # [M, T, h, w] f32
        dev_logits = np.asarray(dev["logits"], np.float32)
        # identical decisions and near-identical logits (f16 download)
        np.testing.assert_array_equal(host_logits > 0, dev_logits > 0)
        finite = np.isfinite(host_logits)
        np.testing.assert_allclose(
            dev_logits[finite], host_logits[finite], atol=0.05, rtol=0.02)
        np.testing.assert_allclose(
            np.asarray(dev["scores"], np.float64), np.asarray(host["scores"]),
            rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(dev["trajectories"]), np.asarray(host["trajectories"]),
            rtol=1e-4, atol=1e-4)


class TestBlankedLogitsResize:
    def test_gated_planes_stay_neg_inf_through_target_hw_resize(self, rng):
        """Pairs gated by sam_iou_threshold get whole-plane -inf sentinel
        logits, and the target_hw resize must keep them cleanly -inf — the
        reference's exact sentinel (sam_pt/modeling/sam_pt.py gating;
        its F.interpolate leaves NaN stripes on such planes instead, a
        documented benign deviation — tests/test_parity_sam_pt_e2e.py) —
        and the downstream device fusion must still produce pure background
        without NaN poisoning."""
        from sam_pt_tpu.utils.testing import build_tiny_sam_pt
        from sam_pt_tpu.vos_eval.eval import device_fuse_index_masks

        model = build_tiny_sam_pt(sam_iou_threshold=2.0)  # gate EVERYTHING
        t, h, w = 3, 48, 64
        masks = np.zeros((2, h, w), np.float32)
        masks[0, 10:30, 10:30] = 1
        masks[1, 20:40, 35:60] = 1
        out = model.forward({
            "image": rng.integers(0, 255, size=(t, h, w, 3)).astype(np.uint8),
            "target_hw": (h * 2, w * 2),  # force the resize path
            "query_masks": masks,
            "query_point_timestep": np.zeros((2,), np.float32),
        })
        logits = np.stack(out["logits"])
        assert logits.shape == (2, t, h * 2, w * 2)
        assert np.isneginf(logits).all()

        # -inf planes through fusion: GT overwrite at the query frame,
        # pure background elsewhere, no NaNs
        masks_up = masks.repeat(2, axis=1).repeat(2, axis=2)
        fused = np.asarray(
            device_fuse_index_masks(logits, masks_up, [0, 0]))
        assert fused.shape == (t, h * 2, w * 2)
        np.testing.assert_array_equal(
            fused[0], (masks_up[0] > 0) * 1 + (masks_up[1] > 0) * 2)
        assert (fused[1:] == 0).all()
