"""Real-weights regression gate (VERDICT r2, "Next round" item 9).

This environment has no egress, so the public reference checkpoints and
DAVIS data are unreachable and every test here SKIPS cleanly. The moment
weights/data are placed at the documented paths (docs/03, docs/02), the
J&F-parity gate runs with ZERO new code:

    # converter smoke for every available checkpoint family
    python -m pytest tests/test_real_weights.py -q

    # one-video DAVIS J&F with ViT-H + PIPS (BASELINE.md: mean 76.65 over
    # the 30-video val split; per-video values vary widely, so this gate
    # asserts sanity and REPORTS the value for manual parity comparison)
    python -m pytest tests/test_real_weights.py -k jf -q -s

On real TPU hardware, bypass the CPU-forcing conftest with:
    JAX_PLATFORMS='' SAM_PT_TEST_PLATFORM=native python -m pytest ...
(see conftest.py; the CPU tier still runs everything, just slowly).
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODELS = os.path.join(REPO, "models")
DAVIS17 = os.path.join(REPO, "data", "DAVIS", "2017", "trainval")


def _first_existing(*patterns):
    import glob

    for p in patterns:
        hits = sorted(glob.glob(os.path.join(MODELS, p)))
        if hits:
            return hits[0]
    return None


def _need(path, what):
    if path is None or not os.path.exists(path):
        pytest.skip(f"{what} checkpoint not present under models/ "
                    "(no egress in CI; see docs/03-prepare-checkpoints.md)")
    return path


class TestConverterSmoke:
    """Convert each real checkpoint and run a minimal forward."""

    def test_sam_vit(self):
        path = _need(_first_existing("sam_ckpts/sam_vit_b_*.pth",
                                     "sam_ckpts/sam_vit_l_*.pth",
                                     "sam_ckpts/sam_vit_h_*.pth"), "SAM ViT")
        variant = "vit_" + os.path.basename(path).split("_")[2]
        from sam_pt_tpu.models.sam.factory import build_predictor

        predictor = build_predictor(variant=variant, checkpoint=path)
        import jax.numpy as jnp

        emb = predictor.encode_frames(
            jnp.zeros((1, 256, 256, 3), jnp.uint8), (256, 256))
        emb = np.asarray(emb)
        assert np.isfinite(emb).all()

    def test_hq_sam(self):
        path = _need(_first_existing("sam_hq_ckpts/sam_hq_vit_*.pth"),
                     "HQ-SAM")
        from sam_pt_tpu.utils.checkpoint import load_sam_checkpoint

        params = load_sam_checkpoint(path)
        assert params

    def test_mobile_sam(self):
        path = _need(_first_existing("mobile_sam_ckpts/mobile_sam.pt"),
                     "MobileSAM")
        from sam_pt_tpu.utils.checkpoint import load_sam_checkpoint

        params = load_sam_checkpoint(path)
        assert params

    def _smoke_tracker(self, tracker, t=8, h=64, w=64, n=4):
        rng = np.random.default_rng(0)
        video = rng.integers(0, 255, size=(1, t, h, w, 3)).astype(np.uint8)
        qp = np.array([[[0, 10.0, 12.0], [0, 30.0, 20.0],
                        [0, 40.0, 40.0], [0, 20.0, 30.0]]], np.float32)
        traj, vis = tracker.forward(video, qp[:, :n])
        assert np.isfinite(np.asarray(traj)).all()

    def test_pips(self):
        path = _need(_first_existing("pips_ckpts/reference_model"), "PIPS")
        from sam_pt_tpu.models.tracker.pips.tracker import PipsPointTracker

        self._smoke_tracker(PipsPointTracker(checkpoint_path=path))

    def test_cotracker(self):
        path = _need(
            _first_existing("cotracker_ckpts/cotracker_stride_4_wind_8.pth"),
            "CoTracker")
        from sam_pt_tpu.models.tracker.cotracker.tracker import (
            CoTrackerPointTracker,
        )

        self._smoke_tracker(CoTrackerPointTracker(checkpoint_path=path))

    def test_tapir(self):
        path = _need(
            _first_existing("tapir_ckpts/tapir_checkpoint_panning.npy"),
            "TAPIR")
        from sam_pt_tpu.models.tracker.tapir.tracker import TapirPointTracker

        self._smoke_tracker(TapirPointTracker(checkpoint_path=path))

    def test_raft(self):
        path = _need(_first_existing("raft_ckpts/raft-things.pth"), "RAFT")
        from sam_pt_tpu.models.tracker.raft.tracker import RaftPointTracker

        self._smoke_tracker(RaftPointTracker(checkpoint_path=path))


class TestDavisJF:
    def test_one_video_jf(self):
        """ViT-H + PIPS on ONE DAVIS 2017 val video, scored with the native
        J&F implementation. BASELINE.md parity line: 76.65 J&F-Mean over the
        full split (reference docs/04:75); per-video spread is wide, so the
        automated assertion is a sanity floor (random weights score < 10)
        and the exact value is printed + dumped for the parity comparison.
        """
        sam_path = _need(_first_existing("sam_ckpts/sam_vit_h_*.pth"),
                         "SAM ViT-H")
        pips_path = _need(_first_existing("pips_ckpts/reference_model"),
                          "PIPS")
        if not os.path.isdir(DAVIS17):
            pytest.skip("DAVIS 2017 trainval not present under data/ "
                        "(see docs/02-prepare-datasets.md)")

        from PIL import Image

        from sam_pt_tpu.models.sam.factory import build_predictor
        from sam_pt_tpu.models.sam_pt import SamPt
        from sam_pt_tpu.models.tracker.pips.tracker import PipsPointTracker
        from sam_pt_tpu.vos_eval.data.test_datasets import DAVISTestDataset
        from sam_pt_tpu.vos_eval.metrics import (
            db_eval_boundary,
            db_eval_iou,
            db_statistics,
        )

        model = SamPt(
            point_tracker=PipsPointTracker(checkpoint_path=pips_path),
            sam_predictor=build_predictor(variant="vit_h",
                                          checkpoint=sam_path),
            # reference defaults (configs/model/sam_pt.yaml)
            sam_iou_threshold=0.7,
            positive_point_selection_method="kmedoids",
            negative_point_selection_method="mixed",
            positive_points_per_mask=8,
            negative_points_per_mask=1,
            iterative_refinement_iterations=12,
        )

        dataset = DAVISTestDataset(DAVIS17, imset="2017/val.txt", size=480)
        reader = next(iter(dataset.get_datasets()))
        frames, first_mask = [], None
        for item in reader:
            frames.append(item["rgb"])
            if first_mask is None and item.get("mask") is not None:
                first_mask = np.asarray(item["mask"])
        video_frames = np.stack(frames)
        labels = [int(l) for l in np.unique(first_mask) if l != 0]
        query_masks = np.stack(
            [(first_mask == l).astype(np.float32) for l in labels])
        # score at the GT's native resolution, like the harness
        gt_dir = os.path.join(DAVIS17, "Annotations", "480p", reader.vid_name)
        gt0 = np.array(Image.open(
            os.path.join(gt_dir, sorted(os.listdir(gt_dir))[0])))
        out = model.forward({
            "image": video_frames,
            "target_hw": gt0.shape[:2],
            "query_masks": query_masks,
            "query_point_timestep": np.zeros(len(labels), np.float32),
        })

        # Score J&F of mask 0 against the GT annotations
        gts, preds = [], []
        for fi, name in enumerate(sorted(os.listdir(gt_dir))):
            gt = np.array(Image.open(os.path.join(gt_dir, name)))
            gts.append((gt == labels[0]).astype(np.uint8))
            preds.append(
                (np.asarray(out["logits"][0][fi]) > 0).astype(np.uint8))
        gts, preds = np.stack(gts), np.stack(preds)
        j = db_statistics(db_eval_iou(gts, preds))[0]
        f = db_statistics(db_eval_boundary(gts, preds))[0]
        jf = 100 * (j + f) / 2
        print(f"\nDAVIS one-video J&F = {jf:.2f} (J {100*j:.2f} F {100*f:.2f})"
              f" — compare against BASELINE.md 76.65 split mean")
        out_dir = os.path.join(REPO, "outputs")
        os.makedirs(out_dir, exist_ok=True)
        import json

        with open(os.path.join(out_dir, "real_weights_jf.json"), "w") as fh:
            json.dump({"video": reader.vid_name,
                       "jf": jf, "j": 100 * j, "f": 100 * f}, fh)
        assert jf > 10.0, "real weights must massively beat random (~0-5)"
