"""VOS evaluation stack tests: metrics, mask mapper, synthetic end-to-end."""
import os
from os import path

import numpy as np
import pytest
from PIL import Image

from sam_pt_tpu.vos_eval.metrics import (
    db_eval_boundary,
    db_eval_iou,
    db_statistics,
)
from sam_pt_tpu.vos_eval.data.mask_mapper import MaskMapper


class TestMetrics:
    def test_iou_basic(self):
        a = np.zeros((10, 10), bool)
        b = np.zeros((10, 10), bool)
        a[2:6, 2:6] = True
        assert db_eval_iou(a, a) == 1.0
        assert db_eval_iou(a, b) == 0.0
        b[2:6, 2:8] = True  # 16 inter, 24 union
        np.testing.assert_allclose(db_eval_iou(a, b), 16 / 24)
        # both empty -> 1 (DAVIS convention)
        assert db_eval_iou(np.zeros((5, 5)), np.zeros((5, 5))) == 1.0

    def test_boundary_perfect_and_disjoint(self):
        a = np.zeros((32, 32), bool)
        a[8:20, 8:20] = True
        assert db_eval_boundary(a, a) == 1.0
        b = np.zeros((32, 32), bool)
        b[25:30, 25:30] = True
        assert db_eval_boundary(a, b) == 0.0
        # empty prediction vs non-empty gt -> 0; both empty -> 1
        assert db_eval_boundary(a, np.zeros((32, 32), bool)) == 0.0
        assert db_eval_boundary(
            np.zeros((32, 32), bool), np.zeros((32, 32), bool)
        ) == 1.0

    def test_boundary_tolerance(self):
        # 1-pixel shift within the dilation tolerance -> near-perfect F
        a = np.zeros((100, 100), bool)
        a[20:60, 20:60] = True
        b = np.roll(a, 1, axis=0)
        assert db_eval_boundary(a, b) > 0.95

    def test_statistics(self):
        vals = np.array([1.0, 1.0, 0.4, 0.4])
        m, o, d = db_statistics(vals)
        np.testing.assert_allclose(m, 0.7)
        np.testing.assert_allclose(o, 0.5)
        np.testing.assert_allclose(d, 0.6, atol=1e-6)


class TestMaskMapper:
    def test_noncontiguous_remap(self):
        mapper = MaskMapper()
        mask = np.zeros((8, 8), np.uint8)
        mask[0:2] = 3
        mask[4:6] = 7
        onehot, new_mapped = mapper.convert_mask(mask)
        assert onehot.shape == (2, 8, 8)
        assert not mapper.coherent
        assert sorted(new_mapped) == [1, 2]
        # round trip
        idx = np.zeros((8, 8), np.uint8)
        idx[0:2] = 1
        idx[4:6] = 2
        restored = mapper.remap_index_mask(idx)
        assert set(np.unique(restored)) == {0, 3, 7}

    def test_coherent_passthrough(self):
        mapper = MaskMapper()
        mask = np.zeros((4, 4), np.uint8)
        mask[0] = 1
        mask[1] = 2
        onehot, new_mapped = mapper.convert_mask(mask)
        assert mapper.coherent
        assert new_mapped == [1, 2]
        out = mapper.remap_index_mask(mask)
        np.testing.assert_array_equal(out, mask)


DAVIS_PALETTE = np.concatenate(
    [np.array([[0, 0, 0], [128, 0, 0], [0, 128, 0], [128, 128, 0]]),
     np.zeros((252, 3))], axis=0
).astype(np.uint8).flatten().tolist()


def fabricate_davis(root, n_videos=1, t=4, h=48, w=64):
    """Mini DAVIS-2017-style tree with moving-square GT."""
    rng = np.random.default_rng(5)
    names = []
    for v in range(n_videos):
        name = f"vid{v}"
        names.append(name)
        jd = path.join(root, "trainval", "JPEGImages", "480p", name)
        ad = path.join(root, "trainval", "Annotations", "480p", name)
        os.makedirs(jd)
        os.makedirs(ad)
        for ti in range(t):
            img = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
            Image.fromarray(img).save(path.join(jd, f"{ti:05d}.jpg"))
            mask = np.zeros((h, w), np.uint8)
            mask[10 + ti : 22 + ti, 8 + ti : 24 + ti] = 1
            mask[30:42, 40:60] = 2
            im = Image.fromarray(mask, mode="P")
            im.putpalette(DAVIS_PALETTE)
            im.save(path.join(ad, f"{ti:05d}.png"))
    iset = path.join(root, "trainval", "ImageSets", "2017")
    os.makedirs(iset)
    with open(path.join(iset, "val.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    return names


class TestEndToEndEval:
    def test_synthetic_davis(self, tmp_path):
        from sam_pt_tpu.vos_eval.eval import evaluate

        davis_root = tmp_path / "DAVIS2017"
        fabricate_davis(str(davis_root))

        cfg = {
            "seed": 72,
            "dataset": "D17",
            "split": "val",
            "size": 480,
            "longest_size": None,
            "d17_path": str(davis_root),
            "output": str(tmp_path / "out"),
            "save_all": False,
            "masks_batch_size": 100,
            "max_videos": None,
            "max_frames": None,
            "vid_ids": None,
            "score": True,
            "model": {
                "_target_": "sam_pt_tpu.utils.testing.build_tiny_sam_pt",
                "height": 48,
                "width": 64,
            },
        }
        results = evaluate(cfg)
        assert results["total_frames"] == 4
        assert "J&F-Mean" in results
        assert 0.0 <= results["J&F-Mean"] <= 1.0
        # output PNGs with palette exist
        outs = os.listdir(tmp_path / "out" / "vid0")
        assert len(outs) == 4

    def test_viz_overlapping_and_zip_artifacts(self, tmp_path):
        """visualize_results renders output/viz/<vid>.gif, the
        save_overlapping_masks fused-logits dump lands in the sibling
        overlapping/ dir (host-fusion path forced), and the results zip is
        created (reference eval.py:383-435 surfaces)."""
        from sam_pt_tpu.vos_eval.eval import evaluate

        davis_root = tmp_path / "DAVIS2017"
        fabricate_davis(str(davis_root))

        cfg = {
            "seed": 72,
            "dataset": "D17",
            "split": "val",
            "size": 480,
            "longest_size": None,
            "d17_path": str(davis_root),
            "output": str(tmp_path / "out"),
            "save_all": False,
            "masks_batch_size": 100,
            "max_videos": None,
            "max_frames": None,
            "vid_ids": None,
            "score": True,
            "visualize_results": True,
            "vid_ids_to_visualize": None,  # all videos
            "verbose_visualisations": True,
            "save_overlapping_masks": True,
            "model": {
                "_target_": "sam_pt_tpu.utils.testing.build_tiny_sam_pt",
                "height": 48,
                "width": 64,
            },
        }
        results = evaluate(cfg)
        assert "J&F-Mean" in results
        assert path.exists(tmp_path / "out" / "viz" / "vid0.gif")
        assert path.exists(tmp_path / "out" / "viz" / "vid0_input.gif")
        over = np.load(tmp_path / "overlapping" / "vid0" / "logits.npz")
        t, h, w = 4, 48, 64
        assert over["logits"].shape[0] == t
        assert over["logits"].shape[1] >= 2  # background + masks
        assert path.exists(tmp_path / "out.zip")

    def test_synthetic_davis_subset_scoring(self, tmp_path):
        """max_videos subset scoring lists sequences from the output dir —
        it must skip harness-owned dirs (logs/, Scores/) or the DAVIS
        evaluator crashes trying to open them as sequences."""
        from sam_pt_tpu.vos_eval.eval import evaluate

        davis_root = tmp_path / "DAVIS2017"
        fabricate_davis(str(davis_root))

        cfg = {
            "seed": 72,
            "dataset": "D17",
            "split": "val",
            "size": 480,
            "longest_size": None,
            "d17_path": str(davis_root),
            "output": str(tmp_path / "out"),
            "save_all": False,
            "masks_batch_size": 100,
            "max_videos": 1,
            "max_frames": None,
            "vid_ids": None,
            "score": True,
            "model": {
                "_target_": "sam_pt_tpu.utils.testing.build_tiny_sam_pt",
                "height": 48,
                "width": 64,
            },
        }
        results = evaluate(cfg)
        assert "J&F-Mean" in results
        assert 0.0 <= results["J&F-Mean"] <= 1.0

    def test_synthetic_davis_data_parallel(self, tmp_path):
        """The whole harness with the model sharded over the 8-device mesh
        (model.data_parallel=true) must match the unsharded scores."""
        from sam_pt_tpu.vos_eval.eval import evaluate

        davis_root = tmp_path / "DAVIS2017"
        fabricate_davis(str(davis_root))

        def run(dp, out):
            cfg = {
                "seed": 72,
                "dataset": "D17",
                "split": "val",
                "size": 480,
                "longest_size": None,
                "d17_path": str(davis_root),
                "output": str(tmp_path / out),
                "save_all": False,
                "masks_batch_size": 100,
                "max_videos": None,
                "max_frames": None,
                "vid_ids": None,
                "score": True,
                "model": {
                    "_target_": "sam_pt_tpu.utils.testing.build_tiny_sam_pt",
                    "height": 48,
                    "width": 64,
                    "data_parallel": dp,
                },
            }
            return evaluate(cfg)

        plain = run(False, "out_plain")
        sharded = run(True, "out_dp")
        assert sharded["J&F-Mean"] == pytest.approx(
            plain["J&F-Mean"], abs=1e-3)

    def test_scoring_on_perfect_prediction(self, tmp_path):
        """Copy GT as the 'result' -> J&F must be 1."""
        from sam_pt_tpu.vos_eval.davis2017eval import Davis2017Evaluator
        import shutil

        davis_root = tmp_path / "DAVIS2017"
        names = fabricate_davis(str(davis_root), t=6)
        res = tmp_path / "results"
        for name in names:
            shutil.copytree(
                davis_root / "trainval" / "Annotations" / "480p" / name,
                res / name,
            )
        df_global, df_seq = Davis2017Evaluator(
            results_path=str(res),
            davis_path=str(davis_root / "trainval"),
        ).evaluate()
        np.testing.assert_allclose(df_global["J&F-Mean"].iloc[0], 1.0)


def fabricate_bdd(root, t=4, h=48, w=64):
    """Mini BDD100K-VOS-style tree: val/{JPEGImages,Annotations}/seq0 with
    an object appearing mid-video (first-appearance semantics)."""
    rng = np.random.default_rng(9)
    jd = path.join(root, "val", "JPEGImages", "seq0")
    ad = path.join(root, "val", "Annotations", "seq0")
    os.makedirs(jd)
    os.makedirs(ad)
    for ti in range(t):
        img = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
        Image.fromarray(img).save(path.join(jd, f"{ti:07d}.jpg"))
        mask = np.zeros((h, w), np.uint8)
        mask[10:22, 8:24] = 1
        if ti >= 2:
            mask[30:42, 40:60] = 2  # appears at frame 2
        im = Image.fromarray(mask, mode="P")
        im.putpalette(DAVIS_PALETTE)
        im.save(path.join(ad, f"{ti:07d}.png"))


class TestBDD100K:
    def test_end_to_end_harness_with_autoscore(self, tmp_path):
        """Full evaluate() on a fabricated BDD tree: first-appearance GT
        handling (label 2 enters at frame 2) and the end-of-run BDD100K
        auto-scoring branch (reference eval.py:463-478)."""
        from sam_pt_tpu.vos_eval.eval import evaluate

        bdd_root = tmp_path / "bdd"
        fabricate_bdd(str(bdd_root))
        cfg = {
            "seed": 72,
            "dataset": "BDD100K",
            "split": "val",
            "size": 480,
            "longest_size": None,
            "bdd100k_path": str(bdd_root),
            "output": str(tmp_path / "out"),
            "save_all": True,
            "masks_batch_size": 100,
            "model": {
                "_target_": "sam_pt_tpu.utils.testing.build_tiny_sam_pt",
                "height": 48,
                "width": 64,
            },
        }
        results = evaluate(cfg)
        assert results["total_frames"] == 4
        # auto-scoring ran: per-object rows for both objects
        assert len(results["df_per_seq"]) == 2
        assert "J&F-Mean" in results["df_global"].columns


    def test_perfect_prediction_and_first_appearance(self, tmp_path):
        from sam_pt_tpu.vos_eval.bdd100keval import BDD100KEvaluator

        h, w, t = 48, 64, 5
        ann = tmp_path / "data" / "Annotations" / "seq0"
        res = tmp_path / "results" / "seq0"
        os.makedirs(ann)
        os.makedirs(res)
        rng = np.random.default_rng(0)
        for ti in range(t):
            mask = np.zeros((h, w), np.uint8)
            mask[10:30, 10:30] = 1           # object 1 visible from frame 0
            if ti >= 2:
                mask[35:45, 40:60] = 2       # object 2 appears at frame 2
            im = Image.fromarray(mask, mode="P")
            im.putpalette(DAVIS_PALETTE)
            im.save(ann / f"{ti:07d}.png")
            im.save(res / f"{ti:07d}.png")   # result == GT
        df_global, df_per_seq = BDD100KEvaluator(
            results_path=str(tmp_path / "results"),
            dataset_path=str(tmp_path / "data"),
            use_process_pool=False,
        ).evaluate()
        np.testing.assert_allclose(df_global["J&F-Mean"].iloc[0], 1.0)
        assert len(df_per_seq) == 2  # two objects


class TestDeviceFusionParity:
    def test_fusion_paths_agree_on_shared_logits(self, rng):
        """device_fuse_index_masks == host softmax+argmax on the same logits.

        (An end-to-end double-run comparison is tie-unstable under random
        weights: near-zero logits make the extra f16 quantization of the
        device path flip whole frames. Real checkpoints have O(10) logit
        margins, so fusion parity on shared logits is the meaningful check.)
        """
        import jax.numpy as jnp

        from sam_pt_tpu.vos_eval.eval import (
            device_fuse_index_masks,
            softmax_fuse,
        )

        m, t, h, w = 3, 5, 24, 32
        logits = (rng.standard_normal((m, t, h, w)) * 4).astype(np.float16)
        gt = (rng.uniform(size=(m, h, w)) > 0.5).astype(np.float32)
        gt_ts = [0, 2, 4]

        dev = device_fuse_index_masks(
            jnp.asarray(logits), gt, gt_ts, frame_chunk=2
        )

        host_logits = np.concatenate(
            [np.zeros((1, t, h, w), np.float32),
             logits.astype(np.float32)], 0
        ).transpose(1, 0, 2, 3)
        for i, ts in enumerate(gt_ts):
            host_logits[:ts, i + 1] = -1e8
            host_logits[ts, i + 1] = np.where(gt[i] > 0.5, 1e8, -1e8)
        host = softmax_fuse(host_logits).argmax(axis=1).astype(np.uint8)

        np.testing.assert_array_equal(np.asarray(dev), host)

    def test_fusion_packed_odd_width_and_many_objects(self, rng):
        """Nibble packing round-trips at odd W; >15 objects disables it."""
        import jax.numpy as jnp

        from sam_pt_tpu.vos_eval.eval import device_fuse_index_masks

        t, h, w = 3, 8, 31  # odd width exercises the pad-then-strip path
        for m in (3, 17):   # 17 objects: labels >15 don't fit a nibble
            logits = (rng.standard_normal((m, t, h, w)) * 4).astype(
                np.float16)
            gt = (rng.uniform(size=(m, h, w)) > 0.5).astype(np.float32)
            gt_ts = [0] * m

            dev = np.asarray(device_fuse_index_masks(
                jnp.asarray(logits), gt, gt_ts, frame_chunk=2))
            ref = np.asarray(device_fuse_index_masks(
                jnp.asarray(logits.astype(np.float32)).astype(jnp.float16),
                gt, gt_ts, frame_chunk=t + 1))  # single chunk, same labels
            assert dev.shape == (t, h, w)
            assert dev.max() <= m
            np.testing.assert_array_equal(dev, ref)
