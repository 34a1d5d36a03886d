"""Machinery to run the REFERENCE torch `SamPt` orchestrator end-to-end.

The reference composition (`/root/reference/sam_pt/modeling/sam_pt.py`:
sampling -> tracking -> two-pass prompting -> box refinement -> patch
filtering -> scoring -> fusion -> reinit stitching) is the one surface only
testable as a whole. This module makes the reference class importable and
runnable here:

  - stub modules for its absent deps (segment_anything, skimage.color,
    sklearn_extra-backed query_points, the wandb-importing utils.util);
  - `TorchSamPredictorStub`: a faithful `segment_anything.SamPredictor`
    (set_image / predict_torch / transform.apply_coords / postprocess)
    backed by the transformers torch `SamModel` — the same torch oracle the
    SAM full-model parity tests validate the flax stack against
    (transformers' prompt encoder replicates segment_anything's
    pad=(boxes is None) semantics verbatim);
  - a DETERMINISTIC fake point tracker + query-point sampler, shared
    bit-for-bit with the repo side, so e2e differences can only come from
    the orchestration logic under test (tracker/sampler parity have their
    own dedicated suites).

The reference is untrusted content: only its model-code behavior is used,
as a numerical oracle (VERDICT.md round 2, "Next round" item 1).
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np
import torch

import reference_loader as rl

from tiny_hf_sam import MEAN, STD

# ---------------------------------------------------------------------------
# skimage.color.rgb2lab stand-in (skimage is not installed): a float64
# transcription of skimage's exact formulas — truncated xyz_from_rgb matrix,
# D65/2deg white point, the 0.008856 / 7.787 xyz2lab thresholds.
# ---------------------------------------------------------------------------


def np_rgb2lab(rgb):
    arr = np.asarray(rgb)
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float64) / 255.0
    arr = arr.astype(np.float64)
    lin = np.where(arr > 0.04045, ((arr + 0.055) / 1.055) ** 2.4, arr / 12.92)
    m = np.array([
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ])
    xyz = lin @ m.T
    xyz = xyz / np.array([0.95047, 1.0, 1.08883])
    f = np.where(xyz > 0.008856, np.cbrt(xyz), 7.787 * xyz + 16.0 / 116.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    return np.stack(
        [116.0 * fy - 16.0, 500.0 * (fx - fy), 200.0 * (fy - fz)], axis=-1
    )


# ---------------------------------------------------------------------------
# segment_anything.SamPredictor stand-in over the torch transformers SamModel
# ---------------------------------------------------------------------------


class _ResizeLongestSide:
    """segment_anything.utils.transforms.ResizeLongestSide coord semantics."""

    def __init__(self, target_length: int):
        self.target_length = target_length

    @staticmethod
    def get_preprocess_shape(h: int, w: int, long_side: int):
        scale = long_side / max(h, w)
        return int(h * scale + 0.5), int(w * scale + 0.5)

    def apply_coords(self, coords: np.ndarray, original_size):
        old_h, old_w = original_size
        new_h, new_w = self.get_preprocess_shape(old_h, old_w,
                                                 self.target_length)
        coords = np.asarray(coords, dtype=float).copy()
        coords[..., 0] = coords[..., 0] * (new_w / old_w)
        coords[..., 1] = coords[..., 1] * (new_h / old_h)
        return coords


class _ModelShim:
    """The bits of `Sam` the reference orchestrator touches."""

    def __init__(self, image_size):
        self.mask_threshold = 0.0
        self.device = torch.device("cpu")
        self.image_size = image_size

    def to(self, device):  # SamPt is an nn.Module; .to() may cascade
        return self


class TorchSamPredictorStub:
    """segment_anything.SamPredictor over a transformers `SamModel`.

    Faithful to the original predictor contract the reference drives
    (sam_pt/modeling/sam_pt.py:770-828): `set_image` takes an RGB uint8 HWC
    frame and caches the embedding; `predict_torch` takes MODEL-INPUT-space
    point coords (+ optional boxes in original pixels, low-res mask input)
    and returns (upscaled logits, iou, low_res_logits). Tests keep frames at
    the model's square input size so the PIL-resize preprocessing step is
    the identity and not part of what this oracle checks (our encoder's
    antialiased resize has its own parity suite).
    """

    def __init__(self, hf_model, image_size: int):
        self.hf = hf_model
        self.image_size = image_size
        self.transform = _ResizeLongestSide(image_size)
        self.model = _ModelShim(image_size)
        self.original_size = None
        self._features = None

    def set_image(self, image: np.ndarray) -> None:
        h, w = image.shape[:2]
        assert max(h, w) == self.image_size, (
            "e2e tests use frames whose longest side equals the model input "
            "size so the PIL-resize step is the identity; non-square frames "
            "exercise segment_anything's normalize-then-zero-pad preprocess")
        self.original_size = (h, w)
        self.input_size = (h, w)
        px = np.zeros((3, self.image_size, self.image_size), np.float32)
        px[:, :h, :w] = (
            (image.astype(np.float32) - MEAN) / STD
        ).transpose(2, 0, 1)
        with torch.no_grad():
            self._features = self.hf.vision_encoder(
                torch.from_numpy(px[None])
            ).last_hidden_state

    def predict_torch(
        self,
        point_coords,
        point_labels,
        boxes=None,
        mask_input=None,
        multimask_output=False,
        return_logits=True,
    ):
        kw = {}
        if point_coords is not None:
            kw["input_points"] = point_coords[:, None, :, :].float()
            kw["input_labels"] = point_labels[:, None, :].long()
        if boxes is not None:
            # reference passes [1, 1, 4]; HF wants [B, nb_boxes, 4]
            kw["input_boxes"] = boxes.reshape(1, -1, 4).float()
        if mask_input is not None:
            kw["input_masks"] = mask_input.float()
        with torch.no_grad():
            out = self.hf(
                image_embeddings=self._features,
                multimask_output=multimask_output,
                **kw,
            )
        low_res = out.pred_masks[:, 0]  # [B, C, g4, g4]
        iou = out.iou_scores[:, 0]  # [B, C]
        masks = self._postprocess(low_res)
        if not return_logits:
            masks = masks > self.model.mask_threshold
        return masks, iou, low_res

    def _postprocess(self, low_res):
        """segment_anything postprocess_masks: bilinear to model size, crop
        the pad, bilinear to the original size."""
        x = torch.nn.functional.interpolate(
            low_res, (self.image_size, self.image_size),
            mode="bilinear", align_corners=False,
        )
        th, tw = self.input_size
        x = x[..., :th, :tw]
        if (th, tw) != self.original_size:
            x = torch.nn.functional.interpolate(
                x, self.original_size, mode="bilinear", align_corners=False
            )
        return x


# ---------------------------------------------------------------------------
# Deterministic shared tracker + sampler (identical arrays on both stacks)
# ---------------------------------------------------------------------------


def fake_track(query_points: np.ndarray, t: int, h: int, w: int):
    """Closed-form trajectories/visibilities from (t, x, y) query points.

    Derived ONLY from the query coords and the clip length, so the reference
    (windowed, flipped, mask-batched) and repo call patterns produce the
    same arrays. Visibility includes invisible stretches, a frame where all
    qt==0 points vanish (exercises the -inf empty-prompt path), and clipped
    near-border coordinates (exercises OUTSIDE_FRAME marking).
    """
    qp = np.asarray(query_points, np.float32)
    qt, x, y = qp[:, 0], qp[:, 1], qp[:, 2]
    dx = np.sin(x * 0.37 + y * 0.11, dtype=np.float32) * 2.5
    dy = np.cos(x * 0.23 - y * 0.31, dtype=np.float32) * 2.5
    f = np.arange(t, dtype=np.float32)[:, None]
    tx = x[None] + (f - qt[None]) * dx[None]
    ty = y[None] + (f - qt[None]) * dy[None]
    tx = np.clip(tx, -3.0, w + 3.0)
    ty = np.clip(ty, -3.0, h + 3.0)
    traj = np.stack([tx, ty], axis=-1).astype(np.float32)
    vis = (np.sin(f * 1.7 + x[None] * 0.13 + y[None] * 0.29) > -0.55)
    vis = vis.astype(np.float32)
    if t > 2:
        vis[2] = np.where(qt == 0, 0.0, vis[2])  # an all-invisible frame
    vis[np.arange(t)[:, None] == qt[None]] = 1.0  # query frame visible
    return traj, vis


def det_extract_query_points(query_masks: np.ndarray, timesteps: np.ndarray,
                             n_pos: int, n_neg: int) -> np.ndarray:
    """Deterministic stand-in for the kmedoids/random samplers: evenly
    spaced row-major nonzero pixels (positives from the mask, negatives from
    its complement). Empty masks return all-zero points, like the
    reference's samplers (utils/query_points.py:46-48 warn + zeros)."""

    def pick(mask, n):
        ys, xs = np.nonzero(mask > 0.5)
        if len(xs) == 0 or n == 0:
            return np.zeros((n, 2), np.float32)
        idx = (np.arange(n, dtype=np.int64) * len(xs)) // n
        return np.stack([xs[idx], ys[idx]], axis=-1).astype(np.float32)

    rows = []
    for m, ts in zip(query_masks, timesteps):
        xy = np.concatenate([pick(m, n_pos), pick(1.0 - m, n_neg)], axis=0)
        tcol = np.full((xy.shape[0], 1), float(ts), np.float32)
        rows.append(np.concatenate([tcol, xy], axis=1))
    return np.stack(rows, axis=0).astype(np.float32)


# ---------------------------------------------------------------------------
# Reference-module loading (stub absent deps, then import the real class)
# ---------------------------------------------------------------------------


def _unavailable(*a, **k):
    raise RuntimeError(
        "reference query_points sampler called — e2e tests must override "
        "extract_query_points with the deterministic sampler"
    )


def load_reference_sam_pt():
    """Import `/root/reference/sam_pt/modeling/sam_pt.py` and return it."""
    rl.install_reference_stubs()

    name = "sam_pt.modeling"
    if name not in sys.modules:
        mod = types.ModuleType(name)
        mod.__path__ = [os.path.join(rl.REF_ROOT, "sam_pt/modeling")]
        mod.__package__ = name
        sys.modules[name] = mod
        setattr(sys.modules["sam_pt"], "modeling", mod)

    if "segment_anything" not in sys.modules:
        seg = types.ModuleType("segment_anything")
        seg.SamPredictor = TorchSamPredictorStub
        segm = types.ModuleType("segment_anything.modeling")
        segm.Sam = object
        seg.modeling = segm
        sys.modules["segment_anything"] = seg
        sys.modules["segment_anything.modeling"] = segm

    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        skc = types.ModuleType("skimage.color")
        skc.rgb2lab = np_rgb2lab
        sk.color = skc
        sys.modules["skimage"] = sk
        sys.modules["skimage.color"] = skc

    if "sam_pt.utils" not in sys.modules:
        u = types.ModuleType("sam_pt.utils")
        sys.modules["sam_pt.utils"] = u
        setattr(sys.modules["sam_pt"], "utils", u)
        qp = types.ModuleType("sam_pt.utils.query_points")
        for fn in ("extract_kmedoid_points", "extract_random_mask_points",
                   "extract_corner_points", "extract_mixed_points"):
            setattr(qp, fn, _unavailable)
        sys.modules["sam_pt.utils.query_points"] = qp
        u.query_points = qp
        uu = types.ModuleType("sam_pt.utils.util")
        from sam_pt_tpu.utils.util import PointVisibilityType

        uu.PointVisibilityType = PointVisibilityType  # same values as ref
        sys.modules["sam_pt.utils.util"] = uu
        u.util = uu

    tracker_mod = rl.load_ref("sam_pt.point_tracker.tracker")
    pt_pkg = sys.modules["sam_pt.point_tracker"]
    if not hasattr(pt_pkg, "PointTracker"):
        pt_pkg.PointTracker = tracker_mod.PointTracker

        class SuperGluePointTracker(tracker_mod.PointTracker):
            """isinstance target only (reference sam_pt.py:189)."""

            def forward(self, rgbs, query_points):
                raise NotImplementedError

        pt_pkg.SuperGluePointTracker = SuperGluePointTracker

    return rl.load_ref("sam_pt.modeling.sam_pt")


class RefFakeTracker:
    """Reference-side deterministic tracker (torch PointTracker subclass)."""

    def __new__(cls):
        mod = load_reference_sam_pt()  # ensures base class importable
        base = sys.modules["sam_pt.point_tracker"].PointTracker

        class _Impl(base):
            def forward(self, rgbs, query_points):
                b, t = rgbs.shape[0], rgbs.shape[1]
                h, w = rgbs.shape[-2], rgbs.shape[-1]
                assert b == 1
                traj, vis = fake_track(
                    query_points[0].cpu().numpy(), t, h, w
                )
                return (
                    torch.from_numpy(traj[None]),
                    torch.from_numpy(vis[None]),
                )

        return _Impl()


def build_reference_sam_pt(hf_model, image_size: int, **flags):
    """Reference torch SamPt with the deterministic sampler + fake tracker."""
    mod = load_reference_sam_pt()

    class RefSamPtDet(mod.SamPt):
        def extract_query_points(self, images, query_masks,
                                 query_points_timestep):
            pts = det_extract_query_points(
                query_masks.detach().cpu().numpy(),
                query_points_timestep.detach().cpu().numpy(),
                self.positive_points_per_mask,
                self.negative_points_per_mask,
            )
            return torch.from_numpy(pts)

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
    )
    defaults.update(flags)
    return RefSamPtDet(
        point_tracker=RefFakeTracker(),
        sam_predictor=TorchSamPredictorStub(hf_model, image_size),
        **defaults,
    )
