"""Automatic mask generation from a point grid, batched for TPU.

Re-implements the `segment_anything` SamAutomaticMaskGenerator consumed by the
reference VIS adapter (SURVEY.md §2.9; parameters from
configs/vis_eval_root.yaml:14-28: 32x32 grid, points_per_batch 64,
pred_iou_thresh 0.88, stability 0.95/offset 1.0, box NMS 0.7, crop layers 0).

TPU-first: the image is embedded once; the whole point grid is decoded in
fixed-size batched jitted calls with multimask output; IoU/stability
filtering and stability scores are computed on device at low resolution; box
NMS runs on host over the (small) surviving set. Crop layers > 0 follow the
same path per crop.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.resize import resize_bilinear
from .predictor import SamPredictor


def build_point_grid(n_per_side: int) -> np.ndarray:
    """[n^2, 2] normalized (x, y) grid with half-cell offset (SAM layout)."""
    offset = 1.0 / (2 * n_per_side)
    pts = np.linspace(offset, 1.0 - offset, n_per_side)
    gx, gy = np.meshgrid(pts, pts)
    return np.stack([gx.ravel(), gy.ravel()], axis=-1).astype(np.float32)


def mask_to_box(mask: np.ndarray) -> np.ndarray:
    """Binary [H, W] -> XYXY box (zeros if empty)."""
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return np.zeros((4,), np.float32)
    return np.array(
        [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1], np.float32
    )


def box_nms(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float) -> np.ndarray:
    """Greedy NMS; returns kept indices (torchvision.ops.nms semantics)."""
    order = np.argsort(-scores, kind="stable")  # deterministic ties
    keep = []
    while len(order) > 0:
        i = order[0]
        keep.append(i)
        if len(order) == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1)
        a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        a_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / np.maximum(a_i + a_r - inter, 1e-9)
        order = rest[iou <= iou_thresh]
    return np.asarray(keep, np.int64)


class SamAutomaticMaskGenerator:
    def __init__(
        self,
        model: SamPredictor,
        points_per_side: int = 32,
        points_per_batch: int = 64,
        pred_iou_thresh: float = 0.88,
        stability_score_thresh: float = 0.95,
        stability_score_offset: float = 1.0,
        box_nms_thresh: float = 0.7,
        crop_n_layers: int = 0,
        crop_nms_thresh: float = 0.7,
        crop_overlap_ratio: float = 512 / 1500,
        crop_n_points_downscale_factor: int = 1,
        point_grids: Optional[List[np.ndarray]] = None,
        min_mask_region_area: int = 0,
        output_mode: str = "binary_mask",
    ):
        self.predictor = model
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_score_offset = stability_score_offset
        self.box_nms_thresh = box_nms_thresh
        self.crop_n_layers = crop_n_layers
        self.crop_nms_thresh = crop_nms_thresh
        self.crop_overlap_ratio = crop_overlap_ratio
        self.min_mask_region_area = min_mask_region_area
        self.output_mode = output_mode
        if point_grids is None:
            self.point_grids = [
                build_point_grid(
                    max(1, points_per_side // (crop_n_points_downscale_factor ** i))
                )
                for i in range(crop_n_layers + 1)
            ]
        else:
            self.point_grids = point_grids

    def generate(self, image: np.ndarray) -> List[Dict[str, Any]]:
        """image [H, W, 3] uint8 RGB -> list of mask records (SAM schema)."""
        h, w = image.shape[:2]
        crop_groups = [
            self._generate_for_crop(
                image, (0, 0, w, h), self.point_grids[0], (h, w)
            )
        ]

        # crop layers (rarely used; crop_n_layers=0 in the reference config)
        for layer in range(1, self.crop_n_layers + 1):
            for crop_box in self._crop_boxes(h, w, layer):
                x0, y0, x1, y1 = crop_box
                sub = image[y0:y1, x0:x1]
                crop_groups.append(self._generate_for_crop(
                    sub, crop_box, self.point_grids[layer], (h, w)
                ))

        # within-crop NMS on predicted IoU (segment_anything _process_crop)
        records: List[Dict] = []
        for recs in crop_groups:
            if not recs:
                continue
            boxes = np.stack([r["bbox_xyxy"] for r in recs])
            scores = np.array([r["predicted_iou"] for r in recs])
            keep = box_nms(boxes, scores, self.box_nms_thresh)
            records.extend(recs[i] for i in keep)
        if not records:
            return []

        # between-crop NMS: prefer masks from SMALLER crops (score =
        # 1/crop-area, segment_anything generate_masks semantics)
        if len(crop_groups) > 1:
            boxes = np.stack([r["bbox_xyxy"] for r in records])
            scores = np.array([
                1.0 / max(r["crop_box"][2] * r["crop_box"][3], 1)
                for r in records
            ])
            keep = box_nms(boxes, scores, self.crop_nms_thresh)
            records = [records[i] for i in keep]

        if self.min_mask_region_area > 0:
            records = self._postprocess_small_regions(records)

        out = []
        for r in records:
            x0, y0, x1, y1 = r.pop("bbox_xyxy")
            r["bbox"] = [float(x0), float(y0), float(x1 - x0), float(y1 - y0)]
            r["area"] = int(r["segmentation"].sum())
            out.append(r)
        # sort by area desc (SAM returns largest first under binary_mask mode)
        out.sort(key=lambda r: -r["area"])
        return out

    # ------------------------------------------------------------------
    def _generate_for_crop(self, image, crop_box, grid, full_hw) -> List[Dict]:
        x0, y0, x1, y1 = crop_box
        h, w = image.shape[:2]
        predictor = self.predictor

        emb = predictor.encode_frames(
            jnp.asarray(image[None].astype(np.float32)), (h, w)
        )

        pts_all = grid * np.array([w, h], np.float32)
        n = len(pts_all)
        bs = self.points_per_batch

        kept: List[Dict] = []
        for i in range(0, n, bs):
            chunk = pts_all[i : i + bs]
            pad = bs - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad, 2), np.float32)])
            pts = jnp.asarray(chunk)[:, None, :]  # [B, 1, 2]
            lbl = jnp.ones((bs, 1), jnp.int32)
            emb_b = jax.tree_util.tree_map(
                lambda a: jnp.broadcast_to(a, (bs, *a.shape[1:])), emb
            )
            low, iou, _ = predictor.predict(
                emb_b, pts, lbl, (h, w), multimask_output=True
            )  # [B, 3, g4, g4], [B, 3]
            low = np.asarray(low).reshape(-1, *low.shape[2:])
            iou = np.asarray(iou).reshape(-1)
            src_pts = np.repeat(chunk, 3, axis=0)
            if pad:
                low = low[: 3 * (bs - pad)]
                iou = iou[: 3 * (bs - pad)]
                src_pts = src_pts[: 3 * (bs - pad)]

            sel = iou > self.pred_iou_thresh
            if not sel.any():
                continue
            low, iou, src_pts = low[sel], iou[sel], src_pts[sel]

            # stability score at low resolution
            mt = self.predictor.model.mask_threshold
            off = self.stability_score_offset
            hi = (low > mt + off).sum(axis=(1, 2)).astype(np.float64)
            lo = (low > mt - off).sum(axis=(1, 2)).astype(np.float64)
            stability = hi / np.maximum(lo, 1)
            sel = stability >= self.stability_score_thresh
            if not sel.any():
                continue
            low, iou, src_pts, stability = (
                low[sel], iou[sel], src_pts[sel], stability[sel]
            )

            # pad survivors up to a bucket size so upscale_logits sees a
            # bounded set of batch shapes (a data-dependent K per chunk
            # would trigger a fresh XLA compile for every distinct count)
            k = low.shape[0]
            bucket = min(3 * bs, int(np.ceil(k / 32) * 32)) or k
            if bucket > k:
                low = np.concatenate(
                    [low, np.zeros((bucket - k, *low.shape[1:]), low.dtype)]
                )
            full = np.asarray(
                predictor.upscale_logits(jnp.asarray(low), (h, w))
            )[:k] > mt
            for m, s, p, st in zip(full, iou, src_pts, stability):
                box = mask_to_box(m)
                if m.sum() == 0:
                    continue
                kept.append(
                    {
                        "segmentation": self._offset_mask(m, crop_box, full_hw),
                        "bbox_xyxy": box + np.array([x0, y0, x0, y0], np.float32),
                        "predicted_iou": float(s),
                        "point_coords": [[float(p[0] + x0), float(p[1] + y0)]],
                        "stability_score": float(st),
                        "crop_box": [x0, y0, x1 - x0, y1 - y0],
                    }
                )
        return kept

    @staticmethod
    def _offset_mask(mask, crop_box, full_hw):
        """Place a crop-local mask onto the FULL-image canvas so every
        record's segmentation has the same (H, W) shape."""
        x0, y0, x1, y1 = crop_box
        fh, fw = full_hw
        if mask.shape == (fh, fw):
            return mask
        full = np.zeros((fh, fw), bool)
        full[y0:y0 + mask.shape[0], x0:x0 + mask.shape[1]] = mask
        return full

    def _crop_boxes(self, h, w, layer):
        n = 2 ** layer
        overlap = int(self.crop_overlap_ratio * min(h, w) * 2 / n)
        boxes = []
        cw = int((w + overlap * (n - 1)) / n + 0.5)
        ch = int((h + overlap * (n - 1)) / n + 0.5)
        for i in range(n):
            for j in range(n):
                x0 = max(0, j * (cw - overlap))
                y0 = max(0, i * (ch - overlap))
                boxes.append((x0, y0, min(x0 + cw, w), min(y0 + ch, h)))
        return boxes

    def _postprocess_small_regions(self, records):
        """Remove small disconnected islands AND fill small holes, recompute
        boxes, then NMS-dedup preferring UNCHANGED masks (score 1 vs 0) —
        segment_anything postprocess_small_regions semantics."""
        try:
            import cv2
        except ImportError:
            return records

        def _remove(m: np.ndarray, holes: bool) -> Tuple[np.ndarray, bool]:
            work = (~m if holes else m).astype(np.uint8)
            n_lbl, lbl, stats, _ = cv2.connectedComponentsWithStats(work, 8)
            changed = False
            for k in range(1, n_lbl):
                if stats[k, cv2.CC_STAT_AREA] < self.min_mask_region_area:
                    work[lbl == k] = 0
                    changed = True
            out = ~work.astype(bool) if holes else work.astype(bool)
            return out, changed

        out, scores = [], []
        for r in records:
            m = r["segmentation"]
            m, ch_holes = _remove(m, holes=True)
            m, ch_islands = _remove(m, holes=False)
            if m.sum() == 0:
                continue
            changed = ch_holes or ch_islands
            r["segmentation"] = m
            r["bbox_xyxy"] = mask_to_box(m)  # boxes must track the new mask
            out.append(r)
            scores.append(0.0 if changed else 1.0)
        if not out:
            return out
        # dedup: an unchanged duplicate (score 1) suppresses its altered twin
        boxes = np.stack([r["bbox_xyxy"] for r in out])
        keep = box_nms(boxes, np.asarray(scores), self.box_nms_thresh)
        return [out[i] for i in sorted(keep)]
