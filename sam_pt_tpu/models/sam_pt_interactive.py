"""Simulated interactive point correction against ground-truth masks.

Re-implements the reference SamPtInteractive (sam_pt/modeling/
sam_pt_interactive.py): SAM encoder features are cached for every frame up
front (:113-131 — the reference's own proof that encoder caching works, which
this framework generalizes); the correction loop walks frames under an
interaction budget, removing the first wrong negative/positive point
(:363-377) or adding a point at the largest false-negative/false-positive
DBSCAN cluster (:379-413), tracking newly added points forward from that
frame; offline mode sweeps a ladder of IoU thresholds and falls back to the
best cached pass (:525-617); online mode uses a single threshold.
History is dumped as JSON/pickle with an IoU-progress plot (:537-598).

TPU-first deltas: frame embeddings are computed in one batched pass; mask
prediction for any frame set runs through one fixed-capacity padded decoder
program (prompt capacity = initial points + interaction budget), so the jit
compiles once for the whole interactive session.
"""
from __future__ import annotations

import json
import os
import pickle
from collections import Counter, namedtuple
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.query_points import kmedoids
from ..vos_eval.metrics import db_eval_boundary, db_eval_iou
from .sam_pt import NEG_INF, SamPt, _emb_index

HistoryEntry = namedtuple(
    "HistoryEntry",
    "action type frame_idx point_idx iou_before iou_after interaction_idx "
    "current_iou_threshold overall_iou_before overall_iou_after "
    "boundary_score_before boundary_score_after "
    "overall_boundary_score_before overall_boundary_score_after "
    "jf_score_before jf_score_after",
)

OFFLINE_IOU_THRESHOLDS = [
    0.10, 0.20, 0.30, 0.40, 0.50, 0.60, 0.65, 0.70, 0.75, 0.80,
    0.85, 0.88, 0.90, 0.92, 0.95,
]


def extract_largest_cluster_points(
    mask: np.ndarray,
    n_points_to_select: int,
    dbscan_points: int = 18000,
    db_largest_cluster_min_points: int = 180,
    kmedian_points: int = 720,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """K-Medoids inside the largest DBSCAN cluster of the mask
    (reference :678-729; eps = 2.4 * H*W / dbscan_points, min_samples 10)."""
    from sklearn.cluster import DBSCAN

    rng = rng or np.random.default_rng()
    pix = np.stack(np.nonzero(mask), axis=-1).astype(np.float32)  # (y, x)
    assert len(pix) > 0
    sub = pix[rng.permutation(len(pix))[:dbscan_points]]

    eps = 2.4 * (mask.shape[0] * mask.shape[1]) / dbscan_points
    db = DBSCAN(eps=eps, min_samples=10).fit(sub)
    counts = Counter(db.labels_)
    counts.pop(-1, None)
    if not counts:
        cluster = pix
    else:
        cid = counts.most_common(1)[0][0]
        cluster = sub[db.labels_ == cid]
        if len(cluster) < db_largest_cluster_min_points:
            cluster = pix

    cluster = cluster[rng.permutation(len(cluster))[:kmedian_points]]
    k = min(n_points_to_select, len(cluster))
    sel = kmedoids(cluster, k, rng)
    if k < n_points_to_select:
        sel = np.tile(sel, (int(np.ceil(n_points_to_select / k)), 1))[
            :n_points_to_select
        ]
    return sel[:, ::-1].copy()  # (x, y)


class SamPtInteractive(SamPt):
    def __init__(
        self,
        interactions_max: int = 300,
        interactions_max_per_frame: int = 3,
        online_interactive_iou_threshold: float = 0.9,
        disable_point_tracking: bool = False,
        online: bool = False,
        output_root: str = "interactions",
        save_history: bool = True,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.interactions_max = interactions_max
        self.interactions_max_per_frame = interactions_max_per_frame
        self.online_interactive_iou_threshold = online_interactive_iou_threshold
        self.disable_point_tracking = disable_point_tracking
        self.online = online
        self.output_root = output_root
        self.save_history = save_history

    # ------------------------------------------------------------------
    def forward(self, video: Dict, debug: bool = True) -> Dict:
        images = np.asarray(video["image"])
        if images.ndim == 4 and images.shape[1] == 3 and images.shape[-1] != 3:
            images = images.transpose(0, 2, 3, 1)
        t, h, w, _ = images.shape

        if video.get("query_masks") is not None:
            query_masks = np.asarray(video["query_masks"], np.float32)
            timesteps = np.asarray(video["query_point_timestep"], np.float32)
            query_points = self.extract_query_points(images, query_masks, timesteps)
        elif video.get("query_points") is not None:
            query_points = np.asarray(video["query_points"], np.float32)
        else:
            raise ValueError("No query points or masks provided")
        n_masks, n_ppm, _ = query_points.shape
        assert n_masks == 1, "Interactive correction works with a single mask"
        assert "gt_masks" in video, "GT masks required for interactive correction"
        gt_masks = np.asarray(video["gt_masks"]).reshape(t, h, w) > 0.5

        thresholds = (
            [self.online_interactive_iou_threshold]
            if self.online
            else list(OFFLINE_IOU_THRESHOLDS)
        )
        interactions_max = self.interactions_max
        interactions_left = interactions_max
        if self.disable_point_tracking:
            thresholds = [1.0]
            interactions_max = self.interactions_max_per_frame * t
            interactions_left = interactions_max

        # 1. cache all frame embeddings (one batched pass)
        embeddings = self._encode_all_frames(images)
        # fixed prompt capacity for one compiled decode program
        self._prompt_capacity = n_ppm + interactions_max

        # 2. initial tracking
        if self.disable_point_tracking:
            trajectories = np.zeros((t, 1, 1, 2), np.float32)
            visibilities = np.zeros((t, 1, 1), np.float32)
            point_labels = np.ones((1,), np.int64)
        else:
            trajectories, visibilities = self._track_points(images, query_points)
            point_labels = np.ones((n_ppm,), np.int64)
            point_labels[self.positive_points_per_mask :] = 0
            interactions_left -= n_ppm

        def predict_frames(frame_idxs, traj, vis, labels):
            return self._predict_frames(
                images, embeddings, frame_idxs, traj, vis, labels
            )

        def frame_metrics(frame_idx, traj, vis, labels):
            logits, score = predict_frames([frame_idx], traj, vis, labels)
            m = logits[0] > 0
            gt = gt_masks[frame_idx]
            iou = float(db_eval_iou(gt, m))
            boundary = float(db_eval_boundary(gt, m))
            return m, gt, iou, boundary, logits[0], score[0]

        def full_pass(traj, vis, labels):
            logits, scores_pf = predict_frames(list(range(t)), traj, vis, labels)
            ious, bss = [], []
            for f in range(t):
                m = logits[f] > 0
                ious.append(float(db_eval_iou(gt_masks[f], m)))
                bss.append(float(db_eval_boundary(gt_masks[f], m)))
            return logits, scores_pf, ious, bss

        # 3. interaction loop
        cache = []
        history: List[HistoryEntry] = []
        current_threshold = thresholds.pop(0)
        pass_ious: List[float] = []
        pass_bss: List[float] = []
        frame_idx = 0
        frame_interactions = 0
        # The all-frames IoU/boundary sweeps before and after each
        # interaction feed ONLY the history dump (never control flow:
        # advancement uses the single-frame iou_after, the threshold-ladder
        # cache uses per-frame pass_ious) — skip them when history isn't
        # kept; they decode every frame per interaction. NOTE: keyed on
        # save_history alone — gating on disable_point_tracking too wrote
        # history dumps full of NaN overall metrics in that mode.
        track_overall = self.save_history
        if track_overall:
            _, _, prev_ious, prev_bss = full_pass(
                trajectories, visibilities, point_labels
            )
            prev_iou = float(np.mean(prev_ious))
            prev_bs = float(np.mean(prev_bss))
        else:
            prev_iou = prev_bs = float("nan")

        while interactions_left > 0:
            if frame_idx == t:
                cache.append(
                    {
                        "current_threshold": current_threshold,
                        "trajectories": trajectories.copy(),
                        "visibilities": visibilities.copy(),
                        "point_labels": point_labels.copy(),
                        "interactions_left": interactions_left,
                        "average_iou": float(np.mean(pass_ious)),
                        "average_boundary_score": float(np.mean(pass_bss)),
                        "current_pass_ious": list(pass_ious),
                        "current_pass_boundary_scores": list(pass_bss),
                    }
                )
                if not thresholds:
                    break
                current_threshold = thresholds.pop(0)
                frame_idx = 0
                frame_interactions = 0
                pass_ious, pass_bss = [], []

            m, gt, iou, boundary, _, _ = frame_metrics(
                frame_idx, trajectories, visibilities, point_labels
            )
            if iou >= current_threshold:
                frame_idx += 1
                frame_interactions = 0
                pass_ious.append(iou)
                pass_bss.append(boundary)
                continue

            fp_mask = m & ~gt
            fn_mask = ~m & gt

            # categorize visible points
            incorrect_neg, incorrect_pos = [], []
            for pi in range(trajectories.shape[2]):
                if visibilities[frame_idx, 0, pi] != 1:
                    continue
                x, y = np.round(trajectories[frame_idx, 0, pi]).astype(int)
                x = np.clip(x, 0, w - 1)
                y = np.clip(y, 0, h - 1)
                positive = point_labels[pi] == 1
                tp = m[y, x] and gt[y, x]
                tn = (not m[y, x]) and (not gt[y, x])
                fp = m[y, x] and not gt[y, x]
                fn = (not m[y, x]) and gt[y, x]
                correct = (positive and (tp or fn)) or (
                    (not positive) and (tn or fp)
                )
                if not correct:
                    (incorrect_pos if positive else incorrect_neg).append(pi)

            if incorrect_neg:
                pi = incorrect_neg[0]
                visibilities[frame_idx:, 0, pi] = 0
                action, a_type, a_pi = "remove", "negative", pi
            elif incorrect_pos:
                pi = incorrect_pos[0]
                visibilities[frame_idx:, 0, pi] = 0
                action, a_type, a_pi = "remove", "positive", pi
            else:
                action = "add"
                a_pi = trajectories.shape[2]
                if fn_mask.sum() > fp_mask.sum():
                    mask, label, a_type = fn_mask, 1, "positive"
                else:
                    mask, label, a_type = fp_mask, 0, "negative"
                assert mask.sum() > 0
                xy = extract_largest_cluster_points(
                    mask, min(3, int(mask.sum())), rng=self.rng
                )[0]
                x, y = float(xy[0]), float(xy[1])
                new_traj = np.zeros((t, 1, 1, 2), np.float32)
                new_vis = np.zeros((t, 1, 1), np.float32)
                if self.disable_point_tracking:
                    new_traj[frame_idx, 0, 0] = (x, y)
                    new_vis[frame_idx, 0, 0] = 1
                else:
                    qp_new = np.array([[[0, x, y]]], np.float32)
                    tr, vi = self._track_points(images[frame_idx:], qp_new)
                    tr[0, 0, 0] = (x, y)
                    vi[0, 0, 0] = 1
                    new_traj[frame_idx:] = tr
                    new_vis[frame_idx:] = vi
                trajectories = np.concatenate([trajectories, new_traj], axis=2)
                visibilities = np.concatenate([visibilities, new_vis], axis=2)
                point_labels = np.concatenate([point_labels, [label]])

            m_after, _, iou_after, bs_after, _, _ = frame_metrics(
                frame_idx, trajectories, visibilities, point_labels
            )
            if not track_overall:
                next_iou, next_bs = prev_iou, prev_bs
            else:
                _, _, ni, nb = full_pass(trajectories, visibilities, point_labels)
                next_iou, next_bs = float(np.mean(ni)), float(np.mean(nb))

            history.append(
                HistoryEntry(
                    action=action, type=a_type, frame_idx=frame_idx,
                    point_idx=int(a_pi), iou_before=iou, iou_after=iou_after,
                    interaction_idx=interactions_left,
                    current_iou_threshold=current_threshold,
                    overall_iou_before=prev_iou, overall_iou_after=next_iou,
                    boundary_score_before=boundary,
                    boundary_score_after=bs_after,
                    overall_boundary_score_before=prev_bs,
                    overall_boundary_score_after=next_bs,
                    jf_score_before=(prev_iou + prev_bs) / 2,
                    jf_score_after=(next_iou + next_bs) / 2,
                )
            )

            interactions_left -= 1
            frame_interactions += 1
            prev_iou, prev_bs = next_iou, next_bs
            if (
                iou_after >= current_threshold
                or frame_interactions >= self.interactions_max_per_frame
            ):
                frame_idx += 1
                frame_interactions = 0
                pass_ious.append(iou_after)
                pass_bss.append(bs_after)

        # 4. final pass + best-cached-threshold fallback (reference :600-617)
        logits, scores_pf, final_ious, final_bss = full_pass(
            trajectories, visibilities, point_labels
        )
        final_iou = float(np.mean(final_ious))
        if cache:
            best = max(cache, key=lambda x: x["average_iou"])
            if best["average_iou"] > final_iou:
                trajectories = best["trajectories"]
                visibilities = best["visibilities"]
                point_labels = best["point_labels"]
                logits, scores_pf, final_ious, final_bss = full_pass(
                    trajectories, visibilities, point_labels
                )

        if self.save_history:
            self._dump_history(video, history, cache, trajectories,
                               visibilities, point_labels, logits)

        # 5. format outputs like SamPt.forward
        target_hw = tuple(video["target_hw"])
        out_logits = logits[None]  # [1, T, h, w]
        if (h, w) != target_hw:
            from ..ops.resize import resize_bilinear

            out_logits = np.asarray(
                resize_bilinear(jnp.asarray(out_logits)[..., None], target_hw)[..., 0]
            )
        resize_factor = np.array(
            [target_hw[1] / w, target_hw[0] / h], np.float32
        )
        with np.errstate(invalid="ignore"):
            scores = np.nanmean(np.where(np.isfinite(scores_pf), scores_pf,
                                         np.nan), axis=0)
        return {
            "logits": [m for m in out_logits],
            "scores": [float(s) for s in np.atleast_1d(scores)],
            "scores_per_frame": scores_pf[:, None].tolist(),
            "trajectories": trajectories * resize_factor,
            "visibilities": visibilities,
            "interaction_history": [h._asdict() for h in history],
            "final_ious": final_ious,
        }

    # ------------------------------------------------------------------
    def _predict_frames(self, images, embeddings, frame_idxs, traj, vis,
                        labels):
        """Decode masks for `frame_idxs` with the fixed-capacity prompt set.

        Returns (logits [len, H, W], sam_scores [len]). Frames with no
        visible positive point get ZERO logits (reference :134-135).
        """
        h, w = images.shape[1:3]
        cap = self._prompt_capacity
        n_frames = len(frame_idxs)

        pts = np.zeros((n_frames, cap, 2), np.float32)
        lbl = np.full((n_frames, cap), -1, np.int64)
        for bi, f in enumerate(frame_idxs):
            visible = vis[f, 0] == 1
            k = int(visible.sum())
            pts[bi, :k] = traj[f, 0][visible]
            lbl[bi, :k] = labels[visible]

        has_pos = (lbl == 1).any(axis=1)

        # shared chunk-padded decode loop (SamPt._decode_all_pairs) with the
        # interactive chain; every chunk is dispatched before the single
        # download, so the device pipeline never idles between chunks
        up_dev, iou_dev = self._decode_all_pairs(
            embeddings, np.asarray(frame_idxs), pts, lbl, (h, w),
            chain=self._get_interactive_chain_fn((h, w)),
        )
        # np.array (not asarray): the zero-copy view of a device array is
        # read-only, and the no-positive rows are zeroed in place below
        logits = np.array(up_dev, np.float32)
        scores = np.array(iou_dev, np.float32)
        logits[~has_pos] = 0.0
        scores[~has_pos] = 0.0
        return logits, scores

    def _get_interactive_chain_fn(self, original_hw):
        """ONE jitted program per (hw, refine-iters): positives-only pass ->
        +negatives pass -> box refinement -> upscale (reference predict_mask
        :133-188). The interaction loop calls this on every frame-metrics
        evaluation, so per-pass dispatches (~25 ms RTT each on the
        remote-attached chip) would dominate; fusing the chain makes each
        evaluation a single dispatch, mirroring `SamPt._get_chain_fn`."""
        key = (tuple(original_hw), self.iterative_refinement_iterations)
        cache = getattr(self, "_ichain_fns", None)
        if cache is None:
            cache = self._ichain_fns = {}
        if key not in cache:
            predictor = self.sam_predictor
            refine_iters = self.iterative_refinement_iterations

            def chain(params, emb, pts, lbl):
                lbl = lbl.astype(jnp.int32)
                pts_model = predictor.scale_coords(pts, original_hw)
                pos_lbl = jnp.where(lbl == 1, 1, -1)
                m1, i1 = predictor._decode(
                    params, emb, pts_model, pos_lbl, None, None
                )
                low, iou = m1[:, 0], i1[:, 0]
                has_neg = (lbl == 0).any(axis=1)
                m2, i2 = predictor._decode(
                    params, emb, pts_model, lbl,
                    low[:, :, :, None], jnp.ones(low.shape[0], bool),
                )
                low = jnp.where(has_neg[:, None, None], m2[:, 0], low)
                iou = jnp.where(has_neg, i2[:, 0], iou)
                if refine_iters:
                    # while_loop with exact fixed-point early exit, same as
                    # SamPt._get_chain_fn: compiles the pass body once and
                    # stops when a pass leaves (low, iou) bit-identical —
                    # output equals the unconditional unrolled loop.
                    def _cond(c):
                        i, _, _, changed = c
                        return jnp.logical_and(i < refine_iters, changed)

                    def _body(c):
                        i, low, iou, _ = c
                        nlow, niou = self._box_refine_impl(
                            params, emb, pts_model, lbl, low, iou,
                            original_hw,
                        )
                        changed = jnp.logical_or(
                            jnp.any(nlow != low), jnp.any(niou != iou)
                        )
                        return i + 1, nlow, niou, changed

                    _, low, iou, _ = jax.lax.while_loop(
                        _cond, _body,
                        (jnp.int32(0), low, iou, jnp.bool_(True)),
                    )
                up = predictor.upscale_logits(low, original_hw)
                return up, iou

            cache[key] = jax.jit(chain)
        return cache[key]

    def _dump_history(self, video, history, cache, trajectories, visibilities,
                      point_labels, logits):
        root = os.path.join(self.output_root, str(video.get("video_id", 0)))
        os.makedirs(root, exist_ok=True)
        with open(os.path.join(root, "history.json"), "w") as f:
            json.dump([h._asdict() for h in history], f, indent=4)
        with open(os.path.join(root, "achieved_iou_thresholds_cache.pkl"), "wb") as f:
            pickle.dump(cache, f)
        with open(os.path.join(root, "final.pkl"), "wb") as f:
            pickle.dump(
                {
                    "trajectories": trajectories,
                    "visibilities": visibilities,
                    "point_labels": point_labels,
                    "logits": logits,
                },
                f,
            )
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            plt.figure(figsize=(10, 5))
            plt.plot([h.current_iou_threshold for h in history], label="Threshold")
            plt.plot([h.overall_iou_before for h in history], label="Before")
            plt.plot([h.overall_iou_after for h in history], label="After")
            plt.xlabel("Interaction")
            plt.ylabel("IoU")
            plt.legend()
            plt.tight_layout()
            plt.savefig(os.path.join(root, "overall_iou_history.png"))
            plt.close()
        except Exception:
            pass
