"""SAM-PT orchestrator: point tracking + per-frame SAM prompting, batched.

Re-implements the reference `SamPt` (sam_pt/modeling/sam_pt.py) with the
TPU-first inversion of SURVEY.md §7: instead of `for frame: for mask: SAM(...)`
with per-call host<->device transfers (reference :848-858), this orchestrator

  1. embeds ALL frames once with the batched SAM encoder,
  2. assembles FIXED-SHAPE padded point prompts for every (frame, object)
     pair — variable visible-point sets become label masking (-1 = pad),
     generalizing the reference's pad-with-invisible trick
     (superglue/tracker.py:170-182),
  3. decodes masks for all pairs in chunked batched jitted calls, including
     the negative-point two-pass chain (reference :791-807) and iterative box
     refinement (reference :809-828) as further batched passes,
  4. applies IoU-threshold gating, empty-prompt -inf masking, patch-similarity
     filtering and out-of-frame marking as vectorized array ops.

Supported feature set tracked against the reference constructor
(sam_pt/modeling/sam_pt.py:28-116): all flags are accepted; point
reinitialization (`use_point_reinit`, reference :355-543) is implemented in
`_forward_w_reinit`.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.color import rgb_to_lab
from ..ops.sampling import patch_sample
from ..utils.query_points import (
    extract_corner_points,
    extract_kmedoid_points,
    extract_mixed_points,
    extract_random_mask_points,
)
from ..utils.util import PointVisibilityType
from .sam.predictor import SamPredictor
from .tracker.api import PointTracker

NEG_INF = -float("inf")


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _build_prompts_jit(traj, vis, n_pos, has_neg, add_other):
    """Device-side `_build_prompts` (cap-less other-object variant).

    traj [T, M, P, 2], vis [T, M, P] -> points [T, M, N, 2], labels
    [T, M, N]. Unlike the host version, other-object negative slots are not
    compacted to the front: every other-object positive keeps its slot and
    invisible ones get label -1 — the same active token set, which the mask
    decoder is order/slot-invariant to (tokens encode coordinates)."""
    t, m, p, _ = traj.shape
    visible = vis == 1
    if has_neg:
        base = jnp.concatenate([
            jnp.ones((n_pos,), jnp.int32),
            jnp.zeros((p - n_pos,), jnp.int32),
        ])
    else:
        base = jnp.ones((p,), jnp.int32)
    labels = jnp.where(visible, base[None, None, :], -1)
    points = traj.astype(jnp.float32)
    if add_other and m > 1:
        oidx = np.stack(
            [[o for o in range(m) if o != mi] for mi in range(m)]
        )  # [M, M-1] static
        opts = points[:, :, :n_pos][:, oidx]  # [T, M, M-1, n_pos, 2]
        ovis = visible[:, :, :n_pos][:, oidx]
        points = jnp.concatenate(
            [points, opts.reshape(t, m, -1, 2)], axis=2
        )
        labels = jnp.concatenate(
            [labels, jnp.where(ovis, 0, -1).reshape(t, m, -1)], axis=2
        )
    return points, labels


def _emb_index(embeddings, idx):
    """Index precomputed embeddings (array, or {'emb','interm'} dict for HQ)."""
    return jax.tree_util.tree_map(lambda a: a[idx], embeddings)


@functools.partial(jax.jit, static_argnums=(3,))
def _patch_similarities_jit(images, flat_traj, qp, patch_size):
    """[T, H, W, 3] uint8, [T, N, 2], [N, 3] -> similarities [T, N]."""
    # The reference flips channels to BGR before rgb2lab
    # (sam_pt.py:645 rgbs[:, [2, 1, 0]]) — a quirk, but patch similarities
    # and the PATCH_NON_SIMILAR decisions must match it.
    lab = rgb_to_lab(images[..., ::-1])
    # patches around every point's trajectory position, every frame
    tp = jax.vmap(lambda im, pts: patch_sample(im, pts, patch_size))(
        lab, flat_traj
    )  # [T, N, K*K, 3]
    # template patch: each point sampled once, on its own query frame
    # (gather the per-point frame, then one patch per point — not a patch on
    # every frame with all but the query row discarded)
    q_t = qp[:, 0].astype(jnp.int32)
    q_patches = jax.vmap(
        lambda im, pt: patch_sample(im, pt[None], patch_size)[0]
    )(lab[q_t], qp[:, 1:])  # [N, K*K, 3]

    diff = (tp - q_patches[None]).reshape(*tp.shape[:2], -1)
    return jnp.exp(
        -jnp.linalg.norm(diff, axis=-1) / (2 * patch_size ** 2)
    )


class SamPt:
    def __init__(
        self,
        point_tracker: PointTracker,
        sam_predictor: SamPredictor,
        sam_iou_threshold: float = 0.7,
        positive_point_selection_method: str = "kmedoids",
        negative_point_selection_method: str = "mixed",
        positive_points_per_mask: int = 8,
        negative_points_per_mask: int = 1,
        add_other_objects_positive_points_as_negative_points: bool = False,
        max_other_objects_positive_points: Optional[int] = None,
        point_tracker_mask_batch_size: int = 5,
        iterative_refinement_iterations: int = 0,
        use_patch_matching_filtering: bool = False,
        patch_size: int = 3,
        patch_similarity_threshold: float = 0.01,
        use_point_reinit: bool = False,
        reinit_point_tracker_horizon: int = 24,
        reinit_horizon: int = 24,
        reinit_variant: str = "reinit-at-median-of-area-diff",
        fail_on_empty_reinit_mask: bool = False,
        sam_decode_chunk: int = 32,
        sam_encode_chunk: int = 4,
        upload_chunk: Optional[int] = None,
        seed: int = 72,
        data_parallel: bool = False,
        mesh=None,
        logits_dtype: str = "float16",
    ):
        self.point_tracker = point_tracker
        self.sam_predictor = sam_predictor
        self.sam_iou_threshold = sam_iou_threshold
        self.positive_point_selection_method = positive_point_selection_method
        self.negative_point_selection_method = negative_point_selection_method
        self.positive_points_per_mask = positive_points_per_mask
        self.negative_points_per_mask = negative_points_per_mask
        self.add_other_objects_positive_points_as_negative_points = (
            add_other_objects_positive_points_as_negative_points
        )
        self.max_other_objects_positive_points = max_other_objects_positive_points
        self.point_tracker_mask_batch_size = point_tracker_mask_batch_size
        self.iterative_refinement_iterations = iterative_refinement_iterations
        self.use_patch_matching_filtering = use_patch_matching_filtering
        self.patch_size = patch_size
        self.patch_similarity_threshold = patch_similarity_threshold
        self.use_point_reinit = use_point_reinit
        self.reinit_point_tracker_horizon = reinit_point_tracker_horizon
        self.reinit_horizon = reinit_horizon
        self.reinit_variant = reinit_variant
        self.fail_on_empty_reinit_mask = fail_on_empty_reinit_mask
        self.sam_decode_chunk = sam_decode_chunk
        self.sam_encode_chunk = sam_encode_chunk
        # host->device transfer granularity, decoupled from the encode
        # program granularity: each upload call pays a ~28 ms fixed cost on
        # remote-attached runtimes, so fewer/bigger transfers win — but one
        # whole-video blocking transfer stalls the compute dispatch pipeline
        # (scripts/ab_upload_path.py). Must be a multiple of
        # sam_encode_chunk; None = same as sam_encode_chunk.
        self.upload_chunk = upload_chunk
        # dtype of the upscaled full-res logits planes. float16 halves the
        # device->host transfer and its ~2^-10 relative rounding sits far
        # below SAM's mask-boundary noise floor (logits are O(10) with a 0.0
        # decision threshold); float32 is for bit-level parity auditing.
        self.logits_dtype = jnp.dtype(logits_dtype)
        self.rng = np.random.default_rng(seed)
        self._chain_fns = {}  # jitted decode-chain programs, keyed by shape
        # Data parallelism (SURVEY §2.10 TPU-native mapping): the SAM encode
        # (frame axis) and decode ((frame, object) pair axis) batches shard
        # over a jax.sharding.Mesh 'data' axis with replicated params; the
        # host orchestration is unchanged. `data_parallel=True` builds a
        # mesh over all local devices at first forward (or pass `mesh`).
        self.data_parallel = data_parallel
        self.mesh = mesh
        self._data_sharding = None

    # ------------------------------------------------------------------
    # Data parallelism over a device mesh
    # ------------------------------------------------------------------
    def _setup_mesh(self) -> None:
        """Lazily wire the mesh: replicate SAM params (by rebuilding the
        predictor with the mesh), round the encode/decode chunk sizes up to
        mesh-size multiples (sharding needs even splits), and cache the
        batch sharding used by `_shard`."""
        if not self.data_parallel or self._data_sharding is not None:
            return
        from ..parallel.mesh import batch_sharding, create_mesh

        mesh = self.mesh if self.mesh is not None else create_mesh()
        self.mesh = mesh
        ndev = int(mesh.devices.size)
        rup = lambda x: ((x + ndev - 1) // ndev) * ndev  # noqa: E731
        self.sam_encode_chunk = rup(self.sam_encode_chunk)
        self.sam_decode_chunk = rup(self.sam_decode_chunk)
        pred = self.sam_predictor
        if getattr(pred, "mesh", None) is None:
            self.sam_predictor = type(pred)(
                pred.model, pred.params, antialias=pred.antialias, mesh=mesh
            )
        self._chain_fns = {}
        self._data_sharding = batch_sharding(mesh)

    def _shard(self, x):
        """Shard the leading batch axis over the mesh (no-op without one)."""
        if self._data_sharding is None:
            return x
        return jax.device_put(x, self._data_sharding)

    # ------------------------------------------------------------------
    # Entry point
    # ------------------------------------------------------------------
    def forward(self, video: Dict) -> Dict:
        """video dict -> predictions dict (reference sam_pt.py:122-236 contract).

        video keys: 'image' [T, H, W, 3] uint8 (numpy or list of frames),
        'target_hw' (h, w), and either 'query_points' [M, P, 3] (t, x, y) or
        'query_masks' [M, H, W] + 'query_point_timestep' [M].
        """
        self._setup_mesh()
        images = np.asarray(video["image"])
        if images.ndim == 4 and images.shape[1] == 3 and images.shape[-1] != 3:
            images = images.transpose(0, 2, 3, 1)  # accept NCHW input
        assert images.dtype == np.uint8, "Input images must be uint8 (0-255)"
        t, h, w, _ = images.shape
        # Upload the video ONCE (single device_put; see _upload_and_encode);
        # trackers and the SAM encoder share this copy (uint8 on device;
        # casting/resizing happen on device inside the jitted programs).
        if self.use_point_reinit:
            self._images_dev = self._upload_video(images)
            self._early_emb = None
        else:
            self._images_dev, self._early_emb = self._upload_and_encode(images)

        if video.get("query_masks") is not None:
            assert video.get("query_points") is None
            query_masks = np.asarray(video["query_masks"], np.float32)
            timesteps = np.asarray(video["query_point_timestep"], np.float32)
            query_points = self.extract_query_points(images, query_masks, timesteps)
        elif video.get("query_points") is not None:
            query_points = np.asarray(video["query_points"], np.float32)
            query_masks = self.extract_query_masks(
                images, query_points, embeddings=self._early_emb
            )
        else:
            raise ValueError("No query points or masks provided")
        n_masks, n_points, _ = query_points.shape

        if hasattr(self.point_tracker, "set_masks"):
            # SuperGlue keeps per-video mask state: `_track_points`' mask
            # batching would desync it (reference sam_pt.py:190 asserts too)
            assert self.point_tracker_mask_batch_size >= n_masks
            self.point_tracker.set_masks(query_masks)

        # device-logits mode: skip the logits download in _apply_sam entirely
        # (the reinit path composes logits on host and is excluded)
        self._keep_logits_device = (
            bool(video.get("keep_logits_on_device", False))
            and not self.use_point_reinit
        )

        if not self.use_point_reinit:
            trajectories, visibilities, logits, scores, scores_per_frame = (
                self._forward(images, query_points)
            )
        else:
            trajectories, visibilities, logits, scores, scores_per_frame = (
                self._forward_w_reinit(images, query_points)
            )

        target_hw = tuple(video["target_hw"])
        resize_factor = np.array(
            [target_hw[1] / w, target_hw[0] / h], np.float32
        )  # (x, y) scaling
        keep_device = getattr(self, "_keep_logits_device", False)
        if (h, w) != target_hw:
            from ..ops.resize import resize_bilinear

            logits_arr = jnp.asarray(logits)
            # Whole-plane -inf sentinels (gated / fully-invisible pairs)
            # would become all-NaN through the matmul-based resize
            # (0 * inf = NaN). Clamp to a finite floor for the resize, then
            # restore the sentinel planes exactly (the reference's
            # F.interpolate keeps them -inf, sam_pt.py:205-206, and
            # downstream consumers test `isneginf`).
            blank = jnp.isneginf(logits_arr).all(axis=(-2, -1))
            logits_arr = jnp.maximum(
                logits_arr, jnp.asarray(-30000.0, logits_arr.dtype)
            )
            logits_dev = resize_bilinear(
                logits_arr[..., None], target_hw
            )[..., 0]
            logits_dev = jnp.where(
                blank[..., None, None],
                jnp.asarray(NEG_INF, logits_dev.dtype),
                logits_dev,
            )
        elif isinstance(logits, jnp.ndarray) or keep_device:
            logits_dev = jnp.asarray(logits)
        else:
            # host numpy at target resolution already: no device round-trip
            logits_dev = logits
        trajectories = trajectories * resize_factor

        if keep_device:
            logits_out = logits_dev.astype(jnp.float16)
        else:
            logits_out = [m for m in np.asarray(logits_dev)]
            assert logits_out[0].shape == (t, *target_hw)
        assert trajectories.shape == (t, n_masks, n_points, 2)
        if isinstance(scores, jnp.ndarray):
            # device flow: everything stays as dispatched device arrays so
            # this call returns without a single blocking download —
            # consumers (eval fusion, viz) download lazily via np.asarray
            return {
                "logits": logits_out,
                "scores": scores,
                "scores_per_frame": scores_per_frame,
                "trajectories": trajectories,
                "visibilities": visibilities,
            }
        return {
            "logits": logits_out,
            "scores": list(np.asarray(scores, np.float64)),
            "scores_per_frame": np.asarray(scores_per_frame).tolist(),
            "trajectories": trajectories,
            "visibilities": visibilities,
        }

    # ------------------------------------------------------------------
    # Query preparation
    # ------------------------------------------------------------------
    def extract_query_points(
        self, images: np.ndarray, query_masks: np.ndarray, timesteps: np.ndarray
    ) -> np.ndarray:
        """Sample (t, x, y) query points from masks (reference :238-288)."""
        pos = self._select_points(
            images, query_masks, timesteps,
            self.positive_point_selection_method, self.positive_points_per_mask,
        )
        if self.negative_points_per_mask > 0:
            neg = self._select_points(
                images, 1.0 - query_masks, timesteps,
                self.negative_point_selection_method, self.negative_points_per_mask,
            )
            xy = [np.concatenate([p, n], axis=0) for p, n in zip(pos, neg)]
        else:
            xy = pos
        xy = np.stack(xy, axis=0)  # [M, P, 2]
        ts = np.broadcast_to(timesteps[:, None, None], (*xy.shape[:2], 1))
        return np.concatenate([ts, xy], axis=2).astype(np.float32)

    def _select_points(self, images, masks, timesteps, method, n) -> List[np.ndarray]:
        if method == "kmedoids":
            return [extract_kmedoid_points(m, n, rng=self.rng) for m in masks]
        if method == "shi-tomasi":
            return [
                extract_corner_points(images[int(t)], m, n, rng=self.rng)
                for m, t in zip(masks, timesteps)
            ]
        if method == "random":
            return [extract_random_mask_points(m, n, rng=self.rng) for m in masks]
        if method == "mixed":
            return extract_mixed_points(list(masks), timesteps, images, n, rng=self.rng)
        raise NotImplementedError(f"Point selection method {method}")

    def extract_query_masks(
        self, images: np.ndarray, query_points: np.ndarray,
        embeddings=None,
    ) -> np.ndarray:
        """Query masks from query points via SAM (reference :308-335).

        `embeddings`: precomputed frame embeddings aligned with `images`
        (sliced per query frame here) — the plain path already encoded the
        whole video, so don't re-run the encoder on the query frames.
        """
        qidx = query_points[:, 0, 0].astype(np.int64)
        frames = images[qidx]  # [M, H, W, 3]
        emb = _emb_index(embeddings, qidx) if embeddings is not None else None
        # each mask's query frame becomes its own "frame" axis entry, with a
        # single mask per frame (reference :329-335)
        traj = query_points[:, None, :, 1:]  # [frames=M, masks=1, P, 2]
        vis = np.ones(traj.shape[:-1], np.float32)
        prev_mode = getattr(self, "_keep_logits_device", False)
        self._keep_logits_device = False  # this helper needs host masks
        try:
            _, logits, _ = self._apply_sam(frames, traj, vis, embeddings=emb)
        finally:
            self._keep_logits_device = prev_mode
        # logits: [masks=1, frames=M, H, W] -> [M, H, W]
        return (logits[0] > self.sam_predictor.model.mask_threshold).astype(np.float32)

    # ------------------------------------------------------------------
    # Plain forward
    # ------------------------------------------------------------------
    def _forward(self, images, query_points):
        dev = getattr(self, "_images_dev", None)
        emb = getattr(self, "_early_emb", None)
        if self._use_device_flow():
            t, h, w, _ = images.shape
            trajectories, visibilities = self._track_points_device(
                dev, query_points, (h, w)
            )
            if emb is None:
                emb = self._encode_all_frames(dev)
            _, logits, scores_per_frame = self._apply_sam_device(
                (h, w), trajectories, visibilities, emb
            )
            # plain mean INCLUDING the -inf no-visible-prompt sentinels —
            # reference parity (sam_pt.py:352 discards the finite-only
            # pred_scores the same way); the VIS boundary maps non-finite
            # scores to 0.0 (vis_eval/eval.py predictions_to_records)
            scores = scores_per_frame.mean(axis=0)
            return trajectories, visibilities, logits, scores, scores_per_frame
        trajectories, visibilities = self._track_points(
            images, query_points, images_dev=dev
        )
        _, logits, scores_per_frame = self._apply_sam(
            images, trajectories, visibilities,
            embeddings=emb, device_images=dev,
        )
        with np.errstate(invalid="ignore"):
            scores = scores_per_frame.mean(axis=0)
        return trajectories, visibilities, logits, scores, scores_per_frame

    def _use_device_flow(self) -> bool:
        """Whether the fully device-resident fast path applies.

        The device flow keeps trajectories/visibilities/prompts/scores as
        dispatched device arrays end-to-end, so `forward` never blocks on a
        download and consecutive videos pipeline on the host (the tracker
        download was a ~1 s host stall per video). Host-logic features
        (reinit's data-dependent control flow, the patch-filter cascade,
        capped other-object subsampling with host RNG, stateful SuperGlue
        masks) fall back to the host path with identical semantics.
        """
        return (
            getattr(self, "_keep_logits_device", False)
            and not self.use_point_reinit
            and not self.use_patch_matching_filtering
            and not (
                self.add_other_objects_positive_points_as_negative_points
                and self.max_other_objects_positive_points is not None
            )
            and hasattr(self.point_tracker, "forward_device")
            and not hasattr(self.point_tracker, "set_masks")
        )

    def _track_points_device(self, images_dev, query_points, hw):
        """Device-resident `_track_points`: same mask batching and OOB
        marking, no host download (patch filtering is excluded by
        `_use_device_flow`)."""
        h, w = hw
        t = images_dev.shape[0]
        m, p, _ = query_points.shape
        bs = self.point_tracker_mask_batch_size

        video_b = images_dev[None]  # one object -> tracker feature cache hits
        trajs, viss = [], []
        for i in range(0, m, bs):
            batch = query_points[i : i + bs].reshape(1, -1, 3)
            out_t, out_v = self.point_tracker.forward_device(video_b, batch)
            nb = min(bs, m - i)
            trajs.append(out_t[0].reshape(t, nb, p, 2))
            viss.append(out_v[0].reshape(t, nb, p))
        trajectories = (
            jnp.concatenate(trajs, axis=1) if len(trajs) > 1 else trajs[0]
        ).astype(jnp.float32)
        visibilities = (
            jnp.concatenate(viss, axis=1) if len(viss) > 1 else viss[0]
        ).astype(jnp.float32)

        x, y = trajectories[..., 0], trajectories[..., 1]
        oob = (x / w < 0.01) | (x / w > 0.99) | (y / h < 0.01) | (y / h > 0.99)
        visibilities = jnp.where(
            oob, float(PointVisibilityType.OUTSIDE_FRAME), visibilities
        )
        return trajectories, visibilities

    def _apply_sam_device(self, hw, trajectories, visibilities, embeddings):
        """Device-resident `_apply_sam`: prompts built on device
        (`_build_prompts_jit`), IoU gating/scoring as dispatched ops, logits
        float16 on device. Semantically identical to the host path with
        `keep_logits_on_device` (slot order of other-object points differs,
        which the decoder is invariant to — prompt tokens are encoded from
        coordinates, not slot index)."""
        h, w = hw
        t, m = trajectories.shape[0], trajectories.shape[1]

        points, labels = _build_prompts_jit(
            trajectories,
            visibilities,
            self.positive_points_per_mask,
            self.negative_points_per_mask > 0,
            self.add_other_objects_positive_points_as_negative_points,
        )
        n_prompt = points.shape[2]
        b = t * m
        pts_flat = points.reshape(b, n_prompt, 2)
        lbl_flat = labels.reshape(b, n_prompt)
        emb_flat = np.repeat(np.arange(t), m)
        has_visible = (lbl_flat != -1).any(axis=1)  # [B] device

        logits_dev, iou_all = self._decode_all_pairs(
            embeddings, emb_flat, pts_flat, lbl_flat, (h, w)
        )
        passed = has_visible & (iou_all >= self.sam_iou_threshold)
        logits = self._gate_logits(logits_dev, passed, t, m, h, w)
        pred_scores, scores_per_frame = self._scores_from_iou(
            jnp, has_visible, iou_all, t, m
        )
        return pred_scores, logits, scores_per_frame

    def _decode_all_pairs(self, embeddings, emb_flat, pts_flat, lbl_flat, hw,
                          chain=None):
        """Chunked padded batched decode chain over all (frame, mask) pairs —
        the ONE decode loop shared by the host and device `_apply_sam`
        flavors (and, via the `chain` override, the interactive per-frame
        sweep). Prompt arrays may be host numpy or device arrays; returns
        DEVICE (upscaled logits [B, h, w], iou [B] float32). The last chunk
        is padded to the full chunk size so every call shares one compiled
        program; nothing here blocks — downloads are the caller's choice."""
        h, w = hw
        b = pts_flat.shape[0]
        pts_all = jnp.asarray(pts_flat)
        lbl_all = jnp.asarray(lbl_flat)
        chunk = min(self.sam_decode_chunk, b)
        if self._data_sharding is not None:
            ndev = int(self.mesh.devices.size)
            chunk = min(self.sam_decode_chunk,
                        ((b + ndev - 1) // ndev) * ndev)
        if chain is None:
            chain = self._get_chain_fn((h, w), upscale=True)
        dev_chunks, iou_chunks = [], []
        for i in range(0, b, chunk):
            sl = slice(i, min(i + chunk, b))
            nb = sl.stop - sl.start
            pad = chunk - nb
            idx = np.concatenate([np.arange(sl.start, sl.stop),
                                  np.full(pad, sl.start)])
            idx_dev = jnp.asarray(idx)
            emb = self._shard(_emb_index(embeddings, jnp.asarray(emb_flat[idx])))
            pts = self._shard(pts_all[idx_dev])
            lbl = self._shard(lbl_all[idx_dev])
            up, iou = chain(self.sam_predictor.params, emb, pts, lbl)
            dev_chunks.append(up[:nb])
            iou_chunks.append(iou[:nb])
        logits = (
            jnp.concatenate(dev_chunks, axis=0) if len(dev_chunks) > 1
            else dev_chunks[0]
        )
        iou_all = (
            jnp.concatenate(iou_chunks) if len(iou_chunks) > 1
            else iou_chunks[0]
        )
        return logits, iou_all

    @staticmethod
    def _gate_logits(logits_dev, passed_dev, t, m, h, w):
        """Blank failed pairs to the -inf sentinel and lay out [M, T, h, w]
        (shared by both `_apply_sam` flavors; runs on device)."""
        logits = jnp.where(
            passed_dev[:, None, None], logits_dev,
            jnp.asarray(NEG_INF, logits_dev.dtype),
        )
        return logits.reshape(t, m, h, w).transpose(1, 0, 2, 3)

    def _scores_from_iou(self, xp, has_visible, iou_all, t, m):
        """Per-frame scores (-inf where no prompt point was visible) and the
        finite-frames-mean pred_scores — the reference
        `_apply_sam_to_trajectories` scoring (:840-866). `xp` is np for the
        host flavor, jnp for the device flavor."""
        scores_per_frame = xp.where(has_visible, iou_all, NEG_INF).reshape(t, m)
        hv = has_visible.reshape(t, m)
        counts = hv.sum(axis=0)
        sums = xp.where(hv, iou_all.reshape(t, m), 0.0).sum(axis=0)
        pred_scores = sums / xp.where(counts != 0, counts, 1)
        return pred_scores, scores_per_frame

    # ------------------------------------------------------------------
    # Tracking + filtering
    # ------------------------------------------------------------------
    def _track_points(self, images, query_points, images_dev=None):
        """Run the tracker in mask batches; apply patch filtering + OOB marks.

        `images_dev` is the matching device-resident uint8 copy, if the
        caller has one (saves the upload). Returns
        (trajectories [T, M, P, 2], visibilities [T, M, P]) float32.
        """
        t, h, w, _ = images.shape
        m, p, _ = query_points.shape
        bs = self.point_tracker_mask_batch_size

        images_for_tracker = images if images_dev is None else images_dev

        # ONE batched-video object across mask batches: trackers key their
        # per-video feature cache on this object's identity, so the CNN
        # encoder runs once per video instead of once per mask batch
        video_b = images_for_tracker[None]
        trajs, viss = [], []
        for i in range(0, m, bs):
            batch = query_points[i : i + bs].reshape(1, -1, 3)
            out_t, out_v = self.point_tracker.forward(video_b, batch)
            nb = min(bs, m - i)
            trajs.append(out_t[0].reshape(t, nb, p, 2))
            viss.append(out_v[0].reshape(t, nb, p))
        trajectories = np.concatenate(trajs, axis=1).astype(np.float32)
        visibilities = np.concatenate(viss, axis=1).astype(np.float32)

        if self.use_patch_matching_filtering:
            visibilities = self._patch_filter(
                images_for_tracker, query_points, trajectories, visibilities
            )

        # out-of-frame marking (reference :684-690)
        x, y = trajectories[..., 0], trajectories[..., 1]
        oob = (x / w < 0.01) | (x / w > 0.99) | (y / h < 0.01) | (y / h > 0.99)
        visibilities = np.where(
            oob, float(PointVisibilityType.OUTSIDE_FRAME), visibilities
        )
        return trajectories, visibilities

    def _patch_filter(self, images, query_points, trajectories, visibilities):
        """LAB patch-similarity filtering (reference :597-681).

        The LAB conversion and all patch extractions/similarities run as ONE
        jitted program over every (frame, point) pair; only the cascade
        rejection (tiny [T, M*P] bookkeeping) stays on host.
        """
        t, m, p, _ = trajectories.shape
        flat_traj = trajectories.reshape(t, m * p, 2)
        qp = query_points.reshape(m * p, 3)

        sims = np.asarray(
            _patch_similarities_jit(
                jnp.asarray(images),
                jnp.asarray(flat_traj),
                jnp.asarray(qp),
                self.patch_size,
            )
        )
        similar = sims > self.patch_similarity_threshold  # [T, M*P]
        vis = visibilities.reshape(t, m * p).copy()
        vis[(vis == 1) & ~similar] = float(PointVisibilityType.PATCH_NON_SIMILAR)

        # cascade rejection after the first non-similar frame (reference :663-681)
        qts = qp[:, 0].astype(np.int64)
        tgrid = np.arange(t)[:, None]
        bad = vis == float(PointVisibilityType.PATCH_NON_SIMILAR)
        after = bad & (tgrid > qts[None, :])
        # first bad frame after the query timestep, per point
        first_after = np.where(
            after.any(0), np.argmax(after, axis=0), t + 1
        )
        reject_fwd = tgrid > first_after[None, :]
        before = bad & (tgrid < qts[None, :])
        # last bad frame before the query timestep (reference scans downward)
        rev = before[::-1]
        last_before = np.where(
            before.any(0), t - 1 - np.argmax(rev, axis=0), -1
        )
        reject_bwd = tgrid < last_before[None, :]
        vis = np.where(
            reject_fwd | reject_bwd,
            float(PointVisibilityType.REJECTED_AFTER_PATCH_WAS_NON_SIMILAR),
            vis,
        )
        return vis.reshape(t, m, p)

    # ------------------------------------------------------------------
    # Batched SAM application
    # ------------------------------------------------------------------
    def _build_prompts(
        self, trajectories: np.ndarray, visibilities: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(frame, mask) prompt arrays with fixed padded shapes.

        trajectories: [T, M, P, 2]; visibilities: [T, M, P].
        Returns points [T, M, N, 2], labels [T, M, N] with
        N = P + other_slots (+2 reserved box-corner slots appended by the
        refinement passes, not here).
        """
        t, m, p, _ = trajectories.shape
        n_pos = self.positive_points_per_mask
        visible = visibilities == 1

        labels = np.full((t, m, p), -1, np.int64)
        base = np.ones((p,), np.int64)
        if self.negative_points_per_mask > 0:
            base[n_pos:] = 0
        labels[:, :, :] = np.where(visible, base[None, None, :], -1)
        points = trajectories.copy()

        if m > 1 and self.add_other_objects_positive_points_as_negative_points:
            cap = self.max_other_objects_positive_points
            other_slots = (m - 1) * n_pos if cap is None else cap
            opts = np.zeros((t, m, other_slots, 2), np.float32)
            olbl = np.full((t, m, other_slots), -1, np.int64)
            pos_traj = trajectories[:, :, :n_pos, :]
            pos_vis = visible[:, :, :n_pos]
            for mi in range(m):
                others = [o for o in range(m) if o != mi]
                coords = pos_traj[:, others].reshape(t, -1, 2)
                vis = pos_vis[:, others].reshape(t, -1)
                for fi in range(t):
                    vc = coords[fi][vis[fi]]
                    if cap is not None and len(vc) > cap:
                        idx = self.rng.choice(len(vc), cap, replace=False)
                        vc = vc[idx]
                    k = min(len(vc), other_slots)
                    opts[fi, mi, :k] = vc[:k]
                    olbl[fi, mi, :k] = 0
            points = np.concatenate([points, opts], axis=2)
            labels = np.concatenate([labels, olbl], axis=2)

        return points.astype(np.float32), labels

    def _apply_sam(
        self,
        images: np.ndarray,
        trajectories: np.ndarray,
        visibilities: np.ndarray,
        embeddings: Optional[jnp.ndarray] = None,
        device_images=None,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Batched SAM over all (frame, mask) pairs.

        Returns (pred_scores [M], logits [M, T, H, W], scores_per_frame [T, M])
        — the reference `_apply_sam_to_trajectories` contract (:694-866).
        `embeddings` may be precomputed (e.g. once per video for the reinit
        path, whose windows overlap) — otherwise frames are embedded here.
        """
        t, h, w, _ = images.shape
        _, m, p, _ = trajectories.shape
        original_hw = (h, w)
        predictor = self.sam_predictor

        # 1. Embed all frames once (chunked), unless given.
        if embeddings is None:
            src = images if device_images is None else device_images
            embeddings = self._encode_all_frames(src)  # [T, g, g, 256]

        # 2. Assemble prompts, flatten (T, M) -> B.
        points, labels = self._build_prompts(trajectories, visibilities)
        n_prompt = points.shape[2]
        b = t * m
        pts_flat = points.reshape(b, n_prompt, 2)
        lbl_flat = labels.reshape(b, n_prompt)
        emb_flat = np.repeat(np.arange(t), m)  # embedding index per pair

        # A pair is decoded (and its IoU recorded) whenever ANY prompt point
        # is visible — positive or negative, own or other-object. The
        # reference only returns an empty mask when the visible point set is
        # completely empty (sam_pt.py:765-767 "Mask is empty if all points
        # are invisible"), so gating on positives alone would blank frames
        # the reference still scores.
        has_visible = (lbl_flat != -1).any(axis=1)

        # 3. Chunked batched decode with chaining + refinement (the shared
        # `_decode_all_pairs` loop). Low-res logits stay ON DEVICE; chunks
        # are upscaled there and the result downloaded once as float16 (SAM
        # logits are O(10) with a 0.0 decision threshold, so fp16's mantissa
        # is far below the mask-boundary noise floor — and the transfer is
        # half the bytes). Dispatching every chunk before any download keeps
        # the device pipeline full (the old per-chunk download synced).
        keep_device = getattr(self, "_keep_logits_device", False)
        logits_dev, iou_dev = self._decode_all_pairs(
            embeddings, emb_flat, pts_flat, lbl_flat, original_hw
        )
        iou_all = np.asarray(iou_dev)
        passed = has_visible & (iou_all >= self.sam_iou_threshold)
        logits = self._gate_logits(
            logits_dev, jnp.asarray(passed), t, m, h, w
        )
        if not keep_device:
            logits = np.asarray(logits).astype(np.float32)  # [M, T, H, W]
        pred_scores, scores_per_frame = self._scores_from_iou(
            np, has_visible, iou_all, t, m
        )
        return pred_scores, logits, scores_per_frame

    def _upload_and_encode(self, images: np.ndarray):
        """Chunked video upload interleaved with SAM encode dispatch.

        Returns (device uint8 video [T, H, W, 3], embeddings [T, g, g, 256]).
        Uploading chunk i+1 overlaps the device encoding chunk i, hiding most
        of the transfer latency behind encoder compute. (A single whole-video
        `device_put` was tried in r5 — faster in isolation, ~2x slower inside
        the pipelined loop; see `_upload_video`.)
        """
        t = images.shape[0]
        ec = self.sam_encode_chunk
        uc = self.upload_chunk or ec
        assert uc % ec == 0, (uc, ec)
        hw = (images.shape[1], images.shape[2])
        dev_chunks, emb_chunks = [], []
        for u in range(0, t, uc):
            dev = jnp.asarray(images[u : u + uc])
            dev_chunks.append(dev)
            # encode `ec`-frame device slices of the uploaded block; the
            # next block's transfer rides under these encodes
            for i in range(0, dev.shape[0], ec):
                chunk = dev[i : i + ec]
                pad = ec - chunk.shape[0]
                if pad:
                    chunk = jnp.concatenate(
                        [chunk, jnp.repeat(chunk[-1:], pad, axis=0)], axis=0
                    )
                emb = self.sam_predictor.encode_frames(
                    self._shard(chunk), hw)
                emb_chunks.append(
                    jax.tree_util.tree_map(lambda a: a[: ec - pad], emb)
                )
        video = (
            jnp.concatenate(dev_chunks, axis=0)
            if len(dev_chunks) > 1 else dev_chunks[0]
        )
        emb = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *emb_chunks
        )
        return video, emb

    def _upload_video(self, images: np.ndarray) -> jnp.ndarray:
        """Chunked host->device transfer of a whole uint8 video.

        A single whole-video `jax.device_put` measures FASTER in isolation
        (1711 vs 174 MB/s, scripts/diag_upload.py) but ~equal-to-2x SLOWER
        inside the pipelined eval loop (scripts/ab_upload_path.py, same-
        process A/B over the full bench schedule) — the big blocking
        transfer serializes against in-flight compute dispatch, while
        chunked `jnp.asarray` uploads interleave with it. Keep chunks.
        """
        uc = self.upload_chunk or self.sam_encode_chunk
        chunks = [jnp.asarray(images[i : i + uc])
                  for i in range(0, images.shape[0], uc)]
        return jnp.concatenate(chunks, axis=0) if len(chunks) > 1 else chunks[0]

    def _encode_all_frames(self, images) -> jnp.ndarray:
        """images: [T, H, W, 3] uint8 (numpy or already on device)."""
        if not isinstance(images, jax.Array):
            images = self._upload_video(np.asarray(images))
        t = images.shape[0]
        chunks = []
        ec = self.sam_encode_chunk
        for i in range(0, t, ec):
            chunk = images[i : i + ec]
            pad = ec - chunk.shape[0]
            if pad:
                chunk = jnp.concatenate(
                    [chunk, jnp.repeat(chunk[-1:], pad, axis=0)], axis=0
                )
            emb = self.sam_predictor.encode_frames(
                self._shard(chunk), (images.shape[1], images.shape[2])
            )
            chunks.append(jax.tree_util.tree_map(lambda a: a[: ec - pad], emb))
        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *chunks
        )

    def _get_chain_fn(self, original_hw, upscale: bool):
        """Jitted SAM decoder chain for one chunk of (frame, mask) pairs.

        Implements: single pass (no negatives), or positives-only pass ->
        all-points + mask-input pass (reference :782-807), then
        `iterative_refinement_iterations` box-refinement passes (:809-828).
        The ENTIRE chain (up to 14 decoder passes) plus the final upscale is
        one jitted program — one dispatch per chunk instead of one per pass
        (dispatch latency is a first-order cost on remote-attached TPUs).
        The returned fn maps (params, emb, pts, lbl) -> (low_res or upscaled
        logits, iou); compiled programs are cached per shape/flag key.

        Pass 1's output is fed as pass 2's mask input UNCONDITIONALLY, like
        the reference (sam_pt.py:792-807) — including for pairs with no
        visible positive points, where pass 1 is a decode from the lone
        not-a-point pad token (the reference's empty `point_coords` plus the
        auto-appended pad produces the identical token set).
        """
        key = (
            tuple(original_hw),
            upscale,
            self.iterative_refinement_iterations,
            self.negative_points_per_mask > 0,
            self.logits_dtype,
        )
        if key not in self._chain_fns:
            predictor = self.sam_predictor
            use_chain = self.negative_points_per_mask > 0
            refine_iters = self.iterative_refinement_iterations

            def chain(params, emb, pts, lbl):
                pts_model = predictor.scale_coords(pts, original_hw)
                if not use_chain:
                    masks, iou = predictor._decode(
                        params, emb, pts_model, lbl, None, None,
                        only_token0=True,
                    )
                    low, iou = masks[:, 0], iou[:, 0]
                else:
                    pos_lbl = jnp.where(lbl == 1, 1, -1)
                    masks1, _ = predictor._decode(
                        params, emb, pts_model, pos_lbl, None, None,
                        only_token0=True,
                    )
                    masks, iou = predictor._decode(
                        params, emb, pts_model, lbl,
                        masks1[:, 0, :, :, None], None,
                        only_token0=True,
                    )
                    low, iou = masks[:, 0], iou[:, 0]
                if refine_iters:
                    # The refinement passes are shape-identical, so a
                    # while_loop compiles the body ONCE (the unrolled
                    # 12-pass chain was a 10x larger HLO whose cold compile
                    # through the remote toolchain ran past the driver's
                    # whole bench budget). The loop also stops early at the
                    # exact fixed point: when a pass leaves (low, iou)
                    # bit-identical, every remaining pass — a deterministic
                    # function of that state — would too, so the output is
                    # BIT-EQUAL to running this same compiled body
                    # unconditionally refine_iters times (pinned by
                    # tests/test_refine_while_loop.py), i.e. the
                    # reference's 12-pass semantics (sam_pt.py:809-828),
                    # while most chunks converge in a few passes. NaN
                    # logits compare unequal and simply forfeit the early
                    # exit.
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
                if upscale:
                    up = predictor.upscale_logits(low, original_hw)
                    return up.astype(self.logits_dtype), iou
                return low, iou

            self._chain_fns[key] = jax.jit(chain)
        return self._chain_fns[key]

    def _box_refine_impl(self, params, emb, pts_model, lbl, low, iou,
                         original_hw):
        """One box-refinement pass (traced inline).

        Exact reference semantics (sam_pt/modeling/sam_pt.py:809-828): the
        box is the extent of the FULL-RES upsampled mask (`mask_frame_logits
        > 0` at original resolution), with a per-element stop once the mask
        has < 2 pixels. The reference passes those original-image pixel
        coordinates to `predict_torch` WITHOUT `transform.apply_coords`
        (predict_torch expects model-input coords, :821-828) — so the prompt
        encoder reads them as model-space values; we replicate that verbatim
        by appending the raw coords next to the already-scaled `pts_model`.
        XLA fuses the upsample matmuls with the >0 compare and the row/col
        reductions, so the full-res plane is never round-tripped to HBM.
        """
        predictor = self.sam_predictor
        up = predictor.upscale_logits(low, original_hw)  # [B, H, W]
        mask = up > 0
        h, w = mask.shape[1], mask.shape[2]
        area = mask.sum(axis=(1, 2))
        active = area >= 2

        ys = jnp.arange(h, dtype=jnp.float32)
        xs = jnp.arange(w, dtype=jnp.float32)
        big = jnp.float32(1e9)
        y_any = mask.any(axis=2)
        x_any = mask.any(axis=1)
        ymin = jnp.min(jnp.where(y_any, ys, big), axis=1)
        ymax = jnp.max(jnp.where(y_any, ys, -big), axis=1)
        xmin = jnp.min(jnp.where(x_any, xs, big), axis=1)
        xmax = jnp.max(jnp.where(x_any, xs, -big), axis=1)
        box = jnp.stack([xmin, ymin, xmax, ymax], axis=1)

        corner_pts = box.reshape(-1, 2, 2)
        corner_lbl = jnp.where(
            active[:, None], jnp.array([2, 3], jnp.int32)[None, :], -1
        )
        pts2 = jnp.concatenate([pts_model, corner_pts], axis=1)
        lbl2 = jnp.concatenate([lbl, corner_lbl], axis=1)

        masks, new_iou = predictor._decode(
            params, emb, pts2, lbl2,
            low[:, :, :, None], jnp.ones(low.shape[0], bool),
            only_token0=True,
        )
        new_low, new_iou = masks[:, 0], new_iou[:, 0]
        low = jnp.where(active[:, None, None], new_low, low)
        iou = jnp.where(active, new_iou, iou)
        return low, iou

    # ------------------------------------------------------------------
    # Point re-initialization (reference :355-543)
    # ------------------------------------------------------------------
    def _forward_w_reinit(self, images, query_points):
        """Bidirectional reinit: run the horizon-chunked pipeline on the
        original and the time-flipped video, stitch at each mask's query frame
        (reference :355-408)."""
        t = images.shape[0]
        qts = query_points[:, 0, 0].astype(np.int64)

        # One upload + one encode pass serve BOTH directions: the flipped
        # direction reuses the device copy and per-frame embeddings reversed
        # on device (no second host transfer, no re-encode).
        images_dev = getattr(self, "_images_dev", None)
        if images_dev is None:
            images_dev = jnp.asarray(images)
        embeddings = self._encode_all_frames(images_dev)

        r2l = self._forward_w_reinit_inner(
            images, query_points, images_dev=images_dev, embeddings=embeddings
        )

        if (qts == 0).all():
            # every query starts at frame 0 (the standard VOS case): the
            # backward stitch prefix is empty for all masks, so the flipped
            # pass would be computed and fully discarded — skip it.
            traj_r, vis_r, logits_r, _, spf_r = r2l
            assert not np.isnan(traj_r).any()
            with np.errstate(invalid="ignore"):
                scores = np.nanmean(spf_r, axis=0)
            return traj_r, vis_r, logits_r, scores, spf_r

        images_flipped = images[::-1].copy()
        qp_flipped = query_points.copy()
        qp_flipped[:, :, 0] = t - query_points[:, :, 0] - 1
        rev = slice(None, None, -1)
        l2r = self._forward_w_reinit_inner(
            images_flipped, qp_flipped,
            images_dev=images_dev[::-1],
            embeddings=_emb_index(embeddings, rev),
        )
        traj_l, vis_l, logits_l, _, spf_l = l2r
        traj_l = traj_l[::-1]
        vis_l = vis_l[::-1]
        logits_l = logits_l[:, ::-1]
        # Reference quirk replicated verbatim: the backward pass's
        # scores_per_frame is NOT time-flipped before the stitch
        # (sam_pt.py:386-388 flips trajectories/visibilities/logits only),
        # so spf rows before each query timestep come from the UNFLIPPED
        # backward array — whose first (flipped) rows were never tracked and
        # hold NaN. Final `scores` therefore nanmean over the forward
        # stretch only. Purely diagnostic output, so parity wins over a fix.
        traj_r, vis_r, logits_r, _, spf_r = r2l

        tgrid = np.arange(t)
        trajectories = traj_r.copy()
        visibilities = vis_r.copy()
        logits = logits_r.copy()
        spf = spf_r.copy()
        for mi, ts in enumerate(qts):
            before = tgrid < ts
            trajectories[before, mi] = traj_l[before, mi]
            visibilities[before, mi] = vis_l[before, mi]
            logits[mi, before] = logits_l[mi, before]
            spf[before, mi] = spf_l[before, mi]
        assert not np.isnan(trajectories).any()
        with np.errstate(invalid="ignore"):
            scores = np.nanmean(spf, axis=0)
        return trajectories, visibilities, logits, scores, spf

    def _forward_w_reinit_inner(self, images, query_points,
                                images_dev=None, embeddings=None):
        """One temporal direction of horizon-chunked tracking with point
        re-initialization from SAM's predicted masks (reference :410-543).

        TPU-first deltas vs the reference: SAM frame embeddings are computed
        ONCE for the whole video and sliced per horizon window (the reference
        re-encodes each overlapping window, :449), and REINIT_FAILED
        visibility is applied only to the failed masks (the reference marks
        all currently tracked masks, :538 — a bug we do not replicate; final
        logits are identical since they are maintained separately).
        """
        t, h, w, _ = images.shape
        m, p, _ = query_points.shape
        assert self.reinit_point_tracker_horizon >= self.reinit_horizon

        trajectories = np.full((t, m, p, 2), np.nan, np.float32)
        visibilities = np.zeros((t, m, p), np.float32)
        scores_per_frame = np.full((t, m), np.nan, np.float32)
        logits = np.full((m, t, h, w), np.nan, np.float32)

        # device copy + embeddings are normally shared across both temporal
        # directions by the caller (reversed on device for the flipped one);
        # windows below slice them on device
        if images_dev is None:
            images_dev = jnp.asarray(images)
        if embeddings is None:
            embeddings = self._encode_all_frames(images_dev)

        current_qp = query_points.copy()
        start0 = int(query_points[:, 0, 0].min())
        for start in range(start0, t):
            end = min(start + self.reinit_horizon, t)
            end_tracker = min(start + self.reinit_point_tracker_horizon, t)
            current_ts = current_qp[:, 0, 0].astype(np.int64)
            tracked = current_ts == start
            if not tracked.any():
                continue

            qp_i = current_qp[tracked].copy()
            qp_i[:, :, 0] -= start

            if hasattr(self.point_tracker, "set_masks"):
                assert self.point_tracker_mask_batch_size >= m
                q_masks = self.extract_query_masks(
                    images[start:end_tracker], qp_i,
                    embeddings=_emb_index(
                        embeddings, slice(start, end_tracker)
                    ),
                )
                self.point_tracker.set_masks(q_masks)

            traj_i, vis_i = self._track_points(
                images[start:end_tracker], qp_i,
                images_dev=images_dev[start:end_tracker],
            )
            traj_i = traj_i[: self.reinit_horizon]
            vis_i = vis_i[: self.reinit_horizon]

            _, logits_i, spf_i = self._apply_sam(
                images[start:end],
                traj_i[: end - start],
                vis_i[: end - start],
                embeddings=_emb_index(embeddings, slice(start, end)),
            )
            pred_masks_i = logits_i > 0  # [m_i, end-start, h, w]

            logits[tracked, start:end] = logits_i
            trajectories[start:end, tracked] = traj_i[: end - start]
            visibilities[start:end, tracked] = vis_i[: end - start]
            scores_per_frame[start:end, tracked] = spf_i

            if end == t:
                continue

            # mask areas per window frame (excluding the start frame)
            area = pred_masks_i[:, 1:].sum(axis=(2, 3)).astype(np.float64)
            area[area <= 25] = np.nan
            if self.reinit_horizon // 4 < area.shape[1]:
                area[:, : self.reinit_horizon // 4] = np.nan

            next_ts = self._choose_reinit_timestep(
                area, pred_masks_i, current_ts, start
            )

            with np.errstate(invalid="ignore"):
                chosen_area = area[np.arange(len(next_ts)), next_ts]
            # NaN chosen area = every candidate mask in the window was empty
            # or tiny (<= 25 px, masked to NaN above). The reference's
            # failure branch (:508-539, query points pushed past the video
            # end + -inf logits) is DEAD CODE in torch: its test is
            # `area_per_frame[...] <= 0` where masked entries are NaN, and
            # NaN <= 0 is False — so the reference re-inits from the empty
            # mask, whose samplers return all-zero points with a warning
            # (utils/query_points.py:46-48). Default = that exact behavior;
            # `fail_on_empty_reinit_mask=True` opts into the degradation the
            # reference AUTHORED but never reaches (an extension, kept
            # because -inf-ing a lost object beats tracking from (0, 0)).
            if self.fail_on_empty_reinit_mask:
                invalid = np.nan_to_num(chosen_area, nan=0.0) <= 0
            else:
                invalid = np.zeros(len(next_ts), bool)

            tracked_idx = np.nonzero(tracked)[0]
            if (~invalid).any():
                q_masks = pred_masks_i[:, 1:][
                    np.arange(len(next_ts)), next_ts
                ].astype(np.float32)
                qp_update = self.extract_query_points(
                    images[start + 1 : end],
                    q_masks[~invalid],
                    next_ts[~invalid].astype(np.float32),
                )
                valid_idx = tracked_idx[~invalid]
                current_qp[valid_idx] = qp_update
                current_qp[valid_idx, :, 0] += start + 1

            if invalid.any():
                inv_idx = tracked_idx[invalid]
                current_qp[inv_idx, :, 0] = t  # never tracked again
                current_qp[inv_idx, :, 1:] = 0
                trajectories[end:, inv_idx] = -72
                visibilities[end:, inv_idx] = float(
                    PointVisibilityType.REINIT_FAILED
                )
                logits[inv_idx, end:] = NEG_INF

        with np.errstate(invalid="ignore"):
            scores = np.nanmean(scores_per_frame, axis=0)
        # frames never reached keep NaN logits -> treat as empty masks.
        # NOT np.nan_to_num: its posinf/neginf defaults also rewrite the
        # -inf empty-prompt sentinels to finite float-min, silently
        # un-blanking windows that decoded from zero visible points.
        logits = np.where(np.isnan(logits), NEG_INF, logits)
        trajectories = np.where(np.isnan(trajectories), -72.0, trajectories)
        return trajectories, visibilities, logits, scores, scores_per_frame

    def _choose_reinit_timestep(self, area, pred_masks_i, current_ts, start):
        """Pick the window frame to re-initialize from, per variant
        (reference :472-503). Indices are relative to window frames [1:]."""
        n = area.shape[0]
        variant = self.reinit_variant
        if variant == "reinit-on-horizon-and-sync-masks":
            nxt = self.reinit_horizon - 1 - 1
            others = current_ts[current_ts > start]
            if len(others) > 0:
                nxt = min(nxt, int(others.min()) - start - 1)
            return np.full((n,), min(nxt, area.shape[1] - 1), np.int64)
        if variant == "reinit-at-median-of-area-diff":
            # index of the (nan-)median area per mask
            out = np.zeros((n,), np.int64)
            for i in range(n):
                vals = area[i]
                if np.isnan(vals).all():
                    out[i] = 0
                    continue
                # torch.nanmedian returns the LOWER median element (and its
                # index) for even counts, unlike np.nanmedian which averages
                # the two middle values — pick the lower median directly.
                finite_vals = np.sort(vals[~np.isnan(vals)])
                med = finite_vals[(finite_vals.size - 1) // 2]
                finite = np.where(np.isnan(vals), np.inf, np.abs(vals - med))
                out[i] = int(finite.argmin())
            return out
        if variant == "reinit-on-similar-mask-area":
            target = pred_masks_i[:, 0].sum(axis=(1, 2)).astype(np.float64)
            diff = np.abs(area - target[:, None])
            diff = np.where(np.isnan(diff), np.inf, diff)
            return diff.argmin(axis=1)
        if variant == "reinit-on-similar-mask-area-and-sync-masks":
            target = pred_masks_i[:, 0].sum(axis=(1, 2)).astype(np.float64)
            diff = np.abs(area - target[:, None]) / np.maximum(target[:, None], 1)
            diff = np.where(np.isnan(diff), 720.0, diff)
            per_frame = diff.sum(axis=0)
            others = current_ts[current_ts > start]
            if len(others) > 0:
                sync = int(others.min()) - start - 1
                if 0 <= sync < len(per_frame):
                    per_frame[sync] -= 36.0
            return np.full((n,), int(per_frame.argmin()), np.int64)
        raise ValueError(f"Unknown reinit variant: {variant}")
