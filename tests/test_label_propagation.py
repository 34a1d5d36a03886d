"""Parity test for DINO label propagation vs a torch transcription of the
reference (sam_pt/point_tracker/utils/test.py:54-118 — the reference module
itself hard-codes .cuda() so it cannot run here; the math is transcribed
verbatim on CPU torch)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from sam_pt_tpu.ops.label_propagation import (  # noqa: E402
    label_propagation,
    norm_mask,
    restrict_neighborhood,
)


def ref_restrict_neighborhood(h, w, size=12):
    mask = torch.zeros(h, w, h, w)
    for i in range(h):
        for j in range(w):
            for p in range(2 * size + 1):
                for q in range(2 * size + 1):
                    if i - size + p < 0 or i - size + p >= h:
                        continue
                    if j - size + q < 0 or j - size + q >= w:
                        continue
                    mask[i, j, i - size + p, j - size + q] = 1
    return mask.reshape(h * w, h * w)


def ref_label_propagation(h, w, feat_tar, list_frame_feats, list_segs,
                          size=12):
    ncontext = len(list_frame_feats)
    feat_sources = torch.stack(list_frame_feats)
    feat_tar = F.normalize(feat_tar, dim=1, p=2)
    feat_sources = F.normalize(feat_sources, dim=1, p=2)
    feat_tar = feat_tar.unsqueeze(0).repeat(ncontext, 1, 1)
    aff = torch.exp(torch.bmm(feat_tar, feat_sources) / 0.1)
    if size > 0:
        mask = ref_restrict_neighborhood(h, w, size)
        mask = mask.unsqueeze(0).repeat(ncontext, 1, 1)
        aff *= mask
    aff = aff.transpose(2, 1).reshape(-1, h * w)
    tk_val, _ = torch.topk(aff, dim=0, k=5)
    tk_val_min, _ = torch.min(tk_val, dim=0)
    aff[aff < tk_val_min] = 0
    aff = aff / torch.sum(aff, keepdim=True, axis=0)
    segs = torch.cat(list_segs)
    nmb_context, C, h, w = segs.shape
    segs = segs.reshape(nmb_context, C, -1).transpose(2, 1).reshape(-1, C).T
    seg_tar = torch.mm(segs, aff)
    return seg_tar.reshape(1, C, h, w)


class TestLabelPropagation:
    def test_neighborhood_mask_parity(self):
        ours = np.asarray(restrict_neighborhood(6, 7, size=2))
        ref = ref_restrict_neighborhood(6, 7, size=2).numpy()
        np.testing.assert_array_equal(ours, ref)

    def test_propagation_parity(self, rng):
        h, w, dim, n, c = 6, 7, 16, 3, 4
        feat_tar = rng.standard_normal((h * w, dim)).astype(np.float32)
        feats = [rng.standard_normal((dim, h * w)).astype(np.float32)
                 for _ in range(n)]
        segs = [rng.uniform(size=(1, c, h, w)).astype(np.float32)
                for _ in range(n)]

        ours, _ = label_propagation(
            h, w, feat_tar, feats, segs, neighborhood_size=2)
        ref = ref_label_propagation(
            h, w, torch.from_numpy(feat_tar),
            [torch.from_numpy(f) for f in feats],
            [torch.from_numpy(s) for s in segs], size=2)
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)

    def test_norm_mask(self, rng):
        m = rng.standard_normal((3, 5, 5)).astype(np.float32)
        m[1] = -np.abs(m[1])  # max <= 0 channel stays untouched
        out = np.asarray(norm_mask(m.copy()))
        assert out[0].min() == pytest.approx(0.0, abs=1e-6)
        assert out[0].max() == pytest.approx(1.0, abs=1e-6)
        np.testing.assert_allclose(out[1], m[1], atol=1e-6)
