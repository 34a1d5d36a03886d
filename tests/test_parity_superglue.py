"""Checkpoint-conversion numerical parity: SuperPoint/SuperGlue vs reference.

SuperPoint: compare the dense detector heatmap and the descriptors sampled at
shared keypoints (keypoint *selection* is compared as a set elsewhere —
top-k tie order is not stable across frameworks).
SuperGlue: identical keypoints/descriptors through both matchers; compare
the matching assignment and scores.
Reference: superglue/models/{superpoint,superglue}.py.
"""
import unittest.mock as mock

import jax
import numpy as np
import pytest
import torch

from sam_pt_tpu.models.tracker.superglue.superglue import SuperGlue
from sam_pt_tpu.models.tracker.superglue.superpoint import SuperPoint
from sam_pt_tpu.utils.checkpoint import (
    convert_superglue_state_dict,
    convert_superpoint_state_dict,
    validate_against_template,
)

from reference_loader import load_ref


@pytest.fixture(scope="module")
def ref_superpoint():
    mod = load_ref("sam_pt.point_tracker.superglue.models.superpoint")
    torch.manual_seed(0)
    with mock.patch.object(torch.nn.Module, "load_state_dict",
                           lambda self, sd, **k: None), \
         mock.patch("torch.load", lambda *a, **k: {}):
        model = mod.SuperPoint({"checkpoint": "none"})
    model.eval()
    return model


@pytest.fixture(scope="module")
def ref_superglue():
    mod = load_ref("sam_pt.point_tracker.superglue.models.superglue")
    torch.manual_seed(1)
    with mock.patch.object(torch.nn.Module, "load_state_dict",
                           lambda self, sd, **k: None), \
         mock.patch("torch.load", lambda *a, **k: {}):
        model = mod.SuperGlue({"weights": "indoor", "checkpoint": "none"})
    model.eval()
    return model


class TestSuperPointParity:
    def test_dense_heads_match(self, ref_superpoint, rng):
        h, w = 96, 128
        img = rng.random((h, w)).astype(np.float32)

        sp = ref_superpoint
        with torch.no_grad():
            x = torch.from_numpy(img)[None, None]
            x = sp.relu(sp.conv1a(x)); x = sp.relu(sp.conv1b(x)); x = sp.pool(x)
            x = sp.relu(sp.conv2a(x)); x = sp.relu(sp.conv2b(x)); x = sp.pool(x)
            x = sp.relu(sp.conv3a(x)); x = sp.relu(sp.conv3b(x)); x = sp.pool(x)
            x = sp.relu(sp.conv4a(x)); x = sp.relu(sp.conv4b(x))
            cpa = sp.relu(sp.convPa(x))
            scores_t = torch.nn.functional.softmax(
                sp.convPb(cpa), 1)[:, :-1]
            b, _, h8, w8 = scores_t.shape
            heat_t = scores_t.permute(0, 2, 3, 1).reshape(b, h8, w8, 8, 8)
            heat_t = heat_t.permute(0, 1, 3, 2, 4).reshape(b, h8 * 8, w8 * 8)
            cda = sp.relu(sp.convDa(x))
            desc_t = sp.convDb(cda)
            desc_t = torch.nn.functional.normalize(desc_t, p=2, dim=1)

        params = convert_superpoint_state_dict(sp.state_dict())
        model = SuperPoint(max_keypoints=256)
        template = model.init(jax.random.PRNGKey(0), img)
        validate_against_template(params, template)

        # dense comparison via interpreter-mode submodule access
        import jax.numpy as jnp
        import flax.linen as nn

        bound = model.bind(params)
        out = bound(jnp.asarray(img))
        # reconstruct the dense heat exactly as the module does
        # (cheapest: recompute through apply with capture of intermediates is
        # overkill — compare the sampled descriptors + a heat probe instead)
        kp = np.asarray(out["keypoints"])
        valid = np.asarray(out["valid"])
        kpv = kp[valid]
        heat_np = heat_t[0].numpy()
        my_scores = np.asarray(out["scores"])[valid]
        ref_at_kp = heat_np[kpv[:, 1].astype(int), kpv[:, 0].astype(int)]
        np.testing.assert_allclose(my_scores, ref_at_kp, rtol=0, atol=1e-5)

        # descriptor parity at the selected keypoints
        sg_mod = load_ref("sam_pt.point_tracker.superglue.models.superpoint")
        with torch.no_grad():
            ref_desc = sg_mod.sample_descriptors(
                torch.from_numpy(kpv)[None], desc_t, 8
            )[0].numpy().T  # [K, D]
        my_desc = np.asarray(out["descriptors"])[valid]
        np.testing.assert_allclose(my_desc, ref_desc, rtol=0, atol=1e-4)

    def test_keypoint_sets_match(self, ref_superpoint, rng):
        h, w = 96, 128
        img = rng.random((h, w)).astype(np.float32)
        with torch.no_grad():
            ref_out = ref_superpoint({"image": torch.from_numpy(img)[None, None]})
        ref_kp = ref_out["keypoints"][0].numpy()

        params = convert_superpoint_state_dict(ref_superpoint.state_dict())
        model = SuperPoint(max_keypoints=1024)
        out = model.apply(params, img)
        kp = np.asarray(out["keypoints"])[np.asarray(out["valid"])]

        ref_set = {tuple(p) for p in ref_kp.astype(int)}
        my_set = {tuple(p) for p in kp.astype(int)}
        # identical detection sets (same NMS/threshold/border logic)
        assert ref_set == my_set


class TestSuperGlueParity:
    def test_matching_matches_reference(self, ref_superglue, rng):
        k0, k1, d = 48, 64, 256
        h, w = 96, 128
        kp0 = np.stack([rng.uniform(0, w - 1, k0),
                        rng.uniform(0, h - 1, k0)], -1).astype(np.float32)
        kp1 = np.stack([rng.uniform(0, w - 1, k1),
                        rng.uniform(0, h - 1, k1)], -1).astype(np.float32)
        sc0 = rng.random(k0).astype(np.float32)
        sc1 = rng.random(k1).astype(np.float32)
        de0 = rng.standard_normal((k0, d)).astype(np.float32)
        de1 = rng.standard_normal((k1, d)).astype(np.float32)
        de0 /= np.linalg.norm(de0, axis=-1, keepdims=True)
        de1 /= np.linalg.norm(de1, axis=-1, keepdims=True)

        with torch.no_grad():
            ref_out = ref_superglue({
                "descriptors0": torch.from_numpy(de0.T)[None],
                "descriptors1": torch.from_numpy(de1.T)[None],
                "keypoints0": torch.from_numpy(kp0)[None],
                "keypoints1": torch.from_numpy(kp1)[None],
                "scores0": torch.from_numpy(sc0)[None],
                "scores1": torch.from_numpy(sc1)[None],
                "image0": torch.zeros(1, 1, h, w),
                "image1": torch.zeros(1, 1, h, w),
            })

        params = convert_superglue_state_dict(ref_superglue.state_dict())
        model = SuperGlue()
        data = {
            "keypoints0": kp0, "keypoints1": kp1,
            "scores0": sc0, "scores1": sc1,
            "valid0": np.ones(k0, bool), "valid1": np.ones(k1, bool),
            "descriptors0": de0, "descriptors1": de1,
            "image_shape": (h, w),
        }
        template = model.init(jax.random.PRNGKey(0), data)
        validate_against_template(params, template)
        out = model.apply(params, data)

        np.testing.assert_array_equal(
            np.asarray(out["matches0"]), ref_out["matches0"][0].numpy()
        )
        np.testing.assert_allclose(
            np.asarray(out["matching_scores0"]),
            ref_out["matching_scores0"][0].numpy(), rtol=0, atol=1e-4,
        )
