"""Checkpoint-conversion numerical parity: TapNet vs the reference Haiku model.

Random-init the reference haiku TAPNet (reference tapnet/tapnet_model.py:182-414)
via hk.transform_with_state (cross_replica_axis=None — the 'i' axis is a
dormant pmap hook, :206-212), convert params+state with utils/checkpoint.py,
run our Flax re-house on the same inputs, compare tracks/occlusion.
"""
import jax
import numpy as np
import pytest

from sam_pt_tpu.models.tracker.tapnet.model import TAPNet
from sam_pt_tpu.utils.checkpoint import (
    convert_tapnet_haiku_params,
    validate_against_template,
)

from reference_loader import load_ref


class TestTapnetParity:
    def test_forward_matches_reference(self, rng):
        import haiku as hk

        tapnet_mod = load_ref("sam_pt.point_tracker.tapnet.tapnet_model")

        def _fwd(video, qp, is_training):
            model = tapnet_mod.TAPNet(cross_replica_axis=None)
            return model(video=video, query_points=qp,
                         is_training=is_training, query_chunk_size=16)

        transform = hk.transform_with_state(_fwd)

        t, n = 3, 5
        video = (rng.random((1, t, 256, 256, 3)).astype(np.float32) * 2 - 1)
        qp = np.stack(
            [
                rng.integers(0, t, n).astype(np.float32),
                rng.uniform(10, 245, n),
                rng.uniform(10, 245, n),
            ],
            axis=-1,
        ).astype(np.float32)[None]

        # init in training mode (creates the BN EMA state), run one training
        # pass so the moving averages hold non-degenerate statistics, then
        # evaluate in inference mode — the mode our converter targets.
        hk_params, hk_state = transform.init(
            jax.random.PRNGKey(0), video, qp, True
        )
        _, hk_state = transform.apply(hk_params, hk_state,
                                      jax.random.PRNGKey(72), video, qp, True)
        ref_out, _ = transform.apply(hk_params, hk_state,
                                     jax.random.PRNGKey(72), video, qp, False)

        params = convert_tapnet_haiku_params(
            {"params": hk_params, "state": hk_state}
        )
        model = TAPNet()
        template = model.init(jax.random.PRNGKey(0), video[0], qp[0])
        validate_against_template(params, template)

        out = model.apply(params, video[0], qp[0])

        np.testing.assert_allclose(
            np.asarray(out["tracks"]), np.asarray(ref_out["tracks"][0]),
            rtol=0, atol=5e-2,
        )
        np.testing.assert_allclose(
            np.asarray(out["occlusion"]), np.asarray(ref_out["occlusion"][0]),
            rtol=0, atol=1e-2,
        )
