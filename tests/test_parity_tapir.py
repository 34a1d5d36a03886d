"""Checkpoint-conversion numerical parity: TAPIR vs the reference Haiku model.

Random-init the reference haiku TAPIR (reference tapir/tapir_model.py:261-1053)
via hk.transform_with_state, convert its params with utils/checkpoint.py, run
our Flax re-house on the same inputs (the wrapper config:
bilinear_interp_with_depthwise_conv=False, pyramid_level=0, reference
tapir/tracker.py:46-51), and require matching tracks/occlusion/expected_dist.
"""
import jax
import numpy as np
import pytest

from sam_pt_tpu.models.tracker.tapir.model import TAPIR
from sam_pt_tpu.utils.checkpoint import (
    convert_tapir_haiku_params,
    validate_against_template,
)

from reference_loader import load_ref


@pytest.fixture(scope="module")
def ref_tapir_out(rng_module):
    import haiku as hk

    tapir_mod = load_ref("sam_pt.point_tracker.tapir.tapir_model")
    kwargs = dict(
        bilinear_interp_with_depthwise_conv=False,
        pyramid_level=0,
        use_causal_conv=False,
    )

    def _fwd(video, qp):
        model = tapir_mod.TAPIR(**kwargs)
        return model(video=video, query_points=qp, query_chunk_size=64,
                     is_training=False)

    transform = hk.transform_with_state(_fwd)

    t, n = 3, 5
    video = (rng_module.random((1, t, 256, 256, 3)).astype(np.float32) * 2
             - 1)
    qp = np.stack(
        [
            rng_module.integers(0, t, n).astype(np.float32),
            rng_module.uniform(10, 245, n),  # y
            rng_module.uniform(10, 245, n),  # x
        ],
        axis=-1,
    ).astype(np.float32)[None]

    params, state = transform.init(jax.random.PRNGKey(0), video, qp)
    out, _ = transform.apply(params, state, jax.random.PRNGKey(72), video, qp)
    return params, video, qp, jax.tree_util.tree_map(np.asarray, dict(out))


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(72)


class TestTapirParity:
    def test_forward_matches_reference(self, ref_tapir_out):
        hk_params, video, qp, ref_out = ref_tapir_out

        params = convert_tapir_haiku_params(hk_params)
        model = TAPIR(pyramid_level=0)
        template = model.init(jax.random.PRNGKey(0), video[0], qp[0])
        validate_against_template(params, template)

        out = model.apply(params, video[0], qp[0])

        np.testing.assert_allclose(
            np.asarray(out["tracks"]), ref_out["tracks"][0],
            rtol=0, atol=5e-2,
        )
        np.testing.assert_allclose(
            np.asarray(out["occlusion"]), ref_out["occlusion"][0],
            rtol=0, atol=1e-2,
        )
        np.testing.assert_allclose(
            np.asarray(out["expected_dist"]), ref_out["expected_dist"][0],
            rtol=0, atol=1e-2,
        )
