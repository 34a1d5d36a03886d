"""TapNet model + tracker tests (tiny random config)."""
import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam_pt_tpu.models.tracker.tapnet.model import (
    TAPNet,
    TSMResNetV2,
    temporal_shift,
)
from sam_pt_tpu.models.tracker.tapnet.tracker import TapNetPointTracker


class SmallTapNet(TAPNet):
    """TAPNet with a tiny backbone for CPU tests."""

    def setup(self):
        self.tsm_resnet = TSMResNetV2(
            blocks_per_unit=(1, 1, 1), channels_per_unit=(16, 32, 64),
            dtype=self.dtype,
        )
        self.cost_conv1 = fnn.Conv(16, (3, 3), padding="SAME",
                                   name="cost_volume_regression_1")
        self.cost_conv2 = fnn.Conv(1, (3, 3), padding="SAME",
                                   name="cost_volume_regression_2")
        self.occ_conv1 = fnn.Conv(32, (3, 3), strides=(2, 2), padding="SAME",
                                  name="cost_volume_occlusion_1")
        self.occ_linear1 = fnn.Dense(16, name="cost_volume_occlusion_2")
        self.occ_out = fnn.Dense(1, name="occlusion_out")


class TestTSM:
    def test_temporal_shift(self):
        x = jnp.arange(3 * 1 * 1 * 8, dtype=jnp.float32).reshape(3, 1, 1, 8)
        y = np.asarray(temporal_shift(x, 0.125))
        # The reference's ROLLED layout (tsm_utils.py temporal_shift_gpu):
        # out ch 0 = next frame's LAST channel; last gets zeros
        assert y[0, 0, 0, 0] == float(x[1, 0, 0, 7])
        assert y[2, 0, 0, 0] == 0.0
        # out chs 1..6 = same frame's channels 1..6 (unshifted middle)
        np.testing.assert_allclose(y[:, :, :, 1:7], np.asarray(x[:, :, :, 1:7]))
        # out ch 7 = previous frame's FIRST channel; frame 0 gets zeros
        assert y[0, 0, 0, 7] == 0.0
        assert y[1, 0, 0, 7] == float(x[0, 0, 0, 0])

    def test_backbone_stride8(self):
        net = TSMResNetV2(blocks_per_unit=(1, 1, 1),
                          channels_per_unit=(32, 64, 128))
        x = jnp.zeros((2, 64, 64, 3))
        params = net.init(jax.random.PRNGKey(0), x)
        y = net.apply(params, x)
        assert y.shape == (2, 8, 8, 128)


class TestTapNet:
    def test_forward_contract(self, rng):
        tr = TapNetPointTracker(query_chunk_size=2)
        tr.model = SmallTapNet()
        tr.init_params(jax.random.PRNGKey(0), t=2, n_points=2)

        rgbs = rng.integers(0, 255, size=(1, 2, 48, 64, 3)).astype(np.uint8)
        qpn = np.array([[[0, 5.0, 6.0], [1, 20.0, 15.0]]], np.float32)
        traj, vis = tr.forward(rgbs, qpn)
        assert traj.shape == (1, 2, 2, 2)
        assert vis.shape == (1, 2, 2)
        np.testing.assert_allclose(traj[0, 0, 0], [5.0, 6.0], atol=0.5)
