"""TAPIR model + tracker tests (tiny random config)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam_pt_tpu.models.tracker.tapir.model import (
    TAPIR,
    TapirResNet,
    convert_coords,
    soft_argmax_heatmap,
)
from sam_pt_tpu.models.tracker.tapir.tracker import TapirPointTracker


class TestComponents:
    def test_resnet_strides_and_channels(self):
        net = TapirResNet()
        x = jnp.zeros((1, 64, 64, 3))
        params = net.init(jax.random.PRNGKey(0), x)
        out = net.apply(params, x)
        assert out["resnet_unit_1"].shape == (1, 16, 16, 128)  # /4 hires
        assert out["resnet_unit_3"].shape == (1, 8, 8, 256)    # /8 lowres

    def test_soft_argmax_peaked(self):
        hm = np.zeros((9, 9), np.float32)
        hm[3, 5] = 1.0
        xy = np.asarray(soft_argmax_heatmap(jnp.asarray(hm)))
        # cell-center convention: index + 0.5 (reference model_utils.py:123)
        np.testing.assert_allclose(xy, [5.5, 3.5], atol=1e-5)

    def test_convert_coords_roundtrip(self):
        c = jnp.array([[10.0, 20.0]])
        out = convert_coords(convert_coords(c, (64, 64), (8, 8)), (8, 8), (64, 64))
        np.testing.assert_allclose(np.asarray(out), np.asarray(c), atol=1e-5)


class TestTapirForward:
    @pytest.fixture(scope="class")
    def tiny(self):
        model = TAPIR(num_pips_iter=2, num_mixer_blocks=2, mixer_hidden_dim=32)
        video = jnp.zeros((2, 256, 256, 3))
        qp = jnp.zeros((3, 3))
        params = model.init(jax.random.PRNGKey(0), video, qp)
        return model, params

    def test_output_contract(self, tiny):
        model, params = tiny
        video = jnp.zeros((2, 256, 256, 3))
        qp = jnp.array([[0, 100.0, 50.0], [1, 30.0, 90.0], [0, 10.0, 10.0]])
        out = model.apply(params, video, qp)
        assert out["tracks"].shape == (3, 2, 2)
        assert out["occlusion"].shape == (3, 2)
        # query pinning: (t, y, x) -> track at t == (x, y)
        np.testing.assert_allclose(
            np.asarray(out["tracks"][0, 0]), [50.0, 100.0], atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(out["tracks"][1, 1]), [90.0, 30.0], atol=1e-3
        )


class TestTracker:
    def test_contract(self, rng):
        tr = TapirPointTracker(query_chunk_size=4)
        tr.model = TAPIR(num_pips_iter=1, num_mixer_blocks=1,
                         mixer_hidden_dim=32)
        tr.init_params(jax.random.PRNGKey(0), t=3, n_points=4)
        t, h, w = 3, 48, 64
        rgbs = rng.integers(0, 255, size=(1, t, h, w, 3)).astype(np.uint8)
        qp = np.array([[[0, 5.0, 6.0], [1, 20.0, 15.0]]], np.float32)
        traj, vis = tr.forward(rgbs, qp)
        assert traj.shape == (1, t, 2, 2)
        assert vis.shape == (1, t, 2)
        np.testing.assert_allclose(traj[0, 0, 0], [5.0, 6.0], atol=0.5)


class TestStreaming:
    def test_online_matches_offline_causal(self, rng):
        """Chunked online steps with carried causal context must equal one
        causal pass over the concatenated frames."""
        import jax
        import jax.numpy as jnp
        from sam_pt_tpu.models.tracker.tapir.model import TAPIR

        model = TAPIR(num_pips_iter=2, num_mixer_blocks=2,
                      mixer_hidden_dim=32, use_causal_conv=True)
        f_total = 4
        video = jnp.asarray(
            rng.uniform(-1, 1, size=(f_total, 256, 256, 3)).astype(np.float32)
        )
        qp = jnp.array([[0, 100.0, 50.0], [0, 30.0, 90.0]])
        params = model.init(jax.random.PRNGKey(0), video, qp)

        q_hi, q_lo = model.apply(
            params, video[:1], qp, method=TAPIR.get_query_features_online
        )

        # offline causal over all frames at once
        full, _ = model.apply(
            params, video, q_hi, q_lo, None, None, method=TAPIR.online_step
        )

        # streamed one frame at a time with carried context
        state = None
        chunks = []
        for f in range(f_total):
            out, state = model.apply(
                params, video[f : f + 1], q_hi, q_lo, state, None,
                method=TAPIR.online_step,
            )
            chunks.append(np.asarray(out["tracks"]))
        streamed = np.concatenate(chunks, axis=1)

        np.testing.assert_allclose(
            streamed, np.asarray(full["tracks"]), atol=1e-3
        )


class TestOnlineTracker:
    def test_streaming_api(self, rng):
        from sam_pt_tpu.models.tracker.tapir.tracker import (
            OnlineTapirPointTracker,
        )
        from sam_pt_tpu.models.tracker.tapir.model import TAPIR

        tr = OnlineTapirPointTracker(allow_random_init=True)
        tr.model = TAPIR(num_pips_iter=1, num_mixer_blocks=1,
                         mixer_hidden_dim=32, use_causal_conv=True)
        frame = rng.integers(0, 255, size=(48, 64, 3)).astype(np.uint8)
        tr.init_tracking(frame, np.array([[5.0, 6.0], [20.0, 15.0]]))
        for _ in range(3):
            pts, vis = tr.track_frame(
                rng.integers(0, 255, size=(48, 64, 3)).astype(np.uint8)
            )
        assert pts.shape == (2, 2)
        assert vis.shape == (2,)
