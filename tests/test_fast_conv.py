"""Matmul-lowered conv replacements (ops/fast_conv.py) vs the flax modules
they replace — exact same param tree, numerically identical outputs."""
import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from sam_pt_tpu.ops.fast_conv import Conv2x2Down, ConvT2x2


def test_convt2x2_matches_flax_convtranspose():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (3, 16, 16, 32))
    ref = nn.ConvTranspose(8, (2, 2), strides=(2, 2))
    fast = ConvT2x2(8)
    p = ref.init(jax.random.PRNGKey(1), x)
    y_ref = ref.apply(p, x)
    y_fast = fast.apply(p, x)  # same param tree by construction
    assert y_fast.shape == y_ref.shape == (3, 32, 32, 8)
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_conv2x2down_matches_flax_conv():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 24, 24, 4))
    ref = nn.Conv(16, (2, 2), strides=(2, 2))
    fast = Conv2x2Down(16)
    p = ref.init(jax.random.PRNGKey(1), x)
    y_ref = ref.apply(p, x)
    y_fast = fast.apply(p, x)
    assert y_fast.shape == y_ref.shape == (2, 12, 12, 16)
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_param_shapes_identical():
    x = jnp.zeros((1, 8, 8, 6))
    pt = nn.ConvTranspose(10, (2, 2), strides=(2, 2)).init(
        jax.random.PRNGKey(0), x)
    pf = ConvT2x2(10).init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(pt) == jax.tree_util.tree_structure(pf)
    assert [a.shape for a in jax.tree_util.tree_leaves(pt)] == \
        [a.shape for a in jax.tree_util.tree_leaves(pf)]


def test_mask_decoder_only_token0_matches_full():
    """Chain fast path: token-0 logits and the iou head are unchanged."""
    from sam_pt_tpu.models.sam.mask_decoder import MaskDecoder

    rng = jax.random.PRNGKey(0)
    md = MaskDecoder()
    img = jax.random.normal(rng, (2, 8, 8, 256)) * 0.02
    pe = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 256)) * 0.02
    tok = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 256)) * 0.02
    dense = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 256)) * 0.02
    p = md.init(rng, img, pe, tok, dense)
    m_full, iou_full = md.apply(p, img, pe, tok, dense)
    m_t0, iou_t0 = md.apply(p, img, pe, tok, dense, only_token0=True)
    assert m_full.shape == (2, 4, 32, 32) and m_t0.shape == (2, 1, 32, 32)
    np.testing.assert_allclose(np.asarray(m_t0[:, 0]), np.asarray(m_full[:, 0]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(iou_t0), np.asarray(iou_full),
                               rtol=1e-6, atol=1e-6)
