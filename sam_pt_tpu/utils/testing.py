"""Factories for small randomly-initialized models (tests, dry runs, benches).

Mirrors the reference's debug-subsetting strategy (SURVEY.md §4): tiny configs
that exercise every code path on CPU in seconds.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

import sam_pt_tpu.models.sam.image_encoder as _ie
from ..models.sam.sam_model import Sam
from ..models.sam.predictor import SamPredictor
from ..models.sam_pt import SamPt
from ..models.tracker.pips.model import Pips
from ..models.tracker.pips.tracker import PipsPointTracker
from .util import jitted_init

TINY_VIT = dict(embed_dim=32, depth=2, num_heads=2, global_attn_indexes=(1,),
                window_size=2)
# Registered at import so tests can name the variant directly. This cannot
# leak into real checkpoint handling: checkpoint.py's depth-based variant
# lookup only runs for real-scale grids (>= 32) where depth is 12/24/32,
# never this depth-2 config, and it now errors on depth ambiguity.
_ie.VIT_VARIANTS.setdefault("vit_tiny_test", TINY_VIT)


def build_tiny_sam(image_size: int = 64, seed: int = 0):
    model = Sam(encoder_variant="vit_tiny_test", image_size=image_size)
    imgs = jnp.zeros((1, image_size, image_size, 3))
    pts = jnp.zeros((1, 2, 2))
    lbl = jnp.zeros((1, 2), jnp.int32)
    params = jitted_init(model, jax.random.PRNGKey(seed), imgs, pts, lbl)
    return model, params


def build_tiny_predictor(image_size: int = 64, seed: int = 0) -> SamPredictor:
    model, params = build_tiny_sam(image_size, seed)
    return SamPredictor(model, params)


def build_tiny_pips(height: int = 48, width: int = 64, seed: int = 0,
                    s: int = 4, stride: int = 4) -> PipsPointTracker:
    tracker = PipsPointTracker(stride=stride, s=s, iters=2)
    tracker.model = Pips(s=s, stride=stride, latent_dim=16, hidden_dim=32,
                         mixer_depth=2)
    tracker.init_params(jax.random.PRNGKey(seed), height, width)
    return tracker


def build_tiny_sam_pt(height: int = 48, width: int = 64, **kw) -> SamPt:
    defaults = dict(
        sam_iou_threshold=0.0,
        positive_points_per_mask=4,
        negative_points_per_mask=1,
        positive_point_selection_method="random",
        negative_point_selection_method="random",
        iterative_refinement_iterations=0,
        sam_decode_chunk=16,
        sam_encode_chunk=4,
    )
    defaults.update(kw)
    return SamPt(
        point_tracker=build_tiny_pips(height, width),
        sam_predictor=build_tiny_predictor(64),
        **defaults,
    )
