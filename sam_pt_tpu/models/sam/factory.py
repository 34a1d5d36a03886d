"""Builders wiring configs to model objects (the Hydra `_target_` surface).

Replaces the reference's SAM Hydra wrapper classes (sam_pt/modeling/sam.py:
BaseHydra/SamHydra/SamHQHydra/MobileSamHydra) — here a builder returns a ready
`SamPredictor` with converted weights.
"""
from __future__ import annotations

import os
import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .predictor import SamPredictor
from .sam_model import Sam
from ...utils.util import jitted_init

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "f32": jnp.float32,
}


def build_predictor(
    variant: str = "vit_b",
    checkpoint: Optional[str] = None,
    dtype: str = "bfloat16",
    image_size: int = 1024,
    allow_random_init: bool = False,
    hq: bool = False,
    hq_token_only: bool = False,
    seed: int = 0,
    mesh=None,
    tp_axis: Optional[str] = None,
    dp_axis: Optional[str] = None,
    crop_pad_tokens: bool = False,
) -> SamPredictor:
    """Build a SamPredictor for a ViT/TinyViT variant (+ optional HQ decoder),
    converting a torch checkpoint.

    If `checkpoint` is missing and allow_random_init is set, parameters are
    randomly initialized (tests / benchmarking without weights).
    `crop_pad_tokens` enables the opt-in encoder pad-token cropping
    (ViT variants only: the transformer runs on the token rows/cols covering
    real image content — ~-40% ViT-H encode at 480p, deviated numerics).
    """
    model = Sam(encoder_variant=variant, image_size=image_size,
                use_hq=hq, hq_token_only=hq_token_only,
                tp_axis=tp_axis, dp_axis=dp_axis,
                crop_pad_tokens=crop_pad_tokens,
                dtype=_DTYPES[dtype])

    if checkpoint is not None and os.path.exists(checkpoint):
        from ...utils.checkpoint import load_native, load_sam_checkpoint

        if os.path.isdir(checkpoint):  # pre-converted orbax dir
            params = load_native(checkpoint)
        else:
            params = load_sam_checkpoint(checkpoint)
        # store parameters in the compute dtype: halves the parameter-read
        # traffic per forward on the bf16 inference path
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, _DTYPES[dtype])
            if np.issubdtype(np.asarray(a).dtype, np.floating)
            else jnp.asarray(a),
            params,
        )
    elif allow_random_init:
        warnings.warn(
            f"SAM checkpoint {checkpoint!r} not found — using RANDOM weights"
        )
        imgs = jnp.zeros((1, image_size, image_size, 3))
        pts = jnp.zeros((1, 2, 2))
        lbl = jnp.zeros((1, 2), jnp.int32)
        # init through a non-TP twin (identical param tree): the TP sharding
        # constraints need a mesh context, which init shouldn't require
        init_model = model if tp_axis is None else Sam(
            encoder_variant=variant, image_size=image_size, use_hq=hq,
            hq_token_only=hq_token_only, dtype=_DTYPES[dtype])
        params = jitted_init(
            init_model, jax.random.PRNGKey(seed), imgs, pts, lbl)
    else:
        raise FileNotFoundError(
            f"SAM checkpoint not found: {checkpoint} "
            "(set allow_random_init: true to run without weights)"
        )
    return SamPredictor(model, params, mesh=mesh)
