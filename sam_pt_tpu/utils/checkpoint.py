"""Checkpoint loading and torch->flax conversion.

The reference loads torch .pth state dicts for SAM variants
(sam_pt/modeling/sam.py:21-25), PIPS-style step directories
(point_tracker/utils/saverloader.py:9-30), and numpy-pickled haiku params for
TapNet/TAPIR (tapir/tracker.py:44-45). This module provides:

  - layout converters between torch tensor conventions and flax NHWC/IO:
      Linear  [out, in]        -> kernel [in, out]
      Conv2d  [out, in, kh, kw]-> kernel [kh, kw, in, out]
      ConvT2d [in, out, kh, kw]-> kernel [kh, kw, in, out]
  - key-mapping tables from the public SAM / PIPS checkpoint namespaces to
    this package's flax module tree,
  - an orbax-backed native save/load for converted checkpoints, so conversion
    happens once.

Conversion is validated structurally against a flax-init template (every
expected leaf must be produced with the exact shape).
"""
from __future__ import annotations

import os
import re
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np


def _t(x) -> np.ndarray:
    """torch tensor -> numpy (no torch import needed at call sites)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def linear_w(x):
    return _t(x).T


def conv_w(x):
    return _t(x).transpose(2, 3, 1, 0)


def convt_w(x):
    # torch ConvTranspose2d applies the kernel un-flipped; flax's default
    # ConvTranspose flips it, so mirror the spatial dims during conversion
    # (verified numerically in tests/test_checkpoint.py).
    return _t(x).transpose(2, 3, 0, 1)[::-1, ::-1].copy()


def conv1d_w(x):
    """torch Conv1d weight [out, in, 1] -> dense kernel [in, out]."""
    return _t(x)[:, :, 0].T


def _make_put(p: Dict[str, Any]):
    """Nested-dict writer: put('a/b/c', v) sets p['a']['b']['c'] = asarray(v).

    One shared definition for every converter (they all build flax param
    trees the same way)."""

    def put(path: str, value):
        node = p
        keys = path.split("/")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = np.asarray(value)

    return put


def _convert_basic_encoder(sd: Dict[str, Any], put, src: str = "fnet",
                           dst: str = "fnet") -> None:
    """RAFT-style BasicEncoder (conv1, layer{1..4}x2 with optional
    downsample, conv2, conv3) — the shared feature backbone of the PIPS,
    PIPS++, and CoTracker reference checkpoints."""

    def conv(s, d):
        put(f"{d}/kernel", conv_w(sd[f"{s}.weight"]))
        put(f"{d}/bias", _t(sd[f"{s}.bias"]))

    conv(f"{src}.conv1", f"{dst}/conv1")
    for li in (1, 2, 3, 4):
        for bi in range(2):
            s = f"{src}.layer{li}.{bi}"
            d = f"{dst}/layer{li}_{bi}"
            conv(f"{s}.conv1", f"{d}/conv1")
            conv(f"{s}.conv2", f"{d}/conv2")
            if f"{s}.downsample.0.weight" in sd:
                conv(f"{s}.downsample.0", f"{d}/downsample")
    conv(f"{src}.conv2", f"{dst}/conv2")
    conv(f"{src}.conv3", f"{dst}/conv3")


# ---------------------------------------------------------------------------
# SAM conversion
# ---------------------------------------------------------------------------

def convert_sam_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Public SAM-family .pth state dict -> flax params tree.

    Dispatches on the image-encoder family: ViT-det (`image_encoder.blocks.*`,
    sam_vit_{b,l,h}) vs TinyViT (`image_encoder.layers.*`, mobile_sam.pt).
    Prompt encoder and mask decoder are shared.
    """
    p: Dict[str, Any] = {}

    put = _make_put(p)

    if any(k.startswith("image_encoder.layers.") for k in sd):
        _convert_tinyvit_encoder(sd, put)
    else:
        _convert_vit_encoder(sd, put)
    _convert_prompt_and_decoder(sd, put)
    return {"params": p}


def hf_sam_to_sam_state_dict(hf_sd: Dict[str, Any]) -> Dict[str, Any]:
    """HuggingFace `transformers` SamModel state dict -> original SAM keys.

    transformers ships a faithful torch SAM (`SamModel`) with renamed
    modules; this remaps its state dict to the original `segment_anything`
    checkpoint layout so `convert_sam_state_dict` (and thus the flax models)
    can load facebook/sam-vit-* HF checkpoints directly. It also serves as
    the importable-torch-reference bridge for full-model SAM parity tests
    (tests/test_parity_sam.py) — the original package isn't installed here.
    """
    out: Dict[str, Any] = {}
    ren = [
        # vision encoder
        ("vision_encoder.patch_embed.projection.", "image_encoder.patch_embed.proj."),
        ("vision_encoder.neck.conv1.", "image_encoder.neck.0."),
        ("vision_encoder.neck.layer_norm1.", "image_encoder.neck.1."),
        ("vision_encoder.neck.conv2.", "image_encoder.neck.2."),
        ("vision_encoder.neck.layer_norm2.", "image_encoder.neck.3."),
        ("vision_encoder.", "image_encoder."),
        # prompt encoder
        ("prompt_encoder.shared_embedding.positional_embedding",
         "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"),
        ("prompt_encoder.point_embed.", "prompt_encoder.point_embeddings."),
        ("prompt_encoder.mask_embed.conv1.", "prompt_encoder.mask_downscaling.0."),
        ("prompt_encoder.mask_embed.layer_norm1.", "prompt_encoder.mask_downscaling.1."),
        ("prompt_encoder.mask_embed.conv2.", "prompt_encoder.mask_downscaling.3."),
        ("prompt_encoder.mask_embed.layer_norm2.", "prompt_encoder.mask_downscaling.4."),
        ("prompt_encoder.mask_embed.conv3.", "prompt_encoder.mask_downscaling.6."),
        # mask decoder
        ("mask_decoder.upscale_conv1.", "mask_decoder.output_upscaling.0."),
        ("mask_decoder.upscale_layer_norm.", "mask_decoder.output_upscaling.1."),
        ("mask_decoder.upscale_conv2.", "mask_decoder.output_upscaling.3."),
        ("mask_decoder.transformer.layer_norm_final_attn.",
         "mask_decoder.transformer.norm_final_attn."),
    ]
    import re as _re

    for k, v in hf_sd.items():
        if k.startswith("shared_image_embedding."):
            continue  # duplicate of prompt_encoder.shared_embedding
        nk = k
        # block layers: vision_encoder.layers.i -> image_encoder.blocks.i,
        # layer_normN -> normN (both vision blocks and decoder layers)
        nk = _re.sub(r"^vision_encoder\.layers\.(\d+)\.",
                     r"vision_encoder.blocks.\1.", nk)
        nk = _re.sub(r"(\.(?:blocks|layers)\.\d+)\.layer_norm(\d)\.",
                     r"\1.norm\2.", nk)
        # SamFeedForward (proj_in/layers.k/proj_out) -> MLP layers.0..n
        m = _re.match(
            r"^(mask_decoder\.(?:output_hypernetworks_mlps\.\d+|"
            r"iou_prediction_head))\.(proj_in|proj_out|layers\.(\d+))\.(.*)$",
            nk,
        )
        if m:
            base, part, layer_idx, tail = m.group(1), m.group(2), m.group(3), m.group(4)
            n_mid = 1  # SAM's 3-layer MLPs have one middle layer
            if part == "proj_in":
                j = 0
            elif part == "proj_out":
                j = n_mid + 1
            else:
                j = 1 + int(layer_idx)
            nk = f"{base}.layers.{j}.{tail}"
        for src, dst in ren:
            if nk.startswith(src):
                nk = dst + nk[len(src):]
                break
        out[nk] = v
    return out


def _pad_attn_heads(qkv_w, qkv_b, proj_w, rel_h, rel_w, num_heads):
    """Fold the head-dim pad (e.g. 80 -> 128 for ViT-H) into the weights of
    a global-attention block: zero lanes in qkv output columns / proj input
    rows / rel-pos channels. Numerically identity (padded q,k,v lanes are
    zero; proj rows for them are zero), but no runtime pad op remains and
    the fused kernel reads lane-aligned heads."""
    c = qkv_w.shape[0]
    hd = c // num_heads
    hdp = ((hd + 127) // 128) * 128
    if hdp == hd:
        return qkv_w, qkv_b, proj_w, rel_h, rel_w

    def pad_out(w):  # [..., 3, H, hd] zero-pad last dim
        shape = w.shape[:-1] + (3, num_heads, hd)
        w = w.reshape(shape)
        pad = [(0, 0)] * (w.ndim - 1) + [(0, hdp - hd)]
        w = np.pad(w, pad)
        return w.reshape(w.shape[:-3] + (3 * num_heads * hdp,))

    qkv_w = pad_out(qkv_w)
    qkv_b = pad_out(qkv_b)
    proj_w = np.pad(
        proj_w.reshape(num_heads, hd, -1),
        [(0, 0), (0, hdp - hd), (0, 0)],
    ).reshape(num_heads * hdp, -1)
    rel_h = np.pad(rel_h, [(0, 0), (0, hdp - hd)])
    rel_w = np.pad(rel_w, [(0, 0), (0, hdp - hd)])
    return qkv_w, qkv_b, proj_w, rel_h, rel_w


def _convert_vit_encoder(sd, put):
    # --- image encoder
    put("image_encoder/patch_embed/kernel", conv_w(sd["image_encoder.patch_embed.proj.weight"]))
    put("image_encoder/patch_embed/bias", _t(sd["image_encoder.patch_embed.proj.bias"]))
    grid = 0
    if "image_encoder.pos_embed" in sd:
        pe = _t(sd["image_encoder.pos_embed"])
        put("image_encoder/pos_embed", pe)
        grid = pe.shape[1]

    depth = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"image_encoder\.blocks\.(\d+)\.", k))
    )
    # Real-scale checkpoints (grid >= 32, i.e. 1024-pixel SAM): GLOBAL
    # attention blocks get the head pad folded into their weights (the
    # global fused kernel reads lane-aligned per-head column slices of the
    # raw qkv projection). WINDOW blocks stay at the native head dim — the
    # window kernel reads head GROUPS sized to a 128-lane multiple and
    # slices per head in VMEM, so the 80->128 pad (60% extra qkv compute
    # and HBM traffic at ViT-H) is not paid for the 28 windowed layers.
    from ..models.sam.image_encoder import VIT_VARIANTS

    global_idx = ()
    if grid >= 32:
        matches = {
            name: tuple(v["global_attn_indexes"])
            for name, v in VIT_VARIANTS.items()
            if v["depth"] == depth
        }
        if not matches:
            raise ValueError(
                f"SAM checkpoint encoder depth {depth} matches no "
                f"registered ViT variant (known depths: "
                f"{sorted({v['depth'] for v in VIT_VARIANTS.values()})}); "
                "cannot locate global-attention blocks for head padding"
            )
        if len(set(matches.values())) > 1:
            raise ValueError(
                f"SAM checkpoint encoder depth {depth} is ambiguous across "
                f"registered variants {sorted(matches)} with different "
                "global-attention layouts — register the intended variant "
                "uniquely"
            )
        global_idx = next(iter(matches.values()))
    for i in range(depth):
        src = f"image_encoder.blocks.{i}"
        dst = f"image_encoder/blocks_{i}"
        put(f"{dst}/norm1/scale", _t(sd[f"{src}.norm1.weight"]))
        put(f"{dst}/norm1/bias", _t(sd[f"{src}.norm1.bias"]))
        qkv_w = linear_w(sd[f"{src}.attn.qkv.weight"])
        qkv_b = _t(sd[f"{src}.attn.qkv.bias"])
        proj_w = linear_w(sd[f"{src}.attn.proj.weight"])
        rel_h = _t(sd[f"{src}.attn.rel_pos_h"])
        rel_w = _t(sd[f"{src}.attn.rel_pos_w"])
        if i in global_idx:
            c = qkv_w.shape[0]
            hd = rel_h.shape[-1]
            qkv_w, qkv_b, proj_w, rel_h, rel_w = _pad_attn_heads(
                qkv_w, qkv_b, proj_w, rel_h, rel_w, num_heads=c // hd
            )
        put(f"{dst}/attn/qkv/kernel", qkv_w)
        put(f"{dst}/attn/qkv/bias", qkv_b)
        put(f"{dst}/attn/proj/kernel", proj_w)
        put(f"{dst}/attn/proj/bias", _t(sd[f"{src}.attn.proj.bias"]))
        put(f"{dst}/attn/rel_pos_h", rel_h)
        put(f"{dst}/attn/rel_pos_w", rel_w)
        put(f"{dst}/norm2/scale", _t(sd[f"{src}.norm2.weight"]))
        put(f"{dst}/norm2/bias", _t(sd[f"{src}.norm2.bias"]))
        put(f"{dst}/mlp_lin1/kernel", linear_w(sd[f"{src}.mlp.lin1.weight"]))
        put(f"{dst}/mlp_lin1/bias", _t(sd[f"{src}.mlp.lin1.bias"]))
        put(f"{dst}/mlp_lin2/kernel", linear_w(sd[f"{src}.mlp.lin2.weight"]))
        put(f"{dst}/mlp_lin2/bias", _t(sd[f"{src}.mlp.lin2.bias"]))

    put("image_encoder/neck_conv1/kernel", conv_w(sd["image_encoder.neck.0.weight"]))
    put("image_encoder/neck_ln1/weight", _t(sd["image_encoder.neck.1.weight"]))
    put("image_encoder/neck_ln1/bias", _t(sd["image_encoder.neck.1.bias"]))
    put("image_encoder/neck_conv2/kernel", conv_w(sd["image_encoder.neck.2.weight"]))
    put("image_encoder/neck_ln2/weight", _t(sd["image_encoder.neck.3.weight"]))
    put("image_encoder/neck_ln2/bias", _t(sd["image_encoder.neck.3.bias"]))


def _convert_tinyvit_encoder(sd, put):
    """MobileSAM TinyViT encoder (mobile_sam.pt image_encoder.* namespace)."""

    def convbn(src, dst):
        put(f"{dst}/conv/kernel", conv_w(sd[f"{src}.c.weight"]))
        put(f"{dst}/bn_scale", _t(sd[f"{src}.bn.weight"]))
        put(f"{dst}/bn_bias", _t(sd[f"{src}.bn.bias"]))
        put(f"{dst}/bn_mean", _t(sd[f"{src}.bn.running_mean"]))
        put(f"{dst}/bn_var", _t(sd[f"{src}.bn.running_var"]))

    enc = "image_encoder"
    d = "image_encoder"
    convbn(f"{enc}.patch_embed.seq.0", f"{d}/patch_embed_conv1")
    convbn(f"{enc}.patch_embed.seq.2", f"{d}/patch_embed_conv2")

    depths = []
    for li in range(4):
        n = 0
        while f"{enc}.layers.{li}.blocks.{n}.conv1.c.weight" in sd or \
              f"{enc}.layers.{li}.blocks.{n}.attn.qkv.weight" in sd:
            n += 1
        depths.append(n)

    # stage 0: MBConv blocks
    for i in range(depths[0]):
        src = f"{enc}.layers.0.blocks.{i}"
        dst = f"{d}/stage0_block{i}"
        convbn(f"{src}.conv1", f"{dst}/conv1")
        convbn(f"{src}.conv2", f"{dst}/conv2")
        convbn(f"{src}.conv3", f"{dst}/conv3")

    # downsamples live at the END of torch layers 0..2 -> our merge{1..3}
    for li in range(3):
        src = f"{enc}.layers.{li}.downsample"
        dst = f"{d}/merge{li + 1}"
        convbn(f"{src}.conv1", f"{dst}/conv1")
        convbn(f"{src}.conv2", f"{dst}/conv2")
        convbn(f"{src}.conv3", f"{dst}/conv3")

    # stages 1..3: transformer blocks
    for li in range(1, 4):
        for i in range(depths[li]):
            src = f"{enc}.layers.{li}.blocks.{i}"
            dst = f"{d}/stage{li}_block{i}"
            put(f"{dst}/attn/norm/scale", _t(sd[f"{src}.attn.norm.weight"]))
            put(f"{dst}/attn/norm/bias", _t(sd[f"{src}.attn.norm.bias"]))
            put(f"{dst}/attn/qkv/kernel", linear_w(sd[f"{src}.attn.qkv.weight"]))
            put(f"{dst}/attn/qkv/bias", _t(sd[f"{src}.attn.qkv.bias"]))
            put(f"{dst}/attn/proj/kernel", linear_w(sd[f"{src}.attn.proj.weight"]))
            put(f"{dst}/attn/proj/bias", _t(sd[f"{src}.attn.proj.bias"]))
            put(f"{dst}/attn/attention_biases", _t(sd[f"{src}.attn.attention_biases"]))
            convbn(f"{src}.local_conv", f"{dst}/local_conv")
            put(f"{dst}/mlp_norm/scale", _t(sd[f"{src}.mlp.norm.weight"]))
            put(f"{dst}/mlp_norm/bias", _t(sd[f"{src}.mlp.norm.bias"]))
            put(f"{dst}/mlp_fc1/kernel", linear_w(sd[f"{src}.mlp.fc1.weight"]))
            put(f"{dst}/mlp_fc1/bias", _t(sd[f"{src}.mlp.fc1.bias"]))
            put(f"{dst}/mlp_fc2/kernel", linear_w(sd[f"{src}.mlp.fc2.weight"]))
            put(f"{dst}/mlp_fc2/bias", _t(sd[f"{src}.mlp.fc2.bias"]))

    convbn_like_neck = f"{enc}.neck"
    put(f"{d}/neck_conv1/kernel", conv_w(sd[f"{convbn_like_neck}.0.weight"]))
    put(f"{d}/neck_ln1/weight", _t(sd[f"{convbn_like_neck}.1.weight"]))
    put(f"{d}/neck_ln1/bias", _t(sd[f"{convbn_like_neck}.1.bias"]))
    put(f"{d}/neck_conv2/kernel", conv_w(sd[f"{convbn_like_neck}.2.weight"]))
    put(f"{d}/neck_ln2/weight", _t(sd[f"{convbn_like_neck}.3.weight"]))
    put(f"{d}/neck_ln2/bias", _t(sd[f"{convbn_like_neck}.3.bias"]))


def _convert_prompt_and_decoder(sd, put):
    # --- prompt encoder
    put(
        "prompt_encoder/pe_layer/gaussian_matrix",
        _t(sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]),
    )
    for i in range(4):
        put(
            f"prompt_encoder/point_embed_{i}",
            _t(sd[f"prompt_encoder.point_embeddings.{i}.weight"])[0],
        )
    put("prompt_encoder/not_a_point_embed",
        _t(sd["prompt_encoder.not_a_point_embed.weight"])[0])
    put("prompt_encoder/no_mask_embed",
        _t(sd["prompt_encoder.no_mask_embed.weight"])[0])
    md = "prompt_encoder.mask_downscaling"
    put("prompt_encoder/mask_conv1/kernel", conv_w(sd[f"{md}.0.weight"]))
    put("prompt_encoder/mask_conv1/bias", _t(sd[f"{md}.0.bias"]))
    put("prompt_encoder/mask_ln1/weight", _t(sd[f"{md}.1.weight"]))
    put("prompt_encoder/mask_ln1/bias", _t(sd[f"{md}.1.bias"]))
    put("prompt_encoder/mask_conv2/kernel", conv_w(sd[f"{md}.3.weight"]))
    put("prompt_encoder/mask_conv2/bias", _t(sd[f"{md}.3.bias"]))
    put("prompt_encoder/mask_ln2/weight", _t(sd[f"{md}.4.weight"]))
    put("prompt_encoder/mask_ln2/bias", _t(sd[f"{md}.4.bias"]))
    put("prompt_encoder/mask_conv3/kernel", conv_w(sd[f"{md}.6.weight"]))
    put("prompt_encoder/mask_conv3/bias", _t(sd[f"{md}.6.bias"]))

    # --- mask decoder
    def attn(src, dst):
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            put(f"{dst}/{name}/kernel", linear_w(sd[f"{src}.{name}.weight"]))
            put(f"{dst}/{name}/bias", _t(sd[f"{src}.{name}.bias"]))

    def norm(src, dst):
        put(f"{dst}/scale", _t(sd[f"{src}.weight"]))
        put(f"{dst}/bias", _t(sd[f"{src}.bias"]))

    tr_src = "mask_decoder.transformer"
    tr_dst = "mask_decoder/transformer"
    for i in range(2):
        s = f"{tr_src}.layers.{i}"
        d = f"{tr_dst}/layers_{i}"
        attn(f"{s}.self_attn", f"{d}/self_attn")
        attn(f"{s}.cross_attn_token_to_image", f"{d}/cross_attn_token_to_image")
        attn(f"{s}.cross_attn_image_to_token", f"{d}/cross_attn_image_to_token")
        for j in range(1, 5):
            norm(f"{s}.norm{j}", f"{d}/norm{j}")
        put(f"{d}/mlp/lin1/kernel", linear_w(sd[f"{s}.mlp.lin1.weight"]))
        put(f"{d}/mlp/lin1/bias", _t(sd[f"{s}.mlp.lin1.bias"]))
        put(f"{d}/mlp/lin2/kernel", linear_w(sd[f"{s}.mlp.lin2.weight"]))
        put(f"{d}/mlp/lin2/bias", _t(sd[f"{s}.mlp.lin2.bias"]))
    attn(f"{tr_src}.final_attn_token_to_image", f"{tr_dst}/final_attn_token_to_image")
    norm(f"{tr_src}.norm_final_attn", f"{tr_dst}/norm_final_attn")

    put("mask_decoder/iou_token", _t(sd["mask_decoder.iou_token.weight"]))
    put("mask_decoder/mask_tokens", _t(sd["mask_decoder.mask_tokens.weight"]))
    put("mask_decoder/upscale_conv1/kernel",
        convt_w(sd["mask_decoder.output_upscaling.0.weight"]))
    put("mask_decoder/upscale_conv1/bias",
        _t(sd["mask_decoder.output_upscaling.0.bias"]))
    put("mask_decoder/upscale_ln/weight",
        _t(sd["mask_decoder.output_upscaling.1.weight"]))
    put("mask_decoder/upscale_ln/bias",
        _t(sd["mask_decoder.output_upscaling.1.bias"]))
    put("mask_decoder/upscale_conv2/kernel",
        convt_w(sd["mask_decoder.output_upscaling.3.weight"]))
    put("mask_decoder/upscale_conv2/bias",
        _t(sd["mask_decoder.output_upscaling.3.bias"]))
    n_hyper = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"mask_decoder\.output_hypernetworks_mlps\.(\d+)\.", k))
    )
    for i in range(n_hyper):
        s = f"mask_decoder.output_hypernetworks_mlps.{i}"
        d = f"mask_decoder/output_hypernetworks_mlps_{i}"
        for j in range(3):
            put(f"{d}/layers_{j}/kernel", linear_w(sd[f"{s}.layers.{j}.weight"]))
            put(f"{d}/layers_{j}/bias", _t(sd[f"{s}.layers.{j}.bias"]))
    for j in range(3):
        s = f"mask_decoder.iou_prediction_head.layers.{j}"
        d = f"mask_decoder/iou_prediction_head/layers_{j}"
        put(f"{d}/kernel", linear_w(sd[f"{s}.weight"]))
        put(f"{d}/bias", _t(sd[f"{s}.bias"]))

    # HQ-SAM extras (sam_hq_vit_*.pth)
    if "mask_decoder.hf_token.weight" in sd:
        put("mask_decoder/hf_token", _t(sd["mask_decoder.hf_token.weight"]))
        for j in range(3):
            s = f"mask_decoder.hf_mlp.layers.{j}"
            put(f"mask_decoder/hf_mlp/layers_{j}/kernel", linear_w(sd[f"{s}.weight"]))
            put(f"mask_decoder/hf_mlp/layers_{j}/bias", _t(sd[f"{s}.bias"]))
        triples = [
            ("mask_decoder.embedding_encoder", "embedding_encoder_conv1",
             "embedding_encoder_ln", "embedding_encoder_conv2", convt_w),
            ("mask_decoder.compress_vit_feat", "compress_vit_conv1",
             "compress_vit_ln", "compress_vit_conv2", convt_w),
            ("mask_decoder.embedding_maskfeature", "maskfeature_conv1",
             "maskfeature_ln", "maskfeature_conv2", conv_w),
        ]
        for src, c1, ln, c2, wfn in triples:
            put(f"mask_decoder/{c1}/kernel", wfn(sd[f"{src}.0.weight"]))
            put(f"mask_decoder/{c1}/bias", _t(sd[f"{src}.0.bias"]))
            put(f"mask_decoder/{ln}/weight", _t(sd[f"{src}.1.weight"]))
            put(f"mask_decoder/{ln}/bias", _t(sd[f"{src}.1.bias"]))
            put(f"mask_decoder/{c2}/kernel", wfn(sd[f"{src}.3.weight"]))
            put(f"mask_decoder/{c2}/bias", _t(sd[f"{src}.3.bias"]))


# ---------------------------------------------------------------------------
# PIPS conversion
# ---------------------------------------------------------------------------

def convert_pips_state_dict(sd: Dict[str, Any], mixer_depth: int = 12) -> Dict[str, Any]:
    """Public PIPS reference_model checkpoint -> flax params tree."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    p: Dict[str, Any] = {}

    put = _make_put(p)

    _convert_basic_encoder(sd, put)

    # delta_block.to_delta: [0] input proj, [1..depth] mixer pairs,
    # [depth+1] out LN, [depth+2] Reduce (no params), [depth+3] out proj
    put("delta_block/input_proj/kernel", linear_w(sd["delta_block.to_delta.0.weight"]))
    put("delta_block/input_proj/bias", _t(sd["delta_block.to_delta.0.bias"]))
    for i in range(mixer_depth):
        s = f"delta_block.to_delta.{1 + i}"
        d = f"delta_block/mixer_{i}"
        put(f"{d}/token_norm/scale", _t(sd[f"{s}.0.norm.weight"]))
        put(f"{d}/token_norm/bias", _t(sd[f"{s}.0.norm.bias"]))
        put(f"{d}/token_fc1/kernel", conv1d_w(sd[f"{s}.0.fn.0.weight"]))
        put(f"{d}/token_fc1/bias", _t(sd[f"{s}.0.fn.0.bias"]))
        put(f"{d}/token_fc2/kernel", conv1d_w(sd[f"{s}.0.fn.3.weight"]))
        put(f"{d}/token_fc2/bias", _t(sd[f"{s}.0.fn.3.bias"]))
        put(f"{d}/chan_norm/scale", _t(sd[f"{s}.1.norm.weight"]))
        put(f"{d}/chan_norm/bias", _t(sd[f"{s}.1.norm.bias"]))
        put(f"{d}/chan_fc1/kernel", linear_w(sd[f"{s}.1.fn.0.weight"]))
        put(f"{d}/chan_fc1/bias", _t(sd[f"{s}.1.fn.0.bias"]))
        put(f"{d}/chan_fc2/kernel", linear_w(sd[f"{s}.1.fn.3.weight"]))
        put(f"{d}/chan_fc2/bias", _t(sd[f"{s}.1.fn.3.bias"]))
    ln_idx = mixer_depth + 1
    out_idx = mixer_depth + 3
    put("delta_block/out_norm/scale", _t(sd[f"delta_block.to_delta.{ln_idx}.weight"]))
    put("delta_block/out_norm/bias", _t(sd[f"delta_block.to_delta.{ln_idx}.bias"]))
    put("delta_block/out_proj/kernel", linear_w(sd[f"delta_block.to_delta.{out_idx}.weight"]))
    put("delta_block/out_proj/bias", _t(sd[f"delta_block.to_delta.{out_idx}.bias"]))

    put("ffeat_norm/scale", _t(sd["norm.weight"]))
    put("ffeat_norm/bias", _t(sd["norm.bias"]))
    put("ffeat_updater/kernel", linear_w(sd["ffeat_updater.0.weight"]))
    put("ffeat_updater/bias", _t(sd["ffeat_updater.0.bias"]))
    put("vis_predictor/kernel", linear_w(sd["vis_predictor.0.weight"]))
    put("vis_predictor/bias", _t(sd["vis_predictor.0.bias"]))

    return {"params": p}


# ---------------------------------------------------------------------------
# Validation + loaders
# ---------------------------------------------------------------------------

def validate_against_template(converted, template) -> None:
    """Every template leaf must exist in `converted` with the same shape."""
    import jax

    flat_t = jax.tree_util.tree_flatten_with_path(template)[0]
    flat_c = dict(jax.tree_util.tree_flatten_with_path(converted)[0])
    missing, bad = [], []
    for path, leaf in flat_t:
        if path not in flat_c:
            missing.append(jax.tree_util.keystr(path))
        elif tuple(flat_c[path].shape) != tuple(leaf.shape):
            bad.append(
                f"{jax.tree_util.keystr(path)}: {flat_c[path].shape} != {leaf.shape}"
            )
    if missing or bad:
        raise ValueError(
            f"checkpoint conversion mismatch; missing={missing[:8]} bad={bad[:8]}"
        )


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model_state_dict" in sd:  # PIPS saverloader dirs
        sd = sd["model_state_dict"]
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return sd


def resolve_pips_checkpoint_file(path: str) -> str:
    """PIPS checkpoints live in step directories: model-<step>.pth, latest wins
    (reference saverloader.py:30 semantics)."""
    if os.path.isfile(path):
        return path
    files = [f for f in os.listdir(path) if f.endswith(".pth")]
    if not files:
        raise FileNotFoundError(f"No .pth files under {path}")

    def step(f):
        m = re.search(r"(\d+)", f)
        return int(m.group(1)) if m else -1

    return os.path.join(path, sorted(files, key=step)[-1])


def load_sam_checkpoint(path: str, model=None, template=None):
    sd = load_torch_state_dict(path)
    if any(k.startswith("vision_encoder.") for k in sd):
        # HuggingFace `transformers` SamModel layout (facebook/sam-vit-*)
        sd = hf_sam_to_sam_state_dict(sd)
    params = convert_sam_state_dict(sd)
    if template is not None:
        validate_against_template(params, template)
    return params


def load_pips_checkpoint(path: str, model=None, template=None):
    file = resolve_pips_checkpoint_file(path)
    sd = load_torch_state_dict(file)
    params = convert_pips_state_dict(sd)
    if template is not None:
        validate_against_template(params, template)
    return params


# ---------------------------------------------------------------------------
# Native (orbax) save/load for converted checkpoints
# ---------------------------------------------------------------------------

def save_native(path: str, params) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), params)


def load_native(path: str):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))


# ---------------------------------------------------------------------------
# CoTracker conversion
# ---------------------------------------------------------------------------

def convert_cotracker_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Public cotracker_stride_*_wind_*.pth state dict -> flax params tree.

    Maps the published CoTracker v1 module names (fnet.*, updateformer.*,
    norm.*, ffeat_updater.*, vis_predictor.*) onto this package's tree.
    """
    sd = {k.removeprefix("model."): v for k, v in sd.items()}
    p: Dict[str, Any] = {}

    put = _make_put(p)

    _convert_basic_encoder(sd, put)

    uf = "updateformer"
    put(f"{uf}/input_transform/kernel", linear_w(sd[f"{uf}.input_transform.weight"]))
    put(f"{uf}/input_transform/bias", _t(sd[f"{uf}.input_transform.bias"]))
    put(f"{uf}/flow_head/kernel", linear_w(sd[f"{uf}.flow_head.weight"]))
    put(f"{uf}/flow_head/bias", _t(sd[f"{uf}.flow_head.bias"]))

    def attn_block(src, dst):
        put(f"{dst}/attn/qkv/kernel", linear_w(sd[f"{src}.attn.qkv.weight"]))
        put(f"{dst}/attn/qkv/bias", _t(sd[f"{src}.attn.qkv.bias"]))
        put(f"{dst}/attn/proj/kernel", linear_w(sd[f"{src}.attn.proj.weight"]))
        put(f"{dst}/attn/proj/bias", _t(sd[f"{src}.attn.proj.bias"]))
        put(f"{dst}/mlp_fc1/kernel", linear_w(sd[f"{src}.mlp.fc1.weight"]))
        put(f"{dst}/mlp_fc1/bias", _t(sd[f"{src}.mlp.fc1.bias"]))
        put(f"{dst}/mlp_fc2/kernel", linear_w(sd[f"{src}.mlp.fc2.weight"]))
        put(f"{dst}/mlp_fc2/bias", _t(sd[f"{src}.mlp.fc2.bias"]))

    i = 0
    while f"{uf}.time_blocks.{i}.attn.qkv.weight" in sd:
        attn_block(f"{uf}.time_blocks.{i}", f"{uf}/time_blocks_{i}")
        i += 1
    j = 0
    while f"{uf}.space_blocks.{j}.attn.qkv.weight" in sd:
        attn_block(f"{uf}.space_blocks.{j}", f"{uf}/space_blocks_{j}")
        j += 1

    put("ffeat_norm/scale", _t(sd["norm.weight"]))
    put("ffeat_norm/bias", _t(sd["norm.bias"]))
    put("ffeat_updater/kernel", linear_w(sd["ffeat_updater.0.weight"]))
    put("ffeat_updater/bias", _t(sd["ffeat_updater.0.bias"]))
    put("vis_predictor/kernel", linear_w(sd["vis_predictor.0.weight"]))
    put("vis_predictor/bias", _t(sd["vis_predictor.0.bias"]))

    return {"params": p}


def load_cotracker_checkpoint(path: str, template=None):
    sd = load_torch_state_dict(path)
    params = convert_cotracker_state_dict(sd)
    if template is not None:
        validate_against_template(params, template)
    return params


# ---------------------------------------------------------------------------
# RAFT conversion
# ---------------------------------------------------------------------------

def convert_raft_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Public raft-things.pth (DataParallel 'module.' prefixes stripped, as in
    reference raftnet.py:20-27) -> flax params tree."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    p: Dict[str, Any] = {}

    put = _make_put(p)

    def conv(src, dst):
        put(f"{dst}/kernel", conv_w(sd[f"{src}.weight"]))
        if f"{src}.bias" in sd:
            put(f"{dst}/bias", _t(sd[f"{src}.bias"]))

    def bn(src, dst):
        put(f"{dst}/scale", _t(sd[f"{src}.weight"]))
        put(f"{dst}/bias", _t(sd[f"{src}.bias"]))
        put(f"{dst}/mean", _t(sd[f"{src}.running_mean"]))
        put(f"{dst}/var", _t(sd[f"{src}.running_var"]))

    for net, has_bn in (("fnet", False), ("cnet", True)):
        conv(f"{net}.conv1", f"{net}/conv1")
        if has_bn:
            bn(f"{net}.norm1", f"{net}/norm1")
        for li in (1, 2, 3):
            for bi in range(2):
                src = f"{net}.layer{li}.{bi}"
                dst = f"{net}/layer{li}_{bi}"
                conv(f"{src}.conv1", f"{dst}/conv1")
                conv(f"{src}.conv2", f"{dst}/conv2")
                if has_bn:
                    bn(f"{src}.norm1", f"{dst}/norm1")
                    bn(f"{src}.norm2", f"{dst}/norm2")
                if f"{src}.downsample.0.weight" in sd:
                    conv(f"{src}.downsample.0", f"{dst}/downsample")
                    if has_bn:
                        bn(f"{src}.downsample.1", f"{dst}/norm3")
        conv(f"{net}.conv2", f"{net}/conv2")

    ub = "update_block"
    for name in ("convc1", "convc2", "convf1", "convf2", "conv"):
        conv(f"{ub}.encoder.{name}", f"{ub}/encoder/{name}")
    for name in ("convz1", "convr1", "convq1", "convz2", "convr2", "convq2"):
        conv(f"{ub}.gru.{name}", f"{ub}/gru/{name}")
    conv(f"{ub}.flow_head.conv1", f"{ub}/flow_head_conv1")
    conv(f"{ub}.flow_head.conv2", f"{ub}/flow_head_conv2")
    conv(f"{ub}.mask.0", f"{ub}/mask_conv1")
    conv(f"{ub}.mask.2", f"{ub}/mask_conv2")
    return {"params": p}


def load_raft_checkpoint(path: str, template=None):
    sd = load_torch_state_dict(path)
    params = convert_raft_state_dict(sd)
    if template is not None:
        validate_against_template(params, template)
    return params


# ---------------------------------------------------------------------------
# PIPS++ conversion
# ---------------------------------------------------------------------------

def conv1d_k_w(x):
    """torch Conv1d weight [out, in, k] -> flax kernel [k, in, out]."""
    return _t(x).transpose(2, 1, 0)


def convert_pips2_state_dict(sd: Dict[str, Any], n_block: int = 8) -> Dict[str, Any]:
    """Public PIPS++ (pips2) reference checkpoint -> flax params tree."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    p: Dict[str, Any] = {}

    put = _make_put(p)

    _convert_basic_encoder(sd, put)

    db = "delta_block"
    put(f"{db}/first_block_conv/kernel",
        conv1d_k_w(sd[f"{db}.first_block_conv.conv.weight"]))
    put(f"{db}/first_block_conv/bias", _t(sd[f"{db}.first_block_conv.conv.bias"]))
    for i in range(n_block):
        src = f"{db}.basicblock_list.{i}"
        dst = f"{db}/block_{i}"
        put(f"{dst}/conv1/kernel", conv1d_k_w(sd[f"{src}.conv1.conv.weight"]))
        put(f"{dst}/conv1/bias", _t(sd[f"{src}.conv1.conv.bias"]))
        put(f"{dst}/conv2/kernel", conv1d_k_w(sd[f"{src}.conv2.conv.weight"]))
        put(f"{dst}/conv2/bias", _t(sd[f"{src}.conv2.conv.bias"]))
    put(f"{db}/dense/kernel", linear_w(sd[f"{db}.dense.weight"]))
    put(f"{db}/dense/bias", _t(sd[f"{db}.dense.bias"]))
    return {"params": p}


def load_pips2_checkpoint(path: str, template=None):
    file = resolve_pips_checkpoint_file(path)
    sd = load_torch_state_dict(file)
    params = convert_pips2_state_dict(sd)
    if template is not None:
        validate_against_template(params, template)
    return params


# ---------------------------------------------------------------------------
# TAPIR / TapNet conversion (haiku numpy-pickle checkpoints)
# ---------------------------------------------------------------------------

def load_haiku_npy(path: str) -> Dict[str, Any]:
    """Load a numpy-pickled haiku params dict (reference tapir/tracker.py:44)."""
    raw = np.load(path, allow_pickle=True).item()
    if "params" in raw:  # cleaned checkpoints store {'params': ..., 'state':}
        raw = raw["params"]
    return raw


def convert_tapir_haiku_params(hk_params: Dict[str, Any]) -> Dict[str, Any]:
    """Haiku TAPIR checkpoint -> this package's flax tree.

    Haiku module paths ('tapir/~/resnet/~/block_group_i/~/block_j/~/conv_0',
    'tapir/~/pips_mlp_mixer/block_k/...') map onto our module names; haiku
    conv kernels are already [kh, kw, in, out] (no transpose needed), linear
    kernels are [in, out].
    """
    p: Dict[str, Any] = {}

    put = _make_put(p)

    for key, leaf in hk_params.items():
        parts = key.replace("~/", "").replace("tapir/", "").split("/")
        mapped = _map_tapir_module(parts)
        if mapped is None:
            continue
        for wname, w in leaf.items():
            out_name = {"w": "kernel", "b": "bias",
                        "scale": "scale", "offset": "offset"}.get(wname, wname)
            put(f"{mapped}/{out_name}", np.asarray(w))
    return {"params": p}


def _map_tapir_module(parts):
    """Map haiku module path parts to our flax module path (best effort)."""
    joined = "/".join(parts)
    if parts[0] == "resnet":
        if parts[-1] == "initial_conv":
            return "resnet/initial_conv"
        # block_group_i/block_j/{conv_k, shortcut_conv, instancenorm_k}
        import re as _re

        m = _re.search(r"block_group_(\d)(?:/block_(\d))?/?(.*)", joined)
        if not m:
            return None
        gi, bi, rest = m.group(1), m.group(2) or "0", m.group(3)
        base = f"resnet/group{gi}_block{bi}"
        rest = rest.strip("/")
        if rest.startswith("conv_"):
            return f"{base}/{rest}"
        if rest == "shortcut_conv":
            return f"{base}/shortcut_conv"
        if rest.startswith("instancenorm_"):
            idx = rest.split("_")[-1]
            return f"{base}/norm_{idx}"
        return None
    if parts[0] == "pips_mlp_mixer":
        return _map_tapir_mixer(parts[1:])
    mapping = {
        "cost_volume_regression_1": "cost_volume_regression_1",
        "cost_volume_regression_2": "cost_volume_regression_2",
        "cost_volume_occlusion_1": "cost_volume_occlusion_1",
        "cost_volume_occlusion_2": "cost_volume_occlusion_2",
        "occlusion_out": "occlusion_out",
    }
    return mapping.get(parts[-1])


def load_tapir_checkpoint(path: str, template=None):
    hk_params = load_haiku_npy(path)
    params = convert_tapir_haiku_params(hk_params)
    if template is not None:
        validate_against_template(params, template)
    return params


# ---------------------------------------------------------------------------
# SuperPoint / SuperGlue conversion
# ---------------------------------------------------------------------------

def convert_superpoint_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """magicleap superpoint_v1.pth -> flax params tree (names match 1:1)."""
    p: Dict[str, Any] = {}
    for name in ("conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
                 "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb"):
        p[name] = {
            "kernel": conv_w(sd[f"{name}.weight"]),
            "bias": _t(sd[f"{name}.bias"]),
        }
    return {"params": p}


def convert_superglue_state_dict(sd: Dict[str, Any],
                                 gnn_layers: int = 9) -> Dict[str, Any]:
    """magicleap superglue_{indoor,outdoor}.pth -> flax params tree.

    Namespaces: kenc.encoder.{0,3,6,9} convs + {1,4,7} BNs;
    gnn.layers.{i} alternating self/cross AttentionalPropagation with
    attn.proj.{0,1,2}=q/k/v, attn.merge, mlp.{0,1,3}; final_proj; bin_score.
    """
    p: Dict[str, Any] = {}

    put = _make_put(p)

    def bn(src, dst):
        put(f"{dst}/scale", _t(sd[f"{src}.weight"]))
        put(f"{dst}/bias", _t(sd[f"{src}.bias"]))
        put(f"{dst}/mean", _t(sd[f"{src}.running_mean"]))
        put(f"{dst}/var", _t(sd[f"{src}.running_var"]))

    def c1d(src, dst):
        put(f"{dst}/kernel", conv1d_w(sd[f"{src}.weight"]))
        put(f"{dst}/bias", _t(sd[f"{src}.bias"]))

    # keypoint encoder: MLP([3, 32, 64, 128, 256, 256]) — BN+ReLU after each
    # of the four hidden convs (encoder indices 0,3,6,9), plain conv out (12)
    for li, conv_idx in enumerate((0, 3, 6, 9)):
        c1d(f"kenc.encoder.{conv_idx}", f"kenc/layer_{li}/lin")
        bn(f"kenc.encoder.{conv_idx + 1}", f"kenc/layer_{li}/bn")
    c1d("kenc.encoder.12", "kenc/out")

    def attn_prop(src, dst):
        for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
            c1d(f"{src}.attn.proj.{i}", f"{dst}/attn/{name}")
        c1d(f"{src}.attn.merge", f"{dst}/attn/merge")
        c1d(f"{src}.mlp.0", f"{dst}/mlp_0/lin")
        bn(f"{src}.mlp.1", f"{dst}/mlp_0/bn")
        c1d(f"{src}.mlp.3", f"{dst}/mlp_out")

    for i in range(gnn_layers):
        attn_prop(f"gnn.layers.{2 * i}", f"self_{i}")
        attn_prop(f"gnn.layers.{2 * i + 1}", f"cross_{i}")

    c1d("final_proj", "final_proj")
    put("bin_score", _t(sd["bin_score"]))
    return {"params": p}


def load_superglue_checkpoint(superpoint_path: str, superglue_path: str,
                              templates=None):
    sp = convert_superpoint_state_dict(load_torch_state_dict(superpoint_path))
    sg = convert_superglue_state_dict(load_torch_state_dict(superglue_path))
    if templates is not None:
        validate_against_template(sp, templates[0])
        validate_against_template(sg, templates[1])
    return {"superpoint": sp, "superglue": sg}


def _map_tapir_mixer(parts):
    """Map haiku pips_mlp_mixer submodule paths to our PIPSMLPMixer names.

    Haiku auto-numbering: 'linear' = input projection, 'linear_1' = output
    head, top-level 'layer_norm' = final norm; per block ('block', 'block_1',
    ...): 'layer_norm'/'layer_norm_1' = pre-norms, 'mlp1_up'/'mlp1_up_1' =
    the two depthwise convs (both named mlp1_up in the reference source,
    tapir_model.py:59-82), 'mlp2_up'/'mlp2_down' = channel mixer.
    """
    if not parts:
        return None
    head = parts[0]
    base = "pips_mixer"
    if head == "linear":
        return f"{base}/input_proj"
    if head == "linear_1":
        return f"{base}/out_proj"
    if head == "layer_norm":
        return f"{base}/out_norm"
    if head.startswith("block"):
        idx = 0 if head == "block" else int(head.split("_")[-1])
        sub = parts[1] if len(parts) > 1 else ""
        mapping = {
            "layer_norm": "norm1",
            "layer_norm_1": "norm2",
            "mlp1_up": "dw1",
            "mlp1_up_1": "dw2",
            "mlp2_up": "mlp2_up",
            "mlp2_down": "mlp2_down",
        }
        if sub in mapping:
            return f"{base}/block_{idx}/{mapping[sub]}"
    return None


def convert_tapnet_haiku_params(raw: Dict[str, Any]) -> Dict[str, Any]:
    """Haiku TapNet checkpoint -> flax tree.

    Haiku namespace (verified against a random-init reference transform,
    tests/test_parity_tapnet.py):
      tap_net/~/cost_volume_*               Conv3D [1,kh,kw] heads / Linears
      tap_net/~/tsm_resnet_video/tsm_resnet_stem
      tap_net/~/tsm_resnet_video/tsm_resnet_unit_{u}/block_{b}/
        {conv_0, conv_2, shortcut_conv, batch_norm, batch_norm_1}
    BatchNorm moving averages live in the haiku `state` dict
    ('.../batch_norm/~/mean_ema' {counter, hidden, average}); the debiased
    'average' is folded into the InferenceBatchNorm mean/var parameters.
    """
    hk_params = raw.get("params", raw)
    hk_state = raw.get("state", {})
    p: Dict[str, Any] = {}

    put = _make_put(p)

    import re as _re

    def map_resnet(sub):
        if "tsm_resnet_stem" in sub:
            return "tsm_resnet/initial_conv"
        m = _re.search(r"tsm_resnet_unit_(\d+)/block_(\d+)/(.*)", sub)
        if not m:
            return None
        ui, bi, rest = m.group(1), m.group(2), m.group(3).strip("/")
        base = f"tsm_resnet/unit{ui}_block{bi}"
        rest_map = {
            "conv_0": "conv_0", "conv_2": "conv_2",
            "shortcut_conv": "shortcut_conv",
            "batch_norm": "bn_pre", "batch_norm_1": "bn_1",
        }
        return f"{base}/{rest_map[rest]}" if rest in rest_map else None

    conv3d_heads = {
        "cost_volume_regression_1",
        "cost_volume_regression_2",
        "cost_volume_occlusion_1",
    }
    head_map = {
        "cost_volume_regression_1": "cost_volume_regression_1",
        "cost_volume_regression_2": "cost_volume_regression_2",
        "cost_volume_occlusion_1": "cost_volume_occlusion_1",
        "cost_volume_occlusion_2": "cost_volume_occlusion_2",
        "occlusion_out": "occlusion_out",
    }

    for key, leaf in hk_params.items():
        sub = key.replace("~/", "").replace("tap_net/", "")
        sub = sub.replace("tsm_resnet_video/", "")
        tail = sub.split("/")[-1]
        mapped = map_resnet(sub) if "tsm_resnet" in sub else head_map.get(tail)
        if mapped is None:
            continue
        for wname, w in leaf.items():
            w = np.asarray(w)
            if wname == "w" and tail in conv3d_heads:
                w = w[0]  # Conv3D [1, kh, kw, in, out] -> 2D [kh, kw, in, out]
            if wname in ("scale", "offset"):
                w = w.reshape(-1)  # BN affine stored as [1, 1, 1, C]
            out_name = {"w": "kernel", "b": "bias",
                        "scale": "scale", "offset": "bias"}.get(wname, wname)
            put(f"{mapped}/{out_name}", w)

    for key, leaf in hk_state.items():
        sub = key.replace("~/", "").replace("tap_net/", "")
        sub = sub.replace("tsm_resnet_video/", "")
        stat = "mean" if "mean_ema" in sub else (
            "var" if "var_ema" in sub else None)
        if stat is None:
            continue
        mapped = map_resnet(sub.replace("/mean_ema", "").replace("/var_ema", ""))
        if mapped is None:
            continue
        avg = leaf.get("average", leaf) if isinstance(leaf, dict) else leaf
        put(f"{mapped}/{stat}", np.asarray(avg).reshape(-1))
    return {"params": p}


def load_tapnet_checkpoint(path: str, template=None):
    raw = np.load(path, allow_pickle=True).item()
    params = convert_tapnet_haiku_params(raw)
    if template is not None:
        validate_against_template(params, template)
    return params
