"""diffusers-SVD checkpoint → unigeo_tpu param-tree conversion tables.

Maps the state-dict key names of the three SVD components the reference
pipeline loads (model/depthcrafter.py:18-29 — the UNet, the temporal-decoder
VAE, the CLIP-H image encoder) onto this repo's flax trees, including:

  * layout transposes (utils/checkpoint.convert_tensor);
  * structural renames (down_blocks.0.resnets.1.* → down_0_res_1/*, ...);
  * stacking per-layer CLIP blocks into the nn.scan layout
    (encoder.layers.{i}.* → vision_model/blocks/layers/block/* with a
    leading depth axis).

Entry point: convert_svd_checkpoint(state_dicts, flax_params) →
(params, report).  Works leaf-by-leaf so partially-matching checkpoints
load what they can and report the rest.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

from unigeo_tpu.utils.checkpoint import convert_tensor

# ---------------------------------------------------------------------------
# UNet renames (diffusers UNetSpatioTemporalConditionModel)
# ---------------------------------------------------------------------------

_UNET_RULES = [
    (r"^conv_in\.", "conv_in."),
    (r"^conv_out\.", "conv_out."),
    (r"^conv_norm_out\.", "conv_norm_out."),
    (r"^time_embedding\.", "time_embedding."),
    (r"^add_embedding\.", "add_embedding."),
    (r"^down_blocks\.(\d+)\.resnets\.(\d+)\.", r"down_\1_res_\2."),
    (r"^down_blocks\.(\d+)\.attentions\.(\d+)\.", r"down_\1_attn_\2."),
    (r"^down_blocks\.(\d+)\.downsamplers\.0\.", r"down_\1_downsample."),
    (r"^mid_block\.resnets\.(\d+)\.", r"mid_res_\1."),
    (r"^mid_block\.attentions\.0\.", "mid_attn."),
    (r"^up_blocks\.(\d+)\.resnets\.(\d+)\.", r"up_\1_res_\2."),
    (r"^up_blocks\.(\d+)\.attentions\.(\d+)\.", r"up_\1_attn_\2."),
    (r"^up_blocks\.(\d+)\.upsamplers\.0\.", r"up_\1_upsample."),
]

_COMMON_RULES = [
    (r"\.transformer_blocks\.0\.", ".transformer_blocks_0."),
    (r"\.temporal_transformer_blocks\.0\.", ".temporal_transformer_blocks_0."),
    (r"(^|\.)to_out\.0\.", r"\1to_out."),
    (r"\.ff\.net\.0\.proj\.", ".ff.net_0.proj."),
    (r"\.ff\.net\.2\.", ".ff.net_2."),
    (r"\.ff_in\.net\.0\.proj\.", ".ff_in.net_0.proj."),
    (r"\.ff_in\.net\.2\.", ".ff_in.net_2."),
    # VAE temporal decoder time-mix convs
    (r"\.time_mix_conv\.", ".time_conv_out."),
    (r"\.temporal_res_block\.conv1\.", ".temporal_res_block.conv1."),
]

# ---------------------------------------------------------------------------
# VAE renames (AutoencoderKLTemporalDecoder)
# ---------------------------------------------------------------------------

_VAE_RULES = [
    (r"^encoder\.conv_in\.", "encoder.conv_in."),
    (r"^encoder\.conv_out\.", "encoder.conv_out."),
    (r"^encoder\.conv_norm_out\.", "encoder.conv_norm_out."),
    (r"^encoder\.down_blocks\.(\d+)\.resnets\.(\d+)\.", r"encoder.down_\1_res_\2."),
    # the flax encoder/decoder use a bare Conv2d for down/upsampling (no
    # inner "conv" level), so the Conv_0 wrapper level is injected here
    (r"^encoder\.down_blocks\.(\d+)\.downsamplers\.0\.conv\.",
     r"encoder.down_\1_downsample.Conv_0."),
    (r"^encoder\.mid_block\.resnets\.(\d+)\.", r"encoder.mid_res_\1."),
    (r"^encoder\.mid_block\.attentions\.0\.", "encoder.mid_attn."),
    (r"^decoder\.conv_in\.", "decoder.conv_in."),
    (r"^decoder\.conv_out\.", "decoder.conv_out."),
    (r"^decoder\.conv_norm_out\.", "decoder.conv_norm_out."),
    (r"^decoder\.time_conv_out\.", "decoder.time_conv_out."),
    (r"^decoder\.mid_block\.resnets\.(\d+)\.", r"decoder.mid_res_\1."),
    (r"^decoder\.mid_block\.attentions\.0\.", "decoder.mid_attn."),
    # flax VaeAttnBlock nests an Attention module named "attn"; inject that
    # level so encoder.mid_attn and decoder.mid_attn resolve unambiguously
    # (without it both score identically on suffix and the first wins)
    (r"(mid_attn)\.(to_q|to_k|to_v|to_out)\.", r"\1.attn.\2."),
    (r"^decoder\.up_blocks\.(\d+)\.resnets\.(\d+)\.", r"decoder.up_\1_res_\2."),
    (r"^decoder\.up_blocks\.(\d+)\.upsamplers\.0\.conv\.",
     r"decoder.up_\1_upsample.Conv_0."),
]

# ---------------------------------------------------------------------------
# CLIP vision tower renames (transformers CLIPVisionModelWithProjection)
# ---------------------------------------------------------------------------

_CLIP_RULES = [
    (r"^visual_projection\.", "visual_projection."),
    (r"^vision_model\.embeddings\.patch_embedding\.", "vision_model.patch_embed.proj."),
    (r"^vision_model\.embeddings\.class_embedding$", "vision_model.class_embedding"),
    (r"^vision_model\.embeddings\.position_embedding\.weight$", "vision_model.pos_embed"),
    (r"^vision_model\.pre_layrnorm\.", "vision_model.pre_norm."),
    (r"^vision_model\.post_layernorm\.", "vision_model.post_norm."),
    # per-layer keys handled by the stacker below
    (r"\.self_attn\.q_proj\.", ".attn.to_q."),
    (r"\.self_attn\.k_proj\.", ".attn.to_k."),
    (r"\.self_attn\.v_proj\.", ".attn.to_v."),
    (r"\.self_attn\.out_proj\.", ".attn.to_out."),
    (r"\.layer_norm1\.", ".norm1."),
    (r"\.layer_norm2\.", ".norm2."),
    (r"\.mlp\.fc1\.", ".mlp.fc1."),
    (r"\.mlp\.fc2\.", ".mlp.fc2."),
]


# Our GroupNorm wrapper (models/layers.py) nests an inner nn.GroupNorm, so
# group-norm sites carry an extra "GroupNorm_0" path level that diffusers
# names lack.  Inserted ONLY at group-norm sites — transformer norm1/2/3 are
# plain LayerNorms without the extra level.
# Conv wrapper nesting: our Conv2d/TemporalConv wrap an inner unnamed
# nn.Conv, adding a "Conv_0" path level.  Exception: the temporal resnet
# shortcut is an nn.Dense (named directly), fixed up after the general rule.
_CONV_SITES = [
    (
        r"(^|\.)((?:conv1|conv2|conv_shortcut|conv_in|conv_out|conv|quant_conv|"
        r"time_conv_1|time_conv_2|time_conv_out))\.(weight|bias)$",
        r"\1\2.Conv_0.\3",
    ),
    (r"temporal_res_block\.conv_shortcut\.Conv_0\.", "temporal_res_block.conv_shortcut."),
]

_GROUPNORM_SITES = [
    (r"((?:spatial|temporal)_res_block)\.(norm[12])\.", r"\1.\2.GroupNorm_0."),
    (r"((?:_attn_\d+|mid_attn))\.norm\.", r"\1.norm.GroupNorm_0."),
    (r"conv_norm_out\.", "conv_norm_out.GroupNorm_0."),
    (r"((?:encoder|decoder)\.(?:down|up|mid)_[^.]+)\.(norm[12])\.", r"\1.\2.GroupNorm_0."),
    (r"\.group_norm\.", ".group_norm.GroupNorm_0."),
]


def _apply_rules(name: str, rules) -> str:
    for pattern, repl in rules:
        name = re.sub(pattern, repl, name)
    return name


def _to_flax_leaf(name: str) -> Tuple[str, ...]:
    """torch suffixes → flax leaf names (norm weight→scale etc.)."""
    parts = name.split(".")
    leaf = parts[-1]
    parent = parts[-2].lower() if len(parts) > 1 else ""
    if leaf == "weight":
        leaf = "scale" if "norm" in parent else "kernel"
    return tuple(parts[:-1] + [leaf])


def rename_unet_key(name: str) -> Tuple[str, ...]:
    name = _apply_rules(_apply_rules(name, _UNET_RULES), _COMMON_RULES)
    name = _apply_rules(name, _GROUPNORM_SITES)
    return _to_flax_leaf(_apply_rules(name, _CONV_SITES))


def rename_vae_key(name: str) -> Tuple[str, ...]:
    name = _apply_rules(_apply_rules(name, _VAE_RULES), _COMMON_RULES)
    name = _apply_rules(name, _GROUPNORM_SITES)
    return _to_flax_leaf(_apply_rules(name, _CONV_SITES))


def rename_clip_key(name: str) -> Tuple[str, ...]:
    return _to_flax_leaf(_apply_rules(name, _CLIP_RULES))


def convert_component(
    state_dict: Dict[str, Any], rename, stack_layers_prefix: str = None
) -> Dict[Tuple[str, ...], np.ndarray]:
    """torch state dict → {flax path: transposed array}.

    stack_layers_prefix: e.g. ``vision_model.encoder.layers`` — per-layer
    entries under it are stacked on a new leading axis and re-rooted at
    ``.../blocks/layers/block`` (the nn.scan layout).
    """
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    layered: Dict[Tuple[str, ...], Dict[int, np.ndarray]] = {}
    layer_re = (
        re.compile(re.escape(stack_layers_prefix) + r"\.(\d+)\.(.*)")
        if stack_layers_prefix
        else None
    )

    for name, tensor in state_dict.items():
        arr = tensor.numpy() if hasattr(tensor, "numpy") else np.asarray(tensor)
        arr = convert_tensor(name, arr)
        if layer_re is not None:
            m = layer_re.match(name)
            if m:
                idx = int(m.group(1))
                sub = rename(f"layers.{m.group(2)}")  # reuse suffix rules
                sub = sub[1:]  # drop the 'layers' level
                root = tuple(stack_layers_prefix.split(".")[:-1])  # vision_model...
                path = root[:1] + ("blocks", "layers", "block") + sub
                layered.setdefault(path, {})[idx] = arr
                continue
        flat[rename(name)] = arr

    for path, by_idx in layered.items():
        depth = max(by_idx) + 1
        flat[path] = np.stack([by_idx[i] for i in range(depth)])
    return flat


def convert_svd_checkpoint(
    unet_sd: Dict[str, Any] = None,
    vae_sd: Dict[str, Any] = None,
    clip_sd: Dict[str, Any] = None,
) -> Dict[Tuple[str, ...], np.ndarray]:
    """Convert any subset of the three component state dicts into one flat
    {path: array} mapping ready for checkpoint.graft_flat_params."""
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    if unet_sd:
        for k, v in convert_component(unet_sd, rename_unet_key).items():
            flat[("unet",) + k] = v
    if vae_sd:
        for k, v in convert_component(vae_sd, rename_vae_key).items():
            flat[("vae",) + k] = v
    if clip_sd:
        for k, v in convert_component(
            clip_sd, rename_clip_key, stack_layers_prefix="vision_model.encoder.layers"
        ).items():
            flat[("clip",) + k] = v
    return flat
