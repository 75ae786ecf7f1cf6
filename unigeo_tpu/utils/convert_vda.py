"""DepthAnything/DINOv2-lineage checkpoint → unigeo_tpu VDA conversion.

The reference lists VideoDepthAnything among its supported methods
(model/Readme.md:6) but ships no adapter; the public VDA release is a
DINOv2 ViT backbone (state-dict prefix ``pretrained.``) plus a DPT head
with temporal motion modules (prefix ``head.``; plain DepthAnything uses
``depth_head.``).  This module maps those torch key names onto the flax
tree of models/vda.VDANetwork so a shipped checkpoint has a tested load
path (zero-egress here; coverage is pinned by roundtrip tests in
tests/test_convert_aether_vda.py).

Structural correspondences:

  backbone  pretrained.patch_embed.proj       → patch_embed/proj
            pretrained.cls_token [1,1,C]      → cls_token (C,)   (enable
                use_class_token on VDANetwork)
            pretrained.pos_embed [1,1+37²,C]  → pos_embed [1+37²,C]
                (enable learned_pos_embed; non-native grids are sliced)
            pretrained.norm                   → hook_norm (enable
                hook_norm — DINOv2 get_intermediate_layers(norm=True))
            pretrained.blocks.{i}.attn.qkv    → split to_q/to_k/to_v and
                stacked on a leading depth axis (nn.scan layout
                blocks/layers/block/...)
            pretrained.blocks.{i}.ls{1,2}.gamma (DINOv2 LayerScale) —
                FOLDED exactly into the branch output projections:
                out = γ ⊙ (h Wᵀ + b) = h (Wᵀ diag γ) + γ ⊙ b, so
                to_out.kernel *= γ per column and to_out.bias *= γ
                (likewise mlp/fc2); no LayerScale module needed.

  head      projects.{k}                      → act_postprocess_{k}_proj
            resize_layers.{0,1}  (ConvTranspose2d ×4 / ×2)
                                              → act_postprocess_{0,1}_resample
            resize_layers.3      (Conv2d s2)  → act_postprocess_3_resample
            scratch.layer{k}_rn / refinenet{k} → layer{k}_rn / refinenet{k}
            scratch.output_conv1              → head_0
            scratch.output_conv2.{0,2}        → head_2 / head_4
            motion_modules.{h}.* (temporal attention blocks, timm block
                naming assumed)               → temporal_{h}/*

ConvTranspose layout follows utils/convert_dust3r.convert_dpt_tensor
(torch [in,out,kh,kw] → flax [kh,kw,in,out] plus the spatial flip).
Unrecognized keys (mask tokens, register tokens, ...) are skipped and
surface in graft_flat_params' missed report.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np

from unigeo_tpu.utils.convert_dust3r import convert_dpt_tensor


def _np(tensor) -> np.ndarray:
    return tensor.numpy() if hasattr(tensor, "numpy") else np.asarray(tensor)


def _linear(arr: np.ndarray) -> np.ndarray:
    return np.transpose(arr, (1, 0)) if arr.ndim == 2 else arr


def _conv(arr: np.ndarray) -> np.ndarray:
    return np.transpose(arr, (2, 3, 1, 0)) if arr.ndim == 4 else arr


# ---------------------------------------------------------------------------
# timm/DINOv2-style ViT block → our ViTBlock subtree (with LayerScale fold)
# ---------------------------------------------------------------------------


def vit_block_entries(
    sub: Dict[str, np.ndarray],
) -> List[Tuple[Tuple[str, ...], np.ndarray]]:
    """One block's {torch subkey: array} → [(flax subpath, array), ...].

    Handles the fused qkv split and folds ls1/ls2 LayerScale gammas into
    to_out / fc2 (exact — see module docstring).  Unknown keys are
    ignored.
    """
    out: List[Tuple[Tuple[str, ...], np.ndarray]] = []
    g1 = sub.get("ls1.gamma")
    g2 = sub.get("ls2.gamma")
    for name, arr in sub.items():
        if name in ("ls1.gamma", "ls2.gamma"):
            continue
        if "." not in name:
            continue
        stem, leaf = name.rsplit(".", 1)
        if leaf not in ("weight", "bias"):
            continue
        is_w = leaf == "weight"
        if stem == "attn.qkv":
            for n, t in zip("qkv", np.split(arr, 3, axis=0)):
                out.append(
                    (("attn", f"to_{n}", "kernel" if is_w else "bias"),
                     _linear(t) if is_w else t))
        elif stem == "attn.proj":
            val = _linear(arr) if is_w else arr
            if g1 is not None:
                val = val * (g1[None, :] if is_w else g1)
            out.append((("attn", "to_out", "kernel" if is_w else "bias"), val))
        elif stem in ("norm1", "norm2"):
            out.append(((stem, "scale" if is_w else "bias"), arr))
        elif stem == "mlp.fc1":
            out.append(
                (("mlp", "fc1", "kernel" if is_w else "bias"),
                 _linear(arr) if is_w else arr))
        elif stem == "mlp.fc2":
            val = _linear(arr) if is_w else arr
            if g2 is not None:
                val = val * (g2[None, :] if is_w else g2)
            out.append((("mlp", "fc2", "kernel" if is_w else "bias"), val))
    return out


def convert_dinov2_backbone(
    state_dict: Dict[str, Any], prefix: str = "pretrained."
) -> Dict[Tuple[str, ...], np.ndarray]:
    """DINOv2-style torch backbone keys → flat {flax path: array} rooted at
    the VDANetwork tree (patch_embed / cls_token / pos_embed / hook_norm /
    blocks stacked for nn.scan)."""
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    stacks: Dict[Tuple[str, ...], Dict[int, np.ndarray]] = {}
    per_layer: Dict[int, Dict[str, np.ndarray]] = {}

    blk = re.compile(r"^blocks\.(\d+)\.(.*)$")
    for name, tensor in state_dict.items():
        if not name.startswith(prefix):
            continue
        name = name[len(prefix):]
        arr = _np(tensor)
        if name == "cls_token":
            flat[("cls_token",)] = arr.reshape(-1)
        elif name == "pos_embed":
            flat[("pos_embed",)] = arr.reshape(arr.shape[-2], arr.shape[-1])
        elif name == "patch_embed.proj.weight":
            flat[("patch_embed", "proj", "kernel")] = _conv(arr)
        elif name == "patch_embed.proj.bias":
            flat[("patch_embed", "proj", "bias")] = arr
        elif name == "norm.weight":
            flat[("hook_norm", "scale")] = arr
        elif name == "norm.bias":
            flat[("hook_norm", "bias")] = arr
        else:
            m = blk.match(name)
            if m:
                per_layer.setdefault(int(m.group(1)), {})[m.group(2)] = arr
            # mask_token / register_tokens: skipped

    for idx, sub in per_layer.items():
        for subpath, val in vit_block_entries(sub):
            stacks.setdefault(subpath, {})[idx] = val
    for subpath, by_idx in stacks.items():
        depth = max(by_idx) + 1
        assert sorted(by_idx) == list(range(depth)), f"missing layers at {subpath}"
        flat[("blocks", "layers", "block") + subpath] = np.stack(
            [by_idx[i] for i in range(depth)])
    return flat


# ---------------------------------------------------------------------------
# DepthAnything DPT head → our DPTHead subtree
# ---------------------------------------------------------------------------

_HEAD_RULES = [
    (r"^projects\.(\d)\.", r"act_postprocess_\1_proj."),
    (r"^resize_layers\.([013])\.", r"act_postprocess_\1_resample."),
    (r"^scratch\.layer(\d)_rn\.", r"layer\1_rn."),
    (r"^scratch\.refinenet(\d)\.", r"refinenet\1."),
    (r"^scratch\.output_conv1\.", "head_0."),
    (r"^scratch\.output_conv2\.0\.", "head_2."),
    (r"^scratch\.output_conv2\.2\.", "head_4."),
]

# resize_layers 0/1 are ConvTranspose2d — need the flipped layout
_HEAD_TRANSPOSED = re.compile(r"^resize_layers\.[01]\.weight$")


def convert_da_head(
    state_dict: Dict[str, Any], prefix: str = "depth_head."
) -> Dict[Tuple[str, ...], np.ndarray]:
    """DepthAnything-style DPT-head keys → flat {flax path: array} rooted
    at VDANetwork's ``head`` module.  Temporal motion modules are handled
    by convert_vda_checkpoint (they live OUTSIDE the DPT tree here)."""
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    for name, tensor in state_dict.items():
        if not name.startswith(prefix):
            continue
        name = name[len(prefix):]
        if name.startswith("motion_modules."):
            continue
        arr = _np(tensor)
        if _HEAD_TRANSPOSED.match(name):
            arr = convert_dpt_tensor("act_postprocess.0.1.weight", arr)
        elif name.endswith(".weight"):
            arr = _linear(arr) if arr.ndim == 2 else _conv(arr)
        renamed = name
        for pattern, repl in _HEAD_RULES:
            renamed = re.sub(pattern, repl, renamed)
        parts = renamed.split(".")
        leaf = parts[-1]
        if leaf == "weight":
            leaf = "kernel"
        flat[("head",) + tuple(parts[:-1] + [leaf])] = arr
    return flat


def convert_vda_checkpoint(
    state_dict: Dict[str, Any],
    backbone_prefix: str = "pretrained.",
    head_prefix: str = "head.",
) -> Dict[Tuple[str, ...], np.ndarray]:
    """Full VideoDepthAnything state dict → flat {flax path: array} for
    models/vda.VDANetwork (backbone + DPT head + temporal modules).

    For plain DepthAnything checkpoints pass head_prefix='depth_head.'
    (they have no motion modules; the temporal blocks then stay at their
    init and the load degenerates to per-frame DepthAnything)."""
    flat = convert_dinov2_backbone(state_dict, prefix=backbone_prefix)
    flat.update(convert_da_head(state_dict, prefix=head_prefix))

    per_mod: Dict[int, Dict[str, np.ndarray]] = {}
    mm = re.compile(
        re.escape(head_prefix) + r"motion_modules\.(\d+)\.(.*)$")
    for name, tensor in state_dict.items():
        m = mm.match(name)
        if m:
            per_mod.setdefault(int(m.group(1)), {})[m.group(2)] = _np(tensor)
    for h, sub in per_mod.items():
        for subpath, val in vit_block_entries(sub):
            flat[(f"temporal_{h}",) + subpath] = val
    return flat
