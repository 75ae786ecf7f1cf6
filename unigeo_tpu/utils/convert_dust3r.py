"""DUSt3R-lineage checkpoint → unigeo_tpu pointmap-tree conversion.

The reference loads DUSt3R-family torch checkpoints for its pointmap
adapters (reference: model/spann3r.py:16-21 — Spann3R atop a DUSt3R ckpt;
model/cut3r.py:18-26 — ARCroco3DStereo).  Those networks regress through
DPT heads (``downstream_head{1,2}.dpt.*`` / ``dpt.*`` keys).  This module
maps the torch key names of those DPT heads onto the flax tree of
models/pointmap/dpt.py, including the ConvTranspose layout quirk (torch
ConvTranspose2d weights are [in, out, kh, kw], the opposite of Conv2d).

Backbone caveat (documented, deliberate): the CroCo/DUSt3R encoders use
RoPE relative position embeddings while the TPU backbone uses fixed sin-cos
absolute embeddings — backbone weights convert name-for-name via
``rename_backbone_key`` but are NOT numerics-equivalent until a RoPE option
lands (ROADMAP).  The DPT head conversion below IS exact
(tests/test_dpt_parity.py golden test).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

# torch Sequential slots → our named modules
_DPT_RULES = [
    (r"(^|\.)act_postprocess\.0\.0\.", r"\1act_postprocess_0_proj."),
    (r"(^|\.)act_postprocess\.0\.1\.", r"\1act_postprocess_0_resample."),
    (r"(^|\.)act_postprocess\.1\.0\.", r"\1act_postprocess_1_proj."),
    (r"(^|\.)act_postprocess\.1\.1\.", r"\1act_postprocess_1_resample."),
    (r"(^|\.)act_postprocess\.2\.0\.", r"\1act_postprocess_2_proj."),
    (r"(^|\.)act_postprocess\.3\.0\.", r"\1act_postprocess_3_proj."),
    (r"(^|\.)act_postprocess\.3\.1\.", r"\1act_postprocess_3_resample."),
    (r"(^|\.)scratch\.layer(\d)_rn\.", r"\1layer\2_rn."),
    (r"(^|\.)scratch\.refinenet(\d)\.", r"\1refinenet\2."),
    (r"(^|\.)head\.0\.", r"\1head_0."),
    (r"(^|\.)head\.2\.", r"\1head_2."),
    (r"(^|\.)head\.4\.", r"\1head_4."),
]

# these leaves are ConvTranspose2d: [in, out, kh, kw] → [kh, kw, in, out]
_TRANSPOSED_CONVS = re.compile(
    r"act_postprocess\.[01]\.1\.weight$|act_postprocess_[01]_resample"
)


def convert_dpt_tensor(name: str, value: np.ndarray) -> np.ndarray:
    if name.endswith(".weight"):
        if value.ndim == 4:
            if _TRANSPOSED_CONVS.search(name):
                # torch ConvTranspose2d [in, out, kh, kw] → flax
                # [kh, kw, in, out] PLUS a spatial flip: flax ConvTranspose
                # (transpose_kernel=False) runs the kernel in forward-conv
                # orientation, torch in gradient orientation (verified
                # numerically in tests/test_dpt_parity.py)
                return np.transpose(value, (2, 3, 0, 1))[::-1, ::-1].copy()
            return np.transpose(value, (2, 3, 1, 0))
        if value.ndim == 2:
            return np.transpose(value, (1, 0))
    return value


def rename_dpt_key(name: str) -> Tuple[str, ...]:
    for pattern, repl in _DPT_RULES:
        name = re.sub(pattern, repl, name)
    parts = name.split(".")
    leaf = parts[-1]
    if leaf == "weight":
        leaf = "kernel"
    return tuple(parts[:-1] + [leaf])


def convert_dpt_head(state_dict: Dict[str, Any]) -> Dict[Tuple[str, ...], np.ndarray]:
    """torch DPT-head state dict (dust3r dpt_block naming) → flat flax map.

    Accepts keys rooted at the head (``act_postprocess...``) or with the
    dust3r prefixes (``dpt.``, ``downstream_head1.dpt.``) — prefixes are
    stripped to the shared ``dpt`` root of DPTPointmapHead.
    """
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    for name, tensor in state_dict.items():
        arr = tensor.numpy() if hasattr(tensor, "numpy") else np.asarray(tensor)
        stripped = re.sub(r"^(downstream_head\d+\.)?(dpt\.)?", "", name)
        arr = convert_dpt_tensor(stripped, arr)
        flat[("dpt",) + rename_dpt_key(stripped)] = arr
    return flat


# ---------------------------------------------------------------------------
# backbone renames (name-parity; see module docstring caveat on RoPE)
# ---------------------------------------------------------------------------

_BACKBONE_RULES = [
    (r"^patch_embed\.proj\.", "patch_embed.proj."),
    (r"^enc_blocks\.(\d+)\.", r"encoder.blocks.layers.\1.block."),
    (r"^dec_blocks\.(\d+)\.", r"decoder.blocks.layers.\1.block."),
    (r"^enc_norm\.", "encoder.norm."),
    (r"^dec_norm\.", "decoder.norm."),
    (r"^decoder_embed\.", "decoder.proj_in."),
    (r"\.attn\.proj\.", ".attn.to_out."),
    (r"\.cross_attn\.proj\.", ".cross_attn.to_out."),
    (r"\.norm3\.", ".norm_cross."),  # croco decoder: norm3 gates cross-attn
    (r"\.mlp\.fc1\.", ".mlp.fc1."),
    (r"\.mlp\.fc2\.", ".mlp.fc2."),
]


def rename_backbone_key(name: str) -> Tuple[str, ...]:
    for pattern, repl in _BACKBONE_RULES:
        name = re.sub(pattern, repl, name)
    parts = name.split(".")
    leaf = parts[-1]
    parent = parts[-2].lower() if len(parts) > 1 else ""
    if leaf == "weight":
        leaf = "scale" if "norm" in parent else "kernel"
    return tuple(parts[:-1] + [leaf])
