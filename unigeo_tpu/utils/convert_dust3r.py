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
    heads = {
        m.group(1)
        for m in (re.match(r"^(downstream_head\d+)\.", n) for n in state_dict)
        if m
    }
    if len(heads) > 1:
        # stripping the prefix would silently collapse head1/head2 onto one
        # flax path (last write wins) — make the caller split per head
        raise ValueError(
            f"state dict contains multiple DPT heads {sorted(heads)}; "
            "filter to one head per convert_dpt_head call, e.g. "
            "{k: v for k, v in sd.items() if k.startswith('downstream_head1.')}"
        )
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    for name, tensor in state_dict.items():
        arr = tensor.numpy() if hasattr(tensor, "numpy") else np.asarray(tensor)
        stripped = re.sub(r"^(downstream_head\d+\.)?(dpt\.)?", "", name)
        if "refinenet4.resConfUnit1." in stripped:
            # torch's FeatureFusionBlock_custom constructs resConfUnit1
            # unconditionally but the DEEPEST block (refinenet4) never
            # receives a skip input, so these weights are dead in the torch
            # forward too — the flax tree simply doesn't instantiate them
            continue
        arr = convert_dpt_tensor(stripped, arr)
        flat[("dpt",) + rename_dpt_key(stripped)] = arr
    return flat


# ---------------------------------------------------------------------------
# backbone conversion (CroCo/DUSt3R ViT → unigeo_tpu pointmap backbone)
#
# With the RoPE100 backbone mode (models/pointmap/network.py pos_embed=
# "RoPE100", qkv_bias=True, norm_context=True) the converted weights are
# numerics-equivalent — verified against a torch CroCo-style reimplementation
# in tests/test_rope_parity.py.  Structural mapping:
#   * enc_blocks.{i}.* / dec_blocks.{i}.* are stacked on a leading depth axis
#     (our blocks run as ONE nn.scan program, params stacked on axis 0)
#   * fused attn.qkv weights [3C, C] split into to_q / to_k / to_v
#   * CroCo decoder norms: torch norm1 = self-attn (ours norm1), torch norm2
#     gates CROSS-attn (ours norm_cross), torch norm3 gates the MLP (ours
#     norm2), torch norm_y is the per-block memory norm (ours norm_context)
#   * cross_attn.projq/projk/projv/proj → to_q/to_k/to_v/to_out
# ---------------------------------------------------------------------------


def _linear(arr: np.ndarray) -> np.ndarray:
    return np.transpose(arr, (1, 0)) if arr.ndim == 2 else arr


def _block_entries(sub: str, arr: np.ndarray, dec: bool):
    """One torch key inside an enc/dec block → [(flax subpath, array), ...]."""
    leaf = "kernel" if sub.endswith(".weight") else "bias"
    is_w = sub.endswith(".weight")
    stem = sub.rsplit(".", 1)[0]
    if stem == "attn.qkv":
        q, k, v = np.split(arr, 3, axis=0)
        return [
            (("attn", f"to_{n}", leaf), _linear(t) if is_w else t)
            for n, t in zip("qkv", (q, k, v))
        ]
    norm_map = (
        {"norm1": "norm1", "norm2": "norm_cross", "norm3": "norm2",
         "norm_y": "norm_context"}
        if dec
        else {"norm1": "norm1", "norm2": "norm2"}
    )
    if stem in norm_map:
        return [((norm_map[stem], "scale" if is_w else "bias"), arr)]
    proj_map = {
        "attn.proj": ("attn", "to_out"),
        "cross_attn.projq": ("cross_attn", "to_q"),
        "cross_attn.projk": ("cross_attn", "to_k"),
        "cross_attn.projv": ("cross_attn", "to_v"),
        "cross_attn.proj": ("cross_attn", "to_out"),
        "mlp.fc1": ("mlp", "fc1"),
        "mlp.fc2": ("mlp", "fc2"),
    }
    if stem in proj_map:
        return [(proj_map[stem] + (leaf,), _linear(arr) if is_w else arr)]
    raise KeyError(f"unrecognized block key: {sub}")


def convert_backbone(state_dict: Dict[str, Any]) -> Dict[Tuple[str, ...], np.ndarray]:
    """CroCo/DUSt3R torch state dict → flat {flax path: array} with
    enc/dec blocks stacked for the nn.scan layout.  Unrecognized keys
    (downstream heads, mask tokens) are skipped — convert the DPT heads
    separately via convert_dpt_head."""
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    stacks: Dict[Tuple[str, ...], Dict[int, np.ndarray]] = {}

    top = {
        "patch_embed.proj.weight": (
            ("encoder", "patch_embed", "proj", "kernel"),
            lambda a: np.transpose(a, (2, 3, 1, 0)),
        ),
        "patch_embed.proj.bias": (
            ("encoder", "patch_embed", "proj", "bias"), lambda a: a),
        "enc_norm.weight": (("encoder", "norm", "scale"), lambda a: a),
        "enc_norm.bias": (("encoder", "norm", "bias"), lambda a: a),
        "dec_norm.weight": (("decoder", "norm", "scale"), lambda a: a),
        "dec_norm.bias": (("decoder", "norm", "bias"), lambda a: a),
        "decoder_embed.weight": (("decoder", "proj_in", "kernel"), _linear),
        "decoder_embed.bias": (("decoder", "proj_in", "bias"), lambda a: a),
    }

    blk = re.compile(r"^(enc|dec)_blocks\.(\d+)\.(.*)$")
    for name, tensor in state_dict.items():
        arr = tensor.numpy() if hasattr(tensor, "numpy") else np.asarray(tensor)
        if name in top:
            path, fn = top[name]
            flat[path] = fn(arr)
            continue
        m = blk.match(name)
        if not m:
            continue  # heads / mask tokens: separate converters
        which, idx, sub = m.group(1), int(m.group(2)), m.group(3)
        root = ("encoder" if which == "enc" else "decoder",
                "blocks", "layers", "block")
        for subpath, val in _block_entries(sub, arr, dec=(which == "dec")):
            stacks.setdefault(root + subpath, {})[idx] = val

    for path, by_idx in stacks.items():
        depth = max(by_idx) + 1
        assert sorted(by_idx) == list(range(depth)), f"missing layers at {path}"
        flat[path] = np.stack([by_idx[i] for i in range(depth)])
    return flat


def rename_backbone_key(name: str) -> Tuple[str, ...]:
    """Single-key rename (legacy helper; convert_backbone is the real path —
    it also splits fused qkv and stacks scan layers, which a pure rename
    cannot express)."""
    rules = [
        (r"^enc_blocks\.(\d+)\.", r"encoder.blocks.layers.\1.block."),
        (r"^dec_blocks\.(\d+)\.", r"decoder.blocks.layers.\1.block."),
        (r"^enc_norm\.", "encoder.norm."),
        (r"^dec_norm\.", "decoder.norm."),
        (r"^decoder_embed\.", "decoder.proj_in."),
        (r"\.attn\.proj\.", ".attn.to_out."),
        (r"\.cross_attn\.proj\.", ".cross_attn.to_out."),
        (r"\.mlp\.fc1\.", ".mlp.fc1."),
        (r"\.mlp\.fc2\.", ".mlp.fc2."),
    ]
    for pattern, repl in rules:
        name = re.sub(pattern, repl, name)
    parts = name.split(".")
    leaf = parts[-1]
    parent = parts[-2].lower() if len(parts) > 1 else ""
    if leaf == "weight":
        leaf = "scale" if "norm" in parent else "kernel"
    return tuple(parts[:-1] + [leaf])


def convert_dust3r_pair(state_dict: Dict[str, Any]) -> Dict[Tuple[str, ...], np.ndarray]:
    """Real DUSt3R (two-view) torch state dict → flat {flax path: array}
    for models/pointmap/dust3r.Dust3RNetwork.

    Mapping beyond convert_backbone:
      * dec_blocks.{i}.*  → decoder.layers.block1.* (stacked on depth axis)
      * dec_blocks2.{i}.* → decoder.layers.block2.*
      * decoder_embed     → decoder.decoder_embed (shared across streams)
      * dec_norm          → BOTH decoder.norm1 and decoder.norm2 (torch
        shares one final norm across the streams; duplication is
        numerics-equivalent)
    Head keys (downstream_head1/2) are skipped — convert DPT heads via
    convert_dpt_head.
    """
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    stacks: Dict[Tuple[str, ...], Dict[int, np.ndarray]] = {}

    top = {
        "patch_embed.proj.weight": (
            [("encoder", "patch_embed", "proj", "kernel")],
            lambda a: np.transpose(a, (2, 3, 1, 0)),
        ),
        "patch_embed.proj.bias": (
            [("encoder", "patch_embed", "proj", "bias")], lambda a: a),
        "enc_norm.weight": ([("encoder", "norm", "scale")], lambda a: a),
        "enc_norm.bias": ([("encoder", "norm", "bias")], lambda a: a),
        "decoder_embed.weight": (
            [("decoder", "decoder_embed", "kernel")], _linear),
        "decoder_embed.bias": (
            [("decoder", "decoder_embed", "bias")], lambda a: a),
        "dec_norm.weight": (
            [("decoder", "norm1", "scale"), ("decoder", "norm2", "scale")],
            lambda a: a,
        ),
        "dec_norm.bias": (
            [("decoder", "norm1", "bias"), ("decoder", "norm2", "bias")],
            lambda a: a,
        ),
    }

    blk = re.compile(r"^(enc_blocks|dec_blocks|dec_blocks2)\.(\d+)\.(.*)$")
    for name, tensor in state_dict.items():
        arr = tensor.numpy() if hasattr(tensor, "numpy") else np.asarray(tensor)
        if name in top:
            paths, fn = top[name]
            for path in paths:
                flat[path] = fn(arr)
            continue
        m = blk.match(name)
        if not m:
            continue  # heads: separate converters
        which, idx, sub = m.group(1), int(m.group(2)), m.group(3)
        root = {
            "enc_blocks": ("encoder", "blocks", "layers", "block"),
            "dec_blocks": ("decoder", "layers", "block1"),
            "dec_blocks2": ("decoder", "layers", "block2"),
        }[which]
        for subpath, val in _block_entries(sub, arr, dec=which.startswith("dec")):
            stacks.setdefault(root + subpath, {})[idx] = val

    for path, by_idx in stacks.items():
        depth = max(by_idx) + 1
        assert sorted(by_idx) == list(range(depth)), f"missing layers at {path}"
        flat[path] = np.stack([by_idx[i] for i in range(depth)])
    return flat
