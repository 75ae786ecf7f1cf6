"""CogVideoX-lineage checkpoint → unigeo_tpu Aether param-tree conversion.

The reference lists AETHER among its supported methods (model/Readme.md:5)
but ships no adapter; the public Aether release fine-tunes a CogVideoX-5B
video DiT + its causal 3D VAE.  models/aether.py is this repo's native
implementation of the method family; this module maps the torch state-dict
key names of that lineage (diffusers ``CogVideoXTransformer3DModel`` /
``AutoencoderKLCogVideoX``) onto the two flax trees the adapter holds
(``dit_params``, ``vae_params``), so a shipped checkpoint has a tested
load path the moment weights are available (zero-egress here).

Like utils/convert_svd.py, conversion is leaf-by-leaf: keys whose role has
no counterpart in this architecture (text-branch chunks of the adaLN
projections, q/k layernorms, extra per-stage resnets when configs differ)
are simply not emitted and show up in graft_flat_params' missed report
instead of silently grafting wrong tensors.

Structural correspondences (documented assumptions, pinned by the
roundtrip tests in tests/test_convert_aether_vda.py):

  DiT   patch_embed.proj                  → patchify  (Conv p×p)
        time_embedding.linear_1/2         → t_embed1 / t_embed2
        transformer_blocks.{i}.attn1.*    → stack/blocks/block/attn/*
        transformer_blocks.{i}.ff.net.*   → stack/blocks/block/mlp/*
        norm1.linear ⊕ norm2.linear       → adaLN_modulation  (the first
            3·C rows of each are the hidden-stream shift/scale/gate for
            the attention and MLP branches; CogVideoX's LayerNormZero
            emits 6 chunks per norm, the latter 3 gating the text stream
            Aether drops — those rows are discarded)
        norm_out.linear                   → final_modulation (shift, scale
            chunk order — diffusers AdaLayerNorm with chunk_dim=1)
        proj_out                          → final_proj
        per-layer keys are stacked on a leading depth axis for the
        nn.scan layout (stack/blocks/block/...)

  VAE   CogVideoXCausalConv3d wraps an inner ``conv`` — exactly like our
        CausalConv3d, so conv paths line up level-for-level:
        encoder.conv_in.conv              → encoder/stem/conv
        encoder.down_blocks.{i}.resnets.0 → encoder/enc_res{i}
        encoder.down_blocks.{i}.downsamplers.0.conv → encoder/enc_down{i}/conv
        encoder.mid_block.resnets.0       → encoder/enc_mid
        encoder.norm_out / conv_out.conv  → enc_norm / enc_out/conv
        decoder.conv_in.conv              → decoder/dec_in/conv
        decoder.mid_block.resnets.0       → decoder/dec_mid
        decoder.up_blocks.{k}.*           → dec_up{S-1-k}/dec_res{S-1-k}
            (torch up_blocks run deepest-first; our decoder names stages
            by their ORIGINAL encoder index, hence the reversal)
        decoder.norm_out / conv_out.conv  → dec_norm / dec_out/conv
        resnet conv_shortcut (1×1×1 Conv3d) → skip (nn.Dense; the
            singleton spatial dims are dropped by graft's shape check)

Layouts: Conv3d [out,in,kt,kh,kw] → [kt,kh,kw,in,out]; Conv2d
[out,in,kh,kw] → [kh,kw,in,out]; Linear [out,in] → [in,out]; GroupNorm
weight → GroupNorm_0/scale (our GroupNorm wrapper nests an inner module,
same as utils/convert_svd.py's _GROUPNORM_SITES).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _np(tensor) -> np.ndarray:
    return tensor.numpy() if hasattr(tensor, "numpy") else np.asarray(tensor)


def _linear(arr: np.ndarray) -> np.ndarray:
    return np.transpose(arr, (1, 0)) if arr.ndim == 2 else arr


def _conv(arr: np.ndarray) -> np.ndarray:
    if arr.ndim == 5:  # Conv3d
        return np.transpose(arr, (2, 3, 4, 1, 0))
    if arr.ndim == 4:  # Conv2d
        return np.transpose(arr, (2, 3, 1, 0))
    return arr


# ---------------------------------------------------------------------------
# DiT (CogVideoXTransformer3DModel)
# ---------------------------------------------------------------------------

_DIT_TOP = {
    "patch_embed.proj.weight": (("patchify", "kernel"), _conv),
    "patch_embed.proj.bias": (("patchify", "bias"), None),
    "time_embedding.linear_1.weight": (("t_embed1", "kernel"), _linear),
    "time_embedding.linear_1.bias": (("t_embed1", "bias"), None),
    "time_embedding.linear_2.weight": (("t_embed2", "kernel"), _linear),
    "time_embedding.linear_2.bias": (("t_embed2", "bias"), None),
    "norm_out.linear.weight": (("final_modulation", "kernel"), _linear),
    "norm_out.linear.bias": (("final_modulation", "bias"), None),
    "proj_out.weight": (("final_proj", "kernel"), _linear),
    "proj_out.bias": (("final_proj", "bias"), None),
}

_DIT_BLOCK = {
    "attn1.to_q": ("attn", "to_q"),
    "attn1.to_k": ("attn", "to_k"),
    "attn1.to_v": ("attn", "to_v"),
    "attn1.to_out.0": ("attn", "to_out"),
    "ff.net.0.proj": ("mlp", "fc1"),
    "ff.net.2": ("mlp", "fc2"),
}


def convert_cogvideox_transformer(
    state_dict: Dict[str, Any],
) -> Dict[Tuple[str, ...], np.ndarray]:
    """CogVideoX-lineage transformer state dict → flat {flax path: array}
    for models/aether.AetherDiT (graft onto ``adapter.dit_params``).

    The two per-block LayerNormZero projections are fused into our single
    6·C adaLN projection; per-layer entries are stacked for nn.scan.
    Unrecognized keys (text-branch, q/k norms, caption projections) are
    skipped and surface in graft's missed report.
    """
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    stacks: Dict[Tuple[str, ...], Dict[int, np.ndarray]] = {}
    # norm1/norm2 halves are merged once both are seen
    adaln: Dict[Tuple[int, str, str], np.ndarray] = {}

    blk = re.compile(r"^transformer_blocks\.(\d+)\.(.*)$")
    for name, tensor in state_dict.items():
        arr = _np(tensor)
        if name in _DIT_TOP:
            path, fn = _DIT_TOP[name]
            flat[path] = fn(arr) if fn else arr
            continue
        m = blk.match(name)
        if not m:
            continue
        idx, sub = int(m.group(1)), m.group(2)
        stem, leaf = sub.rsplit(".", 1)
        if stem in _DIT_BLOCK and leaf in ("weight", "bias"):
            subpath = _DIT_BLOCK[stem] + ("kernel" if leaf == "weight" else "bias",)
            stacks.setdefault(subpath, {})[idx] = (
                _linear(arr) if leaf == "weight" else arr
            )
            continue
        nm = re.match(r"^norm([12])\.linear\.(weight|bias)$", sub)
        if nm:
            adaln[(idx, nm.group(1), nm.group(2))] = arr
            continue
        # anything else (norm_q/norm_k, text chunks, ...) — skipped

    # fuse the LayerNormZero halves: our adaLN order is
    # (sa_shift, sa_scale, sa_gate, mlp_shift, mlp_scale, mlp_gate) —
    # i.e. norm1's hidden 3 chunks then norm2's hidden 3 chunks.  The
    # hidden chunks are the FIRST 3·C rows whether the projection emits
    # 6 chunks (hidden + text, CogVideoX) or just 3 (video-only
    # fine-tune); C is read off attn1.to_q rather than guessed from the
    # projection's own output dim (3·C vs 6·C is ambiguous for even C).
    c = None
    for n, t in state_dict.items():
        if re.match(r"^transformer_blocks\.\d+\.attn1\.to_q\.weight$", n):
            c = _np(t).shape[1]
            break
    layers = sorted({i for (i, _, _) in adaln})
    for idx in layers:
        for leaf in ("weight", "bias"):
            n1 = adaln.get((idx, "1", leaf))
            n2 = adaln.get((idx, "2", leaf))
            if n1 is None or n2 is None or c is None:
                continue
            fused = np.concatenate([n1[: 3 * c], n2[: 3 * c]], axis=0)
            path = ("adaLN_modulation", "kernel" if leaf == "weight" else "bias")
            stacks.setdefault(path, {})[idx] = (
                _linear(fused) if leaf == "weight" else fused
            )

    for subpath, by_idx in stacks.items():
        depth = max(by_idx) + 1
        assert sorted(by_idx) == list(range(depth)), f"missing layers at {subpath}"
        flat[("stack", "blocks", "block") + subpath] = np.stack(
            [by_idx[i] for i in range(depth)]
        )
    return flat


# ---------------------------------------------------------------------------
# VAE (AutoencoderKLCogVideoX)
# ---------------------------------------------------------------------------

_RES_LEAF = {
    "norm1": ("norm1", "GroupNorm_0"),
    "norm2": ("norm2", "GroupNorm_0"),
    "conv1.conv": ("conv1", "conv"),
    "conv2.conv": ("conv2", "conv"),
    "conv_shortcut.conv": ("skip",),
    "conv_shortcut": ("skip",),
}


def _vae_res_entries(sub: str, arr: np.ndarray):
    """resnet-internal torch key → [(flax subpath, array)] or [] if the key
    has no counterpart (e.g. CogVideoX spatial norms)."""
    stem, leaf = sub.rsplit(".", 1)
    if stem not in _RES_LEAF or leaf not in ("weight", "bias"):
        return []
    base = _RES_LEAF[stem]
    if base == ("skip",):
        # 1×1×1 Conv3d shortcut → nn.Dense kernel [in, out]
        if leaf == "weight":
            return [(base + ("kernel",), arr.reshape(arr.shape[0], arr.shape[1]).T)]
        return [(base + ("bias",), arr)]
    is_norm = "norm" in base[0]
    flax_leaf = ("scale" if is_norm else "kernel") if leaf == "weight" else "bias"
    return [(base + (flax_leaf,), arr if is_norm else _conv(arr))]


def convert_cogvideox_vae(
    state_dict: Dict[str, Any], num_stages: int = None
) -> Dict[Tuple[str, ...], np.ndarray]:
    """CogVideoX-lineage 3D-VAE state dict → flat {flax path: array} for
    models/aether.CausalVAE3D (graft onto ``adapter.vae_params``).

    Only ``resnets.0`` of each stage maps when the torch config carries
    more residual blocks per stage than ours — the rest are skipped and
    reported by graft.  ``num_stages`` (defaults to the max stage index
    seen) fixes the decoder's up-block index reversal.
    """
    flat: Dict[Tuple[str, ...], np.ndarray] = {}

    top = {
        "encoder.conv_in.conv": ("encoder", "stem", "conv"),
        "encoder.conv_out.conv": ("encoder", "enc_out", "conv"),
        "decoder.conv_in.conv": ("decoder", "dec_in", "conv"),
        "decoder.conv_out.conv": ("decoder", "dec_out", "conv"),
    }
    norms = {
        "encoder.norm_out": ("encoder", "enc_norm", "GroupNorm_0"),
        "decoder.norm_out": ("decoder", "dec_norm", "GroupNorm_0"),
    }

    if num_stages is None:
        idxs = [
            int(m.group(2))
            for m in (
                re.match(r"^(encoder\.down|decoder\.up)_blocks\.(\d+)\.", n)
                for n in state_dict
            )
            if m
        ]
        num_stages = max(idxs) + 1 if idxs else 0

    down = re.compile(r"^encoder\.down_blocks\.(\d+)\.(.*)$")
    up = re.compile(r"^decoder\.up_blocks\.(\d+)\.(.*)$")
    mid = re.compile(r"^(encoder|decoder)\.mid_block\.resnets\.0\.(.*)$")

    for name, tensor in state_dict.items():
        arr = _np(tensor)
        stem, leaf = name.rsplit(".", 1)
        if stem in top and leaf in ("weight", "bias"):
            flat[top[stem] + ("kernel" if leaf == "weight" else "bias",)] = (
                _conv(arr) if leaf == "weight" else arr
            )
            continue
        if stem in norms and leaf in ("weight", "bias"):
            flat[norms[stem] + ("scale" if leaf == "weight" else "bias",)] = arr
            continue
        m = mid.match(name)
        if m:
            side = "encoder" if m.group(1) == "encoder" else "decoder"
            block = "enc_mid" if side == "encoder" else "dec_mid"
            for sp, val in _vae_res_entries(m.group(2), arr):
                flat[(side, block) + sp] = val
            continue
        m = down.match(name)
        if m:
            i, sub = int(m.group(1)), m.group(2)
            if sub.startswith("resnets.0."):
                for sp, val in _vae_res_entries(sub[len("resnets.0."):], arr):
                    flat[("encoder", f"enc_res{i}") + sp] = val
            elif sub.startswith("downsamplers.0.conv"):
                _, leaf2 = sub.rsplit(".", 1)
                # torch wraps the strided conv in a CausalConv3d named conv
                # (downsamplers.0.conv.conv.*) or uses it bare; either way
                # the payload is one conv
                flat[
                    ("encoder", f"enc_down{i}", "conv")
                    + (("kernel",) if leaf2 == "weight" else ("bias",))
                ] = _conv(arr) if leaf2 == "weight" else arr
            continue
        m = up.match(name)
        if m:
            k, sub = int(m.group(1)), m.group(2)
            i = num_stages - 1 - k  # torch up_blocks run deepest-first
            if sub.startswith("resnets.0."):
                for sp, val in _vae_res_entries(sub[len("resnets.0."):], arr):
                    flat[("decoder", f"dec_res{i}") + sp] = val
            elif sub.startswith("upsamplers.0.conv"):
                _, leaf2 = sub.rsplit(".", 1)
                flat[
                    ("decoder", f"dec_up{i}", "conv")
                    + (("kernel",) if leaf2 == "weight" else ("bias",))
                ] = _conv(arr) if leaf2 == "weight" else arr
            continue
        # everything else (quant convs, spatial norms, ...) — skipped
    return flat


def convert_aether_checkpoint(
    transformer_sd: Dict[str, Any] = None,
    vae_sd: Dict[str, Any] = None,
) -> Dict[Tuple[str, ...], np.ndarray]:
    """Convert any subset of the two component state dicts into one flat
    {path: array} mapping, prefixed ``dit``/``vae`` to mirror the adapter's
    two param trees (graft each prefix onto the matching tree, or the whole
    map onto a combined {'dit': ..., 'vae': ...} dict)."""
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    if transformer_sd:
        for k, v in convert_cogvideox_transformer(transformer_sd).items():
            flat[("dit",) + k] = v
    if vae_sd:
        for k, v in convert_cogvideox_vae(vae_sd).items():
            flat[("vae",) + k] = v
    return flat
