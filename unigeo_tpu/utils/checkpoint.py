"""Checkpointing: orbax save/load + torch→JAX weight conversion.

(SURVEY.md §5 "Checkpoint / resume": the reference loads external torch
checkpoints inside adapters — torch.load / from_pretrained / torch.hub —
and carries vestigial robustmvd savers.  Here: orbax for native param trees,
plus an offline converter that maps diffusers-style torch state dicts onto
the flax param trees of the SVD stack.)

Conversion rules (torch name → flax path, layout):
  * Conv2d  weight [out, in, kh, kw] → kernel [kh, kw, in, out]
  * Conv1d  weight [out, in, k]      → kernel [k, in, out]   (temporal convs)
  * Linear  weight [out, in]         → kernel [in, out]
  * Norm    weight/bias              → scale/bias
The name mapping is mechanical because the flax modules were named after
their diffusers counterparts (models/layers.py docstring).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict

import numpy as np


class TrainStateSaver:
    """Rotating checkpoint saver for full train states.

    (reference: dataset_core/utils/checkpoint_utils.py:56-116 — max_to_keep
    rotation with ``-iter-NNNNNNNNN`` suffix parsing; orbax-backed here.)
    """

    def __init__(self, base_dir: str, max_to_keep: int = 3):
        self.base_dir = os.path.abspath(base_dir)
        self.max_to_keep = max_to_keep
        os.makedirs(self.base_dir, exist_ok=True)

    def _path(self, step: int) -> str:
        return os.path.join(self.base_dir, f"state-iter-{step:09d}")

    def list_steps(self):
        steps = []
        for name in os.listdir(self.base_dir):
            m = re.match(r"state-iter-(\d+)$", name)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def save(self, state: Any, step: int) -> str:
        path = self._path(step)
        save_params(state, path)
        for old in self.list_steps()[: -self.max_to_keep]:
            import shutil

            shutil.rmtree(self._path(old), ignore_errors=True)
        return path

    def load_latest(self) -> Any:
        steps = self.list_steps()
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {self.base_dir}")
        return load_params(self._path(steps[-1])), steps[-1]


def save_params(params: Any, path: str) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


# ---------------------------------------------------------------------------
# torch → flax conversion
# ---------------------------------------------------------------------------

def convert_tensor(name: str, value: np.ndarray) -> np.ndarray:
    """Transpose a torch tensor into the flax layout by rank + role."""
    if name.endswith("position_embedding.weight") or name.endswith("pos_embed.weight"):
        return value  # nn.Embedding tables stay [num, dim]
        # (patch_embedding.weight is a real Conv2d and falls through)
    if name.endswith(".weight"):
        if value.ndim == 5:  # Conv3d (temporal (k,1,1) convs)
            return np.transpose(value, (2, 3, 4, 1, 0))
        if value.ndim == 4:  # Conv2d
            return np.transpose(value, (2, 3, 1, 0))
        if value.ndim == 3:  # Conv1d (temporal)
            return np.transpose(value, (2, 1, 0))
        if value.ndim == 2:  # Linear
            return np.transpose(value, (1, 0))
    return value


def torch_key_to_flax_path(name: str) -> tuple:
    """diffusers state-dict key → flax param path tuple.

    Handles the generic patterns; model-specific renames (block indices →
    our stage naming) are applied by the per-model tables below.
    """
    name = name.replace(".weight", "/kernel").replace(".bias", "/bias")
    parts = [p for p in name.replace(".", "/").split("/") if p]
    # norms use scale, not kernel — the owning module is norm-flavored when
    # it contains a word-bounded "norm"/"layernorm" token (norm1, norm_in,
    # norm_cross, conv_norm_out, group_norm, layer_norm2, pre_layernorm —
    # but not e.g. "enormous")
    if (
        len(parts) >= 2
        and parts[-1] == "kernel"
        and re.search(r"(?:^|_)(?:layer)?norm\d*(?:_|$)", parts[-2])
    ):
        parts[-1] = "scale"
    return tuple(parts)


def convert_state_dict(state_dict: Dict[str, np.ndarray]) -> Dict[tuple, np.ndarray]:
    """Bulk-convert a torch state dict to {flax_path: array} with transposed
    layouts.  The caller grafts the entries onto a flax param tree."""
    out = {}
    for name, tensor in state_dict.items():
        arr = tensor.numpy() if hasattr(tensor, "numpy") else np.asarray(tensor)
        out[torch_key_to_flax_path(name)] = convert_tensor(name, arr)
    return out


def graft_flat_params(
    flax_params: Any,
    flat: Dict[tuple, np.ndarray],
    strict: bool = False,
    dry_run: bool = False,
    used: set = None,
):
    """Replace leaves of a flax tree with converted arrays where paths match
    (by suffix).  Returns (new_tree, matched, missed).

    dry_run: resolve matches without materializing grafted arrays — the tree
    may hold jax.ShapeDtypeStruct leaves (full-size key-space dry runs,
    tests/test_svd_keyspace.py) and ``flat`` may hold zero-strided views.
    used: optional set collecting the flat keys that matched some leaf, so
    callers can assert every checkpoint tensor was consumed.
    """
    import jax

    matched, missed = 0, []

    def common_suffix_len(a: tuple, b: tuple) -> int:
        n = 0
        for x, y in zip(reversed(a), reversed(b)):
            if x != y:
                break
            n += 1
        return n

    def shapes_compatible(a_shape, b_shape):
        """Equal, or equal after dropping singleton dims (e.g. a torch 1×1×1
        Conv3d shortcut loading into an nn.Dense kernel)."""
        if a_shape == b_shape:
            return True
        return (
            int(np.prod(a_shape)) == int(np.prod(b_shape))
            and tuple(d for d in a_shape if d != 1) == tuple(d for d in b_shape if d != 1)
        )

    def visit(path, leaf):
        nonlocal matched
        names = tuple(str(getattr(k, "key", k)) for k in path)
        best, best_key, best_score, ties, n_same_leaf = None, None, 0, 0, 0
        for tk, arr in flat.items():
            if not shapes_compatible(tuple(leaf.shape), tuple(arr.shape)):
                continue
            score = common_suffix_len(names, tk)
            if score >= 1:  # leaf name (kernel/bias/scale/...) agrees
                n_same_leaf += 1
            if score > best_score:
                best, best_key, best_score, ties = arr, tk, score, 1
            elif score == best_score and best is not None:
                ties += 1
        # Matching discipline: a leaf-name-only match (score 1) is accepted
        # only when exactly ONE shape-compatible tensor carries that leaf
        # name (bare single-module trees); with several such candidates the
        # parent module name must also agree and the best match must be
        # unique — otherwise a misrenamed key silently grafts an arbitrary
        # tensor (this exact failure shipped the encoder's attention weights
        # into the VAE decoder during round 2 development).
        ok = best is not None and (
            (best_score >= 1 and n_same_leaf == 1)
            or (best_score >= 2 and ties == 1)
        )
        if ok:
            matched += 1
            if used is not None:
                used.add(best_key)
            if dry_run:
                return leaf
            return np.asarray(best, leaf.dtype).reshape(leaf.shape)
        missed.append(names)
        return leaf

    new = jax.tree_util.tree_map_with_path(visit, flax_params)
    if strict and missed:
        raise KeyError(f"unmatched params: {missed[:10]} (+{len(missed)-10} more)")
    return new, matched, missed
