"""Full-size SVD-XT key-space conversion dry run (VERDICT r3 #4).

The existing conversion tests fabricate state dicts by inverse-mapping this
repo's own flax trees — a blind spot shared with the converter: a key
family the converter never heard of (EMA prefixes, time_mixer variants,
forgotten shortcut convs) would surface only when the first REAL checkpoint
loads.  This test closes that gap without the real weights:

  * utils/svd_keyspace.py enumerates the COMPLETE diffusers SVD-XT state
    dict (every key, real production shapes) from the diffusers
    architecture rules — independently of the flax trees;
  * the CLIP-H key space comes from the installed ``transformers`` package
    itself (meta device), so it is authoritative by construction;
  * the fabricated tensors are zero-strided broadcast views and the flax
    trees are ``jax.eval_shape`` skeletons, so the 2.2B-parameter dry run
    costs ~no memory and runs in seconds;
  * assertions run BOTH directions: every flax leaf finds exactly one
    checkpoint tensor (graft strict, zero misses) and every checkpoint
    tensor is consumed by some leaf (zero orphans).

Reference load path being protected: /root/reference/model/depthcrafter.py
lines 18-29 (UNet from_pretrained + SVD pipeline from_pretrained).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unigeo_tpu.utils.checkpoint import graft_flat_params
from unigeo_tpu.utils.convert_svd import convert_svd_checkpoint
from unigeo_tpu.utils.svd_keyspace import (
    clip_vit_h_keyspace,
    unet_svd_xt_keyspace,
    vae_temporal_decoder_keyspace,
)


def _fabricate(keyspace, dtype=np.float32):
    """{key: shape} → {key: zero-strided array} (no memory, real shapes)."""
    zero = np.zeros((), dtype)
    return {k: np.broadcast_to(zero, shape) for k, shape in keyspace.items()}


def _param_count(keyspace):
    return sum(int(np.prod(s)) for s in keyspace.values())


def _eval_shape_tree(init_fn):
    return jax.eval_shape(init_fn, jax.random.PRNGKey(0))["params"]


def _dry_graft(tree, flat):
    used = set()
    _, matched, missed = graft_flat_params(
        tree, flat, dry_run=True, used=used
    )
    return matched, missed, used


# ---------------------------------------------------------------------------


def test_unet_svd_xt_full_keyspace_roundtrip():
    keyspace = unet_svd_xt_keyspace()
    # SVD-XT UNet is ~1.52B params; a materially different total means the
    # enumerated architecture drifted from the real one.
    total = _param_count(keyspace)
    assert 1.4e9 < total < 1.6e9, total

    from unigeo_tpu.models.depthcrafter.unet import UNetSpatioTemporal

    unet = UNetSpatioTemporal()
    t, h, w = 2, 64, 64  # param shapes are size-independent
    tree = _eval_shape_tree(
        lambda r: unet.init(
            r,
            jnp.zeros((t, h // 8, w // 8, 8)),
            jnp.zeros((1,)),
            jnp.zeros((t, 1, unet.cross_attention_dim)),
            jnp.zeros((1, 3)),
            t,
        )
    )
    n_leaves = len(jax.tree_util.tree_leaves(tree))
    assert n_leaves == len(keyspace), (n_leaves, len(keyspace))

    flat = convert_svd_checkpoint(unet_sd=_fabricate(keyspace))
    flat = {k[1:]: v for k, v in flat.items()}
    matched, missed, used = _dry_graft(tree, flat)
    assert not missed, f"{len(missed)} unmatched flax leaves: {missed[:8]}"
    assert matched == n_leaves
    orphans = sorted(set(flat) - used)
    assert not orphans, f"{len(orphans)} unconsumed checkpoint keys: {orphans[:8]}"


def test_vae_temporal_decoder_full_keyspace_roundtrip():
    keyspace = vae_temporal_decoder_keyspace()
    total = _param_count(keyspace)
    # encoder ~34M + temporal decoder ~63M
    assert 80e6 < total < 120e6, total

    from unigeo_tpu.models.depthcrafter.vae import AutoencoderKLTemporal

    vae = AutoencoderKLTemporal()
    tree = _eval_shape_tree(
        lambda r: vae.init(r, jnp.zeros((2, 64, 64, 3)), 2)
    )
    n_leaves = len(jax.tree_util.tree_leaves(tree))
    assert n_leaves == len(keyspace), (n_leaves, len(keyspace))

    flat = convert_svd_checkpoint(vae_sd=_fabricate(keyspace))
    flat = {k[1:]: v for k, v in flat.items()}
    matched, missed, used = _dry_graft(tree, flat)
    assert not missed, f"{len(missed)} unmatched flax leaves: {missed[:8]}"
    assert matched == n_leaves
    orphans = sorted(set(flat) - used)
    assert not orphans, f"{len(orphans)} unconsumed checkpoint keys: {orphans[:8]}"


def test_clip_vit_h_full_keyspace_roundtrip():
    keyspace = clip_vit_h_keyspace()  # authoritative: transformers meta init
    total = _param_count(keyspace)
    assert 600e6 < total < 700e6, total  # CLIP ViT-H vision + projection

    from unigeo_tpu.models.vit import ClipImageEmbedder

    clip = ClipImageEmbedder()
    tree = _eval_shape_tree(
        lambda r: clip.init(r, jnp.zeros((1, 64, 64, 3)))
    )
    n_flax = len(jax.tree_util.tree_leaves(tree))
    # per-layer torch keys stack 32→1 per tensor: 16 tensors/layer → 16
    # stacked leaves; the other keys map 1:1
    n_per_layer = sum(
        1 for k in keyspace if k.startswith("vision_model.encoder.layers.0.")
    )
    n_stacked_expected = (
        len(keyspace) - 32 * n_per_layer + n_per_layer
    )
    assert n_flax == n_stacked_expected, (n_flax, n_stacked_expected)

    # f16 sources keep the 32-layer stacking copies at ~1.3 GB peak
    flat = convert_svd_checkpoint(clip_sd=_fabricate(keyspace, np.float16))
    flat = {k[1:]: v for k, v in flat.items()}
    matched, missed, used = _dry_graft(tree, flat)
    assert not missed, f"{len(missed)} unmatched flax leaves: {missed[:8]}"
    assert matched == n_flax
    orphans = sorted(set(flat) - used)
    assert not orphans, f"{len(orphans)} unconsumed checkpoint keys: {orphans[:8]}"


def test_keyspace_shapes_match_flax_leaves():
    """Beyond name matching: every grafted pair must agree on shape up to
    the converter's layout transpose (the graft's shape gate would silently
    skip a shape-mismatched tensor and report it as a missed leaf — covered
    above — but this pins the stronger claim that the ENUMERATED torch
    shapes transpose exactly onto the flax shapes, no singleton fudging
    except the documented Dense-shortcut case)."""
    from unigeo_tpu.models.depthcrafter.unet import UNetSpatioTemporal

    keyspace = unet_svd_xt_keyspace()
    unet = UNetSpatioTemporal()
    tree = _eval_shape_tree(
        lambda r: unet.init(
            r,
            jnp.zeros((2, 8, 8, 8)),
            jnp.zeros((1,)),
            jnp.zeros((2, 1, unet.cross_attention_dim)),
            jnp.zeros((1, 3)),
            2,
        )
    )
    flat = convert_svd_checkpoint(unet_sd=_fabricate(keyspace))
    flat = {k[1:]: v for k, v in flat.items()}
    by_path = dict(flat)
    exact, fudged = 0, []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        names = tuple(str(getattr(k, "key", k)) for k in path)
        # strict suffix lookup against the converted keys
        cands = [
            (k, v) for k, v in by_path.items() if names[-len(k):] == k
        ]
        if len(cands) != 1:
            continue  # uniqueness is test #1's business
        arr = cands[0][1]
        if tuple(arr.shape) == tuple(leaf.shape):
            exact += 1
        else:
            fudged.append((names, arr.shape, leaf.shape))
    # the only tolerated non-exact family: torch Conv3d 1×1×1 shortcuts vs
    # flax Dense (absent in SVD-XT since temporal in==out — so zero here)
    assert not fudged, fudged[:5]
    assert exact > 650  # ~707 UNet tensors resolve by exact strict suffix
