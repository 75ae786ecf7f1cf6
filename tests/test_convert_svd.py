"""SVD conversion-table coverage test.

Fabricates a diffusers-style state dict by INVERSE-mapping the tiny UNet's
own param tree to torch names/layouts, then runs the forward conversion and
grafts — every leaf must round-trip exactly.  This pins the rename tables
and layout transposes without needing the real 1.5B checkpoint.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unigeo_tpu.models.depthcrafter.unet import UNetSpatioTemporal, tiny_unet_config
from unigeo_tpu.utils.checkpoint import graft_flat_params
from unigeo_tpu.utils.convert_svd import convert_svd_checkpoint


def _flax_path_to_torch_name(path):
    """Inverse of the UNet rename rules."""
    import re

    parts = [str(getattr(k, "key", k)) for k in path]
    parts = [p for p in parts if p != "params"]
    name = ".".join(parts)
    name = re.sub(r"^down_(\d+)_res_(\d+)\.", r"down_blocks.\1.resnets.\2.", name)
    name = re.sub(r"^down_(\d+)_attn_(\d+)\.", r"down_blocks.\1.attentions.\2.", name)
    name = re.sub(r"^down_(\d+)_downsample\.", r"down_blocks.\1.downsamplers.0.", name)
    name = re.sub(r"^mid_res_(\d+)\.", r"mid_block.resnets.\1.", name)
    name = re.sub(r"^mid_attn\.", "mid_block.attentions.0.", name)
    name = re.sub(r"^up_(\d+)_res_(\d+)\.", r"up_blocks.\1.resnets.\2.", name)
    name = re.sub(r"^up_(\d+)_attn_(\d+)\.", r"up_blocks.\1.attentions.\2.", name)
    name = re.sub(r"^up_(\d+)_upsample\.", r"up_blocks.\1.upsamplers.0.", name)
    name = name.replace(".transformer_blocks_0.", ".transformer_blocks.0.")
    name = name.replace(".temporal_transformer_blocks_0.", ".temporal_transformer_blocks.0.")
    name = name.replace(".to_out.", ".to_out.0.")
    name = name.replace(".net_0.proj.", ".net.0.proj.")
    name = name.replace(".net_2.", ".net.2.")
    name = name.replace(".ff_in.net.0.proj.", ".ff_in.net.0.proj.")
    # leaves
    if name.endswith(".kernel") or name.endswith(".scale"):
        name = name.rsplit(".", 1)[0] + ".weight"
    # flax nests inner modules (<ours>/Conv_0/kernel, norm1/GroupNorm_0/scale)
    # that diffusers names lack — drop those levels
    name = name.replace(".Conv_0.", ".")
    name = name.replace(".GroupNorm_0.", ".")
    return name


def _flax_kernel_to_torch(arr):
    if arr.ndim == 5:
        return np.transpose(arr, (4, 3, 0, 1, 2))
    if arr.ndim == 4:
        return np.transpose(arr, (3, 2, 0, 1))
    if arr.ndim == 2:
        return np.transpose(arr, (1, 0))
    return arr


def test_unet_conversion_roundtrip_full_coverage():
    unet = UNetSpatioTemporal(**tiny_unet_config())
    t, h, w = 2, 16, 16
    params = unet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((t, h, w, 8)), jnp.zeros((1,)),
        jnp.zeros((t, 1, 32)), jnp.zeros((1, 3)), t,
    )

    # fabricate the diffusers-style state dict from our own (randomized) tree
    rng = np.random.default_rng(0)
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    state_dict = {}
    randomized = {}
    for path, leaf in leaves:
        val = rng.normal(size=leaf.shape).astype(np.float32)
        randomized[tuple(str(getattr(k, "key", k)) for k in path)] = val
        name = _flax_path_to_torch_name(path)
        is_kernel = str(getattr(path[-1], "key", path[-1])) == "kernel"
        state_dict[name] = _flax_kernel_to_torch(val) if is_kernel else val

    flat = convert_svd_checkpoint(unet_sd=state_dict)
    # strip the component prefix for grafting onto the bare unet tree
    flat = {k[1:]: v for k, v in flat.items()}
    grafted, matched, missed = graft_flat_params(params, flat)
    n_leaves = len(leaves)
    assert matched == n_leaves, f"matched {matched}/{n_leaves}; missed: {missed[:6]}"

    # every leaf must equal its randomized source (exact round-trip)
    for path, leaf in jax.tree_util.tree_flatten_with_path(grafted)[0]:
        key = tuple(str(getattr(k, "key", k)) for k in path)
        assert np.array_equal(np.asarray(leaf), randomized[key]), key


def test_clip_layer_stacking():
    """Per-layer CLIP keys stack into the nn.scan leading-depth layout."""
    depth, width = 3, 8
    sd = {}
    for i in range(depth):
        sd[f"vision_model.encoder.layers.{i}.self_attn.q_proj.weight"] = (
            np.full((width, width), float(i), np.float32)
        )
    from unigeo_tpu.utils.convert_svd import convert_component, rename_clip_key

    flat = convert_component(
        sd, rename_clip_key, stack_layers_prefix="vision_model.encoder.layers"
    )
    (path, arr), = flat.items()
    assert path[:4] == ("vision_model", "blocks", "layers", "block")
    assert arr.shape == (depth, width, width)
    assert np.all(arr[2] == 2.0)
