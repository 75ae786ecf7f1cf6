#!/usr/bin/env python
"""Convert real torch/diffusers checkpoints into the orbax trees the
adapters load via ``checkpoint_path`` — the one-command bridge for users
switching from the reference framework (its adapters consume torch
checkpoints directly: model/depthcrafter.py:18-29, model/spann3r.py:16-21).

Families and their expected inputs:

  svd      --unet FILE|DIR  --vae FILE|DIR  --clip FILE|DIR
           (diffusers SVD/DepthCrafter layout: UNet + temporal-decoder VAE
            + CLIP-H image encoder.  Provide all three for a tree the
            DepthCrafter adapter can load directly; a subset saves a
            PARTIAL tree {component: params} for manual assembly and the
            CLI says so loudly)
  dust3r   --ckpt FILE      (DUSt3R_ViTLarge_BaseDecoder_512_dpt-style:
            CroCo backbone + entangled decoders + two DPT heads)
  aether   --transformer FILE|DIR  --vae FILE|DIR  (CogVideoX-style DiT +
            causal 3D VAE)
  vda      --ckpt FILE      (VideoDepthAnything: DINOv2 backbone + DPT head
            + motion modules; plain DepthAnything via --head-prefix
            depth_head.)

Inputs may be torch ``.pth/.pt/.bin`` files or ``.safetensors`` files; a
DIRECTORY loads and merges every safetensors/bin shard inside (the
diffusers sharded layout).  State dicts nested under a ``model``/
``state_dict`` key and ``module.`` DDP prefixes are unwrapped.

The output of ``--out DIR`` loads directly:

    DepthCrafter(checkpoint_path=OUT)     # svd
    Dust3R(checkpoint_path=OUT, network_config=...)  # etc.

Conversion is verified structurally at save time: every target leaf must
be matched and every checkpoint tensor consumed (for dust3r/vda this
includes a source-key coverage check so keys the converters silently skip
are surfaced; aether's text-branch keys are documented skips) — the same
two-sided zero-miss contract tests/test_svd_keyspace.py proves for the
full SVD-XT key space.  --allow-partial downgrades the checks to reports;
NOTE that unmatched target leaves are then saved as ZEROS (inspect /
re-graft manually — do not load such a tree and expect sane outputs).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


# ---------------------------------------------------------------------------
# state-dict loading
# ---------------------------------------------------------------------------

def _to_numpy(v):
    """torch tensor or array → numpy; bf16 (no numpy dtype in torch's
    .numpy()) widens to f32 so the converters' tensor.numpy() never
    explodes on modern bf16-saved checkpoints."""
    if hasattr(v, "detach"):
        v = v.detach().cpu()
        if str(v.dtype) in ("torch.bfloat16", "torch.float16"):
            v = v.float()
        return v.numpy()
    return np.asarray(v)


def _load_one(path: str):
    if path.endswith(".safetensors"):
        # Load via torch so bf16 tensors survive: safetensors.numpy raises
        # on bfloat16 (numpy has no bf16 dtype), and real Aether/SVD
        # exports ship bf16.  _to_numpy widens bf16/f16 → f32.
        try:
            from safetensors.torch import load_file as _load_st
        except ImportError:
            # torch-less fallback — fine for f32/f16 checkpoints only
            from safetensors.numpy import load_file as _load_np

            return dict(_load_np(path))
        return {k: _to_numpy(v) for k, v in _load_st(path).items()}
    import pickle

    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except pickle.UnpicklingError:
        # legacy checkpoints pickle benign extras (DUSt3R stores an
        # argparse.Namespace under 'args').  weights_only=False executes
        # arbitrary pickle code — only do it knowingly, and say so.
        print(
            f"WARNING: {path} is not weights-only; re-loading with "
            "weights_only=False (executes pickled code — only convert "
            "checkpoints you trust)",
            file=sys.stderr,
        )
        obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model", "state_dict"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    return {
        k: _to_numpy(v) for k, v in obj.items() if hasattr(v, "shape")
    }


def load_state_dict(path: str):
    """File or directory → one merged {name: tensor} dict, DDP prefixes
    stripped."""
    if os.path.isdir(path):
        sd = {}
        names = sorted(os.listdir(path))
        shards = [
            n for n in names if n.endswith((".safetensors", ".bin", ".pth", ".pt"))
        ]
        if not shards:
            raise FileNotFoundError(f"no checkpoint shards in {path}")
        for n in shards:
            sd.update(_load_one(os.path.join(path, n)))
    else:
        sd = _load_one(path)
    return {k.removeprefix("module."): v for k, v in sd.items()}


def _np_tree_from_shapes(shapes):
    import jax

    return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)


def _graft_and_report(target, flat, allow_partial: bool, skipped=()):
    from unigeo_tpu.utils.checkpoint import graft_flat_params

    used = set()
    grafted, matched, missed = graft_flat_params(
        target, flat, strict=False, used=used
    )
    orphans = sorted(
        ".".join(map(str, k)) for k in set(flat) - used
    )
    n_leaves = matched + len(missed)
    print(f"matched {matched}/{n_leaves} target leaves; "
          f"{len(orphans)} unconsumed checkpoint tensors"
          + (f"; skipped source keys: {len(skipped)}" if skipped else ""))
    if missed:
        print("unmatched target leaves (first 10):", file=sys.stderr)
        for m in missed[:10]:
            print(f"  {'.'.join(map(str, m))}", file=sys.stderr)
    if orphans:
        print("unconsumed checkpoint tensors (first 10):", file=sys.stderr)
        for o in orphans[:10]:
            print(f"  {o}", file=sys.stderr)
    if missed or orphans:
        if not allow_partial:
            raise SystemExit(
                f"conversion incomplete ({len(missed)} unmatched leaves, "
                f"{len(orphans)} orphans) — investigate or pass "
                "--allow-partial"
            )
        if missed:
            print(
                "WARNING: --allow-partial saves the unmatched leaves as "
                "ZEROS (not random init) — the tree is for inspection/"
                "manual re-grafting, loading it directly will produce "
                "degenerate outputs",
                file=sys.stderr,
            )
    return grafted


# ---------------------------------------------------------------------------
# families
# ---------------------------------------------------------------------------

def convert_svd(args):
    import jax
    import jax.numpy as jnp

    from unigeo_tpu.models.depthcrafter.pipeline import DepthCrafterPipeline
    from unigeo_tpu.utils.convert_svd import convert_svd_checkpoint

    cfg = json.loads(args.network_config) if args.network_config else {}
    pipe = DepthCrafterPipeline(
        unet_config=cfg.get("unet_config"),
        vae_config=cfg.get("vae_config"),
        clip_config=cfg.get("clip_config"),
    )
    rng = jax.random.PRNGKey(0)
    t, h, w = 2, 64, 64  # param shapes are input-size independent
    ctx = pipe.unet.cross_attention_dim
    shapes = {
        "vae": jax.eval_shape(
            lambda r: pipe.vae.init(r, jnp.zeros((1, h, w, 3)), 1), rng
        )["params"],
        "clip": jax.eval_shape(
            lambda r: pipe.clip.init(r, jnp.zeros((1, h, w, 3))), rng
        )["params"],
        "unet": jax.eval_shape(
            lambda r: pipe.unet.init(
                r, jnp.zeros((t, h // 8, w // 8, 8)), jnp.zeros((1,)),
                jnp.zeros((t, 1, ctx)), jnp.zeros((1, 3)), t,
            ),
            rng,
        )["params"],
    }
    target = _np_tree_from_shapes(shapes)
    flat = convert_svd_checkpoint(
        unet_sd=load_state_dict(args.unet) if args.unet else None,
        vae_sd=load_state_dict(args.vae) if args.vae else None,
        clip_sd=load_state_dict(args.clip) if args.clip else None,
    )
    if not flat:
        raise SystemExit("svd: provide at least one of --unet/--vae/--clip")
    if not (args.unet and args.vae and args.clip):
        # partial by construction: only grafting the provided components
        # can be strict — restrict the target to them
        comps = [c for c, p in
                 (("unet", args.unet), ("vae", args.vae), ("clip", args.clip))
                 if p]
        target = {c: target[c] for c in comps}
        print(
            f"WARNING: PARTIAL tree (components: {comps}) — "
            "DepthCrafter(checkpoint_path=...) needs all of unet/vae/clip; "
            "merge this output into a full tree before loading",
            file=sys.stderr,
        )
    return _graft_and_report(target, flat, args.allow_partial)


# the released DUSt3R_ViTLarge_BaseDecoder_512_dpt architecture
DUST3R_512_DPT_CONFIG = dict(
    enc_width=1024, enc_depth=24, enc_heads=16,
    dec_width=768, dec_depth=12, dec_heads=12,
    patch_size=16, head_type="dpt", pos_embed="RoPE100",
    qkv_bias=True, norm_context=True,
)
# keys the backbone/head converters legitimately do not consume
_DUST3R_SKIP_PREFIXES = ("mask_token", "prediction_head", "enc_pos_embed",
                        "dec_pos_embed")


def convert_dust3r(args):
    import jax
    import jax.numpy as jnp

    from unigeo_tpu.models.pointmap.dust3r import Dust3RNetwork
    from unigeo_tpu.utils.convert_dust3r import (
        convert_dpt_head,
        convert_dust3r_pair,
    )

    if not args.ckpt:
        raise SystemExit("dust3r: --ckpt is required")
    cfg = dict(DUST3R_512_DPT_CONFIG)
    if args.network_config:
        cfg.update(json.loads(args.network_config))
    net = Dust3RNetwork(**cfg)
    shapes = jax.eval_shape(
        lambda r: net.init(
            r, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3))
        ),
        jax.random.PRNGKey(0),
    )
    target = _np_tree_from_shapes(shapes)

    sd = load_state_dict(args.ckpt)
    flat = convert_dust3r_pair(sd)
    consumed = set()
    for head, scope in (("downstream_head1", "head1"),
                        ("downstream_head2", "head2")):
        sub = {k: v for k, v in sd.items() if k.startswith(head + ".")}
        consumed.update(sub)
        for p, a in convert_dpt_head(sub).items():
            flat[(scope,) + p] = a
    skipped = [
        k for k in sd
        if k.startswith(_DUST3R_SKIP_PREFIXES) and k not in consumed
    ]
    # source-key coverage: the converters silently ignore names they don't
    # recognize, which would punch a hole in the two-sided check — flag
    # every source key that is neither converter-recognized nor on the
    # documented skip list (refinenet4.resConfUnit1 is dead in torch too)
    import re as _re

    blk = _re.compile(r"^(enc_blocks|dec_blocks|dec_blocks2)\.\d+\.")
    recognized_top = {
        "patch_embed.proj.weight", "patch_embed.proj.bias",
        "enc_norm.weight", "enc_norm.bias", "dec_norm.weight",
        "dec_norm.bias", "decoder_embed.weight", "decoder_embed.bias",
    }
    unrecognized = [
        k for k in sd
        if k not in recognized_top
        and not blk.match(k)
        and not k.startswith("downstream_head")
        and not k.startswith(_DUST3R_SKIP_PREFIXES)
    ]
    if unrecognized:
        print(
            f"{len(unrecognized)} unrecognized source keys (first 10):",
            file=sys.stderr,
        )
        for k in unrecognized[:10]:
            print(f"  {k}", file=sys.stderr)
        if not args.allow_partial:
            raise SystemExit(
                "unrecognized checkpoint keys — a different architecture "
                "variant? investigate or pass --allow-partial"
            )
    return _graft_and_report(target, flat, args.allow_partial, skipped)


def convert_aether(args):
    import jax
    import jax.numpy as jnp

    from unigeo_tpu.models.aether import AetherDiT, CausalVAE3D
    from unigeo_tpu.utils.convert_aether import convert_aether_checkpoint

    cfg = json.loads(args.network_config) if args.network_config else {}
    vae = CausalVAE3D(**cfg.get("vae_config", {}))
    dit = AetherDiT(
        out_channels=vae.z_channels + 6, **cfg.get("network_config", {})
    )
    rng = jax.random.PRNGKey(0)
    t0 = 2 * vae.ct
    h0 = w0 = 2 * vae.cs
    shapes_vae = jax.eval_shape(
        lambda r: vae.init(r, jnp.zeros((t0, h0, w0, 3))), rng
    )
    tl, hl, wl = t0 // vae.ct, h0 // vae.cs, w0 // vae.cs
    shapes_dit = jax.eval_shape(
        lambda r: dit.init(
            r,
            jnp.zeros((tl, hl, wl, 2 * vae.z_channels + 6)),
            jnp.float32(1.0),
        ),
        rng,
    )
    target = {
        "vae": _np_tree_from_shapes(shapes_vae),
        "dit": _np_tree_from_shapes(shapes_dit),
    }
    flat = convert_aether_checkpoint(
        transformer_sd=(
            load_state_dict(args.transformer) if args.transformer else None
        ),
        vae_sd=load_state_dict(args.vae) if args.vae else None,
    )
    if not flat:
        raise SystemExit("aether: provide --transformer and/or --vae")
    if not (args.transformer and args.vae):
        comps = [c for c, p in (("dit", args.transformer), ("vae", args.vae))
                 if p]
        target = {c: target[c] for c in comps}
        print(
            f"WARNING: PARTIAL tree (components: {comps}) — "
            "Aether(checkpoint_path=...) needs both dit and vae; merge "
            "this output into a full tree before loading",
            file=sys.stderr,
        )
    return _graft_and_report(target, flat, args.allow_partial)


def convert_vda(args):
    import jax
    import jax.numpy as jnp

    from unigeo_tpu.models.vda import VDANetwork
    from unigeo_tpu.utils.convert_vda import convert_vda_checkpoint

    if not args.ckpt:
        raise SystemExit("vda: --ckpt is required")
    cfg = json.loads(args.network_config) if args.network_config else {}
    net = VDANetwork(**cfg)
    shapes = jax.eval_shape(
        lambda r: net.init(r, jnp.zeros((2, 140, 140, 3))),
        jax.random.PRNGKey(0),
    )
    target = _np_tree_from_shapes(shapes)
    sd = load_state_dict(args.ckpt)
    flat = convert_vda_checkpoint(sd, head_prefix=args.head_prefix)
    unrecognized = [
        k for k in sd
        if not k.startswith(("pretrained.", args.head_prefix))
    ]
    if unrecognized:
        print(
            f"{len(unrecognized)} source keys outside "
            f"pretrained./{args.head_prefix} (first 10):",
            file=sys.stderr,
        )
        for k in unrecognized[:10]:
            print(f"  {k}", file=sys.stderr)
        if not args.allow_partial:
            raise SystemExit(
                "unrecognized checkpoint keys — wrong --head-prefix? "
                "investigate or pass --allow-partial"
            )
    return _graft_and_report(target, flat, args.allow_partial)


FAMILIES = {
    "svd": convert_svd,
    "dust3r": convert_dust3r,
    "aether": convert_aether,
    "vda": convert_vda,
}


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    ap.add_argument("family", choices=sorted(FAMILIES))
    ap.add_argument("--out", required=True, help="orbax output dir")
    ap.add_argument("--ckpt", help="single checkpoint file (dust3r/vda)")
    ap.add_argument("--unet", help="svd: UNet file/dir")
    ap.add_argument("--vae", help="svd/aether: VAE file/dir")
    ap.add_argument("--clip", help="svd: CLIP image-encoder file/dir")
    ap.add_argument("--transformer", help="aether: DiT file/dir")
    ap.add_argument("--network-config", help="JSON network_config override")
    ap.add_argument("--head-prefix", default="head.",
                    help="vda: 'depth_head.' for plain DepthAnything")
    ap.add_argument("--allow-partial", action="store_true",
                    help="report instead of failing on unmatched keys")
    args = ap.parse_args(argv)

    # graft + save run on host numpy; never touch (or wait for) the TPU.
    # (sitecustomize may have force-registered the tunneled backend at
    # interpreter start, so the env var alone is not enough — pin through
    # jax.config like tests/conftest.py.)
    import jax

    jax.config.update("jax_platforms", "cpu")

    grafted = FAMILIES[args.family](args)

    from unigeo_tpu.utils.checkpoint import save_params

    save_params(grafted, args.out)
    print(f"saved orbax checkpoint: {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
