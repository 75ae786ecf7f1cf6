#!/usr/bin/env python
"""Per-block ablation profile of the DepthCrafter stack at production shapes.

Times each major module (resnet blocks, transformer blocks, VAE stages) as a
standalone jitted program on the default backend, with RTT-corrected timing
(same recipe as bench.py).  Fusion boundaries differ slightly from the full
program, but the ranking reliably shows where a denoise step's time goes.

Usage:  python tools/profile_blocks.py [--frames 25 --h 384 --w 512]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools._benchlib import measure_rtt as _rtt, setup_cache, time_single

setup_cache()

DTYPE = jnp.bfloat16


def _time(fn, *args, reps=5, rtt=0.0):
    """fn(*args) with ALL arrays (incl. params) passed as arguments —
    closed-over params lower as constants (GBs -> remote-compile 413)."""
    return time_single(fn, *args, reps=reps, rtt=rtt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--h", type=int, default=384)
    ap.add_argument("--w", type=int, default=512)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from unigeo_tpu.models.depthcrafter.unet import (
        SpatioTemporalResBlock,
        TransformerSpatioTemporal,
        UNetSpatioTemporal,
    )
    from unigeo_tpu.models.depthcrafter.vae import AutoencoderKLTemporal
    from unigeo_tpu.models.vit import ClipImageEmbedder

    t, H, W = args.frames, args.h, args.w
    lh, lw = H // 8, W // 8
    rng = jax.random.PRNGKey(0)
    rtt = _rtt()
    print(f"device={jax.devices()[0].device_kind}  rtt={rtt*1e3:.2f} ms")

    chans = (320, 640, 1280, 1280)
    heads = (5, 10, 20, 20)
    time_dim = 1280
    ctx_dim = 1024
    rows = []

    def record(name, secs, mult):
        rows.append((name, secs * 1e3, mult, secs * mult * 1e3))
        print(f"{name:46s} {secs*1e3:9.2f} x{mult:<3d} {secs*mult*1e3:9.2f}",
              flush=True)

    # --- UNet blocks per stage ---
    for i, (ch, nh) in enumerate(zip(chans, heads)):
        hh, ww = lh // (2**i), lw // (2**i)
        x = jax.random.normal(rng, (t, hh, ww, ch), DTYPE)
        emb = jax.random.normal(rng, (t, time_dim), DTYPE)
        res = SpatioTemporalResBlock(ch)
        p = jax.jit(lambda r, xx, ee: res.init(r, xx, ee, t))(rng, x, emb)["params"]
        p = jax.tree.map(lambda a: a.astype(DTYPE), p)
        secs = _time(
            lambda pp, xx, ee: res.apply({"params": pp}, xx, ee, t), p, x, emb,
            reps=args.reps, rtt=rtt,
        )
        # down path: 2 res blocks/stage; up path: 3; mid: 2 at stage 3
        mult = 5 if i < 3 else 7
        record(f"res_block stage{i} {hh}x{ww}x{ch}", secs, mult)

        if True:  # every stage has a transformer row (mid-only at stage 3)
            has_attn = i < 3
            tr = TransformerSpatioTemporal(nh, 64, ctx_dim)
            ctx = jax.random.normal(rng, (t, 1, ctx_dim), DTYPE)
            pt = jax.jit(lambda r, xx, cc: tr.init(r, xx, cc, t))(rng, x, ctx)["params"]
            pt = jax.tree.map(lambda a: a.astype(DTYPE), pt)
            secs = _time(
                lambda pp, xx, cc: tr.apply({"params": pp}, xx, cc, t),
                pt, x, ctx, reps=args.reps, rtt=rtt,
            )
            mult = 5 if has_attn else 1  # 2 down + 3 up, or mid only
            record(f"transformer stage{i} {hh}x{ww}x{ch} h{nh}", secs, mult)

    # --- full UNet step ---
    unet = UNetSpatioTemporal()
    sample = jax.random.normal(rng, (t, lh, lw, 8), DTYPE)
    ctx = jax.random.normal(rng, (t, 1, ctx_dim), DTYPE)
    added = jnp.zeros((1, 3), jnp.float32)
    pu = jax.eval_shape(
        lambda r: unet.init(r, sample, jnp.zeros((1,)), ctx, added, t), rng
    )["params"]
    pu = jax.tree.map(
        lambda s: jax.random.normal(rng, s.shape, DTYPE) * 0.02, pu
    )
    secs_unet = _time(
        lambda pp, xx, cc: unet.apply(
            {"params": pp}, xx, jnp.full((1,), 500.0), cc, added, t
        ),
        pu, sample, ctx, reps=args.reps, rtt=rtt,
    )
    record(f"FULL UNet step {lh}x{lw}", secs_unet, 5)

    # --- VAE ---
    vae = AutoencoderKLTemporal()
    frames = jax.random.normal(rng, (t, H, W, 3), DTYPE)
    lat = jax.random.normal(rng, (t, lh, lw, 4), DTYPE)
    pv = jax.eval_shape(lambda r: vae.init(r, frames, t), rng)["params"]
    pv = jax.tree.map(
        lambda s: jax.random.normal(rng, s.shape, DTYPE) * 0.02, pv
    )
    secs = _time(
        lambda pp, f: vae.apply({"params": pp}, f, method=vae.encode),
        pv, frames, reps=args.reps, rtt=rtt,
    )
    record(f"VAE encode {H}x{W}", secs, 1)
    secs = _time(
        lambda pp, z: vae.apply({"params": pp}, z, t, method=vae.decode),
        pv, lat, reps=args.reps, rtt=rtt,
    )
    record(f"VAE decode {H}x{W}", secs, 1)

    # --- CLIP ---
    clip = ClipImageEmbedder()
    pc = jax.eval_shape(lambda r: clip.init(r, frames), rng)["params"]
    pc = jax.tree.map(
        lambda s: jax.random.normal(rng, s.shape, DTYPE) * 0.02, pc
    )
    secs = _time(
        lambda pp, f: clip.apply({"params": pp}, f), pc, frames,
        reps=args.reps, rtt=rtt,
    )
    record("CLIP embed", secs, 1)

    print(f"\n{'component':46s} {'ms/call':>9s} {'×':>3s} {'ms total':>9s}")
    for name, ms, mult, tot in rows:
        print(f"{name:46s} {ms:9.2f} {mult:3d} {tot:9.2f}")
    blocks = sum(r[3] for r in rows if r[0].startswith(("res_block", "transformer")))
    print(f"\nsum(block est × count) = {blocks:.1f} ms vs full UNet ×5 = "
          f"{secs_unet*5e3:.1f} ms")


if __name__ == "__main__":
    main()
