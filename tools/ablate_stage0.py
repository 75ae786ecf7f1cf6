#!/usr/bin/env python
"""Intra-block ablation at UNet stage-0 shapes ([25, 48, 64, 320]).

profile_blocks.py showed stage-0 res/transformer blocks run at ~12% of the
chip's conv peak; this times each constituent op standalone to find the
offender.  Each op is chained k=16 times inside ONE jitted scan (output
feeds input, so nothing is DCE'd and the 35 ms tunnel RTT amortizes away);
reported ms is per single application.

Usage: python tools/ablate_stage0.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools._benchlib import measure_rtt, setup_cache, time_chained

setup_cache()

def _time_chained(fn, x, *extra, reps=3, rtt=0.0):
    """Old signature adapter → shared time_chained (extras closed over)."""
    return time_chained(lambda c: fn(c, *extra), x, K, reps=reps, rtt=rtt)

DTYPE = jnp.bfloat16
T, H, W, C = 25, 48, 64, 320
K = 16  # chained applications per program


def main():
    import flax.linen as nn

    from unigeo_tpu.models.layers import (
        AlphaBlender,
        Conv2d,
        FeedForward,
        GroupNorm,
        TemporalConv,
    )

    rtt = measure_rtt()
    print(f"device={jax.devices()[0].device_kind}  rtt={rtt*1e3:.1f} ms  (per-op ms, K={K})", flush=True)

    def bf16(p):
        return jax.tree.map(lambda a: a.astype(DTYPE), p)

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (T, H, W, C), DTYPE)
    x5 = x.reshape(1, T, H, W, C)
    tok = x.reshape(T, H * W, C)

    def bench(name, module, x, *extra):
        params = module.init(rng, x, *extra)["params"]
        params = jax.tree.map(lambda a: a.astype(DTYPE), params)
        ms = time_chained(
            lambda c: module.apply({"params": params}, c, *extra), x, K,
            rtt=rtt,
        ) * 1e3
        print(f"{name:48s} {ms:8.3f} ms", flush=True)
        return ms

    # --- raw ops ---
    bench("Conv2d 3x3 C=320", Conv2d(C), x)
    bench("Conv2d 1x1 C=320", Conv2d(C, kernel=1), x)
    bench("TemporalConv (3,1,1) C=320", TemporalConv(C), x5)
    bench("GroupNorm32 C=320", GroupNorm(), x)
    bench("LayerNorm tokens", nn.LayerNorm(epsilon=1e-5), tok)
    bench("FeedForward GEGLU C=320", FeedForward(), tok)
    bench("Dense C->C tokens", nn.Dense(C), tok)

    class NormSiluConv(nn.Module):
        @nn.compact
        def __call__(self, x):
            return Conv2d(C)(nn.silu(GroupNorm()(x)))

    bench("GroupNorm+SiLU+Conv3x3", NormSiluConv(), x)

    # --- data movement ---
    ms = _time_chained(
        lambda a: (
            a.reshape(T, H * W, C).transpose(1, 0, 2).reshape(H * W, T, C)
            .transpose(1, 0, 2).reshape(T, H, W, C)
        ),
        x, rtt=rtt,
    ) * 1e3
    print(f"{'temporal round-trip transpose (x2)':48s} {ms:8.3f} ms", flush=True)

    ab = AlphaBlender()
    abp = bf16(ab.init(rng, x5, x5)["params"])
    ms = _time_chained(
        lambda c, p: ab.apply({"params": p}, c, c), x5, abp, rtt=rtt
    ) * 1e3
    print(f"{'AlphaBlender':48s} {ms:8.3f} ms", flush=True)

    # gelu / silu raw vector cost at FF hidden shape
    hid = jax.random.normal(rng, (T, H * W, 4 * C), DTYPE)
    ms = _time_chained(lambda a: nn.gelu(a, approximate=False), hid, rtt=rtt) * 1e3
    print(f"{'gelu exact [T,HW,4C]':48s} {ms:8.3f} ms", flush=True)
    ms = _time_chained(lambda a: nn.gelu(a, approximate=True), hid, rtt=rtt) * 1e3
    print(f"{'gelu tanh  [T,HW,4C]':48s} {ms:8.3f} ms", flush=True)
    ms = time_chained(lambda a: nn.silu(a), hid, K, rtt=rtt) * 1e3
    print(f"{'silu       [T,HW,4C]':48s} {ms:8.3f} ms", flush=True)

    # --- attention at stage0 shapes ---
    from unigeo_tpu.ops.attention import attention

    q = jax.random.normal(rng, (T, H * W, 5, 64), DTYPE)
    ms = _time_chained(lambda a: attention(a, a, a), q, rtt=rtt) * 1e3
    print(f"{'spatial flash attn S=3072 h5 d64':48s} {ms:8.3f} ms", flush=True)

    qt = jax.random.normal(rng, (H * W, T, 5, 64), DTYPE)
    ms = _time_chained(lambda a: attention(a, a, a), qt, rtt=rtt) * 1e3
    print(f"{'temporal attn S=25 h5 d64 (B=3072)':48s} {ms:8.3f} ms", flush=True)

    # --- composite blocks (same modules the UNet uses) ---
    from unigeo_tpu.models.depthcrafter.unet import (
        BasicTransformerBlock,
        SpatialResBlock,
        SpatioTemporalResBlock,
        TemporalResBlock,
        TemporalTransformerBlock,
        TransformerSpatioTemporal,
    )

    emb = jax.random.normal(rng, (T, 1280), DTYPE)
    ctx = jax.random.normal(rng, (T, 1, 1024), DTYPE)

    srb = SpatialResBlock(C)
    p = bf16(srb.init(rng, x, emb)["params"])
    ms = _time_chained(
        lambda c, p: srb.apply({"params": p}, c, emb), x, p, rtt=rtt
    ) * 1e3
    print(f"{'SpatialResBlock':48s} {ms:8.3f} ms", flush=True)

    trb = TemporalResBlock(C)
    p = bf16(trb.init(rng, x5, emb.reshape(1, T, -1))["params"])
    ms = _time_chained(
        lambda c, p: trb.apply({"params": p}, c, emb.reshape(1, T, -1)), x5, p,
        rtt=rtt,
    ) * 1e3
    print(f"{'TemporalResBlock':48s} {ms:8.3f} ms", flush=True)

    strb = SpatioTemporalResBlock(C)
    p = bf16(strb.init(rng, x, emb, T)["params"])
    ms = _time_chained(
        lambda c, p: strb.apply({"params": p}, c, emb, T), x, p, rtt=rtt
    ) * 1e3
    print(f"{'SpatioTemporalResBlock (full)':48s} {ms:8.3f} ms", flush=True)

    btb = BasicTransformerBlock(5, 64, 1024)
    p = bf16(btb.init(rng, tok, ctx)["params"])
    ms = _time_chained(
        lambda c, p: btb.apply({"params": p}, c, ctx), tok, p, rtt=rtt
    ) * 1e3
    print(f"{'BasicTransformerBlock (spatial)':48s} {ms:8.3f} ms", flush=True)

    tokt = jax.random.normal(rng, (H * W, T, C), DTYPE)
    ctxt = jax.random.normal(rng, (H * W, 1, 1024), DTYPE)
    ttb = TemporalTransformerBlock(5, 64, 1024)
    p = bf16(ttb.init(rng, tokt, ctxt)["params"])
    ms = _time_chained(
        lambda c, p: ttb.apply({"params": p}, c, ctxt), tokt, p, rtt=rtt
    ) * 1e3
    print(f"{'TemporalTransformerBlock':48s} {ms:8.3f} ms", flush=True)

    tst = TransformerSpatioTemporal(5, 64, 1024)
    p = bf16(tst.init(rng, x, ctx, T)["params"])
    ms = _time_chained(
        lambda c, p: tst.apply({"params": p}, c, ctx, T), x, p, rtt=rtt
    ) * 1e3
    print(f"{'TransformerSpatioTemporal (full)':48s} {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
