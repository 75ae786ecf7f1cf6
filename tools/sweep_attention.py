#!/usr/bin/env python
"""Block-size sweep for the packed flash-attention kernel at UNet shapes.

Times flash_attention_tpu_packed over (block_q, block_k) grids at the three
attention-bearing UNet stages plus the temporal path, scan-chained (K=16)
so the ~30 ms tunnel RTT amortizes away.

Usage: python tools/sweep_attention.py
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

DTYPE = jnp.bfloat16
K = 16


def _time_chained(fn, x, reps=3, rtt=0.0):
    return time_chained(fn, x, K, reps=reps, rtt=rtt)


def main():
    from unigeo_tpu.ops.attention import (
        attention_reference,
        flash_attention_tpu_packed,
    )

    rtt = measure_rtt()
    print(f"device={jax.devices()[0].device_kind}  rtt={rtt*1e3:.1f} ms  K={K}",
          flush=True)

    rng = jax.random.PRNGKey(0)
    # (label, B, S, H, D) — spatial attention per stage; flops = 4*S^2*H*D*B
    shapes = [
        ("stage0 spatial", 25, 48 * 64, 5, 64),
        ("stage1 spatial", 25, 24 * 32, 10, 64),
        ("stage2 spatial", 25, 12 * 16, 20, 64),
    ]
    for label, b, s, h, d in shapes:
        x = jax.random.normal(rng, (b, s, h * d), DTYPE)
        flops = 4 * s * s * h * d * b
        print(f"--- {label}: [B={b}, S={s}, H={h}, D={d}]  {flops/1e9:.1f} GF",
              flush=True)
        for bq in (256, 512, 1024):
            for bk in (256, 512, 768, 1024, 1536):
                if bq > s or bk > s:
                    continue
                try:
                    ms = _time_chained(
                        lambda c, bq=bq, bk=bk: flash_attention_tpu_packed(
                            c, c, c, h, block_q=bq, block_k=bk
                        ),
                        x, rtt=rtt,
                    ) * 1e3
                    tf = flops / (ms * 1e-3) / 1e12
                    print(f"  packed bq={bq:4d} bk={bk:4d}: {ms:7.3f} ms  {tf:6.1f} TF/s",
                          flush=True)
                except Exception as e:
                    print(f"  packed bq={bq:4d} bk={bk:4d}: FAIL {type(e).__name__}",
                          flush=True)

    # temporal attention: dense single-chunk reference path
    for label, b, s, h, d in [
        ("stage0 temporal", 3072, 25, 5, 64),
        ("stage1 temporal", 768, 25, 10, 64),
    ]:
        x = jax.random.normal(rng, (b, s, h, d), DTYPE)
        ms = _time_chained(
            lambda c: attention_reference(c, c, c), x, rtt=rtt
        ) * 1e3
        print(f"{label} dense-ref [B={b},S={s},H={h}]: {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
