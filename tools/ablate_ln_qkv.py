"""Measure the fused LN→QKV kernel vs the jnp composition (VERDICT r4 #6).

Scan-chained (RTT-amortized) timings at the UNet temporal-transformer
shapes (the ~26 ms/step glue attribution, ROADMAP "UNet step
attribution"): per level, x [T·HW_tokens, C] with the QKV output [., 3C].

Run on the TPU:  timeout 900 python tools/ablate_ln_qkv.py
CPU smoke:       LNQKV_SMALL=1 PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu ...
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tools._benchlib import measure_rtt, setup_cache, time_chained  # noqa: E402

setup_cache()

from unigeo_tpu.ops.ln_qkv import ln_dense_reference, ln_dense_tpu  # noqa: E402

# (M, C) per UNet level at 25x384x512: tokens = T * (H/8 / 2^l) * (W/8 / 2^l)
SHAPES = [
    (25 * 48 * 64, 320),
    (25 * 24 * 32, 640),
    (25 * 12 * 16, 1280),
]
SMALL = os.environ.get("LNQKV_SMALL", "0") == "1"
if SMALL:
    SHAPES = [(1024, 256)]


def main():
    rtt = measure_rtt()
    results = {"rtt_ms": round(rtt * 1e3, 1), "device":
               jax.devices()[0].device_kind, "shapes": []}
    interpret = SMALL and jax.devices()[0].platform == "cpu"
    for m, c in SHAPES:
        n = 3 * c
        k = jax.random.PRNGKey(0)
        x = jax.random.normal(k, (m, c), jnp.bfloat16)
        gamma = jnp.ones((c,), jnp.bfloat16)
        beta = jnp.zeros((c,), jnp.bfloat16)
        w = jax.random.normal(jax.random.fold_in(k, 1), (c, n),
                              jnp.bfloat16) / (c ** 0.5)
        bias = jnp.zeros((n,), jnp.bfloat16)

        # shape-preserving chain: project back down with wT so the scan
        # carry keeps [M, C]
        wt = jnp.swapaxes(w, 0, 1) / (3.0 * c) ** 0.5

        def chain_ref(xc):
            y = ln_dense_reference(xc, gamma, beta, w, bias)
            return jax.lax.dot_general(
                y, wt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(xc.dtype)

        def chain_fused(xc):
            y = ln_dense_tpu(xc, gamma, beta, w, bias, interpret=interpret)
            return jax.lax.dot_general(
                y, wt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(xc.dtype)

        length = 4 if SMALL else 16
        t_ref = time_chained(chain_ref, x, length, rtt=rtt)
        t_fused = time_chained(chain_fused, x, length, rtt=rtt)
        # numerics check
        d = jnp.abs(
            ln_dense_tpu(x, gamma, beta, w, bias,
                         interpret=interpret).astype(jnp.float32)
            - ln_dense_reference(x, gamma, beta, w, bias).astype(jnp.float32)
        ).max()
        results["shapes"].append({
            "M": m, "C": c, "N": n,
            "jnp_ms": round(t_ref * 1e3, 3),
            "fused_ms": round(t_fused * 1e3, 3),
            "speedup": round(t_ref / max(t_fused, 1e-9), 3),
            "max_abs_dev": float(d),
        })
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
