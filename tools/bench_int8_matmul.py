"""Does int8 matmul actually run 2x bf16 on this chip through XLA?

The v5e MXU peak is 394 TOPS int8 vs 197 TFLOP/s bf16.  The UNet FF pool
(48 GEGLU feed-forwards, ~92 ms of the 276 ms denoise step, ROADMAP.md)
runs at the measured bf16 ceiling (~98 TF/s at its shapes), so the only
remaining single-chip lever of size is the int8 MXU rate.  This tool
measures whether XLA exposes it: raw int8xint8->int32 `dot_general` vs the
same-shape bf16 matmul, at the FF's production shapes
(M = T*H/8*W/8 tokens, K/N = 320..1280 channel widths).

Run on the default (TPU) platform:  python tools/bench_int8_matmul.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp

from _benchlib import measure_rtt, setup_cache


def time_matmul(m, k, n, dtype, reps=3, chain=256, rtt=0.0):
    """TF(L)OP/s of a chained [m,k]@[k,n] matmul in ``dtype``.

    The chain feeds the output back through a cheap cast so nothing is
    DCE'd and the ~30 ms tunnel RTT amortizes over ``chain`` matmuls.
    """
    key = jax.random.PRNGKey(0)
    ka, kb = jax.random.split(key)
    if dtype == jnp.int8:
        # random operands: constant/uniform inputs let XLA strength-reduce
        # the matmul (dot(c, ones) == row-sum) and fake 100x rates
        a = jax.random.randint(ka, (m, k), -127, 128, jnp.int8)
        b = jax.random.randint(kb, (k, n), -127, 128, jnp.int8)

        @jax.jit
        def prog(a, b):
            def body(c, _):
                o = jax.lax.dot_general(
                    c, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                # fold a full reduction of the output back into the lhs:
                # carries a data dependency AND defeats dead-column DCE
                c = c ^ (o.sum() & 1).astype(jnp.int8)
                return c, None

            c, _ = jax.lax.scan(body, a, None, length=chain)
            return jnp.sum(c.astype(jnp.int32))
    else:
        a = jax.random.normal(ka, (m, k), dtype)
        b = jax.random.normal(kb, (k, n), dtype)

        @jax.jit
        def prog(a, b):
            def body(c, _):
                o = jnp.dot(c, b, preferred_element_type=jnp.float32)
                return c + (o.sum() * 1e-20).astype(dtype), None

            c, _ = jax.lax.scan(body, a, None, length=chain)
            return jnp.sum(c.astype(jnp.float32))

    float(prog(a, b))  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(prog(a, b))
        ts.append(time.perf_counter() - t0)
    per = max(min(ts) - rtt, 1e-9) / chain  # RTT-corrected
    return 2.0 * m * k * n / per / 1e12, per


def main():
    setup_cache()
    rtt = measure_rtt()
    print(f"platform={jax.devices()[0].platform} rtt={rtt*1e3:.1f}ms")
    # FF production shapes: M = 25*48*64 = 76800 tokens (stage0) down to
    # 25*6*8=1200 (mid); K->4K up-proj and 4K->K down-proj at K=320/640/1280.
    shapes = [
        (76800, 320, 2560),   # stage0 GEGLU up (gate+value fused)
        (76800, 1280, 320),   # stage0 down
        (19200, 640, 5120),
        (19200, 2560, 640),
        (4800, 1280, 10240),
        (4800, 5120, 1280),
    ]
    for m, k, n in shapes:
        tf_bf16, t_bf = time_matmul(m, k, n, jnp.bfloat16, rtt=rtt)
        tf_int8, t_i8 = time_matmul(m, k, n, jnp.int8, rtt=rtt)
        print(
            f"[{m:6d},{k:5d}]x[{k:5d},{n:5d}]  "
            f"bf16 {tf_bf16:6.1f} TF/s ({t_bf*1e3:6.2f} ms)   "
            f"int8 {tf_int8:6.1f} TOP/s ({t_i8*1e3:6.2f} ms)   "
            f"speedup {t_bf/t_i8:4.2f}x"
        )


if __name__ == "__main__":
    main()
