"""Fused GEGLU feed-forward (Pallas TPU): x @ W1 → v·gelu(g) → @ W2.

The UNet runs 48 GEGLU feed-forwards per denoise step, each ~189 GFLOP with
a [M, 4C] hidden tensor (~200 MB bf16 at stage 0) that XLA materializes in
HBM between the two matmuls.  This kernel keeps the hidden in VMEM tiles:
grid (m_tiles, h_tiles), the hidden chunk [bm, bh] is produced from the
up-projection halves, gated, and immediately consumed by the down-matmul
accumulation — the HBM round trip disappears (measured ~0.5 ms of a
~1.9 ms FF at stage-0 shapes).

Numerics: f32 accumulation on both matmuls, tanh-approximate gelu on the
f32 up-projection — the same function the jnp path applies to bf16
activations (models/layers.py GEGLU; sub-ULP-identical in bf16).

Forward-only: the custom VJP recomputes through the jnp reference (the
trainers already pay rematerialized backward for attention; eval never
differentiates).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gelu_tanh(x):
    # tanh-approximate gelu (torch approximate='tanh'); f32 input
    c = 0.7978845608028654  # sqrt(2/pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def _geglu_kernel(x_ref, w1v_ref, w1g_ref, b1v_ref, b1g_ref, w2_ref,
                  o_ref, acc_scr, *, nh):
    hi = pl.program_id(1)

    @pl.when(hi == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    x = x_ref[...]  # [bm, C]
    v = jax.lax.dot_general(
        x, w1v_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1v_ref[...].astype(jnp.float32)  # [bm, bh] (+ [1, bh] broadcast)
    g = jax.lax.dot_general(
        x, w1g_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1g_ref[...].astype(jnp.float32)
    h = (v * _gelu_tanh(g)).astype(x.dtype)
    acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(hi == nh - 1)
    def _finalize():
        o_ref[...] = acc_scr[:].astype(o_ref.dtype)


def _pick_bh(hidden: int) -> int:
    for bh in (640, 512, 1024, 256, 128):
        if hidden % bh == 0:
            return bh
    return hidden


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def geglu_ffn_tpu(x, w1, b1, w2, block_m: int = 256, interpret: bool = False):
    """Fused GEGLU forward.

    x [B, S, C] (or [M, C]); w1 [C, 2H] (value ⊕ gate halves, diffusers
    GEGLU layout); b1 [2H]; w2 [H, C_out] → [B, S, C_out].  The +b2 of the
    down projection is left to the caller (XLA fuses it).
    """
    orig_shape = x.shape
    c = x.shape[-1]
    xm = x.reshape(-1, c)
    m = xm.shape[0]
    two_h = w1.shape[1]
    hidden = two_h // 2
    c_out = w2.shape[1]
    w1v, w1g = w1[:, :hidden], w1[:, hidden:]
    b1v, b1g = b1[:hidden], b1[hidden:]

    bh = _pick_bh(hidden)
    nh = hidden // bh
    bm = min(block_m, m)
    pad_m = (-m) % bm
    if pad_m:
        xm = jnp.pad(xm, ((0, pad_m), (0, 0)))
    nm = xm.shape[0] // bm
    b1v2 = b1v.reshape(1, hidden)  # 2-D blocks for Mosaic
    b1g2 = b1g.reshape(1, hidden)

    out = pl.pallas_call(
        functools.partial(_geglu_kernel, nh=nh),
        grid=(nm, nh),
        in_specs=[
            pl.BlockSpec((bm, c), lambda mi, hi: (mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, bh), lambda mi, hi: (0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, bh), lambda mi, hi: (0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh), lambda mi, hi: (0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh), lambda mi, hi: (0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, c_out), lambda mi, hi: (hi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, c_out), lambda mi, hi: (mi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nm * bm, c_out), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, c_out), jnp.float32)],
        interpret=interpret,
    )(xm, w1v, w1g, b1v2, b1g2, w2)

    return out[:m].reshape(*orig_shape[:-1], c_out)


def geglu_ffn_reference(x, w1, b1, w2):
    """jnp reference (identical math to models/layers.py GEGLU + net_2
    without the b2 add): used off-TPU and as the VJP recompute path."""
    h = x @ w1.astype(x.dtype) + b1.astype(x.dtype)
    hidden = w1.shape[1] // 2
    v, g = h[..., :hidden], h[..., hidden:]
    act = v * jax.nn.gelu(g, approximate=x.dtype == jnp.bfloat16)
    return act @ w2.astype(x.dtype)


@jax.custom_vjp
def geglu_ffn(x, w1, b1, w2):
    """Dispatching fused GEGLU: Pallas kernel on TPU, jnp elsewhere."""
    return geglu_ffn_tpu(x, w1, b1, w2) if _on_tpu() else geglu_ffn_reference(
        x, w1, b1, w2
    )


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def use_fused_geglu(x_dtype, w_dtype) -> bool:
    """Fused-kernel dispatch — OPT-IN via UNIGEO_FUSED_GEGLU=1.

    Measured on v5e at the UNet's FF shapes: the kernel only MATCHES the
    two-matmul jnp path (164 vs 159 TF/s isolated at stage 0; denoise step
    276.4 vs 275.9 ms in context) — XLA already overlaps the [M, 4C]
    hidden's HBM traffic with the matmuls, so there is no round trip to
    save.  Kept as validated infrastructure for shapes where the hidden
    becomes capacity-critical (e.g. much larger M with tp-sharded C).
    Requires bf16 end to end (mixed dtypes keep the flax promotion
    semantics of the unfused path)."""
    import os

    if os.environ.get("UNIGEO_FUSED_GEGLU", "0") != "1":
        return False
    return (
        _on_tpu()
        and x_dtype == jnp.bfloat16
        and w_dtype == jnp.bfloat16
    )


def _geglu_fwd(x, w1, b1, w2):
    return geglu_ffn(x, w1, b1, w2), (x, w1, b1, w2)


def _geglu_bwd(res, g):
    x, w1, b1, w2 = res
    _, vjp = jax.vjp(geglu_ffn_reference, x, w1, b1, w2)
    return vjp(g)


geglu_ffn.defvjp(_geglu_fwd, _geglu_bwd)
