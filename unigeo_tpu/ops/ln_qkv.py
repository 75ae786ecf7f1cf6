"""Fused LayerNorm → Dense (Pallas TPU): the QKV-projection epilogue.

VERDICT r4 #6 bounded experiment.  The UNet's denoise step is at 82% of
its component ceiling with ~26 ms/step attributed to temporal-transformer
glue (norms, pos-embed adds, transposes, projections); every transformer
evaluates LayerNorm(x) immediately followed by the QKV projection.  XLA
normally materializes the normed activation in HBM between the two; this
kernel computes the row statistics in VMEM and feeds the normalized tile
straight into the MXU matmul:

    out = (LN(x; γ, β)) @ W + b        x [M, C], W [C, N]

Grid (m_tiles, n_tiles); the x tile [bm, C] is loaded once per cell and
the LN is recomputed per n-tile (VPU work ≪ the MXU matmul).  f32 row
statistics and accumulation regardless of input dtype.

Measurement: tools/ablate_ln_qkv.py compares this against the jnp
composition at the UNet's temporal-attention shapes, scan-chained
(RTT-amortized).  The result — win or parity — is committed alongside the
GEGLU note (ROADMAP), since XLA's own fusion may already hide the HBM
round trip exactly as it did for the FF hidden.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _ln_dense_kernel(x_ref, g_ref, b_ref, w_ref, bias_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)  # [bm, C]
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)
    y = xn * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    out = jax.lax.dot_general(
        y.astype(x_ref.dtype), w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "eps", "interpret"))
def ln_dense_tpu(x, gamma, beta, w, bias, block_m: int = 256,
                 block_n: int = 512, eps: float = 1e-5,
                 interpret: bool = False):
    """x [M, C] → LN(x) @ w + bias, [M, N]; non-tile M handled by
    padding; bn is chosen as a divisor of N (UNet widths give N = 3C ∈
    {960, 1920, 3840} — NOT all multiples of 128, so 320/480-wide
    candidates are in the list; Mosaic pads sublanes internally)."""
    m, c = x.shape
    n = w.shape[1]
    bm = min(block_m, m)
    # bn must DIVIDE n (unwritten trailing columns otherwise)
    bn = n
    for cand in (block_n, 480, 384, 320, 256, 128):
        if cand <= block_n and n % cand == 0:
            bn = cand
            break
    pad_m = (-m) % bm
    if pad_m:
        x = jnp.concatenate(
            [x, jnp.zeros((pad_m, c), x.dtype)], axis=0)
    grid = ((m + pad_m) // bm, n // bn)
    out = pl.pallas_call(
        functools.partial(_ln_dense_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, c), lambda mi, ni: (mi, 0)),
            pl.BlockSpec((1, c), lambda mi, ni: (0, 0)),
            pl.BlockSpec((1, c), lambda mi, ni: (0, 0)),
            pl.BlockSpec((c, bn), lambda mi, ni: (0, ni)),
            pl.BlockSpec((1, bn), lambda mi, ni: (0, ni)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda mi, ni: (mi, ni)),
        out_shape=jax.ShapeDtypeStruct((m + pad_m, n), x.dtype),
        interpret=interpret,
    )(x, gamma[None], beta[None], w, bias[None])
    return out[:m]


def ln_dense_reference(x, gamma, beta, w, bias, eps: float = 1e-5):
    """The jnp composition this kernel fuses (flax LayerNorm → Dense)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = (xc * jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32)
         + beta.astype(jnp.float32)).astype(x.dtype)
    return (
        jax.lax.dot_general(
            y, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias.astype(jnp.float32)
    ).astype(x.dtype)
