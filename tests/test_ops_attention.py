"""Attention kernel tests: reference vs naive softmax, Pallas in interpret
mode vs reference, gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unigeo_tpu.ops.attention import attention_reference, flash_attention_tpu


def naive_attention(q, k, v, scale):
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def _qkv(rng, b=2, sq=192, sk=192, h=3, d=64):
    q = jnp.asarray(rng.normal(size=(b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, sk, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, sk, h, d)), jnp.float32)
    return q, k, v


def test_reference_matches_naive(rng):
    q, k, v = _qkv(rng)
    scale = 64**-0.5
    out_ref = attention_reference(q, k, v, scale, k_chunk=64)
    out_naive = naive_attention(q, k, v, scale)
    assert np.allclose(np.asarray(out_ref), np.asarray(out_naive), atol=2e-5)


def test_reference_cross_attention_shapes(rng):
    # cross-attention: 1 key token (CLIP image embedding)
    q, _, _ = _qkv(rng, sq=100, sk=100)
    k = jnp.asarray(rng.normal(size=(2, 1, 3, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 1, 3, 64)), jnp.float32)
    out = attention_reference(q, k, v, 0.125)
    assert out.shape == q.shape
    # softmax over a single key = that key's value for every query
    assert np.allclose(np.asarray(out[0, 0, 0]), np.asarray(v[0, 0, 0]), atol=1e-5)


def test_pallas_interpret_matches_reference(rng):
    q, k, v = _qkv(rng, b=1, sq=300, sk=300, h=2)
    scale = 64**-0.5
    with jax.disable_jit():  # interpret path compiles pallas_call in interpret mode
        pass
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out_pallas = flash_attention_tpu(q, k, v, scale=scale, block_q=128, block_k=128)
    out_ref = naive_attention(q, k, v, scale)
    assert np.allclose(np.asarray(out_pallas), np.asarray(out_ref), atol=2e-4)


def test_reference_gradients_finite(rng):
    q, k, v = _qkv(rng, b=1, sq=64, sk=64, h=1)

    def loss(q, k, v):
        return jnp.sum(attention_reference(q, k, v, 0.125, k_chunk=32) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
    # cross-check against naive attention gradient
    g_naive = jax.grad(lambda q_, k_, v_: jnp.sum(naive_attention(q_, k_, v_, 0.125) ** 2), argnums=0)(q, k, v)
    assert np.allclose(np.asarray(grads[0]), np.asarray(g_naive), atol=1e-4)
