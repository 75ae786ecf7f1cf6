"""Fused LN→Dense kernel (ops/ln_qkv.py) vs the jnp composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigeo_tpu.ops.ln_qkv import ln_dense_reference, ln_dense_tpu

# the suite pins JAX_PLATFORMS=cpu (conftest), so this is ALWAYS the
# interpret-mode emulation — the compiled Mosaic path is only exercised by
# tools/ablate_ln_qkv.py on the chip (same honesty note as test_geglu_fused)
INTERP = True


@pytest.mark.parametrize("m,c,mult", [(512, 256, 3), (100, 128, 2)])
def test_fused_matches_reference(m, c, mult):
    """Exact against the same-f32-internals reference, incl. a non-tile
    M (padding path) and the 3C qkv width whose N=768 is NOT a multiple
    of the 512 default block (the unwritten-columns regression)."""
    k = jax.random.PRNGKey(0)
    n = mult * c
    x = jax.random.normal(k, (m, c), jnp.bfloat16)
    gamma = jax.random.normal(jax.random.fold_in(k, 1), (c,), jnp.bfloat16)
    beta = jax.random.normal(jax.random.fold_in(k, 2), (c,), jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(k, 3), (c, n),
                          jnp.bfloat16) / (c ** 0.5)
    bias = jax.random.normal(jax.random.fold_in(k, 4), (n,), jnp.bfloat16)
    out = ln_dense_tpu(x, gamma, beta, w, bias, interpret=INTERP)
    ref = ln_dense_reference(x, gamma, beta, w, bias)
    assert out.shape == (m, n)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0, atol=2e-2)  # bf16 output quantization of identical f32 math
    assert not np.isnan(np.asarray(out, np.float32)).any()


def test_reference_matches_flax_layernorm_dense():
    """The 'reference' really is flax LayerNorm → Dense."""
    import flax.linen as nn

    class LnDense(nn.Module):
        n: int

        @nn.compact
        def __call__(self, x):
            h = nn.LayerNorm(epsilon=1e-5)(x)
            return nn.Dense(self.n)(h)

    m, c, n = 64, 96, 192
    x = jax.random.normal(jax.random.PRNGKey(0), (m, c), jnp.float32)
    mod = LnDense(n)
    p = mod.init(jax.random.PRNGKey(1), x)
    ref = mod.apply(p, x)
    ours = ln_dense_reference(
        x, p["params"]["LayerNorm_0"]["scale"],
        p["params"]["LayerNorm_0"]["bias"],
        p["params"]["Dense_0"]["kernel"], p["params"]["Dense_0"]["bias"])
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=0, atol=1e-5)
