"""Fused GEGLU feed-forward kernel (ops/geglu.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from unigeo_tpu.ops.geglu import geglu_ffn_reference, geglu_ffn_tpu


def test_fused_geglu_matches_reference_interpret():
    """Pallas kernel (interpret mode on CPU) == jnp reference, bf16 inputs,
    across M padding and multi-chunk hidden."""
    rng = np.random.default_rng(0)
    for m, c, mult in ((100, 64, 4), (256, 128, 4), (37, 64, 2)):
        x = jnp.asarray(rng.normal(size=(m, c)) * 0.5, jnp.bfloat16)
        w1 = jnp.asarray(rng.normal(size=(c, 2 * c * mult)) * 0.05, jnp.bfloat16)
        b1 = jnp.asarray(rng.normal(size=(2 * c * mult,)) * 0.05, jnp.bfloat16)
        w2 = jnp.asarray(rng.normal(size=(c * mult, c)) * 0.05, jnp.bfloat16)
        out = geglu_ffn_tpu(x, w1, b1, w2, block_m=64, interpret=True)
        ref = geglu_ffn_reference(x, w1, b1, w2)
        assert out.shape == ref.shape == (m, c)
        dev = np.abs(out.astype(np.float32) - ref.astype(np.float32)).max()
        scale = max(float(np.abs(np.asarray(ref, np.float32)).max()), 1e-6)
        # kernel accumulates in f32 (MORE precise than the bf16 reference
        # matmul chain) — agreement is bounded by bf16 round-off
        assert dev / scale < 0.04, (m, c, mult, dev, scale)


def test_feedforward_param_tree_unchanged():
    """FeedForward's param tree matches the historical GEGLU+Dense layout
    (net_0/proj/{kernel,bias}, net_2/{kernel,bias}) — checkpoints map."""
    from unigeo_tpu.models.layers import FeedForward

    ff = FeedForward()
    x = jnp.zeros((2, 5, 32), jnp.float32)
    params = ff.init(jax.random.PRNGKey(0), x)["params"]
    assert set(params.keys()) == {"net_0", "net_2"}
    assert set(params["net_0"].keys()) == {"proj"}
    assert set(params["net_0"]["proj"].keys()) == {"kernel", "bias"}
    assert params["net_0"]["proj"]["kernel"].shape == (32, 256)
    assert params["net_2"]["kernel"].shape == (128, 32)


def test_feedforward_unfused_matches_dense_stack():
    """The manual unfused path == literal nn.Dense GEGLU composition (same
    promotion, same gelu flavor per dtype)."""
    import flax.linen as nn

    from unigeo_tpu.models.layers import FeedForward

    class Legacy(nn.Module):
        @nn.compact
        def __call__(self, x):
            c = x.shape[-1]
            h = nn.Dense(c * 8, name="proj")(x)
            v, g = jnp.split(h, 2, axis=-1)
            h = v * nn.gelu(g, approximate=g.dtype == jnp.bfloat16)
            return nn.Dense(c, name="out")(h)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 7, 16)), jnp.float32)
    ff = FeedForward()
    p = ff.init(jax.random.PRNGKey(0), x)["params"]
    legacy_p = {
        "proj": p["net_0"]["proj"],
        "out": p["net_2"],
    }
    out = ff.apply({"params": p}, x)
    ref = Legacy().apply({"params": legacy_p}, x)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_feedforward_grad_flows():
    """Training path: gradients flow through the custom-VJP dispatcher."""
    from unigeo_tpu.models.layers import FeedForward

    ff = FeedForward()
    x = jnp.ones((2, 4, 16), jnp.float32)
    p = ff.init(jax.random.PRNGKey(0), x)

    def loss(p, x):
        return jnp.sum(ff.apply(p, x) ** 2)

    g = jax.grad(loss)(p, x)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
