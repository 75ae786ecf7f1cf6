"""Random parameter materialization for benches and perf tools.

One cheap-to-compile program: a single flat normal draw sliced into leaves
(one RNG op instead of one per leaf — thousands of eager dispatches cost
minutes on remote/tunneled backends).  bf16 by default: halves HBM and
matches the production inference dtype.  Shared by bench.py and the
tools/ perf suite so the convention can't drift (r4 review finding)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def random_params_like(shapes, seed=0, scale=0.02, dtype=jnp.bfloat16):
    """A pytree of random normals matching ``shapes`` (a pytree of
    ShapeDtypeStructs or arrays), drawn in ONE jitted program."""
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    sizes = [int(np.prod(s.shape)) for s in leaves]
    total = sum(sizes)
    offsets = np.cumsum([0] + sizes[:-1])

    @jax.jit
    def gen(key):
        flat = jax.random.normal(key, (total,), dtype) * scale
        return [
            jax.lax.dynamic_slice(flat, (int(o),), (n,)).reshape(s.shape)
            for o, n, s in zip(offsets, sizes, leaves)
        ]

    vals = gen(jax.random.PRNGKey(seed))
    return jax.tree_util.tree_unflatten(treedef, vals)


def random_pipeline_params(pipe, t: int, h: int, w: int, seed=0,
                           dtype=jnp.bfloat16):
    """Random bf16 param tree for a DepthCrafterPipeline at the given clip
    shape, via eval_shape (no f32 materialization — a full-size f32 init is
    6 GB and has OOMed the chip next to eval activations)."""
    rng = jax.random.PRNGKey(0)
    ctx_dim = pipe.unet.cross_attention_dim
    shapes = {
        "vae": jax.eval_shape(
            lambda r: pipe.vae.init(r, jnp.zeros((1, h, w, 3)), 1), rng
        )["params"],
        "clip": jax.eval_shape(
            lambda r: pipe.clip.init(r, jnp.zeros((1, h, w, 3))), rng
        )["params"],
        "unet": jax.eval_shape(
            lambda r: pipe.unet.init(
                r,
                jnp.zeros((t, h // 8, w // 8, 8)),
                jnp.zeros((1,)),
                jnp.zeros((t, 1, ctx_dim)),
                jnp.zeros((1, 3)),
                t,
            ),
            rng,
        )["params"],
    }
    return random_params_like(shapes, seed=seed, dtype=dtype)
