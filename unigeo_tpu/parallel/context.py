"""Context parallelism: shard the FRAME axis of a clip across chips.

SURVEY.md §5 ("long-context / sequence parallelism"): when a clip's
activations exceed one chip's HBM, the sequence axis of the spatio-temporal
UNet is its frame axis.  Sharding every [T, ...] activation on the mesh's
``sp`` axis makes XLA insert the all-gathers for temporal attention and the
halo exchanges for frame-axis convs automatically — model code is unchanged.

Usage:
    mesh = make_mesh(8, shape=(1, 8, 1))          # all-sp mesh
    out = denoise_context_parallel(pipe, params, cond, ctx, noise, 5, mesh)
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_clip_over_frames(mesh: Mesh, *arrays, axis_name: str = "sp"):
    """device_put each [T, ...] array with T sharded on the sp axis."""
    shard = NamedSharding(mesh, P(axis_name))
    return tuple(jax.device_put(a, shard) for a in arrays)


def denoise_context_parallel(
    pipeline, params, cond_latents, context, noise, num_inference_steps: int,
    mesh: Mesh, axis_name: str = "sp",
):
    """Run the denoise stage with frames sharded over ``axis_name``.

    Parameters stay replicated; the jitted stage picks the shardings up from
    the committed inputs, so the same compiled structure serves single-chip
    and context-parallel execution.
    """
    cond_latents, context, noise = shard_clip_over_frames(
        mesh, cond_latents, context, noise, axis_name=axis_name
    )
    replicated = NamedSharding(mesh, P())
    params = jax.device_put(params, replicated)
    with mesh:
        return pipeline._denoise_stage(
            params, cond_latents, context, noise, num_inference_steps
        )


def flow_sample_context_parallel(
    model, params, cond_latents, noise, steps: int, mesh: Mesh,
    axis_name: str = "sp",
):
    """Aether flow sampling with latent FRAMES sharded over ``axis_name``.

    The DiT flattens [T', gh, gw] to one space-time token sequence with T'
    leading, so sharding the latent frame axis shards the sequence in
    contiguous blocks: the per-token projections and MLPs partition
    cleanly, and XLA inserts the K/V all-gathers the full-3D attention
    needs (each device computes its query block against the gathered
    keys).  Long clips whose token count would blow one chip's HBM at
    production width run unchanged — model code is identical to the
    single-chip path (tested against serial in tests/test_aether.py).
    """
    cond_latents, noise = shard_clip_over_frames(
        mesh, cond_latents, noise, axis_name=axis_name
    )
    params = jax.device_put(params, NamedSharding(mesh, P()))
    with mesh:
        return model._sample(params, cond_latents, noise, steps=steps)
