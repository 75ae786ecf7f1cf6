"""Brute-force nearest-neighbor search on TPU.

Replaces scipy cKDTree queries (reference: metrics/utils.py:7-42) and
open3d's KD-tree (reference: metrics/eval_pcd.py:128-145).  At the point
counts the pipeline uses (≤ ~10k after downsampling, eval_pcd.py:95-100) an
exact chunked distance-matrix scan is both simpler and faster on TPU than any
tree: the distance computation is one [chunk, 3] x [3, M] matmul that the MXU
eats for free, and argmin/top-k run on the VPU.

Distances use the expansion ||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b with a
non-negativity clamp.  Memory is bounded by chunking the query axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pad_rows(x, multiple):
    n = x.shape[0]
    pad = (-n) % multiple
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], 1e30, x.dtype)], 0)
    return x, n


@functools.partial(jax.jit, static_argnames=("chunk",))
def nearest_neighbor(query, ref, chunk: int = 2048):
    """For every query point, its nearest reference point.

    Args:
        query: [N, 3] points.
        ref: [M, 3] points.
    Returns:
        (dist [N], idx [N]) — Euclidean distance and index into ref.
    """
    query = query.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    q_padded, n = _pad_rows(query, chunk)
    ref_sq = jnp.sum(ref * ref, axis=-1)  # [M]

    def body(q_chunk):
        q_sq = jnp.sum(q_chunk * q_chunk, axis=-1, keepdims=True)  # [C,1]
        d2 = q_sq + ref_sq[None, :] - 2.0 * (q_chunk @ ref.T)
        d2 = jnp.maximum(d2, 0.0)
        idx = jnp.argmin(d2, axis=-1)
        dist = jnp.sqrt(jnp.take_along_axis(d2, idx[:, None], axis=-1)[:, 0])
        return dist, idx

    chunks = q_padded.reshape(-1, chunk, 3)
    dist, idx = jax.lax.map(body, chunks)
    return dist.reshape(-1)[:n], idx.reshape(-1)[:n]


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn(query, ref, k: int, chunk: int = 1024):
    """k nearest reference points for every query point.

    Returns:
        (dists [N, k], idx [N, k]) sorted ascending by distance.
    """
    query = query.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    # fewer reference points than requested neighbors (sparsely-valid clips,
    # tiny downsample_num): return every point and pad the remaining columns
    # by repeating the farthest neighbor instead of letting top_k raise
    k_eff = min(k, ref.shape[0])
    q_padded, n = _pad_rows(query, chunk)
    ref_sq = jnp.sum(ref * ref, axis=-1)

    def body(q_chunk):
        q_sq = jnp.sum(q_chunk * q_chunk, axis=-1, keepdims=True)
        d2 = q_sq + ref_sq[None, :] - 2.0 * (q_chunk @ ref.T)
        d2 = jnp.maximum(d2, 0.0)
        neg_d2, idx = jax.lax.top_k(-d2, k_eff)
        return jnp.sqrt(-neg_d2), idx

    chunks = q_padded.reshape(-1, chunk, 3)
    dists, idx = jax.lax.map(body, chunks)
    dists = dists.reshape(-1, k_eff)[:n]
    idx = idx.reshape(-1, k_eff)[:n]
    if k_eff < k:
        pad = k - k_eff
        dists = jnp.concatenate([dists, jnp.repeat(dists[:, -1:], pad, 1)], 1)
        idx = jnp.concatenate([idx, jnp.repeat(idx[:, -1:], pad, 1)], 1)
    return dists, idx
