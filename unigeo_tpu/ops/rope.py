"""2D rotary position embeddings (RoPE) for the pointmap backbones.

The CroCo/DUSt3R-lineage networks the reference wraps (reference:
model/spann3r.py:16-21, model/cut3r.py:18-26) embed patch positions with a
2D RoPE ("RoPE100"): each attention head's channel dim D is split in two
halves; the first half is rotated by the token's y coordinate, the second by
its x coordinate, each as a standard 1D RoPE with base frequency 100 and
non-interleaved (rotate-half) pairing.

Conventions (must match the torch originals for weight parity — verified in
tests/test_rope_parity.py against a torch reimplementation):
  * per axis-half of size Dh, inv_freq[j] = freq^(-2j/Dh) for j < Dh/2,
    duplicated to fill Dh: angles = [p·f0, p·f1, ..., p·f0, p·f1, ...]
  * rotate_half(u) = concat(-u[Dh/2:], u[:Dh/2])
  * out = u·cos + rotate_half(u)·sin   (per half, then halves concatenated)
  * positions < 0 mark tokens without a grid position (e.g. CUT3R state
    tokens): identity (cos=1, sin=0).
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_positions(gh: int, gw: int) -> jnp.ndarray:
    """Patch-grid (y, x) integer positions, row-major → [gh*gw, 2] int32."""
    ys, xs = jnp.meshgrid(jnp.arange(gh), jnp.arange(gw), indexing="ij")
    return jnp.stack([ys.reshape(-1), xs.reshape(-1)], axis=-1).astype(jnp.int32)


def rope_2d_cos_sin(head_dim: int, positions: jnp.ndarray, freq: float = 100.0,
                    dtype=jnp.float32):
    """positions [..., 2] (y, x) → (cos, sin), each [..., head_dim].

    Computed in f32 (angle precision), cast to ``dtype`` at the end.
    """
    d_half = head_dim // 2
    assert head_dim % 2 == 0 and d_half % 2 == 0, "head_dim must be mult of 4"
    inv = 1.0 / freq ** (
        jnp.arange(0, d_half, 2, dtype=jnp.float32) / d_half
    )  # [d_half/2]

    def cs(pos1d):
        f = pos1d.astype(jnp.float32)[..., None] * inv  # [..., d_half/2]
        f = jnp.concatenate([f, f], axis=-1)  # [..., d_half]
        valid = (pos1d >= 0)[..., None]  # per-axis: pos<0 → identity
        cos = jnp.where(valid, jnp.cos(f), 1.0)
        sin = jnp.where(valid, jnp.sin(f), 0.0)
        return cos, sin

    cy, sy = cs(positions[..., 0])
    cx, sx = cs(positions[..., 1])
    cos = jnp.concatenate([cy, cx], axis=-1).astype(dtype)
    sin = jnp.concatenate([sy, sx], axis=-1).astype(dtype)
    return cos, sin


def apply_rope_2d(t: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """Rotate t [..., S, H, D] by (cos, sin) [..., S, D] (broadcast over H)."""
    d = t.shape[-1]
    dh = d // 2

    def rotate_half(u):
        a, b = u[..., : u.shape[-1] // 2], u[..., u.shape[-1] // 2 :]
        return jnp.concatenate([-b, a], axis=-1)

    rotated = jnp.concatenate(
        [rotate_half(t[..., :dh]), rotate_half(t[..., dh:])], axis=-1
    )
    return t * cos[..., None, :] + rotated * sin[..., None, :]
