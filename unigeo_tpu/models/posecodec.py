"""Pose encodings: 7-DoF absT_quaR codec + NeRF harmonic embedding.

absT_quaR: [tx ty tz qw qx qy qz] ↔ 4×4 c2w (reference:
metrics/camera.py:273-348 — the encoding CUT3R's pose head emits, decoded
by the adapter at model/cut3r.py:64-68).

HarmonicEmbedding / PoseEmbedding: the NeRF positional encoding the
reference carries for pose-conditioned training heads (reference:
metrics/camera.py:13-194, pytorch3d lineage).  Unused by the eval path but
part of the component inventory; torch-golden-tested.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from unigeo_tpu.metrics.camera import matrix_to_quaternion, quaternion_to_matrix


def camera_to_pose_encoding(c2w):
    """[..., 4, 4] → [..., 7] (absT_quaR)."""
    t = c2w[..., :3, 3]
    q = matrix_to_quaternion(c2w[..., :3, :3])
    return jnp.concatenate([t, q], axis=-1)


def pose_encoding_to_camera(enc):
    """[..., 7] (absT_quaR) → [..., 4, 4] camera-to-world."""
    t = enc[..., :3]
    R = quaternion_to_matrix(enc[..., 3:7])
    batch = enc.shape[:-1]
    eye = jnp.broadcast_to(jnp.eye(4), batch + (4, 4))
    out = eye.at[..., :3, :3].set(R).at[..., :3, 3].set(t)
    return out


# ---------------------------------------------------------------------------
# NeRF harmonic embedding (reference: metrics/camera.py:13-194)
# ---------------------------------------------------------------------------


def harmonic_frequencies(
    n_harmonic_functions: int = 6, omega_0: float = 1.0, logspace: bool = True
) -> jnp.ndarray:
    """[N] frequencies: powers of 2 (logspace) or linspace(1, 2^(N-1))."""
    if logspace:
        freqs = 2.0 ** jnp.arange(n_harmonic_functions, dtype=jnp.float32)
    else:
        freqs = jnp.linspace(
            1.0, 2.0 ** (n_harmonic_functions - 1), n_harmonic_functions,
            dtype=jnp.float32,
        )
    return freqs * omega_0


def harmonic_embedding(
    x: jnp.ndarray,
    n_harmonic_functions: int = 6,
    omega_0: float = 1.0,
    logspace: bool = True,
    append_input: bool = True,
    diag_cov: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """NeRF / MIP-NeRF positional encoding of ``x`` [..., dim].

    Output [..., dim·(2N + append_input)], laid out EXACTLY like the
    reference module (metrics/camera.py:137-152): sin-phase block first
    ([sin(f₁x₁)..sin(f_N x₁), sin(f₁x₂)…]), then the cos-phase block, then
    (optionally) the raw input.  ``diag_cov`` enables the MIP-NeRF
    integrated encoding: each harmonic is damped by exp(-0.5·f²·cov).
    """
    freqs = harmonic_frequencies(n_harmonic_functions, omega_0, logspace)
    embed = x[..., None] * freqs  # [..., dim, N]
    phases = jnp.asarray([0.0, 0.5 * jnp.pi], x.dtype)
    embed = jnp.sin(embed[..., None, :, :] + phases[:, None, None])  # [..,2,dim,N]
    if diag_cov is not None:
        damp = jnp.exp(-0.5 * diag_cov[..., None] * freqs**2)  # [..., dim, N]
        embed = embed * damp[..., None, :, :]
    embed = embed.reshape(*x.shape[:-1], -1)
    if append_input:
        return jnp.concatenate([embed, x], axis=-1)
    return embed


def harmonic_embedding_dim(
    input_dims: int, n_harmonic_functions: int, append_input: bool = True
) -> int:
    """Output width of harmonic_embedding (reference :154-169)."""
    return input_dims * (2 * n_harmonic_functions + int(append_input))


class PoseEmbedding:
    """Harmonic embedding of an absT_quaR pose encoding (reference
    :182-194): target_dim-wide poses → out_dim-wide features."""

    def __init__(self, target_dim: int, n_harmonic_functions: int = 10,
                 append_input: bool = True):
        self.target_dim = target_dim
        self.n_harmonic_functions = n_harmonic_functions
        self.append_input = append_input
        self.out_dim = harmonic_embedding_dim(
            target_dim, n_harmonic_functions, append_input
        )

    def __call__(self, pose_encoding: jnp.ndarray) -> jnp.ndarray:
        return harmonic_embedding(
            pose_encoding,
            n_harmonic_functions=self.n_harmonic_functions,
            append_input=self.append_input,
        )
