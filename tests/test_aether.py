"""Aether: adaLN-zero/flow-matching correctness, causal VAE causality,
raymap camera recovery, and the adapter contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigeo_tpu.models.aether import (
    AetherDiT,
    CausalVAE3D,
    interpolate_poses,
    pose_from_raymap,
    raymap_from_pose,
    tiny_aether,
)


@pytest.fixture(scope="module")
def model():
    return tiny_aether(height=64, width=64, frames=6, num_steps=2)


def _random_pose(seed):
    rng = np.random.RandomState(seed)
    from unigeo_tpu.metrics.camera import quaternion_to_matrix

    q = rng.randn(4)
    q /= np.linalg.norm(q)
    c2w = np.eye(4)
    c2w[:3, :3] = np.asarray(quaternion_to_matrix(jnp.asarray(q)))
    c2w[:3, 3] = rng.randn(3)
    return c2w


def test_dit_is_zero_at_init():
    """adaLN-zero: gates and the final projection are zero-initialised, so
    the velocity network is exactly 0 at init (identity flow)."""
    dit = AetherDiT(out_channels=5, width=32, depth=2, num_heads=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 8, 8, 9))
    params = dit.init(jax.random.PRNGKey(1), x, jnp.float32(1.0))
    out = dit.apply(params, x, jnp.float32(0.7))
    assert out.shape == (3, 8, 8, 5)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_flow_sampler_exact_for_true_velocity(model):
    """Rectified flow has CONSTANT velocity v = eps - x0 along each path,
    so Euler integration with the true velocity recovers x0 exactly from
    pure noise in any number of steps."""
    x0 = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 4, 3))
    eps = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 3))

    class TrueV:
        def apply(self, params, x_and_cond, t):
            return eps - x0

    m = tiny_aether(height=32, width=32, frames=2, num_steps=1)
    m.dit = TrueV()
    for steps in (1, 4):
        out = m._flow_sample(None, jnp.zeros((2, 4, 4, 0)), eps, steps)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0),
                                   atol=1e-5)


def test_vae_causality(model):
    """Causal convs pad on the past only: a clip prefix encodes to the
    prefix of the full encoding, and changing the LAST frame leaves all
    earlier latent frames untouched."""
    vae, params = model.vae, model.vae_params
    frames = jax.random.normal(jax.random.PRNGKey(4), (6, 64, 64, 3))
    enc = lambda f: vae.apply(params, f, method=CausalVAE3D.encode)
    full = np.asarray(enc(frames))

    prefix = np.asarray(enc(frames[:4]))  # ct = 2 → 2 latent frames
    np.testing.assert_allclose(prefix, full[:2], atol=1e-5)

    bumped = frames.at[-1].add(10.0)
    full2 = np.asarray(enc(bumped))
    np.testing.assert_allclose(full2[:2], full[:2], atol=1e-5)
    assert np.abs(full2[2:] - full[2:]).max() > 1e-3


def test_vae_shapes_roundtrip(model):
    vae, params = model.vae, model.vae_params
    frames = jax.random.normal(jax.random.PRNGKey(5), (4, 64, 64, 3))
    z = vae.apply(params, frames, method=CausalVAE3D.encode)
    assert z.shape == (4 // vae.ct, 64 // vae.cs, 64 // vae.cs,
                       vae.z_channels)
    rec = vae.apply(params, z, method=CausalVAE3D.decode)
    assert rec.shape == frames.shape


def test_fused_upsample_matches_plain(model):
    """Fused lhs-dilated decode == resize+conv decode with the SAME params
    (the fusion is a kernel-transform identity, not an approximation)."""
    vae = model.vae
    plain = CausalVAE3D(
        base_width=vae.base_width, mults=vae.mults,
        temporal_down=vae.temporal_down, z_channels=vae.z_channels,
        fused_upsample=False)
    z = jax.random.normal(jax.random.PRNGKey(7),
                          (2, 8, 8, vae.z_channels))
    fused = vae.apply(model.vae_params, z, method=CausalVAE3D.decode)
    ref = plain.apply(model.vae_params, z, method=CausalVAE3D.decode)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=2e-5)


def test_raymap_pose_recovery_exact():
    """pose → raymap → pose is closed-form exact (Kabsch on directions +
    mean origin)."""
    K = jnp.asarray([[50.0, 0, 16], [0, 50.0, 12], [0, 0, 1]])
    for seed in range(3):
        c2w = _random_pose(seed)
        rm = raymap_from_pose(jnp.asarray(c2w), K, 24, 32)
        rec = np.asarray(pose_from_raymap(rm, K))
        np.testing.assert_allclose(rec, c2w, atol=1e-5)


def test_interpolate_poses_endpoints_and_midpoint():
    p0, p1 = np.eye(4), _random_pose(7)
    out = interpolate_poses(np.stack([p0, p1]), [0.0, 4.0], [0.0, 2.0, 4.0])
    np.testing.assert_allclose(out[0], p0, atol=1e-6)
    np.testing.assert_allclose(out[2], p1, atol=1e-6)
    mid = out[1]
    # valid rotation, translation at the linear midpoint
    np.testing.assert_allclose(mid[:3, :3] @ mid[:3, :3].T, np.eye(3),
                               atol=1e-6)
    np.testing.assert_allclose(mid[:3, 3], p1[:3, 3] / 2, atol=1e-6)


def test_adapter_contract(model):
    """All four prediction families, right shapes, finite, frame 0 = world."""
    rng = np.random.RandomState(0)
    t, h, w = 6, 64, 64
    data = {
        "images": rng.randint(0, 255, (t, 3, h, w)).astype(np.uint8),
        "intrinsics": np.stack(
            [np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]])] * t),
    }
    out = model.forward(data)
    assert out["pred_depths"].shape == (t, h, w)
    assert out["pred_normals"].shape == (t, h, w, 3)
    assert out["pred_poses"].shape == (t, 4, 4)
    assert out["pred_world_pts"].shape == (t, h, w, 3)
    for v in out.values():
        assert np.isfinite(v).all()
    np.testing.assert_allclose(out["pred_poses"][0], np.eye(4), atol=1e-5)
    # world pts of frame 0 = its own backprojection (identity pose)
    from unigeo_tpu.ops.backproject import backproject_to_cv_position

    pts0 = backproject_to_cv_position(
        out["pred_depths"][0], np.asarray(data["intrinsics"][0]))
    np.testing.assert_allclose(out["pred_world_pts"][0], pts0, atol=1e-4)


def test_flow_sample_context_parallel_matches_serial(model):
    """sp-sharded flow sampling == single-device sampling (the DiT's token
    sequence is the latent frame axis × spatial patches; XLA inserts the
    K/V all-gathers).  Tolerance: f32 reduction-order noise only."""
    from unigeo_tpu.parallel.context import flow_sample_context_parallel
    from unigeo_tpu.parallel.mesh import make_mesh

    tl, hl, wl = 4, 8, 8  # tl divisible by sp=4
    rng = jax.random.PRNGKey(6)
    cond = jax.random.normal(rng, (tl, hl, wl, model.vae.z_channels))
    noise = jax.random.normal(jax.random.fold_in(rng, 1),
                              (tl, hl, wl, model.target_channels))
    serial = np.asarray(model._sample(model.dit_params, cond, noise, steps=2))
    mesh = make_mesh(4, shape=(1, 4, 1))
    sharded = np.asarray(flow_sample_context_parallel(
        model, model.dit_params, cond, noise, 2, mesh))
    np.testing.assert_allclose(sharded, serial, atol=2e-4)


def test_adapter_odd_frame_count(model):
    """T not divisible by the temporal compression: left-pad + crop is
    exact (no frame lost, no pad leak into outputs)."""
    rng = np.random.RandomState(1)
    t = 5  # ct = 2 → pad = 1
    data = {
        "images": rng.randint(0, 255, (t, 3, 64, 64)).astype(np.uint8),
        "intrinsics": np.stack(
            [np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]])] * t),
    }
    out = model.forward(data)
    assert out["pred_depths"].shape[0] == t
    assert out["pred_poses"].shape[0] == t
    assert np.isfinite(out["pred_depths"]).all()
