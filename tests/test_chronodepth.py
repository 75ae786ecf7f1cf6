"""ChronoDepth: known-frame-conditioned denoise correctness + adapter
contract + sequential-window consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigeo_tpu.data.synthetic import SyntheticBoxDataset
from unigeo_tpu.models.chronodepth import ChronoDepth, tiny_chronodepth


@pytest.fixture(scope="module")
def pipe():
    return tiny_chronodepth(height=64, width=64, num_frames=4)


@pytest.fixture(scope="module")
def clip():
    ds = SyntheticBoxDataset(
        clip_length=4, clip_overlap=0, num_scenes=1, frames_per_scene=4,
        render_size=(64, 64),
    )
    return ds[0]


def _stage_inputs(pipe, rng_seed=0):
    t, h, w = 4, 64, 64
    rng = jax.random.PRNGKey(rng_seed)
    frames = jax.random.uniform(rng, (t, h, w, 3))
    cond, ctx = pipe._encode_stage(pipe.params, frames, None)
    noise = jax.random.normal(jax.random.fold_in(rng, 1),
                              (t, h // 8, w // 8, 4), jnp.float32)
    return cond, ctx, noise


def test_zero_mask_reduces_to_plain_denoise(pipe):
    """mask = 0 everywhere ⇒ the conditioned loop IS the parent euler loop."""
    cond, ctx, noise = _stage_inputs(pipe)
    known = jnp.zeros_like(noise)
    mask = jnp.zeros((noise.shape[0],))
    x_known = pipe._denoise_stage_known(
        pipe.params, cond, ctx, noise, known, mask, 3
    )
    x_plain = pipe._denoise_stage(pipe.params, cond, ctx, noise, 3)
    np.testing.assert_allclose(
        np.asarray(x_known), np.asarray(x_plain), atol=1e-5
    )


def test_full_mask_returns_known_exactly(pipe):
    """mask = 1 for a frame ⇒ that frame's output latent == known latent
    (σ = 0 at the end of the schedule)."""
    cond, ctx, noise = _stage_inputs(pipe)
    known = jax.random.normal(jax.random.PRNGKey(7), noise.shape, jnp.float32)
    mask = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    x = np.asarray(pipe._denoise_stage_known(
        pipe.params, cond, ctx, noise, known, mask, 3
    ))
    np.testing.assert_allclose(x[:2], np.asarray(known)[:2], atol=1e-6)
    # unconditioned frames are NOT the known latents
    assert not np.allclose(x[2:], np.asarray(known)[2:], atol=1e-3)


def test_conditioning_influences_fresh_frames(pipe):
    """The clamped frames flow through the UNet's temporal attention, so
    changing them must change the FRESH frames' result."""
    cond, ctx, noise = _stage_inputs(pipe)
    mask = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    k1 = jnp.zeros_like(noise)
    k2 = k1.at[0].set(1.0)
    x1 = np.asarray(pipe._denoise_stage_known(
        pipe.params, cond, ctx, noise, k1, mask, 3
    ))
    x2 = np.asarray(pipe._denoise_stage_known(
        pipe.params, cond, ctx, noise, k2, mask, 3
    ))
    assert not np.allclose(x1[1:], x2[1:], atol=1e-6)


def test_chronodepth_adapter_contract(pipe, clip):
    model = ChronoDepth(_pipeline=pipe, num_inference_steps=2)
    out = model.forward(clip)
    assert set(out) == {"pred_depths", "pred_normals"}
    assert out["pred_depths"].shape == (4, 64, 64)
    assert (out["pred_depths"] > 0).all()
    assert np.isfinite(out["pred_depths"]).all()
    assert np.isfinite(out["pred_normals"]).all()
    norms = np.linalg.norm(out["pred_normals"], axis=-1)
    assert np.allclose(norms, 1.0, atol=1e-3)


def test_chronodepth_sequential_windows(pipe, clip):
    """window < clip ⇒ sequential conditioned windows still cover every
    frame and stay finite; overlap frames keep the first window's latents
    (they are clamped, not re-predicted)."""
    model = ChronoDepth(
        _pipeline=pipe, num_inference_steps=2, window_size=4, overlap=2,
    )
    ds = SyntheticBoxDataset(
        clip_length=6, clip_overlap=0, num_scenes=1, frames_per_scene=6,
        render_size=(64, 64),
    )
    out = model.forward(ds[0])
    assert out["pred_depths"].shape == (6, 64, 64)
    assert np.isfinite(out["pred_depths"]).all()


def test_chronodepth_registered():
    from unigeo_tpu.registry import get_model_cls

    assert get_model_cls("ChronoDepth") is ChronoDepth
