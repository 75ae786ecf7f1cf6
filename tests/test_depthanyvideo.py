"""DepthAnyVideo: hierarchical keyframe -> interpolation inference."""

import numpy as np
import pytest

from unigeo_tpu.data.synthetic import SyntheticBoxDataset
from unigeo_tpu.models.chronodepth import tiny_chronodepth
from unigeo_tpu.models.depthanyvideo import DepthAnyVideo


@pytest.fixture(scope="module")
def pipe():
    return tiny_chronodepth(height=64, width=64, num_frames=4)


@pytest.fixture(scope="module")
def clip6():
    ds = SyntheticBoxDataset(
        clip_length=6, clip_overlap=0, num_scenes=1, frames_per_scene=6,
        render_size=(64, 64),
    )
    return ds[0]


def test_keyframe_indices():
    m = DepthAnyVideo(_pipeline=object(), keyframe_gap=3)
    np.testing.assert_array_equal(m.keyframe_indices(7), [0, 3, 6])
    np.testing.assert_array_equal(m.keyframe_indices(8), [0, 3, 6, 7])
    np.testing.assert_array_equal(m.keyframe_indices(2), [0, 1])


def test_dav_contract_hierarchical(pipe, clip6):
    model = DepthAnyVideo(_pipeline=pipe, num_inference_steps=2,
                          keyframe_gap=2)
    out = model.forward(clip6)
    assert set(out) == {"pred_depths", "pred_normals"}
    assert out["pred_depths"].shape == (6, 64, 64)
    assert (out["pred_depths"] > 0).all()
    assert np.isfinite(out["pred_depths"]).all()
    assert np.isfinite(out["pred_normals"]).all()


def test_dav_single_level_when_gap_1(pipe, clip6):
    """keyframe_gap=1: every frame is a key frame, phase 2 is skipped and
    the result equals a plain denoise of the whole clip."""
    import jax
    import jax.numpy as jnp

    model = DepthAnyVideo(_pipeline=pipe, num_inference_steps=2,
                          keyframe_gap=1, seed=42)
    out = model.forward(clip6)

    frames = np.moveaxis(np.asarray(clip6["images"]), 1, -1).astype(np.float32) / 255.0
    rng = jax.random.PRNGKey(42)
    cond, ctx = pipe._encode_stage(pipe.params, jnp.asarray(frames), None)
    noise = jax.random.normal(jax.random.fold_in(rng, 0),
                              (6, 8, 8, 4), jnp.float32)
    lat = pipe._denoise_stage(pipe.params, cond, ctx, noise, 2)
    dec = (jnp.asarray(pipe._decode_stage(pipe.params, lat)) + 1.0) / 2.0
    ref_depth = np.clip(np.mean(np.asarray(dec), axis=-1), 1e-3, None)
    np.testing.assert_allclose(out["pred_depths"], ref_depth, atol=1e-5)


def test_dav_registered():
    from unigeo_tpu.registry import get_model_cls

    assert get_model_cls("DepthAnyVideo") is DepthAnyVideo
