"""VideoDepthAnything-class feed-forward video depth: contract, temporal
mixing, eval-pipeline integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigeo_tpu.data.synthetic import SyntheticBoxDataset
from unigeo_tpu.models.vda import VDANetwork, VideoDepthAnything, tiny_vda_config


@pytest.fixture(scope="module")
def clip():
    ds = SyntheticBoxDataset(
        clip_length=2, clip_overlap=0, num_scenes=1, frames_per_scene=2,
        render_size=(64, 64),
    )
    return ds[0]


def test_vda_contract(clip):
    model = VideoDepthAnything(
        network_config=tiny_vda_config(),
        init_height=64, init_width=64, init_frames=2,
    )
    out = model.forward(clip)
    assert set(out) == {"pred_depths", "pred_normals"}  # depth-model family
    assert out["pred_depths"].shape == (2, 64, 64)
    assert (out["pred_depths"] > 0).all()  # 1/(x+0.1) ∈ (10/11, 10]
    assert out["pred_depths"].max() <= 10.0 + 1e-5
    assert out["pred_normals"].shape == (2, 64, 64, 3)
    norms = np.linalg.norm(out["pred_normals"], axis=-1)
    assert np.allclose(norms, 1.0, atol=1e-3)
    for key in out:
        assert np.isfinite(out[key]).all(), key


def test_vda_temporal_module_mixes_frames():
    """Perturbing frame 1 must change frame 0's disparity — the temporal
    attention blocks couple frames (a per-frame model would not)."""
    net = VDANetwork(**tiny_vda_config())
    rng = np.random.default_rng(0)
    frames = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(frames))
    d0 = np.asarray(net.apply(params, jnp.asarray(frames)))
    frames2 = frames.copy()
    frames2[1] = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    d1 = np.asarray(net.apply(params, jnp.asarray(frames2)))
    assert not np.allclose(d0[0], d1[0], atol=1e-6)


def test_vda_odd_patch_resizes_to_input_grid():
    """patch 14 (the DINOv2 default) does not tile 64 — the head output
    must still land on the input pixel grid."""
    cfg = dict(tiny_vda_config(), patch_size=14)
    net = VDANetwork(**cfg)
    frames = jnp.zeros((2, 64, 64, 3))
    params = net.init(jax.random.PRNGKey(0), frames)
    disp = net.apply(params, frames)
    assert disp.shape == (2, 64, 64)


def test_vda_through_eval_pipeline(clip):
    from unigeo_tpu.config import EvalConfig
    from unigeo_tpu.data.sample import prepare_gt_label
    from unigeo_tpu.evaluator import evaluate_clip

    cfg = EvalConfig.from_dict(
        {
            "dataset": "SyntheticBoxDataset",
            "model_name": "VideoDepthAnything",
            "h": 64, "w": 64,
            "eval_depth": {"metric_names": ["Abs Rel", "delta < 1.25"],
                           "depth_alignment": "lstsq"},
            "eval_normal": {"metric_names": ["normal mean"]},
        }
    )
    model = VideoDepthAnything(
        network_config=tiny_vda_config(),
        init_height=64, init_width=64, init_frames=2,
    )
    out = model.forward(clip)
    gt = prepare_gt_label(clip)
    metric = evaluate_clip(cfg, out, gt)
    for name in ("Abs Rel", "delta < 1.25", "normal mean"):
        assert name in metric
        assert np.isfinite(metric[name])


def test_vda_registered():
    from unigeo_tpu.registry import get_model_cls

    assert get_model_cls("VideoDepthAnything") is VideoDepthAnything


def test_vda_odd_token_grid_production_shape():
    """384×512 with DINOv2 patch 14 → 27×36 token grid: the DPT pyramid's
    stride-2 down + ×2 up lands on 28 rows vs the 27-row skip.  The fusion
    block must resize to the skip's grid (caught live by tools/bench_zoo.py
    round 5 — the production vda_scannetpp.yaml config crashed)."""
    model = VideoDepthAnything(
        network_config=dict(width=64, depth=4, num_heads=2,
                            temporal_heads=2, patch_size=14),
        init_height=384, init_width=512, init_frames=2,
    )
    K = np.array([[460.0, 0, 256], [0, 460.0, 192], [0, 0, 1]], np.float32)
    data = {
        "images": np.random.default_rng(0).uniform(
            0, 255, (2, 3, 384, 512)).astype(np.float32),
        "intrinsics": np.stack([K] * 2),
        "scene_name": "t", "keyview_idx": 0,
    }
    out = model.forward(data)
    assert out["pred_depths"].shape == (2, 384, 512)
    assert out["pred_normals"].shape == (2, 384, 512, 3)
    for v in out.values():
        assert np.isfinite(v).all()
