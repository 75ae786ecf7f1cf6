"""Tests for train-time augmentations and batch collation."""

import numpy as np
import pytest

from unigeo_tpu.data.augmentations import (
    ColorJitter,
    Eraser,
    MaskDepth,
    NormalizeImagesToMinMax,
    NormalizeIntrinsics,
    Scale3DFixed,
    SpatialAugmentation,
)
from unigeo_tpu.data.collate import (
    collate_clips,
    index_batched,
    seed_everything,
    uncollate_clips,
)
from unigeo_tpu.data.synthetic import SyntheticBoxDataset


@pytest.fixture(scope="module")
def clip():
    ds = SyntheticBoxDataset(
        clip_length=3, clip_overlap=0, num_scenes=1, frames_per_scene=3,
        render_size=(64, 80),
    )
    return ds[0]


def _copy(sample):
    return {k: (v.copy() if isinstance(v, np.ndarray) else v) for k, v in sample.items()}


def test_spatial_augmentation_shapes_and_intrinsics(clip):
    rng = np.random.default_rng(3)
    aug = SpatialAugmentation(size=(48, 64), p=1.0, stretch_p=1.0, rng=rng)
    out = aug(_copy(clip))
    assert out["images"].shape == (3, 3, 48, 64)
    assert out["mask"].shape == (3, 48, 64)
    assert out["cam_coord"].shape == (3, 3, 48, 64)
    # principal point moved consistently with the crop (cx < scaled width)
    assert np.isfinite(out["intrinsics"]).all()


def test_spatial_augmentation_no_aug_path_center_crops(clip):
    aug = SpatialAugmentation(size=(48, 64), p=0.0)
    out = aug(_copy(clip))
    assert out["images"].shape == (3, 3, 48, 64)


def test_color_jitter_bounds(clip):
    out = ColorJitter(rng=np.random.default_rng(0))(_copy(clip))
    assert out["images"].min() >= 0.0 and out["images"].max() <= 255.0
    assert not np.allclose(out["images"], clip["images"])


def test_normalize_to_minmax(clip):
    out = NormalizeImagesToMinMax(-1, 1)(_copy(clip))
    assert -1.0 <= out["images"].min() and out["images"].max() <= 1.0


def test_eraser_changes_pixels(clip):
    out = Eraser(p=1.0, rng=np.random.default_rng(0))(_copy(clip))
    assert not np.array_equal(out["images"], clip["images"])


def test_scale3d_scales_metric_quantities(clip):
    out = Scale3DFixed(2.0)(_copy(clip))
    assert np.allclose(out["cam_coord"], clip["cam_coord"] * 2.0)
    assert np.allclose(out["extrinsics"][:, :3, 3], clip["extrinsics"][:, :3, 3] * 2.0)
    assert np.allclose(out["extrinsics"][:, :3, :3], clip["extrinsics"][:, :3, :3])


def test_mask_depth(clip):
    out = MaskDepth(0.5, 1.2)(_copy(clip))
    depth = -out["cam_coord"][:, 2]
    valid = out["mask"] > 0
    assert (depth[valid] >= 0.5).all() and (depth[valid] <= 1.2 + 1e-6).all()


def test_normalize_intrinsics(clip):
    out = NormalizeIntrinsics()(_copy(clip))
    h, w = clip["images"].shape[-2:]
    assert np.allclose(out["intrinsics"][:, 0, 0], clip["intrinsics"][:, 0, 0] / w)
    assert np.allclose(out["intrinsics"][:, 1, 2], clip["intrinsics"][:, 1, 2] / h)


def test_collate_roundtrip(clip):
    batch = collate_clips([clip, clip])
    assert batch["images"].shape[0] == 2
    assert batch["scene_name"] == [clip["scene_name"]] * 2
    clips = uncollate_clips(batch)
    assert len(clips) == 2
    assert np.array_equal(clips[0]["images"], clip["images"])

    sub = index_batched(batch, [1])
    assert sub["images"].shape[0] == 1


def test_seed_everything_deterministic():
    g1 = seed_everything(7)
    a = g1.normal(size=3)
    g2 = seed_everything(7)
    b = g2.normal(size=3)
    assert np.array_equal(a, b)
