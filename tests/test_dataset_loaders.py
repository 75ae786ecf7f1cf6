"""Loader tests against fabricated on-disk datasets in each real format.

Fixture builders (tests/fixtures_loaders.py) write a miniature dataset to
tmp_path in the exact directory layout/file format the reference consumes,
generated from the synthetic box scene so GT geometry is known — then each
test asserts the loader reproduces the unified sample contract with
consistent world geometry.  tests/test_loader_goldens.py additionally pins
the emitted arrays against committed fingerprints.
"""

import numpy as np

from unigeo_tpu import coords
from unigeo_tpu.data.sample import validate_sample

from fixtures_loaders import (
    H,
    W,
    K,
    build_bonn,
    build_neuralrgbd,
    build_replica,
    build_scannetpp,
    build_scannetv2,
    build_seven_scenes,
    frames,
)


def _check(ds, expect_len=None):
    if expect_len is not None:
        assert len(ds) == expect_len
    data = ds[0]
    validate_sample(data)
    assert np.allclose(data["extrinsics"][0], np.eye(4), atol=1e-4)
    assert data["mask"].mean() > 0.8
    return data


# ---------------------------------------------------------------------------

def test_seven_scenes_format(tmp_path):
    ds = build_seven_scenes(str(tmp_path / "7scenes"), str(tmp_path / "cache"))
    # loader uses the fixed 7-Scenes K=(525,320,240) — our fixture uses a
    # different K, so only structural checks apply
    data = ds[0]
    validate_sample(data)
    assert data["images"].shape == (4, 3, H, W)
    assert np.allclose(data["extrinsics"][0], np.eye(4), atol=1e-4)


def test_replica_format(tmp_path):
    ds = build_replica(str(tmp_path / "replica"), str(tmp_path / "cache"))
    # frame_gap=3 → 4 frames become 2, one 2-frame clip
    data = _check(ds, expect_len=1)
    # replica poses skip GL/CV conjugation: extrinsics should match renders
    fr = frames()
    expect_rel = coords.rebase_to_keyview(np.stack([fr[0][0], fr[3][0]]), 0)
    assert np.allclose(data["extrinsics"], expect_rel, atol=1e-3)


def test_bonn_format(tmp_path):
    ds = build_bonn(str(tmp_path / "bonn"), str(tmp_path / "cache"))
    data = ds[0]
    validate_sample(data)
    # extrinsics rebased from TUM c2w must match the render poses
    expect = coords.rebase_to_keyview(np.stack([f[0] for f in frames()]), 0)
    assert np.allclose(data["extrinsics"], expect, atol=1e-3)


def test_scannetv2_format(tmp_path):
    from unigeo_tpu.data.synthetic import render_box_frame

    ds = build_scannetv2(str(tmp_path / "scannetv2"), str(tmp_path / "cache"))
    data = _check(ds)  # gap 2: frames 0, 2
    depth_rt = -data["cam_coord"][:, 2]
    _, d0, _ = render_box_frame(frames()[0][0], K, H, W)[0:3]
    assert np.allclose(depth_rt[0], np.round(d0 * 1000) / 1000, atol=2e-3)


def test_scannetpp_format(tmp_path):
    ds = build_scannetpp(str(tmp_path / "scannetpp"), str(tmp_path / "cache"))
    # gap 3 → frames 0 and 3 survive; 2 frames → 1 clip of 2
    data = _check(ds, expect_len=1)
    # native normal maps round-trip through the webp encoding
    nrm = data["cam_normal"][0]
    golden = frames()[0][3]
    valid = data["mask"][0] > 0
    dots = np.sum(np.moveaxis(nrm, 0, -1) * np.moveaxis(golden, 0, -1), axis=-1)
    assert (dots[valid] > 0.98).mean() > 0.95


def test_neuralrgbd_format(tmp_path):
    ds = build_neuralrgbd(str(tmp_path / "nrgbd"), str(tmp_path / "cache"))
    # gap 3 → frames 0 and 3 survive → one 2-frame clip
    data = _check(ds, expect_len=1)
    fr = frames()
    expect_rel = coords.rebase_to_keyview(np.stack([fr[0][0], fr[3][0]]), 0)
    assert np.allclose(data["extrinsics"], expect_rel, atol=1e-3)
    # depth round-trips the mm png within quantization
    depth_rt = -data["cam_coord"][:, 2]
    valid = data["mask"][0] > 0
    assert np.allclose(
        depth_rt[0][valid], np.round(fr[0][1 + 1] * 1000)[valid] / 1000,
        atol=2e-3,
    )


def test_neuralrgbd_nan_pose_filtering(tmp_path):
    """A 'nan' pose row drops that frame entirely (reference
    neuralRGBD.py:83-103): frame 3 poisoned → surviving gap-3 subsample is
    frame 0 only → padded clip."""
    ds_clean = build_neuralrgbd(
        str(tmp_path / "clean"), str(tmp_path / "cache1")
    )
    ds_nan = build_neuralrgbd(
        str(tmp_path / "poisoned"), str(tmp_path / "cache2"), nan_frame=3
    )
    clean = ds_clean[0]
    poisoned = ds_nan[0]
    validate_sample(poisoned)
    # frame 3 gone: the clip pads by repeating the last valid frame
    assert not np.allclose(clean["extrinsics"][1], np.eye(4), atol=1e-6)
    assert np.allclose(poisoned["extrinsics"][1], poisoned["extrinsics"][0])


# --- checklist datasets the reference declares but never shipped loaders for
#     (dataset/Readme.md:3,10,12) -----------------------------------------

def test_tumrgbd_format(tmp_path):
    from fixtures_loaders import build_tumrgbd

    ds = build_tumrgbd(str(tmp_path / "tum"), str(tmp_path / "cache"))
    data = ds[0]
    validate_sample(data)
    # frame_gap=3: fixture frames 0 and 3 survive; timestamp association
    # must pair each rgb with its +5 ms depth and +8 ms groundtruth pose
    fr = frames()
    expect = coords.rebase_to_keyview(np.stack([fr[0][0], fr[3][0]]), 0)
    assert np.allclose(data["extrinsics"], expect, atol=1e-3)
    assert data["images"].shape == (2, 3, H, W)


def test_sintel_format(tmp_path):
    from fixtures_loaders import build_sintel
    from unigeo_tpu.data.synthetic import render_box_frame

    ds = build_sintel(str(tmp_path / "sintel"), str(tmp_path / "cache"))
    data = _check(ds, expect_len=1)
    # per-frame .cam intrinsics + extrinsics roundtrip
    expect = coords.rebase_to_keyview(np.stack([f[0] for f in frames()]), 0)
    assert np.allclose(data["extrinsics"], expect, atol=1e-3)
    assert np.allclose(data["intrinsics"][0], K, atol=1e-4)
    # .dpt is float32-lossless: planar depth must match the render exactly
    _, d0, _ = render_box_frame(frames()[0][0], K, H, W)
    depth_rt = -data["cam_coord"][0, 2]
    assert np.allclose(depth_rt, d0, atol=1e-5)


def test_interiornet_format(tmp_path):
    from fixtures_loaders import build_interiornet
    from unigeo_tpu.data.synthetic import render_box_frame

    ds = build_interiornet(str(tmp_path / "interiornet"), str(tmp_path / "cache"))
    data = _check(ds, expect_len=1)
    # look-at ground truth roundtrips through the GL pose builder
    expect = coords.rebase_to_keyview(np.stack([f[0] for f in frames()]), 0)
    assert np.allclose(data["extrinsics"], expect, atol=1e-3)
    # euclidean mm ray lengths → planar z within uint16 quantization
    _, d0, _ = render_box_frame(frames()[0][0], K, H, W)
    depth_rt = -data["cam_coord"][0, 2]
    assert np.allclose(depth_rt, d0, atol=2e-3)


def test_disk_loader_config_roundtrip(tmp_path):
    """save_config must store the REGISTRY name (camelCase for disk
    loaders), or from_config cannot resolve it (regression)."""
    from fixtures_loaders import build_sintel
    from unigeo_tpu.data.base import ClipDataset

    ds = build_sintel(str(tmp_path / "sintel"), str(tmp_path / "cache"))
    cfg_path = str(tmp_path / "ds.json")
    ds.save_config(cfg_path)
    ds2 = ClipDataset.from_config(cfg_path)
    assert type(ds2) is type(ds)
    assert ds2.pass_name == "final" and len(ds2) == len(ds)


def test_vkitti_format(tmp_path):
    from fixtures_loaders import build_vkitti
    from unigeo_tpu.data.synthetic import render_box_frame

    ds = build_vkitti(str(tmp_path / "vkitti"), str(tmp_path / "cache"))
    data = _check(ds, expect_len=1)
    # w2c OpenCV 4x4 rows from extrinsic.txt roundtrip (Camera_1 rows and
    # the header line must be filtered out)
    expect = coords.rebase_to_keyview(np.stack([f[0] for f in frames()]), 0)
    assert np.allclose(data["extrinsics"], expect, atol=1e-4)
    assert np.allclose(data["intrinsics"][0], K, atol=1e-4)
    # centimeter uint16 depth → meters within quantization (the fixture
    # writer truncates, so the error bound is a full centimeter)
    _, d0, _ = render_box_frame(frames()[0][0], K, H, W)
    depth_rt = -data["cam_coord"][0, 2]
    assert np.allclose(depth_rt, d0, atol=1.05e-2)


def test_matrixcity_format(tmp_path):
    from fixtures_loaders import build_matrixcity
    from unigeo_tpu.data.synthetic import render_box_frame

    ds = build_matrixcity(str(tmp_path / "mc"), str(tmp_path / "cache"))
    data = _check(ds, expect_len=1)
    # NeRF/OpenGL c2w poses invert without conjugation (like Replica)
    expect = coords.rebase_to_keyview(np.stack([f[0] for f in frames()]), 0)
    assert np.allclose(data["extrinsics"], expect, atol=1e-4)
    assert np.allclose(data["intrinsics"][0], K, atol=1e-4)
    # float32 EXR depth at the x100 value scale is lossless after /100
    _, d0, _ = render_box_frame(frames()[0][0], K, H, W)
    depth_rt = -data["cam_coord"][0, 2]
    assert np.allclose(depth_rt, d0, atol=1e-5)
