"""Loader tests against fabricated on-disk datasets in each real format.

Each fixture writes a miniature dataset to tmp_path in the exact directory
layout/file format the reference consumes, generated from the synthetic box
scene so GT geometry is known — then asserts the loader reproduces the
unified sample contract with consistent world geometry.
"""

import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from unigeo_tpu import coords
from unigeo_tpu.data.sample import validate_sample
from unigeo_tpu.data.synthetic import render_box_frame, _orbit_pose_gl_w2c
from unigeo_tpu.metrics.camera import matrix_to_quaternion


H, W = 48, 64
K = np.array([[0.9 * W, 0, W / 2], [0, 0.9 * W, H / 2], [0, 0, 1]], np.float32)
N_FRAMES = 4


def _frames():
    out = []
    for i in range(N_FRAMES):
        w2c_gl = _orbit_pose_gl_w2c(i, N_FRAMES)
        rgb, depth, normal = render_box_frame(w2c_gl, K, H, W)
        out.append((w2c_gl, rgb, depth, normal))
    return out


def _save_depth_png(path, depth, scale):
    Image.fromarray((depth * scale).astype(np.uint16)).save(path)


def _save_rgb(path, rgb):
    Image.fromarray(np.moveaxis(rgb, 0, -1).astype(np.uint8)).save(path)


def _check(ds, expect_len=None, depth_atol=2e-2):
    if expect_len is not None:
        assert len(ds) == expect_len
    data = ds[0]
    validate_sample(data)
    assert np.allclose(data["extrinsics"][0], np.eye(4), atol=1e-4)
    assert data["mask"].mean() > 0.8
    # depth consistency: -z of cam_coord within quantization error of render
    return data


# ---------------------------------------------------------------------------

def test_seven_scenes_format(tmp_path):
    from unigeo_tpu.data.loaders import SevenScenesDataset

    root = tmp_path / "7scenes"
    scene = root / "chess" / "seq-01"
    os.makedirs(scene)
    for i, (w2c_gl, rgb, depth, _) in enumerate(_frames()):
        # 7-Scenes poses are OpenCV camera-to-world text files
        c2w_cv = coords.convert_pose_gl_cv(coords.se3_inverse(w2c_gl))
        np.savetxt(scene / f"frame-{i:06d}.pose.txt", c2w_cv)
        _save_rgb(scene / f"frame-{i:06d}.color.png", rgb)
        _save_depth_png(scene / f"frame-{i:06d}.depth.proj.png", depth, 1000)

    ds = SevenScenesDataset(
        root=str(root), scene_list=["chess/seq-01"], clip_length=4, clip_overlap=0,
        cache_dir=str(tmp_path / "cache"),
    )
    # loader uses the fixed 7-Scenes K=(525,320,240) — our fixture uses a
    # different K, so only structural checks apply
    data = ds[0]
    validate_sample(data)
    assert data["images"].shape == (4, 3, H, W)
    assert np.allclose(data["extrinsics"][0], np.eye(4), atol=1e-4)


def test_replica_format(tmp_path):
    from unigeo_tpu.data.loaders import ReplicaDataset

    root = tmp_path / "replica"
    base = root / "room_0" / "imap" / "00"
    os.makedirs(base / "rgb")
    os.makedirs(base / "depth")
    traj = []
    frames = _frames()
    for i, (w2c_gl, rgb, depth, _) in enumerate(frames):
        _save_rgb(base / "rgb" / f"rgb_{i}.png", rgb)
        _save_depth_png(base / "depth" / f"depth_{i}.png", depth, 1000)
        traj.append(coords.se3_inverse(w2c_gl).reshape(-1))  # c2w GL rows
    np.savetxt(base / "traj_w_cgl.txt", np.stack(traj))

    ds = ReplicaDataset(
        root=str(root), scene_list=["room_0"], clip_length=2, clip_overlap=0,
        cache_dir=str(tmp_path / "cache"),
    )
    # frame_gap=3 → 4 frames become 2, one 2-frame clip
    data = _check(ds, expect_len=1)
    # replica poses skip GL/CV conjugation: extrinsics should match renders
    w2c_gl0 = frames[0][0]
    w2c_gl3 = frames[3][0]
    expect_rel = coords.rebase_to_keyview(np.stack([w2c_gl0, w2c_gl3]), 0)
    assert np.allclose(data["extrinsics"], expect_rel, atol=1e-3)


def test_bonn_format(tmp_path):
    from unigeo_tpu.data.loaders import BonnDataset

    root = tmp_path / "bonn"
    scene = root / "rgbd_bonn_balloon"
    os.makedirs(scene / "rgb_110")
    os.makedirs(scene / "depth_110")
    lines = []
    for i, (w2c_gl, rgb, depth, _) in enumerate(_frames()):
        _save_rgb(scene / "rgb_110" / f"{i:06d}.png", rgb)
        _save_depth_png(scene / "depth_110" / f"{i:06d}.png", depth, 5000)
        c2w_cv = coords.convert_pose_gl_cv(coords.se3_inverse(w2c_gl))
        q = np.asarray(matrix_to_quaternion(c2w_cv[:3, :3]))  # wxyz
        t = c2w_cv[:3, 3]
        lines.append(
            f"{i}.0 {t[0]} {t[1]} {t[2]} {q[1]} {q[2]} {q[3]} {q[0]}"
        )
    (scene / "groundtruth_110.txt").write_text("\n".join(lines) + "\n")

    ds = BonnDataset(
        root=str(root), scene_list=["rgbd_bonn_balloon"], clip_length=4,
        clip_overlap=0, cache_dir=str(tmp_path / "cache"),
    )
    data = ds[0]
    validate_sample(data)
    # extrinsics rebased from TUM c2w must match the render poses
    expect = coords.rebase_to_keyview(
        np.stack([f[0] for f in _frames()]), 0
    )
    assert np.allclose(data["extrinsics"], expect, atol=1e-3)


def test_scannetv2_format(tmp_path):
    from unigeo_tpu.data.loaders import ScannetV2Dataset

    root = tmp_path / "scannetv2"
    scene = root / "scene0707_00"
    os.makedirs(scene / "color_270")
    os.makedirs(scene / "depth_270")
    os.makedirs(scene / "intrinsic")
    poses = []
    for i, (w2c_gl, rgb, depth, _) in enumerate(_frames()):
        Image.fromarray(np.moveaxis(rgb, 0, -1).astype(np.uint8)).save(
            scene / "color_270" / f"{i:04d}.jpg"
        )
        _save_depth_png(scene / "depth_270" / f"{i:04d}.png", depth, 1000)
        poses.append(coords.convert_pose_gl_cv(coords.se3_inverse(w2c_gl)))
    np.savetxt(scene / "pose_270.txt", np.concatenate([p for p in poses]))
    K4 = np.eye(4)
    K4[:3, :3] = K
    np.savetxt(scene / "intrinsic" / "intrinsic_depth.txt", K4)

    ds = ScannetV2Dataset(
        root=str(root), scene_list=["scene0707_00"], clip_length=2,
        clip_overlap=0, cache_dir=str(tmp_path / "cache"),
    )
    data = _check(ds)  # gap 2: frames 0, 2
    depth_rt = -data["cam_coord"][:, 2]
    _, d0, _ = render_box_frame(_frames()[0][0], K, H, W)[0:3]
    assert np.allclose(depth_rt[0], np.round(d0 * 1000) / 1000, atol=2e-3)


def test_scannetpp_format(tmp_path):
    from unigeo_tpu.data.loaders import ScannetPPDataset

    root = tmp_path / "scannetpp"
    scene = root / "02455b3d20"
    os.makedirs(scene / "images")
    os.makedirs(scene / "depth")
    os.makedirs(scene / "normal")
    names, trajs, intrs = [], [], []
    for i, (w2c_gl, rgb, depth, normal) in enumerate(_frames()):
        name = f"frame_{i:05d}"
        names.append(name)
        Image.fromarray(np.moveaxis(rgb, 0, -1).astype(np.uint8)).save(
            scene / "images" / f"{name}.webp"
        )
        _save_depth_png(scene / "depth" / f"{name}.png", depth, 1000)
        nrm_u8 = ((np.moveaxis(normal, 0, -1) + 1) / 2 * 255).astype(np.uint8)
        Image.fromarray(nrm_u8).save(
            scene / "normal" / f"{name}.webp", lossless=True
        )
        trajs.append(coords.convert_pose_gl_cv(coords.se3_inverse(w2c_gl)))
        intrs.append(K)
    np.savez(
        scene / "scene_metadata.npz",
        trajectories=np.stack(trajs),
        intrinsics=np.stack(intrs),
        images=np.array(names),
    )

    ds = ScannetPPDataset(
        root=str(root), scene_list=["02455b3d20"], clip_length=2, clip_overlap=0,
        cache_dir=str(tmp_path / "cache"),
    )
    # gap 3 → frames 0 and 3 survive; 2 frames → 1 clip of 2
    data = _check(ds, expect_len=1)
    # native normal maps round-trip through the webp encoding
    nrm = data["cam_normal"][0]
    golden = _frames()[0][3]
    valid = data["mask"][0] > 0
    dots = np.sum(np.moveaxis(nrm, 0, -1) * np.moveaxis(golden, 0, -1), axis=-1)
    assert (dots[valid] > 0.98).mean() > 0.95
