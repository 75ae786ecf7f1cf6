"""Shared on-disk dataset fixture builders.

One builder per loader, each writing a miniature dataset to ``root`` in the
EXACT directory layout / file formats the reference consumes (SURVEY.md
§2.3), generated from the deterministic synthetic box scene so the emitted
geometry is known.  Used by the per-format tests (tests/test_dataset_loaders
.py) and the golden-fingerprint test (tests/test_loader_goldens.py) — the
latter pins the emitted sample dict against committed goldens so refactors
of coords.py / data/base.py cannot silently flip a convention.
"""

import os
import os.path as osp

import numpy as np
from PIL import Image

from unigeo_tpu import coords
from unigeo_tpu.data.synthetic import render_box_frame, _orbit_pose_gl_w2c
from unigeo_tpu.metrics.camera import matrix_to_quaternion

H, W = 48, 64
K = np.array([[0.9 * W, 0, W / 2], [0, 0.9 * W, H / 2], [0, 0, 1]], np.float32)
N_FRAMES = 4


def frames():
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


# ---------------------------------------------------------------------------


def build_seven_scenes(root, cache_dir, clip_length=4, clip_overlap=0):
    from unigeo_tpu.data.loaders import SevenScenesDataset

    scene = osp.join(root, "chess", "seq-01")
    os.makedirs(scene, exist_ok=True)
    for i, (w2c_gl, rgb, depth, _) in enumerate(frames()):
        # 7-Scenes poses are OpenCV camera-to-world text files
        c2w_cv = coords.convert_pose_gl_cv(coords.se3_inverse(w2c_gl))
        np.savetxt(osp.join(scene, f"frame-{i:06d}.pose.txt"), c2w_cv)
        _save_rgb(osp.join(scene, f"frame-{i:06d}.color.png"), rgb)
        _save_depth_png(
            osp.join(scene, f"frame-{i:06d}.depth.proj.png"), depth, 1000
        )
    return SevenScenesDataset(
        root=root, scene_list=["chess/seq-01"], clip_length=clip_length,
        clip_overlap=clip_overlap, cache_dir=cache_dir,
    )


def build_replica(root, cache_dir, clip_length=2, clip_overlap=0):
    from unigeo_tpu.data.loaders import ReplicaDataset

    base = osp.join(root, "room_0", "imap", "00")
    os.makedirs(osp.join(base, "rgb"), exist_ok=True)
    os.makedirs(osp.join(base, "depth"), exist_ok=True)
    traj = []
    for i, (w2c_gl, rgb, depth, _) in enumerate(frames()):
        _save_rgb(osp.join(base, "rgb", f"rgb_{i}.png"), rgb)
        _save_depth_png(osp.join(base, "depth", f"depth_{i}.png"), depth, 1000)
        traj.append(coords.se3_inverse(w2c_gl).reshape(-1))  # c2w GL rows
    np.savetxt(osp.join(base, "traj_w_cgl.txt"), np.stack(traj))
    return ReplicaDataset(
        root=root, scene_list=["room_0"], clip_length=clip_length,
        clip_overlap=clip_overlap, cache_dir=cache_dir,
    )


def build_bonn(root, cache_dir, clip_length=4, clip_overlap=0):
    from unigeo_tpu.data.loaders import BonnDataset

    scene = osp.join(root, "rgbd_bonn_balloon")
    os.makedirs(osp.join(scene, "rgb_110"), exist_ok=True)
    os.makedirs(osp.join(scene, "depth_110"), exist_ok=True)
    lines = []
    for i, (w2c_gl, rgb, depth, _) in enumerate(frames()):
        _save_rgb(osp.join(scene, "rgb_110", f"{i:06d}.png"), rgb)
        _save_depth_png(osp.join(scene, "depth_110", f"{i:06d}.png"), depth, 5000)
        c2w_cv = coords.convert_pose_gl_cv(coords.se3_inverse(w2c_gl))
        q = np.asarray(matrix_to_quaternion(c2w_cv[:3, :3]))  # wxyz
        t = c2w_cv[:3, 3]
        lines.append(f"{i}.0 {t[0]} {t[1]} {t[2]} {q[1]} {q[2]} {q[3]} {q[0]}")
    with open(osp.join(scene, "groundtruth_110.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return BonnDataset(
        root=root, scene_list=["rgbd_bonn_balloon"], clip_length=clip_length,
        clip_overlap=clip_overlap, cache_dir=cache_dir,
    )


def build_scannetv2(root, cache_dir, clip_length=2, clip_overlap=0,
                    sensor_res=False):
    """``sensor_res=True`` mimics the REAL dataset's resolution split —
    depth at the 480x640 sensor resolution (nearest-upscaled), RGB at a
    different size — so the loader's RGB→depth-resolution resize path
    (reference scannetv2.py:108-114 hardcodes Image.resize((640, 480)))
    is exercised; default keeps everything at the tiny fixture size."""
    from unigeo_tpu.data.loaders import ScannetV2Dataset

    scene = osp.join(root, "scene0707_00")
    os.makedirs(osp.join(scene, "color_270"), exist_ok=True)
    os.makedirs(osp.join(scene, "depth_270"), exist_ok=True)
    os.makedirs(osp.join(scene, "intrinsic"), exist_ok=True)
    poses = []
    for i, (w2c_gl, rgb, depth, _) in enumerate(frames()):
        img = Image.fromarray(np.moveaxis(rgb, 0, -1).astype(np.uint8))
        if sensor_res:
            img = img.resize((2 * W, 2 * H))
            depth = np.asarray(
                Image.fromarray((depth * 1000).astype(np.uint16)).resize(
                    (640, 480), Image.NEAREST
                ),
                dtype=np.float32,
            ) / 1000.0
        img.save(osp.join(scene, "color_270", f"{i:04d}.jpg"))
        _save_depth_png(osp.join(scene, "depth_270", f"{i:04d}.png"), depth, 1000)
        poses.append(coords.convert_pose_gl_cv(coords.se3_inverse(w2c_gl)))
    np.savetxt(osp.join(scene, "pose_270.txt"), np.concatenate(poses))
    K4 = np.eye(4)
    K4[:3, :3] = K
    np.savetxt(osp.join(scene, "intrinsic", "intrinsic_depth.txt"), K4)
    return ScannetV2Dataset(
        root=root, scene_list=["scene0707_00"], clip_length=clip_length,
        clip_overlap=clip_overlap, cache_dir=cache_dir,
    )


def build_scannetpp(root, cache_dir, clip_length=2, clip_overlap=0):
    from unigeo_tpu.data.loaders import ScannetPPDataset

    scene = osp.join(root, "02455b3d20")
    os.makedirs(osp.join(scene, "images"), exist_ok=True)
    os.makedirs(osp.join(scene, "depth"), exist_ok=True)
    os.makedirs(osp.join(scene, "normal"), exist_ok=True)
    names, trajs, intrs = [], [], []
    for i, (w2c_gl, rgb, depth, normal) in enumerate(frames()):
        name = f"frame_{i:05d}"
        names.append(name)
        Image.fromarray(np.moveaxis(rgb, 0, -1).astype(np.uint8)).save(
            osp.join(scene, "images", f"{name}.webp")
        )
        _save_depth_png(osp.join(scene, "depth", f"{name}.png"), depth, 1000)
        nrm_u8 = ((np.moveaxis(normal, 0, -1) + 1) / 2 * 255).astype(np.uint8)
        Image.fromarray(nrm_u8).save(
            osp.join(scene, "normal", f"{name}.webp"), lossless=True
        )
        trajs.append(coords.convert_pose_gl_cv(coords.se3_inverse(w2c_gl)))
        intrs.append(K)
    np.savez(
        osp.join(scene, "scene_metadata.npz"),
        trajectories=np.stack(trajs),
        intrinsics=np.stack(intrs),
        images=np.array(names),
    )
    return ScannetPPDataset(
        root=root, scene_list=["02455b3d20"], clip_length=clip_length,
        clip_overlap=clip_overlap, cache_dir=cache_dir,
    )


def build_neuralrgbd(root, cache_dir, clip_length=2, clip_overlap=0,
                     nan_frame=None):
    """NeuralRGBD layout: images/img{i}.png + depth/depth{i}.png + poses.txt
    as stacked 4-line OpenGL c2w matrices; a row of 'nan's marks an invalid
    pose (reference: dataset/neuralRGBD/neuralRGBD.py:83-103).
    nan_frame: optionally poison one frame's pose to exercise the filter.
    """
    from unigeo_tpu.data.loaders import NeuralRGBDDataset

    scene = osp.join(root, "kitchen")
    os.makedirs(osp.join(scene, "images"), exist_ok=True)
    os.makedirs(osp.join(scene, "depth"), exist_ok=True)
    lines = []
    for i, (w2c_gl, rgb, depth, _) in enumerate(frames()):
        _save_rgb(osp.join(scene, "images", f"img{i}.png"), rgb)
        _save_depth_png(osp.join(scene, "depth", f"depth{i}.png"), depth, 1000)
        if nan_frame is not None and i == nan_frame:
            lines.extend(["nan nan nan nan"] * 4)
        else:
            c2w_gl = coords.se3_inverse(w2c_gl)
            lines.extend(" ".join(str(x) for x in row) for row in c2w_gl)
    with open(osp.join(scene, "poses.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return NeuralRGBDDataset(
        root=root, scene_list=["kitchen"], clip_length=clip_length,
        clip_overlap=clip_overlap, cache_dir=cache_dir,
    )


HYPERSIM_H, HYPERSIM_W = 32, 48
METERS_PER_ASSET = 0.02


def build_hypersim_scene(root):
    """Write the fabricated Hypersim HDF5 scene; returns the scene name.
    (Separate from build_hypersim so tests can post-edit the files before
    constructing the dataset.)"""
    import h5py
    import pandas as pd

    h, w = HYPERSIM_H, HYPERSIM_W
    scene = "ai_001_001"
    cam = "cam_00"
    detail = osp.join(root, scene, "_detail")
    cam_dir = osp.join(detail, cam)
    img_dir = osp.join(root, scene, "images", f"scene_{cam}_final_preview")
    geo_dir = osp.join(root, scene, "images", f"scene_{cam}_geometry_hdf5")
    for d in (cam_dir, img_dir, geo_dir):
        os.makedirs(d, exist_ok=True)

    # camera keyframes: positions in ASSET units, orientations OpenGL c2w
    n = 3
    positions = np.stack([[i * 10.0, 0.0, 0.0] for i in range(n)])
    orientations = np.tile(np.eye(3), (n, 1, 1))
    with h5py.File(osp.join(cam_dir, "camera_keyframe_positions.hdf5"), "w") as f:
        f.create_dataset("dataset", data=positions)
    with h5py.File(
        osp.join(cam_dir, "camera_keyframe_orientations.hdf5"), "w"
    ) as f:
        f.create_dataset("dataset", data=orientations)

    pd.DataFrame(
        {
            "parameter_name": ["meters_per_asset_unit"],
            "parameter_value": [METERS_PER_ASSET],
        }
    ).to_csv(osp.join(detail, "metadata_scene.csv"), index=False)

    # camera parameters CSV with an OpenGL projection matrix
    fov_proj = np.zeros((4, 4))
    fov_proj[0, 0] = 1.5
    fov_proj[1, 1] = 2.0
    fov_proj[2, 2] = -1.0
    fov_proj[3, 2] = -1.0
    row = {
        "scene_name": scene,
        "settings_output_img_width": w,
        "settings_output_img_height": h,
    }
    for i in range(4):
        for j in range(4):
            row[f"M_proj_{i}{j}"] = fov_proj[i, j]
    pd.DataFrame([row]).to_csv(
        osp.join(root, "metadata_camera_parameters.csv"), index=False
    )

    # frames: world positions on a plane in front of each camera (OpenGL:
    # camera looks down -z), normals +z (toward camera)
    for fid in range(n):
        Image.fromarray(np.full((h, w, 3), 100 + fid, np.uint8)).save(
            osp.join(img_dir, f"frame.{fid:04d}.tonemap.jpg")
        )
        cam_pos = positions[fid] * METERS_PER_ASSET
        xs = np.linspace(-1, 1, w)
        ys = np.linspace(-1, 1, h)
        xv, yv = np.meshgrid(xs, ys)
        world = np.stack(
            [
                cam_pos[0] + xv,
                cam_pos[1] + yv,
                cam_pos[2] - 2.0 * np.ones_like(xv),
            ],
            axis=-1,
        ) / METERS_PER_ASSET  # stored in asset units
        with h5py.File(
            osp.join(geo_dir, f"frame.{fid:04d}.position.hdf5"), "w"
        ) as f:
            f.create_dataset("dataset", data=world.astype(np.float32))
        normal = np.zeros((h, w, 3), np.float32)
        normal[..., 2] = 1.0
        with h5py.File(
            osp.join(geo_dir, f"frame.{fid:04d}.normal_cam.hdf5"), "w"
        ) as f:
            f.create_dataset("dataset", data=normal)
    return scene


def build_hypersim(root, cache_dir=None):
    from unigeo_tpu.data.hypersim import HyperSimDataset

    scene = build_hypersim_scene(root)
    return HyperSimDataset(root=root, scene_list=[scene])


def build_tumrgbd(root, cache_dir, clip_length=2, clip_overlap=0):
    """TUM RGB-D raw layout: rgb/ + depth/ + rgb.txt/depth.txt/groundtruth.txt
    with deliberately offset timestamps to exercise nearest association."""
    from unigeo_tpu.data.loaders import TumRGBDDataset

    scene = osp.join(root, "rgbd_dataset_freiburg1_desk")
    os.makedirs(osp.join(scene, "rgb"), exist_ok=True)
    os.makedirs(osp.join(scene, "depth"), exist_ok=True)
    rgb_lines, dep_lines, gt_lines = [], [], []
    for i, (w2c_gl, rgb, depth, _) in enumerate(frames()):
        ts = 1300000000.0 + i * 0.1
        _save_rgb(osp.join(scene, "rgb", f"{ts:.6f}.png"), rgb)
        _save_depth_png(osp.join(scene, "depth", f"{ts + 0.005:.6f}.png"),
                        depth, 5000)
        rgb_lines.append(f"{ts:.6f} rgb/{ts:.6f}.png")
        dep_lines.append(f"{ts + 0.005:.6f} depth/{ts + 0.005:.6f}.png")
        c2w_cv = coords.convert_pose_gl_cv(coords.se3_inverse(w2c_gl))
        q = np.asarray(matrix_to_quaternion(c2w_cv[:3, :3]))  # wxyz
        t = c2w_cv[:3, 3]
        gt_lines.append(
            f"{ts + 0.008:.6f} {t[0]} {t[1]} {t[2]} {q[1]} {q[2]} {q[3]} {q[0]}"
        )
    for name, lines in (
        ("rgb.txt", rgb_lines), ("depth.txt", dep_lines),
        ("groundtruth.txt", gt_lines),
    ):
        with open(osp.join(scene, name), "w") as f:
            f.write("# fixture\n" + "\n".join(lines) + "\n")
    return TumRGBDDataset(
        root=root, scene_list=["rgbd_dataset_freiburg1_desk"],
        clip_length=clip_length, clip_overlap=clip_overlap, cache_dir=cache_dir,
    )


def _save_dpt(path, depth):
    with open(path, "wb") as f:
        np.asarray([202021.25], np.float32).tofile(f)
        h, w = depth.shape
        np.asarray([w, h], np.int32).tofile(f)
        depth.astype(np.float32).tofile(f)


def _save_sintel_cam(path, K33, w2c_cv):
    with open(path, "wb") as f:
        np.asarray([202021.25], np.float32).tofile(f)
        np.asarray(K33, np.float64).tofile(f)
        np.asarray(w2c_cv[:3], np.float64).tofile(f)


def build_sintel(root, cache_dir, clip_length=4, clip_overlap=0):
    """MPI-Sintel layout: training/{final,depth,camdata_left}/<scene>/."""
    from unigeo_tpu.data.loaders import SintelDataset

    scene = "alley_1"
    img_dir = osp.join(root, "training", "final", scene)
    dep_dir = osp.join(root, "training", "depth", scene)
    cam_dir = osp.join(root, "training", "camdata_left", scene)
    for d in (img_dir, dep_dir, cam_dir):
        os.makedirs(d, exist_ok=True)
    for i, (w2c_gl, rgb, depth, _) in enumerate(frames()):
        stem = f"frame_{i + 1:04d}"  # Sintel frames start at 0001
        _save_rgb(osp.join(img_dir, f"{stem}.png"), rgb)
        _save_dpt(osp.join(dep_dir, f"{stem}.dpt"), depth)
        c2w_cv = coords.convert_pose_gl_cv(coords.se3_inverse(w2c_gl))
        _save_sintel_cam(
            osp.join(cam_dir, f"{stem}.cam"), K, coords.se3_inverse(c2w_cv)
        )
    return SintelDataset(
        root=root, scene_list=[scene], clip_length=clip_length,
        clip_overlap=clip_overlap, cache_dir=cache_dir,
    )


def build_interiornet(root, cache_dir, clip_length=4, clip_overlap=0):
    """InteriorNet HD layout: cam0/data + depth0/data (euclidean mm ray
    lengths) + cam0.render eye/lookat/up ground truth."""
    from unigeo_tpu.data.loaders import InteriorNetDataset

    scene = osp.join(root, "3FO4IDEI1LAV_Dining_room")
    os.makedirs(osp.join(scene, "cam0", "data"), exist_ok=True)
    os.makedirs(osp.join(scene, "depth0", "data"), exist_ok=True)
    # euclidean ray-length grid, same pixel convention as ops/backproject
    xs = (np.arange(W, dtype=np.float64) - K[0, 2]) / K[0, 0]
    ys = (np.arange(H, dtype=np.float64) - K[1, 2]) / K[1, 1]
    norm = np.sqrt(xs[None, :] ** 2 + ys[:, None] ** 2 + 1.0)
    lines = ["# interiornet fixture"]
    for i, (w2c_gl, rgb, depth, _) in enumerate(frames()):
        ts = 1000000 * (i + 1)
        _save_rgb(osp.join(scene, "cam0", "data", f"{ts}.png"), rgb)
        _save_depth_png(
            osp.join(scene, "depth0", "data", f"{ts}.png"), depth * norm, 1000
        )
        c2w_gl = coords.se3_inverse(w2c_gl)
        eye = c2w_gl[:3, 3]
        lookat = eye - c2w_gl[:3, 2]  # OpenGL forward = -z column
        up = c2w_gl[:3, 1]
        lines.append(" ".join(str(float(x)) for x in [ts, *eye, *lookat, *up]))
    with open(osp.join(scene, "cam0.render"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return InteriorNetDataset(
        root=root, intrinsics=K, scene_list=["3FO4IDEI1LAV_Dining_room"],
        clip_length=clip_length, clip_overlap=clip_overlap, cache_dir=cache_dir,
    )


def build_vkitti(root, cache_dir, clip_length=4, clip_overlap=0):
    """VKITTI2 merged-tar layout: Scene/variation/frames/{rgb,depth}/Camera_0
    + extrinsic.txt/intrinsic.txt `frame cameraID ...` tables."""
    from unigeo_tpu.data.loaders import VKitti2Dataset

    scene = osp.join(root, "Scene01", "clone")
    os.makedirs(osp.join(scene, "frames", "rgb", "Camera_0"), exist_ok=True)
    os.makedirs(osp.join(scene, "frames", "depth", "Camera_0"), exist_ok=True)
    ex_lines = ["frame cameraID r1,1 r1,2 r1,3 t1 r2,1 r2,2 r2,3 t2 "
                "r3,1 r3,2 r3,3 t3 0 0 0 1"]
    in_lines = ["frame cameraID K[0,0] K[1,1] K[0,2] K[1,2]"]
    for i, (w2c_gl, rgb, depth, _) in enumerate(frames()):
        _save_rgb(
            osp.join(scene, "frames", "rgb", "Camera_0", f"rgb_{i:05d}.jpg"), rgb
        )
        _save_depth_png(
            osp.join(scene, "frames", "depth", "Camera_0", f"depth_{i:05d}.png"),
            depth, 100,  # VKITTI depth pngs are uint16 centimeters
        )
        c2w_cv = coords.convert_pose_gl_cv(coords.se3_inverse(w2c_gl))
        w2c_cv = coords.se3_inverse(c2w_cv)
        ex_lines.append(
            f"{i} 0 " + " ".join(f"{v:.9f}" for v in w2c_cv.reshape(-1))
        )
        # the right camera exists in real dumps; rows must be filtered out
        ex_lines.append(f"{i} 1 " + " ".join("0" for _ in range(16)))
        in_lines.append(f"{i} 0 {K[0,0]} {K[1,1]} {K[0,2]} {K[1,2]}")
        in_lines.append(f"{i} 1 1 1 1 1")
    with open(osp.join(scene, "extrinsic.txt"), "w") as f:
        f.write("\n".join(ex_lines) + "\n")
    with open(osp.join(scene, "intrinsic.txt"), "w") as f:
        f.write("\n".join(in_lines) + "\n")
    return VKitti2Dataset(
        root=root, scene_list=["Scene01/clone"], clip_length=clip_length,
        clip_overlap=clip_overlap, cache_dir=cache_dir,
    )


def build_matrixcity(root, cache_dir, clip_length=4, clip_overlap=0):
    """MatrixCity block layout: transforms.json (instant-ngp intrinsics +
    NeRF/OpenGL c2w poses) + rgb pngs + parallel `<rgb_dir>_depth/*.exr`
    z-depth at the x100 value scale, written with the native EXR codec's
    ZIP path so the loader exercises real decompression."""
    from unigeo_tpu.data.exr import write_exr
    from unigeo_tpu.data.loaders import MatrixCityDataset

    block = osp.join(root, "aerial_block_1")
    os.makedirs(osp.join(block, "rgb"), exist_ok=True)
    os.makedirs(osp.join(block, "rgb_depth"), exist_ok=True)
    meta = {
        "fl_x": float(K[0, 0]), "fl_y": float(K[1, 1]),
        "cx": float(K[0, 2]), "cy": float(K[1, 2]),
        "frames": [],
    }
    for i, (w2c_gl, rgb, depth, _) in enumerate(frames()):
        _save_rgb(osp.join(block, "rgb", f"{i:04d}.png"), rgb)
        write_exr(
            osp.join(block, "rgb_depth", f"{i:04d}.exr"),
            depth.astype(np.float32) * 100.0, compression="ZIP",
        )
        c2w_gl = coords.se3_inverse(w2c_gl)
        meta["frames"].append({
            "file_path": f"rgb/{i:04d}.png",
            "transform_matrix": [[float(v) for v in row] for row in c2w_gl],
        })
    import json

    with open(osp.join(block, "transforms.json"), "w") as f:
        json.dump(meta, f)
    return MatrixCityDataset(
        root=root, scene_list=["aerial_block_1"], clip_length=clip_length,
        clip_overlap=clip_overlap, cache_dir=cache_dir,
    )


# name → builder, the registry both test modules parametrize over
BUILDERS = {
    "SevenScenesDataset": build_seven_scenes,
    "ReplicaDataset": build_replica,
    "BonnDataset": build_bonn,
    "ScannetV2Dataset": build_scannetv2,
    "ScannetPPDataset": build_scannetpp,
    "NeuralRGBDDataset": build_neuralrgbd,
    "HyperSimDataset": build_hypersim,
    "TumRGBDDataset": build_tumrgbd,
    "SintelDataset": build_sintel,
    "InteriorNetDataset": build_interiornet,
    "VKitti2Dataset": build_vkitti,
    "MatrixCityDataset": build_matrixcity,
}
