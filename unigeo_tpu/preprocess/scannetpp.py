"""ScanNet++ GT preprocessing: render depth + normals from the laser mesh.

(reference: dataset/scannetpp/preprocess_scannetpp_imu.py — IMU-aligned
poses from pose_intrinsic_imu.json :245-265, pyrender offscreen + GLSL
shaders :325-332/:477-487 replaced by the native rasterizer, Lanczos
rescale + intrinsics adjust :97-146, outputs webp RGB / webp world-normal /
uint16 mm depth / scene_metadata.npz :466-536.)
"""

from __future__ import annotations

import json
import os
import os.path as osp
from typing import Optional, Tuple

import numpy as np

from unigeo_tpu import coords
from unigeo_tpu.preprocess.rasterizer import (
    compute_vertex_normals,
    rasterize_mesh,
    read_ply_mesh,
)


def load_imu_poses(json_path: str):
    """pose_intrinsic_imu.json → (names, c2w [N,4,4] OpenCV, K [N,3,3])."""
    with open(json_path) as f:
        meta = json.load(f)
    names = sorted(meta.keys())
    poses = np.stack([np.asarray(meta[n]["aligned_pose"], np.float32) for n in names])
    intr = np.stack([np.asarray(meta[n]["intrinsic"], np.float32) for n in names])
    return names, poses, intr


def rescale_intrinsics(K: np.ndarray, orig_hw, new_hw) -> np.ndarray:
    return K * coords.intrinsics_resize_scale(orig_hw, new_hw)


def process_scene(
    scene_dir: str,
    out_dir: str,
    mesh_name: str = "mesh_aligned_0.05.ply",
    target_hw: Tuple[int, int] = (768, 1024),
    frame_stride: int = 1,
    max_frames: Optional[int] = None,
    verbose: bool = True,
):
    """Render GT depth + world-space normals for every selected frame and
    write scene_metadata.npz in the layout the loader consumes."""
    from PIL import Image

    verts, faces = read_ply_mesh(osp.join(scene_dir, "scans", mesh_name))
    vnormals = compute_vertex_normals(verts, faces)

    names, c2w_cv, intr = load_imu_poses(
        osp.join(scene_dir, "iphone", "pose_intrinsic_imu.json")
    )
    names = names[::frame_stride]
    c2w_cv = c2w_cv[::frame_stride]
    intr = intr[::frame_stride]
    if max_frames:
        names, c2w_cv, intr = names[:max_frames], c2w_cv[:max_frames], intr[:max_frames]

    os.makedirs(osp.join(out_dir, "images"), exist_ok=True)
    os.makedirs(osp.join(out_dir, "depth"), exist_ok=True)
    os.makedirs(osp.join(out_dir, "normal"), exist_ok=True)

    h, w = target_hw
    kept_names, kept_poses, kept_intr = [], [], []
    for i, name in enumerate(names):
        rgb_path = osp.join(scene_dir, "iphone", "rgb", f"{name}.jpg")
        if not osp.isfile(rgb_path):
            continue
        img = Image.open(rgb_path)
        K = rescale_intrinsics(intr[i], (img.height, img.width), target_hw)
        img = img.resize((w, h), Image.LANCZOS)
        img.save(osp.join(out_dir, "images", f"{name}.webp"))

        w2c = coords.se3_inverse(c2w_cv[i])
        depth, normal_world = rasterize_mesh(verts, faces, w2c, K, h, w, vnormals)

        Image.fromarray(np.round(depth * 1000).astype(np.uint16)).save(
            osp.join(out_dir, "depth", f"{name}.png")
        )
        nrm_u8 = ((np.clip(normal_world, -1, 1) + 1) * 0.5 * 255).astype(np.uint8)
        Image.fromarray(nrm_u8).save(
            osp.join(out_dir, "normal", f"{name}.webp"), lossless=True
        )
        kept_names.append(name)
        kept_poses.append(c2w_cv[i])
        kept_intr.append(K)
        if verbose and len(kept_names) % 50 == 0:
            print(f"  rendered {len(kept_names)} frames")

    np.savez(
        osp.join(out_dir, "scene_metadata.npz"),
        trajectories=np.stack(kept_poses),
        intrinsics=np.stack(kept_intr),
        images=np.asarray(kept_names),
    )
    return len(kept_names)


def process_scene_dslr(
    scene_dir: str,
    out_dir: str,
    mesh_name: str = "mesh_aligned_0.05.ply",
    target_hw: Optional[Tuple[int, int]] = None,
    frame_stride: int = 1,
    max_frames: Optional[int] = None,
    balance: float = 0.0,
    verbose: bool = True,
):
    """DSLR path: COLMAP sparse model poses + fisheye/pinhole undistortion,
    then GT depth/normal rendering against the undistorted pinhole camera
    (reference: preprocess_scannetpp_imu.py:194-243 COLMAP parsing,
    :280-322 undistortion; rendering/export identical to the IMU path)."""
    from PIL import Image

    from unigeo_tpu.preprocess.colmap import (
        colmap_to_opencv_intrinsics,
        get_frame_number,
        load_colmap_model,
        undistort_image,
    )

    verts, faces = read_ply_mesh(osp.join(scene_dir, "scans", mesh_name))
    vnormals = compute_vertex_normals(verts, faces)

    sfm_dir = osp.join(scene_dir, "dslr", "colmap")
    cameras, images, _ = load_colmap_model(sfm_dir)
    entries = sorted(images.values(), key=lambda im: get_frame_number(im.name))
    entries = entries[::frame_stride]
    if max_frames:
        entries = entries[:max_frames]

    os.makedirs(osp.join(out_dir, "images"), exist_ok=True)
    os.makedirs(osp.join(out_dir, "depth"), exist_ok=True)
    os.makedirs(osp.join(out_dir, "normal"), exist_ok=True)

    kept_names, kept_poses, kept_intr = [], [], []
    for im in entries:
        rgb_path = osp.join(scene_dir, "dslr", "resized_images", im.name)
        if not osp.isfile(rgb_path):
            rgb_path = osp.join(scene_dir, "dslr", "images", im.name)
            if not osp.isfile(rgb_path):
                continue
        cam = cameras[im.camera_id]
        rgb = np.asarray(Image.open(rgb_path).convert("RGB"), np.float32)
        newK_colmap, und, _mask = undistort_image(cam, rgb, balance=balance)
        K = colmap_to_opencv_intrinsics(newK_colmap)
        und_img = Image.fromarray(np.clip(und, 0, 255).astype(np.uint8))

        h, w = und.shape[:2]
        if target_hw is not None:
            K = rescale_intrinsics(K, (h, w), target_hw)
            h, w = target_hw
            und_img = und_img.resize((w, h), Image.LANCZOS)

        name = osp.splitext(im.name)[0]
        und_img.save(osp.join(out_dir, "images", f"{name}.webp"))

        c2w = im.cam_to_world.astype(np.float32)
        w2c = coords.se3_inverse(c2w)
        depth, normal_world = rasterize_mesh(verts, faces, w2c, K, h, w, vnormals)

        Image.fromarray(np.round(depth * 1000).astype(np.uint16)).save(
            osp.join(out_dir, "depth", f"{name}.png")
        )
        nrm_u8 = ((np.clip(normal_world, -1, 1) + 1) * 0.5 * 255).astype(np.uint8)
        Image.fromarray(nrm_u8).save(
            osp.join(out_dir, "normal", f"{name}.webp"), lossless=True
        )
        kept_names.append(name)
        kept_poses.append(c2w)
        kept_intr.append(K)
        if verbose and len(kept_names) % 50 == 0:
            print(f"  rendered {len(kept_names)} frames")

    np.savez(
        osp.join(out_dir, "scene_metadata.npz"),
        trajectories=np.stack(kept_poses),
        intrinsics=np.stack(kept_intr),
        images=np.asarray(kept_names),
    )
    return len(kept_names)
