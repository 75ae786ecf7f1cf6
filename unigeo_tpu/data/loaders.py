"""On-disk dataset loaders for the seven UniGeo benchmark datasets.

One file for all loaders because, as the survey shows (SURVEY.md §2.3), they
differ only in metadata reading + a handful of constants; the clip logic
lives once in ClipDataset.  Behavior references (file:line into the
reference repo) are given per class.

Split lists: the reference bundles split .txt files inside each dataset
package.  Here splits resolve in order: (1) an explicit ``scene_list``
constructor arg; (2) ``<root>/splits/<split>.txt``; (3) every directory
under root (sorted) as a fallback — so the loaders run against any standard
dataset layout without repo-bundled metadata.
"""

from __future__ import annotations

import os
import os.path as osp
import re
from glob import glob
from typing import List, Optional

import numpy as np

from unigeo_tpu import coords
from unigeo_tpu.data.base import ClipDataset, SceneIndex
from unigeo_tpu.data.trajectories import read_matrix_trajectory, read_tum_trajectory
from unigeo_tpu.registry import DATASETS


class _DiskClipDataset(ClipDataset):
    """Shared split-resolution logic."""

    def __init__(self, root, scene_list: Optional[List[str]] = None, **kwargs):
        self._scene_list = scene_list
        super().__init__(root=root, **kwargs)

    def list_scenes(self, split: str) -> List[str]:
        if self._scene_list is not None:
            return list(self._scene_list)
        split_file = osp.join(self.root, "splits", f"{split}.txt")
        if osp.isfile(split_file):
            with open(split_file) as f:
                return [ln.strip() for ln in f if ln.strip()]
        # fallback: all scene directories under root
        return sorted(
            d for d in os.listdir(self.root)
            if osp.isdir(osp.join(self.root, d)) and d != "splits"
        )

    @staticmethod
    def _filter_valid_poses(poses, *lists):
        """Drop frames whose pose contains NaN/Inf
        (reference: sevenScenes.py:65-68, scannetv2.py:65-68)."""
        ok = ~np.array([not np.isfinite(p).all() for p in poses])
        poses = np.asarray(poses)[ok]
        outs = [[x for x, keep in zip(lst, ok) if keep] for lst in lists]
        return (poses, *outs)


def _numeric_sort(files, pattern):
    def key(f):
        m = re.search(pattern, osp.basename(f))
        return int(m.group(1)) if m else 0

    return sorted(files, key=key)


@DATASETS.register("ScannetPPDataset")
class ScannetPPDataset(_DiskClipDataset):
    """ScanNet++ (processed iPhone+IMU dumps).

    (reference: dataset/scannetpp/scannetpp.py — scene_metadata.npz with
    OpenCV c2w trajectories converted to OpenGL and inverted :51-70, webp
    rgb + webp GT normals + mm png depth, frame gap 3 :25-30, depth clamp
    80 m :163; split names 'train'/'nvs_sem_val' :212)
    """

    base_dataset = "scannetpp"
    frame_gap = 3
    depth_scale = 1000.0
    depth_clamp = (1e-3, 80.0)
    native_normals = True

    def list_scenes(self, split: str) -> List[str]:
        # reference maps test → nvs_sem_val split file name
        if self._scene_list is None:
            name = "train" if split == "train" else "nvs_sem_val"
            split_file = osp.join(self.root, "splits", f"{name}.txt")
            if osp.isfile(split_file):
                with open(split_file) as f:
                    return [ln.strip() for ln in f if ln.strip()]
        return super().list_scenes(split)

    def load_scene_index(self, scene_name: str) -> SceneIndex:
        meta = np.load(osp.join(self.root, scene_name, "scene_metadata.npz"))
        c2w_cv = meta["trajectories"].astype(np.float32)  # [N,4,4] OpenCV c2w
        c2w_gl = coords.convert_pose_gl_cv(c2w_cv)
        w2c_gl = coords.se3_inverse(c2w_gl)
        intr = meta["intrinsics"].astype(np.float32)
        names = [str(n) for n in meta["images"].tolist()]
        return SceneIndex(
            scene_name,
            [osp.join(scene_name, "images", f"{n}.webp") for n in names],
            [osp.join(scene_name, "depth", f"{n}.png") for n in names],
            w2c_gl,
            intr,
            [osp.join(scene_name, "normal", f"{n}.webp") for n in names],
        )


@DATASETS.register("sevenScenesDataset")
class SevenScenesDataset(_DiskClipDataset):
    """7-Scenes with Kinect depth registered onto RGB.

    (reference: dataset/sevenScenes/sevenScenes.py — per-frame *.pose.txt
    c2w conjugated to OpenGL and inverted :53-62, fixed K [525,0,320;0,525,
    240] :53, NaN-pose filtering :65-68, registered depth *.depth.proj.png
    /1000 :124, clamp 20 m :151, gap 1 :24)
    """

    base_dataset = "7scenes"
    frame_gap = 1
    depth_scale = 1000.0
    depth_clamp = (1e-3, 20.0)
    K = np.array([[525.0, 0, 320.0], [0, 525.0, 240.0], [0, 0, 1]], np.float32)

    def load_scene_index(self, scene_name: str) -> SceneIndex:
        scene_dir = osp.join(self.root, scene_name)
        rgb = sorted(glob(osp.join(scene_dir, "*.color.png")))
        depth = sorted(glob(osp.join(scene_dir, "*.depth.proj.png")))
        pose_files = sorted(glob(osp.join(scene_dir, "*.pose.txt")))
        c2w_cv = np.stack([np.genfromtxt(p) for p in pose_files]).astype(np.float32)
        c2w_cv, rgb, depth = self._filter_valid_poses(c2w_cv, rgb, depth)
        w2c_gl = coords.se3_inverse(coords.convert_pose_gl_cv(c2w_cv))
        rel = [osp.relpath(p, self.root) for p in rgb]
        reld = [osp.relpath(p, self.root) for p in depth]
        K = np.repeat(self.K[None], len(rel), axis=0)
        return SceneIndex(scene_name, rel, reld, w2c_gl, K)


@DATASETS.register("bonnDataset")
class BonnDataset(_DiskClipDataset):
    """Bonn RGB-D Dynamic.

    (reference: dataset/bonn/bonn.py — TUM groundtruth_110.txt trajectory
    :64-66 conjugated+inverted, fixed K from the dataset page :54-61,
    rgb_110/ + depth_110/ file lists, depth /5000 :128, clamp 20 m :162)
    """

    base_dataset = "bonn"
    frame_gap = 1
    depth_scale = 5000.0
    depth_clamp = (1e-3, 20.0)
    K = np.array(
        [[542.822841, 0, 315.593520], [0, 542.576870, 237.756098], [0, 0, 1]],
        np.float32,
    )

    def load_scene_index(self, scene_name: str) -> SceneIndex:
        scene_dir = osp.join(self.root, scene_name)
        rgb = sorted(glob(osp.join(scene_dir, "rgb_110", "*.png")))
        depth = sorted(glob(osp.join(scene_dir, "depth_110", "*.png")))
        poses_c2w, _ = read_tum_trajectory(osp.join(scene_dir, "groundtruth_110.txt"))
        w2c_gl = coords.se3_inverse(coords.convert_pose_gl_cv(poses_c2w))
        n = min(len(rgb), len(depth), len(w2c_gl))
        rel = [osp.relpath(p, self.root) for p in rgb[:n]]
        reld = [osp.relpath(p, self.root) for p in depth[:n]]
        K = np.repeat(self.K[None], n, axis=0)
        return SceneIndex(scene_name, rel, reld, w2c_gl[:n], K)


@DATASETS.register("replicaDataset")
class ReplicaDataset(_DiskClipDataset):
    """Replica (iMAP/vMAP renders).

    (reference: dataset/replica/replica.py — imap/00/rgb + depth numerically
    sorted :50-62, traj_w_cgl.txt 16-value rows already OpenGL c2w, inverted
    without conjugation :66-81, fixed K fx=fy=600 cx=599.5 cy=339.5 :64-71,
    depth /1000 :130, clamp 20 m :174, gap 3 :24)
    """

    base_dataset = "replica"
    frame_gap = 3
    depth_scale = 1000.0
    depth_clamp = (1e-3, 20.0)
    K = np.array([[600.0, 0, 599.5], [0, 600.0, 339.5], [0, 0, 1]], np.float32)

    def load_scene_index(self, scene_name: str) -> SceneIndex:
        base = osp.join(self.root, scene_name, "imap", "00")
        rgb = _numeric_sort(glob(osp.join(base, "rgb", "*.png")), r"rgb_(\d+)\.png")
        depth = _numeric_sort(
            glob(osp.join(base, "depth", "*.png")), r"depth_(\d+)\.png"
        )
        c2w_gl = read_matrix_trajectory(osp.join(base, "traj_w_cgl.txt"))
        w2c_gl = coords.se3_inverse(c2w_gl)  # already OpenGL: no conjugation
        n = min(len(rgb), len(depth), len(w2c_gl))
        rel = [osp.relpath(p, self.root) for p in rgb[:n]]
        reld = [osp.relpath(p, self.root) for p in depth[:n]]
        K = np.repeat(self.K[None], n, axis=0)
        return SceneIndex(scene_name, rel, reld, w2c_gl[:n], K)


@DATASETS.register("neuralRGBDDataset")
class NeuralRGBDDataset(_DiskClipDataset):
    """NeuralRGBD synthetic scenes.

    (reference: dataset/neuralRGBD/neuralRGBD.py — poses.txt as 4-line
    matrices with 'nan' validity rows :83-103, poses already OpenGL c2w
    inverted to w2c :81, fixed K fx=fy=554.256 :68, images/ + depth/
    numerically sorted, nan_to_num depth /1000 :149, clamp 20 m :182,
    gap 3 :24)
    """

    base_dataset = "neuralrgbd"
    frame_gap = 3
    depth_scale = 1000.0
    depth_clamp = (1e-3, 20.0)
    K = np.array(
        [[554.2562584220408, 0, 320.0], [0, 554.2562584220408, 240.0], [0, 0, 1]],
        np.float32,
    )

    def load_scene_index(self, scene_name: str) -> SceneIndex:
        scene_dir = osp.join(self.root, scene_name)
        rgb = _numeric_sort(glob(osp.join(scene_dir, "images", "*.png")), r"img(\d+)\.png")
        depth = _numeric_sort(glob(osp.join(scene_dir, "depth", "*.png")), r"depth(\d+)\.png")
        with open(osp.join(scene_dir, "poses.txt")) as f:
            lines = f.readlines()
        poses, valid = [], []
        for i in range(0, len(lines), 4):
            if "nan" in lines[i]:
                valid.append(False)
                poses.append(np.eye(4, dtype=np.float32))
            else:
                valid.append(True)
                poses.append(
                    np.asarray(
                        [[float(x) for x in ln.split()] for ln in lines[i : i + 4]],
                        np.float32,
                    )
                )
        poses = np.stack(poses)
        keep = np.asarray(valid)
        n = min(len(rgb), len(depth), len(poses))
        poses, rgb, depth, keep = poses[:n], rgb[:n], depth[:n], keep[:n]
        poses = poses[keep]
        rgb = [p for p, k in zip(rgb, keep) if k]
        depth = [p for p, k in zip(depth, keep) if k]
        w2c_gl = coords.se3_inverse(poses)  # poses already OpenGL c2w
        rel = [osp.relpath(p, self.root) for p in rgb]
        reld = [osp.relpath(p, self.root) for p in depth]
        K = np.repeat(self.K[None], len(rel), axis=0)
        return SceneIndex(scene_name, rel, reld, w2c_gl, K)

    def load_depth(self, path: str) -> np.ndarray:
        from PIL import Image

        depth = np.asarray(Image.open(path), dtype=np.float32)
        return np.nan_to_num(depth) / self.depth_scale  # (reference :149)


@DATASETS.register("ScannetV2Dataset")
class ScannetV2Dataset(_DiskClipDataset):
    """ScanNetV2 (downscaled 270-line dumps).

    (reference: dataset/scannetv2/scannetv2.py — color_270/*.jpg +
    depth_270/*.png, pose_270.txt stacked c2w matrices conjugated+inverted
    :49-75, NaN filtering :65-68, intrinsic/intrinsic_depth.txt 4x4 → 3x3
    :71-74, depth /1000 :119, clamp 20 m :150, gap 2 :23)
    """

    base_dataset = "scannetv2"
    frame_gap = 2
    depth_scale = 1000.0
    depth_clamp = (1e-3, 20.0)

    def load_scene_index(self, scene_name: str) -> SceneIndex:
        scene_dir = osp.join(self.root, scene_name)
        rgb = sorted(glob(osp.join(scene_dir, "color_270", "*.jpg")))
        depth = sorted(glob(osp.join(scene_dir, "depth_270", "*.png")))
        c2w_cv = np.genfromtxt(osp.join(scene_dir, "pose_270.txt")).reshape(-1, 4, 4)
        n = min(len(rgb), len(depth), len(c2w_cv))
        c2w_cv, rgb, depth = self._filter_valid_poses(
            c2w_cv[:n].astype(np.float32), rgb[:n], depth[:n]
        )
        w2c_gl = coords.se3_inverse(coords.convert_pose_gl_cv(c2w_cv))
        intr = (
            np.genfromtxt(osp.join(scene_dir, "intrinsic", "intrinsic_depth.txt"))
            .reshape(4, 4)[:3, :3]
            .astype(np.float32)
        )
        rel = [osp.relpath(p, self.root) for p in rgb]
        reld = [osp.relpath(p, self.root) for p in depth]
        K = np.repeat(intr[None], len(rel), axis=0)
        return SceneIndex(scene_name, rel, reld, w2c_gl, K)
