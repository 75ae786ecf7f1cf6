"""Dataset core: clip slicing, postprocessing, sample-list caching.

One template implements what the reference copies into 6 near-identical
loaders (SURVEY.md §2.3): a per-scene metadata index, sliding-window clip
slicing with last-clip padding, per-frame loading + backprojection, and the
keyview-rebase postprocess.  Concrete datasets only provide
``load_scene_index`` plus a handful of constants (frame gap, depth scale,
depth clamp) — exactly the axis along which the reference loaders differ.

Coordinate pipeline per clip (reference: scannetpp.py:81-187):
  raw depth → backproject with K (OpenCV) → flip to OpenGL camera points →
  rotate/translate into the keyview frame (world = keyview) → validity mask
  from NaNs + depth clamp → extrinsics rebased with frame0 = identity.

The sample list (which frames compose which clip) is cached to a JSON file
keyed ``{name}_clip{L}_overlap{O}.json`` (reference pickles to
dataset_core/sample_lists, dataset.py:264-266 — JSON here: no arbitrary
code execution on load, diffable).
"""

from __future__ import annotations

import json
import os
import os.path as osp
from typing import Dict, List, Optional, Sequence

import numpy as np

from unigeo_tpu import coords
from unigeo_tpu.data.transforms import ResizeInputs, ResizeTargets
from unigeo_tpu.ops.backproject import backproject_to_cv_position


class SceneIndex:
    """Per-scene frame index: paths + cameras, pre-clip-slicing."""

    def __init__(
        self,
        scene_name: str,
        rgb_paths: Sequence[str],
        depth_paths: Sequence[str],
        extrinsics: np.ndarray,  # [N,4,4] world-to-camera, OpenGL convention
        intrinsics: np.ndarray,  # [N,3,3]
        normal_paths: Optional[Sequence[str]] = None,
    ):
        n = len(rgb_paths)
        assert len(depth_paths) == n, "depth paths must align with rgb paths"
        assert len(extrinsics) == n and len(intrinsics) == n, (
            "camera arrays must align with frame lists"
        )
        if normal_paths is not None:
            assert len(normal_paths) == n
        self.scene_name = scene_name
        self.rgb_paths = list(rgb_paths)
        self.depth_paths = list(depth_paths)
        self.normal_paths = list(normal_paths) if normal_paths is not None else None
        self.extrinsics = np.asarray(extrinsics, np.float32)
        self.intrinsics = np.asarray(intrinsics, np.float32)

    def subsample(self, gap: int) -> "SceneIndex":
        """Every gap-th frame (reference: scannetpp.py:25-30)."""
        if gap <= 1:
            return self
        return SceneIndex(
            self.scene_name,
            self.rgb_paths[::gap],
            self.depth_paths[::gap],
            self.extrinsics[::gap],
            self.intrinsics[::gap],
            self.normal_paths[::gap] if self.normal_paths is not None else None,
        )


def slice_clips(num_frames: int, clip_length: int, clip_overlap: int) -> List[List[int]]:
    """Sliding windows with stride (length - overlap); the last clip pads by
    repeating its final frame (reference: scannetpp.py:42-48).

    Parity note: with overlap > 0 the reference's ``range(0, n, stride)``
    loop can emit a final window whose fresh frames were already fully
    covered (e.g. n=10, L=4, o=2 → [8,9,9,9] after [6,7,8,9]); we reproduce
    that so per-sequence CSV rows line up clip-for-clip.
    """
    stride = clip_length - clip_overlap
    assert stride > 0, "clip_overlap must be smaller than clip_length"
    clips = []
    for start in range(0, num_frames, stride):
        group = list(range(start, min(start + clip_length, num_frames)))
        if len(group) < clip_length:
            group += [group[-1]] * (clip_length - len(group))
        clips.append(group)
    return clips


class ClipDataset:
    """Base class for all on-disk clip datasets.

    Subclass obligations:
      * class attrs: ``base_dataset`` (cache key name), ``frame_gap``,
        ``depth_scale`` (divisor), ``depth_clamp`` (min, max meters),
        ``native_normals`` (whether GT normal maps exist on disk).
      * ``list_scenes(split) -> list[str]`` — read the split file.
      * ``load_scene_index(scene_name) -> SceneIndex``.
      * per-frame readers ``load_image``/``load_depth``(/``load_normal``).
    """

    base_dataset = "base"
    frame_gap = 1
    depth_scale = 1000.0
    depth_clamp = (1e-3, 20.0)
    native_normals = False
    # Resize RGB frames to the depth map's resolution when they differ
    # (ScanNetV2: the reference hardcodes Image.resize((640, 480)) — the
    # depth sensor resolution — at load, scannetv2.py:108-114).
    rgb_match_depth_resolution = False

    def __init__(
        self,
        root: Optional[str],
        split: str = "test",
        clip_length: int = 30,
        clip_overlap: int = 0,
        input_size=None,
        target_size=None,
        cache_dir: Optional[str] = None,
        compute_normals_if_missing: bool = True,
        verbose: bool = False,
        **_: Dict,
    ):
        if root is None:
            from unigeo_tpu.data.paths import resolve_root

            root = resolve_root(self.base_dataset)
        self.root = root
        self.split = split
        self.clip_length = clip_length
        self.clip_overlap = clip_overlap
        self.verbose = verbose
        self.compute_normals_if_missing = compute_normals_if_missing
        self.input_resize = ResizeInputs(input_size) if input_size else None
        self.target_resize = ResizeTargets(target_size) if target_size else None
        self.cache_dir = cache_dir or osp.join(
            osp.dirname(osp.abspath(__file__)), "sample_lists"
        )
        self.samples: List[Dict] = []  # each: {scene, frame_ids}
        self._scenes: Dict[str, SceneIndex] = {}
        self._init_samples()

    # ------------------------------------------------------------------
    # indexing
    # ------------------------------------------------------------------

    @property
    def name(self) -> str:
        return f"{self.base_dataset}.{self.split}"

    def _cache_path(self, scenes: Sequence[str]) -> str:
        # key on root + the actual scene list, not just name/clip/overlap:
        # a cache written against a partial install or a custom scene_list
        # must never be reused for a different data setup (the reference's
        # pickle cache has exactly this staleness hazard, dataset.py:264-266)
        import hashlib

        tag = hashlib.sha1(
            json.dumps([self.root, list(scenes)]).encode()
        ).hexdigest()[:10]
        return osp.join(
            self.cache_dir,
            f"{self.name}_clip{self.clip_length}_overlap{self.clip_overlap}"
            f"_{tag}.json",
        )

    def _init_samples(self) -> None:
        scenes = self.list_scenes(self.split)
        path = self._cache_path(scenes)
        if osp.isfile(path):
            with open(path) as f:
                self.samples = json.load(f)
            return
        for scene_name in scenes:
            index = self._scene(scene_name)
            for clip in slice_clips(
                len(index.rgb_paths), self.clip_length, self.clip_overlap
            ):
                self.samples.append({"scene": scene_name, "frame_ids": clip})
        try:
            os.makedirs(self.cache_dir, exist_ok=True)
            with open(path, "w") as f:
                json.dump(self.samples, f)
        except OSError:
            pass

    def _scene(self, scene_name: str) -> SceneIndex:
        if scene_name not in self._scenes:
            index = self.load_scene_index(scene_name)
            self._scenes[scene_name] = index.subsample(self.frame_gap)
        return self._scenes[scene_name]

    def __len__(self) -> int:
        return len(self.samples)

    # ------------------------------------------------------------------
    # diagnostics & config round-trip (reference: dataset.py:205-255)
    # ------------------------------------------------------------------

    def timeit(self, num: int = 10) -> float:
        """Loader throughput probe: seconds per clip over the first ``num``
        samples (reference ``Dataset.timeit``, dataset.py:205-215)."""
        import time

        num = min(num, len(self))
        if num == 0:
            return 0.0
        t0 = time.perf_counter()
        for i in range(num):
            self[i]
        per = (time.perf_counter() - t0) / num
        if self.verbose:
            print(f"{self.name}: {per:.3f} s/clip ({num} clips)")
        return per

    def save_config(self, path: str) -> None:
        """Persist the dataset construction config as JSON so a run's exact
        data setup can be reloaded later (reference pickles the dataset
        config, dataset.py:217-255 — JSON here, same rationale as the
        sample-list cache)."""
        from unigeo_tpu.registry import DATASETS

        cfg = {
            # the REGISTRY key, not __name__: disk loaders register under
            # the reference's camelCase config names (e.g.
            # ``sevenScenesDataset``) which from_config resolves
            "dataset_cls": DATASETS.name_of(type(self)) or type(self).__name__,
            "root": self.root,
            "split": self.split,
            "clip_length": self.clip_length,
            "clip_overlap": self.clip_overlap,
            "input_size": list(self.input_resize.size) if self.input_resize else None,
            "target_size": list(self.target_resize.size) if self.target_resize else None,
        }
        cfg.update(self.config_extras())
        os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
        with open(path, "w") as f:
            json.dump(cfg, f, indent=2)

    def config_extras(self) -> Dict:
        """Subclass hook: extra constructor kwargs save_config should keep."""
        return {}

    @staticmethod
    def from_config(path: str) -> "ClipDataset":
        """Reconstruct a dataset from a ``save_config`` JSON via the
        registry (reference: dataset.py:246-255)."""
        from unigeo_tpu.registry import get_dataset_cls

        with open(path) as f:
            cfg = json.load(f)
        cls = get_dataset_cls(cfg.pop("dataset_cls"))
        return cls(**cfg)

    # ------------------------------------------------------------------
    # subclass hooks
    # ------------------------------------------------------------------

    def list_scenes(self, split: str) -> List[str]:
        raise NotImplementedError

    def load_scene_index(self, scene_name: str) -> SceneIndex:
        raise NotImplementedError

    def load_image(self, path: str) -> np.ndarray:
        """RGB file → [3, H, W] float32 0..255 (reference: scannetpp.py:108-112)."""
        from PIL import Image

        img = np.asarray(Image.open(path).convert("RGB"), dtype=np.float32)
        return img.transpose(2, 0, 1)

    def load_depth(self, path: str) -> np.ndarray:
        """Depth file → [H, W] float32 meters."""
        from PIL import Image

        depth = np.asarray(Image.open(path), dtype=np.float32)
        return depth / self.depth_scale

    def load_normal(self, path: str) -> np.ndarray:
        """Normal map file → [3, H, W] float32 in [-1, 1], OpenGL camera frame.

        Zero-vector pixels (all channels < 1e-3 in the uint8 encoding) are
        masked to 0 (reference: scannetpp.py:115-122).
        """
        from PIL import Image

        raw = np.asarray(Image.open(path), dtype=np.float32)
        invalid = np.all(raw < 1e-3, axis=2)
        normal = raw / 255.0 * 2.0 - 1.0
        normal[invalid] = 0
        return normal.astype(np.float32).transpose(2, 0, 1)

    @staticmethod
    def _resize_rgb_clip(images: np.ndarray, h: int, w: int) -> np.ndarray:
        """PIL-bicubic resize of a [Nf,3,H,W] 0-255 float clip to (h, w),
        applied to the uint8 image exactly as the reference does
        (scannetv2.py:108-114: ``Image.open(...).resize((640, 480))`` —
        RGB resized to the depth resolution, intrinsics NOT adjusted since
        they are the depth intrinsics already)."""
        from PIL import Image

        out = []
        for img in images:
            pil = Image.fromarray(np.moveaxis(img, 0, -1).astype(np.uint8))
            out.append(
                np.asarray(pil.resize((w, h)), dtype=np.float32)
                .transpose(2, 0, 1)
            )
        return np.stack(out)

    # ------------------------------------------------------------------
    # clip assembly
    # ------------------------------------------------------------------

    def _native_clip(self, kind: str, paths: List[str]):
        """Decode a whole clip in one native (C++ thread-pool) call.

        Returns None — caller falls back to the per-frame Python reader —
        when (a) the native library is unavailable/disabled, (b) the
        subclass overrides the stock per-frame reader (custom on-disk
        format, e.g. Sintel .dpt or NeuralRGBD nan handling), or (c) the
        native decoder rejects the files (unsupported encoding, mixed
        dims).  Behavior is bit-identical either way
        (tests/test_native_io.py)."""
        override = {
            "rgb": type(self).load_image is not ClipDataset.load_image,
            "depth": type(self).load_depth is not ClipDataset.load_depth,
            "normal": type(self).load_normal is not ClipDataset.load_normal,
        }[kind]
        if override:
            return None
        from unigeo_tpu import native

        if not native.available():
            return None
        try:
            if kind == "rgb":
                return native.decode_clip_rgb(paths)
            if kind == "depth":
                return native.decode_clip_depth(paths, self.depth_scale)
            return native.decode_clip_normal(paths)
        except native.NativeIOError:
            return None

    def __getitem__(self, index: int) -> Dict:
        rec = self.samples[index]
        scene = self._scene(rec["scene"])
        ids = rec["frame_ids"]

        rgb_paths = [self._abs(scene.rgb_paths[i]) for i in ids]
        images = self._native_clip("rgb", rgb_paths)
        if images is None:
            images = np.stack([self.load_image(p) for p in rgb_paths])
        intrinsics = scene.intrinsics[ids].copy()
        extrinsics = scene.extrinsics[ids].copy()

        depth_paths = [self._abs(scene.depth_paths[i]) for i in ids]
        depths = self._native_clip("depth", depth_paths)
        if depths is None:
            depths = [self.load_depth(p) for p in depth_paths]
        if self.rgb_match_depth_resolution:
            dh, dw = np.asarray(depths[0]).shape[-2:]
            if images.shape[-2:] != (dh, dw):
                images = self._resize_rgb_clip(images, dh, dw)
        cam_coord = np.stack(
            [self._depth_to_gl_points(d, intrinsics[k]) for k, d in enumerate(depths)]
        )  # [Nf,3,H,W] OpenGL camera points

        if self.native_normals and scene.normal_paths is not None:
            normal_paths = [self._abs(scene.normal_paths[i]) for i in ids]
            cam_normal = self._native_clip("normal", normal_paths)
            if cam_normal is None:
                cam_normal = np.stack([self.load_normal(p) for p in normal_paths])
        elif self.compute_normals_if_missing:
            from unigeo_tpu.ops.normals import surface_normals_from_points

            pts_last = np.moveaxis(cam_coord, 1, -1)  # [Nf,H,W,3]
            nrm = np.asarray(surface_normals_from_points(pts_last))
            cam_normal = np.moveaxis(nrm, -1, 1).astype(np.float32)
        else:
            cam_normal = np.zeros_like(cam_coord)

        sample = {
            "scene_name": rec["scene"].replace("/", "_"),
            "images": images,
            "image_names": [osp.basename(scene.rgb_paths[i]) for i in ids],
            "intrinsics": intrinsics,
            "extrinsics": extrinsics,
            "cam_coord": cam_coord,
            "cam_normal": cam_normal,
            "keyview_idx": 0,
            "_index": index,
            "_dataset": self.name,
        }
        sample = self.postprocess(sample)
        if self.input_resize is not None:
            sample = self.input_resize(sample)
        if self.target_resize is not None:
            sample = self.target_resize(sample)
        return sample

    def _abs(self, path: str) -> str:
        return path if osp.isabs(path) or self.root is None else osp.join(self.root, path)

    def _depth_to_gl_points(self, depth: np.ndarray, K: np.ndarray) -> np.ndarray:
        """[H,W] depth → [3,H,W] OpenGL camera points
        (reference: scannetpp.py:125-131)."""
        pos = backproject_to_cv_position(depth, K)  # [H,W,3] OpenCV
        pos = coords.flip_yz_channels_last(pos)  # → OpenGL
        return np.moveaxis(pos, -1, 0).astype(np.float32)

    def postprocess(self, sample: Dict) -> Dict:
        """Rebase geometry to the keyview and build validity masks.

        (reference: scannetpp.py:137-187)
        """
        key = sample["keyview_idx"]
        extr = sample["extrinsics"]  # [Nf,4,4] w2c GL
        ref_pose = extr[key]
        trans = np.stack(
            [coords.relative_transform(ref_pose, extr[i]) for i in range(len(extr))]
        )  # [Nf,4,4] src-cam → keyview

        cam_coord = sample["cam_coord"]  # [Nf,3,H,W]
        cam_normal = sample["cam_normal"]
        nf, _, h, w = cam_coord.shape

        R = trans[:, :3, :3]
        t = trans[:, :3, 3]
        cc = cam_coord.reshape(nf, 3, -1)
        cn = cam_normal.reshape(nf, 3, -1)
        world_coord = (R @ cc + t[..., None]).reshape(nf, 3, h, w)
        world_normal = (R @ cn).reshape(nf, 3, h, w)

        invalid = np.isnan(cam_normal).any(axis=1) | np.isnan(cam_coord).any(axis=1)
        depth = -cam_coord[:, 2]  # OpenGL: depth = -z
        depth = np.nan_to_num(depth)
        dmin, dmax = self.depth_clamp
        invalid |= (depth < dmin) | (depth > dmax)

        inv4 = invalid[:, None]
        cam_normal = np.where(inv4, 0.0, np.nan_to_num(cam_normal)).astype(np.float32)
        cam_coord = np.where(inv4, 0.0, np.nan_to_num(cam_coord)).astype(np.float32)
        world_normal = np.where(inv4, 0.0, np.nan_to_num(world_normal)).astype(np.float32)
        world_coord = np.where(inv4, 0.0, np.nan_to_num(world_coord)).astype(np.float32)

        sample.update(
            cam_coord=cam_coord,
            cam_normal=cam_normal,
            world_coord=world_coord,
            world_normal=world_normal,
            mask=(~invalid).astype(np.float32),
            extrinsics=coords.rebase_to_keyview(extr, key).astype(np.float32),
        )
        return sample
