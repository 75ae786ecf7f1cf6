"""Host-side clip transforms: resize inputs/targets, intrinsics rescale.

Mirrors dataset_core/transforms.py:38-110: images get bilinear resize with
intrinsics rescaled elementwise; geometric targets (cam/world coord+normal,
mask) get nearest-neighbor resize so values are never interpolated across
depth discontinuities.

Images resize through PIL (SIMD C path); targets use a pure-numpy
nearest-index gather with skimage's coordinate mapping
((i + 0.5) * orig/new - 0.5, rounded).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
from PIL import Image

from unigeo_tpu import coords


def _nearest_indices(new_len: int, orig_len: int) -> np.ndarray:
    src = (np.arange(new_len) + 0.5) * (orig_len / new_len) - 0.5
    return np.clip(np.round(src).astype(np.int64), 0, orig_len - 1)


def resize_nearest(arr: np.ndarray, size) -> np.ndarray:
    """Nearest-neighbor resize of the trailing two axes."""
    ht, wd = size
    oh, ow = arr.shape[-2:]
    if (oh, ow) == (ht, wd):
        return arr
    yi = _nearest_indices(ht, oh)
    xi = _nearest_indices(wd, ow)
    return arr[..., yi[:, None], xi[None, :]]


def resize_bilinear_chw(img: np.ndarray, size) -> np.ndarray:
    """Bilinear resize of a [C, H, W] float image via PIL."""
    ht, wd = size
    c, oh, ow = img.shape
    if (oh, ow) == (ht, wd):
        return img
    out = np.empty((c, ht, wd), dtype=np.float32)
    for i in range(c):
        ch = Image.fromarray(np.ascontiguousarray(img[i], dtype=np.float32), mode="F")
        out[i] = np.asarray(ch.resize((wd, ht), Image.BILINEAR), dtype=np.float32)
    return out


class ResizeInputs:
    """Resize stacked images [Nf,3,H,W] and rescale intrinsics.

    (reference: transforms.py:38-79)
    """

    def __init__(self, size):
        self.size = tuple(size)

    def __call__(self, sample: Dict) -> Dict:
        images = sample["images"]
        oh, ow = images.shape[-2:]
        if (oh, ow) != self.size:
            sample["images"] = np.stack(
                [resize_bilinear_chw(im, self.size) for im in images]
            )
            scale = coords.intrinsics_resize_scale((oh, ow), self.size)
            sample["intrinsics"] = sample["intrinsics"] * scale
        return sample


class ResizeTargets:
    """Nearest-resize of geometric targets (reference: transforms.py:82-110)."""

    ATTRS = ("cam_normal", "world_normal", "cam_coord", "world_coord", "mask")

    def __init__(self, size):
        self.size = tuple(size)

    def __call__(self, sample: Dict) -> Dict:
        for attr in self.ATTRS:
            if attr in sample:
                sample[attr] = np.ascontiguousarray(
                    resize_nearest(sample[attr], self.size)
                )
        return sample
