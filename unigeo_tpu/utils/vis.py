"""Visualization: PLY export, depth/normal strips, colormapping.

(reference: utils/vis_utils.py — ply with y,z flip at :20-34, webp strips
with Spectral_r colormap at :38-84, colorize at :88-231)
"""

from __future__ import annotations

import os
import struct
from typing import Optional

import numpy as np


def save_point_cloud(points: np.ndarray, colors: Optional[np.ndarray], path: str):
    """Write a binary-little-endian PLY.

    Flips y,z on export like the reference (vis_utils.py:27-29) so external
    viewers see the cloud in the expected orientation.
    """
    pts = np.asarray(points, np.float32).reshape(-1, 3).copy()
    pts[:, 1:] *= -1
    n = pts.shape[0]
    has_color = colors is not None
    if has_color:
        cols = np.asarray(colors).reshape(-1, 3)
        if cols.dtype != np.uint8:
            cols = np.clip(cols * 255.0 if cols.max() <= 1.0 + 1e-6 else cols, 0, 255).astype(
                np.uint8
            )
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
    header += [f"property float {ax}" for ax in "xyz"]
    if has_color:
        header += [f"property uchar {c}" for c in ("red", "green", "blue")]
    header += ["end_header"]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        if has_color:
            rec = np.zeros(
                n,
                dtype=[("xyz", np.float32, 3), ("rgb", np.uint8, 3)],
            )
            rec["xyz"] = pts
            rec["rgb"] = cols
            f.write(rec.tobytes())
        else:
            f.write(pts.astype("<f4").tobytes())


def load_point_cloud(path: str):
    """Minimal PLY reader (binary-LE written by save_point_cloud)."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode().strip()
            header.append(line)
            if line == "end_header":
                break
        n = int(next(h for h in header if h.startswith("element vertex")).split()[-1])
        has_color = any("uchar" in h for h in header)
        if has_color:
            rec = np.frombuffer(
                f.read(n * 15), dtype=[("xyz", np.float32, 3), ("rgb", np.uint8, 3)]
            )
            return rec["xyz"].copy(), rec["rgb"].copy()
        pts = np.frombuffer(f.read(n * 12), dtype="<f4").reshape(n, 3)
        return pts.copy(), None


def colorize(
    value: np.ndarray,
    vmin: Optional[float] = None,
    vmax: Optional[float] = None,
    cmap: str = "Spectral_r",
) -> np.ndarray:
    """[H,W] scalar map → [H,W,3] uint8 colormapped (reference default
    Spectral_r, vis_utils.py:88-120)."""
    import matplotlib

    value = np.asarray(value, np.float32)
    vmin = float(np.nanmin(value)) if vmin is None else vmin
    vmax = float(np.nanmax(value)) if vmax is None else vmax
    norm = (value - vmin) / max(vmax - vmin, 1e-8)
    rgba = matplotlib.colormaps[cmap](np.clip(norm, 0, 1))
    return (rgba[..., :3] * 255).astype(np.uint8)


def normal_to_rgb(normal: np.ndarray) -> np.ndarray:
    """[H,W,3] unit normals in [-1,1] → uint8 visualization."""
    return ((np.clip(normal, -1, 1) + 1.0) * 0.5 * 255).astype(np.uint8)


def save_depth_normal_maps(depths, normals, save_dir: str, rgbs=None):
    """Per-frame RGB | depth | normal strips (reference: vis_utils.py:38-84)."""
    from PIL import Image

    os.makedirs(save_dir, exist_ok=True)
    depths = None if depths is None else np.asarray(depths)
    normals = None if normals is None else np.asarray(normals)
    rgbs = None if rgbs is None else np.asarray(rgbs)
    nf = len(depths) if depths is not None else len(normals)
    vmin = float(np.nanmin(depths)) if depths is not None else 0.0
    vmax = float(np.nanmax(depths)) if depths is not None else 1.0
    for i in range(nf):
        panels = []
        if rgbs is not None:
            panels.append((np.clip(rgbs[i], 0, 1) * 255).astype(np.uint8))
        if depths is not None:
            panels.append(colorize(depths[i], vmin, vmax))
        if normals is not None:
            panels.append(normal_to_rgb(normals[i]))
        strip = np.concatenate(panels, axis=1)
        Image.fromarray(strip).save(os.path.join(save_dir, f"{i:04d}.webp"))


# ---------------------------------------------------------------------------
# Generic tensor→image visualization (the robustmvd vis library surface the
# reference carries in dataset_core/utils/vis.py:165-379: colormapping with
# range handling, text overlay, batch tiling into one mosaic).
# ---------------------------------------------------------------------------

def vis_2d_array(
    arr: np.ndarray,
    cmap: str = "Spectral_r",
    vmin: Optional[float] = None,
    vmax: Optional[float] = None,
    mask: Optional[np.ndarray] = None,
) -> np.ndarray:
    """[H, W] scalar array → [H, W, 3] uint8 via a matplotlib colormap.

    Range defaults to the finite (and masked-in) data extent; NaN/inf and
    masked-out pixels render black (reference vis.py's invalid handling).
    """
    a = np.asarray(arr, np.float64)
    valid = np.isfinite(a)
    if mask is not None:
        valid &= np.asarray(mask) > 0
    if vmin is None:
        vmin = float(a[valid].min()) if valid.any() else 0.0
    if vmax is None:
        vmax = float(a[valid].max()) if valid.any() else 1.0
    rgb = colorize(np.where(valid, a, vmin), vmin=vmin, vmax=vmax, cmap=cmap)
    rgb = np.where(valid[..., None], rgb, 0)
    return rgb.astype(np.uint8)


def vis_image(img: np.ndarray) -> np.ndarray:
    """Any image-ish tensor → [H, W, 3] uint8: accepts [3,H,W] or [H,W,3] or
    [H,W], float 0..1 / 0..255 or uint8."""
    a = np.asarray(img)
    if a.ndim == 3 and a.shape[0] in (1, 3) and a.shape[-1] not in (1, 3):
        a = np.moveaxis(a, 0, -1)
    if a.ndim == 2:
        a = np.repeat(a[..., None], 3, axis=-1)
    if a.shape[-1] == 1:
        a = np.repeat(a, 3, axis=-1)
    if a.dtype != np.uint8:
        amax = np.nanmax(a) if a.size else 1.0
        scale = 255.0 if amax <= 1.0 + 1e-6 else 1.0
        a = np.clip(np.nan_to_num(a) * scale, 0, 255).astype(np.uint8)
    return a


def overlay_text(img: np.ndarray, text: str, color=(255, 255, 255)) -> np.ndarray:
    """Draw a small label into the top-left corner (PIL default font)."""
    from PIL import Image, ImageDraw

    im = Image.fromarray(vis_image(img))
    ImageDraw.Draw(im).text((2, 2), text, fill=tuple(color))
    return np.asarray(im)


def tile_images(
    images,
    cols: Optional[int] = None,
    labels=None,
    pad: int = 2,
    pad_value: int = 0,
) -> np.ndarray:
    """Tile a list/batch of images into one [H', W', 3] uint8 mosaic
    (reference vis.py's batch tiling).  Images may differ in size; each cell
    is padded to the max tile size."""
    imgs = [vis_image(im) for im in images]
    if labels is not None:
        imgs = [overlay_text(im, str(lb)) for im, lb in zip(imgs, labels)]
    n = len(imgs)
    if n == 0:
        return np.zeros((1, 1, 3), np.uint8)
    cols = cols or int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    th = max(im.shape[0] for im in imgs) + pad
    tw = max(im.shape[1] for im in imgs) + pad
    out = np.full((rows * th + pad, cols * tw + pad, 3), pad_value, np.uint8)
    for i, im in enumerate(imgs):
        r, c = divmod(i, cols)
        y, x = r * th + pad, c * tw + pad
        out[y : y + im.shape[0], x : x + im.shape[1]] = im
    return out
