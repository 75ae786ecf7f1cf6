"""COLMAP text-model parsing + camera undistortion (native numpy).

The reference's ScanNet++ preprocessor has a DSLR path that loads a COLMAP
sparse reconstruction (cameras.txt / images.txt / points3D.txt) and
undistorts OPENCV_FISHEYE / OPENCV camera images before rendering GT
(reference: dataset/scannetpp/preprocess_scannetpp_imu.py:194-322, using
cv2.fisheye).  cv2 is not a dependency here; the distortion models are
implemented directly:

  * OPENCV_FISHEYE (equidistant): theta_d = theta·(1 + k1·θ² + k2·θ⁴ +
    k3·θ⁶ + k4·θ⁸) — the undistort map is the FORWARD distortion evaluated
    on the target grid (same construction as cv2.fisheye.
    initUndistortRectifyMap: target pixel → normalized ray → distort →
    source pixel).
  * OPENCV (pinhole + radial/tangential): k1, k2, p1, p2[, k3].

COLMAP convention notes: intrinsics place the origin at the pixel CORNER
(cx ≈ W/2), OpenCV at the pixel CENTER — colmap_to_opencv_intrinsics shifts
the principal point by -0.5 (reference: metrics/geometry.py:235-258 carries
the same pair of helpers).  images.txt stores world-to-camera as
(qw, qx, qy, qz, tx, ty, tz); pose_from_qwxyz_txyz returns camera-to-world.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------

@dataclass
class ColmapCamera:
    camera_id: int
    model: str  # PINHOLE | OPENCV | OPENCV_FISHEYE | ...
    width: int
    height: int
    params: np.ndarray  # model-specific: fx fy cx cy [distortion...]


@dataclass
class ColmapImage:
    image_id: int
    camera_id: int
    name: str
    qvec: np.ndarray  # (qw, qx, qy, qz) world-to-camera rotation
    tvec: np.ndarray  # (tx, ty, tz) world-to-camera translation
    xys: np.ndarray = field(default_factory=lambda: np.zeros((0, 2)))
    point3d_ids: np.ndarray = field(default_factory=lambda: np.zeros((0,), np.int64))

    @property
    def cam_to_world(self) -> np.ndarray:
        return pose_from_qwxyz_txyz(self.qvec, self.tvec)


def _data_lines(path: str) -> List[str]:
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip() and not ln.startswith("#")]


def read_cameras_text(path: str) -> Dict[int, ColmapCamera]:
    cams = {}
    for ln in _data_lines(path):
        parts = ln.split()
        cam = ColmapCamera(
            camera_id=int(parts[0]),
            model=parts[1],
            width=int(parts[2]),
            height=int(parts[3]),
            params=np.array([float(p) for p in parts[4:]]),
        )
        cams[cam.camera_id] = cam
    return cams


def read_images_text(path: str) -> Dict[int, ColmapImage]:
    # keep EMPTY lines: an image with no 2D observations still has its
    # (blank) points line, and dropping it would break the 2-line pairing
    with open(path) as f:
        lines = [ln.rstrip("\n") for ln in f if not ln.startswith("#")]
    while lines and not lines[-1].strip():
        lines.pop()  # trailing newline at EOF is not a points line
    if len(lines) % 2:
        lines.append("")
    imgs = {}
    for meta, pts in zip(lines[0::2], lines[1::2]):
        parts = meta.split()
        img = ColmapImage(
            image_id=int(parts[0]),
            qvec=np.array([float(v) for v in parts[1:5]]),
            tvec=np.array([float(v) for v in parts[5:8]]),
            camera_id=int(parts[8]),
            name=parts[9],
        )
        vals = pts.split()
        if vals:
            arr = np.array(vals, dtype=np.float64).reshape(-1, 3)
            img.xys = arr[:, :2]
            img.point3d_ids = arr[:, 2].astype(np.int64)
        imgs[img.image_id] = img
    return imgs


def read_points3d_text(path: str) -> Dict[int, np.ndarray]:
    pts = {}
    for ln in _data_lines(path):
        parts = ln.split()
        pts[int(parts[0])] = np.array([float(v) for v in parts[1:4]])
    return pts


def load_colmap_model(sfm_dir: str):
    """(cameras, images, points3D) from a COLMAP text model directory."""
    return (
        read_cameras_text(os.path.join(sfm_dir, "cameras.txt")),
        read_images_text(os.path.join(sfm_dir, "images.txt")),
        read_points3d_text(os.path.join(sfm_dir, "points3D.txt")),
    )


def get_frame_number(name: str) -> int:
    """'DSC01234.JPG' / 'frame_000123.jpg' → trailing integer."""
    m = re.findall(r"(\d+)", os.path.splitext(os.path.basename(name))[0])
    return int(m[-1]) if m else -1


# ---------------------------------------------------------------------------
# poses & intrinsics conventions
# ---------------------------------------------------------------------------

def quat_to_rotmat(q: np.ndarray) -> np.ndarray:
    """(qw, qx, qy, qz), not necessarily normalized → [3, 3]."""
    w, x, y, z = q / np.linalg.norm(q)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def pose_from_qwxyz_txyz(qvec: np.ndarray, tvec: np.ndarray) -> np.ndarray:
    """COLMAP world-to-camera (q, t) → camera-to-world 4x4."""
    w2c = np.eye(4)
    w2c[:3, :3] = quat_to_rotmat(np.asarray(qvec, np.float64))
    w2c[:3, 3] = np.asarray(tvec, np.float64)
    return np.linalg.inv(w2c)


def colmap_to_opencv_intrinsics(K: np.ndarray) -> np.ndarray:
    """COLMAP puts the origin at the corner of the first pixel, OpenCV at
    its center: shift the principal point by -0.5."""
    K = K.copy()
    K[0, 2] -= 0.5
    K[1, 2] -= 0.5
    return K


def opencv_to_colmap_intrinsics(K: np.ndarray) -> np.ndarray:
    K = K.copy()
    K[0, 2] += 0.5
    K[1, 2] += 0.5
    return K


# ---------------------------------------------------------------------------
# distortion models (forward: normalized undistorted → distorted)
# ---------------------------------------------------------------------------

def distort_fisheye(xy: np.ndarray, dist: np.ndarray) -> np.ndarray:
    """OPENCV_FISHEYE (equidistant) forward model on normalized coords
    [..., 2]: theta_d = θ(1 + k1θ² + k2θ⁴ + k3θ⁶ + k4θ⁸)."""
    k1, k2, k3, k4 = dist[:4]
    r = np.sqrt(np.sum(xy**2, axis=-1, keepdims=True))
    theta = np.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1 + k1 * t2 + k2 * t2**2 + k3 * t2**3 + k4 * t2**4)
    scale = np.where(r > 1e-8, theta_d / np.maximum(r, 1e-12), 1.0)
    return xy * scale


def distort_opencv(xy: np.ndarray, dist: np.ndarray) -> np.ndarray:
    """OPENCV (radial k1 k2 [k3] + tangential p1 p2) forward model."""
    d = np.zeros(5)
    d[: len(dist)] = dist
    k1, k2, p1, p2, k3 = d
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1 + k1 * r2 + k2 * r2**2 + k3 * r2**3
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return np.stack([xd, yd], axis=-1)


def _undistort_points_fisheye(pts: np.ndarray, dist: np.ndarray,
                              iters: int = 20) -> np.ndarray:
    """Invert distort_fisheye on normalized coords (fixed-point on theta)."""
    r_d = np.sqrt(np.sum(pts**2, axis=-1, keepdims=True))
    theta_d = r_d  # distorted radius IS theta_d in normalized fisheye coords
    k1, k2, k3, k4 = dist[:4]
    theta = theta_d.copy()
    for _ in range(iters):
        t2 = theta * theta
        theta = theta_d / (1 + k1 * t2 + k2 * t2**2 + k3 * t2**3 + k4 * t2**4)
    scale = np.where(r_d > 1e-8, np.tan(theta) / np.maximum(r_d, 1e-12), 1.0)
    return pts * scale


def estimate_new_camera_fisheye(
    K: np.ndarray, dist: np.ndarray, size_wh: Tuple[int, int],
    balance: float = 0.0, center_principal: bool = True,
) -> np.ndarray:
    """New pinhole K for the undistorted fisheye image.

    Undistorts the 4 edge midpoints (the cv2.fisheye estimator's probe
    points), fits focal between fmin (every probe inside) and fmax (probes
    fill the frame), blends by ``balance`` (0 = fmax, widest).  The
    reference then re-centers the principal point (preprocess_scannetpp_
    imu.py:305-307); center_principal=True bakes that in.
    """
    w, h = size_wh
    probes = np.array(
        [[w / 2, 0.0], [w, h / 2], [w / 2, h], [0.0, h / 2]]
    )
    norm = (probes - K[:2, 2]) / np.array([K[0, 0], K[1, 1]])
    und = _undistort_points_fisheye(norm, dist)
    cx, cy = und.mean(axis=0)
    span = np.abs(und - np.array([cx, cy]))
    half = np.array([w / 2, h / 2])
    # per-probe focal that would place it exactly on the image border
    with np.errstate(divide="ignore"):
        f_each = np.where(span > 1e-12, half / np.maximum(span, 1e-12), np.inf)
    f_each = f_each[np.isfinite(f_each).any(axis=-1)]
    fmin = np.min(f_each[np.isfinite(f_each)])
    fmax = np.max(f_each[np.isfinite(f_each)])
    f = balance * fmin + (1.0 - balance) * fmax
    newK = np.array(
        [[f, 0, w / 2 - cx * f], [0, f, h / 2 - cy * f], [0, 0, 1.0]]
    )
    if center_principal:
        newK[0, 2] = w / 2.0
        newK[1, 2] = h / 2.0
    return newK


def undistort_rectify_map(
    K: np.ndarray, dist: np.ndarray, new_K: np.ndarray,
    size_wh: Tuple[int, int], model: str,
) -> np.ndarray:
    """[H, W, 2] map: target (undistorted, new_K) pixel → source pixel
    (the cv2 initUndistortRectifyMap construction)."""
    w, h = size_wh
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64))
    xn = (xs - new_K[0, 2]) / new_K[0, 0]
    yn = (ys - new_K[1, 2]) / new_K[1, 1]
    xy = np.stack([xn, yn], axis=-1)
    if model == "OPENCV_FISHEYE":
        d = distort_fisheye(xy, dist)
    elif model in ("OPENCV", "PINHOLE"):
        d = distort_opencv(xy, dist if model == "OPENCV" else np.zeros(4))
    else:
        raise ValueError(f"unsupported camera model {model!r}")
    sx = d[..., 0] * K[0, 0] + K[0, 2]
    sy = d[..., 1] * K[1, 1] + K[1, 2]
    return np.stack([sx, sy], axis=-1).astype(np.float32)


def remap_bilinear(image: np.ndarray, src_map: np.ndarray,
                   fill: float = 0.0) -> np.ndarray:
    """Bilinear remap ([H, W(, C)] image, [Ho, Wo, 2] source coords)."""
    h, w = image.shape[:2]
    img = image if image.ndim == 3 else image[..., None]
    x = src_map[..., 0]
    y = src_map[..., 1]
    valid = (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1)
    # clamp the base cell BEFORE the fraction so exact border coords
    # (x == w-1) interpolate from the last cell with weight 1
    x0c = np.clip(np.floor(x), 0, w - 2).astype(np.int64)
    y0c = np.clip(np.floor(y), 0, h - 2).astype(np.int64)
    fx = np.clip(x - x0c, 0.0, 1.0)[..., None]
    fy = np.clip(y - y0c, 0.0, 1.0)[..., None]
    p00 = img[y0c, x0c].astype(np.float64)
    p01 = img[y0c, x0c + 1].astype(np.float64)
    p10 = img[y0c + 1, x0c].astype(np.float64)
    p11 = img[y0c + 1, x0c + 1].astype(np.float64)
    out = (
        p00 * (1 - fx) * (1 - fy)
        + p01 * fx * (1 - fy)
        + p10 * (1 - fx) * fy
        + p11 * fx * fy
    )
    out = np.where(valid[..., None], out, fill)
    return out if image.ndim == 3 else out[..., 0]


def undistort_image(
    camera: ColmapCamera, image: np.ndarray, balance: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Undistort one image (reference undistort_images, preprocess_scannetpp_
    imu.py:280-322): returns (new_K COLMAP-convention, undistorted image,
    validity mask)."""
    fx, fy, cx, cy = camera.params[:4]
    dist = camera.params[4:]
    K = colmap_to_opencv_intrinsics(
        np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    )
    size = (camera.width, camera.height)
    if camera.model == "OPENCV_FISHEYE":
        new_K = estimate_new_camera_fisheye(K, dist, size, balance=balance)
    else:
        new_K = K.copy()  # keep focal; distortion removed on the same frame
    src_map = undistort_rectify_map(K, dist, new_K, size, camera.model)
    und = remap_bilinear(image.astype(np.float32), src_map)
    mask = remap_bilinear(
        np.ones(image.shape[:2], np.float32), src_map, fill=0.0
    )
    return opencv_to_colmap_intrinsics(new_K), und, mask > 0.999
