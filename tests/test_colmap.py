"""COLMAP text parsing + native undistortion (preprocess/colmap.py).

Covers the reference's DSLR path (dataset/scannetpp/preprocess_scannetpp_
imu.py:194-322): cameras/images/points3D parsing, q/t → c2w poses, COLMAP↔
OpenCV principal-point offset, fisheye forward/inverse distortion, and
image undistortion correctness on a synthetic scene.
"""

import numpy as np
import pytest

from unigeo_tpu.preprocess.colmap import (
    ColmapCamera,
    colmap_to_opencv_intrinsics,
    distort_fisheye,
    distort_opencv,
    estimate_new_camera_fisheye,
    get_frame_number,
    load_colmap_model,
    opencv_to_colmap_intrinsics,
    pose_from_qwxyz_txyz,
    quat_to_rotmat,
    remap_bilinear,
    undistort_image,
    undistort_rectify_map,
    _undistort_points_fisheye,
)


@pytest.fixture
def sfm_dir(tmp_path):
    (tmp_path / "cameras.txt").write_text(
        "# Camera list with one line of data per camera:\n"
        "#   CAMERA_ID, MODEL, WIDTH, HEIGHT, PARAMS[]\n"
        "# Number of cameras: 2\n"
        "1 OPENCV_FISHEYE 64 48 40.0 40.0 32.0 24.0 0.05 -0.01 0.002 -0.0005\n"
        "2 PINHOLE 64 48 50.0 50.0 32.0 24.0\n"
    )
    # identity rotation at origin + a 90° yaw at (1, 2, 3)
    (tmp_path / "images.txt").write_text(
        "# Image list with two lines of data per image\n"
        "1 1 0 0 0 0 0 0 1 DSC00001.JPG\n"
        "10.5 20.25 7 30.0 40.0 -1\n"
        "2 0.7071068 0 0.7071068 0 1 2 3 2 DSC00002.JPG\n"
        "\n"
    )
    (tmp_path / "points3D.txt").write_text(
        "# 3D point list\n"
        "7 1.0 2.0 3.0 255 0 0 0.5 1 0 2 1\n"
    )
    return str(tmp_path)


def test_parse_colmap_model(sfm_dir):
    cams, imgs, pts = load_colmap_model(sfm_dir)
    assert cams[1].model == "OPENCV_FISHEYE"
    assert (cams[1].width, cams[1].height) == (64, 48)
    assert np.allclose(cams[1].params[:4], [40, 40, 32, 24])
    assert cams[2].model == "PINHOLE"

    assert imgs[1].name == "DSC00001.JPG"
    assert imgs[1].camera_id == 1
    assert np.allclose(imgs[1].xys, [[10.5, 20.25], [30.0, 40.0]])
    assert imgs[1].point3d_ids.tolist() == [7, -1]  # -1 = unmatched obs
    # identity pose → c2w identity
    assert np.allclose(imgs[1].cam_to_world, np.eye(4))
    # image 2: w2c = (R, t) → c2w = (Rᵀ, -Rᵀ t)
    R = quat_to_rotmat(np.array([0.7071068, 0, 0.7071068, 0]))
    c2w = imgs[2].cam_to_world
    assert np.allclose(c2w[:3, :3], R.T, atol=1e-6)
    assert np.allclose(c2w[:3, 3], -R.T @ [1, 2, 3], atol=1e-6)

    assert np.allclose(pts[7], [1, 2, 3])
    assert get_frame_number("DSC00042.JPG") == 42


def test_quat_to_rotmat_properties(rng):
    q = rng.normal(size=4)
    R = quat_to_rotmat(q)
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.isclose(np.linalg.det(R), 1.0)
    # identity and 180° about z
    assert np.allclose(quat_to_rotmat(np.array([1, 0, 0, 0])), np.eye(3))
    assert np.allclose(
        quat_to_rotmat(np.array([0, 0, 0, 1.0])),
        np.diag([-1.0, -1.0, 1.0]),
        atol=1e-12,
    )


def test_intrinsics_convention_roundtrip():
    K = np.array([[40.0, 0, 32.0], [0, 40.0, 24.0], [0, 0, 1]])
    K2 = opencv_to_colmap_intrinsics(colmap_to_opencv_intrinsics(K))
    assert np.allclose(K, K2)
    assert colmap_to_opencv_intrinsics(K)[0, 2] == 31.5


def test_fisheye_distortion_inverse(rng):
    dist = np.array([0.03, -0.008, 0.001, -0.0002])
    xy = rng.uniform(-0.6, 0.6, size=(50, 2))
    d = distort_fisheye(xy, dist)
    back = _undistort_points_fisheye(d, dist)
    assert np.abs(back - xy).max() < 1e-9
    # zero distortion: equidistant model still maps r → atan(r)
    d0 = distort_fisheye(xy, np.zeros(4))
    r = np.linalg.norm(xy, axis=-1, keepdims=True)
    assert np.allclose(d0, xy * np.arctan(r) / r, atol=1e-12)


def test_opencv_distortion_zero_is_identity(rng):
    xy = rng.uniform(-0.5, 0.5, size=(20, 2))
    assert np.allclose(distort_opencv(xy, np.zeros(5)), xy)
    # pure k1 shrinks/expands radially
    d = distort_opencv(xy, np.array([0.1, 0, 0, 0]))
    assert np.allclose(
        d, xy * (1 + 0.1 * np.sum(xy**2, -1, keepdims=True)), atol=1e-12
    )


def test_undistort_map_identity_for_pinhole():
    K = np.array([[50.0, 0, 32.0], [0, 50.0, 24.0], [0, 0, 1]])
    m = undistort_rectify_map(K, np.zeros(4), K, (64, 48), "PINHOLE")
    xs, ys = np.meshgrid(np.arange(64.0), np.arange(48.0))
    assert np.abs(m[..., 0] - xs).max() < 1e-5
    assert np.abs(m[..., 1] - ys).max() < 1e-5


def test_remap_bilinear_shifts():
    img = np.arange(12.0).reshape(3, 4)
    # shift by (+1, 0): out(y, x) = img(y, x+1)
    xs, ys = np.meshgrid(np.arange(4.0) + 1, np.arange(3.0))
    out = remap_bilinear(img, np.stack([xs, ys], -1), fill=-1)
    assert np.allclose(out[:, :2], img[:, 1:3])
    assert (out[:, -1] == -1).all()  # out of bounds → fill


def test_undistort_image_fisheye_straightens_lines():
    """Rendering a vertical line through a fisheye camera bends it; after
    undistortion with the estimated new K it must be straight again."""
    w, h = 96, 72
    fx = fy = 60.0
    cx, cy = w / 2, h / 2
    dist = np.array([0.08, -0.02, 0.004, -0.001])
    cam = ColmapCamera(
        1, "OPENCV_FISHEYE", w, h,
        np.array([fx, fy, cx + 0.5, cy + 0.5, *dist]),
    )

    # synthesize the distorted image of a bright world plane stripe at
    # x_norm = 0.25: for each distorted pixel, undo the distortion and
    # evaluate the stripe in undistorted normalized coords
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64))
    xy_d = np.stack([(xs - cx) / fx, (ys - cy) / fy], -1)
    xy_u = _undistort_points_fisheye(xy_d, dist)
    stripe = (np.abs(xy_u[..., 0] - 0.25) < 0.02).astype(np.float32)

    newK, und, mask = undistort_image(cam, stripe)
    newK_cv = colmap_to_opencv_intrinsics(newK)
    # the stripe must now be a vertical line at x = fx'·0.25 + cx'
    col = newK_cv[0, 0] * 0.25 + newK_cv[0, 2]
    cols = np.where((und > 0.5) & mask)
    assert cols[1].size > 50
    assert np.abs(cols[1].mean() - col) < 1.5
    assert cols[1].std() < 2.0  # straight: all lit pixels in a narrow band


def test_estimate_new_camera_centers_principal():
    K = np.array([[60.0, 0, 48.0], [0, 60.0, 36.0], [0, 0, 1]])
    dist = np.array([0.08, -0.02, 0.004, -0.001])
    newK = estimate_new_camera_fisheye(K, dist, (96, 72), balance=0.0)
    assert newK[0, 2] == 48.0 and newK[1, 2] == 36.0
    assert newK[0, 0] > 0
