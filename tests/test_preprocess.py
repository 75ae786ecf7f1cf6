"""Tests for the offline preprocessors: rasterizer and depth registration."""

import numpy as np

from unigeo_tpu.preprocess.rasterizer import (
    compute_vertex_normals,
    rasterize_mesh,
    read_ply_mesh,
)
from unigeo_tpu.preprocess.sevenscenes import register_depth_to_rgb, DEPTH_K


def _quad_mesh(z=2.0, size=1.0):
    """A camera-facing quad at depth z."""
    verts = np.array(
        [[-size, -size, z], [size, -size, z], [size, size, z], [-size, size, z]],
        np.float32,
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    return verts, faces


def test_rasterize_flat_quad():
    verts, faces = _quad_mesh(z=2.0)
    K = np.array([[50.0, 0, 32], [0, 50.0, 32], [0, 0, 1]], np.float32)
    depth, normal = rasterize_mesh(verts, faces, np.eye(4, dtype=np.float32), K, 64, 64)
    hit = depth > 0
    assert hit.mean() > 0.3  # quad covers the image center
    assert np.allclose(depth[hit], 2.0, atol=1e-3)
    # normal faces the camera: quad normal ±z → camera-facing = -z (world)
    n = normal[hit]
    assert np.allclose(np.abs(n[:, 2]), 1.0, atol=1e-4)
    assert (n[:, 2] < 0).all()


def test_rasterize_occlusion():
    """A nearer triangle must win the z-buffer."""
    v1, f1 = _quad_mesh(z=2.0)
    v2, f2 = _quad_mesh(z=1.0, size=0.3)
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + 4])
    K = np.array([[50.0, 0, 32], [0, 50.0, 32], [0, 0, 1]], np.float32)
    depth, _ = rasterize_mesh(verts, faces, np.eye(4, dtype=np.float32), K, 64, 64)
    assert np.isclose(depth[32, 32], 1.0, atol=1e-3)  # center: near quad
    # (12, 32) is inside the far quad's ±25px footprint but outside the near
    # quad's ±15px footprint
    assert np.isclose(depth[12, 32], 2.0, atol=1e-3)


def test_vertex_normals_sphere_direction():
    # regular lat-long sphere: area-weighted vertex normals point radially
    n_lat, n_lon = 16, 32
    lat = np.linspace(0.1, np.pi - 0.1, n_lat)
    lon = np.linspace(0, 2 * np.pi, n_lon, endpoint=False)
    pts = np.stack(
        [
            np.outer(np.sin(lat), np.cos(lon)),
            np.outer(np.sin(lat), np.sin(lon)),
            np.outer(np.cos(lat), np.ones(n_lon)),
        ],
        axis=-1,
    ).reshape(-1, 3)
    faces = []
    for i in range(n_lat - 1):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces += [[a, b, c], [b, d, c]]
    normals = compute_vertex_normals(
        pts.astype(np.float32), np.asarray(faces, np.int64)
    )
    dots = np.abs(np.sum(normals * pts, axis=1))
    assert (dots > 0.95).mean() > 0.95


def test_ply_roundtrip(tmp_path):
    verts, faces = _quad_mesh()
    # write ascii ply
    path = tmp_path / "mesh.ply"
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for face in faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")
    v2, f2 = read_ply_mesh(str(path))
    assert np.allclose(v2, verts)
    assert np.array_equal(f2, faces)


def test_depth_registration_identity_rig():
    """With an identity rig transform and equal intrinsics, registration is
    (nearly) the identity on a smooth depth map."""
    h, w = 480, 640
    depth = np.full((h, w), 2000, np.uint16)  # 2 m plane
    out = register_depth_to_rgb(
        depth, depth_K=DEPTH_K, rgb_K=DEPTH_K, depth_to_rgb=np.eye(4, dtype=np.float32)
    )
    valid = out > 0
    assert valid.mean() > 0.99
    assert np.allclose(out[valid], 2000, atol=1)


def test_depth_registration_shifts_points():
    """A rig translation in +x shifts reprojected pixels left."""
    h, w = 120, 160
    K = np.array([[100.0, 0, 80], [0, 100.0, 60], [0, 0, 1]], np.float32)
    rig = np.eye(4, dtype=np.float32)
    rig[0, 3] = 0.1  # 10 cm baseline
    depth = np.zeros((h, w), np.uint16)
    depth[60, 80] = 1000  # single point at 1 m on the axis
    out = register_depth_to_rgb(depth, depth_K=K, rgb_K=K, depth_to_rgb=rig)
    ys, xs = np.nonzero(out)
    assert len(xs) == 1
    assert xs[0] == 90  # 0.1 m * 100 px / 1 m = +10 px
    assert ys[0] == 60


def test_process_scene_dslr_end_to_end(tmp_path):
    """Full DSLR preprocessing on a synthetic scene: PLY mesh + COLMAP text
    model + fisheye JPEGs → undistorted webp RGB, mm-uint16 depth, normal
    maps, scene_metadata.npz with c2w trajectories and the undistorted K."""
    import os.path as osp

    from PIL import Image

    from unigeo_tpu.preprocess.rasterizer import write_ply_mesh
    from unigeo_tpu.preprocess.scannetpp import process_scene_dslr

    scene = tmp_path / "scene0"
    (scene / "scans").mkdir(parents=True)
    (scene / "dslr" / "colmap").mkdir(parents=True)
    (scene / "dslr" / "images").mkdir(parents=True)

    # camera-facing quad at z = 2
    verts = np.array(
        [[-2, -2, 2.0], [2, -2, 2.0], [2, 2, 2.0], [-2, 2, 2.0]], np.float32
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    write_ply_mesh(str(scene / "scans" / "mesh_aligned_0.05.ply"), verts, faces)

    w, h = 64, 48
    (scene / "dslr" / "colmap" / "cameras.txt").write_text(
        f"# cams\n1 OPENCV_FISHEYE {w} {h} 40.0 40.0 {w/2+0.5} {h/2+0.5} "
        "0.03 -0.005 0.0 0.0\n"
    )
    (scene / "dslr" / "colmap" / "images.txt").write_text(
        "# imgs\n"
        "1 1 0 0 0 0 0 0 1 DSC00001.JPG\n"
        "\n"
        "2 1 0 0 0 0.1 0 0 1 DSC00002.JPG\n"
        "\n"
    )
    (scene / "dslr" / "colmap" / "points3D.txt").write_text("# none\n")
    for name in ("DSC00001.JPG", "DSC00002.JPG"):
        Image.fromarray(
            np.full((h, w, 3), 128, np.uint8)
        ).save(scene / "dslr" / "images" / name)

    out = tmp_path / "out"
    n = process_scene_dslr(str(scene), str(out), verbose=False)
    assert n == 2

    meta = np.load(out / "scene_metadata.npz")
    assert meta["trajectories"].shape == (2, 4, 4)
    assert meta["intrinsics"].shape == (2, 3, 3)
    # image 2's w2c translation (0.1, 0, 0) → c2w x = -0.1
    assert np.isclose(meta["trajectories"][1][0, 3], -0.1, atol=1e-6)

    depth = np.asarray(
        Image.open(out / "depth" / "DSC00001.png"), np.uint16
    )
    hit = depth > 0
    assert hit.mean() > 0.5  # quad spans the view
    assert np.allclose(depth[hit] / 1000.0, 2.0, atol=2e-3)
    assert osp.isfile(out / "images" / "DSC00001.webp")
    assert osp.isfile(out / "normal" / "DSC00001.webp")
