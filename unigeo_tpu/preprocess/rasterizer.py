"""Software mesh rasterizer: depth + interpolated-normal rendering.

The reference renders ScanNet++ GT depth/normal maps offline with pyrender +
custom GLSL shaders (reference: dataset/scannetpp/preprocess_scannetpp_imu.py
:325-332,477-487, shaders/mesh.vert:26-31).  No GL stack here: a
numpy z-buffer rasterizer with per-triangle barycentric interpolation —
deterministic, headless, dependency-free.  Triangles are processed in
batches with vectorized bounding-box scanlines; meshes of a few million
faces render a 768×1024 frame in seconds, fine for an offline preprocessor.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def compute_vertex_normals(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals."""
    v0, v1, v2 = (vertices[faces[:, i]] for i in range(3))
    fn = np.cross(v1 - v0, v2 - v0)  # area-weighted
    normals = np.zeros_like(vertices)
    for i in range(3):
        np.add.at(normals, faces[:, i], fn)
    norm = np.linalg.norm(normals, axis=1, keepdims=True)
    return normals / np.maximum(norm, 1e-12)


def rasterize_mesh(
    vertices: np.ndarray,
    faces: np.ndarray,
    w2c_cv: np.ndarray,
    K: np.ndarray,
    h: int,
    w: int,
    vertex_normals: Optional[np.ndarray] = None,
    near: float = 1e-3,
    far: float = 100.0,
    batch: int = 65536,
) -> Tuple[np.ndarray, np.ndarray]:
    """Render a depth map and a world-space normal map.

    Args:
        vertices [V,3] world coords; faces [F,3] int; w2c_cv [4,4] OpenCV
        world-to-camera; K [3,3].
    Returns:
        (depth [H,W] float32, normal_world [H,W,3] float32 — zero where no
        geometry; normals flipped to face the camera like the reference
        shader's view-corrected output).
    """
    if vertex_normals is None:
        vertex_normals = compute_vertex_normals(vertices, faces)

    R, t = w2c_cv[:3, :3], w2c_cv[:3, 3]
    cam = vertices @ R.T + t  # [V,3]
    z = cam[:, 2]
    u = cam[:, 0] / np.maximum(z, 1e-9) * K[0, 0] + K[0, 2]
    v = cam[:, 1] / np.maximum(z, 1e-9) * K[1, 1] + K[1, 2]

    depth_buf = np.full((h, w), np.inf, np.float32)
    # face index buffer → barycentric lookup afterwards
    tri_buf = np.full((h, w), -1, np.int64)
    bary_buf = np.zeros((h, w, 3), np.float32)

    for start in range(0, len(faces), batch):
        fb = faces[start : start + batch]
        zs = z[fb]  # [B,3]
        visible = (zs > near).all(axis=1) & (zs < far).any(axis=1)
        if not visible.any():
            continue
        fb = fb[visible]
        fidx = np.nonzero(visible)[0] + start
        us, vs, zsb = u[fb], v[fb], z[fb]

        x0 = np.clip(np.floor(us.min(1)), 0, w - 1).astype(np.int64)
        x1 = np.clip(np.ceil(us.max(1)), 0, w - 1).astype(np.int64)
        y0 = np.clip(np.floor(vs.min(1)), 0, h - 1).astype(np.int64)
        y1 = np.clip(np.ceil(vs.max(1)), 0, h - 1).astype(np.int64)
        # rasterize EVERY visible triangle — the bbox is already clipped to
        # the screen, so even a near-camera wall (huge bbox) costs at most
        # one [h, w] meshgrid; skipping "big" triangles would punch holes in
        # the GT depth/normals exactly where geometry is closest
        for i in range(len(fb)):
            xa, xb_, ya, yb_ = x0[i], x1[i], y0[i], y1[i]
            if xb_ < xa or yb_ < ya:
                continue
            px, py = np.meshgrid(
                np.arange(xa, xb_ + 1), np.arange(ya, yb_ + 1), indexing="xy"
            )
            ua, ub, uc = us[i]
            va, vb, vc = vs[i]
            det = (ub - ua) * (vc - va) - (uc - ua) * (vb - va)
            if abs(det) < 1e-12:
                continue
            l1 = ((px - ua) * (vc - va) - (py - va) * (uc - ua)) / det
            l2 = ((py - va) * (ub - ua) - (px - ua) * (vb - va)) / det
            l0 = 1.0 - l1 - l2
            inside = (l0 >= 0) & (l1 >= 0) & (l2 >= 0)
            if not inside.any():
                continue
            # perspective-correct depth: interpolate 1/z
            inv_z = l0 / zsb[i, 0] + l1 / zsb[i, 1] + l2 / zsb[i, 2]
            zp = np.where(inside, 1.0 / np.maximum(inv_z, 1e-12), np.inf)
            yy, xx = py, px
            better = zp < depth_buf[yy, xx]
            upd = inside & better
            depth_buf[yy[upd], xx[upd]] = zp[upd].astype(np.float32)
            tri_buf[yy[upd], xx[upd]] = fidx[i]
            bary_buf[yy[upd], xx[upd]] = np.stack(
                [l0[upd], l1[upd], l2[upd]], axis=-1
            )

    hit = tri_buf >= 0
    depth = np.where(hit, depth_buf, 0.0).astype(np.float32)

    normal = np.zeros((h, w, 3), np.float32)
    if hit.any():
        f_hit = faces[tri_buf[hit]]  # [M,3]
        n_vert = vertex_normals[f_hit]  # [M,3,3]
        bw = bary_buf[hit][..., None]  # [M,3,1]
        n_interp = (n_vert * bw).sum(axis=1)
        n_interp /= np.maximum(np.linalg.norm(n_interp, axis=1, keepdims=True), 1e-12)
        # flip toward the camera (reference shader view-corrects normals)
        cam_pos = -R.T @ t
        view = vertices[f_hit[:, 0]] - cam_pos
        flip = (n_interp * view).sum(1) > 0
        n_interp[flip] *= -1
        normal[hit] = n_interp
    return depth, normal


def read_ply_mesh(path: str):
    """Minimal PLY mesh reader (ascii + binary-LE, xyz + face lists)."""
    with open(path, "rb") as f:
        magic = f.readline().strip()
        assert magic == b"ply", "not a PLY file"
        fmt = None
        n_vert = n_face = 0
        vert_props = []
        in_vertex = False
        while True:
            line = f.readline().decode("ascii").strip()
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element vertex"):
                n_vert = int(line.split()[-1])
                in_vertex = True
            elif line.startswith("element face"):
                n_face = int(line.split()[-1])
                in_vertex = False
            elif line.startswith("property") and in_vertex:
                parts = line.split()
                vert_props.append((parts[-1], parts[1]))
            elif line == "end_header":
                break

        type_map = {
            "float": "f4", "float32": "f4", "double": "f8",
            "uchar": "u1", "uint8": "u1", "int": "i4", "int32": "i4",
            "uint": "u4", "ushort": "u2", "short": "i2", "char": "i1",
        }
        if fmt == "ascii":
            verts = []
            for _ in range(n_vert):
                vals = f.readline().split()
                verts.append([float(v) for v in vals[:3]])
            faces = []
            for _ in range(n_face):
                vals = f.readline().split()
                k = int(vals[0])
                idx = [int(x) for x in vals[1 : 1 + k]]
                for j in range(1, k - 1):  # fan triangulation
                    faces.append([idx[0], idx[j], idx[j + 1]])
            return np.asarray(verts, np.float32), np.asarray(faces, np.int64)

        dtype = np.dtype([(n, "<" + type_map[t]) for n, t in vert_props])
        raw = np.frombuffer(f.read(n_vert * dtype.itemsize), dtype=dtype)
        verts = np.stack(
            [raw["x"], raw["y"], raw["z"]], axis=1
        ).astype(np.float32)
        faces = []
        for _ in range(n_face):
            k = np.frombuffer(f.read(1), np.uint8)[0]
            idx = np.frombuffer(f.read(4 * k), "<i4")
            for j in range(1, k - 1):
                faces.append([idx[0], idx[j], idx[j + 1]])
        return verts, np.asarray(faces, np.int64)


def write_ply_mesh(path: str, vertices: np.ndarray, faces: np.ndarray) -> None:
    """Minimal ascii PLY writer (fixtures/tests; read_ply_mesh's inverse)."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(vertices)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in vertices:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for face in faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")
