"""Differential tests that EXECUTE the upstream reference implementation.

Every other metric test in this suite checks against independently-written
torch twins or committed goldens.  These tests are strictly stronger: they
import the reference's own modules from /root/reference (torch/scipy/cv2 are
installed here) and assert our JAX implementations match the reference's
*executed* outputs on shared random inputs — so convention flips and golden
regenerations are caught by the reference itself, not by a transcription.

Covered (VERDICT round-2 item 2):
  * depth_evaluation, all 6 alignment modes   (metrics/eval_depth.py:6-246)
  * alignment solvers through those modes     (metrics/alignment.py:14-196)
  * normal_evaluation                         (metrics/eval_normal.py:12-33)
  * Regr3D_t_ScaleShiftInv normalization      (metrics/pcd_alignment.py:131-250)
  * cKDTree accuracy/completion               (metrics/utils.py:14-42)
  * Weiszfeld focal + cv2 PnP camera recovery (metrics/utils.py:64-160)
  * pose encodings / quaternions / harmonic   (metrics/camera.py:13-390)
  * geotrf / xy_grid / procrustes / intrinsics(metrics/geometry.py:15-555)
  * get_surface_normal_np / pose_distance /
    backproject / tum poses                   (utils/geometry_utils.py:9-255)

Only open3d ICP and evo ATE/RPE cannot execute here (packages absent);
they are stubbed at import so the reference package loads, and nothing in
these tests calls into them.
"""

from __future__ import annotations

import types

import numpy as np
import pytest

from refstubs import make_stub, reference_imports

torch = pytest.importorskip("torch")

REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    """Import the reference metrics package with open3d/evo stubbed.

    metrics/__init__.py imports eval_pcd (open3d) and eval_camera (evo);
    the stubs satisfy the module-level imports only — no test calls them.
    Stubbing is hermetic (refstubs.reference_imports): installed with
    override semantics and fully restored at module teardown, so this
    file neither inherits nor leaks sys.modules state across the xdist
    worker it shares with other test files.
    """
    stubs = {
        # open3d: `import open3d as o3d` at eval_pcd.py:4 / icp.py:1
        "open3d": make_stub("open3d"),
        # evo: evo_utils.py:6-15 imports these names at module level
        "evo": make_stub("evo"),
        "evo.main_ape": make_stub("evo.main_ape", ape=object()),
        "evo.main_rpe": make_stub("evo.main_rpe", rpe=object()),
        "evo.core": make_stub("evo.core", sync=object()),
        "evo.core.metrics": make_stub(
            "evo.core.metrics",
            PoseRelation=object, Unit=object, APE=object, RPE=object,
        ),
        "evo.core.sync": make_stub("evo.core.sync"),
        "evo.core.trajectory": make_stub(
            "evo.core.trajectory", PosePath3D=object, PoseTrajectory3D=object
        ),
        "evo.tools": make_stub(
            "evo.tools", file_interface=object(), plot=object()
        ),
    }
    with reference_imports(stubs):
        import metrics as ref_metrics  # noqa: F401  (executes the package)
        from metrics import alignment as r_alignment
        from metrics import camera as r_camera
        from metrics import eval_depth as r_eval_depth
        from metrics import eval_normal as r_eval_normal
        from metrics import geometry as r_geometry
        from metrics import pcd_alignment as r_pcd_alignment
        from metrics import utils as r_utils
        from utils import geometry_utils as r_geometry_utils

        yield types.SimpleNamespace(
            alignment=r_alignment,
            camera=r_camera,
            eval_depth=r_eval_depth,
            eval_normal=r_eval_normal,
            geometry=r_geometry,
            pcd_alignment=r_pcd_alignment,
            utils=r_utils,
            geometry_utils=r_geometry_utils,
        )


# ---------------------------------------------------------------------------
# Shared synthetic inputs
# ---------------------------------------------------------------------------


def _depth_case(seed=0, nf=3, h=24, w=32):
    rng = np.random.default_rng(seed)
    gt = rng.uniform(0.5, 12.0, size=(nf, h, w)).astype(np.float32)
    gt[rng.uniform(size=gt.shape) < 0.05] = 0.0  # invalid pixels
    pred = (1.3 * gt + 0.4 + rng.normal(0, 0.05, size=gt.shape)).astype(np.float32)
    pred = np.abs(pred) + 1e-3
    cmask = rng.uniform(size=gt.shape) < 0.8
    return pred, gt, cmask


_MODES = [
    # (repo alignment name, reference kwargs, metric rel-tolerance)
    ("metric", dict(metric_scale=True), 1e-5),
    ("median", dict(), 1e-5),
    ("lstsq", dict(align_with_lstsq=True), 1e-4),
    ("scale", dict(align_with_scale=True), 1e-4),
    # lad: reference = scipy BFGS on the non-smooth L1 objective, repo =
    # IRLS; both near the same optimum but by different routes.
    ("lad", dict(align_with_lad=True), 2e-2),
    # lad2: reference = torch.optim.Adam(1000 iters, early-stop tol 1e-6),
    # repo = fori_loop Adam with the same hyperparameters (no early stop).
    ("lad2", dict(align_with_lad2=True), 5e-3),
]


@pytest.mark.parametrize("mode,ref_kwargs,rtol", _MODES, ids=[m[0] for m in _MODES])
@pytest.mark.parametrize("use_mask", [False, True], ids=["nomask", "mask"])
def test_depth_evaluation_oracle(ref, mode, ref_kwargs, rtol, use_mask):
    from unigeo_tpu.metrics.depth import depth_evaluation as repo_depth

    pred, gt, cmask = _depth_case()
    cm = cmask if use_mask else None

    r_metrics, r_parity, _, _ = ref.eval_depth.depth_evaluation(
        pred.copy(), gt.copy(), max_depth=10.0, custom_mask=cm, **ref_kwargs
    )
    o_metrics, o_parity, _, _ = repo_depth(
        pred, gt, max_depth=10.0, custom_mask=cm, alignment=mode
    )

    assert set(r_metrics) == set(o_metrics)
    for key, r_val in r_metrics.items():
        o_val = o_metrics[key]
        tol = rtol * max(1.0, abs(r_val))
        assert abs(o_val - r_val) <= tol, f"{mode}/{key}: ref={r_val} ours={o_val}"

    # The parity map is |aligned - gt| / gt over the validity mask.  The
    # reference flattens [Nf,H,W] -> [Nf*H, W]; reshape to compare.
    r_par = np.asarray(r_parity).reshape(gt.shape)
    o_par = np.asarray(o_parity)
    assert np.allclose(o_par, r_par, atol=max(1e-4, 20 * rtol)), (
        f"{mode}: parity map max delta "
        f"{np.abs(o_par - r_par).max()}"
    )


def test_depth_evaluation_oracle_disparity_and_clips(ref):
    """disp_input alignment and pre/post clipping, lstsq mode.

    Upstream bug found by executing the reference: its disp_input branch
    calls `depth2disparity`, which is defined NOWHERE in the reference repo
    (eval_depth.py:126,170,178,186 — grep confirms), so the path raises
    NameError as shipped.  We inject the evidently-intended helper
    (1/(x+1e-8), the same inversion eval_depth.py:75 applies to gt) and
    compare against that reconstruction."""
    from unigeo_tpu.metrics.depth import depth_evaluation as repo_depth

    assert not hasattr(ref.eval_depth, "depth2disparity"), (
        "upstream added depth2disparity — drop the injection and re-check"
    )
    ref.eval_depth.depth2disparity = lambda d: 1.0 / (d + 1e-8)

    pred, gt, _ = _depth_case(seed=7)
    disp_pred = 1.0 / (pred + 0.1)

    r_metrics, _, _, _ = ref.eval_depth.depth_evaluation(
        disp_pred.copy(), gt.copy(), max_depth=10.0, align_with_lstsq=True,
        disp_input=True, pre_clip_min=1e-3, post_clip_max=50.0,
    )
    o_metrics, _, _, _ = repo_depth(
        disp_pred, gt, max_depth=10.0, alignment="lstsq",
        disp_input=True, pre_clip_min=1e-3, post_clip_max=50.0,
    )
    for key, r_val in r_metrics.items():
        assert abs(o_metrics[key] - r_val) <= 1e-3 * max(1.0, abs(r_val)), (
            f"{key}: ref={r_val} ours={o_metrics[key]}"
        )


def test_normal_evaluation_oracle(ref):
    from unigeo_tpu.metrics.normal import normal_evaluation as repo_normal

    rng = np.random.default_rng(1)
    nf, h, w = 2, 16, 20
    gt_n = rng.normal(size=(nf, h, w, 3)).astype(np.float32)
    gt_n /= np.linalg.norm(gt_n, axis=-1, keepdims=True)
    pred_n = gt_n + 0.2 * rng.normal(size=gt_n.shape).astype(np.float32)
    pred_n /= np.linalg.norm(pred_n, axis=-1, keepdims=True)
    mask = rng.uniform(size=(nf, h, w)) < 0.7

    r_metrics = ref.eval_normal.normal_evaluation(
        pred_n.copy(), gt_n.copy(), custom_mask=torch.from_numpy(mask)
    )
    o_metrics = repo_normal(pred_n, gt_n, custom_mask=mask)

    assert set(r_metrics) <= set(o_metrics)
    for key, r_val in r_metrics.items():
        assert abs(o_metrics[key] - r_val) <= 1e-3 * max(1.0, abs(r_val)), (
            f"{key}: ref={r_val} ours={o_metrics[key]}"
        )


def test_scale_shift_align_oracle(ref):
    """Regr3D_t_ScaleShiftInv(norm_mode=False, gt_scale=True) + the gt
    z-shift restore (eval_pcd.py:24-78) vs our fused scale_shift_align."""
    from unigeo_tpu.metrics.pointcloud import scale_shift_align

    rng = np.random.default_rng(3)
    nf, h, w = 2, 12, 16
    gt = rng.normal(0, 2.0, size=(nf, h, w, 3)).astype(np.float32)
    gt[..., 2] += 4.0
    pred = (0.7 * gt + rng.normal(0, 0.1, size=gt.shape) + 1.5).astype(np.float32)
    mask = rng.uniform(size=(nf, h, w)) < 0.8

    # --- reference chain (exactly the eval_pcd.py driver, minus open3d) ---
    criterion = ref.pcd_alignment.Regr3D_t_ScaleShiftInv(
        norm_mode=False, gt_scale=True
    )
    # the criterion mutates its inputs in place; match eval_pcd's listification
    pred_l = [torch.from_numpy(pred.copy())[i][None] for i in range(nf)]
    gt_l = [torch.from_numpy(gt.copy())[i][None] for i in range(nf)]
    mask_l = [torch.from_numpy(mask)[i][None] for i in range(nf)]
    _, _, _, _, _, monitoring = criterion.get_all_pts3d_t(
        gt_pts3d=gt_l, pred_pts3d=pred_l, gt_masks=mask_l
    )
    gt_shift_z = monitoring["gt_shift_z"].item()
    # in-place ops propagated into pred_l/gt_l; restore gt z (eval_pcd.py:67-69)
    ref_pred = np.concatenate([p.numpy() for p in pred_l], axis=0)
    ref_gt = np.concatenate([g.numpy() for g in gt_l], axis=0)
    ref_pred[..., 2] += gt_shift_z
    ref_gt[..., 2] += gt_shift_z

    # --- ours ---
    o_pred, o_gt, o_mon = scale_shift_align(pred, gt, mask.astype(np.float32))
    o_pred, o_gt = np.asarray(o_pred), np.asarray(o_gt)

    assert np.allclose(ref_gt, gt, atol=1e-5)  # restore is exact
    assert np.allclose(o_gt, gt, atol=1e-5)
    assert np.allclose(o_pred, ref_pred, atol=1e-4), (
        f"aligned pred max delta {np.abs(o_pred - ref_pred).max()}"
    )
    for key in ("gt_shift_z", "pred_shift_z", "gt_scale", "pred_scale"):
        assert abs(float(o_mon[key]) - monitoring[key].item()) < 1e-4, key


def test_accuracy_completion_oracle(ref):
    """cKDTree acc/comp + |normal dot| stats vs the MXU brute-force NN."""
    from unigeo_tpu.metrics.pointcloud import accuracy_completion

    rng = np.random.default_rng(5)
    pred_pts = rng.normal(size=(300, 3)).astype(np.float32)
    gt_pts = (pred_pts[: 250] + 0.05 * rng.normal(size=(250, 3))).astype(np.float32)
    pred_nrm = rng.normal(size=(300, 3)).astype(np.float32)
    pred_nrm /= np.linalg.norm(pred_nrm, axis=-1, keepdims=True)
    gt_nrm = rng.normal(size=(250, 3)).astype(np.float32)
    gt_nrm /= np.linalg.norm(gt_nrm, axis=-1, keepdims=True)

    acc, acc_med, nc1, nc1_med = ref.utils.accuracy(
        gt_pts, pred_pts, gt_normals=gt_nrm, rec_normals=pred_nrm
    )
    comp, comp_med, nc2, nc2_med = ref.utils.completion(
        gt_pts, pred_pts, gt_normals=gt_nrm, rec_normals=pred_nrm
    )
    stats = {
        k: float(v)
        for k, v in accuracy_completion(pred_pts, gt_pts, pred_nrm, gt_nrm).items()
    }
    expect = {
        "acc": acc, "acc_med": acc_med, "nc1": nc1, "nc1_med": nc1_med,
        "comp": comp, "comp_med": comp_med, "nc2": nc2, "nc2_med": nc2_med,
    }
    for key, r_val in expect.items():
        assert abs(stats[key] - float(r_val)) < 1e-5, (
            f"{key}: ref={r_val} ours={stats[key]}"
        )


def _synthetic_scene(seed=11, nf=3, h=32, w=32, focal=40.0):
    """World pointmaps seen by nf cameras with known c2w poses (frame 0 =
    world), from smooth per-frame depth and a shared pinhole K."""
    rng = np.random.default_rng(seed)
    uu, vv = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64), indexing="xy")
    cx, cy = w / 2.0, h / 2.0

    def c2w_of(i):
        if i == 0:
            return np.eye(4)
        angle = 0.05 * i
        c, s = np.cos(angle), np.sin(angle)
        T = np.eye(4)
        T[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        T[:3, 3] = [0.1 * i, -0.05 * i, 0.02 * i]
        return T

    pts_world, c2ws = [], []
    for i in range(nf):
        depth = 3.0 + 0.4 * np.sin(uu / 5.0 + i) * np.cos(vv / 7.0)
        x = (uu - cx) * depth / focal
        y = (vv - cy) * depth / focal
        cam = np.stack([x, y, depth], axis=-1)
        T = c2w_of(i)
        world = cam @ T[:3, :3].T + T[:3, 3]
        pts_world.append(world)
        c2ws.append(T)
    return np.stack(pts_world), np.stack(c2ws)


def test_focal_weiszfeld_oracle(ref):
    from unigeo_tpu.models.camera_solver import estimate_focal_weiszfeld

    pts_world, _ = _synthetic_scene()
    pts0 = pts_world[0].astype(np.float32)
    h, w, _ = pts0.shape
    pp = torch.tensor([w / 2.0, h / 2.0])
    r_focal = ref.utils.estimate_focal_knowing_depth(
        torch.from_numpy(pts0)[None], pp, focal_mode="weiszfeld"
    ).item()
    o_focal = float(estimate_focal_weiszfeld(pts0))
    assert abs(o_focal - r_focal) < 1e-2 * r_focal, (r_focal, o_focal)
    assert abs(o_focal - 40.0) < 0.5  # and both recover the true focal


def test_camera_recovery_oracle(ref):
    """cv2.solvePnPRansac + Rodrigues per frame (reference) vs the batched
    DLT+IRLS solver, on a noiseless synthetic scene — both must recover the
    inverse c2w to sub-degree / sub-centimeter."""
    import cv2

    from unigeo_tpu.models.camera_solver import (
        solve_depth_and_camera_from_pointmaps,
    )

    pts_world, c2ws = _synthetic_scene()
    cv2.setRNGSeed(3)
    r_cam, r_ext, r_intr = ref.utils.solve_depth_and_camera_from_3d_points(
        [torch.from_numpy(p[None].astype(np.float32)) for p in pts_world]
    )
    o_cam, o_ext, o_intr = solve_depth_and_camera_from_pointmaps(
        pts_world.astype(np.float32)
    )
    o_cam, o_ext, o_intr = map(np.asarray, (o_cam, o_ext, o_intr))

    assert abs(o_intr[0][0, 0] - r_intr[0][0, 0]) < 0.1 * r_intr[0][0, 0]

    for i in range(len(c2ws)):
        w2c_true = np.linalg.inv(c2ws[i])
        for name, ext in (("ref", r_ext[i]), ("ours", o_ext[i])):
            R_err = ext[:3, :3] @ w2c_true[:3, :3].T
            ang = np.degrees(
                np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1))
            )
            assert ang < 1.0, f"frame {i} {name}: rotation off by {ang} deg"
            assert np.linalg.norm(ext[:3, 3] - w2c_true[:3, 3]) < 0.05, (
                f"frame {i} {name}: translation {ext[:3, 3]} vs {w2c_true[:3, 3]}"
            )
        # and the two solvers agree with each other
        R_err = np.asarray(r_ext[i])[:3, :3] @ o_ext[i][:3, :3].T
        ang = np.degrees(np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1)))
        assert ang < 1.0
        assert np.allclose(o_cam[i], r_cam[i][0], atol=0.1)


def test_pose_encoding_oracle(ref):
    from unigeo_tpu.models.posecodec import (
        camera_to_pose_encoding,
        pose_encoding_to_camera,
    )

    rng = np.random.default_rng(17)
    from scipy.spatial.transform import Rotation

    n = 8
    R = Rotation.random(n, random_state=4).as_matrix()
    t = rng.normal(size=(n, 3))
    c2w = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    c2w[:, :3, :3] = R.astype(np.float32)
    c2w[:, :3, 3] = t.astype(np.float32)

    r_enc = ref.camera.camera_to_pose_encoding(torch.from_numpy(c2w)).numpy()
    o_enc = np.asarray(camera_to_pose_encoding(c2w))
    assert np.allclose(o_enc[:, :3], r_enc[:, :3], atol=1e-6)
    # quaternions are sign-ambiguous between constructions; compare per row
    q_r, q_o = r_enc[:, 3:7], o_enc[:, 3:7]
    sign = np.sign(np.sum(q_r * q_o, axis=-1, keepdims=True))
    assert np.allclose(q_o * sign, q_r, atol=1e-5)

    # decode roundtrip: both must reproduce the original camera
    r_cam = ref.camera.pose_encoding_to_camera(torch.from_numpy(r_enc)).numpy()
    o_cam = np.asarray(pose_encoding_to_camera(o_enc))
    assert np.allclose(r_cam, c2w, atol=1e-5)
    assert np.allclose(o_cam, c2w, atol=1e-5)

    # quaternion_to_matrix on the SAME quaternion is convention-identical
    o_R = np.asarray(
        __import__("unigeo_tpu.metrics.camera", fromlist=["quaternion_to_matrix"])
        .quaternion_to_matrix(q_r)
    )
    r_R = ref.camera.quaternion_to_matrix(torch.from_numpy(q_r)).numpy()
    assert np.allclose(o_R, r_R, atol=1e-5)


@pytest.mark.parametrize("logspace", [True, False])
@pytest.mark.parametrize("append_input", [True, False])
def test_harmonic_embedding_oracle(ref, logspace, append_input):
    from unigeo_tpu.models.posecodec import harmonic_embedding

    rng = np.random.default_rng(23)
    x = rng.normal(size=(5, 7)).astype(np.float32)
    mod = ref.camera.HarmonicEmbedding(
        n_harmonic_functions=6, omega_0=1.7, logspace=logspace,
        append_input=append_input,
    )
    r_out = mod(torch.from_numpy(x)).numpy()
    o_out = np.asarray(
        harmonic_embedding(
            x, n_harmonic_functions=6, omega_0=1.7, logspace=logspace,
            append_input=append_input,
        )
    )
    assert o_out.shape == r_out.shape
    assert np.allclose(o_out, r_out, atol=1e-5)

    # MIP-NeRF integrated variant (diag_cov damping)
    cov = np.abs(rng.normal(size=x.shape)).astype(np.float32)
    r_out = mod(torch.from_numpy(x), diag_cov=torch.from_numpy(cov)).numpy()
    o_out = np.asarray(
        harmonic_embedding(
            x, n_harmonic_functions=6, omega_0=1.7, logspace=logspace,
            append_input=append_input, diag_cov=cov,
        )
    )
    assert np.allclose(o_out, r_out, atol=1e-5)


def test_pose_embedding_oracle(ref):
    from unigeo_tpu.models.posecodec import PoseEmbedding

    rng = np.random.default_rng(29)
    enc = rng.normal(size=(4, 7)).astype(np.float32)
    r_mod = ref.camera.PoseEmbedding(target_dim=7, out_dim=None,
                                     n_harmonic_functions=10)
    o_mod = PoseEmbedding(target_dim=7, n_harmonic_functions=10)
    assert o_mod.out_dim == r_mod.out_dim
    r_out = r_mod(torch.from_numpy(enc)).numpy()
    o_out = np.asarray(o_mod(enc))
    assert np.allclose(o_out, r_out, atol=1e-5)


def test_geotrf_and_grid_oracle(ref):
    from unigeo_tpu.ops.geometry import geotrf, xy_grid

    rng = np.random.default_rng(31)
    T = np.eye(4, dtype=np.float32)
    from scipy.spatial.transform import Rotation

    T[:3, :3] = Rotation.random(random_state=9).as_matrix().astype(np.float32)
    T[:3, 3] = rng.normal(size=3).astype(np.float32)

    for shape in [(50, 3), (2, 20, 3)]:
        pts = rng.normal(size=shape).astype(np.float32)
        Tt = torch.from_numpy(T)
        if len(shape) == 3:
            Tt = Tt[None].expand(shape[0], 4, 4)
        r_out = ref.geometry.geotrf(Tt, torch.from_numpy(pts)).numpy()
        o_out = np.asarray(geotrf(T, pts))
        assert np.allclose(o_out, r_out, atol=1e-5), shape

    r_grid = ref.geometry.xy_grid(6, 4)
    if isinstance(r_grid, torch.Tensor):
        r_grid = r_grid.numpy()
    else:
        r_grid = np.asarray(r_grid)
    o_grid = np.asarray(xy_grid(6, 4)).reshape(r_grid.shape)
    assert np.array_equal(o_grid, r_grid.astype(np.float32))


def test_intrinsics_conversion_oracle(ref):
    from unigeo_tpu.ops.geometry import (
        colmap_to_opencv_intrinsics,
        opencv_to_colmap_intrinsics,
    )

    K = np.array([[40.0, 0, 16.5], [0, 41.0, 12.5], [0, 0, 1]], np.float32)
    r_cv = ref.geometry.colmap_to_opencv_intrinsics(K.copy())
    o_cv = np.asarray(colmap_to_opencv_intrinsics(K))
    assert np.allclose(o_cv, r_cv, atol=1e-6)
    r_cm = ref.geometry.opencv_to_colmap_intrinsics(K.copy())
    o_cm = np.asarray(opencv_to_colmap_intrinsics(K))
    assert np.allclose(o_cm, r_cm, atol=1e-6)


def test_weighted_procrustes_oracle(ref):
    from unigeo_tpu.ops.geometry import weighted_procrustes

    rng = np.random.default_rng(37)
    from scipy.spatial.transform import Rotation

    R_true = Rotation.random(random_state=5).as_matrix()
    t_true = rng.normal(size=3)
    A = rng.normal(size=(60, 3))
    B = A @ R_true.T + t_true + 0.01 * rng.normal(size=(60, 3))
    w = rng.uniform(0.1, 1.0, size=60)

    R_ref, t_ref = ref.geometry.weighted_procrustes(
        torch.from_numpy(A[None]).float(),
        torch.from_numpy(B[None]).float(),
        torch.from_numpy(w[None]).float(),
    )
    T_ours = np.asarray(
        weighted_procrustes(A.astype(np.float32), B.astype(np.float32),
                            w.astype(np.float32))
    )
    assert np.allclose(T_ours[:3, :3], R_ref[0].numpy(), atol=1e-4)
    assert np.allclose(T_ours[:3, 3], t_ref.numpy().reshape(3), atol=1e-4)


def test_pose_distance_oracle(ref):
    from unigeo_tpu.ops.geometry import pose_distance

    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(41)
    poses = []
    for i in range(2):
        T = np.eye(4)
        T[:3, :3] = Rotation.random(random_state=20 + i).as_matrix()
        T[:3, 3] = rng.normal(size=3)
        poses.append(T)
    r_c, r_R, r_t = ref.geometry_utils.pose_distance(poses[0], poses[1])
    o_c, o_R, o_t = pose_distance(poses[0], poses[1])
    assert abs(o_c - r_c) < 1e-9
    assert abs(o_R - r_R) < 1e-9
    assert abs(o_t - r_t) < 1e-9


def test_backproject_oracle(ref):
    from unigeo_tpu.ops.backproject import (
        backproject_opengl,
        backproject_to_cv_position,
    )

    rng = np.random.default_rng(43)
    depth = rng.uniform(1.0, 5.0, size=(12, 16)).astype(np.float32)
    K = np.array([[20.0, 0, 8.0], [0, 20.0, 6.0], [0, 0, 1]], np.float32)

    r_gl = ref.geometry_utils.backproject(depth.copy(), K, opengl_coord=True)
    o_gl = np.asarray(backproject_opengl(depth, K)).reshape(r_gl.shape)
    assert np.allclose(o_gl, r_gl, atol=1e-5)

    r_cv = ref.geometry_utils.backproject(depth.copy(), K, opengl_coord=False)
    o_cv = np.asarray(backproject_to_cv_position(depth, K)).reshape(r_cv.shape)
    assert np.allclose(o_cv, r_cv, atol=1e-5)


def test_get_tum_poses_oracle(ref):
    from unigeo_tpu.metrics.camera import get_tum_poses

    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(47)
    poses = []
    for i in range(5):
        T = np.eye(4)
        T[:3, :3] = Rotation.random(random_state=30 + i).as_matrix()
        T[:3, 3] = rng.normal(size=3)
        poses.append(T)

    r_tum, r_tt = ref.utils.get_tum_poses(poses)
    o_tum, o_tt = get_tum_poses(np.stack(poses))
    assert np.array_equal(o_tt, r_tt)
    assert np.allclose(o_tum[:, :3], r_tum[:, :3], atol=1e-9)
    # quaternion sign ambiguity between scipy and the Shepperd construction
    sign = np.sign(np.sum(o_tum[:, 3:] * r_tum[:, 3:], axis=-1, keepdims=True))
    assert np.allclose(o_tum[:, 3:] * sign, r_tum[:, 3:], atol=1e-6)


def test_surface_normal_oracle(ref):
    """Execute the reference's get_surface_normal_np (uncentered normal
    equations in f64 — stable at that precision) against our centered
    Sherman-Morrison solve; interiors must agree to fractions of a degree.

    Borders are excluded: both zero-pad the moment sums, but the centered
    rewrite assumes the full patch count there (ops/normals.py:41-90)."""
    from unigeo_tpu.ops.normals import surface_normals_from_points

    h = w = 32  # divisible by the reference's patch_num=4 tiling
    uu, vv = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64), indexing="xy")
    depth = 2.0 + 0.3 * np.sin(uu / 4.0) * np.cos(vv / 5.0)
    focal, cx, cy = 30.0, w / 2.0, h / 2.0
    xyz = np.stack(
        [(uu - cx) * depth / focal, (vv - cy) * depth / focal, depth], axis=-1
    )

    np.random.seed(0)  # the reference seeds n_img with randn before overwrite
    r_n = ref.geometry_utils.get_surface_normal_np(xyz, patch_size=5)
    o_n = np.asarray(surface_normals_from_points(xyz.astype(np.float32)))

    c = 3  # patch//2 + 1
    r_in, o_in = r_n[c:-c, c:-c], o_n[c:-c, c:-c]
    dots = np.clip(np.abs(np.sum(r_in * o_in, axis=-1)), 0, 1)
    ang = np.degrees(np.arccos(dots))
    # ours runs in f32 (production dtype) vs the reference's f64 numpy:
    # measured 0.106 deg mean on this fixture, all of it f32 rounding in
    # the moment sums (test_ops_normals.py pins the f64-exact statement)
    assert ang.mean() < 0.3, f"mean angular error {ang.mean()} deg"
    assert ang.max() < 2.0, f"max angular error {ang.max()} deg"
    # orientation convention (camera-facing flip) must also agree
    signed = np.sum(r_in * o_in, axis=-1)
    assert (signed > 0).mean() > 0.99
