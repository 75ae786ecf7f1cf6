"""Tests for auxiliary subsystems: metric extras, writers, savers, prefetch,
geometry ops, trajectories."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation


def test_completion_ratio_and_voxel_iou(rng):
    from unigeo_tpu.metrics.extras import completion_ratio, voxel_iou

    pts = rng.uniform(-1, 1, size=(500, 3)).astype(np.float32)
    assert completion_ratio(pts, pts + 1e-4, dist_th=0.05) == 1.0
    assert completion_ratio(pts, pts + 10.0, dist_th=0.05) == 0.0
    assert voxel_iou(pts, pts, voxel_size=0.2) == 1.0
    assert voxel_iou(pts, pts + 50.0, voxel_size=0.2) == 0.0


def test_align_pcd(rng):
    from unigeo_tpu.metrics.extras import align_pcd

    pts = rng.uniform(-1, 1, size=(400, 3)).astype(np.float32)
    R = Rotation.from_rotvec([0.02, 0.03, -0.01]).as_matrix().astype(np.float32)
    dst = pts @ R.T + np.array([0.01, -0.02, 0.015], np.float32)
    T, moved = align_pcd(pts, dst)
    assert np.linalg.norm(moved - dst, axis=1).mean() < 1e-3


def test_depth_eval_global_coord(rng):
    from unigeo_tpu.metrics.extras import depth_evaluation_in_global_coord

    nf, h, w = 2, 24, 32
    K = np.array([[40.0, 0, 16], [0, 40.0, 12], [0, 0, 1]], np.float32)
    depth = rng.uniform(1, 3, size=(nf, h, w)).astype(np.float32)
    c2w = np.tile(np.eye(4, dtype=np.float32), (nf, 1, 1))
    c2w[1, :3, 3] = [0.2, 0, 0.1]
    from unigeo_tpu.ops.backproject import backproject_batch_cv

    cam = np.asarray(backproject_batch_cv(depth, np.tile(K[None], (nf, 1, 1))))
    world = np.einsum("nij,nhwj->nhwi", c2w[:, :3, :3], cam) + c2w[:, None, None, :3, 3]
    radius = np.linalg.norm(world, axis=-1)

    res, aligned = depth_evaluation_in_global_coord(
        depth, depth, radius, c2w, np.tile(K[None], (nf, 1, 1))
    )
    assert res["Abs Rel"] < 1e-4  # identical depth → perfect radial score


def test_geometry_ops(rng):
    from unigeo_tpu.ops.geometry import (
        depthmap_to_pts3d,
        geotrf,
        weighted_procrustes,
        xy_grid,
        reciprocal_nn_matches,
    )

    grid = np.asarray(xy_grid(4, 3))
    assert grid.shape == (3, 4, 2)
    assert grid[0, 0, 0] == 0 and grid[2, 3, 1] == 2

    K = jnp.asarray([[50.0, 0, 16], [0, 50.0, 12], [0, 0, 1]])
    depth = jnp.ones((24, 32)) * 2.0
    pts = depthmap_to_pts3d(depth, K)
    assert pts.shape == (24, 32, 3)
    assert float(pts[12, 16, 2]) == 2.0

    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [1, 2, 3]
    out = np.asarray(geotrf(jnp.asarray(T), jnp.zeros((5, 3))))
    assert np.allclose(out, [1, 2, 3])

    src = rng.normal(size=(50, 3)).astype(np.float32)
    R = Rotation.from_rotvec([0.2, -0.1, 0.3]).as_matrix().astype(np.float32)
    dst = 1.7 * src @ R.T + np.array([1, 2, 3], np.float32)
    T2 = np.asarray(weighted_procrustes(src, dst, with_scale=True))
    moved = src @ T2[:3, :3].T + T2[:3, 3]
    assert np.abs(moved - dst).max() < 1e-2

    a = rng.normal(size=(30, 3)).astype(np.float32)
    mutual, idx = reciprocal_nn_matches(jnp.asarray(a), jnp.asarray(a + 1e-5))
    assert bool(np.asarray(mutual).all())
    assert np.array_equal(np.asarray(idx), np.arange(30))


def test_tum_trajectory_roundtrip(tmp_path, rng):
    from unigeo_tpu.data.trajectories import read_tum_trajectory, write_tum_trajectory

    n = 6
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    poses[:, :3, :3] = Rotation.random(n, random_state=3).as_matrix()
    poses[:, :3, 3] = rng.normal(size=(n, 3))
    path = tmp_path / "traj.txt"
    write_tum_trajectory(str(path), poses)
    loaded, stamps = read_tum_trajectory(str(path))
    assert np.allclose(loaded, poses, atol=1e-5)
    assert np.allclose(stamps, np.arange(n))


def test_event_writer_and_timer(tmp_path):
    import json

    from unigeo_tpu.utils.writers import EventWriter, TimeWriter

    writer = EventWriter(str(tmp_path))
    writer.put_scalar("loss", 0.5, step=1)
    writer.put_scalars({"a": 1.0, "b": 2.0}, step=2)
    lines = [json.loads(l) for l in open(tmp_path / "events.jsonl")]
    assert len(lines) == 3
    assert lines[0]["name"] == "loss" and lines[0]["value"] == 0.5

    timer = TimeWriter(writer, name="step_time", total_steps=4)
    for _ in range(2):
        with timer:
            pass
    assert timer.avg >= 0.0
    assert timer.eta_seconds is not None


def test_train_state_saver(tmp_path):
    from unigeo_tpu.utils.checkpoint import TrainStateSaver

    saver = TrainStateSaver(str(tmp_path / "ckpts"), max_to_keep=2)
    state = {"w": np.arange(6, dtype=np.float32).reshape(2, 3), "step": np.int32(1)}
    for step in (10, 20, 30):
        state["step"] = np.int32(step)
        saver.save(dict(state), step)
    assert saver.list_steps() == [20, 30]  # rotation kept 2
    loaded, step = saver.load_latest()
    assert step == 30
    assert np.array_equal(loaded["w"], state["w"])


def test_prefetch_loader_order_and_content():
    from unigeo_tpu.data.prefetch import PrefetchLoader

    class SlowDataset:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            import time

            time.sleep(0.01)
            return {"idx": i, "images": np.full((2, 2), i)}

    loader = PrefetchLoader(SlowDataset(), num_workers=4, prefetch=4)
    out = list(loader)
    assert [d["idx"] for d in out] == list(range(10))


def test_pose_codec_roundtrip(rng):
    from unigeo_tpu.models.posecodec import (
        camera_to_pose_encoding,
        pose_encoding_to_camera,
    )

    poses = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    poses[:, :3, :3] = Rotation.random(5, random_state=11).as_matrix()
    poses[:, :3, 3] = rng.normal(size=(5, 3))
    enc = camera_to_pose_encoding(jnp.asarray(poses))
    assert enc.shape == (5, 7)
    back = np.asarray(pose_encoding_to_camera(enc))
    assert np.allclose(back, poses, atol=1e-4)


def test_sintel_cam_roundtrip(tmp_path):
    from unigeo_tpu.data.trajectories import read_sintel_cam, read_sintel_trajectory

    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    E = np.hstack([np.eye(3), [[0.1], [0.2], [0.3]]])
    for i in range(2):
        with open(tmp_path / f"frame_{i:04d}.cam", "wb") as f:
            f.write(np.float32(202021.25).tobytes())
            f.write(K.astype(np.float64).tobytes())
            f.write(E.astype(np.float64).tobytes())
    K2, E2 = read_sintel_cam(str(tmp_path / "frame_0000.cam"))
    assert np.allclose(K2, K)
    assert np.allclose(E2, E)
    poses, intr = read_sintel_trajectory(str(tmp_path))
    assert poses.shape == (2, 4, 4)
    assert np.allclose(poses[0][:3, 3], -E[:3, :3].T @ E[:, 3], atol=1e-6)


def test_depth_eval_disp_input_and_lad2(rng):
    """disp_input aligns in disparity space; lad2 (Adam-L1) converges."""
    from unigeo_tpu.metrics.depth import depth_evaluation

    gt = rng.uniform(1.0, 8.0, size=(2, 24, 32)).astype(np.float32)
    # prediction given as disparity, scaled and shifted
    disp = 1.0 / (gt + 1e-8)
    pred_disp = 1.7 * disp + 0.05
    res, *_ = depth_evaluation(pred_disp, gt, disp_input=True, alignment="lstsq")
    assert res["Abs Rel"] < 1e-3

    pred = gt * 0.5 - 0.2
    res2, *_ = depth_evaluation(pred, gt, alignment="lad2", max_iters=200, lr=1e-2)
    assert res2["Abs Rel"] < 0.5
    assert np.isfinite(res2["RMSE"])


def test_generic_vis_tiling():
    """Generic tensor→image vis surface (reference dataset_core/utils/
    vis.py:165-379): colormapping with invalid handling, layout coercion,
    label overlay, batch tiling."""
    import numpy as np

    from unigeo_tpu.utils.vis import (
        overlay_text,
        tile_images,
        vis_2d_array,
        vis_image,
    )

    a = np.random.default_rng(0).random((16, 20))
    a[0, 0] = np.nan
    v = vis_2d_array(a)
    assert v.shape == (16, 20, 3) and v.dtype == np.uint8
    assert (v[0, 0] == 0).all()  # invalid → black
    # mask support
    m = np.ones_like(a)
    m[:, :10] = 0
    vm = vis_2d_array(a, mask=m)
    assert (vm[:, :10] == 0).all()

    assert vis_image(np.random.rand(3, 8, 9)).shape == (8, 9, 3)  # CHW → HWC
    assert vis_image(np.zeros((5, 6), np.uint8)).shape == (5, 6, 3)

    lab = overlay_text(np.zeros((12, 40, 3), np.uint8), "x")
    assert lab.sum() > 0  # text drew something

    mosaic = tile_images(
        [np.random.rand(8, 9, 3), np.random.rand(6, 4)], labels=["a", "b"]
    )
    assert mosaic.dtype == np.uint8 and mosaic.ndim == 3
    assert mosaic.shape[1] > 18  # two columns


def test_dataset_timeit_and_config_roundtrip(tmp_path):
    """ClipDataset.timeit throughput probe + save_config/from_config JSON
    round-trip (reference dataset.py:205-255)."""
    from unigeo_tpu.data.base import ClipDataset
    from unigeo_tpu.data.synthetic import SyntheticBoxDataset

    ds = SyntheticBoxDataset(
        clip_length=2, clip_overlap=0, num_scenes=1, frames_per_scene=4,
        render_size=(32, 32),
    )
    per = ds.timeit(2)
    assert per > 0

    cfg_path = str(tmp_path / "dataset_config.json")
    ds.save_config(cfg_path)
    ds2 = ClipDataset.from_config(cfg_path)
    assert type(ds2) is SyntheticBoxDataset
    assert ds2.clip_length == 2 and ds2.clip_overlap == 0
    assert len(ds2) == len(ds)


def test_config_max_depth_honored(tmp_path):
    """YAML max_depth (eval_depth block or top level) reaches EvalConfig."""
    import yaml

    from unigeo_tpu.config import EvalConfig

    base = {
        "dataset": "SyntheticBoxDataset",
        "model_name": "IdentityModel",
        "h": 64, "w": 64,
        "eval_depth": {"metric_names": ["Abs Rel"], "max_depth": 10.0},
    }
    assert EvalConfig.from_dict(base).max_depth == 10.0
    base2 = {
        "dataset": "SyntheticBoxDataset",
        "model_name": "IdentityModel",
        "h": 64, "w": 64,
        "max_depth": 12.5,
        "eval_depth": {"metric_names": ["Abs Rel"]},
    }
    assert EvalConfig.from_dict(base2).max_depth == 12.5
    del base2["max_depth"]
    assert EvalConfig.from_dict(base2).max_depth == 80.0


def test_harmonic_embedding_matches_torch_reference(rng):
    """HarmonicEmbedding / PoseEmbedding vs a torch transcription of the
    pytorch3d-lineage reference module (reference metrics/camera.py:13-194):
    same frequency tables, same [phase, dim, freq] flattening order, same
    MIP-NeRF diag_cov damping, same append_input tail."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from unigeo_tpu.models.posecodec import (
        PoseEmbedding,
        harmonic_embedding,
        harmonic_embedding_dim,
    )

    def torch_harmonic(x, n=6, omega_0=1.0, logspace=True, append_input=True,
                       diag_cov=None):
        if logspace:
            freqs = 2.0 ** torch.arange(n, dtype=torch.float32)
        else:
            freqs = torch.linspace(1.0, 2.0 ** (n - 1), n, dtype=torch.float32)
        freqs = freqs * omega_0
        zero_half_pi = torch.tensor([0.0, 0.5 * torch.pi])
        embed = x[..., None] * freqs
        embed = embed[..., None, :, :] + zero_half_pi[..., None, None]
        embed = embed.sin()
        if diag_cov is not None:
            x_var = diag_cov[..., None] * torch.pow(freqs, 2)
            embed = embed * torch.exp(-0.5 * x_var)[..., None, :, :]
        embed = embed.reshape(*x.shape[:-1], -1)
        if append_input:
            return torch.cat([embed, x], dim=-1)
        return embed

    x = rng.normal(size=(3, 5, 7)).astype(np.float32)
    cov = rng.uniform(0.01, 0.5, size=(3, 5, 7)).astype(np.float32)
    for kwargs in (
        dict(),
        dict(n=4, omega_0=2.5),
        dict(logspace=False, n=5),
        dict(append_input=False),
        dict(diag_cov=True),
    ):
        use_cov = kwargs.pop("diag_cov", False)
        t_kw = dict(kwargs)
        if use_cov:
            t_kw["diag_cov"] = torch.from_numpy(cov)
        want = torch_harmonic(torch.from_numpy(x), **t_kw).numpy()
        j_kw = {
            {"n": "n_harmonic_functions"}.get(k, k): v for k, v in kwargs.items()
        }
        if use_cov:
            j_kw["diag_cov"] = jnp.asarray(cov)
        got = np.asarray(harmonic_embedding(jnp.asarray(x), **j_kw))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    emb = PoseEmbedding(target_dim=7, n_harmonic_functions=10)
    assert emb.out_dim == harmonic_embedding_dim(7, 10, True) == 7 * 21
    pose = rng.normal(size=(4, 7)).astype(np.float32)
    out = np.asarray(emb(jnp.asarray(pose)))
    want = torch_harmonic(torch.from_numpy(pose), n=10).numpy()
    np.testing.assert_allclose(out, want, rtol=1e-6, atol=1e-6)


def test_host_cache_dir_boot_keyed_and_prunes_foreign(tmp_path, monkeypatch):
    """CPU compile-cache dirs are keyed per (cpu-flags, boot) and stale
    fingerprint dirs from other hosts/boots are pruned — foreign XLA:CPU
    AOT executables embed the compile machine's raw-CPUID feature set and
    can SIGSEGV on load (utils/hostcache.py)."""
    from unigeo_tpu.utils import hostcache

    import builtins
    import os
    import time

    tag = hostcache._host_tag()
    # The tag must depend on boot_id, not just the cpuinfo flags line:
    # identical kernel-masked flags on two VMs do not imply identical
    # raw-CPUID features.  Intercept the boot_id read and assert the tag
    # moves with it.
    real_open = builtins.open

    def fake_open(path, *a, **k):
        if str(path) == "/proc/sys/kernel/random/boot_id":
            import io

            return io.StringIO("00000000-0000-0000-0000-000000000000\n")
        return real_open(path, *a, **k)

    monkeypatch.setattr(builtins, "open", fake_open)
    other_boot_tag = hostcache._host_tag()
    monkeypatch.setattr(builtins, "open", real_open)
    assert other_boot_tag != tag, "tag must change when boot_id changes"

    repo = tmp_path / "repo"
    stale = repo / ".jax_cache" / "deadbeef00"
    stale.mkdir(parents=True)
    (stale / "stale_entry").write_bytes(b"x")
    two_days_ago = time.time() - 2 * 24 * 3600
    os.utime(stale, (two_days_ago, two_days_ago))
    fresh = repo / ".jax_cache" / "cafecafe00"
    fresh.mkdir(parents=True)
    d = hostcache.host_cache_dir(str(repo), cpu=True)
    assert d.endswith(tag) and (repo / ".jax_cache" / tag).is_dir()
    assert not stale.exists(), "stale foreign fingerprint dir must be pruned"
    # A RECENT foreign dir survives: on a network-shared checkout another
    # live host may be using it right now (24h mtime grace).
    assert fresh.exists(), "recent foreign dir must survive the grace window"
    # Stable across calls (warm reruns on the same boot).
    assert hostcache.host_cache_dir(str(repo), cpu=True) == d
    # UNIGEO_KEEP_FOREIGN_CACHE=1 disables pruning entirely.
    stale.mkdir(parents=True)
    os.utime(stale, (two_days_ago, two_days_ago))
    monkeypatch.setenv("UNIGEO_KEEP_FOREIGN_CACHE", "1")
    hostcache.host_cache_dir(str(repo), cpu=True)
    assert stale.exists()
    monkeypatch.delenv("UNIGEO_KEEP_FOREIGN_CACHE")
    # Accelerator runs use the flat shared dir and never prune.
    flat = hostcache.host_cache_dir(str(repo), cpu=False)
    assert flat.rstrip("/").endswith(".jax_cache")
    assert stale.exists()
