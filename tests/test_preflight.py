"""Dataset-root preflight (eval.py --validate-root, data/preflight.py).

Healthy fixture layouts must pass; deliberately broken layouts must fail
with the targeted check and an actionable message (VERDICT r4 #7 — cheap
first contact with real dataset downloads)."""

import os
import os.path as osp

import numpy as np
import pytest

from tests.fixtures_loaders import build_replica, build_seven_scenes
from unigeo_tpu.data.preflight import format_report, validate_root
from unigeo_tpu.data.synthetic import SyntheticBoxDataset


def _statuses(result, check):
    return [c for c in result["checks"] if c["check"] == check]


def test_healthy_seven_scenes_passes(tmp_path):
    ds = build_seven_scenes(str(tmp_path / "root"), str(tmp_path / "cache"))
    result = validate_root(ds)
    assert result["ok"], format_report(result)
    names = {c["check"] for c in result["checks"]}
    assert {"scenes", "files_exist", "rgb_decode", "depth_scale",
            "pose_rigid", "intrinsics", "sample_contract"} <= names
    assert all(c["status"] != "fail" for c in result["checks"])


def test_healthy_replica_passes(tmp_path):
    ds = build_replica(str(tmp_path / "root"), str(tmp_path / "cache"))
    result = validate_root(ds)
    assert result["ok"], format_report(result)


def test_synthetic_dataset_passes(tmp_path):
    """Virtual-frame datasets (token paths) skip the existence probe but
    still decode + validate end to end."""
    ds = SyntheticBoxDataset(clip_length=2, clip_overlap=0, num_scenes=1,
                             frames_per_scene=2, render_size=(48, 64))
    result = validate_root(ds)
    assert result["ok"], format_report(result)
    assert not _statuses(result, "files_exist")  # probe skipped


def test_missing_depth_file_fails(tmp_path):
    ds = build_seven_scenes(str(tmp_path / "root"), str(tmp_path / "cache"))
    victim = ds._abs(ds.load_scene_index("chess/seq-01").depth_paths[-1])
    os.remove(victim)
    result = validate_root(ds)
    assert not result["ok"]
    # the re-glob surfaces the missing file as an rgb/depth count mismatch
    # at scene_index time, or as a files_exist miss — either is actionable
    fails = [c for c in result["checks"] if c["status"] == "fail"]
    assert fails, result
    assert any("align" in c["detail"] or "missing" in c["detail"]
               for c in fails), fails


def test_non_rigid_pose_fails(tmp_path):
    from unigeo_tpu.data.loaders import SevenScenesDataset

    root = str(tmp_path / "root")
    build_seven_scenes(root, str(tmp_path / "cache"))
    # overwrite one pose with a non-orthonormal matrix (the builder would
    # regenerate the files, so construct the dataset directly after)
    bad = np.eye(4)
    bad[:3, :3] *= 3.0
    np.savetxt(osp.join(root, "chess", "seq-01", "frame-000001.pose.txt"), bad)
    ds2 = SevenScenesDataset(root=root, scene_list=["chess/seq-01"],
                             clip_length=4, cache_dir=str(tmp_path / "cache2"))
    result = validate_root(ds2)
    assert not result["ok"]
    fails = _statuses(result, "pose_rigid")
    assert fails and fails[0]["status"] == "fail"
    assert "orthonormal" in fails[0]["detail"]


def test_depth_scale_warning(tmp_path):
    """Depth stored with the wrong scale (raw units instead of mm) → the
    /1000 divisor yields sub-millimeter medians → actionable warning."""
    from PIL import Image

    from unigeo_tpu.data.loaders import SevenScenesDataset

    root = str(tmp_path / "root")
    build_seven_scenes(root, str(tmp_path / "cache"))
    scene = osp.join(root, "chess", "seq-01")
    for i in range(4):
        p = osp.join(scene, f"frame-{i:06d}.depth.proj.png")
        depth = np.asarray(Image.open(p), np.uint16)
        Image.fromarray((depth // 1000).astype(np.uint16)).save(p)
    ds2 = SevenScenesDataset(root=root, scene_list=["chess/seq-01"],
                             clip_length=4, cache_dir=str(tmp_path / "cache2"))
    result = validate_root(ds2)
    warns = [c for c in _statuses(result, "depth_scale")
             if c["status"] == "warn"]
    assert warns and "divisor" in warns[0]["detail"]


def test_empty_root_fails(tmp_path):
    from unigeo_tpu.data.loaders import SevenScenesDataset

    root = tmp_path / "empty"
    root.mkdir()
    ds = SevenScenesDataset(root=str(root), clip_length=4,
                            cache_dir=str(tmp_path / "cache"))
    result = validate_root(ds)
    assert not result["ok"]
    assert _statuses(result, "scenes")[0]["status"] == "fail"


def test_format_report_readable(tmp_path):
    ds = build_seven_scenes(str(tmp_path / "root"), str(tmp_path / "cache"))
    text = format_report(validate_root(ds))
    assert "OK" in text and "depth_scale" in text


def test_cli_validate_root(tmp_path):
    """--validate-root through the eval CLI on the synthetic config."""
    import subprocess
    import sys

    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "eval.py", "--config",
         "configs/identity_synthetic.yaml", "--validate-root"],
        capture_output=True, text=True, env=env, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "preflight" in out.stdout and "OK" in out.stdout
