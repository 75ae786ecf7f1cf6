"""Golden fingerprints for every dataset loader (VERDICT r1 item 9).

Each loader runs over its deterministic fixture scene and the emitted
unified sample dict is fingerprinted: full extrinsics/intrinsics values
(the convention-critical part — one sign flip in coords.py shows up here
exactly), plus shape/moments/probe pixels for the dense arrays.  The
fingerprints are committed in tests/goldens/loader_goldens.json, so a
refactor of coords.py / data/base.py / a loader cannot silently flip a
pose convention, a depth scale, or a mask rule.

Regenerate intentionally with:
    UNIGEO_UPDATE_GOLDENS=1 python -m pytest tests/test_loader_goldens.py
"""

import json
import os
import os.path as osp

import numpy as np
import pytest

from fixtures_loaders import BUILDERS

GOLDENS_PATH = osp.join(osp.dirname(__file__), "goldens", "loader_goldens.json")

# keys stored with FULL values (small, exact math — the convention core)
_FULL_KEYS = ("extrinsics", "intrinsics")
# dense per-pixel arrays stored as moments + probes
_DENSE_KEYS = (
    "images", "cam_coord", "world_coord", "cam_normal", "world_normal", "mask",
)


def _fingerprint(sample):
    fp = {"keys": sorted(k for k in sample)}
    for k in _FULL_KEYS:
        fp[k] = np.asarray(sample[k], np.float64).round(6).tolist()
    for k in _DENSE_KEYS:
        if k not in sample:
            continue
        a = np.asarray(sample[k], np.float64)
        h, w = a.shape[-2], a.shape[-1]
        fp[k] = {
            "shape": list(a.shape),
            "mean": float(a.mean()),
            "std": float(a.std()),
            "min": float(a.min()),
            "max": float(a.max()),
            # probe pixels: center + quarter point of frame 0 (channel 0)
            "probe_center": a[(0,) * (a.ndim - 2) + (h // 2, w // 2)].item(),
            "probe_quarter": a[(0,) * (a.ndim - 2) + (h // 4, w // 4)].item(),
        }
    fp["keyview_idx"] = int(sample["keyview_idx"])
    return fp


def _assert_matches(got, want, name):
    assert got["keys"] == want["keys"], f"{name}: sample keys changed"
    assert got["keyview_idx"] == want["keyview_idx"]
    for k in _FULL_KEYS:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), atol=1e-5,
            err_msg=f"{name}.{k}: pose/intrinsics convention changed",
        )
    for k in _DENSE_KEYS:
        if k not in want:
            continue
        g, w_ = got[k], want[k]
        assert g["shape"] == w_["shape"], f"{name}.{k}: shape changed"
        # `images` decode from the reference's LOSSY on-disk formats (jpg,
        # default webp) — a Pillow/libjpeg/libwebp version change shifts
        # pixels by ±1-2 on the 0-255 scale, which is codec behavior, not
        # loader behavior.  atol 2.5 still catches every convention bug
        # (channel swap, 0-1 vs 0-255 normalization, BGR, transposes).
        # Everything else (depth/coords/normals/mask from PNG/HDF5/text)
        # is lossless and stays pinned tight.
        atol = 2.5 if k == "images" else 1e-4
        for stat in ("mean", "std", "min", "max", "probe_center",
                     "probe_quarter"):
            np.testing.assert_allclose(
                g[stat], w_[stat], rtol=1e-4, atol=atol,
                err_msg=f"{name}.{k}.{stat} drifted",
            )


@pytest.mark.parametrize("name", sorted(BUILDERS))
def test_loader_golden(name, tmp_path):
    if name == "HyperSimDataset":
        pytest.importorskip("h5py")
    ds = BUILDERS[name](str(tmp_path / "root"), str(tmp_path / "cache"))
    got = _fingerprint(ds[0])

    if os.environ.get("UNIGEO_UPDATE_GOLDENS") == "1":
        os.makedirs(osp.dirname(GOLDENS_PATH), exist_ok=True)
        all_goldens = {}
        if osp.exists(GOLDENS_PATH):
            with open(GOLDENS_PATH) as f:
                all_goldens = json.load(f)
        all_goldens[name] = got
        with open(GOLDENS_PATH, "w") as f:
            json.dump(all_goldens, f, indent=1, sort_keys=True)
        pytest.skip("goldens updated")

    assert osp.exists(GOLDENS_PATH), (
        "no goldens committed; run with UNIGEO_UPDATE_GOLDENS=1"
    )
    with open(GOLDENS_PATH) as f:
        all_goldens = json.load(f)
    assert name in all_goldens, f"no golden for {name}; regenerate"
    _assert_matches(got, all_goldens[name], name)
