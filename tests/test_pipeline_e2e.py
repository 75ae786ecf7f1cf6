"""Hermetic end-to-end pipeline test (SURVEY.md §4 items 2-3).

Synthetic dataset → identity model → full metrics → CSV.  A GT-passthrough
prediction must score perfectly on every metric family; this exercises every
coordinate conversion in the loader, GT prep, and metrics in one pass.
"""

import os

import numpy as np
import pandas as pd
import pytest

from unigeo_tpu.config import EvalConfig
from unigeo_tpu.data.sample import prepare_gt_label, validate_sample
from unigeo_tpu.data.synthetic import SyntheticBoxDataset
from unigeo_tpu.evaluator import run_evaluation
from unigeo_tpu.models.identity import IdentityModel

CFG = os.path.join(os.path.dirname(__file__), "..", "configs", "identity_synthetic.yaml")


@pytest.fixture(scope="module")
def dataset():
    return SyntheticBoxDataset(
        clip_length=6, clip_overlap=0, num_scenes=1, frames_per_scene=6,
        render_size=(64, 96),
    )


def test_synthetic_sample_contract(dataset):
    data = dataset[0]
    validate_sample(data)
    # keyview extrinsic must be identity after rebasing
    assert np.allclose(data["extrinsics"][0], np.eye(4), atol=1e-5)
    # world_coord of frame 0 equals cam_coord of frame 0
    assert np.allclose(data["world_coord"][0], data["cam_coord"][0], atol=1e-5)
    # most pixels valid
    assert data["mask"].mean() > 0.95


def test_synthetic_depth_consistency(dataset):
    """Backprojected camera points must be consistent across frames once
    moved into the keyview frame: overlapping walls coincide."""
    data = dataset[0]
    gt = prepare_gt_label(data)
    # world points from different frames lie inside the box bounds
    pts = gt["gt_world_pts"][gt["gt_masks"]]
    assert np.abs(pts).max() < 6.0


def test_gt_label_shapes(dataset):
    data = dataset[0]
    gt = prepare_gt_label(data)
    nf, _, h, w = data["images"].shape
    assert gt["gt_world_pts"].shape == (nf, h, w, 3)
    assert gt["gt_depths"].shape == (nf, h, w)
    assert gt["gt_poses"].shape == (nf, 4, 4)
    assert gt["gt_normals"].shape == (nf, h, w, 3)
    # depths positive where valid
    assert (gt["gt_depths"][gt["gt_masks"]] > 0).all()
    # normals unit where valid
    norms = np.linalg.norm(gt["gt_normals"][gt["gt_masks"]], axis=-1)
    assert np.allclose(norms, 1.0, atol=1e-3)


def test_identity_model_perfect_scores(tmp_path, dataset):
    cfg = EvalConfig.from_yaml(CFG)
    manager = run_evaluation(
        cfg,
        save_dir=str(tmp_path),
        dataset=dataset,
        model=IdentityModel(),
        max_clips=1,
        verbose=False,
    )
    avg = manager.calculate_averages()
    assert avg["Abs Rel"] < 1e-4
    assert avg["delta < 1.25"] > 0.9999
    assert avg["normal mean"] < 0.5
    assert avg["angle < 7.5"] > 99.9
    assert avg["acc"] < 5e-3
    assert avg["comp"] < 5e-3
    assert avg["nc1"] > 0.9
    assert avg["ATE"] < 1e-4
    assert avg["RPE rot"] < 0.05

    csv = pd.read_csv(tmp_path / "metrics.csv", index_col=0)
    assert "Average" in csv.index
    assert list(csv.columns) == cfg.metric_names


def test_resume_skips_scored_sequences(tmp_path, dataset):
    cfg = EvalConfig.from_yaml(CFG)
    run_evaluation(
        cfg, save_dir=str(tmp_path), dataset=dataset, model=IdentityModel(),
        max_clips=1, verbose=False,
    )
    csv_before = (tmp_path / "metrics.csv").read_text()

    class ExplodingModel:
        def forward(self, data):
            raise AssertionError("resume must skip already-scored sequences")

    run_evaluation(
        cfg, save_dir=str(tmp_path), dataset=dataset, model=ExplodingModel(),
        max_clips=1, verbose=False,
    )
    assert (tmp_path / "metrics.csv").read_text() == csv_before


def test_noisy_identity_degrades_metrics(tmp_path, dataset):
    cfg = EvalConfig.from_yaml(CFG)
    manager = run_evaluation(
        cfg,
        save_dir=str(tmp_path),
        dataset=dataset,
        model=IdentityModel(depth_noise=0.05, normal_noise_deg=10.0),
        max_clips=1,
        verbose=False,
        resume=False,
    )
    avg = manager.calculate_averages()
    assert 0.01 < avg["Abs Rel"] < 0.2
    assert 2.0 < avg["normal mean"] < 30.0


def test_data_parallel_eval_matches_serial(tmp_path):
    """Eval through the dp batched path (forward_batch over 8 virtual
    devices) produces a byte-identical CSV to the serial clip loop
    (SURVEY.md §2.7 DP row; VERDICT r1 item 4)."""
    dataset = SyntheticBoxDataset(
        clip_length=4, clip_overlap=0, num_scenes=3, frames_per_scene=4,
        render_size=(48, 64),
    )
    cfg = EvalConfig.from_yaml(CFG)

    run_evaluation(
        cfg, save_dir=str(tmp_path / "serial"), dataset=dataset,
        model=IdentityModel(), verbose=False, data_parallel=False,
    )
    run_evaluation(
        cfg, save_dir=str(tmp_path / "dp"), dataset=dataset,
        model=IdentityModel(), verbose=False, data_parallel=True,
    )
    serial = (tmp_path / "serial" / "metrics.csv").read_text()
    batched = (tmp_path / "dp" / "metrics.csv").read_text()
    assert serial == batched


def test_data_parallel_resume_skips_scored(tmp_path):
    """Resume semantics survive the batched path: already-scored sequences
    never reach forward_batch."""
    dataset = SyntheticBoxDataset(
        clip_length=4, clip_overlap=0, num_scenes=3, frames_per_scene=4,
        render_size=(48, 64),
    )
    cfg = EvalConfig.from_yaml(CFG)
    run_evaluation(
        cfg, save_dir=str(tmp_path), dataset=dataset, model=IdentityModel(),
        max_clips=2, verbose=False, data_parallel=True,
    )

    class CountingIdentity(IdentityModel):
        seen = []

        def forward_batch(self, datas):
            CountingIdentity.seen.extend(d["scene_name"] for d in datas)
            return super().forward_batch(datas)

    run_evaluation(
        cfg, save_dir=str(tmp_path), dataset=dataset,
        model=CountingIdentity(), verbose=False, data_parallel=True,
    )
    # only the one unscored clip went through the model
    assert len(CountingIdentity.seen) == 1
