"""End-to-end evaluation over the checklist-dataset loaders.

Each declared-but-unshipped reference dataset (tumRGBD / sintel /
interiornet, dataset/Readme.md:3,10,12 — plus the two rows the reference
leaves unchecked, vkitti / matrixcity, dataset/Readme.md:3-4) runs through the FULL evaluation
pipeline on its on-disk format fixture with the GT-passthrough model: a
perfect score on every metric family proves the loader's sample dict is
self-consistent through GT prep, all four metric suites, and the CSV
contract — the same bar the synthetic fixture sets in test_pipeline_e2e.
"""

import os

import pandas as pd
import pytest

from unigeo_tpu.config import EvalConfig
from unigeo_tpu.evaluator import run_evaluation
from unigeo_tpu.models.identity import IdentityModel

from fixtures_loaders import (
    build_interiornet,
    build_matrixcity,
    build_sintel,
    build_tumrgbd,
    build_vkitti,
)

CFG = os.path.join(
    os.path.dirname(__file__), "..", "configs", "identity_synthetic.yaml"
)

BUILDERS = {
    "sintel": build_sintel,
    "tumrgbd": build_tumrgbd,
    "interiornet": build_interiornet,
    "vkitti": build_vkitti,
    "matrixcity": build_matrixcity,
}


@pytest.mark.parametrize("name", sorted(BUILDERS))
def test_checklist_loader_end_to_end(name, tmp_path):
    ds = BUILDERS[name](str(tmp_path / "root"), str(tmp_path / "cache"))
    cfg = EvalConfig.from_yaml(CFG)  # metric blocks only; dataset overridden
    manager = run_evaluation(
        cfg,
        save_dir=str(tmp_path / "out"),
        dataset=ds,
        model=IdentityModel(),
        verbose=False,
    )
    avg = manager.calculate_averages()
    assert avg["Abs Rel"] < 1e-4
    assert avg["delta < 1.25"] > 0.9999
    assert avg["normal mean"] < 0.5
    assert avg["ATE"] < 1e-4
    assert avg["acc"] < 5e-3 and avg["comp"] < 5e-3

    csv = pd.read_csv(tmp_path / "out" / "metrics.csv", index_col=0)
    assert "Average" in csv.index
    assert list(csv.columns) == cfg.metric_names
