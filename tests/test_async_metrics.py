"""Async-metrics evaluator path: identical CSVs, real overlap, clean errors.

The evaluator scores clip i on a worker thread while clip i+1's forward
runs (unigeo_tpu/evaluator.py run_evaluation(async_metrics=...)).  These
tests pin the contract that makes it safe to default on:

  * byte-identical metrics.csv vs the synchronous path;
  * worker exceptions re-raise on the main thread (not swallowed);
  * the queue is bounded (at most 2 outputs held);
  * resume still skips scored sequences with async on.
"""

import threading

import numpy as np
import pytest

from unigeo_tpu.config import EvalConfig
from unigeo_tpu.data.synthetic import SyntheticBoxDataset
from unigeo_tpu.models.identity import IdentityModel
from unigeo_tpu.evaluator import run_evaluation

CFG = "configs/identity_synthetic.yaml"


@pytest.fixture(scope="module")
def dataset():
    return SyntheticBoxDataset(
        clip_length=4, clip_overlap=0, num_scenes=2, frames_per_scene=4,
        render_size=(48, 64),
    )


def _cfg():
    cfg = EvalConfig.from_yaml(CFG)
    return cfg


def test_async_csv_identical_to_sync(tmp_path, dataset):
    cfg = _cfg()
    run_evaluation(
        cfg, save_dir=str(tmp_path / "sync"), dataset=dataset,
        model=IdentityModel(), verbose=False, async_metrics=False,
    )
    run_evaluation(
        cfg, save_dir=str(tmp_path / "async"), dataset=dataset,
        model=IdentityModel(), verbose=False, async_metrics=True,
    )
    sync_csv = (tmp_path / "sync" / "metrics.csv").read_text()
    async_csv = (tmp_path / "async" / "metrics.csv").read_text()
    assert async_csv == sync_csv


def test_async_worker_exception_propagates(tmp_path, dataset):
    cfg = EvalConfig.from_dict(
        {
            "dataset": "SyntheticBoxDataset",
            "model_name": "IdentityModel",
            "h": 48, "w": 64,
            "eval_depth": {"metric_names": ["Abs Rel"],
                           "depth_alignment": "lstsq"},
        }
    )

    class BadOutputModel:
        def forward(self, data):
            out = IdentityModel().forward(data)
            out["pred_depths"] = "not an array"  # metrics will explode
            return out

    with pytest.raises(Exception):
        run_evaluation(
            cfg, save_dir=str(tmp_path), dataset=dataset,
            model=BadOutputModel(), verbose=False, async_metrics=True,
        )


def test_async_overlap_actually_happens(tmp_path, dataset):
    """The worker thread must score while the main thread is inside the
    NEXT forward — observed via thread names at forward time."""
    cfg = _cfg()
    record_threads = []
    forward_during_record = threading.Event()
    base = IdentityModel()

    class ObservingModel:
        def forward(self, data):
            # if any record worker is mid-flight now, overlap is real
            for t in threading.enumerate():
                if t.name.startswith("metrics") and t != threading.current_thread():
                    record_threads.append(t.name)
            return base.forward(data)

    run_evaluation(
        cfg, save_dir=str(tmp_path), dataset=dataset, model=ObservingModel(),
        verbose=False, async_metrics=True,
    )
    # the pool thread exists from the second clip onward
    assert record_threads, "metrics worker thread never observed"


def test_async_worker_failure_surfaces_before_next_forward(tmp_path):
    """A finished worker failure must re-raise at the TOP of the loop, not
    only once the bounded queue forces a result() — otherwise clip i's
    scoring error costs one-to-two extra full device forwards (ADVICE r4)."""
    import time

    dataset = SyntheticBoxDataset(
        clip_length=4, clip_overlap=0, num_scenes=4, frames_per_scene=4,
        render_size=(48, 64),
    )
    cfg = EvalConfig.from_dict(
        {
            "dataset": "SyntheticBoxDataset",
            "model_name": "IdentityModel",
            "h": 48, "w": 64,
            "eval_depth": {"metric_names": ["Abs Rel"],
                           "depth_alignment": "lstsq"},
        }
    )
    calls = []

    class SlowBadModel:
        def forward(self, data):
            calls.append(1)
            time.sleep(0.2)  # lets the (instantly-failing) worker finish
            out = IdentityModel().forward(data)
            out["pred_depths"] = "not an array"  # first record explodes
            return out

    with pytest.raises(Exception):
        run_evaluation(
            cfg, save_dir=str(tmp_path), dataset=dataset,
            model=SlowBadModel(), verbose=False, async_metrics=True,
        )
    # forward 1 queues the failing record; forward 2 may start before the
    # failure lands; forward 3 must NOT run.
    assert len(calls) <= 2, f"{len(calls)} forwards ran after a worker failure"


def test_async_resume_skips_scored(tmp_path, dataset):
    cfg = _cfg()
    run_evaluation(
        cfg, save_dir=str(tmp_path), dataset=dataset, model=IdentityModel(),
        max_clips=1, verbose=False, async_metrics=True,
    )
    before = (tmp_path / "metrics.csv").read_text()

    class ExplodingModel:
        def forward(self, data):
            raise AssertionError("resume must skip scored sequences")

    run_evaluation(
        cfg, save_dir=str(tmp_path), dataset=dataset, model=ExplodingModel(),
        max_clips=1, verbose=False, async_metrics=True,
    )
    assert (tmp_path / "metrics.csv").read_text() == before
