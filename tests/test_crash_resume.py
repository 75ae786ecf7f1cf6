"""Crash-recovery e2e: SIGKILL mid-eval, rerun, complete (SURVEY §5
failure-detection/elastic-recovery obligation).

A real eval.py subprocess is killed with SIGKILL after it has committed at
least one clip to the CSV journal; the rerun must resume (skip committed
clips), finish the remaining ones, and produce a complete, duplicate-free
CSV.  Also pins the atomicity of the CSV journal itself: export_to_csv
writes tmp+rename, so a kill can never leave a torn file for from_csv.
"""

import os
import signal
import subprocess
import sys
import time

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "configs", "identity_synthetic.yaml")


def _rows(csv_path):
    if not os.path.isfile(csv_path):
        return []
    try:
        df = pd.read_csv(csv_path, index_col=0)
    except Exception:
        return None  # torn file — must never happen
    return [i for i in df.index if i != "Average"]


def _run_eval(out_dir, extra=()):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    return subprocess.Popen(
        [sys.executable, os.path.join(REPO, "eval.py"), "--config", CFG,
         "--output", out_dir, *extra],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


@pytest.mark.slow
def test_sigkill_mid_eval_then_resume(tmp_path):
    out = str(tmp_path / "out")
    csv = os.path.join(out, "metrics.csv")

    proc = _run_eval(out)
    try:
        # wait until at least one clip is committed to the journal
        deadline = time.time() + 240
        while time.time() < deadline:
            rows = _rows(csv)
            assert rows is not None, "torn CSV observed while running"
            if rows and len(rows) >= 1:
                break
            if proc.poll() is not None:
                pytest.fail(
                    f"eval exited early:\n{proc.stdout.read()[-2000:]}"
                )
            time.sleep(0.5)
        else:
            pytest.fail("no clip committed within the deadline")
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()

    committed = _rows(csv)
    assert committed, "journal lost after SIGKILL"

    # rerun: must resume (not recompute committed clips) and complete
    proc2 = _run_eval(out)
    out2, _ = proc2.communicate(timeout=300)
    assert proc2.returncode == 0, f"resume run failed:\n{out2[-3000:]}"

    df = pd.read_csv(csv, index_col=0)
    rows = [i for i in df.index if i != "Average"]
    assert len(rows) == len(set(rows)), "duplicate sequence rows after resume"
    assert len(rows) == 6, f"expected 6 clips, got {rows}"
    assert "Average" in df.index
    # resumed run must actually have skipped the committed clips
    for name in committed:
        assert out2.count(name) <= 1, "committed clip was re-evaluated"
