"""Multi-chip throughput projection model (parallel/projection.py)."""

import numpy as np

from unigeo_tpu.parallel.projection import main, project_v5e


STAGES = {"encode+clip": 250.0, "denoise": 1400.0, "decode": 450.0}


def test_dp_is_linear():
    t = project_v5e(STAGES, n=8)
    single = t["inputs"]["single_chip_fps"]
    assert abs(t["modes"]["dp"]["fps"] - 8 * single) < 0.5


def test_pp_split_uses_all_chips_and_beats_single():
    t = project_v5e(STAGES, n=8)
    split = t["modes"]["staged_pp"]["split"]
    assert sum(split.values()) == 8
    assert t["modes"]["staged_pp"]["fps"] > 4 * t["inputs"]["single_chip_fps"]
    # denoise is the heaviest stage → gets the most chips
    assert split["denoise"] == max(split.values())


def test_tp_comm_scales_with_bandwidth():
    slow = project_v5e(STAGES, n=8, ici_gbps=45.0)
    fast = project_v5e(STAGES, n=8, ici_gbps=180.0)
    assert (slow["modes"]["tp_denoise"]["allreduce_ms_per_clip"]
            > 2 * fast["modes"]["tp_denoise"]["allreduce_ms_per_clip"])
    # tp is a latency win but a throughput loss vs dp — the table's point
    assert slow["modes"]["tp_denoise"]["latency_speedup"] > 1.5
    assert (slow["modes"]["tp_denoise"]["fps_throughput"]
            < slow["modes"]["dp"]["fps"] / 2)


def test_main_reads_snapshot():
    t = main()
    assert "stage_ms_source" in t["inputs"]
    assert t["north_star"]["dp8_vs_central"] > 3.0
    assert np.isfinite(t["modes"]["sp_frames"]["clip_latency_ms"])
