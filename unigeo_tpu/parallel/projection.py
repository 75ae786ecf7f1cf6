"""Multi-chip throughput projection from measured single-chip stage times.

VERDICT r4 #4/#5: the "more chips closes the 3× gap" claim needs numbers,
not vibes.  This module derives projected v5e-8 clip throughput for each
parallelism mode from (a) the MEASURED single-chip stage times the bench
records (BENCH_SNAPSHOT.json stage_ms) and (b) an explicit ICI transfer
model with every assumption visible below.  ``dryrun_multichip`` prints the
table; BASELINE.md documents it.

Assumptions (auditable, conservative):
  * v5e ICI: 4 links/chip; per-chip usable collective bandwidth
    ICI_GBPS = 90 GB/s (public spec 1,600 Gbit/s/chip aggregate ≈ 200 GB/s;
    we assume <half is attainable for ring collectives).
  * Ring all-reduce of V bytes over n chips costs 2·(n-1)/n · V / BW.
  * The v5e core executes programs serially (measured,
    tools/measure_overlap.py), so single-chip clip time = sum of stages.
  * Host→device feed is excluded: on a pod host PCIe moves a 59 MB clip in
    ~6 ms; the dev tunnel's ~40 MB/s is an artifact of this environment
    (tools/ablate_spann3r.py), not of the design.
  * dp eval needs NO collectives at all: each chip runs the full pipeline
    on its own clips (parallel/executor.py, CSV-identical to serial) — the
    only multi-chip assumption is that params fit per chip (SVD-XT bf16
    ≈ 3 GB < 16 GB HBM ✓).

TP communication volume is computed from the SVD-XT transformer layout at
the headline shape (25 frames, 48×64 latents): Megatron-style TP does two
all-reduces per transformer (after attention out-proj and after MLP
down-proj) of the full activation [M, C].
"""

from __future__ import annotations

import json
from typing import Dict

ICI_GBPS = 90.0

# SVD-XT spatial+temporal transformer sites at 384×512 (latent 48×64):
# (tokens per frame-stack M/T, channels, count).  5 down+up transformers at
# each of levels 0-1, 6 at level 2 incl. mid (16 total, the measured
# attribution in ROADMAP "UNet step attribution").  Temporal transformers
# double each site's all-reduce count at the same M·C.
_SVD_TF_SITES = [
    (48 * 64, 320, 5),
    (24 * 32, 640, 5),
    (12 * 16, 1280, 6),
]


def _allreduce_ms(vol_bytes: float, n: int, ici_gbps: float) -> float:
    return 2.0 * (n - 1) / n * vol_bytes / (ici_gbps * 1e9) * 1e3


def _tp_denoise_comm_ms(frames: int, steps: int, n: int,
                        ici_gbps: float) -> float:
    """Per-clip all-reduce time for tp-sharded UNet denoise (bf16 acts)."""
    per_step = 0.0
    for m_per_frame, c, count in _SVD_TF_SITES:
        m = m_per_frame * frames
        # 2 allreduces per spatial transformer + 2 per temporal twin
        per_step += count * 4 * (m * c * 2)
    return steps * _allreduce_ms(per_step, n, ici_gbps)


def project_v5e(stage_ms: Dict[str, float], frames: int = 25,
                n: int = 8, steps: int = 5,
                ici_gbps: float = ICI_GBPS) -> Dict:
    """stage_ms: measured {"encode+clip", "denoise", "decode"} in ms."""
    enc = float(stage_ms["encode+clip"])
    den = float(stage_ms["denoise"])
    dec = float(stage_ms["decode"])
    clip_ms = enc + den + dec
    single_fps = frames / clip_ms * 1e3

    out = {
        "inputs": {"stage_ms": {"encode+clip": enc, "denoise": den,
                                "decode": dec},
                   "frames_per_clip": frames, "chips": n,
                   "ici_gbps_assumed": ici_gbps,
                   "single_chip_fps": round(single_fps, 2)},
        "modes": {},
    }

    # --- dp: each chip evaluates its own clips; zero collectives ---------
    out["modes"]["dp"] = {
        "fps": round(n * single_fps, 1),
        "model": "n x single-chip (no inter-chip communication in eval; "
                 "parity: parallel/executor.py CSV-identical to serial)",
    }

    # --- staged pp: search the best 3-way chip split ---------------------
    # inter-stage ICI: the encode→denoise handoff moves cond latents
    # (frames × 48×64 × 8ch bf16) and denoise→decode moves the denoised
    # latents (× 4ch) — ~0.05 ms/clip at 90 GB/s.  Added to each stage's
    # effective service time.
    xfer_ms = (frames * 48 * 64 * 12 * 2) / (ici_gbps * 1e9) * 1e3
    best = None
    for e in range(1, n - 1):
        for d in range(1, n - e):
            c = n - e - d
            rate = min(e / (enc + xfer_ms), d / (den + xfer_ms),
                       c / (dec + xfer_ms))  # clips per ms
            if best is None or rate > best[0]:
                best = (rate, e, d, c)
    rate, e_chips, d_chips, c_chips = best
    pp_fps = rate * 1e3 * frames
    out["modes"]["staged_pp"] = {
        "fps": round(pp_fps, 1),
        "split": {"encode": e_chips, "denoise": d_chips, "decode": c_chips},
        "interstage_ms_per_clip": round(xfer_ms, 3),
        "model": "throughput = min_i(chips_i / stage_ms_i); executor: "
                 "parallel/staged.py (serial-matching)",
    }

    # --- tp on the UNet denoise: latency mode ----------------------------
    comm = _tp_denoise_comm_ms(frames, steps, n, ici_gbps)
    tp_clip_ms = enc + den / n + comm + dec
    out["modes"]["tp_denoise"] = {
        "clip_latency_ms": round(tp_clip_ms, 1),
        "latency_speedup": round(clip_ms / tp_clip_ms, 2),
        "fps_throughput": round(frames / tp_clip_ms * 1e3, 1),
        "allreduce_ms_per_clip": round(comm, 1),
        "model": "denoise/n + ring-allreduce(2 per transformer x 32 "
                 "sites x bf16 acts); encode+decode stay single-chip "
                 "(VAE TP all-reduces 100s of MB per site — not worth it)",
    }

    # --- sp over frames: long-clip latency mode --------------------------
    # spatial attention + convs are frame-local; temporal transformers
    # all-gather the frame axis (same M·C volume as one allreduce per site)
    sp_comm = _tp_denoise_comm_ms(frames, steps, n, ici_gbps) / 2
    sp_clip_ms = enc + den / n + sp_comm + dec
    out["modes"]["sp_frames"] = {
        "clip_latency_ms": round(sp_clip_ms, 1),
        "latency_speedup": round(clip_ms / sp_clip_ms, 2),
        "model": "frame-sharded denoise (parallel/context.py, max|dlt|=0 "
                 "vs serial); temporal attention all-gathers the frame "
                 "axis",
    }

    base_central = 7.03  # BASELINE.md A100 flop-derived central
    out["north_star"] = {
        "baseline_central_fps": base_central,
        "dp8_vs_central": round(out["modes"]["dp"]["fps"] / base_central, 2),
        "statement": "the 3x-central target is met at 8 chips by the "
                     "zero-communication dp mode alone; pp/tp/sp trade "
                     "throughput for latency or memory headroom",
    }
    return out


def main(snapshot_path: str = None) -> Dict:
    import os

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = snapshot_path or os.path.join(repo, "BENCH_SNAPSHOT.json")
    stage_ms = {"encode+clip": 247.0, "denoise": 1382.5, "decode": 446.0}
    source = "fallback (BENCH_r04 measurements)"
    try:
        with open(path) as f:
            snap = json.load(f)
        if "stage_ms" in snap:
            stage_ms = snap["stage_ms"]
            source = f"measured ({os.path.basename(path)})"
    except Exception:
        pass
    table = project_v5e(stage_ms)
    table["inputs"]["stage_ms_source"] = source
    return table


if __name__ == "__main__":
    print(json.dumps(main(), indent=1))
