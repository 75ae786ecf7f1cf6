"""Attribute Spann3R's full-adapter clip time on the real chip.

VERDICT r4 Weak #1: BENCH_r04 reports 6112.7 ms/clip for the ViT-L 20-frame
adapter with no stage split.  This tool measures, RTT-corrected on the
tunneled backend, each piece the adapter pays per clip:

  upload_f32 / upload_u8   host->device clip transfer (47 MB vs 11.8 MB)
  network                  jitted ring-memory ViT forward
  camera                   focal (Weiszfeld) + batched DLT-PnP, as-shipped
                           (eager glue + separate jit) AND fully jitted
  normals                  surface_normals_from_points
  download                 pts/depths/normals/conf device->host fetches
  adapter_total            the shipped Spann3R.forward(data)

Run on the default (axon/TPU) platform:  timeout 600 python tools/ablate_spann3r.py
Small smoke (CPU ok):  SPANN3R_SMALL=1 PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu ...
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


from tools._benchlib import measure_rtt, timed_blocking  # noqa: E402

timed = timed_blocking


def main():
    small = os.environ.get("SPANN3R_SMALL", "0") == "1"
    from unigeo_tpu.models.pointmap.spann3r import Spann3R, tiny_spann3r_config
    from unigeo_tpu.models.camera_solver import (
        solve_depth_and_camera_from_pointmaps,
    )
    from unigeo_tpu.ops.normals import surface_normals_from_points

    if small:
        nf, h, w = 4, 64, 96
        net_cfg = tiny_spann3r_config()
    else:
        nf, h, w = 20, 384, 512
        net_cfg = dict(enc_width=1024, enc_depth=24, enc_heads=16,
                       dec_width=768, dec_depth=12, dec_heads=12)

    gen = np.random.default_rng(0)
    images_f32 = gen.uniform(0, 255, (nf, 3, h, w)).astype(np.float32)
    data = {"images": images_f32, "scene_name": "bench", "keyview_idx": 0}

    model = Spann3R(network_config=net_cfg, init_height=h, init_width=w,
                    init_frames=nf)
    rtt = measure_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 1), "nf": nf, "h": h, "w": w}

    # --- shipped adapter end-to-end -------------------------------------
    model.forward(data)  # compile + warm
    out["adapter_total_ms"] = round(timed(lambda: model.forward(data), rtt) * 1e3, 1)

    # --- uploads --------------------------------------------------------
    frames_hwc = np.moveaxis(images_f32, 1, -1) / 255.0
    frames_u8 = np.moveaxis(images_f32, 1, -1).astype(np.uint8)
    fetch = jax.jit(lambda x: jnp.float32(x.reshape(-1)[0]))

    def up(arr):
        d = jax.device_put(arr)
        float(fetch(d))

    out["upload_f32_ms"] = round(timed(lambda: up(frames_hwc.astype(np.float32)), rtt) * 1e3, 1)
    out["upload_u8_ms"] = round(timed(lambda: up(frames_u8), rtt) * 1e3, 1)

    # --- network (device-resident input, sum-fetch) ---------------------
    frames_dev = jax.device_put(frames_hwc.astype(np.float32))
    net_sum = jax.jit(
        lambda p, f: jnp.float32(jnp.sum(model.network.apply(p, f)[0].astype(jnp.float32)))
    )
    out["network_ms"] = round(
        timed(lambda: float(net_sum(model.params, frames_dev)), rtt) * 1e3, 1)

    # --- camera solve ----------------------------------------------------
    pts, conf = model._forward(model.params, frames_dev)
    pts.block_until_ready()

    def cam_as_shipped():
        cam_pts, ext, _ = solve_depth_and_camera_from_pointmaps(pts)
        float(jnp.sum(ext))

    out["camera_as_shipped_ms"] = round(timed(cam_as_shipped, rtt) * 1e3, 1)

    cam_jit = jax.jit(
        lambda p: tuple(jnp.sum(x.astype(jnp.float32))
                        for x in solve_depth_and_camera_from_pointmaps(p)[:2])
    )
    out["camera_one_jit_ms"] = round(
        timed(lambda: [float(v) for v in cam_jit(pts)], rtt) * 1e3, 1)

    # --- normals ---------------------------------------------------------
    cam_pts, ext, _ = solve_depth_and_camera_from_pointmaps(pts)
    cam_pts = jax.device_put(np.asarray(cam_pts))
    nrm_sum = jax.jit(
        lambda c: jnp.float32(jnp.sum(surface_normals_from_points(c))))
    out["normals_ms"] = round(
        timed(lambda: float(nrm_sum(cam_pts)), rtt) * 1e3, 1)

    # --- downloads -------------------------------------------------------
    nrm = surface_normals_from_points(cam_pts)
    nrm.block_until_ready()
    out["download_pts_ms"] = round(timed(lambda: np.asarray(pts), rtt, warm=False) * 1e3, 1)
    out["download_all_ms"] = round(
        timed(lambda: (np.asarray(pts), np.asarray(cam_pts[..., 2]),
                       np.asarray(nrm), np.asarray(conf)), rtt, warm=False) * 1e3, 1)

    known = (out["upload_f32_ms"] + out["network_ms"]
             + out["camera_as_shipped_ms"] + out["normals_ms"]
             + out["download_all_ms"])
    out["sum_known_ms"] = round(known, 1)
    out["unattributed_ms"] = round(out["adapter_total_ms"] - known, 1)

    # --- fused device program (round-5 path) -----------------------------
    from unigeo_tpu.models.pointmap import adapter as _adapter

    raw = _adapter.raw_clip(data)
    raw_dev = jax.device_put(raw)
    out["fused_program_ms"] = round(timed(
        lambda: float(model._forward_full(model.params, raw_dev)["pred_poses"][0, 0, 0]),
        rtt) * 1e3, 1)

    def fused_total():
        outs = model._forward_full(model.params, jax.device_put(raw))
        _adapter.fetch_outputs(outs)

    out["fused_upload+program+download_ms"] = round(timed(fused_total, rtt) * 1e3, 1)

    # --- honest download (fresh outputs each rep: jax caches _npy_value,
    # so re-fetching the SAME arrays reads ~0 ms) ------------------------
    def dl_once():
        outs = model._forward_full(model.params, raw_dev)
        float(outs["pred_poses"][0, 0, 0])  # sync compute first
        t0 = time.perf_counter()
        _adapter.fetch_outputs(outs)
        return time.perf_counter() - t0

    dl_once()
    out["download_honest_ms"] = round(min(dl_once() for _ in range(3)) * 1e3, 1)

    # --- overlap: can a download run WHILE the next program executes? ---
    import threading

    def overlap_once():
        outs_prev = model._forward_full(model.params, raw_dev)
        float(outs_prev["pred_poses"][0, 0, 0])
        t0 = time.perf_counter()
        th = threading.Thread(target=lambda: _adapter.fetch_outputs(outs_prev))
        th.start()
        float(model._forward_full(model.params, raw_dev)["pred_poses"][0, 0, 0])
        th.join()
        return time.perf_counter() - t0

    overlap_once()
    out["overlap_dl+program_ms"] = round(min(overlap_once() for _ in range(3)) * 1e3, 1)
    out["serial_dl+program_ms"] = round(
        out["download_honest_ms"] + out["fused_program_ms"], 1)

    # --- overlap: upload while program executes -------------------------
    def overlap_up_once():
        t0 = time.perf_counter()
        box = {}
        th = threading.Thread(
            target=lambda: box.setdefault("d", jax.device_put(raw)))
        th.start()
        float(model._forward_full(model.params, raw_dev)["pred_poses"][0, 0, 0])
        th.join()
        float(fetch(box["d"]))
        return time.perf_counter() - t0

    overlap_up_once()
    out["overlap_up+program_ms"] = round(
        min(overlap_up_once() for _ in range(3)) * 1e3, 1)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
