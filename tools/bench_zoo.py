"""Model-zoo bench matrix: one fps/chip + stage-split line per registered
model (VERDICT r4 #2).

Every ``MODELS.register`` name runs its production configuration (the
scannetpp/7scenes YAML it ships with, or its constructor defaults where the
production config is synthetic) with random weights on the live backend:
the timings are architecture-bound, exactly like the primary bench.

Writes ``BENCH_ZOO.json`` at the repo root; ``bench.py`` replays the
committed entries (clearly labeled with their provenance) for models it has
no deadline budget to measure live.

Usage:
    timeout 3600 python tools/bench_zoo.py                # full matrix, TPU
    ZOO_ONLY=Cut3R python tools/bench_zoo.py              # one model
    ZOO_SMALL=1 PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python tools/bench_zoo.py                         # tiny CPU smoke
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

SMALL = os.environ.get("ZOO_SMALL", "0") == "1"
ONLY = os.environ.get("ZOO_ONLY")
DEADLINE_S = float(os.environ.get("ZOO_DEADLINE_S", "3600"))
_T0 = time.perf_counter()


def _remaining():
    return DEADLINE_S - (time.perf_counter() - _T0)


from tools._benchlib import measure_rtt, setup_cache, timed_blocking  # noqa: E402

# Persistent compile cache + committed warm-start seed.  Without this every
# zoo SUBPROCESS compiles its full stack from scratch over the tunneled
# backend (~2-10 min per program) and throws the executables away on exit —
# the round-5 DepthAnyVideo/StableNormal "compile wedge" was exactly this
# on a fresh checkout whose live cache the driver reset had emptied.  With
# it, completed compiles persist across retries, so even a deadline-killed
# attempt makes the next one cheaper.
setup_cache()


def timed(fn, rtt, reps=3):
    return timed_blocking(fn, rtt=rtt, reps=reps) * 1e3


def make_data(nf, h, w, focal_scale=0.9):
    gen = np.random.default_rng(0)
    K = np.array([[focal_scale * w, 0, w / 2], [0, focal_scale * w, h / 2],
                  [0, 0, 1]], np.float32)
    return {
        "images": gen.uniform(0, 255, (nf, 3, h, w)).astype(np.float32),
        "intrinsics": np.repeat(K[None], nf, 0),
        "scene_name": "bench", "keyview_idx": 0,
    }


# ---------------------------------------------------------------------------
# per-family stage probes (all programs already compiled by the warm forward)
# ---------------------------------------------------------------------------

def stages_pointmap(model, data, rtt):
    from unigeo_tpu.models.pointmap import adapter

    raw = adapter.raw_clip(data)
    probe = jax.jit(lambda x: jnp.float32(x.reshape(-1)[0]))
    up = timed(lambda: float(probe(jax.device_put(raw))), rtt)
    raw_dev = jax.device_put(raw)
    sync_key = ("pred_poses" if "pred_poses"
                in model._forward_full(model.params, raw_dev) else
                "pred_depths")
    prog = timed(lambda: float(np.asarray(
        model._forward_full(model.params, raw_dev)[sync_key]).ravel()[0]),
        rtt)
    return {"upload": round(up, 1), "device_program": round(prog, 1)}


def stages_svd(pipe, params, frames_hwc, steps, rtt):
    """encode/denoise/decode at the exact shapes one window executes."""
    t, h, w, _ = frames_hwc.shape
    chunk = jnp.asarray(frames_hwc)
    cond, ctx = pipe._encode_stage(params, chunk, None)
    noise = jax.random.normal(jax.random.PRNGKey(0), (t, h // 8, w // 8, 4),
                              jnp.float32)
    enc = timed(lambda: float(jnp.sum(
        pipe._encode_stage(params, chunk, None)[0].astype(jnp.float32))), rtt)
    lat = pipe._denoise_stage(params, cond, ctx, noise, steps)
    den = timed(lambda: float(jnp.sum(pipe._denoise_stage(
        params, cond, ctx, noise, steps).astype(jnp.float32))), rtt)
    dec = timed(lambda: float(jnp.sum(pipe._decode_stage(
        params, lat).astype(jnp.float32))), rtt)
    return cond, ctx, noise, lat, enc, den, dec


# ---------------------------------------------------------------------------
# model runners: (name, aliases, fn) — fn returns the JSON entry
# ---------------------------------------------------------------------------

def run_generic(name, build, nf, h, w, stages=None, data=None, notes=None):
    data = data or make_data(nf, h, w)
    t0 = time.perf_counter()
    model = build()
    build_s = time.perf_counter() - t0
    rtt = measure_rtt()
    t0 = time.perf_counter()
    model.forward(data)  # compile + warm
    first_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        model.forward(data)
        best = min(best, time.perf_counter() - t0)
    entry = {
        "model": name,
        "frames": nf, "h": h, "w": w,
        "clip_ms": round(best * 1e3, 1),
        "fps_per_chip": round(nf / best, 4),
        "first_run_s": round(first_s, 1),
        "build_s": round(build_s, 1),
        "weights": "random (architecture-bound timing)",
    }
    if stages is not None:
        try:
            entry["stage_ms"] = stages(model, data, rtt)
        except Exception as e:  # stage probes must never kill the entry
            entry["stage_ms_error"] = f"{type(e).__name__}: {e}"[:200]
    if notes:
        entry["notes"] = notes
    del model
    gc.collect()
    return entry


def spec_identity():
    from unigeo_tpu.data.synthetic import SyntheticBoxDataset
    from unigeo_tpu.models.identity import IdentityModel

    nf, h, w = (4, 48, 64) if SMALL else (25, 384, 512)
    ds = SyntheticBoxDataset(clip_length=nf, clip_overlap=0, num_scenes=1,
                             frames_per_scene=nf, render_size=(h, w))
    data = ds[0]
    return run_generic(
        "IdentityModel", IdentityModel, nf, h, w, data=data,
        stages=lambda m, d, r: {"host": "all (gt passthrough, no device work)"},
        notes="debug oracle — host-only",
    )


def _pointmap_spec(name, cls, config_name):
    from unigeo_tpu.config import EvalConfig

    if SMALL:
        tiny = {
            "Spann3R": "tiny_spann3r_config", "Cut3R": "tiny_cut3r_config",
            "Dust3R": "tiny_dust3r_config",
        }[name]
        import importlib

        mod = importlib.import_module(cls.__module__)
        net = getattr(mod, tiny)()
        nf, h, w = 2, 64, 64
        build = lambda: cls(network_config=net, init_height=h, init_width=w,
                            init_frames=nf, compute_dtype="bfloat16")
    else:
        cfg = EvalConfig.from_yaml(os.path.join(REPO, "configs", config_name))
        dk = cfg.dataset_kwargs
        nf = dk.get("clip_length", 20)
        h, w = dk.get("input_size") or (384, 512)
        params = dict(cfg.model_params)
        params.pop("checkpoint_path", None)
        # production ViT-L encoder/decoder widths (the released-checkpoint
        # scale the config's conversion notes target)
        net = dict(params.pop("network_config", {}))
        net.setdefault("enc_width", 1024)
        net.setdefault("enc_depth", 24)
        net.setdefault("enc_heads", 16)
        net.setdefault("dec_width", 768)
        net.setdefault("dec_depth", 12)
        net.setdefault("dec_heads", 12)
        build = lambda: cls(network_config=net, init_height=h, init_width=w,
                            init_frames=nf, compute_dtype="bfloat16", **params)
    return run_generic(name, build, nf, h, w, stages=stages_pointmap,
                       notes="bf16 network (fp16-reference mode), f32 geometry")


def spec_vda():
    from unigeo_tpu.config import EvalConfig
    from unigeo_tpu.models.vda import VideoDepthAnything

    if SMALL:
        nf, h, w = 2, 56, 56
        build = lambda: VideoDepthAnything(
            network_config=dict(width=64, depth=2, num_heads=2,
                                temporal_heads=2),
            init_height=h, init_width=w, init_frames=nf)
    else:
        cfg = EvalConfig.from_yaml(os.path.join(REPO, "configs",
                                                "vda_scannetpp.yaml"))
        dk = cfg.dataset_kwargs
        nf = dk.get("clip_length", 25)
        h, w = dk.get("input_size") or (384, 512)
        params = dict(cfg.model_params)
        params.pop("checkpoint_path", None)
        build = lambda: VideoDepthAnything(
            init_height=h, init_width=w, init_frames=nf, **params)
    return run_generic("VideoDepthAnything", build, nf, h, w,
                       notes="feed-forward ViT-L backbone + temporal head")


def _svd_pipe_kwargs():
    """Tiny pipeline injection for ZOO_SMALL."""
    from unigeo_tpu.models.depthcrafter.pipeline import tiny_pipeline

    return tiny_pipeline(height=64, width=64, num_frames=4)


def spec_depthcrafter():
    from unigeo_tpu.models.depthcrafter.model import DepthCrafter

    if SMALL:
        nf, h, w = 4, 64, 64
        build = lambda: DepthCrafter(pipeline=_svd_pipe_kwargs())
    else:
        nf, h, w = 25, 384, 512
        build = lambda: DepthCrafter()

    def stages(model, data, rtt):
        pipe = getattr(model, "pipeline", None) or model.pipe
        frames = np.moveaxis(np.asarray(data["images"]), 1, -1) / 255.0
        _, _, _, _, enc, den, dec = stages_svd(
            pipe, pipe.params, frames.astype(np.float32),
            model.num_inference_steps, rtt)
        return {"encode+clip": round(enc, 1), "denoise": round(den, 1),
                "decode": round(dec, 1)}

    return run_generic("DepthCrafter", build, nf, h, w, stages=stages,
                       notes="the flagship; full ceiling treatment in the primary bench line")


def spec_stablenormal():
    from unigeo_tpu.models.stablenormal import StableNormal

    if SMALL:
        nf, h, w = 4, 64, 64
        build = lambda: StableNormal(pipeline=_svd_pipe_kwargs(),
                                     num_inference_steps=2)
    else:
        nf, h, w = 25, 384, 512
        build = lambda: StableNormal(num_inference_steps=4)

    def stages(model, data, rtt):
        pipe = model.pipeline
        frames = (np.moveaxis(np.asarray(data["images"]), 1, -1) / 255.0
                  ).astype(np.float32)
        n, h_, w_ = frames.shape[:3]
        chunk = jnp.asarray(frames)
        cond, ctx = pipe._encode_stage(pipe.params, chunk, None)
        noise1, _ = model._frame_noise(h_, w_)
        noise = jnp.broadcast_to(noise1[None], (n, 1, h_ // 8, w_ // 8, 4))
        enc = timed(lambda: float(jnp.sum(
            pipe._encode_stage(pipe.params, chunk, None)[0])), rtt)
        den = timed(lambda: float(jnp.sum(pipe._denoise_stage_batched(
            pipe.params, cond[:, None], ctx[:, None], noise,
            model.num_inference_steps))), rtt)
        x = pipe._denoise_stage_batched(pipe.params, cond[:, None],
                                        ctx[:, None], noise,
                                        model.num_inference_steps)
        dec = timed(lambda: float(jnp.sum(
            pipe._decode_frames(pipe.params, x[:, 0]))), rtt)
        return {"encode(B=T)": round(enc, 1),
                f"denoise(B={n},T=1)": round(den, 1),
                "decode_frames": round(dec, 1)}

    return run_generic("StableNormal", build, nf, h, w, stages=stages,
                       notes="per-frame diffusion batched as B=T clips of length 1 (3 dispatches/clip)")


def spec_chronodepth():
    from unigeo_tpu.models.chronodepth import ChronoDepth, tiny_chronodepth

    if SMALL:
        nf, h, w = 4, 64, 64
        build = lambda: ChronoDepth(_pipeline=tiny_chronodepth(),
                                    num_inference_steps=2, window_size=2,
                                    overlap=1)
    else:
        nf, h, w = 25, 384, 512
        build = lambda: ChronoDepth(num_inference_steps=5, window_size=10,
                                    overlap=5)

    def stages(model, data, rtt):
        pipe = model.pipe
        frames = (np.moveaxis(np.asarray(data["images"]), 1, -1) / 255.0
                  ).astype(np.float32)
        t = frames.shape[0]
        win = min(model.window_size or t, t)
        ov = min(model.overlap, win - 1) if win < t else 0
        n_win = len(list(range(0, max(t - ov, 1), win - ov)))
        chunk = jnp.asarray(frames[:win])
        h8, w8 = frames.shape[1] // 8, frames.shape[2] // 8
        cond, ctx = pipe._encode_stage(pipe.params, chunk, None)
        noise = jax.random.normal(jax.random.PRNGKey(0), (win, h8, w8, 4),
                                  jnp.float32)
        known = jnp.zeros((win, h8, w8, 4), jnp.float32)
        mask = jnp.zeros((win,), jnp.float32)
        enc = timed(lambda: float(jnp.sum(
            pipe._encode_stage(pipe.params, chunk, None)[0])), rtt)
        den = timed(lambda: float(jnp.sum(pipe._denoise_stage_known(
            pipe.params, cond, ctx, noise, known, mask,
            model.num_inference_steps))), rtt)
        lat = jnp.zeros((t, h8, w8, 4), jnp.float32)
        dec = timed(lambda: float(jnp.sum(
            pipe._decode_stage(pipe.params, lat))), rtt)
        return {"windows": n_win, "encode_per_window": round(enc, 1),
                "denoise_known_per_window": round(den, 1),
                "decode_full_clip": round(dec, 1)}

    return run_generic("ChronoDepth", build, nf, h, w, stages=stages,
                       notes="sequential overlapped windows, known-frame latent clamp")


def spec_depthanyvideo():
    from unigeo_tpu.models.depthanyvideo import DepthAnyVideo

    if SMALL:
        nf, h, w = 4, 64, 64
        build = lambda: DepthAnyVideo(_pipeline=_svd_pipe_kwargs(),
                                      num_inference_steps=2, keyframe_gap=2)
    else:
        nf, h, w = 25, 384, 512
        build = lambda: DepthAnyVideo(num_inference_steps=5, keyframe_gap=4)

    def stages(model, data, rtt):
        pipe = model.pipe
        frames = (np.moveaxis(np.asarray(data["images"]), 1, -1) / 255.0
                  ).astype(np.float32)
        t = frames.shape[0]
        key_idx = model.keyframe_indices(t)
        nk = len(key_idx)
        h8, w8 = frames.shape[1] // 8, frames.shape[2] // 8
        kf = jnp.asarray(frames[key_idx])
        cond_k, ctx_k = pipe._encode_stage(pipe.params, kf, None)
        noise_k = jax.random.normal(jax.random.PRNGKey(0), (nk, h8, w8, 4),
                                    jnp.float32)
        p1 = timed(lambda: float(jnp.sum(pipe._denoise_stage(
            pipe.params, cond_k, ctx_k, noise_k,
            model.num_inference_steps))), rtt)
        full = jnp.asarray(frames)
        cond, ctx = pipe._encode_stage(pipe.params, full, None)
        noise = jax.random.normal(jax.random.PRNGKey(1), (t, h8, w8, 4),
                                  jnp.float32)
        known = jnp.zeros((t, h8, w8, 4), jnp.float32)
        mask = jnp.zeros((t,), jnp.float32)
        p2 = timed(lambda: float(jnp.sum(pipe._denoise_stage_known(
            pipe.params, cond, ctx, noise, known, mask,
            model.num_inference_steps))), rtt)
        dec = timed(lambda: float(jnp.sum(pipe._decode_stage(
            pipe.params, known))), rtt)
        return {"keyframes": nk,
                f"phase1_denoise({nk}f)": round(p1, 1),
                f"phase2_denoise_known({t}f)": round(p2, 1),
                "decode": round(dec, 1)}

    return run_generic("DepthAnyVideo", build, nf, h, w, stages=stages,
                       notes="hierarchical: sparse keyframes then clamped full-clip interpolation")


def spec_unigeocam():
    from unigeo_tpu.models.unigeo_cam import UniGeoCam

    if SMALL:
        nf, h, w = 4, 64, 64
        build = lambda: UniGeoCam(pipeline=_svd_pipe_kwargs(),
                                  num_inference_steps=2,
                                  init_height=h, init_width=w, init_frames=nf)
    else:
        nf, h, w = 25, 384, 512
        build = lambda: UniGeoCam(num_inference_steps=5, init_height=h,
                                  init_width=w, init_frames=nf)

    def stages(model, data, rtt):
        pipe = model.pipeline
        frames = (np.moveaxis(np.asarray(data["images"]), 1, -1) / 255.0
                  ).astype(np.float32)
        _, _, _, _, enc, den, dec = stages_svd(
            pipe, pipe.params, frames, model.num_inference_steps, rtt)
        return {"encode+clip": round(enc, 1), "denoise": round(den, 1),
                "decode": round(dec, 1)}

    return run_generic("UniGeoCam", build, nf, h, w, stages=stages,
                       notes="depth+normal branches off one diffusion decode; aliases: UniGeo")


def spec_aether():
    from unigeo_tpu.models.aether import Aether

    if SMALL:
        nf, h, w, steps = 4, 64, 64, 2
        build = lambda: Aether(network_config=dict(width=64, depth=2,
                                                   num_heads=2, patch=2),
                               vae_config=dict(base_width=16, mults=(1, 2),
                                               temporal_down=(False, True),
                                               z_channels=4),
                               num_steps=steps, init_height=h, init_width=w,
                               init_frames=nf)
    else:
        nf, h, w, steps = 16, 384, 512, 4
        build = lambda: Aether(network_config=dict(width=768, depth=16,
                                                   num_heads=12, patch=2),
                               vae_config=dict(base_width=64, mults=(1, 2, 4),
                                               temporal_down=(False, True, True),
                                               z_channels=8),
                               num_steps=steps, init_height=h, init_width=w,
                               init_frames=nf)
    return run_generic("Aether", build, nf, h, w,
                       notes="flow-matching DiT + causal 3D VAE; stage split in the primary bench secondaries")


def _spec_names():
    names = ["IdentityModel", "VideoDepthAnything", "Spann3R", "Cut3R",
             "Dust3R", "Aether", "DepthCrafter", "StableNormal",
             "ChronoDepth", "DepthAnyVideo", "UniGeoCam"]
    subset = os.environ.get("ZOO_MODELS")
    if subset:
        want = [s.strip() for s in subset.split(",") if s.strip()]
        names = [n for n in names if n in want]
    return names


def main_subprocess_matrix():
    """Full matrix with per-model SUBPROCESS isolation: a 6 GB SVD param
    tree + jit caches from model k must not still occupy HBM when model
    k+1 builds (the round-5 in-process run RESOURCE_EXHAUSTED from the
    7th model onward).  The persistent compile cache keeps re-imports
    cheap."""
    import datetime
    import subprocess

    entries = []
    for name in _spec_names():
        if _remaining() < 90:
            entries.append({"model": name, "skipped": "deadline"})
            print(f"[zoo] SKIP {name} (deadline)", file=sys.stderr)
            continue
        print(f"[zoo +{time.perf_counter() - _T0:.0f}s] {name} (subproc)",
              file=sys.stderr, flush=True)
        env = dict(os.environ, ZOO_ONLY=name,
                   ZOO_DEADLINE_S=str(max(60, int(_remaining()) - 10)))
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                capture_output=True, text=True, env=env,
                timeout=max(120, _remaining()),
            )
            line = next((l for l in proc.stdout.splitlines()
                         if l.startswith("{")), None)
            if line:
                entries.append(json.loads(line))
            else:
                entries.append({
                    "model": name,
                    "error": ("no JSON line; stderr tail: "
                              + proc.stderr[-300:]),
                })
        except subprocess.TimeoutExpired:
            entries.append({"model": name, "error": "subprocess timeout"})
        print(json.dumps(entries[-1]), flush=True)

    dev_kind = "unknown"
    for e in entries:
        if "device_kind" in e:
            dev_kind = e.pop("device_kind")
    out_path = os.path.join(REPO, "BENCH_ZOO.json")
    results = None
    if os.environ.get("ZOO_MERGE") == "1":
        # merge this pass's entries over an existing matrix (fills models
        # a prior deadline skipped, keeps the rest)
        try:
            with open(out_path) as f:
                results = json.load(f)
            fresh = {e["model"]: e for e in entries}

            def _pick(old):
                new = fresh.pop(old["model"], None)
                if new is None:
                    return old
                # never clobber a real measurement with a deadline/error
                # stub from this pass
                if "clip_ms" in new or "clip_ms" not in old:
                    return new
                return old

            results["entries"] = [
                _pick(e) for e in results["entries"]
            ] + list(fresh.values())
            results["measured"] = datetime.datetime.now().isoformat(
                timespec="seconds")
            if dev_kind != "unknown":
                results["device_kind"] = dev_kind
        except Exception:
            results = None
    if results is None:
        results = {
            "device_kind": dev_kind,
            "small": SMALL,
            "isolation": "one subprocess per model (HBM freed between "
                         "models)",
            "note": "random weights, production shapes; clip_ms includes "
                    "host<->device transfers (the dev tunnel moves "
                    "~25-40 MB/s)",
            "measured": datetime.datetime.now().isoformat(
                timespec="seconds"),
            "entries": entries,
        }
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"[zoo] wrote {out_path}", file=sys.stderr)


def main():
    from unigeo_tpu.models.pointmap.cut3r import Cut3R
    from unigeo_tpu.models.pointmap.dust3r import Dust3R
    from unigeo_tpu.models.pointmap.spann3r import Spann3R

    specs = [
        ("IdentityModel", spec_identity),
        ("VideoDepthAnything", spec_vda),
        ("Spann3R", lambda: _pointmap_spec("Spann3R", Spann3R,
                                           "spann3r_7scenes.yaml")),
        ("Cut3R", lambda: _pointmap_spec("Cut3R", Cut3R,
                                         "cut3r_7scenes.yaml")),
        ("Dust3R", lambda: _pointmap_spec("Dust3R", Dust3R,
                                          "dust3r_7scenes.yaml")),
        ("Aether", spec_aether),
        ("DepthCrafter", spec_depthcrafter),
        ("StableNormal", spec_stablenormal),
        ("ChronoDepth", spec_chronodepth),
        ("DepthAnyVideo", spec_depthanyvideo),
        ("UniGeoCam", spec_unigeocam),
    ]
    if ONLY:
        specs = [s for s in specs if s[0] == ONLY]
    elif not SMALL:
        # full matrix: per-model subprocess isolation (HBM!)
        return main_subprocess_matrix()

    dev = jax.devices()[0]
    results = {
        "device_kind": dev.device_kind,
        "platform": dev.platform,
        "small": SMALL,
        "note": "random weights, production shapes; clip_ms includes "
                "host<->device transfers (the dev tunnel moves ~25-40 MB/s)",
        "entries": [],
    }
    for name, fn in specs:
        if _remaining() < 60:
            results["entries"].append({"model": name, "skipped": "deadline"})
            print(f"[zoo] SKIP {name} (deadline)", file=sys.stderr)
            continue
        print(f"[zoo +{time.perf_counter() - _T0:.0f}s] {name}",
              file=sys.stderr, flush=True)
        try:
            entry = fn()
        except Exception as e:
            entry = {"model": name,
                     "error": f"{type(e).__name__}: {e}"[:300]}
        if ONLY:
            entry["device_kind"] = dev.device_kind
        results["entries"].append(entry)
        print(json.dumps(entry), flush=True)

    out_path = os.path.join(REPO, "BENCH_ZOO.json")
    if not SMALL and ONLY is None:
        import datetime

        results["measured"] = datetime.datetime.now().isoformat(
            timespec="seconds")
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        print(f"[zoo] wrote {out_path}", file=sys.stderr)
    else:
        print("[zoo] SMALL/ONLY mode: not writing BENCH_ZOO.json",
              file=sys.stderr)


if __name__ == "__main__":
    main()
