#!/usr/bin/env python
"""Serve a unigeo_tpu model for online inference.

    python serve.py --config configs/depthcrafter_scannetpp.yaml --port 8080
    python serve.py --model IdentityModel --port 8080

Endpoints:
    POST /v1/predict   body: npz of the unified sample arrays
                       (images [Nf,3,H,W] f32 0..255, intrinsics [Nf,3,3],
                       plus whatever else the model consumes)
                       → npz of the model's pred_* arrays
    GET  /healthz      liveness
    GET  /stats        latency percentiles / batch sizes / queue depth

Requests are micro-batched onto the model's ``forward_batch`` (when it has
one) inside a short window — the same one-jitted-program batching the DP
evaluator uses.  A warmup clip is compiled before the socket opens; note
that XLA compiles per input shape, so use --warmup-frames/--warmup-hw to
match the clip shape production will send (subsequent shapes compile on
first sight and are cached).

Example client:

    import numpy as np, urllib.request, io
    buf = io.BytesIO(); np.savez(buf, images=imgs, intrinsics=K)
    req = urllib.request.Request("http://host:8080/v1/predict",
                                 data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req) as r:
        preds = dict(np.load(io.BytesIO(r.read())))
"""

import argparse
import json
import sys


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", help="experiment YAML (model block is used)")
    ap.add_argument("--model", help="registered model name (overrides config)")
    ap.add_argument(
        "--params", default="{}", help="JSON model_params (with --model)"
    )
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--max-batch", type=int, default=0,
                    help="0 = the model's own eval_batch_size")
    ap.add_argument("--batch-window-ms", type=float, default=5.0)
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--warmup-frames", type=int, default=2)
    ap.add_argument("--warmup-hw", type=int, nargs=2, default=(64, 64))
    args = ap.parse_args()

    from unigeo_tpu.registry import get_model_cls
    from unigeo_tpu.serving import HTTPInferenceServer, warmup_clip

    if args.model:
        name, params = args.model, json.loads(args.params)
    elif args.config:
        from unigeo_tpu.config import EvalConfig, load_config

        cfg = EvalConfig.from_dict(load_config(args.config))
        name, params = cfg.model_name, cfg.model_params
    else:
        ap.error("need --config or --model")
        return

    print(f"loading model {name} ...", flush=True)
    model = get_model_cls(name)(**params)

    if not args.no_warmup:
        print(
            f"warmup: {args.warmup_frames} frames @ {tuple(args.warmup_hw)} "
            "(compiling)...",
            flush=True,
        )
        model.forward(warmup_clip(args.warmup_frames, tuple(args.warmup_hw)))

    srv = HTTPInferenceServer(
        model, host=args.host, port=args.port, max_batch=args.max_batch,
        batch_window_ms=args.batch_window_ms, model_name=name,
    )
    print(
        f"serving {name} on http://{args.host}:{srv.port}  "
        "(POST /v1/predict, GET /healthz, GET /stats)",
        flush=True,
    )
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()
        sys.exit(0)


if __name__ == "__main__":
    main()
