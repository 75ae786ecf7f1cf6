#!/usr/bin/env python
"""Config-driven evaluation CLI (reference: eval.py).

Usage:
    python eval.py --config configs/identity_synthetic.yaml [--output DIR]
                   [--max-clips N] [--no-resume]
"""

import argparse

from unigeo_tpu.config import EvalConfig
from unigeo_tpu.evaluator import run_evaluation


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True, help="experiment YAML path")
    parser.add_argument("--output", default="./debug_output", help="results dir")
    parser.add_argument("--max-clips", type=int, default=None)
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--strict", action="store_true",
                        help="validate the clip-sample contract per clip")
    parser.add_argument("--debug-nans", action="store_true")
    parser.add_argument("--num-workers", type=int, default=0,
                        help="prefetch clips with this many threads")
    parser.add_argument("--data-parallel", dest="data_parallel",
                        action="store_true", default=None,
                        help="batch clips over the device mesh data axis")
    parser.add_argument("--no-data-parallel", dest="data_parallel",
                        action="store_false",
                        help="force the serial clip loop")
    parser.add_argument("--no-async-metrics", dest="async_metrics",
                        action="store_false", default=True,
                        help="score clips on the main thread (debugging)")
    parser.add_argument("--validate-root", action="store_true",
                        help="preflight the dataset layout (files, depth "
                             "scale, pose rigidity, intrinsics) and exit")
    args = parser.parse_args()

    cfg = EvalConfig.from_yaml(args.config)
    if args.validate_root:
        import sys

        from unigeo_tpu.data.preflight import format_report, validate_root
        from unigeo_tpu.registry import get_dataset_cls

        try:
            dataset = get_dataset_cls(cfg.dataset)(**cfg.dataset_kwargs)
        except Exception as e:
            print(f"preflight: {cfg.dataset} — FAILED\n  ✗ construct: "
                  f"{type(e).__name__}: {e}")
            sys.exit(1)
        result = validate_root(dataset)
        print(format_report(result))
        sys.exit(0 if result["ok"] else 1)

    manager = run_evaluation(
        cfg,
        save_dir=args.output,
        resume=not args.no_resume,
        max_clips=args.max_clips,
        strict=args.strict,
        debug_nans=args.debug_nans,
        num_workers=args.num_workers,
        data_parallel=args.data_parallel,
        async_metrics=args.async_metrics,
    )
    print("Averages:")
    for name, value in manager.calculate_averages().items():
        print(f"  {name}: {value:.5f}")


if __name__ == "__main__":
    main()
