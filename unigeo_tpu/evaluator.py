"""The evaluation driver (reference: eval.py:10-99).

Config-driven: dataset + model resolved from registries, metric sections gate
each evaluation family, per-sequence rows stream into a CSV after every clip.

Improvements over the reference driver:
  * proper CLI (--config/--output) instead of a hardcoded path (eval.py:11);
  * the YAML ``depth_alignment`` knob is honored (eval.py:48-49 reads it and
    then hardcodes lstsq);
  * resumable: sequences already present in the output CSV are skipped;
  * per-clip latency + frames/sec tracing via unigeo_tpu.utils.profiling;
  * async metrics: clip i's host-side scoring (GT prep, masked gathers,
    f64 camera solves, CSV/PLY IO) runs on a worker thread while clip i+1's
    forward occupies the device — the reference loop (eval.py:33-99) is
    strictly serial.  Rows, ordering, and resume semantics are identical
    (one worker, bounded queue, exceptions re-raised on the main thread).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from unigeo_tpu.config import EvalConfig
from unigeo_tpu.data.sample import prepare_gt_label
from unigeo_tpu.metrics import (
    MetricsManager,
    camera_pose_evaluation,
    depth_evaluation,
    normal_evaluation,
    pcd_evaluation,
)
from unigeo_tpu.registry import get_dataset_cls, get_model_cls
from unigeo_tpu.utils.profiling import ClipTimer


def evaluate_clip(
    cfg: EvalConfig, output: Dict[str, Any], gt_label: Dict[str, Any]
) -> Dict[str, float]:
    """Score one clip's predictions against its GT labels."""
    metric: Dict[str, float] = {}

    if cfg.eval_depth:
        res, *_ = depth_evaluation(
            predicted_depth=output["pred_depths"],
            ground_truth_depth=gt_label["gt_depths"],
            custom_mask=gt_label["gt_masks"],
            alignment=cfg.depth_alignment,
            max_depth=cfg.max_depth,
        )
        metric.update(res)

    if cfg.eval_normal:
        metric.update(
            normal_evaluation(
                predicted_normal=output["pred_normals"],
                ground_truth_normal=gt_label["gt_normals"],
                custom_mask=gt_label["gt_masks"],
            )
        )

    if cfg.eval_pcd:
        pcd_res = pcd_evaluation(
            predicted_pcd=output["pred_world_pts"],
            ground_truth_pcd=gt_label["gt_world_pts"],
            masks=gt_label["gt_masks"],
            rgbs=gt_label["gt_rgbs"],
            downsample_num=cfg.pcd_downsample_num,
        )
        metric["_pcd_clouds"] = (pcd_res.pop("pred_pcd"), pcd_res.pop("gt_pcd"))
        pcd_res.pop("alignment", None)
        metric.update(pcd_res)

    if cfg.eval_camera:
        ate, rpe_trans, rpe_rot = camera_pose_evaluation(
            pred_pose=output["pred_poses"], gt_pose=gt_label["gt_poses"]
        )
        metric.update({"ATE": ate, "RPE trans": rpe_trans, "RPE rot": rpe_rot})

    return metric


def run_evaluation(
    cfg: EvalConfig,
    save_dir: str = "./debug_output",
    resume: bool = True,
    max_clips: Optional[int] = None,
    dataset=None,
    model=None,
    verbose: bool = True,
    strict: bool = False,
    debug_nans: bool = False,
    num_workers: int = 0,
    data_parallel: Optional[bool] = None,
    async_metrics: bool = True,
) -> MetricsManager:
    """The full eval loop: dataset → model → GT → metrics → CSV.

    strict: validate the clip-sample contract on every clip (shape/dtype
        checking on the executor boundary, SURVEY.md §5 "race detection").
    debug_nans: enable jax.debug_nans for the run.
    num_workers: >0 prefetches clips with a thread pool (data/prefetch.py).
    data_parallel: batch clips over the device mesh's data axis when the
        model implements ``forward_batch`` (SURVEY.md §2.7 DP row — the
        reference's serial clip loop, eval.py:33, leaves N-1 chips idle).
        None = auto: on when the model supports it and >1 device is visible.
        Per-sequence CSV rows, ordering, and resume semantics are unchanged.
    async_metrics: score clip i on a single worker thread while clip i+1's
        forward runs (default on; the queue is bounded at 2 so at most two
        clips' outputs are held).  CSV content and order are identical to
        the synchronous path (tests/test_async_metrics.py); worker
        exceptions re-raise on the main thread.  Disable for debugging
        (clean stack traces) via --no-async-metrics.
    """
    if debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)
    os.makedirs(save_dir, exist_ok=True)
    save_path = os.path.join(save_dir, "metrics.csv")

    # Multi-host (SURVEY §2.7 comm backend): each process scores a
    # round-robin shard of the clips (dp over DCN); per-rank CSVs keep crash
    # resume, rank 0 merges + writes the canonical CSV at the end.
    # Single-process: n_proc == 1 and every path below is unchanged.
    try:
        import jax

        n_proc, proc_id = jax.process_count(), jax.process_index()
    except Exception:
        n_proc, proc_id = 1, 0
    rank_path = (
        save_path
        if n_proc == 1
        else os.path.join(save_dir, f"metrics.rank{proc_id}.csv")
    )

    if dataset is None:
        dataset_cls = get_dataset_cls(cfg.dataset)
        dataset = dataset_cls(**cfg.dataset_kwargs)
    if model is None:
        model_cls = get_model_cls(cfg.model_name)
        model = model_cls(**cfg.model_params)

    if resume:
        # resume from THIS RANK's progress file: under multi-host each rank
        # streams rows to metrics.rank{i}.csv and the canonical metrics.csv
        # only exists after the final merge, so reading save_path there
        # would silently restart completed clips
        manager = MetricsManager.from_csv(rank_path, cfg.metric_names)
    else:
        manager = MetricsManager(cfg.metric_names)

    timer = ClipTimer()
    n = len(dataset) if max_clips is None else min(max_clips, len(dataset))
    indices = [i for i in range(n) if i % n_proc == proc_id]
    if num_workers > 0:
        from unigeo_tpu.data.prefetch import PrefetchLoader

        stream = zip(indices, PrefetchLoader(
            dataset, num_workers=num_workers, indices=indices
        ))
    else:
        stream = ((i, dataset[i]) for i in indices)

    if data_parallel is None:
        if hasattr(model, "forward_batch"):
            import jax

            # on when >1 chip (dp sharding) OR the model advertises a
            # single-chip throughput batch (e.g. DepthCrafter batched denoise)
            data_parallel = (
                len(jax.devices()) > 1
                or getattr(model, "eval_batch_size", 1) > 1
            )
        else:
            data_parallel = False
    if data_parallel and not hasattr(model, "forward_batch"):
        raise ValueError(
            f"data_parallel requested but {type(model).__name__} has no forward_batch"
        )
    batch_size = 1
    if data_parallel:
        import jax

        batch_size = max(
            1, len(jax.devices()), getattr(model, "eval_batch_size", 1)
        )

    def _record(seq: str, data, output) -> None:
        gt_label = prepare_gt_label(data)
        metric = {"seq_name": seq}
        metric.update(evaluate_clip(cfg, output, gt_label))

        if cfg.vis_depth:
            from unigeo_tpu.utils.vis import save_depth_normal_maps

            depth_dir = os.path.join(save_dir, f"depth_{seq}")
            save_depth_normal_maps(
                output.get("pred_depths"),
                output.get("pred_normals"),
                depth_dir,
                rgbs=gt_label["gt_rgbs"],
            )
        clouds = metric.pop("_pcd_clouds", None)
        if cfg.vis_pcd and clouds is not None:
            from unigeo_tpu.utils.vis import save_point_cloud

            pcd_dir = os.path.join(save_dir, f"pcd_{seq}")
            os.makedirs(pcd_dir, exist_ok=True)
            save_point_cloud(*clouds[0], os.path.join(pcd_dir, "pred.ply"))
            save_point_cloud(*clouds[1], os.path.join(pcd_dir, "gt.ply"))

        manager.update_metrics(metric)
        manager.export_to_csv(rank_path)
        if verbose:
            shown = {
                k: round(v, 5)
                for k, v in metric.items()
                if isinstance(v, (int, float)) and k in cfg.metric_names
            }
            print(f"  {shown}  [{timer.summary()}]")

    # --- async metrics: ONE worker thread scores clip i while the main
    # thread drives clip i+1's forward.  A single worker keeps row order
    # deterministic; the bounded deque caps held outputs; result() re-raises
    # worker exceptions on the main thread at the next submit/drain.
    record_q = None
    record_pool = None
    if async_metrics:
        import collections
        from concurrent.futures import ThreadPoolExecutor

        record_pool = ThreadPoolExecutor(1, thread_name_prefix="metrics")
        record_q = collections.deque()

    def _submit_record(seq, data, output) -> None:
        if record_pool is None:
            _record(seq, data, output)
            return
        while len(record_q) >= 2:
            record_q.popleft().result()
        record_q.append(record_pool.submit(_record, seq, data, output))

    def _check_worker() -> None:
        """Re-raise a finished worker failure BEFORE the next forward —
        otherwise clip i's scoring error only surfaces after clip i+1's
        full device forward (wasted minutes on the tunneled backend)."""
        while record_q and record_q[0].done():
            record_q.popleft().result()

    def _drain_records() -> None:
        if record_pool is None:
            return
        while record_q:
            record_q.popleft().result()

    pending = []  # [(seq, data)] waiting to fill a dp batch

    def _flush() -> None:
        if not pending:
            return
        nframes = sum(len(d["images"]) for _, d in pending)
        with timer.clip(num_frames=nframes):
            outputs = model.forward_batch([d for _, d in pending])
        for (seq, data), output in zip(pending, outputs):
            _submit_record(seq, data, output)
        pending.clear()

    try:
        for data_idx, data in stream:
            if record_q is not None:
                _check_worker()
            seq = f"{data_idx:03d}_{data['scene_name']}"
            if resume and manager.has_sequence(seq):
                continue
            if strict:
                from unigeo_tpu.data.sample import validate_sample

                validate_sample(data)
            if verbose:
                print(f"processing seq: {seq}")

            if batch_size > 1:
                pending.append((seq, data))
                if len(pending) >= batch_size:
                    _flush()
                continue

            with timer.clip(num_frames=len(data["images"])):
                output = model.forward(data)
            _submit_record(seq, data, output)

        _flush()
        _drain_records()
    finally:
        # runs on EVERY exit (forward exception, strict-validation failure,
        # re-raised worker error): cancel queued records and wait out any
        # in-flight one, so no thread outlives this call and a caller that
        # catches and retries never races a leftover CSV writer
        if record_pool is not None:
            record_pool.shutdown(wait=True, cancel_futures=True)

    if n_proc > 1:
        from unigeo_tpu.parallel.multihost import is_primary, process_allgather_rows

        merged = MetricsManager(cfg.metric_names)
        for row in sorted(
            process_allgather_rows(manager.rows()), key=lambda r: r["seq_name"]
        ):
            merged.update_metrics(row)
        if is_primary():
            merged.export_to_csv(save_path)
        return merged
    return manager
