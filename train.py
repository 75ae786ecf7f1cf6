#!/usr/bin/env python
"""Config-driven training CLI (the reference ships no trainer; SURVEY §2.2
calls its robustmvd savers "vestigial" — training here is first-class).

Two modes, selected by the model in the config:
  * DepthCrafter/UniGeoCam — EDM diffusion fine-tuning of the UNet on
    VAE-encoded clips (DiffusionTrainer).
  * Spann3R/Cut3R — confidence-weighted pointmap regression
    (PointmapTrainer).

Usage:
    python train.py --config configs/identity_synthetic.yaml \
        --model Cut3R --steps 100 --batch-size 2 \
        --ckpt-dir /tmp/ckpts [--mesh dp,sp,tp]

Clips stream from the config's dataset through the threaded prefetcher;
train state checkpoints rotate through utils.checkpoint.TrainStateSaver.
"""

import argparse
import os

import numpy as np


def build_batch_pointmap(samples):
    from unigeo_tpu import coords
    from unigeo_tpu.data.collate import collate_clips
    from unigeo_tpu.data.sample import prepare_gt_label

    batch = []
    for data in samples:
        gt = prepare_gt_label(data)
        batch.append(
            {
                "frames": np.moveaxis(data["images"], 1, -1).astype(np.float32) / 255.0,
                "gt_world_pts": gt["gt_world_pts"].astype(np.float32),
                "mask": gt["gt_masks"].astype(np.float32),
                "gt_poses": gt["gt_poses"].astype(np.float32),
            }
        )
    return {k: np.stack([b[k] for b in batch]) for k in batch[0]}


def main():
    import jax
    import jax.numpy as jnp

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("--model", default=None, help="override config model")
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--ckpt-dir", default="./ckpts")
    parser.add_argument("--ckpt-every", type=int, default=50)
    parser.add_argument("--log-dir", default="./train_logs")
    parser.add_argument("--tiny", action="store_true", help="tiny model configs")
    parser.add_argument(
        "--mesh", default=None,
        help="device mesh shape 'dp,sp,tp' (default: auto-factored)",
    )
    args = parser.parse_args()

    from unigeo_tpu.config import EvalConfig
    from unigeo_tpu.parallel.mesh import make_mesh
    from unigeo_tpu.parallel.trainer import PointmapTrainer
    from unigeo_tpu.registry import get_dataset_cls
    from unigeo_tpu.utils.checkpoint import TrainStateSaver
    from unigeo_tpu.utils.writers import EventWriter, TimeWriter

    cfg = EvalConfig.from_yaml(args.config)
    if args.model:
        cfg = EvalConfig.from_dict(dict(cfg.raw, model_name=args.model))
    dataset = get_dataset_cls(cfg.dataset)(**cfg.dataset_kwargs)
    mesh_shape = (
        tuple(int(x) for x in args.mesh.split(",")) if args.mesh else None
    )
    mesh = make_mesh(shape=mesh_shape)
    writer = EventWriter(args.log_dir)
    saver = TrainStateSaver(args.ckpt_dir)

    model_name = cfg.model_name
    if model_name in ("Spann3R", "Cut3R"):
        if model_name == "Cut3R":
            from unigeo_tpu.models.pointmap.cut3r import Cut3RNetwork, tiny_cut3r_config

            net = Cut3RNetwork(**(tiny_cut3r_config() if args.tiny else {}))
        else:
            from unigeo_tpu.models.pointmap.spann3r import (
                Spann3RNetwork,
                tiny_spann3r_config,
            )

            net = Spann3RNetwork(**(tiny_spann3r_config() if args.tiny else {}))
        sample = dataset[0]
        t, _, h, w = sample["images"].shape
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((t, h, w, 3)))
        with mesh:
            trainer = PointmapTrainer(net, mesh, learning_rate=args.lr)
            state = trainer.init_state(params)
            timer = TimeWriter(writer, "step_time", total_steps=args.steps)
            idx = 0
            for step in range(args.steps):
                samples = [dataset[(idx + i) % len(dataset)] for i in range(args.batch_size)]
                idx += args.batch_size
                batch = build_batch_pointmap(samples)
                with timer:
                    state, loss = trainer.train_step(state, batch)
                writer.put_scalar("loss", float(loss), step)
                if step % 10 == 0:
                    print(f"step {step}: loss {float(loss):.4f} "
                          f"({timer.avg:.2f}s/step)")
                if (step + 1) % args.ckpt_every == 0:
                    saver.save(jax.device_get(state.params), step + 1)
        if args.steps % args.ckpt_every != 0:  # final state not yet saved
            saver.save(jax.device_get(state.params), args.steps)
        print(f"done; checkpoints in {args.ckpt_dir}")
    else:
        raise SystemExit(
            f"training driver currently supports pointmap models "
            f"(Spann3R/Cut3R); diffusion fine-tuning runs through "
            f"parallel.trainer.DiffusionTrainer (see tests/test_training.py). "
            f"Got model {model_name!r}."
        )


if __name__ == "__main__":
    main()
