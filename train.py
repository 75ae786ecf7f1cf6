#!/usr/bin/env python
"""Config-driven training CLI (the reference ships no trainer; SURVEY §2.2
calls its robustmvd savers "vestigial" — training here is first-class).

Four trainer families, selected by the model in the config:
  * DepthCrafter/UniGeoCam/StableNormal/ChronoDepth/DepthAnyVideo — EDM
    diffusion fine-tuning of the UNet on VAE-encoded clips
    (DiffusionTrainer; direct- vs inverse-depth targets per model).
  * Spann3R/Cut3R/Dust3R — confidence-weighted pointmap regression
    (PointmapTrainer; Dust3RTrainer pair mode for the two-view net).
  * Aether — rectified-flow DiT training on [depth-latent | raymap]
    targets (FlowMatchingTrainer).
  * VideoDepthAnything — scale-shift-invariant disparity + temporal
    gradient matching (DisparityTrainer).

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


def _normalized_depth_target(gt, direct_depth: bool) -> np.ndarray:
    """GT depth → clip-minmax-normalized [0,1] target on VALID pixels.

    direct_depth=False: inverse depth — the representation the DepthCrafter
    postproc inverts (model/depthcrafter.py:92-97).  direct_depth=True:
    depth itself — the ChronoDepth/DepthAnyVideo recipe ((x+1)/2 decode,
    models/chronodepth.py).  Invalid pixels (gt_masks) drive neither the
    normalization nor the target (mid-range fill).
    """
    d = np.asarray(gt["gt_depths"], np.float32)
    rep = d if direct_depth else 1.0 / np.maximum(d, 1e-3)
    m = np.asarray(gt["gt_masks"], bool)
    valid = rep[m]
    lo = float(valid.min()) if valid.size else 0.0
    hi = float(valid.max()) if valid.size else 1.0
    return np.where(m, (rep - lo) / max(hi - lo, 1e-8), 0.5)


def build_batch_diffusion(samples, pipe, direct_depth: bool = False):
    """Clips → EDM training batch for DiffusionTrainer.

    Target latents encode the clip's GT depth (inverse or direct — see
    _normalized_depth_target) in [-1,1], tiled to 3 channels, VAE-encoded
    into the SCALED (0.18215) latent space.  Conditioning is the standard
    unscaled RGB latent + CLIP context from _encode_stage.
    """
    import jax.numpy as jnp

    from unigeo_tpu.data.sample import prepare_gt_label

    lats, conds, ctxs = [], [], []
    for data in samples:
        frames = np.moveaxis(data["images"], 1, -1).astype(np.float32) / 255.0
        gt = prepare_gt_label(data)
        x = _normalized_depth_target(gt, direct_depth)
        x3 = np.repeat((x * 2.0 - 1.0)[..., None], 3, axis=-1)
        cond, ctx = pipe._encode_stage(pipe.params, jnp.asarray(frames), None)
        lat = pipe.vae.apply(
            {"params": pipe.params["vae"]},
            jnp.asarray(x3, jnp.float32),
            method=pipe.vae.encode_scaled,
        )
        lats.append(np.asarray(lat, np.float32))
        conds.append(np.asarray(cond, np.float32))
        ctxs.append(np.asarray(ctx, np.float32))
    return {
        "latents": np.stack(lats),
        "cond_latents": np.stack(conds),
        "context": np.stack(ctxs),
    }


def build_batch_disparity(samples):
    """Clips → SSI-disparity batch for DisparityTrainer: gt disparity =
    1/depth on valid pixels (affine alignment in the loss makes the scale
    irrelevant, matching the adapter's relative-output contract)."""
    from unigeo_tpu.data.sample import prepare_gt_label

    batch = []
    for data in samples:
        gt = prepare_gt_label(data)
        d = np.asarray(gt["gt_depths"], np.float32)
        m = np.asarray(gt["gt_masks"], np.float32)
        disp = np.where(m > 0, 1.0 / np.maximum(d, 1e-3), 0.0)
        batch.append({
            "frames": np.moveaxis(data["images"], 1, -1).astype(np.float32)
            / 255.0,
            "gt_disp": disp.astype(np.float32),
            "mask": m,
        })
    return {k: np.stack([b[k] for b in batch]) for k in batch[0]}


def build_batch_aether(samples, model):
    """Clips → rectified-flow batch for FlowMatchingTrainer.

    Conditioning: causal-VAE RGB latents.  Targets: [depth-video latents |
    GT raymaps] — the Aether supervision pair: depth clip-minmax normalized
    to [-1,1] and encoded through the same VAE (the adapter decodes
    (x+1)/2, models/aether.py), raymaps built from the GT poses at the
    latent keyframe times.
    """
    import jax.numpy as jnp

    from unigeo_tpu.data.sample import prepare_gt_label
    from unigeo_tpu.models.aether import latent_key_times, raymap_from_pose

    ct, cs = model.vae.ct, model.vae.cs
    conds, tgts = [], []
    for data in samples:
        frames = np.moveaxis(data["images"], 1, -1).astype(np.float32) / 255.0
        t = frames.shape[0]
        pad = (-t) % ct
        gt = prepare_gt_label(data)
        x = _normalized_depth_target(gt, direct_depth=True)
        x3 = np.repeat((x * 2.0 - 1.0)[..., None], 3, -1)

        def pad_clip(a):
            return (np.concatenate([np.repeat(a[:1], pad, 0), a], 0)
                    if pad else a)

        cond = model._encode(
            model.vae_params, jnp.asarray(pad_clip(frames) * 2.0 - 1.0))
        dep_lat = model._encode(model.vae_params, jnp.asarray(pad_clip(x3)))
        tl, hl, wl = cond.shape[:3]
        intr_lat = np.diag([1.0 / cs, 1.0 / cs, 1.0]) @ np.asarray(
            data["intrinsics"][0])
        key_t = latent_key_times(tl, ct, pad, t)
        rays = np.stack([
            raymap_from_pose(np.asarray(gt["gt_poses"][int(k)]), intr_lat,
                             hl, wl)
            for k in key_t
        ])
        tgts.append(np.concatenate(
            [np.asarray(dep_lat, np.float32), rays.astype(np.float32)], -1))
        conds.append(np.asarray(cond, np.float32))
    return {
        "target_latents": np.stack(tgts),
        "cond_latents": np.stack(conds),
    }


def run_training_loop(mesh, state, step_fn, make_batch, dataset, args,
                      writer, saver, export_params, needs_rng=True):
    """The one training driver shared by every trainer family: streams
    batches, times/logs steps, rotates checkpoints, saves the final state."""
    import jax

    from unigeo_tpu.utils.writers import TimeWriter

    with mesh:
        timer = TimeWriter(writer, "step_time", total_steps=args.steps)
        rng = jax.random.PRNGKey(1)
        idx = 0
        for step in range(args.steps):
            samples = [
                dataset[(idx + i) % len(dataset)]
                for i in range(args.batch_size)
            ]
            idx += args.batch_size
            batch = make_batch(samples)
            if needs_rng:
                rng, sub = jax.random.split(rng)
                with timer:
                    state, loss = step_fn(state, batch, sub)
            else:
                with timer:
                    state, loss = step_fn(state, batch)
            writer.put_scalar("loss", float(loss), step)
            if step % 10 == 0:
                print(f"step {step}: loss {float(loss):.4f} "
                      f"({timer.avg:.2f}s/step)")
            if (step + 1) % args.ckpt_every == 0:
                saver.save(export_params(state), step + 1)
    if args.steps % args.ckpt_every != 0:  # final state not yet saved
        saver.save(export_params(state), args.steps)
    print(f"done; checkpoints in {args.ckpt_dir}")
    return state


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
    from unigeo_tpu.utils.writers import EventWriter

    cfg = EvalConfig.from_yaml(args.config)
    if args.model:
        cfg = EvalConfig.from_dict(dict(cfg.raw, model_name=args.model))
    dataset = get_dataset_cls(cfg.dataset)(**cfg.dataset_kwargs)
    mesh_shape = (
        tuple(int(x) for x in args.mesh.split(",")) if args.mesh else None
    )
    # an explicit mesh may use fewer than all devices (e.g. '2,1,1' on an
    # 8-device host): take the first prod(shape) devices
    n_dev = int(np.prod(mesh_shape)) if mesh_shape else None
    mesh = make_mesh(n_devices=n_dev, shape=mesh_shape)
    writer = EventWriter(args.log_dir)
    saver = TrainStateSaver(args.ckpt_dir)

    model_name = cfg.model_name
    cfg_net = (cfg.model_params or {}).get("network_config") or {}
    if model_name in ("Spann3R", "Cut3R", "Dust3R"):
        trainer_cls = PointmapTrainer
        if model_name == "Cut3R":
            from unigeo_tpu.models.pointmap.cut3r import Cut3RNetwork, tiny_cut3r_config

            net = Cut3RNetwork(
                **(tiny_cut3r_config() if args.tiny else cfg_net))
        elif model_name == "Dust3R":
            from unigeo_tpu.models.pointmap.dust3r import (
                Dust3RNetwork,
                tiny_dust3r_config,
            )
            from unigeo_tpu.parallel.trainer import Dust3RTrainer

            net = Dust3RNetwork(
                **(tiny_dust3r_config() if args.tiny else cfg_net))
            trainer_cls = Dust3RTrainer
        else:
            from unigeo_tpu.models.pointmap.spann3r import (
                Spann3RNetwork,
                tiny_spann3r_config,
            )

            net = Spann3RNetwork(
                **(tiny_spann3r_config() if args.tiny else cfg_net))
        sample = dataset[0]
        t, _, h, w = sample["images"].shape
        if model_name == "Dust3R":  # two-view (pair) signature
            zero = jnp.zeros((1, h, w, 3))
            params = net.init(jax.random.PRNGKey(0), zero, zero)
        else:
            params = net.init(jax.random.PRNGKey(0), jnp.zeros((t, h, w, 3)))
        with mesh:
            trainer = trainer_cls(net, mesh, learning_rate=args.lr)
            state = trainer.init_state(params)
        run_training_loop(
            mesh, state, trainer.train_step, build_batch_pointmap, dataset,
            args, writer, saver,
            export_params=lambda s: jax.device_get(s.params),
            needs_rng=False,
        )
    elif model_name in ("DepthCrafter", "UniGeoCam", "UniGeo", "StableNormal",
                        "ChronoDepth", "DepthAnyVideo"):
        from unigeo_tpu.parallel.trainer import DiffusionTrainer

        # ChronoDepth/DepthAnyVideo share the SVD backbone but decode
        # DIRECT depth ((x+1)/2) instead of DepthCrafter's inverse recipe
        direct_depth = model_name in ("ChronoDepth", "DepthAnyVideo")

        sample = dataset[0]
        t, _, h, w = sample["images"].shape
        if args.tiny:
            from unigeo_tpu.models.depthcrafter.pipeline import tiny_pipeline

            pipe = tiny_pipeline(height=h, width=w, num_frames=t)
        else:
            from unigeo_tpu.models.depthcrafter.pipeline import (
                DepthCrafterPipeline,
            )

            # honor the config's architecture so the trained checkpoint
            # loads back into the eval model built from the SAME config
            mp = dict(cfg.model_params or {})
            pipe = DepthCrafterPipeline(
                unet_config=mp.get("unet_config"),
                vae_config=mp.get("vae_config"),
                clip_config=mp.get("clip_config"),
            )
            pipe.init_params(jax.random.PRNGKey(0), h, w, t)

        with mesh:
            trainer = DiffusionTrainer(pipe.unet, mesh, learning_rate=args.lr)
            state = trainer.init_state(pipe.params["unet"])
        # save the FULL pipeline layout the adapters load
        # (pipe.params = {unet, vae, clip}; chronodepth.py:89 lineage)
        run_training_loop(
            mesh, state, trainer.train_step,
            lambda samples: build_batch_diffusion(samples, pipe,
                                                  direct_depth=direct_depth),
            dataset,
            args, writer, saver,
            export_params=lambda s: {
                **jax.device_get(pipe.params),
                "unet": jax.device_get(s.params),
            },
        )
    elif model_name == "VideoDepthAnything":
        from unigeo_tpu.models.vda import VDANetwork, tiny_vda_config
        from unigeo_tpu.parallel.trainer import DisparityTrainer

        net = VDANetwork(**(tiny_vda_config() if args.tiny else cfg_net))
        sample = dataset[0]
        t, _, h, w = sample["images"].shape
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((t, h, w, 3)))
        with mesh:
            trainer = DisparityTrainer(net, mesh, learning_rate=args.lr)
            state = trainer.init_state(params)
        run_training_loop(
            mesh, state, trainer.train_step, build_batch_disparity, dataset,
            args, writer, saver,
            export_params=lambda s: jax.device_get(s.params),
            needs_rng=False,
        )
    elif model_name == "Aether":
        from unigeo_tpu.models.aether import Aether, tiny_aether
        from unigeo_tpu.parallel.trainer import FlowMatchingTrainer

        sample = dataset[0]
        t, _, h, w = sample["images"].shape
        if args.tiny:
            model = tiny_aether(height=h, width=w, frames=t)
        else:
            mp = dict(cfg.model_params or {})
            for k in ("init_height", "init_width", "init_frames"):
                mp.pop(k, None)  # sized from the dataset's clips
            model = Aether(init_height=h, init_width=w, init_frames=t, **mp)

        with mesh:
            trainer = FlowMatchingTrainer(model.dit, mesh, learning_rate=args.lr)
            state = trainer.init_state(model.dit_params)
        # save the layout Aether(checkpoint_path=...) loads: the trained
        # DiT plus the (frozen) VAE that produced the training targets
        run_training_loop(
            mesh, state, trainer.train_step,
            lambda samples: build_batch_aether(samples, model), dataset,
            args, writer, saver,
            export_params=lambda s: {
                "vae": jax.device_get(model.vae_params),
                "dit": jax.device_get(s.params),
            },
        )
    else:
        raise SystemExit(
            f"training driver supports pointmap models (Spann3R/Cut3R/"
            f"Dust3R), diffusion models (DepthCrafter/UniGeoCam/"
            f"StableNormal/ChronoDepth/DepthAnyVideo), the flow-matching "
            f"Aether, and the feed-forward VideoDepthAnything. "
            f"Got model {model_name!r}."
        )


if __name__ == "__main__":
    main()
