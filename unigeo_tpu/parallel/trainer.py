"""Diffusion training step for the UNet, sharded over the mesh.

The reference ships no trainer (vestigial robustmvd savers only,
SURVEY.md §2.2/L8).  Here training is a first-class jitted SPMD program:

  batch [B, T, h, w, ...] latent clips
    dp shards B, sp shards T, tp shards attention/MLP weights
  EDM denoising loss: sigma ~ exp(N(P_mean, P_std)); x = x0 + sigma*noise;
  loss = mean((UNet(precondition(x)) - v_target)^2)

One call = forward + backward + adamw update, all under a single jit with
NamedShardings; gradients for replicated params are psum-reduced by XLA
automatically.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unigeo_tpu.models.depthcrafter.scheduler import EulerDiscreteScheduler
from unigeo_tpu.parallel.sharding import param_shardings, shard_params


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def _shard_owned(params, mesh):
    """Shard params into a tree the trainer OWNS.

    jax.device_put returns the input array unchanged when the sharding
    already matches, so shard_params can alias the caller's tree — and the
    donated train step would then delete the caller's arrays (observed:
    pipe.params['unet'] died after step 1, crashing the next batch encode).
    An explicit copy decouples the two.
    """
    return jax.tree.map(lambda x: x.copy(), shard_params(params, mesh))


class DiffusionTrainer:
    """Owns the optimizer and the jitted sharded train step."""

    def __init__(
        self,
        unet,
        mesh: Mesh,
        learning_rate: float = 1e-5,
        weight_decay: float = 1e-2,
        sigma_p_mean: float = 0.7,
        sigma_p_std: float = 1.6,
    ):
        self.unet = unet
        self.mesh = mesh
        self.scheduler = EulerDiscreteScheduler()
        self.optimizer = optax.adamw(learning_rate, weight_decay=weight_decay)
        self.p_mean = sigma_p_mean
        self.p_std = sigma_p_std
        self._step_fn = None

    def init_state(self, params) -> TrainState:
        params = _shard_owned(params, self.mesh)
        opt_state = self.optimizer.init(params)
        return TrainState(params, opt_state, jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------------

    def _loss(self, params, batch, rng, num_frames):
        """batch: latents [B,T,h,w,4], cond [B,T,h,w,4], ctx [B,T,1,C]."""
        latents = batch["latents"]
        cond = batch["cond_latents"]
        ctx = batch["context"]
        b, t = latents.shape[:2]

        r_sigma, r_noise = jax.random.split(rng)
        log_sigma = self.p_mean + self.p_std * jax.random.normal(r_sigma, (b, 1, 1, 1, 1))
        sigma = jnp.exp(log_sigma)
        noise = jax.random.normal(r_noise, latents.shape, latents.dtype)

        noisy = latents + sigma * noise
        v_tgt = self.scheduler.v_target(latents, noise, sigma)
        x_in = self.scheduler.scale_model_input(noisy, sigma)

        unet_in = jnp.concatenate([x_in, cond], axis=-1).reshape(
            b * t, *latents.shape[2:-1], 8
        )
        if self.scheduler.config.timestep_type == "continuous":
            # SVD conditioning: c_noise = 0.25·ln(sigma)
            timesteps = 0.25 * jnp.log(sigma[:, 0, 0, 0, 0])
        else:
            timesteps = jnp.interp(
                jnp.log(sigma[:, 0, 0, 0, 0]),
                jnp.log(jnp.asarray(self.scheduler.train_sigmas, jnp.float32)),
                jnp.arange(
                    self.scheduler.config.num_train_timesteps, dtype=jnp.float32
                ),
            )  # [B]
        added = jnp.tile(jnp.asarray([[6.0, 127.0, 0.02]], jnp.float32), (b, 1))
        v_pred = self.unet.apply(
            {"params": params},
            unet_in,
            timesteps,
            ctx.reshape(b * t, *ctx.shape[2:]),
            added,
            num_frames,
        ).reshape(v_tgt.shape)
        return jnp.mean((v_pred - v_tgt) ** 2)

    def make_step(self, example_batch, num_frames: int):
        mesh = self.mesh
        batch_sharding = jax.tree.map(
            lambda x: NamedSharding(mesh, P("dp", "sp")), example_batch
        )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step_fn(state: TrainState, batch, rng):
            batch = jax.lax.with_sharding_constraint(batch, batch_sharding)
            loss, grads = jax.value_and_grad(self._loss)(
                state.params, batch, rng, num_frames
            )
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), loss

        self._step_fn = step_fn
        return step_fn

    def train_step(self, state, batch, rng):
        if self._step_fn is None:
            self.make_step(batch, batch["latents"].shape[1])
        return self._step_fn(state, batch, rng)


class FlowMatchingTrainer:
    """Sharded rectified-flow train step for the Aether DiT family.

    Loss: t ~ logit-normal(0, 1) per clip (the SD3/Aether-lineage density —
    concentrates supervision at mid-noise levels), x_t = (1-t)·x0 + t·eps,
    and the network regresses the constant path velocity v = eps - x0 from
    [cond | x_t] at time t.  Batch layout [B, T', h, w, C]: B shards on dp;
    tp shards the DiT's attention/MLP weights through the same name-matched
    rules as the UNet (to_q/to_k/to_v/to_out, fc1/fc2); the full-3D
    attention sequence stays whole per clip.
    """

    def __init__(self, dit, mesh: Mesh, learning_rate: float = 1e-4,
                 weight_decay: float = 1e-2):
        self.dit = dit
        self.mesh = mesh
        self.optimizer = optax.adamw(learning_rate, weight_decay=weight_decay)
        self._step_fn = None

    def init_state(self, params) -> TrainState:
        params = _shard_owned(params, self.mesh)
        return TrainState(params, self.optimizer.init(params),
                          jnp.zeros((), jnp.int32))

    def _loss(self, params, batch, rng):
        """batch: target_latents [B,T',h,w,Ct], cond_latents [B,T',h,w,Cc]."""
        x0 = batch["target_latents"]
        cond = batch["cond_latents"]
        b = x0.shape[0]

        r_t, r_noise = jax.random.split(rng)
        t = jax.nn.sigmoid(jax.random.normal(r_t, (b,)))  # logit-normal
        eps = jax.random.normal(r_noise, x0.shape, x0.dtype)
        tb = t[:, None, None, None, None]
        x_t = (1.0 - tb) * x0 + tb * eps
        v_tgt = eps - x0

        def per_clip(c, x, ti):
            return self.dit.apply(
                params, jnp.concatenate([c, x], axis=-1), ti)

        v_pred = jax.vmap(per_clip)(cond, x_t, t)
        return jnp.mean((v_pred - v_tgt) ** 2)

    def make_step(self, example_batch):
        mesh = self.mesh
        batch_sharding = jax.tree.map(
            lambda x: NamedSharding(mesh, P("dp")), example_batch
        )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step_fn(state: TrainState, batch, rng):
            batch = jax.lax.with_sharding_constraint(batch, batch_sharding)
            loss, grads = jax.value_and_grad(self._loss)(
                state.params, batch, rng)
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), loss

        self._step_fn = step_fn
        return step_fn

    def train_step(self, state, batch, rng):
        if self._step_fn is None:
            self.make_step(batch)
        return self._step_fn(state, batch, rng)


class PointmapTrainer:
    """Sharded train step for the pointmap family (Spann3R/Cut3R-class).

    Loss = confidence-weighted 3D regression on world pointmaps
    (models/pointmap/losses.py) + optional 7-DoF pose loss for networks with
    a pose head.  Batch layout [B, T, H, W, ...]: B shards on dp, frames
    stay whole per clip (the recurrent scan is sequential in T).
    """

    def __init__(self, network, mesh: Mesh, learning_rate: float = 1e-4,
                 weight_decay: float = 5e-2, conf_alpha: float = 0.2,
                 pose_weight: float = 1.0):
        self.network = network
        self.mesh = mesh
        self.optimizer = optax.adamw(learning_rate, weight_decay=weight_decay)
        self.conf_alpha = conf_alpha
        self.pose_weight = pose_weight
        self._step_fn = None

    def init_state(self, params) -> TrainState:
        params = _shard_owned(params, self.mesh)
        return TrainState(params, self.optimizer.init(params), jnp.zeros((), jnp.int32))

    def _loss(self, params, batch):
        from unigeo_tpu.models.pointmap.losses import (
            pointmap_regression_loss,
            pose_loss,
        )

        frames = batch["frames"]  # [B, T, H, W, 3] in 0..1
        gt_pts = batch["gt_world_pts"]  # [B, T, H, W, 3]
        valid = batch["mask"]  # [B, T, H, W]

        def per_clip(f):
            out = self.network.apply(params, f)
            if isinstance(out, dict):
                return out["world_pts"], out["world_conf"], out.get("pose_enc")
            pts, conf = out
            return pts, conf, None

        pts, conf, pose_enc = jax.vmap(per_clip)(frames)
        loss = pointmap_regression_loss(pts, gt_pts, valid, conf, self.conf_alpha)
        if pose_enc is not None and "gt_poses" in batch:
            loss = loss + self.pose_weight * pose_loss(pose_enc, batch["gt_poses"])
        return loss

    def make_step(self, example_batch):
        mesh = self.mesh
        batch_sharding = jax.tree.map(
            lambda x: NamedSharding(mesh, P("dp")), example_batch
        )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step_fn(state: TrainState, batch):
            batch = jax.lax.with_sharding_constraint(batch, batch_sharding)
            loss, grads = jax.value_and_grad(self._loss)(state.params, batch)
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), loss

        self._step_fn = step_fn
        return step_fn

    def train_step(self, state, batch):
        if self._step_fn is None:
            self.make_step(batch)
        return self._step_fn(state, batch)


class DisparityTrainer:
    """Sharded train step for the feed-forward video-depth family
    (VideoDepthAnything-class): scale-shift-invariant disparity loss +
    temporal gradient matching (the method's public recipe — affine
    alignment makes the supervision consistent with the adapter's
    min-max-normalized relative output).

    Batch layout [B, T, H, W, ...]: B shards on dp; frames stay whole per
    clip (the temporal modules mix across T).
    """

    def __init__(self, network, mesh: Mesh, learning_rate: float = 1e-4,
                 weight_decay: float = 1e-2, temporal_weight: float = 1.0):
        self.network = network
        self.mesh = mesh
        self.optimizer = optax.adamw(learning_rate, weight_decay=weight_decay)
        self.temporal_weight = temporal_weight
        self._step_fn = None

    def init_state(self, params) -> TrainState:
        params = _shard_owned(params, self.mesh)
        return TrainState(params, self.optimizer.init(params),
                          jnp.zeros((), jnp.int32))

    def _loss(self, params, batch):
        from unigeo_tpu.metrics.alignment import lstsq_scale_shift

        frames = batch["frames"]  # [B, T, H, W, 3] in 0..1
        gt_disp = batch["gt_disp"]  # [B, T, H, W] (1/depth)
        valid = batch["mask"]  # [B, T, H, W]

        def per_clip(f, g, m):
            pred = self.network.apply(params, f)  # [T, H, W]
            # per-frame masked least-squares (s, b): the canonical
            # differentiable solver from the metrics suite, vmapped over T
            s, b = jax.vmap(lstsq_scale_shift)(pred, g, m)
            aligned = s[:, None, None] * pred + b[:, None, None]
            n = jnp.maximum(m.sum(), 1.0)
            ssi = (m * jnp.abs(aligned - g)).sum() / n
            # temporal gradient matching on the aligned prediction
            dp = aligned[1:] - aligned[:-1]
            dg = g[1:] - g[:-1]
            mt = m[1:] * m[:-1]
            tgm = (mt * jnp.abs(dp - dg)).sum() / jnp.maximum(mt.sum(), 1.0)
            return ssi + self.temporal_weight * tgm

        return jnp.mean(jax.vmap(per_clip)(frames, gt_disp, valid))

    def make_step(self, example_batch):
        mesh = self.mesh
        batch_sharding = jax.tree.map(
            lambda x: NamedSharding(mesh, P("dp")), example_batch
        )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step_fn(state: TrainState, batch):
            batch = jax.lax.with_sharding_constraint(batch, batch_sharding)
            loss, grads = jax.value_and_grad(self._loss)(state.params, batch)
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), loss

        self._step_fn = step_fn
        return step_fn

    def train_step(self, state, batch):
        if self._step_fn is None:
            self.make_step(batch)
        return self._step_fn(state, batch)


class Dust3RTrainer(PointmapTrainer):
    """Pair-mode pointmap training for the DUSt3R two-view network.

    DUSt3R's loss supervises BOTH views' pointmaps in the reference view's
    frame (confidence-weighted Regr3D).  Clips train as the adapter
    infers: all (frame0, frame_i) pairs in one program, frame 0 = world,
    so gt_world_pts supervise pts1 (view1 = frame 0, broadcast) and pts2
    (view2 = frame i) directly.  Inherits the sharded step machinery.
    """

    def _loss(self, params, batch):
        from unigeo_tpu.models.pointmap.losses import (
            normalize_by_avg_dis,
            pointmap_regression_loss,
        )

        frames = batch["frames"]  # [B, T, H, W, 3] in 0..1
        gt_pts = batch["gt_world_pts"]
        valid = batch["mask"]

        def per_clip(f, g, v):
            # the reference view encodes ONCE (batch 1); the network
            # broadcasts its tokens across the T-1 pairs
            pts1, pts2, conf1, conf2 = self.network.apply(
                params, f[:1], f[1:])
            g_ref = jnp.broadcast_to(g[:1], g[1:].shape)
            v_ref = jnp.broadcast_to(v[:1], v[1:].shape)
            # DUSt3R Regr3D: ONE normalization factor over BOTH views —
            # per-view factors would leave the heads' relative scale
            # unconstrained (a 10x-scaled pts2 would score the same loss)
            pred = jnp.concatenate([pts1, pts2], axis=0)
            gt = jnp.concatenate([g_ref, g[1:]], axis=0)
            va = jnp.concatenate([v_ref, v[1:]], axis=0).astype(jnp.float32)
            pred_n, _ = normalize_by_avg_dis(pred, va)
            gt_n, _ = normalize_by_avg_dis(gt, va)
            conf = jnp.concatenate([conf1, conf2], axis=0)
            return pointmap_regression_loss(
                pred_n, gt_n, va, conf, self.conf_alpha, normalize=False)

        return jnp.mean(jax.vmap(per_clip)(frames, gt_pts, valid))
