"""AETHER-class geometry-aware unified world model (DiT + flow matching).

The reference lists AETHER among its supported methods (model/Readme.md:5)
but ships no adapter in the snapshot.  This is the native implementation of
the method family (public recipe: "Aether: Geometric-Aware Unified World
Modeling" — a CogVideoX-lineage video diffusion transformer fine-tuned to
jointly denoise RGB-conditioned DEPTH video and camera RAYMAPS with a
rectified-flow objective).  Three sub-stacks, all new to this repo:

  CausalVAE3D  a causal 3D video VAE (CogVideoX lineage): temporal convs
               pad only on the PAST (replicate-first-frame), so streaming
               prefixes encode identically; spatial 8x + temporal 4x
               compression at production scale (config-driven).
  AetherDiT    a diffusion transformer with adaLN-zero conditioning
               (DiT lineage): every block's LayerNorms are modulated by
               shift/scale/gate vectors regressed from the timestep
               embedding through a ZERO-initialised projection, so each
               block (and the final head) is exactly the identity at init;
               full 3D attention over all space-time patch tokens
               (CogVideoX-style, one sequence — no spatial/temporal split);
               patchify 2x2 on the latent grid.
  Flow sampler rectified-flow Euler: the path x_t = (1-t)·x0 + t·eps has
               constant velocity v = eps - x0, the network regresses v, and
               sampling integrates x <- x - (1/N)·v from t=1 to 0.

Task layout (reconstruction task of the paper): the clean RGB latents are
channel-concatenated as conditioning; the denoised target is
[depth-latents | raymap] where the raymap is a 6-channel per-latent-pixel
(unit direction, camera origin) field in the world frame.  Camera recovery
is closed-form: origins average to the camera centre and directions give
the rotation by Kabsch against the intrinsics' camera rays — no PnP needed
because the raymap already factorises rotation from depth.

Adapter contract (model/Readme.md:10-16): emits all four prediction
families.  Depth is direct affine-invariant ((x+1)/2 of the decoded video,
channel-mean), world pointmaps are pose-transported backprojections with
frame 0 as the world frame, normals are plane-fit + OpenGL flip
(model/depthcrafter.py:48-68 lineage).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unigeo_tpu.models.layers import Attention, GroupNorm, sinusoidal_embedding
from unigeo_tpu.models.vit import MLP, sincos_2d_pos_embed
from unigeo_tpu.ops.backproject import backproject_to_cv_position
from unigeo_tpu.ops.normals import surface_normals_from_points
from unigeo_tpu.registry import MODELS


# ---------------------------------------------------------------------------
# Causal 3D video VAE
# ---------------------------------------------------------------------------


class _Conv3dParams(nn.Module):
    """Kernel + bias with nn.Conv's exact names/shapes/inits so the fused
    path's checkpoint layout is identical to the plain conv's."""

    features: int
    kernel: Tuple[int, int, int]

    @nn.compact
    def __call__(self, cin: int):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            tuple(self.kernel) + (cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class CausalConv3d(nn.Module):
    """Conv over [T, H, W, C]: SAME spatial padding, temporal padding only
    on the PAST (edge-replicate), optional (time, space) strides.

    Causality: the temporal left pad is kt - st, so unstrided convs see
    frames <= t only, and stride-2 downsamples are block-causal (latent k
    sees frames < (k+1)·2).  A pad of kt - 1 would instead floor-divide
    the LAST frame out of a strided output entirely.  Encoding a prefix of
    a clip equals the prefix of the encoding
    (tests/test_aether.py::test_vae_causality).
    """

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    # conv3d(nearest_up2_spatial(x)) as ONE lhs-dilated conv on the low-res
    # input — the layers.Conv2d fuse_upsample2x trick (2.6x at 2D-VAE
    # decoder shapes on v5e) extended to the 3D kernel's spatial dims; the
    # temporal dim keeps its causal pad.  Param layout identical.
    fuse_upsample2x: bool = False

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel
        st, sh, sw = self.strides
        if kt - st > 0:
            pad = jnp.repeat(x[:1], kt - st, axis=0)
            x = jnp.concatenate([pad, x], axis=0)
        if self.fuse_upsample2x:
            assert (kh, kw) == (3, 3) and (st, sh, sw) == (1, 1, 1)
            kk, b = _Conv3dParams(
                self.features, self.kernel, name="conv")(x.shape[-1])
            dtype = jnp.result_type(x.dtype, kk.dtype)
            kk = kk.astype(dtype)  # [kt, 3, 3, in, out]
            kp = jnp.zeros((kt, 4, 4, x.shape[-1], self.features), dtype)
            for u in range(2):
                for v in range(2):
                    kp = kp.at[:, u : u + 3, v : v + 3].add(kk)
            dn = jax.lax.conv_dimension_numbers(
                x[None].shape, kp.shape, ("NTHWC", "THWIO", "NTHWC")
            )
            y = jax.lax.conv_general_dilated(
                x[None].astype(dtype), kp, (1, 1, 1),
                ((0, 0), (2, 2), (2, 2)),
                lhs_dilation=(1, 2, 2), dimension_numbers=dn,
            )[0]
            return y + b.astype(dtype)
        # lax conv wants a batch axis; time becomes a spatial dim of Conv
        x = nn.Conv(
            self.features,
            kernel_size=(kt, kh, kw),
            strides=(st, sh, sw),
            padding=((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)),
            name="conv",
        )(x[None])[0]
        return x


class CausalResBlock3d(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.silu(GroupNorm(name="norm1")(x))
        h = CausalConv3d(self.features, name="conv1")(h)
        h = nn.silu(GroupNorm(name="norm2")(h))
        h = CausalConv3d(self.features, name="conv2")(h)
        if x.shape[-1] != self.features:
            x = nn.Dense(self.features, name="skip")(x)
        return x + h


class _VAEEncoder3D(nn.Module):
    base_width: int
    mults: Sequence[int]
    temporal_down: Sequence[bool]
    z_channels: int

    @nn.compact
    def __call__(self, frames):
        """frames [T, H, W, 3] → mean latents [T/ct, H/cs, W/cs, z]."""
        x = CausalConv3d(self.base_width, name="stem")(frames)
        for i, m in enumerate(self.mults):
            w = self.base_width * m
            x = CausalResBlock3d(w, name=f"enc_res{i}")(x)
            ts = 2 if self.temporal_down[i] else 1
            x = CausalConv3d(w, strides=(ts, 2, 2), name=f"enc_down{i}")(x)
        x = CausalResBlock3d(x.shape[-1], name="enc_mid")(x)
        x = nn.silu(GroupNorm(name="enc_norm")(x))
        moments = CausalConv3d(2 * self.z_channels, kernel=(1, 1, 1),
                               name="enc_out")(x)
        mean, _logvar = jnp.split(moments, 2, axis=-1)
        return mean  # deterministic (eval) posterior mode


class _VAEDecoder3D(nn.Module):
    base_width: int
    mults: Sequence[int]
    temporal_down: Sequence[bool]
    fused_upsample: bool = True  # False = reference repeat+conv path

    @nn.compact
    def __call__(self, z):
        """latents → frames [T, H, W, 3] (unbounded; trained to [-1, 1])."""
        w = self.base_width * self.mults[-1]
        x = CausalConv3d(w, kernel=(1, 1, 1), name="dec_in")(z)
        x = CausalResBlock3d(w, name="dec_mid")(x)
        for i, m in list(enumerate(self.mults))[::-1]:
            w = self.base_width * m
            _, hh, ww, c = x.shape
            if self.temporal_down[i]:
                # causal temporal upsample: frames 2k and 2k+1 both come
                # from latent k (nearest on the past side)
                x = jnp.repeat(x, 2, axis=0)
            if self.fused_upsample:
                # spatial nearest-up2x folded into the conv (exact;
                # tests/test_aether.py::test_fused_upsample_matches_plain)
                x = CausalConv3d(
                    w, fuse_upsample2x=True, name=f"dec_up{i}")(x)
            else:
                x = jax.image.resize(x, (x.shape[0], hh * 2, ww * 2, c),
                                     method="nearest")
                x = CausalConv3d(w, name=f"dec_up{i}")(x)
            x = CausalResBlock3d(w, name=f"dec_res{i}")(x)
        x = nn.silu(GroupNorm(name="dec_norm")(x))
        return CausalConv3d(3, name="dec_out")(x)


class CausalVAE3D(nn.Module):
    """[T, H, W, 3] in [-1, 1] → latents [T/ct, H/cs, W/cs, z] and back.

    ``temporal_down[i]`` says whether stage i downsamples time as well as
    space; total compression ct = 2^sum(temporal_down), cs = 2^len(mults).
    The adapter left-pads T to a multiple of ct with replicated first
    frames (causal — the pad frames cannot influence real frames) and
    crops the decode.
    """

    base_width: int = 64
    mults: Sequence[int] = (1, 2, 4)
    temporal_down: Sequence[bool] = (False, True, True)
    z_channels: int = 8
    fused_upsample: bool = True

    @property
    def ct(self) -> int:
        return int(2 ** sum(bool(b) for b in self.temporal_down))

    @property
    def cs(self) -> int:
        return int(2 ** len(self.mults))

    def setup(self):
        self.encoder = _VAEEncoder3D(
            self.base_width, self.mults, self.temporal_down,
            self.z_channels, name="encoder")
        self.decoder = _VAEDecoder3D(
            self.base_width, self.mults, self.temporal_down,
            self.fused_upsample, name="decoder")

    def __call__(self, frames):
        """Full roundtrip (used for init so both halves get params)."""
        z = self.encoder(frames)
        return self.decoder(z), z

    def encode(self, frames):
        return self.encoder(frames)

    def decode(self, z):
        return self.decoder(z)


# ---------------------------------------------------------------------------
# DiT with adaLN-zero
# ---------------------------------------------------------------------------


def _modulate(x, shift, scale):
    """x [B, S, C]; shift/scale [B, C] (DiT adaLN modulation)."""
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


class DiTBlock(nn.Module):
    """Pre-LN transformer block whose norms are adaLN-zero modulated.

    The modulation projection is ZERO-initialised: at init every
    shift/scale/gate is 0, the residual branches are gated off, and the
    block is exactly the identity (DiT's adaLN-zero recipe — keeps early
    fine-tuning stable and is asserted in tests/test_aether.py).
    """

    num_heads: int
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x, cond):
        c = x.shape[-1]
        mod = nn.Dense(
            6 * c,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="adaLN_modulation",
        )(nn.silu(cond))
        (sa_shift, sa_scale, sa_gate,
         mlp_shift, mlp_scale, mlp_gate) = jnp.split(mod, 6, axis=-1)
        ln = nn.LayerNorm(use_bias=False, use_scale=False)
        h = _modulate(ln(x), sa_shift, sa_scale)
        x = x + sa_gate[:, None, :] * Attention(
            self.num_heads, name="attn")(h)
        h = _modulate(ln(x), mlp_shift, mlp_scale)
        x = x + mlp_gate[:, None, :] * MLP(
            mult=self.mlp_ratio, name="mlp")(h)
        return x


class _DiTStep(nn.Module):
    num_heads: int
    mlp_ratio: int

    @nn.compact
    def __call__(self, x, cond):
        return DiTBlock(self.num_heads, self.mlp_ratio, name="block")(
            x, cond), None


class ScannedDiTBlocks(nn.Module):
    """Depth-homogeneous DiT stack as ONE nn.scan over layer params:
    compile cost of a single block regardless of depth (same trick as
    vit.ScannedViTBlocks)."""

    depth: int
    num_heads: int
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x, cond):
        scan = nn.scan(
            _DiTStep,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=nn.broadcast,
            length=self.depth,
        )
        x, _ = scan(self.num_heads, self.mlp_ratio, name="blocks")(x, cond)
        return x


class AetherDiT(nn.Module):
    """Velocity network: ([T', h, w, Cin], t) → [T', h, w, out_channels].

    Cin = condition channels (clean RGB latents) + target channels; the
    output regresses the rectified-flow velocity of the TARGET channels
    only.  Tokens = 2x2 latent patches over ALL frames in one sequence
    (full 3D attention); positions = factorised temporal-1D + spatial-2D
    sincos embeddings, summed.
    """

    out_channels: int
    width: int = 384
    depth: int = 12
    num_heads: int = 6
    patch: int = 2
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x, t):
        tl, h, w, _ = x.shape
        p = self.patch
        gh, gw = h // p, w // p

        tokens = nn.Conv(
            self.width, kernel_size=(p, p), strides=(p, p),
            padding="VALID", name="patchify",
        )(x)  # [T', gh, gw, width]
        tokens = tokens.reshape(tl, gh * gw, self.width)
        spatial = sincos_2d_pos_embed(self.width, gh, gw)  # [gh*gw, C]
        temporal = sinusoidal_embedding(
            jnp.arange(tl), self.width, flip_sin_to_cos=False)  # [T', C]
        tokens = tokens + spatial[None] + temporal[:, None, :]
        tokens = tokens.reshape(1, tl * gh * gw, self.width)

        temb = sinusoidal_embedding(jnp.atleast_1d(t), 256)
        cond = nn.Dense(self.width, name="t_embed1")(temb)
        cond = nn.Dense(self.width, name="t_embed2")(nn.silu(cond))  # [1, C]

        tokens = ScannedDiTBlocks(
            self.depth, self.num_heads, self.mlp_ratio, name="stack",
        )(tokens, cond)

        # final layer: adaLN modulation + zero-init projection → the whole
        # network outputs exactly 0 at init (identity flow)
        mod = nn.Dense(
            2 * self.width,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="final_modulation",
        )(nn.silu(cond))
        shift, scale = jnp.split(mod, 2, axis=-1)
        tokens = _modulate(
            nn.LayerNorm(use_bias=False, use_scale=False)(tokens),
            shift, scale)
        out = nn.Dense(
            p * p * self.out_channels,
            kernel_init=nn.initializers.zeros,
            name="final_proj",
        )(tokens)
        out = out.reshape(tl, gh, gw, p, p, self.out_channels)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(
            tl, h, w, self.out_channels)
        return out


# ---------------------------------------------------------------------------
# Raymaps and camera recovery
# ---------------------------------------------------------------------------


def camera_rays(intrinsic, h: int, w: int):
    """Unit OpenCV camera-space rays [h, w, 3] through pixel (u, v)
    (same pixel convention as ops/backproject.py:20-34: z = 1 at
    x = (u - cx)/fx).  Host-side float64 — pose recovery is tiny
    per-keyframe work and f32 Kabsch on a narrow-FOV ray bundle loses
    ~1e-3 (same reasoning as the float64 Umeyama in metrics/camera.py)."""
    intrinsic = np.asarray(intrinsic, dtype=np.float64)
    uu, vv = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64), indexing="xy")
    x = (uu - intrinsic[0, 2]) / intrinsic[0, 0]
    y = (vv - intrinsic[1, 2]) / intrinsic[1, 1]
    d = np.stack([x, y, np.ones_like(x)], axis=-1)
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


def raymap_from_pose(c2w, intrinsic, h: int, w: int):
    """GT raymap [h, w, 6] = (world unit direction, camera origin) — the
    supervision target of the AETHER recipe (and the test fixture)."""
    c2w = np.asarray(c2w, dtype=np.float64)
    d_cam = camera_rays(intrinsic, h, w)
    d_world = d_cam @ c2w[:3, :3].T
    origin = np.broadcast_to(c2w[:3, 3], d_world.shape)
    return np.concatenate([d_world, origin], axis=-1)


def pose_from_raymap(raymap, intrinsic):
    """Recover a c2w pose [4, 4] from a predicted raymap [h, w, 6].

    t = mean origin; R = Kabsch between the intrinsics' camera rays and
    the predicted world directions (closed form — the raymap parameterises
    rotation directly, unlike pointmaps which need PnP).
    """
    raymap = np.asarray(raymap, dtype=np.float64)
    h, w, _ = raymap.shape
    d_world, origins = raymap[..., :3], raymap[..., 3:]
    d_world = d_world / np.maximum(
        np.linalg.norm(d_world, axis=-1, keepdims=True), 1e-8)
    a = camera_rays(intrinsic, h, w).reshape(-1, 3)
    b = d_world.reshape(-1, 3)
    m = b.T @ a  # want R with b ≈ R a
    u, _, vt = np.linalg.svd(m)
    r = u @ np.diag([1.0, 1.0, np.linalg.det(u @ vt)]) @ vt
    pose = np.eye(4)
    pose[:3, :3] = r
    pose[:3, 3] = origins.reshape(-1, 3).mean(axis=0)
    return pose


def latent_key_times(tl: int, ct: int, pad: int, t: int) -> np.ndarray:
    """Causal time anchor of each latent keyframe: latent i covers input
    frames [i·ct - pad, (i+1)·ct - pad) and is anchored at the LAST frame
    it can see.  One definition shared by the training raymap targets
    (train.build_batch_aether) and inference pose recovery — if the two
    sides disagree, pose interpolation silently mismatches supervision."""
    return np.minimum((np.arange(tl) + 1) * ct - 1 - pad, t - 1).astype(
        np.float64)


def interpolate_poses(key_poses, key_times, query_times):
    """Per-frame poses from latent-keyframe poses: quaternion slerp on
    rotations + linear translation (host-side numpy; tiny)."""
    from unigeo_tpu.metrics.camera import (
        matrix_to_quaternion, quaternion_to_matrix)

    key_poses = np.asarray(key_poses)
    key_times = np.asarray(key_times, dtype=np.float64)
    quats = np.array(matrix_to_quaternion(jnp.asarray(key_poses[:, :3, :3])))
    # hemisphere-align consecutive quaternions so slerp takes the short arc
    for i in range(1, len(quats)):
        if np.dot(quats[i], quats[i - 1]) < 0:
            quats[i] = -quats[i]
    out = []
    for t in np.asarray(query_times, dtype=np.float64):
        i = int(np.clip(np.searchsorted(key_times, t, side="right") - 1,
                        0, len(key_times) - 2)) if len(key_times) > 1 else 0
        if len(key_times) == 1:
            out.append(key_poses[0])
            continue
        t0, t1 = key_times[i], key_times[i + 1]
        a = 0.0 if t1 == t0 else float(np.clip((t - t0) / (t1 - t0), 0, 1))
        q0, q1 = quats[i], quats[i + 1]
        dot = float(np.clip(np.dot(q0, q1), -1.0, 1.0))
        if dot > 0.9995:  # nearly parallel: lerp
            q = (1 - a) * q0 + a * q1
        else:
            th = np.arccos(dot)
            q = (np.sin((1 - a) * th) * q0 + np.sin(a * th) * q1) / np.sin(th)
        q = q / np.linalg.norm(q)
        pose = np.eye(4)
        pose[:3, :3] = np.asarray(quaternion_to_matrix(jnp.asarray(q)))
        pose[:3, 3] = (1 - a) * key_poses[i, :3, 3] + a * key_poses[i + 1, :3, 3]
        out.append(pose)
    return np.stack(out)


# ---------------------------------------------------------------------------
# Adapter
# ---------------------------------------------------------------------------


@MODELS.register("Aether")
class Aether:
    """clip → (VAE-encode RGB) → flow-matching denoise of [depth | raymap]
    → all four prediction families."""

    def __init__(
        self,
        network_config: Optional[Dict[str, Any]] = None,
        vae_config: Optional[Dict[str, Any]] = None,
        checkpoint_path: Optional[str] = None,
        num_steps: int = 4,
        seed: int = 0,
        init_height: int = 384,
        init_width: int = 512,
        init_frames: int = 8,
        compute_dtype: Optional[str] = None,  # "bfloat16" = fp16-ref mode
        transfer_dtype: Optional[str] = None,  # "float16" halves output IO
        # reference-config compat (accepted, unused)
        model_dir: Optional[str] = None,
        **_: Dict,
    ):
        self.vae = CausalVAE3D(**(vae_config or {}))
        zc = self.vae.z_channels
        self.raymap_channels = 6
        self.target_channels = zc + self.raymap_channels
        self.dit = AetherDiT(
            out_channels=self.target_channels, **(network_config or {}))
        self.num_steps = int(num_steps)
        self.seed = seed

        if checkpoint_path:
            from unigeo_tpu.utils.checkpoint import load_params

            params = load_params(checkpoint_path)
            self.vae_params = params["vae"]
            self.dit_params = params["dit"]
        else:
            rng = jax.random.PRNGKey(seed)
            r1, r2 = jax.random.split(rng)
            t0 = init_frames
            frames0 = jnp.zeros((t0, init_height, init_width, 3))
            self.vae_params = self.vae.init(r1, frames0)
            tl = t0 // self.vae.ct
            h_lat, w_lat = init_height // self.vae.cs, init_width // self.vae.cs
            x0 = jnp.zeros((tl, h_lat, w_lat, zc + self.target_channels))
            self.dit_params = self.dit.init(r2, x0, jnp.float32(1.0))

        self._encode = jax.jit(
            lambda p, f: self.vae.apply(p, f, method=CausalVAE3D.encode))
        self._decode = jax.jit(
            lambda p, z: self.vae.apply(p, z, method=CausalVAE3D.decode))
        self._sample = jax.jit(self._flow_sample, static_argnames=("steps",))

        from unigeo_tpu.models.pointmap import adapter as _adapter

        self._adapter = _adapter
        cdt = _adapter.resolve_compute_dtype(compute_dtype)
        tdt = _adapter.resolve_transfer_dtype(transfer_dtype)
        if cdt is not None:
            self.vae_params = _adapter.cast_params(self.vae_params, cdt)
            self.dit_params = _adapter.cast_params(self.dit_params, cdt)

        def _stage_main(vp, dp_, raw, intr):
            """ONE device program: raw [T,3,H,W] 0..255 → (depths,
            normals_gl, raymaps, cam points).  The host only massages the
            tiny raymaps (f64 pose recovery) between this and _stage_world
            — cam points never leave the device (tools/bench_zoo.py r5:
            the split pipeline spent 95% of 4.9 s/clip on transfers and
            host passes)."""
            t = raw.shape[0]
            frames = jnp.moveaxis(raw, 1, -1) / 255.0
            inp = frames * 2.0 - 1.0
            pad = (-t) % self.vae.ct
            if pad:
                inp = jnp.concatenate(
                    [jnp.repeat(inp[:1], pad, axis=0), inp], 0)
            if cdt is not None:
                inp = inp.astype(cdt)
            cond_lat = self.vae.apply(vp, inp, method=CausalVAE3D.encode)
            tl, h_lat, w_lat = cond_lat.shape[:3]
            noise = jax.random.normal(
                jax.random.PRNGKey(self.seed),
                (tl, h_lat, w_lat, self.target_channels),
                cond_lat.dtype if cdt is not None else jnp.float32)
            sampled = self._flow_sample(dp_, cond_lat, noise, self.num_steps)
            depth_lat = sampled[..., : self.vae.z_channels]
            raymaps = sampled[..., self.vae.z_channels:].astype(jnp.float32)
            decoded = self.vae.apply(
                vp, depth_lat, method=CausalVAE3D.decode
            )[pad:].astype(jnp.float32)
            depths = jnp.clip(
                (jnp.mean(decoded, axis=-1) + 1.0) / 2.0, 1e-3, None)
            pts_cam = jax.vmap(backproject_to_cv_position)(depths, intr)
            normals_gl = surface_normals_from_points(pts_cam) * jnp.asarray(
                [1.0, -1.0, -1.0])
            if tdt is not None:
                normals_gl = normals_gl.astype(tdt)
            return depths, normals_gl, raymaps, pts_cam

        def _stage_world(pts_cam, rot, trans):
            pts_world = (
                jnp.einsum("nij,nhwj->nhwi", rot, pts_cam)
                + trans[:, None, None, :]
            )
            return pts_world.astype(tdt) if tdt is not None else pts_world

        self._stage_main = jax.jit(_stage_main)
        self._stage_world = jax.jit(_stage_world)

    # rectified flow: x_t = (1-t) x0 + t eps, v = eps - x0; Euler t: 1 → 0
    def _flow_sample(self, params, cond_lat, noise, steps: int):
        def body(i, x):
            t = 1.0 - i.astype(jnp.float32) / steps
            v = self.dit.apply(
                params, jnp.concatenate([cond_lat, x], axis=-1), t)
            # keep the carry dtype: the DiT's f32 positional tables promote
            # its output even under bf16 params/noise
            return x - (1.0 / steps) * v.astype(x.dtype)

        return jax.lax.fori_loop(0, steps, body, noise)

    def forward(self, data: Dict[str, Any]) -> Dict[str, Any]:
        raw = self._adapter.raw_clip(data)
        t = raw.shape[0]
        ct, cs = self.vae.ct, self.vae.cs
        pad = (-t) % ct
        intr = np.stack(np.asarray(data["intrinsics"])).astype(np.float32)

        depths, normals_gl, raymaps, pts_cam = self._stage_main(
            self.vae_params, self.dit_params, jnp.asarray(raw),
            jnp.asarray(intr))

        # pose recovery stays on host: raymaps are tiny (~0.3 MB) and the
        # f64 numpy path is oracle-pinned (test_aether_composed_oracle)
        tl = raymaps.shape[0]
        scale = np.diag([1.0 / cs, 1.0 / cs, 1.0])
        intr_lat = scale @ intr[0]  # raymap grid intrinsics (shared)
        raymaps_np = np.asarray(raymaps)
        key_poses = np.stack(
            [pose_from_raymap(raymaps_np[i], intr_lat) for i in range(tl)])
        key_times = latent_key_times(tl, ct, pad, t)
        poses = interpolate_poses(np.asarray(key_poses), key_times,
                                  np.arange(t))
        # frame 0 = world (dataset/Readme.md:22-33)
        poses = np.linalg.inv(poses[0])[None] @ poses

        pts_world = self._stage_world(
            pts_cam, jnp.asarray(poses[:, :3, :3].astype(np.float32)),
            jnp.asarray(poses[:, :3, 3].astype(np.float32)))
        out = self._adapter.fetch_outputs({
            "pred_depths": depths,
            "pred_normals": normals_gl,
            "pred_world_pts": pts_world,
        })
        out["pred_poses"] = poses.astype(np.float32)
        return out


def tiny_aether(height: int = 64, width: int = 64, frames: int = 8,
                num_steps: int = 2) -> Aether:
    """Test/dryrun-scale Aether (spatial 8x, temporal 2x compression)."""
    return Aether(
        network_config=dict(width=32, depth=2, num_heads=2, patch=2,
                            mlp_ratio=2),
        vae_config=dict(base_width=8, mults=(1, 1, 2),
                        temporal_down=(False, True, False), z_channels=4),
        num_steps=num_steps,
        init_height=height,
        init_width=width,
        init_frames=frames,
    )
