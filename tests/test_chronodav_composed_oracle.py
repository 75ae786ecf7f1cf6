"""Composed-pipeline torch oracles for ChronoDepth and DepthAnyVideo.

VERDICT r4 #4: the shared SVD stack is oracle-pinned by
tests/test_torch_parity.py, but these two adapters' DISTINGUISHING logic —
ChronoDepth's sequential windows with known-frame latent clamping at every
denoise step, and DepthAnyVideo's keyframe + clamped-interpolation
hierarchy — had no composed torch twin.  Here the full adapter drivers are
re-implemented in torch/numpy from the method recipes (window scheduling,
re-noising clamp `known + σ·noise`, keyframe selection), run with
transplanted tiny weights and the adapters' exact PRNG noise streams, and
compared end to end against the shipped forward().

The torch SVD primitives (TUNet/TVae/CLIP, weight grafting, euler sigmas)
are imported from test_torch_parity — the oracles here add only the
driver-level glue under test.
"""

import math

import numpy as np
import torch

import jax
import jax.numpy as jnp

from test_torch_parity import (
    _build_matched_pipelines,
    _diffusers_euler_sigmas,
)

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# torch driver primitives (written from the recipes, not from the flax code)
# ---------------------------------------------------------------------------


def _torch_encode(tclip, tvae, frames01):
    """frames01 [T,H,W,3] → (context [T,1,D], cond latents [T,4,h,w]).
    No noise augmentation (ChronoDepth/DAV call the encode stage with
    aug=None)."""
    t_frames = torch.from_numpy(np.moveaxis(frames01, -1, 1))
    with torch.no_grad():
        mean = torch.tensor([0.48145466, 0.4578275, 0.40821073]).view(1, 3, 1, 1)
        std = torch.tensor([0.26862954, 0.26130258, 0.27577711]).view(1, 3, 1, 1)
        context = tclip((t_frames - mean) / std).image_embeds[:, None, :]
        cond = tvae.encode_mode(t_frames * 2.0 - 1.0)  # unscaled, SVD semantics
    return context, cond


def _torch_denoise_known(tunet, cond, context, noise, known, mask_t, steps,
                         noise_aug_strength=0.02):
    """EDM/Euler v-prediction loop where mask_t==1 frames are re-anchored to
    ``known`` re-noised to the current sigma before EVERY UNet evaluation,
    and exactly equal ``known`` after the final step (σ=0).

    noise/known numpy [T,h,w,4] NHWC; returns numpy [T,h,w,4] NHWC.
    """
    T = noise.shape[0]
    sigmas = _diffusers_euler_sigmas(steps)
    n = torch.from_numpy(np.moveaxis(noise, -1, 1))
    k = torch.from_numpy(np.moveaxis(known, -1, 1))
    m = torch.from_numpy(mask_t.astype(np.float32)).view(-1, 1, 1, 1)
    added = torch.tensor([[6.0, 127.0, noise_aug_strength]])

    with torch.no_grad():
        x = n * math.sqrt(float(sigmas[0]) ** 2 + 1.0)
        for i in range(steps):
            s, s_next = float(sigmas[i]), float(sigmas[i + 1])
            x = torch.where(m > 0, k + s * n, x)
            x_in = x / math.sqrt(s**2 + 1.0)
            unet_in = torch.cat([x_in, cond], dim=1)
            ts = torch.tensor([0.25 * math.log(s)], dtype=torch.float32)
            v = tunet(unet_in, ts, context, added, T)
            c_out = -s / math.sqrt(s**2 + 1.0)
            c_skip = 1.0 / (s**2 + 1.0)
            denoised = v * c_out + x * c_skip
            x = x + (x - denoised) / s * (s_next - s)
        x = torch.where(m > 0, k, x)
    return np.moveaxis(x.numpy(), 1, -1)


def _torch_decode01(tvae, lat, scaling_factor=0.18215):
    """latents [T,h,w,4] NHWC → decoded01 [T,H,W,3] NHWC."""
    T = lat.shape[0]
    with torch.no_grad():
        x = torch.from_numpy(np.moveaxis(lat, -1, 1))
        dec = tvae.decoder(x / scaling_factor, T)
    return np.moveaxis((dec.numpy() + 1.0) / 2.0, 1, -1)


def _affine_depth(decoded01):
    """The direct affine-invariant depth recipe both adapters share
    (chronodepth._postprocess): clamp(channel-mean, 1e-3)."""
    return np.clip(decoded01.mean(axis=-1), 1e-3, None)


def _data(t, h, w, seed=11):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 256, size=(t, 3, h, w)).astype(np.float32)
    intr = np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]], np.float32)
    return images, {"images": images, "intrinsics": np.stack([intr] * t)}


# ---------------------------------------------------------------------------
# ChronoDepth: sequential windows + known-frame clamp
# ---------------------------------------------------------------------------


def test_chronodepth_adapter_matches_torch_oracle():
    from unigeo_tpu.models.chronodepth import ChronoDepth

    (tunet, tvae, tclip), pipe, (t, h, w) = _build_matched_pipelines()
    seed, steps, win, ov = 9, 5, 3, 1
    model = ChronoDepth(_pipeline=pipe, num_inference_steps=steps,
                        window_size=win, overlap=ov, seed=seed)
    images, data = _data(t, h, w)
    out = model.forward(data)

    # --- torch twin of the window driver, SAME noise streams -----------
    frames01 = np.moveaxis(images, 1, -1) / 255.0
    rng = jax.random.PRNGKey(seed)
    lat_acc = np.zeros((t, h // 8, w // 8, 4), np.float32)
    prev_end = 0
    stride = win - ov
    starts = list(range(0, max(t - ov, 1), stride))
    for wi, start in enumerate(starts):
        end = min(start + win, t)
        start = end - win  # full windows only, like the adapter
        context, cond = _torch_encode(tclip, tvae, frames01[start:end])
        noise = np.asarray(jax.random.normal(
            jax.random.fold_in(rng, wi), (win, h // 8, w // 8, 4),
            jnp.float32))
        n_known = max(prev_end - start, 0) if wi > 0 else 0
        mask = (np.arange(win) < n_known).astype(np.float32)
        known = lat_acc[start:start + win]
        lat_acc[start:end] = _torch_denoise_known(
            tunet, cond, context, noise, known, mask, steps)
        prev_end = end

    depth_ref = _affine_depth(_torch_decode01(tvae, lat_acc))
    rel = np.abs(out["pred_depths"] - depth_ref).max() / depth_ref.max()
    # Bound calibration (measured): a SINGLE window with identical inputs
    # already differs by ~4.5e-3 in latent max|Δ| — the shared-stack
    # composed-f32 drift test_torch_parity pins — and window 2's trajectory
    # re-enters through the clamped latents, amplifying to ~2.5e-2 latent /
    # ~5e-3 depth.  Per-frame error grows monotonically with window depth
    # (accumulation signature); a glue bug (wrong mask, wrong noise stream,
    # wrong window schedule) produces O(1) deviation.
    assert rel < 2e-2, f"chronodepth composed rel dev {rel:.2e}"

    # more than one window must actually have run (else the clamp logic
    # under test never engaged)
    assert len(starts) > 1


# ---------------------------------------------------------------------------
# DepthAnyVideo: keyframe phase + clamped interpolation phase
# ---------------------------------------------------------------------------


def test_depthanyvideo_adapter_matches_torch_oracle():
    from unigeo_tpu.models.depthanyvideo import DepthAnyVideo

    (tunet, tvae, tclip), pipe, (t, h, w) = _build_matched_pipelines()
    seed, steps, gap = 21, 4, 2
    model = DepthAnyVideo(_pipeline=pipe, num_inference_steps=steps,
                          keyframe_gap=gap, seed=seed)
    images, data = _data(t, h, w, seed=13)
    out = model.forward(data)

    frames01 = np.moveaxis(images, 1, -1) / 255.0
    rng = jax.random.PRNGKey(seed)
    key_idx = model.keyframe_indices(t)
    assert 1 < len(key_idx) < t  # the hierarchy must actually engage

    # phase 1: plain denoise of the keyframes (zero mask ⇒ no clamping)
    ctx_k, cond_k = _torch_encode(tclip, tvae, frames01[key_idx])
    noise_k = np.asarray(jax.random.normal(
        jax.random.fold_in(rng, 0),
        (len(key_idx), h // 8, w // 8, 4), jnp.float32))
    lat_k = _torch_denoise_known(
        tunet, cond_k, ctx_k, noise_k,
        np.zeros_like(noise_k), np.zeros(len(key_idx)), steps)

    # phase 2: full clip, keyframes clamped to their phase-1 latents
    ctx_f, cond_f = _torch_encode(tclip, tvae, frames01)
    noise_f = np.asarray(jax.random.normal(
        jax.random.fold_in(rng, 1), (t, h // 8, w // 8, 4), jnp.float32))
    known = np.zeros((t, h // 8, w // 8, 4), np.float32)
    known[key_idx] = lat_k
    mask = np.zeros((t,), np.float32)
    mask[key_idx] = 1.0
    lat = _torch_denoise_known(tunet, cond_f, ctx_f, noise_f, known, mask,
                               steps)

    depth_ref = _affine_depth(_torch_decode01(tvae, lat))
    rel = np.abs(out["pred_depths"] - depth_ref).max() / depth_ref.max()
    assert rel < 1e-3, f"depthanyvideo composed rel dev {rel:.2e}"


def test_depthanyvideo_keyframes_pin_phase1_latents():
    """Hierarchy contract at the LATENT level: the phase-2 output AT the
    keyframe slots equals the phase-1 keyframe latents bit-for-bit (σ=0
    clamp) — interpolated frames may differ, anchors may not."""
    from unigeo_tpu.models.depthanyvideo import DepthAnyVideo

    (_, _, _), pipe, (t, h, w) = _build_matched_pipelines()
    model = DepthAnyVideo(_pipeline=pipe, num_inference_steps=3,
                          keyframe_gap=3, seed=2)
    images, _ = _data(t, h, w, seed=17)
    frames01 = np.moveaxis(images, 1, -1) / 255.0
    rng = jax.random.PRNGKey(2)
    key_idx = model.keyframe_indices(t)

    kf = jnp.asarray(frames01[key_idx])
    cond_k, ctx_k = pipe._encode_stage(pipe.params, kf, None)
    noise_k = jax.random.normal(
        jax.random.fold_in(rng, 0),
        (len(key_idx), h // 8, w // 8, 4), jnp.float32)
    lat_k = pipe._denoise_stage(pipe.params, cond_k, ctx_k, noise_k, 3)

    cond, ctx = pipe._encode_stage(pipe.params, jnp.asarray(frames01), None)
    noise = jax.random.normal(
        jax.random.fold_in(rng, 1), (t, h // 8, w // 8, 4), jnp.float32)
    known = jnp.zeros((t, h // 8, w // 8, 4), jnp.float32)
    known = known.at[jnp.asarray(key_idx)].set(lat_k)
    mask = np.zeros((t,), np.float32)
    mask[key_idx] = 1.0
    lat = pipe._denoise_stage_known(
        pipe.params, cond, ctx, noise, known, jnp.asarray(mask), 3)

    np.testing.assert_array_equal(
        np.asarray(lat)[key_idx], np.asarray(lat_k))
    # and the interpolated frames are genuinely computed, not copied
    mid = [i for i in range(t) if i not in set(key_idx.tolist())]
    assert mid and not np.allclose(np.asarray(lat)[mid], 0.0)
