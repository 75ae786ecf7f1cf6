"""Tests for the native SVD/DepthCrafter stack (tiny configs on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unigeo_tpu.models.depthcrafter.scheduler import (
    EulerDiscreteConfig,
    EulerDiscreteScheduler,
)
from unigeo_tpu.models.depthcrafter.unet import UNetSpatioTemporal, tiny_unet_config
from unigeo_tpu.models.depthcrafter.vae import AutoencoderKLTemporal, tiny_vae_config


def test_scheduler_sigmas_svd_karras():
    """Default config = SVD checkpoint scheduler_config.json: Karras sigmas
    in [0.002, 700] (rho 7) with continuous c_noise timesteps."""
    sch = EulerDiscreteScheduler()
    sigmas = sch.inference_sigmas(5)
    assert sigmas.shape == (6,)
    assert (np.diff(sigmas) < 0).all()
    assert sigmas[-1] == 0.0
    # hand-computed Karras ramp (Karras et al. 2022, eq. 5)
    rho = 7.0
    ramp = np.linspace(0, 1, 5)
    expect = (
        700.0 ** (1 / rho) + ramp * (0.002 ** (1 / rho) - 700.0 ** (1 / rho))
    ) ** rho
    assert np.allclose(sigmas[:-1], expect, rtol=1e-5)
    # continuous timestep conditioning: 0.25·ln(sigma)
    ts = sch.timesteps_for_sigmas(sigmas[:-1])
    assert np.allclose(ts, 0.25 * np.log(expect), rtol=1e-4)


def test_scheduler_sigmas_legacy_discrete():
    """use_karras_sigmas=False reproduces plain SD-style beta-derived sigmas:
    'leading' spacing tops out at timestep 801 → sigma ≈ 5.1; 'linspace'
    reaches sigma_max ≈ 14.6 at t=999."""
    legacy = EulerDiscreteConfig(
        use_karras_sigmas=False, sigma_min=None, sigma_max=None,
        timestep_type="discrete",
    )
    sch = EulerDiscreteScheduler(legacy)
    sigmas = sch.inference_sigmas(5)
    assert (np.diff(sigmas) < 0).all()
    assert sigmas[-1] == 0.0
    assert 1.0 < sigmas[0] < 20
    sch_ls = EulerDiscreteScheduler(
        EulerDiscreteConfig(
            use_karras_sigmas=False, sigma_min=None, sigma_max=None,
            timestep_type="discrete", timestep_spacing="linspace",
        )
    )
    assert 10 < sch_ls.inference_sigmas(5)[0] < 20
    # discrete timesteps invert the train-sigma table
    ts = sch.timesteps_for_sigmas(sigmas[:-1])
    assert (ts >= 0).all() and (ts <= 999).all()


def test_scheduler_v_prediction_roundtrip():
    """denoised_from_v(add_noise(x0), v_target) == x0 exactly."""
    sch = EulerDiscreteScheduler()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(4, 8, 8, 4)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=x0.shape), jnp.float32)
    sigma = jnp.float32(2.5)
    x = sch.add_noise(x0, noise, sigma)
    v = sch.v_target(x0, noise, sigma)
    rec = sch.denoised_from_v(x, v, sigma)
    assert np.allclose(np.asarray(rec), np.asarray(x0), atol=1e-4)


def test_scheduler_euler_step_converges_one_step():
    """With a perfect denoiser, stepping to sigma=0 returns the clean data."""
    sch = EulerDiscreteScheduler()
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(2, 4, 4, 4)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=x0.shape), jnp.float32)
    sigma = jnp.float32(10.0)
    x = sch.add_noise(x0, noise, sigma)
    stepped = sch.euler_step(x, x0, sigma, jnp.float32(0.0))
    assert np.allclose(np.asarray(stepped), np.asarray(x0), atol=1e-5)


@pytest.fixture(scope="module")
def unet_and_params():
    unet = UNetSpatioTemporal(**tiny_unet_config())
    t, h, w = 4, 32, 32
    sample = jnp.zeros((t, h, w, 8))
    ctx = jnp.zeros((t, 1, 32))
    params = unet.init(
        jax.random.PRNGKey(0), sample, jnp.zeros((1,)), ctx, jnp.zeros((1, 3)), t
    )
    return unet, params


def test_unet_shapes_and_determinism(unet_and_params):
    unet, params = unet_and_params
    rng = np.random.default_rng(0)
    t, h, w = 4, 32, 32
    x = jnp.asarray(rng.normal(size=(t, h, w, 8)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(t, 1, 32)), jnp.float32)
    out1 = unet.apply(params, x, jnp.ones((1,)) * 500, ctx, jnp.ones((1, 3)), t)
    out2 = unet.apply(params, x, jnp.ones((1,)) * 500, ctx, jnp.ones((1, 3)), t)
    assert out1.shape == (t, h, w, 4)
    assert np.array_equal(np.asarray(out1), np.asarray(out2))
    assert np.isfinite(np.asarray(out1)).all()


def test_unet_timestep_changes_output(unet_and_params):
    unet, params = unet_and_params
    t, h, w = 4, 32, 32
    x = jnp.ones((t, h, w, 8))
    ctx = jnp.ones((t, 1, 32))
    o1 = unet.apply(params, x, jnp.zeros((1,)), ctx, jnp.ones((1, 3)), t)
    o2 = unet.apply(params, x, jnp.full((1,), 999.0), ctx, jnp.ones((1, 3)), t)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_vae_roundtrip_shapes():
    vae = AutoencoderKLTemporal(**tiny_vae_config())
    t, h, w = 3, 32, 32
    frames = jnp.zeros((t, h, w, 3))
    params = vae.init(jax.random.PRNGKey(0), frames, method=vae.encode)
    lat = vae.apply(params, frames, method=vae.encode)
    assert lat.shape == (t, h // 8, w // 8, 4)
    dec_params = vae.init(jax.random.PRNGKey(1), lat, t, method=vae.decode)
    out = vae.apply(dec_params, lat, t, method=vae.decode)
    assert out.shape == (t, h, w, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_full_pipeline_tiny():
    from unigeo_tpu.models.depthcrafter.pipeline import tiny_pipeline

    pipe = tiny_pipeline(height=64, width=64, num_frames=3)
    frames = np.random.default_rng(0).uniform(size=(3, 64, 64, 3)).astype(np.float32)
    out = pipe(frames, num_inference_steps=2)
    assert out.shape == (3, 64, 64, 3)
    assert np.isfinite(out).all()
    # deterministic given the same seed
    out2 = pipe(frames, num_inference_steps=2)
    assert np.allclose(out, out2)


def test_pipeline_windowed_stitching():
    from unigeo_tpu.models.depthcrafter.pipeline import tiny_pipeline

    pipe = tiny_pipeline(height=64, width=64, num_frames=4)
    frames = np.random.default_rng(1).uniform(size=(7, 64, 64, 3)).astype(np.float32)
    out = pipe(frames, num_inference_steps=2, window_size=4, overlap=2)
    assert out.shape == (7, 64, 64, 3)
    assert np.isfinite(out).all()


def test_depthcrafter_adapter_contract(shared_tiny_pipeline):
    """Full adapter on a synthetic clip: output keys, shapes, normal units."""
    from unigeo_tpu.data.synthetic import SyntheticBoxDataset
    from unigeo_tpu.models.depthcrafter.model import DepthCrafter

    ds = SyntheticBoxDataset(
        clip_length=3, clip_overlap=0, num_scenes=1, frames_per_scene=3,
        render_size=(64, 64),
    )
    data = ds[0]
    model = DepthCrafter(num_inference_steps=2, pipeline=shared_tiny_pipeline)
    out = model.forward(data)
    assert out["pred_depths"].shape == (3, 64, 64)
    assert out["pred_normals"].shape == (3, 64, 64, 3)
    assert (out["pred_depths"] > 0).all()
    norms = np.linalg.norm(out["pred_normals"], axis=-1)
    assert np.allclose(norms, 1.0, atol=1e-3)


def test_scheduler_config_from_json(tmp_path):
    """EulerDiscreteConfig.from_json reads diffusers scheduler_config.json
    (unknown keys ignored, missing keys keep SVD defaults)."""
    import json

    from unigeo_tpu.models.depthcrafter.scheduler import EulerDiscreteConfig

    raw = {
        "_class_name": "EulerDiscreteScheduler",  # unknown → ignored
        "beta_start": 0.0001,
        "sigma_max": 500.0,
        "use_karras_sigmas": True,
        "timestep_spacing": "trailing",
    }
    p = tmp_path / "scheduler_config.json"
    p.write_text(json.dumps(raw))
    cfg = EulerDiscreteConfig.from_json(str(p))
    assert cfg.beta_start == 0.0001
    assert cfg.sigma_max == 500.0
    assert cfg.timestep_spacing == "trailing"
    assert cfg.sigma_min == 0.002  # SVD default kept
    assert EulerDiscreteConfig.from_json(raw) == cfg


def test_heun_converges_second_order():
    """On a nonlinear probe ODE the Heun update must converge ~O(h²) while
    Euler is O(h): halving the step size should cut Heun's error by ~4x."""
    import numpy as np

    from unigeo_tpu.models.depthcrafter.scheduler import EulerDiscreteScheduler

    # denoised(x, sigma) = tanh(x) * sigma  → dx/dsigma = (x - tanh(x)·sigma)/sigma
    def denoised(x, sigma):
        return np.tanh(x) * sigma

    def run(n, heun):
        sigmas = np.linspace(4.0, 1.0, n + 1)
        x = 1.3
        for i in range(n):
            s, sn = sigmas[i], sigmas[i + 1]
            d1 = (x - denoised(x, s)) / s
            if not heun:
                x = x + d1 * (sn - s)
                continue
            xp = x + d1 * (sn - s)
            d2 = (xp - denoised(xp, sn)) / sn
            x = x + 0.5 * (d1 + d2) * (sn - s)
        return x

    truth = run(4096, heun=True)
    err_e = [abs(run(n, False) - truth) for n in (16, 32)]
    err_h = [abs(run(n, True) - truth) for n in (16, 32)]
    assert err_e[0] / err_e[1] < 3.0  # ~2x: first order
    assert err_h[0] / err_h[1] > 3.2  # ~4x: second order
    assert err_h[0] < err_e[0] / 5  # and absolutely better


def test_pipeline_heun_solver_runs():
    """solver="heun" runs end-to-end on the tiny pipeline and differs from
    euler (2 UNet evals per step; same final decode shapes)."""
    import numpy as np

    from unigeo_tpu.models.depthcrafter.pipeline import tiny_pipeline

    pipe_e = tiny_pipeline(height=64, width=64, num_frames=2)
    pipe_h = tiny_pipeline(height=64, width=64, num_frames=2)
    pipe_h.solver = "heun"
    pipe_h.params = pipe_e.params
    frames = np.random.default_rng(0).uniform(size=(2, 64, 64, 3)).astype(np.float32)
    out_e = pipe_e(frames, num_inference_steps=3)
    out_h = pipe_h(frames, num_inference_steps=3)
    assert out_h.shape == out_e.shape
    assert np.isfinite(out_h).all()
    assert np.abs(out_h - out_e).max() > 1e-7


def test_batched_denoise_matches_serial(shared_tiny_pipeline):
    """run_clips_staged (B clips through ONE denoise program — the
    single-chip throughput mode) reproduces the serial per-clip staged path:
    the batch axis only widens matmul M, every norm/attention grouping is
    per clip."""
    pipe = shared_tiny_pipeline
    rng = np.random.default_rng(7)
    b, t, h, w = 3, 2, 64, 64
    frames = jnp.asarray(rng.uniform(size=(b, t, h, w, 3)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=(b, t, h // 8, w // 8, 4)), jnp.float32)
    aug = jnp.asarray(rng.normal(size=(b, t, h, w, 3)), jnp.float32)
    batched = np.asarray(
        pipe.run_clips_staged(pipe.params, frames, noise, 2, aug_noise=aug)
    )
    for i in range(b):
        serial = np.asarray(
            pipe.run_window_staged(
                pipe.params, frames[i], noise[i], 2, aug_noise=aug[i]
            )
        )
        # differently-shaped compiled programs fuse/reorder f32 reductions
        # differently; ~1e-4 is compiler noise, not a numerics bug
        assert np.abs(batched[i] - serial).max() < 5e-4


def test_batched_denoise_no_cross_clip_coupling(shared_tiny_pipeline):
    """The strongest batched-path statement: within ONE compiled batched
    program, perturbing clip 1's conditioning leaves clip 0's denoised
    latents BITWISE unchanged.  Same program → zero compiler-reordering
    noise → any difference would be genuine cross-clip state leakage
    (norm groupings or temporal attention spanning the batch axis)."""
    pipe = shared_tiny_pipeline
    rng = np.random.default_rng(11)
    b, t, h, w = 2, 2, 64, 64
    frames = jnp.asarray(rng.uniform(size=(b, t, h, w, 3)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=(b, t, h // 8, w // 8, 4)), jnp.float32)
    enc = [pipe._encode_stage(pipe.params, frames[i]) for i in range(b)]
    cond = jnp.stack([c for c, _ in enc])
    ctx = jnp.stack([c for _, c in enc])
    x_a = pipe._denoise_stage_batched(pipe.params, cond, ctx, noise, 2)
    x_b = pipe._denoise_stage_batched(
        pipe.params, cond.at[1].add(0.5), ctx, noise, 2
    )
    assert np.array_equal(np.asarray(x_a[0]), np.asarray(x_b[0]))
    assert np.abs(np.asarray(x_a[1] - x_b[1])).max() > 1e-6  # probe did bite


def test_batched_denoise_latent_parity_f32(shared_tiny_pipeline):
    """Latent-level instrument for the batched path: the B=2 denoise program
    matches the B=1 program per clip at f32 to reduction-reorder noise
    (measured 8e-5 on latents of scale ~2).  If the adapter-level parity
    test ever drifts, this localizes denoise-vs-decode immediately."""
    pipe = shared_tiny_pipeline
    rng = np.random.default_rng(13)
    b, t, h, w = 2, 2, 64, 64
    frames = jnp.asarray(rng.uniform(size=(b, t, h, w, 3)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=(b, t, h // 8, w // 8, 4)), jnp.float32)
    enc = [pipe._encode_stage(pipe.params, frames[i]) for i in range(b)]
    cond = jnp.stack([c for c, _ in enc])
    ctx = jnp.stack([c for _, c in enc])
    xb = pipe._denoise_stage_batched(pipe.params, cond, ctx, noise, 2)
    for i in range(b):
        xs = pipe._denoise_stage(pipe.params, cond[i], ctx[i], noise[i], 2)
        assert np.abs(np.asarray(xb[i] - xs)).max() < 1e-3


def test_adapter_forward_batch_single_chip(shared_tiny_pipeline, monkeypatch):
    """On ONE device forward_batch takes the batched-denoise path (not the
    SPMD executor) and matches forward per clip."""
    from unigeo_tpu.data.synthetic import SyntheticBoxDataset
    from unigeo_tpu.models.depthcrafter.model import DepthCrafter

    monkeypatch.setattr(jax, "devices", lambda *a, **k: [jax.local_devices()[0]])
    assert len(jax.devices()) == 1

    ds = SyntheticBoxDataset(
        clip_length=2, clip_overlap=0, num_scenes=2, frames_per_scene=2,
        render_size=(64, 64),
    )
    model = DepthCrafter(
        num_inference_steps=2, pipeline=shared_tiny_pipeline, clips_per_step=2
    )
    assert model.eval_batch_size == 2
    datas = [ds[0], ds[1]]
    outs = model.forward_batch(datas)
    assert len(outs) == 2
    for data, out in zip(datas, outs):
        ref = model.forward(data)
        # depth = 1/(minmax(x)+0.1) amplifies the ~1e-4 cross-program decode
        # noise by up to 100x; ~2e-3 on O(1..10) depths is compiler noise
        assert np.abs(out["pred_depths"] - ref["pred_depths"]).max() < 1e-2
        # Normals are unit vectors — the right parity statement is angular.
        # The B=1 and B=2 denoise PROGRAMS differ only by f32 reduction
        # order (test_batched_denoise_no_cross_clip_coupling proves the
        # batched path is exactly per-clip), and the 5x5 plane fit is
        # ill-conditioned at depth discontinuities, so isolated pixels can
        # swing degrees while the field is parity.  Measured on this
        # fixture: mean 0.02 deg, p99 0.35 deg, max 5.3 deg at a handful
        # of edge pixels.
        dot = np.clip((out["pred_normals"] * ref["pred_normals"]).sum(-1), -1, 1)
        ang = np.degrees(np.arccos(dot))
        assert ang.mean() < 0.2
        assert np.percentile(ang, 99) < 2.0


def test_fused_upsample_conv_exact():
    """Conv2d(fuse_upsample2x=True) == repeat-upsample + plain Conv2d with
    the SAME param tree (names, shapes, values) — checkpoints map unchanged,
    outputs match to float tolerance."""
    import jax.tree_util as jtu

    from unigeo_tpu.models.layers import Conv2d

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 7, 5, 6)), jnp.float32)

    plain = Conv2d(4)
    fused = Conv2d(4, fuse_upsample2x=True)
    p_plain = plain.init(jax.random.PRNGKey(0), x)["params"]
    p_fused = fused.init(jax.random.PRNGKey(0), x)["params"]
    # identical tree structure and leaf shapes
    assert jtu.tree_structure(p_plain) == jtu.tree_structure(p_fused)
    assert jax.tree.map(jnp.shape, p_plain) == jax.tree.map(jnp.shape, p_fused)

    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    ref = plain.apply({"params": p_plain}, up)
    out = fused.apply({"params": p_plain}, x)  # plain params drive the fused op
    assert out.shape == ref.shape == (2, 14, 10, 4)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-5


def test_forward_batch_heterogeneous_shapes_fall_back(shared_tiny_pipeline):
    """Mixed clip shapes across scenes cannot form one batch — forward_batch
    must fall back to the serial path instead of np.stack raising."""
    from unigeo_tpu.data.synthetic import SyntheticBoxDataset
    from unigeo_tpu.models.depthcrafter.model import DepthCrafter

    ds_small = SyntheticBoxDataset(
        clip_length=2, clip_overlap=0, num_scenes=1, frames_per_scene=2,
        render_size=(64, 64),
    )
    ds_big = SyntheticBoxDataset(
        clip_length=3, clip_overlap=0, num_scenes=1, frames_per_scene=3,
        render_size=(64, 64),
    )
    model = DepthCrafter(num_inference_steps=2, pipeline=shared_tiny_pipeline)
    outs = model.forward_batch([ds_small[0], ds_big[0]])
    assert outs[0]["pred_depths"].shape == (2, 64, 64)
    assert outs[1]["pred_depths"].shape == (3, 64, 64)


def test_windowed_stitching_true_crossfade(shared_tiny_pipeline, monkeypatch):
    """Seam blending is a true crossfade: inside the overlap the old window
    ramps down as the new ramps up, and the new window is at FULL weight
    immediately after the overlap (no weight discontinuity)."""
    pipe = shared_tiny_pipeline
    calls = []

    def fake_window(params, chunk, noise, steps, aug_noise=None):
        # window wi returns the constant wi in [-1,1] decode space
        wi = len(calls)
        calls.append(wi)
        return jnp.full(chunk.shape, float(wi), jnp.float32)

    monkeypatch.setattr(pipe, "run_window_staged", fake_window)
    frames = np.zeros((10, 64, 64, 3), np.float32)
    out = pipe(frames, num_inference_steps=1, window_size=4, overlap=2)
    vals = out[:, 0, 0, 0] * 2.0 - 1.0  # undo the (x+1)/2
    # windows: [0..3]=0, [2..5]=1, [4..7]=2, [6..9]=3
    # frames 0,1: only window 0 → exactly 0
    assert np.allclose(vals[:2], 0.0, atol=1e-6)
    # frame 3 is inside overlap of windows 0/1: strictly between 0 and 1
    assert 0.0 < vals[3] < 1.0
    # frames just after each overlap carry the NEW window at FULL weight
    # (the old accumulate-ramp scheme left them at a blended value)
    assert np.allclose(vals[8:], 3.0, atol=1e-6)
    # monotone along the clip (each later window has a larger constant)
    assert (np.diff(vals) >= -1e-6).all()


def test_windowed_stitching_rejects_overlap_ge_window(shared_tiny_pipeline):
    frames = np.zeros((10, 64, 64, 3), np.float32)
    with pytest.raises(ValueError, match="overlap"):
        shared_tiny_pipeline(frames, num_inference_steps=1,
                             window_size=4, overlap=4)


def test_forward_device_resident_matches_pipeline_call():
    """The whole-clip-window fast path in DepthCrafter.forward (device-
    resident decode→postproc, r4) must reproduce the generic
    pipeline.__call__ route bit-for-bit — same noise draws, same f32 math,
    only the host round trip removed."""
    import numpy as np

    from unigeo_tpu.data.synthetic import SyntheticBoxDataset
    from unigeo_tpu.models.depthcrafter.model import DepthCrafter
    from unigeo_tpu.models.depthcrafter.pipeline import tiny_pipeline

    t, h, w = 4, 64, 64
    pipe = tiny_pipeline(height=h, width=w, num_frames=t)
    model = DepthCrafter(pipeline=pipe, num_inference_steps=2,
                         init_height=h, init_width=w, init_frames=t)
    ds = SyntheticBoxDataset(clip_length=t, clip_overlap=0, num_scenes=1,
                             frames_per_scene=t, render_size=(h, w))
    data = ds[0]

    fast = model.forward(data)

    frames = model.prepare_input(data)
    decoded = pipe(frames, num_inference_steps=2, window_size=t,
                   overlap=model.overlap, seed=model.seed)
    slow = model._finalize(decoded, data)

    np.testing.assert_array_equal(fast["pred_depths"], slow["pred_depths"])
    np.testing.assert_array_equal(fast["pred_normals"], slow["pred_normals"])
