"""Composed-pipeline torch oracle for the Aether stack.

The same instrument the SVD stack got for VERDICT r1 item 1
(tests/test_torch_parity.py pins VAE-encode → 5-step Euler → decode →
postproc end-to-end) applied to the second flagship: an independent torch
reimplementation of the FULL Aether adapter compute path —

    causal 3D VAE encode → rectified-flow Euler loop over the adaLN-zero
    DiT → causal VAE decode → the adapter's depth / raymap→pose recipes —

run with transplanted weights and SHARED noise against
models/aether.Aether.forward.  Primitive-level parity lives in
test_aether_parity.py; THIS test fails if any composed glue diverges:
the temporal left-pad of the clip, the [cond | x] latent concat order,
the t = 1 - i/N schedule, the Euler update sign/step, the moment split
(mean half), the (x+1)/2 channel-mean depth recipe, the pad crop, or the
raymap-keyframe pose interpolation.

Torch modules here are written from the CogVideoX/DiT recipes the module
docstring cites (models/aether.py:1-40), not from the flax code.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from test_aether_parity import TAetherDiT, assert_close
from unigeo_tpu.models.aether import (
    interpolate_poses,
    latent_key_times,
    pose_from_raymap,
    tiny_aether,
)

torch.manual_seed(0)


def t3(x) -> torch.Tensor:
    return torch.from_numpy(np.array(x, copy=True))


def _groups(c: int) -> int:
    g = min(32, c)
    while c % g:
        g -= 1
    return g


class TCausalConv3d(tnn.Module):
    """torch Conv3d with SAME spatial zero-pad and past-only replicate
    temporal pad of kt - st (the block-causal form)."""

    def __init__(self, tree, strides=(1, 1, 1)):
        super().__init__()
        k = np.asarray(tree["conv"]["kernel"])  # [kt, kh, kw, cin, cout]
        kt, kh, kw, cin, cout = k.shape
        self.kt, self.kh, self.kw = kt, kh, kw
        self.st = strides[0]
        self.conv = tnn.Conv3d(cin, cout, (kt, kh, kw), stride=strides)
        self.conv.weight.data = t3(k).permute(4, 3, 0, 1, 2).contiguous()
        self.conv.bias.data = t3(tree["conv"]["bias"])

    def forward(self, x):  # [T, H, W, C]
        xt = x.permute(3, 0, 1, 2)[None]  # [1, C, T, H, W]
        xt = F.pad(
            xt, (self.kw // 2, self.kw // 2, self.kh // 2, self.kh // 2, 0, 0)
        )
        if self.kt - self.st > 0:
            xt = F.pad(
                xt, (0, 0, 0, 0, self.kt - self.st, 0), mode="replicate"
            )
        return self.conv(xt)[0].permute(1, 2, 3, 0)


class TGroupNorm(tnn.Module):
    """Per-frame GroupNorm over (H, W, channel-group) — the leading time
    axis is the batch axis, matching flax GroupNorm on [T, H, W, C]."""

    def __init__(self, tree):
        super().__init__()
        self.w = t3(tree["GroupNorm_0"]["scale"])
        self.b = t3(tree["GroupNorm_0"]["bias"])

    def forward(self, x):  # [T, H, W, C]
        xt = x.permute(0, 3, 1, 2)
        out = F.group_norm(xt, _groups(xt.shape[1]), self.w, self.b, eps=1e-5)
        return out.permute(0, 2, 3, 1)


class TResBlock(tnn.Module):
    def __init__(self, tree):
        super().__init__()
        self.norm1 = TGroupNorm(tree["norm1"])
        self.conv1 = TCausalConv3d(tree["conv1"])
        self.norm2 = TGroupNorm(tree["norm2"])
        self.conv2 = TCausalConv3d(tree["conv2"])
        self.skip = None
        if "skip" in tree:
            cin, cout = np.asarray(tree["skip"]["kernel"]).shape
            self.skip = tnn.Linear(cin, cout)
            self.skip.weight.data = t3(tree["skip"]["kernel"]).T.contiguous()
            self.skip.bias.data = t3(tree["skip"]["bias"])

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.skip is not None:
            x = self.skip(x)
        return x + h


class TVAEEncoder3D(tnn.Module):
    def __init__(self, tree, temporal_down, z_channels):
        super().__init__()
        self.z = z_channels
        self.stem = TCausalConv3d(tree["stem"])
        self.stages = tnn.ModuleList()
        for i, td in enumerate(temporal_down):
            self.stages.append(TResBlock(tree[f"enc_res{i}"]))
            self.stages.append(
                TCausalConv3d(
                    tree[f"enc_down{i}"], strides=(2 if td else 1, 2, 2)
                )
            )
        self.mid = TResBlock(tree["enc_mid"])
        self.norm = TGroupNorm(tree["enc_norm"])
        self.out = TCausalConv3d(tree["enc_out"])

    def forward(self, frames):
        x = self.stem(frames)
        for m in self.stages:
            x = m(x)
        x = self.mid(x)
        moments = self.out(F.silu(self.norm(x)))
        return moments[..., : self.z]  # posterior mode = mean half


class TVAEDecoder3D(tnn.Module):
    def __init__(self, tree, temporal_down):
        super().__init__()
        self.temporal_down = list(temporal_down)
        self.dec_in = TCausalConv3d(tree["dec_in"])
        self.mid = TResBlock(tree["dec_mid"])
        self.ups = tnn.ModuleDict()
        for i in range(len(temporal_down)):
            self.ups[f"up{i}"] = TCausalConv3d(tree[f"dec_up{i}"])
            self.ups[f"res{i}"] = TResBlock(tree[f"dec_res{i}"])
        self.norm = TGroupNorm(tree["dec_norm"])
        self.out = TCausalConv3d(tree["dec_out"])

    def forward(self, z):
        x = self.mid(self.dec_in(z))
        for i in reversed(range(len(self.temporal_down))):
            if self.temporal_down[i]:
                # causal temporal nearest: frames 2k, 2k+1 from latent k
                x = x.repeat_interleave(2, dim=0)
            xt = x.permute(0, 3, 1, 2)
            xt = F.interpolate(xt, scale_factor=2, mode="nearest")
            x = xt.permute(0, 2, 3, 1)
            x = self.ups[f"res{i}"](self.ups[f"up{i}"](x))
        return self.out(F.silu(self.norm(x)))


def _set_linear(lin: tnn.Linear, tree):
    lin.weight.data = t3(tree["kernel"]).T.contiguous()
    if "bias" in tree and lin.bias is not None:
        lin.bias.data = t3(tree["bias"])


def _build_torch_dit(dit_params, cin, cout, width, depth, heads, mlp_ratio):
    tm = TAetherDiT(cin, cout, width, depth, heads, mlp_ratio)
    dp = dit_params["params"]
    tm.patchify.weight.data = (
        t3(dp["patchify"]["kernel"]).permute(3, 2, 0, 1).contiguous()
    )
    tm.patchify.bias.data = t3(dp["patchify"]["bias"])
    _set_linear(tm.t1, dp["t_embed1"])
    _set_linear(tm.t2, dp["t_embed2"])
    stacked = dp["stack"]["blocks"]["block"]

    def at(tree, i):
        return jax.tree.map(lambda leaf: leaf[i], tree)

    for i, blk in enumerate(tm.blocks):
        _set_linear(blk.adaLN, at(stacked["adaLN_modulation"], i))
        _set_linear(blk.to_q, at(stacked["attn"]["to_q"], i))
        _set_linear(blk.to_k, at(stacked["attn"]["to_k"], i))
        _set_linear(blk.to_v, at(stacked["attn"]["to_v"], i))
        _set_linear(blk.to_out, at(stacked["attn"]["to_out"], i))
        _set_linear(blk.fc1, at(stacked["mlp"]["fc1"], i))
        _set_linear(blk.fc2, at(stacked["mlp"]["fc2"], i))
    _set_linear(tm.final_mod, dp["final_modulation"])
    _set_linear(tm.final_proj, dp["final_proj"])
    return tm


def _randomize_zero_leaves(params, seed):
    """adaLN-zero init makes the DiT the identity; give every zero leaf
    (gates, final proj, biases) live values so the composed program
    actually transforms — both sides share the same tree."""
    rng = np.random.RandomState(seed)
    return jax.tree.map(
        lambda leaf: (
            leaf
            if float(jnp.std(leaf)) > 0
            else jnp.asarray(rng.normal(0, 0.2, leaf.shape).astype(np.float32))
        ),
        params,
    )


@pytest.mark.slow
def test_aether_adapter_matches_composed_torch_oracle():
    t_frames, h, w = 5, 32, 32  # 5 frames → ct=2 pad of 1 exercised
    model = tiny_aether(height=h, width=w, frames=4, num_steps=3)
    model.dit_params = _randomize_zero_leaves(model.dit_params, seed=3)
    model.vae_params = _randomize_zero_leaves(model.vae_params, seed=4)

    rng = np.random.RandomState(5)
    # smooth-ish RGB so depth decode is not pure noise
    images = rng.uniform(0, 255, size=(t_frames, 3, h, w)).astype(np.float32)
    intr = np.array(
        [[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]], np.float32
    )
    data = {
        "images": [images[i] for i in range(t_frames)],
        "intrinsics": [intr] * t_frames,
    }
    out = model.forward(data)

    # ---- torch oracle --------------------------------------------------
    vp = model.vae_params["params"]
    vae_cfg = model.vae
    enc = TVAEEncoder3D(
        vp["encoder"], vae_cfg.temporal_down, vae_cfg.z_channels
    )
    dec = TVAEDecoder3D(vp["decoder"], vae_cfg.temporal_down)
    zc = vae_cfg.z_channels
    tdit = _build_torch_dit(
        model.dit_params,
        cin=zc + model.target_channels,
        cout=model.target_channels,
        width=32,
        depth=2,
        heads=2,
        mlp_ratio=2,
    )

    frames = np.moveaxis(images, 1, -1) / 255.0 * 2.0 - 1.0  # [T,H,W,3]
    ct = vae_cfg.ct
    pad = (-t_frames) % ct
    assert pad == 1, "fixture must exercise the temporal left-pad"
    inp = np.concatenate([np.repeat(frames[:1], pad, axis=0), frames], 0)

    with torch.no_grad():
        cond = enc(t3(inp.astype(np.float32)))
        tl = cond.shape[0]
        # the adapter's own noise stream, shared
        noise = np.asarray(
            jax.random.normal(
                jax.random.PRNGKey(model.seed),
                (tl, h // vae_cfg.cs, w // vae_cfg.cs, model.target_channels),
                jnp.float32,
            )
        )
        x = t3(noise)
        steps = model.num_steps
        for i in range(steps):
            t = 1.0 - i / steps
            v = tdit(torch.cat([cond, x], dim=-1), torch.tensor([t]))
            x = x - v / steps
        depth_lat, raymaps = x[..., :zc], x[..., zc:]
        decoded = dec(depth_lat)[pad:]
    depths = np.clip((decoded.numpy().mean(-1) + 1.0) / 2.0, 1e-3, None)

    assert_close(out["pred_depths"], torch.from_numpy(depths), 5e-4,
                 "composed depths")

    # raymap → pose chain through the SHARED numpy recovery (if the
    # sampled raymap channels drift, the poses drift)
    scale = np.diag([1.0 / vae_cfg.cs, 1.0 / vae_cfg.cs, 1.0])
    intr_lat = scale @ intr
    rm = raymaps.numpy()
    key_poses = np.stack(
        [pose_from_raymap(rm[i], intr_lat) for i in range(tl)]
    )
    key_times = latent_key_times(tl, ct, pad, t_frames)
    poses = interpolate_poses(key_poses, key_times, np.arange(t_frames))
    poses = np.linalg.inv(poses[0])[None] @ poses
    np.testing.assert_allclose(
        out["pred_poses"], poses.astype(np.float32), atol=2e-4,
        err_msg="composed raymap→pose chain drifted",
    )
