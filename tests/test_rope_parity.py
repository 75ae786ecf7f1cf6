"""Torch-golden parity for the RoPE100 pointmap backbone mode.

Builds a miniature CroCo/DUSt3R-style torch network (fused-qkv attention
with 2D RoPE, decoder blocks with cross-attention, norm_y memory norm, the
CroCo norm1/norm2/norm3 ordering) with real checkpoint key names, converts
its state dict via utils/convert_dust3r.convert_backbone, and asserts the
JAX PointmapEncoder/PointmapDecoder reproduce the torch forward outputs.

The torch modules are an independent oracle written from the public CroCo
formulas (rotate-half RoPE per y/x half, base freq 100), mirroring what the
external networks the reference wraps compute (reference:
model/spann3r.py:16-21, model/cut3r.py:18-26).
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from unigeo_tpu.models.pointmap.network import (  # noqa: E402
    PointmapDecoder,
    PointmapEncoder,
)
from unigeo_tpu.ops.rope import apply_rope_2d, grid_positions, rope_2d_cos_sin  # noqa: E402
from unigeo_tpu.utils.convert_dust3r import convert_backbone  # noqa: E402
from unigeo_tpu.utils.checkpoint import graft_flat_params  # noqa: E402

WIDTH, DEC_WIDTH, HEADS, DEPTH, PATCH = 32, 24, 2, 2, 8
FREQ = 100.0


# ---------------------------------------------------------------------------
# torch oracle
# ---------------------------------------------------------------------------

def rope2d_torch(t, pos, freq=FREQ):
    """t [B, H, N, D]; pos [N, 2] int (y, x); rows with y < 0 unrotated."""
    D = t.shape[-1]
    dh = D // 2
    inv = 1.0 / freq ** (torch.arange(0, dh, 2).float() / dh)

    def rot1d(u, p):
        f = p.float()[:, None] * inv
        f = torch.cat([f, f], dim=-1)  # [N, dh]
        cos, sin = f.cos(), f.sin()
        valid = (p >= 0).float()[:, None]
        cos = torch.where(valid > 0, cos, torch.ones_like(cos))
        sin = sin * valid
        u1, u2 = u[..., : dh // 2], u[..., dh // 2 :]
        ru = torch.cat([-u2, u1], dim=-1)
        return u * cos + ru * sin

    y = rot1d(t[..., :dh], pos[:, 0])
    x = rot1d(t[..., dh:], pos[:, 1])
    return torch.cat([y, x], dim=-1)


class TorchSelfAttn(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.qkv = tnn.Linear(dim, dim * 3, bias=True)
        self.proj = tnn.Linear(dim, dim)
        self.heads = heads

    def forward(self, x, pos):
        B, N, C = x.shape
        hd = C // self.heads
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = rope2d_torch(q, pos)
        k = rope2d_torch(k, pos)
        a = torch.softmax(q @ k.transpose(-2, -1) * hd**-0.5, dim=-1) @ v
        return self.proj(a.transpose(1, 2).reshape(B, N, C))


class TorchCrossAttn(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.projq = tnn.Linear(dim, dim, bias=True)
        self.projk = tnn.Linear(dim, dim, bias=True)
        self.projv = tnn.Linear(dim, dim, bias=True)
        self.proj = tnn.Linear(dim, dim)
        self.heads = heads

    def forward(self, x, ctx, pos, ctx_pos):
        B, N, C = x.shape
        M = ctx.shape[1]
        hd = C // self.heads

        def split(t, n):
            return t.reshape(B, n, self.heads, hd).permute(0, 2, 1, 3)

        q = rope2d_torch(split(self.projq(x), N), pos)
        k = rope2d_torch(split(self.projk(ctx), M), ctx_pos)
        v = split(self.projv(ctx), M)
        a = torch.softmax(q @ k.transpose(-2, -1) * hd**-0.5, dim=-1) @ v
        return self.proj(a.permute(0, 2, 1, 3).reshape(B, N, C))


class TorchMlp(tnn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.fc1 = tnn.Linear(dim, dim * mult)
        self.fc2 = tnn.Linear(dim * mult, dim)

    def forward(self, x):
        return self.fc2(torch.nn.functional.gelu(self.fc1(x)))


class TorchEncBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = TorchSelfAttn(dim, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = TorchMlp(dim)

    def forward(self, x, pos):
        x = x + self.attn(self.norm1(x), pos)
        return x + self.mlp(self.norm2(x))


class TorchDecBlock(tnn.Module):
    """CroCo ordering: norm1→self-attn, norm_y on memory, norm2→cross-attn,
    norm3→mlp."""

    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = TorchSelfAttn(dim, heads)
        self.cross_attn = TorchCrossAttn(dim, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.norm3 = tnn.LayerNorm(dim)
        self.norm_y = tnn.LayerNorm(dim)
        self.mlp = TorchMlp(dim)

    def forward(self, x, ctx, pos, ctx_pos):
        x = x + self.attn(self.norm1(x), pos)
        x = x + self.cross_attn(self.norm2(x), self.norm_y(ctx), pos, ctx_pos)
        return x + self.mlp(self.norm3(x))


class TorchPatchEmbed(tnn.Module):
    def __init__(self, dim, patch):
        super().__init__()
        self.proj = tnn.Conv2d(3, dim, kernel_size=patch, stride=patch)


class TorchBackbone(tnn.Module):
    def __init__(self):
        super().__init__()
        self.patch_embed = TorchPatchEmbed(WIDTH, PATCH)
        self.enc_blocks = tnn.ModuleList(
            [TorchEncBlock(WIDTH, HEADS) for _ in range(DEPTH)]
        )
        self.enc_norm = tnn.LayerNorm(WIDTH)
        self.decoder_embed = tnn.Linear(WIDTH, DEC_WIDTH)
        self.dec_blocks = tnn.ModuleList(
            [TorchDecBlock(DEC_WIDTH, HEADS) for _ in range(DEPTH)]
        )
        self.dec_norm = tnn.LayerNorm(DEC_WIDTH)

    def encode(self, images_nchw, pos):
        h = self.patch_embed.proj(images_nchw)  # [B, C, gh, gw]
        B, C, gh, gw = h.shape
        h = h.reshape(B, C, gh * gw).transpose(1, 2)
        for blk in self.enc_blocks:
            h = blk(h, pos)
        return self.enc_norm(h)

    def decode(self, tokens, ctx, pos, ctx_pos):
        h = self.decoder_embed(tokens)
        for blk in self.dec_blocks:
            h = blk(h, ctx, pos, ctx_pos)
        return self.dec_norm(h)


# ---------------------------------------------------------------------------


def test_rope_cos_sin_matches_torch(rng):
    pos = np.stack(
        [rng.integers(-1, 7, size=12), rng.integers(0, 9, size=12)], axis=-1
    ).astype(np.int32)
    # torch side rotates an identity pair-basis to expose cos/sin directly
    t = torch.ones(1, 1, 12, 16)
    rotated = rope2d_torch(t, torch.from_numpy(pos))
    cos, sin = rope_2d_cos_sin(16, jnp.asarray(pos), FREQ)
    ours = apply_rope_2d(
        jnp.ones((1, 12, 1, 16)), cos, sin
    )  # [B, N, H, D]
    assert np.allclose(
        np.asarray(ours)[0, :, 0], rotated[0, 0].numpy(), atol=1e-5
    )


def test_backbone_conversion_matches_torch(rng):
    torch.manual_seed(0)
    net = TorchBackbone().eval()

    B, H, W = 2, 16, 24
    gh, gw = H // PATCH, W // PATCH
    images = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    pos_np = np.asarray(grid_positions(gh, gw))
    # memory context: first N rows on the grid, then 4 positionless tokens
    M = gh * gw + 4
    ctx = rng.normal(size=(B, M, DEC_WIDTH)).astype(np.float32)
    ctx_pos_np = np.concatenate(
        [pos_np, np.full((4, 2), -1, np.int32)], axis=0
    )

    with torch.no_grad():
        t_enc = net.encode(
            torch.from_numpy(images).permute(0, 3, 1, 2),
            torch.from_numpy(pos_np),
        )
        t_dec = net.decode(
            t_enc, torch.from_numpy(ctx),
            torch.from_numpy(pos_np), torch.from_numpy(ctx_pos_np),
        )

    flat = convert_backbone(net.state_dict())

    enc = PointmapEncoder(WIDTH, DEPTH, HEADS, PATCH,
                          pos_embed="RoPE100", qkv_bias=True)
    enc_params = enc.init(jax.random.PRNGKey(0), jnp.asarray(images))["params"]
    enc_flat = {k[1:]: v for k, v in flat.items() if k[0] == "encoder"}
    enc_flat[("patch_embed", "proj", "kernel")] = flat[
        ("encoder", "patch_embed", "proj", "kernel")
    ]
    enc_params, matched, missed = graft_flat_params(enc_params, enc_flat)
    assert not missed, missed
    j_enc, _ = enc.apply({"params": enc_params}, jnp.asarray(images))
    assert np.allclose(np.asarray(j_enc), t_enc.numpy(), atol=2e-5), (
        np.abs(np.asarray(j_enc) - t_enc.numpy()).max()
    )

    dec = PointmapDecoder(DEC_WIDTH, DEPTH, HEADS,
                          pos_embed="RoPE100", qkv_bias=True,
                          norm_context=True)
    dec_params = dec.init(
        jax.random.PRNGKey(0), j_enc, jnp.asarray(ctx),
        jnp.asarray(pos_np), jnp.asarray(ctx_pos_np),
    )["params"]
    dec_flat = {k[1:]: v for k, v in flat.items() if k[0] == "decoder"}
    dec_params, matched, missed = graft_flat_params(dec_params, dec_flat)
    assert not missed, missed
    j_dec = dec.apply(
        {"params": dec_params}, j_enc, jnp.asarray(ctx),
        jnp.asarray(pos_np), jnp.asarray(ctx_pos_np),
    )
    assert np.allclose(np.asarray(j_dec), t_dec.numpy(), atol=5e-5), (
        np.abs(np.asarray(j_dec) - t_dec.numpy()).max()
    )


# ---------------------------------------------------------------------------
# DUSt3R two-view entangled decoder


class TorchEntangledDecoder(tnn.Module):
    """DUSt3R's _decoder: shared decoder_embed, zipped dec_blocks /
    dec_blocks2 where each stream cross-attends to the OTHER stream's
    previous-layer output, one shared final dec_norm."""

    def __init__(self):
        super().__init__()
        self.decoder_embed = tnn.Linear(WIDTH, DEC_WIDTH)
        self.dec_blocks = tnn.ModuleList(
            [TorchDecBlock(DEC_WIDTH, HEADS) for _ in range(DEPTH)]
        )
        self.dec_blocks2 = tnn.ModuleList(
            [TorchDecBlock(DEC_WIDTH, HEADS) for _ in range(DEPTH)]
        )
        self.dec_norm = tnn.LayerNorm(DEC_WIDTH)

    def forward(self, e1, e2, pos):
        x1, x2 = self.decoder_embed(e1), self.decoder_embed(e2)
        for blk1, blk2 in zip(self.dec_blocks, self.dec_blocks2):
            y1, y2 = x1, x2
            x1 = blk1(y1, y2, pos, pos)
            x2 = blk2(y2, y1, pos, pos)
        return self.dec_norm(x1), self.dec_norm(x2)


def test_entangled_decoder_conversion_matches_torch(rng):
    from unigeo_tpu.models.pointmap.dust3r import EntangledDecoder
    from unigeo_tpu.utils.convert_dust3r import convert_dust3r_pair

    torch.manual_seed(1)
    net = TorchEntangledDecoder().eval()

    B, N = 2, 12
    gh, gw = 3, 4
    e1 = rng.normal(size=(B, N, WIDTH)).astype(np.float32)
    e2 = rng.normal(size=(B, N, WIDTH)).astype(np.float32)
    pos_np = np.asarray(grid_positions(gh, gw))

    with torch.no_grad():
        t1, t2 = net(
            torch.from_numpy(e1), torch.from_numpy(e2),
            torch.from_numpy(pos_np),
        )

    flat = convert_dust3r_pair(net.state_dict())
    dec = EntangledDecoder(
        DEC_WIDTH, DEPTH, HEADS, qkv_bias=True, rope_freq=FREQ,
        norm_context=True,
    )
    params = dec.init(
        jax.random.PRNGKey(0), jnp.asarray(e1), jnp.asarray(e2),
        jnp.asarray(pos_np)[None],
    )["params"]
    dec_flat = {k[1:]: v for k, v in flat.items() if k[0] == "decoder"}
    params, matched, missed = graft_flat_params(params, dec_flat)
    assert not missed, missed
    j1, j2 = dec.apply(
        {"params": params}, jnp.asarray(e1), jnp.asarray(e2),
        jnp.asarray(pos_np)[None],
    )
    assert np.allclose(np.asarray(j1), t1.numpy(), atol=5e-5), (
        np.abs(np.asarray(j1) - t1.numpy()).max()
    )
    assert np.allclose(np.asarray(j2), t2.numpy(), atol=5e-5), (
        np.abs(np.asarray(j2) - t2.numpy()).max()
    )
