"""Shared neural-net building blocks for all model stacks (flax.linen).

Layout convention: channels-last everywhere (NHWC for conv features,
[B, S, C] for token sequences) — the native TPU conv/matmul layout.  Module
and parameter names intentionally mirror the diffusers naming scheme
(conv_in, time_embedding.linear_1, attn1.to_q, ...) so torch checkpoints map
onto the param tree by name in utils/checkpoint.py.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from unigeo_tpu.ops.attention import attention


def sinusoidal_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Transformer sinusoidal timestep embedding ([N] → [N, dim])."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """Two-layer MLP lifting a sinusoidal embedding to the model width.

    diffusers TimestepEmbedding(in, time_embed_dim, out_dim): linear_1 maps
    to ``hidden_dim`` (default = dim), linear_2 to ``dim``.  The UNet-level
    embeddings use hidden == out == 4·ch0; the per-transformer
    ``time_pos_embed`` uses hidden = 4·C with out = C.
    """

    dim: int
    hidden_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim or self.dim, name="linear_1")(x)
        x = nn.silu(x)
        return nn.Dense(self.dim, name="linear_2")(x)


class GroupNorm(nn.Module):
    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        groups = min(self.num_groups, x.shape[-1])
        while x.shape[-1] % groups:
            groups -= 1
        return nn.GroupNorm(num_groups=groups, epsilon=self.epsilon)(x)


class Attention(nn.Module):
    """Multi-head attention over [B, S, C] with optional cross context.

    Runs on the fused Pallas flash kernel for long sequences (TPU) via
    unigeo_tpu.ops.attention.
    """

    num_heads: int
    head_dim: Optional[int] = None
    context_dim: Optional[int] = None
    out_bias: bool = True
    qkv_bias: bool = False  # diffusers UNet: False; CLIP towers: True
    packed: bool = True  # packed-layout kernel on TPU (no head transposes)
    rope_freq: Optional[float] = None  # CroCo/DUSt3R 2D RoPE base (e.g. 100)

    @nn.compact
    def __call__(self, x, context=None, pos=None, ctx_pos=None, ctx_mask=None):
        """pos / ctx_pos: [.., S, 2] integer (y, x) patch positions for 2D
        RoPE on q / k (only when ``rope_freq`` is set); entries with y < 0
        are left unrotated (positionless tokens).

        ctx_mask: optional [Sk] or [B, Sk] key-validity mask — masked-out
        keys receive zero softmax weight (used for ring-memory context with
        empty slots; zero-VALUE slots alone would still soak up attention
        mass)."""
        from unigeo_tpu.ops.attention import attention_packed, use_packed_attention

        c = x.shape[-1]
        head_dim = self.head_dim or c // self.num_heads
        inner = head_dim * self.num_heads
        ctx = x if context is None else context

        q = nn.Dense(inner, use_bias=self.qkv_bias, name="to_q")(x)
        k = nn.Dense(inner, use_bias=self.qkv_bias, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=self.qkv_bias, name="to_v")(ctx)

        b, s, _ = q.shape
        sk = k.shape[1]
        if context is not None and sk == 1:
            # Single-key cross-attention (SVD: context is one CLIP image
            # embedding per frame, reference model/depthcrafter.py:79-90):
            # softmax over one logit is identically 1, so the attention
            # output equals v for every query — independent of q.  to_out is
            # applied once to the [B, 1, C] value and broadcast; the q/k
            # projections above stay for checkpoint-name parity and are
            # dead-code-eliminated by XLA.
            out = nn.Dense(c, use_bias=self.out_bias, name="to_out")(v)
            return jnp.broadcast_to(out, (b, s, c))

        if self.rope_freq is not None and pos is not None:
            from unigeo_tpu.ops.rope import apply_rope_2d, rope_2d_cos_sin

            qh = q.reshape(b, s, self.num_heads, head_dim)
            cos_q, sin_q = rope_2d_cos_sin(head_dim, pos, self.rope_freq, q.dtype)
            qh = apply_rope_2d(qh, cos_q, sin_q)
            q = qh.reshape(b, s, inner)
            kpos = pos if context is None else ctx_pos
            if kpos is not None:
                kh = k.reshape(b, sk, self.num_heads, head_dim)
                cos_k, sin_k = rope_2d_cos_sin(
                    head_dim, kpos, self.rope_freq, k.dtype
                )
                k = apply_rope_2d(kh, cos_k, sin_k).reshape(b, sk, inner)
        if ctx_mask is not None:
            # masked dense attention (the flash kernels carry no key mask;
            # ring-memory contexts are ≤ a few thousand keys, so dense is fine)
            qh = q.reshape(b, s, self.num_heads, head_dim)
            kh = k.reshape(b, sk, self.num_heads, head_dim)
            vh = v.reshape(b, sk, self.num_heads, head_dim)
            logits = (
                jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * head_dim**-0.5
            )
            mb = jnp.broadcast_to(
                jnp.asarray(ctx_mask, bool).reshape(-1, sk), (b, sk)
            )
            logits = jnp.where(mb[:, None, None, :], logits, -1e30)
            m = logits.max(-1, keepdims=True)
            p = jnp.exp(logits - m)
            out = jnp.einsum("bhqk,bkhd->bqhd", p, vh) / jnp.maximum(
                p.sum(-1, keepdims=True), 1e-30
            ).swapaxes(1, 2)
            out = out.reshape(b, s, inner)
        elif self.packed and use_packed_attention(s):
            # q/k/v stay in the [B, S, H·D] layout the projections emit and
            # the out-projection consumes — zero layout copies
            out = attention_packed(q, k, v, self.num_heads, head_dim**-0.5)
        else:
            q = q.reshape(b, s, self.num_heads, head_dim)
            k = k.reshape(b, sk, self.num_heads, head_dim)
            v = v.reshape(b, sk, self.num_heads, head_dim)
            out = attention(q, k, v).reshape(b, s, inner)
        return nn.Dense(c, use_bias=self.out_bias, name="to_out")(out)


class GEGLU(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # exact (erf) gelu — torch F.gelu default, used by diffusers GEGLU.
        # In bf16 the erf evaluation is pure VPU overhead (+0.9 ms per FF at
        # UNet stage-0 shapes, measured): the tanh approximation's max error
        # vs erf-gelu (~3e-4 absolute) is below bf16 round-off (ulp ≈ 8e-3
        # at |x|=1), so bf16 activations use it; f32 (parity tests, oracle
        # comparisons vs torch) keeps the exact form.
        exact = gate.dtype != jnp.bfloat16
        return h * nn.gelu(gate, approximate=not exact)


class _DenseParams(nn.Module):
    """kernel/bias with nn.Dense's exact names, shapes, and inits — lets the
    fused-GEGLU path own Dense-compatible params (checkpoints unchanged)."""

    features: int

    @nn.compact
    def __call__(self, cin: int):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (cin, self.features)
        )
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return k, b


class _GEGLUParams(nn.Module):
    """Param scope mirroring GEGLU(name=...)/Dense(name='proj')."""

    dim_out: int

    @nn.compact
    def __call__(self, cin: int):
        return _DenseParams(self.dim_out * 2, name="proj")(cin)


class FeedForward(nn.Module):
    """GEGLU feed-forward: Dense(2·4C) → v·gelu(g) → Dense(C).

    On TPU with bf16 throughout this runs as ONE fused Pallas kernel
    (ops/geglu.py) that never materializes the [M, 4C] hidden tensor in HBM
    (~0.5 ms of a ~1.9 ms FF at UNet stage-0 shapes; the UNet runs 48 FFs
    per denoise step).  Param tree is identical to the unfused
    GEGLU+Dense stack, and the unfused path reproduces flax Dense's dtype
    promotion exactly.
    """

    mult: int = 4

    @nn.compact
    def __call__(self, x):
        from unigeo_tpu.ops.geglu import geglu_ffn, use_fused_geglu

        c = x.shape[-1]
        w1, b1 = _GEGLUParams(c * self.mult, name="net_0")(c)
        w2, b2 = _DenseParams(c, name="net_2")(c * self.mult)

        if use_fused_geglu(x.dtype, w1.dtype):
            return geglu_ffn(x, w1, b1, w2) + b2.astype(x.dtype)

        # unfused: same math/promotion as GEGLU(name="net_0") + Dense
        dt = jnp.promote_types(jnp.promote_types(x.dtype, w1.dtype), b1.dtype)
        h = x.astype(dt) @ w1.astype(dt) + b1.astype(dt)
        v, g = jnp.split(h, 2, axis=-1)
        act = v * nn.gelu(g, approximate=g.dtype == jnp.bfloat16)
        return act @ w2.astype(dt) + b2.astype(dt)


class AlphaBlender(nn.Module):
    """Learned scalar mix between the spatial and temporal branches.

    alpha = sigmoid(mix_factor); out = alpha*spatial + (1-alpha)*temporal
    (the "learned"/"learned_with_images" merge strategies of video diffusion
    resnets/transformers; with no image-only frames both reduce to the same
    sigmoid mix).  ``switch`` flips alpha to weight the temporal branch —
    diffusers' switch_spatial_to_temporal_mix, used by the SVD temporal-VAE
    decoder blocks (merge_factor init 0.0 there, 0.5 in the UNet).
    """

    merge_factor: float = 0.5
    switch: bool = False

    @nn.compact
    def __call__(self, x_spatial, x_temporal):
        mix = self.param(
            "mix_factor", nn.initializers.constant(self.merge_factor), (1,)
        )
        alpha = jax.nn.sigmoid(mix)[0]
        if self.switch:
            alpha = 1.0 - alpha
        return alpha * x_spatial + (1.0 - alpha) * x_temporal


class _ConvParams(nn.Module):
    """Declares kernel/bias with nn.Conv's exact names, shapes, and inits —
    used by the fused-upsample path so its param tree is indistinguishable
    from a plain ``Conv2d`` (checkpoints map unchanged)."""

    features: int
    kernel: int

    @nn.compact
    def __call__(self, cin: int):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, cin, self.features),
        )
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return k, b


class Conv2d(nn.Module):
    """3x3/1x1 conv wrapper, NHWC, SAME padding by default.

    fuse_upsample2x: computes ``conv3x3(nearest_up2(x))`` as ONE
    lhs-dilated conv on the LOW-res input: the 3×3 kernel correlated with a
    2×2 ones window gives a 4×4 kernel K' with
    ``conv(up2(x), K, SAME) == conv_dilated(x, K', lhs_dilation=2,
    padding=(2,2))`` exactly (each output pixel reads the ≤4 distinct
    low-res taps instead of 9 repeated ones).  2.6× faster than
    repeat+conv at VAE-decoder shapes on v5e and never materializes the
    4×-upsampled intermediate.  Param layout identical to the plain conv.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    padding: Optional[int] = None
    fuse_upsample2x: bool = False

    @nn.compact
    def __call__(self, x):
        if self.fuse_upsample2x:
            assert self.kernel == 3 and self.stride == 1 and self.padding is None
            k, b = _ConvParams(self.features, self.kernel, name="Conv_0")(
                x.shape[-1]
            )
            dtype = jnp.result_type(x.dtype, k.dtype)
            kp = jnp.zeros((4, 4, x.shape[-1], self.features), dtype)
            k = k.astype(dtype)
            for u in range(2):
                for v in range(2):
                    kp = kp.at[u : u + 3, v : v + 3].add(k)
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kp.shape, ("NHWC", "HWIO", "NHWC")
            )
            y = jax.lax.conv_general_dilated(
                x.astype(dtype), kp, (1, 1), ((2, 2), (2, 2)),
                lhs_dilation=(2, 2), dimension_numbers=dn,
            )
            return y + b.astype(dtype)
        pad = self.kernel // 2 if self.padding is None else self.padding
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
        )(x)


class TemporalConv(nn.Module):
    """Conv over the frame axis only (kernel (k,1,1) in torch terms).

    Input [B, T, H, W, C]; a direct 3D conv with a (k, 1, 1) window — no
    layout transposes (an earlier fold-to-1D variant spent ~14% of a UNet
    step in pure copies).
    """

    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        return nn.Conv(
            self.features,
            (self.kernel, 1, 1),
            padding=((pad, pad), (0, 0), (0, 0)),
        )(x)
