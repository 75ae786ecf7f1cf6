#!/usr/bin/env python
"""Measure candidate fusions for the temporal-transformer glue pool.

ROADMAP (round-2 judge review) pins ~26 ms/step of the 276 ms UNet step in
"temporal transformer glue" — pos-embed, the [B·T,S,C]→[B·S,T,C]
transposes, attn2, norms — and bench r2 shows denoise 1380 ms vs a
1134 ms component-ceiling.  This tool times, through the PRODUCTION 5-step
fori_loop denoise program (the same in-context methodology as
ablate_unet_step.py):

  FULL            — current unet.py
  NOTRANSPOSE     — temporal pass in the native [B, T, S, C] layout:
                    attention contracts the frame axis via dot_general
                    batch dims (b, s, h) so no explicit HBM transpose ever
                    runs; LN/FF/pos-embed are axis-agnostic
  FUSEDQKV        — self-attention q/k/v as ONE [C, 3C] matmul (x read
                    once instead of three times); kernels concatenated at
                    apply time so the param tree is unchanged
  BOTH            — the two combined

Numerics: both variants are exact reassociations (same dots, same order,
different batching layout); the parity suite gates adoption.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp

from tools._benchlib import measure_rtt, setup_cache

setup_cache()

DTYPE = jnp.bfloat16
T, LH, LW = 25, 48, 64


def time_denoise(label, rtt):
    from unigeo_tpu.models.depthcrafter.pipeline import DepthCrafterPipeline
    import unigeo_tpu.models.depthcrafter.unet as unet_mod

    pipe = DepthCrafterPipeline()
    unet = pipe.unet = unet_mod.UNetSpatioTemporal()
    rng = jax.random.PRNGKey(0)
    ctx = jax.random.normal(rng, (T, 1, 1024), DTYPE)
    shapes = jax.eval_shape(
        lambda r: unet.init(
            r, jnp.zeros((T, LH, LW, 8)), jnp.zeros((1,)), ctx,
            jnp.zeros((1, 3)), T,
        ),
        rng,
    )["params"]
    params = {"unet": jax.tree.map(lambda s: jnp.zeros(s.shape, DTYPE), shapes)}
    cond = jnp.zeros((T, LH, LW, 4), DTYPE)
    noise = jax.random.normal(jax.random.PRNGKey(1), (T, LH, LW, 4))
    steps = 5
    fsum = jax.jit(lambda x: x.sum())

    def run():
        return float(fsum(pipe._denoise_stage(params, cond, ctx, noise, steps)))

    run()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    ms = max(min(ts) - rtt, 0.0) * 1e3 / steps
    print(f"{label:20s} {ms:8.1f} ms/step", flush=True)
    return ms


def main():
    import unigeo_tpu.models.depthcrafter.unet as unet_mod
    import unigeo_tpu.models.layers as layers_mod

    rtt = measure_rtt()
    print(f"device={jax.devices()[0].device_kind}  rtt={rtt*1e3:.1f} ms",
          flush=True)

    saved = {}

    def patch(mod, name, cls):
        saved[(mod, name)] = getattr(mod, name)
        setattr(mod, name, cls)

    def restore():
        for (mod, name), cls in saved.items():
            setattr(mod, name, cls)
        saved.clear()

    full = time_denoise("FULL", rtt)

    # ---------------- variant: fused QKV self-attention ----------------
    class FusedQKVAttention(layers_mod.Attention):
        @nn.compact
        def __call__(self, x, context=None, pos=None, ctx_pos=None,
                     ctx_mask=None):
            from unigeo_tpu.ops.attention import (
                attention_packed,
                use_packed_attention,
            )

            if context is not None or self.rope_freq is not None \
                    or ctx_mask is not None:
                return layers_mod.Attention.__call__(
                    self, x, context, pos, ctx_pos, ctx_mask)
            c = x.shape[-1]
            head_dim = self.head_dim or c // self.num_heads
            inner = head_dim * self.num_heads
            wq, _ = layers_mod._DenseParams(inner, name="to_q")(c)
            wk, _ = layers_mod._DenseParams(inner, name="to_k")(c)
            wv, _ = layers_mod._DenseParams(inner, name="to_v")(c)
            w = jnp.concatenate(
                [wq.astype(x.dtype), wk.astype(x.dtype), wv.astype(x.dtype)],
                axis=-1,
            )
            qkv = x @ w
            q, k, v = jnp.split(qkv, 3, axis=-1)
            b, s, _ = q.shape
            if self.packed and use_packed_attention(s):
                out = attention_packed(q, k, v, self.num_heads, head_dim**-0.5)
            else:
                from unigeo_tpu.ops.attention import attention

                out = attention(
                    q.reshape(b, s, self.num_heads, head_dim),
                    k.reshape(b, s, self.num_heads, head_dim),
                    v.reshape(b, s, self.num_heads, head_dim),
                ).reshape(b, s, inner)
            return nn.Dense(c, use_bias=self.out_bias, name="to_out")(out)

    # NOTE: qkv_bias=False for every UNet attention, so the fused path
    # skips biases entirely (they don't exist in the param tree).

    patch(layers_mod, "Attention", FusedQKVAttention)
    patch(unet_mod, "Attention", FusedQKVAttention)
    fqkv = time_denoise("FUSEDQKV", rtt)
    restore()

    # ---------------- variant: no-transpose temporal pass ----------------
    class TemporalBlock4D(nn.Module):
        """TemporalTransformerBlock on [B, T, S, C] — attention contracts
        the frame axis in place (dot batch dims b, s, h)."""

        num_heads: int
        head_dim: int
        context_dim: int

        def _attn_t(self, x, name):
            b, t, s, c = x.shape
            inner = self.head_dim * self.num_heads
            q = nn.Dense(inner, use_bias=False, name=f"{name}_to_q")(x)
            k = nn.Dense(inner, use_bias=False, name=f"{name}_to_k")(x)
            v = nn.Dense(inner, use_bias=False, name=f"{name}_to_v")(x)
            qh = q.reshape(b, t, s, self.num_heads, self.head_dim)
            kh = k.reshape(b, t, s, self.num_heads, self.head_dim)
            vh = v.reshape(b, t, s, self.num_heads, self.head_dim)
            logits = jnp.einsum("btshd,bushd->bshtu", qh, kh) * self.head_dim**-0.5
            m = logits.max(-1, keepdims=True)
            p = jnp.exp(logits - m)
            o = jnp.einsum("bshtu,bushd->btshd", p, vh)
            den = jnp.moveaxis(p.sum(-1), (1, 2, 3), (2, 3, 1))  # b s h t -> b t s h
            o = o / jnp.maximum(den, 1e-30)[..., None]
            return nn.Dense(x.shape[-1], name=f"{name}_to_out")(
                o.reshape(b, t, s, inner)
            )

        @nn.compact
        def __call__(self, x, ctx_first):
            # ctx_first: [B, 1, ctx_dim] keyview CLIP embedding
            b, t, s, c = x.shape
            h = nn.LayerNorm(epsilon=1e-5, name="norm_in")(x)
            x = x + layers_mod.FeedForward(name="ff_in")(h)
            x = x + self._attn_t(
                nn.LayerNorm(epsilon=1e-5, name="norm1")(x), "attn1")
            # attn2 single-key shortcut: softmax over one logit == 1
            v2 = nn.Dense(self.head_dim * self.num_heads, use_bias=False,
                          name="attn2_to_v")(ctx_first)
            o2 = nn.Dense(c, name="attn2_to_out")(v2)  # [B, 1, C]
            x = x + o2[:, :, None, :]
            x = x + layers_mod.FeedForward(name="ff")(
                nn.LayerNorm(epsilon=1e-5, name="norm3")(x))
            return x

    class TSTNoTranspose(unet_mod.TransformerSpatioTemporal):
        @nn.compact
        def __call__(self, x, context, num_frames):
            bt, hh, ww, c = x.shape
            b = bt // num_frames
            residual = x
            h = layers_mod.GroupNorm(epsilon=1e-6, name="norm")(x)
            h = h.reshape(bt, hh * ww, c)
            h = nn.Dense(c, name="proj_in")(h)
            h = unet_mod.BasicTransformerBlock(
                self.num_heads, self.head_dim, self.context_dim,
                name="transformer_blocks_0",
            )(h, context)
            ht = h.reshape(b, num_frames, hh * ww, c)
            frame_emb = layers_mod.sinusoidal_embedding(
                jnp.arange(num_frames), c)
            frame_emb = layers_mod.TimestepEmbedding(
                c, hidden_dim=4 * c, name="time_pos_embed")(frame_emb)
            ht = ht + frame_emb[None, :, None, :].astype(ht.dtype)
            ctx_first = context.reshape(b, num_frames, *context.shape[1:])[:, 0]
            ht = TemporalBlock4D(
                self.num_heads, self.head_dim, self.context_dim,
                name="temporal_transformer_blocks_0",
            )(ht, ctx_first)
            h = layers_mod.AlphaBlender(name="time_mixer")(
                h, ht.reshape(bt, hh * ww, c))
            h = nn.Dense(c, name="proj_out")(h)
            return h.reshape(bt, hh, ww, c) + residual

    patch(unet_mod, "TransformerSpatioTemporal", TSTNoTranspose)
    notr = time_denoise("NOTRANSPOSE", rtt)
    restore()

    patch(layers_mod, "Attention", FusedQKVAttention)
    patch(unet_mod, "Attention", FusedQKVAttention)
    patch(unet_mod, "TransformerSpatioTemporal", TSTNoTranspose)
    both = time_denoise("BOTH", rtt)
    restore()

    print("\ndeltas vs FULL:", flush=True)
    print(f"  FUSEDQKV:    {full - fqkv:7.1f} ms/step", flush=True)
    print(f"  NOTRANSPOSE: {full - notr:7.1f} ms/step", flush=True)
    print(f"  BOTH:        {full - both:7.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
