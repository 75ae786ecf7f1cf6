"""VideoDepthAnything-class feed-forward video depth.

The reference lists VideoDepthAnything as a supported method
(model/Readme.md:6) but the snapshot ships no adapter for it.  This is the
native implementation of the method family (public recipe: a
DepthAnything-style per-frame ViT backbone whose DPT head is made
temporally consistent by attention layers that mix features ACROSS frames
at each spatial location):

  encoder   per-frame ViT, frames folded into the batch axis (one big
            MXU-friendly program), 4 hook layers at depths L/4..L;
  temporal  at every hook, a self-attention block over the FRAME axis —
            tokens reshaped [T, N, C] → [N, T, C] so each spatial location
            attends across time (the paper's temporal module, expressed as
            one batched attention instead of a per-location loop);
  head      shared DPT fusion (models/pointmap/dpt.DPTHead) → per-frame
            disparity ≥ 0.

Adapter contract: like the reference's DepthCrafter adapter
(model/depthcrafter.py:92-97 lineage) the network output is relative;
disparity is min-max normalized over the clip and converted to depth via
1/(x+0.1), then backprojected with the GT intrinsics for surface normals
with the OpenGL flip (model/depthcrafter.py:48-68).  Depth + normals only
— no poses/world points, matching the depth-model adapter family.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unigeo_tpu.models.pointmap.dpt import DPTHead
from unigeo_tpu.models.vit import PatchEmbed, ScannedViTBlocks, ViTBlock, sincos_2d_pos_embed
from unigeo_tpu.ops.backproject import backproject_to_cv_position
from unigeo_tpu.ops.normals import surface_normals_from_points
from unigeo_tpu.registry import MODELS


class VDANetwork(nn.Module):
    """[T, H, W, 3] in 0..1 → disparity [T, H, W] (≥ 0, relative).

    The DINOv2-compat flags (all default-off, so the base param tree is
    unchanged) make the backbone structurally loadable from real
    DepthAnything/DINOv2-lineage checkpoints via utils/convert_vda.py:
    qkv biases, a class token participating in attention, the learned
    position table (sliced top-left for non-native grids), and the final
    backbone norm DINOv2's get_intermediate_layers(norm=True) applies to
    every hooked layer.  Residual remaining numeric deltas vs torch
    DINOv2: LayerNorm eps (1e-5 here vs 1e-6) and pos-embed grid
    interpolation at non-native resolutions (slice here).
    """

    width: int = 384  # ViT-S default (DepthAnything backbone family)
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 14
    temporal_heads: int = 6
    qkv_bias: bool = False  # DINOv2: True
    use_class_token: bool = False  # DINOv2: True
    learned_pos_embed: bool = False  # DINOv2: True (trained at grid 37)
    max_grid: int = 37  # 518 / 14, the DINOv2 pos-table grid
    hook_norm: bool = False  # apply the final norm to each hooked layer
    # frames per DPT-head invocation: the head's fused+upsampled feature
    # maps are ~130 MB/frame f32 at ViT-L 384×512 — all 25 production
    # frames at once RESOURCE_EXHAUSTs a v5e (caught by bench_zoo r5).
    # The head is frame-independent (temporal mixing happens before it),
    # so chunking only bounds peak memory; params are shared across calls.
    head_chunk: int = 8

    @nn.compact
    def __call__(self, frames):
        t = frames.shape[0]
        imgs = (frames - 0.5) / 0.5
        tokens, (gh, gw) = PatchEmbed(self.width, self.patch_size,
                                      name="patch_embed")(imgs)
        n_cls = 1 if self.use_class_token else 0
        if self.use_class_token:
            cls = self.param(
                "cls_token", nn.initializers.normal(0.02), (self.width,))
            tokens = jnp.concatenate(
                [jnp.broadcast_to(cls, (t, 1, self.width)), tokens], axis=1)
        if self.learned_pos_embed:
            pos = self.param(
                "pos_embed", nn.initializers.normal(0.02),
                (self.max_grid * self.max_grid + n_cls, self.width))
            grid = pos[n_cls:].reshape(self.max_grid, self.max_grid,
                                       self.width)
            pos_full = grid[:gh, :gw].reshape(gh * gw, self.width)
            if n_cls:
                pos_full = jnp.concatenate([pos[:n_cls], pos_full], axis=0)
        else:
            pos_full = sincos_2d_pos_embed(self.width, gh, gw)
            if n_cls:
                pos_full = jnp.concatenate(
                    [jnp.zeros((1, self.width), pos_full.dtype), pos_full],
                    axis=0)
        tokens = tokens + pos_full[None]
        _, layers = ScannedViTBlocks(
            self.depth, self.num_heads, qkv_bias=self.qkv_bias,
            return_layers=True, name="blocks",
        )(tokens)  # [depth, T, N(+1), C]

        hn = (nn.LayerNorm(epsilon=1e-5, name="hook_norm")
              if self.hook_norm else None)
        # DepthAnything hook convention: blocks at L/4, L/2, 3L/4, L
        idx = [self.depth * (i + 1) // 4 - 1 for i in range(4)]
        hooks = []
        for h, i in enumerate(idx):
            x = layers[i][:, n_cls:]  # [T, N, C] (class token dropped)
            if hn is not None:
                x = hn(x)
            # temporal module: attend across frames at each token location
            xt = jnp.swapaxes(x, 0, 1)  # [N, T, C]
            xt = ViTBlock(self.temporal_heads, qkv_bias=self.qkv_bias,
                          name=f"temporal_{h}")(xt)
            hooks.append(jnp.swapaxes(xt, 0, 1))

        head = DPTHead(
            out_channels=1,
            layer_dims=(self.width // 4, self.width // 2,
                        self.width, self.width),
            name="head",
        )
        chunk = min(max(1, self.head_chunk), t)
        # pad the frame axis so every chunk has the SAME shape (one set of
        # compiled convs instead of one per remainder shape)
        pad_t = (-t) % chunk
        if pad_t:
            hooks = [
                jnp.concatenate(
                    [hk, jnp.zeros((pad_t,) + hk.shape[1:], hk.dtype)], 0)
                for hk in hooks
            ]
        parts = []
        for i in range(0, t + pad_t, chunk):
            hks = [hk[i:i + chunk] for hk in hooks]
            if parts:
                # ordering barrier: the chunks have no data dependence, so
                # without this XLA may schedule several concurrently and
                # re-exceed the peak HBM this chunking exists to bound
                *hks, _ = jax.lax.optimization_barrier(
                    tuple(hks) + (parts[-1],))
            parts.append(head(hks, (gh, gw))[..., 0])
        # same module instance → shared params; peak memory = one chunk
        disp = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
        disp = disp[:t]
        disp = nn.relu(disp)
        target = (t,) + frames.shape[1:3]
        if disp.shape != target:  # patch sizes that don't tile H/W exactly
            disp = jax.image.resize(disp, target, method="bilinear")
        return disp


@jax.jit
def _postprocess(disp, intrinsics):
    """disp [Nf,H,W] ≥0 → (depths, normals_gl): clip min-max normalize,
    1/(x+0.1) depth, backproject + plane-fit normals, OpenGL flip."""
    lo, hi = jnp.min(disp), jnp.max(disp)
    x = (disp - lo) / jnp.maximum(hi - lo, 1e-8)
    depths = 1.0 / (x + 0.1)
    pts = jax.vmap(backproject_to_cv_position)(depths, intrinsics)
    normals_cv = surface_normals_from_points(pts)
    normals_gl = normals_cv * jnp.asarray([1.0, -1.0, -1.0])
    return depths, normals_gl


@MODELS.register("VideoDepthAnything")
class VideoDepthAnything:
    def __init__(
        self,
        network_config: Optional[Dict[str, Any]] = None,
        checkpoint_path: Optional[str] = None,
        seed: int = 0,
        init_height: int = 384,
        init_width: int = 512,
        init_frames: int = 2,
        # reference-config compat (accepted, unused)
        model_dir: Optional[str] = None,
        ckpt_path: Optional[str] = None,
        **_: Dict,
    ):
        self.network = VDANetwork(**(network_config or {}))
        if checkpoint_path:
            from unigeo_tpu.utils.checkpoint import load_params

            self.params = load_params(checkpoint_path)
        else:
            self.params = self.network.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((init_frames, init_height, init_width, 3)),
            )
        self._forward = jax.jit(lambda p, f: self.network.apply(p, f))

    def forward(self, data: Dict[str, Any]) -> Dict[str, Any]:
        frames = (
            np.moveaxis(np.asarray(data["images"]), 1, -1).astype(np.float32)
            / 255.0
        )
        disp = self._forward(self.params, jnp.asarray(frames))
        intr = jnp.asarray(np.stack(np.asarray(data["intrinsics"])))
        depths, normals_gl = _postprocess(disp, intr)
        return {
            "pred_depths": np.asarray(depths),
            "pred_normals": np.asarray(normals_gl),
        }


def tiny_vda_config():
    return dict(width=32, depth=4, num_heads=2, patch_size=16,
                temporal_heads=2)
