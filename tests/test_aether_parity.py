"""Torch-golden parity for the Aether stack's new primitives.

Independent torch reimplementations (DiT-paper adaLN-zero block; replicate-
pad causal Conv3d) are built here, weights transplanted into the flax
modules, and outputs compared — the same parity instrument the SVD stack
uses (tests/test_torch_parity.py) applied to the new family.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from unigeo_tpu.models.aether import AetherDiT, CausalConv3d, DiTBlock

torch.manual_seed(0)


def dense_p(lin):
    p = {"kernel": jnp.asarray(lin.weight.detach().numpy().T)}
    if lin.bias is not None:
        p["bias"] = jnp.asarray(lin.bias.detach().numpy())
    return p


def assert_close(jax_out, torch_out, tol, what):
    a = np.asarray(jax_out)
    b = torch_out.detach().numpy()
    assert a.shape == b.shape, (what, a.shape, b.shape)
    scale = max(np.abs(b).max(), 1e-6)
    rel = np.abs(a - b).max() / scale
    assert rel < tol, f"{what}: rel dev {rel:.2e} (tol {tol:.0e})"


# ---------------------------------------------------------------------------
# torch reference modules (written from the DiT paper recipe, not from the
# flax code: adaLN-zero = LN without affine, modulated by shift/scale/gate
# regressed from silu(cond))
# ---------------------------------------------------------------------------


class TDiTBlock(tnn.Module):
    def __init__(self, c, heads, mlp_ratio):
        super().__init__()
        self.c, self.heads = c, heads
        self.adaLN = tnn.Linear(c, 6 * c)
        self.to_q = tnn.Linear(c, c, bias=False)
        self.to_k = tnn.Linear(c, c, bias=False)
        self.to_v = tnn.Linear(c, c, bias=False)
        self.to_out = tnn.Linear(c, c)
        self.fc1 = tnn.Linear(c, c * mlp_ratio)
        self.fc2 = tnn.Linear(c * mlp_ratio, c)

    def _attn(self, x):
        b, s, c = x.shape
        d = c // self.heads

        def split(t):
            return t.view(b, s, self.heads, d).transpose(1, 2)

        q, k, v = split(self.to_q(x)), split(self.to_k(x)), split(self.to_v(x))
        w = torch.softmax(q @ k.transpose(-1, -2) * d**-0.5, dim=-1)
        out = (w @ v).transpose(1, 2).reshape(b, s, c)
        return self.to_out(out)

    def forward(self, x, cond):
        mod = self.adaLN(F.silu(cond))
        sa_sh, sa_sc, sa_g, m_sh, m_sc, m_g = mod.chunk(6, dim=-1)

        def modulate(h, sh, sc):
            return h * (1 + sc[:, None]) + sh[:, None]

        ln = lambda h: F.layer_norm(h, (self.c,))
        x = x + sa_g[:, None] * self._attn(modulate(ln(x), sa_sh, sa_sc))
        h = modulate(ln(x), m_sh, m_sc)
        x = x + m_g[:, None] * self.fc2(F.gelu(self.fc1(h)))
        return x


def dit_block_params(t):
    return {
        "adaLN_modulation": dense_p(t.adaLN),
        "attn": {
            "to_q": dense_p(t.to_q),
            "to_k": dense_p(t.to_k),
            "to_v": dense_p(t.to_v),
            "to_out": dense_p(t.to_out),
        },
        "mlp": {"fc1": dense_p(t.fc1), "fc2": dense_p(t.fc2)},
    }


def test_dit_block_matches_torch():
    c, heads, mlp_ratio = 32, 4, 2
    tblk = TDiTBlock(c, heads, mlp_ratio)
    # non-zero adaLN so the block actually transforms (zero-init is the
    # production init; parity needs live weights)
    tnn.init.normal_(tblk.adaLN.weight, std=0.2)
    tnn.init.normal_(tblk.adaLN.bias, std=0.2)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 12, c).astype(np.float32)
    cond = rng.randn(2, c).astype(np.float32)

    blk = DiTBlock(num_heads=heads, mlp_ratio=mlp_ratio)
    out = blk.apply({"params": dit_block_params(tblk)}, jnp.asarray(x),
                    jnp.asarray(cond))
    tout = tblk(torch.from_numpy(x), torch.from_numpy(cond))
    assert_close(out, tout, 2e-5, "DiTBlock")


def test_dit_block_params_match_init_tree():
    """The transplant tree is STRUCTURALLY identical to the module's own
    init (so the test cannot silently skip params)."""
    c, heads = 32, 4
    blk = DiTBlock(num_heads=heads, mlp_ratio=2)
    ref = blk.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, c)),
                   jnp.zeros((1, c)))["params"]
    mine = dit_block_params(TDiTBlock(c, heads, 2))
    ref_paths = {jax.tree_util.keystr(p): v.shape
                 for p, v in jax.tree_util.tree_leaves_with_path(ref)}
    mine_paths = {jax.tree_util.keystr(p): v.shape
                  for p, v in jax.tree_util.tree_leaves_with_path(mine)}
    assert ref_paths == mine_paths


def test_causal_conv3d_matches_torch_replicate_pad():
    """CausalConv3d == torch Conv3d with replicate pad on the past (both
    unstrided kt=3 and the block-causal strided kt=3/st=2 form)."""
    rng = np.random.RandomState(1)
    x = rng.randn(6, 8, 8, 3).astype(np.float32)

    for strides in ((1, 1, 1), (2, 2, 2)):
        tconv = tnn.Conv3d(3, 5, kernel_size=3, stride=strides)
        st = strides[0]
        xt = torch.from_numpy(x).permute(3, 0, 1, 2)[None]  # [1,C,T,H,W]
        # pad: W,H spatial SAME (1,1); T past-only (kt - st)
        xt = F.pad(xt, (1, 1, 1, 1, 0, 0))
        xt = F.pad(xt, (0, 0, 0, 0, 3 - st, 0), mode="replicate")
        tout = tconv(xt)[0].permute(1, 2, 3, 0)  # [T,H,W,C]

        conv = CausalConv3d(5, kernel=(3, 3, 3), strides=strides)
        params = {
            "conv": {
                "kernel": jnp.asarray(
                    tconv.weight.detach().numpy().transpose(2, 3, 4, 1, 0)),
                "bias": jnp.asarray(tconv.bias.detach().numpy()),
            }
        }
        out = conv.apply({"params": params}, jnp.asarray(x))
        assert_close(out, tout, 2e-5, f"CausalConv3d strides={strides}")


class TAetherDiT(tnn.Module):
    """Full DiT glue: 2x2 patchify conv, factorised pos embeds, blocks,
    adaLN-modulated final layer, unpatchify."""

    def __init__(self, cin, cout, width, depth, heads, mlp_ratio, patch=2):
        super().__init__()
        self.width, self.patch, self.cout = width, patch, cout
        self.patchify = tnn.Conv2d(cin, width, patch, stride=patch)
        self.t1 = tnn.Linear(256, width)
        self.t2 = tnn.Linear(width, width)
        self.blocks = tnn.ModuleList(
            [TDiTBlock(width, heads, mlp_ratio) for _ in range(depth)])
        self.final_mod = tnn.Linear(width, 2 * width)
        self.final_proj = tnn.Linear(width, patch * patch * cout)

    @staticmethod
    def sincos_1d(pos, dim):
        # transformer sincos, [sin | cos] halves (vit sincos_2d convention)
        omega = 1.0 / 10000 ** (torch.arange(dim // 2).double() / (dim // 2))
        args = pos.double()[:, None] * omega[None]
        return torch.cat([torch.sin(args), torch.cos(args)], dim=-1).float()

    @staticmethod
    def timestep_embed(t, dim):
        # layers.sinusoidal_embedding with flip_sin_to_cos=True: [cos | sin]
        half = dim // 2
        freqs = torch.exp(
            -np.log(10000.0) * torch.arange(half).double() / half)
        args = t.double()[:, None] * freqs[None]
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1).float()

    def forward(self, x, t):
        tl, h, w, _ = x.shape
        p = self.patch
        gh, gw = h // p, w // p
        tok = self.patchify(x.permute(0, 3, 1, 2))  # [T', C, gh, gw]
        tok = tok.flatten(2).transpose(1, 2)  # [T', gh*gw, C]

        half = self.width // 2
        yy, xx = torch.meshgrid(torch.arange(gh), torch.arange(gw),
                                indexing="ij")
        spatial = torch.cat(
            [self.sincos_1d(yy.flatten(), half),
             self.sincos_1d(xx.flatten(), half)], dim=-1)
        # temporal: sinusoidal_embedding(arange(T'), width,
        # flip_sin_to_cos=False) = [sin | cos]
        targs = torch.arange(tl).double()[:, None] * torch.exp(
            -np.log(10000.0) * torch.arange(half).double() / half)[None]
        temporal = torch.cat([torch.sin(targs), torch.cos(targs)],
                             dim=-1).float()
        tok = tok + spatial[None] + temporal[:, None]
        tok = tok.reshape(1, tl * gh * gw, self.width)

        cond = self.t1(self.timestep_embed(t.reshape(1), 256))
        cond = self.t2(F.silu(cond))
        for blk in self.blocks:
            tok = blk(tok, cond)

        sh, sc = self.final_mod(F.silu(cond)).chunk(2, dim=-1)
        tok = F.layer_norm(tok, (self.width,)) * (1 + sc[:, None]) + sh[:, None]
        out = self.final_proj(tok)
        out = out.reshape(tl, gh, gw, p, p, self.cout)
        return out.permute(0, 1, 3, 2, 4, 5).reshape(tl, h, w, self.cout)


def test_aether_dit_full_forward_matches_torch():
    """End-to-end DiT glue parity: patchify / pos-embed layout / block /
    final modulation / unpatchify order all pinned at once."""
    cin, cout, width, depth, heads, mlp_ratio = 7, 5, 32, 2, 4, 2
    tm = TAetherDiT(cin, cout, width, depth, heads, mlp_ratio)
    for blk in tm.blocks:
        tnn.init.normal_(blk.adaLN.weight, std=0.2)
        tnn.init.normal_(blk.adaLN.bias, std=0.2)
    tnn.init.normal_(tm.final_mod.weight, std=0.2)
    tnn.init.normal_(tm.final_proj.weight, std=0.2)

    params = {
        "patchify": {
            "kernel": jnp.asarray(
                tm.patchify.weight.detach().numpy().transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(tm.patchify.bias.detach().numpy()),
        },
        "t_embed1": dense_p(tm.t1),
        "t_embed2": dense_p(tm.t2),
        "stack": {
            "blocks": {
                "block": jax.tree.map(
                    lambda *leaves: jnp.stack(leaves),
                    *[dit_block_params(b) for b in tm.blocks]),
            }
        },
        "final_modulation": dense_p(tm.final_mod),
        "final_proj": dense_p(tm.final_proj),
    }

    rng = np.random.RandomState(2)
    x = rng.randn(3, 8, 8, cin).astype(np.float32)
    dit = AetherDiT(out_channels=cout, width=width, depth=depth,
                    num_heads=heads, patch=2, mlp_ratio=mlp_ratio)
    for t in (0.0, 0.35, 1.0):
        out = dit.apply({"params": params}, jnp.asarray(x), jnp.float32(t))
        tout = tm(torch.from_numpy(x), torch.tensor([t]))
        assert_close(out, tout, 5e-5, f"AetherDiT t={t}")
