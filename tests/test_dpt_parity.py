"""DPT-head parity against a dust3r-structured torch golden (VERDICT r1
item 7): the reference's pointmap models regress through DPT heads
(model/spann3r.py:16-21 wraps a DUSt3R net whose ``dpt.*`` keys follow
dust3r's dpt_block.py).  The torch model here replicates that structure and
naming exactly; conversion goes through utils/convert_dust3r.py.
"""

import numpy as np
import pytest
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from unigeo_tpu.models.pointmap.dpt import DPTHead
from unigeo_tpu.utils.checkpoint import graft_flat_params
from unigeo_tpu.utils.convert_dust3r import convert_dpt_head

torch.manual_seed(0)

TOKEN_DIM = 20
LAYER_DIMS = (8, 12, 16, 24)
FEAT = 16
HEAD = 8
OUT = 4


class TResidualConvUnit(tnn.Module):
    def __init__(self, feat):
        super().__init__()
        self.conv1 = tnn.Conv2d(feat, feat, 3, padding=1)
        self.conv2 = tnn.Conv2d(feat, feat, 3, padding=1)

    def forward(self, x):
        h = self.conv1(F.relu(x))
        h = self.conv2(F.relu(h))
        return x + h


class TFusion(tnn.Module):
    def __init__(self, feat):
        super().__init__()
        self.resConfUnit1 = TResidualConvUnit(feat)
        self.resConfUnit2 = TResidualConvUnit(feat)
        self.out_conv = tnn.Conv2d(feat, feat, 1)

    def forward(self, x, skip=None):
        if skip is not None:
            x = x + self.resConfUnit1(skip)
        x = self.resConfUnit2(x)
        x = F.interpolate(x, scale_factor=2.0, mode="bilinear", align_corners=True)
        return self.out_conv(x)


class TScratch(tnn.Module):
    def __init__(self, dims, feat):
        super().__init__()
        self.layer1_rn = tnn.Conv2d(dims[0], feat, 3, padding=1, bias=False)
        self.layer2_rn = tnn.Conv2d(dims[1], feat, 3, padding=1, bias=False)
        self.layer3_rn = tnn.Conv2d(dims[2], feat, 3, padding=1, bias=False)
        self.layer4_rn = tnn.Conv2d(dims[3], feat, 3, padding=1, bias=False)
        self.refinenet1 = TFusion(feat)
        self.refinenet2 = TFusion(feat)
        self.refinenet3 = TFusion(feat)
        self.refinenet4 = TFusion(feat)


class TorchDPT(tnn.Module):
    """dust3r DPTOutputAdapter structure + key names."""

    def __init__(self):
        super().__init__()
        d0, d1, d2, d3 = LAYER_DIMS
        self.act_postprocess = tnn.ModuleList([
            tnn.Sequential(
                tnn.Conv2d(TOKEN_DIM, d0, 1),
                tnn.ConvTranspose2d(d0, d0, 4, stride=4),
            ),
            tnn.Sequential(
                tnn.Conv2d(TOKEN_DIM, d1, 1),
                tnn.ConvTranspose2d(d1, d1, 2, stride=2),
            ),
            tnn.Sequential(tnn.Conv2d(TOKEN_DIM, d2, 1)),
            tnn.Sequential(
                tnn.Conv2d(TOKEN_DIM, d3, 1),
                tnn.Conv2d(d3, d3, 3, stride=2, padding=1),
            ),
        ])
        self.scratch = TScratch(LAYER_DIMS, FEAT)
        self.head = tnn.Sequential(
            tnn.Conv2d(FEAT, HEAD, 3, padding=1),
            tnn.Identity(),  # Interpolate slot (index 1)
            tnn.Conv2d(HEAD, HEAD, 3, padding=1),
            tnn.ReLU(),
            tnn.Conv2d(HEAD, OUT, 1),
        )

    def forward(self, maps):  # 4 × [B, C, gh, gw]
        l0 = self.act_postprocess[0](maps[0])
        l1 = self.act_postprocess[1](maps[1])
        l2 = self.act_postprocess[2](maps[2])
        l3 = self.act_postprocess[3](maps[3])
        r0 = self.scratch.layer1_rn(l0)
        r1 = self.scratch.layer2_rn(l1)
        r2 = self.scratch.layer3_rn(l2)
        r3 = self.scratch.layer4_rn(l3)
        p = self.scratch.refinenet4(r3)
        p = self.scratch.refinenet3(p, r2)
        p = self.scratch.refinenet2(p, r1)
        p = self.scratch.refinenet1(p, r0)
        h = self.head[0](p)
        h = F.interpolate(h, scale_factor=2.0, mode="bilinear", align_corners=True)
        h = F.relu(self.head[2](h))
        return self.head[4](h)


def test_dpt_head_matches_torch_golden():
    gh = gw = 4
    b = 2
    rng = np.random.default_rng(0)
    tokens = [
        rng.normal(size=(b, gh * gw, TOKEN_DIM)).astype(np.float32)
        for _ in range(4)
    ]

    tmodel = TorchDPT().eval()
    with torch.no_grad():
        maps_t = [
            torch.from_numpy(t).view(b, gh, gw, TOKEN_DIM).permute(0, 3, 1, 2)
            for t in tokens
        ]
        t_out = tmodel(maps_t)

    jhead = DPTHead(out_channels=OUT, feature_dim=FEAT, layer_dims=LAYER_DIMS,
                    head_dim=HEAD)
    params = jhead.init(
        jax.random.PRNGKey(0), [jnp.asarray(t) for t in tokens], (gh, gw)
    )
    # prefix keys like a dust3r checkpoint slice would carry them
    sd = {f"downstream_head1.dpt.{k}": v for k, v in tmodel.state_dict().items()}
    flat = convert_dpt_head(sd)
    flat = {k[1:]: v for k, v in flat.items()}  # strip the "dpt" root
    grafted, matched, missed = graft_flat_params(params, flat)
    n = len(jax.tree_util.tree_leaves(params))
    assert matched == n, f"grafted {matched}/{n}; missed {missed[:8]}"

    j_out = jhead.apply(grafted, [jnp.asarray(t) for t in tokens], (gh, gw))
    j_out = np.moveaxis(np.asarray(j_out), -1, 1)
    scale = np.abs(t_out.numpy()).max()
    rel = np.abs(j_out - t_out.numpy()).max() / scale
    assert rel < 2e-4, rel


def test_spann3r_dpt_head_end_to_end():
    """Spann3R with head_type=dpt runs and honors the output contract."""
    from unigeo_tpu.models.pointmap.spann3r import Spann3RNetwork, tiny_spann3r_config

    cfg = dict(tiny_spann3r_config(), head_type="dpt")
    net = Spann3RNetwork(**cfg)
    t, h, w = 2, 32, 32
    frames = jnp.asarray(
        np.random.default_rng(1).uniform(size=(t, h, w, 3)), jnp.float32
    )
    params = net.init(jax.random.PRNGKey(0), frames)
    pts, conf = net.apply(params, frames)
    assert pts.shape == (t, h, w, 3)
    assert conf.shape == (t, h, w)
    assert np.isfinite(np.asarray(pts)).all()
    assert (np.asarray(pts[..., 2]) > 0).all()  # exp-z parameterization
    assert (np.asarray(conf) >= 1.0).all()


def test_cut3r_dpt_head_end_to_end():
    from unigeo_tpu.models.pointmap.cut3r import Cut3RNetwork, tiny_cut3r_config

    cfg = dict(tiny_cut3r_config(), head_type="dpt")
    net = Cut3RNetwork(**cfg)
    t, h, w = 2, 32, 32
    frames = jnp.asarray(
        np.random.default_rng(2).uniform(size=(t, h, w, 3)), jnp.float32
    )
    params = net.init(jax.random.PRNGKey(0), frames)
    out = net.apply(params, frames)
    assert out["world_pts"].shape == (t, h, w, 3)
    assert out["self_pts"].shape == (t, h, w, 3)
    assert out["pose_enc"].shape == (t, 7)
    assert np.isfinite(np.asarray(out["world_pts"])).all()
