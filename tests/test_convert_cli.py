"""End-to-end tests for tools/convert_checkpoint.py — the torch→orbax
bridge for reference users.

The fabricated inputs enumerate the TORCH key spaces independently (CroCo/
DUSt3R and diffusers naming conventions, the same discipline as
tests/test_svd_keyspace.py), are written as real safetensors files, run
through the actual CLI main(), and the resulting orbax checkpoints load
back through the adapters' ``checkpoint_path`` — the full user workflow,
with the CLI's two-sided zero-miss verification active (no
--allow-partial)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import convert_checkpoint as cli  # noqa: E402


def _save_st(sd, path):
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, str(path))


def _rand(rng, *shape):
    return rng.normal(size=shape).astype(np.float32)


# ---------------------------------------------------------------------------
# DUSt3R: full tiny checkpoint (backbone + entangled decoders + 2 DPT heads)
# ---------------------------------------------------------------------------

ENC_W, ENC_D, DEC_W, DEC_D = 64, 2, 48, 2
TINY_DUST3R_CFG = dict(
    enc_width=ENC_W, enc_depth=ENC_D, enc_heads=2,
    dec_width=DEC_W, dec_depth=DEC_D, dec_heads=2,
    patch_size=16, head_type="dpt", pos_embed="RoPE100",
    qkv_bias=True, norm_context=True,
)


def _dust3r_keyspace(rng):
    """The torch DUSt3R checkpoint key space at the tiny config —
    enumerated from the public CroCo/DUSt3R module structure, independent
    of this repo's converters."""
    sd = {}

    def lin(name, cin, cout):
        sd[f"{name}.weight"] = _rand(rng, cout, cin)
        sd[f"{name}.bias"] = _rand(rng, cout)

    def norm(name, c):
        sd[f"{name}.weight"] = _rand(rng, c)
        sd[f"{name}.bias"] = _rand(rng, c)

    def conv(name, cin, cout, k, bias=True):
        sd[f"{name}.weight"] = _rand(rng, cout, cin, k, k)
        if bias:
            sd[f"{name}.bias"] = _rand(rng, cout)

    def convT(name, cin, cout, k):
        sd[f"{name}.weight"] = _rand(rng, cin, cout, k, k)
        sd[f"{name}.bias"] = _rand(rng, cout)

    sd["patch_embed.proj.weight"] = _rand(rng, ENC_W, 3, 16, 16)
    sd["patch_embed.proj.bias"] = _rand(rng, ENC_W)
    sd["mask_token"] = _rand(rng, 1, 1, DEC_W)  # croco vestige, skipped

    for i in range(ENC_D):
        p = f"enc_blocks.{i}"
        norm(f"{p}.norm1", ENC_W)
        lin(f"{p}.attn.qkv", ENC_W, 3 * ENC_W)
        lin(f"{p}.attn.proj", ENC_W, ENC_W)
        norm(f"{p}.norm2", ENC_W)
        lin(f"{p}.mlp.fc1", ENC_W, 4 * ENC_W)
        lin(f"{p}.mlp.fc2", 4 * ENC_W, ENC_W)
    norm("enc_norm", ENC_W)
    lin("decoder_embed", ENC_W, DEC_W)
    for stream in ("dec_blocks", "dec_blocks2"):
        for i in range(DEC_D):
            p = f"{stream}.{i}"
            norm(f"{p}.norm1", DEC_W)
            lin(f"{p}.attn.qkv", DEC_W, 3 * DEC_W)
            lin(f"{p}.attn.proj", DEC_W, DEC_W)
            for q in ("projq", "projk", "projv", "proj"):
                lin(f"{p}.cross_attn.{q}", DEC_W, DEC_W)
            norm(f"{p}.norm2", DEC_W)
            norm(f"{p}.norm3", DEC_W)
            norm(f"{p}.norm_y", DEC_W)
            lin(f"{p}.mlp.fc1", DEC_W, 4 * DEC_W)
            lin(f"{p}.mlp.fc2", 4 * DEC_W, DEC_W)
    norm("dec_norm", DEC_W)

    # DPT heads (dust3r dpt_block naming; hook0 carries ENC width)
    d0, d1, d2, d3 = 96, 192, 384, 768
    f = 256
    for head in ("downstream_head1", "downstream_head2"):
        p = f"{head}.dpt"
        conv(f"{p}.act_postprocess.0.0", ENC_W, d0, 1)
        convT(f"{p}.act_postprocess.0.1", d0, d0, 4)
        conv(f"{p}.act_postprocess.1.0", DEC_W, d1, 1)
        convT(f"{p}.act_postprocess.1.1", d1, d1, 2)
        conv(f"{p}.act_postprocess.2.0", DEC_W, d2, 1)
        conv(f"{p}.act_postprocess.3.0", DEC_W, d3, 1)
        conv(f"{p}.act_postprocess.3.1", d3, d3, 3)
        for n, dn in zip(range(1, 5), (d0, d1, d2, d3)):
            conv(f"{p}.scratch.layer{n}_rn", dn, f, 3, bias=False)
        for n in range(1, 5):
            for unit in ("resConfUnit1", "resConfUnit2"):
                conv(f"{p}.scratch.refinenet{n}.{unit}.conv1", f, f, 3)
                conv(f"{p}.scratch.refinenet{n}.{unit}.conv2", f, f, 3)
            conv(f"{p}.scratch.refinenet{n}.out_conv", f, f, 1)
        conv(f"{p}.head.0", f, 128, 3)
        conv(f"{p}.head.2", 128, 128, 3)
        conv(f"{p}.head.4", 128, 4, 1)
    return sd


def test_dust3r_cli_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    sd = _dust3r_keyspace(rng)
    ckpt = tmp_path / "dust3r_tiny.safetensors"
    _save_st(sd, ckpt)
    out = str(tmp_path / "orbax")

    rc = cli.main([
        "dust3r", "--ckpt", str(ckpt), "--out", out,
        "--network-config", json.dumps(TINY_DUST3R_CFG),
    ])
    assert rc == 0

    # the orbax output loads straight through the adapter and runs
    from unigeo_tpu.models.pointmap.dust3r import Dust3R

    model = Dust3R(
        network_config=TINY_DUST3R_CFG, checkpoint_path=out,
        init_height=32, init_width=32,
    )
    from unigeo_tpu.data.synthetic import SyntheticBoxDataset

    clip = SyntheticBoxDataset(
        clip_length=2, clip_overlap=0, num_scenes=1, frames_per_scene=2,
        render_size=(32, 32),
    )[0]
    pred = model.forward(clip)
    assert pred["pred_world_pts"].shape == (2, 32, 32, 3)
    assert np.isfinite(pred["pred_world_pts"]).all()

    # converted weights actually landed: a known tensor round-trips
    from unigeo_tpu.utils.checkpoint import load_params

    tree = load_params(out)
    got = np.asarray(tree["params"]["encoder"]["norm"]["scale"])
    np.testing.assert_allclose(got, sd["enc_norm.weight"], rtol=1e-6)


def test_dust3r_cli_rejects_unknown_keys(tmp_path):
    rng = np.random.default_rng(1)
    sd = _dust3r_keyspace(rng)
    sd["enc_blocks.0.attn.surprise.weight"] = _rand(rng, 8, 8)
    ckpt = tmp_path / "bad.safetensors"
    _save_st(sd, ckpt)
    with pytest.raises((SystemExit, KeyError)):
        cli.main([
            "dust3r", "--ckpt", str(ckpt), "--out", str(tmp_path / "o"),
            "--network-config", json.dumps(TINY_DUST3R_CFG),
        ])


def test_dust3r_cli_flags_unrecognized_toplevel_keys(tmp_path):
    """Keys the converter would silently drop (outside blocks/heads/skip
    list) must fail the source-coverage check, not vanish."""
    rng = np.random.default_rng(3)
    sd = _dust3r_keyspace(rng)
    sd["ema_shadow.enc_norm.weight"] = _rand(rng, ENC_W)
    ckpt = tmp_path / "ema.safetensors"
    _save_st(sd, ckpt)
    with pytest.raises(SystemExit, match="unrecognized"):
        cli.main([
            "dust3r", "--ckpt", str(ckpt), "--out", str(tmp_path / "o"),
            "--network-config", json.dumps(TINY_DUST3R_CFG),
        ])


def test_missing_ckpt_flag_is_a_clean_error(tmp_path):
    with pytest.raises(SystemExit, match="--ckpt"):
        cli.main(["dust3r", "--out", str(tmp_path / "o")])


# ---------------------------------------------------------------------------
# SVD: tiny UNet through the CLI (UNet-only partial input)
# ---------------------------------------------------------------------------

def test_svd_cli_unet_roundtrip(tmp_path):
    from unigeo_tpu.utils.svd_keyspace import unet_svd_xt_keyspace

    unet_cfg = dict(
        block_out_channels=[32, 48, 64, 64], layers_per_block=1,
        num_attention_heads=[2, 3, 4, 4], head_dim=16,
        cross_attention_dim=32, addition_time_embed_dim=16,
    )
    keyspace = unet_svd_xt_keyspace(
        block_out_channels=tuple(unet_cfg["block_out_channels"]),
        layers_per_block=1,
        cross_attention_dim=32,
        addition_time_embed_dim=16,
    )
    rng = np.random.default_rng(2)
    sd = {k: _rand(rng, *shape) for k, shape in keyspace.items()}
    ckpt = tmp_path / "unet.safetensors"
    _save_st(sd, ckpt)
    out = str(tmp_path / "orbax_svd")

    rc = cli.main([
        "svd", "--unet", str(ckpt), "--out", out,
        "--network-config", json.dumps({"unet_config": unet_cfg}),
    ])
    assert rc == 0

    from unigeo_tpu.utils.checkpoint import load_params

    tree = load_params(out)
    assert set(tree) == {"unet"}
    got = np.asarray(tree["unet"]["conv_in"]["Conv_0"]["bias"])
    np.testing.assert_allclose(got, sd["conv_in.bias"], rtol=1e-6)
