"""Unit tests for the Megatron-style parameter partitioning rules
(unigeo_tpu/parallel/sharding.py) — fast path-level checks complementing
the full-tree dryrun assertions in __graft_entry__."""

import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from unigeo_tpu.parallel.sharding import param_spec, sharded_bytes_fraction


class _Key:
    def __init__(self, name):
        self.key = name


def _spec(path_names, shape, tp_size=2):
    path = tuple(_Key(n) for n in path_names)
    return param_spec(path, np.zeros(shape, np.float32), tp_size=tp_size)


def test_attention_and_mlp_rules():
    assert _spec(("attn1", "to_q", "kernel"), (64, 64)) == P(None, "tp")
    assert _spec(("attn1", "to_out", "kernel"), (64, 64)) == P("tp", None)
    assert _spec(("ff", "net_0", "proj", "kernel"), (64, 512)) == P(None, "tp")
    assert _spec(("ff", "net_2", "kernel"), (256, 64)) == P("tp", None)


def test_conv_col_row_pair():
    # resblock conv1 shards OUTPUT channels, conv2 INPUT channels
    assert _spec(
        ("spatial_res_block", "conv1", "Conv_0", "kernel"), (3, 3, 64, 128)
    ) == P(None, None, None, "tp")
    assert _spec(
        ("spatial_res_block", "conv2", "Conv_0", "kernel"), (3, 3, 128, 128)
    ) == P(None, None, "tp", None)
    # temporal (3,1,1) convs: same rules, rank 5
    assert _spec(
        ("temporal_res_block", "conv1", "Conv_0", "kernel"),
        (3, 1, 1, 64, 128),
    ) == P(None, None, None, None, "tp")


def test_shortcut_downsample_upsample_col():
    assert _spec(
        ("up_0_res_0", "spatial_res_block", "conv_shortcut", "Conv_0",
         "kernel"),
        (1, 1, 256, 128),
    ) == P(None, None, None, "tp")
    assert _spec(
        ("down_0_downsample", "conv", "Conv_0", "kernel"), (3, 3, 64, 64)
    ) == P(None, None, None, "tp")
    assert _spec(
        ("decoder", "up_1_upsample", "Conv_0", "kernel"), (3, 3, 64, 64)
    ) == P(None, None, None, "tp")


def test_timestep_mlp_pair():
    assert _spec(
        ("time_embedding", "linear_1", "kernel"), (32, 128)
    ) == P(None, "tp")
    assert _spec(
        ("time_embedding", "linear_2", "kernel"), (128, 128)
    ) == P("tp", None)


def test_replicated_families():
    # norms, biases, embeddings, proj_in/out stay replicated
    assert _spec(("norm1", "scale"), (64,)) == P()
    assert _spec(("attn1", "to_q", "bias"), (64,)) == P()
    assert _spec(("proj_in", "kernel"), (64, 64)) == P()
    assert _spec(("proj_out", "kernel"), (64, 64)) == P()
    assert _spec(("vision_model", "pos_embed"), (257, 64)) == P()


def test_divisibility_fallback():
    # a dim that does not divide tp replicates instead of sharding unevenly
    assert _spec(("attn1", "to_q", "kernel"), (64, 66), tp_size=4) == P()
    assert _spec(
        ("spatial_res_block", "conv2", "Conv_0", "kernel"), (3, 3, 66, 64),
        tp_size=4,
    ) == P()


def test_sharded_bytes_fraction_accounting():
    params = {
        "conv1": {"Conv_0": {"kernel": np.zeros((3, 3, 64, 64), np.float32),
                             "bias": np.zeros((64,), np.float32)}},
        "norm1": {"scale": np.zeros((64,), np.float32)},
    }
    sharded, total = sharded_bytes_fraction(params, tp_size=2)
    kernel_bytes = 3 * 3 * 64 * 64 * 4
    assert sharded == kernel_bytes
    assert total == kernel_bytes + 2 * 64 * 4
