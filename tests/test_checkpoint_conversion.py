"""torch→flax weight-conversion numerics tests.

Builds real torch modules, converts their state dicts with
utils/checkpoint.py, grafts onto equivalent flax modules, and asserts the
outputs match — validating every layout transpose (conv2d HWIO, conv1d,
linear) and the name mapping end to end.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import flax.linen as nn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from unigeo_tpu.utils.checkpoint import (  # noqa: E402
    convert_state_dict,
    graft_flat_params,
    save_params,
    load_params,
)


def test_linear_conversion(rng):
    lin = torch.nn.Linear(8, 5)
    x = rng.normal(size=(3, 8)).astype(np.float32)
    golden = lin(torch.from_numpy(x)).detach().numpy()

    flat = convert_state_dict({f"dense.{k}": v for k, v in lin.state_dict().items()})
    model = nn.Dense(5, name="dense")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8)))
    grafted, matched, missed = graft_flat_params(params, flat)
    assert matched == 2 and not missed
    out = np.asarray(model.apply(grafted, jnp.asarray(x)))
    assert np.allclose(out, golden, atol=1e-5)


def test_conv2d_conversion(rng):
    conv = torch.nn.Conv2d(3, 6, kernel_size=3, padding=1)
    x = rng.normal(size=(2, 3, 10, 12)).astype(np.float32)
    golden = conv(torch.from_numpy(x)).detach().numpy()  # NCHW

    flat = convert_state_dict({f"conv.{k}": v for k, v in conv.state_dict().items()})
    model = nn.Conv(6, (3, 3), padding=((1, 1), (1, 1)), name="conv")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 12, 3)))
    grafted, matched, missed = graft_flat_params(params, flat)
    assert matched == 2 and not missed
    out = np.asarray(model.apply(grafted, jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert np.allclose(out.transpose(0, 3, 1, 2), golden, atol=1e-4)


def test_conv1d_conversion(rng):
    conv = torch.nn.Conv1d(4, 7, kernel_size=3, padding=1)
    x = rng.normal(size=(2, 4, 9)).astype(np.float32)  # NCL
    golden = conv(torch.from_numpy(x)).detach().numpy()

    flat = convert_state_dict({f"tconv.{k}": v for k, v in conv.state_dict().items()})
    model = nn.Conv(7, (3,), padding=((1, 1),), name="tconv")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 9, 4)))
    grafted, matched, missed = graft_flat_params(params, flat)
    assert matched == 2 and not missed
    out = np.asarray(model.apply(grafted, jnp.asarray(x.transpose(0, 2, 1))))
    assert np.allclose(out.transpose(0, 2, 1), golden, atol=1e-4)


def test_groupnorm_conversion(rng):
    gn = torch.nn.GroupNorm(2, 8)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(rng.normal(size=8).astype(np.float32)))
        gn.bias.copy_(torch.from_numpy(rng.normal(size=8).astype(np.float32)))
    x = rng.normal(size=(2, 8, 6, 6)).astype(np.float32)
    golden = gn(torch.from_numpy(x)).detach().numpy()

    flat = convert_state_dict({f"norm1.{k}": v for k, v in gn.state_dict().items()})
    model = nn.GroupNorm(num_groups=2, name="norm1")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 6, 8)))
    grafted, matched, missed = graft_flat_params(params, flat)
    assert matched == 2 and not missed
    out = np.asarray(model.apply(grafted, jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert np.allclose(out.transpose(0, 3, 1, 2), golden, atol=1e-4)


def test_orbax_roundtrip(tmp_path):
    params = {"a": np.arange(12, dtype=np.float32).reshape(3, 4),
              "nested": {"b": np.ones((2, 2), np.float32)}}
    path = str(tmp_path / "ckpt")
    save_params(params, path)
    loaded = load_params(path)
    assert np.array_equal(loaded["a"], params["a"])
    assert np.array_equal(loaded["nested"]["b"], params["nested"]["b"])
