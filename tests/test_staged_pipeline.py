"""Pipeline-parallel staged executor on the 8-virtual-device CPU mesh.

Checks: device-group partitioning, sp-even divisor choice, and that the
pipelined output matches the serial single-device pipeline (same params,
same noise) for a batch of clips submitted all-in-flight.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unigeo_tpu.parallel.staged import PipelinedStageExecutor, _largest_divisor_leq


def test_largest_divisor():
    assert _largest_divisor_leq(25, 6) == 5
    assert _largest_divisor_leq(4, 6) == 4
    assert _largest_divisor_leq(7, 3) == 1
    assert _largest_divisor_leq(24, 6) == 6


@pytest.mark.skipif(len(jax.devices()) < 3, reason="needs >= 3 devices")
def test_pipelined_matches_serial(shared_tiny_pipeline):
    pipe = shared_tiny_pipeline
    t, h, w = 4, 64, 64
    rng = np.random.default_rng(0)
    clips = rng.uniform(size=(3, t, h, w, 3)).astype(np.float32)
    noise = rng.normal(size=(3, t, h // 8, w // 8, 4)).astype(np.float32)
    aug = rng.normal(size=(3, t, h, w, 3)).astype(np.float32)

    ex = PipelinedStageExecutor(pipe, num_frames=t, num_inference_steps=2)
    # 8 devices: encode on [0], decode on [1], denoise sp group from the rest
    assert ex.mesh.devices.size == _largest_divisor_leq(t, len(jax.devices()) - 2)
    out = ex(clips, noise=noise, aug_noise=aug)

    serial = np.stack(
        [
            np.asarray(
                pipe.run_window_staged(
                    pipe.params, jnp.asarray(clips[i]), jnp.asarray(noise[i]),
                    2, aug_noise=jnp.asarray(aug[i]),
                )
            )
            for i in range(3)
        ]
    )
    serial = (serial + 1.0) / 2.0
    assert out.shape == serial.shape
    # sp-sharded temporal reductions reorder f32 sums; bound is relative
    scale = np.abs(serial).max()
    assert np.abs(out - serial).max() < 2e-3 * max(scale, 1.0), (
        np.abs(out - serial).max()
    )
