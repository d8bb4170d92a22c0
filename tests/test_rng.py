"""Uniform-sampler tests: threefry fallback equivalence and the Pallas
hardware-PRNG kernel (interpret mode; the real kernel is exercised on TPU
by every render + the golden TPU parity check)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c_raytracer_tpu.core import rng


class TestFallback:
    @pytest.mark.skipif(jax.default_backend() == "tpu",
                        reason="TPU uses the hardware PRNG path")
    def test_cpu_matches_threefry(self):
        # on non-TPU backends uniform() IS jax.random.uniform
        k = jax.random.PRNGKey(7)
        a = rng.uniform(k, (17, 33))
        b = jax.random.uniform(k, (17, 33), jnp.float32)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestHardwareKernel:
    """Needs a real chip: Pallas interpret mode stubs prng_random_bits to
    zeros, so the kernel can only be validated where it actually runs."""

    @pytest.mark.skipif(jax.default_backend() != "tpu",
                        reason="hardware PRNG only exists on TPU")
    def test_range_and_determinism(self):
        u1 = np.asarray(rng.hw_uniform(jax.random.PRNGKey(3), (5, 1000)))
        u2 = np.asarray(rng.hw_uniform(jax.random.PRNGKey(3), (5, 1000)))
        u3 = np.asarray(rng.hw_uniform(jax.random.PRNGKey(4), (5, 1000)))
        assert u1.shape == (5, 1000)
        assert u1.min() >= 0.0 and u1.max() < 1.0
        np.testing.assert_array_equal(u1, u2)
        assert not np.array_equal(u1, u3)
        # crude uniformity: mean/std near 0.5 / 1/sqrt(12)
        assert abs(u1.mean() - 0.5) < 0.02
        assert abs(u1.std() - 0.2887) < 0.02

    @pytest.mark.skipif(jax.default_backend() != "tpu",
                        reason="hardware PRNG only exists on TPU")
    @pytest.mark.parametrize("shape", [
        # non-power-of-two shapes that hit the layout-preserving 2D path
        # (trail % 512 == 0): the r3 block-growth bug left output blocks
        # unwritten when cols % block_cols != 0 (trail=1536 -> block_cols
        # grew to 1024, grid cols = 1) or rows % block_rows != 0
        # (lead=384 with light_chunk>128)
        (2, 40, 1536),      # cols not a multiple of the grown block
        (384, 512),         # rows=384 not a multiple of 256
        (3, 88, 1024),      # rows=264: needs block_rows=8 fallback
    ])
    def test_nonpow2_shapes_fully_written(self, shape):
        u1 = np.asarray(rng.hw_uniform(jax.random.PRNGKey(5), shape))
        u2 = np.asarray(rng.hw_uniform(jax.random.PRNGKey(5), shape))
        assert u1.shape == shape
        assert u1.min() >= 0.0 and u1.max() < 1.0
        np.testing.assert_array_equal(u1, u2)  # determinism = every block
        #                                        written by the kernel
        # every 512-wide column stripe must look uniform, not stale memory
        flat = u1.reshape(-1, shape[-1])
        for c0 in range(0, shape[-1], 512):
            stripe = flat[:, c0:c0 + 512]
            assert abs(stripe.mean() - 0.5) < 0.05, c0
            assert stripe.std() > 0.2, c0
