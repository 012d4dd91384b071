"""Pallas kernel correctness tests (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from abx_tpu.ops.triangle import (triangle_multiply_einsum,
                                  triangle_multiply_pallas)


@pytest.mark.parametrize('per_row', [True, False])
@pytest.mark.parametrize('shape', [(1, 128, 16), (2, 160, 8)])
def test_triangle_kernel_matches_einsum(per_row, shape):
    b, l, c = shape
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.randn(b, l, l, c), jnp.float32)
    right = jnp.asarray(rng.randn(b, l, l, c), jnp.float32)
    want = np.asarray(triangle_multiply_einsum(left, right, per_row))
    got = np.asarray(triangle_multiply_pallas(left, right, per_row=per_row,
                                              tile=64, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
