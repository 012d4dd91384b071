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


class TestTriangleAttention:
    @pytest.mark.parametrize('shape', [(1, 16, 2, 64, 16), (2, 10, 3, 40, 8)])
    def test_fused_matches_reference(self, shape):
        from abx_tpu.ops.tri_attention import (triangle_attention_fused,
                                               triangle_attention_reference)
        b, r, h, l, d = shape
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(b, r, h, l, d), jnp.float32)
        k = jnp.asarray(rng.randn(b, r, h, l, d), jnp.float32)
        v = jnp.asarray(rng.randn(b, r, h, l, d), jnp.float32)
        bias = jnp.asarray(rng.randn(b, h, l, l), jnp.float32)
        mask = jnp.ones((b, l)).at[:, -3:].set(0)
        want = np.asarray(triangle_attention_reference(q, k, v, bias, mask))
        got = np.asarray(triangle_attention_fused(q, k, v, bias, mask,
                                                  row_block=4,
                                                  interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
