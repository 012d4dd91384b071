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


class TestTriangleAttentionPacked:
    @pytest.mark.parametrize('shape', [(1, 16, 32, 24, 4, 6),
                                       (2, 10, 40, 16, 2, 8)])
    def test_packed_matches_reference(self, shape):
        from abx_tpu.ops.tri_attention import (
            triangle_attention_packed, triangle_attention_packed_reference)
        b, r, l, c, h, d = shape
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(b, r, l, c), jnp.float32)
        wq = jnp.asarray(0.1 * rng.randn(c, h * d), jnp.float32)
        wk = jnp.asarray(0.1 * rng.randn(c, h * d), jnp.float32)
        wv = jnp.asarray(0.1 * rng.randn(c, h * d), jnp.float32)
        bias = jnp.asarray(rng.randn(b, h, l, l), jnp.float32)
        mask = jnp.ones((b, l)).at[:, -3:].set(0)
        want = np.asarray(triangle_attention_packed_reference(
            x, wq, wk, wv, bias, mask))
        got = np.asarray(triangle_attention_packed(
            x, wq, wk, wv, bias, mask, row_block=4, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_row_padding(self):
        """Rows not divisible by row_block are padded and cropped."""
        from abx_tpu.ops.tri_attention import (
            triangle_attention_packed, triangle_attention_packed_reference)
        b, r, l, c, h, d = 1, 7, 24, 16, 2, 8
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(b, r, l, c), jnp.float32)
        wq = jnp.asarray(0.1 * rng.randn(c, h * d), jnp.float32)
        wk = jnp.asarray(0.1 * rng.randn(c, h * d), jnp.float32)
        wv = jnp.asarray(0.1 * rng.randn(c, h * d), jnp.float32)
        bias = jnp.asarray(rng.randn(b, h, l, l), jnp.float32)
        mask = jnp.ones((b, l))
        want = np.asarray(triangle_attention_packed_reference(
            x, wq, wk, wv, bias, mask))
        got = np.asarray(triangle_attention_packed(
            x, wq, wk, wv, bias, mask, row_block=4, interpret=True))
        assert got.shape == (b, r, l, h * d)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


class TestFusedTransition:
    def test_matches_reference(self):
        from abx_tpu.ops.transition import (fused_transition,
                                            fused_transition_reference)
        rng = np.random.RandomState(3)
        b, r, l, c, n = 2, 12, 16, 24, 96
        x = jnp.asarray(rng.randn(b, r, l, c), jnp.float32)
        scale = jnp.asarray(1.0 + 0.1 * rng.randn(c), jnp.float32)
        bias = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
        w1 = jnp.asarray(0.1 * rng.randn(c, n), jnp.float32)
        b1 = jnp.asarray(0.1 * rng.randn(n), jnp.float32)
        w2 = jnp.asarray(0.1 * rng.randn(n, c), jnp.float32)
        b2 = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
        want = np.asarray(fused_transition_reference(
            x, scale, bias, w1, b1, w2, b2))
        got = np.asarray(fused_transition(
            x, scale, bias, w1, b1, w2, b2, row_block=8, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_transition_module_paths_agree(self):
        """Functional path with residual == LN+MLP+add composition."""
        import flax.linen as nn_
        from abx_tpu.models.seqformer import Transition
        import ml_collections
        cfg = ml_collections.ConfigDict({'num_intermediate_factor': 4})
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.randn(1, 6, 8, 16), jnp.float32)
        m = Transition(cfg)
        params = m.init(jax.random.PRNGKey(0), x)
        no_res = m.apply(params, x)
        res = m.apply(params, x, residual=True)
        np.testing.assert_allclose(np.asarray(res), np.asarray(x + no_res),
                                   rtol=1e-5, atol=1e-5)


class TestTriMultKernels:
    def _inputs(self, b=1, r=16, l=16, c=24, nc=8, seed=5):
        rng = np.random.RandomState(seed)
        x = jnp.asarray(rng.randn(b, r, l, c), jnp.float32)
        scale = jnp.asarray(1.0 + 0.1 * rng.randn(c), jnp.float32)
        bias = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
        w = jnp.asarray(0.1 * rng.randn(c, 4 * nc + c), jnp.float32)
        wb = jnp.asarray(0.1 * rng.randn(4 * nc + c), jnp.float32)
        mask = jnp.ones((b, l)).at[:, -2:].set(0)
        return x, scale, bias, w, wb, mask, nc

    def test_pre_matches_reference(self):
        from abx_tpu.ops.tri_mult import (tri_mult_pre,
                                          tri_mult_pre_reference)
        x, scale, bias, w, wb, mask, nc = self._inputs()
        want = tri_mult_pre_reference(x, scale, bias, w, wb, mask)
        got = tri_mult_pre(x, scale, bias, w, wb, mask, row_block=4,
                           interpret=True)
        for g, wnt in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(wnt),
                                       rtol=2e-5, atol=2e-5)

    def test_post_matches_reference(self):
        from abx_tpu.ops.tri_mult import (tri_mult_post,
                                          tri_mult_post_reference)
        rng = np.random.RandomState(6)
        b, r, l, nc, c = 1, 12, 16, 8, 24
        y = jnp.asarray(rng.randn(b, r, l, nc), jnp.float32)
        scale = jnp.asarray(1.0 + 0.1 * rng.randn(nc), jnp.float32)
        bias = jnp.asarray(0.1 * rng.randn(nc), jnp.float32)
        w = jnp.asarray(0.1 * rng.randn(nc, c), jnp.float32)
        wb = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
        fg = jnp.asarray(rng.randn(b, r, l, c), jnp.float32)
        res = jnp.asarray(rng.randn(b, r, l, c), jnp.float32)
        want = tri_mult_post_reference(y, scale, bias, w, wb, fg, res)
        got = tri_mult_post(y, scale, bias, w, wb, fg, res, row_block=4,
                            interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_gatefold_path_matches_emitted_fgate(self):
        """pre(emit_fgate=False) -> contraction -> post_gatefold equals the
        emitted-fgate composite (fgate recomputed in-kernel from the
        residual with the pre LN params), including row padding."""
        from abx_tpu.ops.tri_mult import (
            tri_mult_post, tri_mult_post_gatefold,
            tri_mult_post_gatefold_reference, tri_mult_pre)
        from abx_tpu.ops.triangle import triangle_multiply_einsum
        rng = np.random.RandomState(9)
        b, l, c, nc = 1, 14, 24, 8
        x = jnp.asarray(rng.randn(b, l, l, c), jnp.float32)
        scale = jnp.asarray(1.0 + 0.1 * rng.randn(c), jnp.float32)
        bias = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
        w = jnp.asarray(0.1 * rng.randn(c, 4 * nc + c), jnp.float32)
        wb = jnp.asarray(0.1 * rng.randn(4 * nc + c), jnp.float32)
        mask = jnp.ones((b, l)).at[:, -1:].set(0)
        fscale = jnp.asarray(1.0 + 0.1 * rng.randn(nc), jnp.float32)
        fbias = jnp.asarray(0.1 * rng.randn(nc), jnp.float32)
        wout = jnp.asarray(0.1 * rng.randn(nc, c), jnp.float32)
        bout = jnp.asarray(0.1 * rng.randn(c), jnp.float32)

        for per_row in (True, False):
            # Emitted-fgate composite (the shipped default path).
            left, right, fg = tri_mult_pre(x, scale, bias, w, wb, mask,
                                           row_block=4, interpret=True)
            y = triangle_multiply_einsum(left, right, per_row=per_row)
            want = tri_mult_post(y, fscale, fbias, wout, bout, fg, x,
                                 row_block=4, interpret=True)
            # Gate-fold composite: fgate block of w/wb split out.
            w4, wg = w[:, :4 * nc], w[:, 4 * nc:]
            wb4, wgb = wb[:4 * nc], wb[4 * nc:]
            l2, r2 = tri_mult_pre(x, scale, bias, w4, wb4, mask,
                                  row_block=4, emit_fgate=False,
                                  interpret=True)
            np.testing.assert_allclose(np.asarray(l2), np.asarray(left),
                                       rtol=2e-5, atol=2e-5)
            np.testing.assert_allclose(np.asarray(r2), np.asarray(right),
                                       rtol=2e-5, atol=2e-5)
            y2 = triangle_multiply_einsum(l2, r2, per_row=per_row)
            got = tri_mult_post_gatefold(y2, fscale, fbias, wout, bout,
                                         scale, bias, wg, wgb, x,
                                         row_block=4, interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-5, atol=2e-5)
            # And the twin.
            tw = tri_mult_post_gatefold_reference(
                y2, fscale, fbias, wout, bout, scale, bias, wg, wgb, x)
            np.testing.assert_allclose(np.asarray(got), np.asarray(tw),
                                       rtol=2e-5, atol=2e-5)

    def test_c_major_path_matches_row_major(self):
        """pre(c_major) -> c-major contraction -> post(y_c_major) gives the
        same result as the row-major path, both orientations — including
        row padding (r=14 with row_block=4)."""
        from abx_tpu.ops.tri_mult import (tri_mult_post,
                                          tri_mult_post_reference,
                                          tri_mult_pre,
                                          tri_mult_pre_reference)
        from abx_tpu.ops.triangle import (triangle_multiply_c_major,
                                          triangle_multiply_einsum)
        rng = np.random.RandomState(8)
        b, l, c, nc = 1, 14, 24, 8
        x = jnp.asarray(rng.randn(b, l, l, c), jnp.float32)
        scale = jnp.asarray(1.0 + 0.1 * rng.randn(c), jnp.float32)
        bias = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
        w = jnp.asarray(0.1 * rng.randn(c, 4 * nc + c), jnp.float32)
        wb = jnp.asarray(0.1 * rng.randn(4 * nc + c), jnp.float32)
        fscale = jnp.asarray(1.0 + 0.1 * rng.randn(nc), jnp.float32)
        fbias = jnp.asarray(0.1 * rng.randn(nc), jnp.float32)
        wout = jnp.asarray(0.1 * rng.randn(nc, c), jnp.float32)
        bout = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
        mask = jnp.ones((b, l)).at[:, -2:].set(0)

        lw, rw, fgw = tri_mult_pre_reference(x, scale, bias, w, wb, mask)
        lc, rc, fgc = tri_mult_pre(x, scale, bias, w, wb, mask,
                                   row_block=4, c_major=True,
                                   interpret=True)
        np.testing.assert_allclose(np.asarray(lc),
                                   np.asarray(lw).transpose(0, 3, 1, 2),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(rc),
                                   np.asarray(rw).transpose(0, 3, 1, 2),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(fgc), np.asarray(fgw),
                                   rtol=2e-5, atol=2e-5)
        for per_row in (True, False):
            yw = triangle_multiply_einsum(lw, rw, per_row=per_row)
            yc = triangle_multiply_c_major(lc, rc, per_row=per_row)
            np.testing.assert_allclose(
                np.asarray(yc), np.asarray(yw).transpose(0, 3, 1, 2),
                rtol=2e-4, atol=2e-4)
            want = tri_mult_post_reference(yw, fscale, fbias, wout, bout,
                                           fgw, x)
            got = tri_mult_post(yc, fscale, fbias, wout, bout, fgc, x,
                                row_block=4, y_c_major=True,
                                interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-4, atol=2e-4)

    def test_module_residual_path_matches_delta_path(self):
        """residual=True (CPU functional) == act + delta."""
        import ml_collections
        from abx_tpu.models.seqformer import TriangleMultiplication
        cfg = ml_collections.ConfigDict({
            'num_intermediate_channel': 8, 'gating': True,
            'orientation': 'per_row'})
        rng = np.random.RandomState(7)
        x = jnp.asarray(rng.randn(1, 10, 10, 16), jnp.float32)
        mask = jnp.ones((1, 10))
        m = TriangleMultiplication(cfg)
        params = m.init(jax.random.PRNGKey(0), x, mask)
        delta = m.apply(params, x, mask)
        res = m.apply(params, x, mask, residual=True)
        np.testing.assert_allclose(np.asarray(res), np.asarray(x + delta),
                                   rtol=1e-5, atol=1e-5)


class TestESMAttention:
    def test_matches_reference(self):
        from abx_tpu.ops.esm_attention import (esm_attention,
                                               esm_attention_reference)
        rng = np.random.RandomState(8)
        b, h, l, d = 2, 3, 30, 16
        q = jnp.asarray(rng.randn(b, h, l, d), jnp.float32)
        k = jnp.asarray(rng.randn(b, h, l, d), jnp.float32)
        v = jnp.asarray(rng.randn(b, h, l, d), jnp.float32)
        pad = jnp.zeros((b, l)).at[:, -4:].set(1)
        want = np.asarray(esm_attention_reference(q, k, v, pad))
        got = np.asarray(esm_attention(q, k, v, pad, interpret=True))
        # valid (non-pad) positions must match; pad outputs are garbage
        valid = ~np.asarray(pad, bool)
        np.testing.assert_allclose(got[:, :, :-4], want[:, :, :-4],
                                   rtol=2e-5, atol=2e-5)


class TestIPAAttend:
    def test_matches_reference(self):
        from abx_tpu.ops.ipa_attend import (ipa_pair_attend,
                                            ipa_pair_attend_reference)
        rng = np.random.RandomState(9)
        b, h, l, c = 2, 3, 20, 16
        attn = jnp.asarray(rng.rand(b, h, l, l), jnp.float32)
        pair = jnp.asarray(rng.randn(b, l, l, c), jnp.float32)
        want = np.asarray(ipa_pair_attend_reference(attn, pair))
        got = np.asarray(ipa_pair_attend(attn, pair, row_block=4,
                                         interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_row_padding(self):
        from abx_tpu.ops.ipa_attend import (ipa_pair_attend,
                                            ipa_pair_attend_reference)
        rng = np.random.RandomState(10)
        b, h, l, c = 1, 2, 13, 8
        attn = jnp.asarray(rng.rand(b, h, l, l), jnp.float32)
        pair = jnp.asarray(rng.randn(b, l, l, c), jnp.float32)
        want = np.asarray(ipa_pair_attend_reference(attn, pair))
        got = np.asarray(ipa_pair_attend(attn, pair, row_block=4,
                                         interpret=True))
        assert got.shape == (b, l, h * c)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


class TestPackedBf16Paths:
    def test_bf16_fused_proj_and_softmax(self, monkeypatch):
        """The bf16-only kernel paths (full-lane fused projection + bf16
        softmax exp) match the f32 reference twin to bf16 tolerance."""
        from abx_tpu.ops import tri_attention as ta
        monkeypatch.setenv('ABX_TRI_ATTN_FUSED_PROJ', '1')
        monkeypatch.setenv('ABX_TRI_ATTN_BF16_EXP', '1')
        rng = np.random.RandomState(11)
        b, r, l, c, h, d = 1, 16, 32, 24, 4, 6
        x = jnp.asarray(rng.randn(b, r, l, c), jnp.bfloat16)
        wq = jnp.asarray(0.1 * rng.randn(c, h * d), jnp.float32)
        wk = jnp.asarray(0.1 * rng.randn(c, h * d), jnp.float32)
        wv = jnp.asarray(0.1 * rng.randn(c, h * d), jnp.float32)
        bias = jnp.asarray(rng.randn(b, h, l, l), jnp.float32)
        mask = jnp.ones((b, l)).at[:, -3:].set(0)
        want = np.asarray(ta.triangle_attention_packed_reference(
            x.astype(jnp.float32), wq, wk, wv, bias, mask))
        got = np.asarray(ta.triangle_attention_packed(
            x, wq, wk, wv, bias, mask, row_block=4,
            interpret=True)).astype(np.float32)
        np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


class TestGateProjResidual:
    def test_matches_reference(self):
        from abx_tpu.ops.gate_proj import (gate_proj_residual,
                                           gate_proj_residual_reference)
        rng = np.random.RandomState(12)
        b, r, l, hd, c = 2, 12, 16, 24, 20
        y = jnp.asarray(rng.randn(b, r, l, hd), jnp.float32)
        g = jnp.asarray(rng.randn(b, r, l, hd), jnp.float32)
        w = jnp.asarray(0.1 * rng.randn(hd, c), jnp.float32)
        wb = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
        res = jnp.asarray(rng.randn(b, r, l, c), jnp.float32)
        want = np.asarray(gate_proj_residual_reference(y, g, w, wb, res))
        got = np.asarray(gate_proj_residual(y, g, w, wb, res, row_block=4,
                                            interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_triangle_attention_residual_path(self):
        """Functional residual path == pair_act + delta (CPU)."""
        import ml_collections
        from abx_tpu.models.seqformer import TriangleAttention
        for orient in ('per_row', 'per_column'):
            cfg = ml_collections.ConfigDict({
                'orientation': orient, 'num_head': 2, 'gating': True})
            rng = np.random.RandomState(13)
            x = jnp.asarray(rng.randn(1, 10, 10, 16), jnp.float32)
            mask = jnp.ones((1, 10))
            m = TriangleAttention(cfg)
            params = m.init(jax.random.PRNGKey(0), x, mask)
            delta = m.apply(params, x, mask)
            res = m.apply(params, x, mask, residual=True)
            np.testing.assert_allclose(np.asarray(res),
                                       np.asarray(x + delta),
                                       rtol=1e-5, atol=1e-5)


class TestRecycleEmbed:
    def test_interpret_matches_reference(self):
        from abx_tpu.ops.recycle_embed import (recycle_embed,
                                               recycle_embed_reference)
        rng = np.random.RandomState(0)
        b, l, c0, c1, nb = 2, 24, 16, 8, 15
        c = c0 + 2 * c1
        static = rng.randn(b, l, l, c0).astype(np.float32)
        tvec = rng.randn(b, 2 * c1).astype(np.float32)
        prev = rng.randn(b, l, l, c).astype(np.float32)
        scale = rng.rand(c).astype(np.float32) + 0.5
        bias = rng.randn(c).astype(np.float32)
        table = rng.randn(nb, c).astype(np.float32)
        bins = rng.randint(0, nb, (b, l, l)).astype(np.int32)
        want = np.asarray(recycle_embed_reference(
            jnp.asarray(static), jnp.asarray(tvec), jnp.asarray(prev),
            jnp.asarray(scale), jnp.asarray(bias), jnp.asarray(table),
            jnp.asarray(bins)))
        got = np.asarray(recycle_embed(
            jnp.asarray(static), jnp.asarray(tvec), jnp.asarray(prev),
            jnp.asarray(scale), jnp.asarray(bias), jnp.asarray(table),
            jnp.asarray(bins), interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_model_fallback_matches_kernel_semantics(self):
        """The module's fallback path (functional LN + take) must equal the
        kernel's reference twin given the same params/inputs — covered by
        comparing the twin against a hand computation."""
        from abx_tpu.ops.recycle_embed import recycle_embed_reference
        rng = np.random.RandomState(1)
        b, l, c0, c1, nb = 1, 6, 4, 2, 5
        c = c0 + 2 * c1
        static = rng.randn(b, l, l, c0).astype(np.float32)
        tvec = rng.randn(b, 2 * c1).astype(np.float32)
        prev = rng.randn(b, l, l, c).astype(np.float32)
        scale = np.ones(c, np.float32)
        bias = np.zeros(c, np.float32)
        table = rng.randn(nb, c).astype(np.float32)
        bins = rng.randint(0, nb, (b, l, l)).astype(np.int32)
        got = np.asarray(recycle_embed_reference(
            *(jnp.asarray(x) for x in
              (static, tvec, prev, scale, bias, table, bins))))
        mean = prev.mean(-1, keepdims=True)
        var = prev.var(-1, keepdims=True)
        ln = (prev - mean) / np.sqrt(var + 1e-5)
        base = np.concatenate(
            [static, np.broadcast_to(tvec[:, None, None, :],
                                     (b, l, l, 2 * c1))], -1)
        want = base + ln + table[bins]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestTriAttentionLnFold:
    def _case(self, dtype, monkeypatch=None, rtol=2e-4, atol=2e-4):
        from abx_tpu.ops.tri_attention import (
            triangle_attention_packed, triangle_attention_packed_reference)
        rng = np.random.RandomState(7)
        b, r, l, c, h = 2, 12, 12, 8, 2
        x = rng.randn(b, r, l, c).astype(np.float32)
        scale = rng.rand(c).astype(np.float32) + 0.5
        lnb = rng.randn(c).astype(np.float32) * 0.1
        wq, wk, wv, wg = (rng.randn(c, c).astype(np.float32) * 0.3
                          for _ in range(4))
        bg = rng.randn(c).astype(np.float32) * 0.1
        bias = rng.randn(b, h, l, l).astype(np.float32)
        mask = np.ones((b, l), np.float32)
        mask[:, -2:] = 0.0

        def ln_f(v):
            m = v.mean(-1, keepdims=True)
            va = np.maximum((v * v).mean(-1, keepdims=True) - m * m, 0.0)
            return (v - m) / np.sqrt(va + 1e-5) * scale + lnb
        ln_x = ln_f(x).astype(dtype)
        want = np.asarray(triangle_attention_packed_reference(
            jnp.asarray(ln_x), jnp.asarray(wq), jnp.asarray(wk),
            jnp.asarray(wv), jnp.asarray(bias), jnp.asarray(mask))
        ).astype(np.float32)
        gate = 1.0 / (1.0 + np.exp(-(ln_f(x) @ wg + bg)))
        want = want * gate
        got = np.asarray(triangle_attention_packed(
            jnp.asarray(x.astype(dtype)), jnp.asarray(wq), jnp.asarray(wk),
            jnp.asarray(wv), jnp.asarray(bias), jnp.asarray(mask),
            row_block=4, ln=(jnp.asarray(scale), jnp.asarray(lnb)),
            gate=(jnp.asarray(wg), jnp.asarray(bg)),
            interpret=True)).astype(np.float32)
        np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)

    def test_f32_separate_gate_dot(self):
        self._case(np.float32)

    def test_bf16_fused_proj(self, monkeypatch):
        monkeypatch.setenv('ABX_TRI_ATTN_FUSED_PROJ', '1')
        monkeypatch.setenv('ABX_TRI_ATTN_BF16_EXP', '0')
        import ml_dtypes
        self._case(ml_dtypes.bfloat16, rtol=0.1, atol=0.1)

    @pytest.mark.parametrize('r', [12, 10])  # 10: row-padding path
    def test_out_proj_residual_epilogue(self, r):
        """ln+gate+out_proj+residual: kernel emits the new pair block."""
        from abx_tpu.ops.tri_attention import (
            triangle_attention_packed, triangle_attention_packed_reference)
        rng = np.random.RandomState(8)
        b, l, c, h, c_out = 2, 12, 8, 2, 16
        x = rng.randn(b, r, l, c).astype(np.float32)
        scale = rng.rand(c).astype(np.float32) + 0.5
        lnb = rng.randn(c).astype(np.float32) * 0.1
        wq, wk, wv, wg = (rng.randn(c, c).astype(np.float32) * 0.3
                          for _ in range(4))
        bg = rng.randn(c).astype(np.float32) * 0.1
        wo = rng.randn(c, c_out).astype(np.float32) * 0.3
        bo = rng.randn(c_out).astype(np.float32) * 0.1
        res = rng.randn(b, r, l, c_out).astype(np.float32)
        bias = rng.randn(b, h, l, l).astype(np.float32)
        mask = np.ones((b, l), np.float32)
        mask[:, -2:] = 0.0

        def ln_f(v):
            m = v.mean(-1, keepdims=True)
            va = np.maximum((v * v).mean(-1, keepdims=True) - m * m, 0.0)
            return (v - m) / np.sqrt(va + 1e-5) * scale + lnb
        ln_x = ln_f(x)
        attended = np.asarray(triangle_attention_packed_reference(
            jnp.asarray(ln_x), jnp.asarray(wq), jnp.asarray(wk),
            jnp.asarray(wv), jnp.asarray(bias), jnp.asarray(mask)))
        gate = 1.0 / (1.0 + np.exp(-(ln_x @ wg + bg)))
        want = res + (attended * gate) @ wo + bo
        got = np.asarray(triangle_attention_packed(
            jnp.asarray(x), jnp.asarray(wq), jnp.asarray(wk),
            jnp.asarray(wv), jnp.asarray(bias), jnp.asarray(mask),
            row_block=4, ln=(jnp.asarray(scale), jnp.asarray(lnb)),
            gate=(jnp.asarray(wg), jnp.asarray(bg)),
            out_proj=(jnp.asarray(wo), jnp.asarray(bo)),
            residual=jnp.asarray(res), interpret=True))
        assert got.shape == (b, r, l, c_out)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


class TestTriAttentionCols:
    def test_interpret_matches_reference(self):
        from abx_tpu.ops.tri_attention import (
            triangle_attention_packed_cols,
            triangle_attention_packed_cols_reference)
        rng = np.random.RandomState(3)
        b, l, c, h = 2, 16, 8, 2
        hd = c  # key/value dim == channels, as in the model
        x = rng.randn(b, l, l, c).astype(np.float32)
        scale = rng.rand(c).astype(np.float32) + 0.5
        lnb = rng.randn(c).astype(np.float32) * 0.1
        wq, wk, wv, wg = (rng.randn(c, hd).astype(np.float32) * 0.3
                          for _ in range(4))
        bg = rng.randn(hd).astype(np.float32) * 0.1
        bias = rng.randn(b, h, l, l).astype(np.float32)
        mask = np.ones((b, l), np.float32)
        mask[:, -3:] = 0.0
        args = [jnp.asarray(v) for v in
                (x, scale, lnb, wq, wk, wv, wg, bg, bias, mask)]
        want = np.asarray(triangle_attention_packed_cols_reference(*args))
        got = np.asarray(triangle_attention_packed_cols(
            *args, col_block=4, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_wiring_matches_transposed_node(self):
        """The model's new ending-node route (pair_bias on the NATURAL
        tensor + (0,3,2,1) bias transpose + column attention) must equal
        the old route (materialise pair^T, LN, bias from the transposed
        tensor, attend, transpose back)."""
        from abx_tpu.ops.pair_bias import pair_bias_proj_reference
        from abx_tpu.ops.tri_attention import (
            triangle_attention_packed_cols_reference,
            triangle_attention_packed_reference)
        rng = np.random.RandomState(5)
        b, l, c, h = 2, 12, 8, 2
        pair = rng.randn(b, l, l, c).astype(np.float32)
        scale = rng.rand(c).astype(np.float32) + 0.5
        lnb = rng.randn(c).astype(np.float32) * 0.1
        wp = rng.randn(c, h).astype(np.float32) * 0.3
        wq, wk, wv, wg = (rng.randn(c, c).astype(np.float32) * 0.3
                          for _ in range(4))
        bg = rng.randn(c).astype(np.float32) * 0.1
        mask = np.ones((b, l), np.float32)
        mask[:, -2:] = 0.0

        # Old route, on the transposed tensor.
        def ln_f(x):
            m = x.mean(-1, keepdims=True)
            v = np.maximum((x * x).mean(-1, keepdims=True) - m * m, 0.0)
            return (x - m) / np.sqrt(v + 1e-5) * scale + lnb
        pt = np.swapaxes(pair, 1, 2)
        ln_t = ln_f(pt)
        bias_att = np.moveaxis(ln_t @ wp, -1, -3)       # (B, H, L, L)
        out_t = np.asarray(triangle_attention_packed_reference(
            jnp.asarray(ln_t), jnp.asarray(wq), jnp.asarray(wk),
            jnp.asarray(wv), jnp.asarray(bias_att), jnp.asarray(mask)))
        gate = 1.0 / (1.0 + np.exp(-(ln_t @ wg + bg)))
        want = np.swapaxes(out_t * gate, 1, 2)

        # New route, natural tensor only.
        bias_nat = np.asarray(pair_bias_proj_reference(
            jnp.asarray(pair), jnp.asarray(scale), jnp.asarray(lnb),
            jnp.asarray(wp)))
        bias_t = np.transpose(bias_nat, (0, 3, 2, 1))
        got = np.asarray(triangle_attention_packed_cols_reference(
            jnp.asarray(pair), jnp.asarray(scale), jnp.asarray(lnb),
            jnp.asarray(wq), jnp.asarray(wk), jnp.asarray(wv),
            jnp.asarray(wg), jnp.asarray(bg), jnp.asarray(bias_t),
            jnp.asarray(mask)))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_col_padding(self):
        from abx_tpu.ops.tri_attention import (
            triangle_attention_packed_cols,
            triangle_attention_packed_cols_reference)
        rng = np.random.RandomState(4)
        b, l, c, h = 1, 10, 8, 2  # l not divisible by col_block
        x = rng.randn(b, l, l, c).astype(np.float32)
        scale = np.ones(c, np.float32)
        lnb = np.zeros(c, np.float32)
        wq, wk, wv, wg = (rng.randn(c, c).astype(np.float32) * 0.3
                          for _ in range(4))
        bg = np.zeros(c, np.float32)
        bias = rng.randn(b, h, l, l).astype(np.float32)
        mask = np.ones((b, l), np.float32)
        args = [jnp.asarray(v) for v in
                (x, scale, lnb, wq, wk, wv, wg, bg, bias, mask)]
        want = np.asarray(triangle_attention_packed_cols_reference(*args))
        got = np.asarray(triangle_attention_packed_cols(
            *args, col_block=4, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


class TestPairBiasProj:
    def test_interpret_matches_reference(self):
        from abx_tpu.ops.pair_bias import (pair_bias_proj,
                                           pair_bias_proj_reference)
        rng = np.random.RandomState(0)
        b, l, c, h = 2, 24, 16, 4
        pair = rng.randn(b, l, l, c).astype(np.float32)
        scale = rng.rand(c).astype(np.float32) + 0.5
        bias = rng.randn(c).astype(np.float32)
        w = rng.randn(c, h).astype(np.float32)
        want = np.asarray(pair_bias_proj_reference(
            jnp.asarray(pair), jnp.asarray(scale), jnp.asarray(bias),
            jnp.asarray(w)))
        got = np.asarray(pair_bias_proj(
            jnp.asarray(pair), jnp.asarray(scale), jnp.asarray(bias),
            jnp.asarray(w), row_block=4, interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        # transpose_out: the (B, H, L, L) attention-bias layout.
        got_t = np.asarray(pair_bias_proj(
            jnp.asarray(pair), jnp.asarray(scale), jnp.asarray(bias),
            jnp.asarray(w), row_block=4, transpose_out=True,
            interpret=True))
        np.testing.assert_allclose(got_t, np.moveaxis(want, -1, -3),
                                   rtol=1e-5, atol=1e-5)


class TestIpaAttentionKernel:
    @pytest.mark.parametrize('l', [24, 20])  # 20: row-padding path
    def test_interpret_matches_reference(self, l):
        from abx_tpu.ops.ipa_attention import (ipa_attention,
                                               ipa_attention_reference)
        rng = np.random.RandomState(11)
        b, h, ds, pq, pv, c = 2, 3, 8, 2, 4, 16
        qs = rng.randn(b, l, h, ds).astype(np.float32) * 0.5
        ks = rng.randn(b, l, h, ds).astype(np.float32) * 0.5
        vs = rng.randn(b, l, h, ds).astype(np.float32)
        qp = rng.randn(b, l, h, pq, 3).astype(np.float32)
        kp = rng.randn(b, l, h, pq, 3).astype(np.float32)
        vp = rng.randn(b, l, h, pv, 3).astype(np.float32)
        pw = -0.3 * (rng.rand(h).astype(np.float32) + 0.5)
        bias = rng.randn(b, h, l, l).astype(np.float32)
        mask = np.ones((b, l), np.float32)
        mask[:, -3:] = 0.0
        pair = rng.randn(b, l, l, c).astype(np.float32)
        args = [jnp.asarray(v) for v in
                (qs, ks, vs, qp, kp, vp, pw, bias, mask, pair)]
        want_s, want_p, want_2d = (np.asarray(o) for o in
                                   ipa_attention_reference(*args))
        got_s, got_p, got_2d = (np.asarray(o) for o in ipa_attention(
            *args, row_block=8, interpret=True))
        np.testing.assert_allclose(got_s, want_s, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(got_p, want_p, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(got_2d, want_2d, rtol=2e-4, atol=2e-4)


class TestPackedSeqAttnWiring:
    def test_regrouped_weights_match_module(self):
        """The per-head [q|k|v] -> [q_all|k_all|v_all] weight regrouping
        feeding the packed kernel reproduces the module's fallback path
        (LN + fused qkv proj + biased softmax + gate + out-proj + res)."""
        import ml_collections
        from abx_tpu.models.seqformer import SeqAttentionWithPairBias
        from abx_tpu.ops.tri_attention import triangle_attention_packed
        cfg = ml_collections.ConfigDict(
            {'num_head': 4, 'orientation': 'per_row', 'dropout_rate': 0.0,
             'shared_dropout': True})
        b, l, cs, cp = 1, 12, 16, 8
        rng = np.random.RandomState(9)
        seq = jnp.asarray(rng.randn(b, l, cs), jnp.float32)
        pair = jnp.asarray(rng.randn(b, l, l, cp), jnp.float32)
        mask = jnp.ones((b, l)).at[:, -2:].set(0)
        m = SeqAttentionWithPairBias(cfg)
        params = m.init(jax.random.PRNGKey(0), seq, pair, mask)
        want = np.asarray(m.apply(params, seq, pair, mask, residual=True))

        p = jax.tree_util.tree_map(jnp.asarray, params['params'])
        attn = p['attn']
        kin = attn['proj_in']['kernel']
        h, kd = 4, cs // 4
        w3 = kin.reshape(cs, h, 3, kd)
        wq, wk, wv = (w3[:, :, i].reshape(cs, h * kd) for i in range(3))
        # Pair bias exactly as the module's fallback computes it.
        pn = (pair - pair.mean(-1, keepdims=True)) / jnp.sqrt(
            pair.var(-1, keepdims=True) + 1e-5)
        pn = pn * p['pair_norm']['scale'] + p['pair_norm']['bias']
        bias = jnp.moveaxis(jnp.dot(pn, p['proj_pair']['kernel']), -1, -3)
        got = np.asarray(triangle_attention_packed(
            seq[:, None], wq, wk, wv, bias, mask, row_block=1,
            ln=(p['seq_norm']['scale'], p['seq_norm']['bias']),
            gate=(attn['gate']['kernel'], attn['gate']['bias']),
            out_proj=(attn['proj_out']['kernel'], attn['proj_out']['bias']),
            residual=seq[:, None], interpret=True))[:, 0]
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
