"""Golden parity: SpatialDepthWiseInception (inp_kernels) vs the reference.

The reference ships SDWI (seqformer.py:632-674) wired into Attention
q/k/v (:254-258,283-288) and TriangleMultiplication left/right projections
(:437-478), but DISABLED in the released config (`inp_kernels: []`).  This
test enables it in both implementations with converted weights so a
checkpoint trained with it enabled would convert and run (VERDICT r2
missing #5) — including the reference's s-major `(rows·heads)` grouping
quirk on the pair track.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = '/root/reference'
HAS_REFERENCE = os.path.isdir(os.path.join(REFERENCE, 'abx'))

pytestmark = pytest.mark.skipif(not HAS_REFERENCE,
                                reason='reference not mounted')


@pytest.fixture(scope='module')
def ref_seqformer():
    from tests.test_parity_network import _install_stubs
    _install_stubs()
    sys.path.insert(0, REFERENCE)
    from abx.model import seqformer as ref_sf
    return ref_sf


def _sub_sd(module, prefix=''):
    import torch
    with torch.no_grad():
        return {k: v.numpy() for k, v in module.state_dict().items()}


def _cfg(**kw):
    import ml_collections
    return ml_collections.ConfigDict(kw)


class TestSDWIParity:
    def test_inception_module_matches(self, ref_seqformer):
        """Bare SDWI vs torch: (B, N, L, D), kernels [1, 3, 5]."""
        import torch
        from abx_tpu.models.seqformer import SpatialDepthWiseInception
        from abx_tpu.utils.torch_convert import _sdwi

        torch.manual_seed(0)
        d, kernels = 8, [1, 3, 5]
        ref = ref_seqformer.SpatialDepthWiseInception(d, kernels)
        x = np.random.RandomState(0).randn(2, 6, 10, d).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy()

        mod = SpatialDepthWiseInception(d, tuple(kernels))
        # _sdwi expects '<name>.convs...' keys; bare module has 'convs...'.
        params = {'params': _sdwi(
            {f'x.{k}': v for k, v in _sub_sd(ref).items()}, 'x')}
        got = np.asarray(mod.apply(params, x))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_seq_attention_inp_kernels(self, ref_seqformer):
        """SeqAttentionWithPairBias with inp_kernels=[1,3] (split_first=False
        path; groups = heads since rows axis is 1)."""
        import torch
        import ml_collections
        from abx_tpu.models.seqformer import SeqAttentionWithPairBias
        from abx_tpu.utils import torch_convert as tc

        torch.manual_seed(1)
        b, l, cs, cp, h = 2, 6, 16, 12, 4
        kern = [1, 3]
        cfg = _cfg(num_head=h, inp_kernels=kern, orientation='per_row',
                   shared_dropout=True, dropout_rate=0.0)
        ref = ref_seqformer.SeqAttentionWithPairBias(cfg, cs, cp)
        ref.eval()
        rs = np.random.RandomState(1)
        seq = rs.randn(b, l, cs).astype(np.float32)
        pair = rs.randn(b, l, l, cp).astype(np.float32)
        mask = np.ones((b, l), np.float32)
        mask[1, -2:] = 0.0
        with torch.no_grad():
            want = ref(torch.from_numpy(seq), torch.from_numpy(pair),
                       torch.from_numpy(mask).bool()).numpy()

        sd = _sub_sd(ref)
        params = {'params': {
            'seq_norm': tc._ln(None, 'seq_norm', sd),
            'pair_norm': tc._ln(None, 'pair_norm', sd),
            'proj_pair': tc._linear(sd, 'proj_pair'),
            'attn': tc._attention(sd, 'attn', fused=True),
        }}
        mine = SeqAttentionWithPairBias(cfg)
        got = np.asarray(mine.apply(params, seq, pair, mask))
        np.testing.assert_allclose(got, want, atol=2e-5)

    @pytest.mark.parametrize('orientation', ['per_row', 'per_column'])
    def test_triangle_attention_inp_kernels(self, ref_seqformer,
                                            orientation):
        """TriangleAttention with inp_kernels=[1,3]: exercises the s-major
        (rows·heads) grouping on the pair track + orientation transpose."""
        import torch
        from abx_tpu.models.seqformer import TriangleAttention
        from abx_tpu.utils import torch_convert as tc

        torch.manual_seed(2)
        b, l, cp, h = 2, 6, 12, 4
        cfg = _cfg(num_head=h, gating=True, inp_kernels=[1, 3],
                   orientation=orientation, shared_dropout=False,
                   dropout_rate=0.0)
        ref = ref_seqformer.TriangleAttention(cfg, cp)
        ref.eval()
        rs = np.random.RandomState(2)
        pair = rs.randn(b, l, l, cp).astype(np.float32)
        mask = np.ones((b, l), np.float32)
        mask[0, -1:] = 0.0
        with torch.no_grad():
            want = ref(torch.from_numpy(pair),
                       torch.from_numpy(mask).bool()).numpy()

        sd = _sub_sd(ref)
        # _tri_attn prefixes '<name>.'; bare module needs key rewrite.
        params = {'params': tc._tri_attn(
            {f'x.{k}': v for k, v in sd.items()}, 'x')}
        mine = TriangleAttention(cfg)
        got = np.asarray(mine.apply(params, pair, mask))
        np.testing.assert_allclose(got, want, atol=2e-5)

    @pytest.mark.parametrize('orientation', ['per_row', 'per_column'])
    def test_triangle_multiplication_inp_kernels(self, ref_seqformer,
                                                 orientation):
        import torch
        from abx_tpu.models.seqformer import TriangleMultiplication
        from abx_tpu.utils import torch_convert as tc

        torch.manual_seed(3)
        b, l, cp, nc, h = 2, 6, 12, 8, 4
        cfg = _cfg(num_head=h, gating=True, inp_kernels=[1, 3],
                   orientation=orientation, num_intermediate_channel=nc,
                   shared_dropout=False, dropout_rate=0.0)
        ref = ref_seqformer.TriangleMultiplication(cfg, cp)
        ref.eval()
        rs = np.random.RandomState(3)
        pair = rs.randn(b, l, l, cp).astype(np.float32)
        mask = np.ones((b, l), np.float32)
        mask[1, -2:] = 0.0
        with torch.no_grad():
            want = ref(torch.from_numpy(pair),
                       torch.from_numpy(mask)).numpy()

        sd = _sub_sd(ref)
        params = {'params': tc._tri_mul(
            {f'x.{k}': v for k, v in sd.items()}, 'x')}
        mine = TriangleMultiplication(cfg)
        got = np.asarray(mine.apply(params, pair, mask))
        np.testing.assert_allclose(got, want, atol=2e-5)
