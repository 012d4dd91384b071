"""TM-score / contact-precision training heads vs numpy references."""

import numpy as np
import jax
import jax.numpy as jnp

from abx_tpu.models import metric_heads as mh
from abx_tpu.evaluation import metrics as np_metrics


class TestTMScore:
    def test_perfect_match_is_one(self):
        rng = np.random.RandomState(0)
        x = rng.randn(2, 40, 3).astype(np.float32) * 6
        mask = np.ones((2, 40), np.float32)
        tm = np.asarray(mh.tm_score(jnp.asarray(x), jnp.asarray(x),
                                    jnp.asarray(mask)))
        np.testing.assert_allclose(tm, 1.0, atol=1e-5)

    def test_rigid_transform_invariant(self):
        from scipy.spatial.transform import Rotation
        rng = np.random.RandomState(1)
        x = rng.randn(1, 50, 3).astype(np.float32) * 8
        rot = Rotation.from_rotvec([0.4, -0.2, 0.9]).as_matrix()
        moved = (x @ rot.T + np.array([3.0, -5.0, 1.0])).astype(np.float32)
        mask = np.ones((1, 50), np.float32)
        tm = np.asarray(mh.tm_score(jnp.asarray(moved), jnp.asarray(x),
                                    jnp.asarray(mask)))
        np.testing.assert_allclose(tm, 1.0, atol=1e-4)

    def test_matches_numpy_reference(self):
        rng = np.random.RandomState(2)
        gt = rng.randn(1, 60, 3).astype(np.float32) * 7
        pred = gt + rng.randn(1, 60, 3).astype(np.float32) * 1.5
        mask = np.ones((1, 60), np.float32)
        tm = float(mh.tm_score(jnp.asarray(pred), jnp.asarray(gt),
                               jnp.asarray(mask))[0])
        # numpy path: same Kabsch + TM formula.
        rot, trans = np_metrics.kabsch(pred[0], gt[0])
        aligned = np_metrics.apply_kabsch(pred[0], rot, trans)
        expect = np_metrics.tm_score(aligned, gt[0], L=60)
        np.testing.assert_allclose(tm, expect, atol=1e-4)

    def test_mask_excludes_positions(self):
        rng = np.random.RandomState(3)
        gt = rng.randn(1, 30, 3).astype(np.float32) * 5
        pred = gt.copy()
        pred[0, -5:] += 100.0  # catastrophically wrong but masked out
        mask = np.ones((1, 30), np.float32)
        mask[0, -5:] = 0
        tm = float(mh.tm_score(jnp.asarray(pred), jnp.asarray(gt),
                               jnp.asarray(mask))[0])
        np.testing.assert_allclose(tm, 1.0, atol=1e-5)


class TestContactPrecision:
    def _np_reference(self, pred, truth, mask, ratios, ranges, cutoff):
        """Direct port of reference contact_precision_torch semantics."""
        l = pred.shape[-1]
        out = {}
        sep = np.abs(np.arange(l)[:, None] - np.arange(l)[None, :])
        pm = mask[:, None] * mask[None, :]
        for lo, hi in ranges:
            lo_v = lo or 0
            hi_v = hi if hi is not None else l
            sel = (sep >= lo_v) & (sep < hi_v) & (pm > 0)
            p = pred[sel]
            t = truth[sel]
            order = np.argsort(-p)
            for ratio in ratios:
                k = max(1, int(l * ratio))
                top = t[order[:k]]
                correct = ((top > 0) & (top < cutoff)).sum()
                name = f'[{lo_v},{hi if hi is not None else "inf"})_{ratio}'
                out[name] = correct / float(k)
        return out

    def test_matches_reference_semantics(self):
        rng = np.random.RandomState(4)
        l = 48
        coords = rng.randn(l, 3) * 6
        truth = np.linalg.norm(coords[:, None] - coords[None], axis=-1)
        pred = 1.0 / (1.0 + truth) + rng.rand(l, l) * 0.1
        mask = np.ones((l,), np.float32)
        ratios, ranges, cutoff = (1.0, 0.5), ((6, 12), (24, None)), 8.0
        got = mh.contact_precision(
            jnp.asarray(pred[None], jnp.float32),
            jnp.asarray(truth[None], jnp.float32),
            jnp.asarray(mask[None]), ratios, ranges, cutoff)
        expect = self._np_reference(pred, truth, mask, ratios, ranges,
                                    cutoff)
        assert set(got) == set(expect)
        for k in expect:
            np.testing.assert_allclose(float(got[k][0]), expect[k],
                                       atol=1e-5, err_msg=k)

    def test_in_jit_with_heads(self):
        """metric_dict_head + tmscore_head run under jit on a fake batch."""
        l, bins = 32, 16
        rng = np.random.RandomState(5)
        breaks = jnp.linspace(2.0, 22.0, bins - 1)
        batch = {
            'pseudo_beta': jnp.asarray(rng.randn(2, l, 3) * 6, jnp.float32),
            'pseudo_beta_mask': jnp.ones((2, l)),
            'mask': jnp.ones((2, l)),
            'atom14_gt_positions': jnp.asarray(rng.randn(2, l, 14, 3) * 6,
                                               jnp.float32),
            'atom14_gt_exists': jnp.ones((2, l, 14)),
        }
        disto = {'logits': jnp.asarray(rng.randn(2, l, l, bins), jnp.float32),
                 'breaks': breaks}
        folding = {'final_atom14_positions':
                   batch['atom14_gt_positions'] + 0.5}

        @jax.jit
        def run():
            m = mh.metric_dict_head(disto, batch, None)
            m.update(mh.tmscore_head(folding, batch))
            return m

        out = jax.tree.map(np.asarray, run())
        assert 0.0 < out['tmscore'] <= 1.0
        assert any(k.startswith('contact/') for k in out)
        assert all(np.isfinite(v) for v in out.values())
