"""Diffusion math: closed-form unit tests + parity vs the torch reference.

Parity tests import the reference implementation from /root/reference (when
mounted) and compare tables/deterministic quantities; they are skipped in
environments without the reference checkout.
"""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from abx_tpu.diffusion.igso3 import SO3Config, SO3Diffuser
from abx_tpu.diffusion.r3 import R3Config, R3Diffuser
from abx_tpu.diffusion.discrete import DiscreteConfig, DiscreteDiffuser
from abx_tpu.diffusion.joint import JointConfig, JointDiffuser

REFERENCE = '/root/reference'
HAS_REFERENCE = os.path.isdir(os.path.join(REFERENCE, 'diffuser'))

# Small tables -> fast construction in tests.
SMALL_SO3 = SO3Config(num_omega=200, num_sigma=100, cache_dir='/tmp/igso3_test')


@pytest.fixture(scope='module')
def so3():
    return SO3Diffuser(SMALL_SO3)


@pytest.fixture(scope='module')
def r3():
    return R3Diffuser(R3Config())


@pytest.fixture(scope='module')
def seq_diff():
    return DiscreteDiffuser(DiscreteConfig())


class TestSO3:
    def test_sigma_schedule_endpoints(self, so3):
        np.testing.assert_allclose(
            float(so3.sigma(jnp.array(0.0))), 0.1, atol=1e-5)
        np.testing.assert_allclose(
            float(so3.sigma(jnp.array(1.0))), 1.5, atol=1e-5)

    def test_pdf_normalized(self, so3):
        # marginal angle pdf integrates to ~1 over (0, pi].
        pdf = np.asarray(so3._pdf)
        integral = pdf.sum(axis=-1) * np.pi / SMALL_SO3.num_omega
        np.testing.assert_allclose(integral, 1.0, atol=2e-2)

    def test_cdf_monotonic_and_bounded(self, so3):
        cdf = np.asarray(so3._cdf)
        assert np.all(np.diff(cdf, axis=-1) >= -1e-6)
        np.testing.assert_allclose(cdf[:, -1], 1.0, atol=2e-2)

    def test_sample_angle_distribution(self, so3):
        # Large sigma -> angles concentrate away from 0 (toward uniform Haar).
        key = jax.random.PRNGKey(0)
        t = jnp.ones((1,))
        rots = so3.sample(key, t, (1, 4000))
        angles = np.linalg.norm(np.asarray(rots), axis=-1)
        assert angles.max() <= np.pi + 1e-3
        assert angles.mean() > 1.0  # Haar mean is ~1.97 rad

    def test_score_direction(self, so3):
        # Score should point along -v for large angles (density decreasing).
        key = jax.random.PRNGKey(1)
        t = 0.5 * jnp.ones((2,))
        v = jnp.array([[[0.0, 0.0, 3.0]], [[0.0, 3.0, 0.0]]])
        s = np.asarray(so3.score(v, t))
        # Colinear with v.
        cos = (s * np.asarray(v)).sum(-1) / (
            np.linalg.norm(s, axis=-1) * np.linalg.norm(np.asarray(v), axis=-1))
        np.testing.assert_allclose(np.abs(cos), 1.0, atol=1e-5)

    def test_forward_marginal_shapes_and_finite(self, so3):
        key = jax.random.PRNGKey(2)
        rot_0 = 0.1 * jax.random.normal(key, (2, 8, 3))
        t = jnp.array([0.3, 0.9])
        rot_t, score = so3.forward_marginal(key, rot_0, t)
        assert rot_t.shape == (2, 8, 3) and score.shape == (2, 8, 3)
        assert np.all(np.isfinite(np.asarray(rot_t)))
        assert np.all(np.isfinite(np.asarray(score)))

    def test_reverse_step_reduces_angle(self, so3):
        # With the score pointing back to identity and no noise, a reverse
        # step should rotate toward identity.
        key = jax.random.PRNGKey(3)
        rot_t = jnp.array([[[0.0, 0.0, 1.5]]])
        t = jnp.array([0.8])
        score = so3.score(rot_t, t)
        out = so3.reverse(key, rot_t, score, t, jnp.asarray(0.01),
                          noise_scale=0.0)
        assert np.linalg.norm(out) < 1.5


class TestR3:
    def test_marginal_stats(self, r3):
        key = jax.random.PRNGKey(0)
        x0 = jnp.zeros((4, 2000, 3)) + 5.0
        t = jnp.array([0.01, 0.3, 0.7, 1.0])
        x_t, _ = r3.forward_marginal(key, x0, t)
        x_t = r3.scale(np.asarray(x_t))
        beta = np.asarray(r3.marginal_b_t(t))
        want_mean = np.exp(-0.5 * beta) * 0.5  # scaled x0
        want_var = 1 - np.exp(-beta)
        np.testing.assert_allclose(x_t.mean(axis=(1, 2)), want_mean, atol=0.02)
        np.testing.assert_allclose(x_t.var(axis=(1, 2)), want_var, atol=0.05)

    def test_score_matches_gaussian_score(self, r3):
        # score = -(x_t - mean)/var in scaled coords.
        t = jnp.array([0.5])
        x0 = jnp.array([[[1.0, 2.0, 3.0]]])
        xt = jnp.array([[[1.5, 1.0, 2.0]]])
        s = np.asarray(r3.score(xt, x0, t))
        beta = float(r3.marginal_b_t(t)[0])
        want = -(np.asarray(xt) - np.exp(-0.5 * beta) * np.asarray(x0)) / (
            1 - np.exp(-beta))
        np.testing.assert_allclose(s, want, atol=1e-5)

    def test_calc_trans_0_inverts_score(self, r3):
        t = jnp.array([0.4])
        x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 3))
        xt = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 3))
        score = r3.score(xt, x0, t)
        x0_rec = np.asarray(r3.calc_trans_0(score, xt, t))
        np.testing.assert_allclose(x0_rec, np.asarray(x0), atol=1e-4)

    def test_reverse_noise_term_parity_flag(self):
        """parity mode uses g*dt*z; corrected mode uses g*sqrt(dt)*z."""
        key = jax.random.PRNGKey(3)
        xt = jnp.ones((1, 4, 3))
        score = jnp.zeros((1, 4, 3))
        t = jnp.array([0.5])
        dt = jnp.asarray(0.01)
        out_p = R3Diffuser(R3Config(parity_dt_noise=True)).reverse(
            key, xt, score, t, dt, center=False)
        out_c = R3Diffuser(R3Config(parity_dt_noise=False)).reverse(
            key, xt, score, t, dt, center=False)
        # Same drift, different noise magnitude: corrected has ~10x noise.
        dev_p = np.abs(np.asarray(out_p) - np.asarray(xt))
        dev_c = np.abs(np.asarray(out_c) - np.asarray(xt))
        assert dev_c.mean() > dev_p.mean()


class TestDiscrete:
    def test_transition_matches_expm(self, seq_diff):
        from scipy.linalg import expm
        t = jnp.array([0.13, 0.7, 1.0])
        q = np.asarray(seq_diff.transition(t))
        r = np.asarray(seq_diff.rate_matrix)
        for i, ti in enumerate([0.13, 0.7, 1.0]):
            want = expm(ti * r)
            want[want < 1e-8] = 0.0
            np.testing.assert_allclose(q[i], want, atol=1e-5)

    def test_transition_rows_sum_to_one(self, seq_diff):
        q = np.asarray(seq_diff.transition(jnp.array([0.5])))
        np.testing.assert_allclose(q.sum(-1), 1.0, atol=1e-5)

    def test_forward_marginal_distribution(self, seq_diff):
        key = jax.random.PRNGKey(0)
        x0 = jnp.zeros((1, 20000), dtype=jnp.int32)  # all state 0
        t = jnp.array([0.25])
        x_t, q_t0, rate = seq_diff.forward_marginal(key, x0, t)
        counts = np.bincount(np.asarray(x_t[0]), minlength=20) / 20000
        want = np.asarray(q_t0[0, 0])
        np.testing.assert_allclose(counts, want, atol=0.01)
        assert q_t0.shape == (1, 20, 20) and rate.shape == (1, 20, 20)

    def test_reverse_chain_recovers_confident_logits(self, seq_diff):
        # Running the tau-leaping chain from t=1 to t~0 with overwhelmingly
        # confident logits for state 7 should land most sites at 7 — this is
        # exactly how the sampler consumes `reverse` (100 steps of dt=0.01).
        key = jax.random.PRNGKey(1)
        x = jnp.full((1, 64), 3, dtype=jnp.int32)
        logits = jnp.full((1, 64, 20), -30.0).at[..., 7].set(30.0)
        ts = np.linspace(0.01, 1.0, 100)[::-1]
        for i, t in enumerate(ts):
            key, sub = jax.random.split(key)
            x = seq_diff.reverse(sub, x, logits, jnp.asarray(float(t)),
                                 jnp.asarray(0.01))
        assert (np.asarray(x) == 7).mean() > 0.9


class TestGibbsCorrector:
    """DiscreteDiffuser.corrector_rates / corrector (predictor-corrector
    for the CTMC track, Campbell et al. 2022; sampler opt-in
    `seq_corrector_steps`)."""

    def test_generator_stationary_under_exact_posterior(self):
        """The corrector chain's generator G = R_t + R̂_t must have the
        noising marginal q_t as a left null vector when the model posterior
        is exact — the identity that makes extra corrector jumps at fixed t
        equilibrate toward q_t.  Checked exactly on a single site with an
        arbitrary x0 prior."""
        s = 6
        diff = DiscreteDiffuser(DiscreteConfig(rate_const=0.5, num_states=s))
        rng = np.random.RandomState(0)
        pi0 = rng.dirichlet(np.ones(s))
        for t in (0.15, 0.6, 0.95):
            qt0 = np.asarray(diff.transition(jnp.array([t]))[0])  # (x0, xt)
            q_t = pi0 @ qt0
            g = np.zeros((s, s))
            for x in range(s):
                post = pi0 * qt0[:, x] / q_t[x]        # p(x0 | x_t = x)
                logits = jnp.log(jnp.asarray(post[None, None]) + 1e-30)
                x_t = jnp.full((1, 1), x, dtype=jnp.int32)
                rates = diff.corrector_rates(x_t, logits,
                                             jnp.asarray(float(t)))
                g[x] = np.asarray(rates[0, 0])
                g[x, x] = -g[x].sum()
            resid = q_t @ g
            np.testing.assert_allclose(resid, 0.0, atol=1e-5)

    def test_corrector_moves_wrong_marginal_toward_qt(self, seq_diff):
        """Starting from exact q_t samples the corrector must keep the
        marginal at q_t; starting from the WRONG (uniform) marginal it must
        move it toward q_t — the property that repairs tau-leap error.
        Single known x0=0, so the exact posterior is one-hot and q_t is the
        transition row."""
        key = jax.random.PRNGKey(3)
        t = 0.3
        n = 20000
        qt0 = np.asarray(seq_diff.transition(jnp.array([t]))[0])
        q_t = qt0[0]                                    # x0 = 0
        logits = jnp.full((1, n, 20), -30.0).at[..., 0].set(30.0)

        def tv(x):
            hist = np.bincount(np.asarray(x[0]), minlength=20) / n
            return 0.5 * np.abs(hist - q_t).sum()

        # dt=0.01 is the production leap size (num_t=100); the leap bias is
        # O(dt) (measured: TV 0.14 @ dt=0.1, 0.02 @ dt=0.01, 0.012 @ 0.005).
        def run(x, k, steps=30, dt=0.01):
            for i in range(steps):
                k, sub = jax.random.split(k)
                x = seq_diff.corrector(sub, x, logits, jnp.asarray(t),
                                       jnp.asarray(dt))
            return x

        k1, k2, k3 = jax.random.split(key, 3)
        x_good = jax.random.categorical(
            k1, jnp.log(jnp.asarray(q_t))[None, None], axis=-1,
            shape=(1, n)).astype(jnp.int32)
        assert tv(run(x_good, k2)) < 0.03  # stationary: stays at q_t

        x_bad = jax.random.randint(k3, (1, n), 0, 20, dtype=jnp.int32)
        tv0 = tv(x_bad)
        tv1 = tv(run(x_bad, key))
        assert tv1 < 0.25 * tv0, (tv0, tv1)  # corrective: moves toward q_t

    def test_reverse_rates_match_reverse_step_mechanics(self, seq_diff):
        """`reverse` leaps with exactly `reverse_rates` (refactor guard):
        with shared uniforms the jump counts derived from reverse_rates
        reproduce reverse()'s output bitwise."""
        from abx_tpu.diffusion.discrete import poisson_counts_from_uniform
        key = jax.random.PRNGKey(5)
        b, d, s = 2, 9, 20
        x = jax.random.randint(key, (b, d), 0, s, dtype=jnp.int32)
        logits = jax.random.normal(jax.random.fold_in(key, 1), (b, d, s))
        u = jax.random.uniform(jax.random.fold_in(key, 2), (b, d, s))
        t, dt = jnp.asarray(0.4), jnp.asarray(0.05)
        got = seq_diff.reverse(key, x, logits, t, dt, u=u)
        rates = seq_diff.reverse_rates(x, logits, t)
        jumps = poisson_counts_from_uniform(rates * dt, u)
        diffs = jnp.arange(s)[None, None] - x[:, :, None]
        want = jnp.clip(x + jnp.sum(jumps * diffs, -1), 0, s - 1)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestJoint:
    def test_forward_reverse_shapes(self):
        jd = JointDiffuser(JointConfig(so3=SMALL_SO3))
        key = jax.random.PRNGKey(0)
        B, L = 2, 16
        rigids_0 = jnp.tile(
            jnp.asarray([1.0, 0, 0, 0, 0, 0, 0]), (B, L, 1))
        seq_0 = jax.random.randint(key, (B, L), 0, 20, dtype=jnp.int32)
        t = jnp.array([0.5, 0.8])
        mask = jnp.ones((B, L))
        out = jd.forward_marginal(key, rigids_0, seq_0, t, mask)
        assert out['rigids_t'].shape == (B, L, 7)
        assert out['seq_t'].shape == (B, L)
        rig, seq = jd.reverse(
            key, out['rigids_t'], out['seq_t'], out['rot_score'],
            out['trans_score'],
            jnp.zeros((B, L, 20)), t, jnp.asarray(0.01), mask)
        assert rig.shape == (B, L, 7) and seq.shape == (B, L)

    def test_fixed_residues_unchanged(self):
        jd = JointDiffuser(JointConfig(so3=SMALL_SO3))
        key = jax.random.PRNGKey(1)
        B, L = 1, 10
        rigids_0 = jnp.tile(jnp.asarray([1.0, 0, 0, 0, 1.0, 2.0, 3.0]),
                            (B, L, 1))
        seq_0 = jnp.arange(10, dtype=jnp.int32)[None] % 20
        t = jnp.array([0.9])
        mask = jnp.zeros((B, L)).at[:, 3:6].set(1.0)
        out = jd.forward_marginal(key, rigids_0, seq_0, t, mask)
        fixed = np.asarray(1 - mask[0], dtype=bool)
        np.testing.assert_allclose(
            np.asarray(out['rigids_t'])[0, fixed],
            np.asarray(rigids_0)[0, fixed], atol=1e-5)
        assert np.all(np.asarray(out['seq_t'])[0, fixed]
                      == np.asarray(seq_0)[0, fixed])

    def test_sample_ref_imputes(self):
        jd = JointDiffuser(JointConfig(so3=SMALL_SO3))
        key = jax.random.PRNGKey(2)
        B, L = 1, 8
        rigids = jnp.tile(jnp.asarray([1.0, 0, 0, 0, 5.0, 5.0, 5.0]),
                          (B, L, 1))
        seq = jnp.full((B, L), 7, dtype=jnp.int32)
        mask = jnp.zeros((B, L)).at[:, :4].set(1.0)
        out = jd.sample_ref(key, (B, L), rigids, seq, mask)
        np.testing.assert_allclose(
            np.asarray(out['rigids_t'])[0, 4:], np.asarray(rigids)[0, 4:],
            atol=1e-4)
        assert np.all(np.asarray(out['seq_t'])[0, 4:] == 7)


@pytest.mark.skipif(not HAS_REFERENCE, reason='reference checkout not mounted')
class TestReferenceParity:
    """Golden comparisons against the PyTorch reference implementation."""

    @pytest.fixture(scope='class')
    def ref_modules(self):
        sys.path.insert(0, REFERENCE)
        import importlib
        import types
        from unittest import mock

        # The reference package pulls in esm/biopython/anarci at import time;
        # stub them so the pure-math diffuser modules load standalone.
        def _stub(name):
            if name in sys.modules:
                return
            m = types.ModuleType(name)
            m.__path__ = []  # mark as package
            m.__getattr__ = lambda attr: mock.MagicMock()
            sys.modules[name] = m

        for name in ['esm', 'esm.pretrained', 'Bio', 'Bio.PDB',
                     'Bio.PDB.Chain', 'Bio.PDB.Atom', 'Bio.PDB.Residue',
                     'Bio.PDB.Model', 'Bio.PDB.PDBIO', 'Bio.PDB.PDBParser',
                     'Bio.PDB.PDBExceptions', 'Bio.SeqUtils', 'Bio.Seq',
                     'Bio.Data', 'Bio.Data.SCOPData', 'Bio.Data.PDBData',
                     'anarci', 'pandas']:
            _stub(name)
        so3_ref = importlib.import_module('diffuser.so3_diffuser')
        r3_ref = importlib.import_module('diffuser.r3_diffuser')
        dd_ref = importlib.import_module('diffuser.discrete_diffuser')
        return so3_ref, r3_ref, dd_ref

    def test_igso3_tables_match(self, ref_modules, so3, tmp_path):
        so3_ref_mod, _, _ = ref_modules
        conf = {
            'schedule': 'logarithmic', 'min_sigma': 0.1, 'max_sigma': 1.5,
            'num_sigma': SMALL_SO3.num_sigma, 'num_omega': SMALL_SO3.num_omega,
            'use_cached_score': True, 'cache_dir': str(tmp_path),
        }
        ref = so3_ref_mod.SO3Diffuser(conf)
        np.testing.assert_allclose(
            np.asarray(so3._pdf), ref._pdf.numpy(), rtol=2e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(so3._cdf), ref._cdf.numpy(), rtol=2e-4, atol=1e-4)
        # Score norms: compare only where the density is non-negligible —
        # in the far tail (e.g. omega≈pi at sigma=0.1 the density is
        # ~e^-400) both implementations emit numerical noise (the reference
        # computes the alternating series in f32; we use f64).
        # pdf > 1e-4: below that the f32 reference series is catastrophic-
        # cancellation noise (values like ±7 where the f64 value is ~0).
        support = ref._pdf.numpy() > 1e-4
        got_sn = np.asarray(so3._score_norms)[support]
        want_sn = ref._score_norms.numpy()[support]
        # rtol 1e-2: at the support fringe (pdf ~1e-4) the reference's f32
        # series still carries ~0.4% cancellation error vs our f64 values.
        np.testing.assert_allclose(got_sn, want_sn, rtol=1e-2, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(so3._score_scaling), ref._score_scaling.numpy(),
            rtol=1e-4, atol=1e-4)

    def test_so3_score_lookup_matches(self, ref_modules, so3, tmp_path):
        import torch
        so3_ref_mod, _, _ = ref_modules
        conf = {
            'schedule': 'logarithmic', 'min_sigma': 0.1, 'max_sigma': 1.5,
            'num_sigma': SMALL_SO3.num_sigma, 'num_omega': SMALL_SO3.num_omega,
            'use_cached_score': True, 'cache_dir': str(tmp_path),
        }
        ref = so3_ref_mod.SO3Diffuser(conf)
        vec = np.random.RandomState(0).randn(2, 6, 3).astype(np.float32)
        t = np.array([0.3, 0.8], dtype=np.float32)
        got = np.asarray(so3.score(jnp.asarray(vec), jnp.asarray(t)))
        want = ref.score(torch.tensor(vec), torch.tensor(t)).numpy()
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_r3_closed_forms_match(self, ref_modules):
        import torch
        _, r3_ref_mod, _ = ref_modules
        ref = r3_ref_mod.R3Diffuser(
            {'min_b': 0.1, 'max_b': 20.0, 'coordinate_scaling': 0.1})
        mine = R3Diffuser(R3Config())
        t = np.array([0.2, 0.9], dtype=np.float32)
        x0 = np.random.RandomState(1).randn(2, 4, 3).astype(np.float32)
        xt = np.random.RandomState(2).randn(2, 4, 3).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(mine.score(jnp.asarray(xt), jnp.asarray(x0),
                                  jnp.asarray(t))),
            ref.score(torch.tensor(xt), torch.tensor(x0),
                      torch.tensor(t)).numpy(), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(mine.score_scaling(jnp.asarray(t))),
            ref.score_scaling(torch.tensor(t)).numpy(), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(mine.marginal_b_t(jnp.asarray(t))),
            ref.marginal_b_t(torch.tensor(t)).numpy(), rtol=1e-5)

    def test_discrete_transition_matches(self, ref_modules):
        import torch
        import ml_collections
        _, _, dd_ref_mod = ref_modules
        ref = dd_ref_mod.DiscreteDiffuser(
            ml_collections.ConfigDict({'rate_const': 0.3}))
        mine = DiscreteDiffuser(DiscreteConfig())
        t = np.array([0.1, 0.5, 1.0], dtype=np.float32)
        got = np.asarray(mine.transition(jnp.asarray(t)))
        want = ref.transition(torch.tensor(t)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(mine.rate_matrix),
                                   ref.rate_matrix.numpy(), atol=1e-6)


class TestExactELBO:
    """Golden: vectorised ctmc_elbo_terms vs a loop-based re-derivation of
    the Campbell et al. tau-leaping ELBO on fixed inputs."""

    def _setup(self, seed=0, b=2, d=6, s=5):
        import ml_collections
        rng = np.random.RandomState(seed)
        c_rate = 0.3
        t = rng.uniform(0.2, 0.8, (b,)).astype(np.float32)
        decay = np.exp(-c_rate * s * t)
        qt0 = (np.full((b, s, s), 1.0 / s)
               + decay[:, None, None] * (np.eye(s) - 1.0 / s))
        rate = np.tile(c_rate * (np.ones((s, s)) - np.eye(s)), (b, 1, 1))
        rate -= np.eye(s) * rate.sum(-1, keepdims=True)
        # states: x_t and x_tilde differing at one site
        x_t = rng.randint(0, s, (b, d)).astype(np.int32)
        x_tilde = x_t.copy()
        sigma = rng.randint(0, d, (b,))
        for i in range(b):
            x_tilde[i, sigma[i]] = (x_t[i, sigma[i]] + 1
                                    + rng.randint(0, s - 1)) % s
        logits = rng.randn(b, d, s).astype(np.float32)
        batch = {
            'seq_t': jnp.asarray(x_tilde),
            'seq_xt': jnp.asarray(x_t),
            'seq': jnp.asarray(rng.randint(0, s, (b, d)), jnp.int32),
            'q_t0': jnp.asarray(qt0, jnp.float32),
            'rate_t': jnp.asarray(rate, jnp.float32),
            'fixed_mask': jnp.zeros((b, d), jnp.int32),
            'mask': jnp.ones((b, d), jnp.float32),
        }
        return batch, logits, qt0, rate, x_t, x_tilde, s

    def test_matches_bruteforce(self):
        from abx_tpu.train.losses import ctmc_elbo_terms
        batch, logits, qt0, rate, x_t, x_tilde, s = self._setup()
        eps = 1e-9
        log_p = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
        got = jax.tree.map(float, ctmc_elbo_terms(batch, jnp.asarray(log_p),
                                                  eps))

        p0t = np.exp(log_p)
        b, d = x_t.shape

        def rhat(bi, x, d_site, y):
            """Reverse rate Rhat(x -> x with site d_site set to y)."""
            m = x[d_site]
            acc = 0.0
            for x0 in range(s):
                acc += (qt0[bi, x0, y] * p0t[bi, d_site, x0]
                        / (qt0[bi, x0, m] + eps))
            return rate[bi, y, m] * acc

        # normaliser: mean over sites of sum_y Rhat(x_tilde -> y)
        norms = []
        for bi in range(b):
            for di in range(d):
                tot = sum(rhat(bi, x_tilde[bi], di, y) for y in range(s)
                          if y != x_tilde[bi, di])
                norms.append(tot)
        want_norm = np.mean(norms)
        np.testing.assert_allclose(got['normalizer'], want_norm, rtol=1e-4)

        # jump term: Z(x_t) * log Rhat(x_tilde -> x_t at sigma) / n_sites
        jumps = []
        for bi in range(b):
            sig = int(np.argmax(x_tilde[bi] != x_t[bi]))
            m, n = int(x_t[bi, sig]), int(x_tilde[bi, sig])
            acc = sum(qt0[bi, x0, m] * p0t[bi, sig, x0]
                      / (qt0[bi, x0, n] + eps) for x0 in range(s))
            log_rev = np.log(rate[bi, m, n] * acc + eps)
            z = sum(rate[bi, x_t[bi, di], y] for di in range(d)
                    for y in range(s) if y != x_t[bi, di])
            jumps.append(z * log_rev / d)
        want_jump = np.mean(jumps)
        np.testing.assert_allclose(got['jump'], want_jump, rtol=1e-4)
        np.testing.assert_allclose(got['elbo'], want_norm - want_jump,
                                   rtol=1e-4)

    def test_loss_dispatch_and_grad(self):
        """exact_elbo flag routes to the ELBO and is differentiable."""
        import ml_collections
        from abx_tpu.train.losses import diffusion_seq_loss
        batch, logits, *_ = self._setup(seed=1)
        cfg = ml_collections.ConfigDict(
            {'ratio_eps': 1e-9, 'nll_weight': 1, 'exact_elbo': True})

        def f(lg):
            return diffusion_seq_loss(batch, {'logits': lg}, cfg)['loss']

        g = jax.grad(f)(jnp.asarray(logits))
        assert np.isfinite(float(f(jnp.asarray(logits))))
        assert np.all(np.isfinite(np.asarray(g)))
        out = diffusion_seq_loss(batch, {'logits': jnp.asarray(logits)}, cfg)
        assert 'elbo' in out and 'elbo_jump' in out


class TestExactELBONoJump:
    def test_reverted_corruption_is_finite(self):
        """When the diffuse mask reverts the forward corruption
        (x_tilde == x_t everywhere), the jump term must be 0 and the ELBO
        finite — 0 * log(negative diagonal rate) used to propagate NaN into
        every reported loss (round-3 fix in ctmc_elbo_terms)."""
        import jax
        import jax.numpy as jnp
        from abx_tpu.train.losses import ctmc_elbo_terms
        rng = np.random.RandomState(3)
        b, d, s = 2, 6, 5
        c_rate = 0.3
        t = rng.uniform(0.2, 0.8, (b,)).astype(np.float32)
        decay = np.exp(-c_rate * s * t)
        qt0 = (np.full((b, s, s), 1.0 / s)
               + decay[:, None, None] * (np.eye(s) - 1.0 / s))
        rate = np.tile(c_rate * (np.ones((s, s)) - np.eye(s)), (b, 1, 1))
        rate -= np.eye(s) * rate.sum(-1, keepdims=True)
        x = rng.randint(0, s, (b, d)).astype(np.int32)
        batch = {
            'seq_t': jnp.asarray(x), 'seq_xt': jnp.asarray(x),
            'seq': jnp.asarray(rng.randint(0, s, (b, d)), jnp.int32),
            'q_t0': jnp.asarray(qt0, jnp.float32),
            'rate_t': jnp.asarray(rate, jnp.float32),
            'fixed_mask': jnp.zeros((b, d), jnp.int32),
            'mask': jnp.ones((b, d), jnp.float32),
        }
        logits = jnp.asarray(rng.randn(b, d, s).astype(np.float32))
        log_p = jax.nn.log_softmax(logits, -1)
        out = jax.tree.map(float, ctmc_elbo_terms(batch, log_p, 1e-9))
        assert np.isfinite(out['elbo']), out
        assert out['jump'] == 0.0, out
