"""Parallel-in-time (Picard) sampling vs the sequential scan.

The fixpoint-exactness property (picard.py): with identical injected noise,
the Picard iteration run to its sweep-to-sweep fixpoint must reproduce the
sequential sampler's trajectory — same sequences at every step, same
coordinates up to compiler re-association between the scan-body and
vmap-body compilations.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from abx_tpu.config import tiny_model_config
from abx_tpu.data.features import FeatureBuilder, make_diffuser_features
from abx_tpu.diffusion.joint import JointConfig, JointDiffuser
from abx_tpu.models.network import ScoreNetwork
from abx_tpu.sampling.picard import draw_noise, picard_sample
from abx_tpu.sampling.sampler import Sampler, SamplerConfig

from .test_sampler import _make_feats


@pytest.fixture(scope='module')
def setup():
    cfg = tiny_model_config()
    diffuser = JointDiffuser(JointConfig.from_dict(cfg.diffuser.to_dict()))
    l_ab, l_ag = cfg.data.max_antibody_len, cfg.data.max_antigen_len
    model = ScoreNetwork(cfg.model, diffuser=diffuser, antibody_len=l_ab)
    feats = _make_feats(l_ab, l_ag)
    init_batch = FeatureBuilder()(
        {k: jnp.asarray(v) for k, v in feats.items()})
    init_batch = make_diffuser_features(
        init_batch, diffuser=diffuser, generate_area='H3',
        key=jax.random.PRNGKey(0), mode='design')
    params = model.init(jax.random.PRNGKey(0), init_batch,
                        compute_loss=True)
    return cfg, diffuser, model, params, feats


def _shared_noise(sampler, feats, seed=3):
    n = int(sampler._step_grids()[0].shape[0])
    b, l = 1, feats['seq'].shape[1]
    return draw_noise(jax.random.PRNGKey(seed), n, b, l)


class TestPicard:
    def test_fixpoint_matches_sequential(self, setup):
        cfg, diffuser, model, params, feats = setup
        sampler = Sampler(model, diffuser, cfg.model,
                          SamplerConfig(num_t=5, mode='design',
                                        collect_trajectory=True))
        noise = _shared_noise(sampler, feats)
        key = jax.random.PRNGKey(11)
        seq_res = sampler.sample(params, feats, key, noise=noise)
        pic_res = picard_sample(sampler, params, feats, key, noise=noise,
                                tol=0.0)

        n_grid = int(sampler._step_grids()[0].shape[0])
        assert pic_res['picard']['sweeps'] <= n_grid + 1
        assert pic_res['picard']['deltas'][-1] == 0.0
        np.testing.assert_array_equal(
            np.asarray(pic_res['trajectory']['seq']),
            np.asarray(seq_res['trajectory']['seq']))
        np.testing.assert_allclose(
            np.asarray(pic_res['trajectory']['atom14']),
            np.asarray(seq_res['trajectory']['atom14']),
            rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(pic_res['rigids']),
                                   np.asarray(seq_res['rigids']),
                                   rtol=1e-4, atol=1e-4)

    def test_converges_before_the_bound(self, setup):
        """Late-trajectory steps are near-contractions: the bitwise
        fixpoint should arrive in fewer sweeps than the worst-case grid
        length (the property that makes Picard a latency win at all)."""
        cfg, diffuser, model, params, feats = setup
        sampler = Sampler(model, diffuser, cfg.model,
                          SamplerConfig(num_t=8, mode='design'))
        noise = _shared_noise(sampler, feats, seed=5)
        res = picard_sample(sampler, params, feats, jax.random.PRNGKey(2),
                            noise=noise, tol=0.0)
        n_grid = int(sampler._step_grids()[0].shape[0])
        assert res['picard']['deltas'][-1] == 0.0
        assert res['picard']['sweeps'] < n_grid + 1

    def test_time_sharded_over_mesh_matches_unsharded(self, setup):
        """The time axis shards over the 8-device mesh (grid length 6 pads
        to 8); results must match the unsharded iteration exactly."""
        from abx_tpu.parallel import mesh as mesh_lib
        cfg, diffuser, model, params, feats = setup
        assert len(jax.devices()) == 8
        sampler = Sampler(model, diffuser, cfg.model,
                          SamplerConfig(num_t=5, mode='design'))
        noise = _shared_noise(sampler, feats, seed=7)
        key = jax.random.PRNGKey(4)
        plain = picard_sample(sampler, params, feats, key, noise=noise,
                              tol=0.0)
        mesh = mesh_lib.make_mesh()
        shard = picard_sample(sampler, params, feats, key, noise=noise,
                              tol=0.0, mesh=mesh)
        np.testing.assert_array_equal(np.asarray(shard['seq']),
                                      np.asarray(plain['seq']))
        np.testing.assert_allclose(np.asarray(shard['atom14']),
                                   np.asarray(plain['atom14']),
                                   rtol=1e-5, atol=1e-5)

    def test_default_noise_drawn_when_omitted(self, setup):
        cfg, diffuser, model, params, feats = setup
        sampler = Sampler(model, diffuser, cfg.model,
                          SamplerConfig(num_t=3, mode='design'))
        res = picard_sample(sampler, params, feats, jax.random.PRNGKey(0),
                            tol=0.0)
        l = feats['seq'].shape[1]
        assert res['atom14'].shape == (1, l, 14, 3)
        assert np.all(np.isfinite(np.asarray(res['atom14'])))
        assert res['picard']['deltas'][-1] == 0.0
