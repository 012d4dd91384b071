"""Checkpoint backends: msgpack round trip + orbax async manager."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from abx_tpu.utils import checkpoint as ckpt_lib


def test_msgpack_roundtrip(tmp_path):
    params = {'params': {'dense': {'kernel': jnp.arange(6.0).reshape(2, 3),
                                   'bias': jnp.zeros((3,))}}}
    path = str(tmp_path / 'p.msgpack')
    ckpt_lib.save_params(path, params)
    restored = ckpt_lib.load_params(path, params)
    np.testing.assert_allclose(restored['params']['dense']['kernel'],
                               params['params']['dense']['kernel'])


def test_orbax_async_roundtrip(tmp_path):
    if not ckpt_lib.orbax_available():
        import pytest
        pytest.skip('orbax not installed')
    state = {'params': {'w': jnp.ones((4, 4))},
             'opt': {'mu': jnp.zeros((4, 4))},
             'step': jnp.asarray(7)}
    ck = ckpt_lib.OrbaxCheckpointer(str(tmp_path / 'orbax'), max_to_keep=2)
    ck.save(7, state)
    ck.save(9, jax.tree.map(lambda x: x + 1, state))
    ck.wait()
    assert ck.latest_step() == 9
    restored = ck.restore(state)
    assert int(restored['step']) == 8  # 7 + 1 from the tree.map
    np.testing.assert_allclose(restored['params']['w'], 2.0)
    # restore a specific older step
    old = ck.restore(state, step=7)
    assert int(old['step']) == 7
    ck.close()


def test_overfit_artifact_end_state():
    """The committed trainer-validation artifact (tools/overfit_6ct7.py on
    one v5e chip) must show the model actually trains: sampled H3 RMSD < 1 A
    and AAR > 0.9 on the training complex, and a decreasing loss curve."""
    import csv
    import json
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    run_dir = os.path.join(repo, 'runs', 'overfit_6ct7')
    result_path = os.path.join(run_dir, 'result.json')
    if not os.path.exists(result_path):
        import pytest
        pytest.skip('overfit artifact not present')
    with open(result_path) as f:
        result = json.load(f)
    assert result['h3_rmsd_best'] < 1.0, result
    assert result['h3_aar_best'] > 0.9, result
    with open(os.path.join(run_dir, 'metrics.csv')) as f:
        rows = list(csv.DictReader(f))
    losses = [float(r['total']) for r in rows]
    assert losses[-1] < 0.25 * losses[0], (losses[0], losses[-1])
    # metric heads are live during training (VERDICT item 7)
    assert 'tmscore' in rows[0] and float(rows[-1]['tmscore']) > 0.95


def test_overfit_cdr_artifact_end_state():
    """All-six-CDR co-design artifact: sampled all-CDR RMSD < 2 A, AAR > 0.9."""
    import json
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, 'runs', 'overfit_6ct7_cdr', 'result.json')
    if not os.path.exists(path):
        import pytest
        pytest.skip('cdr overfit artifact not present')
    with open(path) as f:
        result = json.load(f)
    assert result['generate_area'] == 'cdr'
    assert result['h3_rmsd_mean'] < 2.0, result   # all-CDR RMSD
    assert result['h3_aar_mean'] > 0.9, result


def test_trainer_restore_prefers_newer_orbax(tmp_path):
    """Crash-resume (ADVICE r2): with use_orbax, periodic saves land only
    in <ckpt>.orbax/ while the msgpack .train file is written at clean
    exit — load_train_state must restore whichever is NEWER."""
    if not ckpt_lib.orbax_available():
        import pytest
        pytest.skip('orbax not installed')
    import types
    from abx_tpu.config import tiny_model_config
    from abx_tpu.train.trainer import TrainConfig, Trainer

    cfg = tiny_model_config()
    model = types.SimpleNamespace(antibody_len=8, dtype=jnp.float32)
    trainer = Trainer(model, None, cfg.model, cfg.loss,
                      TrainConfig(use_orbax=True, ema_decay=0.0))
    params = {'params': {'w': jnp.ones((3,))}}
    state = trainer.init_state(params)

    ckpt = str(tmp_path / 'params.msgpack')
    # Clean-exit msgpack at step 2.
    s2 = dict(state, step=jnp.asarray(2))
    trainer._save(ckpt, s2)
    # Later periodic orbax save at step 5 (the "crash" leaves it newest).
    ck = ckpt_lib.OrbaxCheckpointer(ckpt + '.orbax')
    s5 = dict(state, step=jnp.asarray(5),
              params={'params': {'w': 5.0 * jnp.ones((3,))}})
    ck.save(5, s5)
    ck.wait()
    ck.close()

    restored = trainer.load_train_state(ckpt, params)
    assert int(restored['step']) == 5
    np.testing.assert_allclose(restored['params']['params']['w'], 5.0)

    # And the msgpack wins when it is newer.
    s9 = dict(state, step=jnp.asarray(9),
              params={'params': {'w': 9.0 * jnp.ones((3,))}})
    trainer._save(ckpt, s9)
    restored = trainer.load_train_state(ckpt, params)
    assert int(restored['step']) == 9
    np.testing.assert_allclose(restored['params']['params']['w'], 9.0)


def test_save_params_atomic_no_tmp_left(tmp_path):
    """save_params writes tmp+rename (round-5 fix: a SIGKILL mid-write in
    the multi-complex rehearsal left a truncated .train msgpack that broke
    --resume); after a successful save no .tmp sibling remains."""
    params = {'params': {'w': jnp.ones((4,))}}
    path = str(tmp_path / 'p.msgpack')
    ckpt_lib.save_params(path, params)
    assert os.path.exists(path)
    assert not os.path.exists(path + '.tmp')
    # Overwrite is atomic too: the final file is always a COMPLETE msgpack.
    ckpt_lib.save_params(path, {'params': {'w': 2.0 * jnp.ones((4,))}})
    restored = ckpt_lib.load_params(path, params)
    np.testing.assert_allclose(restored['params']['w'], 2.0)


def test_trainer_resume_tolerates_truncated_train_file(tmp_path):
    """A truncated .train checkpoint (pre-atomic-write survivor or partial
    copy) must not abort resume: load_train_state falls back to orbax when
    present, and raises a clear FileNotFoundError when nothing restorable
    exists."""
    import types

    import pytest

    from abx_tpu.config import tiny_model_config
    from abx_tpu.train.trainer import TrainConfig, Trainer

    cfg = tiny_model_config()
    model = types.SimpleNamespace(antibody_len=8, dtype=jnp.float32)
    trainer = Trainer(model, None, cfg.model, cfg.loss,
                      TrainConfig(ema_decay=0.0))
    params = {'params': {'w': jnp.ones((3,))}}
    state = trainer.init_state(params)

    ckpt = str(tmp_path / 'params.msgpack')
    trainer._save(ckpt, dict(state, step=jnp.asarray(4)))
    # Truncate the .train file to simulate the mid-write kill.
    with open(ckpt + '.train', 'r+b') as f:
        f.truncate(os.path.getsize(ckpt + '.train') // 2)

    if ckpt_lib.orbax_available():
        ck = ckpt_lib.OrbaxCheckpointer(ckpt + '.orbax')
        ck.save(7, dict(state, step=jnp.asarray(7)))
        ck.wait()
        ck.close()
        restored = trainer.load_train_state(ckpt, params)
        assert int(restored['step']) == 7
        import shutil
        shutil.rmtree(ckpt + '.orbax')

    with pytest.raises(FileNotFoundError):
        trainer.load_train_state(ckpt, params)
