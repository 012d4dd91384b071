"""Trainer CLI data-path tests: cluster sampling + batch iterator.

Reference semantics: abx/data/dataset.py:46-73 — each epoch visits every
cluster once in shuffled order and draws ONE random member per cluster.
"""

import numpy as np
import pytest

from abx_tpu.cli.train import batch_iterator, parse_cluster_file
from abx_tpu.data import dataset as ds
from abx_tpu.data.pdb_io import parse_pdb
from abx_tpu.preprocess.make_data import make_complex_features

PDB = 'testdata/6ct7_H_L_S.pdb'


@pytest.fixture(scope='module')
def npz_dir(tmp_path_factory):
    """Three npz 'complexes' (copies of the bundled one under new names)."""
    d = tmp_path_factory.mktemp('npz')
    feats = make_complex_features(parse_pdb(PDB), 'H', 'L', ['S'])
    for name in ('cplx_a', 'cplx_b', 'cplx_c'):
        np.savez(d / f'{name}.npz', **feats)
    return d


def test_parse_cluster_file(tmp_path):
    p = tmp_path / 'clusters.txt'
    p.write_text('a b c\n\nd\n e f \n')
    assert parse_cluster_file(str(p)) == [['a', 'b', 'c'], ['d'],
                                          ['e', 'f']]


def test_batch_iterator_static_shapes(npz_dir):
    cfg = ds.DataConfig(max_antibody_len=256, max_antigen_len=32)
    it = batch_iterator(str(npz_dir), ['cplx_a', 'cplx_b', 'cplx_c'], cfg,
                        batch_size=2, is_cluster_idx=False, seed=0)
    b1, b2 = next(it), next(it)
    assert b1['seq'].shape == (2, 288) == b2['seq'].shape
    assert b1['atom14_gt_positions'].shape == (2, 288, 14, 3)


def test_batch_iterator_one_member_per_cluster_per_epoch(npz_dir,
                                                         monkeypatch):
    # One 2-member cluster + one singleton: every epoch loads exactly one
    # member of each cluster => batch_size=2 batches align with epochs.
    loaded = []
    real = ds.load_complex_npz

    def spy(path, name):
        loaded.append(name)
        return real(path, name)

    monkeypatch.setattr(ds, 'load_complex_npz', spy)
    cfg = ds.DataConfig(max_antibody_len=256, max_antigen_len=32)
    clusters = [['cplx_a', 'cplx_b'], ['cplx_c']]
    it = batch_iterator(str(npz_dir), clusters, cfg, batch_size=2,
                        is_cluster_idx=True, seed=1)
    for _ in range(4):  # 4 epochs' worth
        next(it)
    assert len(loaded) == 8
    for epoch in (loaded[i:i + 2] for i in range(0, 8, 2)):
        assert 'cplx_c' in epoch
        assert len(set(epoch) & {'cplx_a', 'cplx_b'}) == 1


def test_batch_iterator_reduce_num(npz_dir, monkeypatch):
    """reduce_num semantics (reference dataset.py:107-116): each epoch
    visits a deterministic epoch-keyed random subset of `reduce_num`
    clusters — subsets differ across epochs but are reproducible."""
    import random as pyrandom
    loaded = []
    real = ds.load_complex_npz

    def spy(path, name):
        loaded.append(name)
        return real(path, name)

    monkeypatch.setattr(ds, 'load_complex_npz', spy)
    cfg = ds.DataConfig(max_antibody_len=256, max_antigen_len=32)
    names = ['cplx_a', 'cplx_b', 'cplx_c']
    it = batch_iterator(str(npz_dir), names, cfg, batch_size=2,
                        is_cluster_idx=False, seed=0, reduce_num=2)
    for _ in range(3):  # 3 epochs x 2 complexes
        next(it)
    assert len(loaded) == 6
    epochs = [loaded[i:i + 2] for i in range(0, 6, 2)]
    for epoch_idx, visited in enumerate(epochs):
        # Exactly 2 of the 3 clusters per epoch, no repeats within epoch.
        assert len(set(visited)) == 2
        # Deterministic: the subset is keyed by 2022 + epoch.
        order = list(range(3))
        pyrandom.Random(2022 + epoch_idx).shuffle(order)
        assert visited == [names[i] for i in order[:2]]
    # Reproducible end-to-end: a fresh iterator visits the same sequence.
    loaded.clear()
    it2 = batch_iterator(str(npz_dir), names, cfg, batch_size=2,
                         is_cluster_idx=False, seed=0, reduce_num=2)
    for _ in range(3):
        next(it2)
    assert [loaded[i:i + 2] for i in range(0, 6, 2)] == epochs


def test_batch_iterator_skips_missing_npz(npz_dir, monkeypatch):
    loaded = []
    real = ds.load_complex_npz

    def spy(path, name):
        loaded.append(name)
        return real(path, name)

    monkeypatch.setattr(ds, 'load_complex_npz', spy)
    cfg = ds.DataConfig(max_antibody_len=256, max_antigen_len=32)
    it = batch_iterator(str(npz_dir), ['missing_1', 'cplx_a', 'missing_2'],
                        cfg, batch_size=1, is_cluster_idx=False, seed=0)
    for _ in range(3):
        next(it)
    assert loaded == ['cplx_a'] * 3
