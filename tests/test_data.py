"""Data pipeline tests: PDB parsing, CDR annotation, crop, padding."""

import numpy as np
import pytest

from abx_tpu.common import residue_constants as rc
from abx_tpu.data import dataset as ds
from abx_tpu.data import pdb_io
from abx_tpu.data.dataset import DataConfig
from abx_tpu.preprocess.numbering import annotate_domain

PDB = 'testdata/6ct7_H_L_S.pdb'
PDB_MULTI = 'testdata/6qd7_X_Z_F|E.pdb'


class TestPdbParse:
    def test_chains_and_atoms(self):
        chains = pdb_io.parse_pdb(PDB)
        assert set(chains) >= {'H', 'L', 'S'}
        h = chains['H']
        assert len(h.str_seq) > 100
        # Backbone present everywhere.
        assert np.all(h.coord_mask[:, :3].sum(-1) >= 2)

    def test_roundtrip_write_parse(self, tmp_path):
        chains = pdb_io.parse_pdb(PDB)
        h = chains['H']
        out = str(tmp_path / 'h.pdb')
        pdb_io.save_complex_pdb(
            out, h.str_seq, 'H', '', 'L',
            np.concatenate([h.coords]),
            np.full((len(h.str_seq),), 50.0), None)
        back = pdb_io.parse_pdb(out)
        assert back['H'].str_seq == h.str_seq
        ca = rc.atom_order['CA']
        sel = h.coord_mask[:, 1]
        np.testing.assert_allclose(back['H'].coords[sel, 1],
                                   h.coords[sel, 1], atol=2e-3)


class TestNumbering:
    def test_heavy_cdrs_bounded_by_anchors(self):
        chains = pdb_io.parse_pdb(PDB)
        seq = chains['H'].str_seq
        ann = annotate_domain(seq, 'H', backend='template')
        assert ann is not None
        dom = seq[ann.start:ann.end]
        # CDR3 must sit between the last Cys and the WGxG motif.
        import re
        c104 = dom.rfind('C')
        m = re.search('WG.G', dom)
        cdr3 = np.nonzero(ann.cdr_def == rc.cdr_str_to_enum['H3'])[0]
        assert cdr3.min() == c104 + 1
        assert cdr3.max() == m.start() - 1

    def test_light_chain_annotation(self):
        chains = pdb_io.parse_pdb(PDB)
        ann = annotate_domain(chains['L'].str_seq, 'L', backend='template')
        assert ann is not None
        for cdr in ['L1', 'L2', 'L3']:
            assert np.any(ann.cdr_def == rc.cdr_str_to_enum[cdr]), cdr

    def test_non_antibody_rejected(self):
        ann = annotate_domain('MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQA', 'H',
                              backend='template')
        assert ann is None


class TestComplexAssembly:
    def test_complex_from_pdb(self):
        ex = ds.complex_from_pdb(PDB, 'H', 'L', ['S'])
        assert set(np.unique(ex['antibody_chain_ids'])) == {0, 1}
        assert np.all(ex['antigen_cdr_def'] == rc.antigen_cdr_index)
        # Light-chain residx offset.
        light = ex['antibody_residx'][ex['antibody_chain_ids'] == 1]
        assert light.min() >= rc.residue_chain_index_offset

    def test_multichain_antigen(self):
        ex = ds.complex_from_pdb(PDB_MULTI, 'X', 'Z', ['F', 'E'])
        ag_chains = set(np.unique(ex['antigen_chain_ids']))
        assert ag_chains == {2, 3}

    def test_prepare_example_static_shapes(self):
        cfg = DataConfig(max_antibody_len=256, max_antigen_len=32)
        ex = ds.complex_from_pdb(PDB, 'H', 'L', ['S'])
        prep = ds.prepare_example(ex, cfg)
        assert prep is not None
        feats, meta = prep
        assert feats['seq'].shape == (288,)
        assert feats['atom14_gt_positions'].shape == (288, 14, 3)
        assert feats['anchor_flag'].shape == (256,)
        assert meta['name'] == '6ct7_H_L_S'
        # Padding is masked out.
        n_ab = len(meta['str_heavy_seq']) + len(meta['str_light_seq'])
        assert feats['mask'][:n_ab].all()
        assert not feats['mask'][n_ab:256].any()

    def test_interface_crop_keeps_nearby_antigen(self):
        cfg = DataConfig(max_antibody_len=256, max_antigen_len=32)
        ex = ds.complex_from_pdb(PDB, 'H', 'L', ['S'])
        ex = ds.center_on_antibody(ex)
        cropped = ds.interface_crop(ex)
        assert cropped is not None
        # All kept antigen residues are within ~16+buffer A of the antibody.
        ca = rc.atom_order['CA']
        ab_ca = ex['antibody_coords'][:, ca]
        kept = cropped['antigen_coords'][:, ca]
        kept_mask = cropped['antigen_coord_mask'][:, ca] > 0
        d = np.linalg.norm(kept[kept_mask][:, None] - ab_ca[None], axis=-1)
        assert d.min(axis=-1).max() < 60.0

    def test_anchor_flags_flank_cdrs(self):
        ex = ds.complex_from_pdb(PDB, 'H', 'L', ['S'])
        ex = ds.center_on_antibody(ex)
        cropped = ds.interface_crop(ex)
        anchor = cropped['anchor_flag']
        cdr = ex['antibody_cdr_def']
        for name, enum in rc.cdr_str_to_enum.items():
            idx = np.nonzero(cdr == enum)[0]
            if idx.size == 0:
                continue
            a_idx = np.nonzero(anchor == enum)[0]
            assert len(a_idx) == 2, name
            assert a_idx[0] == max(0, idx.min() - 1)
            assert a_idx[1] == idx.max() + 1

    def test_antigen_window(self):
        cfg = DataConfig(max_antigen_len=4)
        ex = ds.complex_from_pdb(PDB, 'H', 'L', ['S'])
        ex = ds.center_on_antibody(ex)
        ex = ds.interface_crop(ex)
        w = ds.antigen_window(ex, 4)
        assert len(w['antigen_str_seq']) <= 4
