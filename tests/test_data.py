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


class TestSeqresAlignment:
    def _chain(self):
        from abx_tpu.data.pdb_io import parse_pdb
        return parse_pdb('testdata/6ct7_H_L_S.pdb')['H']

    def test_expand_places_gaps_at_true_positions(self):
        from abx_tpu.data.pdb_io import ChainData, expand_to_seqres
        h = self._chain()
        # Synthesize a gappy observation: drop residues 40..47 (missing
        # density) and build SEQRES = the full original sequence.
        keep = np.ones(len(h.str_seq), bool)
        keep[40:48] = False
        obs = ChainData('H', ''.join(c for c, k in zip(h.str_seq, keep) if k),
                        h.coords[keep], h.coord_mask[keep],
                        [r for r, k in zip(h.resseq, keep) if k],
                        [i for i, k in zip(h.icodes, keep) if k])
        full = expand_to_seqres(obs, h.str_seq)
        assert full.str_seq == h.str_seq
        np.testing.assert_array_equal(full.coord_mask[40:48], False)
        np.testing.assert_allclose(full.coords[keep], h.coords[keep])
        # author numbering stays monotone through the gap
        rs = np.asarray(full.resseq)
        assert np.all(np.diff(rs) > 0)

    def test_expand_tolerates_point_mutations(self):
        from abx_tpu.data.pdb_io import ChainData, expand_to_seqres
        h = self._chain()
        seqres = list(h.str_seq)
        seqres[10] = 'A' if seqres[10] != 'A' else 'G'  # engineered mutation
        full = expand_to_seqres(h, ''.join(seqres))
        # all but the mutated position are placed
        assert full.coord_mask[:10].any(axis=-1).all()
        assert full.coord_mask[11:].any(axis=-1).all()

    def test_unrelated_seqres_is_rejected(self):
        from abx_tpu.data.pdb_io import expand_to_seqres
        h = self._chain()
        out = expand_to_seqres(h, 'ACDEFGHIKLMNPQRSTVWY' * 10)
        assert out is h  # falls back to the observed-only view

    def test_complex_from_pdb_use_seqres_flag(self, tmp_path):
        """A PDB with SEQRES + missing density round-trips through
        complex_from_pdb(use_seqres=True) with full-length chains."""
        from abx_tpu.data.pdb_io import parse_pdb, parse_seqres
        src = open('testdata/6ct7_H_L_S.pdb').read()
        # Build SEQRES records for chain H from the parsed sequence.
        h = self._chain()
        three = [__import__('abx_tpu.common.residue_constants',
                            fromlist=['restype_1to3']).restype_1to3[c]
                 for c in h.str_seq]
        seqres_lines = []
        for i in range(0, len(three), 13):
            row = three[i:i + 13]
            seqres_lines.append(
                f'SEQRES {i // 13 + 1:>3d} H {len(three):>4d}  '
                + ' '.join(row))
        # Drop a stretch of ATOM records (residues 30-35 of chain H).
        drop = {(r, ' ') for r in h.resseq[30:36]}
        lines = []
        for line in src.splitlines():
            if line[:6] == 'ATOM  ' and line[21] == 'H' and \
                    (int(line[22:26]), line[26]) in drop:
                continue
            lines.append(line)
        pdb = tmp_path / '6ct7_H_L_S.pdb'
        pdb.write_text('\n'.join(seqres_lines + lines) + '\n')
        assert parse_seqres(str(pdb))['H'] == h.str_seq
        ex = ds.complex_from_pdb(str(pdb), 'H', 'L', ['S'], use_seqres=True)
        # same antibody length as the intact structure, gap masked
        ex_full = ds.complex_from_pdb('testdata/6ct7_H_L_S.pdb', 'H', 'L',
                                      ['S'])
        assert len(ex['antibody_str_seq']) == len(ex_full['antibody_str_seq'])
        assert ex['antibody_str_seq'] == ex_full['antibody_str_seq']
        # the dropped residues are present but unobserved
        ca = ex['antibody_coord_mask'][:, 1]
        assert int((~ca.astype(bool)).sum()) >= 6


def test_cdr_subset_size_law_matches_reference():
    """Training CDR-subset augmentation follows the reference's law
    (features.py:147-149): size ~ Uniform{1..K}, uniform subsets."""
    from abx_tpu.data.features import select_cdrs_mask
    b, l_ab, K = 1500, 60, 6
    anchor = np.zeros((b, l_ab), np.int32)
    enums = [1, 3, 5, 8, 10, 12]
    for i, e in enumerate(enums):
        anchor[:, 8 * i + 1] = e
        anchor[:, 8 * i + 6] = e
    import jax
    import jax.numpy as jnp
    out = np.asarray(select_cdrs_mask(
        jnp.asarray(anchor), l_ab, enums, jnp.ones((b, l_ab + 10)),
        key=jax.random.PRNGKey(0)))[:, :l_ab]
    sizes = np.zeros((b,), int)
    for i in range(K):
        sizes += out[:, 8 * i + 2: 8 * i + 5].any(axis=1)
    hist = np.bincount(sizes, minlength=K + 1) / b
    assert hist[0] < 0.01            # never empty
    # each m in 1..K close to 1/K (jitter can shrink a region to empty,
    # shifting ~2% of mass down)
    assert np.all(np.abs(hist[1:] - 1.0 / K) < 0.04), hist
