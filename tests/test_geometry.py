"""Unit tests for quaternion/rigid algebra and frame math (closed forms)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from abx_tpu.common import residue_constants as rc
from abx_tpu.geometry import quat as q
from abx_tpu.geometry import frames
from abx_tpu.geometry.rigid import Rigid, rigids_from_3_points


def random_rotvecs(key, shape, scale=2.0):
    """Random rotation vectors with angle strictly inside (0, pi)."""
    v = jax.random.normal(key, shape + (3,))
    unit = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    angles = jax.random.uniform(
        jax.random.fold_in(key, 1), shape + (1,), minval=0.01, maxval=3.1)
    return unit * angles


class TestQuat:
    def test_rotvec_quat_roundtrip(self):
        v = random_rotvecs(jax.random.PRNGKey(0), (64,))
        back = q.quat_to_rotvec(q.rotvec_to_quat(v))
        np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-5)

    def test_small_angle_roundtrip(self):
        v = 1e-8 * jax.random.normal(jax.random.PRNGKey(1), (16, 3))
        back = q.quat_to_rotvec(q.rotvec_to_quat(v))
        assert np.all(np.isfinite(np.asarray(back)))
        np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-9)

    def test_quat_to_rot_matches_scipy(self):
        from scipy.spatial.transform import Rotation
        v = np.asarray(random_rotvecs(jax.random.PRNGKey(2), (32,)))
        r_scipy = Rotation.from_rotvec(v).as_matrix()
        r_mine = np.asarray(q.rotvec_to_rot(jnp.asarray(v)))
        np.testing.assert_allclose(r_mine, r_scipy, atol=1e-5)

    def test_rot_to_quat_roundtrip(self):
        v = random_rotvecs(jax.random.PRNGKey(3), (40,))
        quat = q.rotvec_to_quat(v)
        rot = q.quat_to_rot(quat)
        quat2 = q.rot_to_quat(rot)
        # Quaternions are sign-ambiguous.
        dot = np.abs(np.sum(np.asarray(quat) * np.asarray(quat2), axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    def test_quat_multiply_matches_rotation_compose(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(4))
        v1, v2 = random_rotvecs(k1, (8,)), random_rotvecs(k2, (8,))
        q1, q2 = q.rotvec_to_quat(v1), q.rotvec_to_quat(v2)
        lhs = q.quat_to_rot(q.quat_multiply(q1, q2))
        rhs = jnp.einsum('...ij,...jk->...ik', q.quat_to_rot(q1),
                         q.quat_to_rot(q2))
        # f32 only; exact in f64.
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=5e-3)

    def test_invert_quat(self):
        v = random_rotvecs(jax.random.PRNGKey(5), (8,))
        quat = q.rotvec_to_quat(v)
        prod = q.quat_multiply(quat, q.invert_quat(quat))
        np.testing.assert_allclose(
            np.asarray(prod), np.tile([1, 0, 0, 0], (8, 1)), atol=1e-5)

    def test_precompose_vec_normalized(self):
        quat = q.rotvec_to_quat(random_rotvecs(jax.random.PRNGKey(6), (8,)))
        upd = 0.1 * jax.random.normal(jax.random.PRNGKey(7), (8, 3))
        out = q.quat_precompose_vec(quat, upd)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-5)


class TestRigid:
    def test_compose_invert_identity(self):
        key = jax.random.PRNGKey(8)
        r = Rigid(q.rotvec_to_rot(random_rotvecs(key, (10,))),
                  jax.random.normal(jax.random.PRNGKey(9), (10, 3)))
        ident = r.compose(r.invert())
        np.testing.assert_allclose(
            np.asarray(ident.rot), np.tile(np.eye(3), (10, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ident.trans), 0.0, atol=1e-5)

    def test_apply_invert_roundtrip(self):
        r = Rigid(q.rotvec_to_rot(random_rotvecs(jax.random.PRNGKey(10), (4,))),
                  jax.random.normal(jax.random.PRNGKey(11), (4, 3)))
        pts = jax.random.normal(jax.random.PRNGKey(12), (4, 7, 3))
        back = r.invert().apply(r.apply(pts))
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)

    def test_tensor7_roundtrip(self):
        r = Rigid(q.rotvec_to_rot(random_rotvecs(jax.random.PRNGKey(13), (6,))),
                  jax.random.normal(jax.random.PRNGKey(14), (6, 3)))
        r2 = Rigid.from_tensor7(r.to_tensor7())
        np.testing.assert_allclose(np.asarray(r2.rot), np.asarray(r.rot),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(r2.trans), np.asarray(r.trans),
                                   atol=1e-5)

    def test_from_3_points_orthonormal(self):
        keys = jax.random.split(jax.random.PRNGKey(15), 3)
        a, b, c = (jax.random.normal(k, (20, 3)) for k in keys)
        r = rigids_from_3_points(a, b, c)
        rot = np.asarray(r.rot)
        np.testing.assert_allclose(
            rot @ np.swapaxes(rot, -1, -2), np.tile(np.eye(3), (20, 1, 1)),
            atol=1e-4)
        np.testing.assert_allclose(np.linalg.det(rot), 1.0, atol=1e-4)


def _synthetic_structure(num_res=16, seed=0):
    """Build a synthetic 'protein' by placing idealized residues on a helix."""
    rng = np.random.RandomState(seed)
    aatype = rng.randint(0, 20, size=(1, num_res)).astype(np.int32)
    atom37_pos = np.zeros((1, num_res, 37, 3), dtype=np.float32)
    atom37_mask = np.zeros((1, num_res, 37), dtype=np.float32)
    for i in range(num_res):
        resname = rc.restype_1to3[rc.restypes[aatype[0, i]]]
        # Random backbone frame per residue.
        rv = rng.randn(3)
        from scipy.spatial.transform import Rotation
        rot = Rotation.from_rotvec(rv).as_matrix().astype(np.float32)
        trans = 10.0 * rng.randn(3).astype(np.float32)
        for name, group, pos in rc.rigid_group_atom_positions[resname]:
            if group != 0:
                continue
            atom37_pos[0, i, rc.atom_order[name]] = rot @ np.array(pos) + trans
            atom37_mask[0, i, rc.atom_order[name]] = 1.0
    return aatype, atom37_pos, atom37_mask


class TestFrames:
    def test_atom37_to_frames_orthonormal(self):
        aatype, pos, mask = _synthetic_structure()
        out = frames.atom37_to_frames(
            jnp.asarray(aatype), jnp.asarray(pos), jnp.asarray(mask))
        bb = out['rigidgroups_gt_frames']
        rot = np.asarray(bb.rot)[:, :, 0]
        np.testing.assert_allclose(
            rot @ np.swapaxes(rot, -1, -2),
            np.tile(np.eye(3), rot.shape[:-2] + (1, 1)), atol=1e-4)
        # Backbone frame exists for all residues with N/CA/C.
        assert np.all(np.asarray(out['rigidgroups_gt_exists'])[:, :, 0] == 1.0)

    def test_torsion_frames_rebuild_backbone_atoms(self):
        """frames -> atoms round trip: idealized backbone atoms reconstruct."""
        aatype, pos, mask = _synthetic_structure()
        out = frames.atom37_to_frames(
            jnp.asarray(aatype), jnp.asarray(pos), jnp.asarray(mask))
        bb = out['rigidgroups_gt_frames'][..., 0]
        # psi etc unknown -> zero angles; backbone atoms (group 0) don't care.
        sin_cos = jnp.zeros((1, aatype.shape[1], 7, 2))
        sin_cos = sin_cos.at[..., 1].set(1.0)
        all_frames = frames.torsion_angles_to_frames(
            jnp.asarray(aatype), bb, sin_cos)
        atom14 = np.asarray(
            frames.frames_to_atom14_pos(jnp.asarray(aatype), all_frames))
        a37_to_14 = rc.restype_atom37_to_atom14
        for i in range(aatype.shape[1]):
            for name in ['N', 'CA', 'C']:
                idx37 = rc.atom_order[name]
                idx14 = a37_to_14[aatype[0, i], idx37]
                np.testing.assert_allclose(
                    atom14[0, i, idx14], pos[0, i, idx37], atol=2e-3)

    def test_torsion_angles_roundtrip(self):
        """atoms -> torsions -> frames -> atoms reconstructs heavy atoms."""
        rng = np.random.RandomState(3)
        num_res = 12
        aatype = rng.randint(0, 20, size=(1, num_res)).astype(np.int32)
        # Build residues with random chi angles by composing literature frames.
        sin_cos = rng.randn(1, num_res, 7, 2).astype(np.float32)
        sin_cos /= np.linalg.norm(sin_cos, axis=-1, keepdims=True)
        bb = Rigid.identity((1, num_res))
        all_frames = frames.torsion_angles_to_frames(
            jnp.asarray(aatype), bb, jnp.asarray(sin_cos))
        atom14 = frames.frames_to_atom14_pos(jnp.asarray(aatype), all_frames)
        # Scatter into atom37.
        a14_to_37 = rc.restype_atom14_to_atom37[aatype]  # (1, L, 14)
        atom37 = np.zeros((1, num_res, 37, 3), dtype=np.float32)
        mask37 = np.zeros((1, num_res, 37), dtype=np.float32)
        a14 = np.asarray(atom14)
        for i in range(num_res):
            for j in range(14):
                if rc.restype_atom14_mask[aatype[0, i], j]:
                    atom37[0, i, a14_to_37[0, i, j]] = a14[0, i, j]
                    mask37[0, i, a14_to_37[0, i, j]] = 1.0
        out = frames.atom37_to_torsion_angles(
            jnp.asarray(aatype), jnp.asarray(atom37), jnp.asarray(mask37))
        got = np.asarray(out['torsion_angles_sin_cos'])
        want = sin_cos
        tmask = np.asarray(out['torsion_angles_mask'])
        # Only chi angles (3:) are recoverable without neighbours; psi needs O
        # which we have. Compare chi1-4 and psi where mask says valid.
        for t in range(2, 7):
            sel = tmask[0, :, t] > 0
            if not np.any(sel):
                continue
            np.testing.assert_allclose(
                got[0, sel, t], want[0, sel, t], atol=2e-2)

    def test_pseudo_beta_virtual_close_to_real_cb(self):
        aatype, pos, mask = _synthetic_structure()
        has_cb = mask[:, :, rc.atom_order['CB']] > 0
        pb = np.asarray(frames.pseudo_beta_virtual(jnp.asarray(pos)))
        real_cb = pos[:, :, rc.atom_order['CB']]
        err = np.linalg.norm(pb[has_cb] - real_cb[has_cb], axis=-1)
        assert np.all(err < 0.6), err.max()

    def test_dgram_bins(self):
        pos = jnp.asarray(np.array([[[0, 0, 0], [0, 0, 5.0], [0, 0, 30.0]]],
                                   dtype=np.float32))
        bins = np.asarray(frames.dgram_from_positions(pos, 15, 3.375, 21.375))
        assert bins[0, 0, 0] == 0
        assert bins[0, 0, 2] == 14  # beyond max bin
        assert 0 < bins[0, 0, 1] < 14


class TestStereoBounds:
    def test_bounds_match_reference(self):
        """Golden: make_atom14_dists_bounds == reference tables."""
        import sys
        sys.path.insert(0, '/root/reference')
        try:
            from abx.common import residue_constants as ref_rc
        except ImportError:
            import pytest
            pytest.skip('reference not importable')
        ours = rc.make_atom14_dists_bounds()
        theirs = ref_rc.make_atom14_dists_bounds()
        for k in ('lower_bound', 'upper_bound', 'stddev'):
            np.testing.assert_allclose(ours[k], theirs[k], atol=1e-6,
                                       err_msg=k)

    def test_within_residue_violation_detects_squeezed_bond(self):
        """violation_energy's within term fires when a bond is compressed."""
        import jax.numpy as jnp
        from abx_tpu.evaluation.relax import violation_energy
        # One alanine with ideal-ish geometry.
        atom14 = np.zeros((1, 14, 3), np.float32)
        atom14[0, 0] = [0.0, 0.0, 0.0]        # N
        atom14[0, 1] = [1.459, 0.0, 0.0]      # CA
        atom14[0, 2] = [2.0, 1.42, 0.0]       # C (~1.52 from CA)
        atom14[0, 3] = [3.2, 1.5, 0.0]        # O (~1.23 from C)
        atom14[0, 4] = [1.95, -0.85, 1.2]     # CB (~1.52 from CA)
        exists = np.zeros((1, 14), np.float32)
        exists[0, :5] = 1.0
        seq = np.array([rc.restype_order['A']])
        residx = np.array([0])
        _, terms = violation_energy(jnp.asarray(atom14), jnp.asarray(seq),
                                    jnp.asarray(exists), jnp.asarray(residx))
        ok_within = float(terms['within'])
        # Now squeeze N-CA to 0.7 A — far below the lower bound.
        atom14_bad = atom14.copy()
        atom14_bad[0, 1] = [0.7, 0.0, 0.0]
        _, terms_bad = violation_energy(jnp.asarray(atom14_bad),
                                        jnp.asarray(seq),
                                        jnp.asarray(exists),
                                        jnp.asarray(residx))
        assert float(terms_bad['within']) > ok_within + 0.01
