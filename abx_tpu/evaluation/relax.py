"""Structure relaxation + interface energy.

Parity surface: /root/reference/abx/relax.py (PyRosetta FastRelax restricted
to CDR backbones + neighbouring side chains, ref2015 score) and
/root/reference/abx/common/energy.py (InterfaceAnalyzerMover dG_separated).

Two backends:
  * `pyrosetta` — used when importable: faithful FastRelax + dG_separated.
  * `jax` (always available, TPU-native) — gradient-based minimisation of an
    AF2-style violation energy (ideal backbone bond lengths/angles, van der
    Waals clashes) over the diffused-region atoms, with harmonic restraints
    to the input coordinates.  This is the compiled, batched analogue of
    "relax the CDRs, keep the frameworks": it runs inside jit on device and
    vectorises over samples — something FastRelax fundamentally cannot do.

The interface energy fallback is a Lennard-Jones 6-12 contact score across
the antibody/antigen interface — a *proxy* (clearly labelled in output) for
ranking designs when PyRosetta is unavailable; absolute values are not
comparable to ref2015.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from abx_tpu.common import residue_constants as rc

# Ideal backbone geometry (Engh & Huber values, as used by AF2 violations).
BOND_N_CA = 1.458
BOND_CA_C = 1.525
BOND_C_O = 1.231
BOND_C_N = rc.between_res_bond_length_c_n[0]
BOND_C_N_PRO = rc.between_res_bond_length_c_n[1]


@dataclasses.dataclass(frozen=True)
class RelaxConfig:
    iterations: int = 200
    learning_rate: float = 2e-3
    restraint_weight: float = 1.0
    clash_weight: float = 10.0
    bond_weight: float = 10.0
    clash_overlap_tolerance: float = 1.5


def violation_energy(atom14, seq, atom_exists, residx,
                     clash_overlap_tolerance: float = 1.5):
    """Differentiable violation energy of an atom14 structure.

    Returns (total, dict of terms); all terms are mean-per-violating-pair so
    the magnitude is interpretable across lengths.
    """
    n_pos = atom14[:, 0]
    ca_pos = atom14[:, 1]
    c_pos = atom14[:, 2]
    o_pos = atom14[:, 3]
    mask_n = atom_exists[:, 0]
    mask_ca = atom_exists[:, 1]
    mask_c = atom_exists[:, 2]
    mask_o = atom_exists[:, 3]

    def bond_term(a, b, ideal, m):
        d = jnp.sqrt(jnp.sum(jnp.square(a - b), -1) + 1e-8)
        return jnp.sum(jnp.square(d - ideal) * m) / (jnp.sum(m) + 1e-6)

    bonds = (bond_term(n_pos, ca_pos, BOND_N_CA, mask_n * mask_ca)
             + bond_term(ca_pos, c_pos, BOND_CA_C, mask_ca * mask_c)
             + bond_term(c_pos, o_pos, BOND_C_O, mask_c * mask_o))

    # Peptide bond C(i)-N(i+1) within chains.
    consecutive = (residx[1:] - residx[:-1] == 1).astype(jnp.float32)
    is_pro = (seq[1:] == rc.restype_order['P']).astype(jnp.float32)
    ideal_cn = BOND_C_N * (1 - is_pro) + BOND_C_N_PRO * is_pro
    m_pep = mask_c[:-1] * mask_n[1:] * consecutive
    d_cn = jnp.sqrt(jnp.sum(jnp.square(c_pos[:-1] - n_pos[1:]), -1) + 1e-8)
    bonds = bonds + jnp.sum(jnp.square(d_cn - ideal_cn) * m_pep) / (
        jnp.sum(m_pep) + 1e-6)

    # Clashes between non-bonded atom pairs.
    radii = jnp.asarray(rc.atom14_element_radii())[
        jnp.clip(seq, 0, rc.restype_num)]
    l = seq.shape[0]
    d = jnp.sqrt(jnp.sum(jnp.square(
        atom14[:, None, :, None, :] - atom14[None, :, None, :, :]), -1)
        + 1e-8)
    pair_exist = atom_exists[:, None, :, None] * atom_exists[None, :, None, :]
    same = jnp.eye(l)[:, :, None, None]
    neighbor = (jnp.eye(l, k=1) + jnp.eye(l, k=-1))[:, :, None, None]
    allowed = (radii[:, None, :, None] + radii[None, :, None, :]
               - clash_overlap_tolerance)
    clash = jnp.square(jnp.maximum(allowed - d, 0.0))
    clash_mask = pair_exist * (1 - same) * (1 - neighbor)
    clash_e = jnp.sum(clash * clash_mask) / (jnp.sum(clash_mask) + 1e-6)

    # Within-residue stereo bounds (Engh & Huber;
    # reference residue_constants.py:483-525): covalent/virtual bond pairs
    # within each residue must stay in [lower, upper].
    bounds = rc.make_atom14_dists_bounds(
        overlap_tolerance=clash_overlap_tolerance)
    seq_c = jnp.clip(seq, 0, rc.restype_num)
    lo = jnp.asarray(bounds['lower_bound'])[seq_c]   # (L, 14, 14)
    hi = jnp.asarray(bounds['upper_bound'])[seq_c]
    dw = jnp.sqrt(jnp.sum(jnp.square(
        atom14[:, :, None, :] - atom14[:, None, :, :]), -1) + 1e-8)
    w_mask = (atom_exists[:, :, None] * atom_exists[:, None, :]
              * (1.0 - jnp.eye(14)) * (hi > 0))
    w_err = (jnp.maximum(lo - dw, 0.0)
             + jnp.maximum(dw - jnp.where(hi > 0, hi, 1e10), 0.0))
    within_e = jnp.sum(jnp.square(w_err) * w_mask) / (
        jnp.sum(w_mask) + 1e-6)

    total = bonds + clash_e + within_e
    return total, {'bond': bonds, 'clash': clash_e, 'within': within_e}


def jax_relax(atom14, seq, atom_exists, residx, move_mask,
              config: RelaxConfig = RelaxConfig()):
    """Minimise violation energy over `move_mask` atoms (1 = movable).

    Args:
        atom14: (L, 14, 3); seq (L,); atom_exists (L, 14); residx (L,);
        move_mask: (L,) residues allowed to move.
    Returns (relaxed atom14, metrics before/after).
    """
    import optax

    atom14 = jnp.asarray(atom14)
    move = jnp.asarray(move_mask)[:, None, None]
    init = atom14

    def energy(x):
        pos = init * (1 - move) + x * move
        e, terms = violation_energy(pos, seq, atom_exists, residx,
                                    config.clash_overlap_tolerance)
        restraint = jnp.sum(jnp.square(x - init) * move
                            * atom_exists[..., None]) / (
            jnp.sum(move * atom_exists[..., None]) + 1e-6)
        return (config.bond_weight * terms['bond']
                + config.clash_weight * terms['clash']
                + config.restraint_weight * restraint), terms

    opt = optax.adam(config.learning_rate)

    @jax.jit
    def run(x0):
        e0, terms0 = energy(x0)

        def step(carry, _):
            x, opt_state = carry
            (e, _), grads = jax.value_and_grad(energy, has_aux=True)(x)
            updates, opt_state = opt.update(grads, opt_state)
            return (optax.apply_updates(x, updates), opt_state), e

        (x_final, _), _ = jax.lax.scan(
            step, (x0, opt.init(x0)), None, length=config.iterations)
        e1, terms1 = energy(x_final)
        pos = init * (1 - move) + x_final * move
        return pos, (e0, terms0, e1, terms1)

    relaxed, (e0, terms0, e1, terms1) = run(atom14)
    metrics = {
        'energy_before': float(e0), 'energy_after': float(e1),
        'bond_before': float(terms0['bond']),
        'bond_after': float(terms1['bond']),
        'clash_before': float(terms0['clash']),
        'clash_after': float(terms1['clash']),
    }
    return np.asarray(relaxed), metrics


# -- interface energy -------------------------------------------------------

def lj_interface_score(atom14_ab, exists_ab, seq_ab,
                       atom14_ag, exists_ag, seq_ag) -> float:
    """Lennard-Jones 6-12 cross-interface score (proxy for dG_separated).

    More negative = more favourable packed interface.
    """
    r_ab = rc.atom14_element_radii()[np.clip(seq_ab, 0, rc.restype_num)]
    r_ag = rc.atom14_element_radii()[np.clip(seq_ag, 0, rc.restype_num)]
    a = np.asarray(atom14_ab).reshape(-1, 3)
    b = np.asarray(atom14_ag).reshape(-1, 3)
    ma = np.asarray(exists_ab).reshape(-1) > 0
    mb = np.asarray(exists_ag).reshape(-1) > 0
    ra = r_ab.reshape(-1)[ma]
    rb = r_ag.reshape(-1)[mb]
    a, b = a[ma], b[mb]
    d = np.linalg.norm(a[:, None] - b[None, :], axis=-1)
    sigma = (ra[:, None] + rb[None, :]) * 0.95
    near = d < 10.0
    with np.errstate(over='ignore'):
        x6 = (sigma / np.maximum(d, 0.5)) ** 6
        lj = x6 * x6 - 2 * x6
    return float(np.sum(lj[near]))


def interface_energy(pdb_file: str, antibody_chains, antigen_chains
                     ) -> Tuple[float, str]:
    """dG of the antibody-antigen interface.

    PyRosetta ref2015 dG_separated when available (reference energy.py),
    else the LJ proxy (backend tag returned alongside the value).
    """
    try:
        return _pyrosetta_dg(pdb_file, antibody_chains, antigen_chains), \
            'pyrosetta_ref2015'
    except ImportError:
        pass
    from abx_tpu.data.pdb_io import parse_pdb
    chains = parse_pdb(pdb_file)
    ab = [chains[c] for c in antibody_chains if c in chains]
    ag = [chains[c] for c in antigen_chains if c in chains]
    if not ab or not ag:
        return 0.0, 'missing_chains'
    cat = lambda parts, attr: np.concatenate(
        [getattr(p, attr) for p in parts])
    seq = lambda parts: rc.sequence_to_index(
        ''.join(p.str_seq for p in parts))
    score = lj_interface_score(
        cat(ab, 'coords'), cat(ab, 'coord_mask'), seq(ab),
        cat(ag, 'coords'), cat(ag, 'coord_mask'), seq(ag))
    return score, 'lj_proxy'


def try_pyrosetta_pack(pdb_file: str, out_file: str = None
                       ) -> 'Optional[str]':
    """Side-chain repack of a (grafted) complex; None when PyRosetta absent.

    Reference traj_evaluate.py Rosetta-packs the grafted full antibody
    before interface scoring; grafting changes CDR residue identities, so
    original rotamers are stale there.
    """
    try:
        from pyrosetta import init, pose_from_pdb
        from pyrosetta.rosetta.core.pack.task import TaskFactory
        from pyrosetta.rosetta.protocols.minimization_packing import (
            PackRotamersMover)
    except ImportError:
        return None
    init('-mute all')
    pose = pose_from_pdb(pdb_file)
    tf = TaskFactory()
    task = tf.create_packer_task(pose)
    task.restrict_to_repacking()
    PackRotamersMover(None, task).apply(pose)
    out_file = out_file or pdb_file
    pose.dump_pdb(out_file)
    return out_file


def _pyrosetta_dg(pdb_file, antibody_chains, antigen_chains):
    import pyrosetta  # noqa: F401  raises ImportError when absent
    from pyrosetta import init, pose_from_pdb
    from pyrosetta.rosetta.protocols.analysis import InterfaceAnalyzerMover
    init('-mute all')
    pose = pose_from_pdb(pdb_file)
    interface = (''.join(antibody_chains) + '_'
                 + ''.join(antigen_chains))
    mover = InterfaceAnalyzerMover(interface)
    mover.set_pack_separated(True)
    mover.apply(pose)
    return float(mover.get_interface_dG())
