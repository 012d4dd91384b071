"""Training losses, reconstructed from the reference's loss *configuration*.

The reference ships no training code: the loss functions named in
config_model.json:161-236 (`diffusion_rigids_loss`, `diffusion_seq_loss`,
`folding_loss`, `distogram_loss`, `predicted_lddt_loss`) have no
implementation anywhere in the repo (SURVEY.md §2.10, grep-verified).  These
are re-derived from the config parameters plus the FrameDiff/AF2 conventions
the architecture follows.

All losses are pure functions of (batch, model outputs) -> scalar, mean-
reduced with masks, and jit/grad-safe.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from abx_tpu.common import residue_constants as rc
from abx_tpu.geometry.quat import safe_norm
from abx_tpu.geometry.rigid import Rigid
from abx_tpu.utils.tensor import masked_mean


def _mse(err2, mask, axis=None):
    return jnp.sum(err2 * mask, axis=axis) / (jnp.sum(mask, axis=axis) + 1e-10)


def diffusion_rigids_loss(batch: Dict, folding: Dict, cfg: Any) -> Dict:
    """Score-matching loss on translations + rotations (FrameDiff style).

    Config (config_model.json:149-160): trans_loss_weight=1.0,
    rot_loss_weight=0.5, separate_rot_loss with angle term gated at
    t < rot_loss_t_threshold=0.2, x0 translation loss gated at
    t < trans_x0_t_threshold=1.0, coordinate_scaling=0.1.
    """
    diffuse_mask = (1 - batch['fixed_mask']) * batch['mask']
    t = batch['t']  # (B,)
    b = t.shape[0]

    gt_trans_score = batch['trans_score']       # (B, L, 3), scaled units
    gt_rot_score = batch['rot_score']
    pred_trans_score = folding['trans_score']
    pred_rot_score = folding['rot_score']

    trans_scale = batch['trans_score_scaling'][:, None, None]
    rot_scale = batch['rot_score_scaling'][:, None, None]

    # Translation score MSE (normalised by the score scaling).
    trans_err2 = jnp.sum(
        jnp.square((gt_trans_score - pred_trans_score) / trans_scale),
        axis=-1)
    trans_loss = _mse(trans_err2, diffuse_mask, axis=-1)  # (B,)

    # x0 loss at small t: supervise the implied clean translations.
    coord_scale = cfg.coordinate_scaling
    gt_trans_0 = batch['rigids_0'][..., 4:] * coord_scale
    pred_trans_0 = folding['rigids'][..., 4:] * coord_scale
    x0_err2 = jnp.sum(jnp.square(gt_trans_0 - pred_trans_0), axis=-1)
    x0_loss = _mse(x0_err2, diffuse_mask, axis=-1)
    use_x0 = (t < cfg.trans_x0_t_threshold).astype(jnp.float32)
    trans_total = use_x0 * x0_loss + (1 - use_x0) * trans_loss
    trans_total = trans_total * cfg.trans_loss_weight

    if cfg.separate_rot_loss:
        gt_angle = safe_norm(gt_rot_score)
        pred_angle = safe_norm(pred_rot_score)
        gt_axis = gt_rot_score / (gt_angle + 1e-6)
        pred_axis = pred_rot_score / (pred_angle + 1e-6)
        axis_err2 = jnp.sum(jnp.square(gt_axis - pred_axis), axis=-1)
        axis_loss = _mse(axis_err2, diffuse_mask, axis=-1)
        angle_err2 = jnp.squeeze(
            jnp.square((gt_angle - pred_angle) / rot_scale), axis=-1)
        angle_loss = _mse(angle_err2, diffuse_mask, axis=-1)
        # Angle term only at small t (the score magnitude explodes early).
        angle_loss = angle_loss * (
            t < cfg.rot_loss_t_threshold).astype(jnp.float32)
        rot_loss = (axis_loss + angle_loss) * cfg.rot_loss_weight
    else:
        rot_err2 = jnp.sum(
            jnp.square((gt_rot_score - pred_rot_score) / rot_scale), axis=-1)
        rot_loss = _mse(rot_err2, diffuse_mask, axis=-1) * cfg.rot_loss_weight

    loss = jnp.mean(trans_total + rot_loss)
    return {'loss': loss,
            'trans_loss': jnp.mean(trans_total),
            'rot_loss': jnp.mean(rot_loss)}


def diffusion_seq_loss(batch: Dict, seq_head: Dict, cfg: Any) -> Dict:
    """CTMC sequence loss: rate-weighted ELBO surrogate + NLL.

    Uses q_t0 / rate_t emitted by the forward noising
    (discrete_diffuser.py:72-127).  The tractable surrogate: cross-entropy of
    the model's p(x_0 | x_t) at diffused sites, importance-weighted by the
    posterior mismatch, plus `nll_weight` x plain CE (the dominant term used
    by discrete diffusion trainers in practice).
    """
    diffuse_mask = (1 - batch['fixed_mask']) * batch['mask']
    logits = seq_head['logits']  # (B, L, S)
    seq_0 = jnp.clip(batch['seq'], 0, logits.shape[-1] - 1)

    log_p = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(log_p, seq_0[..., None], axis=-1)[..., 0]

    # ELBO surrogate: posterior-weighted CE.  q(x_0 | x_t) ∝ q_t0[x_0, x_t];
    # weight each site by how informative x_t still is about x_0.
    q_t0 = batch['q_t0']  # (B, S, S)
    seq_t = jnp.clip(batch['seq_t'].astype(jnp.int32), 0,
                     logits.shape[-1] - 1)
    # q_t0[b, seq_0, seq_t]: probability the noising kept the signal.
    keep_prob = q_t0[jnp.arange(q_t0.shape[0])[:, None], seq_0, seq_t]
    elbo_weight = jax.lax.stop_gradient(1.0 - keep_prob + cfg.ratio_eps)
    elbo_term = elbo_weight * nll

    if cfg.get('exact_elbo', False) and 'rate_t' in batch \
            and 'seq_xt' in batch:
        elbo = ctmc_elbo_terms(batch, log_p, cfg.ratio_eps)
        loss = elbo['elbo'] + cfg.nll_weight * masked_mean(diffuse_mask, nll)
        aar = masked_mean(
            diffuse_mask,
            (jnp.argmax(logits, -1) == seq_0).astype(jnp.float32))
        return {'loss': loss, 'aar': aar, 'elbo': elbo['elbo'],
                'elbo_norm': elbo['normalizer'], 'elbo_jump': elbo['jump']}

    loss = masked_mean(diffuse_mask, elbo_term + cfg.nll_weight * nll)
    aar = masked_mean(diffuse_mask,
                      (jnp.argmax(logits, -1) == seq_0).astype(jnp.float32))
    return {'loss': loss, 'aar': aar}


def ctmc_elbo_terms(batch: Dict, log_p, eps: float) -> Dict:
    """Exact tau-leaping CTMC negative-ELBO terms (Campbell et al. 2022).

    The continuous-time term of the discrete-diffusion ELBO is
        E_t E_{x_t} [ sum_{y != x} Rhat_t(x, y)
                      - sum_{y != x} R_t(x, y) log Rhat_t(y, x) ]
    with reverse rate
        Rhat_t(x, y) = R_t(y, x) * sum_{x0} q_{t|0}(y|x0) p(x0|x)
                                            / q_{t|0}(x|x0).
    The second expectation is estimated with the single auxiliary jump the
    forward noising emits (reference discrete_diffuser.py:72-127): x_tilde
    differs from x_t at one site sampled proportional to the forward rates,
    so  sum_{y} R(x_t, y) log Rhat(y, x_t)
      = Z(x_t) * E_{x_tilde}[ log Rhat(x_tilde, x_t) ],
    Z = total forward outflow.  The model is evaluated at x_tilde (the
    network input seq_t IS x_tilde — tauLDR one-forward-pass scheme), which
    both terms use as their p(x0 | .) point.

    Normalisation: both terms are divided by the number of diffused sites
    so the magnitude is comparable to the per-site surrogate CE.
    """
    diffuse_mask = ((1 - batch['fixed_mask']) * batch['mask']).astype(
        jnp.float32)
    x_tilde = jnp.clip(batch['seq_t'].astype(jnp.int32), 0,
                       log_p.shape[-1] - 1)
    x_t = jnp.clip(batch['seq_xt'].astype(jnp.int32), 0,
                   log_p.shape[-1] - 1)
    qt0 = batch['q_t0']          # (B, S, S): q_{t|0}[x0, x_t]
    rate = batch['rate_t']       # (B, S, S)
    p0t = jnp.exp(log_p)         # (B, D, S): p(x0 | x_tilde)
    b, d_sites, s = p0t.shape

    # ---- normaliser term: sum_y Rhat(x_tilde -> y) per diffused site.
    # qt0_denom[b,d,x0] = q(x_tilde_d | x0); forward_rates[b,d,y] =
    # R(y -> x_tilde_d) (rate is symmetric for the uniform CTMC but keep
    # the general orientation).
    qt0_denom = jnp.swapaxes(jnp.take_along_axis(
        qt0, x_tilde[:, None, :], axis=2), 1, 2) + eps       # (B, D, S)
    forward_rates = jnp.swapaxes(jnp.take_along_axis(
        rate, x_tilde[:, None, :], axis=2), 1, 2)            # (B, D, S)
    inner = jnp.einsum('bds,bsy->bdy', p0t / qt0_denom, qt0)
    rhat = forward_rates * inner                             # (B, D, S)
    rhat = rhat * (1.0 - jax.nn.one_hot(x_tilde, s))
    normalizer = masked_mean(diffuse_mask, jnp.sum(rhat, axis=-1))

    # ---- jump term: Z(x_t) * log Rhat(x_tilde -> x_t) at the corrupted
    # site sigma (zero when masking reverted the corruption).
    differs = (x_tilde != x_t).astype(jnp.float32) * diffuse_mask
    has_jump = jnp.max(differs, axis=-1)                     # (B,)
    sigma = jnp.argmax(differs, axis=-1)                     # (B,)
    bi = jnp.arange(b)
    m = x_t[bi, sigma]           # target state of the reverse jump
    n_til = x_tilde[bi, sigma]   # current (corrupted) state
    # log Rhat(x_tilde -> x_t)|sigma
    #   = log [ R(m -> n_til) * sum_x0 q(m|x0) p(x0|x_tilde_sigma)/q(n|x0) ]
    p_sigma = p0t[bi, sigma]                                 # (B, S)
    ratio = qt0[bi, :, m] / (qt0[bi, :, n_til] + eps)        # (B, S)
    rev_jump = rate[bi, m, n_til] * jnp.sum(p_sigma * ratio, axis=-1)
    # When the forward corruption was reverted by the diffuse mask
    # (has_jump == 0) m == n_til and rate[m, m] < 0: log would be NaN and
    # 0 * NaN poisons the reported value (the gradient is unaffected —
    # multiplication VJP routes through has_jump=0 — but the loss scalar
    # and every metric derived from it become NaN).  Substitute 1 inside
    # the log at masked examples.
    log_rev = jnp.log(jnp.where(has_jump > 0, rev_jump, 1.0) + eps)
    # Z(x_t): total forward outflow from x_t over diffused sites.
    # rate_out[b,d,y] = R(x_t[b,d] -> y).
    rate_out = jnp.take_along_axis(rate, x_t[:, :, None], axis=1)
    rate_out = rate_out * (1.0 - jax.nn.one_hot(x_t, s))
    z_total = jnp.sum(jnp.sum(rate_out, -1) * diffuse_mask, axis=-1)
    n_sites = jnp.sum(diffuse_mask, axis=-1) + 1e-6
    jump = jnp.mean(has_jump * z_total * log_rev / n_sites)

    return {'elbo': normalizer - jump, 'normalizer': normalizer,
            'jump': jump}


def backbone_fape(pred_frames: Rigid, gt_frames: Rigid, frames_mask,
                  pred_pos, gt_pos, pos_mask, clamp_distance: float,
                  length_scale: float, unclamped_ratio: float = 0.0,
                  pair_weight=None, eps: float = 1e-6):
    """Frame-aligned point error (AF2 eq. 28), PER BATCH ELEMENT.

    pred/gt frames: Rigid (B, F); positions (B, P, 3).
    pair_weight: optional (B, F, P) weighting (e.g. interface pairs).
    Returns (B,) so callers can gate per-example (each example carries its
    own diffusion time t).
    """
    local_pred = pred_frames.invert()[..., None].apply(
        pred_pos[..., None, :, :])
    local_gt = gt_frames.invert()[..., None].apply(gt_pos[..., None, :, :])
    # shapes (B, F, P, 3)
    err = jnp.sqrt(jnp.sum(jnp.square(local_pred - local_gt), -1) + eps)
    clamped = jnp.clip(err, 0.0, clamp_distance)
    if unclamped_ratio > 0:
        clamped = (1 - unclamped_ratio) * clamped + unclamped_ratio * err
    mask = frames_mask[..., :, None] * pos_mask[..., None, :]
    if pair_weight is not None:
        mask = mask * pair_weight
    return jnp.sum(clamped * mask, axis=(-1, -2)) / (
        length_scale * (jnp.sum(mask, axis=(-1, -2)) + 1e-10))


def folding_loss(batch: Dict, folding: Dict, cfg: Any,
                 antibody_len: int) -> Dict:
    """Backbone FAPE over the IPA trajectory + interface FAPE + violations.

    Gated at t < t_filter=0.25 (loss config): structure supervision only when
    the denoised state is close to data.
    """
    t = batch['t']
    gate = (t < cfg.t_filter).astype(jnp.float32)

    gt_bb = batch['rigidgroups_gt_frames'][..., 0]
    gt_mask = (batch['rigidgroups_gt_exists'][..., 0]
               * batch['struc_loss_mask'])
    gt_ca = batch['atom14_gt_positions'][..., 1, :]
    ca_mask = batch['atom14_gt_exists'][..., 1] * batch['struc_loss_mask']

    fape_cfg = cfg.fape
    total_bb = 0.0
    traj = folding['traj']
    for frames in traj:
        total_bb += backbone_fape(
            frames, gt_bb, gt_mask, frames.trans, gt_ca, ca_mask,
            clamp_distance=fape_cfg.clamp_distance,
            length_scale=fape_cfg.loss_unit_distance,
            unclamped_ratio=fape_cfg.unclamped_ratio)
    bb_loss = cfg.backbone_fape_weight * total_bb / len(traj)

    # Interface FAPE: antibody frames vs antigen atoms and vice versa.
    icfg = cfg.interface_fape
    l = gt_mask.shape[1]
    is_ab = (jnp.arange(l) < antibody_len).astype(jnp.float32)
    cross = (is_ab[:, None] * (1 - is_ab)[None, :]
             + (1 - is_ab)[:, None] * is_ab[None, :])
    pair_weight = jnp.broadcast_to(cross, (gt_mask.shape[0], l, l))
    last = traj[-1]
    iface_loss = icfg.interface_weight * backbone_fape(
        last, gt_bb, gt_mask, last.trans, gt_ca, ca_mask,
        clamp_distance=icfg.clamp_distance,
        length_scale=icfg.loss_unit_distance,
        pair_weight=pair_weight)

    viol = violation_loss(batch, folding, cfg)
    # FAPE terms are per-example (B,); gate each example by its own t.
    # The violation term is a batch scalar (cross-residue pair sums), gated
    # by the in-gate batch fraction.
    loss = (jnp.mean(gate * (bb_loss + iface_loss))
            + jnp.mean(gate) * cfg.structural_violation_loss_weight
            * viol['loss'])
    return {'loss': loss, 'bb_fape': jnp.mean(bb_loss),
            'interface_fape': jnp.mean(iface_loss),
            'violation': viol['loss']}


def violation_loss(batch: Dict, folding: Dict, cfg: Any) -> Dict:
    """AF2-style structural violations: inter-residue bond geometry + clashes
    (reference eval/metric_scripts/cal_vio.py:29-113 reuses this math)."""
    pos = folding['final_atom14_positions']  # (B, L, 14, 3)
    seq = jnp.clip(batch['seq'], 0, rc.restype_num)
    atom_exists = batch['atom14_atom_exists']
    mask = batch['mask']

    # C(i) - N(i+1) bond.
    c_pos = pos[:, :-1, 2]
    n_pos = pos[:, 1:, 0]
    ca_pos = pos[:, :-1, 1]
    next_ca = pos[:, 1:, 1]
    bond_mask = (atom_exists[:, :-1, 2] * atom_exists[:, 1:, 0]
                 * mask[:, :-1] * mask[:, 1:])
    # Only within-chain (consecutive residx).
    consecutive = (batch['residx'][:, 1:]
                   - batch['residx'][:, :-1] == 1).astype(jnp.float32)
    bond_mask = bond_mask * consecutive

    next_is_pro = (seq[:, 1:] == rc.restype_order['P']).astype(jnp.float32)
    gt_len = (rc.between_res_bond_length_c_n[0] * (1 - next_is_pro)
              + rc.between_res_bond_length_c_n[1] * next_is_pro)
    gt_std = (rc.between_res_bond_length_stddev_c_n[0] * (1 - next_is_pro)
              + rc.between_res_bond_length_stddev_c_n[1] * next_is_pro)
    c_n_len = jnp.sqrt(jnp.sum(jnp.square(c_pos - n_pos), -1) + 1e-6)
    tol = cfg.violation_tolerance_factor
    bond_err = jnp.maximum(jnp.abs(c_n_len - gt_len) - tol * gt_std, 0.0)
    bond_loss = jnp.sum(bond_err * bond_mask) / (jnp.sum(bond_mask) + 1e-6)

    # Angles CA-C-N and C-N-CA.
    def cos_angle(a, b, c):
        v1 = a - b
        v2 = c - b
        v1 = v1 / jnp.sqrt(jnp.sum(jnp.square(v1), -1, keepdims=True) + 1e-6)
        v2 = v2 / jnp.sqrt(jnp.sum(jnp.square(v2), -1, keepdims=True) + 1e-6)
        return jnp.sum(v1 * v2, -1)

    ca_c_n = cos_angle(ca_pos, c_pos, n_pos)
    c_n_ca = cos_angle(c_pos, n_pos, next_ca)
    ang1_err = jnp.maximum(
        jnp.abs(ca_c_n - rc.between_res_cos_angles_ca_c_n[0])
        - tol * rc.between_res_cos_angles_ca_c_n[1], 0.0)
    ang2_err = jnp.maximum(
        jnp.abs(c_n_ca - rc.between_res_cos_angles_c_n_ca[0])
        - tol * rc.between_res_cos_angles_c_n_ca[1], 0.0)
    angle_loss = jnp.sum((ang1_err + ang2_err) * bond_mask) / (
        jnp.sum(bond_mask) + 1e-6)

    # Between-residue clashes on all atom14 pairs.
    radii = jnp.asarray(rc.atom14_element_radii())[seq]  # (B, L, 14)
    b, l = seq.shape
    d = jnp.sqrt(jnp.sum(jnp.square(
        pos[:, :, None, :, None, :] - pos[:, None, :, None, :, :]), -1)
        + 1e-10)  # (B, L, L, 14, 14)
    pair_exist = (atom_exists[:, :, None, :, None]
                  * atom_exists[:, None, :, None, :])
    res_pair = (mask[:, :, None] * mask[:, None, :])[..., None, None]
    same_res = jnp.eye(l)[None, :, :, None, None]
    # Exclude bonded neighbours (i, i+1) C-N and disulfides crudely via the
    # overlap tolerance.
    neighbor = (jnp.eye(l, k=1) + jnp.eye(l, k=-1))[None, :, :, None, None]
    allowed = (radii[:, :, None, :, None] + radii[:, None, :, None, :]
               - cfg.clash_overlap_tolerance)
    clash = jnp.maximum(allowed - d, 0.0)
    clash_mask = pair_exist * res_pair * (1 - same_res) * (1 - neighbor)
    if getattr(cfg, 'average_clashes', True):
        clash_loss = jnp.sum(clash * clash_mask) / (
            jnp.sum(clash_mask) + 1e-6)
    else:
        clash_loss = jnp.sum(clash * clash_mask) / (b * l)

    # Within-residue bond/angle/clash bounds (Engh & Huber table;
    # reference residue_constants.py:483-525 make_atom14_dists_bounds).
    bounds = rc.make_atom14_dists_bounds(
        overlap_tolerance=cfg.clash_overlap_tolerance,
        bond_length_tolerance_factor=tol)
    lo = jnp.asarray(bounds['lower_bound'])[seq]   # (B, L, 14, 14)
    hi = jnp.asarray(bounds['upper_bound'])[seq]
    dw = jnp.sqrt(jnp.sum(jnp.square(
        pos[:, :, :, None, :] - pos[:, :, None, :, :]), -1) + 1e-10)
    within_mask = (atom_exists[..., :, None] * atom_exists[..., None, :]
                   * (1.0 - jnp.eye(14)) * mask[..., None, None]
                   * (hi > 0))
    within_err = (jnp.maximum(lo - dw, 0.0)
                  + jnp.maximum(dw - jnp.where(hi > 0, hi, 1e10), 0.0))
    within_loss = jnp.sum(within_err * within_mask) / (
        jnp.sum(within_mask) + 1e-6)

    loss = bond_loss + angle_loss + clash_loss + within_loss
    return {'loss': loss, 'bond': bond_loss, 'angle': angle_loss,
            'clash': clash_loss, 'within': within_loss}


def distogram_loss(batch: Dict, disto: Dict, cfg: Any) -> Dict:
    """Binned-distance cross entropy on pseudo-beta positions, t-gated."""
    logits = disto['logits'].astype(jnp.float32)
    breaks = disto['breaks']
    pb = batch['pseudo_beta']
    pb_mask = batch['pseudo_beta_mask'] * batch['mask']
    dist2 = jnp.sum(jnp.square(pb[:, :, None] - pb[:, None, :]), -1)
    true_bins = jnp.sum((dist2[..., None] > jnp.square(breaks)).astype(
        jnp.int32), -1)
    log_p = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(log_p, true_bins[..., None], axis=-1)[..., 0]
    pair_mask = pb_mask[:, :, None] * pb_mask[:, None, :]
    gate = (batch['t'] < cfg.t_filter).astype(jnp.float32)
    loss = jnp.mean(gate * jnp.sum(ce * pair_mask, (-1, -2))
                    / (jnp.sum(pair_mask, (-1, -2)) + 1e-10))
    return {'loss': loss}


def predicted_lddt_loss(batch: Dict, plddt_head: Dict, folding: Dict,
                        cfg: Any) -> Dict:
    """CE between predicted lDDT bins and true per-residue CA lDDT."""
    logits = plddt_head['logits'].astype(jnp.float32)
    num_bins = logits.shape[-1]
    pred_ca = folding['final_atom14_positions'][..., 1, :]
    gt_ca = batch['atom14_gt_positions'][..., 1, :]
    ca_mask = batch['atom14_gt_exists'][..., 1] * batch['mask']

    # True lDDT (jit-safe).
    d_pred = jnp.sqrt(jnp.sum(jnp.square(
        pred_ca[:, :, None] - pred_ca[:, None, :]), -1) + 1e-10)
    d_gt = jnp.sqrt(jnp.sum(jnp.square(
        gt_ca[:, :, None] - gt_ca[:, None, :]), -1) + 1e-10)
    l = ca_mask.shape[1]
    pair_mask = (ca_mask[:, :, None] * ca_mask[:, None, :]
                 * (d_gt < 15.0) * (1 - jnp.eye(l)[None]))
    delta = jnp.abs(d_pred - d_gt)
    score = sum((delta < th).astype(jnp.float32)
                for th in (0.5, 1.0, 2.0, 4.0)) / 4.0
    true_lddt = jnp.sum(score * pair_mask, -1) / (
        jnp.sum(pair_mask, -1) + 1e-10)

    bins = jnp.clip((true_lddt * num_bins).astype(jnp.int32), 0, num_bins - 1)
    log_p = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(log_p, bins[..., None], axis=-1)[..., 0]
    gate = (batch['t'] < cfg.t_filter).astype(jnp.float32)
    loss = jnp.mean(gate * masked_mean(ca_mask, ce, axis=-1))
    return {'loss': loss}


def total_loss(batch: Dict, outputs: Dict, loss_config: Any,
               antibody_len: int) -> Dict:
    """Weighted sum of all enabled losses (config_model.json:148-236)."""
    heads = outputs['heads']
    metrics = {}
    total = 0.0

    if loss_config.diffusion_rigids.enabled:
        out = diffusion_rigids_loss(batch, heads['folding'],
                                    loss_config.diffusion_rigids.config)
        total += loss_config.diffusion_rigids.weight * out['loss']
        metrics.update({f'rigids/{k}': v for k, v in out.items()})

    if loss_config.diffusion_seq.enabled:
        out = diffusion_seq_loss(batch, heads['sequence_module'],
                                 loss_config.diffusion_seq.config)
        total += loss_config.diffusion_seq.weight * out['loss']
        metrics.update({f'seq/{k}': v for k, v in out.items()})

    if loss_config.folding.enabled:
        out = folding_loss(batch, heads['folding'],
                           loss_config.folding.config, antibody_len)
        total += loss_config.folding.weight * out['loss']
        metrics.update({f'folding/{k}': v for k, v in out.items()})

    if loss_config.distogram.enabled and 'distogram' in heads:
        out = distogram_loss(batch, heads['distogram'],
                             loss_config.distogram.config)
        total += loss_config.distogram.weight * out['loss']
        metrics.update({f'distogram/{k}': v for k, v in out.items()})

    if loss_config.predicted_lddt.enabled:
        out = predicted_lddt_loss(batch, heads['predicted_lddt'],
                                  heads['folding'],
                                  loss_config.predicted_lddt.config)
        total += loss_config.predicted_lddt.weight * out['loss']
        metrics.update({f'plddt/{k}': v for k, v in out.items()})

    # Observability-only heads (no loss contribution): TM-score + contact
    # precision land in metrics.csv (reference head.py:82-141 semantics).
    for head_name in ('tmscore', 'metric'):
        for k, v in heads.get(head_name, {}).items():
            metrics[k] = v

    metrics['total'] = total
    return {'loss': total, 'metrics': metrics}
