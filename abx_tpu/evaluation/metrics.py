"""Structure/sequence quality metrics (numpy, host-side).

Parity surface: /root/reference/abx/utils.py (Kabsch :412, RMSD :517,
GDT :525, TM-score :562, lDDT :623, contact precision :765) and
/root/reference/abx/common/ab_utils.py:124-167 (`calc_ab_metrics`: global
Kabsch alignment then per-CDR RMSD + amino-acid recovery, with the CDR-H3
"Loop" trim variants).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from abx_tpu.common import residue_constants as rc


def kabsch(mobile: np.ndarray, target: np.ndarray):
    """Optimal superposition of mobile onto target; both (N, 3).

    Returns (rotation (3,3), translation (3,)) mapping mobile -> target.
    """
    mu_m = mobile.mean(axis=0)
    mu_t = target.mean(axis=0)
    m = mobile - mu_m
    t = target - mu_t
    h = m.T @ t
    u, _, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    diag = np.diag([1.0, 1.0, d])
    rot = vt.T @ diag @ u.T
    trans = mu_t - rot @ mu_m
    return rot, trans


def apply_kabsch(mobile: np.ndarray, rot: np.ndarray, trans: np.ndarray):
    return mobile @ rot.T + trans


def rmsd(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.sqrt(np.mean(np.sum((a - b) ** 2, axis=-1))))


def aligned_rmsd(mobile: np.ndarray, target: np.ndarray) -> float:
    rot, trans = kabsch(mobile, target)
    return rmsd(apply_kabsch(mobile, rot, trans), target)


def gdt(a: np.ndarray, b: np.ndarray,
        cutoffs: Sequence[float] = (1.0, 2.0, 4.0, 8.0)) -> float:
    dist = np.linalg.norm(a - b, axis=-1)
    return float(np.mean([np.mean(dist <= c) for c in cutoffs]))


def tm_score(a: np.ndarray, b: np.ndarray, L: Optional[int] = None) -> float:
    """TM-score of pre-aligned coordinate sets (abx/utils.py:562)."""
    n = a.shape[0]
    L = L or n
    d0 = 1.24 * np.cbrt(max(L, 19) - 15) - 1.8
    dist = np.linalg.norm(a - b, axis=-1)
    return float(np.mean(1.0 / (1.0 + (dist / d0) ** 2)))


def lddt_ca(pred: np.ndarray, gt: np.ndarray, mask: np.ndarray,
            cutoff: float = 15.0,
            thresholds: Sequence[float] = (0.5, 1.0, 2.0, 4.0)) -> np.ndarray:
    """Per-residue lDDT on CA coordinates; (L, 3) inputs, (L,) mask."""
    d_pred = np.linalg.norm(pred[:, None] - pred[None, :], axis=-1)
    d_gt = np.linalg.norm(gt[:, None] - gt[None, :], axis=-1)
    pair_mask = (mask[:, None] * mask[None, :] *
                 (d_gt < cutoff) * (1 - np.eye(len(mask))))
    delta = np.abs(d_pred - d_gt)
    score = np.zeros_like(delta)
    for t in thresholds:
        score += (delta < t)
    score /= len(thresholds)
    denom = pair_mask.sum(axis=-1) + 1e-10
    return (score * pair_mask).sum(axis=-1) / denom


def contact_precision(pred_contact: np.ndarray, truth_dist: np.ndarray,
                      mask: np.ndarray, cutoff: float = 8.0,
                      ratios: Sequence[float] = (0.1, 0.25, 0.5, 1.0),
                      ranges: Sequence = ((6, 12), (12, 24), (24, None))):
    """Top-L/k contact precision by sequence-separation range."""
    n = pred_contact.shape[-1]
    sep = np.abs(np.arange(n)[:, None] - np.arange(n)[None, :])
    pair_mask = mask[:, None] * mask[None, :]
    results = []
    for lo, hi in ranges:
        range_mask = (sep >= lo) & (pair_mask > 0)
        if hi is not None:
            range_mask &= sep < hi
        scores = pred_contact[range_mask]
        labels = (truth_dist < cutoff)[range_mask]
        order = np.argsort(-scores)
        for ratio in ratios:
            k = max(1, int(n * ratio))
            top = order[:k]
            precision = float(labels[top].mean()) if top.size else 0.0
            results.append(((lo, hi), ratio, precision))
    return results


def calc_ab_metrics(gt_coord: np.ndarray, pred_coord: np.ndarray,
                    coord_mask: np.ndarray, cdr_def: np.ndarray,
                    gt_seq: str, pred_seq: str) -> Dict[str, float]:
    """Global Kabsch then per-CDR RMSD + AAR (ab_utils.py:124-167).

    Args:
        gt_coord / pred_coord: (L, 3) CA coordinates.
        coord_mask: (L,) bool.
        cdr_def: (L,) region enums.
        gt_seq / pred_seq: length-L strings.
    """
    sel = coord_mask > 0
    gt_aligned = gt_coord[sel]
    rot, trans = kabsch(pred_coord[sel], gt_aligned)
    pred_aligned = apply_kabsch(pred_coord[sel], rot, trans)
    cdr_sel = cdr_def[sel]
    gt_seq_sel = np.array(list(gt_seq))[sel]
    pred_seq_sel = np.array(list(pred_seq))[sel]

    out = {'full_len': int(sel.sum()),
           'full_rmsd': rmsd(pred_aligned, gt_aligned)}
    for name, enum in rc.cdr_str_to_enum.items():
        idx = np.nonzero(cdr_sel == enum)[0]
        if idx.size == 0:
            continue
        prefix = name.lower()
        out[f'{prefix}_rmsd'] = rmsd(pred_aligned[idx], gt_aligned[idx])
        out[f'{prefix}_aar'] = float(
            (gt_seq_sel[idx] == pred_seq_sel[idx]).mean())
        out[f'{prefix}_len'] = int(idx.size)
        if name == 'H3':
            # "Loop" variants trim the stem residues (ab_utils.py H3 Loop).
            for trim, tag in ((2, 'loop2'), (4, 'loop4')):
                if idx.size > 2 * trim:
                    tidx = idx[trim:-trim]
                    out[f'{prefix}_{tag}_rmsd'] = rmsd(
                        pred_aligned[tidx], gt_aligned[tidx])
                    out[f'{prefix}_{tag}_aar'] = float(
                        (gt_seq_sel[tidx] == pred_seq_sel[tidx]).mean())
    return out
