"""Training-time metric heads: TM-score and contact precision.

Parity surface: /root/reference/abx/model/head.py:82-141 (MetricDictHead,
TMscoreHead) backed by abx/utils.py (Kabsch :412, TMscore :562,
contact_precision :765).  Both are parameter-free observability heads run
only on `compute_loss=True` passes; their outputs land in the trainer's
metrics dict (metrics.csv).

TPU design: everything is jit-safe with static shapes — the reference's
per-example Python loop over the batch becomes a `vmap`ped weighted Kabsch,
and its boolean-mask indexing + argsort becomes a masked `lax.top_k` with
STATIC k per ratio (the reference's num_tops = int(seq_len * ratio) is
already static).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

# Reference defaults (abx/utils.py:821-825).
CONTACT_RATIOS = (1.0, 0.5, 0.2, 0.1)
CONTACT_RANGES = ((6, 12), (12, 24), (24, None))
CONTACT_CUTOFF = 8.0


def weighted_kabsch(mobile: jnp.ndarray, target: jnp.ndarray,
                    weights: jnp.ndarray) -> jnp.ndarray:
    """Optimal-rotation alignment of `mobile` onto `target`.

    Args:
        mobile/target: (L, 3); weights: (L,) nonnegative.
    Returns: aligned mobile coords (L, 3).
    """
    w = weights[:, None] / (jnp.sum(weights) + 1e-8)
    mu_m = jnp.sum(mobile * w, axis=0)
    mu_t = jnp.sum(target * w, axis=0)
    a = (mobile - mu_m) * w
    b = target - mu_t
    cov = a.T @ b
    u, _, vt = jnp.linalg.svd(cov, full_matrices=False)
    det = jnp.linalg.det(u @ vt)
    d = jnp.diag(jnp.stack([jnp.ones(()), jnp.ones(()), det]))
    rot = u @ d @ vt
    return (mobile - mu_m) @ rot + mu_t


def tm_score(pred_ca: jnp.ndarray, gt_ca: jnp.ndarray,
             mask: jnp.ndarray) -> jnp.ndarray:
    """Masked TM-score after Kabsch alignment (TMscoreHead, head.py:116).

    Args: pred_ca/gt_ca (B, L, 3); mask (B, L).  Returns (B,).
    """
    def one(p, g, m):
        aligned = weighted_kabsch(p, g, m)
        n = jnp.sum(m)
        big_l = jnp.maximum(n, 21.0)
        d0 = 1.24 * jnp.cbrt(big_l - 15.0) - 1.8
        d2 = jnp.sum(jnp.square(aligned - g), axis=-1)
        per = 1.0 / (1.0 + d2 / jnp.square(d0))
        return jnp.sum(per * m) / (n + 1e-8)

    return jax.vmap(one)(pred_ca.astype(jnp.float32),
                         gt_ca.astype(jnp.float32),
                         mask.astype(jnp.float32))


def contact_precision(pred: jnp.ndarray, truth: jnp.ndarray,
                      mask: jnp.ndarray,
                      ratios: Sequence[float] = CONTACT_RATIOS,
                      ranges: Sequence[Tuple] = CONTACT_RANGES,
                      cutoff: float = CONTACT_CUTOFF) -> Dict[str, jnp.ndarray]:
    """Top-k contact precision per sequence-separation range.

    Args:
        pred: (B, L, L) predicted contact probability.
        truth: (B, L, L) true distances.
        mask: (B, L) residue mask.
    Returns: {'[i,j)_r': (B,) precision} for each range x ratio.
    """
    b, l, _ = pred.shape
    pair_mask = mask[:, :, None] * mask[:, None, :]
    sep = jnp.abs(jnp.arange(l)[:, None] - jnp.arange(l)[None, :])
    correct = ((truth > 0) & (truth < cutoff)).astype(jnp.float32)

    out = {}
    for lo, hi in ranges:
        lo_v = lo if lo is not None else 0
        hi_v = hi if hi is not None else l
        rng = ((sep >= lo_v) & (sep < hi_v))[None]
        valid = pair_mask * rng
        # Masked entries sort to the bottom; their labels count as wrong.
        scores = jnp.where(valid > 0, pred, -jnp.inf).reshape(b, -1)
        labels = (correct * valid).reshape(b, -1)
        k_max = max(1, int(l * max(ratios)))
        top_scores, top_idx = jax.lax.top_k(scores, k_max)
        top_labels = jnp.take_along_axis(labels, top_idx, axis=-1)
        csum = jnp.cumsum(top_labels, axis=-1)
        for ratio in ratios:
            k = max(1, int(l * ratio))
            name = f'[{lo_v},{hi if hi is not None else "inf"})_{ratio}'
            out[name] = csum[:, k - 1] / float(k)
    return out


def metric_dict_head(distogram: Dict, batch: Dict, config: Any
                     ) -> Dict[str, jnp.ndarray]:
    """Contact-precision metrics from the distogram head (head.py:82-114)."""
    logits = distogram['logits'].astype(jnp.float32)
    breaks = distogram['breaks']
    cutoff = _get(config, 'contact_cutoff', CONTACT_CUTOFF)
    t = jnp.sum((breaks <= cutoff).astype(jnp.int32))
    prob = jax.nn.softmax(logits, axis=-1)
    # P(contact) = mass below the cutoff bin (head.py:100-101).
    below = jnp.arange(prob.shape[-1]) <= t
    pred = jnp.sum(prob * below, axis=-1)
    pb = batch['pseudo_beta']
    truth = jnp.sqrt(jnp.sum(jnp.square(pb[:, :, None] - pb[:, None, :]),
                             axis=-1) + 1e-10)
    mask = batch['pseudo_beta_mask'] * batch['mask']
    prec = contact_precision(
        pred, truth, mask,
        ratios=_get(config, 'contact_ratios', CONTACT_RATIOS),
        ranges=_get(config, 'contact_ranges', CONTACT_RANGES),
        cutoff=cutoff)
    return {f'contact/{k}': jnp.mean(v) for k, v in prec.items()}


def tmscore_head(folding: Dict, batch: Dict) -> Dict[str, jnp.ndarray]:
    """Batch-mean CA TM-score vs ground truth (head.py:116-141)."""
    pred = jax.lax.stop_gradient(
        folding['final_atom14_positions'][..., 1, :])
    gt = batch['atom14_gt_positions'][..., 1, :]
    mask = batch['atom14_gt_exists'][..., 1] * batch['mask']
    return {'tmscore': jnp.mean(tm_score(pred, gt, mask))}


def _get(config, key, default):
    if config is None:
        return default
    get = getattr(config, 'get', None)
    if get is not None:
        return get(key, default)
    return getattr(config, key, default)
