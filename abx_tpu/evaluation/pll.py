"""Sequence plausibility via masked pseudo-log-likelihood.

Parity surface: /root/reference/eval/metric_scripts/calculate_pll.py, which
scores designed sequences with AntiBERTy's per-position masked PLL.
AntiBERTy is torch-only and not always available; this module computes the
same quantity with ANY ESM2-family model through the abx_tpu flax port — a
language-model plausibility score with identical semantics (mask position i,
sum log p(aa_i | rest)).

Requires converted LM weights (abx_tpu.utils.torch_convert.convert_esm2_ckpt)
plus an LM head; without weights the CLI reports the metric as unavailable
rather than inventing numbers.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from abx_tpu.common import residue_constants as rc
from abx_tpu.models.esm import (AATYPE_TO_ESM, ESM2, ESM2Config, ESM_CLS,
                                ESM_EOS, ESM_MASK, ESM_PAD)


def masked_pll(esm_model: ESM2, esm_params, lm_head_fn, seq: str,
               batch_positions: int = 32) -> float:
    """Mean masked pseudo-log-likelihood of a sequence.

    Args:
        esm_model/esm_params: the encoder.
        lm_head_fn: fn(final_repr (B, L, D)) -> logits (B, L, V).
        seq: amino-acid string.
    """
    n = len(seq)
    aatype = rc.sequence_to_index(seq)
    tokens = np.full((n + 2,), ESM_PAD, np.int32)
    tokens[0] = ESM_CLS
    tokens[1:n + 1] = AATYPE_TO_ESM[np.clip(aatype, 0, rc.restype_num)]
    tokens[n + 1] = ESM_EOS

    total = 0.0
    for start in range(0, n, batch_positions):
        idx = np.arange(start, min(start + batch_positions, n))
        batch = np.tile(tokens[None], (len(idx), 1))
        batch[np.arange(len(idx)), idx + 1] = ESM_MASK
        # final_only: skip materialising the (B, L, D, n_layers+1) stack —
        # only the post-LN last layer feeds the LM head.
        final = esm_model.apply(esm_params, jnp.asarray(batch),
                                final_only=True)  # (B, L, D)
        logits = lm_head_fn(final)
        logp = jax.nn.log_softmax(logits, axis=-1)
        true_tok = tokens[idx + 1]
        sel = np.asarray(logp)[np.arange(len(idx)), idx + 1, true_tok]
        total += float(sel.sum())
    return total / n
