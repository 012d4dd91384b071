"""Top-level score network with recycling.

Parity surface: /root/reference/abx/model/abx.py — ScoreNetworkIteration
(trunk + ordered heads) wrapped by recycling (2 no-grad passes feeding back
prev_pos/prev_seq/prev_pair and the predicted sequence, then a final pass).

TPU design: one flax module whose `__call__` runs the recycle passes inline
with `stop_gradient` (statically unrolled — num_recycle is 2); the whole
forward jits to a single XLA computation that the sampler `lax.scan`s over
the diffusion time axis.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from abx_tpu.geometry import frames as frame_ops
from abx_tpu.models.heads import (DistogramHead, PredictedLDDTHead,
                                  SequenceHead, rebuild_atoms)
from abx_tpu.models.ipa import IpaScore
from abx_tpu.models.seqformer import EmbeddingAndSeqformer


def get_prev(batch, outputs, prev_pos_config) -> Dict[str, jnp.ndarray]:
    """Recycling features from a forward pass (reference abx.py:17-26)."""
    atom37 = outputs['heads']['folding']['final_atom_positions']
    pb = frame_ops.pseudo_beta_virtual(atom37)
    prev_pos = frame_ops.dgram_from_positions(
        pb, prev_pos_config.num_bins, prev_pos_config.min_bin,
        prev_pos_config.max_bin)
    # prev_* are carried across recycle/scan iterations in the TRUNK compute
    # dtype (static per model, so the loop carry dtype is stable): an f32
    # prev_pair is 255 MB at B=4, L=288 — written and re-read every pass for
    # no precision benefit since the consumer LayerNorm immediately follows
    # a bf16 trunk output anyway.
    seq_repr = outputs['representations']['seq']
    return {
        'prev_pos': jax.lax.stop_gradient(prev_pos),
        'prev_seq': jax.lax.stop_gradient(seq_repr),
        'prev_pair': jax.lax.stop_gradient(
            outputs['representations']['pair']),
    }


def zero_prev(batch_size: int, num_res: int, config,
              dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Zero recycling features; `dtype` must match the trunk compute dtype
    (the scan/fori carry dtype is set by these and by get_prev)."""
    c = config.embeddings_and_seqformer
    seq_ch = c.seq_channel + c.index_embed_size
    pair_ch = c.pair_channel + 2 * c.index_embed_size
    return {
        'prev_pos': jnp.zeros((batch_size, num_res, num_res), jnp.int32),
        'prev_seq': jnp.zeros((batch_size, num_res, seq_ch), dtype),
        'prev_pair': jnp.zeros((batch_size, num_res, num_res, pair_ch),
                               dtype),
    }


class ScoreNetworkIteration(nn.Module):
    """One trunk pass + heads (reference abx.py:28-63)."""
    config: Any          # model config
    diffuser: Any
    antibody_len: int
    dtype: Any = jnp.float32

    def setup(self):
        c = self.config
        self.seqformer = EmbeddingAndSeqformer(
            c.embeddings_and_seqformer, antibody_len=self.antibody_len,
            dtype=self.dtype)
        self.diffusion_module = IpaScore(
            c.heads.diffusion_module, diffuser=self.diffuser,
            dtype=self.dtype)
        self.sequence_module = SequenceHead(c.heads.sequence_module,
                                            dtype=self.dtype)
        self.predicted_lddt = PredictedLDDTHead(c.heads.predicted_lddt,
                                                dtype=self.dtype)
        self.distogram = DistogramHead(c.heads.distogram, dtype=self.dtype)

    def static_embeddings(self, batch):
        return self.seqformer.static_embeddings(batch)

    def esm_layer_weights(self):
        return self.seqformer.esm_layer_weights()

    def __call__(self, batch, esm_embedding=None, esm_fn=None,
                 compute_loss=False, deterministic=True, static_acts=None):
        c = self.config
        seq_act, pair_act = self.seqformer(
            batch, esm_embedding=esm_embedding, esm_fn=esm_fn,
            deterministic=deterministic, static_acts=static_acts)
        representations = {'seq': seq_act, 'pair': pair_act}
        ret = {'representations': representations, 'heads': {}}

        folding = self.diffusion_module(representations, batch,
                                        deterministic=deterministic)

        seq_out = self.sequence_module(folding['structure_act'], batch)

        # Rebuild all atoms with the predicted sequence (head.py:171-199).
        atoms = rebuild_atoms(seq_out['seq_0'], folding['rigids'],
                              folding['angles_sin_cos'], batch)
        folding.update(atoms)
        folding['representations'] = {'structure_module':
                                      folding['structure_act']}

        ret['heads']['folding'] = folding
        ret['heads']['sequence_module'] = seq_out

        plddt_out = self.predicted_lddt(folding['structure_act'])
        ret['heads']['predicted_lddt'] = plddt_out

        if compute_loss:
            ret['heads']['distogram'] = self.distogram(
                representations['pair'])
            # Parameter-free observability heads (reference head.py:82-141):
            # contact precision from the distogram + CA TM-score vs GT.
            from abx_tpu.models import metric_heads
            if 'pseudo_beta' in batch:
                ret['heads']['metric'] = metric_heads.metric_dict_head(
                    ret['heads']['distogram'], batch,
                    c.heads.get('metric', None))
            ret['heads']['tmscore'] = metric_heads.tmscore_head(folding,
                                                                batch)
        return ret


def forward_with_recycling(apply_single, batch, num_recycle: int,
                           prev_pos_cfg, compute_loss: bool = False):
    """Recycling as a `lax.fori_loop` over ONE trunk instance.

    The flax-internal unrolled loop (ScoreNetwork.__call__) duplicates the
    trunk `num_recycle+1` times in the traced program, which multiplies XLA
    compile time; this functional form keeps exactly two trunk instances
    (loop body + final pass) regardless of the recycle count.

    Callers that hoist the trajectory-invariant embeddings
    (ScoreNetwork.static_embeddings) fold `static_acts` into their
    `apply_single` closure — this function only threads the per-pass state.

    Args:
        apply_single: fn(batch, compute_loss, pass_idx) -> outputs for ONE
            pass (e.g. partial(model.apply, params, num_recycle=0)).
            `pass_idx` counts recycle passes 0..num_recycle-1 and equals
            num_recycle for the final pass — training callers fold it into
            the dropout RNG so each pass gets independent masks; inference
            callers may ignore it.
    """
    batch = dict(batch)
    b, l = batch['seq'].shape

    if 'prev_seq' not in batch:
        raise ValueError('caller must seed prev_* (use zero_prev)')

    def with_prev(carry):
        prev_pos, prev_seq, prev_pair, seq_t = carry
        mb = dict(batch)
        mb.update(prev_pos=prev_pos, prev_seq=prev_seq, prev_pair=prev_pair,
                  seq_t=seq_t)
        return mb

    def body(i, carry):
        mb = with_prev(carry)
        out = apply_single(mb, False, i)
        prev = get_prev(mb, out, prev_pos_cfg)
        seq_t = jax.lax.stop_gradient(
            out['heads']['sequence_module']['seq_0'])
        return (prev['prev_pos'], prev['prev_seq'], prev['prev_pair'],
                seq_t)

    carry = (batch['prev_pos'], batch['prev_seq'], batch['prev_pair'],
             batch['seq_t'].astype(jnp.int32))
    if isinstance(num_recycle, int):
        if num_recycle > 0:
            carry = jax.lax.fori_loop(0, num_recycle, body, carry)
    else:
        # Traced count (training samples recycle depth, reference
        # abx.py:87-91); fori_loop supports dynamic trip counts.
        carry = jax.lax.fori_loop(0, num_recycle, body, carry)
    out = apply_single(with_prev(carry), compute_loss, num_recycle)
    # The seq_t the FINAL pass consumed (the last recycle pass's predicted
    # seq_0; the input seq_t at num_recycle=0).  The reference mutates
    # input_feats['seq_t'] in place during recycling (abx.py:96-99), and
    # its sampler then reads the MUTATED value for the reverse transition
    # (inference.py:231-233) — callers that reproduce the reference loop
    # need this value alongside the outputs.
    out['recycled_seq_t'] = carry[3]
    return out


class ScoreNetwork(nn.Module):
    """Recycling wrapper (reference abx.py:66-104).

    Inference runs `num_recycle` extra stop-gradient passes; the recycle
    count is static so the passes unroll into one jitted computation.
    """
    config: Any
    diffuser: Any
    antibody_len: int
    dtype: Any = jnp.float32

    def setup(self):
        self.impl = ScoreNetworkIteration(
            self.config, diffuser=self.diffuser,
            antibody_len=self.antibody_len, dtype=self.dtype)

    def static_embeddings(self, batch):
        """Trajectory-invariant embedding terms; the sampler computes them
        once per trajectory and passes them back via `static_acts`."""
        return self.impl.static_embeddings(batch)

    def esm_layer_weights(self):
        """Softmaxed learned ESM layer weights (for hoisted ESM callers)."""
        return self.impl.esm_layer_weights()

    def __call__(self, batch, esm_fn=None, compute_loss=False,
                 deterministic=True, num_recycle: Optional[int] = None,
                 static_acts=None):
        c = self.config
        if num_recycle is None:
            num_recycle = c.num_recycle
        batch = dict(batch)
        b, l = batch['seq'].shape
        if 'prev_seq' not in batch:
            batch.update(zero_prev(b, l, c, dtype=self.dtype))

        # Static embeddings are shared across the recycle passes (and, when
        # the caller hoists them, across the whole sampling trajectory).
        # No stop_gradient here: recycle passes are already grad-isolated by
        # the stop_gradients on prev_*/seq_t, and the final pass must
        # backprop into the embedding params exactly as the reference's
        # final (grad-enabled) pass does.
        if static_acts is None:
            static_acts = self.impl.static_embeddings(batch)

        # esm_fn(ab_aatype, heavy_len, light_len, layer_weights) is invoked
        # INSIDE the trunk (seqformer owns the learned layer weights), once
        # per pass on the pass's current noisy sequence — matching the
        # reference's per-pass ESM recomputation (abx.py:89-102).
        for _ in range(num_recycle):
            ret = self.impl(batch, esm_fn=esm_fn, compute_loss=False,
                            deterministic=deterministic,
                            static_acts=static_acts)
            prev = get_prev(batch, ret,
                            c.embeddings_and_seqformer.prev_pos)
            batch.update(prev)
            batch['seq_t'] = jax.lax.stop_gradient(
                ret['heads']['sequence_module']['seq_0'])

        ret = self.impl(batch, esm_fn=esm_fn,
                        compute_loss=compute_loss,
                        deterministic=deterministic,
                        static_acts=static_acts)
        # Same contract as forward_with_recycling: the seq_t the final pass
        # consumed (reference mutates it in place, abx.py:96-99).
        ret['recycled_seq_t'] = batch['seq_t'].astype(jnp.int32)
        return ret
