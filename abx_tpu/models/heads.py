"""Output heads: sequence, distogram, pLDDT (+ eval-side TM/metric helpers).

Parity surface: /root/reference/abx/model/head.py.  The head pipeline is
ordered and stateful in the reference (SequenceHead rewrites the folding
head's atom positions using the *predicted* sequence); here the composition
is explicit and functional in ScoreNetworkIteration.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from abx_tpu.common import residue_constants as rc
from abx_tpu.geometry import frames as frame_ops
from abx_tpu.geometry.rigid import Rigid
from abx_tpu.models.modules import LayerNorm, Linear
from abx_tpu.utils.tensor import batched_gather


class DistogramHead(nn.Module):
    """Symmetrised 64-bin distance logits over the pair track."""
    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pair_act):
        c = self.config
        x = Linear(c.num_bins, init='final', dtype=self.dtype,
                   name='proj')(pair_act)
        logits = 0.5 * (x + jnp.swapaxes(x, 1, 2))
        breaks = jnp.linspace(c.first_break, c.last_break, c.num_bins - 1)
        return {'logits': logits, 'breaks': breaks}


class SequenceHead(nn.Module):
    """Amino-acid logits from the structure-module representation.

    Returns logits and the argmax sequence with fixed residues restored
    (head.py:143-201); the all-atom rebuild with the predicted sequence is
    done by `rebuild_atoms` below.
    """
    config: Any
    num_res_types: int = 20
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, structure_act, batch):
        c = self.config
        x = LayerNorm(dtype=self.dtype, name='norm')(structure_act)
        x = Linear(c.num_hidden_channel, init='relu', dtype=self.dtype,
                   name='linear1')(x)
        x = nn.relu(x)
        x = Linear(c.num_hidden_channel, init='relu', dtype=self.dtype,
                   name='linear2')(x)
        x = nn.relu(x)
        logits = Linear(self.num_res_types, init='relu', dtype=self.dtype,
                        name='linear3')(x)
        seq_0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        fixed_mask = batch['fixed_mask'].astype(jnp.int32)
        seq_0 = seq_0 * (1 - fixed_mask) + \
            batch['seq_t'].astype(jnp.int32) * fixed_mask
        return {'logits': logits, 'seq_0': seq_0}


class PredictedLDDTHead(nn.Module):
    config: Any
    num_bins: int = 50
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, structure_act):
        c = self.config
        x = LayerNorm(dtype=self.dtype, name='norm')(structure_act)
        x = Linear(c.num_hidden_channel, init='relu', dtype=self.dtype,
                   name='linear1')(x)
        x = nn.relu(x)
        x = Linear(c.num_hidden_channel, init='relu', dtype=self.dtype,
                   name='linear2')(x)
        x = nn.relu(x)
        logits = Linear(self.num_bins, init='relu', dtype=self.dtype,
                        name='linear3')(x)
        return {'logits': logits, 'pLDDT': plddt(logits)}


def plddt(logits):
    """Expected lDDT percentage from binned logits (model/utils.py:158)."""
    num_bins = logits.shape[-1]
    bin_width = 1.0 / num_bins
    centers = jnp.arange(num_bins) * bin_width + bin_width / 2
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.sum(probs * centers, axis=-1) * 100.0


def rebuild_atoms(seq, rigids7, angles_sin_cos, batch):
    """All-atom rebuild from rigids + torsions with a given sequence.

    Used twice: inside SequenceHead composition (predicted seq_0) and by the
    sampler's final output (head.py:171-199).
    Returns atom14/atom37 positions + existence masks.
    """
    backb = Rigid.from_quat_trans(rigids7[..., :4], rigids7[..., 4:])
    all_frames = frame_ops.torsion_angles_to_frames(seq, backb, angles_sin_cos)
    atom14_pos = frame_ops.frames_to_atom14_pos(seq, all_frames)
    residx_atom37_to_atom14 = batched_gather(
        jnp.asarray(rc.restype_atom37_to_atom14), seq)
    atom37_pos = batched_gather(atom14_pos, residx_atom37_to_atom14,
                                batch_dims=2)
    atom14_exists = batched_gather(jnp.asarray(rc.restype_atom14_mask), seq)
    atom37_exists = batched_gather(jnp.asarray(rc.restype_atom37_mask), seq)
    return {
        'final_atom14_positions': atom14_pos,
        'final_atom_positions': atom37_pos,
        'atom14_atom_exists': atom14_exists,
        'atom37_atom_exists': atom37_exists,
    }
