"""Invariant Point Attention + the diffusion structure module (IpaScore).

Parity surface: /root/reference/abx/model/folding.py:23-132 (IPA) and
/root/reference/abx/model/score_network.py (IpaScore): 8 shared-weight IPA
layers over the *noisy* rigids `rigids_t`, per-layer 6-DoF affine updates with
fixed-residue snap-back, and rotation/translation scores computed through the
diffuser's closed forms.

TPU notes: the point attention runs in f32 (distance terms are precision
sensitive); scalar/pair attention can run in the configured compute dtype.
Frame applications use the high-precision einsum path in geometry.rigid.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from abx_tpu.geometry import quat as quat_ops
from abx_tpu.geometry.rigid import Rigid
from abx_tpu.models.modules import (LayerNorm, Linear, LinearParams,
                                    fused_dense)
from abx_tpu.models.seqformer import BIG_NEG


class InvariantPointAttention(nn.Module):
    config: Any  # IPA config
    dtype: Any = jnp.float32
    dist_epsilon: float = 1e-8

    @nn.compact
    def __call__(self, inputs_1d, inputs_2d, mask, rigids: Rigid,
                 pair_bias=None, deterministic: bool = True):
        c = self.config
        h = c.num_head
        nsq, npq = c.num_scalar_qk, c.num_point_qk
        nsv, npv = c.num_scalar_v, c.num_point_v

        scalar_variance = max(nsq, 1) * 1.0
        point_variance = max(npq, 1) * 9.0 / 2
        num_logit_terms = 3
        scalar_weights = np.sqrt(1.0 / (num_logit_terms * scalar_variance))
        point_weights = np.sqrt(1.0 / (num_logit_terms * point_variance))
        attention_2d_weights = np.sqrt(1.0 / num_logit_terms)

        b, l, _ = inputs_1d.shape
        c_in = inputs_1d.shape[-1]

        # The four input projections (scalar q / scalar kv / point q /
        # point kv) read the same activations; run them as ONE matmul
        # (param tree unchanged — see modules.fused_dense).
        branches = [
            LinearParams(h * nsq, c_in, init='attn',
                         name='proj_q_scalar')(),
            LinearParams(h * (nsv + nsq), c_in, init='attn',
                         name='proj_kv_scalar')(),
            LinearParams(3 * h * npq, c_in, init='attn',
                         name='proj_q_point_local')(),
            LinearParams(3 * h * (npv + npq), c_in, init='attn',
                         name='proj_kv_point_local')(),
        ]
        q_scalar, kv_scalar, q_point_local, kv_point_local = fused_dense(
            inputs_1d, branches, self.dtype)

        # Head split without data movement: keep (b, l, h, c) layouts and
        # let the einsums place the head axis (XLA folds the layout into
        # the dot_generals instead of emitting copy ops).
        q_scalar = q_scalar.reshape(b, l, h, nsq)
        kv_scalar = kv_scalar.reshape(b, l, h, nsv + nsq)
        k_scalar, v_scalar = jnp.split(kv_scalar, [nsq], axis=-1)

        # Point branch: layout (r n) -> points stored as 3 blocks; the
        # frame application and distance terms below run in f32.  NB: the
        # point PROJECTIONS run inside the fused matmul in the trunk dtype,
        # so under bf16 the local point coordinates are bf16-quantized
        # before the f32 frame application — measured quality-neutral at
        # L~300 (runs/overfit_6ct7/bf16_kernel_eval.json); pull the point
        # branches out of `fused_dense` if a future config regresses.
        q_point_local = q_point_local.astype(jnp.float32).reshape(
            b, l, 3, h * npq).transpose(0, 1, 3, 2)  # (b, l, h*npq, 3)
        kv_point_local = kv_point_local.astype(jnp.float32).reshape(
            b, l, 3, h * (npv + npq)).transpose(0, 1, 3, 2)

        q_point_global = rigids.apply(q_point_local)   # (b, l, h*npq, 3)
        kv_point_global = rigids.apply(kv_point_local)
        q_point = q_point_global.reshape(b, l, h, npq, 3)
        kv_point = kv_point_global.reshape(b, l, h, npv + npq, 3)
        k_point, v_point = jnp.split(kv_point, [npq], axis=-2)

        # ||q_i - k_j||^2 expanded as |q|^2 + |k|^2 - 2<q,k>: the cross term
        # is a (n*3)=12-dim contraction the MXU handles as a batched matmul,
        # replacing the O(L^2 * H * P * 3) broadcast tensor the direct form
        # materialises (the reference's formulation, folding.py:95 — it was
        # the single most expensive op in the whole network on TPU).
        # Center to reduce |.|^2 magnitudes, and keep the cross term in full
        # f32 precision — the expansion is cancellation-sensitive.
        center = jnp.mean(k_point, axis=(1, 3), keepdims=True)
        q_point = q_point - center
        k_point = k_point - center
        tpw = self.param('trainable_point_weights',
                         lambda key, shape: jnp.log(jnp.exp(
                             jnp.full(shape, 1.0)) - 1.0), (h,))
        pw = -0.5 * point_weights * jax.nn.softplus(tpw)

        # The pair bias is layer-invariant (shared weights over a static
        # pair track): callers running several layers hoist it via
        # `compute_pair_bias` once instead of re-reading the O(L^2 * C)
        # pair tensor per layer.
        if pair_bias is None:
            pair_bias = self.compute_pair_bias(inputs_2d)

        from abx_tpu.ops.registry import (use_fused_ipa_attention,
                                          use_ipa_attend_kernel)
        if (deterministic and jax.default_backend() == 'tpu'
                and use_fused_ipa_attention()):
            # Fused logits+softmax+attends (ops/ipa_attention.py): the
            # (B, H, L, L) logits/probability tensors never exist in HBM
            # (~15 separate XLA f32 ops per layer otherwise, ~4 ms/step).
            # Key-mask only (the reference also floors masked QUERY rows,
            # whose outputs are meaningless either way).
            from abx_tpu.ops.ipa_attention import ipa_attention
            result_scalar, rp_global, result_2d = ipa_attention(
                q_scalar * scalar_weights, k_scalar, v_scalar,
                q_point, k_point, v_point, pw, pair_bias, mask, inputs_2d)
            result_point_global = rp_global.reshape(b, l, h * npv, 3)
        else:
            attn_qk_scalar = jnp.einsum('bihc,bjhc->bhij',
                                        q_scalar * scalar_weights, k_scalar)
            q2 = jnp.sum(jnp.square(q_point), axis=(-1, -2))  # (b, l, h)
            k2 = jnp.sum(jnp.square(k_point), axis=(-1, -2))
            cross = jnp.einsum('bihnr,bjhnr->bhij', q_point, k_point,
                               precision=jax.lax.Precision.HIGHEST)
            dist2 = (q2.transpose(0, 2, 1)[:, :, :, None]
                     + k2.transpose(0, 2, 1)[:, :, None, :]
                     - 2.0 * cross)  # (b, h, i, j)
            attn_qk_point = pw[None, :, None, None] * dist2  # (b, h, i, j)

            attn_logits = attn_qk_scalar.astype(jnp.float32) + attn_qk_point
            attn_logits = attn_logits + pair_bias.astype(jnp.float32)

            mask_2d = mask[:, None, :, None] * mask[:, None, None, :]
            attn_logits = attn_logits + (1.0 - mask_2d) * BIG_NEG

            attn = jax.nn.softmax(attn_logits, axis=-1)  # (b, h, i, j) f32

            result_scalar = jnp.einsum(
                'bhij,bjhc->bihc', attn.astype(self.dtype), v_scalar)
            result_scalar = result_scalar.reshape(b, l, h * nsv)

            result_point_global = jnp.einsum('bhij,bjhnr->bihnr', attn,
                                             v_point)
            result_point_global = result_point_global.reshape(
                b, l, h * npv, 3)

            if (deterministic and jax.default_backend() == 'tpu'
                    and use_ipa_attend_kernel()):
                # Row-blocked VMEM attend-over-pair (ops/ipa_attend.py):
                # the M=12 batched matmul XLA emits here runs at ~10% MXU
                # util behind attention-tensor layout copies.
                from abx_tpu.ops.ipa_attend import ipa_pair_attend
                result_2d = ipa_pair_attend(attn, inputs_2d)
            else:
                result_2d = jnp.einsum(
                    'bhij,bijc->bihc', attn.astype(self.dtype),
                    inputs_2d).reshape(b, l, h * inputs_2d.shape[-1])

        outputs = [result_scalar]
        result_point_local = rigids.invert().apply(result_point_global)
        # (r n) flatten: x-components of all points, then y, then z.
        outputs.append(result_point_local.transpose(0, 1, 3, 2).reshape(
            b, l, 3 * h * npv).astype(self.dtype))
        outputs.append(jnp.sqrt(
            jnp.sum(jnp.square(result_point_local), axis=-1)
            + self.dist_epsilon).astype(self.dtype))
        outputs.append(result_2d)

        final_act = jnp.concatenate(outputs, axis=-1)
        return Linear(c.num_channel, init='final', dtype=self.dtype,
                      name='final_proj')(final_act)


    @nn.compact
    def compute_pair_bias(self, inputs_2d):
        """(B, L, L, C) -> scaled (B, H, L, L) attention bias."""
        c = self.config
        attention_2d = Linear(c.num_head, init='attn', dtype=self.dtype,
                              name='proj_pair')(inputs_2d)
        return np.sqrt(1.0 / 3) * jnp.moveaxis(attention_2d, -1, 1)


class TorsionModule(nn.Module):
    """ResNet torsion predictor (reference sidechain.py:28-53)."""
    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, act, init_act):
        c = self.config
        act = Linear(c.num_channel, init='linear', dtype=self.dtype,
                     name='proj_act')(nn.relu(act))
        act = act + Linear(c.num_channel, init='linear', dtype=self.dtype,
                           name='proj_init_act')(nn.relu(init_act))
        for i in range(c.num_residual_block):
            res = nn.relu(act)
            res = Linear(c.num_channel, init='relu', dtype=self.dtype,
                         name=f'block_{i}_linear1')(res)
            res = nn.relu(res)
            res = Linear(c.num_channel, init='final', dtype=self.dtype,
                         name=f'block_{i}_linear2')(res)
            act = act + res
        angles = Linear(14, init='linear', dtype=self.dtype,
                        name='projection')(nn.relu(act))
        return angles.reshape(angles.shape[:-1] + (7, 2))


class IpaScore(nn.Module):
    """Structure module over noisy rigids, emitting SE(3) scores.

    `diffuser` is a JointDiffuser (static; its tables become XLA constants).
    """
    config: Any  # heads.diffusion_module config
    diffuser: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, representations, batch, deterministic=True):
        c = self.config.IPA
        seq_act = representations['seq']
        pair_act = representations['pair']
        b, l = batch['seq_t'].shape

        node_mask = batch['mask'].astype(jnp.float32)
        fixed_mask = batch['fixed_mask'].astype(jnp.float32)
        init_rigids7 = batch['rigids_t'].astype(jnp.float32)
        init_quats = init_rigids7[..., :4]
        init_trans = init_rigids7[..., 4:]

        pair_channel = self.config.edge_embed_size

        seq_act = Linear(c.num_channel, init='linear', dtype=self.dtype,
                         name='proj_init_seq_act')(seq_act)
        pair_act = Linear(pair_channel, init='linear', dtype=self.dtype,
                          name='proj_init_pair_act')(pair_act)
        seq_act = LayerNorm(dtype=self.dtype, name='init_seq_norm')(seq_act)
        pair_act = LayerNorm(dtype=self.dtype, name='init_pair_norm')(pair_act)

        initial_seq_act = seq_act
        seq_act = Linear(c.num_channel, init='linear', dtype=self.dtype,
                         name='proj_seq')(seq_act)

        ipa = InvariantPointAttention(c, dtype=self.dtype, name='ipa')
        pair_bias = ipa.compute_pair_bias(pair_act)
        attn_norm = LayerNorm(dtype=self.dtype, name='attention_norm')
        transition_layers = [
            Linear(c.num_channel,
                   init='linear' if k == c.num_layer_in_transition - 1
                   else 'final',
                   dtype=self.dtype, name=f'transition_{k}')
            for k in range(c.num_layer_in_transition)]
        transition_norm = LayerNorm(dtype=self.dtype, name='transition_norm')
        affine_update = Linear(6, init='final', dtype=self.dtype,
                               name='affine_update')
        torsion = TorsionModule(c.torsion, dtype=self.dtype,
                                name='torsion_module')

        delta_quat = quat_ops.identity_quat((b, l))
        curr_quats = init_quats
        curr_trans = init_trans / c.position_scale
        curr_rots = quat_ops.quat_to_rot(curr_quats)

        def apply_mask(diff, fixed):
            m = (1.0 - fixed_mask)[..., None]
            return m * diff + (1.0 - m) * fixed

        traj = []
        for it in range(c.num_layer):
            is_last = it == c.num_layer - 1
            rig = Rigid(curr_rots, curr_trans)
            seq_act = seq_act + ipa(seq_act, pair_act, node_mask, rig,
                                    pair_bias=pair_bias,
                                    deterministic=deterministic)
            if not deterministic:
                seq_act = nn.Dropout(c.dropout)(
                    seq_act, deterministic=False,
                    rng=self.make_rng('dropout'))
            seq_act = attn_norm(seq_act)

            res = seq_act
            for k, layer in enumerate(transition_layers):
                res = layer(res)
                if k < len(transition_layers) - 1:
                    res = nn.relu(res)
            seq_act = seq_act + res
            if not deterministic:
                seq_act = nn.Dropout(c.dropout)(
                    seq_act, deterministic=False,
                    rng=self.make_rng('dropout'))
            seq_act = transition_norm(seq_act)

            update = affine_update(seq_act).astype(jnp.float32)
            quat_update, trans_update = jnp.split(update, 2, axis=-1)
            delta_quat = quat_ops.quat_precompose_vec(delta_quat, quat_update)
            curr_quats = quat_ops.quat_precompose_vec(curr_quats, quat_update)
            curr_trans = Rigid(curr_rots, curr_trans).apply(trans_update)

            curr_quats = apply_mask(curr_quats, init_quats)
            curr_trans = apply_mask(curr_trans,
                                    init_trans / c.position_scale)
            curr_rots = quat_ops.quat_to_rot(curr_quats)

            traj.append(Rigid(curr_rots, curr_trans * c.position_scale))

            if is_last:
                unnorm_angles = torsion(seq_act, initial_seq_act)
                angles = unnorm_angles / jnp.sqrt(jnp.sum(
                    jnp.square(unnorm_angles), axis=-1, keepdims=True)
                    + 1e-12)
                # Fixed residues keep ground-truth torsions.
                gt_torsions = batch['torsion_angles_sin_cos']
                fm = fixed_mask[..., None, None]
                angles = jnp.where(fm > 0, gt_torsions, angles)
                unnorm_angles = jnp.where(fm > 0, gt_torsions, unnorm_angles)
            else:
                # Reference detaches only rots/quats between layers
                # (score_network.py:162-163); delta_quat keeps accumulating
                # gradient from every layer's affine update into rot_score.
                curr_rots = jax.lax.stop_gradient(curr_rots)
                curr_quats = jax.lax.stop_gradient(curr_quats)

        # Net rotation relative to the input rigids.
        curr_quats_final = quat_ops.quat_multiply(init_quats, delta_quat)
        curr_quats_final = apply_mask(curr_quats_final, init_quats)

        t = batch['t']
        rot_score = self.diffuser.calc_quat_score(
            init_quats, curr_quats_final, t)
        trans_score = self.diffuser.calc_trans_score(
            init_trans, curr_trans * c.position_scale, t)

        rigids_out = jnp.concatenate(
            [curr_quats_final, curr_trans * c.position_scale], axis=-1)

        return {
            'traj': traj,
            'angles_sin_cos': angles,
            'unnormalized_angles_sin_cos': unnorm_angles,
            'trans_score': trans_score,
            'rot_score': rot_score,
            'structure_act': seq_act,
            'rigids': rigids_out,
        }
