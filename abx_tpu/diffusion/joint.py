"""Joint SE(3) x sequence diffusion facade.

Composes the SO(3), R^3 and discrete diffusers into the single interface the
score network and sampler consume, mirroring
/root/reference/diffuser/full_diffuser.py but with:
  * explicit PRNG keys everywhere (no hidden torch RNG state),
  * `Rigid`-native state (quat+trans tensor7 only at the serialization edge),
  * all per-step work expressed as gathers/elementwise so a full reverse step
    jits into one fused XLA computation.

Parity quirk (SURVEY.md §2.10): the reference's `reverse` contains a dead
`seq_t_1`-unbound branch when seq diffusion is disabled; here disabled
modalities simply pass their state through.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from abx_tpu.diffusion.discrete import DiscreteConfig, DiscreteDiffuser
from abx_tpu.diffusion.igso3 import SO3Config, SO3Diffuser
from abx_tpu.diffusion.r3 import R3Config, R3Diffuser
from abx_tpu.geometry import quat as quat_ops


@dataclasses.dataclass(frozen=True)
class JointConfig:
    so3: SO3Config = SO3Config()
    r3: R3Config = R3Config()
    seq: DiscreteConfig = DiscreteConfig()
    diffuse_rot: bool = True
    diffuse_trans: bool = True
    diffuse_seq: bool = True
    inference_steps: int = 100
    min_t: float = 0.01

    @staticmethod
    def from_dict(d: dict) -> 'JointConfig':
        diffuse = d.get('diffuse', {})
        return JointConfig(
            so3=SO3Config(**{k: v for k, v in d.get('so3', {}).items()
                             if k in SO3Config.__dataclass_fields__}),
            r3=R3Config(**{k: v for k, v in d.get('r3', {}).items()
                           if k in R3Config.__dataclass_fields__}),
            seq=DiscreteConfig(**{k: v for k, v in d.get('seq', {}).items()
                                  if k in DiscreteConfig.__dataclass_fields__}),
            diffuse_rot=diffuse.get('diffuse_rot', True),
            diffuse_trans=diffuse.get('diffuse_trans', True),
            diffuse_seq=diffuse.get('diffuse_seq', True),
            inference_steps=d.get('inference_step', 100),
        )


def _mask_mix(x_diff, x_fixed, diff_mask):
    return diff_mask * x_diff + (1 - diff_mask) * x_fixed


def tensor7_split(rigids7):
    """tensor7 -> (trans, rotvec); parity with full_diffuser.py:12-18."""
    return rigids7[..., 4:], quat_ops.quat_to_rotvec(rigids7[..., :4])


def tensor7_join(rotvec, trans):
    return jnp.concatenate([quat_ops.rotvec_to_quat(rotvec), trans], axis=-1)


class JointDiffuser:
    def __init__(self, config: JointConfig = JointConfig()):
        self.config = config
        self.so3 = SO3Diffuser(config.so3)
        self.r3 = R3Diffuser(config.r3)
        self.seq = DiscreteDiffuser(config.seq)

    # -- forward ------------------------------------------------------------
    def forward_marginal(self, key, rigids_0, seq_0, t,
                         diffuse_mask: Optional[jnp.ndarray] = None
                         ) -> Dict[str, jnp.ndarray]:
        """Noise (rigids, sequence) to time t.

        Args:
            rigids_0: (B, L, 7) tensor7.
            seq_0: (B, L) int.
            t: (B,).
            diffuse_mask: (B, L), 1 = diffused.
        """
        c = self.config
        trans_0, rot_0 = rigids_0[..., 4:], quat_ops.quat_to_rotvec(
            rigids_0[..., :4])
        k_rot, k_trans, k_seq = jax.random.split(key, 3)

        if c.diffuse_rot:
            rot_t, rot_score = self.so3.forward_marginal(k_rot, rot_0, t)
            rot_score_scaling = self.so3.score_scaling(t)
        else:
            rot_t = rot_0
            rot_score = jnp.zeros_like(rot_0)
            rot_score_scaling = jnp.ones_like(t)

        if c.diffuse_trans:
            trans_t, trans_score = self.r3.forward_marginal(k_trans, trans_0, t)
            trans_score_scaling = self.r3.score_scaling(t)
        else:
            trans_t = trans_0
            trans_score = jnp.zeros_like(trans_0)
            trans_score_scaling = jnp.ones_like(t)

        if c.diffuse_seq:
            # seq_t IS x_tilde (the one-extra-site corruption): the reference
            # feeds x_tilde to the network (tauLDR one-forward-pass scheme,
            # discrete_diffuser.py:72-127); seq_xt is the pre-corruption x_t
            # the exact ELBO's jump term needs.
            seq_t, q_t0, rate_t, seq_xt = self.seq.forward_marginal(
                k_seq, seq_0, t, return_xt=True)
        else:
            s = self.seq.num_states
            seq_t = seq_0
            seq_xt = seq_0
            q_t0 = jnp.broadcast_to(jnp.eye(s), (t.shape[0], s, s))
            rate_t = jnp.zeros((t.shape[0], s, s))

        if diffuse_mask is not None:
            m = diffuse_mask
            rot_t = _mask_mix(rot_t, rot_0, m[..., None])
            trans_t = _mask_mix(trans_t, trans_0, m[..., None])
            rot_score = rot_score * m[..., None]
            trans_score = trans_score * m[..., None]
            seq_t = _mask_mix(seq_t, seq_0, m).astype(seq_0.dtype)
            seq_xt = _mask_mix(seq_xt, seq_0, m).astype(seq_0.dtype)

        return {
            'rigids_t': tensor7_join(rot_t, trans_t),
            'trans_score': trans_score,
            'rot_score': rot_score,
            'trans_score_scaling': trans_score_scaling,
            'rot_score_scaling': rot_score_scaling,
            'seq_t': seq_t,
            'seq_xt': seq_xt,
            'q_t0': q_t0,
            'rate_t': rate_t,
        }

    # -- score helpers used by the network ----------------------------------
    def calc_trans_0(self, trans_score, trans_t, t):
        return self.r3.calc_trans_0(trans_score, trans_t, t)

    def calc_trans_score(self, trans_t, trans_0, t, scale: bool = True):
        return self.r3.score(trans_t, trans_0, t, scale=scale)

    def calc_quat_score(self, quat_t, quat_0, t):
        """Rotation score of quat_t relative to predicted quat_0.

        Mirrors full_diffuser.py:135-142: score at rotvec(quat_0^{-1} quat_t).
        """
        quat_0_inv = quat_ops.invert_quat(quat_0)
        quats_0t = quat_ops.quat_multiply(quat_0_inv, quat_t)
        rotvec_0t = quat_ops.quat_to_rotvec(quats_0t)
        return self.so3.score(rotvec_0t, t)

    def score_scaling(self, t):
        return self.so3.score_scaling(t), self.r3.score_scaling(t)

    # -- reverse ------------------------------------------------------------
    def reverse(self, key, rigids_t, seq_t, rot_score, trans_score, logits_t,
                t, dt, diffuse_mask: Optional[jnp.ndarray] = None,
                center: bool = True, noise_scale: float = 1.0,
                noise: Optional[Dict[str, jnp.ndarray]] = None):
        """One joint reverse step; t (B,), dt scalar.

        `noise` optionally injects the primitive random draws (shared-noise
        parity harness): keys 'rot_z' (B,L,3) / 'trans_z' (B,L,3) normals
        and 'seq_u' (B,L,S) uniforms; absent keys fall back to `key`.
        """
        c = self.config
        noise = noise or {}
        trans_t, rot_t = rigids_t[..., 4:], quat_ops.quat_to_rotvec(
            rigids_t[..., :4])
        k_rot, k_trans, k_seq = jax.random.split(key, 3)

        if c.diffuse_rot:
            rot_t_1 = self.so3.reverse(k_rot, rot_t, rot_score, t, dt,
                                       noise_scale=noise_scale,
                                       z=noise.get('rot_z'))
        else:
            rot_t_1 = rot_t
        if c.diffuse_trans:
            trans_t_1 = self.r3.reverse(k_trans, trans_t, trans_score, t, dt,
                                        center=center,
                                        noise_scale=noise_scale,
                                        z=noise.get('trans_z'))
        else:
            trans_t_1 = trans_t
        if c.diffuse_seq:
            seq_t_1 = self.seq.reverse(k_seq, seq_t, logits_t, t, dt,
                                       u=noise.get('seq_u'))
        else:
            seq_t_1 = seq_t

        if diffuse_mask is not None:
            m = diffuse_mask
            trans_t_1 = _mask_mix(trans_t_1, trans_t, m[..., None])
            rot_t_1 = _mask_mix(rot_t_1, rot_t, m[..., None])
            seq_t_1 = _mask_mix(seq_t_1, seq_t, m).astype(seq_t.dtype)

        return tensor7_join(rot_t_1, trans_t_1), seq_t_1

    # -- reference sampling (t=1 init) --------------------------------------
    def sample_ref(self, key, shape, impute_rigids=None, impute_seq=None,
                   diffuse_mask: Optional[jnp.ndarray] = None):
        """Draw the t=1 reference state, imputing fixed residues."""
        c = self.config
        k_rot, k_trans, k_seq = jax.random.split(key, 3)

        if impute_rigids is not None:
            trans_imp, rot_imp = tensor7_split(impute_rigids)
            trans_imp = self.r3.scale(trans_imp)
        elif diffuse_mask is not None:
            raise ValueError('diffuse_mask requires imputation values')

        rot_ref = (self.so3.sample_ref(k_rot, shape) if c.diffuse_rot
                   else rot_imp)
        trans_ref = (self.r3.sample_ref(k_trans, shape) if c.diffuse_trans
                     else trans_imp)
        seq_ref = (self.seq.sample_ref(k_seq, shape) if c.diffuse_seq
                   else impute_seq)

        if diffuse_mask is not None:
            m = diffuse_mask
            rot_ref = _mask_mix(rot_ref, rot_imp, m[..., None])
            trans_ref = _mask_mix(trans_ref, trans_imp, m[..., None])
            seq_ref = _mask_mix(seq_ref, impute_seq, m).astype(jnp.int32)
        trans_ref = self.r3.unscale(trans_ref)

        return {'rigids_t': tensor7_join(rot_ref, trans_ref),
                'seq_t': seq_ref}
