"""PyTorch -> JAX checkpoint conversion.

Maps the reference AbX `ScoreNetwork` state dict
(/root/reference/abx/model/*, released ckpts abx_diffab.ckpt / abx_rabd.ckpt)
and fair-esm ESM2 checkpoints onto abx_tpu's flax parameter trees.

Conventions:
  * torch nn.Linear weights are (out, in) -> transposed to flax (in, out);
  * nn.Embedding tables keep their layout;
  * LayerNorm weight/bias -> scale/bias;
  * the fused attention QKV layout matches by construction
    (abx_tpu/models/seqformer.py GatedAttention per-head [q‖k‖v]).

The mapping is exhaustive and fails loudly on unmapped/missing keys so a
conversion is either exact or an error (strict=True parity with
inference.py:105).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _t(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _ln(dst: Dict, prefix_torch: str, sd: Dict):
    return {'scale': np.asarray(sd[f'{prefix_torch}.weight']),
            'bias': np.asarray(sd[f'{prefix_torch}.bias'])}


def _linear(sd: Dict, name: str, bias=True):
    out = {'kernel': _t(sd[f'{name}.weight'])}
    if f'{name}.bias' in sd:
        out['bias'] = np.asarray(sd[f'{name}.bias'])
    return out


def _embed(sd: Dict, name: str):
    return {'embedding': np.asarray(sd[f'{name}.weight'])}


def _mlp(sd: Dict, name: str, torch_idx) -> Dict:
    """Sequential of Linears at given torch indices -> MLP Linear_i tree."""
    return {f'Linear_{i}': _linear(sd, f'{name}.{j}')
            for i, j in enumerate(torch_idx)}


def _sdwi(sd: Dict, name: str) -> Dict:
    """SpatialDepthWiseInception (reference seqformer.py:632-674):
    torch `convs.{i}.conv` is Conv1d(D, D, k, groups=D) with weight
    (D, 1, k) -> flax `conv{i}_weight` (k, D) + `conv{i}_bias` (D,)."""
    out = {}
    i = 0
    while f'{name}.convs.{i}.conv.weight' in sd:
        w = np.asarray(sd[f'{name}.convs.{i}.conv.weight'])
        out[f'conv{i}_weight'] = np.ascontiguousarray(w[:, 0, :].T)
        out[f'conv{i}_bias'] = np.asarray(sd[f'{name}.convs.{i}.conv.bias'])
        i += 1
    return out


def _attention(sd: Dict, name: str, fused: bool) -> Dict:
    out = {}
    if fused:
        out['proj_in'] = _linear(sd, f'{name}.proj_in')
    else:
        out['proj_q'] = _linear(sd, f'{name}.proj_q')
        out['proj_k'] = _linear(sd, f'{name}.proj_k')
        out['proj_v'] = _linear(sd, f'{name}.proj_v')
    if f'{name}.gate.weight' in sd:
        out['gate'] = _linear(sd, f'{name}.gate')
    out['proj_out'] = _linear(sd, f'{name}.proj_out')
    for inp in ('inp_q', 'inp_k', 'inp_v'):
        if f'{name}.{inp}.convs.0.conv.weight' in sd:
            out[inp] = _sdwi(sd, f'{name}.{inp}')
    return out


def _transition(sd: Dict, name: str) -> Dict:
    return {
        'norm': _ln(None, f'{name}.transition.0', sd),
        'in_proj': _linear(sd, f'{name}.transition.1'),
        'out_proj': _linear(sd, f'{name}.transition.3'),
    }


def _tri_mul(sd: Dict, name: str) -> Dict:
    out = {
        'norm': _ln(None, f'{name}.norm', sd),
        'left_proj': _linear(sd, f'{name}.left_proj'),
        'right_proj': _linear(sd, f'{name}.right_proj'),
        'final_norm': _ln(None, f'{name}.final_norm', sd),
        'proj_out': _linear(sd, f'{name}.proj_out'),
    }
    if f'{name}.left_gate.weight' in sd:
        out['left_gate'] = _linear(sd, f'{name}.left_gate')
        out['right_gate'] = _linear(sd, f'{name}.right_gate')
        out['final_gate'] = _linear(sd, f'{name}.final_gate')
    for inp in ('inp_left', 'inp_right'):
        if f'{name}.{inp}.convs.0.conv.weight' in sd:
            out[inp] = _sdwi(sd, f'{name}.{inp}')
    return out


def _tri_attn(sd: Dict, name: str) -> Dict:
    return {
        'norm': _ln(None, f'{name}.norm', sd),
        'proj_pair': _linear(sd, f'{name}.proj_pair'),
        'attn': _attention(sd, f'{name}.attn', fused=False),
    }


def convert_score_network(sd: Dict, esm_enabled: bool = False,
                          num_blocks: int = 1,
                          num_transition: int = 3,
                          num_torsion_blocks: int = 2) -> Dict:
    """Reference ScoreNetwork state_dict -> flax {'params': ...} tree."""
    p: Dict[str, Any] = {}

    # -- EmbeddingAndSeqformer (ours: impl/seqformer) ----------------------
    es: Dict[str, Any] = {}
    base = 'impl.seqformer'
    es['proj_aa_type'] = _embed(sd, f'{base}.proj_aa_type')
    es['proj_rel_pos'] = _embed(sd, f'{base}.proj_rel_pos')
    es['aa_proj_norm'] = _ln(None, f'{base}.aa_proj.0', sd)
    es['aa_proj'] = _mlp(sd, f'{base}.aa_proj', (1, 3))
    if esm_enabled:
        p['esm_embed_weights'] = np.asarray(sd[f'{base}.esm_embed_weights'])
        es['esm_norm'] = _ln(None, f'{base}.proj_esm_embed.0', sd)
        es['proj_esm_embed'] = _mlp(sd, f'{base}.proj_esm_embed', (1, 3))
    es['prev_seq_norm'] = _ln(None, f'{base}.prev_seq_norm', sd)
    es['prev_pair_norm'] = _ln(None, f'{base}.prev_pair_norm', sd)
    es['proj_prev_pos'] = _embed(sd, f'{base}.proj_prev_pos')

    # Residue encoder.
    re_base = f'{base}.encode_residue_emb'
    es['encode_residue_emb'] = {
        'aatype_embed': _embed(sd, f'{re_base}.aatype_embed'),
        'cdr_embed': _embed(sd, f'{re_base}.cdr_embed'),
        'coordinate_embed': _mlp(sd, f'{re_base}.coordinate_embed', (0, 2)),
        'mlp': _mlp(sd, f'{re_base}.mlp', (0, 2, 4, 6)),
    }
    # Pair encoder.
    pe_base = f'{base}.encode_pair_emb'
    es['encode_pair_emb'] = {
        'aa_pair_embed': _embed(sd, f'{pe_base}.aa_pair_embed'),
        'relpos_embed': _embed(sd, f'{pe_base}.relpos_embed'),
        'aapair_to_distcoef': np.asarray(
            sd[f'{pe_base}.aapair_to_distcoef.weight']),
        'distance_embed': _mlp(sd, f'{pe_base}.distance_embed', (0, 2)),
        'dgram_embed': _embed(sd, f'{pe_base}.dgram_embed'),
        'out_mlp': _mlp(sd, f'{pe_base}.out_mlp', (0, 2, 4)),
    }

    # Trunk blocks.
    sf = {}
    for b in range(num_blocks):
        blk = f'{base}.seqformer.blocks.{b}'
        sf[f'block_{b}'] = {
            'seq_attn': {
                'seq_norm': _ln(None, f'{blk}.seq_attn.seq_norm', sd),
                'pair_norm': _ln(None, f'{blk}.seq_attn.pair_norm', sd),
                'proj_pair': _linear(sd, f'{blk}.seq_attn.proj_pair'),
                'attn': _attention(sd, f'{blk}.seq_attn.attn', fused=True),
            },
            'seq_transition': _transition(sd, f'{blk}.seq_transition'),
            'outer_product_mean': {
                'norm': _ln(None, f'{blk}.outer_product_mean.norm', sd),
                'left_proj': _linear(
                    sd, f'{blk}.outer_product_mean.left_proj'),
                'right_proj': _linear(
                    sd, f'{blk}.outer_product_mean.right_proj'),
                'out_proj': _linear(
                    sd, f'{blk}.outer_product_mean.out_proj'),
            },
            'tri_mul_out': _tri_mul(
                sd, f'{blk}.triangle_multiplication_outgoing'),
            'tri_mul_in': _tri_mul(
                sd, f'{blk}.triangle_multiplication_incoming'),
            'tri_attn_start': _tri_attn(
                sd, f'{blk}.triangle_attention_starting_node'),
            'tri_attn_end': _tri_attn(
                sd, f'{blk}.triangle_attention_ending_node'),
            'pair_transition': _transition(sd, f'{blk}.pair_transition'),
        }
    es['seqformer'] = sf

    # -- IpaScore (ours: impl/diffusion_module) ----------------------------
    ip_base = 'impl.diffusion_module.ScoreNetwork'
    ipa = {
        'proj_q_scalar': _linear(sd, f'{ip_base}.attention_module.'
                                     f'proj_q_scalar'),
        'proj_kv_scalar': _linear(sd, f'{ip_base}.attention_module.'
                                      f'proj_kv_scalar'),
        'proj_q_point_local': _linear(sd, f'{ip_base}.attention_module.'
                                          f'proj_q_point_local'),
        'proj_kv_point_local': _linear(sd, f'{ip_base}.attention_module.'
                                           f'proj_kv_point_local'),
        'proj_pair': _linear(sd, f'{ip_base}.attention_module.proj_pair'),
        'trainable_point_weights': np.asarray(
            sd[f'{ip_base}.attention_module.trainable_point_weights']),
        'final_proj': _linear(sd, f'{ip_base}.attention_module.final_proj'),
    }
    dm: Dict[str, Any] = {
        'proj_init_seq_act': _linear(sd, f'{ip_base}.proj_init_seq_act'),
        'proj_init_pair_act': _linear(sd, f'{ip_base}.proj_init_pair_act'),
        'init_seq_norm': _ln(None, f'{ip_base}.init_seq_layer_norm', sd),
        'init_pair_norm': _ln(None, f'{ip_base}.init_pair_layer_norm', sd),
        'proj_seq': _linear(sd, f'{ip_base}.proj_seq'),
        'ipa': ipa,
        'attention_norm': _ln(None, f'{ip_base}.attention_layer_norm', sd),
        'transition_norm': _ln(None, f'{ip_base}.transition_layer_norm', sd),
        'affine_update': _linear(sd, f'{ip_base}.affine_update'),
    }
    for k in range(num_transition):
        dm[f'transition_{k}'] = _linear(
            sd, f'{ip_base}.transition_module.{2 * k}')
    tm_base = f'{ip_base}.sidechain_module.torsion_module'
    torsion = {
        'proj_act': _linear(sd, f'{tm_base}.proj_act.1'),
        'proj_init_act': _linear(sd, f'{tm_base}.proj_init_act.1'),
        'projection': _linear(sd, f'{tm_base}.projection'),
    }
    for k in range(num_torsion_blocks):
        torsion[f'block_{k}_linear1'] = _linear(
            sd, f'{tm_base}.blocks.{k}.net.1')
        torsion[f'block_{k}_linear2'] = _linear(
            sd, f'{tm_base}.blocks.{k}.net.3')
    dm['torsion_module'] = torsion

    # -- heads -------------------------------------------------------------
    def head_mlp(name):
        return {
            'norm': _ln(None, f'impl.{name}.net.0', sd),
            'linear1': _linear(sd, f'impl.{name}.net.1'),
            'linear2': _linear(sd, f'impl.{name}.net.3'),
            'linear3': _linear(sd, f'impl.{name}.net.5'),
        }

    impl = {
        'seqformer': es,
        'diffusion_module': dm,
        'sequence_module': head_mlp('sequence_module'),
        'predicted_lddt': head_mlp('predicted_lddt'),
    }
    if 'impl.distogram.proj.weight' in sd:
        impl['distogram'] = {'proj': _linear(sd, 'impl.distogram.proj')}
    if esm_enabled:
        impl['seqformer']['esm_embed_weights'] = p.pop('esm_embed_weights')
    return {'params': {'impl': impl}}


def convert_reference_ckpt(path: str, model, cfg, diffuser):
    """Load a reference .ckpt (torch.save dict) and convert to flax params."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    sd = ckpt.get('model_state_dict', ckpt)
    sd = {k: v.numpy() if hasattr(v, 'numpy') else v for k, v in sd.items()}
    esm_enabled = cfg.model.embeddings_and_seqformer.esm.enabled
    params = convert_score_network(
        sd, esm_enabled=esm_enabled,
        num_blocks=cfg.model.embeddings_and_seqformer.seqformer_num_block)
    return _check_against_model(params, model, cfg, diffuser)


def _check_against_model(params, model, cfg, diffuser):
    """Validate the converted tree structurally against a model init."""
    import jax
    from abx_tpu.cli.runner import _random_init
    target = _random_init(model, cfg, diffuser, 0)
    t_paths = {jax.tree_util.keystr(p): v.shape for p, v in
               jax.tree_util.tree_flatten_with_path(target)[0]}
    c_paths = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
               jax.tree_util.tree_flatten_with_path(params)[0]}
    missing = sorted(set(t_paths) - set(c_paths))
    extra = sorted(set(c_paths) - set(t_paths))
    mis_shape = sorted(k for k in set(t_paths) & set(c_paths)
                       if tuple(t_paths[k]) != tuple(c_paths[k]))
    if missing or extra or mis_shape:
        raise ValueError(
            f'checkpoint conversion mismatch:\n missing={missing[:10]}\n '
            f'extra={extra[:10]}\n shapes={mis_shape[:10]}')
    # Cast leaves to the target dtypes.
    import jax.numpy as jnp
    return jax.tree_util.tree_map(
        lambda t, c: jnp.asarray(c, dtype=t.dtype), target, params)


# -- ESM2 ------------------------------------------------------------------

class _TrackedDict(dict):
    """Dict that records which keys were read (coverage accounting)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.consumed = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return super().__getitem__(k)


# Checkpoint entries that are legitimately NOT parameters of the encoder:
# rotary inv_freq buffers, the contact-prediction head (regression over
# attention maps; unused by embedding extraction), and fairseq bookkeeping.
_ESM2_NONPARAM_KEYS = ('rot_emb.inv_freq', 'contact_head.',
                       '_float_tensor', 'embed_positions.')


def convert_esm2_ckpt(path: str, num_layers: int) -> Dict:
    """fair-esm ESM2 checkpoint -> flax params for abx_tpu.models.esm.ESM2.

    Coverage is exhaustive both ways: every target param is filled (KeyError
    otherwise) and every checkpoint tensor is either consumed or on the
    known non-parameter allowlist — silently-dropped weights are an error.
    Source surface: /root/reference/abx/model/encoder.py:21-34 loads the
    same checkpoint via fair-esm `load_model_and_alphabet_local`.
    """
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    sd = ckpt.get('model', ckpt)
    sd = _TrackedDict({
        k.replace('encoder.sentence_encoder.', '').replace('encoder.', '')
        : (v.float().numpy() if hasattr(v, 'numpy') else v)
        for k, v in sd.items()})

    p: Dict[str, Any] = {
        'embed_tokens': {'embedding': np.asarray(sd['embed_tokens.weight'])},
        'emb_layer_norm_after': _ln(None, 'emb_layer_norm_after', sd),
    }
    if 'lm_head.dense.weight' in sd:
        p['lm_head'] = {
            'dense': _linear(sd, 'lm_head.dense'),
            'layer_norm': _ln(None, 'lm_head.layer_norm', sd),
            'weight': np.asarray(sd['lm_head.weight']),
            'bias': np.asarray(sd['lm_head.bias']),
        }
    for i in range(num_layers):
        b = f'layers.{i}'
        p[f'layer_{i}'] = {
            'self_attn_layer_norm': _ln(None, f'{b}.self_attn_layer_norm',
                                        sd),
            'self_attn': {
                'q_proj': _linear(sd, f'{b}.self_attn.q_proj'),
                'k_proj': _linear(sd, f'{b}.self_attn.k_proj'),
                'v_proj': _linear(sd, f'{b}.self_attn.v_proj'),
                'out_proj': _linear(sd, f'{b}.self_attn.out_proj'),
            },
            'final_layer_norm': _ln(None, f'{b}.final_layer_norm', sd),
            'fc1': _linear(sd, f'{b}.fc1'),
            'fc2': _linear(sd, f'{b}.fc2'),
        }

    unconsumed = [k for k in sd if k not in sd.consumed
                  and not any(t in k for t in _ESM2_NONPARAM_KEYS)]
    if unconsumed:
        raise ValueError(
            f'ESM2 conversion dropped {len(unconsumed)} checkpoint '
            f'tensors: {sorted(unconsumed)[:10]}')
    return {'params': p}
