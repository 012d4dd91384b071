"""Reverse-diffusion sampler: the product's hot path.

Parity surface: /root/reference/inference.py:166-273 (`sample_fn`,
`_set_t_feats`, `_self_conditioning`) and design.py:182.

TPU-first structure (SURVEY.md §7 Phase 4): the ENTIRE per-step computation —
trunk (+recycles), heads, self-conditioning update, and the joint SE(3) x
sequence reverse step — is one jitted function, and the 100 diffusion steps
run inside a single `lax.scan`.  No host synchronisation happens anywhere in
the trajectory; per-step outputs (pLDDT, sequences, atom14) are collected as
scan outputs and transferred once at the end.  The reference instead crossed
host<->device every step (inference.py:255-258), which is the main throughput
sink this design removes.

Modes:
  * design     — start from the t=1 reference distribution.
  * optimize   — partially re-noise to t = opt_step/num_t, then denoise
                 (the step grid is sliced on the host; still one scan).
  * trajectory — same as design but per-step structures are returned.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from abx_tpu.data.features import (FeatureBuilder, make_diffuser_features,
                                   make_static_pair_features)
from abx_tpu.models.network import (forward_with_recycling, get_prev,
                                    zero_prev)


def _save_npz(path: str, arrays: Dict[str, np.ndarray]) -> None:
    """Atomic npz save that round-trips bfloat16 (numpy would serialise
    ml_dtypes bfloat16 as raw '|V2' void, which np.load cannot read back).
    bf16 arrays are stored as uint16 views plus a `__bf16__<key>` marker."""
    import ml_dtypes
    out = {}
    for k, v in arrays.items():
        v = np.asarray(v)
        if v.dtype == ml_dtypes.bfloat16:
            out[k] = v.view(np.uint16)
            out['__bf16__' + k] = np.asarray(1)
        else:
            out[k] = v
    tmp = path + '.tmp.npz'
    np.savez(tmp, **out)
    os.replace(tmp, path)


def _load_npz(path: str) -> Dict[str, np.ndarray]:
    """Inverse of `_save_npz`: restores bf16 arrays from uint16 views."""
    import ml_dtypes
    saved = np.load(path, allow_pickle=False)
    out = {}
    for k in saved.files:
        if k.startswith('__bf16__'):
            continue
        v = saved[k]
        if '__bf16__' + k in saved.files:
            v = v.view(ml_dtypes.bfloat16)
        out[k] = v
    return out


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    num_t: int = 100
    min_t: float = 0.01
    noise_scale: float = 1.0
    center: bool = True
    self_conditioning: bool = True
    generate_area: str = 'H3'
    mode: str = 'design'            # design | optimize | trajectory
    opt_step: Optional[int] = None  # for optimize mode
    collect_trajectory: bool = False
    # OPT-IN, output-changing: run the frozen ESM encoder ONCE per diffusion
    # step (on the step's input seq_t) and reuse the weighted embedding
    # across the recycle passes, instead of the reference's per-pass
    # recomputation on the recycled predicted sequence (abx.py:89-102 +
    # encoder.py:72-105).  Cuts ESM cost 3x at num_recycle=2; quality
    # evaluated in runs/esm_reuse_eval (see docs/ESM.md).
    esm_reuse_recycles: bool = False
    # OPT-IN, output-changing, requires esm_reuse_recycles: refresh the
    # cached ESM embedding only every k diffusion steps (the cache rides in
    # the scan carry; off-refresh steps skip the ESM forward entirely via
    # lax.cond).  Cuts ESM cost a further k x; quality-evaluate per k
    # before use (docs/ESM.md).
    esm_refresh_every: int = 1
    # OPT-IN, output-changing: k Gibbs-corrector jumps on the SEQUENCE
    # track after each predictor step (Campbell et al. 2022
    # predictor-corrector; DiscreteDiffuser.corrector).  The corrector
    # CTMC (forward + reverse rates at the post-step time) is stationary
    # w.r.t. the noising marginal, so extra jumps repair tau-leaping
    # discretisation error — useful at reduced num_t.  Reuses the step's
    # logits (no extra trunk passes; the score-reuse approximation of the
    # Gibbs-corrector literature, PAPERS.md).  The reference loop has no
    # corrector, so this is never the parity/headline path.
    seq_corrector_steps: int = 0
    # Corrector leap size as a fraction of the predictor dt.
    corrector_scale: float = 1.0


class Sampler:
    """Builds and caches the jitted end-to-end sampling function."""

    def __init__(self, model, diffuser, model_config,
                 sampler_config: SamplerConfig, esm_fn=None,
                 esm_params=None):
        """
        Args:
            esm_fn: optional ESM conditioning.  When `esm_params` is given,
                the signature is (esm_params, ab_aatype, heavy_len,
                light_len, layer_weights) and the params are threaded
                through jit as a RUNTIME ARGUMENT — closing over a
                3B-parameter tree would bake ~6 GB of constants into the
                executable.  Without `esm_params` the 4-arg closure form
                (ab_aatype, heavy_len, light_len, layer_weights) is used
                directly (tiny test models only).
        """
        self.model = model
        self.diffuser = diffuser
        self.model_config = model_config
        self.config = sampler_config
        self.esm_fn = esm_fn
        self.esm_params = esm_params
        self.feature_builder = FeatureBuilder()

        c = sampler_config
        steps = np.linspace(c.min_t, 1.0, c.num_t)[::-1].copy()
        if c.mode == 'optimize':
            assert c.opt_step is not None
            opt_t = c.opt_step / c.num_t
            steps = steps[steps <= opt_t + 1e-8]
        self.reverse_steps = jnp.asarray(steps, dtype=jnp.float32)
        # Parity (inference.py:213-248): at the final step (t <= min_t) the
        # reference skips _set_t_feats, so the model sees the PREVIOUS
        # step's t features; reproduce via a separate model-t grid.
        t_model = steps.copy()
        if len(steps) > 1 and steps[-1] <= c.min_t + 1e-8:
            t_model[-1] = steps[-2]
        self.model_steps = jnp.asarray(t_model, dtype=jnp.float32)
        self.dt = jnp.asarray(1.0 / c.num_t, dtype=jnp.float32)

        self._run = jax.jit(self._build_run())

    # -- feature prep (jittable) -------------------------------------------
    def prepare(self, key, feats: Dict[str, jnp.ndarray]) -> Dict:
        """Geometry features + initial noisy state for the chosen mode."""
        c = self.config
        batch = self.feature_builder(feats)
        mode = 'optimize' if c.mode == 'optimize' else 'design'
        t_value = (c.opt_step / c.num_t) if c.mode == 'optimize' else None
        batch = make_diffuser_features(
            batch, diffuser=self.diffuser, generate_area=c.generate_area,
            key=key, mode=mode, t_value=t_value)
        # Hoist coordinate-only pair-encoder inputs out of the scanned step.
        batch = make_static_pair_features(batch)
        return batch

    # -- the scanned step ---------------------------------------------------
    def _build_run(self):
        c = self.config
        diffuser = self.diffuser
        model = self.model
        prev_pos_cfg = self.model_config.embeddings_and_seqformer.prev_pos

        def set_t_feats(batch, t):
            b = batch['seq'].shape[0]
            t_vec = jnp.full((b,), t, dtype=jnp.float32)
            rot_s, trans_s = diffuser.score_scaling(t_vec)
            batch = dict(batch)
            batch.update(t=t_vec, rot_score_scaling=rot_s,
                         trans_score_scaling=trans_s)
            return batch

        num_recycle = self.model_config.num_recycle

        use_esm_reuse = c.esm_reuse_recycles and self.esm_fn is not None
        carry_esm_cache = use_esm_reuse and c.esm_refresh_every > 1

        def esm_weighted_of(params, esm_params, seq_t, static):
            """Weighted ESM embedding of the CURRENT noisy sequence — the
            hoisted form the opt-in esm_reuse_recycles mode shares across
            recycle passes (and, with esm_refresh_every>1, across steps)."""
            efn = self.esm_fn
            if esm_params is not None:
                efn = functools.partial(self.esm_fn, esm_params)
            lw = model.apply(params, method='esm_layer_weights')
            ab = seq_t[:, :model.antibody_len].astype(jnp.int32)
            return efn(ab, static['heavy_len'], static['light_len'], lw)

        def forward(params, esm_params, batch, static_acts,
                    esm_weighted=None):
            efn = self.esm_fn
            if efn is not None and esm_params is not None:
                efn = functools.partial(self.esm_fn, esm_params)
            if esm_weighted is not None:
                # Pre-computed weighted embedding shared by all recycle
                # passes via batch['esm_weighted'] (seqformer consumes it
                # in place of calling esm_fn).  Opt-in; see SamplerConfig.
                batch = dict(batch)
                batch['esm_weighted'] = esm_weighted
                efn = None

            def single(mb, compute_loss, pass_idx):
                del pass_idx  # deterministic inference: no dropout RNG
                return model.apply(params, mb, esm_fn=efn,
                                   num_recycle=0, compute_loss=compute_loss,
                                   static_acts=static_acts)
            return forward_with_recycling(single, batch, num_recycle,
                                          prev_pos_cfg)

        def init(params, feats, key):
            """Feature prep + initial scan state (shared by run/resumable).

            Returns (state, static, static_acts, diffuse_mask, k_scan);
            `static` is the per-trajectory constant feature dict, and
            static_acts the hoisted trajectory-invariant embeddings."""
            k_init, k_scan = jax.random.split(key)
            batch = self.prepare(k_init, feats)
            b, l = batch['seq'].shape

            bb_mask = batch['atom14_gt_exists'][..., 0]
            diffuse_mask = (1 - batch['fixed_mask']) * bb_mask

            state = {
                'rigids_t': batch['rigids_t'],
                'seq_t': batch['seq_t'].astype(jnp.int32),
                **zero_prev(b, l, self.model_config,
                            dtype=self.model.dtype),
            }

            static = {k: v for k, v in batch.items()
                      if k not in ('rigids_t', 'seq_t', 't',
                                   'rot_score_scaling',
                                   'trans_score_scaling')}

            # Trajectory-invariant embedding terms: computed ONCE here and
            # closed over by the scanned step (the reference recomputes
            # them 3x per diffusion step — see
            # EmbeddingAndSeqformer.static_embeddings).
            static_acts = model.apply(params, batch,
                                      method='static_embeddings')
            return state, static, static_acts, diffuse_mask, k_scan

        def make_step(params, esm_params, static, static_acts, diffuse_mask):
            """The per-diffusion-step function for lax.scan."""

            def model_batch(state, t):
                mb = dict(static)
                mb['rigids_t'] = state['rigids_t']
                mb['seq_t'] = state['seq_t']
                mb['prev_pos'] = state['prev_pos']
                mb['prev_seq'] = state['prev_seq']
                mb['prev_pair'] = state['prev_pair']
                return set_t_feats(mb, t)

            def step(carry, xs):
                # Last xs element: per-step injected noise dict (empty in
                # production; filled by the shared-noise parity harness).
                t, t_model, prime, refresh, step_noise = xs
                state, key = carry
                key, k_rev = jax.random.split(key)
                mb = model_batch(state, t_model)
                esm_w = None
                if use_esm_reuse:
                    if carry_esm_cache:
                        # Refresh the cached embedding every k-th step;
                        # off-refresh steps skip the ESM forward (lax.cond
                        # executes one branch at runtime).
                        esm_w = jax.lax.cond(
                            refresh > 0,
                            lambda s: esm_weighted_of(params, esm_params,
                                                      s, static),
                            lambda s: state['esm_cache'],
                            state['seq_t'])
                    else:
                        esm_w = esm_weighted_of(params, esm_params,
                                                state['seq_t'], static)
                out = forward(params, esm_params, mb, static_acts,
                              esm_weighted=esm_w)
                folding = out['heads']['folding']
                seq_head = out['heads']['sequence_module']
                # At num_recycle>0 the reference's in-place recycling leaves
                # input_feats['seq_t'] = the last recycle pass's predicted
                # sequence, and its reverse transition reads that MUTATED
                # value (abx.py:96-99 + inference.py:231-233) — the tau-leap
                # starts from the recycled sequence, not the carried noisy
                # one.  Identical to state['seq_t'] at num_recycle=0.
                seq_cur = out['recycled_seq_t']

                prev = get_prev(mb, out, prev_pos_cfg)

                b_loc = mb['seq'].shape[0]
                t_rev = jnp.full((b_loc,), t, dtype=jnp.float32)
                rigids_rev, seq_rev = diffuser.reverse(
                    k_rev, state['rigids_t'], seq_cur,
                    folding['rot_score'], folding['trans_score'],
                    seq_head['logits'], t_rev, self.dt,
                    diffuse_mask=diffuse_mask, center=c.center,
                    noise_scale=c.noise_scale,
                    noise=step_noise if step_noise else None)

                if c.seq_corrector_steps > 0 \
                        and diffuser.config.diffuse_seq:
                    # Gibbs-corrector jumps at the post-step time, reusing
                    # this step's logits (see SamplerConfig).  Fixed sites
                    # stay fixed via the same mask mix as the predictor.
                    key, k_corr = jax.random.split(key)
                    t_next = jnp.full((b_loc,),
                                      jnp.maximum(t - self.dt, c.min_t),
                                      dtype=jnp.float32)

                    def corr_body(i, seq):
                        seq_c = diffuser.seq.corrector(
                            jax.random.fold_in(k_corr, i), seq,
                            seq_head['logits'], t_next,
                            self.dt * c.corrector_scale)
                        return (diffuse_mask * seq_c
                                + (1 - diffuse_mask) * seq).astype(jnp.int32)

                    seq_rev = jax.lax.fori_loop(
                        0, c.seq_corrector_steps, corr_body, seq_rev)

                # Final step (t <= min_t): take the model's denoised output.
                is_last = t <= c.min_t + 1e-8
                rigids_next = jnp.where(is_last, folding['rigids'],
                                        rigids_rev)
                seq_next = jnp.where(is_last, seq_head['seq_0'],
                                     seq_rev).astype(jnp.int32)
                # Prime step: rigids unchanged, prev_* updated — and seq_t
                # picks up the recycled prediction, exactly as the
                # reference's _self_conditioning leaves the in-place-mutated
                # seq_t in the batch (inference.py:173-178).  seq_cur ==
                # state['seq_t'] at num_recycle=0, where this is a no-op.
                rigids_next = jnp.where(prime > 0, state['rigids_t'],
                                        rigids_next)
                seq_next = jnp.where(prime > 0, seq_cur,
                                     seq_next).astype(jnp.int32)

                new_state = {'rigids_t': rigids_next, 'seq_t': seq_next,
                             **prev}
                if carry_esm_cache:
                    new_state['esm_cache'] = esm_w

                plddt = out['heads']['predicted_lddt']['pLDDT']
                plddt_mean = jnp.sum(plddt * diffuse_mask, axis=1) / (
                    jnp.sum(diffuse_mask, axis=1) + 1e-8)
                step_out = {
                    'atom14': folding['final_atom14_positions'],
                    'seq': jnp.clip(seq_next, 0, 19),
                    'plddt': plddt_mean,
                    't': t,
                }
                return (new_state, key), step_out

            return step

        def add_esm_cache(params, esm_params, state, static):
            """Seed the scan-carried ESM cache (zeros — the grid's first
            step always refreshes, so the seed is never consumed; shapes
            come from eval_shape, no FLOPs)."""
            if not carry_esm_cache:
                return state
            spec = jax.eval_shape(esm_weighted_of, params, esm_params,
                                  state['seq_t'], static)
            state = dict(state)
            state['esm_cache'] = jnp.zeros(spec.shape, spec.dtype)
            return state

        def run(params, esm_params, feats, key, noise):
            state, static, static_acts, diffuse_mask, k_scan = init(
                params, feats, key)
            state = add_esm_cache(params, esm_params, state, static)
            ts, ts_model, is_prime, refresh = self._step_grids()
            step = make_step(params, esm_params, static, static_acts,
                             diffuse_mask)
            (final_state, _), steps_out = jax.lax.scan(
                step, (state, k_scan), (ts, ts_model, is_prime, refresh,
                                        noise))
            if c.self_conditioning and self.reverse_steps.shape[0] > 0:
                # Drop the prime step from collected outputs.
                steps_out = jax.tree.map(lambda x: x[1:], steps_out)

            last = jax.tree.map(lambda x: x[-1], steps_out)
            result = {
                'rigids': final_state['rigids_t'],
                'seq': last['seq'],
                'atom14': last['atom14'],
                'plddt': last['plddt'],
                'diffuse_mask': diffuse_mask,
                'gt_atom14': static['atom14_gt_positions'],
            }
            if c.collect_trajectory:
                result['trajectory'] = steps_out
            return result

        def run_chunk(params, esm_params, static, static_acts, diffuse_mask,
                      state, key, xs):
            """Scan `step` over a CHUNK of the reverse grid (resumable)."""
            step = make_step(params, esm_params, static, static_acts,
                             diffuse_mask)
            (state, key), steps_out = jax.lax.scan(step, (state, key), xs)
            return state, key, steps_out

        self._init = jax.jit(init)
        self._run_chunk = jax.jit(run_chunk)
        self._add_esm_cache = add_esm_cache
        return run

    def _step_grids(self):
        """(ts, ts_model, is_prime, refresh): the reverse grid with the
        self-conditioning prime step folded in as a leading flagged step
        (inference.py:209-211) — one trunk trace in the whole program.
        `refresh` flags the steps whose cached ESM embedding is recomputed
        (every esm_refresh_every-th grid position; all-ones at the default
        k=1, where no cache is carried)."""
        c = self.config
        if c.self_conditioning and self.reverse_steps.shape[0] > 0:
            ts = jnp.concatenate([self.reverse_steps[:1],
                                  self.reverse_steps])
            ts_model = jnp.concatenate([self.model_steps[:1],
                                        self.model_steps])
            is_prime = jnp.zeros_like(ts).at[0].set(1.0)
        else:
            ts = self.reverse_steps
            ts_model = self.model_steps
            is_prime = jnp.zeros_like(ts)
        k = max(int(c.esm_refresh_every), 1)
        idx = np.arange(int(ts.shape[0]))
        refresh = jnp.asarray((idx % k == 0).astype(np.float32))
        return ts, ts_model, is_prime, refresh

    def sample(self, params, feats: Dict[str, jnp.ndarray], key,
               noise: Optional[Dict[str, jnp.ndarray]] = None
               ) -> Dict[str, jnp.ndarray]:
        """Run the full reverse process for one (batched) feature dict.

        `noise` optionally injects per-step primitive draws for the
        shared-noise parity harness: a dict of arrays with leading dim
        len(step grid) — i.e. num steps + 1 when the self-conditioning
        prime step is on (slot 0 is consumed by the prime step's discarded
        reverse; the final slot is likewise discarded by the take-denoised
        last step).  Keys as in `JointDiffuser.reverse` noise.
        """
        if getattr(self, '_aot_dir', None) and not noise:
            return self._aot_call(params, feats, key, None)
        return self._run(params, self.esm_params, feats, key, noise or {})

    # -- AOT export / load --------------------------------------------------
    def enable_aot(self, cache_dir: str) -> None:
        """Serve from serialized StableHLO exports under `cache_dir`.

        First call for a given (mode, grid, shapes, dtype) signature traces
        + exports + serializes; subsequent PROCESSES deserialize the blob
        and skip Python tracing entirely (minutes for the full model on a
        slow host).  Combined with the persistent XLA compile cache this
        makes a warm start deserialize-and-load.
        """
        self._aot_dir = cache_dir
        self._aot: Dict[str, Any] = {}

    def _aot_signature(self, feats) -> str:
        import hashlib
        c = self.config
        shapes = ','.join(
            f'{k}:{tuple(np.shape(v))}:{np.asarray(v).dtype}'
            for k, v in sorted(feats.items()))
        sig = (f'{c.mode}|{c.num_t}|{c.min_t}|{c.generate_area}|'
               f'{c.opt_step}|{c.collect_trajectory}|{c.noise_scale}|'
               f'{c.center}|{self.model.dtype}|'
               f'{self.esm_fn is not None}|{c.esm_reuse_recycles}|'
               f'{c.esm_refresh_every}|{c.seq_corrector_steps}|'
               f'{c.corrector_scale}|{shapes}')
        return hashlib.sha1(sig.encode()).hexdigest()[:16]

    def _aot_call(self, params, feats, key, noise):
        h = self._aot_signature(feats)
        fn = self._aot.get(h)
        if fn is None:
            path = os.path.join(self._aot_dir, f'sampler_{h}.stablehlo')
            if os.path.exists(path):
                with open(path, 'rb') as f:
                    exported = jax.export.deserialize(f.read())
            else:
                exported = jax.export.export(self._run)(
                    params, self.esm_params, feats, key, noise or {})
                os.makedirs(self._aot_dir, exist_ok=True)
                tmp = path + '.tmp'
                with open(tmp, 'wb') as f:
                    f.write(exported.serialize())
                os.replace(tmp, path)
            fn = exported.call
            self._aot[h] = fn
        return fn(params, self.esm_params, feats, key, noise or {})

    # -- mid-trajectory checkpoint / resume ---------------------------------
    def sample_resumable(self, params, feats, key, chunk_steps: int = 20,
                         state_path: Optional[str] = None
                         ) -> Dict[str, jnp.ndarray]:
        """Like `sample`, but the scan runs in chunks with the sampler state
        (rigids_t / seq_t / prev_* / RNG key) checkpointed to `state_path`
        between chunks — a killed process resumes mid-trajectory instead of
        restarting the 100-step design (ROADMAP backlog item; the reference
        has no resume at all, SURVEY.md §5).

        Determinism: identical inputs produce bitwise-identical results to
        `sample` up to chunked-scan compilation differences; the RNG chain
        is part of the saved state.  bfloat16 carries (the production bf16
        trunk's prev_seq/prev_pair) round-trip through the npz as uint16
        views with a dtype sidecar — numpy cannot natively serialise
        ml_dtypes bfloat16.

        With `collect_trajectory`, completed chunks' per-step outputs are
        persisted beside the state file (`<state_path>.traj`), so a resumed
        run returns the FULL trajectory.
        """
        import numpy as onp
        c = self.config
        state, static, static_acts, diffuse_mask, k_scan = self._init(
            params, feats, key)
        state = self._add_esm_cache(params, self.esm_params, state, static)
        ts, ts_model, is_prime, refresh = self._step_grids()
        n = int(ts.shape[0])
        traj_path = (state_path + '.traj') if state_path else None

        start = 0
        outs = []
        if state_path and os.path.exists(state_path):
            saved = _load_npz(state_path)
            start = int(saved['__chunk_pos__'])
            k_scan = jnp.asarray(saved['__key__'])
            state = {k: jnp.asarray(saved[k]).astype(state[k].dtype)
                     for k in state}
            if c.collect_trajectory and traj_path \
                    and os.path.exists(traj_path):
                prior = _load_npz(traj_path)
                outs.append({k.split('/', 1)[1]: v for k, v in prior.items()
                             if k.startswith('steps/')})

        pos = start
        while pos < n:
            end = min(pos + chunk_steps, n)
            xs = (ts[pos:end], ts_model[pos:end], is_prime[pos:end],
                  refresh[pos:end], {})
            state, k_scan, steps_out = self._run_chunk(
                params, self.esm_params, static, static_acts, diffuse_mask,
                state, k_scan, xs)
            outs.append(jax.tree.map(onp.asarray, steps_out))
            pos = end
            if state_path and pos < n:
                host = {k: onp.asarray(v) for k, v in state.items()}
                host['__key__'] = onp.asarray(k_scan)
                host['__chunk_pos__'] = onp.asarray(pos)
                if c.collect_trajectory and traj_path:
                    acc = jax.tree.map(
                        lambda *xs: onp.concatenate(xs, axis=0), *outs)
                    _save_npz(traj_path,
                              {'steps/' + k: v for k, v in acc.items()})
                _save_npz(state_path, host)
        for p in (state_path, traj_path):
            if p and os.path.exists(p):
                os.remove(p)

        steps_out = jax.tree.map(
            lambda *xs: onp.concatenate(xs, axis=0), *outs)
        # With trajectory persistence the collected grid always starts at
        # step 0 (restored from disk on resume), so the self-conditioning
        # prime step is always present and dropped; without persistence a
        # mid-grid resume starts past the prime step already.
        has_step0 = (start == 0) or (c.collect_trajectory
                                     and int(steps_out['t'].shape[0]) == n)
        skip = 1 if (c.self_conditioning
                     and self.reverse_steps.shape[0] > 0 and has_step0) \
            else 0
        steps_out = jax.tree.map(lambda x: x[skip:], steps_out)
        last = jax.tree.map(lambda x: x[-1], steps_out)
        result = {
            'rigids': state['rigids_t'],
            'seq': jnp.asarray(last['seq']),
            'atom14': jnp.asarray(last['atom14']),
            'plddt': jnp.asarray(last['plddt']),
            'diffuse_mask': diffuse_mask,
            'gt_atom14': static['atom14_gt_positions'],
        }
        if c.collect_trajectory:
            result['trajectory'] = steps_out
        return result
