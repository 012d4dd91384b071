"""No-ESM pair-track HBM floor accounting (VERDICT r4 item 7).

Enumerates the per-trunk-pass op ladder with each op's HBM traffic under
the CURRENT kernel fusions (what actually crosses HBM given ops/*.py —
VMEM-resident intermediates excluded), multiplies by 3 passes/step, and
divides by v5e HBM bandwidth to get the theoretical bandwidth-bound
steps/s.  Compare with the measured device ms/step from
tools/profile_sampler.py to state the achieved fraction honestly.

Traffic conventions: bf16 activations (2 B), one read per consumed HBM
tensor, one write per produced HBM tensor; residual adds that reuse the
op's own input count a single read.  These are LOWER bounds — XLA layout
copies, f32 internals that spill, and sub-peak achieved bandwidth on
strided access all push real traffic/time up.

    python tools/hbm_floor.py [--batch 4] [--length 288]
"""

from __future__ import annotations

import argparse
import json

# v5e (v5 lite) HBM bandwidth, bytes/s.
V5E_HBM_BYTES_PER_S = 819e9


def ladder(b: int, l: int, cp: int = 192, nc: int = 128, cs: int = 544,
           ipa_layers: int = 8, ipa_heads: int = 12, dtype_bytes: int = 2):
    """Returns [(op, hbm_bytes_per_pass, note)] for one trunk pass."""
    P = b * l * l * cp * dtype_bytes          # pair activation tensor
    NC = b * l * l * nc * dtype_bytes         # nc-channel intermediate
    S = b * l * cs * dtype_bytes              # seq activation tensor
    BIAS = b * 4 * l * l * dtype_bytes        # 4-head tri-attn bias
    POS = b * l * l * 4                       # int32 prev_pos bins

    rows = []

    def add(name, bytes_, note):
        rows.append((name, bytes_, note))

    add('recycle_embed', POS + P + P,
        'read prev_pos bins + prev_pair, write pair (fused one-hot+LN+'
        'concat kernel, ops/recycle_embed.py)')
    # Two TriangleMultiplication instances (outgoing + incoming).
    add('tri_mult_pre x2', 2 * (P + 2 * NC + P),
        'read pair; write left+right (nc) + fgate (C) '
        '(fused LN+5-proj+gate kernel, ops/tri_mult.py)')
    add('tri_mult_contract x2', 2 * (2 * NC + NC),
        'triangle GEMM: read left/right, write y')
    add('tri_mult_post x2', 2 * (NC + P + P + P),
        'read y + fgate + residual, write pair (fused LN+proj+gate+res)')
    # Two TriangleAttention instances (starting + ending node).
    add('pair_bias x2', 2 * (P + BIAS),
        'read pair, write 4-head bias (fused LN+proj, ops/pair_bias.py)')
    add('tri_attention x2', 2 * (P + BIAS + P),
        'packed in-kernel qkv/gate/out-proj+res: read pair + bias, '
        'write pair (logits stay VMEM, ops/tri_attention.py)')
    add('pair_transition', P + P,
        'read pair(+res same tensor), write pair; the 4C intermediate '
        'stays VMEM (ops/transition.py)')
    add('outer_product_mean', 2 * S + P + P,
        'read seq, read residual pair, write pair')
    add('seq_track', 4 * S + P,
        'seq attention (reads pair for bias) + transition; seq tensors '
        'are ~1% of pair traffic')
    add('ipa_bias+values', ipa_layers * (P + b * ipa_heads * l * l * 4),
        f'{ipa_layers} layers x (read pair for bias proj + attend-over-'
        'pair; f32 weights tensor write/read in VMEM-blocked kernel '
        'counted as one (B,H,L,L) f32 surface)')
    add('ipa_scalar+heads', ipa_layers * 6 * S + 10 * S,
        'IPA scalar/point qkv + transitions + seq/plddt/atom heads '
        '(seq-major: small)')
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=4)
    p.add_argument('--length', type=int, default=288)
    p.add_argument('--passes', type=int, default=3,
                   help='trunk passes per diffusion step (2 recycles + 1)')
    p.add_argument('--measured_ms_per_step', type=float, default=None,
                   help='device ms/step from tools/profile_sampler.py to '
                        'compute the achieved fraction')
    args = p.parse_args()

    rows = ladder(args.batch, args.length)
    total_pass = sum(r[1] for r in rows)
    total_step = total_pass * args.passes
    floor_ms = total_step / V5E_HBM_BYTES_PER_S * 1e3

    print(f'{"op":24s} {"MB/pass":>9s} {"ms/step@819GB/s":>16s}')
    for name, bytes_, note in rows:
        ms = bytes_ * args.passes / V5E_HBM_BYTES_PER_S * 1e3
        print(f'{name:24s} {bytes_ / 2**20:9.1f} {ms:16.2f}   # {note}')
    out = {
        'batch': args.batch, 'length': args.length, 'passes': args.passes,
        'gb_per_pass': round(total_pass / 2**30, 3),
        'gb_per_step': round(total_step / 2**30, 3),
        'floor_ms_per_step': round(floor_ms, 2),
        'floor_batch_steps_per_sec': round(
            args.batch * 1e3 / floor_ms, 1),
    }
    if args.measured_ms_per_step:
        out['measured_ms_per_step'] = args.measured_ms_per_step
        out['achieved_fraction_of_floor'] = round(
            floor_ms / args.measured_ms_per_step, 3)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
