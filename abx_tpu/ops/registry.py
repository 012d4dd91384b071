"""Kernel dispatch switches.

Pallas kernels are opt-in per op: XLA's stock lowering is already strong for
several of these (measured: the triangle einsum hits ~72% of bf16 peak on
v5e), so kernels default off and are enabled via environment variables for
benchmarking or when profiling shows a win on the target topology.
"""

from __future__ import annotations

import os


def use_pallas_triangle() -> bool:
    """Pallas triangle contraction: default OFF — XLA's einsum is ~72% of
    bf16 peak here already, and at production shape (B=4, L=288, C=128)
    the tile-128 kernel exceeds the 128 MB VMEM capacity inside the full
    sampler program (measured: 128.68M/128M).  Round-3 retry with channel
    blocking (tile=96, c_block=128, 100 MB scoped limit): compiles, but
    35.0 vs 39.8 batch-steps/s at num_t=20 — the in-VMEM (C, I, K)
    operand transposes cost more than the HBM layout copies they
    replace."""
    return os.environ.get('ABX_PALLAS_TRIANGLE', '0') == '1'


def use_fused_tri_attention() -> bool:
    """Fused triangle attention (measured 1.6x vs XLA at L=288 on v5e).

    Default ON for inference; the einsum path remains for training (the
    kernel has no custom VJP) and non-TPU backends.
    """
    return os.environ.get('ABX_FUSED_TRI_ATTN', '1') == '1'


def use_fused_transition() -> bool:
    """Fused pair-transition block (LN+MLP+residual in one VMEM pass).

    Inference-only (no custom VJP); TPU backend only."""
    return os.environ.get('ABX_FUSED_TRANSITION', '1') == '1'


def use_flash_esm() -> bool:
    """Pallas flash attention for the ESM2 conditioning path (TPU only).

    Default OFF: measured SLOWER than the XLA einsum path at this workload
    (B=4, L=306 padded to 384, 40 heads x 64: 11.1 vs 13.8 steps/s ESM-on)
    — the antibody context is short enough that logits fit comfortably and
    the flash kernel's padding + per-block overhead dominates.  Revisit for
    long-antigen configurations (L >= 1k)."""
    return os.environ.get('ABX_FLASH_ESM', '0') == '1'


def use_fused_trimult() -> bool:
    """Fused triangle-multiplication pre/post blocks (inference, TPU)."""
    return os.environ.get('ABX_FUSED_TRIMULT', '1') == '1'


def use_trimult_c_major() -> bool:
    """Channel-major triangle-multiplication data path: tri_mult_pre emits
    (B, nc, R, L) operands (one in-VMEM transpose per element inside the
    kernel), the contraction einsum runs in XLA's native C-batched GEMM
    layout with no transpose copies, and tri_mult_post consumes the GEMM's
    (B, nc, I, J) output directly.  Targeted the ~7 ms/step of two-hop HBM
    layout copies around the contraction (round-4 profile, B=4, L=288).

    Default OFF: measured NET NEGATIVE on v5e (tools/probe_cmajor.py,
    B=4, L=288, C=192, nc=128, bf16).  Mosaic's in-VMEM 3D transpose costs
    +2.6 ms/call on the pre kernel (x6 calls/step) and VMEM-OOMs the post
    kernel at production shape, while the c-major contraction GEMM itself
    is layout-neutral (4.9-5.1 ms either orientation).  Same conclusion as
    the round-3 channel-blocked pallas contraction: on TPU the HBM
    transpose copies are cheaper than any in-kernel relayout.  Kept
    (tested, interpret-mode) as a documented negative result."""
    return os.environ.get('ABX_TRIMULT_C_MAJOR', '0') == '1'


def use_fused_esm_attention() -> bool:
    """Per-(batch, head) VMEM-resident ESM attention kernel (TPU
    inference).  Default OFF: measured 13.05 vs 13.83 steps/s ESM-on
    against the XLA einsum path at B=4, L=306 — the per-(b, h) grid (160
    programs x 36 layers) overhead outweighs the logits HBM saving at this
    context length; XLA's own softmax fusions are already adequate.  Like
    ABX_FLASH_ESM, revisit for long-context configurations."""
    return os.environ.get('ABX_FUSED_ESM_ATTN', '0') == '1'


def use_ipa_attend_kernel() -> bool:
    """Row-blocked IPA attend-over-pair kernel (TPU inference)."""
    return os.environ.get('ABX_IPA_ATTEND', '1') == '1'


def use_packed_seq_attn() -> bool:
    """Packed seq-track attention: reuses the packed triangle-attention
    kernel at R=1 (LN + per-head q/k/v proj + biased softmax + gate +
    out-proj + residual in one VMEM pass).  TPU inference only."""
    return os.environ.get('ABX_PACKED_SEQ_ATTN', '1') == '1'


def use_fused_ipa_attention() -> bool:
    """Fully fused IPA attention (logits + softmax + all three attends in
    one VMEM pass, ops/ipa_attention.py) — supersedes the attend-only
    kernel when ON; the (B, H, L, L) logits/probs never exist in HBM.
    TPU inference only."""
    return os.environ.get('ABX_FUSED_IPA_ATTN', '1') == '1'


def use_gate_proj_kernel() -> bool:
    """Fused attention epilogue (gate -> proj -> +residual).  Default OFF:
    XLA already fuses the sigmoid-gate into the projection's operand
    prologue and the residual add into its epilogue, so the kernel only
    adds dispatch overhead (measured 46.5 vs 48.4 steps/s)."""
    return os.environ.get('ABX_GATE_PROJ_KERNEL', '0') == '1'


def use_fused_recycle_embed() -> bool:
    """Fused pair-track recycling assembly: concat(static, t) +
    LN(prev_pair) + dgram-table[bins] in one VMEM pass (TPU inference).
    Replaces ~10 ms/step of gather + LN reductions + add traversals of the
    127 MB pair tensor (round-3 profile)."""
    return os.environ.get('ABX_FUSED_RECYCLE', '1') == '1'


def use_tri_attn_ln_fold() -> bool:
    """Fold the triangle-attention input LayerNorm + sigmoid output gate
    into the packed row kernel (both orientations; the bias comes from
    pair_bias_proj in transposed layout).  The normalised 127 MB pair
    tensor never exists in HBM; only orientation transposes, out-proj and
    the residual remain in XLA."""
    return os.environ.get('ABX_TRI_ATTN_LN_FOLD', '1') == '1'


def use_fused_pair_bias() -> bool:
    """Fused seq-attention pair-bias projection (LN -> C->H in one VMEM
    pass; the LN'd pair tensor never materialises — ~3 ms/step, round-3
    profile)."""
    return os.environ.get('ABX_FUSED_PAIR_BIAS', '1') == '1'


def esm_gelu_barrier() -> bool:
    """MEASURED NET-NEGATIVE, default off (round-5 A/B, B=4 num_t=20):
    15.69 batch-steps/s vs 17.95 baseline (-12.6%).  Splitting the
    exact-GELU erf out of the fc1 dot's epilogue fusion (fc1 profiles at
    ~76% MXU vs ~94% for qkv/fc2) costs an extra HBM round trip of the
    (B, 306, 10240) tensor per layer-pass (~5.4 GB/step) that outweighs
    the epilogue penalty."""
    return os.environ.get('ABX_ESM_GELU_BARRIER', '0') == '1'


def esm_fc1_slice_barrier() -> bool:
    """MEASURED NET-NEGATIVE, default off (round-5 A/B, B=4 num_t=20):
    16.04 batch-steps/s vs 17.95 baseline (-10.6%).  Materialising the
    scan-sliced (2560, 10240) fc1 weight before its dot adds a 52 MB
    copy per layer-pass (~11 GB/step) that exceeds the fused-slice GEMM
    penalty; XLA's fused form is the optimum here."""
    return os.environ.get('ABX_ESM_FC1_SLICE_BARRIER', '0') == '1'


def use_trimult_gatefold() -> bool:
    """MEASURED A WASH, default off (round-5 A/B, B=4 num_t=20,
    back-to-back): 46.89 batch-steps/s vs 47.63 baseline (-1.6%, inside
    tunnel spread).  Recomputing the tri-mult final gate inside
    tri_mult_post from the residual (already VMEM-resident for the +res
    epilogue) removes one full pair-tensor write + read per instance
    (~1.5 GB/step, ~1.9 ms/step byte floor), but the in-VMEM LN + (C, C)
    projection serialises with the block pipeline and eats the saving —
    consistent with the floor note's conclusion that the remaining gap is
    achieved-bandwidth, not missing fusions.  Kept (interpret-tested,
    `test_gatefold_path_matches_emitted_fgate`) as a documented neutral
    result."""
    return os.environ.get('ABX_TRIMULT_GATEFOLD', '0') == '1'
