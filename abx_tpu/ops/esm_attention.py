"""Pallas TPU kernel: fused ESM2 self-attention.

The ESM2-3B conditioning pass is the dominant cost of the reference's real
configuration (3 passes per diffusion step).  Its matmuls run near MXU peak
under XLA, but the attention streams f32 logits+probs (B, 40, L, L) through
HBM four times per layer (~10 ms of each ~66 ms pass at B=4, L=306).

This kernel computes one (batch, head) attention entirely in VMEM — at
L~306, D=64 a whole head's q/k/v/logits fit comfortably (<1 MB), so there
is no need for flash-attention style KV blocking (the stock flash kernel
measured SLOWER here: padding to 128-multiples + per-block overhead).

Inference-only (no custom VJP); the module keeps the einsum path for
training and non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BIG_NEG = -1e9


def _kernel(q_ref, k_ref, v_ref, maskb_ref, out_ref):
    q = q_ref[0, 0]                       # (L, D), pre-scaled
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    maskb = maskb_ref[0]                  # (1, L) additive f32
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (L, L)
    logits = logits + maskb
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
    out = jax.lax.dot_general(
        probs, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (L, D)
    out_ref[0, 0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('interpret',))
def esm_attention(q, k, v, padding_mask, interpret: bool = False):
    """Fused per-head attention with key padding mask.

    Args:
        q, k, v: (B, H, L, D); q pre-scaled by D**-0.5 (and rotary applied).
        padding_mask: (B, L) bool/int, True/1 = PAD token.
    Returns: (B, H, L, D), dtype of q.
    """
    b, h, l, d = q.shape
    maskb = (padding_mask.astype(jnp.float32) * BIG_NEG)[:, None, :]
    spec = pl.BlockSpec((1, 1, l, d), lambda bb, hh: (bb, hh, 0, 0))
    return pl.pallas_call(
        _kernel,
        grid=(b, h),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((1, 1, l), lambda bb, hh: (bb, 0, 0))],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, l, d), q.dtype),
        interpret=interpret,
    )(q, k, v, maskb)


def esm_attention_reference(q, k, v, padding_mask):
    """Plain-XLA semantics twin (tests / fallback)."""
    logits = jnp.einsum('bhqd,bhkd->bhqk', q.astype(jnp.float32),
                        k.astype(jnp.float32))
    neg = padding_mask.astype(jnp.float32) * BIG_NEG
    probs = jax.nn.softmax(logits + neg[:, None, None, :], axis=-1)
    return jnp.einsum('bhqk,bhkd->bhqd', probs.astype(q.dtype),
                      v).astype(q.dtype)
