"""Micro-probe: c-major tri_mult_pre/post vs row-major + XLA transposes.

Times each variant at production shape (B=4, L=288, C=192, nc=128, bf16)
on the real chip.  Varies one input per rep (the axon remote layer caches
identical dispatches).  Usage: python tools/probe_cmajor.py [pre|post|all]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, args_per_rep, reps=6):
    out = fn(*args_per_rep(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(*args_per_rep(i + 1))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    b, l, c, nc = 4, 288, 192, 128
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(b, l, l, c), jnp.bfloat16)
    scale = jnp.ones((c,), jnp.float32)
    bias = jnp.zeros((c,), jnp.float32)
    w = jnp.asarray(0.05 * rng.randn(c, 4 * nc + c), jnp.bfloat16)
    wb = jnp.zeros((4 * nc + c,), jnp.float32)
    mask = jnp.ones((b, l), jnp.float32)
    bump = [x0 + 0.001 * i for i in range(8)]

    from abx_tpu.ops.tri_mult import tri_mult_post, tri_mult_pre

    if which in ('pre', 'all'):
        f_row = jax.jit(lambda x: tri_mult_pre(x, scale, bias, w, wb, mask))
        ms = timeit(f_row, lambda i: (bump[i % 8],))
        print(f'pre row-major:              {ms:7.3f} ms')

        def row_then_t(x):
            lft, rgt, fg = tri_mult_pre(x, scale, bias, w, wb, mask)
            return (jnp.transpose(lft, (0, 3, 1, 2)),
                    jnp.transpose(rgt, (0, 3, 1, 2)), fg)
        ms = timeit(jax.jit(row_then_t), lambda i: (bump[i % 8],))
        print(f'pre row-major + XLA T:      {ms:7.3f} ms')

        f_cm = jax.jit(lambda x: tri_mult_pre(x, scale, bias, w, wb, mask,
                                              c_major=True))
        ms = timeit(f_cm, lambda i: (bump[i % 8],))
        print(f'pre c-major (in-kernel T):  {ms:7.3f} ms')

    if which in ('post', 'all'):
        y0 = jnp.asarray(rng.randn(b, l, l, nc), jnp.bfloat16)
        ycm0 = jnp.transpose(y0, (0, 3, 1, 2))
        fscale = jnp.ones((nc,), jnp.float32)
        fbias = jnp.zeros((nc,), jnp.float32)
        wout = jnp.asarray(0.05 * rng.randn(nc, c), jnp.bfloat16)
        bout = jnp.zeros((c,), jnp.float32)
        fg = jnp.asarray(rng.randn(b, l, l, c), jnp.bfloat16)
        ybump = [y0 + 0.001 * i for i in range(8)]
        ycbump = [ycm0 + 0.001 * i for i in range(8)]

        f_row = jax.jit(lambda y: tri_mult_post(y, fscale, fbias, wout,
                                                bout, fg, x0))
        ms = timeit(f_row, lambda i: (ybump[i % 8],))
        print(f'post row-major:             {ms:7.3f} ms')

        def cm_xla_t(y):
            return tri_mult_post(jnp.transpose(y, (0, 2, 3, 1)), fscale,
                                 fbias, wout, bout, fg, x0)
        ms = timeit(jax.jit(cm_xla_t), lambda i: (ycbump[i % 8],))
        print(f'post c-major via XLA T:     {ms:7.3f} ms')

        try:
            f_cm = jax.jit(lambda y: tri_mult_post(y, fscale, fbias, wout,
                                                   bout, fg, x0,
                                                   y_c_major=True))
            ms = timeit(f_cm, lambda i: (ycbump[i % 8],))
            print(f'post c-major (in-kernel T): {ms:7.3f} ms')
        except Exception as e:  # VMEM OOM expected at this shape
            print(f'post c-major (in-kernel T): FAILED '
                  f'{str(e).splitlines()[0][:120]}')

    if which in ('einsum', 'all'):
        from abx_tpu.ops.triangle import (triangle_multiply_c_major,
                                          triangle_multiply_einsum)
        lft = jnp.asarray(rng.randn(b, l, l, nc), jnp.bfloat16)
        rgt = jnp.asarray(rng.randn(b, l, l, nc), jnp.bfloat16)
        lcm, rcm = (jnp.transpose(t, (0, 3, 1, 2)) for t in (lft, rgt))
        lb = [lft + 0.001 * i for i in range(8)]
        lcb = [lcm + 0.001 * i for i in range(8)]
        for per_row in (True, False):
            f = jax.jit(lambda a: triangle_multiply_einsum(
                a, rgt, per_row=per_row))
            ms = timeit(f, lambda i: (lb[i % 8],))
            print(f'einsum row-major  per_row={per_row}: {ms:7.3f} ms')
            f = jax.jit(lambda a: triangle_multiply_c_major(
                a, rcm, per_row=per_row))
            ms = timeit(f, lambda i: (lcb[i % 8],))
            print(f'einsum c-major    per_row={per_row}: {ms:7.3f} ms')


if __name__ == '__main__':
    main()
