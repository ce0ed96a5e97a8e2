#!/usr/bin/env python
"""Microbench the stage-2 sphere-trace cost drivers in isolation.

The round-3 material trace shows ~10.9 ms per fine-trace iteration at
1.05M rays ([1.05M,8] bf16 gather from a 16.7M-row table + trilinear
body inside a fori_loop) — ~10 ns/row vs the 3.5 ns/row of stage-1's
wide gathers.  This isolates: raw narrow gather, gather-in-fori, the
[N,1] column-layout carries, and the 4^3-block-row alternative
(one 64-value row + hat-weight trilinear, multi-step capable).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args_list, iters=6, windows=3):
    import jax
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    best = float('inf')
    for w in range(windows):
        t0 = time.perf_counter()
        last = None
        for i in range(iters):
            last = fn(*args_list[(w * iters + i) % len(args_list)])
        leaf = jax.tree_util.tree_leaves(last)[0]
        float(leaf.reshape(-1)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    n = 1048576
    r = 256
    rows = jnp.asarray(
        np.random.RandomState(0).randn(r ** 3, 8).astype(np.float32)
    ).astype(jnp.bfloat16)
    rng = np.random.RandomState(1)
    o_np = rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    d_np = rng.randn(n, 3).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=-1, keepdims=True)
    os_ = [jnp.asarray(o_np + 0.001 * i) for i in range(3)]
    d = jnp.asarray(d_np)

    def cell_index(p):
        u = jnp.clip((p + 1.0) * 0.5 * (r - 1), 0.0, r - 2.0)
        v = jnp.floor(u)
        i = v.astype(jnp.int32)
        f = u - v
        idx = (i[:, 0] * r + i[:, 1]) * r + i[:, 2]
        return idx, f

    def tap_r(rows, p):
        idx, f = cell_index(p)
        rw = jnp.take(rows, idx, axis=0, mode='clip').astype(jnp.float32)
        w = jnp.stack([
            (1 - f[:, 0]) * (1 - f[:, 1]) * (1 - f[:, 2]),
            (1 - f[:, 0]) * (1 - f[:, 1]) * f[:, 2],
            (1 - f[:, 0]) * f[:, 1] * (1 - f[:, 2]),
            (1 - f[:, 0]) * f[:, 1] * f[:, 2],
            f[:, 0] * (1 - f[:, 1]) * (1 - f[:, 2]),
            f[:, 0] * (1 - f[:, 1]) * f[:, 2],
            f[:, 0] * f[:, 1] * (1 - f[:, 2]),
            f[:, 0] * f[:, 1] * f[:, 2]], -1)
        return jnp.sum(rw * w, -1)

    # tables are jit ARGUMENTS — closed-over they become HLO constants
    # and the tunnel rejects the upload (HTTP 413, CLAUDE.md)
    # 1. one isolated tap (gather + trilinear), chained x8 varied
    @jax.jit
    def chain8(rows, o):
        t = jnp.zeros((n,))
        for _ in range(8):
            t = t + 0.01 * tap_r(rows, o + d * t[:, None]) + 0.01
        return t
    ms = timeit(chain8, [(rows, o) for o in os_])
    print(f'  8 chained taps, flat [N] carry : {ms:8.2f} ms '
          f'({ms / 8:.2f}/tap)', flush=True)

    # 2. same inside fori_loop
    @jax.jit
    def fori8(rows, o):
        def body(_, t):
            return t + 0.01 * tap_r(rows, o + d * t[:, None]) + 0.01
        return jax.lax.fori_loop(0, 8, body, jnp.zeros((n,)))
    ms = timeit(fori8, [(rows, o) for o in os_])
    print(f'  8-iter fori,     flat [N] carry: {ms:8.2f} ms '
          f'({ms / 8:.2f}/tap)', flush=True)

    # 3. fori with [N,1] column carry (current sphere_trace shape)
    @jax.jit
    def fori8_col(rows, o):
        def body(_, t):
            return t + 0.01 * tap_r(rows, o + d * t)[:, None] + 0.01
        return jax.lax.fori_loop(0, 8, body, jnp.zeros((n, 1)))
    ms = timeit(fori8_col, [(rows, o) for o in os_])
    print(f'  8-iter fori,   [N,1] col carry : {ms:8.2f} ms '
          f'({ms / 8:.2f}/tap)', flush=True)

    # 4. block rows: stride-3 4^3 corner blocks, hat-weight trilinear
    rb = (r + 2) // 3
    brows = jnp.asarray(
        np.random.RandomState(2).randn(rb ** 3, 64).astype(np.float32)
    ).astype(jnp.bfloat16)

    def block_tap(brows, p):
        u = jnp.clip((p + 1.0) * 0.5 * (r - 1), 0.0, r - 1.001)
        bi = jnp.minimum((u / 3.0).astype(jnp.int32), rb - 1)
        idx = (bi[:, 0] * rb + bi[:, 1]) * rb + bi[:, 2]
        rw = jnp.take(brows, idx, axis=0, mode='clip').astype(jnp.float32)
        loc = u - bi.astype(u.dtype) * 3.0          # in [0,3)
        ws = []
        for ax in range(3):
            ks = jnp.arange(4.0)
            ws.append(jnp.maximum(0.0, 1.0 - jnp.abs(loc[:, ax:ax + 1] - ks)))
        w = (ws[0][:, :, None, None] * ws[1][:, None, :, None]
             * ws[2][:, None, None, :]).reshape(n, 64)
        return jnp.sum(rw * w, -1)

    @jax.jit
    def fori8_block(brows, o):
        def body(_, t):
            return t + 0.01 * block_tap(brows, o + d * t[:, None]) + 0.01
        return jax.lax.fori_loop(0, 8, body, jnp.zeros((n,)))
    ms = timeit(fori8_block, [(brows, o) for o in os_])
    print(f'  8-iter fori,   block-row tap   : {ms:8.2f} ms '
          f'({ms / 8:.2f}/tap)', flush=True)

    # 5. block gather + 3 hat-trilinear micro-steps per gather
    @jax.jit
    def fori8_block3(brows, o):
        def body(_, t):
            p = o + d * t[:, None]
            u = jnp.clip((p + 1.0) * 0.5 * (r - 1), 0.0, r - 1.001)
            bi = jnp.minimum((u / 3.0).astype(jnp.int32), rb - 1)
            idx = (bi[:, 0] * rb + bi[:, 1]) * rb + bi[:, 2]
            rw = jnp.take(brows, idx, axis=0,
                          mode='clip').astype(jnp.float32)
            for _ in range(3):                       # micro-steps
                u = jnp.clip((o + d * t[:, None] + 1.0) * 0.5 * (r - 1),
                             0.0, r - 1.001)
                loc = u - bi.astype(u.dtype) * 3.0
                ws = []
                for ax in range(3):
                    ks = jnp.arange(4.0)
                    ws.append(jnp.maximum(
                        0.0, 1.0 - jnp.abs(loc[:, ax:ax + 1] - ks)))
                w = (ws[0][:, :, None, None] * ws[1][:, None, :, None]
                     * ws[2][:, None, None, :]).reshape(n, 64)
                sd = jnp.sum(rw * w, -1)
                t = t + 0.01 * sd + 0.01
            return t
        return jax.lax.fori_loop(0, 8, body, jnp.zeros((n,)))
    ms = timeit(fori8_block3, [(brows, o) for o in os_])
    print(f'  8-iter fori, block + 3 microsteps: {ms:6.2f} ms '
          f'({ms / 24:.2f}/step-equiv)', flush=True)


if __name__ == '__main__':
    main()
