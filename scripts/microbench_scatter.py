#!/usr/bin/env python
"""Lean scatter-add microbench: the dP patch-cotangent scatter shape
([131k,576] updates -> [49923,576] atlas, 10.6 ms/step in the round-3
trace) under index orderings and dtypes.  Indices are prepared on the
HOST (no in-graph sort — vmapped sort/searchsorted compile too slowly
through the tunnel; that sank the fuller microbench_r3 run).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args_list, iters=8, windows=3):
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

    n, rows, c = 131072, 49923, 576
    rng = np.random.RandomState(0)
    idx_rand = rng.randint(0, rows, (n,)).astype(np.int32)
    idx_sort = np.sort(idx_rand)
    # ray-coherent: runs of ~8 consecutive-ish rows (samples along a ray)
    base = rng.randint(0, rows - 16, (n // 8,)).astype(np.int32)
    idx_coh = (base[:, None] + rng.randint(0, 16, (n // 8, 8))).reshape(-1)
    idx_coh = idx_coh.astype(np.int32)

    for dt, name in ((jnp.bfloat16, 'bf16'), (jnp.float32, 'f32 ')):
        upds = [jnp.asarray(rng.randn(n, c).astype(np.float32)).astype(dt)
                for _ in range(3)]

        def make(idx):
            ix = jnp.asarray(idx)

            @jax.jit
            def f(u):
                z = jnp.zeros((rows, c), u.dtype)
                return z.at[ix].add(u)
            return f

        for iname, idx in (('rand  ', idx_rand), ('sorted', idx_sort),
                           ('cohrnt', idx_coh)):
            ms = timeit(make(idx), [(u,) for u in upds])
            print(f'  scatter {name} {iname}: {ms:7.2f} ms', flush=True)

    # gather reference at the same shape
    tab = jnp.asarray(rng.randn(rows, c).astype(np.float32))
    for iname, idx in (('rand  ', idx_rand), ('sorted', idx_sort)):
        ix = jnp.asarray(idx)
        f = jax.jit(lambda t: jnp.take(t, ix, axis=0, mode='clip'))
        ms = timeit(f, [(tab,), (tab + 1,), (tab + 2,)])
        print(f'  gather  f32  {iname}: {ms:7.2f} ms', flush=True)


if __name__ == '__main__':
    main()
