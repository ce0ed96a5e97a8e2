#!/usr/bin/env python
"""Round-5 TPU microbench: cheaper compaction glue.

(1) compact src-build: scatter(iota) [current, fusion ~7.25ms at 1.57M]
    vs sort-based (keys = dest, payload = iota).
(2) compacted->dense expand of [M,2]: gather-by-dest [current
    scatter_back, ~6.78ms at 1.57M] vs sorted-unique scatter.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

N = 1572864
M = 393216


def timeit(fn, *args, iters=8):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    rng = np.random.RandomState(0)
    valid = jnp.asarray(rng.rand(N) < 0.22)

    @jax.jit
    def src_scatter(valid):
        pos = jnp.cumsum(valid.astype(jnp.int32)) - 1
        keep = valid & (pos < M)
        dest = jnp.where(keep, pos, M)
        src = jnp.zeros((M,), jnp.int32).at[dest].set(
            jnp.arange(N, dtype=jnp.int32), mode='drop')
        return src, dest

    @jax.jit
    def src_sort(valid):
        pos = jnp.cumsum(valid.astype(jnp.int32)) - 1
        keep = valid & (pos < M)
        dest = jnp.where(keep, pos, M)
        keys = jnp.where(keep, dest, jnp.int32(N + 1))
        _, src_full = jax.lax.sort_key_val(
            keys, jnp.arange(N, dtype=jnp.int32), is_stable=False)
        return src_full[:M], dest

    s1, d1 = jax.device_get(src_scatter(valid)), None
    s2, d2 = jax.device_get(src_sort(valid)), None
    nv = int(np.minimum(np.sum(np.asarray(valid)), M))
    assert (s1[0][:nv] == s2[0][:nv]).all(), 'sort src mismatch'
    print('src_scatter ms', round(timeit(src_scatter, valid), 3))
    print('src_sort    ms', round(timeit(src_sort, valid), 3))

    vals = jnp.asarray(rng.rand(M, 2).astype(np.float32))
    src, dest = src_scatter(valid)
    src = src.block_until_ready()

    @jax.jit
    def expand_gather(vals, dest):
        mapped = dest < M
        g = jnp.take(vals, jnp.clip(dest, 0, M - 1), axis=0, mode='clip')
        return jnp.where(mapped[:, None], g, 0.0)

    @jax.jit
    def expand_scatter(vals, src):
        return jnp.zeros((N, vals.shape[1]), vals.dtype).at[src].set(
            vals, mode='drop', unique_indices=True,
            indices_are_sorted=True)

    g1 = np.asarray(expand_gather(vals, dest))
    g2 = np.asarray(expand_scatter(vals, src))
    # scatter writes slot values even for padded slots (src 0 dupes) —
    # compare on mapped rows only
    mapped = np.asarray(dest) < M
    assert np.allclose(g1[mapped], g2[mapped]), 'expand mismatch'
    print('expand_gather  ms', round(timeit(expand_gather, vals, dest), 3))
    print('expand_scatter ms', round(timeit(expand_scatter, vals, src), 3))

    vals6 = jnp.asarray(rng.rand(M, 6).astype(np.float32))
    print('expand6_gather  ms',
          round(timeit(expand_gather, vals6, dest), 3))
    print('expand6_scatter ms',
          round(timeit(expand_scatter, vals6, src), 3))


if __name__ == '__main__':
    main()
