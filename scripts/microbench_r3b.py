#!/usr/bin/env python
"""Round-3 microbenches, tunnel-safe protocol.

The axon tunnel costs ~1s per dispatched call, so ops are repeated
IN-GRAPH (sequential data dependence, varied inputs to defeat CSE) and
timed as the difference between a long and a short chain:
    per_op_ms = (t(chain_long) - t(chain_short)) / (long - short)
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(make_fn, args, short=2, long_=12, windows=3):
    import jax
    f_s = make_fn(short)
    f_l = make_fn(long_)
    # warm both
    jax.block_until_ready(f_s(*args))
    jax.block_until_ready(f_l(*args))
    best = 1e9
    for _ in range(windows):
        t0 = time.perf_counter()
        r = f_s(*args)
        float(jax.tree_util.tree_leaves(r)[0].reshape(-1)[0])
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = f_l(*args)
        float(jax.tree_util.tree_leaves(r)[0].reshape(-1)[0])
        tl = time.perf_counter() - t0
        best = min(best, (tl - ts) / (long_ - short))
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    N = 131072
    rng = np.random.RandomState(0)

    # ------------------------------------------------------------------
    print('== scatter-add [131k,576] -> [49923,576] ==', flush=True)
    R = 49923
    upd = jnp.asarray(rng.randn(N, 576).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, R, (N,)).astype(np.int32))
    idx_coh = jnp.asarray(np.clip(
        np.repeat(rng.randint(0, R, (N // 64,)), 64)
        + rng.randint(-2, 3, (N,)), 0, R - 1).astype(np.int32))

    def make_scat(dtype, sort=False):
        def mk(n):
            @jax.jit
            def f(u, ix):
                acc = jnp.zeros((R, 576), jnp.float32)
                for i in range(n):
                    ui = (u + float(i)).astype(dtype)
                    ixi = jnp.minimum(ix + i, R - 1)
                    if sort:
                        order = jnp.argsort(ixi)
                        ixi = ixi[order]
                        ui = ui[order]
                    z = jnp.zeros((R, 576), dtype)
                    z = z.at[ixi].add(ui, indices_are_sorted=sort)
                    acc = acc + z.astype(jnp.float32)
                return acc
            return f
        return mk

    for name, mk, ix in [
            ('bf16 rand     ', make_scat(jnp.bfloat16), idx),
            ('f32  rand     ', make_scat(jnp.float32), idx),
            ('f32  coherent ', make_scat(jnp.float32), idx_coh),
            ('f32  sorted   ', make_scat(jnp.float32, True), idx),
    ]:
        try:
            ms = chain_time(mk, (upd, ix), short=1, long_=5)
            print(f'  {name}: {ms:.3f} ms', flush=True)
        except Exception as e:
            print(f'  {name}: FAIL {type(e).__name__}', flush=True)

    # ------------------------------------------------------------------
    print('== occ pred gather: 901k lookups from 128^3 ==', flush=True)
    M = 901120
    G = 2097152
    occ_bits = rng.rand(G) > 0.7
    gidx = jnp.asarray(rng.randint(0, G, (M,)).astype(np.int32))

    def make_gather(tab):
        def mk(n):
            @jax.jit
            def f(t, ix):
                acc = jnp.zeros((M,), jnp.float32)
                for i in range(n):
                    g = jnp.take(t, jnp.minimum(ix + i, G - 1), axis=0,
                                 mode='clip')
                    acc = acc + g.astype(jnp.float32)
                return acc
            return f
        return mk, tab

    for name, tab in [
            ('pred[2M]', jnp.asarray(occ_bits)),
            ('u8[2M]  ', jnp.asarray(occ_bits.astype(np.uint8))),
            ('bf16[2M]', jnp.asarray(occ_bits.astype(np.float32))
             .astype(jnp.bfloat16)),
            ('f32[2M] ', jnp.asarray(occ_bits.astype(np.float32))),
    ]:
        try:
            mk, t = make_gather(tab)
            ms = chain_time(mk, (t, gidx), short=2, long_=8)
            print(f'  {name}: {ms:.3f} ms', flush=True)
        except Exception as e:
            print(f'  {name}: FAIL {type(e).__name__}: {e}'[:200], flush=True)

    # int32 word + bit extract: 8 z-cells per word -> same rows, fewer bits
    occ_words = np.zeros(G // 32, np.int32)
    for b in range(32):
        occ_words |= occ_bits[b::32].astype(np.int32) << b
    wtab = jnp.asarray(occ_words)

    def mk_words(n):
        @jax.jit
        def f(t, ix):
            acc = jnp.zeros((M,), jnp.float32)
            for i in range(n):
                ixi = jnp.minimum(ix + i, G - 1)
                w = jnp.take(t, ixi // 32, axis=0, mode='clip')
                bit = (w >> (ixi % 32)) & 1
                acc = acc + bit.astype(jnp.float32)
            return acc
        return f

    try:
        ms = chain_time(mk_words, (wtab, gidx), short=2, long_=8)
        print(f'  s32-word bitfield: {ms:.3f} ms', flush=True)
    except Exception as e:
        print(f'  s32-word bitfield: FAIL {type(e).__name__}', flush=True)


if __name__ == '__main__':
    main()
