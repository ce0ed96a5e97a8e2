#!/usr/bin/env python
"""Microbenchmark the step's hot non-Pallas ops to pick implementations.

Round-2 trace (data/profiles + CLAUDE.md): at 84ms/step the big non-kernel
costs are patch-atlas scatter-adds (~14.6ms), the occupancy binary query
(~7.2ms), and compact-space segment-sums/broadcasts (~6.5ms).  This tool
times candidate formulations of each on the real chip.

Usage: python scripts/microbench_hotops.py [group ...]
Groups: scatter, occ, segsum (default: all).
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=20, windows=3):
    out = fn(*args)
    jax_flat = [x for x in out] if isinstance(out, tuple) else [out]
    float(np.asarray(jax_flat[0]).reshape(-1)[0])
    best = float('inf')
    for w in range(windows):
        t0 = time.perf_counter()
        o = None
        for i in range(iters):
            o = fn(*args)
        flat = [x for x in o] if isinstance(o, tuple) else [o]
        float(np.asarray(flat[0]).reshape(-1)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def bench_scatter():
    import jax
    import jax.numpy as jnp
    print('== scatter-add: 131072 updates -> 49923-row atlas')
    n, rows = 131072, 49923
    rng = np.random.RandomState(0)
    # duplicate-heavy: runs of ~2-3 consecutive equal rows (samples along a
    # ray land in the same 4x4 patch) — mirrors the real index stream
    base = np.cumsum(rng.rand(n) < 0.45)
    idx_dup = (base * 9973 % rows).astype(np.int32)
    idx_unq = rng.permutation(max(rows, n))[:n].astype(np.int32) % rows

    for width in (576, 144):
        upd = jnp.asarray(rng.randn(n, width), jnp.bfloat16)
        atlas = jnp.zeros((rows, width), jnp.bfloat16)

        @jax.jit
        def scat(a, u, ix):
            return a.at[ix].add(u)

        @jax.jit
        def scat_pair(a, u, ix):
            # pairwise run-collapse: merge (2k, 2k+1) when rows equal,
            # then scatter the same count (dups halved, not compacted)
            u2 = u.reshape(n // 2, 2, width)
            i2 = ix.reshape(n // 2, 2)
            same = (i2[:, 0] == i2[:, 1])[:, None]
            merged = u2[:, 0] + jnp.where(same, u2[:, 1], 0)
            second = jnp.where(same, 0, u2[:, 1])
            uu = jnp.stack([merged, second], 1).reshape(n, width)
            return a.at[ix].add(uu)

        for name, ix in (('dup', jnp.asarray(idx_dup)),
                         ('unique', jnp.asarray(idx_unq))):
            ms = timeit(scat, atlas, upd, ix)
            print(f'  w={width} bf16 {name:6s}: {ms:7.3f} ms')
        ms = timeit(scat_pair, atlas, upd, jnp.asarray(idx_dup))
        print(f'  w={width} bf16 pair-collapse dup: {ms:7.3f} ms')
        upf = upd.astype(jnp.float32)
        atf = atlas.astype(jnp.float32)
        ms = timeit(scat, atf, upf, jnp.asarray(idx_dup))
        print(f'  w={width} f32  dup   : {ms:7.3f} ms')


def bench_occ():
    import jax
    import jax.numpy as jnp
    print('== occupancy query: 2048 rays x 440 candidates (901120 pts)')
    r = 128
    npts = 2048 * 440
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-1, 1, (npts, 3)), jnp.float32)
    binary = jnp.asarray(rng.rand(r, r, r) < 0.2)

    @jax.jit
    def q_bool(b, p):
        u = (p + 1.0) * 0.5
        inside = jnp.all((u >= 0) & (u < 1), -1)
        i = jnp.clip((u * r).astype(jnp.int32), 0, r - 1)
        flat = i[:, 0] * r * r + i[:, 1] * r + i[:, 2]
        return jnp.take(b.reshape(-1), flat, mode='clip') & inside

    @jax.jit
    def q_u8(b8, p):
        u = (p + 1.0) * 0.5
        inside = jnp.all((u >= 0) & (u < 1), -1)
        i = jnp.clip((u * r).astype(jnp.int32), 0, r - 1)
        flat = i[:, 0] * r * r + i[:, 1] * r + i[:, 2]
        return (jnp.take(b8.reshape(-1), flat, mode='clip') > 0) & inside

    @jax.jit
    def q_word(bw, p):
        u = (p + 1.0) * 0.5
        inside = jnp.all((u >= 0) & (u < 1), -1)
        i = jnp.clip((u * r).astype(jnp.int32), 0, r - 1)
        flat = i[:, 0] * r * r + i[:, 1] * r + i[:, 2]
        w = jnp.take(bw, flat // 32, mode='clip')
        bit = (w >> (flat % 32).astype(jnp.uint32)) & jnp.uint32(1)
        return (bit > 0) & inside

    b8 = binary.astype(jnp.uint8)
    bits = np.asarray(binary).reshape(-1)
    words = jnp.asarray(
        np.packbits(bits, bitorder='little').view(np.uint32))
    print(f'  pred gather : {timeit(q_bool, binary, pts):7.3f} ms')
    print(f'  u8 gather   : {timeit(q_u8, b8, pts):7.3f} ms')
    print(f'  u32-bit     : {timeit(q_word, words, pts):7.3f} ms')
    half = pts[:npts // 2]
    print(f'  u8 half-cand: {timeit(q_u8, b8, half):7.3f} ms')


def bench_segsum():
    import jax
    import jax.numpy as jnp
    print('== per-ray reductions over sorted compact samples (131072 -> 2048)')
    n, rn = 131072, 2048
    rng = np.random.RandomState(0)
    ray_id = jnp.asarray(np.sort(rng.randint(0, rn, n)).astype(np.int32))
    x8 = jnp.asarray(rng.randn(n, 8), jnp.float32)
    xs = [x8[:, i] for i in range(5)]

    @jax.jit
    def seg_separate(rid, *cols):
        return tuple(jax.ops.segment_sum(c, rid, num_segments=rn)
                     for c in cols)

    @jax.jit
    def seg_packed(rid, x):
        return jax.ops.segment_sum(x, rid, num_segments=rn)

    @jax.jit
    def seg_cumsum(rid, x):
        # sorted segments: seg_r = P[right_r] - P[left_r] with P the
        # 0-prefixed inclusive cumsum and left/right the ray's slot range
        # from one searchsorted pair (2048 queries over sorted ids)
        cs = jnp.cumsum(x, axis=0)
        p = jnp.concatenate([jnp.zeros((1, x.shape[1]), x.dtype), cs])
        qs = jnp.arange(rn, dtype=rid.dtype)
        left = jnp.searchsorted(rid, qs, side='left')
        right = jnp.searchsorted(rid, qs, side='right')
        return (jnp.take(p, right, axis=0, mode='clip')
                - jnp.take(p, left, axis=0, mode='clip'))

    @jax.jit
    def bcast_gather(rid, v):
        return jnp.take(v, rid, mode='clip')

    @jax.jit
    def bcast_scan(first, seed):
        # carry-last-valid associative scan: in compact_weights the seed is
        # computed per-sample (excl at ray-start slots), so broadcasting the
        # ray's start value needs NO per-ray array and no 131k-row gather
        def op(a, b):
            return (jnp.where(b[1], b[0], a[0]), a[1] | b[1])

        out, _ = jax.lax.associative_scan(op, (seed, first))
        return out

    print(f'  5x separate segment_sum : '
          f'{timeit(seg_separate, ray_id, *xs):7.3f} ms')
    print(f'  1x packed [n,8] seg_sum : {timeit(seg_packed, ray_id, x8):7.3f} ms')
    print(f'  cumsum+boundary [n,8]   : {timeit(seg_cumsum, ray_id, x8):7.3f} ms')
    v = jnp.asarray(rng.randn(rn), jnp.float32)
    first = jnp.asarray(np.concatenate(
        [[True], np.asarray(ray_id)[1:] != np.asarray(ray_id)[:-1]]))
    seed = jnp.asarray(rng.randn(n), jnp.float32) * first
    print(f'  bcast ray->sample gather: {timeit(bcast_gather, ray_id, v):7.3f} ms')
    print(f'  carry-last-valid scan   : {timeit(bcast_scan, first, seed):7.3f} ms')


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    groups = sys.argv[1:] or ['scatter', 'occ', 'segsum']
    for g in groups:
        {'scatter': bench_scatter, 'occ': bench_occ,
         'segsum': bench_segsum}[g]()


if __name__ == '__main__':
    main()
