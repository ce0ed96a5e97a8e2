#!/usr/bin/env python
"""Round-3 TPU microbenches for the step's measured hot spots.

Targets (from the round-3 trace of the bench step, /tmp/prof_r3):
  1. Mosaic tpu.dynamic_gather via jnp.take_along_axis inside Pallas —
     correctness across vreg boundaries + speed (feasibility of the
     in-kernel windowed gather design).
  2. Plane patch scatter-add variants (fusion.26-28, 10.6 ms/step):
     bf16 vs f32 target, pre-sorted indices.
  3. Occ binary-march predicate gather (fusion.2, 7.25 ms/step):
     1-bit-packed pred table vs u8 / bf16 / f32 flat tables.

Timing protocol (CLAUDE.md): chained varied-input calls, host fetch,
best-of-several windows.
"""
import sys
import os
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=20, windows=3):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(windows):
        t0 = time.perf_counter()
        acc = None
        for i in range(iters):
            acc = fn(*args)
        leaf = jax.tree_util.tree_leaves(acc)[0]
        float(leaf.reshape(-1)[0])
        dt = (time.perf_counter() - t0) / iters
        best = min(best, dt)
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    N = 131072
    rng = np.random.RandomState(0)

    # ------------------------------------------------------------------
    # 1. dynamic_gather inside Pallas
    # ------------------------------------------------------------------
    print('== dynamic_gather (sublane, axis=0) ==', flush=True)
    TN = 256
    for lanes in (128, 512, 1280):
        table = rng.randn(TN, lanes).astype(np.float32)
        idx = rng.randint(0, TN, (TN,)).astype(np.int32)

        def kern(t_ref, i_ref, o_ref):
            ii = jnp.broadcast_to(i_ref[:][:, :1], t_ref.shape)
            o_ref[:] = jnp.take_along_axis(t_ref[:], ii, axis=0)

        @jax.jit
        def run(t, i):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((TN, lanes), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(t, i)

        try:
            out = np.asarray(run(table, idx[:, None]))
            ok = np.allclose(out, table[idx])
            ms = timeit(run, table, idx[:, None])
            print(f'  lanes={lanes}: ok={ok} {ms:.4f} ms', flush=True)
        except Exception as e:
            print(f'  lanes={lanes}: FAIL {type(e).__name__}: {e}',
                  flush=True)

    print('== dynamic_gather grid version: 512 tiles x [256,1280] ==',
          flush=True)
    lanes = 1280
    tiles = 512
    table = rng.randn(TN, lanes).astype(np.float32)
    idxs = rng.randint(0, TN, (tiles * TN, 1)).astype(np.int32)

    def kern_g(t_ref, i_ref, o_ref):
        ii = jnp.broadcast_to(i_ref[:], (TN, lanes))
        o_ref[:] = jnp.take_along_axis(t_ref[:], ii, axis=0)

    @jax.jit
    def run_g(t, i):
        return pl.pallas_call(
            kern_g, grid=(tiles,),
            in_specs=[pl.BlockSpec((TN, lanes), lambda t_: (0, 0)),
                      pl.BlockSpec((TN, 1), lambda t_: (t_, 0))],
            out_specs=pl.BlockSpec((TN, lanes), lambda t_: (t_, 0)),
            out_shape=jax.ShapeDtypeStruct((tiles * TN, lanes), jnp.float32),
        )(t, i)

    try:
        out = np.asarray(run_g(table, idxs))
        ok = np.allclose(out[:TN], table[idxs[:TN, 0]])
        ms = timeit(run_g, table, idxs, iters=5)
        print(f'  512x[256,1280] f32: ok={ok} {ms:.3f} ms '
              f'(bench kernel would need ~4-8 of these)', flush=True)
    except Exception as e:
        print(f'  FAIL {type(e).__name__}: {e}', flush=True)

    # lane gather (axis=1)
    print('== dynamic_gather (lane, axis=1) ==', flush=True)
    for lanes in (128, 512):
        table = rng.randn(TN, lanes).astype(np.float32)
        idx = rng.randint(0, lanes, (TN, lanes)).astype(np.int32)

        def kern2(t_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

        @jax.jit
        def run2(t, i):
            return pl.pallas_call(
                kern2,
                out_shape=jax.ShapeDtypeStruct((TN, lanes), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(t, i)

        try:
            out = np.asarray(run2(table, idx))
            ref = np.take_along_axis(table, idx, axis=1)
            ok = np.allclose(out, ref)
            ms = timeit(run2, table, idx)
            print(f'  lanes={lanes}: ok={ok} {ms:.4f} ms', flush=True)
        except Exception as e:
            print(f'  lanes={lanes}: FAIL {type(e).__name__}: {e}',
                  flush=True)

    # bf16 sublane gather
    print('== dynamic_gather sublane bf16 ==', flush=True)
    table = rng.randn(TN, 1280).astype(np.float32)
    idx = rng.randint(0, TN, (TN, 1)).astype(np.int32)

    def kern3(t_ref, i_ref, o_ref):
        ii = jnp.broadcast_to(i_ref[:], t_ref.shape)
        o_ref[:] = jnp.take_along_axis(t_ref[:], ii, axis=0)

    @jax.jit
    def run3(t, i):
        return pl.pallas_call(
            kern3,
            out_shape=jax.ShapeDtypeStruct((TN, 1280), jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t.astype(jnp.bfloat16), i)

    try:
        out = np.asarray(run3(table, idx)).astype(np.float32)
        ok = np.allclose(out, table.astype(jnp.bfloat16)[idx[:, 0]]
                         .astype(np.float32))
        ms = timeit(run3, table, idx)
        print(f'  bf16 lanes=1280: ok={ok} {ms:.4f} ms', flush=True)
    except Exception as e:
        print(f'  FAIL {type(e).__name__}: {e}', flush=True)

    # ------------------------------------------------------------------
    # 2. scatter-add variants (the plane patch VJP)
    # ------------------------------------------------------------------
    print('== scatter-add [131k,576] -> [49923,576] ==', flush=True)
    R = 49923
    upd_f32 = rng.randn(N, 576).astype(np.float32)
    idx = rng.randint(0, R, (N,)).astype(np.int32)
    # ray-coherent index pattern (consecutive samples nearby rows)
    idx_coh = np.clip(np.repeat(rng.randint(0, R, (N // 64,)), 64)
                      + rng.randint(-2, 3, (N,)), 0, R - 1).astype(np.int32)

    def scat(tgt_dtype, upd_dtype, sort=False):
        @jax.jit
        def f(u, ix):
            u = u.astype(upd_dtype)
            if sort:
                order = jnp.argsort(ix)
                ix = ix[order]
                u = u[order]
            z = jnp.zeros((R, 576), tgt_dtype)
            return z.at[ix].add(u.astype(tgt_dtype),
                                indices_are_sorted=sort)
        return f

    for name, f, ix in [
            ('bf16<-bf16 rand', scat(jnp.bfloat16, jnp.bfloat16), idx),
            ('f32<-f32  rand', scat(jnp.float32, jnp.float32), idx),
            ('f32<-f32  coherent', scat(jnp.float32, jnp.float32), idx_coh),
            ('f32 sorted+flag rand', scat(jnp.float32, jnp.float32, True),
             idx),
    ]:
        try:
            ms = timeit(f, upd_f32, ix, iters=5)
            print(f'  {name}: {ms:.3f} ms', flush=True)
        except Exception as e:
            print(f'  {name}: FAIL {e}', flush=True)

    # ------------------------------------------------------------------
    # 3. occ predicate gather variants
    # ------------------------------------------------------------------
    print('== occ pred gather: 901k lookups from 128^3 ==', flush=True)
    M = 901120
    G = 2097152
    occ_bits = rng.rand(G) > 0.7
    gidx = rng.randint(0, G, (M,)).astype(np.int32)

    @jax.jit
    def g_pred(tab, ix):
        return jnp.take(tab, ix, axis=0, mode='clip')

    for name, tab in [
            ('pred[2M]', jnp.asarray(occ_bits)),
            ('u8[2M]  ', jnp.asarray(occ_bits.astype(np.uint8))),
            ('bf16[2M]', jnp.asarray(occ_bits.astype(np.float32))
             .astype(jnp.bfloat16)),
            ('f32[2M] ', jnp.asarray(occ_bits.astype(np.float32))),
    ]:
        try:
            ms = timeit(g_pred, tab, gidx, iters=5)
            print(f'  {name}: {ms:.3f} ms', flush=True)
        except Exception as e:
            print(f'  {name}: FAIL {e}', flush=True)

    # packed rows: [16384, 128] f32, gather row + lane one-hot reduce
    occ_rows = occ_bits.reshape(16384, 128).astype(np.float32)
    ridx = (gidx // 128).astype(np.int32)
    lidx = (gidx % 128).astype(np.int32)

    @jax.jit
    def g_rows(tab, ri, li):
        rows = jnp.take(tab, ri, axis=0, mode='clip')
        oh = (li[:, None] == jnp.arange(128)[None, :])
        return jnp.sum(rows * oh, axis=1)

    ms = timeit(g_rows, jnp.asarray(occ_rows), ridx, lidx, iters=5)
    print(f'  rows[16k,128]+onehot: {ms:.3f} ms', flush=True)


if __name__ == '__main__':
    main()
