#!/usr/bin/env python
"""Tune sphere_trace_budget iteration counts on the TPU (round 4).

Times the budgeted secondary trace at bench scale (1.57M rays, two-lobe
geometry @256^3 bake) for several (n_coarse, n_fine, n_newton, n_polish)
combos and reports accuracy vs the full packed trace on the same rays
(hit agreement + 97%-quantile depth error), so the production defaults
are the fastest combo that holds accuracy.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import bench_material as bm
    from tensoflow_tpu.ops import sdf_trace

    res = 256
    xs = np.linspace(-1, 1, res, dtype=np.float32)
    gp = np.stack(np.meshgrid(xs, xs, xs, indexing='ij'), -1)
    vals = bm.two_lobe_sdf(gp).astype(np.float32)
    pg = sdf_trace.pack_sdf_grid(sdf_trace.SDFGrid(
        values=jnp.asarray(vals),
        aabb=jnp.asarray([[-1.0] * 3, [1.0] * 3])))

    rng = np.random.RandomState(0)
    pn, sn = 2048, 768
    n = pn * sn
    nrm = rng.randn(pn, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    lobe = bm.LOBE_CENTERS[rng.randint(0, 2, pn)]
    pts = lobe + nrm * bm.LOBE_RADIUS
    d = rng.randn(pn, sn, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    down = np.sum(d * nrm[:, None, :], -1, keepdims=True)
    d = np.where(down < 0, d - 2 * down * nrm[:, None, :], d)
    us = 2.0 / 511.0
    m_cell = 2.0 / (pg.mid_rows.shape[0] - 1)
    o = (pts[:, None, :] + 2.0 * us * d
         + 1.5 * m_cell * nrm[:, None, :]).reshape(-1, 3).astype(np.float32)
    d = d.reshape(-1, 3)
    h0 = np.sum(d * np.repeat(nrm, sn, 0), -1).astype(np.float32)
    o_j, d_j, h0_j = jnp.asarray(o), jnp.asarray(d), jnp.asarray(h0)
    m = int(n * 0.375) // 128 * 128

    # ground truth: full packed trace on a subset (cost)
    sub = 196608
    it, nt, tt, ht = jax.jit(lambda o, d: sdf_trace.sphere_trace(pg, o, d))(
        o_j[:sub], d_j[:sub])
    ht = np.asarray(ht)
    tt = np.asarray(tt)[:, 0]

    def timed(fn, *args):
        out = fn(*args)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for k in range(3):
                out = fn(*args)
            float(jnp.sum(out.depth_m[:16]))
            best = min(best, (time.perf_counter() - t0) / 3)
        return out, best * 1e3

    combos = [
        (8, 7, 2, 2),    # current defaults
        (6, 7, 2, 2),
        (7, 6, 2, 1),
        (6, 6, 2, 1),
        (6, 5, 3, 1),
        (10, 8, 2, 2),   # generous reference point
    ]
    for nc, nf, nn, npol in combos:
        fn = jax.jit(lambda o, d, h, nc=nc, nf=nf, nn=nn, npol=npol:
                     sdf_trace.sphere_trace_budget(
                         pg, o, d, m, h0=h, n_coarse=nc, n_fine=nf,
                         n_newton=nn, n_polish=npol))
        out, ms = timed(fn, o_j, d_j, h0_j)
        dest = np.asarray(out.dest)[:sub]
        mapped = dest < m
        hb = mapped & np.asarray(out.hit_m)[np.minimum(dest, m - 1)]
        db = np.where(hb, np.asarray(out.depth_m)[np.minimum(dest, m - 1)],
                      10.0)
        agree = (hb == ht).mean()
        both = hb & ht
        dq = (np.quantile(np.abs(db[both] - tt[both]), 0.97)
              if both.sum() else float('nan'))
        cand = float(np.asarray(out.cand).mean())
        print(f'nc={nc} nf={nf} nn={nn} np={npol}: {ms:7.2f} ms  '
              f'agree={agree:.4f} dq97={dq:.4f} cand={cand:.3f}',
              flush=True)


if __name__ == '__main__':
    main()
