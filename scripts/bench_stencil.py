#!/usr/bin/env python
"""Microbench: SDF stencil fwd / fwd+bwd at compacted scale on TPU.

Usage: python scripts/bench_stencil.py [n_samples]
Compares the packed-atlas stencil path against a naive per-point loop,
reporting best-of-window wall ms (tunnel-safe: varied inputs + host fetch).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args_list, iters=8, windows=3):
    import jax
    out = fn(*args_list[0])
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    impl = sys.argv[2] if len(sys.argv) > 2 else 'auto'
    tile = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    from tensoflow_tpu.fields import tenso_sdf

    cfg = tenso_sdf.SDFConfig(grid_size=(128, 128, 128), n_comp=36,
                              sdf_dim=256, app_dim=128, sdf_multires=3,
                              n_levels=1, gather_dtype='bfloat16',
                              stencil_impl=impl, stencil_tile=tile)
    params = tenso_sdf.init_tenso_sdf(jax.random.PRNGKey(0), cfg)
    aabb = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])

    rng = np.random.RandomState(0)
    xyzs = [jnp.asarray((rng.rand(n, 3) - 0.5).astype(np.float32) * 1.8)
            for _ in range(8)]

    @jax.jit
    def fwd(params, xyz):
        return tenso_sdf.sdf_with_grad_hessian(params, cfg, xyz, aabb,
                                               with_hessian=True)

    @jax.jit
    def fwdbwd(params, xyz):
        def loss(p):
            sdf, app, grad, nh = tenso_sdf.sdf_with_grad_hessian(
                p, cfg, xyz, aabb, with_hessian=True)
            return (jnp.sum(sdf ** 2) + jnp.sum(app ** 2)
                    + jnp.sum(grad ** 2) + jnp.sum(nh ** 2))
        return jax.value_and_grad(loss)(params)

    args = [(params, x) for x in xyzs]
    print(f'n={n} stencil fwd      {timeit(fwd, args):8.2f} ms')
    print(f'n={n} stencil fwd+bwd  {timeit(fwdbwd, args):8.2f} ms')


if __name__ == '__main__':
    main()
