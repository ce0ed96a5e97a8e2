#!/usr/bin/env python
"""Device-trace the isolated stencil fwd (+bwd) and dump its HLO.

Usage: python scripts/profile_stencil.py [outdir] [n]
then decode the xplane + join with scripts/src_profile.py:
  protoc --decode_raw < <outdir>/plugins/profile/*/*.xplane.pb > /tmp/x.txt
  python scripts/src_profile.py /tmp/x.txt /tmp/stencil_hlo.txt
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else '/tmp/prof_stencil'
N = int(sys.argv[2]) if len(sys.argv) > 2 else 131072


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    from tensoflow_tpu.fields import tenso_sdf

    cfg = tenso_sdf.SDFConfig(grid_size=(128, 128, 128), n_comp=36,
                              sdf_dim=256, app_dim=128, sdf_multires=3,
                              n_levels=1, gather_dtype='bfloat16')
    params = tenso_sdf.init_tenso_sdf(jax.random.PRNGKey(0), cfg)
    aabb = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    rng = np.random.RandomState(0)
    xyzs = [jnp.asarray((rng.rand(N, 3) - 0.5).astype(np.float32) * 1.8)
            for _ in range(4)]

    @jax.jit
    def fwdbwd(params, xyz):
        def loss(p):
            sdf, app, grad, nh = tenso_sdf.sdf_with_grad_hessian(
                p, cfg, xyz, aabb, with_hessian=True)
            return (jnp.sum(sdf ** 2) + jnp.sum(app ** 2)
                    + jnp.sum(grad ** 2) + jnp.sum(nh ** 2))
        return jax.value_and_grad(loss)(params)

    v, g = fwdbwd(params, xyzs[0])
    float(v)
    with open('/tmp/stencil_hlo.txt', 'w') as f:
        f.write(jax.jit(fwdbwd).lower(params, xyzs[0]).compile().as_text())

    with jax.profiler.trace(OUT):
        for i in range(3):
            v, g = fwdbwd(params, xyzs[(i + 1) % 4])
        float(v)
    import glob
    print('trace:', glob.glob(os.path.join(OUT, 'plugins/profile/*/*.pb')))


if __name__ == '__main__':
    main()
