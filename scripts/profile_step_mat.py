#!/usr/bin/env python
"""Capture a device trace of the stage-2 (material) bench step and print
the per-op breakdown. Uses the exact bench_material setup.  Usage:
    python scripts/profile_step_mat.py [outdir]
"""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT = sys.argv[1] if len(sys.argv) > 1 else '/tmp/prof_mat'


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import bench_material
    from tensoflow_tpu.fields import mc_shading
    from tensoflow_tpu.train import losses

    cfg, rcfg, grid, params, batch = bench_material.build_setup()
    weights = losses.schedule_weights(cfg, 2000)
    phase = mc_shading.ShadePhase(nis_loss_diffuse=True,
                                  nis_loss_specular=True)
    jitted, opt_state = bench_material.make_step_fn(cfg, rcfg, phase)(params)

    params, opt_state, total = jitted(params, opt_state, grid, batch, 2000,
                                      weights, jax.random.PRNGKey(0))
    float(total)

    with jax.profiler.trace(OUT):
        for i in range(3):
            params, opt_state, total = jitted(
                params, opt_state, grid, batch, 2001 + i, weights,
                jax.random.PRNGKey(i))
        float(total)

    pbs = glob.glob(os.path.join(OUT, 'plugins/profile/*/*.xplane.pb'))
    print('trace:', pbs)
    if pbs:
        import xplane_bin
        planes = xplane_bin.parse(pbs[0])
        name, meta, lines = planes[0]
        wins = xplane_bin.step_windows(lines, meta)
        mid = wins[len(wins) // 2]
        rows, busy_ms, gb = xplane_bin.busy_breakdown(lines, meta, mid, 40)
        step_ms = (mid[1] - mid[0]) / 1e9
        print(f'step {step_ms:.2f} ms, busy {busy_ms:.2f} ms, '
              f'{gb:.1f} GB boundary bytes')
        for ms, c, nm in rows:
            print(f'  {ms:9.3f} ms  x{c:<4d} {nm[:130]}')


if __name__ == '__main__':
    main()
