#!/usr/bin/env python
"""Dump the compiled stage-2 TPU step HLO and attribute every STANDALONE
(unfused) elementwise/layout op to its JAX source line.  The round-4
trace shows ~26ms of standalone multiplies/broadcasts + ~15ms of
relayout copies in the 165ms step — this finds where they come from.

Usage: python scripts/dump_step_hlo_mat.py [out.txt]
"""
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else '/tmp/step_mat_hlo.txt'


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import bench_material
    from tensoflow_tpu.fields import mc_shading
    from tensoflow_tpu.train import losses

    cfg, rcfg, grid, params, batch = bench_material.build_setup()
    # mirror the bench's adapted buckets so %op names line up with the
    # bench trace (the build_setup defaults compile a different program)
    import json
    buckets = json.loads(os.environ.get(
        'DUMP_BUCKETS',
        '{"secondary_budget": 0.25, "inner_light_budget": 0.0625, '
        '"a1_budget": 0.25}'))
    rcfg = rcfg._replace(shader=rcfg.shader._replace(**buckets))
    weights = losses.schedule_weights(cfg, 2000)
    phase = mc_shading.ShadePhase(nis_loss_diffuse=True,
                                  nis_loss_specular=True)
    jitted, opt_state = bench_material.make_step_fn(cfg, rcfg, phase)(params)
    lowered = jitted.lower(params, opt_state, grid, batch, 2000, weights,
                           jax.random.PRNGKey(0))
    txt = lowered.compile().as_text()
    with open(OUT, 'w') as f:
        f.write(txt)
    print('wrote', OUT, len(txt) // 1000, 'kB')

    # standalone ops live in the entry computation (fused ops are inside
    # %fused_computation.* blocks)
    in_fused = False
    agg = collections.Counter()
    n = collections.Counter()
    pat = re.compile(
        r'= (\w+)\[([0-9,]*)\][^ ]* (multiply|broadcast|copy|concatenate|'
        r'slice|reshape|convert|add|subtract|divide|select|compare|pad)\(')
    meta = re.compile(r'op_name="([^"]*)"')
    src = re.compile(r'source_file="([^"]*)".*source_line=(\d+)')
    for line in txt.splitlines():
        s = line.strip()
        if s.startswith('%fused_computation') or (
                s.startswith('ENTRY') or s.startswith('%region')):
            in_fused = s.startswith('%fused_computation')
        if in_fused:
            continue
        m = pat.search(s)
        if not m:
            continue
        dims = m.group(2)
        sz = 1
        for d in dims.split(','):
            if d:
                sz *= int(d)
        if sz < 65536:          # ignore tiny scalars/control glue
            continue
        mm = meta.search(s)
        ms = src.search(s)
        where = ''
        if mm:
            where = '/'.join(mm.group(1).split('/')[-2:])[:70]
        if ms:
            where += f'  {os.path.basename(ms.group(1))}:{ms.group(2)}'
        key = f'{m.group(3):12s} {m.group(1)}[{dims}] {where}'
        agg[key] += sz
        n[key] += 1
    print('\nstandalone big ops (count x op/shape/provenance):')
    for k, c in n.most_common(60):
        print(f'  x{c:<3d} {k}')


if __name__ == '__main__':
    main()
