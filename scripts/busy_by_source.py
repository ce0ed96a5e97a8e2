#!/usr/bin/env python
"""Attribute middle-step SYNC device time to JAX source lines.

Async (-start/-done) spans overlap compute by design (cross-program
prefetch, collective/copy engines) and double-count in span sums; this
keeps only synchronous ops, maps each %op to its op_name/source_file
metadata from the dumped HLO, and aggregates by source region.

Usage:
    python scripts/busy_by_source.py /tmp/bench_prof_mat /tmp/step_mat_hlo.txt [top]
"""
import collections
import glob
import re
import sys

sys.path.insert(0, __file__.rsplit('/', 1)[0])
import xplane_bin

_OPNAME = re.compile(r'op_name="([^"]*)"')
_SRC = re.compile(r'source_file="([^"]*)"')
_SRCLINE = re.compile(r'source_line=(\d+)')


def hlo_provenance(hlo_path):
    """%opname -> (op_name_meta, file:line) for every annotated HLO op."""
    prov = {}
    for line in open(hlo_path):
        s = line.strip()
        if not s.startswith('%') or ' = ' not in s:
            continue
        name = s.split(' = ', 1)[0].strip()
        mm = _OPNAME.search(s)
        ms = _SRC.search(s)
        ml = _SRCLINE.search(s)
        src = ''
        if ms:
            src = ms.group(1).rsplit('/', 1)[-1]
            if ml:
                src += ':' + ml.group(1)
        prov[name] = (mm.group(1) if mm else '', src)
    return prov


def region_of(op_meta, src):
    """Collapse op_name metadata to a coarse semantic region."""
    m = op_meta
    for tag, label in [
        ('sphere_trace', 'secondary-trace'),
        ('sdf_trace', 'secondary-trace'),
        ('cubemap', 'env-cubemap'),
        ('flow', 'nis-flow'),
        ('inner', 'inner-light'),
        ('transpose(jvp(jit(_take)))', 'gather-vjp-scatter'),
    ]:
        if tag in m or tag in src:
            return label
    if 'adam' in m or 'opt' in m.lower() or '_tree_math' in m:
        return 'optimizer'
    return ''


def main():
    outdir = sys.argv[1]
    hlo = sys.argv[2]
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    pb = sorted(glob.glob(outdir + '/plugins/profile/*/*.xplane.pb'))[-1]
    planes = xplane_bin.parse(pb)
    name, meta, lines = planes[0]
    wins = xplane_bin.step_windows(lines, meta)
    w0, w1 = wins[len(wins) // 2]
    prov = hlo_provenance(hlo)

    sync = collections.Counter()
    async_ms = 0.0
    for lname, events in lines:
        for mid, off, dur in events:
            if not (off >= w0 and off + dur <= w1):
                continue
            nm = meta.get(mid, str(mid))
            if nm.startswith('jit_'):
                continue
            opname = nm.split(' = ')[0].strip() if ' = ' in nm else \
                nm.split()[0]
            if '-start' in opname or '-done' in opname or \
                    'async' in opname:
                async_ms += dur / 1e9
                continue
            sync[opname] += dur

    total_sync = sum(sync.values()) / 1e9
    print(f'step span {(w1-w0)/1e9:.2f} ms; sync ops {total_sync:.2f} ms; '
          f'async spans {async_ms:.2f} ms (overlapped, double-counted)')

    by_src = collections.Counter()
    by_src_cnt = collections.Counter()
    examples = {}
    for opname, dur in sync.items():
        op_meta, src = prov.get(opname, ('', ''))
        key = src or '(no-src)'
        # jvp/transpose wrappers tell fwd from bwd
        kind = 'bwd' if 'transpose' in op_meta else 'fwd'
        key = f'{key} [{kind}]' if src else key
        by_src[key] += dur
        by_src_cnt[key] += 1
        if key not in examples or dur > sync[examples[key]]:
            examples[key] = opname
    print(f'\nsync time by source line (top {top}):')
    for key, dur in by_src.most_common(top):
        ex = examples[key]
        om = prov.get(ex, ('', ''))[0]
        print(f'  {dur/1e9:7.2f} ms x{by_src_cnt[key]:<4d} {key:42s} '
              f'{ex[:28]:28s} {om[:60]}')


if __name__ == '__main__':
    main()
