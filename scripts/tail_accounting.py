#!/usr/bin/env python
"""Full-step busy accounting beyond the top-N: bucket every device event
in the middle step window by duration class and name family, so the
"long tail of sub-ms fusions" stops being a guess.  Usage:
    python scripts/tail_accounting.py /tmp/bench_prof_mat [top]
"""
import collections
import glob
import re
import sys

sys.path.insert(0, __file__.rsplit('/', 1)[0])
import xplane_bin


def family(name: str) -> str:
    """Collapse an HLO one-liner to an op family + result shape."""
    m = re.match(r'%?([a-zA-Z0-9_.-]+)', name)
    op = m.group(1) if m else name[:24]
    op = re.sub(r'[.\d]+$', '', op)
    sm = xplane_bin._SHAPE_RE.search(name)
    shape = f'{sm.group(1)}[{sm.group(2)}]' if sm else ''
    return f'{op} {shape}'


def main():
    outdir = sys.argv[1]
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    pb = sorted(glob.glob(outdir + '/plugins/profile/*/*.xplane.pb'))[-1]
    planes = xplane_bin.parse(pb)
    name, meta, lines = planes[0]
    wins = xplane_bin.step_windows(lines, meta)
    w0, w1 = wins[len(wins) // 2]
    step_ms = (w1 - w0) / 1e9

    agg = collections.Counter()
    cnt = collections.Counter()
    for lname, events in lines:
        for mid, off, dur in events:
            if off >= w0 and off + dur <= w1:
                nm = meta.get(mid, str(mid))
                if nm.startswith('jit_'):
                    continue
                agg[nm] += dur
                cnt[nm] += 1

    # duration-class histogram (per-instruction total within the step)
    classes = [(1e9, '>=1ms'), (3e8, '0.3-1ms'), (1e8, '0.1-0.3ms'),
               (0, '<0.1ms')]
    by_class = collections.defaultdict(lambda: [0.0, 0])
    fam_in_class = collections.defaultdict(collections.Counter)
    for nm, tot in agg.items():
        for thr, label in classes:
            if tot >= thr:
                by_class[label][0] += tot / 1e9
                by_class[label][1] += 1
                fam_in_class[label][family(nm)] += tot
                break

    print(f'step {step_ms:.2f} ms, itemized {sum(agg.values())/1e9:.2f} ms '
          f'(async spans double-count)')
    for _, label in classes:
        ms, n = by_class[label]
        print(f'  [{label:>9}] {ms:8.2f} ms across {n} instructions')
        for fam, tot in fam_in_class[label].most_common(
                12 if label != '>=1ms' else 20):
            print(f'       {tot/1e9:7.2f} ms  {fam[:100]}')


if __name__ == '__main__':
    main()
