"""Join xplane per-instruction durations with HLO source metadata.

Usage:
  python scripts/profile_step.py /tmp/prof          # capture trace (TPU)
  protoc --decode_raw < /tmp/prof/plugins/profile/*/*.xplane.pb \
      > /tmp/xplane_decoded.txt
  python scripts/dump_step_hlo.py                   # writes /tmp/step_hlo.txt
  python scripts/src_profile.py [xplane_decoded.txt] [step_hlo.txt]

Prints per-source-line device time (summed over the trace's steps; divide
by the number of profiled steps).
"""
import collections, re, sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from parse_xplane import parse_block

XPLANE = sys.argv[1] if len(sys.argv) > 1 else '/tmp/xplane_decoded.txt'
HLO = sys.argv[2] if len(sys.argv) > 2 else '/tmp/step_hlo.txt'

lines = open(XPLANE).read().splitlines()
top, _ = parse_block(lines, 0)
# collect instruction durations (device plane)
durs = collections.Counter()
for tag, plane in top:
    if tag != 1 or not isinstance(plane, list):
        continue
    name = next((v for t, v in plane if t == 2 and isinstance(v, str)), '?')
    if 'device:TPU' not in name:
        continue
    meta = {}
    for t, v in plane:
        if t == 4 and isinstance(v, list):
            inner = next((x for tt, x in v if tt == 2 and isinstance(x, list)), None)
            if inner:
                mid = next((int(x) for tt, x in inner if tt == 1 and not isinstance(x, list)), None)
                nm = next((x for tt, x in inner if tt == 2 and isinstance(x, str)), None)
                if mid is not None and nm:
                    meta[mid] = nm.strip('"')
    for t, v in plane:
        if t == 3 and isinstance(v, list):
            for tt, ev in v:
                if tt == 4 and isinstance(ev, list):
                    mid = dur = None
                    for et, exv in ev:
                        if et == 1 and not isinstance(exv, list):
                            mid = int(exv)
                        elif et == 3 and not isinstance(exv, list):
                            try: dur = int(exv)
                            except ValueError: pass
                    if mid is not None and dur:
                        durs[meta.get(mid, str(mid))] += dur

# instruction -> %name
def op_of(nm):
    m = re.match(r'%?([\w.\-]+) =', nm)
    return m.group(1) if m else nm

# 2) scan HLO for metadata per op name
src = {}
for ln in open(HLO):
    m = re.match(r'\s*%?([\w.\-]+) = ', ln)
    if not m: continue
    op = m.group(1)
    sm = re.search(r'source_file="([^"]+)" source_line=(\d+)', ln)
    om = re.search(r'op_name="([^"]+)"', ln)
    if sm:
        src[op] = (sm.group(1).replace('/root/repo/', ''), int(sm.group(2)),
                   (om.group(1)[:60] if om else ''))

agg = collections.Counter()
cat = collections.Counter()
unattr = collections.Counter()
for nm, d in durs.items():
    op = op_of(nm)
    if op in src:
        f, l, o = src[op]
        agg[(f, l)] += d
    else:
        # async wrappers: strip -start/-done suffix and retry
        base = re.sub(r'(-start|-done)', '', op)
        if base in src:
            f, l, o = src[base]
            agg[(f, l)] += d
        else:
            unattr[op.split('.')[0]] += d

print('== by source line (ms over 3 steps)')
for (f, l), d in agg.most_common(35):
    print(f'  {d/1e9:9.3f}  {f}:{l}')
print('== unattributed (op type)')
for k, d in unattr.most_common(15):
    print(f'  {d/1e9:9.3f}  {k}')
