#!/usr/bin/env python
"""Parse a jax.profiler xplane.pb (via `protoc --decode_raw`) into per-op
device durations. Usage:
    protoc --decode_raw < .../vm.xplane.pb > /tmp/xplane.txt
    python scripts/parse_xplane.py /tmp/xplane.txt
Schema (raw tags): XSpace{1:planes}; XPlane{2:name, 3:lines,
4:event_metadata{2{1:id,2:hlo_text,4:category}}};
XLine{4:events}; XEvent{1:metadata_id, 2:offset_ps, 3:duration_ps}.
"""
import collections
import re
import sys


def parse_block(lines, i):
    fields = []
    n = len(lines)
    while i < n:
        s = lines[i].strip()
        if s == '}':
            return fields, i + 1
        m = re.match(r'(\d+) \{', s)
        if m:
            sub, i = parse_block(lines, i + 1)
            fields.append((int(m.group(1)), sub))
            continue
        m = re.match(r'(\d+): (.*)', s)
        if m:
            fields.append((int(m.group(1)), m.group(2)))
            i += 1
            continue
        i += 1
    return fields, i


def main(path):
    lines = open(path).read().splitlines()
    top, _ = parse_block(lines, 0)
    for tag, plane in top:
        if tag != 1 or not isinstance(plane, list):
            continue
        name = next((v for t, v in plane
                     if t == 2 and isinstance(v, str)), '?')
        if 'device' not in name:
            continue
        meta = {}
        for t, v in plane:
            if t == 4 and isinstance(v, list):
                inner = next((x for tt, x in v
                              if tt == 2 and isinstance(x, list)), None)
                if inner:
                    mid = next((int(x) for tt, x in inner
                                if tt == 1 and not isinstance(x, list)),
                               None)
                    mname = next((x for tt, x in inner
                                  if tt == 2 and isinstance(x, str)), '?')
                    meta[mid] = mname
        durs = collections.Counter()
        for t, v in plane:
            if t == 3 and isinstance(v, list):
                for tt, ev in v:
                    if tt == 4 and isinstance(ev, list):
                        mid = dur = None
                        for et, exv in ev:
                            if et == 1 and not isinstance(exv, list):
                                mid = int(exv)
                            elif et == 3 and not isinstance(exv, list):
                                try:
                                    dur = int(exv)
                                except ValueError:
                                    pass
                        if mid is not None and dur:
                            mname = meta.get(mid, str(mid))
                            m2 = re.match(r'"?%?([\w\.\-]+) =', mname)
                            kind = (re.sub(r'[\d\.]+$', '', m2.group(1))
                                    if m2 else mname[:60])
                            durs[kind] += dur
        print(f'== {name}')
        for k, d in durs.most_common(25):
            print(f'  {d / 1e9:9.3f} ms  {k}')
        # un-collapsed: top individual instructions (full metadata name)
        fine = collections.Counter()
        cnt = collections.Counter()
        for t, v in plane:
            if t == 3 and isinstance(v, list):
                for tt, ev in v:
                    if tt == 4 and isinstance(ev, list):
                        mid = dur = None
                        for et, exv in ev:
                            if et == 1 and not isinstance(exv, list):
                                mid = int(exv)
                            elif et == 3 and not isinstance(exv, list):
                                try:
                                    dur = int(exv)
                                except ValueError:
                                    pass
                        if mid is not None and dur:
                            nm = meta.get(mid, str(mid))[:160]
                            fine[nm] += dur
                            cnt[nm] += 1
        print(f'-- top instructions ({name})')
        import os
        topn = int(os.environ.get('PARSE_TOPN', 40))
        for k, d in fine.most_common(topn):
            print(f'  {d / 1e9:9.3f} ms  x{cnt[k]:<4d} {k}')


if __name__ == '__main__':
    main(sys.argv[1])
