#!/usr/bin/env python
"""Timeline view of a decoded xplane trace: per-line busy time inside one
train-step window, plus the serialized top ops on the main compute line.

The flat duration sums from parse_xplane.py mislead on TPU because async
copy/slice SPANS overlap compute (issue-to-done, not bus occupancy).  This
tool instead segments the device plane into jit_* step windows, picks the
middle one, and reports per-line interval-union busy time and the largest
contributors on each line.

Usage:
    protoc --decode_raw < .../vm.xplane.pb > /tmp/xplane_decoded.txt
    python scripts/timeline_xplane.py /tmp/xplane_decoded.txt [step_regex]
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


def union_len(intervals):
    if not intervals:
        return 0
    intervals.sort()
    total, cs, ce = 0, intervals[0][0], intervals[0][1]
    for s, e in intervals[1:]:
        if s > ce:
            total += ce - cs
            cs, ce = s, e
        else:
            ce = max(ce, e)
    return total + ce - cs


def main(path, step_re=r'jit_'):
    lines = open(path).read().splitlines()
    top, _ = parse_block(lines, 0)
    for tag, plane in top:
        if tag != 1 or not isinstance(plane, list):
            continue
        name = next((v for t, v in plane
                     if t == 2 and isinstance(v, str)), '?')
        if 'TPU' not in name:
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
        # lines: tag 3; line has name tag 2? and events tag 4
        tlines = []
        for t, v in plane:
            if t == 3 and isinstance(v, list):
                lname = next((x for tt, x in v
                              if tt == 2 and isinstance(x, str)), '?')
                evs = []
                for tt, ev in v:
                    if tt == 4 and isinstance(ev, list):
                        mid = off = dur = None
                        for et, exv in ev:
                            if isinstance(exv, list):
                                continue
                            if et == 1:
                                mid = int(exv)
                            elif et == 2:
                                off = int(exv)
                            elif et == 3:
                                try:
                                    dur = int(exv)
                                except ValueError:
                                    pass
                        if mid is not None and dur and off is not None:
                            evs.append((off, dur, meta.get(mid, str(mid))))
                if evs:
                    tlines.append((lname, evs))
        # find step windows on whichever line carries them
        windows = []
        for lname, evs in tlines:
            for off, dur, nm in evs:
                if re.search(step_re, nm):
                    windows.append((off, off + dur))
        windows.sort()
        if not windows:
            print('no step windows found')
            return
        w = windows[len(windows) // 2]
        print(f'== {name}: {len(windows)} step windows, '
              f'middle = {(w[1]-w[0])/1e9:.3f} ms')
        for lname, evs in tlines:
            ivs, per_op = [], collections.Counter()
            for off, dur, nm in evs:
                s, e = max(off, w[0]), min(off + dur, w[1])
                if e <= s or re.search(step_re, nm):
                    continue
                ivs.append((s, e))
                m2 = re.match(r'"?%?([\w\.\-]+)', nm)
                key = m2.group(1) if m2 else nm[:40]
                per_op[key] += e - s
            busy = union_len(ivs)
            if busy < 1e6:
                continue
            print(f'-- line "{lname}": busy {busy/1e9:7.3f} ms '
                  f'({100.0*busy/(w[1]-w[0]):5.1f}%)')
            for k, d in per_op.most_common(14):
                print(f'     {d/1e9:8.3f} ms  {k}')


if __name__ == '__main__':
    main(sys.argv[1], *(sys.argv[2:] or []))
