#!/usr/bin/env python
"""Fast binary xplane.pb reader (no protoc --decode_raw round-trip).

The decode_raw -> text -> recursive-descent path takes minutes on a
100MB+ trace; this reads the wire format directly in one pass (~seconds)
and is what bench.py uses for trace-derived perf accounting.

Wire schema (tensorflow/profiler xplane.proto):
  XSpace    { 1: repeated XPlane }
  XPlane    { 2: name, 3: repeated XLine, 4: map<i64, XEventMetadata> }
  XEventMetadata { 1: id, 2: name, 4: category? }
  XLine     { 1: id, 2: display_id, 3: name?, 4: repeated XEvent,
              6: timestamp_ns }
  XEvent    { 1: metadata_id, 2: offset_ps, 3: duration_ps }

Usage:
    python scripts/xplane_bin.py <vm.xplane.pb> [step_regex]
prints the middle-step component breakdown (same spirit as
timeline_xplane.py but ~50x faster and with HLO-shape-derived bytes).
"""
from __future__ import annotations

import collections
import re
import sys


def _varint(buf, i):
    shift = 0
    out = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not (b & 0x80):
            return out, i
        shift += 7


def _skip(buf, i, wt):
    if wt == 0:
        _, i = _varint(buf, i)
        return i
    if wt == 1:
        return i + 8
    if wt == 2:
        ln, i = _varint(buf, i)
        return i + ln
    if wt == 5:
        return i + 4
    raise ValueError(f'wire type {wt}')


def _fields(buf, start, end):
    """Yield (field_no, wire_type, value_or_span). For wt==2 the value is
    an (s, e) span into buf."""
    i = start
    while i < end:
        tag, i = _varint(buf, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 2:
            ln, i = _varint(buf, i)
            yield fn, wt, (i, i + ln)
            i += ln
        elif wt == 0:
            v, i = _varint(buf, i)
            yield fn, wt, v
        else:
            j = _skip(buf, i, wt)
            yield fn, wt, (i, j)
            i = j


def _parse_events(buf, s, e):
    """XLine.events span -> list of (metadata_id, offset_ps, duration_ps)."""
    out = []
    i = s
    n_append = out.append
    while i < e:
        tag, i = _varint(buf, i)
        if tag >> 3 == 4 and tag & 7 == 2:   # repeated XEvent
            ln, i = _varint(buf, i)
            j = i + ln
            mid = off = dur = 0
            while i < j:
                t2, i = _varint(buf, i)
                f2, w2 = t2 >> 3, t2 & 7
                if w2 == 0:
                    v, i = _varint(buf, i)
                    if f2 == 1:
                        mid = v
                    elif f2 == 2:
                        off = v
                    elif f2 == 3:
                        dur = v
                else:
                    i = _skip(buf, i, w2)
            n_append((mid, off, dur))
        else:
            i = _skip(buf, i, tag & 7)
    return out


def parse(path, want_plane='device'):
    """Returns [(plane_name, metadata {id: name}, lines [(line_name,
    events)])] for planes whose name contains ``want_plane``."""
    buf = memoryview(open(path, 'rb').read())
    planes = []
    for fn, wt, span in _fields(buf, 0, len(buf)):
        if fn != 1 or wt != 2:
            continue
        s, e = span
        # first pass: plane name only (cheap — name precedes lines)
        name = ''
        for f2, w2, v2 in _fields(buf, s, e):
            if f2 == 2 and w2 == 2:
                name = bytes(buf[v2[0]:v2[1]]).decode('utf-8', 'replace')
                break
        if want_plane not in name:
            continue
        meta = {}
        lines = []
        for f2, w2, v2 in _fields(buf, s, e):
            if f2 == 3 and w2 == 2:          # XLine
                ls, le = v2
                lname = ''
                events = None
                for f3, w3, v3 in _fields(buf, ls, le):
                    if f3 == 3 and w3 == 2:
                        lname = bytes(buf[v3[0]:v3[1]]).decode(
                            'utf-8', 'replace')
                events = _parse_events(buf, ls, le)
                lines.append((lname, events))
            elif f2 == 4 and w2 == 2:        # map entry
                ms, me = v2
                mid = None
                mname = ''
                for f3, w3, v3 in _fields(buf, ms, me):
                    if f3 == 1 and w3 == 0:
                        mid = v3
                    elif f3 == 2 and w3 == 2:
                        for f4, w4, v4 in _fields(buf, v3[0], v3[1]):
                            if f4 == 1 and w4 == 0 and mid is None:
                                mid = v4
                            elif f4 == 2 and w4 == 2:
                                mname = bytes(buf[v4[0]:v4[1]]).decode(
                                    'utf-8', 'replace')
                meta[mid] = mname
        planes.append((name, meta, lines))
    return planes


_SHAPE_RE = re.compile(
    r'\b(pred|bf16|f16|f32|f64|s4|u4|s8|u8|s16|u16|s32|u32|s64|u64)'
    r'\[([0-9,]*)\]')
_BYTES = {'pred': 1, 's4': 0.5, 'u4': 0.5, 's8': 1, 'u8': 1, 'bf16': 2,
          'f16': 2, 's16': 2, 'u16': 2, 'f32': 4, 's32': 4, 'u32': 4,
          'f64': 8, 's64': 8, 'u64': 8}


def hlo_bytes(name: str) -> int:
    """Sum of all tensor shapes mentioned in an HLO one-liner (result +
    operands) — the buffers this instruction materializes/reads. Unlike
    XLA cost analysis this never double-counts inside a fusion: only
    fusion BOUNDARY buffers appear in the one-liner."""
    total = 0
    for m in _SHAPE_RE.finditer(name):
        n = 1
        dims = m.group(2)
        if dims:
            for d in dims.split(','):
                n *= int(d)
        total += int(n * _BYTES[m.group(1)])
    return total


def step_windows(lines, meta, step_regex=r'jit_\w*step'):
    """Find per-step (start, end) ps windows from the line whose events
    match the step regex (XLA module-level events)."""
    pat = re.compile(step_regex)
    best = []
    for lname, events in lines:
        wins = [(off, off + dur) for mid, off, dur in events
                if pat.search(meta.get(mid, ''))]
        if len(wins) > len(best):
            best = wins
    return sorted(best)


def busy_breakdown(lines, meta, window, top=25):
    """Aggregate event durations by metadata within [window); returns
    (per_op list sorted by total ps, total busy ps union on the busiest
    line, gb moved from HLO shapes)."""
    w0, w1 = window
    agg = collections.Counter()
    cnt = collections.Counter()
    intervals = collections.defaultdict(list)
    for lname, events in lines:
        for mid, off, dur in events:
            if off >= w0 and off + dur <= w1:
                agg[mid] += dur
                cnt[mid] += 1
                intervals[lname].append((off, dur))
    # busy union on the busiest line (the main compute stream)
    busy = 0
    if intervals:
        line = max(intervals, key=lambda k: sum(d for _, d in intervals[k]))
        evs = sorted(intervals[line])
        cur_s = cur_e = None
        for off, dur in evs:
            if cur_e is None or off > cur_e:
                if cur_e is not None:
                    busy += cur_e - cur_s
                cur_s, cur_e = off, off + dur
            else:
                cur_e = max(cur_e, off + dur)
        if cur_e is not None:
            busy += cur_e - cur_s
    gb = sum(hlo_bytes(meta.get(mid, '')) * c for mid, c in cnt.items()
             ) / 1e9
    rows = [(agg[mid] / 1e9, cnt[mid], meta.get(mid, str(mid)))
            for mid in agg]
    rows.sort(reverse=True)
    return rows[:top], busy / 1e9, gb


def main():
    path = sys.argv[1]
    step_re = sys.argv[2] if len(sys.argv) > 2 else r'jit_\w*step'
    planes = parse(path)
    if not planes:
        print('no device plane found')
        return
    name, meta, lines = planes[0]
    wins = step_windows(lines, meta, step_re)
    print(f'plane {name!r}: {len(wins)} step windows '
          f'[{step_re}]')
    if not wins:
        return
    mid = wins[len(wins) // 2]
    rows, busy_ms, gb = busy_breakdown(lines, meta, mid)
    step_ms = (mid[1] - mid[0]) / 1e9
    print(f'middle step: {step_ms:.2f} ms span, {busy_ms:.2f} ms busy, '
          f'{gb:.2f} GB boundary bytes -> {gb / (step_ms / 1e3):.0f} GB/s')
    for ms, c, nm in rows:
        print(f'  {ms:9.3f} ms  x{c:<4d} {nm[:140]}')


if __name__ == '__main__':
    main()
