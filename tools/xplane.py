#!/usr/bin/env python
"""Minimal XSpace (.xplane.pb) parser: aggregate device op times by name.

jax.profiler.trace writes a tensorflow XSpace protobuf; parsing it normally
needs tensorflow/xprof, which aren't in this image.  The wire format is plain
protobuf, so decode it by hand and print, per plane, total event duration
grouped by event-metadata name.

Usage: python tools/xplane.py PATH/TO/*.xplane.pb [--top 40] [--plane SUBSTR]
"""

import argparse
import collections
import struct
import sys


def _varint(buf, i):
    x = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << s
        if not b & 0x80:
            return x, i
        s += 7


def fields(buf):
    """Yield (field_no, wire_type, value) over a protobuf message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def parse_plane(buf):
    name = ""
    lines = []
    ev_meta = {}
    for fno, wt, v in fields(buf):
        if fno == 2 and wt == 2:
            name = v.decode("utf-8", "replace")
        elif fno == 3 and wt == 2:
            lines.append(v)
        elif fno == 4 and wt == 2:
            # map entry: key=1 varint, value=2 XEventMetadata
            k = None
            meta_name = ""
            for f2, w2, v2 in fields(v):
                if f2 == 1:
                    k = v2
                elif f2 == 2 and w2 == 2:
                    for f3, w3, v3 in fields(v2):
                        if f3 == 2 and w3 == 2:
                            meta_name = v3.decode("utf-8", "replace")
            if k is not None:
                ev_meta[k] = meta_name
    return name, lines, ev_meta


def parse_line_events(buf):
    """Yield (metadata_id, duration_ps) from an XLine."""
    for fno, wt, v in fields(buf):
        if fno == 4 and wt == 2:  # XEvent (OpenXLA xplane.proto: XLine.events = 4)
            mid = dur = 0
            for f2, w2, v2 in fields(v):
                if f2 == 1:
                    mid = v2
                elif f2 == 3:
                    dur = v2
            yield mid, dur


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--plane", default="")
    args = ap.parse_args()

    buf = open(args.path, "rb").read()
    for fno, wt, v in fields(buf):
        if fno != 1 or wt != 2:
            continue
        name, lines, ev_meta = parse_plane(v)
        if args.plane and args.plane not in name:
            continue
        agg = collections.Counter()
        cnt = collections.Counter()
        for ln in lines:
            for mid, dur in parse_line_events(ln):
                key = ev_meta.get(mid, f"#{mid}")
                agg[key] += dur
                cnt[key] += 1
        if not agg:
            continue
        total = sum(agg.values())
        print(f"\n=== plane: {name}  (total {total/1e9:.3f} ms over "
              f"{sum(cnt.values())} events)")
        for key, dur in agg.most_common(args.top):
            print(f"{dur/1e9:10.3f} ms  x{cnt[key]:<6d} {key[:110]}")


if __name__ == "__main__":
    main()
