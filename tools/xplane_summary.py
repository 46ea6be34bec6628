"""Summarize a jax.profiler xplane.pb: per-op device time, no TF needed.

The tensorboard_plugin_profile converters in this environment are broken
(protobuf/pywrap version skew), so this walks the protobuf wire format
directly.  Schema subset (tensorflow/core/profiler/protobuf/xplane.proto):

  XSpace        { repeated XPlane planes = 1; }
  XPlane        { int64 id=1; string name=2; repeated XLine lines=3;
                  map<int64, XEventMetadata> event_metadata=4; }
  XEventMetadata{ int64 id=1; string name=2; string display_name=3; }
  XLine         { int64 id=1; string name=2; ... repeated XEvent events=4; }
  XEvent        { int64 metadata_id=1; int64 offset_ps=2;
                  int64 duration_ps=3; ... }

Usage: python tools/xplane_summary.py /tmp/trace/plugins/profile/*/vm.xplane.pb [top_n]
"""
from __future__ import annotations

import collections
import glob
import sys


def _varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i: i + ln]
            i += ln
        elif wt == 5:
            v = buf[i: i + 4]
            i += 4
        elif wt == 1:
            v = buf[i: i + 8]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def summarize(path: str, top: int = 30) -> None:
    space = open(path, "rb").read()
    for fno, _, plane in fields(space):
        if fno != 1:
            continue
        name = b""
        meta: dict[int, str] = {}
        lines = []
        for pf, _, pv in fields(plane):
            if pf == 2:
                name = pv
            elif pf == 3:
                lines.append(pv)
            elif pf == 4:  # map entry {key=1, value=XEventMetadata=2}
                k = None
                mname = b""
                for mf, _, mv in fields(pv):
                    if mf == 1:
                        k = mv
                    elif mf == 2:
                        for ef, _, ev in fields(mv):
                            if ef == 2:
                                mname = ev
                if k is not None:
                    meta[k] = mname.decode(errors="replace")
        pname = name.decode(errors="replace")
        if "TPU" not in pname and "Device" not in pname:
            continue
        tot = collections.Counter()
        cnt = collections.Counter()
        for line in lines:
            lname = b""
            evs = []
            for lf, _, lv in fields(line):
                if lf == 2:
                    lname = lv
                elif lf == 4:
                    evs.append(lv)
            if lname != b"XLA Ops":  # skip Steps/Modules/Async rollups
                continue
            for lv in evs:
                mid = dur = 0
                for ef, _, ev in fields(lv):
                    if ef == 1:
                        mid = ev
                    elif ef == 3:
                        dur = ev
                opname = meta.get(mid, str(mid))
                tot[opname] += dur
                cnt[opname] += 1
        if not tot:
            continue
        total_ms = sum(tot.values()) / 1e9
        print(f"\n=== {pname}  (sum of event durations "
              f"{total_ms:.1f} ms over all lines) ===")
        for op, ps in tot.most_common(top):
            print(f"{ps / 1e9:9.2f} ms  x{cnt[op]:<5d} {op[:110]}")


if __name__ == "__main__":
    pat = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/trace_r2b/plugins/profile/*/vm.xplane.pb"
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    for p in sorted(glob.glob(pat)):
        print(f"## {p}")
        summarize(p, topn)
