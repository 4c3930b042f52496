"""Minimal XPlane (.xplane.pb) parser: per-op device-time aggregation.

The image's tensorboard_plugin_profile converter is broken against its
protobuf/tensorflow versions (xspace_to_tools_data missing), so this is a
self-contained protobuf *wire-format* walker for the stable XSpace schema
(tsl/profiler/protobuf/xplane.proto) — no generated code, no deps:

  XSpace         { repeated XPlane planes = 1; }
  XPlane         { id=1; name=2; repeated XLine lines=3;
                   map<int64,XEventMetadata> event_metadata=4;
                   map<int64,XStatMetadata> stat_metadata=5; }
  XLine          { id=1; name=2; timestamp_ns=3; repeated XEvent events=4;
                   duration_ps=9; display_id=10; display_name=11; }
  XEvent         { metadata_id=1; offset_ps=2; duration_ps=3; stats=4; }
  XEventMetadata { id=1; name=2; display_name=3; }
  XStatMetadata  { id=1; name=2; }

Usage:
  python tools/xplane_parse.py <trace_dir_or_xplane.pb> [--top N] [--lines]

Aggregates event durations by metadata name over the device plane's op
lines ("XLA Ops"), and prints the "XLA Modules" line separately (program
totals).  Host planes are skipped unless --host.
"""

from __future__ import annotations

import glob
import os
import sys


def _varint(buf: memoryview, i: int) -> tuple[int, int]:
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over one message's wire data.
    value: int for varint/fixed, memoryview for length-delimited."""
    i, n = 0, len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = int.from_bytes(buf[i : i + 4], "little")
            i += 4
        elif wt == 1:
            v = int.from_bytes(buf[i : i + 8], "little")
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fnum, wt, v


def _map_entry(buf: memoryview) -> tuple[int, memoryview]:
    k, v = 0, memoryview(b"")
    for fnum, _, val in fields(buf):
        if fnum == 1:
            k = val
        elif fnum == 2:
            v = val
    return k, v


def parse_plane(buf: memoryview) -> dict:
    plane = {"name": "", "lines": [], "event_meta": {}}
    for fnum, _, val in fields(buf):
        if fnum == 2:
            plane["name"] = bytes(val).decode(errors="replace")
        elif fnum == 3:
            plane["lines"].append(val)  # lazy: parse later
        elif fnum == 4:
            k, v = _map_entry(val)
            name = ""
            disp = ""
            for f2, _, v2 in fields(v):
                if f2 == 2:
                    name = bytes(v2).decode(errors="replace")
                elif f2 == 3:
                    disp = bytes(v2).decode(errors="replace")
            plane["event_meta"][k] = disp or name
    return plane


def parse_line(buf: memoryview) -> dict:
    line = {"name": "", "events": []}
    for fnum, _, val in fields(buf):
        if fnum == 2 and not line["name"]:
            line["name"] = bytes(val).decode(errors="replace")
        elif fnum == 11:
            line["name"] = bytes(val).decode(errors="replace")
        elif fnum == 4:
            mid = dur = 0
            for f2, _, v2 in fields(val):
                if f2 == 1:
                    mid = v2
                elif f2 == 3:
                    dur = v2
            line["events"].append((mid, dur))
    return line


def load_xspace(path: str) -> list[dict]:
    """Parse an .xplane.pb file -> list of planes (lines parsed eagerly)."""
    data = memoryview(open(path, "rb").read())
    planes = []
    for fnum, _, val in fields(data):
        if fnum == 1:
            p = parse_plane(val)
            p["lines"] = [parse_line(l) for l in p["lines"]]
            planes.append(p)
    return planes


def find_xplane(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(
        glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not hits:
        raise FileNotFoundError(f"no .xplane.pb under {path}")
    return hits[-1]


def aggregate(planes: list[dict], device_only: bool = True) -> dict:
    """{plane_name: {line_name: [(op_name, total_ps, count), ...]}} sorted
    by total descending."""
    out = {}
    for p in planes:
        if device_only and not (
            "TPU" in p["name"] or "GPU" in p["name"] or "Device" in p["name"]
        ):
            continue
        lines = {}
        for line in p["lines"]:
            tot: dict[str, list] = {}
            for mid, dur in line["events"]:
                name = p["event_meta"].get(mid, f"#{mid}")
                e = tot.setdefault(name, [0, 0])
                e[0] += dur
                e[1] += 1
            lines[line["name"]] = sorted(
                ((k, v[0], v[1]) for k, v in tot.items()),
                key=lambda t: -t[1],
            )
        out[p["name"]] = lines
    return out


def main() -> None:
    args = sys.argv[1:]
    top = 40
    host = "--host" in args
    if "--top" in args:
        i = args.index("--top")
        top = int(args[i + 1])
        del args[i : i + 2]
    args = [a for a in args if not a.startswith("--")]
    path = find_xplane(args[0] if args else "/tmp/jax-trace")
    print(f"# {path}")
    agg = aggregate(load_xspace(path), device_only=not host)
    for plane, lines in agg.items():
        print(f"\n== plane: {plane}")
        for lname, ops in lines.items():
            total_ps = sum(t for _, t, _ in ops)
            print(f"-- line: {lname}  (total {total_ps/1e9:.3f} ms)")
            for name, ps, cnt in ops[:top]:
                print(f"  {ps/1e9:9.3f} ms  x{cnt:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
