"""Summarize a jax.profiler xplane trace: per-plane top ops by total
duration. Usage: python tools/parse_xplane.py /tmp/xprof_wire [top_n]"""

import glob
import gzip
import sys
from collections import defaultdict


def load_xspace(root):
    import os, sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _xplane import load_xplane_pb2
    xplane_pb2 = load_xplane_pb2()
    paths = glob.glob(f"{root}/**/*.xplane.pb", recursive=True)
    if not paths:
        raise SystemExit(f"no .xplane.pb under {root}")
    xs = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xs.ParseFromString(f.read())
    return xs, paths[0]


def main():
    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    xs, path = load_xspace(root)
    print(f"# {path}")
    for plane in xs.planes:
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        total = defaultdict(int)
        count = defaultdict(int)
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, f"id{ev.metadata_id}")
                total[name] += ev.duration_ps
                count[name] += 1
        if not total:
            continue
        tsum = sum(total.values())
        print(f"\n== plane: {plane.name}  lines={len(plane.lines)}  "
              f"total {tsum/1e12*1e3:.2f} ms (sum of event durations)")
        for name, ps in sorted(total.items(), key=lambda kv: -kv[1])[:top_n]:
            print(f"  {ps/1e9:10.3f} ms  x{count[name]:<6d} "
                  f"{ps/tsum*100:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
