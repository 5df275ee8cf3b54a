"""Aggregate op self-times from a captured .xplane.pb trace.

The tensorboard_plugin_profile converter in this image is incompatible
with the installed TF (protobuf descriptor + missing pywrap symbol), so
this parses the XSpace proto directly via TF's vendored xplane_pb2 and
prints a per-op-name self-time table for the device plane.

  python benchmarks/xplane_report.py /path/to/*.xplane.pb [--top 40]
"""
import argparse
import collections
import re
import sys


def load_xspace(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def plane_tables(plane):
    emeta = {m.id: m.name for m in plane.event_metadata.values()}
    smeta = {m.id: m.name for m in plane.stat_metadata.values()}
    return emeta, smeta


def report(path, top, pattern=None):
    xs = load_xspace(path)
    print(f"planes: {[p.name for p in xs.planes]}")
    for plane in xs.planes:
        # device planes are named like '/device:TPU:0' or 'TPU:0' or
        # tunnel-specific; skip pure host planes
        name = plane.name.lower()
        if "host" in name and "tpu" not in name and "device" not in name:
            continue
        emeta, _ = plane_tables(plane)
        tot = collections.Counter()
        cnt = collections.Counter()
        for line in plane.lines:
            for ev in line.events:
                nm = emeta.get(ev.metadata_id, str(ev.metadata_id))
                if pattern and not re.search(pattern, nm):
                    continue
                tot[nm] += ev.duration_ps
                cnt[nm] += 1
        if not tot:
            continue
        total_ps = sum(tot.values())
        print(f"\n== plane {plane.name}  ({len(tot)} op names, "
              f"{total_ps/1e12*1000:.1f} ms summed event time)")
        print(f"{'ms':>9} {'%':>5} {'n':>5}  op")
        for nm, ps in tot.most_common(top):
            print(f"{ps/1e9:9.2f} {100*ps/total_ps:5.1f} {cnt[nm]:5d}  "
                  f"{nm[:110]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("xplane")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--pattern", default=None)
    a = ap.parse_args()
    report(a.xplane, a.top, a.pattern)
