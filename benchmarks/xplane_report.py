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


def _category(nm):
    m = re.match(r'%([a-zA-Z\-_]+)[\.\d]* =', nm)
    op = m.group(1) if m else nm[:30]
    if op == 'fusion':
        k = re.search(r'kind=(\w+)', nm)
        op = 'fusion:' + (k.group(1) if k else '?')
    if 'tpu_custom_call' in nm:
        op = 'pallas'
    return op


def categorized(path, top=25):
    """Aggregate the device 'XLA Ops' line by op category (while/
    conditional wrappers excluded so totals match module wall time), plus
    a copy-by-shape table."""
    xs = load_xspace(path)
    plane = [p for p in xs.planes if 'TPU' in p.name and 'Host' not in
             p.name][0]
    emeta, _ = plane_tables(plane)
    line = [l for l in plane.lines if l.name == 'XLA Ops'][0]
    tot = collections.Counter()
    cnt = collections.Counter()
    byname = collections.Counter()
    copies = collections.Counter()
    for ev in line.events:
        nm = emeta.get(ev.metadata_id, str(ev.metadata_id))
        c = _category(nm)
        if c in ('while', 'conditional'):
            continue
        tot[c] += ev.duration_ps
        cnt[c] += 1
        byname[nm] += ev.duration_ps
        if c == 'copy':
            m = re.match(r'%copy[\.\d]* = (\S+) copy\((\S+?) ', nm)
            if m:
                copies[f"{m.group(2)} -> {m.group(1)}"] += ev.duration_ps
    T = sum(tot.values())
    print(f"total op time {T/1e9:.0f} ms")
    for c, ps in tot.most_common(top):
        print(f"{ps/1e9:9.1f} ms {100*ps/T:5.1f}% {cnt[c]:6d}  {c}")
    print("\ntop individual ops:")
    for nm, ps in byname.most_common(top):
        print(f"{ps/1e9:8.1f} ms  {nm[:140]}")
    print("\ntop copies by shape:")
    for k, ps in copies.most_common(15):
        print(f"{ps/1e9:8.1f} ms  {k[:150]}")


def kloop(path, top=30):
    """Decompose the kLoop long tail: group every kind=kLoop fusion
    event by (a) its JAX scope (the metadata 'tf_op'/'op_name' stat the
    trace carries for each HLO op — e.g. which named function emitted
    it) and (b) the fused computation's root op + output shape, so the
    1497-op tail becomes a handful of attributable buckets."""
    xs = load_xspace(path)
    plane = [p for p in xs.planes if 'TPU' in p.name and 'Host' not in
             p.name][0]
    emeta_full = {m.id: m for m in plane.event_metadata.values()}
    smeta = {m.id: m.name for m in plane.stat_metadata.values()}
    line = [l for l in plane.lines if l.name == 'XLA Ops'][0]

    def _stat_str(stat):
        if stat.str_value:
            return stat.str_value
        if stat.ref_value:
            return smeta.get(stat.ref_value, "")
        return ""

    by_scope = collections.Counter()
    by_shape = collections.Counter()
    cnt_scope = collections.Counter()
    cnt_shape = collections.Counter()
    total = 0
    n = 0
    for ev in line.events:
        meta = emeta_full.get(ev.metadata_id)
        nm = meta.name if meta else str(ev.metadata_id)
        if 'kind=kLoop' not in nm:
            continue
        total += ev.duration_ps
        n += 1
        # scope: prefer the per-op provenance stat if the trace has one
        scope = None
        stats = list(ev.stats) + (list(meta.stats) if meta else [])
        for st in stats:
            sname = smeta.get(st.metadata_id, "")
            if sname in ("tf_op", "op_name", "hlo_module",
                         "source_info"):
                v = _stat_str(st)
                if sname in ("tf_op", "op_name") and v:
                    # keep the last two scope segments: enough to name
                    # the emitting function without per-op noise
                    scope = "/".join(v.split("/")[-3:-1]) or v
                    break
        if scope is None:
            scope = "(no scope stat)"
        # shape bucket: output dtype+shape and the fused root op
        m = re.match(r'%\S+ = (\S+) fusion', nm)
        out = m.group(1) if m else "?"
        r = re.search(r'calls=%?([\w\-.]+)', nm)
        root = r.group(1) if r else "?"
        by_scope[scope] += ev.duration_ps
        cnt_scope[scope] += 1
        key = f"{out}  calls={root.rsplit('.', 1)[0]}"
        by_shape[key] += ev.duration_ps
        cnt_shape[key] += 1

    print(f"kLoop total {total/1e9:.1f} ms across {n} events")
    print("\nby JAX scope:")
    for k, ps in by_scope.most_common(top):
        print(f"{ps/1e9:8.2f} ms {cnt_scope[k]:5d}  {k[:110]}")
    print("\nby output shape + fused computation:")
    for k, ps in by_shape.most_common(top):
        print(f"{ps/1e9:8.2f} ms {cnt_shape[k]:5d}  {k[:120]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("xplane")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--pattern", default=None)
    ap.add_argument("--categorized", action="store_true")
    ap.add_argument("--kloop", action="store_true")
    a = ap.parse_args()
    if a.kloop:
        kloop(a.xplane, a.top)
    elif a.categorized:
        categorized(a.xplane, a.top)
    else:
        report(a.xplane, a.top, a.pattern)
