"""Frame-parallel collective-volume audit — AOT compile on a virtual
CPU mesh, no TPU needed.

The v5e-8 frame-parallel projection (PERF.md) assumes near-linear
scaling of the 16-frame denoise: spatial layers are frame-local and
only the temporal (motion) attention needs cross-frame data. This
script makes that assumption checkable: it compiles ONE production
frame-sharded CFG-pair UNet call at FULL SDXL shape over an
--devices-way 'frame' mesh, walks the optimized HLO for collective ops
(all-gather / all-reduce / collective-permute / all-to-all /
reduce-scatter), sums the bytes each moves, and models the per-step ICI
time at v5e link bandwidth against the measured per-step compute.

Collectives that sit inside a multi-trip while body (scan) would
execute once per iteration; the report lists the computation each
collective lives in and flags any inside a while body so the static
count is never silently wrong (the spatial transformer scans are
frame-local, so none are expected there).

  python benchmarks/collective_volume.py            # full SDXL shape
  python benchmarks/collective_volume.py --tiny     # wiring smoke
  python benchmarks/collective_volume.py --frames 8 --devices 8
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import re

import jax

jax.config.update("jax_platforms", "cpu")  # before any backend query

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "f64": 8, "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8}

COLLECTIVES = ("all-gather", "all-reduce", "collective-permute",
               "all-to-all", "reduce-scatter")


def shape_bytes(shape_str: str) -> int:
    """'bf16[16,4096,640]{2,1,0}' -> bytes; tuples sum their elements."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def parse_collectives(hlo_text: str):
    """Walk the HLO call graph from ENTRY and yield
    (op_kind, out_bytes, computation_name, multiplier) per STATIC
    collective: a collective inside a while body carries the loop's
    known_trip_count (XLA records it in backend_config), nested loops
    multiply, and fusion `calls=` edges carry multiplier 1. An unknown
    trip count yields multiplier -1 so the report can flag it instead
    of silently undercounting (the first audit version missed the
    transformer layer scans entirely this way)."""
    comps = {}  # name -> {"coll": [(kind, bytes)], "edges": [(callee, trip)]}
    cur = None

    def ensure(name):
        return comps.setdefault(name, {"coll": [], "edges": []})

    for line in hlo_text.splitlines():
        m = re.match(r"\s*%?([\w.\-]+)\s+\(.*\)\s*->.*\{\s*$", line)
        if m and not line.lstrip().startswith(("ROOT", "ENTRY")):
            cur = m.group(1)
            ensure(cur)
            continue
        if line.startswith("ENTRY"):
            cur = "ENTRY"
            ensure(cur)
            continue
        if cur is None:
            continue
        code = line.split(" metadata=")[0]
        for kind in COLLECTIVES:
            # sync spelling (`all-gather(`) or the async pair's -done op
            # (`all-gather-done(`), whose LHS is the collective's result
            # shape — the matching -start is deliberately NOT counted
            # (its LHS is an (operand, result) tuple; counting both
            # halves of the pair would double the bytes). Without the
            # -done match a TPU-compiled dump with async collectives
            # would be silently excluded from the audit.
            if (f" {kind}(" in code or f"= {kind}(" in code
                    or f" {kind}-done(" in code
                    or f"= {kind}-done(" in code):
                lhs = code.split("=", 1)
                out = lhs[1].split(kind)[0] if len(lhs) > 1 else code
                ensure(cur)["coll"].append((kind, shape_bytes(out)))
                break
        # call edges: while bodies carry the loop trip count; fusions,
        # conditions, branches and to_apply run once per reach
        if " while(" in code or "= while(" in code:
            body = re.search(r"body=%?([\w.\-]+)", code)
            cond = re.search(r"condition=%?([\w.\-]+)", code)
            trip = re.search(r'known_trip_count[^}]*"n":"(\d+)"', line)
            n = int(trip.group(1)) if trip else -1
            if body:
                ensure(cur)["edges"].append((body.group(1), n))
            if cond:
                ensure(cur)["edges"].append((cond.group(1), max(n, 1)))
        else:
            for m2 in re.finditer(
                    r"(?:calls|to_apply|body|condition)=%?([\w.\-]+)",
                    code):
                ensure(cur)["edges"].append((m2.group(1), 1))
            m3 = re.search(r"branch_computations=\{([^}]*)\}", code)
            if m3:
                for name in m3.group(1).split(","):
                    ensure(cur)["edges"].append(
                        (name.strip().lstrip("%"), 1))

    out = []

    def walk(name, mult, unknown, depth=0):
        node = comps.get(name)
        if node is None or depth > 64:
            return
        for kind, nbytes in node["coll"]:
            out.append((kind, nbytes, name, -1 if unknown else mult))
        for callee, trip in node["edges"]:
            if trip == -1:
                walk(callee, mult, True, depth + 1)
            else:
                walk(callee, mult * max(trip, 1), unknown, depth + 1)

    walk("ENTRY", 1, False)
    return out


def _build_train_step(args, mesh):
    """Full stage-2 train step (fwd + flash bwd + remat + masked AdamW)
    on a ('data','frame') mesh — the training-side audit target."""
    from video_style_transfer_tpu.config import UNetConfig
    from video_style_transfer_tpu.lora.surgery import (
        insert_temporal_lora, insert_unziplora, spatial_pairs)
    from video_style_transfer_tpu.models.unet import init_unet
    from video_style_transfer_tpu.schedulers.ddpm import make_schedule
    from video_style_transfer_tpu.training import stage2

    tiny = args.tiny
    cfg = (UNetConfig.tiny(use_motion_modules=True) if tiny
           else UNetConfig.sdxl(use_motion_modules=True))
    dt = jnp.bfloat16
    res = 16 if tiny else args.res
    vsf = 2 if tiny else 8
    f = 4 if tiny else args.frames

    def build(key):
        p = init_unet(key, cfg, dtype=dt)
        p, ls = insert_unziplora(p, key, rank=4 if tiny else 64, dtype=dt)
        p = insert_temporal_lora(p, key, rank=4 if tiny else 32, dtype=dt)
        return p, ls

    shapes = jax.eval_shape(build, jax.random.PRNGKey(0))
    params, state_z = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    def fix(tree, name=None):
        if isinstance(tree, dict):
            return {k: fix(v, k) for k, v in tree.items()}
        if name and name.startswith("on_"):
            return jnp.ones(tree.shape, tree.dtype)
        return tree

    lora_state = fix(state_z)
    pairs = spatial_pairs(params)
    mask = stage2.trainable_mask(params)
    opt = stage2.make_optimizer(mask, total_steps=1000)
    st = stage2.init_state(params, opt)
    sched = make_schedule()

    xdim = cfg.cross_attention_dim
    pooled_dim = (cfg.projection_class_embeddings_input_dim
                  - 6 * cfg.addition_time_embed_dim)
    lat = res // vsf
    b = mesh.shape.get("data", 1)
    batch = {
        "latents": jax.ShapeDtypeStruct((b, f, lat, lat, 4), dt),
        "ctx": jax.ShapeDtypeStruct((b, 77, xdim), dt),
        "pooled": jax.ShapeDtypeStruct((b, pooled_dim), dt),
        "time_ids": jax.ShapeDtypeStruct((b, 6), dt),
    }
    step = stage2.make_train_step(cfg, sched, opt, pairs, mask=mask,
                                  lora_state=lora_state, remat=True)

    shard = {
        "latents": NamedSharding(mesh, P("data", "frame")),
        "ctx": NamedSharding(mesh, P("data")),
        "pooled": NamedSharding(mesh, P("data")),
        "time_ids": NamedSharding(mesh, P("data")),
    }

    def fn(st_, batch_, key):
        batch_ = {k: jax.lax.with_sharding_constraint(v, shard[k])
                  for k, v in batch_.items()}
        return step(st_, batch_, key)

    return fn, (st, batch, jax.random.PRNGKey(0)), f, (b * f, lat, lat, 4)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--train", action="store_true",
                    help="audit the stage-2 TRAIN step (fwd + bwd + "
                         "remat + update) on a (data=2, frame=n/2) mesh "
                         "instead of the serving UNet call; --frames "
                         "then means frames PER SAMPLE (default 8)")
    ap.add_argument("--ici_gbps", type=float, default=45.0,
                    help="per-link ICI bandwidth, GB/s (v5e: ~45 GB/s "
                         "per direction per link, 2D torus)")
    ap.add_argument("--steps", type=int, default=30,
                    help="denoise steps (scales the per-generation total)")
    ap.add_argument("--dump", default=None,
                    help="write the optimized HLO text here")
    args = ap.parse_args()

    from video_style_transfer_tpu.config import UNetConfig
    from video_style_transfer_tpu.lora.surgery import insert_unziplora
    from video_style_transfer_tpu.models.unet import init_unet, unet_apply
    from video_style_transfer_tpu.parallel.mesh import create_mesh

    devices = jax.devices()[:args.devices]

    if args.train:
        if args.frames == 16:
            args.frames = 8  # stage-2 reference workload default
        mesh = create_mesh(devices, data=2 if args.devices % 2 == 0 else 1)
        fn, fn_args, f, latent = _build_train_step(args, mesh)
        with mesh:
            compiled = jax.jit(fn).lower(*fn_args).compile()
        rows, lat_hw = latent[0], latent[1]
    else:
        if args.tiny:
            cfg = UNetConfig.tiny(use_motion_modules=True)
            f, lat_hw, d, pooled = 4, 8, cfg.cross_attention_dim, 32
        else:
            cfg = UNetConfig.sdxl(use_motion_modules=True)
            f, lat_hw, d, pooled = args.frames, args.res // 8, 2048, 1280

        mesh = create_mesh(devices)  # every device on 'frame'

        def abstract(fn, *a):
            return jax.eval_shape(fn, *a)

        def build(key):
            params = init_unet(key, cfg, dtype=jnp.bfloat16)
            return insert_unziplora(params, key,
                                    rank=4 if args.tiny else 64,
                                    dtype=jnp.bfloat16)

        params_s, state_s = abstract(build, jax.random.PRNGKey(0))

        rows = 2 * f  # CFG-doubled pair
        lat = jax.ShapeDtypeStruct((rows, lat_hw, lat_hw, 4), jnp.bfloat16)
        t = jax.ShapeDtypeStruct((2,), jnp.float32)
        ctx = jax.ShapeDtypeStruct((2, 77, d), jnp.bfloat16)
        pool = jax.ShapeDtypeStruct((2, pooled), jnp.bfloat16)
        tids = jax.ShapeDtypeStruct((2, 6), jnp.bfloat16)

        # the lora state carries concrete gate booleans at trace time in
        # the real pipeline; abstract bools suffice for sharding/
        # collective analysis as unet_apply treats them as arrays, not
        # Python branches
        def fn(p, st, lat, t, ctx, pool, tids):
            lat = jax.lax.with_sharding_constraint(
                lat, NamedSharding(mesh, P("frame")))
            out = unet_apply(p, cfg, lat, t, (ctx, ctx, ctx), pool, tids,
                             mode="both", state=st, num_frames=f,
                             impl="auto")
            return jax.lax.with_sharding_constraint(
                out, NamedSharding(mesh, P("frame")))

        with mesh:
            lowered = jax.jit(fn).lower(params_s, state_s, lat, t, ctx,
                                        pool, tids)
            compiled = lowered.compile()
    txt = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as fh:
            fh.write(txt)

    per_kind = {}
    rows_out = []
    flagged = []
    total = 0
    for kind, nbytes, comp, mult in parse_collectives(txt):
        eff = nbytes * max(mult, 1)
        per_kind[kind] = per_kind.get(kind, 0) + eff
        total += eff
        rows_out.append({"op": kind, "bytes": eff, "static_bytes": nbytes,
                         "trip_multiplier": mult, "computation": comp})
        if mult == -1:
            flagged.append(comp)

    n = args.devices
    # ring all-gather moves (n-1)/n of the GLOBAL tensor through each
    # link; HLO output bytes are the global (gathered) size
    wire = total * (n - 1) / n
    ici_s = wire / (args.ici_gbps * 1e9)
    report = {
        "mode": "stage2_train_step" if args.train else "serving_unet_call",
        "mesh_devices": n,
        "mesh": dict(mesh.shape),
        "frames": f,
        "latent": [rows, lat_hw, lat_hw, 4],
        "collective_ops": len(rows_out),
        "bytes_per_unet_call": total,
        "bytes_by_kind": per_kind,
        "wire_bytes_per_call_per_link_est": int(wire),
        "ici_seconds_per_call_est": round(ici_s, 6),
        "ici_seconds_per_generation_est": round(ici_s * args.steps, 4),
        "unknown_trip_count_flagged": sorted(set(flagged)),
    }
    print(json.dumps(report, indent=1))
    if rows_out:
        print("\nper-op detail (bytes include loop trip multipliers):")
        for r in sorted(rows_out, key=lambda r: -r["bytes"])[:20]:
            extra = (f"  x{r['trip_multiplier']} loop trips"
                     if r["trip_multiplier"] > 1 else
                     ("  [UNKNOWN trip count]"
                      if r["trip_multiplier"] == -1 else ""))
            print(f"  {r['op']:<20} {r['bytes']/1e6:10.2f} MB  "
                  f"in {r['computation']}{extra}")


if __name__ == "__main__":
    main()
