"""Op-level profile of one denoise step (jax.profiler -> xplane -> table).

Captures a trace of a single full-scale CFG-batched denoise step and
prints the top ops by self-time from the xplane protobuf via
tensorboard_plugin_profile. If the tunnel backend exposes no device
plane, reports what it finds.

  python benchmarks/profile_step.py [--tiny]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import glob
import json
import os
import tempfile

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--workload", default="video",
                    choices=["video", "image"])
    ap.add_argument("--batch", type=int, default=4,
                    help="image workload serving batch")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.expanduser("~"), ".cache", "jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    import bench  # repo-root bench harness
    execute, _flops = bench.build(
        frames=4 if args.tiny else args.frames,
        res=16 if args.tiny else args.res,
        steps=2, tiny=args.tiny, scan=False, workload=args.workload,
        batch=args.batch)

    execute(0)  # compile + warm outside the trace

    logdir = tempfile.mkdtemp(prefix="vst_trace_")
    jax.profiler.start_trace(logdir)
    execute(12345)
    jax.profiler.stop_trace()

    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    print("xplane files:", files)
    if not files:
        return

    try:
        # tensorboard_plugin_profile's generated protos are incompatible
        # with the installed protobuf (Descriptors error); the repo's own
        # parser below is the supported path — this branch is best-effort
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
        for tool in ["framework_op_stats", "op_profile"]:
            data, _ = rtd.xspace_to_tool_data(files, tool, {})
            out = os.path.join(logdir, tool + ".json")
            with open(out, "wb") as f:
                f.write(data if isinstance(data, bytes)
                        else data.encode())
            print(f"wrote {out} ({os.path.getsize(out)} bytes)")
    except Exception as e:
        print(f"tensorboard_plugin_profile unavailable ({e!r}); "
              f"falling back to benchmarks/xplane_report.py")
        import subprocess
        subprocess.run([sys.executable,
                        os.path.join(os.path.dirname(
                            os.path.abspath(__file__)),
                            "xplane_report.py"),
                        files[0], "--categorized", "--top", str(args.top)],
                       check=False)


if __name__ == "__main__":
    main()
