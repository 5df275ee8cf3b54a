"""Op-level profile of the fp32 VAE decode (one 1024^2 frame).

The decode is the second-largest e2e component (~3.3 s for 16 frames at
chunk 1). An earlier spot-check attributed ~60% of chunk time to XLA's
space-to-batch lowering plumbing (copy/select/broadcast around the
big-spatial decoder convs); this captures a clean trace for the
categorized breakdown:

  python benchmarks/profile_decode.py
  python benchmarks/xplane_report.py <pb> --categorized
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glob
import tempfile

import jax


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.expanduser("~"), ".cache", "jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    import bench
    execute, _flops = bench.build_decode(tiny=False, frames=1, res=1024)
    execute(0)

    logdir = tempfile.mkdtemp(prefix="vst_dec_trace_")
    jax.profiler.start_trace(logdir)
    execute(12345)
    jax.profiler.stop_trace()
    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    print("xplane files:", files)


if __name__ == "__main__":
    main()
