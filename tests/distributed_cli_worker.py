"""Worker for the REAL 2-process trainer-CLI test
(tests/test_distributed.py::test_two_process_cli_train_checkpoint_resume).

Runs the PRODUCTION stage-1 trainer CLI (cli/train_unziplora.py) under a
jax.distributed topology described by the JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars — the CLI's own
init_distributed call picks them up, exactly as a v5e-pod launch would.
All argv after the script name are passed to the CLI verbatim.
"""
import os
import sys

# the package is used from the repo root, not installed; subprocesses
# don't inherit pytest's rootdir path insertion
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

# the container sitecustomize force-registers the TPU plugin via
# jax.config.update; pin CPU before ANY backend query
jax.config.update("jax_platforms", "cpu")

from video_style_transfer_tpu.cli import train_unziplora

if __name__ == "__main__":
    train_unziplora.main(sys.argv[1:])
    print("cli worker done", flush=True)
