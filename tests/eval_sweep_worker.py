"""Worker for tests/test_cli_workflows.py::test_eval_sweep_two_process:
joins a 2-process CPU jax.distributed job and runs the eval sweep over
pre-rendered model dirs."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import eval_sweep  # noqa: E402

if __name__ == "__main__":
    out = sys.argv[1]
    models = sys.argv[2:]
    eval_sweep.main(["-m", *models, "--skip_render", "--out", out])
    print("WORKER_DONE", flush=True)
