import os
import sys

# Run device tests on a virtual 8-device CPU mesh so sharding logic is
# exercised without TPU hardware; real-TPU benchmarking happens in bench.py.
# NOTE: this environment force-registers an 'axon' TPU backend at interpreter
# startup (sitecustomize) and ignores the JAX_PLATFORMS env var, so the
# platform must be forced via jax.config before any computation runs.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
