import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

# Multi-device tests run on a virtual CPU mesh unless real hardware is present.
if "JAX_PLATFORMS" not in os.environ:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
