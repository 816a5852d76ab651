import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Tests run on a virtual CPU mesh: 8 devices regardless of real hardware.
# (The axon sitecustomize imports jax at interpreter start, so JAX_PLATFORMS
# may already be consumed; jax.config.update still works.)
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
try:
    import jax
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
