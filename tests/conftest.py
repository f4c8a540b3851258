import os
import sys

# Tests run on a virtual 8-device CPU mesh. The harness environment exports
# JAX_PLATFORMS=axon (the real TPU tunnel); override it — remote-compiling
# every tiny test program through the tunnel is both slow and lacks f64
# linalg. Must happen before jax import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
