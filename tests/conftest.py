"""Test config: force the CPU backend with 8 virtual devices so multi-chip
sharding logic (mesh MSM/NTT, dryrun_multichip) is exercised without a pod.
Must run before jax is imported anywhere."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# persistent compile cache: the limb-arithmetic graphs are big; don't recompile
# them on every pytest invocation
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/zkp_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
