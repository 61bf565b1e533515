"""Test config: force the CPU backend with 8 virtual devices so multi-chip
sharding logic (mesh MSM/NTT, dryrun_multichip) is exercised without a pod.

Note: this environment's sitecustomize registers the axon TPU plugin and
overrides JAX_PLATFORMS, so the env var alone is not enough -- we must also
update jax.config after import.  Tests MUST run on CPU: the axon TPU is a
single-client tunnel and concurrent test processes deadlock on it.
"""

import os
import sys

# XLA:CPU's compiler segfaulted twice under heavy concurrent memory
# pressure (round-4 log; both tests pass solo).  If it is an LLVM stack
# overflow, a raised stack limit (inherited by XLA's compile threads)
# prevents it; harmless otherwise.
try:
    import resource
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
except Exception:
    pass

_USE_TPU = os.environ.get("ZKP_TESTS_TPU", "") == "1"  # opt-in hardware runs

flags = os.environ.get("XLA_FLAGS", "")
if not _USE_TPU and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compile cache: TPU runs only.  XLA:CPU AOT cache entries embed
# host CPU features (plus tuning pseudo-features like +prefer-no-gather that
# never match at load time) and a partially-written entry from an interrupted
# run SEGFAULTS the whole process on reload (observed round 3) -- for CPU
# runs the cache is a correctness hazard, not a speedup.
_REPO_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           ".jax_cache")
if _USE_TPU:
    os.makedirs(_REPO_CACHE, exist_ok=True)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _REPO_CACHE)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
else:
    os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
