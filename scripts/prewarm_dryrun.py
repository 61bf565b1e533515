"""Prewarm the repo-local XLA compile cache for dryrun_multichip(8) on CPU."""
import os, time, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
t0 = time.time()
import __graft_entry__
__graft_entry__.dryrun_multichip(8)
print(f"dryrun_multichip(8) wall: {time.time()-t0:.1f}s", flush=True)
