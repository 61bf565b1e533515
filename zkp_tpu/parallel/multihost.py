"""Multi-host runtime: jax.distributed initialization + pod-mesh helpers.

The reference is single-process (SURVEY.md 2.3: no distributed backend at
all); this module is the SURVEY-planned multi-host entry point.  One
process per host joins the coordinator, every process sees the global
device set, and the prover's MSM/NTT sharding (parallel.sharded) runs
over a mesh spanning the whole slice -- XLA routes collectives over ICI
within a slice and DCN across slices.

Typical pod launch (one command per host, e.g. via gcloud alpha compute
tpus tpu-vm ssh --worker=all):

    python -m zkp_tpu.parallel.multihost --coordinator <host0>:8476 \
        --num-processes 4 --process-id $WORKER_ID --smoke

or from library code:

    from zkp_tpu.parallel.multihost import init_multihost, pod_mesh
    init_multihost()            # env/TPU-metadata autodetection
    mesh = pod_mesh("points")
    prover = Prover(ops, mesh=mesh)   # every prover MSM is now pod-sharded

On a single host (or under tests) ``init_multihost`` is a no-op and
``pod_mesh`` spans the local devices, so the same program runs unchanged.
"""

from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh

_INITIALIZED = False


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None,
                   local_device_ids=None) -> bool:
    """Join (or skip) the multi-process JAX runtime.

    Returns True when jax.distributed was initialized by this call.  With
    no arguments: initializes iff a coordinator is discoverable (explicit
    args, JAX_COORDINATOR_ADDRESS env, or TPU pod metadata via jax's own
    autodetection); otherwise stays single-process.  Safe to call twice.
    """
    global _INITIALIZED
    if _INITIALIZED or jax.process_count() > 1:
        _INITIALIZED = True
        return False
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS") or None
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    explicit = coordinator_address is not None
    on_tpu_pod = jax.default_backend() == "tpu" and os.environ.get(
        "TPU_WORKER_HOSTNAMES") not in (None, "")
    if not explicit and not on_tpu_pod:
        return False           # single-host: nothing to join
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    _INITIALIZED = True
    return True


def pod_mesh(axis: str = "points", devices=None) -> Mesh:
    """1-D mesh over ALL global devices (every host's chips).

    With multiple axes wanted (e.g. points x windows), reshape here; the
    prover's DP-analog sharding only needs the flat points axis."""
    devs = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devs), (axis,))


def process_info() -> dict:
    """Diagnostic summary of the distributed runtime."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": [str(d) for d in jax.local_devices()],
        "global_device_count": len(jax.devices()),
        "backend": jax.default_backend(),
    }


def _smoke():
    """One sharded MSM across the pod mesh (tiny, toy curve)."""
    import jax.numpy as jnp
    from ..curve.curves import curve_ops
    from ..ref.pyref import CurveRef
    from .sharded import sharded_msm_auto

    info = process_info()
    print(f"[proc {info['process_index']}/{info['process_count']}] "
          f"devices={info['global_device_count']} backend={info['backend']}",
          flush=True)
    ops = curve_ops(os.environ.get("ZKP_MULTIHOST_CURVE", "toy_bn3"))
    ref = CurveRef(ops.params)
    mesh = pod_mesh()
    n = 8 * len(jax.devices())
    ks = ops.fr.random_ints(1, n, nonzero=True)
    pts = [ref.g1_mul(k, ref.g1) for k in ks]
    xs = ops.fq.encode([p[0] for p in pts])
    ys = ops.fq.encode([p[1] for p in pts])
    inf = jnp.zeros((n,), bool)
    scalars = ops.fr.random_ints(2, n)
    got = sharded_msm_auto(ops, mesh, "g1", xs, ys, inf,
                           ops.encode_scalars(scalars))
    gx, gy, _ = ops.g1.to_affine(tuple(t[None] for t in got))
    expect = None
    for k, p in zip(scalars, pts):
        expect = ref.g1_add(expect, ref.g1_mul(k, p))
    ok = (int(ops.fq.decode(gx[0])), int(ops.fq.decode(gy[0]))) == expect
    print(f"[proc {info['process_index']}] pod-sharded MSM "
          f"({len(jax.devices())} devices): {'OK' if ok else 'MISMATCH'}",
          flush=True)
    assert ok


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description="zkp_tpu multi-host runtime")
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (omit for autodetection)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--smoke", action="store_true",
                    help="run a pod-sharded MSM smoke test")
    args = ap.parse_args()
    joined = init_multihost(args.coordinator, args.num_processes,
                            args.process_id)
    print(f"distributed initialize: {'joined' if joined else 'single-process'}"
          f" -> {process_info()}", flush=True)
    if args.smoke:
        _smoke()
