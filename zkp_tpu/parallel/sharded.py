"""Multi-chip sharding: mesh MSM and distributed NTT via shard_map.

The reference's only parallelism is rayon shared-memory threads
(SURVEY.md 2.3); there is no distributed backend at all.  Here the two hot
kernels scale across a ``jax.sharding.Mesh``:

  - ``sharded_msm``: points/scalars sharded over the ``points`` mesh axis
    (the DP analog); each device runs the full local Pippenger, partial
    results are all-gathered (one Jacobian point per device, a few hundred
    bytes over ICI) and tree-reduced.  Communication is O(devices), compute
    is N/devices -> near-linear scaling by construction.
  - ``DistNTT``: the four-step NTT. coefficients live as an (N1, N2) matrix
    sharded over columns; step 1 (length-N1 column NTTs) is local, the
    twiddle multiply is local against a same-sharded table, one
    ``all_to_all`` re-shards rows<->columns (the butterfly-stage exchange
    over ICI called out in BASELINE.json), and step 3 (length-N2 row NTTs)
    is local.  This is the SP/sequence-parallel analog (SURVEY.md section 5
    "long-context").

Everything works on an 8-virtual-device CPU mesh for tests
(XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

# check_rep/check_vma=False: the limb kernels' scan carries start from
# replicated constants (infinity points, SENTINEL keys); JAX >= 0.9's
# varying-manual-axes type system rejects those inside shard_map unless
# every init is pcast to varying.  Disabling the rep-check restores the
# (correct) untyped behavior -- results are identical.
shard_map = functools.partial(jax.shard_map, check_vma=False)

from ..curve.weierstrass import Weierstrass
from ..field.fp import ints_to_limbs
from ..msm.pippenger import _msm_impl, default_window_bits
from ..ntt.ntt import Domain, domain_for


def make_mesh(n_devices: int | None = None, axis: str = "points") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


@functools.lru_cache(maxsize=None)
def _sharded_msm_fn(curve: Weierstrass, mesh: Mesh, axis: str, c: int, block: int):
    """Build (once per (curve, mesh, axis, c, block)) the jitted sharded MSM.

    The jitted callable MUST be cached: ``jax.jit`` keys its executable cache
    on function identity, so re-wrapping a fresh closure per call recompiles
    the whole limb graph every time (~60 s per call on a 2-vCPU host --
    the round-1/2 dryrun rc=124 timeouts traced to exactly this).
    """
    pspec = P(axis)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(pspec, pspec, pspec, pspec), out_specs=P())
    def _local(xs, ys, inf, sc):
        part = _msm_impl(curve, xs, ys, inf, sc, c=c, block=block)
        gathered = tuple(
            jax.lax.all_gather(coord, axis) for coord in part)  # (ndev, ...)
        return curve.reduce_sum(gathered)

    return jax.jit(_local)


def sharded_msm(curve: Weierstrass, mesh: Mesh, xs, ys, inf, scalar_limbs,
                c: int | None = None, block: int | None = None,
                axis: str | None = None):
    """MSM with points sharded across the mesh; result replicated."""
    axis = axis or mesh.axis_names[0]
    ndev = mesh.shape[axis]
    n = xs.shape[0]
    n_local = -(-n // ndev)
    if c is None:
        c = default_window_bits(n_local)
    if block is None:
        block = int(min(512, max(8, n_local // 128)))
    pad = n_local * ndev - n
    if pad:
        xs = jnp.concatenate([xs, jnp.zeros((pad,) + xs.shape[1:], xs.dtype)])
        ys = jnp.concatenate([ys, jnp.zeros((pad,) + ys.shape[1:], ys.dtype)])
        inf = jnp.concatenate([inf, jnp.ones((pad,), bool)])
        scalar_limbs = jnp.concatenate(
            [scalar_limbs, jnp.zeros((pad, scalar_limbs.shape[-1]), scalar_limbs.dtype)])

    return _sharded_msm_fn(curve, mesh, axis, int(c), int(block))(
        xs, ys, inf, scalar_limbs)


@functools.lru_cache(maxsize=None)
def _sharded_kmsm_fn(kg, mesh: Mesh, axis: str, c: int, B: int, nbits: int):
    """Jitted sharded KERNEL MSM (cached per (kg, mesh, axis, c, B, nbits)).

    Each device runs the full Pallas Pippenger (msm_tpu) on its point shard;
    the per-device results (one packed Jacobian row each) are all-gathered
    (3R u32 words/device over ICI) and tree-reduced with the Pallas add
    kernel.  This is the fast-path analog of ``_sharded_msm_fn`` -- on real
    hardware the multi-chip prover must scale the kernel path, not the XLA
    limb graph (~1000x slower, PERF_NOTES.md)."""
    from ..msm.msm_tpu import msm_tpu, _reduce_chunks

    pspec = P(axis)

    @functools.partial(shard_map, mesh=mesh, in_specs=(pspec, pspec),
                       out_specs=P())
    def _local(pa, sc):
        out = msm_tpu(kg, pa, sc, c=c, B=B, nbits=nbits)       # (1, 3R)
        g = jax.lax.all_gather(out, axis)                      # (ndev, 1, 3R)
        rows = g.reshape(-1, 3 * kg.R)
        ndev = rows.shape[0]
        inf_row = kg.from_klayout(kg.jac_infinity(1))[:1]
        rows = jnp.concatenate(
            [rows, jnp.tile(inf_row, (128 - ndev, 1))], axis=0)
        kv = _reduce_chunks(kg, kg.to_klayout(rows), 128, ndev)
        return kg.from_klayout(kv)[:1]

    return jax.jit(_local)


def sharded_msm_kernel(curve_ops, mesh: Mesh, which: str, xs, ys, inf,
                       scalar_limbs, c: int | None = None,
                       B: int | None = None, axis: str | None = None):
    """Kernelized sharded MSM: points sharded over the mesh axis, each shard
    through the Pallas Pippenger pipeline.  Returns a Jacobian tuple in the
    fp.py conventions (same as MSMKernel.__call__)."""
    from ..msm.msm_tpu import MSMKernel

    axis = axis or mesh.axis_names[0]
    ndev = mesh.shape[axis]
    mk = MSMKernel(curve_ops, which)
    kg = mk.kg
    n = xs.shape[0]
    n_local = -(-n // ndev)
    # per-device padded length: power of two, floor 2^14 (the kernel needs
    # >= 128*B lanes; padding points are infinity so results are exact)
    npad_local = max(1 << 14, 1 << (int(n_local - 1)).bit_length())
    Npad = npad_local * ndev
    if c is None:
        c = int(min(16, max(8, n_local.bit_length() - 4)))
    if B is None:
        B = max(128, -(-npad_local // 2048))
    assert npad_local % (128 * B) == 0
    pa = mk.pack(xs, ys, inf)
    if Npad != n:
        pad = jnp.zeros((Npad - n, pa.shape[1]), jnp.uint16)
        pad = pad.at[:, 4 * kg.k.PCR].set(1)  # infinity marker
        pa = jnp.concatenate([pa, pad], axis=0)
        scalar_limbs = jnp.concatenate(
            [scalar_limbs,
             jnp.zeros((Npad - n, scalar_limbs.shape[1]), scalar_limbs.dtype)])
    nbits = curve_ops.params.r.bit_length()
    out = _sharded_kmsm_fn(kg, mesh, axis, int(c), int(B), nbits)(
        pa, scalar_limbs)
    R = kg.R
    X, Y, Z = out[0, :R], out[0, R:2 * R], out[0, 2 * R:]
    fq_n = curve_ops.fq.n
    sd = (2, fq_n) if which == "g2" else (fq_n,)
    return X.reshape(sd), Y.reshape(sd), Z.reshape(sd)


KERNEL_MIN_LOCAL_N = 129   # mirror Prover.KERNEL_MIN_N: below this the
                           # double-and-add XLA path wins and compiles fast


def sharded_msm_auto(curve_ops, mesh: Mesh, which: str, xs, ys, inf,
                     scalar_limbs, axis: str | None = None,
                     c: int | None = None, block: int | None = None):
    """Path selection for the multi-chip prover: the Pallas kernel pipeline
    on TPU when per-device shards are big enough to amortize it, else the
    XLA limb path (CPU meshes, tiny fixtures, dryrun).  ``c``/``block``
    tune the XLA path only; the kernel path picks its own window/block
    geometry from the shard size."""
    axis_name = axis or mesh.axis_names[0]
    ndev = mesh.shape[axis_name]
    n_local = -(-xs.shape[0] // ndev)
    if jax.default_backend() == "tpu" and n_local >= KERNEL_MIN_LOCAL_N:
        return sharded_msm_kernel(curve_ops, mesh, which, xs, ys, inf,
                                  scalar_limbs, axis=axis_name)
    curve = curve_ops.g1 if which == "g1" else curve_ops.g2
    return sharded_msm(curve, mesh, xs, ys, inf, scalar_limbs,
                       c=c, block=block, axis=axis_name)


class DistNTT:
    """Four-step distributed NTT over a mesh axis (coefficient sharding)."""

    def __init__(self, curve_params, log_n: int, mesh: Mesh, axis: str | None = None):
        self.mesh = mesh
        self.axis = axis or mesh.axis_names[0]
        ndev = mesh.shape[self.axis]
        self.log_n = log_n
        self.n = 1 << log_n
        log_n1 = log_n // 2
        self.n1 = 1 << log_n1
        self.n2 = self.n // self.n1
        if self.n2 % ndev or self.n1 % ndev:
            raise ValueError(f"need device count dividing both {self.n1} and {self.n2}")
        fr = curve_params.fr
        self.fr = fr
        self.dom1: Domain = domain_for(curve_params, log_n1)
        self.dom2: Domain = domain_for(curve_params, log_n - log_n1)
        omega = curve_params.domain_root(log_n)

        # twiddle matrix T[j1, k2] = omega^(j1*k2), sharded over rows (j1)
        p, R = fr.p, fr.R_int
        rows = []
        wj1 = 1
        for _ in range(self.n1):
            row = []
            acc = 1
            for _ in range(self.n2):
                row.append(acc * R % p)
                acc = acc * wj1 % p
            rows.append(row)
            wj1 = wj1 * omega % p
        flat = [v for row in rows for v in row]
        self.twiddle = jnp.asarray(
            ints_to_limbs(flat, fr.n).reshape(self.n1, self.n2, fr.n))

        ax = self.axis

        def _impl(x, tw):
            # x: local (n1/D, n2, L) — full rows of A[j1, j2]
            f = self.fr
            x = self.dom2.ntt(x)                 # step 1: length-n2 NTT per row
            x = f.mul(x, tw)                     # step 2: twiddle w^(j1*k2)
            # step 3: reshard rows -> columns over ICI, then length-n1 NTTs
            x = jax.lax.all_to_all(x, ax, split_axis=1, concat_axis=0, tiled=True)
            xt = jnp.swapaxes(x, 0, 1)           # (n2/D, n1, L)
            xt = self.dom1.ntt(xt)
            return jnp.swapaxes(xt, 0, 1)        # C[k1, k2] local (n1, n2/D, L)

        self._impl = _impl

        # jit ONCE here: re-wrapping a fresh closure per ntt() call would
        # recompile the whole sharded graph every time (jit caches by
        # function identity).
        self._run = jax.jit(functools.partial(
            shard_map, mesh=self.mesh,
            in_specs=(P(ax, None), P(ax, None)),
            out_specs=P(None, ax))(_impl))

    def ntt(self, coeffs):
        """coeffs: (N, L) natural order -> evals (N, L) natural order.

        Input element j maps to matrix cell A[j % n1, j // n1]; output cell
        C[k1, k2] is X[n2*k1 + k2] so the returned flat layout is natural
        order.
        """
        fr = self.fr
        x = coeffs.reshape(self.n2, self.n1, fr.n).swapaxes(0, 1)  # A[j1, j2]
        out = self._run(x, self.twiddle)            # C[k1, k2] sharded by k2
        return out.reshape(self.n, fr.n)


@functools.lru_cache(maxsize=None)
def _batched_intt_fn(curve_params, log_n: int, mesh: Mesh, axis: str):
    dom = domain_for(curve_params, log_n)

    @functools.partial(shard_map, mesh=mesh, in_specs=P(axis), out_specs=P(axis))
    def run(x):
        return dom.intt(x)

    return jax.jit(run)


def batched_intt_sharded(curve_params, log_n: int, mesh: Mesh, batch_arr,
                         axis: str | None = None):
    """Embarrassingly parallel per-polynomial iNTTs sharded over the batch
    axis (the per-variable interpolation workload of QAP::from_r1cs)."""
    axis = axis or mesh.axis_names[0]
    return _batched_intt_fn(curve_params, log_n, mesh, axis)(batch_arr)
