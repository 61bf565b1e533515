"""Profile XLA-CPU compile times of the dryrun_multichip pieces."""
import os, sys, time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from zkp_tpu.curve.curves import curve_ops
from zkp_tpu.field import bls12_381
from zkp_tpu.parallel.sharded import DistNTT, make_mesh, sharded_msm

ops = curve_ops("bls12_381")
fr, g1, g2 = ops.fr, ops.g1, ops.g2
mesh = make_mesh(8, axis="points")

N = 16
ks = fr.random(seed=1, shape=(N,), mont=False)
gx, gy = ops.g1_gen_affine
xs = jnp.broadcast_to(gx, (N,) + gx.shape)
ys = jnp.broadcast_to(gy, (N,) + gy.shape)
inf = jnp.zeros((N,), bool)

t0 = time.time()
out = sharded_msm(g1, mesh, xs, ys, inf, ks, c=4, block=2)
jax.block_until_ready(out)
print(f"sharded G1 MSM compile+run: {time.time()-t0:.1f}s", flush=True)

g2x, g2y = ops.g2_gen_affine
xs2 = jnp.broadcast_to(g2x, (N,) + g2x.shape)
ys2 = jnp.broadcast_to(g2y, (N,) + g2y.shape)
t0 = time.time()
out = sharded_msm(g2, mesh, xs2, ys2, inf, ks, c=4, block=2)
jax.block_until_ready(out)
print(f"sharded G2 MSM compile+run: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
dn = DistNTT(bls12_381(), 6, mesh)
coeffs = fr.encode(fr.random_ints(9, 64))
jax.block_until_ready(dn.ntt(coeffs))
print(f"DistNTT compile+run: {time.time()-t0:.1f}s", flush=True)
