"""Minimal second-order repro for the row-sharded Qeq CG: a toy energy
E(pos, c) = sum_i q_i(pos, c*chi0) * s_i(pos), F = -dE/dpos,
L = sum |F|^2 — compare dL/dc between the sharded solve (inside
shard_map, both gradient formulations) and the dense single-device solve."""
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from gcnn_keras_tpu.parallel.mesh import make_mesh
from gcnn_keras_tpu.layers.conv.qeq_solver import solve_qeq_rows_in_shard_map

D = 4
N = 32  # divisible by D
rs = np.random.RandomState(0)
pos0 = (rs.rand(N, 3) * 4).astype(np.float32)
sig = (0.5 + rs.rand(N) * 0.5).astype(np.float32)
diag = (1.0 + rs.rand(N)).astype(np.float32)
chi0 = rs.randn(N).astype(np.float32)
mask = np.ones(N, bool)
qtot = np.float32(0.0)
TOL = 1e-12

mesh = make_mesh(D)
axis = "data"
ml = N // D


def dense_solve(pos, chi):
    import math
    diff = pos[:, None, :] - pos[None, :, :]
    d = jnp.sqrt(jnp.sum(diff * diff, -1) + 1e-12)
    gamma = jnp.sqrt(sig[:, None] ** 2 + sig[None, :] ** 2 + 1e-12)
    off = jax.scipy.special.erf(d / (gamma * math.sqrt(2.0))) / d
    off = jnp.where(jnp.eye(N, dtype=bool), 0.0, off)
    a = off + jnp.diag(jnp.asarray(diag))
    aa = jnp.zeros((N + 1, N + 1))
    aa = aa.at[:N, :N].set(a).at[:N, N].set(1.0).at[N, :N].set(1.0)
    rhs = jnp.concatenate([chi, jnp.array([qtot])])
    return jnp.linalg.solve(aa, rhs)[:N]


def e_dense(pos, c):
    q = dense_solve(pos, c * jnp.asarray(chi0))
    s = jnp.sum(pos * pos, -1)
    return jnp.sum(q * s)


def loss_dense(c):
    f = -jax.grad(e_dense)(jnp.asarray(pos0), c)
    return jnp.sum(f * f)


def e_shard_scaled(pos_st, c):
    """Inside shard_map: per-shard pos (ml,3), returns replicated E/D."""
    chi_loc = c * jax.lax.dynamic_slice(
        jnp.asarray(chi0), (jax.lax.axis_index(axis) * ml,), (ml,))
    q_loc = solve_qeq_rows_in_shard_map(
        pos_st, jnp.asarray(sig).reshape(D, ml)[0] * 0 +
        jax.lax.dynamic_slice(jnp.asarray(sig),
                              (jax.lax.axis_index(axis) * ml,), (ml,)),
        jax.lax.dynamic_slice(jnp.asarray(diag),
                              (jax.lax.axis_index(axis) * ml,), (ml,)),
        jnp.ones(ml, bool), chi_loc, qtot, axis, tol=TOL)
    s_loc = jnp.sum(pos_st * pos_st, -1)
    return jax.lax.psum(jnp.sum(q_loc * s_loc), axis) / D


def grads_sharded(c, formulation):
    def device(c, pos_st):
        pos_loc = pos_st[0]

        es, g = jax.value_and_grad(
            lambda p: e_shard_scaled(p, c))(pos_loc)
        f_loc = -g

        if formulation == "rev-rev":
            def srg(c_):
                _, g2 = jax.value_and_grad(
                    lambda p: e_shard_scaled(p, c_))(pos_loc)
                f2 = -g2
                return jnp.sum(f2 * f2) / 1.0

            lval = jax.lax.psum(srg(jax.lax.stop_gradient(c)), axis)
            gc = jax.lax.psum(jax.grad(srg)(c), axis)
        else:  # rev-fwd
            v = jax.lax.stop_gradient(-2.0 * f_loc)

            def srg(c_):
                _, h = jax.jvp(lambda p: e_shard_scaled(p, c_),
                               (pos_loc,), (v,))
                return h

            lval = jax.lax.psum(jnp.sum(f_loc * f_loc), axis)
            gc = jax.lax.psum(jax.grad(srg)(c), axis)
        return lval, gc

    fn = shard_map(device, mesh=mesh, in_specs=(P(), P(axis)),
                   out_specs=(P(), P()), check_vma=False)
    return fn(c, jnp.asarray(pos0).reshape(D, ml, 3))


c = jnp.float32(1.3)
l_ref, g_ref = jax.value_and_grad(loss_dense)(c)
print(f"dense:   L={float(l_ref):.8f} dL/dc={float(g_ref):.8f}")
for form in ["rev-fwd", "rev-rev"]:
    try:
        l, g = jax.jit(lambda c, f=form: grads_sharded(c, f))(c)
        print(f"{form}: L={float(l):.8f} dL/dc={float(g):.8f} "
              f"relerr={abs(float(g) - float(g_ref)) / abs(float(g_ref)):.3e}")
    except Exception as e:
        print(f"{form}: FAILED {type(e).__name__}: {e}"[:300])
