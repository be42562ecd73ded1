"""Reproduce the KNOWN LIMIT: force-loss (grad-of-grad) training through
the distributed row-sharded CG Qeq vs the dense single-device oracle
(VERDICT r3 item 2). Prints per-leaf max relative errors for the
energy-only and force-only loss gradients."""
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from gcnn_keras_tpu.parallel.mesh import make_mesh
from gcnn_keras_tpu.parallel.partitioned import (
    build_partitioned_batch, make_partitioned_train_step,
    prepare_partitioned, shard_node_array)
from gcnn_keras_tpu.batch import batch_graphs

from test_partitioned_model import _hdnnp_system, _hdnnp_model


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 240
    mesh = make_mesh(4)
    g, z, pos, send, recv, angles, esp, rs = _hdnnp_system(n=n)
    model_o = _hdnnp_model("dense")
    model_p = _hdnnp_model("auto")

    ob = batch_graphs([dict(g, esp=esp,
                            total_charge=np.zeros(1, np.float32))],
                      global_keys=("total_charge",))
    variables = model_o.init(jax.random.PRNGKey(0), ob)
    e_target = -2.0
    f_target = (rs.randn(n, 3) * 0.05).astype(np.float32)
    f_pad = np.zeros((ob.n_node, 3), np.float32)
    f_pad[:n] = f_target

    def oracle_loss(v, w_e, w_f):
        def e_fn(p):
            out = model_o.apply(v, ob.replace_nodes(node_coordinates=p))
            return out["output"][0, 0]

        e, gpos = jax.value_and_grad(e_fn)(ob.nodes["node_coordinates"])
        f = -gpos
        mask = ob.node_mask.astype(jnp.float32)[:, None]
        df = (f - f_pad) * mask
        lf = jnp.sum(df * df) / (jnp.sum(mask) * 3.0)
        return w_e * (e - e_target) ** 2 + w_f * lf

    pin = prepare_partitioned(z, pos, send, recv, mesh.shape["data"],
                              angles=angles)
    print(f"halo={pin.halo_size} remote={pin.remote_fraction:.3f}")
    batch = build_partitioned_batch(
        pin, node_props={"esp": esp},
        global_props={"total_charge": np.zeros(1, np.float32)})
    sh = NamedSharding(mesh, P("data"))
    batch = jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), sh), batch)
    f_sh = jax.device_put(
        jnp.asarray(shard_node_array(pin, f_target)), sh)

    tx = optax.sgd(1.0)
    for w_e, w_f, label in [(1.0, 0.0, "energy-only"),
                            (0.0, 1.0, "force-only"),
                            (1.0, 200.0, "flagship-mix")]:
        g_oracle = jax.grad(lambda v: oracle_loss(v, w_e, w_f))(variables)
        step = make_partitioned_train_step(model_p, mesh, tx,
                                           w_energy=w_e, w_force=w_f)
        vp, _, metrics = step(variables, tx.init(variables), batch,
                              e_target, f_sh)
        g_part = jax.tree.map(lambda a, b: a - b, variables, vp)
        worst = 0.0
        worst_path = None
        for (path, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(g_part),
                jax.tree_util.tree_leaves_with_path(g_oracle)):
            scale = max(float(jnp.max(jnp.abs(b))), 1e-8)
            err = float(jnp.max(jnp.abs(a - b))) / scale
            if err > worst:
                worst, worst_path = err, jax.tree_util.keystr(path)
        print(f"{label}: loss_part={float(metrics['loss']):.6f} "
              f"loss_oracle={float(oracle_loss(variables, w_e, w_f)):.6f} "
              f"worst_rel_grad_err={worst:.3e} at {worst_path}")


if __name__ == "__main__":
    main()
