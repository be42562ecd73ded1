"""Edge-partitioned giant-graph energy+force demo — REAL model zoo.

Runs the actual ``models/schnet.py`` flax model (unmodified) on ONE graph
too large to think of as a batch — nodes sharded over the device mesh,
per-layer ppermute halo re-exchange of embeddings, forces from a single
reverse pass through the sharded computation — and optionally checks the
result against the single-device oracle. On the CPU backend set:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/partitioned_giant_graph.py --nodes 100000

See gcnn_keras_tpu/parallel/partitioned.py for the machinery (auto halo
sizing; hard all-gather fallback when the partition's senders reach beyond
ring neighbors; the ``E / n_shards`` SPMD-AD recipe).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=20000)
    ap.add_argument("--neighbors", type=int, default=6)
    ap.add_argument("--devices", type=int, default=None)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--units", type=int, default=64)
    ap.add_argument("--train-steps", type=int, default=0,
                    help="also run N partitioned optimizer steps")
    ap.add_argument("--check", action="store_true",
                    help="compare against the single-device oracle")
    args = ap.parse_args()

    import jax
    # sitecustomize may have imported jax already with a different platform;
    # env-var selection is too late then — honor JAX_PLATFORMS explicitly.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from gcnn_keras_tpu import native
    from gcnn_keras_tpu.models import schnet
    from gcnn_keras_tpu.parallel.mesh import make_mesh
    from gcnn_keras_tpu.parallel.partitioned import (
        build_partitioned_batch, make_partitioned_train_step,
        prepare_partitioned, run_partitioned_energy_force, shard_node_array,
        single_graph_batch)

    rs = np.random.RandomState(0)
    n = args.nodes
    pos = rs.rand(n, 3).astype(np.float32)
    pos[:, 0] *= n / 2000.0  # long box: locality along x
    res = native.neighbor_list(pos, cutoff=0.35,
                               max_neighbors=args.neighbors)
    if res is None:
        raise SystemExit("native neighbor list unavailable")
    pairs, _ = res
    recv, send = pairs[:, 0].astype(np.int64), pairs[:, 1].astype(np.int64)
    z = rs.choice([1, 6, 8], size=n).astype(np.int32)
    print(f"{n} nodes, {len(send)} edges")

    mesh = make_mesh(args.devices)
    model = schnet.make_model(
        depth=args.depth, interaction_args={"units": args.units},
        gauss_args={"bins": 20, "distance_max": 1.0, "sigma": 0.1})
    ob = single_graph_batch(z[:256], pos[:256], *_small_edges(pos[:256]))
    variables = model.init(jax.random.PRNGKey(0), ob)

    t0 = time.perf_counter()
    pin = prepare_partitioned(z, pos, send, recv, mesh.shape["data"])
    print(f"partitioned over {mesh.shape['data']} devices in "
          f"{time.perf_counter() - t0:.2f}s: halo={pin.halo_size} rows, "
          f"remote-sender fraction={pin.remote_fraction:.3%} "
          f"({'ppermute halo' if pin.halo_size else 'all-gather'} strategy)")

    t0 = time.perf_counter()
    e, f = run_partitioned_energy_force(model, variables, pin, mesh)
    dt = time.perf_counter() - t0
    print(f"energy={e:.4f}, |F|max={np.abs(f).max():.4f}  "
          f"(first call incl. compile: {dt:.2f}s)")

    if args.train_steps:
        import optax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        tx = optax.adam(1e-4)
        batch = build_partitioned_batch(pin)
        sh = NamedSharding(mesh, P("data"))
        batch = jax.tree.map(
            lambda a: jax.device_put(jnp.asarray(a), sh), batch)
        f_ref = jax.device_put(
            jnp.asarray(shard_node_array(pin, np.zeros((n, 3), np.float32))),
            sh)
        step = make_partitioned_train_step(model, mesh, tx)
        vp, sp = variables, tx.init(variables)
        for i in range(args.train_steps):
            t0 = time.perf_counter()
            vp, sp, m = step(vp, sp, batch, 0.0, f_ref)
            jax.block_until_ready(m["loss"])
            print(f"train step {i}: loss={float(m['loss']):.4f} "
                  f"({time.perf_counter() - t0:.2f}s)")

    if args.check:
        ob_full = single_graph_batch(z, pos, send, recv)

        def e_fn(p):
            out = model.apply(
                variables, ob_full.replace_nodes(node_coordinates=p))
            return out["output"][0, 0]

        e_ref, g = jax.value_and_grad(e_fn)(
            ob_full.nodes["node_coordinates"])
        f_ref = -np.asarray(g)[:n]
        print(f"single-device oracle: energy diff "
              f"{abs(e - float(e_ref)):.2e}, force diff "
              f"{np.abs(f - f_ref).max():.2e}")


def _small_edges(pos):
    d = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    nn = np.argsort(d, axis=1)[:, :4]
    recv = np.repeat(np.arange(len(pos)), 4)
    return nn.reshape(-1).astype(np.int64), recv.astype(np.int64)


if __name__ == "__main__":
    main()
