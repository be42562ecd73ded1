"""The REAL model zoo on an edge-partitioned giant graph (VERDICT r2
item 1): ``models/schnet.py`` and ``models/painn.py`` run UNMODIFIED on a
graph sharded over the 8-device CPU mesh with per-layer halo re-exchange —
energy, forces, AND a full optimizer train step must match the
single-device oracle; the halo machinery must hard-fallback (never clip)
when the partition doesn't support it."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from gcnn_keras_tpu.parallel.mesh import make_mesh
from gcnn_keras_tpu.parallel.partitioned import (
    build_partitioned_batch, make_partitioned_energy_force,
    make_partitioned_train_step, prepare_partitioned,
    run_partitioned_energy_force, shard_node_array, single_graph_batch)
from gcnn_keras_tpu.parallel.edge_partition import (
    partition_graph, encode_halo_senders, required_halo_size)
from gcnn_keras_tpu.models import painn, schnet


def _chain_system(n, k=6, seed=0, box_aspect=50.0):
    """Points in a long box (locality along x) + kNN edges — the shape of a
    real slab/polymer system where block partitions have small halos."""
    rs = np.random.RandomState(seed)
    pos = rs.rand(n, 3).astype(np.float32)
    pos[:, 0] *= box_aspect
    from gcnn_keras_tpu import native
    res = native.neighbor_list(pos, cutoff=0.35, max_neighbors=k)
    if res is None:
        raise RuntimeError("native neighbor_list unavailable")
    pairs, _ = res
    receivers, senders = pairs[:, 0], pairs[:, 1]
    z = rs.choice([1, 6, 8], size=n).astype(np.int32)
    return z, pos, senders.astype(np.int64), receivers.astype(np.int64)


def _knn_numpy(pos, k):
    d = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    nn = np.argsort(d, axis=1)[:, :k]
    recv = np.repeat(np.arange(len(pos)), k)
    send = nn.reshape(-1)
    return send.astype(np.int64), recv.astype(np.int64)


def _small_schnet():
    return schnet.make_model(
        depth=2, interaction_args={"units": 32},
        gauss_args={"bins": 16, "distance_max": 1.0, "sigma": 0.1},
        last_mlp={"units": [32, 16],
                  "activation": ["shifted_softplus"] * 2},
        output_mlp={"units": [16, 1],
                    "activation": ["shifted_softplus", "linear"]})


def _small_painn():
    return painn.make_model(
        depth=2,
        input_embedding={"node": {"input_dim": 95, "output_dim": 32}},
        conv_args={"units": 32, "cutoff": None, "conv_pool": "sum"},
        update_args={"units": 32},
        bessel_basis={"num_radial": 8, "cutoff": 1.0,
                      "envelope_exponent": 5},
        output_mlp={"units": [32, 1], "activation": ["swish", "linear"]})


def _system(n=512, seed=1, k=6, aspect=20.0):
    rs = np.random.RandomState(seed)
    pos = rs.rand(n, 3).astype(np.float32)
    pos[:, 0] *= aspect
    send, recv = _knn_numpy(pos, k)
    z = rs.choice([1, 6, 8], size=n).astype(np.int32)
    return z, pos, send, recv


def _oracle_energy_force(model, variables, ob):
    def e_fn(p):
        out = model.apply(variables,
                          ob.replace_nodes(node_coordinates=p))
        return out["output"][0, 0]

    e, g = jax.value_and_grad(e_fn)(ob.nodes["node_coordinates"])
    return float(e), -np.asarray(g)


@pytest.fixture(scope="module")
def mesh():
    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    return make_mesh(min(8, jax.device_count()))


@pytest.mark.parametrize("make", [_small_schnet, _small_painn],
                         ids=["schnet", "painn"])
def test_partitioned_real_model_matches_oracle(mesh, make):
    """The UNMODIFIED zoo model on a partitioned graph == single device,
    energies and forces, halo strategy engaged."""
    n = 512
    z, pos, send, recv = _system(n)
    model = make()
    ob = single_graph_batch(z, pos, send, recv)
    variables = model.init(jax.random.PRNGKey(0), ob)
    e_ref, f_ref = _oracle_energy_force(model, variables, ob)

    pin = prepare_partitioned(z, pos, send, recv, mesh.shape["data"])
    assert pin.halo_size > 0, "locality-sorted chain should support halo"
    e, f = run_partitioned_energy_force(model, variables, pin, mesh)

    np.testing.assert_allclose(e, e_ref, rtol=2e-5)
    np.testing.assert_allclose(f, f_ref[:n], rtol=1e-4, atol=2e-5)


def test_partitioned_schnet_100k_nodes(mesh):
    """~100k nodes, ~600k edges, depth-4 REAL SchNet: energy+forces ==
    single device. Also records the achieved halo fraction."""
    n = 100_000
    try:
        z, pos, send, recv = _chain_system(n, k=6, seed=3)
    except Exception as exc:  # native neighborlist unavailable
        pytest.skip(f"native neighborlist unavailable: {exc}")

    model = schnet.make_model(
        depth=4, interaction_args={"units": 32},
        gauss_args={"bins": 16, "distance_max": 1.0, "sigma": 0.1},
        last_mlp={"units": [32, 16],
                  "activation": ["shifted_softplus"] * 2},
        output_mlp={"units": [16, 1],
                    "activation": ["shifted_softplus", "linear"]})
    ob = single_graph_batch(z, pos, send, recv)
    variables = model.init(jax.random.PRNGKey(1), ob)

    pin = prepare_partitioned(z, pos, send, recv, mesh.shape["data"])
    assert pin.halo_size > 0
    # locality sort keeps the halo small: <5% of edges cross shards here
    assert pin.remote_fraction < 0.05, pin.remote_fraction
    e, f = run_partitioned_energy_force(model, variables, pin, mesh)

    e_ref, f_ref = _oracle_energy_force(model, variables, ob)
    np.testing.assert_allclose(e / n, e_ref / n, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(f, f_ref[:n], rtol=1e-3, atol=5e-5)


@pytest.mark.parametrize("make", [_small_schnet, _small_painn],
                         ids=["schnet", "painn"])
def test_partitioned_train_step_grads_match_oracle(mesh, make):
    """One SGD(1.0) step isolates the parameter GRADIENT of the energy+force
    loss: partitioned == single-device oracle, leaf by leaf, to f32 noise.
    This pins the whole SPMD-AD accounting (grad-of-grad through halo
    ppermute + replicated readout)."""
    n = 512
    z, pos, send, recv = _system(n)
    rs = np.random.RandomState(5)
    f_target = rs.randn(n, 3).astype(np.float32) * 0.1
    e_target = -3.0
    w_e, w_f = 1.0, 10.0
    model = make()

    ob = single_graph_batch(z, pos, send, recv)
    variables = model.init(jax.random.PRNGKey(0), ob)
    f_pad = np.zeros((ob.n_node, 3), np.float32)
    f_pad[:n] = f_target
    mask = np.asarray(ob.node_mask, np.float32)[:, None]

    def oracle_loss(v):
        def e_fn(p):
            out = model.apply(v, ob.replace_nodes(node_coordinates=p))
            return out["output"][0, 0]
        e, g = jax.value_and_grad(e_fn)(ob.nodes["node_coordinates"])
        df = ((-g) - f_pad) * mask
        return w_e * (e - e_target) ** 2 + w_f * jnp.sum(df * df) / (3.0 * n)

    g_oracle = jax.grad(oracle_loss)(variables)

    tx = optax.sgd(1.0)
    pin = prepare_partitioned(z, pos, send, recv, mesh.shape["data"])
    batch = build_partitioned_batch(pin)
    sh = NamedSharding(mesh, P("data"))
    batch = jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), sh), batch)
    f_st = jax.device_put(jnp.asarray(shard_node_array(pin, f_target)), sh)
    step = make_partitioned_train_step(model, mesh, tx,
                                       w_energy=w_e, w_force=w_f)
    vp, _, metrics = step(variables, tx.init(variables), batch,
                          e_target, f_st)
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(oracle_loss(variables)), rtol=1e-5)
    g_part = jax.tree.map(lambda a, b: a - b, variables, vp)
    for (path, a), (_, b) in zip(jax.tree.leaves_with_path(g_oracle),
                                 jax.tree.leaves_with_path(g_part)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.max(np.abs(a))), 1e-8)
        assert np.max(np.abs(a - b)) / scale < 1e-4, path


def test_partitioned_adam_training_tracks_oracle(mesh):
    """Two full adam steps: the partitioned LOSS trajectory equals the
    single-device oracle's (step 2's loss depends on step 1's update, so
    this checks the applied update end-to-end)."""
    n = 512
    z, pos, send, recv = _system(n)
    rs = np.random.RandomState(6)
    f_target = rs.randn(n, 3).astype(np.float32) * 0.1
    e_target = -3.0
    w_e, w_f = 1.0, 10.0
    model = _small_schnet()

    ob = single_graph_batch(z, pos, send, recv)
    variables = model.init(jax.random.PRNGKey(0), ob)
    f_pad = np.zeros((ob.n_node, 3), np.float32)
    f_pad[:n] = f_target
    mask = np.asarray(ob.node_mask, np.float32)[:, None]

    def oracle_loss(v):
        def e_fn(p):
            out = model.apply(v, ob.replace_nodes(node_coordinates=p))
            return out["output"][0, 0]
        e, g = jax.value_and_grad(e_fn)(ob.nodes["node_coordinates"])
        df = ((-g) - f_pad) * mask
        return w_e * (e - e_target) ** 2 + w_f * jnp.sum(df * df) / (3.0 * n)

    tx = optax.adam(1e-3)
    vo, so = variables, tx.init(variables)
    losses_o = []
    for _ in range(2):
        lo, go = jax.value_and_grad(oracle_loss)(vo)
        up, so = tx.update(go, so, vo)
        vo = optax.apply_updates(vo, up)
        losses_o.append(float(lo))

    pin = prepare_partitioned(z, pos, send, recv, mesh.shape["data"])
    batch = build_partitioned_batch(pin)
    sh = NamedSharding(mesh, P("data"))
    batch = jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), sh), batch)
    f_st = jax.device_put(jnp.asarray(shard_node_array(pin, f_target)), sh)
    step = make_partitioned_train_step(model, mesh, tx,
                                       w_energy=w_e, w_force=w_f)
    vp, sp = variables, tx.init(variables)
    losses_p = []
    for _ in range(2):
        vp, sp, m = step(vp, sp, batch, e_target, f_st)
        losses_p.append(float(m["loss"]))
    np.testing.assert_allclose(losses_p, losses_o, rtol=1e-4)


def test_halo_fallback_never_clips(mesh):
    """A partition with no locality (random permutation, long-range edges)
    must refuse the halo strategy and fall back to all-gather — and still
    be exactly correct, with the real model."""
    n = 512
    rs = np.random.RandomState(7)
    pos = rs.rand(n, 3).astype(np.float32)
    recv = np.repeat(np.arange(n), 4).astype(np.int64)
    send = rs.randint(0, n, size=len(recv)).astype(np.int64)
    keep = send != recv
    send, recv = send[keep], recv[keep]
    z = rs.choice([1, 6, 8], size=n).astype(np.int32)

    pin = prepare_partitioned(z, pos, send, recv, mesh.shape["data"],
                              locality_sort=False)
    assert pin.halo_size == 0  # hard fallback to all-gather

    model = _small_schnet()
    ob = single_graph_batch(z, pos, send, recv)
    variables = model.init(jax.random.PRNGKey(2), ob)
    e, f = run_partitioned_energy_force(model, variables, pin, mesh)
    e_ref, f_ref = _oracle_energy_force(model, variables, ob)
    np.testing.assert_allclose(e, e_ref, rtol=2e-5)
    np.testing.assert_allclose(f, f_ref[:n], rtol=1e-4, atol=2e-5)


def test_encode_halo_strict_raises(mesh):
    n = 256
    rs = np.random.RandomState(9)
    pos = rs.rand(n, 3).astype(np.float32)
    recv = np.repeat(np.arange(n), 3).astype(np.int64)
    send = rs.randint(0, n, size=len(recv)).astype(np.int64)
    part = partition_graph(pos, send, recv, 8, locality_sort=False)
    need = required_halo_size(part)  # -1 = beyond ring neighbors
    if 0 <= need <= 1:
        pytest.skip("random graph unexpectedly local")
    with pytest.raises(ValueError):
        encode_halo_senders(part, 1, 8, strict=True)


def _hdnnp_system(n=600, seed=2):
    from gcnn_keras_tpu.graph.preprocess import set_range, set_angle
    rs = np.random.RandomState(seed)
    t = np.arange(n) * 1.3
    pos = np.stack([t, 2.0 * np.sin(t * 0.05), 2.0 * np.cos(t * 0.03)],
                   1).astype(np.float32)
    pos += rs.randn(n, 3).astype(np.float32) * 0.05
    z = rs.choice([1, 6, 8], size=n).astype(np.int32)
    esp = (rs.randn(n) * 0.02).astype(np.float32)
    g = {"node_number": z, "node_coordinates": pos}
    g = set_range(g, max_distance=3.0, max_neighbours=8)
    g["edge_indices"] = g.pop("range_indices")
    g = set_angle(g, range_indices="edge_indices")
    angles = g["angle_indices_nodes"]
    send, recv = g["edge_indices"][:, 1], g["edge_indices"][:, 0]
    return g, z, pos, send, recv, angles, esp, rs


def _hdnnp_model(solver, cg_tol=1e-10):
    from gcnn_keras_tpu.models.hdnnp4th import make_model_behler
    return make_model_behler(
        g2_kwargs={"eta": [0.0, 0.3], "rs": [0.0, 2.5], "rc": 3.0,
                   "elements": [1, 6, 8]},
        g4_kwargs={"eta": [0.0, 0.3], "lamda": [-1.0, 1.0], "rc": 3.0,
                   "zeta": [1.0, 4.0], "elements": [1, 6, 8],
                   "multiplicity": 2.0},
        mlp_charge_kwargs={"units": [16, 1], "num_relations": 6,
                           "activation": ["swish", "linear"]},
        mlp_local_kwargs={"units": [16, 1], "num_relations": 6,
                          "activation": ["swish", "linear"]},
        electrostatic_kwargs={"param_trainable": False, "solver": solver,
                              "cg_tol": cg_tol})


def test_partitioned_hdnnp4th_energy_force_charges_sharded_qeq(mesh):
    """The FLAGSHIP model partitioned: ACSF G2+G4 over halo-encoded
    edges/angle-triples, the ROW-SHARDED matrix-free CG Qeq (O(M^2/D) per
    shard, never a materialized M x M), screened-Coulomb + QM/MM energies —
    energy, forces AND charges on a 600-atom molecule == the single-device
    dense-Qeq oracle."""
    g, z, pos, send, recv, angles, esp, _ = _hdnnp_system()
    n = len(z)
    model_o = _hdnnp_model("dense")
    model_p = _hdnnp_model("auto")

    from gcnn_keras_tpu.batch import batch_graphs
    ob = batch_graphs([dict(g, esp=esp,
                            total_charge=np.zeros(1, np.float32))],
                      global_keys=("total_charge",))
    variables = model_o.init(jax.random.PRNGKey(0), ob)

    def e_fn(p):
        out = model_o.apply(variables, ob.replace_nodes(node_coordinates=p))
        return out["output"][0, 0]

    e_ref, gref = jax.value_and_grad(e_fn)(ob.nodes["node_coordinates"])
    f_ref = -np.asarray(gref)[:n]
    q_ref = np.asarray(model_o.apply(variables, ob)["charge"])[:n]

    pin = prepare_partitioned(z, pos, send, recv, mesh.shape["data"],
                              angles=angles)
    assert pin.halo_size > 0
    batch = build_partitioned_batch(
        pin, node_props={"esp": esp},
        global_props={"total_charge": np.zeros(1, np.float32)})
    sh = NamedSharding(mesh, P("data"))
    batch = jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), sh), batch)
    fn = make_partitioned_energy_force(model_p, mesh)
    e, f = fn(variables, batch)
    from gcnn_keras_tpu.parallel.partitioned import unshard_node_array
    f = unshard_node_array(pin, np.asarray(f))

    np.testing.assert_allclose(float(e), float(e_ref), rtol=1e-5)
    np.testing.assert_allclose(f, f_ref, rtol=1e-3, atol=1e-5)

    from jax import shard_map as _sm

    def q_device(variables, b):
        lb = jax.tree.map(lambda x: x[0], b)
        return model_p.apply(variables, lb)["charge"][None]

    qfn = jax.jit(_sm(q_device, mesh=mesh, in_specs=(P(), P("data")),
                      out_specs=P("data"), check_vma=False))
    q = unshard_node_array(pin, np.asarray(qfn(variables, batch)))
    np.testing.assert_allclose(q, q_ref, atol=5e-6)
    assert abs(q.sum()) < 1e-5  # total-charge constraint across shards


def test_partitioned_hdnnp4th_energy_train_grads_match_oracle(mesh):
    """One energy-loss train-step gradient for partitioned HDNNP4th (ONE
    backward through the distributed CG) == the dense-Qeq oracle."""
    g, z, pos, send, recv, angles, esp, rs = _hdnnp_system()
    n = len(z)
    e_target = -2.0
    model_o = _hdnnp_model("dense")
    model_p = _hdnnp_model("auto")

    from gcnn_keras_tpu.batch import batch_graphs
    ob = batch_graphs([dict(g, esp=esp,
                            total_charge=np.zeros(1, np.float32))],
                      global_keys=("total_charge",))
    variables = model_o.init(jax.random.PRNGKey(0), ob)

    def oracle_loss(v):
        out = model_o.apply(v, ob)
        return (out["output"][0, 0] - e_target) ** 2

    g_oracle = jax.grad(oracle_loss)(variables)

    pin = prepare_partitioned(z, pos, send, recv, mesh.shape["data"],
                              angles=angles)
    batch = build_partitioned_batch(
        pin, node_props={"esp": esp},
        global_props={"total_charge": np.zeros(1, np.float32)})
    sh = NamedSharding(mesh, P("data"))
    batch = jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), sh), batch)
    f_zero = jax.device_put(
        jnp.asarray(shard_node_array(pin, np.zeros((n, 3), np.float32))), sh)
    tx = optax.sgd(1.0)
    step = make_partitioned_train_step(model_p, mesh, tx, w_energy=1.0,
                                       w_force=0.0)
    vp, _, metrics = step(variables, tx.init(variables), batch, e_target,
                          f_zero)
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(oracle_loss(variables)), rtol=1e-4)
    g_part = jax.tree.map(lambda a, b: a - b, variables, vp)
    for (path, a), (_, b) in zip(jax.tree.leaves_with_path(g_oracle),
                                 jax.tree.leaves_with_path(g_part)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.max(np.abs(a))), 1e-8)
        assert np.max(np.abs(a - b)) / scale < 1e-4, path


def test_partitioned_hdnnp4th_flagship_loss_train_grads_match_oracle(mesh):
    """The FLAGSHIP loss (50 q + 1 E + 200 F, reference
    force_hdnnp4th.py:228-245) trained on the edge-partitioned giant
    molecule: the full train-step gradient — INCLUDING the force term's
    grad-of-grad THROUGH the distributed row-sharded CG Qeq — matches the
    single-device dense-Qeq oracle.

    This was r3's documented KNOWN LIMIT, closed in r4: the charge solve
    is a jax.custom_jvp whose tangent rule recursively calls the same
    reconciled solve on the bordered tangent rhs (qeq_solver.py
    _qeq_rows_jvp), and the inner CG is a custom_linear_solve whose solve
    closure has no rhs-derived constants (_transposable_pcg) so staged
    tangent calls transpose. The train step computes the force-loss
    gradient as reverse-over-FORWARD: d/dtheta <grad_pos E, v> with
    v = stop_grad(dL_f/dF) (partitioned.py make_partitioned_train_step).
    Minimal repro of the old failure: tools/debug_qeq_second_order.py."""
    g, z, pos, send, recv, angles, esp, rs = _hdnnp_system(n=240)
    n = len(z)
    e_target = -2.0
    f_target = (rs.randn(n, 3) * 0.05).astype(np.float32)
    q_target = (rs.randn(n) * 0.05).astype(np.float32)
    w_e, w_f, w_q = 1.0, 200.0, 50.0
    model_o = _hdnnp_model("dense")
    model_p = _hdnnp_model("auto")

    from gcnn_keras_tpu.batch import batch_graphs
    ob = batch_graphs([dict(g, esp=esp,
                            total_charge=np.zeros(1, np.float32))],
                      global_keys=("total_charge",))
    variables = model_o.init(jax.random.PRNGKey(0), ob)
    f_pad = np.zeros((ob.n_node, 3), np.float32)
    f_pad[:n] = f_target
    q_pad = np.zeros((ob.n_node,), np.float32)
    q_pad[:n] = q_target

    def oracle_loss(v):
        def e_fn(p):
            out = model_o.apply(v, ob.replace_nodes(node_coordinates=p))
            return out["output"][0, 0], out["charge"].reshape(-1)

        (e, q), gpos = jax.value_and_grad(e_fn, has_aux=True)(
            ob.nodes["node_coordinates"])
        f = -gpos
        m = ob.node_mask.astype(jnp.float32)
        df = (f - f_pad) * m[:, None]
        dq = (q - q_pad) * m
        lf = jnp.sum(df * df) / (jnp.sum(m) * 3.0)
        lq = jnp.sum(dq * dq) / jnp.sum(m)
        return w_e * (e - e_target) ** 2 + w_f * lf + w_q * lq

    l_oracle = float(oracle_loss(variables))
    g_oracle = jax.grad(oracle_loss)(variables)

    pin = prepare_partitioned(z, pos, send, recv, mesh.shape["data"],
                              angles=angles)
    batch = build_partitioned_batch(
        pin, node_props={"esp": esp},
        global_props={"total_charge": np.zeros(1, np.float32)})
    sh = NamedSharding(mesh, P("data"))
    batch = jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), sh), batch)
    f_sh = jax.device_put(jnp.asarray(shard_node_array(pin, f_target)), sh)
    q_sh = jax.device_put(jnp.asarray(shard_node_array(pin, q_target)), sh)

    tx = optax.sgd(1.0)
    step = make_partitioned_train_step(model_p, mesh, tx, w_energy=w_e,
                                       w_force=w_f, w_charge=w_q)
    vp, _, metrics = step(variables, tx.init(variables), batch, e_target,
                          f_sh, q_sh)
    np.testing.assert_allclose(float(metrics["loss"]), l_oracle, rtol=1e-4)
    g_part = jax.tree.map(lambda a, b: a - b, variables, vp)
    for (path, a), (_, b) in zip(jax.tree.leaves_with_path(g_oracle),
                                 jax.tree.leaves_with_path(g_part)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.max(np.abs(a))), 1e-8)
        assert np.max(np.abs(a - b)) / scale < 3e-4, path
