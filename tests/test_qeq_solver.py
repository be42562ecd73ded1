"""Scalable Qeq solvers (VERDICT r1 item 7): iterative matrix-free CG must
match the dense bordered solve at M=1024 incl. charge conservation and
differentiability; the mesh-sharded dense batch solve must equal
single-device; CENTCharge's iterative path must agree with its dense path.
Reference wall being removed: ``kgcnn/layers/conv/hdnnp_conv.py:250``."""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gcnn_keras_tpu.layers.conv.hdnnp_electro import (
    CENT_HARDNESS, CENT_RADII, CENTCharge)
from gcnn_keras_tpu.layers.conv.qeq_solver import (
    solve_qeq_batch_sharded, solve_qeq_iterative)


def _dense_reference(pos, sigma, hard, chi, qtot, mask):
    from scipy.special import erf
    m = len(mask)
    d = np.sqrt(np.maximum(((pos[:, None] - pos[None]) ** 2).sum(-1), 1e-12))
    gam = np.sqrt(sigma[:, None] ** 2 + sigma[None] ** 2 + 1e-12)
    off = erf(d / (gam * math.sqrt(2))) / d
    pm = mask[:, None] & mask[None]
    a = np.where(pm & ~np.eye(m, dtype=bool), off, 0.0) + np.diag(hard)
    full = np.zeros((m + 1, m + 1))
    full[:m, :m] = a
    full[:m, m] = mask
    full[m, :m] = mask
    rhs = np.concatenate([chi * mask, [qtot]])
    return np.linalg.solve(full, rhs)[:m] * mask


def _system(m=1024, n_real=1000, seed=0):
    rs = np.random.RandomState(seed)
    z = rs.choice([1, 6, 8], size=m).astype(np.int32)
    pos = (rs.rand(m, 3) * 40).astype(np.float32)
    mask = np.zeros(m, bool)
    mask[:n_real] = True
    chi = (rs.randn(m) * 0.1).astype(np.float32) * mask
    sigma = CENT_RADII[z].astype(np.float32)
    hard = (CENT_HARDNESS[z] + 1.0 / (sigma * math.sqrt(math.pi) + 1e-12))
    hard = np.where(mask, hard, 1.0).astype(np.float32)
    return z, pos, mask, chi, sigma, hard


def test_iterative_matches_dense_m1024():
    z, pos, mask, chi, sigma, hard = _system()
    qtot = 1.0
    q_dense = _dense_reference(pos.astype(np.float64), sigma.astype(np.float64),
                               hard.astype(np.float64), chi.astype(np.float64),
                               qtot, mask)
    q_iter = np.asarray(solve_qeq_iterative(
        jnp.asarray(pos), jnp.asarray(sigma), jnp.asarray(hard),
        jnp.asarray(chi), jnp.asarray(np.float32(qtot)), jnp.asarray(mask),
        tol=1e-8))
    np.testing.assert_allclose(q_iter, q_dense, atol=5e-5)
    assert abs(q_iter.sum() - qtot) < 1e-4  # Lagrange constraint


def test_iterative_is_differentiable():
    z, pos, mask, chi, sigma, hard = _system(m=128, n_real=120)

    def esum(p):
        q = solve_qeq_iterative(p, jnp.asarray(sigma), jnp.asarray(hard),
                                jnp.asarray(chi), jnp.asarray(np.float32(0.0)),
                                jnp.asarray(mask), tol=1e-8)
        return jnp.sum(q ** 2)

    g = jax.grad(esum)(jnp.asarray(pos))
    assert bool(jnp.all(jnp.isfinite(g)))
    eps = 1e-2
    p2, p3 = pos.copy(), pos.copy()
    p2[5, 0] += eps
    p3[5, 0] -= eps
    num = (float(esum(jnp.asarray(p2))) - float(esum(jnp.asarray(p3)))) / (2 * eps)
    assert abs(float(g[5, 0]) - num) < 2e-3 + 0.05 * abs(num)


def test_batch_sharded_dense_solve():
    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    from gcnn_keras_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(min(4, jax.device_count()))
    rs = np.random.RandomState(3)
    g, k = 8, 33
    a = rs.randn(g, k, k).astype(np.float32) + np.eye(k, dtype=np.float32) * k
    b = rs.randn(g, k).astype(np.float32)
    x = np.asarray(solve_qeq_batch_sharded(jnp.asarray(a), jnp.asarray(b), mesh))
    xref = np.linalg.solve(a, b[..., None])[..., 0]
    np.testing.assert_allclose(x, xref, atol=2e-4)


def test_centcharge_iterative_matches_dense_path():
    """The layer-level switch: solver='iterative' == solver='dense' on a
    real GraphBatch (and both conserve charge)."""
    from gcnn_keras_tpu.batch import batch_graphs

    rs = np.random.RandomState(5)
    graphs = []
    for n in (6, 9):
        ei = np.array([[i, j] for i in range(n) for j in range(n) if i != j],
                      dtype=np.int64)
        graphs.append({
            "node_number": rs.choice([1, 6, 8], size=n).astype(np.int64),
            "node_coordinates": (rs.rand(n, 3) * 4).astype(np.float32),
            "edge_indices": ei,
            "total_charge": np.array([rs.choice([-1.0, 0.0, 1.0])],
                                     dtype=np.float32),
        })
    batch = batch_graphs(graphs, n_node_pad=24, n_edge_pad=160, n_graph_pad=3,
                         global_keys=("total_charge",))
    chi = jnp.asarray(rs.randn(batch.n_node).astype(np.float32))

    q_dense = CENTCharge(solver="dense").apply({}, batch, chi)
    q_iter = CENTCharge(solver="iterative", cg_tol=1e-8).apply({}, batch, chi)
    np.testing.assert_allclose(np.asarray(q_iter), np.asarray(q_dense),
                               atol=2e-5)
    # charge conservation per graph
    qs = np.asarray(q_iter)
    gid = np.asarray(batch.graph_id)
    for i, g in enumerate(graphs):
        got = qs[(gid == i) & np.asarray(batch.node_mask)].sum()
        assert abs(got - float(g["total_charge"][0])) < 1e-4


def test_sharded_iterative_matches_single_device():
    """Mesh-sharded matvec rows (one giant molecule distributed over the
    mesh) must match the single-device iterative solve — the distributed
    long-range electrostatics capability (SURVEY §5 distributed Qeq)."""
    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    from gcnn_keras_tpu.parallel.mesh import make_mesh
    from gcnn_keras_tpu.layers.conv.qeq_solver import (
        solve_qeq_iterative_sharded)

    z, pos, mask, chi, sigma, hard = _system(m=1024, n_real=1000)
    mesh = make_mesh(min(8, jax.device_count()))
    args = (jnp.asarray(pos), jnp.asarray(sigma), jnp.asarray(hard),
            jnp.asarray(chi), jnp.asarray(np.float32(1.0)),
            jnp.asarray(mask))
    q_single = np.asarray(solve_qeq_iterative(*args, tol=1e-8))
    q_shard = np.asarray(solve_qeq_iterative_sharded(*args, mesh, tol=1e-8))
    np.testing.assert_allclose(q_shard, q_single, atol=5e-5)
    assert abs(q_shard.sum() - 1.0) < 1e-4


def test_iterative_qeq_inside_full_force_train_step():
    """VERDICT r2 item 4: a REAL HDNNP4th charge+energy+force TRAIN-step
    gradient on a >=512-atom molecule, with solver='auto' actually selecting
    CG, checked against the dense path — adjoint-through-CG under
    grad-of-grad is exactly where it would break. (r5: the auto threshold
    moved to 4096 after the dense LU measured 2.4-3.3x faster through
    2080 atoms, so CG is forced explicitly here.)"""
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.graph.preprocess import set_range, set_angle
    from gcnn_keras_tpu.models.hdnnp4th import make_model_behler
    from gcnn_keras_tpu.model.force import EnergyForceModel
    from gcnn_keras_tpu.training.losses import (masked_graph_mae,
                                                masked_node_mae)

    rs = np.random.RandomState(11)
    n = 520
    # gently curved chain, ~1.3 spacing: bounded neighbor counts
    t = np.arange(n) * 1.3
    pos = np.stack([t, 2.0 * np.sin(t * 0.05), 2.0 * np.cos(t * 0.03)],
                   axis=1).astype(np.float32)
    pos += rs.randn(n, 3).astype(np.float32) * 0.05
    g = {
        "node_number": rs.choice([1, 6, 8], size=n),
        "node_coordinates": pos,
        "energy": np.array([rs.randn()], dtype=np.float32),
    }
    g = set_range(g, max_distance=3.0, max_neighbours=8)
    g["edge_indices"] = g.pop("range_indices")
    g = set_angle(g, range_indices="edge_indices")
    g["force"] = (rs.randn(n, 3) * 0.1).astype(np.float32)
    g["esp"] = (rs.randn(n) * 0.02).astype(np.float32)
    g["esp_grad"] = (rs.randn(n, 3) * 0.02).astype(np.float32)
    g["total_charge"] = np.zeros((1,), dtype=np.float32)
    g["charge"] = (rs.randn(n) * 0.1).astype(np.float32)
    batch = batch_graphs([g], global_keys=("energy", "total_charge"))
    assert batch.max_nodes >= 512

    elements = [1, 6, 8]

    def build(solver):
        model = make_model_behler(
            g2_kwargs={"eta": [0.0, 0.3], "rs": [0.0, 2.5], "rc": 3.0,
                       "elements": elements},
            g4_kwargs={"eta": [0.0, 0.3], "lamda": [-1.0, 1.0], "rc": 3.0,
                       "zeta": [1.0, 4.0], "elements": elements,
                       "multiplicity": 2.0},
            mlp_charge_kwargs={"units": [16, 1], "num_relations": 6,
                               "activation": ["swish", "linear"]},
            mlp_local_kwargs={"units": [16, 1], "num_relations": 6,
                              "activation": ["swish", "linear"]},
            electrostatic_kwargs={"param_trainable": False,
                                  "solver": solver, "cg_tol": 1e-10})
        return EnergyForceModel(model, use_esp_coupling=True)

    def loss_grads(solver, params=None):
        fmodel = build(solver)
        if params is None:
            params = fmodel.init(jax.random.PRNGKey(0), batch, train=False)

        def loss_fn(p):
            out = fmodel.apply(p, batch, train=False)
            e = masked_graph_mae(out["energy"], batch.globals["energy"],
                                 batch.globals["graph_mask"])
            f = masked_node_mae(out["force"], batch.nodes["force"],
                                batch.node_mask)
            q = masked_node_mae(out["charge"], batch.nodes["charge"],
                                batch.node_mask)
            return 50.0 * q + e + 200.0 * f

        l, grads = jax.value_and_grad(loss_fn)(params)
        return params, float(l), grads

    params, l_cg, g_cg = loss_grads("iterative")
    _, l_dense, g_dense = loss_grads("dense", params)
    np.testing.assert_allclose(l_cg, l_dense, rtol=5e-5)
    for (path, a), (_, b) in zip(jax.tree.leaves_with_path(g_dense),
                                 jax.tree.leaves_with_path(g_cg)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.max(np.abs(a))), 1e-6)
        assert np.max(np.abs(a - b)) / scale < 5e-4, (path, scale)


def test_dense_cholesky_matches_lu_all_orders():
    """r5: the default dense path (SPD Cholesky + Schur-eliminated
    constraint) must equal the bordered-LU formulation — charges, first
    grads (positions + chi) and grad-of-grad — incl. nonzero total
    charges and an EMPTY graph slot in the batch."""
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.graph.preprocess import set_range

    rs = np.random.RandomState(0)
    graphs = []
    for i in range(5):
        n = rs.randint(3, 9)
        g = {"node_number": rs.choice([1, 6, 8], size=n),
             "node_coordinates": (rs.randn(n, 3) * 2).astype(np.float32),
             "total_charge": np.array([float(i % 2)], dtype=np.float32)}
        g = set_range(g, max_distance=6.0, max_neighbours=12)
        g["edge_indices"] = g.pop("range_indices")
        graphs.append(g)
    # pad an extra EMPTY graph slot (n_graphs > len(graphs))
    batch = batch_graphs(graphs, global_keys=("total_charge",),
                         n_graph_pad=len(graphs) + 2)
    chi = jnp.asarray(rs.randn(batch.n_node).astype(np.float32))
    pos0 = batch.nodes["node_coordinates"]

    def f(pos, chi, impl):
        layer = CENTCharge(solver="dense", dense_impl=impl,
                           param_trainable=False)
        params = layer.init(jax.random.PRNGKey(0), batch, chi)
        q = layer.apply(params, batch, chi, positions=pos)
        return jnp.sum(jnp.sin(q) * batch.node_mask), q

    (_, q_lu), (_, q_ch) = f(pos0, chi, "lu"), f(pos0, chi, "cholesky")
    np.testing.assert_allclose(np.asarray(q_ch), np.asarray(q_lu),
                               atol=5e-6)
    # per-molecule charge conservation on the cholesky path
    tot = jnp.zeros(batch.n_graphs).at[batch.graph_id].add(
        q_ch * batch.node_mask)
    expected = np.array([i % 2 for i in range(5)] + [0.0, 0.0])
    np.testing.assert_allclose(np.asarray(tot), expected, atol=1e-4)

    g_lu = jax.grad(lambda p, c: f(p, c, "lu")[0], argnums=(0, 1))(pos0, chi)
    g_ch = jax.grad(lambda p, c: f(p, c, "cholesky")[0],
                    argnums=(0, 1))(pos0, chi)
    np.testing.assert_allclose(np.asarray(g_ch[0]), np.asarray(g_lu[0]),
                               atol=5e-6)
    np.testing.assert_allclose(np.asarray(g_ch[1]), np.asarray(g_lu[1]),
                               atol=5e-6)

    def gg(p, impl):
        inner = jax.grad(lambda pp: f(pp, chi, impl)[0])(p)
        return jnp.sum(inner ** 2)

    h_lu = jax.grad(lambda p: gg(p, "lu"))(pos0)
    h_ch = jax.grad(lambda p: gg(p, "cholesky"))(pos0)
    np.testing.assert_allclose(np.asarray(h_ch), np.asarray(h_lu), atol=5e-5)


def test_spd_solve_lanes_kernel_parity(monkeypatch):
    """r5: the lane-packed Pallas Gauss-Jordan solve (interpret mode on
    CPU) must match the XLA Cholesky path through CENTCharge — charges,
    grads and grad-of-grad (custom_linear_solve closure; symmetric
    parameterization through positions)."""
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.graph.preprocess import set_range
    from gcnn_keras_tpu.ops.pallas.spd_solve import (spd_solve_lanes,
                                                     _gj_solve_impl)

    # raw kernel vs jnp solve
    rs = np.random.RandomState(1)
    G, M, K = 5, 21, 2
    B = rs.randn(G, M, M).astype(np.float32) * 0.3
    a = jnp.asarray(np.einsum("gij,gkj->gik", B, B)
                    + np.eye(M, dtype=np.float32)[None] * 2.0)
    b = jnp.asarray(rs.randn(G, M, K).astype(np.float32))
    np.testing.assert_allclose(np.asarray(_gj_solve_impl(a, b, interpret=True)),
                               np.asarray(jnp.linalg.solve(a, b)), atol=2e-6)

    # CENTCharge-level: kernel (forced via env) vs XLA cholesky
    graphs = []
    for i in range(4):
        n = rs.randint(3, 9)
        g = {"node_number": rs.choice([1, 6, 8], size=n),
             "node_coordinates": (rs.randn(n, 3) * 2).astype(np.float32),
             "total_charge": np.array([float(i % 2)], dtype=np.float32)}
        g = set_range(g, max_distance=6.0, max_neighbours=12)
        g["edge_indices"] = g.pop("range_indices")
        graphs.append(g)
    batch = batch_graphs(graphs, global_keys=("total_charge",))
    chi = jnp.asarray(rs.randn(batch.n_node).astype(np.float32))
    pos0 = batch.nodes["node_coordinates"]

    def f(pos):
        layer = CENTCharge(solver="dense", dense_impl="cholesky",
                           param_trainable=False)
        params = layer.init(jax.random.PRNGKey(0), batch, chi)
        q = layer.apply(params, batch, chi, positions=pos)
        return jnp.sum(jnp.sin(q) * batch.node_mask), q

    def all_orders():
        (_, q) = f(pos0)
        g = jax.grad(lambda p: f(p)[0])(pos0)
        h = jax.grad(lambda p: jnp.sum(
            jax.grad(lambda pp: f(pp)[0])(p) ** 2))(pos0)
        return np.asarray(q), np.asarray(g), np.asarray(h)

    monkeypatch.setenv("GCNN_QEQ_LANES", "1")   # force the kernel
    qk, gk, hk = all_orders()
    monkeypatch.setenv("GCNN_QEQ_LANES", "0")   # force XLA cholesky
    qx, gx, hx = all_orders()
    np.testing.assert_allclose(qk, qx, atol=5e-6)
    np.testing.assert_allclose(gk, gx, atol=5e-6)
    np.testing.assert_allclose(hk, hx, atol=5e-5)
