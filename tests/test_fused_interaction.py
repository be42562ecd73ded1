"""Parity tests for the AD-closed fused SchNet cfconv chain
(ops/pallas/fused_interaction.py), run in Pallas interpreter mode on CPU.

Every AD order the energy+force training uses is pinned against plain-XLA
autodiff of a reference chain with identical semantics (fused drops
padding-edge contributions entirely; the reference masks the message)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gcnn_keras_tpu.ops.pallas import fused_interaction as fi

_LOG2 = 0.6931471805599453


def _ref_chain(x, pos, w1, b1, w2, b2, send, recv, mask, st, n_node):
    """Plain-jnp reference with the kernels' exact semantics."""
    v = pos[send] - pos[recv]
    d2 = jnp.sum(v * v, axis=-1, keepdims=True)
    eps = 1e-12
    d = jnp.sqrt(jnp.maximum(d2, eps))
    d = jnp.where(d2 > eps, d, np.sqrt(eps))
    centers = (jnp.arange(st.bins, dtype=jnp.float32) / st.bins
               * st.distance_max)
    gamma = -0.5 / (st.sigma ** 2)
    b = jnp.exp(gamma * (d - st.offset - centers[None, :]) ** 2)
    f = (jax.nn.softplus(b @ w1 + b1) - _LOG2) @ w2 + b2
    m = f * x[send] * mask[:, None].astype(x.dtype)
    return jax.ops.segment_sum(m, recv, n_node, indices_are_sorted=True)


def _case(seed=0, n_node=150, n_edge=600, units=16, bins=8):
    rs = np.random.RandomState(seed)
    st = fi.CFStatic(bins=bins, distance_max=4.0, offset=0.0, sigma=0.4,
                     units=units)
    x = rs.randn(n_node, units).astype(np.float32)
    pos = (rs.randn(n_node, 3) * 1.5).astype(np.float32)
    recv = np.sort(rs.randint(0, n_node, size=n_edge)).astype(np.int32)
    # window-local senders (the fused-kernel coverage contract)
    send = np.clip(recv + rs.randint(-40, 41, size=n_edge), 0,
                   n_node - 1).astype(np.int32)
    mask = rs.rand(n_edge) > 0.1
    w1 = (rs.randn(bins, units) * 0.5).astype(np.float32)
    b1 = (rs.randn(units) * 0.1).astype(np.float32)
    w2 = (rs.randn(units, units) * 0.3).astype(np.float32)
    b2 = (rs.randn(units) * 0.1).astype(np.float32)
    return st, x, pos, w1, b1, w2, b2, send, recv, mask


def test_fwd_parity():
    st, x, pos, w1, b1, w2, b2, send, recv, mask = _case()
    got = fi.cfconv_fused_chain(x, pos, w1, b1, w2, b2, send, recv, mask,
                                st, x.shape[0], interpret=True)
    want = _ref_chain(x, pos, w1, b1, w2, b2, send, recv, mask, st,
                      x.shape[0])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_first_reverse_parity_all_cotangents():
    st, x, pos, w1, b1, w2, b2, send, recv, mask = _case(seed=1)
    rs = np.random.RandomState(9)
    ct = rs.randn(x.shape[0], st.units).astype(np.float32)

    def loss_fused(x_, pos_, w1_, b1_, w2_, b2_):
        y = fi.cfconv_fused_chain(x_, pos_, w1_, b1_, w2_, b2_, send,
                                  recv, mask, st, x.shape[0],
                                  interpret=True)
        return jnp.sum(y * ct)

    def loss_ref(x_, pos_, w1_, b1_, w2_, b2_):
        y = _ref_chain(x_, pos_, w1_, b1_, w2_, b2_, send, recv, mask,
                       st, x.shape[0])
        return jnp.sum(y * ct)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(
        x, pos, w1, b1, w2, b2)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
        x, pos, w1, b1, w2, b2)
    for a, b, name in zip(g_f, g_r, ("x", "pos", "w1", "b1", "w2", "b2")):
        np.testing.assert_allclose(
            a, b, rtol=2e-4, atol=2e-4,
            err_msg=f"first-reverse cotangent mismatch: {name}")


def test_reverse_over_reverse_parity():
    """The energy+force training traversal: grad wrt (x-producing) params
    AND filter params of a loss on (E, F = -dE/dpos)."""
    st, x, pos, w1, b1, w2, b2, send, recv, mask = _case(
        seed=2, n_node=90, n_edge=300)
    rs = np.random.RandomState(10)
    f_tgt = rs.randn(*pos.shape).astype(np.float32)
    readout = rs.randn(x.shape[0], st.units).astype(np.float32)

    def make_loss(chain):
        def loss(x_, w1_, b1_, w2_, b2_):
            def e_fn(p):
                y = chain(x_, p, w1_, b1_, w2_, b2_)
                return jnp.sum(y * readout)

            e, de = jax.value_and_grad(e_fn)(pos)
            force = -de
            return 0.1 * e + jnp.sum((force - f_tgt) ** 2)

        return loss

    fused = make_loss(lambda x_, p, *th: fi.cfconv_fused_chain(
        x_, p, *th, send, recv, mask, st, x.shape[0], interpret=True))
    ref = make_loss(lambda x_, p, *th: _ref_chain(
        x_, p, *th, send, recv, mask, st, x.shape[0]))

    lv_f = fused(x, w1, b1, w2, b2)
    lv_r = ref(x, w1, b1, w2, b2)
    np.testing.assert_allclose(lv_f, lv_r, rtol=2e-4)

    g_f = jax.grad(fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g_r = jax.grad(ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b, name in zip(g_f, g_r, ("x", "w1", "b1", "w2", "b2")):
        scale = max(1.0, float(np.max(np.abs(b))))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, rtol=3e-4,
            atol=3e-4, err_msg=f"reverse-over-reverse mismatch: {name}")


def _tiny_batch(seed=0, n_mols=4):
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.graph.preprocess import set_range
    rs = np.random.RandomState(seed)
    graphs = []
    for _ in range(n_mols):
        n = rs.randint(5, 9)
        g = {"node_number": rs.choice([1, 6, 8], size=n),
             "node_coordinates": (rs.randn(n, 3) * 1.5).astype(np.float32),
             "energy": np.array([rs.randn()], dtype=np.float32)}
        g = set_range(g, max_distance=5.0, max_neighbours=8)
        g["edge_indices"] = g.pop("range_indices")
        g["force"] = (rs.randn(n, 3) * 0.1).astype(np.float32)
        graphs.append(g)
    return batch_graphs(graphs, global_keys=("energy",))


def test_model_level_fused_chain_energy_force_and_train_grads(monkeypatch):
    """Schnet(interaction_args={'fused_chain': True}): identical parameter
    pytree, matching energies/forces AND matching full train-step
    gradients (the reverse-over-reverse the bench step runs)."""
    monkeypatch.setattr(fi, "FORCE_INTERPRET", True)
    from gcnn_keras_tpu.models.schnet import make_model
    from gcnn_keras_tpu.model.force import EnergyForceModel
    from gcnn_keras_tpu.training.losses import (masked_graph_mae,
                                                masked_node_mae)

    batch = _tiny_batch()
    kw = dict(depth=2, gauss_args={"bins": 8, "distance_max": 4.0,
                                   "offset": 0.0, "sigma": 0.4},
              last_mlp={"units": [8], "activation": ["shifted_softplus"]},
              output_mlp={"units": [1], "activation": ["linear"]})
    base = EnergyForceModel(make_model(
        interaction_args={"units": 16}, **kw))
    fused = EnergyForceModel(make_model(
        interaction_args={"units": 16, "fused_chain": True}, **kw))

    params = base.init(jax.random.PRNGKey(0), batch, train=False)
    params_f = fused.init(jax.random.PRNGKey(0), batch, train=False)
    assert jax.tree.structure(params) == jax.tree.structure(params_f)

    out_b = base.apply(params, batch, train=False)
    out_f = fused.apply(params, batch, train=False)
    nm = np.asarray(batch.node_mask, bool)
    np.testing.assert_allclose(np.asarray(out_f["energy"]),
                               np.asarray(out_b["energy"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_f["force"])[nm],
                               np.asarray(out_b["force"])[nm],
                               rtol=1e-3, atol=1e-4)

    def make_loss(model):
        def loss(p):
            out = model.apply(p, batch, train=False)
            e = masked_graph_mae(out["energy"], batch.globals["energy"],
                                 batch.globals["graph_mask"])
            f = masked_node_mae(out["force"], batch.nodes["force"],
                                batch.node_mask)
            return e + 100.0 * f
        return loss

    g_b = jax.grad(make_loss(base))(params)
    g_f = jax.grad(make_loss(fused))(params)
    flat_b = jax.tree.leaves(g_b)
    flat_f = jax.tree.leaves(g_f)
    for a, b in zip(flat_f, flat_b):
        scale = max(1.0, float(np.max(np.abs(np.asarray(b)))))
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=2e-3, atol=2e-3)


def test_fused_chain_falls_back_when_ineligible():
    """Without FORCE_INTERPRET on CPU the gate must fall back to the
    unfused path (exact same outputs as the base model)."""
    from gcnn_keras_tpu.models.schnet import make_model
    batch = _tiny_batch()
    kw = dict(depth=1, gauss_args={"bins": 8, "distance_max": 4.0},
              last_mlp={"units": [8], "activation": ["shifted_softplus"]},
              output_mlp={"units": [1], "activation": ["linear"]})
    base = make_model(interaction_args={"units": 16}, **kw)
    fused = make_model(interaction_args={"units": 16, "fused_chain": True},
                       **kw)
    params = base.init(jax.random.PRNGKey(0), batch)
    np.testing.assert_allclose(
        np.asarray(fused.apply(params, batch)["output"]),
        np.asarray(base.apply(params, batch)["output"]), rtol=1e-6)
