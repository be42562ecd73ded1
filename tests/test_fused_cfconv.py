"""Fused cfconv kernel: CPU-side reference-impl checks (the Pallas path is
TPU-only and validated on-device — see PERF.md: exact-f32, 38x more accurate
than XLA's default bf16 matmul path, ~10% slower)."""
import numpy as np
import jax
import jax.numpy as jnp

from gcnn_keras_tpu.ops.pallas.fused_cfconv import (
    _reference_impl, fused_cfconv_auto, _ssp,
)


def _setup(E=256, N=64, B=8, U=16, seed=0):
    rs = np.random.RandomState(seed)
    recv = np.sort(rs.randint(0, N, size=E)).astype(np.int32)
    return (jnp.asarray(rs.randn(E, B).astype(np.float32)),
            jnp.asarray(rs.randn(E, U).astype(np.float32)),
            jnp.asarray(recv), N,
            jnp.asarray((rs.randn(B, U) * 0.1).astype(np.float32)),
            jnp.asarray((rs.randn(U) * 0.1).astype(np.float32)),
            jnp.asarray((rs.randn(U, U) * 0.1).astype(np.float32)),
            jnp.asarray((rs.randn(U) * 0.1).astype(np.float32)))


def test_reference_impl_matches_numpy():
    basis, xj, recv, N, w1, b1, w2, b2 = _setup()
    out = np.asarray(_reference_impl(basis, xj, recv, N, w1, b1, w2, b2))
    z1 = np.asarray(basis) @ np.asarray(w1) + np.asarray(b1)
    h = np.logaddexp(0, z1) - np.log(2)
    f = h @ np.asarray(w2) + np.asarray(b2)
    expect = np.zeros((N, out.shape[-1]), dtype=np.float64)
    np.add.at(expect, np.asarray(recv), np.asarray(xj) * f)
    assert np.allclose(out, expect, atol=1e-4)


def test_auto_dispatch_cpu_fallback_grads():
    basis, xj, recv, N, w1, b1, w2, b2 = _setup()

    def loss(basis, xj, w1):
        return jnp.sum(fused_cfconv_auto(basis, xj, recv, N, w1, b1, w2, b2) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(basis, xj, w1)
    for t in g:
        assert np.isfinite(np.asarray(t)).all()


def _tiny_mol_batch(seed=0, n_mols=3):
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.graph.preprocess import set_range
    rs = np.random.RandomState(seed)
    graphs = []
    for _ in range(n_mols):
        n = rs.randint(4, 8)
        g = {"node_number": rs.choice([1, 6, 8], size=n),
             "node_coordinates": (rs.randn(n, 3) * 1.5).astype(np.float32),
             "energy": np.array([rs.randn()], dtype=np.float32)}
        g = set_range(g, max_distance=5.0, max_neighbours=8)
        g["edge_indices"] = g.pop("range_indices")
        graphs.append(g)
    return batch_graphs(graphs, global_keys=("energy",))


def test_accurate_cfconv_model_flag_parity_and_forces():
    """VERDICT r4 item 6: the accuracy mode is reachable from the model
    surface (interaction_args={"accurate_cfconv": True}) with an identical
    parameter pytree and matching energies+forces (first-order AD)."""
    from gcnn_keras_tpu.models.schnet import make_model
    from gcnn_keras_tpu.model.force import EnergyForceModel

    batch = _tiny_mol_batch()
    base = EnergyForceModel(make_model(
        depth=2, interaction_args={"units": 16}, gauss_args={"bins": 8},
        last_mlp={"units": [8], "activation": ["shifted_softplus"]},
        output_mlp={"units": [1], "activation": ["linear"]}))
    acc = EnergyForceModel(make_model(
        depth=2, interaction_args={"units": 16, "accurate_cfconv": True},
        gauss_args={"bins": 8},
        last_mlp={"units": [8], "activation": ["shifted_softplus"]},
        output_mlp={"units": [1], "activation": ["linear"]}))

    params = base.init(jax.random.PRNGKey(0), batch, train=False)
    # identical parameter pytree: the accurate path must restore base
    # checkpoints directly
    params_acc = acc.init(jax.random.PRNGKey(0), batch, train=False)
    assert jax.tree.structure(params) == jax.tree.structure(params_acc)

    out_b = base.apply(params, batch, train=False)
    out_a = acc.apply(params, batch, train=False)
    np.testing.assert_allclose(np.asarray(out_a["energy"]),
                               np.asarray(out_b["energy"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_a["force"]),
                               np.asarray(out_b["force"]),
                               rtol=1e-4, atol=1e-5)


def test_accurate_cfconv_rejects_nonreference_config():
    import pytest
    from gcnn_keras_tpu.models.schnet import make_model

    batch = _tiny_mol_batch()
    bad = make_model(depth=1,
                     interaction_args={"units": 8, "accurate_cfconv": True,
                                       "cfconv_pool": "mean"},
                     gauss_args={"bins": 8},
                     last_mlp={"units": [8],
                               "activation": ["shifted_softplus"]},
                     output_mlp={"units": [1], "activation": ["linear"]})
    with pytest.raises(ValueError, match="accurate_cfconv"):
        bad.init(jax.random.PRNGKey(0), batch)
