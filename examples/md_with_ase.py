"""Example: run MD with a trained potential through the ASE calculator
(the reference's showcase workflow, ``kgcnn/moldyn`` + ASE).

Works offline: trains a tiny SchNet on the synthetic MD dataset first, then
velocity-verlet integrates a molecule with energies/forces served by the
jit-compiled model through MolDynamicsModelPredictor.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import optax
    from gcnn_keras_tpu.data.datasets.synthetic import SyntheticMDDataset
    from gcnn_keras_tpu.data.loader import GraphBatchLoader
    from gcnn_keras_tpu.models.schnet import make_model
    from gcnn_keras_tpu.model.force import EnergyForceModel
    from gcnn_keras_tpu.training.losses import masked_graph_mae, masked_node_mae
    from gcnn_keras_tpu.moldyn.base import MolDynamicsModelPredictor
    from gcnn_keras_tpu.graph.preprocess import get_preprocessor

    # 1. train a small potential
    ds = SyntheticMDDataset(num_frames=64, num_atoms=8)
    ds.map_list("set_range", max_distance=5.0, max_neighbours=12)
    for g in ds:
        g["edge_indices"] = g["range_indices"]
    model = make_model(depth=2, interaction_args={"units": 32},
                       gauss_args={"bins": 16, "distance_max": 5.0},
                       last_mlp={"units": [32], "activation": ["shifted_softplus"]},
                       output_mlp={"units": [1], "activation": ["linear"]})
    fmodel = EnergyForceModel(model)
    hint = ds.batch_shape_hint(16)
    loader = GraphBatchLoader(list(ds), 16, global_keys=("energy",), **hint)
    first = next(iter(loader))
    params = fmodel.init(jax.random.PRNGKey(0), first)
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    def loss_fn(p, b):
        out = fmodel.apply(p, b)
        return (masked_graph_mae(out["energy"], b.globals["energy"],
                                 b.globals["graph_mask"])
                + 100 * masked_node_mae(out["force"], b.nodes["force"],
                                        b.node_mask)), {}

    @jax.jit
    def step(p, s, b):
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(p, b)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    for epoch in range(30):
        for b in loader:
            params, opt_state, l = step(params, opt_state, b)
    print(f"trained: final loss {float(l):.4f}")

    # 2. serve it for MD
    class _ApplyModel:
        def apply(self, variables, batch, **kw):
            return fmodel.apply(variables, batch)

    predictor = MolDynamicsModelPredictor(
        model=_ApplyModel(), variables=params,
        graph_preprocessors=[get_preprocessor("set_range", max_distance=5.0,
                                              max_neighbours=12)])

    # 3. integrate (plain velocity verlet; swap in ase.md if ase is installed)
    frame = dict(ds[0])
    pos = np.array(frame["node_coordinates"], dtype=np.float64)
    z = frame["node_number"]
    vel = np.zeros_like(pos)
    masses = np.where(z == 1, 1.0, 12.0)[:, None]
    dt = 0.01
    for it in range(20):
        res = predictor([{"node_number": z, "node_coordinates":
                          pos.astype(np.float32)}])[0]
        force = np.asarray(res["force"], dtype=np.float64)
        vel += 0.5 * dt * force / masses
        pos += dt * vel
        res2 = predictor([{"node_number": z, "node_coordinates":
                           pos.astype(np.float32)}])[0]
        vel += 0.5 * dt * np.asarray(res2["force"], dtype=np.float64) / masses
        if it % 5 == 0:
            ke = 0.5 * float((masses * vel**2).sum())
            print(f"step {it}: E_pot={float(np.asarray(res['energy']).reshape(-1)[0]):.4f} "
                  f"E_kin={ke:.4f}")
    print("MD ran", flush=True)


if __name__ == "__main__":
    main()
