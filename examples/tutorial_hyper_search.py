"""Tutorial: hyperparameter search with HyperbandSearch.

Counterpart of the reference's ``tutorial_hyper_optuna`` /
``tutorial_hyper_keras_tuner`` notebooks — the in-house successive-halving
searcher the fork's ``*_hyp_param_search.py`` scripts use: declare a
space, give it a trial function, retrieve the best trial later.

Run: JAX_PLATFORMS=cpu python examples/tutorial_hyper_search.py
"""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gcnn_keras_tpu.utils.devices import honor_platform_env

honor_platform_env()

import jax                                                      # noqa: E402
import optax                                                    # noqa: E402

from gcnn_keras_tpu.batch import batch_graphs                   # noqa: E402
from gcnn_keras_tpu.graph.preprocess import set_range           # noqa: E402
from gcnn_keras_tpu.models.schnet import make_model             # noqa: E402
from gcnn_keras_tpu.training.hyper_search import (               # noqa: E402
    HyperbandSearch, SearchSpace, retrieve_trial)
from gcnn_keras_tpu.training.losses import masked_graph_mae      # noqa: E402
from gcnn_keras_tpu.training.trainer import Trainer              # noqa: E402

# data: one resident batch keeps the tutorial fast
rs = np.random.RandomState(0)
graphs = []
for _ in range(12):
    n = rs.randint(4, 7)
    g = {"node_number": rs.choice([1, 6, 8], size=n),
         "node_coordinates": (rs.randn(n, 3) * 1.5).astype(np.float32),
         "energy": np.array([rs.randn()], dtype=np.float32)}
    g = set_range(g, max_distance=4.0, max_neighbours=6)
    g["edge_indices"] = g.pop("range_indices")
    graphs.append(g)
batch = batch_graphs(graphs, global_keys=("energy",))

# 1. the space: choice / int / float / log_float specs
space = SearchSpace({
    "units": {"choice": [8, 16]},
    "depth": {"int": [1, 2]},
    "lr": {"log_float": [1e-3, 3e-2]},
})


# 2. the trial function: (hparams, epochs) -> metrics
def trial_fn(hp, epochs):
    model = make_model(
        depth=hp["depth"], interaction_args={"units": hp["units"]},
        gauss_args={"bins": 8, "distance_max": 4.0},
        last_mlp={"units": [8], "activation": ["shifted_softplus"]},
        output_mlp={"units": [1], "activation": ["linear"]})
    params = model.init(jax.random.PRNGKey(0), batch)

    def loss_fn(p, b):
        out = model.apply(p, b)["output"]
        return masked_graph_mae(out, b.globals["energy"],
                                b.globals["graph_mask"]), {}

    trainer = Trainer(loss_fn, optax.adam(hp["lr"]))
    state = trainer.init_state(params)
    for _ in range(epochs):
        state, metrics = trainer.fit_epoch(state, [batch])
    return {"val_loss": metrics["loss"]}


# 3. successive halving: every config gets min_epochs, the top 1/eta
# survive with eta x the budget, until max_epochs
outdir = tempfile.mkdtemp(prefix="hyp_tutorial_")
search = HyperbandSearch(space, objective="val_loss", direction="min",
                         num_trials=4, min_epochs=2, max_epochs=6, eta=2,
                         directory=outdir)
best = search.run(trial_fn)
print("best trial:", {k: best[k] for k in ("hparams", "val_loss")
                      if k in best} or best)

# 4. every trial persists as JSON; retrieve the best (or any) later —
# the fork's retrieve_trial.py does exactly this
stored = retrieve_trial(outdir)
print("retrieved:", sorted(stored.keys()))
print("tutorial complete")
