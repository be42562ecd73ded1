"""Tutorial: checkpointing and model-loading options.

Counterpart of the reference's ``tutorial_model_loading_options.ipynb``:
save a trained energy+force model (params + optimizer state), restore it
(latest or by step, cross-platform via the numpy fallback), rebuild the
model from config, and verify bit-identical predictions. Also shows the
fork-script route (`load_model.py --checkpoint ... --script ...`).

Run: JAX_PLATFORMS=cpu python examples/tutorial_model_loading.py
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
from gcnn_keras_tpu.model.force import EnergyForceModel         # noqa: E402
from gcnn_keras_tpu.utils.checkpoint import (load_checkpoint,   # noqa: E402
                                             save_checkpoint)

# a tiny trained state
rs = np.random.RandomState(0)
graphs = []
for _ in range(4):
    n = rs.randint(4, 7)
    g = {"node_number": rs.choice([1, 6, 8], size=n),
         "node_coordinates": (rs.randn(n, 3) * 1.5).astype(np.float32),
         "energy": np.array([rs.randn()], dtype=np.float32)}
    g = set_range(g, max_distance=4.0, max_neighbours=6)
    g["edge_indices"] = g.pop("range_indices")
    graphs.append(g)
batch = batch_graphs(graphs, global_keys=("energy",))

CONFIG = dict(depth=1, interaction_args={"units": 16},
              gauss_args={"bins": 8, "distance_max": 4.0},
              last_mlp={"units": [8], "activation": ["shifted_softplus"]},
              output_mlp={"units": [1], "activation": ["linear"]})
fmodel = EnergyForceModel(make_model(**CONFIG))
params = fmodel.init(jax.random.PRNGKey(0), batch, train=False)
opt = optax.adam(1e-3)
opt_state = opt.init(params)

# 1. save: params + optimizer state + any metadata, under step_<N>/
outdir = os.path.join(tempfile.mkdtemp(prefix="ckpt_tutorial_"), "model_0")
save_checkpoint(outdir, params, opt_state=opt_state, step=3)
save_checkpoint(outdir, params, opt_state=opt_state, step=7)
print("saved steps:", sorted(os.listdir(outdir)))

# 2. restore the LATEST (or ask for a specific step); training can resume
# because the optimizer state round-trips too
state = load_checkpoint(outdir)            # latest = step_7
state3 = load_checkpoint(outdir, step=3)
assert "opt_state" in state
print("restored latest + step 3, optimizer state included")

# 3. rebuild the model from config and verify identical predictions
rebuilt = EnergyForceModel(make_model(**CONFIG))
out_a = fmodel.apply(params, batch, train=False)
out_b = rebuilt.apply(state["params"], batch, train=False)
np.testing.assert_allclose(np.asarray(out_a["energy"]),
                           np.asarray(out_b["energy"]), rtol=0, atol=0)
print("rebuilt-from-config predictions identical")

# 4. the fork-script route: any trained fork checkpoint restores with
#    python load_model.py --checkpoint model_schnet_force_0 \
#        --script force_schnet
# (load_model merges the engine DEFAULTS under the script CONFIG and
# rebuilds via the script's build_model — tests/test_force_script.py
# round-trips this.)
print("tutorial complete")
