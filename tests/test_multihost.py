"""REAL multi-process (multi-host simulation) data-parallel training.

Spawns two separate Python processes, each with 2 virtual CPU devices,
joined via ``jax.distributed.initialize`` (gloo CPU collectives) through
``parallel.distributed.maybe_initialize_distributed``'s env-var path.
Each host loads only ITS shard (``host_shard_indices`` →
``local_batch_iterator``), assembles its slice of the global super-batch
host-locally (``shard_stacked_batch`` multi-process branch), and runs the
shared shard_map DP step over the 4-device global mesh.

The per-step losses must match a single-process 4-device run on the same
data — step-for-step, because gradients are pmean-reduced over the global
mesh either way. Two model tiers (VERDICT r2 item 6): a depth-1 SchNet
energy step, and the FLAGSHIP HDNNP4th charge+energy+force step (ACSF
G2+G4, Qeq charge solve, electrostatics, ESP force coupling) — the model
that matters, not just the smoke model. (The reference has no distributed
path at all, SURVEY §2.12.)
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_GRAPHS = 16
BATCH = 2          # molecules per device sub-batch
STEPS = 2
SEED = 3

_WORKER = r'''
import json, os, sys
sys.path.insert(0, os.environ["REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
from gcnn_keras_tpu.parallel.distributed import (
    maybe_initialize_distributed, local_batch_iterator)
assert maybe_initialize_distributed(), "distributed init failed"
assert jax.process_count() == 2 and jax.device_count() == 4

from test_multihost_common import (build_graphs, build_step, run_steps,
                                   loader_kwargs)
kind = os.environ.get("MH_MODEL", "schnet")
graphs = build_graphs(flagship=(kind == "hdnnp4th"))
from gcnn_keras_tpu.parallel.mesh import make_mesh
mesh = make_mesh()
step, state = build_step(mesh, kind)
batches = local_batch_iterator(graphs, int(os.environ["MH_BATCH"]), mesh,
                               seed=int(os.environ["MH_SEED"]),
                               **loader_kwargs(kind))
losses = run_steps(step, state, batches, int(os.environ["MH_STEPS"]))
if jax.process_index() == 0:
    print("LOSSES " + json.dumps(losses), flush=True)
'''

_COMMON = r'''
"""Shared builders for the multi-host test (imported by both the spawned
workers and the in-process reference run)."""
import numpy as np
import jax


def build_graphs(n=%(n)d, flagship=False):
    from gcnn_keras_tpu.graph.preprocess import set_range, set_angle
    rs = np.random.RandomState(7)
    graphs = []
    for _ in range(n):
        m = rs.randint(4, 8)
        g = {"node_number": rs.choice([1, 6, 8], size=m),
             "node_coordinates": (rs.randn(m, 3) * 1.5).astype(np.float32),
             "energy": np.array([rs.randn()], dtype=np.float32)}
        g = set_range(g, max_distance=4.0, max_neighbours=8)
        g["edge_indices"] = g.pop("range_indices")
        if flagship:
            g = set_angle(g, range_indices="edge_indices")
            g["force"] = (rs.randn(m, 3) * 0.1).astype(np.float32)
            g["charge"] = (rs.randn(m) * 0.1).astype(np.float32)
            g["esp"] = (rs.randn(m) * 0.02).astype(np.float32)
            g["esp_grad"] = (rs.randn(m, 3) * 0.02).astype(np.float32)
            g["total_charge"] = np.zeros((1,), dtype=np.float32)
        graphs.append(g)
    return graphs


def loader_kwargs(kind):
    if kind == "hdnnp4th":
        return dict(global_keys=("energy", "total_charge"),
                    n_node_pad=32, n_edge_pad=160, n_angle_pad=1024,
                    max_nodes=8)
    return dict(global_keys=("energy",), n_node_pad=32, n_edge_pad=160,
                max_nodes=8)


def build_step(mesh, kind="schnet"):
    import optax
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.parallel.data_parallel import make_dp_train_step
    from gcnn_keras_tpu.training.losses import (masked_graph_mae,
                                                masked_node_mae)

    flagship = kind == "hdnnp4th"
    probe = batch_graphs(build_graphs(flagship=flagship)[:%(batch)d],
                         np_out=True, n_graph_pad=%(batch)d + 1,
                         **{k: v for k, v in loader_kwargs(kind).items()
                            if k != "global_keys"},
                         global_keys=loader_kwargs(kind)["global_keys"])

    if flagship:
        from gcnn_keras_tpu.models.hdnnp4th import make_model_behler
        from gcnn_keras_tpu.model.force import EnergyForceModel
        elements = [1, 6, 8]
        inner = make_model_behler(
            g2_kwargs={"eta": [0.0, 0.3], "rs": [0.0, 2.5], "rc": 4.0,
                       "elements": elements},
            g4_kwargs={"eta": [0.0, 0.3], "lamda": [-1.0, 1.0], "rc": 4.0,
                       "zeta": [1.0, 4.0], "elements": elements,
                       "multiplicity": 2.0},
            mlp_charge_kwargs={"units": [16, 1], "num_relations": 6,
                               "activation": ["swish", "linear"]},
            mlp_local_kwargs={"units": [16, 1], "num_relations": 6,
                              "activation": ["swish", "linear"]})
        model = EnergyForceModel(inner, use_esp_coupling=True)
        params = model.init(jax.random.PRNGKey(0), probe, train=False)

        def loss_fn(p, b):
            out = model.apply(p, b, train=False)
            e = masked_graph_mae(out["energy"], b.globals["energy"],
                                 b.globals["graph_mask"])
            f = masked_node_mae(out["force"], b.nodes["force"], b.node_mask)
            q = masked_node_mae(out["charge"], b.nodes["charge"],
                                b.node_mask)
            return 50.0 * q + e + 200.0 * f, {}
    else:
        from gcnn_keras_tpu.models.schnet import make_model
        model = make_model(interaction_args={"units": 16}, depth=1,
                           gauss_args={"bins": 8})
        params = model.init(jax.random.PRNGKey(0), probe)

        def loss_fn(p, b):
            out = model.apply(p, b)["output"]
            return masked_graph_mae(out, b.globals["energy"],
                                    b.globals["graph_mask"]), {}

    opt = optax.adam(1e-2)
    step = make_dp_train_step(loss_fn, opt, mesh, donate=False)
    return step, (params, opt.init(params))


def run_steps(step, state, batches, n_steps):
    losses = []
    it = iter(batches)
    for _ in range(n_steps):
        state, metrics = step(state, next(it))
        losses.append(float(np.asarray(jax.device_get(metrics["loss"]))))
    return losses
'''


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def common_module(tmp_path_factory):
    d = tmp_path_factory.mktemp("mh")
    path = os.path.join(str(d), "test_multihost_common.py")
    with open(path, "w") as f:
        f.write(_COMMON % {"n": N_GRAPHS, "batch": BATCH})
    return str(d)


def _run_two_process(common_module, kind, steps):
    port = _free_port()
    env_base = dict(
        os.environ,
        REPO=REPO,
        PYTHONPATH=os.pathsep.join([REPO, common_module]
                                   + os.environ.get("PYTHONPATH", "").split(
                                       os.pathsep)),
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        JAX_PLATFORMS="cpu",
        JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
        JAX_NUM_PROCESSES="2",
        MH_BATCH=str(BATCH), MH_SEED=str(SEED), MH_STEPS=str(steps),
        MH_MODEL=kind,
    )
    procs = []
    for pid in range(2):
        env = dict(env_base, JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
    loss_line = [ln for ln in outs[0].splitlines()
                 if ln.startswith("LOSSES ")]
    assert loss_line, f"no losses printed:\n{outs[0][-2000:]}"
    mh_losses = json.loads(loss_line[0][len("LOSSES "):])
    assert len(mh_losses) == steps
    return mh_losses


def _single_process_reference(common_module, kind, steps):
    sys.path.insert(0, common_module)
    try:
        import importlib
        common = importlib.import_module("test_multihost_common")
        importlib.reload(common)
    finally:
        sys.path.remove(common_module)
    import jax
    from gcnn_keras_tpu.parallel.mesh import (
        make_mesh, stack_batches, shard_stacked_batch)
    from gcnn_keras_tpu.parallel.distributed import host_shard_indices
    from gcnn_keras_tpu.data.loader import GraphBatchLoader

    graphs = common.build_graphs(flagship=(kind == "hdnnp4th"))
    mesh = make_mesh(4)
    step, state = common.build_step(mesh, kind)
    kw = common.loader_kwargs(kind)

    # replicate the two hosts' local streams exactly
    host_iters = []
    for pid in range(2):
        idx = host_shard_indices(len(graphs), process_index=pid,
                                 process_count=2, seed=SEED)
        loader = GraphBatchLoader([graphs[i] for i in idx], BATCH,
                                  shuffle=True, seed=SEED, **kw)
        host_iters.append(iter(loader))

    ref_losses = []
    for _ in range(steps):
        group = []
        for it in host_iters:          # 2 sub-batches per host per step
            group += [next(it), next(it)]
        stacked = shard_stacked_batch(stack_batches(group), mesh)
        state, metrics = step(state, stacked)
        ref_losses.append(float(np.asarray(jax.device_get(metrics["loss"]))))
    return ref_losses


def test_two_process_dp_matches_single_process(common_module):
    mh = _run_two_process(common_module, "schnet", STEPS)
    ref = _single_process_reference(common_module, "schnet", STEPS)
    np.testing.assert_allclose(mh, ref, rtol=2e-5, atol=1e-6)


def test_two_process_flagship_hdnnp4th_force_step(common_module):
    """The FLAGSHIP charge+energy+force model across two real processes:
    one full DP step (Qeq solve + ESP force coupling inside the
    differentiated region) must match the single-process 4-device run."""
    mh = _run_two_process(common_module, "hdnnp4th", 1)
    ref = _single_process_reference(common_module, "hdnnp4th", 1)
    np.testing.assert_allclose(mh, ref, rtol=5e-5, atol=1e-6)
