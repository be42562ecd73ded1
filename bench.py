"""Benchmark: edges/sec/chip on the SchNet energy+force training step,
plus the flagship HDNNP4th energy+force+charge step and roofline counters.

Prints ONE JSON line, ALWAYS, within a wall-clock budget
(GCNN_BENCH_BUDGET_S, default 460 s):

- Sections run in priority order (primary SchNet step first); each section
  is gated on the remaining budget with a conservative cold-compile cost
  estimate and marked ``"skipped (budget)"`` if it does not fit.
- A watchdog thread hard-emits whatever sub-records completed if the
  deadline passes mid-compile (a cold compile cannot be interrupted from
  Python), then exits 0 — so the driver's timeout can never produce a
  null record again (BENCH_r03 post-mortem: rc=124, parsed=null).
- A warm persistent compile cache (/tmp/jax_cache_tpu) makes repeat runs
  complete every section; a cold run completes the primary record plus
  whatever else fits.

Primary fields {"metric", "value", "unit", "vs_baseline"} track the SchNet
step (regression anchor BENCH_BASE); extra fields carry ms/step, the scan
ground-truth time, XLA-reported bytes+FLOPs, achieved GB/s and TFLOP/s
(roofline position), a MEASURED copy-bandwidth calibration
(achieved_gbps_measured context), and the HDNNP4th flagship / large-mol /
MD sub-records.
"""
import json
import os
import threading
import time

import numpy as np

# First VALIDATED single-chip value (edges/sec): 128-molecule batch,
# reference-default SchNet, energy+force train step on TPU v5e,
# 3.93 ms/step = 816 GB/s = HBM roofline; measured 2026-08-17 (see PERF.md).
# vs_baseline tracks training-throughput improvements from that first
# working configuration. (An earlier 16.6M reading was a timing artifact —
# it would imply 3.9 TB/s on an 819 GB/s part.)
#
# 2026-08-18: batch raised 128 -> 512 molecules after a saturation sweep
# (128: 3.48M, 512: 4.46M, 1024: 4.44M edges/s) — at 128 molecules the chip
# is underutilized and E_pad sits below the Pallas segment-sum dispatch
# threshold; 512 saturates. Same model, same step function, same per-edge
# work; the measured speedup is real utilization, not metric inflation.
BENCH_BASE = 3.5e6

# TPU v5e single-chip peaks for roofline fractions
HBM_PEAK_GBPS = 819.0
F32_PEAK_TFLOPS = 98.5  # v5e bf16 peak 197 TFLOP/s; f32 ~ half

_T0 = time.monotonic()
_BUDGET = float(os.environ.get("GCNN_BENCH_BUDGET_S", "460"))
_FULL = os.environ.get("GCNN_BENCH_FULL", "") == "1"  # ignore budget gates
_LOCK = threading.Lock()
_PRINTED = False

# The record skeleton: every section key exists up front so a watchdog
# emission is a complete, parseable record with explicit skip markers.
RECORD = {
    "metric": "schnet_energy_force_train_edges_per_sec_per_chip",
    "value": None,
    "unit": "edges/s",
    "vs_baseline": None,
    "status": "started",
    "sections": {},
}


def _remaining():
    return _BUDGET - (time.monotonic() - _T0)


def _emit_once(status=None):
    """Print the ONE json line. Sections mutate RECORD from the main
    thread while the watchdog may serialize it concurrently — serialize
    under the lock with a retry, and only mark printed after the print
    actually happened (a mid-dump 'dict changed size' must never eat the
    record)."""
    global _PRINTED
    with _LOCK:
        if _PRINTED:
            return
        if status is not None:
            RECORD["status"] = status
        line = None
        for _ in range(5):
            try:
                line = json.dumps(RECORD)
                break
            except RuntimeError:  # racing mutation during iteration
                time.sleep(0.05)
        if line is None:  # last resort: minimal but valid record
            line = json.dumps({
                "metric": RECORD["metric"], "value": RECORD.get("value"),
                "unit": RECORD["unit"],
                "vs_baseline": RECORD.get("vs_baseline"),
                "status": "emit_race"})
        print(line, flush=True)
        _PRINTED = True


def _watchdog():
    while True:
        left = _remaining()
        if left <= 0:
            break
        time.sleep(min(left, 2.0))
    with _LOCK:
        if _PRINTED:
            return
    _emit_once(status="budget_exceeded (partial record; watchdog emit)")
    os._exit(0)


def _mark(label):
    """Timeline breadcrumb: survives a watchdog emit, so a cut-off run
    still shows exactly where the budget went."""
    RECORD.setdefault("timeline", {})[label] = round(time.monotonic() - _T0, 1)


def _section(name, est_cost_s, fn, *args):
    """Run one bench section if the remaining budget covers its estimated
    cold cost; record success/skip/error without losing other sections."""
    if not _FULL and _remaining() < est_cost_s:
        RECORD["sections"][name] = "skipped (budget)"
        return None
    t0 = time.monotonic()
    RECORD["sections"][name] = "started"
    try:
        out = fn(*args)
        RECORD["sections"][name] = f"ok ({time.monotonic() - t0:.0f}s)"
        return out
    except Exception as e:  # a failing sub-bench must not kill the record
        RECORD["sections"][name] = f"error: {type(e).__name__}: {e}"[:200]
        return None


def _mols(rs, n_mols, with_esp=False):
    from gcnn_keras_tpu.graph.preprocess import set_range, set_angle

    graphs = []
    for _ in range(n_mols):
        n = rs.randint(12, 21)  # QM9-like molecule sizes
        g = {
            "node_number": rs.choice([1, 6, 7, 8, 9], size=n),
            "node_coordinates": (rs.randn(n, 3) * 2.0).astype(np.float32),
            "energy": np.array([rs.randn()], dtype=np.float32),
        }
        g = set_range(g, max_distance=4.0, max_neighbours=25)
        g["edge_indices"] = g.pop("range_indices")
        g["force"] = (rs.randn(n, 3) * 0.1).astype(np.float32)
        if with_esp:
            g = set_angle(g, range_indices="edge_indices")
            g["esp"] = (rs.randn(n) * 0.02).astype(np.float32)
            g["esp_grad"] = (rs.randn(n, 3) * 0.02).astype(np.float32)
            g["total_charge"] = np.zeros((1,), dtype=np.float32)
            g["charge"] = (rs.randn(n) * 0.1).astype(np.float32)
        graphs.append(g)
    return graphs


def _timeit(fn, args, iters):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def _cost(jitted, *args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def bench_schnet_setup(jax, jnp, optax):
    """Build the jitted SchNet E+F train step + its args (shared with
    tools/profile_hbm_traffic.py so the profiled step IS the benched one)."""
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.models.schnet import make_model
    from gcnn_keras_tpu.model.force import EnergyForceModel
    from gcnn_keras_tpu.training.losses import masked_graph_mae, masked_node_mae

    rs = np.random.RandomState(0)
    batch = batch_graphs(_mols(rs, 512), global_keys=("energy",))
    n_real_edges = int(np.asarray(batch.edge_mask).sum())

    fmodel = EnergyForceModel(make_model())  # reference defaults: 128u, d4
    # jit the init: EAGER flax init dispatches every op separately
    # through the tunnel (~10 ms/launch x thousands of ops = minutes;
    # the r4 cold-timeline mark measured 785 s of setup vs 6 s compile)
    params = jax.jit(lambda k, b: fmodel.init(k, b, train=False))(
        jax.random.PRNGKey(0), batch)

    def loss_fn(params, b):
        out = fmodel.apply(params, b, train=False)
        e_loss = masked_graph_mae(out["energy"], b.globals["energy"],
                                  b.globals["graph_mask"])
        f_loss = masked_node_mae(out["force"], b.nodes["force"], b.node_mask)
        return e_loss + 100.0 * f_loss, {}

    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, b):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, b)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step, (params, opt_state, batch), n_real_edges


def sec_schnet_step(jax, jnp, optax):
    """PRIMARY record: the dispatch-loop SchNet E+F train step."""
    step, args, n_real_edges = bench_schnet_setup(jax, jnp, optax)
    _mark("schnet_setup_done")
    out = step(*args)  # compile
    jax.block_until_ready(out)
    _mark("schnet_compiled")
    dt, _ = _timeit(step, args, iters=50)
    flops, bytes_acc = _cost(step, *args)
    RECORD["value"] = round(n_real_edges / dt, 1)
    RECORD["vs_baseline"] = round(n_real_edges / dt / BENCH_BASE, 4)
    RECORD["ms_per_step"] = round(dt * 1e3, 3)
    # bytes/GB/s from cost analysis are UPPER BOUNDS: pallas kernels get
    # their full HBM operands re-counted per grid step, so the fraction
    # can exceed 1.0 — named *_upper_bound accordingly (VERDICT r4 item
    # 5). The MEASURED step traffic lands in achieved_gbps_measured /
    # hbm_frac_measured (sec_hbm_traffic, profiler-derived).
    RECORD["bytes_per_step_upper_bound"] = bytes_acc
    RECORD["flops_per_step"] = flops
    RECORD["achieved_gbps_upper_bound"] = round(bytes_acc / dt / 1e9, 1)
    RECORD["achieved_tflops"] = round(flops / dt / 1e12, 2)
    RECORD["hbm_frac_upper_bound"] = round(
        bytes_acc / dt / 1e9 / HBM_PEAK_GBPS, 3)
    RECORD["mfu_f32"] = round(flops / dt / 1e12 / F32_PEAK_TFLOPS, 4)
    return step, args, n_real_edges, flops


def sec_schnet_scan(jax, schnet_ctx):
    """Ground truth: K steps inside ONE jitted lax.scan — one dispatch, K
    sequential device executions; immune to tunnel/host dispatch artifacts
    (tools/scan_timing.py; r3 measured loop 10.96 ms vs scan 10.32 ms, i.e.
    the dispatch loop is honest to ~6% at this batch size). Params evolve
    through the optimizer each iteration, so XLA cannot fold the loop."""
    step, args, n_real_edges, flops = schnet_ctx
    params, opt_state, batch = args
    k = 20

    @jax.jit
    def multi(params, opt_state, b):
        def body(carry, _):
            p, s = carry
            p, s, loss = step.__wrapped__(p, s, b)
            return (p, s), loss

        (p, s), losses = jax.lax.scan(body, (params, opt_state), None,
                                      length=k)
        return p, s, losses[-1]

    dt_scan, _ = _timeit(multi, (params, opt_state, batch), iters=3)
    dt_scan /= k
    RECORD["ms_per_step_scan"] = round(dt_scan * 1e3, 3)
    RECORD["edges_per_sec_scan"] = round(n_real_edges / dt_scan, 1)
    # MFU from the scan ground-truth time (physical device seconds)
    RECORD["mfu_f32"] = round(flops / dt_scan / 1e12 / F32_PEAK_TFLOPS, 4)


def sec_hbm_measured(jax, jnp):
    """Calibrated bandwidth context (VERDICT r3 item 9): the ACHIEVED HBM
    copy bandwidth of this chip+host (read+write of a 1 GiB array), the
    physical yardstick the cost-analysis upper bounds should be read
    against (method: tools/profile_hbm_traffic.py)."""
    x = jnp.ones((256, 1024, 1024), jnp.float32)  # 1 GiB

    @jax.jit
    def cp(a):
        return a + 1.0

    y = cp(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(10):
        y = cp(y)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / 10
    RECORD["copy_gbps_measured"] = round((2 * x.size * 4) / dt / 1e9, 1)
    if "ms_per_step_scan" in RECORD \
            and RECORD.get("bytes_per_step_upper_bound"):
        # honest achieved GB/s if the step truly moved bytes_per_step
        # (upper bound) in its ground-truth device time
        RECORD["achieved_gbps_upper_bound_scan"] = round(
            RECORD["bytes_per_step_upper_bound"]
            / (RECORD["ms_per_step_scan"] / 1e3) / 1e9, 1)


def _pb_varint(buf, i):
    r = s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def _pb_hbm_bytes(buf):
    """Hand-decode an op's ``memory_access_breakdown`` stat (serialized
    op_metrics.proto MemoryAccessBreakdown: repeated MemoryAccessed
    {1: operation_type, 2: memory_space, 3: bytes_accessed}) and return
    the HBM-space (space 1) bytes — the proto module is not shipped in
    this environment, and the varint schema is 3 fixed fields."""
    total, i = 0, 0
    while i < len(buf):
        tag, i = _pb_varint(buf, i)
        fld, wt = tag >> 3, tag & 7
        if fld == 1 and wt == 2:
            ln, i = _pb_varint(buf, i)
            sub = buf[i:i + ln]
            i += ln
            space = nbytes = 0
            j = 0
            while j < len(sub):
                t2, j = _pb_varint(sub, j)
                v2, j = _pb_varint(sub, j)
                f2 = t2 >> 3
                if f2 == 2:
                    space = v2
                elif f2 == 3:
                    nbytes = v2
            if space == 1:
                total += nbytes
        elif wt == 0:
            _, i = _pb_varint(buf, i)
        elif wt == 2:
            ln, i = _pb_varint(buf, i)
            i += ln
        else:
            break
    return total


def sec_hbm_traffic(jax, schnet_ctx):
    """MEASURED step traffic (VERDICT r4 item 5): profile 3 executions of
    the benched SchNet step and sum, over device ops ACTUALLY RUN, the
    HBM-space component of each op's ``memory_access_breakdown`` (the
    plain bytes_accessed stat counts every memory space — on-chip VMEM
    re-reads included — and the cost-analysis number additionally
    re-counts Pallas operands per grid step; both exceed HBM peak).
    Divides by the scan ground-truth time for an hbm_frac_measured that
    is physically <= 1.0. r5 first measurement: 4.06 GB/step = 391 GB/s
    = 0.48 of peak — the step is latency-bound, not bandwidth-bound."""
    import glob
    import tempfile
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION",
                          "python")
    try:
        from tensorboard_plugin_profile.protobuf import xplane_pb2
    except ImportError:  # proto lives under tensorflow's tsl in this env
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    step, args, n_real_edges, flops = schnet_ctx
    reps = 3
    logdir = tempfile.mkdtemp(prefix="jaxprof_bench_")
    with jax.profiler.trace(logdir):
        out = None
        for _ in range(reps):
            out = step(*args)
        jax.block_until_ready(out)

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, "no xplane.pb produced"
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())
    total_bytes = 0
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        stat_names = {m.id: m.name for m in plane.stat_metadata.values()}
        hbm_by_meta = {}
        for m in plane.event_metadata.values():
            for st in m.stats:
                if stat_names.get(st.metadata_id) \
                        == "memory_access_breakdown":
                    hbm_by_meta[m.id] = _pb_hbm_bytes(st.bytes_value)
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                total_bytes += hbm_by_meta.get(ev.metadata_id, 0)
    if not total_bytes:
        RECORD["hbm_traffic_note"] = "no memory_access_breakdown in trace"
        return
    bytes_per_step = total_bytes / reps
    dt_s = (RECORD.get("ms_per_step_scan")
            or RECORD["ms_per_step"]) / 1e3
    RECORD["bytes_per_step_measured"] = round(bytes_per_step, 1)
    RECORD["achieved_gbps_measured"] = round(bytes_per_step / dt_s / 1e9, 1)
    RECORD["hbm_frac_measured"] = round(
        bytes_per_step / dt_s / 1e9 / HBM_PEAK_GBPS, 3)


def bench_painn_model():
    """PAiNN bench config (mirrors force_painn.py: depth 3, 128 units,
    20 radial Bessel, 5.0 cutoff). Shared with
    tools/sweep_family_batches.py so the sweep measures THIS model."""
    from gcnn_keras_tpu.models.painn import make_model
    return make_model(
        depth=3, conv_args={"units": 128, "cutoff": 5.0},
        update_args={"units": 128},
        input_embedding={"node": {"output_dim": 128}},
        bessel_basis={"num_radial": 20, "cutoff": 5.0},
        output_mlp={"units": [128, 1], "activation": ["swish", "linear"]})


def bench_hdnnp2nd_model():
    """HDNNP2nd bench config (mirrors force_hdnnp2nd.py: shared G2+G4
    tables + relational MLP, no charge head). Shared with
    tools/sweep_family_batches.py."""
    from gcnn_keras_tpu.models.hdnnp2nd import make_model_behler
    elements = [1, 6, 7, 8, 9]
    return make_model_behler(
        g2_kwargs={"eta": [0.0, 0.3], "rs": [0.0, 3.0], "rc": 4.0,
                   "elements": elements},
        g4_kwargs={"eta": [0.0, 0.3], "lamda": [-1.0, 1.0], "rc": 4.0,
                   "zeta": [1.0, 8.0], "elements": elements,
                   "multiplicity": 2.0},
        mlp_kwargs={"units": [64, 64, 1], "num_relations": 10,
                    "activation": ["swish", "swish", "linear"]})


def bench_hdnnp4th_model(**electro_overrides):
    """Flagship HDNNP4th bench config (mirrors force_hdnnp4th.py tables).
    Shared with tools/sweep_family_batches.py and the Qeq A/B tool
    (electro_overrides, e.g. dense_impl="cholesky")."""
    from gcnn_keras_tpu.models.hdnnp4th import make_model_behler
    elements = [1, 6, 7, 8, 9]
    return make_model_behler(
        g2_kwargs={"eta": [0.0, 0.3], "rs": [0.0, 3.0], "rc": 4.0,
                   "elements": elements},
        g4_kwargs={"eta": [0.0, 0.3], "lamda": [-1.0, 1.0], "rc": 4.0,
                   "zeta": [1.0, 8.0], "elements": elements,
                   "multiplicity": 2.0},
        mlp_charge_kwargs={"units": [64, 64, 1], "num_relations": 10,
                           "activation": ["swish", "swish", "linear"]},
        mlp_local_kwargs={"units": [64, 64, 1], "num_relations": 10,
                          "activation": ["swish", "swish", "linear"]},
        electrostatic_kwargs={"param_trainable": False, **electro_overrides})


def _hdnnp_setup(jax, jnp, optax):
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.model.force import EnergyForceModel
    from gcnn_keras_tpu.training.losses import masked_graph_mae, masked_node_mae

    rs = np.random.RandomState(1)
    graphs = _mols(rs, 128, with_esp=True)
    batch = batch_graphs(graphs, global_keys=("energy", "total_charge"))
    n_edges = int(np.asarray(batch.edge_mask).sum())
    n_angles = int(np.asarray(batch.angle_mask).sum()) \
        if batch.angle_mask is not None else 0

    fmodel = EnergyForceModel(bench_hdnnp4th_model(), use_esp_coupling=True)
    params = jax.jit(lambda k, b: fmodel.init(k, b, train=False))(
        jax.random.PRNGKey(0), batch)

    def loss_fn(params, b):
        out = fmodel.apply(params, b, train=False)
        e_loss = masked_graph_mae(out["energy"], b.globals["energy"],
                                  b.globals["graph_mask"])
        f_loss = masked_node_mae(out["force"], b.nodes["force"], b.node_mask)
        q_loss = masked_node_mae(out["charge"], b.nodes["charge"], b.node_mask)
        return 50.0 * q_loss + e_loss + 200.0 * f_loss, {}

    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    def step_fn(params, opt_state, b):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, b)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step_fn, (params, opt_state, batch), n_edges, n_angles


def sec_hdnnp_step(jax, jnp, optax):
    """Flagship: HDNNP4th charge+energy+force train step (ACSF G2+G4,
    Qeq solve, electrostatics, QM/MM, ESP force coupling)."""
    step_fn, args, n_edges, n_angles = _hdnnp_setup(jax, jnp, optax)
    step = jax.jit(step_fn)
    dt, _ = _timeit(step, args, iters=20)
    RECORD["hdnnp4th"] = {
        "edges_per_sec": round(n_edges / dt, 1),
        "angles_per_sec": round(n_angles / dt, 1),
        "ms_per_step": round(dt * 1e3, 3),
    }
    return step_fn, args, n_edges, n_angles


def sec_hdnnp_scan(jax, ctx):
    """Flagship scan ground truth (r3: the dispatch loop carries ~26%
    launch inflation — 13.7 ms loop vs 10.1 ms scanned)."""
    step_fn, args, n_edges, n_angles = ctx
    params, opt_state, batch = args
    k = 10

    @jax.jit
    def multi(params, opt_state, b):
        def body(carry, _):
            p, s = carry
            p, s, loss = step_fn(p, s, b)
            return (p, s), loss

        (p, s), losses = jax.lax.scan(body, (params, opt_state), None,
                                      length=k)
        return p, s, losses[-1]

    dt_scan, _ = _timeit(multi, (params, opt_state, batch), iters=2)
    dt_scan /= k
    RECORD["hdnnp4th"]["ms_per_step_scan"] = round(dt_scan * 1e3, 3)
    RECORD["hdnnp4th"]["edges_per_sec_scan"] = round(n_edges / dt_scan, 1)
    RECORD["hdnnp4th"]["angles_per_sec_scan"] = round(n_angles / dt_scan, 1)


def sec_hdnnp_qeq(jax, jnp, ctx):
    """Qeq dense charge solve alone (the reference's O(M^3) wall).

    CAVEAT: this is a dispatch-loop measurement of a sub-ms program — the
    reported ms is mostly the tunnel's fixed launch latency (the batched
    22x22 LU itself measures 0.026 ms device time at these shapes);
    treat as an upper bound / regression signal only."""
    from gcnn_keras_tpu.layers.conv.hdnnp_electro import CENTCharge

    _, args, _, _ = ctx
    batch = args[2]
    chi = jnp.asarray(np.random.RandomState(2).randn(batch.n_node)
                      .astype(np.float32))
    cent = CENTCharge(solver="dense")

    @jax.jit
    def qeq_only(b, chi):
        return cent.apply({}, b, chi)

    qeq_dt, _ = _timeit(qeq_only, (batch, chi), iters=20)
    RECORD["hdnnp4th"]["qeq_solve_ms"] = round(qeq_dt * 1e3, 3)


def _ef_train_step(jax, optax, fmodel, batch):
    """Shared E+F train-step builder for the per-family bench sections."""
    from gcnn_keras_tpu.training.losses import masked_graph_mae, masked_node_mae

    params = jax.jit(lambda k, b: fmodel.init(k, b, train=False))(
        jax.random.PRNGKey(0), batch)

    def loss_fn(params, b):
        out = fmodel.apply(params, b, train=False)
        e_loss = masked_graph_mae(out["energy"], b.globals["energy"],
                                  b.globals["graph_mask"])
        f_loss = masked_node_mae(out["force"], b.nodes["force"], b.node_mask)
        return e_loss + 100.0 * f_loss, {}

    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    def step_fn(params, opt_state, b):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, b)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step_fn, (params, opt_state, batch)


def _family_record(jax, step_fn, args, n_edges, loop_iters=10, k=10):
    """Loop + scan ground-truth timings for one model family."""
    step = jax.jit(step_fn)
    dt, _ = _timeit(step, args, iters=loop_iters)

    @jax.jit
    def multi(params, opt_state, b):
        def body(carry, _):
            p, s = carry
            p, s, loss = step_fn(p, s, b)
            return (p, s), loss

        (p, s), losses = jax.lax.scan(body, (params, opt_state), None,
                                      length=k)
        return p, s, losses[-1]

    dt_scan, _ = _timeit(multi, args, iters=2)
    dt_scan /= k
    if dt_scan * 20 < dt:
        # a scan step physically cannot be 20x faster than the
        # dispatch-loop step — re-measure once (one bench run recorded a
        # 0.042 ms glitch for a 15.5 ms giant-mol scan)
        dt_scan, _ = _timeit(multi, args, iters=2)
        dt_scan /= k
    return {"ms_per_step": round(dt * 1e3, 3),
            "ms_per_step_scan": round(dt_scan * 1e3, 3),
            "edges_per_sec": round(n_edges / dt, 1),
            "edges_per_sec_scan": round(n_edges / dt_scan, 1)}


def sec_gcn_cora(jax, jnp, optax):
    """GCN node classification at Cora scale (BASELINE target family 1:
    GCN/Cora, 70-class) — one 2708-node citation graph, 1433-dim sparse
    features, full-batch training step (the reference protocol). Completes
    throughput records for all five BASELINE families."""
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.data.datasets.synthetic import (
        SyntheticCitationDataset)
    from gcnn_keras_tpu.models.gcn import make_model
    from gcnn_keras_tpu.training.losses import (
        masked_categorical_crossentropy)

    from gcnn_keras_tpu.graph.preprocess import (
        normalize_edge_weights_symmetric, set_edge_weights_uniform)

    ds = SyntheticCitationDataset(num_nodes=2708, num_classes=70,
                                  feature_dim=1433, avg_degree=4, seed=1)
    g = dict(ds[0])
    g = normalize_edge_weights_symmetric(set_edge_weights_uniform(g))
    batch = batch_graphs([g])
    labels = jnp.asarray(np.asarray(g["node_labels"]))
    labels = jnp.pad(labels, (0, batch.n_node - labels.shape[0]))
    n_edges = int(np.asarray(batch.edge_mask).sum())

    model = make_model(depth=3, gcn_args={"units": 140},
                       output_embedding="node",
                       output_mlp={"units": [70], "activation": ["linear"]})
    params = jax.jit(lambda k, b: model.init(k, b))(
        jax.random.PRNGKey(0), batch)

    def loss_fn(p, b):
        logits = model.apply(p, b)["output"]
        return masked_categorical_crossentropy(logits, labels,
                                               b.node_mask), {}

    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)

    def step_fn(p, s, b):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, b)
        upd, s = optimizer.update(grads, s, p)
        return optax.apply_updates(p, upd), s, loss

    rec = _family_record(jax, step_fn, (params, opt_state, batch), n_edges)
    rec["nodes"] = 2708
    RECORD["gcn_cora"] = rec


def sec_painn(jax, jnp, optax):
    """PAiNN E+F train step (BASELINE target family 3; config mirrors
    force_painn.py: depth 3, 128 units, 20 radial Bessel, 5.0 cutoff).
    VERDICT r4 item 3: previously unbenched; a regression here was
    invisible to the driver.

    256 molecules = the measured saturating batch (r5 sweep: 128 -> 803k,
    256 -> 1.14M, 512 -> 1.11M edges/s; 128 mols kept E below the 16k
    Pallas gather/segsum dispatch thresholds). At saturation PAiNN matches
    SchNet's per-LANE throughput — its (E, 3U) filter + (E, 3, U)
    equivariant chains move ~3.4x the lanes per edge."""
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.model.force import EnergyForceModel

    rs = np.random.RandomState(4)
    batch = batch_graphs(_mols(rs, 256), global_keys=("energy",))
    n_edges = int(np.asarray(batch.edge_mask).sum())
    step_fn, args = _ef_train_step(jax, optax,
                                   EnergyForceModel(bench_painn_model()),
                                   batch)
    RECORD["painn"] = _family_record(jax, step_fn, args, n_edges)


def sec_hdnnp2nd(jax, jnp, optax):
    """HDNNP2nd E+F train step (BASELINE target family 4; config mirrors
    force_hdnnp2nd.py: shared G2+G4 tables + relational MLP, no charge
    head).

    1024 molecules = the measured saturation knee (r5 sweep, scan
    edges/s: 128 -> 3.79M, 256 -> 4.33M, 512 -> 5.04M, 1024 -> 5.46M,
    2048 -> 5.68M; the next doubling past 1024 gains <5%). The r5
    official record was briefly 128 mols (3.65M) before the sweep."""
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.model.force import EnergyForceModel

    rs = np.random.RandomState(5)
    graphs = _mols(rs, 1024, with_esp=True)  # with_esp builds the angles
    batch = batch_graphs(graphs, global_keys=("energy",))
    n_edges = int(np.asarray(batch.edge_mask).sum())
    n_angles = int(np.asarray(batch.angle_mask).sum())
    step_fn, args = _ef_train_step(jax, optax,
                                   EnergyForceModel(bench_hdnnp2nd_model()),
                                   batch)
    rec = _family_record(jax, step_fn, args, n_edges)
    dt_scan = rec["ms_per_step_scan"] / 1e3
    rec["angles_per_sec_scan"] = round(n_angles / dt_scan, 1)
    RECORD["hdnnp2nd"] = rec


def bench_large_mol_step(jax, optax, n, **electro_overrides):
    """Build the giant-single-molecule flagship train step (shared with
    tools/ab_qeq_cholesky.py so the A/B measures EXACTLY the bench
    workload). Returns (step_fn, args, n_edges, n_angles)."""
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.graph.preprocess import set_range, set_angle
    from gcnn_keras_tpu.models.hdnnp4th import make_model_behler
    from gcnn_keras_tpu.model.force import EnergyForceModel
    from gcnn_keras_tpu.training.losses import masked_graph_mae, masked_node_mae

    rs = np.random.RandomState(3)
    t = np.arange(n) * 1.3
    pos = np.stack([t, 2.0 * np.sin(t * 0.05), 2.0 * np.cos(t * 0.03)],
                   axis=1).astype(np.float32)
    pos += rs.randn(n, 3).astype(np.float32) * 0.05
    g = {"node_number": rs.choice([1, 6, 7, 8, 9], size=n),
         "node_coordinates": pos,
         "energy": np.array([rs.randn()], dtype=np.float32)}
    g = set_range(g, max_distance=3.5, max_neighbours=12)
    g["edge_indices"] = g.pop("range_indices")
    g = set_angle(g, range_indices="edge_indices")
    g["force"] = (rs.randn(n, 3) * 0.1).astype(np.float32)
    g["esp"] = (rs.randn(n) * 0.02).astype(np.float32)
    g["esp_grad"] = (rs.randn(n, 3) * 0.02).astype(np.float32)
    g["total_charge"] = np.zeros((1,), dtype=np.float32)
    g["charge"] = (rs.randn(n) * 0.1).astype(np.float32)
    batch = batch_graphs([g], global_keys=("energy", "total_charge"))
    n_edges = int(np.asarray(batch.edge_mask).sum())
    n_angles = int(np.asarray(batch.angle_mask).sum())

    elements = [1, 6, 7, 8, 9]
    model = make_model_behler(
        g2_kwargs={"eta": [0.0, 0.3], "rs": [0.0, 3.0], "rc": 3.5,
                   "elements": elements},
        g4_kwargs={"eta": [0.0, 0.3], "lamda": [-1.0, 1.0], "rc": 3.5,
                   "zeta": [1.0, 8.0], "elements": elements,
                   "multiplicity": 2.0},
        mlp_charge_kwargs={"units": [64, 64, 1], "num_relations": 10,
                           "activation": ["swish", "swish", "linear"]},
        mlp_local_kwargs={"units": [64, 64, 1], "num_relations": 10,
                          "activation": ["swish", "swish", "linear"]},
        electrostatic_kwargs={"param_trainable": False, "solver": "auto",
                              **electro_overrides})
    fmodel = EnergyForceModel(model, use_esp_coupling=True)
    params = jax.jit(lambda k, b: fmodel.init(k, b, train=False))(
        jax.random.PRNGKey(0), batch)

    def loss_fn(params, b):
        out = fmodel.apply(params, b, train=False)
        e_loss = masked_graph_mae(out["energy"], b.globals["energy"],
                                  b.globals["graph_mask"])
        f_loss = masked_node_mae(out["force"], b.nodes["force"], b.node_mask)
        q_loss = masked_node_mae(out["charge"], b.nodes["charge"], b.node_mask)
        return 50.0 * q_loss + e_loss + 200.0 * f_loss, {}

    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    def step_fn(params, opt_state, b):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, b)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step_fn, (params, opt_state, batch), n_edges, n_angles


def _large_mol_record(jax, optax, n):
    """Flagship force train step on one giant locality-sorted molecule
    (VERDICT r2 item 4 / the BASELINE north star). The reference wall
    being removed: kgcnn/layers/conv/hdnnp_conv.py:250 (dense O(M^3) LU
    per molecule); solver='auto' picks dense vs row-sharded CG by
    measured crossover (tools/qeq_crossover.py), gradients pinned by
    tests/test_qeq_solver.py::test_iterative_qeq_inside_full_force_train_step.
    Scan numbers are the stable ground truth; the dispatch-loop ms
    fluctuates with host load."""
    step_fn, args, n_edges, n_angles = bench_large_mol_step(jax, optax, n)
    rec = _family_record(jax, step_fn, args, n_edges)
    dt_scan = rec["ms_per_step_scan"] / 1e3
    rec.update(atoms=n, qeq="dense_cholesky_auto",
               angles_per_sec_scan=round(n_angles / dt_scan, 1))
    return rec


def sec_hdnnp_large_mol(jax, jnp, optax):
    RECORD["hdnnp4th_large_mol"] = _large_mol_record(jax, optax, n=520)


def sec_hdnnp_giant_mol(jax, jnp, optax):
    """4x the large-mol record: one 2080-atom molecule (the scale the
    qeq-crossover sweep topped out at). Registered LAST so a budget-cut
    run drops this section first."""
    RECORD["hdnnp4th_giant_mol"] = _large_mol_record(jax, optax, n=2080)


def _md_system(rs, n, t, seed_offset=0):
    pos = np.stack([t, 1.5 * np.sin(t * 0.9), 1.5 * np.cos(t * 0.7)], axis=1)
    return {"node_number": rs.choice([1, 6, 7, 8], size=n),
            "node_coordinates": (pos + rs.randn(n, 3) * 0.1).astype(np.float32)}


def sec_md_single(jax, jnp):
    """On-device MD step latency: K velocity-Verlet steps of a 21-atom
    molecule inside ONE jitted lax.scan (the moldyn/integrate.py deployment
    path), reported as the slope between two scan lengths so fixed
    dispatch/transfer costs cancel. This is the latency observable MD
    serving actually sees (the reference's ASE python-loop integrator pays
    a host round trip EVERY step instead, kgcnn/moldyn/ase_calc.py:75)."""
    from functools import partial

    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.graph.preprocess import set_range
    from gcnn_keras_tpu.models.schnet import make_model
    from gcnn_keras_tpu.moldyn.integrate import make_energy_force_fn

    rs = np.random.RandomState(7)
    n = 21
    t = np.arange(n) * 1.2
    g = _md_system(rs, n, t)
    g["energy"] = np.array([0.0], dtype=np.float32)
    g = set_range(g, max_distance=4.0, max_neighbours=25)
    g["edge_indices"] = g.pop("range_indices")
    batch = batch_graphs([g], global_keys=("energy",))

    model = make_model()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    fn = make_energy_force_fn(model, params, batch)
    mask = batch.node_mask[:, None].astype(jnp.float32)
    m = jnp.full((batch.n_node, 1), 12.0, jnp.float32)
    DT = 5e-4

    def body(carry, _):
        pos, vel, force = carry
        vel_h = vel + 0.5 * DT * force / m
        pos_n = pos + DT * vel_h * mask
        e, f_n = fn(pos_n)
        f_n = f_n * mask
        return (pos_n, vel_h + 0.5 * DT * f_n / m, f_n), e

    @partial(jax.jit, static_argnums=2)
    def run(pos, vel, k):
        _, f0 = fn(pos)
        (p, v, _), es = jax.lax.scan(body, (pos, vel, f0 * mask), None,
                                     length=k)
        return p, v, es[-1]

    pos0 = batch.nodes["node_coordinates"]
    vel0 = jnp.zeros_like(pos0)

    def wall_once(k):
        t0 = time.perf_counter()
        out = run(pos0, vel0, k)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    # warm both scan lengths, then time INTERLEAVED (t1, t2) pairs and
    # take the minimum slope: robust to host-load spikes AND drift
    # through the tunnel (mean-of-3 swung 18-28 us/step between runs;
    # independent min-of-reps decorrelated the pair and was worse).
    jax.block_until_ready(run(pos0, vel0, 50))
    jax.block_until_ready(run(pos0, vel0, 400))
    slope = min((wall_once(400) - wall_once(50)) / 350 for _ in range(4))
    RECORD["md_schnet_21atom"] = {
        "atoms": n, "us_per_md_step": round(slope * 1e6, 1)}
    return model, params, n, t


def sec_md_ensemble(jax, md_ctx):
    """Replica-ensemble throughput through the deployable ScannedMD driver
    (64 x 21-atom molecules in one disjoint batch per scanned segment)."""
    from gcnn_keras_tpu.moldyn.trajectory import ScannedMD

    model, params, n, t = md_ctx
    systems = [_md_system(np.random.RandomState(100 + s), n, t)
               for s in range(64)]
    md = ScannedMD(model, params, dt=5e-4, segment_steps=500,
                   max_distance=4.0, max_neighbours=25)
    md.run_ensemble(systems, n_segments=1)  # compile + warm
    t0 = time.perf_counter()
    md.run_ensemble(systems, n_segments=4)
    dt_ens = (time.perf_counter() - t0) / (4 * 500)
    RECORD["md_schnet_21atom"]["ensemble_replicas"] = 64
    RECORD["md_schnet_21atom"]["us_per_replica_step"] = round(
        dt_ens / 64 * 1e6, 2)


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    import jax
    # persistent compile cache: repeat bench runs skip the ~4 min compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax
    jax.devices()  # force backend/tunnel init so the mark is honest
    _mark("jax_ready")

    # Priority order; est_cost_s are conservative COLD-compile costs
    # through the tunneled v5e (warm cache: each runs in seconds).
    schnet_ctx = _section("schnet_step", 0, sec_schnet_step, jax, jnp, optax)
    if schnet_ctx is not None:
        _section("schnet_scan", 120, sec_schnet_scan, jax, schnet_ctx)
    _section("hbm_measured", 15, sec_hbm_measured, jax, jnp)
    if schnet_ctx is not None:
        _section("hbm_traffic", 45, sec_hbm_traffic, jax, schnet_ctx)
    hdnnp_ctx = _section("hdnnp_step", 150, sec_hdnnp_step, jax, jnp, optax)
    if hdnnp_ctx is not None:
        _section("hdnnp_scan", 110, sec_hdnnp_scan, jax, hdnnp_ctx)
        _section("hdnnp_qeq", 40, sec_hdnnp_qeq, jax, jnp, hdnnp_ctx)
    _section("painn", 130, sec_painn, jax, jnp, optax)
    _section("hdnnp2nd", 130, sec_hdnnp2nd, jax, jnp, optax)
    _section("gcn_cora", 60, sec_gcn_cora, jax, jnp, optax)
    md_ctx = _section("md_single", 130, sec_md_single, jax, jnp)
    if md_ctx is not None:
        _section("md_ensemble", 110, sec_md_ensemble, jax, md_ctx)
    _section("hdnnp_large_mol", 130, sec_hdnnp_large_mol, jax, jnp, optax)
    _section("hdnnp_giant_mol", 150, sec_hdnnp_giant_mol, jax, jnp, optax)

    RECORD["status"] = "complete" if all(
        str(v).startswith("ok") for v in RECORD["sections"].values()) \
        else "partial"
    RECORD["elapsed_s"] = round(time.monotonic() - _T0, 1)
    _emit_once()


if __name__ == "__main__":
    main()
