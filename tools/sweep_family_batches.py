"""Batch-size saturation sweep for any bench family (the r5 instrument
behind the PAiNN 128->256 and flagship 128/256 records).

Usage: python tools/sweep_family_batches.py [schnet|painn|hdnnp4th|hdnnp2nd] [sizes...]
Prints one JSON line per size (scan ground truth). Note the shared
E+F loss (no charge term), so hdnnp4th numbers here are sweep-relative,
not the bench flagship record (which trains 50q+1E+200F).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import optax

    from bench import (_mols, _ef_train_step, _family_record,
                       bench_painn_model, bench_hdnnp4th_model,
                       bench_hdnnp2nd_model)
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.model.force import EnergyForceModel

    family = sys.argv[1] if len(sys.argv) > 1 else "painn"
    sizes = [int(a) for a in sys.argv[2:]] or [128, 256, 512]

    for n_mols in sizes:
        rs = np.random.RandomState(4)
        with_esp = family in ("hdnnp4th", "hdnnp2nd")  # builds angles
        batch = batch_graphs(_mols(rs, n_mols, with_esp=with_esp),
                             global_keys=("energy", "total_charge")
                             if family == "hdnnp4th" else ("energy",))
        n_edges = int(np.asarray(batch.edge_mask).sum())

        # model configs come from bench.py's shared builders so the
        # sweep measures exactly the bench sections' models
        if family == "painn":
            fmodel = EnergyForceModel(bench_painn_model())
        elif family == "schnet":
            from gcnn_keras_tpu.models.schnet import make_model
            fmodel = EnergyForceModel(make_model())
        elif family == "hdnnp4th":
            fmodel = EnergyForceModel(bench_hdnnp4th_model(),
                                      use_esp_coupling=True)
        elif family == "hdnnp2nd":
            fmodel = EnergyForceModel(bench_hdnnp2nd_model())
        else:
            raise SystemExit(f"unknown family {family}")

        step_fn, args = _ef_train_step(jax, optax, fmodel, batch)
        rec = _family_record(jax, step_fn, args, n_edges)
        rec.update(n_mols=n_mols, n_edges=n_edges, family=family)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
