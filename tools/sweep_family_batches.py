"""Batch-size saturation sweep for any bench family (the r5 instrument
behind the PAiNN 128->256 and flagship 128/256 records).

Usage: python tools/sweep_family_batches.py [schnet|painn|hdnnp4th] [sizes...]
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

    from bench import _mols, _ef_train_step, _family_record
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.model.force import EnergyForceModel

    family = sys.argv[1] if len(sys.argv) > 1 else "painn"
    sizes = [int(a) for a in sys.argv[2:]] or [128, 256, 512]

    for n_mols in sizes:
        rs = np.random.RandomState(4)
        with_esp = family == "hdnnp4th"
        batch = batch_graphs(_mols(rs, n_mols, with_esp=with_esp),
                             global_keys=("energy",) if not with_esp
                             else ("energy", "total_charge"))
        n_edges = int(np.asarray(batch.edge_mask).sum())

        if family == "painn":
            from gcnn_keras_tpu.models.painn import make_model
            model = make_model(
                depth=3, conv_args={"units": 128, "cutoff": 5.0},
                update_args={"units": 128},
                input_embedding={"node": {"output_dim": 128}},
                bessel_basis={"num_radial": 20, "cutoff": 5.0},
                output_mlp={"units": [128, 1],
                            "activation": ["swish", "linear"]})
            fmodel = EnergyForceModel(model)
        elif family == "schnet":
            from gcnn_keras_tpu.models.schnet import make_model
            fmodel = EnergyForceModel(make_model())
        elif family == "hdnnp4th":
            from gcnn_keras_tpu.models.hdnnp4th import make_model_behler
            elements = [1, 6, 7, 8, 9]
            model = make_model_behler(
                g2_kwargs={"eta": [0.0, 0.3], "rs": [0.0, 3.0], "rc": 4.0,
                           "elements": elements},
                g4_kwargs={"eta": [0.0, 0.3], "lamda": [-1.0, 1.0],
                           "rc": 4.0, "zeta": [1.0, 8.0],
                           "elements": elements, "multiplicity": 2.0},
                mlp_charge_kwargs={"units": [64, 64, 1],
                                   "num_relations": 10,
                                   "activation": ["swish", "swish",
                                                  "linear"]},
                mlp_local_kwargs={"units": [64, 64, 1],
                                  "num_relations": 10,
                                  "activation": ["swish", "swish",
                                                 "linear"]})
            fmodel = EnergyForceModel(model, use_esp_coupling=True)
        else:
            raise SystemExit(f"unknown family {family}")

        step_fn, args = _ef_train_step(jax, optax, fmodel, batch)
        rec = _family_record(jax, step_fn, args, n_edges)
        rec.update(n_mols=n_mols, n_edges=n_edges, family=family)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
