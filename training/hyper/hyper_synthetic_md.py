"""Hyperparameter configs for the energy+force workloads (parity style:
reference ``training/hyper/hyper_md17_revised.py`` — dict keyed by model
name with model/data/training sections)."""

hyper = {
    "Schnet": {
        "model": {
            "class_name": "make_model",
            "module_name": "Schnet",
            "config": {
                "depth": 4,
                "interaction_args": {"units": 128},
                "gauss_args": {"bins": 25, "distance_max": 5.0},
                "last_mlp": {"units": [128, 64],
                             "activation": ["shifted_softplus", "shifted_softplus"]},
                "output_mlp": {"units": [64, 1],
                               "activation": ["shifted_softplus", "linear"]},
            },
        },
        "data": {
            "dataset": {"class_name": "SyntheticMDDataset",
                        "config": {"num_frames": 256},
                        "methods": [{"map_list": {"method": "set_range",
                                                  "max_distance": 5.0,
                                                  "max_neighbours": 15}}]},
        },
        "training": {
            "fit": {"batch_size": 32, "epochs": 200},
            "compile": {"optimizer": {"class_name": "Adam",
                                      "config": {"learning_rate": 1e-3}},
                        "loss_weights": {"energy": 1.0, "force": 50.0}},
            "cross_validation": {"n_splits": 3},
            "scaler": {"class_name": "EnergyForceExtensiveLabelScaler"},
        },
    },
    "PAiNN": {
        "model": {
            "class_name": "make_model",
            "module_name": "PAiNN",
            "config": {
                "depth": 3,
                "conv_args": {"units": 128, "cutoff": 5.0},
                "update_args": {"units": 128},
                "input_embedding": {"node": {"output_dim": 128}},
                "bessel_basis": {"num_radial": 20, "cutoff": 5.0},
                "output_mlp": {"units": [128, 1], "activation": ["swish", "linear"]},
            },
        },
        "data": {
            "dataset": {"class_name": "SyntheticMDDataset",
                        "config": {"num_frames": 256},
                        "methods": [{"map_list": {"method": "set_range",
                                                  "max_distance": 5.0,
                                                  "max_neighbours": 15}}]},
        },
        "training": {
            "fit": {"batch_size": 32, "epochs": 200},
            "compile": {"optimizer": {"class_name": "Adam",
                                      "config": {"learning_rate": 1e-3}}},
            "scaler": {"class_name": "EnergyForceExtensiveLabelScaler"},
        },
    },
}
