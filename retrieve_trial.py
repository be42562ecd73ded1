"""Extract a search trial's hyperparameters (parity: reference
``retrieve_trial.py``, 419 LoC)."""
from __future__ import annotations

import argparse
import json

from gcnn_keras_tpu.training.hyper_search import retrieve_trial


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--directory", default="hyp_search_hdnnp4th")
    ap.add_argument("--trial-id", type=int, default=None,
                    help="default: the best trial")
    args = ap.parse_args()
    trial = retrieve_trial(args.directory, args.trial_id)
    print(json.dumps(trial, indent=2))


if __name__ == "__main__":
    main()
