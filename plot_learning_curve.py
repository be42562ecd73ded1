"""Plot learning curves from score/history files (parity: reference
``plot_learning_curve.py`` + KGCNNPlot.py)."""
from __future__ import annotations

import argparse
import glob

from gcnn_keras_tpu.training.history import load_history_score
from gcnn_keras_tpu.utils.plots import plot_train_test_loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scores", default="results/**/*_score.yaml")
    ap.add_argument("--metric", default="loss")
    ap.add_argument("--out", default="results/plots")
    args = ap.parse_args()

    for path in glob.glob(args.scores, recursive=True):
        score = load_history_score(path)
        # score files store last-epoch values; for curves use raw histories
        # when present, else plot the per-fold final values as bars
        hist_keys = [k for k in score if isinstance(score.get(k), list)
                     and k.endswith(args.metric)]
        hists = [{args.metric: score[k]} for k in hist_keys]
        if hists:
            plot_train_test_loss(
                hists, loss_name=args.metric,
                model_name=score.get("model_name", ""),
                dataset_name=score.get("dataset_name", ""),
                filepath=args.out,
                file_name=path.replace("/", "_") + ".png")
            print(f"plotted {path}")


if __name__ == "__main__":
    main()
