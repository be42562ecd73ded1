"""Regenerate the results README table from score files (parity: reference
``training/results/summary.py``)."""
from __future__ import annotations

import glob
import os

from gcnn_keras_tpu.training.history import load_history_score


def main(results_dir: str = "results", out_file: str = "results/README.md"):
    rows = []
    for path in sorted(glob.glob(os.path.join(results_dir, "**", "*_score.yaml"),
                                 recursive=True)) + \
            sorted(glob.glob(os.path.join(results_dir, "**", "*_score.json"),
                             recursive=True)):
        try:
            score = load_history_score(path)
        except Exception:
            continue
        metric_keys = [k for k in score if k.endswith("_mean")]
        metrics = ", ".join(f"{k[:-5]}: {score[k]:.4g} ± {score.get(k[:-5] + '_std', 0):.2g}"
                            for k in sorted(metric_keys))
        rows.append((score.get("dataset_name", "?"), score.get("model_name", "?"),
                     metrics, score.get("date_time", "")))
    lines = ["# Results\n", "| Dataset | Model | Metrics | Date |",
             "|---|---|---|---|"]
    for r in rows:
        lines.append("| " + " | ".join(str(x) for x in r) + " |")
    # preserve the auto-maintained head-to-head section
    # (tools/headtohead/summarize.py) across regenerations
    extra = ""
    if os.path.exists(out_file):
        with open(out_file) as f:
            old = f.read()
        begin = old.find("<!-- headtohead:begin -->")
        end = old.find("<!-- headtohead:end -->")
        if begin >= 0 and end >= 0:
            extra = "\n" + old[begin:end + len("<!-- headtohead:end -->")] + "\n"
    os.makedirs(os.path.dirname(out_file) or ".", exist_ok=True)
    with open(out_file, "w") as f:
        f.write("\n".join(lines) + "\n" + extra)
    print(f"wrote {out_file} with {len(rows)} rows")


if __name__ == "__main__":
    main()
