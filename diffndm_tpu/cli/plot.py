"""Violin plots of per-task metric distributions (reference my_plot.py /
my_plot_inpaint.py): parse evaluation reports, one violin per variant."""

from __future__ import annotations

import argparse
import os
import re


def parse_report(path: str):
    """Parse diffndm_tpu.cli.evaluate output into per-file metric rows."""
    rows = []
    pat = re.compile(
        r"QED=([\d.]+) SA=([\d.]+) LogP=(-?[\d.]+) Lipinski=([\d.]+)")
    with open(path) as f:
        for line in f:
            if line.startswith("AGGREGATE"):
                continue
            m = pat.search(line)
            if m:
                rows.append(tuple(float(v) for v in m.groups()))
    return rows


def plot_curves(metrics_jsonl: str, outdir: str):
    """Training curves from the MetricsLogger stream: one panel per
    metric, train/val overlaid (the file-backed equivalent of the
    reference's wandb dashboard, train.py:122-135)."""
    import json

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    series = {}  # (split, key) -> (steps, values)
    with open(metrics_jsonl) as f:
        for line in f:
            rec = json.loads(line)
            for k, v in rec.items():
                if k in ("step", "split", "time", "epoch") or \
                        not isinstance(v, (int, float)):
                    continue
                series.setdefault((rec["split"], k), ([], []))
                series[(rec["split"], k)][0].append(rec["step"])
                series[(rec["split"], k)][1].append(v)
    keys = sorted({k for _, k in series})
    os.makedirs(outdir, exist_ok=True)
    for key in keys:
        fig, ax = plt.subplots(figsize=(5, 3.2))
        for split in ("train", "val", "test"):
            if (split, key) in series:
                xs, ys = series[(split, key)]
                ax.plot(xs, ys, marker="o", markersize=2, label=split)
        ax.set_xlabel("step")
        ax.set_ylabel(key)
        ax.legend()
        fig.tight_layout()
        out = os.path.join(outdir, f"curve_{key}.png")
        fig.savefig(out, dpi=120)
        plt.close(fig)
        print(f"wrote {out}")
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("reports", nargs="+",
                   help="label=report.txt pairs (e.g. origin=o.txt "
                        "SPSA=s.txt), or a single metrics.jsonl with "
                        "--curves")
    p.add_argument("--outdir", type=str, required=True)
    p.add_argument("--curves", action="store_true",
                   help="plot training curves from a metrics.jsonl "
                        "stream (train/val loss + every dashboard "
                        "metric over steps)")
    args = p.parse_args(argv)

    if args.curves:
        return plot_curves(args.reports[0], args.outdir)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    data = {}
    for spec in args.reports:
        label, path = spec.split("=", 1)
        data[label] = parse_report(path)
    os.makedirs(args.outdir, exist_ok=True)
    metrics = ["QED", "SA", "LogP", "Lipinski"]
    for mi, metric in enumerate(metrics):
        fig, ax = plt.subplots(figsize=(1.5 * len(data) + 2, 4))
        series = [np.array([r[mi] for r in rows]) or np.zeros(1)
                  for rows in data.values()]
        series = [s if len(s) else np.zeros(1) for s in series]
        ax.violinplot(series, showmeans=True)
        ax.set_xticks(range(1, len(data) + 1))
        ax.set_xticklabels(list(data))
        ax.set_title(metric)
        out = os.path.join(args.outdir, f"{metric.lower()}_violin.png")
        fig.savefig(out, dpi=120, bbox_inches="tight")
        plt.close(fig)
        print("wrote", out)


if __name__ == "__main__":
    main()
