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


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("reports", nargs="+",
                   help="label=report.txt pairs (e.g. origin=o.txt "
                        "SPSA=s.txt)")
    p.add_argument("--outdir", type=str, required=True)
    args = p.parse_args(argv)

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
