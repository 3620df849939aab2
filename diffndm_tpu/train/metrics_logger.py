"""File-backed structured metrics logger.

The reference logs through wandb via Lightning (train.py:122-135,
lightning_modules.py:382-421).  wandb is not in this image, and a training
run must not depend on an external service anyway, so this logger writes
the same metric stream to disk:

- ``metrics.jsonl`` — one JSON object per log call
  {"step": int, "epoch": int, "split": "train|val|test", **metrics};
- console one-liners for the same events.

Any wandb-style consumer can tail the JSONL; keys follow the reference's
``<split>/<name>`` convention (lightning_modules.py:382-384).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, outdir: str, filename: str = "metrics.jsonl",
                 echo: bool = True):
        os.makedirs(outdir, exist_ok=True)
        self.path = os.path.join(outdir, filename)
        self.echo = echo
        self._t0 = time.time()
        self._fh = open(self.path, "a", buffering=1)

    def log(self, metrics: Dict[str, float], step: int,
            epoch: Optional[int] = None, split: str = "train") -> None:
        rec = {"step": int(step), "split": split,
               "time": round(time.time() - self._t0, 2)}
        if epoch is not None:
            rec["epoch"] = int(epoch)
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self._fh.write(json.dumps(rec) + "\n")
        if self.echo:
            body = " ".join(
                f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                for k, v in rec.items()
                if k not in ("step", "split", "time", "epoch"))
            print(f"[{split} step={step}"
                  + (f" epoch={rec['epoch']}" if "epoch" in rec else "")
                  + f"] {body}")

    def close(self) -> None:
        self._fh.close()
