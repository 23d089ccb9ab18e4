"""Metrics logging: JSONL run logs (the wandb-equivalent observability layer).

The reference logs per-epoch loss dicts to wandb (reference train.py:202-258,
main.py:22; `WANDB_MODE=disabled` is its documented opt-out). This framework
has no network dependency: a `MetricsLogger` appends one JSON object per step
to runs/{name}/metrics.jsonl (plus a params.json snapshot), which covers the
same workflow (post-hoc plotting, run comparison) hermetically. If wandb IS
installed and SODT_WANDB=1, it mirrors every log call there.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, name: str, config: Optional[Dict[str, Any]] = None,
                 root: str = "runs"):
        self.dir = os.path.join(root, name)
        os.makedirs(self.dir, exist_ok=True)
        self._f = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        self._step = 0
        self._t0 = time.time()
        if config is not None:
            # serialize EVERY config entry (default=str covers lists/arrays/
            # paths) — dropping non-scalars made runs differing only in a
            # list-valued flag indistinguishable post-hoc
            with open(os.path.join(self.dir, "params.json"), "w") as f:
                json.dump(dict(config), f, indent=2, default=str)
        self._wandb = None
        if os.environ.get("SODT_WANDB") == "1":
            try:
                import wandb

                wandb.init(project=os.environ.get("SODT_WANDB_PROJECT", "sodt"),
                           name=name, config=config)
                self._wandb = wandb
            except Exception:
                self._wandb = None

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        if step is None:
            step = self._step
        self._step = step + 1
        rec = {"step": step, "t": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = str(v)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def finish(self) -> None:
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()


def load_metrics(name: str, root: str = "runs"):
    """Read a run's metrics.jsonl back as a list of dicts."""
    path = os.path.join(root, name, "metrics.jsonl")
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
