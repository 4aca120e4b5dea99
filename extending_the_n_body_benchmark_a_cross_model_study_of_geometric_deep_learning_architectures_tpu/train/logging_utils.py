"""Experiment logging: JSONL metric stream + optional wandb/TensorBoard.

The reference logs straight to wandb (``trainer.py:543-597``).  wandb is not
assumed available here; the primary sink is an append-only
``metrics.jsonl`` in the run dir using the same namespaced keys
(``train/*``, ``valid/*``, ``self_feed/*`` with ``*/step`` step metrics) so
dashboards and the KS tooling can replay runs.  If wandb *is* importable and
``WANDB_API_KEY`` is set, it mirrors transparently.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, run_dir: str, use_wandb: Optional[bool] = None):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, "metrics.jsonl")
        self._wandb = None
        if use_wandb is None:
            use_wandb = bool(os.environ.get("WANDB_API_KEY"))
        if use_wandb:
            try:
                import wandb

                # the reference persists the run id into a `wandb_id` file
                # and reuses it with resume="allow" so a resumed training
                # continues the SAME wandb run (``trainer.py:543-570``)
                id_path = os.path.join(run_dir, "wandb_id")
                run_id = None
                if os.path.exists(id_path):
                    with open(id_path) as f:
                        run_id = f.read().strip() or None
                self._wandb = wandb.init(
                    project=os.getenv("WANDB_PROJECT", "nbody"),
                    name=os.getenv("WANDB_NAME", run_dir),
                    id=run_id,
                    resume="allow",
                )
                if self._wandb is not None:
                    with open(id_path, "w") as f:
                        f.write(str(self._wandb.id))
            except Exception:
                self._wandb = None

    def log(self, payload: Dict[str, Any], commit: bool = True) -> None:
        record = {"_time": time.time()}
        for k, v in payload.items():
            try:
                record[k] = float(v)
            except (TypeError, ValueError):
                record[k] = v
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self._wandb is not None:
            try:
                self._wandb.log(payload, commit=commit)
            except Exception:
                pass

    def alert(self, title: str, text: str) -> None:
        self.log({"alert/title": title, "alert/text": text})
        if self._wandb is not None:
            try:
                self._wandb.alert(title=title, text=text)
            except Exception:
                pass

    def finish(self) -> None:
        if self._wandb is not None:
            try:
                self._wandb.finish()
            except Exception:
                pass


class RunningMean:
    """Minimal torchmetrics.MeanMetric equivalent (``trainer.py:122-153``)."""

    def __init__(self):
        self.total = 0.0
        self.count = 0

    def update(self, value) -> None:
        self.total += float(value)
        self.count += 1

    def compute(self) -> float:
        return self.total / self.count if self.count else float("nan")

    def reset(self) -> None:
        self.total, self.count = 0.0, 0
