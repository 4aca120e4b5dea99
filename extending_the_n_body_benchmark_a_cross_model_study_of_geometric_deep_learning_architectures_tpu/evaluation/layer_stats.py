"""Summarize per-layer activation statistics — role of the reference's
``scripts/summarize_layer_stats.py`` (explosion forensics over the
``layer_stats.jsonl`` emitted when ``trainer.debug_layer_stats_every`` is
set; see docs/stability.md).

Pure-stdlib: reads the JSONL, reports per-layer max |activation| trends and
the first step at which any layer went non-finite.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional


def load_layer_stats(run_dir: str) -> List[dict]:
    path = os.path.join(run_dir, "layer_stats.jsonl")
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def summarize(records: List[dict]) -> Dict:
    """Per-layer summary: peak |act|, last std, first NaN/Inf step."""
    layers: Dict[str, Dict] = {}
    first_bad: Optional[int] = None
    first_bad_layer: Optional[str] = None
    for rec in records:
        step = rec.get("step", -1)
        for key, val in rec.items():
            if not key.startswith("debug/"):
                continue
            name, _, stat = key[len("debug/"):].rpartition(".")
            entry = layers.setdefault(name, {"absmax_peak": 0.0, "absmax_last": 0.0,
                                             "std_last": 0.0, "first_nan_step": None})
            if stat == "absmax":
                entry["absmax_peak"] = max(entry["absmax_peak"], val)
                entry["absmax_last"] = val
            elif stat == "std":
                entry["std_last"] = val
            elif stat == "nan_or_inf" and val:
                if entry["first_nan_step"] is None:
                    entry["first_nan_step"] = step
                if first_bad is None or step < first_bad:
                    first_bad, first_bad_layer = step, name
    return {
        "layers": layers,
        "first_nan_step": first_bad,
        "first_nan_layer": first_bad_layer,
        "num_records": len(records),
    }


def main(argv=None):  # pragma: no cover - thin CLI
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("run_dir")
    p.add_argument("--top", type=int, default=10, help="layers by peak |act|")
    args = p.parse_args(argv)
    s = summarize(load_layer_stats(args.run_dir))
    print(f"{s['num_records']} stat records")
    if s["first_nan_step"] is not None:
        print(f"FIRST NaN/Inf: step {s['first_nan_step']} in {s['first_nan_layer']}")
    else:
        print("no NaN/Inf recorded")
    ranked = sorted(s["layers"].items(), key=lambda kv: -kv[1]["absmax_peak"])
    for name, e in ranked[: args.top]:
        flag = f"  NaN@{e['first_nan_step']}" if e["first_nan_step"] is not None else ""
        print(f"  {name}: peak|act| {e['absmax_peak']:.3g} "
              f"last|act| {e['absmax_last']:.3g} last std {e['std_last']:.3g}{flag}")


if __name__ == "__main__":  # pragma: no cover
    main()
