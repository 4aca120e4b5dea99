#!/usr/bin/env python
"""Block until the JAX accelerator backend is healthy (or a deadline).

Operational helper for unattended runs on remote-TPU tunnels: backend init
can hang ~25 min before raising UNAVAILABLE when the tunnel drops, so
launcher scripts should gate training on this probe instead of letting the
trainer burn its timeout budget in a hung init.

Usage:
    python scripts/wait_for_tpu.py [--max-wait 3600] [--probe-timeout 90]
                                   [--poll 60] [--platform tpu]
Exit code 0 = healthy, 1 = deadline elapsed.

Reference analogue: ``utils/gpu_selector.py`` polling nvidia-smi for a
usable GPU before training.
"""
from __future__ import annotations

import argparse
import sys

from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.utils.device import (
    wait_for_backend,
)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--max-wait", type=float, default=3600.0,
                    help="seconds to keep retrying before giving up")
    ap.add_argument("--probe-timeout", type=float, default=90.0,
                    help="per-probe subprocess timeout (s)")
    ap.add_argument("--poll", type=float, default=60.0,
                    help="sleep between probes (s)")
    ap.add_argument("--platform", type=str, default=None,
                    help="restrict the probe to a platform (e.g. tpu, cpu)")
    args = ap.parse_args()
    ok = wait_for_backend(
        max_wait_s=args.max_wait,
        probe_timeout_s=args.probe_timeout,
        poll_s=args.poll,
        platform=args.platform,
        verbose=True,
    )
    if ok:
        print("backend healthy")
        return 0
    print("backend still unavailable at deadline", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
