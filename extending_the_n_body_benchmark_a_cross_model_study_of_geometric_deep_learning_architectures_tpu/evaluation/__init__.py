"""Post-hoc checkpoint evaluation: KS ranking, GT-GT baselines, reports."""

from .ks_checkpoints import (  # noqa: F401
    evaluate_run_checkpoints,
    gt_baseline_pvalues,
    load_checkpoint_pvalues,
)
