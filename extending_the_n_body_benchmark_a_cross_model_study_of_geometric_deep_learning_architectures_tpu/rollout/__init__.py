"""Self-feed autoregressive rollout as a single on-device ``lax.scan``."""

from .self_feed import make_rollout_fn, run_self_feed  # noqa: F401
