"""Config system, run-dir management, misc utilities."""

from .config import parse_args, load_config, flatten_args  # noqa: F401
