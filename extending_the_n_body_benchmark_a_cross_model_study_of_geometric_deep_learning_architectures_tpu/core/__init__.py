"""Core building blocks: Scene struct, physics integrator, dense graph ops."""

from .scene import Scene  # noqa: F401
from . import physics  # noqa: F401
from . import graph  # noqa: F401
