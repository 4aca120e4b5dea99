"""Macro-property kernels + KS/Fisher statistical scoring."""

from . import macros  # noqa: F401
from . import ks  # noqa: F401
from . import artifacts  # noqa: F401
