"""Native (C++) host-side kernels with a ctypes bridge."""

from .build import build, library_path  # noqa: F401
