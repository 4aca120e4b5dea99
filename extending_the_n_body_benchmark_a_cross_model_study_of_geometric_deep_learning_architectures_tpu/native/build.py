"""Build the native macro-kernel library (g++, no external build deps).

``python -m <pkg>.native.build`` compiles ``macro_kernels.cpp`` into
``libmacros.so`` next to the sources.  :func:`ensure_built` builds lazily on
first use (skipped when the .so is newer than the source); consumers degrade
to the NumPy implementations when no compiler is available.
"""

from __future__ import annotations

import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "macro_kernels.cpp")
_LIB = os.path.join(_DIR, "libmacros.so")


def library_path() -> str:
    return _LIB


def build(verbose: bool = False) -> str:
    # link to a per-process temp file and os.replace() it into place:
    # concurrent builders (pytest workers, parallel evals) or an interrupted
    # link must never leave a half-written .so at the final path — dlopen of
    # a truncated ELF crashes every later consumer
    tmp = f"{_LIB}.tmp.{os.getpid()}"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", tmp,
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True)
        if res.returncode != 0:
            raise RuntimeError(f"native build failed:\n{res.stderr}")
        os.replace(tmp, _LIB)  # atomic within the same directory
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    if verbose:
        print(f"built {_LIB}")
    return _LIB


def ensure_built() -> Optional[str]:
    """Build if missing/stale; return the .so path or None on failure."""
    try:
        if (
            os.path.exists(_LIB)
            and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)
        ):
            return _LIB
        return build()
    except Exception:
        return None


if __name__ == "__main__":
    build(verbose=True)
