"""Native (C++) runtime components, loaded via ctypes.

The TPU compute path is JAX/XLA/Pallas; host-side runtime pieces that
the reference implements in C++ (AMReX) get native twins here.  Each
component builds lazily with g++ -O3 -fopenmp on first use and caches
the shared object next to the source; a Python fallback is always
available, so the build is best-effort.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_lock = threading.Lock()
_libs = {}


def load(name: str):
    """Build (if needed) and load native/<name>.cpp -> lib<name>.so.
    Returns the ctypes CDLL or None if the toolchain is unavailable."""
    with _lock:
        if name in _libs:
            return _libs[name]
        here = os.path.dirname(__file__)
        src = os.path.join(here, f"{name}.cpp")
        so = os.path.join(here, f"lib{name}.so")
        if not os.path.exists(so) or \
                os.path.getmtime(so) < os.path.getmtime(src):
            cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared",
                   "-fPIC", "-o", so, src]
            try:
                subprocess.run(cmd, check=True, capture_output=True)
            except Exception:
                _libs[name] = None
                return None
        try:
            _libs[name] = ctypes.CDLL(so)
        except OSError:
            _libs[name] = None
        return _libs[name]
