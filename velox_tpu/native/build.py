"""On-demand native build + ctypes loader.

Role parity: the reference's CMake-built C++ core. Here the native pieces
are small C++ translation units compiled once per source hash into a cache
directory and loaded via ctypes — no pip/pybind11 dependency.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading
from pathlib import Path
from typing import Optional

_DIR = Path(__file__).resolve().parent
_CACHE = _DIR / "_build"
_LOCK = threading.Lock()
_LOADED = {}


def _compiler() -> Optional[str]:
    for cc in ("g++", "clang++", "c++"):
        try:
            subprocess.run([cc, "--version"], capture_output=True,
                           check=True)
            return cc
        except Exception:
            continue
    return None


def load_native(name: str = "dbgen") -> Optional[ctypes.CDLL]:
    """Compile (if needed) and load velox_tpu/native/<name>.cpp.

    Returns None when no compiler is available — callers fall back to the
    pure-python path.
    """
    with _LOCK:
        if name in _LOADED:
            return _LOADED[name]
        src = _DIR / f"{name}.cpp"
        code = src.read_bytes()
        tag = hashlib.sha256(code).hexdigest()[:16]
        out = _CACHE / f"{name}-{tag}.so"
        if not out.exists():
            cc = _compiler()
            if cc is None:
                _LOADED[name] = None
                return None
            _CACHE.mkdir(exist_ok=True)
            tmp = out.with_suffix(".so.tmp")
            cmd = [cc, "-O3", "-std=c++17", "-shared", "-fPIC",
                   "-pthread", "-o", str(tmp), str(src)]
            try:
                subprocess.run(cmd, check=True, capture_output=True)
            except subprocess.CalledProcessError as e:
                sys.stderr.write(
                    f"[velox_tpu.native] build of {name} failed:\n"
                    f"{e.stderr.decode()[:2000]}\n")
                _LOADED[name] = None
                return None
            os.replace(tmp, out)
        lib = ctypes.CDLL(str(out))
        _LOADED[name] = lib
        return lib
