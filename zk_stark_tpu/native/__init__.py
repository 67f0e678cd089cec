"""Loader for the native C++ runtime module (zkstark_native).

Compiles native/zkstark_native.cpp on first use (g++ available in the image)
and caches the shared object next to the source.  Falls back to ``None`` if
compilation fails — all call sites keep a pure-Python path.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import sysconfig

_NATIVE = None
_TRIED = False


def _source_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native"
    )


def _build(src: str, out: str) -> bool:
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        f"-I{include}",
        src,
        "-o",
        out,
        "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, OSError):
        return False


def get() -> object | None:
    """Returns the loaded native module, building it if necessary."""
    global _NATIVE, _TRIED
    if _TRIED:
        return _NATIVE
    _TRIED = True
    src_dir = _source_dir()
    src = os.path.join(src_dir, "zkstark_native.cpp")
    if not os.path.exists(src):
        return None
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(src_dir, f"zkstark_native{suffix}")
    if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
        if not _build(src, out):
            return None
    try:
        spec = importlib.util.spec_from_file_location("zkstark_native", out)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _NATIVE = mod
    except Exception:
        _NATIVE = None
    return _NATIVE
