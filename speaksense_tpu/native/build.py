"""Build the native kernel library with g++ (no pybind11 — plain C ABI)."""

from __future__ import annotations

import logging
import shutil
import subprocess
from pathlib import Path

log = logging.getLogger(__name__)

SRC_DIR = Path(__file__).parent
LIB_NAME = "libspeaksense_native.so"


def lib_path() -> Path:
    return SRC_DIR / LIB_NAME


def build(force: bool = False) -> Path | None:
    """Compile ggml_kernels.cc -> .so; returns the path or None on failure."""
    out = lib_path()
    src = SRC_DIR / "ggml_kernels.cc"
    if out.exists() and not force and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    gxx = shutil.which("g++")
    if gxx is None:
        log.info("g++ not found; native kernels disabled")
        return None
    cmd = [gxx, "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           str(src), "-o", str(out)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        log.info("built native kernels: %s", out)
        return out
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired) as e:
        err = getattr(e, "stderr", b"") or b""
        log.warning("native build failed (falling back to numpy): %s", err[-400:])
        return None
