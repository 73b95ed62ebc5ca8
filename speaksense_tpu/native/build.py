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


def build_sanitizer(kind: str = "address") -> Path | None:
    """Build + run the sanitizer harness (sanitize_test.cc) against the
    kernels. kind: 'address' (ASAN+UBSAN) or 'thread' (TSAN). Returns the
    binary path on a clean run, raises on sanitizer findings, None if g++
    is unavailable. SURVEY.md §5: TSAN/ASAN-clean in CI."""
    gxx = shutil.which("g++")
    if gxx is None:
        log.info("g++ not found; sanitizer run skipped")
        return None
    san = "address,undefined" if kind == "address" else "thread"
    out = SRC_DIR / f"sanitize_{kind}"
    cmd = [gxx, f"-fsanitize={san}", "-g", "-O1", "-std=c++17", "-pthread",
           str(SRC_DIR / "ggml_kernels.cc"), str(SRC_DIR / "sanitize_test.cc"),
           "-o", str(out)]
    subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    run = subprocess.run([str(out)], capture_output=True, timeout=300)
    if run.returncode != 0:
        raise RuntimeError(
            f"{kind} sanitizer run failed:\n"
            f"{run.stdout.decode()[-1000:]}\n{run.stderr.decode()[-3000:]}")
    return out
