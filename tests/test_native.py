"""Native C++ kernels: build + numerics parity with the numpy codecs."""

import numpy as np
import pytest

from speaksense_tpu.ckpt import ggml as G
from speaksense_tpu.native import dequantize_native, native_available, pcm16_to_f32_native

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


@pytest.mark.parametrize("ttype", [G.F16, G.Q4_0, G.Q4_1, G.Q5_0, G.Q5_1, G.Q8_0])
def test_native_matches_numpy(ttype, rng):
    x = rng.standard_normal(32 * 4096).astype(np.float32)
    blob = G.quantize(x, ttype)
    ref = G.dequantize(blob, ttype, x.size, use_native=False)
    got = dequantize_native(blob, ttype, x.size)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_native_multithreaded_large(rng):
    x = rng.standard_normal(32 * 40000).astype(np.float32)  # >1024 blocks
    blob = G.quantize(x, G.Q5_1)
    ref = G.dequantize(blob, G.Q5_1, x.size, use_native=False)
    got = dequantize_native(blob, G.Q5_1, x.size, nthreads=8)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_pcm16_native(rng):
    pcm = (rng.integers(-32768, 32767, 10001)).astype(np.int16)
    got = pcm16_to_f32_native(pcm.tobytes())
    np.testing.assert_allclose(got, pcm.astype(np.float32) / 32768.0, atol=1e-7)


import pytest


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["address", "thread"])
def test_native_kernels_sanitizer_clean(kind, tmp_path):
    """ASAN+UBSAN and TSAN runs of the native kernels, covering the threaded
    block paths (SURVEY.md §5 sanitizer bar; VERDICT r1 item 10)."""
    import shutil as _sh

    from speaksense_tpu.native.build import build_sanitizer

    if _sh.which("g++") is None:
        pytest.skip("g++ unavailable")
    out = build_sanitizer(kind)
    assert out is not None
    out.unlink(missing_ok=True)  # don't leave binaries in the package dir
