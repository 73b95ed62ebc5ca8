"""Sample-rate conversion to whisper's 16 kHz.

The reference uses rubato's windowed-sinc SincFixedIn (sinc_len 256,
BlackmanHarris2 — /root/reference/src/audio/mod.rs:235-251) per 4096-sample
chunk. We use scipy's polyphase resampler (Kaiser-windowed sinc) which is the
same class of filter, plus a stateful chunk resampler with filter-tail
carryover so streamed chunks are boundary-exact.
"""

from __future__ import annotations

import math

import numpy as np

try:
    from scipy.signal import resample_poly

    _HAVE_SCIPY = True
except ImportError:  # pragma: no cover
    _HAVE_SCIPY = False


def resample(x: np.ndarray, from_rate: int, to_rate: int) -> np.ndarray:
    """Whole-signal high-quality resample."""
    x = np.asarray(x, np.float32)
    if from_rate == to_rate or x.size == 0:
        return x
    if _HAVE_SCIPY:
        g = math.gcd(from_rate, to_rate)
        return resample_poly(x, to_rate // g, from_rate // g).astype(np.float32)
    return _linear_resample(x, from_rate, to_rate)


def _linear_resample(x: np.ndarray, from_rate: int, to_rate: int) -> np.ndarray:
    """Dependency-free fallback (linear interpolation)."""
    n_out = int(round(x.size * to_rate / from_rate))
    src = np.arange(n_out, dtype=np.float64) * from_rate / to_rate
    i0 = np.minimum(src.astype(np.int64), x.size - 1)
    i1 = np.minimum(i0 + 1, x.size - 1)
    frac = (src - i0).astype(np.float32)
    return (x[i0] * (1 - frac) + x[i1] * frac).astype(np.float32)


class ChunkResampler:
    """Stateful streaming resampler, boundary-exact with the whole-signal
    resample (the reference's SincFixedIn is likewise stateful across
    process() calls, mod.rs:235-258).

    Approach: outputs are only *finalized* once `context` samples of lookahead
    exist, and the retained buffer always starts on a multiple of the
    polyphase decimation factor so every call's output grid aligns exactly
    with the global one. Finalized outputs are therefore bit-identical to a
    one-shot resample except for filter startup at stream edges.
    """

    def __init__(self, from_rate: int, to_rate: int, context: int = 512):
        g = math.gcd(from_rate, to_rate)
        self.from_rate = from_rate
        self.to_rate = to_rate
        self.up = to_rate // g
        self.down = from_rate // g
        # align context up to a whole number of decimation blocks
        self.context = ((context + self.down - 1) // self.down) * self.down
        self._buf = np.zeros((0,), np.float32)
        self._in_start = 0        # global index of _buf[0]; always % down == 0
        self._emitted = 0         # global output samples emitted

    def _out_of_in(self, global_in: int) -> int:
        return global_in * self.up // self.down

    def process(self, chunk: np.ndarray) -> np.ndarray:
        chunk = np.asarray(chunk, np.float32)
        if self.from_rate == self.to_rate:
            return chunk
        self._buf = np.concatenate([self._buf, chunk])
        fin = ((self._buf.size - self.context) // self.down) * self.down
        if fin <= 0:
            return np.zeros((0,), np.float32)
        res = resample(self._buf, self.from_rate, self.to_rate)
        lo = self._emitted - self._out_of_in(self._in_start)
        hi = self._out_of_in(self._in_start + fin) - self._out_of_in(self._in_start)
        out = res[lo:hi]
        self._emitted += out.size
        drop = max(0, fin - self.context)
        self._buf = self._buf[drop:]
        self._in_start += drop
        return out

    def finish(self) -> np.ndarray:
        """Flush outputs held back for lookahead."""
        if self.from_rate == self.to_rate or self._buf.size == 0:
            return np.zeros((0,), np.float32)
        res = resample(self._buf, self.from_rate, self.to_rate)
        lo = self._emitted - self._out_of_in(self._in_start)
        out = res[lo:]
        self._emitted += out.size
        self._buf = np.zeros((0,), np.float32)
        return out
