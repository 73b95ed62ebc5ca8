"""Fused log-mel spectrogram as a single Pallas TPU kernel.

Replaces the chain gather->window->2 matmuls->power->mel->log10 from
audio/mel.py with one kernel: each grid step DMAs a tile of raw audio from
HBM into VMEM, builds its overlapping STFT frames with *static* slicing
(no gather), runs the windowed DFT + mel projection on the MXU, and writes
(frames_tile, n_mels) log-mel directly — intermediate (B, 3000, 201) power
spectra never touch HBM.

Frame construction trick: with n_fft=400 and hop=160, frame i spans sample
chunks [i, i+1, i+2) of width 160 (the last partially), so reshaping the
audio tile to (FT+2, 160) yields every frame as a concat of three static
slices — compiler-friendly, no dynamic indexing in the inner loop.

The final whisper normalization (global max-8 clamp, (x+4)/4) needs a
batch-global max, so it stays outside as trivially-fused elementwise ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from speaksense_tpu.audio import mel as MEL

FRAMES_PER_TILE = 250  # 3000 frames / 12 tiles
HOP = MEL.HOP_LENGTH   # 160
NFFT = MEL.N_FFT       # 400


def _kernel(audio_ref, cosb_ref, sinb_ref, filt_ref, out_ref, *, ft: int):
    b = pl.program_id(0)
    t = pl.program_id(1)

    def body(scratch, sem):
        start = t * ft * HOP
        copy = pltpu.make_async_copy(
            audio_ref.at[b, pl.ds(start, (ft + 2) * HOP)], scratch, sem)
        copy.start()
        copy.wait()
        chunks = scratch[:].reshape(ft + 2, HOP)
        # overlapping frames via static slices (400 = 160 + 160 + 80)
        frames = jnp.concatenate(
            [chunks[0:ft], chunks[1 : ft + 1], chunks[2 : ft + 2, : NFFT - 2 * HOP]],
            axis=1)  # (ft, 400)
        hi = jax.lax.Precision.HIGHEST
        re = jnp.dot(frames, cosb_ref[:], precision=hi, preferred_element_type=jnp.float32)
        im = jnp.dot(frames, sinb_ref[:], precision=hi, preferred_element_type=jnp.float32)
        power = re * re + im * im                      # (ft, n_bins)
        mel = jnp.dot(power, filt_ref[:], precision=hi, preferred_element_type=jnp.float32)
        out_ref[0] = jnp.log10(jnp.maximum(mel, 1e-10))

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM(((_ := (ft + 2) * HOP),), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnames=("n_mels", "num_frames", "interpret"))
def _log_mel_pallas(audio_padded: jax.Array, filters_t: jax.Array, n_mels: int,
                    num_frames: int, interpret: bool = False) -> jax.Array:
    B = audio_padded.shape[0]
    ft = FRAMES_PER_TILE if num_frames % FRAMES_PER_TILE == 0 else num_frames
    cos_b, sin_b = MEL._dft_basis()
    n_bins = cos_b.shape[1]

    grid = (B, num_frames // ft)
    log_mel = pl.pallas_call(
        functools.partial(_kernel, ft=ft),
        out_shape=jax.ShapeDtypeStruct((B, num_frames, n_mels), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # raw audio stays in HBM
            pl.BlockSpec((NFFT, n_bins), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NFFT, n_bins), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins, n_mels), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ft, n_mels), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(audio_padded, jnp.asarray(cos_b), jnp.asarray(sin_b), filters_t)

    max_val = jnp.max(log_mel, axis=(1, 2), keepdims=True)
    log_mel = jnp.maximum(log_mel, max_val - 8.0)
    return (log_mel + 4.0) / 4.0


def log_mel_spectrogram_pallas(audio, n_mels: int = 80, filters: np.ndarray | None = None,
                               interpret: bool = False) -> jax.Array:
    """Drop-in for audio.mel.log_mel_spectrogram (pad_to_chunk semantics):
    (B?, n) f32 @16k -> (B, n_frames, n_mels)."""
    a = jnp.asarray(audio, jnp.float32)
    if a.ndim == 1:
        a = a[None, :]
    n = a.shape[-1]
    target = ((max(n, 1) + MEL.N_SAMPLES - 1) // MEL.N_SAMPLES) * MEL.N_SAMPLES
    if target != n:
        a = jnp.pad(a, ((0, 0), (0, target - n)))
    num_frames = target // HOP
    pad = NFFT // 2
    a = jnp.pad(a, ((0, 0), (pad, pad)), mode="reflect")
    if filters is None:
        filters = MEL.mel_filter_bank(n_mels)
    filters_t = jnp.asarray(np.ascontiguousarray(np.asarray(filters).T))  # (n_bins, n_mels)
    return _log_mel_pallas(a, filters_t, n_mels, num_frames, interpret=interpret)
