"""Word-timestamp alignment tests: DTW on synthetic matrices + end-to-end on
the tiny random model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speaksense_tpu.models import align as AL
from speaksense_tpu.models import whisper as W
from speaksense_tpu.models.tokenizer import Tokenizer

DIMS = W.WhisperDims(
    n_mels=80, n_vocab=51865, n_audio_ctx=1500, n_audio_state=64,
    n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
    n_text_head=4, n_text_layer=2)


def test_dtw_identity_diagonal():
    # strong diagonal -> path follows it
    N = 6
    cost = np.ones((N, N))
    np.fill_diagonal(cost, 0.0)
    ti, fi = AL.dtw_path(cost)
    assert ti[0] == 0 and fi[0] == 0
    assert ti[-1] == N - 1 and fi[-1] == N - 1
    on_diag = sum(1 for a, b in zip(ti, fi) if a == b)
    assert on_diag >= N  # path visits every diagonal cell


def test_dtw_monotonic():
    rng = np.random.default_rng(0)
    cost = rng.random((5, 20))
    ti, fi = AL.dtw_path(cost)
    assert (np.diff(ti) >= 0).all() and (np.diff(fi) >= 0).all()
    assert ti[-1] == 4 and fi[-1] == 19


def test_median_filter():
    x = np.asarray([[1.0, 100.0, 1.0, 1.0, 1.0, 100.0, 1.0]])
    y = AL._median_filter(x, 3)
    assert y.shape == x.shape
    assert y[0, 1] == 1.0  # spike removed


def test_split_words_spaces_and_cjk():
    vocab = [b"Hel", b"lo", b" wor", b"ld", b"\xe4\xbd\xa0", b"\xe5\xa5\xbd"]
    tok = Tokenizer(vocab=vocab, n_vocab=51865, multilingual=True, num_languages=99)
    words = AL._split_words(tok, [0, 1, 2, 3], "en")
    assert [w for w, _ in words] == ["Hello", " world"]
    words_zh = AL._split_words(tok, [4, 5], "zh")
    assert [w for w, _ in words_zh] == ["你", "好"]


def test_word_timestamps_end_to_end(rng):
    params = W.init_params(DIMS, jax.random.PRNGKey(0))
    tok = Tokenizer.synthetic(DIMS.n_vocab)
    mel = jnp.asarray(rng.standard_normal((1, 3000, DIMS.n_mels)), jnp.float32)
    enc = W.encode(params, DIMS, mel)
    tokens = [tok.ts_begin, 100, 200, 300, tok.ts_begin + 150, tok.eot]
    words = AL.word_timestamps(params, DIMS, tok, tokens, enc,
                               language="en", audio_seconds=3.0, time_offset=10.0)
    assert words, "expected word entries"
    for w in words:
        assert 10.0 <= w["start"] <= w["end"] <= 13.1
    # monotone across words
    starts = [w["start"] for w in words]
    assert starts == sorted(starts)


def test_dtw_wavefront_matches_scalar_reference(rng):
    """The anti-diagonal vectorized DTW must reproduce the scalar dynamic
    program exactly (same costs, same tie-break priority)."""
    from speaksense_tpu.models.align import dtw_path

    def scalar_dtw(cost):
        N, M = cost.shape
        D = np.full((N + 1, M + 1), np.inf)
        D[0, 0] = 0.0
        trace = np.zeros((N + 1, M + 1), np.int8)
        for i in range(1, N + 1):
            for j in range(1, M + 1):
                c0, c1, c2 = D[i - 1, j - 1], D[i - 1, j], D[i, j - 1]
                if c0 <= c1 and c0 <= c2:
                    best, t = c0, 0
                elif c1 <= c2:
                    best, t = c1, 1
                else:
                    best, t = c2, 2
                D[i, j] = cost[i - 1, j - 1] + best
                trace[i, j] = t
        i, j = N, M
        ti, fi = [], []
        while i > 0 and j > 0:
            ti.append(i - 1)
            fi.append(j - 1)
            t = trace[i, j]
            if t == 0:
                i, j = i - 1, j - 1
            elif t == 1:
                i -= 1
            else:
                j -= 1
        return np.asarray(ti[::-1]), np.asarray(fi[::-1])

    for shape in ((1, 1), (3, 7), (20, 33), (50, 120)):
        cost = rng.standard_normal(shape).astype(np.float32)
        ti_v, fi_v = dtw_path(cost)
        ti_s, fi_s = scalar_dtw(cost)
        np.testing.assert_array_equal(ti_v, ti_s)
        np.testing.assert_array_equal(fi_v, fi_s)
    # ties too (quantized costs force equal-cost alternatives)
    cost = np.round(rng.standard_normal((12, 18)) * 2) / 2
    ti_v, fi_v = dtw_path(cost)
    ti_s, fi_s = scalar_dtw(cost)
    np.testing.assert_array_equal(ti_v, ti_s)
    np.testing.assert_array_equal(fi_v, fi_s)
