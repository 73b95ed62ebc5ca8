"""Word-level timestamps via cross-attention alignment (DTW).

whisper.cpp's token_timestamps mode (enabled by the reference at
/root/reference/src/asr/whisper.rs:166 via set_token_timestamps(true)) uses
per-token timestamp heuristics; the higher-quality approach — used here — is
openai's alignment method: teacher-force the sampled tokens, collect
cross-attention weights from alignment heads, and dynamic-time-warp the
token-vs-audio-frame attention matrix into a monotonic path whose column
positions are 20 ms frames.

Without model-specific alignment-head masks (they ship inside OpenAI
checkpoints only), the standard fallback is used: all heads of the upper
half of decoder layers.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from speaksense_tpu.models import whisper as W
from speaksense_tpu.models.tokenizer import Tokenizer

FRAMES_PER_SECOND = 50  # encoder frames: 20 ms each

# languages written without spaces: each token becomes its own "word"
_NO_SPACE_LANGUAGES = {"zh", "ja", "th", "lo", "my", "yue"}


def cross_attention_weights(params, dims: W.WhisperDims, tokens: jax.Array,
                            enc_out: jax.Array) -> jax.Array:
    """Teacher-forced forward collecting cross-attn softmax weights.
    tokens (B, T) int32; enc_out (B, A, d). Returns (L, B, H, T, A) f32."""
    p = params["decoder"]
    B, T = tokens.shape
    dtype = p["tok_emb"].dtype
    n_head = dims.n_text_head

    x = p["tok_emb"][tokens] + p["pos"][:T][None].astype(dtype)
    causal = jnp.tril(jnp.ones((T, T), bool))[None, None]

    def block(x, bp):
        h = W._ln(x, bp["attn_ln"])
        q, k, v = W._qkv_proj(h, bp, n_head)
        x = x + W._linear(W._merge_heads(W._attention(q, k, v, causal)), bp["o"])
        h = W._ln(x, bp["cross_ln"])
        cq = W._split_heads(W._linear(h, bp["cq"]), n_head)
        ck = W._split_heads(W._linear(enc_out, bp["ck"]), n_head)
        cv = W._split_heads(W._linear(enc_out, bp["cv"]), n_head)
        scale = cq.shape[-1] ** -0.5
        logits = jnp.einsum("bhtd,bhad->bhta", cq, ck,
                            preferred_element_type=jnp.float32) * scale
        weights = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("bhta,bhad->bhtd", weights.astype(cq.dtype), cv,
                         preferred_element_type=jnp.float32).astype(cq.dtype)
        x = x + W._linear(W._merge_heads(ctx), bp["co"])
        h = W._ln(x, bp["mlp_ln"])
        x = x + W._linear(jax.nn.gelu(W._linear(h, bp["fc1"]), approximate=False), bp["fc2"])
        return x, weights

    _, all_weights = jax.lax.scan(block, x, p["blocks"])
    return all_weights  # (L, B, H, T, A)


def _median_filter(x: np.ndarray, width: int = 7) -> np.ndarray:
    """Median filter along the last axis (audio frames)."""
    if width <= 1:
        return x
    pad = width // 2
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="edge")
    windows = np.lib.stride_tricks.sliding_window_view(xp, width, axis=-1)
    return np.median(windows, axis=-1)


def dtw_path(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Monotonic alignment path minimizing summed cost.
    cost: (N_tokens, M_frames). Returns (token_idx, frame_idx) arrays.

    Anti-diagonal wavefront: cell (i, j) needs (i-1, j-1), (i-1, j) and
    (i, j-1), all on earlier diagonals, so each diagonal updates as one
    vector op — N+M numpy steps instead of the N*M Python-level loop that
    cost hundreds of ms per 224-token x 1500-frame window (openai uses a
    numba/triton DTW for the same reason)."""
    N, M = cost.shape
    D = np.full((N + 1, M + 1), np.inf)
    D[0, 0] = 0.0
    trace = np.zeros((N + 1, M + 1), np.int8)
    for d in range(2, N + M + 1):
        i = np.arange(max(1, d - M), min(N, d - 1) + 1)
        if i.size == 0:
            continue
        j = d - i
        c0, c1, c2 = D[i - 1, j - 1], D[i - 1, j], D[i, j - 1]
        best = np.minimum(np.minimum(c0, c1), c2)
        # tie-break priority diagonal > up > left (matches the scalar loop)
        t = np.where(c0 <= np.minimum(c1, c2), 0,
                     np.where(c1 <= c2, 1, 2)).astype(np.int8)
        D[i, j] = cost[i - 1, j - 1] + best
        trace[i, j] = t
    # backtrack
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


def _alignment_matrix(weights: np.ndarray, n_frames: int) -> np.ndarray:
    """(L, H, T, A) selected-head weights -> normalized (T, n_frames)."""
    L = weights.shape[0]
    sel = weights[L // 2 :].reshape(-1, weights.shape[2], weights.shape[3])  # upper half
    sel = sel[:, :, :n_frames]
    # standardize each FRAME column across tokens (openai timing.py uses
    # dim=-2; normalizing along frames instead systematically skews the
    # DTW cost on long windows — round-2 review), median-filter over
    # frames, mean heads
    mean = sel.mean(axis=-2, keepdims=True)
    std = sel.std(axis=-2, keepdims=True) + 1e-9
    sel = (sel - mean) / std
    sel = _median_filter(sel, 7)
    return sel.mean(axis=0)  # (T, n_frames)


def _split_words(tokenizer: Tokenizer, text_tokens: list[int],
                 language: str | None) -> list[tuple[str, list[int]]]:
    """Group text tokens into word units: split on leading spaces, or one
    token per word for space-free scripts."""
    words: list[tuple[str, list[int]]] = []
    if language in _NO_SPACE_LANGUAGES:
        for t in text_tokens:
            piece = tokenizer.decode([t])
            if piece:
                words.append((piece, [t]))
        return words
    cur_toks: list[int] = []
    cur_text = ""
    for t in text_tokens:
        piece = tokenizer.decode([t])
        if piece.startswith(" ") and cur_toks:
            words.append((cur_text, cur_toks))
            cur_toks, cur_text = [], ""
        cur_toks.append(t)
        cur_text += piece
    if cur_toks:
        words.append((cur_text, cur_toks))
    return words


def word_timestamps(params, dims: W.WhisperDims, tokenizer: Tokenizer,
                    tokens: list[int], enc_out: jax.Array,
                    language: str | None = None, audio_seconds: float = 30.0,
                    time_offset: float = 0.0) -> list[dict]:
    """Align one window's sampled tokens to word-level times.

    tokens: the sampled token ids (timestamps/specials included, they are
    filtered); enc_out: (1, A, d). Returns [{word, start, end}].
    """
    text_tokens = [int(t) for t in tokens if t < tokenizer.eot]
    if not text_tokens:
        return []
    # teacher-force with the real decoding prefix + eot (openai timing.py:
    # [*sot_sequence, no_timestamps, *text, eot]) — bare text tokens at
    # position 0 are out of distribution and corrupt the first words'
    # cross-attention (round-2 review); the prefix/eot rows are sliced off
    # before alignment
    prefix = tokenizer.sot_sequence(language, timestamps=False)
    forced = prefix + text_tokens + [tokenizer.eot]
    tok_arr = jnp.asarray(np.asarray(forced, np.int32)[None, :])
    weights = np.asarray(cross_attention_weights(params, dims, tok_arr, enc_out),
                         np.float32)[:, 0]  # (L, H, T_forced, A)
    weights = weights[:, :, len(prefix) : len(prefix) + len(text_tokens)]
    n_frames = min(enc_out.shape[1], int(audio_seconds * FRAMES_PER_SECOND))
    matrix = _alignment_matrix(weights, n_frames)      # (T, n_frames)
    ti, fi = dtw_path(-matrix)

    # first frame where each token is visited -> token start; next token's
    # start is this token's end
    T = len(text_tokens)
    starts = np.zeros(T)
    ends = np.zeros(T)
    for k in range(len(ti)):
        t, f = ti[k], fi[k]
        if k == 0 or ti[k - 1] != t:
            starts[t] = f / FRAMES_PER_SECOND
        ends[t] = (f + 1) / FRAMES_PER_SECOND

    words = _split_words(tokenizer, text_tokens, language)
    out = []
    idx = 0
    for word, toks in words:
        n = len(toks)
        w_start = starts[idx]
        w_end = ends[idx + n - 1]
        out.append({"word": word, "start": round(time_offset + w_start, 3),
                    "end": round(time_offset + w_end, 3)})
        idx += n
    return out
