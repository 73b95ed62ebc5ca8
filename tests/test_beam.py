"""Beam-search decoding tests (tiny random model, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speaksense_tpu.models import whisper as W
from speaksense_tpu.models import decode as D
from speaksense_tpu.models.beam import beam_decode, transcribe_window_beam
from speaksense_tpu.models.tokenizer import Tokenizer

TOK = Tokenizer.synthetic(51865)
CFG = D.RuleConfig.from_tokenizer(TOK, max_new_tokens=16)
SUPPRESS = jnp.asarray(TOK.suppress_mask())

DIMS = W.WhisperDims(
    n_mels=80, n_vocab=51865, n_audio_ctx=1500, n_audio_state=64,
    n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
    n_text_head=4, n_text_layer=2)


@pytest.fixture(scope="module")
def setup(rng=None):
    params = W.init_params(DIMS, jax.random.PRNGKey(3))
    r = np.random.default_rng(0)
    mel = jnp.asarray(r.standard_normal((2, 3000, DIMS.n_mels)), jnp.float32)
    enc = W.encode(params, DIMS, mel)
    prompt = jnp.asarray([TOK.sot_sequence("en")] * 2, jnp.int32)
    return params, enc, prompt, mel


def test_beam_decode_shapes_and_rules(setup):
    params, enc, prompt, _ = setup
    out = beam_decode(params, DIMS, CFG, SUPPRESS, enc, prompt, beam_size=3)
    tokens = np.asarray(out["tokens"])
    n = np.asarray(out["n_sampled"])
    assert tokens.shape == (2, CFG.max_new_tokens)
    assert (n >= 0).all() and (n <= CFG.max_new_tokens).all()
    for b in range(2):
        if n[b] > 0:
            assert tokens[b, 0] >= TOK.ts_begin  # initial-timestamp rule held
    assert np.isfinite(np.asarray(out["avg_logprob"])).all()
    ns = np.asarray(out["no_speech_prob"])
    assert ((ns >= 0) & (ns <= 1)).all()


def test_beam_deterministic(setup):
    params, enc, prompt, _ = setup
    o1 = beam_decode(params, DIMS, CFG, SUPPRESS, enc, prompt, beam_size=3)
    o2 = beam_decode(params, DIMS, CFG, SUPPRESS, enc, prompt, beam_size=3)
    np.testing.assert_array_equal(np.asarray(o1["tokens"]), np.asarray(o2["tokens"]))


def test_beam_one_equals_greedy(setup):
    """beam_size=1 must reproduce the greedy trajectory (argmax of the same
    filtered logprobs each step). Beam>1 is NOT guaranteed to beat greedy on
    the avg-normalized score — it optimizes sum-logprob and may prune the
    greedy path — so that is deliberately not asserted."""
    params, enc, prompt, mel = setup
    beam = beam_decode(params, DIMS, CFG, SUPPRESS, enc, prompt, beam_size=1)
    greedy = D.transcribe_window(params, DIMS, CFG, SUPPRESS, mel, prompt,
                                 jnp.zeros((2,), jnp.float32), jax.random.PRNGKey(0))
    bt, gt = np.asarray(beam["tokens"]), np.asarray(greedy["tokens"])
    bn, gn = np.asarray(beam["n_sampled"]), np.asarray(greedy["n_sampled"])
    for b in range(2):
        n = min(bn[b], gn[b], 8)  # compare the stable prefix
        np.testing.assert_array_equal(bt[b, :n], gt[b, :n])


def test_transcribe_window_beam(setup):
    params, _, prompt, mel = setup
    out = transcribe_window_beam(params, DIMS, CFG, SUPPRESS, mel, prompt, beam_size=2)
    assert np.asarray(out["tokens"]).shape == (2, CFG.max_new_tokens)


def test_beam_with_conditioning_prompt(setup):
    """Beam + previous-text conditioning: variable-length right-padded
    prompts (prompt_len/sot_index contract). A padded prompt with the pad
    masked out must decode like the unpadded one."""
    params, enc, prompt, _ = setup
    B, P0 = prompt.shape
    pad = 4
    prompt_padded = jnp.concatenate(
        [prompt, jnp.full((B, pad), TOK.eot, jnp.int32)], axis=1)
    plain = beam_decode(params, DIMS, CFG, SUPPRESS, enc, prompt, beam_size=3)
    padded = beam_decode(params, DIMS, CFG, SUPPRESS, enc, prompt_padded,
                         beam_size=3,
                         prompt_len=jnp.full((B,), P0, jnp.int32),
                         sot_index=jnp.zeros((B,), jnp.int32))
    np.testing.assert_array_equal(np.asarray(plain["tokens"]),
                                  np.asarray(padded["tokens"]))
    np.testing.assert_allclose(np.asarray(plain["no_speech_prob"]),
                               np.asarray(padded["no_speech_prob"]), atol=1e-5)


def test_beam_conditioned_context_changes_output(setup):
    """A real <|startofprev|> context flows through beam decoding (shape- and
    rule-correct; the context occupies KV so outputs may legitimately differ)."""
    params, enc, prompt, _ = setup
    B, P0 = prompt.shape
    ctx = [7, 8, 9]
    rows = []
    for b in range(B):
        rows.append([TOK.sot_prev] + ctx + list(np.asarray(prompt[b])))
    P = max(len(r) for r in rows)
    pn = np.full((B, P), TOK.eot, np.int32)
    for b, r in enumerate(rows):
        pn[b, : len(r)] = r
    out = beam_decode(params, DIMS, CFG, SUPPRESS, enc, jnp.asarray(pn),
                      beam_size=2,
                      prompt_len=jnp.asarray([len(r) for r in rows], jnp.int32),
                      sot_index=jnp.asarray([len(ctx) + 1] * B, jnp.int32))
    tokens = np.asarray(out["tokens"])
    n = np.asarray(out["n_sampled"])
    for b in range(B):
        if n[b] > 0:
            assert tokens[b, 0] >= TOK.ts_begin
    assert np.isfinite(np.asarray(out["avg_logprob"])).all()


def test_beam_score_matches_teacher_forced(setup):
    """Ancestry validation: the winning hypothesis's sum_logprob must equal
    the rule-filtered logprob of its sequence under TEACHER-FORCED decoding
    (fresh cache, no beam machinery). If the ancestor-indirected attention
    ever selected the wrong parent's KV mid-search, the in-loop logits — and
    hence the score — would diverge from this reference."""
    params, enc, prompt, _ = setup
    out = beam_decode(params, DIMS, CFG, SUPPRESS, enc, prompt, beam_size=3)
    tokens = np.asarray(out["tokens"])
    n = np.asarray(out["n_sampled"])
    sum_lp = np.asarray(out["sum_logprob"])
    P = prompt.shape[1]

    for b in range(2):
        seq = list(np.asarray(prompt)[b]) + list(tokens[b, : n[b]]) + [CFG.eot]
        full = jnp.asarray(np.asarray(seq, np.int32)[None])
        logits = np.asarray(W.decode_logits(params, DIMS, full, enc[b : b + 1]))
        # replay the rule state machine over the sampled tokens
        ns, last, penult, last_ts = 0, 0, 0, 0
        total = 0.0
        for i, tok in enumerate(seq[P:]):
            lg = jnp.asarray(logits[:, P - 1 + i])
            filt = D.apply_logit_rules(
                lg, CFG, SUPPRESS, jnp.asarray([ns]), jnp.asarray([last]),
                jnp.asarray([penult]), jnp.asarray([last_ts]))
            lp = np.asarray(jax.nn.log_softmax(filt, axis=-1))[0, tok]
            total += lp
            if tok != CFG.eot:
                penult, last = last, tok
                if tok >= CFG.ts_begin:
                    last_ts = tok
                ns += 1
        np.testing.assert_allclose(total, sum_lp[b], rtol=2e-4, atol=2e-3)


def test_beam_int8_cross_kv_close_to_fp(setup):
    """int8 cross-KV beam (per-channel scales folded into q/output) stays
    token-identical on the stable prefix and numerically close on scores."""
    params, enc, prompt, _ = setup
    fp = beam_decode(params, DIMS, CFG, SUPPRESS, enc, prompt, beam_size=3)
    q8 = beam_decode(params, DIMS, CFG, SUPPRESS, enc, prompt, beam_size=3,
                     cross_kv_int8=True)
    ft, qt = np.asarray(fp["tokens"]), np.asarray(q8["tokens"])
    fn_, qn = np.asarray(fp["n_sampled"]), np.asarray(q8["n_sampled"])
    for b in range(ft.shape[0]):
        n = min(fn_[b], qn[b], 4)  # stable prefix only (quantization noise)
        np.testing.assert_array_equal(ft[b, :n], qt[b, :n])
    np.testing.assert_allclose(np.asarray(q8["no_speech_prob"]),
                               np.asarray(fp["no_speech_prob"]), atol=0.05)
