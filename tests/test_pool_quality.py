"""Whisper quality gates ON THE POOLED SERVING PATH (VERDICT r4 item 1).

The reference passes entropy_thold 2.4 / logprob_thold -1.0 /
no_speech_thold 0.6 + best_of into EVERY decode
(/root/reference/src/asr/whisper.rs:131-173); whisper.cpp applies the
temperature-fallback ladder and no-speech suppression inside state.full per
window. Rounds 2-4 implemented those semantics only on the window/seek
paths; these tests pin them on the slot-pool path:

- no_speech_prob is carried through the pool's packed meta and matches the
  window path's value for the same mel;
- a threshold-tripping chunk retries on the POOLED path (per-slot
  temperature vector — retries stay continuous-batched) with the same
  accept/reject outcome as the window path;
- silent chunks are suppressed on BOTH stream paths (whisper.rs:167), and
  silence short-circuits the ladder (openai decode_with_fallback rule);
- per-slot temperature sampling: greedy slots stay deterministic while a
  t>0 slot in the same pool samples.
"""

import numpy as np
import pytest

from speaksense_tpu.asr import AsrParams
from speaksense_tpu.asr.engine import WhisperEngine
from speaksense_tpu.config import EngineConfig
from speaksense_tpu.models.tokenizer import Tokenizer
from speaksense_tpu.models.whisper import WhisperDims, init_params
from speaksense_tpu.runtime.slots import StreamingDecodeServer
from speaksense_tpu.utils.metrics import REGISTRY as METRICS

DIMS = WhisperDims(
    n_mels=80, n_vocab=51865, n_audio_ctx=1500, n_audio_state=64,
    n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
    n_text_head=4, n_text_layer=2)


def _engine(**cfg_overrides):
    import jax

    params = init_params(DIMS, jax.random.PRNGKey(0))
    tok = Tokenizer.synthetic(DIMS.n_vocab)
    cfg = EngineConfig(compute_dtype="float32", **cfg_overrides)
    return WhisperEngine(params, DIMS, tok, config=cfg)


def _counter(name: str) -> float:
    return METRICS.snapshot()["counters"].get(name, 0.0)


def _audio(rng, seconds=3.0, scale=0.1):
    return (rng.standard_normal(int(16000 * seconds)) * scale).astype(np.float32)


# thresholds that NEVER trip (accept everything at t=0)
NEVER = dict(compression_ratio_thold=1e9, logprob_thold=-1e9, entropy_thold=-1.0)
# thresholds that ALWAYS trip (any finite avg_logprob fails) but never
# reach the silence gate
ALWAYS = dict(logprob_thold=1e9, no_speech_thold=2.0)


def test_pool_no_speech_prob_matches_window_path(rng):
    """The pooled path's no_speech_prob (packed meta, SOT-position prefill
    logits) equals the window path's for the same mel."""
    eng = _engine(**NEVER)
    server = StreamingDecodeServer(eng, n_slots=2, t_mel=512, max_new=8)
    try:
        audio = _audio(rng)
        mel = np.asarray(eng.compute_mel(audio, pad_to=512))
        raw = server.submit(mel[0]).result(timeout=300)
        assert "no_speech_prob" in raw and 0.0 <= raw["no_speech_prob"] <= 1.0
        win = eng.decode_windows(mel, "en", max_new_tokens=8)[0]
        np.testing.assert_allclose(raw["no_speech_prob"],
                                   win["no_speech_prob"], rtol=1e-3, atol=1e-5)
    finally:
        server.stop()


def test_pool_fallback_ladder_fires_and_escalates(rng):
    """A threshold-tripping chunk retries on the POOLED path: the ladder
    resubmits at escalating temperatures (per-slot temp vector, best_of
    candidates), meters asr_pool_fallback_retries_total, and — like the
    window path — keeps the last attempt when every rung fails."""
    eng = _engine(best_of=2, **ALWAYS)
    eng.enable_slot_serving(n_slots=4, t_mel=512, max_new=8)
    try:
        server = eng._slot_server
        seen_temps = []
        real = server.submit_audio

        def spy(audio, temperature=0.0, **kw):
            seen_temps.append(float(temperature))
            return real(audio, temperature=temperature, **kw)

        server.submit_audio = spy
        before = _counter("asr_pool_fallback_retries_total")
        before_all = _counter("asr_fallback_retries_total")
        state = eng.create_state()
        res = eng.transcribe_with_state(
            state, _audio(rng), AsrParams(language="en", stream_mode=True))
        retries = _counter("asr_pool_fallback_retries_total") - before
        assert retries == 5, retries          # full ladder 0.2..1.0
        assert _counter("asr_fallback_retries_total") - before_all == 5
        # submissions: 1 admission at t=0 + best_of(2) per rung x 5 rungs
        assert seen_temps[0] == 0.0
        assert seen_temps[1:] == [0.2, 0.2, 0.4, 0.4, 0.6, 0.6, 0.8, 0.8,
                                  1.0, 1.0]
        assert res is not None                # last attempt kept, not an error
    finally:
        eng.disable_slot_serving()


def test_pool_ladder_outcome_matches_window_path(rng):
    """Accept/reject parity (the VERDICT r4 'done' criterion): with
    trip-everything thresholds both paths exhaust the ladder and ACCEPT the
    final attempt; with trip-nothing thresholds both accept at t=0 with zero
    retries. (Token-level parity is not expected at t>0 — sampling noise —
    so the pinned contract is the gate decision itself.)"""
    audio = _audio(rng)

    # trip-nothing: zero retries on either path, identical greedy tokens
    # (max_new=96 matches the window stream path's budget — stream mode
    # keeps only the LAST segment, so differing budgets yield different
    # final segments even for identical prefixes)
    eng = _engine(**NEVER)
    eng.enable_slot_serving(n_slots=2, t_mel=512, max_new=96)
    try:
        b = _counter("asr_fallback_retries_total")
        pooled = eng.transcribe_with_state(
            eng.create_state(), audio, AsrParams(language="en", stream_mode=True))
        assert _counter("asr_fallback_retries_total") == b
    finally:
        eng.disable_slot_serving()
    b = _counter("asr_fallback_retries_total")
    windowed = eng.transcribe_with_state(
        eng.create_state(), audio, AsrParams(language="en", stream_mode=True))
    assert _counter("asr_fallback_retries_total") == b
    assert pooled.full_text == windowed.full_text

    # trip-everything: both paths ladder (5 retries each at best_of=1) and
    # both still return a usable result
    eng2 = _engine(best_of=1, **ALWAYS)
    eng2.enable_slot_serving(n_slots=2, t_mel=512, max_new=8)
    try:
        b = _counter("asr_fallback_retries_total")
        assert eng2.transcribe_with_state(
            eng2.create_state(), audio,
            AsrParams(language="en", stream_mode=True)) is not None
        assert _counter("asr_fallback_retries_total") - b == 5
    finally:
        eng2.disable_slot_serving()
    b = _counter("asr_fallback_retries_total")
    assert eng2.transcribe_with_state(
        eng2.create_state(), audio,
        AsrParams(language="en", stream_mode=True)) is not None
    assert _counter("asr_fallback_retries_total") - b == 5


def test_silent_chunk_suppressed_on_both_stream_paths(rng):
    """whisper.rs:167 / VERDICT r4 item 7: a chunk the model deems silent
    (no_speech_prob over threshold AND poor avg logprob) must emit NO text
    on the pooled path and on the window path — whisper's classic
    silence-hallucination suppression. Forced deterministically via
    no_speech_thold=-1 (any probability trips) + logprob_thold=+1e9."""
    eng = _engine(no_speech_thold=-1.0, logprob_thold=1e9)
    params = AsrParams(language="en", stream_mode=True)
    audio = _audio(rng)

    eng.enable_slot_serving(n_slots=2, t_mel=512, max_new=8)
    try:
        before = _counter("asr_no_speech_suppressed_total")
        res = eng.transcribe_with_state(eng.create_state(), audio, params)
        assert res.full_text == "" and res.segments == []
        assert _counter("asr_no_speech_suppressed_total") == before + 1
    finally:
        eng.disable_slot_serving()

    # window path (no pool): same suppression
    before = _counter("asr_no_speech_suppressed_total")
    res = eng.transcribe_with_state(eng.create_state(), audio, params)
    assert res.full_text == "" and res.segments == []
    assert _counter("asr_no_speech_suppressed_total") == before + 1


def test_silence_short_circuits_the_ladder(rng):
    """openai decode_with_fallback rule: no_speech over threshold disables
    the retry gates — a silent chunk must NOT pay the temperature ladder
    even though its avg_logprob would trip the logprob gate."""
    eng = _engine(no_speech_thold=-1.0, logprob_thold=1e9)
    eng.enable_slot_serving(n_slots=2, t_mel=512, max_new=8)
    try:
        before = _counter("asr_fallback_retries_total")
        eng.transcribe_with_state(eng.create_state(), _audio(rng),
                                  AsrParams(language="en", stream_mode=True))
        assert _counter("asr_fallback_retries_total") == before
    finally:
        eng.disable_slot_serving()


def test_pool_per_slot_temperature_sampling(rng):
    """Per-slot temperature in the pool step: t=0 rows stay deterministic
    greedy while a t=1.0 row in the same pool samples (and still obeys the
    timestamp rules)."""
    eng = _engine(**NEVER)
    server = StreamingDecodeServer(eng, n_slots=4, t_mel=512, max_new=12)
    try:
        mel = np.asarray(eng.compute_mel(_audio(rng), pad_to=512))[0]
        g1 = server.submit(mel).result(timeout=300)
        # one greedy + two sampled jobs share the pool concurrently
        f_g = server.submit(mel)
        f_s1 = server.submit(mel, temperature=1.0)
        f_s2 = server.submit(mel, temperature=1.0)
        g2, s1, s2 = (f.result(timeout=300) for f in (f_g, f_s1, f_s2))
        # greedy rows unperturbed by the sampled neighbors
        assert g1["n_sampled"] == g2["n_sampled"]
        np.testing.assert_array_equal(g1["tokens"], g2["tokens"])
        # sampled rows actually sampled (near-certain divergence from greedy
        # over a 51865-token vocab; both sampled rows draw independent noise)
        assert (s1["tokens"].tolist() != g1["tokens"].tolist()
                or s2["tokens"].tolist() != g1["tokens"].tolist())
        tok = eng.tokenizer
        for r in (s1, s2):
            assert r["temperature"] == 1.0
            if r["n_sampled"] > 0:
                assert r["tokens"][0] >= tok.ts_begin  # rules hold sampled
    finally:
        server.stop()


def test_beam_pool_carries_ns_prob_and_routes_retries_to_window(rng):
    """Beam pools carry no_speech_prob too, and their fallback retries route
    through the WINDOW path at t>0 (whisper.cpp's ladder switches beam ->
    greedy sampling, whisper.rs:132-141)."""
    eng = _engine(beam_size=2, best_of=1, **ALWAYS)
    eng.enable_slot_serving(n_slots=2, t_mel=512, max_new=8, beam_size=2)
    try:
        server = eng._slot_server
        assert getattr(server.pool, "K", 1) == 2
        # direct pool submission exposes the raw meta
        mel = np.asarray(eng.compute_mel(_audio(rng), pad_to=512))[0]
        raw = server.submit(mel).result(timeout=300)
        assert 0.0 <= raw["no_speech_prob"] <= 1.0
        # full stream chunk: ladder fires; the beam retry is ONE window-path
        # decode (decode_windows runs the remaining ladder itself)
        before = _counter("asr_fallback_retries_total")
        res = eng.transcribe_with_state(
            eng.create_state(), _audio(rng),
            AsrParams(language="en", stream_mode=True))
        assert res is not None
        assert _counter("asr_fallback_retries_total") > before
    finally:
        eng.disable_slot_serving()


def test_oversized_chunk_pieces_gate_independently(rng):
    """An oversized chunk's sub-windows each carry their own ns_prob and
    retry closure; with trip-nothing thresholds the multi-piece path is
    unchanged (regression guard for the new gating plumbing)."""
    eng = _engine(**NEVER)
    eng.enable_slot_serving(n_slots=2, t_mel=512, max_new=8)
    try:
        long_audio = _audio(rng, seconds=11.0)
        params = AsrParams(language="en", stream_mode=True)
        before = _counter("asr_fallback_retries_total")
        pending = eng.submit_stream_chunk(eng.create_state(), long_audio, params)
        assert pending is not None and len(pending.futures) == 3
        res = pending.settle()
        assert res is not None
        assert _counter("asr_fallback_retries_total") == before
    finally:
        eng.disable_slot_serving()


def test_stream_session_condition_toggle(rng):
    """--no-condition / GrpcServer(condition=False): the session's params
    disable previous-text conditioning, so pooled chunks on a
    conditioning-capable (max_prompt=64) pool submit with context=None
    (whisper.cpp no_context=true; the reference serves no_context=false)."""
    from speaksense_tpu.serving.stream import StreamSession

    eng = _engine(**NEVER)
    eng.enable_slot_serving(n_slots=2, t_mel=512, max_new=8, max_prompt=64)
    try:
        server = eng._slot_server
        contexts = []
        real = server.submit_audio

        def spy(audio, context=None, **kw):
            contexts.append(context)
            return real(audio, context=context, **kw)

        server.submit_audio = spy
        sess = StreamSession(eng, language="en", denoise=False,
                             condition=False)
        assert sess.params.condition_on_previous_text is False
        pcm = (_audio(rng, seconds=5.0) * 32767).astype(np.int16)
        import base64 as b64

        for _ in range(2):          # second chunk would otherwise condition
            sess.feed(b64.standard_b64encode(pcm.tobytes()))
        assert len(contexts) >= 2 and all(c is None for c in contexts)
        # default session on the same pool DOES thread context once text exists
        contexts.clear()
        sess2 = StreamSession(eng, language="en", denoise=False)
        assert sess2.params.condition_on_previous_text is True
        for _ in range(2):
            sess2.feed(b64.standard_b64encode(pcm.tobytes()))
        assert len(contexts) >= 2
    finally:
        eng.disable_slot_serving()


def test_hot_retry_resets_conditioning_context(rng):
    """openai prompt_reset rule on the POOLED path (seek-loop parity,
    engine.py:628): a chunk that exhausts the ladder at t > 0.5 must RESET
    the stream's conditioning context, not append its (likely degraded)
    sampled text — the feedback loop conditioning would otherwise amplify."""
    audio = _audio(rng)

    # trip-nothing: context accumulates
    eng = _engine(**NEVER)
    eng.enable_slot_serving(n_slots=2, t_mel=512, max_new=8, max_prompt=64)
    try:
        state = eng.create_state()
        eng.transcribe_with_state(state, audio,
                                  AsrParams(language="en", stream_mode=True))
        assert state.context_tokens          # greedy text conditions chunk 2
    finally:
        eng.disable_slot_serving()

    # trip-everything: the ladder ends hot (t=1.0) -> context reset
    eng2 = _engine(best_of=1, **ALWAYS)
    eng2.enable_slot_serving(n_slots=2, t_mel=512, max_new=8, max_prompt=64)
    try:
        state = eng2.create_state()
        state.context_tokens = [100, 101]    # pre-existing context survives?
        eng2.transcribe_with_state(state, audio,
                                   AsrParams(language="en", stream_mode=True))
        assert state.context_tokens == []    # no: hot retry resets it
    finally:
        eng2.disable_slot_serving()


def test_submit_after_stop_fails_fast(rng):
    """stop() marks the server dead: a submission racing shutdown (e.g. a
    quality-gate retry fired from a settler thread) raises immediately
    instead of stranding its future on a queue no loop thread will drain."""
    eng = _engine(**NEVER)
    server = StreamingDecodeServer(eng, n_slots=2, t_mel=512, max_new=8)
    mel = np.asarray(eng.compute_mel(_audio(rng), pad_to=512))[0]
    server.submit(mel).result(timeout=300)
    server.stop()
    with pytest.raises(RuntimeError):
        server.submit(mel)


def test_retry_failure_keeps_last_attempt(rng):
    """Keep-last-attempt under retry errors: if a fallback RESUBMISSION
    fails (server stopping, pool reset), the chunk's already-decoded
    candidate is returned instead of erroring the stream."""
    eng = _engine(best_of=1, **ALWAYS)
    eng.enable_slot_serving(n_slots=2, t_mel=512, max_new=8)
    try:
        server = eng._slot_server
        real = server.submit_audio

        def failing(audio, temperature=0.0, **kw):
            if temperature > 0:
                raise RuntimeError("synthetic retry failure")
            return real(audio, temperature=temperature, **kw)

        server.submit_audio = failing
        res = eng.transcribe_with_state(
            eng.create_state(), _audio(rng),
            AsrParams(language="en", stream_mode=True))
        assert res is not None and res.n_tokens >= 0
    finally:
        eng.disable_slot_serving()


def test_beam_pool_rejects_hot_submissions(rng):
    """Beam pools are t=0 only (admit drops temps): a t>0 submission must
    raise, not return a greedy decode falsely labeled hot (which would skip
    ladder rungs and wrongly reset conditioning context downstream)."""
    eng = _engine(beam_size=2, **NEVER)
    eng.enable_slot_serving(n_slots=2, t_mel=512, max_new=8, beam_size=2)
    try:
        server = eng._slot_server
        mel = np.asarray(eng.compute_mel(_audio(rng), pad_to=512))[0]
        with pytest.raises(ValueError):
            server.submit(mel, temperature=0.5)
        with pytest.raises(ValueError):
            server.submit_audio(_audio(rng), temperature=0.5)
        # t=0 still serves
        assert server.submit(mel).result(timeout=300)["n_sampled"] >= 0
    finally:
        eng.disable_slot_serving()
