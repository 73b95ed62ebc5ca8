"""Beam slot pool (runtime/beam_slots.py): beam=K token-level continuous
batching — parity vs the window-path beam decoder, slot isolation, circular
wrap, and the serving wiring (BASELINE config 4: streams + paged KV + beam)."""

import numpy as np
import pytest

from speaksense_tpu.asr.engine import WhisperEngine
from speaksense_tpu.config import EngineConfig
from speaksense_tpu.models.whisper import WhisperDims, init_params
from speaksense_tpu.models.tokenizer import Tokenizer
from speaksense_tpu.runtime.slots import StreamingDecodeServer

DIMS = WhisperDims(
    n_mels=80, n_vocab=51865, n_audio_ctx=1500, n_audio_state=64,
    n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
    n_text_head=4, n_text_layer=2)


@pytest.fixture(scope="module")
def engine():
    import jax

    params = init_params(DIMS, jax.random.PRNGKey(0))
    tok = Tokenizer.synthetic(DIMS.n_vocab)
    # thresholds neutralized: random weights trip the (since-r5) pooled
    # quality ladder; pool-mechanics tests need deterministic t=0 decodes
    # (the ladder itself is pinned in tests/test_pool_quality.py)
    return WhisperEngine(params, DIMS, tok,
                         config=EngineConfig(compute_dtype="float32",
                                             compression_ratio_thold=1e9,
                                             logprob_thold=-1e9,
                                             entropy_thold=-1.0))


def _mel(engine, rng, scale=0.1):
    return np.asarray(engine.compute_mel(
        (rng.standard_normal(16000) * scale).astype(np.float32),
        pad_to=512))[0]


def _window_beam_reference(engine, mel, beam_size, max_new):
    """The window-path beam decoder on the same (mel, prompt) — the pool
    must reproduce its best hypothesis exactly (both deterministic)."""
    import jax
    import jax.numpy as jnp

    from speaksense_tpu.models import decode as D
    from speaksense_tpu.models.beam import transcribe_window_beam

    tok = engine.tokenizer
    cfg = D.RuleConfig.from_tokenizer(tok, max_initial_ts=engine.config.max_initial_ts,
                                      max_new_tokens=max_new)
    prompt = jnp.asarray([tok.sot_sequence("en")], jnp.int32)
    fn = jax.jit(lambda p, m: transcribe_window_beam(
        p, DIMS, cfg, engine._suppress[(False, False)], m, prompt,
        beam_size=beam_size, n_audio_ctx=256))
    out = fn(engine.params, jnp.asarray(mel[None]))
    return (np.asarray(out["tokens"])[0], int(np.asarray(out["n_sampled"])[0]),
            float(np.asarray(out["sum_logprob"])[0]))


def test_beam_pool_matches_window_beam(engine, rng):
    server = StreamingDecodeServer(engine, n_slots=2, t_mel=512, max_new=16,
                                   beam_size=3)
    try:
        for scale in (0.1, 0.3):
            mel = _mel(engine, rng, scale)
            r = server.submit(mel).result(timeout=300)
            ref_tok, ref_n, ref_lp = _window_beam_reference(engine, mel, 3, 16)
            assert r["n_sampled"] == ref_n, (r["n_sampled"], ref_n)
            np.testing.assert_array_equal(r["tokens"][:ref_n], ref_tok[:ref_n])
            assert abs(r["sum_logprob"] - ref_lp) < 1e-3
    finally:
        server.stop()


def test_beam_pool_int8_pages_match_fp(engine, rng):
    """r4: int8 SELF-KV beam pages (flush-time quantized, ancestor
    indirection unchanged — the one-hot reorders move the int32 table,
    never the int8 bytes) agree with the bf16 beam pool on the best
    hypothesis' first tokens, and the state carries the per-token scale
    tensors."""
    import jax.numpy as jnp

    fp = StreamingDecodeServer(engine, n_slots=2, t_mel=512, max_new=16,
                               beam_size=3)
    q8 = StreamingDecodeServer(engine, n_slots=2, t_mel=512, max_new=16,
                               beam_size=3, int8_kv=True, self_int8=True)
    try:
        assert q8.pool.state["self_k"].dtype == jnp.int8
        assert q8.pool.state["cross_k"].dtype == jnp.int8
        assert q8.pool.state["self_k_scale"].ndim == 4  # (L, R, H, T)
        assert q8.pool.state["ring_k"].dtype == engine.dtype  # bf16/f32 ring
        mel = _mel(engine, rng, 0.1)
        r_fp = fp.submit(mel).result(timeout=300)
        r_q8 = q8.submit(mel).result(timeout=300)
        assert r_q8["n_sampled"] > 0
        tok = engine.tokenizer
        assert r_q8["tokens"][0] >= tok.ts_begin  # rule-compliant opener
        assert r_fp["tokens"][0] == r_q8["tokens"][0]
    finally:
        fp.stop()
        q8.stop()


def test_beam_pool_slot_isolation(engine, rng):
    """Same window, different pool company / slot -> identical best beam."""
    server = StreamingDecodeServer(engine, n_slots=2, t_mel=512, max_new=12,
                                   beam_size=2)
    try:
        target = _mel(engine, rng, 0.1)
        r1 = server.submit(target).result(timeout=300)
        f_other = server.submit(_mel(engine, rng, 0.4))
        f_target = server.submit(target)
        f_other2 = server.submit(_mel(engine, rng, 0.5))
        r2 = f_target.result(timeout=300)
        f_other.result(timeout=300)
        f_other2.result(timeout=300)
        assert r1["n_sampled"] == r2["n_sampled"]
        n = r1["n_sampled"]
        np.testing.assert_array_equal(r1["tokens"][:n], r2["tokens"][:n])
        assert server.pool.n_active == 0
        assert sorted(server.pool.free) == [0, 1]
    finally:
        server.stop()


def test_beam_pool_circular_wrap(engine, rng):
    """Ancestor tables + age validity survive cursor wrap-around."""
    server = StreamingDecodeServer(engine, n_slots=2, t_mel=512, max_new=16,
                                   beam_size=2)
    try:
        target = _mel(engine, rng, 0.1)
        r_first = server.submit(target).result(timeout=300)
        i = 0
        while server.pool.gstep_host <= 300:  # >2 wraps of t_text=128
            server.submit(_mel(engine, rng, 0.2 + 0.01 * i)).result(timeout=300)
            i += 1
            assert i < 60, "cursor not advancing"
        r_late = server.submit(target).result(timeout=300)
        assert r_first["n_sampled"] == r_late["n_sampled"]
        n = r_first["n_sampled"]
        np.testing.assert_array_equal(r_first["tokens"][:n], r_late["tokens"][:n])
    finally:
        server.stop()


def test_stream_chunks_via_beam_pool(rng):
    """engine.enable_slot_serving inherits --beam-size: stream chunks decode
    through the BEAM pool (not the window batcher, not greedy)."""
    import jax

    from speaksense_tpu.asr import AsrParams
    from speaksense_tpu.runtime.beam_slots import BeamSlotPool

    eng = WhisperEngine(init_params(DIMS, jax.random.PRNGKey(0)), DIMS,
                        Tokenizer.synthetic(DIMS.n_vocab),
                        config=EngineConfig(compute_dtype="float32",
                                            beam_size=2,
                                            compression_ratio_thold=1e9,
                                            logprob_thold=-1e9,
                                            entropy_thold=-1.0))
    eng.enable_slot_serving(n_slots=2, t_mel=512, max_new=12)
    try:
        assert isinstance(eng._slot_server.pool, BeamSlotPool)
        assert eng._slot_server.pool.K == 2
        state = eng.create_state()
        audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
        res = eng.transcribe_with_state(
            state, audio, AsrParams(language="en", stream_mode=True))
        assert len(res.segments) <= 1
        assert eng._slot_server.steps_run > 0
        # pipelined submission works against the beam pool too
        pending = eng.submit_stream_chunk(state, audio,
                                          AsrParams(language="en",
                                                    stream_mode=True))
        assert pending is not None
        pending.settle()
    finally:
        eng.disable_slot_serving()


def test_beam_pool_all_jobs_at_budget(engine, rng):
    """The budget-exhaustion fast path (SlotPool.all_jobs_at_budget) holds
    for the BEAM pool too: hit_cap is local_step+1 >= max_new, so after
    max_new post-admit pool steps every beam of every occupant is provably
    frozen and the newest packed meta retires the slot — the server loop's
    frozen-dispatch-avoidance applies unchanged to beam serving."""
    from speaksense_tpu.runtime.beam_slots import BeamSlotPool
    from speaksense_tpu.runtime.slots import _StreamJob

    pool = BeamSlotPool(engine, n_slots=2, t_mel=512, max_new=8,
                        beam_size=3, ring_width=4)
    tok = engine.tokenizer
    j1 = _StreamJob(mel=_mel(engine, rng, 0.1),
                    prompt=list(tok.sot_sequence("en")))
    j2 = _StreamJob(mel=_mel(engine, rng, 0.3),
                    prompt=list(tok.sot_sequence("en")))
    assert pool.admit_many([j1, j2]) == 2
    pool.step(retire=False, k=4)
    assert pool.total_steps == 4 and not pool.all_jobs_at_budget()
    pool.step(retire=False, k=4)
    assert pool.all_jobs_at_budget()
    done = pool.retire_from(*pool._last_meta)
    assert sorted(id(j) for j in done) == sorted(id(j) for j in (j1, j2))
    assert pool.n_active == 0
    for j in (j1, j2):
        assert j.future.result()["n_sampled"] <= 8
