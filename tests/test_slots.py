"""Token-level continuous batching (slot pool) tests."""

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
    # quality-fallback thresholds NEUTRALIZED: since r5 the pooled stream
    # paths apply whisper's temperature ladder too, and random weights trip
    # it on ~every chunk — these tests pin pool mechanics (determinism,
    # isolation, admission), which needs greedy-only decodes. The ladder
    # itself is pinned in tests/test_pool_quality.py.
    return WhisperEngine(params, DIMS, tok, config=EngineConfig(
        compute_dtype="float32", compression_ratio_thold=1e9,
        logprob_thold=-1e9, entropy_thold=-1.0))


def _mel(engine, rng, seed_scale=0.1):
    return np.asarray(engine.compute_mel(
        (rng.standard_normal(16000) * seed_scale).astype(np.float32)))[0]


def test_pool_serves_more_streams_than_slots(engine, rng):
    server = StreamingDecodeServer(engine, n_slots=2, max_new=16)
    try:
        mels = [_mel(engine, rng, s) for s in (0.05, 0.1, 0.2, 0.3)]
        futures = [server.submit(m) for m in mels]
        results = [f.result(timeout=300) for f in futures]
        assert len(results) == 4
        tok = engine.tokenizer
        for r in results:
            assert 0 <= r["n_sampled"] <= 16
            if r["n_sampled"] > 0:
                assert r["tokens"][0] >= tok.ts_begin  # rules hold in the pool
        assert server.pool.n_active == 0
        assert sorted(server.pool.free) == [0, 1]  # slots recycled
        # steps_run counts DISPATCHES (steps_per_dispatch decode steps each)
        total_steps = server.steps_run * server.steps_per_dispatch
        assert total_steps >= max(r["n_sampled"] for r in results)
    finally:
        server.stop()


def test_pool_slot_isolation(engine, rng):
    """The same window decodes identically regardless of which slot it lands
    in or what else occupies the pool (greedy, same compiled program)."""
    server = StreamingDecodeServer(engine, n_slots=2, max_new=12)
    try:
        target = _mel(engine, rng, 0.1)
        other1 = _mel(engine, rng, 0.3)
        other2 = _mel(engine, rng, 0.5)
        r1 = server.submit(target).result(timeout=300)
        # occupy the pool differently, resubmit the same window
        f_other = server.submit(other1)
        f_target = server.submit(target)
        f_other2 = server.submit(other2)
        r2 = f_target.result(timeout=300)
        f_other.result(timeout=300)
        f_other2.result(timeout=300)
        n = min(r1["n_sampled"], r2["n_sampled"])
        np.testing.assert_array_equal(r1["tokens"][:n], r2["tokens"][:n])
        assert r1["n_sampled"] == r2["n_sampled"]
    finally:
        server.stop()


def test_stream_chunks_via_slot_pool(engine, rng):
    """gRPC-style streaming chunks route through the slot pool when enabled."""
    from speaksense_tpu.asr import AsrParams

    engine.enable_slot_serving(n_slots=2, t_mel=512, max_new=12)
    try:
        state = engine.create_state()
        audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
        res = engine.transcribe_with_state(
            state, audio, AsrParams(language="en", stream_mode=True))
        assert len(res.segments) <= 1
        assert engine._slot_server.steps_run > 0
    finally:
        engine._slot_server.stop()
        engine._slot_server = None


def test_pool_int8_kv_matches_fp(engine, rng):
    """int8 pools (cross per-channel; self per-token via self_int8 — since
    r4 the int8 self pages ride the SAME ring/circular path: the bf16 ring
    quantizes at flush) produce rule-compliant output and agree with the fp
    pool on the first sampled tokens."""
    fp = StreamingDecodeServer(engine, n_slots=2, max_new=12)
    q8 = StreamingDecodeServer(engine, n_slots=2, max_new=12, int8_kv=True,
                               self_int8=True)
    try:
        import jax.numpy as jnp

        assert q8.pool.state["cross_k"].dtype == jnp.int8
        assert q8.pool.state["self_k"].dtype == jnp.int8
        assert q8.pool.state["self_k_scale"].shape == \
            q8.pool.state["self_k"].shape[:3] + q8.pool.state["self_k"].shape[-1:]
        assert "ring_k" in q8.pool.state           # int8 rides the ring too
        assert q8.pool.state["ring_k"].dtype == engine.dtype  # bf16 ring
        assert "ring_k" in fp.pool.state           # ring write path
        mel = _mel(engine, rng, 0.1)
        r_fp = fp.submit(mel).result(timeout=300)
        r_q8 = q8.submit(mel).result(timeout=300)
        tok = engine.tokenizer
        if r_q8["n_sampled"] > 0:
            assert r_q8["tokens"][0] >= tok.ts_begin
        if r_fp["n_sampled"] and r_q8["n_sampled"]:
            assert r_fp["tokens"][0] == r_q8["tokens"][0]
    finally:
        fp.stop()
        q8.stop()


def test_pool_dispatch_width_invariance(engine, rng):
    """Ring flush boundaries are invisible: k steps per dispatch (flush every
    k) decodes the same tokens as stepping one at a time (flush every step)."""
    s1 = StreamingDecodeServer(engine, n_slots=2, max_new=12, steps_per_dispatch=1)
    s8 = StreamingDecodeServer(engine, n_slots=2, max_new=12, steps_per_dispatch=8)
    try:
        mel = _mel(engine, rng, 0.1)
        r1 = s1.submit(mel).result(timeout=300)
        r8 = s8.submit(mel).result(timeout=300)
        assert r1["n_sampled"] == r8["n_sampled"]
        n = r1["n_sampled"]
        np.testing.assert_array_equal(r1["tokens"][:n], r8["tokens"][:n])
    finally:
        s1.stop()
        s8.stop()


def test_pool_circular_wrap_isolation(engine, rng):
    """The circular page cursor wraps after t_text (128) global steps; a
    window submitted before and after several wraps must decode identically
    (ages, pad-gap masks and the flush window all survive wrap-around)."""
    server = StreamingDecodeServer(engine, n_slots=2, max_new=16)
    try:
        target = _mel(engine, rng, 0.1)
        r_first = server.submit(target).result(timeout=300)
        # push the global cursor through >2 wraps (t_text=128) with fillers
        i = 0
        while server.pool.gstep_host <= 300:
            server.submit(_mel(engine, rng, 0.2 + 0.01 * i)).result(timeout=300)
            i += 1
            assert i < 60, "cursor not advancing"
        r_late = server.submit(target).result(timeout=300)
        assert r_first["n_sampled"] == r_late["n_sampled"]
        n = r_first["n_sampled"]
        np.testing.assert_array_equal(r_first["tokens"][:n], r_late["tokens"][:n])
    finally:
        server.stop()


def test_pool_conditioned_prompt_matches_window_path(engine, rng):
    """A max_prompt=64 pool accepts previous-text conditioning (wrap-aware
    placement: P=64 > ring_width=16) and its greedy decode matches the
    window path given the identical conditioned prompt (VERDICT r1 item 9)."""
    import jax

    from speaksense_tpu.models.whisper import init_params as _init

    # dedicated engine: fallback OFF (random weights always trip the
    # thresholds, and the window reference would otherwise re-sample at t>0
    # while the pool stays greedy)
    eng = WhisperEngine(_init(DIMS, jax.random.PRNGKey(0)), DIMS,
                        Tokenizer.synthetic(DIMS.n_vocab),
                        config=EngineConfig(compute_dtype="float32",
                                            best_of=1, logprob_thold=-1e9,
                                            entropy_thold=-1.0))
    server = StreamingDecodeServer(eng, n_slots=2, max_new=12, max_prompt=64)
    try:
        mel = _mel(eng, rng, 0.1)
        ctx = [100 + i for i in range(40)]
        r_cond = server.submit(mel, context=ctx).result(timeout=300)
        # the conditioned admission used the max_prompt bucket
        assert any(k[1] == 64 for k in server.pool._admit_fns), \
            list(server.pool._admit_fns)
        # window-path reference with the same context tokens
        win = eng.decode_windows(mel[None], "en", max_new_tokens=12,
                                 context_tokens=[ctx])[0]
        n = min(r_cond["n_sampled"], win["n_sampled"])
        np.testing.assert_array_equal(r_cond["tokens"][:n],
                                      np.asarray(win["tokens"])[:n])
        assert r_cond["n_sampled"] == win["n_sampled"]
    finally:
        server.stop()


def test_pool_int8_conditioned_wrap_placement(engine, rng):
    """int8 circular pages + conditioning: the wrap-aware admission
    placement must rotate the (L,n,H,T) per-token SCALE tensors alongside
    their int8 columns (P=64 > ring_width=16 exercises the wrap-fold
    branch on both ranks), and the decode still matches the bf16 pool's
    first token."""
    fp = StreamingDecodeServer(engine, n_slots=2, max_new=12, max_prompt=64)
    q8 = StreamingDecodeServer(engine, n_slots=2, max_new=12, max_prompt=64,
                               int8_kv=True, self_int8=True)
    try:
        mel = _mel(engine, rng, 0.1)
        ctx = [100 + i for i in range(40)]
        r_fp = fp.submit(mel, context=ctx).result(timeout=300)
        r_q8 = q8.submit(mel, context=ctx).result(timeout=300)
        assert any(k[1] == 64 for k in q8.pool._admit_fns)
        if r_fp["n_sampled"] and r_q8["n_sampled"]:
            assert r_fp["tokens"][0] == r_q8["tokens"][0]
    finally:
        fp.stop()
        q8.stop()


def test_stream_state_carries_context_into_pool(engine, rng):
    """Sequential stream chunks through a conditioning-enabled pool build up
    EngineState.context_tokens and ride the large prompt bucket."""
    from speaksense_tpu.asr import AsrParams

    engine.enable_slot_serving(n_slots=2, t_mel=512, max_new=12, max_prompt=64)
    try:
        state = engine.create_state()
        params = AsrParams(language="en", stream_mode=True)
        audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
        engine.transcribe_with_state(state, audio, params)
        first_ctx = list(state.context_tokens)
        engine.transcribe_with_state(state, audio, params)
        pool = engine._slot_server.pool
        if first_ctx:  # the second chunk was conditioned on the first
            # conditioned admission used a larger prompt bucket than the
            # plain 4-token SOT one (16 or 64, depending on context length)
            assert any(k[1] > 4 for k in pool._admit_fns), \
                list(pool._admit_fns)
            assert len(state.context_tokens) >= len(first_ctx) > 0
        assert len(state.context_tokens) <= pool.max_prompt
    finally:
        engine._slot_server.stop()
        engine._slot_server = None


def test_stream_session_device_denoise(engine, rng):
    """A denoising StreamSession against a slot-serving engine runs the DSP
    chain on device: the admission program is the denoise variant and no
    host numpy denoise happens."""
    import base64

    from speaksense_tpu.serving.stream import StreamSession

    engine.enable_slot_serving(n_slots=2, t_mel=512, max_new=12)
    try:
        session = StreamSession(engine, language="en", denoise=True)
        pcm = (rng.standard_normal(16000 * 5) * 1500).astype(np.int16)
        session.feed(base64.standard_b64encode(pcm.tobytes()))
        pool = engine._slot_server.pool
        assert any(k[2] and k[3] for k in pool._admit_fns), \
            list(pool._admit_fns)  # (bucket, P, is_audio=True, denoise=True)
    finally:
        engine._slot_server.stop()
        engine._slot_server = None


def test_submit_stream_chunk_gating(engine, rng):
    """submit_stream_chunk (the nonblocking pipelining entry) must decline —
    returning None so callers take the ordered sequential path — whenever
    pipelining could change semantics: no slot pool, non-stream params,
    off-bucket chunks, or previous-text conditioning that reaches the
    admission prompt (chunk k+1's prompt then depends on chunk k's output)."""
    from speaksense_tpu.asr import AsrParams

    audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    stream = AsrParams(language="en", stream_mode=True)

    # no slot pool -> None
    assert engine.submit_stream_chunk(engine.create_state(), audio, stream) is None

    engine.enable_slot_serving(n_slots=2, t_mel=512, max_new=8)
    try:
        # batch-mode params -> None (pipelining is a streaming-only contract)
        assert engine.submit_stream_chunk(
            engine.create_state(), audio,
            AsrParams(language="en", stream_mode=False)) is None
        # OVERSIZED chunk (>10 s buckets to 1024 > pool 512) -> served as
        # ceil-split concurrent pool sub-windows, NOT declined (the r3
        # oversized policy; see test_oversized_chunk_rides_pool)
        long_audio = (rng.standard_normal(16000 * 11) * 0.1).astype(np.float32)
        pending_long = engine.submit_stream_chunk(
            engine.create_state(), long_audio, stream)
        assert pending_long is not None and len(pending_long.futures) == 3
        pending_long.settle()
        # in-bucket unconditioned chunk -> pending handle, settles to the
        # same result shape the sequential path returns
        pending = engine.submit_stream_chunk(engine.create_state(), audio, stream)
        assert pending is not None
        res = pending.settle()
        assert res.language == "en" and len(res.segments) <= 1
    finally:
        engine.disable_slot_serving()

    # conditioning that reaches the admission prompt (max_prompt > 16):
    # BOUNDED pipelining (VERDICT r2 item 8) — snapshot context at submit,
    # at most 2 chunks of one stream in flight, then fall back to the
    # ordered sequential path
    engine.enable_slot_serving(n_slots=4, t_mel=512, max_new=8, max_prompt=64)
    try:
        state = engine.create_state()
        state.context_tokens = [5, 6, 7]
        p1 = engine.submit_stream_chunk(state, audio, stream)
        assert p1 is not None and state.inflight_conditioned == 1
        p2 = engine.submit_stream_chunk(state, audio, stream)
        assert p2 is not None and state.inflight_conditioned == 2
        # third concurrent conditioned chunk exceeds the bound -> sequential
        assert engine.submit_stream_chunk(state, audio, stream) is None
        p1.settle()
        assert state.inflight_conditioned == 1
        p2.settle()
        assert state.inflight_conditioned == 0
        # drained: submission pipelines again
        p4 = engine.submit_stream_chunk(state, audio, stream)
        assert p4 is not None
        p4.settle()
    finally:
        engine.disable_slot_serving()


def test_oversized_chunk_rides_pool(engine, rng):
    """A stream chunk BIGGER than the pool bucket (the last window-batcher
    fallback left after r3's pad_to_bucket) is served as ceil-split
    concurrent pool sub-windows with segment times offset onto the chunk's
    absolute timeline — and the fallback metric does not move. The
    pipelined (submit_stream_chunk) and sequential (transcribe_with_state)
    paths agree exactly: same pool programs, deterministic greedy decode."""
    from speaksense_tpu.asr import AsrParams
    from speaksense_tpu.audio import mel as MEL
    from speaksense_tpu.utils.metrics import REGISTRY as METRICS

    engine.enable_slot_serving(n_slots=2, t_mel=512, max_new=8)
    stream = AsrParams(language="en", stream_mode=True)
    try:
        piece = 512 * MEL.HOP_LENGTH  # pool-bucket samples (5.12 s)
        audio = (rng.standard_normal(2 * piece + piece // 2) * 0.1
                 ).astype(np.float32)

        def fallbacks():
            return METRICS.snapshot()["counters"].get(
                "asr_slot_bucket_fallbacks_total", 0.0)

        before = fallbacks()
        merged = engine.transcribe_with_state(engine.create_state(), audio,
                                              stream)
        assert fallbacks() == before  # pool-served, no window-batcher trip
        pending = engine.submit_stream_chunk(engine.create_state(), audio,
                                             stream)
        assert pending is not None and len(pending.futures) == 3
        assert pending.settle() == merged

        dur = piece / 16000
        for s in merged.segments:
            assert -1e-6 <= s.start <= s.end <= audio.size / 16000 + 1e-6
        # piece-for-piece parity: stream mode keeps the LAST (filtered)
        # segment, so merged == the last piece that decodes to any segment,
        # its window times offset by the full pieces before it
        pieces = [engine.transcribe_with_state(engine.create_state(),
                                               audio[i:i + piece], stream)
                  for i in range(0, audio.size, piece)]
        exp = [(i, r) for i, r in enumerate(pieces) if r.segments]
        if not exp:
            assert merged.segments == []
        else:
            i, r = exp[-1]
            assert [s.text for s in merged.segments] == \
                [s.text for s in r.segments]
            for m, t in zip(merged.segments, r.segments):
                assert abs(m.start - (t.start + i * dur)) < 1e-6
                assert abs(m.end - (t.end + i * dur)) < 1e-6
    finally:
        engine.disable_slot_serving()


def test_lagged_retire_from_guards_recycled_slots(engine, rng):
    """retire_from on a STALE meta snapshot (lagged retirement): a job
    admitted into a recycled slot after the snapshot's dispatch must NOT be
    retired by it — the snapshot's frozen values belong to the previous
    occupant. Also checks the snapshot retires the finished occupant with
    the same values the fresh path produces."""
    from speaksense_tpu.runtime.slots import SlotPool, _StreamJob

    pool = SlotPool(engine, n_slots=1, t_mel=512, max_new=4, ring_width=4)
    tok = engine.tokenizer
    mel = _mel(engine, rng, 0.1)

    def job():
        return _StreamJob(mel=np.asarray(mel), prompt=list(tok.sot_sequence("en")))

    j1 = job()
    assert pool.admit_many([j1]) == 1
    # run j1 to its 4-token cap without retiring (ring_width 4 = one flush)
    pool.step(retire=False, k=4)
    snap = pool._last_meta
    assert snap is not None and snap[1] == pool.step_calls
    done = pool.retire_from(*snap)
    assert done == [j1] and j1.future.done()
    r1 = j1.future.result()
    assert r1["n_sampled"] <= 4

    # recycle the slot with a NEW job, then apply the OLD snapshot again:
    # the guard (admit_step >= dispatch_no) must keep j2 in flight even
    # though the stale meta shows the slot inactive
    j2 = job()
    assert pool.admit_many([j2]) == 1
    assert pool.retire_from(*snap) == []
    assert not j2.future.done()
    # fresh dispatch + fresh snapshot retires j2 normally, same values as j1
    # (same mel, same prompt, greedy)
    pool.step(retire=False, k=4)
    done2 = pool.retire_from(*pool._last_meta)
    assert done2 == [j2]
    r2 = j2.future.result()
    assert r2["n_sampled"] == r1["n_sampled"]
    np.testing.assert_array_equal(r1["tokens"], r2["tokens"])


def test_submit_audio_int16_matches_f32(engine, rng):
    """Wire-dtype admission: s16 PCM uploaded as-is and dequantized inside
    the admission program must produce exactly the tokens of the f32 path
    (the dequant is the same 1/32767 scaling the host applied before)."""
    server = StreamingDecodeServer(engine, n_slots=2, t_mel=512, max_new=12)
    try:
        pcm = (rng.standard_normal(512 * 160) * 3000).astype(np.int16)
        f32 = pcm.astype(np.float32) / 32767.0
        r16 = server.submit_audio(pcm, language="en").result(timeout=300)
        r32 = server.submit_audio(f32, language="en").result(timeout=300)
        keys = {k[4] for k in server.pool._admit_fns if k[2]}
        assert keys == {"<i2", "<f4"}, keys  # both wire dtypes compiled
        assert r16["n_sampled"] == r32["n_sampled"]
        np.testing.assert_array_equal(r16["tokens"], r32["tokens"])
        np.testing.assert_allclose(r16["sum_logprob"], r32["sum_logprob"],
                                   rtol=1e-5, atol=1e-5)
    finally:
        server.stop()


def test_submit_audio_int16_denoise_matches_f32(engine, rng):
    """Same parity with the device-denoise branch fused in (the host noise
    classifier must see the scaled f32 view so the branch choice matches)."""
    server = StreamingDecodeServer(engine, n_slots=2, t_mel=512, max_new=12)
    try:
        pcm = (rng.standard_normal(512 * 160) * 3000).astype(np.int16)
        f32 = pcm.astype(np.float32) / 32767.0
        r16 = server.submit_audio(pcm, language="en", denoise=True).result(timeout=300)
        r32 = server.submit_audio(f32, language="en", denoise=True).result(timeout=300)
        branches = {k[3] for k in server.pool._admit_fns if k[2]}
        assert len(branches) == 1, branches  # same classifier branch
        np.testing.assert_array_equal(r16["tokens"], r32["tokens"])
    finally:
        server.stop()


def test_admission_failure_does_not_kill_server(engine, rng):
    """A bad submission (wrong mel shape) must fail ITS future and leave the
    server thread + other streams healthy (round-2 review: admission ran
    unguarded in the server loop; one bad job hung every future forever)."""
    server = StreamingDecodeServer(engine, n_slots=2, max_new=8)
    try:
        bad = server.submit(np.zeros((7, 3), np.float32))  # wrong shape
        with pytest.raises(Exception):
            bad.result(timeout=120)
        assert server._thread.is_alive()
        good = server.submit(_mel(engine, rng))
        r = good.result(timeout=300)   # server still serves
        assert 0 <= r["n_sampled"] <= 8
        assert sorted(server.pool.free) == [0, 1]
    finally:
        server.stop()


def test_stop_resolves_stranded_futures(engine, rng):
    """stop() must fail queued/in-flight futures instead of stranding
    settlers that block on future.result() with no timeout."""
    server = StreamingDecodeServer(engine, n_slots=2, max_new=8)
    server._stop.set()            # freeze the loop before it can drain
    server._thread.join(timeout=10)
    fut = server.submit(_mel(engine, rng))   # lands in the dead queue
    server.stop()
    with pytest.raises(RuntimeError, match="slot server stopped"):
        fut.result(timeout=10)


def test_pool_reset_fails_jobs_and_rebuilds():
    """reset() fails registered jobs and rebuilds fresh device state."""
    import jax

    from speaksense_tpu.runtime.slots import SlotPool, _StreamJob

    params = init_params(DIMS, jax.random.PRNGKey(0))
    tok = Tokenizer.synthetic(DIMS.n_vocab)
    eng = WhisperEngine(params, DIMS, tok,
                        config=EngineConfig(compute_dtype="float32"))
    pool = SlotPool(eng, n_slots=2, t_mel=512, max_new=8)
    job = _StreamJob(np.zeros((512, DIMS.n_mels), np.float32),
                     prompt=list(tok.sot_sequence("en")))
    assert pool.admit_many([job]) == 1
    assert pool.n_active == 1
    pool.reset(RuntimeError("boom"))
    with pytest.raises(RuntimeError, match="boom"):
        job.future.result(timeout=10)
    assert pool.n_active == 0
    assert sorted(pool.free) == [0, 1]
    assert pool.state_healthy()


def test_unrecoverable_step_failure_kills_server_not_streams(engine, rng):
    """When the pool step fails AND reset cannot rebuild the state (e.g.
    allocation failure — observed: beam-pool OOM), the server must fail
    every queued/registered future and reject new submissions instead of
    letting the loop thread die with jobs unresolved (which deadlocked the
    whole gRPC server: settlers block on future.result() with no timeout)."""
    server = StreamingDecodeServer(engine, n_slots=2, max_new=8)
    try:
        def boom(*a, **k):
            raise RuntimeError("step boom")

        def reset_boom(*a, **k):
            raise RuntimeError("reset boom (oom)")

        server.pool.step = boom
        server.pool.reset = reset_boom
        fut = server.submit(_mel(engine, rng))
        with pytest.raises(RuntimeError):
            fut.result(timeout=120)
        server._thread.join(timeout=30)
        assert not server._thread.is_alive()
        assert server._dead is not None
        with pytest.raises(RuntimeError, match="slot server dead"):
            server.submit(_mel(engine, rng))
        with pytest.raises(RuntimeError, match="slot server dead"):
            server.submit_audio(np.zeros(16000, np.float32))
    finally:
        server.stop()


def test_conditioned_pipelining_trickle_parity(engine, rng):
    """VERDICT r2 item 8 parity criterion: when a conditioned stream is NOT
    backlogged (each chunk settles before the next is submitted), the
    pipelined submit/settle path must produce EXACTLY the sequential
    transcribe_with_state results — same text, same conditioning prompts."""
    from speaksense_tpu.asr import AsrParams

    chunks = [(rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
              for _ in range(3)]
    params = AsrParams(language="en", stream_mode=True)

    def run_sequential():
        engine.enable_slot_serving(n_slots=2, t_mel=512, max_new=12,
                                   max_prompt=64)
        try:
            state = engine.create_state()
            out = [engine.transcribe_with_state(state, c, params) for c in chunks]
            return out, list(state.context_tokens)
        finally:
            engine.disable_slot_serving()

    def run_pipelined_trickle():
        engine.enable_slot_serving(n_slots=2, t_mel=512, max_new=12,
                                   max_prompt=64)
        try:
            state = engine.create_state()
            out = []
            for c in chunks:
                pending = engine.submit_stream_chunk(state, c, params)
                assert pending is not None  # conditioned chunks now pipeline
                out.append(pending.settle())  # settle before next submit
            return out, list(state.context_tokens)
        finally:
            engine.disable_slot_serving()

    seq, seq_ctx = run_sequential()
    pipe, pipe_ctx = run_pipelined_trickle()
    assert [r.full_text for r in seq] == [r.full_text for r in pipe]
    assert seq_ctx == pipe_ctx


def test_conditioned_pipelining_snapshots_context(engine, rng):
    """Backlogged conditioned stream: chunk k+1 submitted before chunk k
    settles must carry the context SNAPSHOT from submit time (one-chunk
    lag), not mutate-under-read state."""
    from speaksense_tpu.asr import AsrParams

    engine.enable_slot_serving(n_slots=4, t_mel=512, max_new=12, max_prompt=64)
    try:
        server = engine._slot_server
        seen_contexts = []
        real_submit = server.submit_audio

        def spy(audio, language="en", task="transcribe", context=None,
                denoise=False):
            seen_contexts.append(list(context) if context else None)
            return real_submit(audio, language=language, task=task,
                               context=context, denoise=denoise)

        server.submit_audio = spy
        state = engine.create_state()
        state.context_tokens = [101, 102]
        params = AsrParams(language="en", stream_mode=True)
        a = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
        p1 = engine.submit_stream_chunk(state, a, params)
        p2 = engine.submit_stream_chunk(state, a, params)  # before p1 settles
        assert seen_contexts == [[101, 102], [101, 102]]  # snapshot, lagged
        p1.settle()
        p2.settle()
        # post-settle submits see the updated context (>= the old snapshot)
        p3 = engine.submit_stream_chunk(state, a, params)
        assert seen_contexts[2] is None or len(seen_contexts[2]) >= 2
        p3.settle()
    finally:
        engine.disable_slot_serving()


def test_mid_ring_admission_isolation(engine, rng):
    """SUB-FLUSH admission (VERDICT r2 item 3): a job admitted while the KV
    ring is partially filled (ring_fill>0) decodes EXACTLY as one admitted
    at a chunk boundary, and does not perturb the already-running slot —
    the previous occupant's pending ring rows are masked via the born
    register and absorbed into the padding hole at flush."""
    from speaksense_tpu.runtime.slots import SlotPool, _StreamJob

    def job(mel):
        return _StreamJob(mel=mel, prompt=list(engine.tokenizer.sot_sequence("en")))

    mel_a = _mel(engine, rng, 0.1)
    mel_b = _mel(engine, rng, 0.3)

    def run_to_done(pool, jobs_list, max_dispatch=80):
        results = {}
        for _ in range(max_dispatch):
            if not pool.jobs:
                break
            for j in pool.step(retire=True, k=4):
                results[id(j)] = j.future.result()
        return results

    # reference: both jobs admitted at ring boundaries
    ref = SlotPool(engine, n_slots=2, t_mel=512, max_new=12)
    ja, jb = job(mel_a), job(mel_b)
    assert ref.admit_many([ja]) == 1
    assert ref.admit_many([jb]) == 1
    run_to_done(ref, [ja, jb])
    ra, rb = ja.future.result(), jb.future.result()

    # mid-ring: admit A, advance 4 steps (ring dirty), admit B mid-chunk
    pool = SlotPool(engine, n_slots=2, t_mel=512, max_new=12)
    ja2, jb2 = job(mel_a), job(mel_b)
    assert pool.admit_many([ja2]) == 1
    pool.step(retire=False, k=4)
    assert pool.ring_fill == 4
    assert pool.admit_many([jb2]) == 1      # no refusal, no drain wait
    assert int(np.asarray(pool.state["born"])[jb2.slot]) == 4
    run_to_done(pool, [ja2, jb2])
    ra2, rb2 = ja2.future.result(), jb2.future.result()

    assert ra2["n_sampled"] == ra["n_sampled"]
    np.testing.assert_array_equal(ra2["tokens"][:ra["n_sampled"]],
                                  ra["tokens"][:ra["n_sampled"]])
    assert rb2["n_sampled"] == rb["n_sampled"]
    np.testing.assert_array_equal(rb2["tokens"][:rb["n_sampled"]],
                                  rb["tokens"][:rb["n_sampled"]])


def test_mid_ring_admission_beam(engine, rng):
    """Same sub-flush admission guarantee for the beam pool."""
    from speaksense_tpu.runtime.beam_slots import BeamSlotPool
    from speaksense_tpu.runtime.slots import _StreamJob

    mel_b = _mel(engine, rng, 0.3)

    def job(mel):
        return _StreamJob(mel=mel, prompt=list(engine.tokenizer.sot_sequence("en")))

    def drain(pool):
        out = []
        for _ in range(80):
            if not pool.jobs:
                break
            out += pool.step(retire=True, k=4)
        return out

    ref = BeamSlotPool(engine, n_slots=2, t_mel=512, max_new=12, beam_size=2)
    jb = job(mel_b)
    ref.admit_many([jb])
    drain(ref)
    rb = jb.future.result()

    pool = BeamSlotPool(engine, n_slots=2, t_mel=512, max_new=12, beam_size=2)
    ja2, jb2 = job(_mel(engine, rng, 0.1)), job(mel_b)
    pool.admit_many([ja2])
    pool.step(retire=False, k=4)
    assert pool.admit_many([jb2]) == 1
    drain(pool)
    rb2 = jb2.future.result()
    assert rb2["n_sampled"] == rb["n_sampled"]
    np.testing.assert_array_equal(rb2["tokens"][:rb["n_sampled"]],
                                  rb["tokens"][:rb["n_sampled"]])


def test_finish_flush_rides_the_slot_pool(engine, rng):
    """StreamSession.finish(): the end-of-stream tail flush prefers the slot
    pool (fresh-state semantics via state=None) over a separate window-
    batcher dispatch — when 64 streams end together the flushes continuous-
    batch with live chunks instead of paying 64/max_batch extra program
    dispatches during the pool drain."""
    import base64

    from speaksense_tpu.serving.stream import StreamSession

    engine.enable_slot_serving(n_slots=2, t_mel=512, max_new=8)
    try:
        pool = engine._slot_server.pool
        session = StreamSession(engine, language="en", denoise=False)
        # 5.5 s: ingest consumes one 5 s chunk (keeps the 0.5 s overlap),
        # leaving a 1 s sub-chunk tail for finish()
        pcm = (rng.standard_normal(16000 * 5 + 8000) * 1500).astype(np.int16)
        session.feed(base64.standard_b64encode(pcm.tobytes()))
        admits_before = pool.admit_calls

        def _no_batcher(*a, **k):
            raise AssertionError("finish used the window batcher")

        orig = engine.transcribe
        engine.transcribe = _no_batcher
        try:
            events = session.finish()
        finally:
            engine.transcribe = orig
        # success path: the tail decoded through the pool and the end:1
        # event was emitted (the window-batcher exception path returns [])
        assert events and events[-1].end == 1
        assert pool.admit_calls > admits_before
    finally:
        engine.disable_slot_serving()


def test_submit_stream_chunk_pad_to_bucket(engine, rng):
    """pad_to_bucket admits a sub-bucket chunk zero-padded to the pool's mel
    bucket (used by finish()); without the flag, sub-bucket chunks still
    decline; oversized chunks ride as split sub-windows regardless."""
    from speaksense_tpu.asr import AsrParams

    stream = AsrParams(language="en", stream_mode=True)
    engine.enable_slot_serving(n_slots=2, t_mel=1024, max_new=8)
    try:
        short = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
        # 3 s buckets to 512 != pool 1024: declined without the flag...
        assert engine.submit_stream_chunk(
            engine.create_state(), short, stream) is None
        # ...accepted padded with it
        pending = engine.submit_stream_chunk(
            engine.create_state(), short, stream, pad_to_bucket=True)
        assert pending is not None
        res = pending.settle()
        assert res.language == "en"
        # oversized (> pool bucket) rides as ceil-split concurrent pool
        # sub-windows (12 s against the 1024-frame / 10.24 s pool -> 2)
        long_audio = (rng.standard_normal(16000 * 12) * 0.1).astype(np.float32)
        pending_long = engine.submit_stream_chunk(
            engine.create_state(), long_audio, stream)
        assert pending_long is not None and len(pending_long.futures) == 2
        pending_long.settle()
    finally:
        engine.disable_slot_serving()


def test_all_jobs_at_budget_and_fast_retire(engine, rng):
    """Budget-exhaustion accounting: all_jobs_at_budget() flips exactly when
    total_steps has advanced max_new past every occupant's admit_tstep, and
    the newest meta then retires the whole pool — the server loop's fast
    path that avoids dispatching a pool of frozen rows."""
    from speaksense_tpu.runtime.slots import SlotPool, _StreamJob

    pool = SlotPool(engine, n_slots=2, t_mel=512, max_new=8, ring_width=4)
    tok = engine.tokenizer
    assert not pool.all_jobs_at_budget()  # empty pool: no fast path

    j1 = _StreamJob(mel=_mel(engine, rng, 0.1),
                    prompt=list(tok.sot_sequence("en")))
    assert pool.admit_many([j1]) == 1
    pool.step(retire=False, k=4)
    assert pool.total_steps == 4 and not pool.all_jobs_at_budget()

    # mid-flight admission: j2 joins 4 steps behind j1
    j2 = _StreamJob(mel=_mel(engine, rng, 0.3),
                    prompt=list(tok.sot_sequence("en")))
    assert pool.admit_many([j2]) == 1
    assert j2.admit_tstep == 4
    pool.step(retire=False, k=4)
    # j1 at its 8-token cap, j2 only 4 steps in: NOT all at budget
    assert pool.total_steps == 8 and not pool.all_jobs_at_budget()
    pool.step(retire=False, k=4)
    assert pool.all_jobs_at_budget()
    # the newest meta is final for BOTH: one retire empties the pool
    done = pool.retire_from(*pool._last_meta)
    assert sorted(id(j) for j in done) == sorted(id(j) for j in (j1, j2))
    assert pool.n_active == 0
    assert j1.future.result()["n_sampled"] <= 8
    assert j2.future.result()["n_sampled"] <= 8
    assert not pool.all_jobs_at_budget()  # empty again
