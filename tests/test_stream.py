"""Streaming session logic tests: process_text diff, time stitching, chunk
cadence — behavior captured from /root/reference/src/grpc/handlers/asr.rs
(SURVEY.md §7 calls for tests pinning this quirky logic)."""

import base64

import numpy as np

from speaksense_tpu.asr import TranscribeSegment
from speaksense_tpu.asr.fake import FakeAsrEngine
from speaksense_tpu.serving.stream import (
    CHUNK_BYTES, OVERLAP_BYTES, StreamContext, StreamSession, pcm16le_to_f32,
    process_text,
)


def seg(text, start=0.0, end=1.0):
    return TranscribeSegment(text=text, start=start, end=end)


class TestProcessText:
    def test_first_text_passes_through(self):
        assert process_text("hello", "", []) == "hello"

    def test_new_segment_not_in_last(self):
        out = process_text("whatever", "previous text", [seg("brand new")])
        assert out == "brand new"

    def test_prefix_growth_returns_addition(self):
        out = process_text("hello world again", "hello world", [seg("hello world again")])
        # "hello world again" segment not contained in last_text -> rule 2 wins
        assert out == "hello world again"
        # with the segment contained, the prefix rule applies
        out = process_text("hello world again", "hello world", [seg("hello world")])
        assert out == "again"

    def test_identical_returns_none(self):
        assert process_text("same text", "same text", [seg("same text")]) is None

    def test_length_ratio_resets(self):
        long = "a" * 50
        assert process_text(long, "abc", [seg("abc")]) == long

    def test_sentence_diff_extra_sentence(self):
        last = "第一句。"
        new = "第一句。第二句。"
        out = process_text(new, last, [seg("第一句。")])
        assert "第二句" in out

    def test_prefix_rule_wins_over_sentence_diff(self):
        # new startswith last -> rule 3 returns only the trimmed addition
        last = "hello there. how are"
        new = "hello there. how are you?"
        out = process_text(new, last, [seg(last)])
        assert out == "you?"

    def test_sentence_diff_last_sentence_changed(self):
        # not a prefix, similar length, same sentence count, last differs
        last = "hello there. how are hi"
        new = "hello there. how are you?"
        out = process_text(new, last, [seg(last)])
        assert out == "how are you?"


class TestStreamContext:
    def test_block_base_and_monotonic_clamp(self):
        ctx = StreamContext()
        s, e = ctx.calculate_segment_time(0.5, 2.0)
        assert (s, e) == (500, 2000)
        # overlapping next segment gets clamped forward
        s2, e2 = ctx.calculate_segment_time(1.0, 2.5)
        assert s2 == 2000  # clamped to last end
        assert e2 == 3500  # shifted by the same diff
        ctx.next_block()
        s3, e3 = ctx.calculate_segment_time(0.0, 1.0)
        assert s3 == 5000  # block base 5 s


def test_pcm16le_to_f32_scaling():
    pcm = np.asarray([0, 16384, -32767], np.int16).tobytes()
    x = pcm16le_to_f32(pcm)
    np.testing.assert_allclose(x, [0.0, 16384 / 32767, -1.0], atol=1e-6)
    # odd trailing byte dropped
    assert pcm16le_to_f32(pcm + b"\x00").size == 3


def test_stream_session_chunk_cadence():
    engine = FakeAsrEngine()
    session = StreamSession(engine, device_id="dev1", denoise=False, language="en")
    # 2.5 s of audio: below the 5 s chunk threshold -> no events yet
    half = base64.b64encode(np.zeros(40000, np.int16).tobytes())
    assert session.feed(half) == []
    assert len(session.buffer) == 80000
    # another 2.5 s crosses CHUNK_BYTES -> one chunk processed
    events = session.feed(half)
    assert len(engine.calls) == 1
    assert engine.calls[0].stream_mode
    # overlap tail kept
    assert len(session.buffer) == OVERLAP_BYTES
    for ev in events:
        assert ev.device_id == "dev1"
        assert ev.end == 0


def test_stream_session_finish_flushes():
    engine = FakeAsrEngine()
    session = StreamSession(engine, denoise=False, language="en")
    session.feed(base64.b64encode((np.ones(8000) * 1000).astype(np.int16).tobytes()))
    events = session.finish()
    assert events[-1].end == 1
    assert session.buffer == bytearray()


def test_stream_session_bad_base64_ignored():
    engine = FakeAsrEngine()
    session = StreamSession(engine, denoise=False)
    assert session.feed(b"!!!not-base64!!!") == []
    assert len(session.buffer) == 0


# ---------------------------------------------------------- format gating

def _b64(data: bytes) -> bytes:
    import base64

    return base64.standard_b64encode(data)


def _wav_bytes(seconds=0.5, rate=16000, channels=1) -> bytes:
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    n = int(rate * seconds)
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.zeros(n * channels, "<i2").tobytes())
    return buf.getvalue()


def test_wav_stream_header_stripped():
    from speaksense_tpu.asr.fake import FakeAsrEngine
    from speaksense_tpu.serving.stream import StreamSession

    s = StreamSession(FakeAsrEngine(), language="en", denoise=False,
                      audio_format="WAV")
    s.feed(_b64(_wav_bytes(0.5)))
    # header gone: buffer holds exactly the PCM payload
    assert len(s.buffer) == int(16000 * 0.5) * 2


def test_wav_stream_wrong_rate_rejected():
    import pytest

    from speaksense_tpu.asr.fake import FakeAsrEngine
    from speaksense_tpu.serving.stream import (
        StreamSession, UnsupportedStreamFormat,
    )

    s = StreamSession(FakeAsrEngine(), language="en", denoise=False,
                      audio_format="WAV")
    with pytest.raises(UnsupportedStreamFormat, match="16 kHz mono"):
        s.feed(_b64(_wav_bytes(0.5, rate=44100, channels=2)))


def test_encoded_container_rejected():
    import pytest

    from speaksense_tpu.asr.fake import FakeAsrEngine
    from speaksense_tpu.serving.stream import (
        StreamSession, UnsupportedStreamFormat,
    )

    s = StreamSession(FakeAsrEngine(), language="en", denoise=False,
                      audio_format="OGG")
    with pytest.raises(UnsupportedStreamFormat):
        s.feed(_b64(b"OggS" + b"\x00" * 100))


def test_mistagged_pcm_passes_through():
    """The reference example client tags AAC but sends PCM
    (asr_client.rs:176) — bytes that don't look like the tagged container
    must flow as PCM for wire compat."""
    import numpy as np

    from speaksense_tpu.asr.fake import FakeAsrEngine
    from speaksense_tpu.serving.stream import StreamSession

    pcm = (np.ones(16000, "<i2") * 1000).tobytes()
    s = StreamSession(FakeAsrEngine(), language="en", denoise=False,
                      audio_format="AAC")
    s.feed(_b64(pcm))
    assert len(s.buffer) == len(pcm)


class _PipelinedFake(FakeAsrEngine):
    """Fake engine with a NONBLOCKING submit path (the WhisperEngine slot-pool
    contract, asr/engine.py submit_stream_chunk): each chunk decodes on its
    own worker thread, and the FIRST submitted chunk completes LAST — settle
    order must still produce in-order stitching."""

    def __init__(self):
        super().__init__()
        self.submitted: list[float] = []

    def submit_stream_chunk(self, state, audio, params):
        import threading
        import time as _time
        from concurrent.futures import Future

        delay = 0.05 if not self.submitted else 0.0  # first = slowest
        self.submitted.append(_time.monotonic())
        fut: Future = Future()

        def run():
            _time.sleep(delay)
            fut.set_result(self.transcribe_with_state(state, audio, params))

        threading.Thread(target=run, daemon=True).start()

        class _Handle:
            def settle(self_h):
                return fut.result(timeout=10)

        return _Handle()


def test_pipelined_session_matches_sequential():
    """ingest()/settle() pipelining (out-of-order completion!) must emit the
    exact events the sequential feed path emits."""
    rng = np.random.default_rng(7)
    # 3 full chunks of DISTINCT audio in one payload (hash-derived fake text)
    n = (3 * (CHUNK_BYTES - OVERLAP_BYTES) + OVERLAP_BYTES) // 2
    payload = base64.b64encode(
        (rng.standard_normal(n) * 1000).astype(np.int16).tobytes())

    seq = StreamSession(FakeAsrEngine(), device_id="d", denoise=False,
                        language="en")
    want = [(e.text, e.segments) for e in seq.feed(payload)]

    pipe_engine = _PipelinedFake()
    pipe = StreamSession(pipe_engine, device_id="d", denoise=False,
                         language="en")
    pendings = pipe.ingest(payload)
    assert len(pendings) == 3 and len(pipe_engine.submitted) == 3, \
        "all chunks must be submitted before any settle"
    got = [(e.text, e.segments) for p in pendings for e in pipe.settle(p)]
    assert got == want


def test_feed_equals_ingest_plus_settle():
    """feed() is exactly ingest()+settle() for engines without a
    nonblocking path (inline decode preserves sequential semantics)."""
    rng = np.random.default_rng(3)
    n = CHUNK_BYTES  # two chunks' worth of bytes (s16)
    payload = base64.b64encode(
        (rng.standard_normal(n) * 1000).astype(np.int16).tobytes())
    a = StreamSession(FakeAsrEngine(), denoise=False, language="en")
    b = StreamSession(FakeAsrEngine(), denoise=False, language="en")
    ev_feed = a.feed(payload)
    ev_split = [e for p in b.ingest(payload) for e in b.settle(p)]
    assert [(e.text, e.segments) for e in ev_feed] == \
        [(e.text, e.segments) for e in ev_split]
    assert a.buffer == b.buffer and a.ctx.block_index == b.ctx.block_index


class _FailOnceFake(FakeAsrEngine):
    """Nonblocking engine whose SECOND submitted chunk fails at settle time
    (decode error surfaces through the pending handle, not at submission)."""

    def __init__(self):
        super().__init__()
        self.n = 0

    def submit_stream_chunk(self, state, audio, params):
        self.n += 1
        fail = self.n == 2
        outer = self

        class _Handle:
            def settle(self_h):
                if fail:
                    raise RuntimeError("decode blew up")
                return outer.transcribe_with_state(state, audio, params)

        return _Handle()


def test_settle_error_does_not_shift_later_timestamps():
    """A chunk whose decode fails must emit nothing but still advance the
    block clock: chunk 3's absolute timestamps are identical to what they'd
    be had chunk 2 succeeded (reference behavior: errors are logged, the
    block index still advances — handlers/asr.rs error arm)."""
    rng = np.random.default_rng(11)
    n = (3 * (CHUNK_BYTES - OVERLAP_BYTES) + OVERLAP_BYTES) // 2
    payload = base64.b64encode(
        (rng.standard_normal(n) * 1000).astype(np.int16).tobytes())

    ok = StreamSession(FakeAsrEngine(), denoise=False, language="en")
    want = [(e.text, e.segments) for e in ok.feed(payload)]
    assert len(want) == 3

    s = StreamSession(_FailOnceFake(), denoise=False, language="en")
    got = [(e.text, e.segments) for e in s.feed(payload)]
    # chunk 2 emitted nothing; chunks 1 and 3 match the clean run exactly
    # (same text, same absolute ms — the failed block still ticked the clock)
    assert got == [want[0], want[2]]
    assert s.ctx.block_index == 3


def test_wav_header_split_across_packets():
    """A LIST/INFO chunk can push fmt/data past the first inbound packet;
    the session must keep buffering instead of rejecting the stream as
    malformed (round-2 review finding)."""
    from speaksense_tpu.asr.fake import FakeAsrEngine
    from speaksense_tpu.serving.stream import StreamSession

    wav = bytearray(_wav_bytes(0.5))
    # splice a 100-byte LIST chunk right after "RIFF....WAVE"
    list_chunk = b"LIST" + (100).to_bytes(4, "little") + b"INFO" + b"\0" * 96
    wav = bytes(wav[:12]) + list_chunk + bytes(wav[12:])

    s = StreamSession(FakeAsrEngine(), language="en", denoise=False,
                      audio_format="WAV")
    # first packet ends mid-LIST: >44 bytes buffered but header unresolved
    assert s.feed(_b64(wav[:64])) == []
    assert not s._format_checked
    s.feed(_b64(wav[64:]))
    assert s._format_checked
    assert len(s.buffer) == int(16000 * 0.5) * 2  # payload only


def test_wav_header_truly_malformed_rejected():
    import pytest

    from speaksense_tpu.asr.fake import FakeAsrEngine
    from speaksense_tpu.serving.stream import (
        StreamSession, UnsupportedStreamFormat,
    )

    # RIFF/WAVE followed by one absurd chunk whose declared size swallows
    # >64 KiB: unresolvable header must reject, not buffer forever
    bad = (b"RIFF" + (10**6).to_bytes(4, "little") + b"WAVE"
           + b"JUNK" + (10**6).to_bytes(4, "little") + b"\0" * (70 * 1024))
    s = StreamSession(FakeAsrEngine(), language="en", denoise=False,
                      audio_format="WAV")
    with pytest.raises(UnsupportedStreamFormat, match="malformed"):
        s.feed(_b64(bad))
