"""gRPC streaming API tests: real grpc.aio server + client over localhost
with the fake engine (the reference's only gRPC test needs live etcd + a
3 GB model and hangs by construction — SURVEY.md §4)."""

import asyncio
import base64

import numpy as np
import pytest

import grpc

from speaksense_tpu.asr.fake import FakeAsrEngine
from speaksense_tpu.serving.grpc_server import SERVICE_PATH, GrpcServer
from speaksense_tpu.serving.pb import asr_pb2


def _pcm_b64(seconds: float, value: int = 1000) -> bytes:
    pcm = (np.ones(int(16000 * seconds)) * value).astype(np.int16).tobytes()
    return base64.b64encode(pcm)


async def _run_stream(requests):
    engine = FakeAsrEngine()
    server = GrpcServer(engine, port=0, registry=None, language="en", denoise=False)
    await server.start()
    try:
        async with grpc.aio.insecure_channel(f"127.0.0.1:{server.port}") as channel:
            call = channel.stream_stream(
                SERVICE_PATH,
                request_serializer=asr_pb2.TranscribeRequest.SerializeToString,
                response_deserializer=asr_pb2.TranscribeResponse.FromString,
            )(iter(requests))
            return [r async for r in call]
    finally:
        await server.stop(grace=0.1)


def test_transcribe_stream_end_to_end():
    requests = [
        asr_pb2.TranscribeRequest(type=asr_pb2.PCM, end=0, audio=_pcm_b64(3.0),
                                  device_id="dev-42"),
        asr_pb2.TranscribeRequest(type=asr_pb2.PCM, end=0, audio=_pcm_b64(3.0)),
        asr_pb2.TranscribeRequest(type=asr_pb2.PCM, end=1, audio=_pcm_b64(1.0)),
    ]
    responses = asyncio.run(_run_stream(requests))
    assert responses, "expected streamed responses"
    final = responses[-1]
    assert final.end == 1
    assert final.device_id == "dev-42"
    # intermediate responses carry newly recognized text + ms timestamps
    mid = [r for r in responses if r.end == 0]
    assert mid
    for r in mid:
        assert r.text.decode("utf-8")
        for s in r.segments:
            assert 0 <= s.start <= s.end


def test_stream_without_final_flag_closes_cleanly():
    requests = [
        asr_pb2.TranscribeRequest(type=asr_pb2.PCM, end=0, audio=_pcm_b64(0.5)),
    ]
    responses = asyncio.run(_run_stream(requests))
    # below chunk threshold and never finalized: no responses, clean close
    assert responses == []


def test_empty_audio_final():
    requests = [asr_pb2.TranscribeRequest(type=asr_pb2.PCM, end=1, audio=b"")]
    responses = asyncio.run(_run_stream(requests))
    assert len(responses) == 1
    assert responses[0].end == 1


def test_concurrent_streams_through_slot_pool():
    """Load/drain test (SURVEY §5 failure-detection parity): several
    concurrent gRPC streams share the token-level slot pool (fewer slots
    than streams), every stream gets its final end=1 response, and the
    server + pool drain cleanly afterwards."""
    import jax

    from speaksense_tpu.asr.engine import WhisperEngine
    from speaksense_tpu.config import EngineConfig
    from speaksense_tpu.models.whisper import WhisperDims, init_params
    from speaksense_tpu.models.tokenizer import Tokenizer

    dims = WhisperDims(
        n_mels=80, n_vocab=51865, n_audio_ctx=1500, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
        n_text_head=4, n_text_layer=2)
    engine = WhisperEngine(init_params(dims, jax.random.PRNGKey(0)), dims,
                           Tokenizer.synthetic(dims.n_vocab),
                           config=EngineConfig(compute_dtype="float32",
                                               compression_ratio_thold=1e9,
                                               logprob_thold=-1e9,
                                               entropy_thold=-1.0))
    engine.enable_slot_serving(n_slots=2, t_mel=512, max_new=8)

    rng = np.random.default_rng(0)

    def _noise_b64(seconds):
        pcm = (rng.standard_normal(int(16000 * seconds)) * 500).astype(np.int16)
        return base64.b64encode(pcm.tobytes())

    async def run_all(n_streams):
        server = GrpcServer(engine, port=0, registry=None, language="en",
                            denoise=False)
        await server.start()
        try:
            async with grpc.aio.insecure_channel(f"127.0.0.1:{server.port}") as ch:
                call_factory = ch.stream_stream(
                    SERVICE_PATH,
                    request_serializer=asr_pb2.TranscribeRequest.SerializeToString,
                    response_deserializer=asr_pb2.TranscribeResponse.FromString,
                )

                async def one(i):
                    reqs = [
                        asr_pb2.TranscribeRequest(type=asr_pb2.PCM, end=0,
                                                  audio=_noise_b64(5.2),
                                                  device_id=f"dev-{i}"),
                        asr_pb2.TranscribeRequest(type=asr_pb2.PCM, end=1,
                                                  audio=_noise_b64(1.0)),
                    ]
                    return [r async for r in call_factory(iter(reqs))]

                return await asyncio.gather(*(one(i) for i in range(n_streams)))
        finally:
            await server.stop(grace=0.1)

    try:
        results = asyncio.run(run_all(4))
        assert len(results) == 4
        for i, responses in enumerate(results):
            assert responses, f"stream {i} got no responses"
            assert responses[-1].end == 1
        pool = engine._slot_server.pool
        assert pool.n_active == 0            # drained
        assert sorted(pool.free) == [0, 1]   # slots recycled
    finally:
        engine.disable_slot_serving()


def test_grpc_stream_uses_config_beam():
    """A gRPC stream against an engine configured with beam_size decodes
    through transcribe_window_beam (VERDICT r1 item 1: beam must be
    reachable from the server, not only from tests)."""
    import jax

    from speaksense_tpu.asr.engine import WhisperEngine
    from speaksense_tpu.config import EngineConfig
    from speaksense_tpu.models.tokenizer import Tokenizer
    from speaksense_tpu.models.whisper import WhisperDims, init_params

    dims = WhisperDims(
        n_mels=80, n_vocab=51865, n_audio_ctx=1500, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
        n_text_head=4, n_text_layer=2)
    cfg = EngineConfig(compute_dtype="float32", beam_size=2, logprob_thold=-1e9,
                       entropy_thold=-1.0)
    engine = WhisperEngine(init_params(dims, jax.random.PRNGKey(0)), dims,
                           Tokenizer.synthetic(dims.n_vocab), config=cfg)

    async def run():
        server = GrpcServer(engine, port=0, registry=None, language="en",
                            denoise=False)
        await server.start()
        try:
            requests = [
                asr_pb2.TranscribeRequest(type=asr_pb2.PCM, end=0,
                                          audio=_pcm_b64(5.0)),
                asr_pb2.TranscribeRequest(type=asr_pb2.PCM, end=1,
                                          audio=_pcm_b64(0.5)),
            ]
            async with grpc.aio.insecure_channel(f"127.0.0.1:{server.port}") as ch:
                call = ch.stream_stream(
                    SERVICE_PATH,
                    request_serializer=asr_pb2.TranscribeRequest.SerializeToString,
                    response_deserializer=asr_pb2.TranscribeResponse.FromString,
                )(iter(requests))
                return [r async for r in call]
        finally:
            await server.stop(grace=0.1)

    responses = asyncio.run(run())
    assert responses and responses[-1].end == 1
    beam_keys = [k for k in engine._jit_cache if k[0] == "beam"]
    assert beam_keys, "gRPC stream decode did not route through beam search"


def test_backlogged_stream_pipelines_through_slot_pool():
    """Session-level pipelining: ONE message carrying several chunks of audio
    keeps multiple decodes in flight in the slot pool (the handler's ingest
    task submits ahead of settle), and responses still arrive in chunk
    order with monotonic timestamps."""
    import jax

    from speaksense_tpu.asr.engine import WhisperEngine
    from speaksense_tpu.config import EngineConfig
    from speaksense_tpu.models.tokenizer import Tokenizer
    from speaksense_tpu.models.whisper import WhisperDims, init_params

    dims = WhisperDims(
        n_mels=80, n_vocab=51865, n_audio_ctx=1500, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
        n_text_head=4, n_text_layer=2)
    engine = WhisperEngine(init_params(dims, jax.random.PRNGKey(0)), dims,
                           Tokenizer.synthetic(dims.n_vocab),
                           config=EngineConfig(compute_dtype="float32",
                                               compression_ratio_thold=1e9,
                                               logprob_thold=-1e9,
                                               entropy_thold=-1.0))
    engine.enable_slot_serving(n_slots=2, t_mel=512, max_new=8)

    rng = np.random.default_rng(1)
    # 3 chunks in one payload: 3*CHUNK - 2*OVERLAP bytes of s16 PCM
    from speaksense_tpu.serving.stream import CHUNK_BYTES, OVERLAP_BYTES

    n = (3 * CHUNK_BYTES - 2 * OVERLAP_BYTES) // 2
    payload = base64.b64encode(
        (rng.standard_normal(n) * 500).astype(np.int16).tobytes())

    async def run():
        server = GrpcServer(engine, port=0, registry=None, language="en",
                            denoise=False)
        await server.start()
        try:
            requests = [
                asr_pb2.TranscribeRequest(type=asr_pb2.PCM, end=0, audio=payload),
                asr_pb2.TranscribeRequest(type=asr_pb2.PCM, end=1, audio=b""),
            ]
            async with grpc.aio.insecure_channel(f"127.0.0.1:{server.port}") as ch:
                call = ch.stream_stream(
                    SERVICE_PATH,
                    request_serializer=asr_pb2.TranscribeRequest.SerializeToString,
                    response_deserializer=asr_pb2.TranscribeResponse.FromString,
                )(iter(requests))
                return [r async for r in call]
        finally:
            await server.stop(grace=0.1)

    try:
        responses = asyncio.run(run())
        assert responses and responses[-1].end == 1
        mids = [r for r in responses if r.end == 0]
        # in-order stitching: segment times are monotonically non-decreasing
        starts = [s.start for r in mids for s in r.segments]
        assert starts == sorted(starts)
        pool = engine._slot_server.pool
        assert pool.n_active == 0
        assert sorted(pool.free) == [0, 1]
    finally:
        engine.disable_slot_serving()


def _make_auth(tmp_path):
    from speaksense_tpu.auth import Auth
    from speaksense_tpu.storage.sqlite import SqliteKeyStorage

    ks = SqliteKeyStorage(tmp_path / "keys.sqlite")
    auth = Auth(ks, ks)
    admin = auth.initialize_admin_key()
    return auth, admin.key, ks


async def _run_stream_authed(requests, auth=None, require_auth=False,
                             metadata=None):
    engine = FakeAsrEngine()
    server = GrpcServer(engine, port=0, registry=None, language="en",
                        denoise=False, auth=auth, require_auth=require_auth)
    await server.start()
    try:
        async with grpc.aio.insecure_channel(f"127.0.0.1:{server.port}") as channel:
            call = channel.stream_stream(
                SERVICE_PATH,
                request_serializer=asr_pb2.TranscribeRequest.SerializeToString,
                response_deserializer=asr_pb2.TranscribeResponse.FromString,
            )(iter(requests), metadata=metadata)
            return [r async for r in call]
    finally:
        await server.stop(grace=0.1)


def test_grpc_authenticated_stream_meters_usage(tmp_path):
    """VERDICT r2 item 9: bearer auth on gRPC streams, checked against the
    SAME key store as REST; an authenticated stream's served work advances
    the key's total_tokens/total_audio_seconds usage counters."""
    auth, admin_key, ks = _make_auth(tmp_path)
    requests = [
        asr_pb2.TranscribeRequest(type=asr_pb2.PCM, end=0, audio=_pcm_b64(6.0)),
        asr_pb2.TranscribeRequest(type=asr_pb2.PCM, end=1, audio=_pcm_b64(1.0)),
    ]
    responses = asyncio.run(_run_stream_authed(
        requests, auth=auth,
        metadata=(("authorization", f"Bearer {admin_key}"),)))
    assert responses and responses[-1].end == 1
    stats = auth.get_key_stats(admin_key)
    # per-chunk accounting (VERDICT r3 item 7, matching REST's per-request
    # semantics): one verify at stream open + one per settled decode chunk
    # (6 s + 1 s sent = exactly one full 5 s chunk; the tail flush is not a
    # chunk) = 2
    assert stats.total_requests == 2
    assert stats.total_tokens > 0             # settled chunks metered
    # exact: 6 s + 1 s sent = one chunk (5 - 0.5 s overlap consumed) + the
    # 2.5 s tail flush — overlap regions are billed once, not per chunk
    assert stats.total_audio_seconds == pytest.approx(7.0, abs=0.05)
    ks.close()


def test_grpc_invalid_key_rejected(tmp_path):
    auth, _, ks = _make_auth(tmp_path)
    requests = [asr_pb2.TranscribeRequest(type=asr_pb2.PCM, end=1,
                                          audio=_pcm_b64(1.0))]
    # one retry on transport-level UNAVAILABLE: under heavy host load the
    # fresh loopback server occasionally refuses the first connect, which
    # is not the auth outcome this test pins
    for attempt in range(2):
        with pytest.raises(grpc.aio.AioRpcError) as ei:
            asyncio.run(_run_stream_authed(
                requests, auth=auth,
                metadata=(("authorization", "Bearer key-nope"),)))
        if (ei.value.code() != grpc.StatusCode.UNAVAILABLE) or attempt:
            break
    assert ei.value.code() == grpc.StatusCode.UNAUTHENTICATED
    ks.close()


def test_grpc_keyless_stream_allowed_in_optional_mode(tmp_path):
    """Wire compat: with auth attached but require_auth=False, a keyless
    stream still serves (the reference's gRPC door is unauthenticated)."""
    auth, admin_key, ks = _make_auth(tmp_path)
    requests = [asr_pb2.TranscribeRequest(type=asr_pb2.PCM, end=1,
                                          audio=_pcm_b64(1.0))]
    responses = asyncio.run(_run_stream_authed(requests, auth=auth))
    assert responses and responses[-1].end == 1
    assert auth.get_key_stats(admin_key).total_requests == 0  # not metered
    ks.close()


def test_grpc_required_mode_rejects_keyless(tmp_path):
    auth, _, ks = _make_auth(tmp_path)
    requests = [asr_pb2.TranscribeRequest(type=asr_pb2.PCM, end=1,
                                          audio=_pcm_b64(1.0))]
    with pytest.raises(grpc.aio.AioRpcError) as ei:
        asyncio.run(_run_stream_authed(requests, auth=auth, require_auth=True))
    assert ei.value.code() == grpc.StatusCode.UNAUTHENTICATED
    ks.close()


def test_grpc_key_revoked_mid_stream_terminates(tmp_path):
    """VERDICT r3 item 7: a key revoked while a stream is live terminates
    the stream with UNAUTHENTICATED at the next chunk's auth recheck —
    revocation is no longer only an open-time decision
    (/root/reference/src/auth/service.rs:41-90 re-verifies every request)."""
    auth, admin_key, ks = _make_auth(tmp_path)
    engine = FakeAsrEngine()
    server = GrpcServer(engine, port=0, registry=None, language="en",
                        denoise=False, auth=auth)

    async def run():
        await server.start()
        try:
            async with grpc.aio.insecure_channel(f"127.0.0.1:{server.port}") as ch:
                got_first = asyncio.Event()

                async def gen():
                    yield asr_pb2.TranscribeRequest(
                        type=asr_pb2.PCM, end=0, audio=_pcm_b64(5.5))
                    # wait until chunk 1's response arrived, then revoke
                    await asyncio.wait_for(got_first.wait(), 10)
                    auth.revoke_api_key(admin_key)
                    yield asr_pb2.TranscribeRequest(
                        type=asr_pb2.PCM, end=0, audio=_pcm_b64(5.5))
                    yield asr_pb2.TranscribeRequest(
                        type=asr_pb2.PCM, end=1, audio=b"")

                call = ch.stream_stream(
                    SERVICE_PATH,
                    request_serializer=asr_pb2.TranscribeRequest.SerializeToString,
                    response_deserializer=asr_pb2.TranscribeResponse.FromString,
                )(gen(), metadata=(("authorization", f"Bearer {admin_key}"),))
                got = []
                async for resp in call:
                    got.append(resp)
                    got_first.set()
                return got
        finally:
            await server.stop(grace=0.1)

    with pytest.raises(grpc.aio.AioRpcError) as ei:
        asyncio.run(run())
    assert ei.value.code() == grpc.StatusCode.UNAUTHENTICATED
    assert "suspended" in (ei.value.details() or "").lower()
    ks.close()


def test_grpc_rate_limit_charged_per_chunk(tmp_path):
    """VERDICT r3 weak #7: the per-minute limiter charges per decode chunk
    (like REST charges per request), not once per stream — a stream whose
    served chunks exceed the key's budget terminates RESOURCE_EXHAUSTED."""
    from speaksense_tpu.auth.types import Permission, RateLimit

    auth, _, ks = _make_auth(tmp_path)
    key = auth.create_api_key(
        "tiny-budget", [Permission.TRANSCRIBE],
        RateLimit(requests_per_minute=2, requests_per_hour=10,
                  requests_per_day=10)).key
    # open-time verify charges 1, chunk 1 charges 2, chunk 2 trips the limit
    requests = [
        asr_pb2.TranscribeRequest(type=asr_pb2.PCM, end=0, audio=_pcm_b64(5.5)),
        asr_pb2.TranscribeRequest(type=asr_pb2.PCM, end=0, audio=_pcm_b64(5.5)),
        asr_pb2.TranscribeRequest(type=asr_pb2.PCM, end=1, audio=b""),
    ]
    with pytest.raises(grpc.aio.AioRpcError) as ei:
        asyncio.run(_run_stream_authed(
            requests, auth=auth,
            metadata=(("authorization", f"Bearer {key}"),)))
    assert ei.value.code() == grpc.StatusCode.RESOURCE_EXHAUSTED
    ks.close()
