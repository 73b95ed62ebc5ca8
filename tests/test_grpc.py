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
