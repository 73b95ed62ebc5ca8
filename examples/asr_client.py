"""Streaming gRPC ASR client — Python port of the reference's de-facto
integration harness (/root/reference/examples/asr_client.rs): read a WAV,
downmix to mono, resample to 16 kHz, base64-encode s16le PCM, stream 32 KiB
chunks (final one flagged end=1), and print returned segments with ms
timestamps.

Usage:
  python examples/asr_client.py audio.wav --server 127.0.0.1:7300 --device-id dev1
"""

from __future__ import annotations

import argparse
import base64
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import grpc
import numpy as np

from speaksense_tpu.audio.io import read_wav
from speaksense_tpu.audio.dsp import convert_to_mono
from speaksense_tpu.audio.resample import resample
from speaksense_tpu.serving.pb import asr_pb2
from speaksense_tpu.serving.grpc_server import SERVICE_PATH

CHUNK_SIZE = 32 * 1024  # bytes per request (asr_client.rs:169-183)


def request_stream(path: str, device_id: str):
    samples, channels, rate = read_wav(path)
    mono = convert_to_mono(samples, channels)
    pcm16 = (np.clip(resample(mono, rate, 16000), -1, 1) * 32767.0).astype("<i2").tobytes()
    for off in range(0, len(pcm16), CHUNK_SIZE):
        chunk = pcm16[off : off + CHUNK_SIZE]
        is_last = off + CHUNK_SIZE >= len(pcm16)
        yield asr_pb2.TranscribeRequest(
            type=asr_pb2.PCM,
            end=1 if is_last else 0,
            audio=base64.b64encode(chunk),
            device_id=device_id,
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("file")
    ap.add_argument("--server", default="127.0.0.1:7300")
    ap.add_argument("--device-id", default="example-client")
    args = ap.parse_args()

    with grpc.insecure_channel(args.server) as channel:
        stub = channel.stream_stream(
            SERVICE_PATH,
            request_serializer=asr_pb2.TranscribeRequest.SerializeToString,
            response_deserializer=asr_pb2.TranscribeResponse.FromString,
        )
        for resp in stub(request_stream(args.file, args.device_id)):
            text = resp.text.decode("utf-8", errors="replace")
            for s in resp.segments:
                print(f"[{s.start:>8} ms --> {s.end:>8} ms] {s.text.decode('utf-8', errors='replace')}")
            if text:
                print(f">> {text}")
            if resp.end == 1:
                print("(final)")
                break


if __name__ == "__main__":
    main()
