#!/bin/sh
# Regenerate asr_pb2.py from asr.proto
cd "$(dirname "$0")" && protoc --python_out=. asr.proto
