"""Generated protobuf messages for the asr.Asr service.

asr_pb2.py is generated from asr.proto via `protoc --python_out` (see
regenerate.sh). The gRPC service wiring is hand-rolled in
serving/grpc_server.py with grpc generic handlers (no grpc_tools needed).
"""

from speaksense_tpu.serving.pb import asr_pb2  # noqa: F401
