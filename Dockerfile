# SpeakSense-TPU serving image (TPU VM host).
#
# The reference ships CPU/CUDA/scratch dockerfiles (dockerfile.cpu,
# dockerfile.cuda, docker-compose.yml); the TPU equivalent targets a Cloud
# TPU VM base with libtpu. Build args let CI pin versions.

FROM python:3.12-slim

ARG JAX_VERSION=0.9.0

RUN apt-get update && apt-get install -y --no-install-recommends \
    ffmpeg g++ && rm -rf /var/lib/apt/lists/*

RUN pip install --no-cache-dir \
    "jax[tpu]==${JAX_VERSION}" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    grpcio protobuf aiohttp requests scipy numpy

WORKDIR /app
COPY speaksense_tpu ./speaksense_tpu
COPY examples ./examples
COPY script ./script

# model fetched at boot when ASR_MODEL_PATH is absent (mirrors the
# reference's dockerfile.cuda on-boot download)
ENV ASR_MODEL_PATH=/models/ggml-large-v3.bin \
    ASR_SQLITE_PATH=sqlite:///data/storage.db?mode=rwc \
    ASR_AUDIO_PATH=/data/audio/

EXPOSE 7200 7300

CMD ["sh", "-c", "\
  [ -f \"$ASR_MODEL_PATH\" ] || python script/download-ggml-model.py large-v3 /models; \
  python -m speaksense_tpu.main"]
