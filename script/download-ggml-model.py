#!/usr/bin/env python3
"""Fetch whisper ggml checkpoints (same model set as whisper.cpp's download
script, which the reference ships at script/download-ggml-model.sh).

Usage: python script/download-ggml-model.py large-v3 [dest_dir]
"""

import sys
import urllib.request
from pathlib import Path

MODELS = [
    "tiny", "tiny.en", "tiny-q5_1", "tiny.en-q5_1",
    "base", "base.en", "base-q5_1", "base.en-q5_1",
    "small", "small.en", "small.en-tdrz", "small-q5_1", "small.en-q5_1",
    "medium", "medium.en", "medium-q5_0", "medium.en-q5_0",
    "large-v1", "large-v2", "large-v2-q5_0",
    "large-v3", "large-v3-q5_0", "large-v3-turbo", "large-v3-turbo-q5_0",
]

BASE_URL = "https://huggingface.co/ggerganov/whisper.cpp/resolve/main"


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] not in MODELS:
        print(f"usage: {sys.argv[0]} <model> [dest_dir]\nmodels: {', '.join(MODELS)}")
        return 1
    model = sys.argv[1]
    dest = Path(sys.argv[2] if len(sys.argv) > 2 else "./models")
    dest.mkdir(parents=True, exist_ok=True)
    out = dest / f"ggml-{model}.bin"
    if out.exists():
        print(f"{out} already exists")
        return 0
    url = f"{BASE_URL}/ggml-{model}.bin"
    print(f"downloading {url} -> {out}")

    def hook(n, size, total):
        if total > 0 and n % 200 == 0:
            print(f"\r{n * size / total * 100:5.1f}%", end="", flush=True)

    urllib.request.urlretrieve(url, out, reporthook=hook)
    print(f"\ndone: {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
