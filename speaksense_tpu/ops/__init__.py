"""Hand-written / tuned Pallas TPU kernels that EARNED production status
(kernel policy: beat XLA's fused path at a production shape after a block
sweep, or be deleted — PERF.md). Currently: the tuned-block flash-attention
encoder wrapper (ops/flash.py)."""

from speaksense_tpu.ops.flash import (  # noqa: F401
    flash_attention_full,
    flash_block_sizes,
)
