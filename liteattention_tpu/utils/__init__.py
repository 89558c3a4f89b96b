"""Utilities: pad/unpad, benchmarking, generation/decoding."""

from liteattention_tpu.utils.padding import (
    index_first_axis,
    pad_input,
    unpad_input,
)

__all__ = ["pad_input", "unpad_input", "index_first_axis"]
