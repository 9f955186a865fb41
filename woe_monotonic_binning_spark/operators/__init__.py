from . import (
    dedup,
    joins,
    multimodal,
    packing,
    sampling,
    similarity,
    text,
    tokenizer,
    windows,
)

__all__ = [
    "dedup",
    "joins",
    "multimodal",
    "packing",
    "sampling",
    "similarity",
    "text",
    "windows",
]
