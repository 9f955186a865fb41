from . import (
    dedup,
    joins,
    multimodal,
    packing,
    sampling,
    similarity,
    text,
    tokenizer,
    urls,
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
    "tokenizer",
    "urls",
    "windows",
]
