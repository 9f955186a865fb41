from . import dedup, multimodal, packing, similarity, text, windows

__all__ = ["dedup", "multimodal", "packing", "similarity", "text", "windows"]
