from . import dedup, multimodal, similarity, text, windows

__all__ = ["dedup", "multimodal", "similarity", "text", "windows"]
