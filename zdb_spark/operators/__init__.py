from . import dedup, multimodal, similarity, text

__all__ = ["dedup", "multimodal", "similarity", "text"]
