from . import dedup, multimodal, sampling, similarity, textstats

__all__ = ["dedup", "multimodal", "sampling", "similarity", "textstats"]
