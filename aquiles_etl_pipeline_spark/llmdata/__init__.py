from . import dedup, multimodal, sampling, similarity, textstats, urls

__all__ = ["dedup", "multimodal", "sampling", "similarity", "textstats", "urls"]
