from . import (
    cleaning,
    dedup,
    documents,
    ivf,
    multimodal,
    pagination,
    similarity,
    text,
    usage,
)

__all__ = [
    "cleaning",
    "dedup",
    "documents",
    "ivf",
    "multimodal",
    "pagination",
    "similarity",
    "text",
    "usage",
]
