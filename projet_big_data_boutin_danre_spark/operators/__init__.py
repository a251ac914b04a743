from . import (
    cleaning,
    dedup,
    documents,
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
    "multimodal",
    "pagination",
    "similarity",
    "text",
    "usage",
]
