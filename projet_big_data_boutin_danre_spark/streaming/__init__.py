from .sessionize import session_counts, sessionize_stateful
from .watermark import incremental_batch, read_watermark, write_watermark

__all__ = [
    "incremental_batch",
    "read_watermark",
    "session_counts",
    "sessionize_stateful",
    "write_watermark",
]
