from .watermark import incremental_batch, read_watermark, write_watermark

__all__ = ["incremental_batch", "read_watermark", "write_watermark"]
