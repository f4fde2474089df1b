from .incremental import stream_build

__all__ = ["stream_build"]
