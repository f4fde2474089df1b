from .incremental import stream_build, stream_sync_vectors

__all__ = ["stream_build", "stream_sync_vectors"]
