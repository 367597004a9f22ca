from .dedup import read_deduped, streaming_dedup_stream
from .incremental import incremental_index_stream

__all__ = ["incremental_index_stream", "streaming_dedup_stream", "read_deduped"]
