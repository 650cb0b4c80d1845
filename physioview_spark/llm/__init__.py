from physioview_spark.llm._cache import pinned_frames
from physioview_spark.llm._cache import release_pinned as \
    release_cached_frames

__all__ = ["release_cached_frames", "pinned_frames"]
