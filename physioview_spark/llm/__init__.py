from physioview_spark.cache import pinned_frames
from physioview_spark.cache import release_pinned as \
    release_cached_frames

__all__ = ["release_cached_frames", "pinned_frames"]
