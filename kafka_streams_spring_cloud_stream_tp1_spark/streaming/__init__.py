from .pipeline import CountStore, streaming_windowed_counts  # noqa: F401
