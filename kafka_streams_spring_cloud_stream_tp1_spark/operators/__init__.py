from .core import (  # noqa: F401
    filter_min_value,
    latest_window_per_key,
    rekey_by_page,
    unwrap_windowed_key,
    windowed_page_counts,
)
