"""Training-data-pipeline operators over `documents` / `embeddings` —
dedup (exact + near), similarity search, text analysis. Populated
incrementally; SQL-expressible ones carry DuckDB oracles, the rest get
rows-only checks.
"""

from __future__ import annotations
