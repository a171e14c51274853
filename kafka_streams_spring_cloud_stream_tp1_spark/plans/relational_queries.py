"""North-star relational surface (SURVEY.md §2.2 'absent' rows) over the
TPC-H-ish fixtures — joins, aggregations, window functions, sorts, set
ops, scalar function coverage. Populated incrementally; every entry is
oracle-checked.
"""

from __future__ import annotations
