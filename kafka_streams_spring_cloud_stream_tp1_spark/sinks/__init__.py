from .batch import write_bucketed_table, write_partitioned  # noqa: F401
