from .files import read_csv, read_jsonl  # noqa: F401
from .tables import TABLES, load_table, load_tables  # noqa: F401
