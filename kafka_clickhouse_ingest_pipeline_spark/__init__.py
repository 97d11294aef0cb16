"""PySpark-native analytics engine with the capabilities of
kh3dr0n/kafka-clickhouse-ingest-pipeline (see README.md).

Public surface:
- build_session / load_table / register_views — session + catalog
- registry.REGISTRY — every query with its DuckDB oracle
- operators.*      — ingest, dedup, similarity, text, multimodal, skew, udfs
- streaming.*      — the end-to-end pipeline, stateful operators
"""

from .session import build_session
from .tables import TABLES, load_table, register_views

__version__ = "0.1.0"

__all__ = [
    "TABLES",
    "__version__",
    "build_session",
    "load_table",
    "register_views",
]
