"""Sources & sinks: schema-enforced parquet readers, JDBC helpers,
idempotent writers, the JSON checkpoint state store, and the ES-shaped
bulk sink."""

from .readers import load_table, load_testdata, load_movies  # noqa: F401
from .state import JsonFileState  # noqa: F401
