import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from djangoadmin_postgresql_2_elasticseach_spark.session import get_spark  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = os.path.join(TESTDATA, "sf0.001")
SF_CORRECT = os.path.join(TESTDATA, "sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()


def register_views(con, sf_dir: str) -> None:
    """Register the testdata parquet tables as DuckDB views, mirroring the
    driver harness."""
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )


# True when the default metastore is the POSIX one (atomic rename).
# SPARK_GRAFT_METASTORE=norename (the `make test-norename` gate) swaps
# in the object-store semantics profile, under which a handful of tests
# that pin the POSIX rename-swap PHYSICAL layout are skipped — their
# generation-form equivalents are pinned in test_metastore_norename.py.
import os as _os

POSIX_METASTORE = (
    _os.environ.get("SPARK_GRAFT_METASTORE", "").lower() != "norename"
)
