import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from blueflood_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=8)
    try:
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # newer Sparks read TIMESTAMP(NANOS) natively; _t() normalizes
    yield s
