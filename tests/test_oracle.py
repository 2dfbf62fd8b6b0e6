"""Run the full driver-contract registry against DuckDB at sf0.001 —
the same check the driver performs at sf0.01 (t2 gate)."""

import duckdb
import pytest

from tests.conftest import SF_SMALL
from tools.check_oracle import TABLES, canon_rows


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    return c


def _entries():
    from dgraph_spark.entry_queries import QUERIES

    return list(QUERIES.items())


@pytest.mark.parametrize("name,entry", _entries(), ids=[n for n, _ in _entries()])
def test_oracle(spark, con, name, entry):
    fn, sql = entry
    sdf = fn(spark, SF_SMALL)
    srows = [tuple(r) for r in sdf.collect()]
    if sql is None:
        assert srows is not None
        return
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows)
    assert canon_rows(sdf.columns, srows) == canon_rows(ocols, orows)
