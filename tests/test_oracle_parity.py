"""The correctness gate, mirrored locally: every queries() entry with
an oracle must hash-match DuckDB on the same parquet at sf0.001 (fast)
— the driver runs the same shape at sf0.01."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tests.oracle import compare, duck_connection

SF = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity(name, spark, duck):
    df = QUERIES[name](spark, SF)
    rep = compare(df, duck, ORACLES[name])
    assert rep["cols_match"], rep
    assert rep["rows_match"], {k: rep[k] for k in ("rows_spark", "rows_duck")}
    assert rep["values_match"], {k: rep.get(k) for k in
                                 ("first_diffs", "only_spark", "only_duck")}


def test_all_queries_run(spark):
    """Entries without an oracle still must run and return rows>=0."""
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        assert QUERIES[name](spark, SF).count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["userid", "itemid", "score"]
