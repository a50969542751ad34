"""Oracle type-discipline lint (r8 verdict task 2).

Three oracle-type incident classes have cost driver rows across the
build: DECIMAL literals (r3), NULLS ordering (r5), and HUGEINT from
``SUM(BIGINT) OVER`` (r8, ``docs_pack_sequences``). The local parity
comparator normalizes dtypes so these slip through it; the driver's
comparator is stricter (pandas materializes HUGEINT/DECIMAL as
float64/object and the value-hash diverges on "3.0" vs "3").

This lint closes the class permanently: DuckDB ``DESCRIBE`` binds and
plans every ``oracle_sql()`` statement against the sf0.001 views
(without executing it) and we assert no output column materializes as
HUGEINT / UHUGEINT / DECIMAL — the types pandas cannot hold as int64.
Fix offenders with ``CAST(... AS BIGINT)`` / ``CAST(... AS DOUBLE)``
in the oracle (the engine side is typically already correct).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tests.oracle import duck_connection

SF = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")

ORACLES = entrymod.oracle_sql()

# Types that round-trip losslessly through the driver's pandas compare.
_BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_output_types(name, duck):
    rows = duck.execute(f"DESCRIBE {ORACLES[name]}").fetchall()
    bad = [(col, typ) for col, typ, *_ in rows
           if any(b in typ.upper() for b in _BANNED)]
    assert not bad, (
        f"oracle '{name}' emits driver-hash-unsafe column types {bad}; "
        f"CAST them to BIGINT/DOUBLE in the oracle SQL")
