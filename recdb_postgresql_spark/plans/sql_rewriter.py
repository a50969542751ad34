"""SQL front door: the RECOMMEND clause and recommender DDL as SQL.

The reference extends the PostgreSQL grammar
(``gram.y:2444-2488`` for CREATE/DROP RECOMMENDER,
``gram.y:8874-8948`` for the RECOMMEND clause between FROM and WHERE).
Spark's parser cannot be extended from PySpark, so this module is a
pre-parser (the analog of ``transformRecommendClause``,
``parse_rec.c:56-112``): it lifts the RECOMMEND clause out of the
statement, computes the scored DataFrame through the engine, registers
it as a temp view under the events table's alias, and hands the
remaining, now-plain SQL to ``spark.sql``.

The reference splits the WHERE into user-only vs residual conjuncts at
parse time (TRUE-substitution, ``parse_rec.c:1109-1211``) so user
predicates prune *before* scoring. Here the scored view is lazy, so
Catalyst performs exactly that split automatically: predicates on the
user column push down through the score join into the model build.
``_split_where`` is retained for explicit DataFrame-API callers.

Supported statements (the whole reference regression suite,
``PostgreSQL/recdb_regression_test.sql``)::

    CREATE RECOMMENDER <name> ON <table>
        USERS FROM <ucol> ITEMS FROM <icol> EVENTS FROM <ecol>
        USING <method>
    DROP RECOMMENDER <name>
    SELECT <cols> FROM <table> [alias][, <table2> [alias2]...]
        RECOMMEND [a.]<icol> TO [a.]<ucol> ON [a.]<ecol> USING <method>
        [WHERE ...] [ORDER BY ...] [LIMIT k]
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from recdb_postgresql_spark.engine import RecEngine

_CREATE_RE = re.compile(
    r"^\s*CREATE\s+RECOMMENDER\s+(?P<name>\w+)\s+ON\s+(?P<table>\w+)\s+"
    r"USERS\s+FROM\s+(?P<ucol>\w+)\s+ITEMS\s+FROM\s+(?P<icol>\w+)\s+"
    r"EVENTS\s+FROM\s+(?P<ecol>\w+)\s+USING\s+(?P<method>\w+)\s*;?\s*$",
    re.IGNORECASE)
_DROP_RE = re.compile(r"^\s*DROP\s+RECOMMENDER\s+(?P<name>\w+)\s*;?\s*$",
                      re.IGNORECASE)
_REC_RE = re.compile(
    r"^\s*SELECT\s+(?P<select>.+?)\s+FROM\s+(?P<from>.+?)\s+"
    r"RECOMMEND\s+(?P<icol>[\w.]+)\s+TO\s+(?P<ucol>[\w.]+)\s+"
    r"ON\s+(?P<ecol>[\w.]+)\s+USING\s+(?P<method>\w+)"
    r"(?P<rest>\s+.*?)?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)


def _split_where(where: Optional[str], ucol: str) -> tuple[Optional[str], Optional[str]]:
    """Split top-level AND conjuncts into user-only vs residual — the
    TRUE-substitution rewrite of ``parse_rec.c:1109-1211``. Used by
    DataFrame-API callers; the SQL path gets this from Catalyst."""
    if not where:
        return None, None
    conjuncts = re.split(r"\s+AND\s+", where, flags=re.IGNORECASE)
    keywords = {"and", "or", "not", "in", "like", "ilike", "between",
                "is", "null", "true", "false"}
    user_parts, rest_parts = [], []
    for c in conjuncts:
        idents = {x for x in re.findall(r"[A-Za-z_]\w*", c)
                  if x.lower() not in keywords and not x.isdigit()}
        (user_parts if idents <= {ucol} else rest_parts).append(c)
    return (" AND ".join(user_parts) or None, " AND ".join(rest_parts) or None)


def _parse_from(from_sql: str) -> list[tuple[str, str]]:
    """`t1 a, t2 b` -> [(table, alias), ...] (alias defaults to table)."""
    out = []
    for item in from_sql.split(","):
        toks = item.split()
        if not toks:
            continue
        table = toks[0]
        alias = toks[1] if len(toks) > 1 else toks[0]
        out.append((table, alias))
    return out


class RecSQL:
    """``RecSQL(engine).sql(query)`` — RecDB-flavored SQL over Spark.

    Tables resolve from the Spark catalog (temp views); statements
    without RecDB constructs fall through to ``spark.sql`` untouched.
    """

    _view_seq = 0

    def __init__(self, engine: RecEngine):
        self.engine = engine
        self.spark: SparkSession = engine.spark

    def sql(self, query: str) -> Optional[DataFrame]:
        m = _CREATE_RE.match(query)
        if m:
            events = self.spark.table(m["table"])
            self.engine.create_recommender(
                m["name"].lower(), events, m["ucol"], m["icol"], m["ecol"],
                m["method"].lower(), events_name=m["table"].lower())
            return None
        m = _DROP_RE.match(query)
        if m:
            self.engine.drop_recommender(m["name"].lower())
            return None
        m = _REC_RE.match(query)
        if m:
            return self._recommend(m)
        return self.spark.sql(query)

    def _recommend(self, m: re.Match) -> DataFrame:
        tables = _parse_from(m["from"])
        # the events table is the one the RECOMMEND columns qualify
        # (events-table resolution, parse_rec.c:187-297)
        def split_qual(col: str) -> tuple[Optional[str], str]:
            return tuple(col.split(".", 1)) if "." in col else (None, col)  # type: ignore

        qual, ucol = split_qual(m["ucol"])
        _, icol = split_qual(m["icol"])
        _, ecol = split_qual(m["ecol"])
        if qual is None:
            ev_table, ev_alias = tables[0]
        else:
            hits = [(t, a) for t, a in tables if a == qual or t == qual]
            if not hits:
                raise ValueError(f"RECOMMEND qualifier {qual!r} not in FROM {tables}")
            ev_table, ev_alias = hits[0]

        # materialized-model substitution (parse_rec.c:554-678): a catalog
        # hit on (eventtable, method) flips OP_GENERATE -> OP_FILTER
        hit = self.engine.catalog.find(m["method"].lower(), ev_table.lower())
        scored = self.engine.recommend(
            self.spark.table(ev_table), ucol, icol, ecol,
            m["method"].lower(), name=hit.name if hit else None)

        RecSQL._view_seq += 1
        view = f"__rec_scored_{RecSQL._view_seq}"
        scored.createOrReplaceTempView(view)

        from_parts = [f"{view} {ev_alias}" if t == ev_table and a == ev_alias
                      else f"{t} {a}" for t, a in tables]
        rest = re.sub(r"\bILIKE\b", "ilike", m["rest"] or "", flags=re.IGNORECASE)
        plain = f"SELECT {m['select']} FROM {', '.join(from_parts)}{rest}"
        return self.spark.sql(plain)
