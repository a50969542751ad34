"""SQL front door: the RECOMMEND clause and recommender DDL as SQL.

The reference extends the PostgreSQL grammar
(``gram.y:2444-2488`` for CREATE/DROP RECOMMENDER,
``gram.y:8874-8948`` for the RECOMMEND clause between FROM and WHERE).
Spark's parser cannot be extended from PySpark, so this module is a
pre-parser (the analog of ``transformRecommendClause``,
``parse_rec.c:56-112``): it recognizes the RecDB constructs with a
tolerant regex grammar, splits the WHERE into user-only conjuncts vs
residual predicates (TRUE-substitution semantics,
``parse_rec.c:1109-1211``), delegates scoring to the engine, and hands
everything else (plain SQL) to ``spark.sql`` untouched.

Supported statements::

    CREATE RECOMMENDER <name> ON <table>
        USERS FROM <ucol> ITEMS FROM <icol> EVENTS FROM <ecol>
        USING <method>
    DROP RECOMMENDER <name>
    SELECT * FROM <table>
        RECOMMEND <icol> TO <ucol> ON <ecol> USING <method>
        [WHERE <pred> [AND <pred>]...]
        [ORDER BY <col> [DESC]] [LIMIT <k>]
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recdb_postgresql_spark.engine import RecEngine

_CREATE_RE = re.compile(
    r"^\s*CREATE\s+RECOMMENDER\s+(?P<name>\w+)\s+ON\s+(?P<table>\w+)\s+"
    r"USERS\s+FROM\s+(?P<ucol>\w+)\s+ITEMS\s+FROM\s+(?P<icol>\w+)\s+"
    r"EVENTS\s+FROM\s+(?P<ecol>\w+)\s+USING\s+(?P<method>\w+)\s*;?\s*$",
    re.IGNORECASE)
_DROP_RE = re.compile(r"^\s*DROP\s+RECOMMENDER\s+(?P<name>\w+)\s*;?\s*$",
                      re.IGNORECASE)
_REC_RE = re.compile(
    r"^\s*SELECT\s+\*\s+FROM\s+(?P<table>\w+)\s+"
    r"RECOMMEND\s+(?P<icol>\w+)\s+TO\s+(?P<ucol>\w+)\s+ON\s+(?P<ecol>\w+)\s+"
    r"USING\s+(?P<method>\w+)"
    r"(?:\s+WHERE\s+(?P<where>.*?))?"
    r"(?:\s+ORDER\s+BY\s+(?P<order>\w+)(?:\s+(?P<dir>ASC|DESC))?)?"
    r"(?:\s+LIMIT\s+(?P<limit>\d+))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)


def _split_where(where: Optional[str], ucol: str) -> tuple[Optional[str], Optional[str]]:
    """Split top-level AND conjuncts into user-only vs residual — the
    TRUE-substitution rewrite of ``parse_rec.c:1109-1211`` (non-user
    conjuncts replaced by TRUE in the user filter, and vice versa)."""
    if not where:
        return None, None
    conjuncts = re.split(r"\s+AND\s+", where, flags=re.IGNORECASE)
    user_parts, rest_parts = [], []
    for c in conjuncts:
        cols = set(re.findall(r"[A-Za-z_]\w*", c))
        cols -= {"AND", "OR", "NOT", "IN", "LIKE", "ILIKE", "BETWEEN",
                 "IS", "NULL", "TRUE", "FALSE", "and", "or", "not", "in",
                 "like", "ilike", "between", "is", "null", "true", "false"}
        idents = {x for x in cols if not x.isdigit()}
        (user_parts if idents <= {ucol} else rest_parts).append(c)
    return (" AND ".join(user_parts) or None, " AND ".join(rest_parts) or None)


class RecSQL:
    """``RecSQL(engine).sql(query)`` — RecDB-flavored SQL over Spark.

    Tables are resolved from the Spark catalog (temp views); anything
    that is not a RecDB construct falls through to ``spark.sql``.
    """

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
        events = self.spark.table(m["table"])
        ucol, icol, ecol = m["ucol"], m["icol"], m["ecol"]
        user_sql, rest_sql = _split_where(m["where"], ucol)
        # ILIKE appears in the reference regression suite; translate for Spark
        def fix(s: Optional[str]) -> Optional[str]:
            return re.sub(r"\bILIKE\b", "ilike", s, flags=re.IGNORECASE) if s else None

        # materialized-model substitution (parse_rec.c:554-678): a catalog
        # hit on (eventtable, method) flips OP_GENERATE -> OP_FILTER
        hit = self.engine.catalog.find(m["method"].lower(), m["table"].lower())
        out = self.engine.recommend(
            events, ucol, icol, ecol, m["method"].lower(),
            name=hit.name if hit else None,
            user_where=F.expr(fix(user_sql)) if user_sql else None,
            where=None)
        if rest_sql:
            out = out.filter(F.expr(fix(rest_sql)))
        if m["order"]:
            col = F.col(m["order"])
            out = out.orderBy(col.desc() if (m["dir"] or "").upper() == "DESC"
                              else col.asc(),
                              F.col(ucol), F.col(icol))
        if m["limit"]:
            out = out.limit(int(m["limit"]))
        return out
