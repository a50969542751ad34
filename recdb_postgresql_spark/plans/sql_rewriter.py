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
                               [JOIN <table2> [alias2] ON <cond> ...]
        RECOMMEND [a.]<icol> TO [a.]<ucol> ON [a.]<ecol> USING <method>
        [WHERE ...] [ORDER BY ...] [LIMIT k]

Like the reference (validateClauses, ``parse_rec.c:119-157``),
DISTINCT / INTO / GROUP BY / HAVING / WINDOW / FOR / WITH are rejected
in a RECOMMEND statement with the reference's error message.
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


def _top_level_conjuncts(where: str) -> Optional[list[str]]:
    """Split on AND at parenthesis depth 0 only, skipping quoted spans.
    Returns None when a top-level OR is present: ``a = 1 OR b = 2 AND
    c = 3`` parses as ``a OR (b AND c)``, so splitting its ANDs would
    change semantics — the caller must then treat the whole clause as
    residual.

    Single-quoted literals (with ``''`` escapes) and double-quoted
    identifiers are opaque: ``name = 'rock AND roll'`` is ONE conjunct,
    and an ``'OR'`` inside a literal does not force the residual path."""
    up = where.upper()
    depth = 0
    cuts, has_or = [], False
    i = 0
    while i < len(up):
        c = up[i]
        if c in ("'", '"'):
            q = c
            i += 1
            while i < len(up):
                if up[i] == q:
                    if q == "'" and i + 1 < len(up) and up[i + 1] == "'":
                        i += 2  # '' escape inside a string literal
                        continue
                    i += 1
                    break
                i += 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and c.isspace():
            m = re.match(r"\s+(AND|OR)\s+", up[i:])
            if m:
                if m.group(1) == "OR":
                    has_or = True
                else:
                    cuts.append((i, i + m.end()))
                i += m.end()
                continue
        i += 1
    if has_or:
        return None
    parts, start = [], 0
    for a, b in cuts:
        parts.append(where[start:a].strip())
        start = b
    parts.append(where[start:].strip())
    return [p for p in parts if p]


def _split_where(where: Optional[str], ucol: str) -> tuple[Optional[str], Optional[str]]:
    """Split top-level AND conjuncts into user-only vs residual — the
    TRUE-substitution rewrite of ``parse_rec.c:1109-1211``. Used by
    DataFrame-API callers; the SQL path gets this from Catalyst.
    A clause with a top-level OR is not conjunct-splittable and comes
    back whole as the residual."""
    if not where:
        return None, None
    conjuncts = _top_level_conjuncts(where)
    if conjuncts is None:
        return None, where
    keywords = {"and", "or", "not", "in", "like", "ilike", "between",
                "is", "null", "true", "false"}
    user_parts, rest_parts = [], []
    for c in conjuncts:
        # words inside string literals are values, not identifiers:
        # ``u = 'the thing'`` must still classify as a user predicate
        unquoted = re.sub(r"'(?:[^']|'')*'", "''", c)
        idents = {x for x in re.findall(r"[A-Za-z_]\w*", unquoted)
                  if x.lower() not in keywords and not x.isdigit()}
        (user_parts if idents <= {ucol} else rest_parts).append(c)
    return (" AND ".join(user_parts) or None, " AND ".join(rest_parts) or None)


_JOIN_SPLIT_RE = re.compile(
    r",|\b(?:NATURAL\s+)?(?:INNER\s+|LEFT\s+(?:OUTER\s+)?|RIGHT\s+(?:OUTER\s+)?"
    r"|FULL\s+(?:OUTER\s+)?|CROSS\s+)?JOIN\b",
    re.IGNORECASE)


def _parse_from(from_sql: str) -> list[tuple[str, str]]:
    """``t1 a, t2 b JOIN t3 AS c ON ...`` -> [(table, alias), ...]
    (alias defaults to table; ON conditions ignored)."""
    out = []
    for item in _JOIN_SPLIT_RE.split(from_sql):
        item = re.split(r"\bON\b", item, flags=re.IGNORECASE)[0].strip()
        toks = item.split()
        if not toks:
            continue
        table = toks[0]
        alias = toks[-1] if len(toks) > 1 and toks[-1].upper() != "AS" else toks[0]
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

    @staticmethod
    def _validate_recommend(query: str, m: re.Match) -> None:
        """validateClauses (``parse_rec.c:119-157``): the reference is
        'very picky' — RECOMMEND composes with none of these clauses."""
        def err(clause: str):
            raise ValueError(
                f"RECOMMEND clause is not allowed with {clause} clause")
        if re.match(r"\s*WITH\b", query, re.IGNORECASE):
            err("WITH")
        if m is None:
            return
        if re.match(r"\s*DISTINCT\b", m["select"], re.IGNORECASE):
            err("DISTINCT")
        rest = m["rest"] or ""
        for pat, clause in ((r"\bGROUP\s+BY\b", "GROUP BY"),
                            (r"\bHAVING\b", "HAVING"),
                            (r"\bWINDOW\b", "WINDOW"),
                            (r"\bINTO\b", "INTO"),
                            (r"\bFOR\s+(UPDATE|SHARE)\b", "FOR")):
            if re.search(pat, rest, re.IGNORECASE):
                err(clause)

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
            self._validate_recommend(query, m)
            return self._recommend(m)
        if re.match(r"\s*WITH\b.*\bRECOMMEND\b.*\bTO\b", query,
                    re.IGNORECASE | re.DOTALL):
            # a WITH-wrapped RECOMMEND misses _REC_RE by design
            self._validate_recommend(query, None)
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

        # swap the events table for the scored view IN PLACE so comma
        # lists and JOIN ... ON syntax both survive verbatim; aliasing
        # the view as the original alias (or table name) keeps every
        # qualified column reference valid
        if ev_alias != ev_table:
            pat = rf"\b{re.escape(ev_table)}\s+(?:AS\s+)?{re.escape(ev_alias)}\b"
        else:
            pat = rf"\b{re.escape(ev_table)}\b"
        new_from = re.sub(pat, f"{view} {ev_alias}", m["from"], count=1,
                          flags=re.IGNORECASE)
        rest = re.sub(r"\bILIKE\b", "ilike", m["rest"] or "", flags=re.IGNORECASE)
        plain = f"SELECT {m['select']} FROM {new_from}{rest}"
        return self.spark.sql(plain)
