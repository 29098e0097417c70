"""Basic-graph-pattern (BGP) queries over the vertical tables.

The reference delegates SPARQL to Ontop, which compiles BGPs into SQL
self-joins over the SOG tables through the R2RML mapping (SURVEY.md §3.2,
SparqlOnLoadedTest.java:104-127). Here the same compilation targets
DataFrames directly: each triple pattern with a constant predicate scans
only that predicate's tables (partition pruning by construction), patterns
join on shared variables, and Catalyst picks the join strategy.

    bgp(pipe, [("?s", RDF_TYPE, "?t"), ("?s", RDFS+"label", "?l")],
        select=["?t", "?l"])

Term syntax: "?name" = variable; anything else = constant (IRI for s/p;
IRI or plain-literal string for o). Objects bind their lexical form; use
``o_lang``/``o_datatype`` filters via ``literal()`` for typed constants.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .r2rml import _decode_encoded, _term_exprs


@dataclass(frozen=True)
class Literal:
    lex: str
    lang: str | None = None
    datatype: str | None = None


def _is_var(t) -> bool:
    return isinstance(t, str) and t.startswith("?")


def _pattern_frame(catalog, reader, dicts, pattern, idx: int) -> tuple[DataFrame, dict]:
    """One triple pattern -> DataFrame with one column per variable
    (plus hidden uniqueness suffix) and constant filters applied."""
    s, p, o = pattern
    if _is_var(p):
        raise NotImplementedError("variable predicates: union over all tables — add when needed")
    pieces = []
    for t in catalog.tables:
        for pm in t.predicates:
            if pm.predicate != p:
                continue
            df = reader(t)
            if dicts:
                df = _decode_encoded(df, [*t.subject_columns, *pm.columns], dicts)
            s_lex, _, _ = _term_exprs(t.subject_columns, t.subject_kind)
            o_lex, o_lang, o_dt = _term_exprs(pm.columns, pm.obj_kind)
            out = df.select(
                s_lex.alias("__s"),
                o_lex.alias("__o"),
                o_lang.alias("__ol"),
                o_dt.alias("__od"),
            ).where(F.col("__s").isNotNull() & F.col("__o").isNotNull())
            pieces.append(out)
    if not pieces:
        raise KeyError(f"no tables for predicate {p}")
    df = reduce(DataFrame.unionByName, pieces)

    cols = {}
    if _is_var(s):
        cols[s] = F.col("__s")
    else:
        df = df.where(F.col("__s") == s)
    if _is_var(o):
        if o in cols:
            # repeated variable within one pattern, e.g. ('?x', p, '?x'):
            # an equality constraint, not a rebinding
            df = df.where(F.col("__s") == F.col("__o"))
        else:
            cols[o] = F.col("__o")
    elif isinstance(o, Literal):
        df = df.where(F.col("__o") == o.lex)
        if o.lang is not None:
            df = df.where(F.col("__ol") == o.lang)
        if o.datatype is not None:
            df = df.where(F.col("__od") == o.datatype)
    else:
        df = df.where(F.col("__o") == o)
    named = df.select(*[c.alias(v[1:]) for v, c in cols.items()]) if cols else df.select(F.lit(1).alias(f"__m{idx}"))
    return named, {v: v[1:] for v in cols}


def bgp(
    catalog,
    reader,
    dicts,
    patterns: list[tuple],
    select: list[str] | None = None,
    distinct: bool = False,
) -> DataFrame:
    """Compile a BGP to a DataFrame: per-pattern predicate-pruned scans
    joined on shared variables (Catalyst reorders/broadcasts as usual)."""
    frames = []
    for i, pat in enumerate(patterns):
        f, binds = _pattern_frame(catalog, reader, dicts, pat, i)
        frames.append((f, set(binds.values())))
    out, bound = frames[0]
    for f, vs in frames[1:]:
        shared = sorted(bound & vs)
        out = out.join(f, on=shared, how="inner") if shared else out.crossJoin(f)
        bound |= vs
    if select:
        out = out.select(*[v[1:] if v.startswith("?") else v for v in select])
    if distinct:
        out = out.distinct()
    return out


def bgp_on_pipeline(pipe, patterns, select=None, distinct=False, stage=None) -> DataFrame:
    stage = stage or pipe.last_catalog_stage()
    return bgp(
        pipe.catalog(stage), pipe.reader(stage), pipe.dicts(stage), patterns, select, distinct
    )
