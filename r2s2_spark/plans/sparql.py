"""Basic-graph-pattern (BGP) queries over the vertical tables.

The reference delegates SPARQL to Ontop, which compiles BGPs into SQL
self-joins over the SOG tables through the R2RML mapping (SURVEY.md §3.2,
SparqlOnLoadedTest.java:104-127). Here the same compilation targets
DataFrames directly: each triple pattern with a constant predicate scans
only that predicate's tables (partition pruning by construction), a
variable predicate unions all predicate maps (the IRI constant-folds per
branch), patterns join on shared variables, OPTIONAL groups left-join,
and Catalyst picks the join strategy.

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


@dataclass(frozen=True)
class PathInverse:
    """SPARQL inverse path ``^p``: (s, ^p, o) matches where (o, p, s)
    holds. ``path`` may be a predicate IRI or a :class:`PathPlus`
    (``^(p+)`` composes — compiled by swapping the pattern's ends)."""

    path: object


@dataclass(frozen=True)
class PathPlus:
    """SPARQL one-or-more property path ``p+`` in predicate position.
    Evaluated by semi-naive transitive closure: each round joins only the
    NEW pairs (frontier) against the base edges — O(graph diameter)
    rounds, lineage cut per round (same shape as operators/components)."""

    predicate: str
    max_iter: int = 64


def _transitive_plus(edges: DataFrame, max_iter: int) -> DataFrame:
    """edges(__s, __o) -> all pairs connected by a path of length >= 1."""
    # Each round's frontier is checkpointed eagerly (cuts lineage: the
    # per-round plan stays O(1)). Constraint propagation is switched off
    # for the loop: the closure plan unions the SAME checkpointed leaf
    # with its own self-join descendants, and Catalyst's union constraint
    # rewrite hits key-not-found on the rewritten attributes (the inferred
    # isNotNull constraints it would add are worthless here anyway —
    # every column is already non-null by construction).
    spark = edges.sparkSession
    prop_key = "spark.sql.constraintPropagation.enabled"
    prev = spark.conf.get(prop_key, "true")
    spark.conf.set(prop_key, "false")
    try:
        edges = edges.distinct().localCheckpoint()
        closure = edges
        frontier = edges
        for _ in range(max_iter):
            nxt = (
                frontier.alias("f")
                .join(edges.alias("e"), F.col("f.__o") == F.col("e.__s"))
                .select(F.col("f.__s").alias("__s"), F.col("e.__o").alias("__o"))
                .distinct()
                .join(closure, ["__s", "__o"], "left_anti")
                .localCheckpoint()
            )
            if nxt.limit(1).count() == 0:
                return closure
            closure = closure.unionByName(nxt).localCheckpoint()
            frontier = nxt
        raise RuntimeError(f"p+ closure did not converge in {max_iter} rounds")
    finally:
        spark.conf.set(prop_key, prev)


def _is_var(t) -> bool:
    return isinstance(t, str) and t.startswith("?")


def _pattern_frame(catalog, reader, dicts, pattern, idx: int) -> tuple[DataFrame, dict]:
    """One triple pattern -> DataFrame with one column per variable
    (plus hidden uniqueness suffix) and constant filters applied.

    A variable predicate unions over ALL predicate maps (the predicate IRI
    becomes a constant-folded literal column per branch — no per-row
    lookup); a constant predicate prunes to that predicate's tables only
    (partition pruning by construction)."""
    s, p, o = pattern
    while isinstance(p, PathInverse):  # (s, ^p, o) == (o, p, s)
        s, p, o = o, p.path, s
    is_path = isinstance(p, PathPlus)
    p_match = p.predicate if is_path else p
    p_is_var = _is_var(p_match)
    pieces = []
    for t in catalog.tables:
        for pm in t.predicates:
            if not p_is_var and pm.predicate != p_match:
                continue
            df = reader(t)
            if dicts:
                df = _decode_encoded(df, [*t.subject_columns, *pm.columns], dicts)
            s_lex, _, _ = _term_exprs(t.subject_columns, t.subject_kind)
            o_lex, o_lang, o_dt = _term_exprs(pm.columns, pm.obj_kind)
            out = df.select(
                s_lex.alias("__s"),
                F.lit(pm.predicate).alias("__p"),
                o_lex.alias("__o"),
                o_lang.alias("__ol"),
                o_dt.alias("__od"),
            ).where(F.col("__s").isNotNull() & F.col("__o").isNotNull())
            pieces.append(out)
    if not pieces:
        raise KeyError(f"no tables for predicate {p}")
    df = reduce(DataFrame.unionByName, pieces)
    if is_path:
        df = _transitive_plus(df.select("__s", "__o"), p.max_iter).select(
            "__s",
            F.lit(p_match).alias("__p"),
            "__o",
            F.lit(None).cast("string").alias("__ol"),
            F.lit(None).cast("string").alias("__od"),
        )

    cols = {}

    def bind(var, col_name):
        nonlocal df
        if var in cols:
            # repeated variable within one pattern, e.g. ('?x', p, '?x'):
            # an equality constraint, not a rebinding
            df = df.where(F.col(cols_src[var]) == F.col(col_name))
        else:
            cols[var] = F.col(col_name)
            cols_src[var] = col_name

    cols_src: dict = {}
    if _is_var(s):
        bind(s, "__s")
    else:
        df = df.where(F.col("__s") == s)
    if p_is_var:
        bind(p, "__p")
    if _is_var(o):
        bind(o, "__o")
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


def _join_patterns(catalog, reader, dicts, patterns) -> tuple[DataFrame, set]:
    frames = []
    for i, pat in enumerate(patterns):
        f, binds = _pattern_frame(catalog, reader, dicts, pat, i)
        frames.append((f, set(binds.values())))
    out, bound = frames[0]
    for f, vs in frames[1:]:
        shared = sorted(bound & vs)
        out = out.join(f, on=shared, how="inner") if shared else out.crossJoin(f)
        bound |= vs
    return out, bound


def bgp(
    catalog,
    reader,
    dicts,
    patterns: list[tuple],
    select: list[str] | None = None,
    distinct: bool = False,
    optional: list[list[tuple]] | None = None,
    filter=None,
) -> DataFrame:
    """Compile a BGP to a DataFrame: per-pattern predicate-pruned scans
    joined on shared variables (Catalyst reorders/broadcasts as usual).

    ``optional``: a list of OPTIONAL pattern groups (SPARQL 1.1 §6): each
    group compiles to its own BGP and LEFT-joins the required part on the
    shared variables — unmatched rows keep NULL for the group's variables.
    Groups sharing no variable with the required part cross-join against a
    single marker row (the SPARQL zero-shared-var OPTIONAL corner).

    ``filter``: a FILTER expression — a Column over the bound variable
    names (without '?'), or a callable(df) -> Column. Applied after the
    required part and all OPTIONAL joins, like SPARQL group-level FILTER;
    Catalyst pushes deterministic predicates down into the scans."""
    out, bound = _join_patterns(catalog, reader, dicts, patterns)
    for group in optional or []:
        g, g_vars = _join_patterns(catalog, reader, dicts, group)
        shared = sorted(bound & g_vars)
        if shared:
            # SPARQL OPTIONAL multiplies matching solutions, so the plain
            # left join (no dedupe of the optional side) IS the semantics
            out = out.join(g, on=shared, how="left")
        else:
            out = out.crossJoin(g)
        bound |= g_vars
    if filter is not None:
        out = out.where(filter(out) if callable(filter) else filter)
    if select:
        out = out.select(*[v[1:] if v.startswith("?") else v for v in select])
    if distinct:
        out = out.distinct()
    return out


def bgp_union(
    catalog,
    reader,
    dicts,
    groups: list[list[tuple]],
    select: list[str] | None = None,
    distinct: bool = False,
) -> DataFrame:
    """SPARQL UNION: each group compiles to its own BGP; solutions are
    concatenated with NULL for variables a branch does not bind
    (unionByName(allowMissingColumns) — exactly SPARQL's unbound)."""
    frames = [_join_patterns(catalog, reader, dicts, g)[0] for g in groups]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    if select:
        out = out.select(*[v[1:] if v.startswith("?") else v for v in select])
    if distinct:
        out = out.distinct()
    return out


def bgp_on_pipeline(
    pipe, patterns, select=None, distinct=False, stage=None, optional=None, filter=None
) -> DataFrame:
    stage = stage or pipe.last_catalog_stage()
    return bgp(
        pipe.catalog(stage),
        pipe.reader(stage),
        pipe.dicts(stage),
        patterns,
        select,
        distinct,
        optional,
        filter,
    )


def bgp_union_on_pipeline(pipe, groups, select=None, distinct=False, stage=None) -> DataFrame:
    stage = stage or pipe.last_catalog_stage()
    return bgp_union(
        pipe.catalog(stage), pipe.reader(stage), pipe.dicts(stage), groups, select, distinct
    )
