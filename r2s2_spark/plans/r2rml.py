"""Triple reconstruction + R2RML-style mapping document.

Reference counterpart: R2RMLFromTables.java:59-217 — emits an rr:TriplesMap
per table whose templates rebuild each term from the stored columns; Ontop
then queries through that mapping. Our engine's query surface is Spark SQL
itself, so the mapping materializes as :func:`reconstruct_triples` — a view
that re-emits (s_kind, s, p, o_kind, o_lex, o_lang, o_datatype, g) from the
vertical tables. It is the oracle surface for the P/R >= 0.95 gate and the
exact inverse of the Stage E decomposition.

A textual Turtle mapping document is also generated (write_mapping) for
parity with the reference's artifact.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.uri import PART_KEYS, reassemble_iri
from ..operators.dictionaries import UNBOUNDED_DICTS
from ..naming import RDF_TYPE
from ..plans.catalog import Catalog, ColumnSpec, PredicateMapSpec, TableSpec

TRIPLE_COLUMNS = ["s_kind", "s", "p", "o_kind", "o_lex", "o_lang", "o_datatype", "g_id"]

# A table whose >= _STACK_MIN predicate maps are being reconstructed scans
# ONCE (array-of-structs + explode) instead of once per map; tests
# monkeypatch this high to force the per-map path for parity comparison.
_STACK_MIN = 2


def balanced_union(frames: list) -> DataFrame:
    """unionByName as a balanced tree: a left-deep chain re-analyzes the
    growing plan on every union — O(T^2) analyzer work at vocabulary-scale
    predicate-map counts (10^4+ branches for a full reconstruction);
    pairing halves keeps it O(T log T)."""
    while len(frames) > 1:
        frames = [
            frames[i].unionByName(frames[i + 1]) if i + 1 < len(frames) else frames[i]
            for i in range(0, len(frames), 2)
        ]
    return frames[0]


def decimal_lexical(col) -> "F.Column":
    """decimal -> lexical string with trailing fraction zeros trimmed.
    THE canonical rendering: the narrowing guard (operators.passes) and
    both reconstruction paths (_lexical / _flex_lexical) must share this
    exact form — a divergence silently breaks the guard's exact-inverse
    contract for narrowed decimals."""
    return F.regexp_replace(
        F.regexp_replace(col.cast("string"), r"(\.\d*?)0+$", "$1"), r"\.$", ""
    )


def virtual_graph_id(gc) -> int | None:
    """A virtual graph column's constant id — None when the column was
    all-NULL at virtualization time (virtual_value None), a state the
    update module's graph-domain classifier models; int() on it would
    crash plan construction."""
    return None if gc.virtual_value is None else int(gc.virtual_value)


def _lexical(spec: ColumnSpec, col) -> "F.Column":
    """Physical/virtual column -> its lexical (string) form, undoing
    narrowing (OptimizeForDatatype), LCP factoring and gYear encoding."""
    if not spec.physical:
        base = F.lit(spec.virtual_value)
    else:
        base = col
        if spec.encoding == "gyear":
            # zero-padded years, sign-aware (OptimizeForDatatype.java:32-50)
            base = F.when(
                base < 0, F.concat(F.lit("-"), F.format_string("%04d", -base))
            ).otherwise(F.format_string("%04d", base))
        elif spec.sql_type.startswith("decimal"):
            base = decimal_lexical(base)
        else:
            base = base.cast("string")
    if spec.lcp_prefix:
        # NULL stays NULL (a merged-in row without this term); a value that
        # equalled the prefix was stripped to '' (non-null) and round-trips.
        base = F.when(base.isNotNull(), F.concat(F.lit(spec.lcp_prefix), base))
    return base


def _term_exprs(
    specs: list[ColumnSpec], kind: str
) -> tuple["F.Column", "F.Column", "F.Column"]:
    """Column specs of one term group -> (lex, lang, datatype) expressions."""
    by_part = {s.part: s for s in specs}
    if kind == "iri":
        parts = {}
        for key in PART_KEYS:
            spec = by_part.get(key)
            parts[key] = _lexical(spec, F.col(spec.name)) if spec else F.lit(None).cast("string")
        return reassemble_iri(parts), F.lit(None).cast("string"), F.lit(None).cast("string")
    if kind == "bnode":
        spec = by_part["bnode_id"]
        col = F.col(spec.name) if spec.physical else F.lit(int(spec.virtual_value))
        return F.concat(F.lit("b"), col.cast("string")), F.lit(None).cast("string"), F.lit(None).cast("string")
    # literal
    if "langvalue" in by_part:
        lex = _lexical(by_part["langvalue"], F.col(by_part["langvalue"].name))
        lang = _lexical(by_part["lang"], F.col(by_part["lang"].name))
        return lex, lang, F.lit(None).cast("string")
    lex = _lexical(by_part["litvalue"], F.col(by_part["litvalue"].name))
    dt = _lexical(by_part["datatype"], F.col(by_part["datatype"].name))
    return lex, F.lit(None).cast("string"), dt


def _flex_lexical(spec: ColumnSpec, col, vcol, lcol) -> "F.Column":
    """:func:`_lexical` with per-ROW constants: ``vcol``/``lcol`` columns
    replace the spec's literal ``virtual_value`` / ``lcp_prefix``. Used by
    fused multi-table scans (plans.sparql) where ONE branch serves many
    structurally-identical tables and the per-table constants arrive via a
    broadcast-joined constants frame instead of per-branch literals. The
    branching below must mirror :func:`_lexical` exactly — the fused and
    per-table paths are interchangeable for any (spec, data)."""
    if not spec.physical:
        base = vcol
    else:
        base = col
        if spec.encoding == "gyear":
            base = F.when(
                base < 0, F.concat(F.lit("-"), F.format_string("%04d", -base))
            ).otherwise(F.format_string("%04d", base))
        elif spec.sql_type.startswith("decimal"):
            base = decimal_lexical(base)
        else:
            base = base.cast("string")
    if spec.lcp_prefix:
        base = F.when(base.isNotNull(), F.concat(lcol, base))
    return base


def _flex_term_exprs(
    specs: list[ColumnSpec], kind: str, cols: Callable
) -> tuple["F.Column", "F.Column", "F.Column"]:
    """:func:`_term_exprs` with injected accessors: ``cols(spec) ->
    (data_col, vcol, lcol)`` supplies the data column plus the per-row
    constant columns a fused scan joins in (None where the spec needs
    none). Must mirror :func:`_term_exprs` structurally."""
    by_part = {s.part: s for s in specs}
    if kind == "iri":
        parts = {}
        for key in PART_KEYS:
            spec = by_part.get(key)
            parts[key] = (
                _flex_lexical(spec, *cols(spec))
                if spec
                else F.lit(None).cast("string")
            )
        return (
            reassemble_iri(parts),
            F.lit(None).cast("string"),
            F.lit(None).cast("string"),
        )
    if kind == "bnode":
        spec = by_part["bnode_id"]
        col, vcol, _ = cols(spec)
        base = col if spec.physical else vcol.cast("long")
        return (
            F.concat(F.lit("b"), base.cast("string")),
            F.lit(None).cast("string"),
            F.lit(None).cast("string"),
        )
    if "langvalue" in by_part:
        lex = _flex_lexical(by_part["langvalue"], *cols(by_part["langvalue"]))
        lang = _flex_lexical(by_part["lang"], *cols(by_part["lang"]))
        return lex, lang, F.lit(None).cast("string")
    lex = _flex_lexical(by_part["litvalue"], *cols(by_part["litvalue"]))
    dt = _flex_lexical(by_part["datatype"], *cols(by_part["datatype"]))
    return lex, F.lit(None).cast("string"), dt


def _decode_encoded(df: DataFrame, specs: list[ColumnSpec], dicts: dict[str, DataFrame]) -> DataFrame:
    """Replace dictionary-encoded id columns with their string values
    (broadcast decode joins) so term expressions see strings."""
    for cs in specs:
        if cs.physical and cs.encoding in dicts:
            d = dicts[cs.encoding]
            dim = d.select(
                F.col("id").alias(cs.name + "\x00id"),
                F.col("iri").alias(cs.name + "\x00str"),
            )
            if cs.encoding not in UNBOUNDED_DICTS:
                # schemes/predicates are vocabulary-sized -> broadcast;
                # hosts/graphs are unbounded at web scale -> plain join
                # (AQE broadcasts when the measured size is small)
                dim = F.broadcast(dim)
            df = (
                df.join(dim, F.col(cs.name) == F.col(cs.name + "\x00id"), "left")
                .drop(cs.name, cs.name + "\x00id")
                .withColumnRenamed(cs.name + "\x00str", cs.name)
            )
    return df


def _merged_presence_filter(df: DataFrame, pm: PredicateMapSpec) -> DataFrame:
    """For a stage-M merged-in predicate map, keep only rows the merge join
    actually matched — i.e. at least one moved PHYSICAL column is set.
    Without this, a non-matched row renders the map's virtual constants as
    a fabricated term (e.g. a bare scheme+host IRI)."""
    if not pm.merged:
        return df
    phys = [cs.name for cs in pm.columns if cs.physical]
    if pm.graph_column is not None and pm.graph_column.physical:
        phys.append(pm.graph_column.name)
    if not phys:
        return df
    present = F.lit(False)
    for name in phys:
        present = present | F.col(name).isNotNull()
    return df.where(present)


def table_triples(
    df: DataFrame,
    table: TableSpec,
    pm: PredicateMapSpec,
    dicts: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """One predicate map of one table -> its triples (graph ids exploded)."""
    if dicts:
        df = _decode_encoded(df, [*table.subject_columns, *pm.columns], dicts)
    df = _merged_presence_filter(df, pm)
    s_lex, _, _ = _term_exprs(table.subject_columns, table.subject_kind)
    o_lex, o_lang, o_dt = _term_exprs(pm.columns, pm.obj_kind)

    g = pm.graph_column
    explode_graphs = False
    if g is None:
        g_col = F.lit(None).cast("bigint")
    elif not g.physical:
        g_col = F.lit(virtual_graph_id(g)).cast("bigint")
    elif g.part == "graph_set":
        g_col = F.col(g.name)  # exploded below (generators can't nest)
        explode_graphs = True
    else:
        g_col = F.col(g.name).cast("bigint")

    out = df.select(
        F.lit(table.subject_kind).alias("s_kind"),
        s_lex.alias("s"),
        F.lit(pm.predicate).alias("p"),
        F.lit(pm.obj_kind).alias("o_kind"),
        o_lex.alias("o_lex"),
        o_lang.alias("o_lang"),
        o_dt.alias("o_datatype"),
        g_col.alias("g_id"),
    )
    if explode_graphs:
        out = out.withColumn("g_id", F.explode("g_id")).withColumn(
            "g_id", F.col("g_id").cast("bigint")
        )
    # merged tables carry NULL object groups for subjects the merged-in
    # predicate doesn't describe (full-outer merge) — not triples, drop.
    return out.where(F.col("o_lex").isNotNull() & F.col("s").isNotNull())


def _stacked_table_triples(
    df: DataFrame,
    table: TableSpec,
    pms: list[PredicateMapSpec],
    dicts: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """ONE scan of a multi-predicate (merged) table reconstructing ALL its
    predicate maps: each map's term expressions pack into an
    array-of-structs element and one explode unpacks — T maps cost one
    table scan and one analyzer pass instead of T union branches over the
    SAME file (the merged-table twin of plans.sparql._stacked_piece)."""
    if dicts:
        by_name = {cs.name: cs for cs in table.subject_columns}
        for pm in pms:
            by_name.update({cs.name: cs for cs in pm.columns})
        df = _decode_encoded(df, list(by_name.values()), dicts)
    s_lex, _, _ = _term_exprs(table.subject_columns, table.subject_kind)
    structs = []
    for pm in pms:
        o_lex, o_lang, o_dt = _term_exprs(pm.columns, pm.obj_kind)
        gc = pm.graph_column
        if gc is None:
            g_arr = F.array(F.lit(None).cast("bigint"))
        elif not gc.physical:
            g_arr = F.array(F.lit(virtual_graph_id(gc)).cast("bigint"))
        elif gc.part == "graph_set":
            g_arr = F.col(gc.name).cast("array<bigint>")
        else:
            g_arr = F.array(F.col(gc.name).cast("bigint"))
        st = F.struct(
            F.lit(pm.predicate).alias("p"),
            F.lit(pm.obj_kind).alias("k"),
            o_lex.alias("o"),
            o_lang.alias("ol"),
            o_dt.alias("od"),
            g_arr.alias("g"),
        )
        if pm.merged:
            # merged-map presence guard (_merged_presence_filter) as a
            # NULL struct instead of a per-branch where: a non-matched row
            # must not fabricate the map's virtual constants; NULL structs
            # fall to the o_lex filter below
            phys = [cs.name for cs in pm.columns if cs.physical]
            if gc is not None and gc.physical:
                phys.append(gc.name)
            if phys:
                present = F.lit(False)
                for name in phys:
                    present = present | F.col(name).isNotNull()
                st = F.when(present, st)
        structs.append(st)
    out = (
        df.select(
            F.lit(table.subject_kind).alias("s_kind"),
            s_lex.alias("s"),
            F.explode(F.array(*structs)).alias("__x"),
        )
        .where(F.col("s").isNotNull() & F.col("__x.o").isNotNull())
        .select(
            "s_kind",
            "s",
            F.col("__x.p").alias("p"),
            F.col("__x.k").alias("o_kind"),
            F.col("__x.o").alias("o_lex"),
            F.col("__x.ol").alias("o_lang"),
            F.col("__x.od").alias("o_datatype"),
            F.col("__x.g").alias("g_id"),
        )
    )
    return out.withColumn("g_id", F.explode("g_id")).withColumn(
        "g_id", F.col("g_id").cast("bigint")
    )


def reconstruct_triples(
    catalog: Catalog,
    reader: Callable[[TableSpec], DataFrame],
    dicts: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Union of all tables' triples. ``reader`` supplies each table's
    DataFrame (with reference-named columns).

    Branch count tracks STRUCTURES, not vocabulary (the same two
    mechanisms as the variable-predicate SPARQL scan): a merged
    multi-predicate table reconstructs in ONE stacked scan
    (:func:`_stacked_table_triples`), and structurally-identical
    single-map batched tables FUSE into one scan with a broadcast
    constants join (plans.sparql._fused_scan, imported lazily — sparql
    imports this module). A 10^4-table vocabulary reconstructs in a
    handful of scans instead of 10^4 analyzer passes."""
    pieces = []
    singles: list = []
    fuse_groups: dict = {}
    raw_fn = getattr(reader, "batch_raw", None)
    if raw_fn is not None:
        from .sparql import _fuse_sig, _fused_scan
    for t in catalog.tables:
        if len(t.predicates) >= _STACK_MIN:
            pieces.append(
                _stacked_table_triples(reader(t), t, list(t.predicates), dicts)
            )
            continue
        for pm in t.predicates:
            sig = _fuse_sig(t, pm, True) if raw_fn else None
            if sig is None:
                singles.append((t, pm))
            else:
                fuse_groups.setdefault(sig, []).append((t, pm))
    for sig in [k for k, v in fuse_groups.items() if len(v) == 1]:
        # a lone member gains nothing from the constants join
        singles.append(fuse_groups.pop(sig)[0])
    for t, pm in singles:
        pieces.append(table_triples(reader(t), t, pm, dicts))
    for sig, members in fuse_groups.items():
        df, (s_lex, o_lex, o_lang, o_dt), pm2, t0, pm0 = _fused_scan(
            raw_fn(sig[0]), members, dicts, True
        )
        gc = pm2.graph_column
        explode_graphs = False
        if gc is None:
            g_col = F.lit(None).cast("bigint")
        elif not gc.physical:
            g_col = F.col("__gv").cast("bigint")
        elif gc.part == "graph_set":
            g_col = F.col(gc.name)
            explode_graphs = True
        else:
            g_col = F.col(gc.name).cast("bigint")
        out = df.select(
            F.lit(t0.subject_kind).alias("s_kind"),
            s_lex.alias("s"),
            F.col("__p").alias("p"),
            F.lit(pm0.obj_kind).alias("o_kind"),
            o_lex.alias("o_lex"),
            o_lang.alias("o_lang"),
            o_dt.alias("o_datatype"),
            g_col.alias("g_id"),
        ).where(F.col("o_lex").isNotNull() & F.col("s").isNotNull())
        if explode_graphs:
            out = out.withColumn("g_id", F.explode("g_id")).withColumn(
                "g_id", F.col("g_id").cast("bigint")
            )
        pieces.append(out)
    if not pieces:
        # an empty KG (e.g. every source statement was a parse error) is a
        # valid KG with zero triples, not an error condition
        from pyspark.sql import SparkSession

        return SparkSession.getActiveSession().createDataFrame(
            [],
            "s_kind string, s string, p string, o_kind string, "
            "o_lex string, o_lang string, o_datatype string, g_id bigint",
        )
    return balanced_union(pieces)


def distinct_types(
    catalog: Catalog,
    reader: Callable[[TableSpec], DataFrame],
    dicts: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """The reference's flagship SPARQL `SELECT DISTINCT ?type WHERE {[] a ?type}`
    (SparqlOnLoadedTest.java:111-127) as a DataFrame program: union the
    object-IRI expressions of every rdf:type predicate map, distinct."""
    pieces = []
    for t in catalog.tables:
        for pm in t.predicates:
            if pm.predicate == RDF_TYPE and pm.obj_kind == "iri":
                df = reader(t)
                if dicts:
                    df = _decode_encoded(df, list(pm.columns), dicts)
                df = _merged_presence_filter(df, pm)
                o_lex, _, _ = _term_exprs(pm.columns, pm.obj_kind)
                pieces.append(df.select(o_lex.alias("type")).where(o_lex.isNotNull()))
    if not pieces:
        raise ValueError("no rdf:type tables in catalog")
    return balanced_union(pieces).distinct()


# -- mapping document --------------------------------------------------------


def _ttl_escape(s: str) -> str:
    """Turtle string-literal escaping for the mapping document — data
    constants (virtual values) may carry quotes/backslashes/newlines."""
    return (
        str(s)
        .replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


def _template(specs: list[ColumnSpec], kind: str) -> str:
    """R2RML-ish template string: constants inlined, physical columns as
    {name} placeholders (R2RMLFromTables.java:139-217)."""
    if kind == "bnode":
        s = specs[0]
        return f"_:{{{s.name}}}" if s.physical else f"_:b{s.virtual_value}"
    by_part = {s.part: s for s in specs}

    def piece(key: str, prefix: str = "") -> str:
        s = by_part.get(key)
        if s is None:
            return ""
        if not s.physical:
            # a column can be LCP-stripped FIRST and virtualized later
            # (post-merge reopt): virtual_value holds the STRIPPED form,
            # so the template must re-prepend the prefix exactly like
            # _lexical does at reconstruction
            return (
                f"{prefix}{s.lcp_prefix}{s.virtual_value}"
                if s.virtual_value is not None else ""
            )
        return f"{prefix}{s.lcp_prefix}{{{s.name}}}"

    host = by_part.get("host")
    has_host = host is not None and (host.physical or host.virtual_value is not None)
    out = piece("scheme") + ":"
    if has_host:
        out += "//" + piece("user_info") + ("@" if by_part.get("user_info") and (by_part["user_info"].physical or by_part["user_info"].virtual_value) else "")
        out += piece("host") + piece("port", ":") + piece("path") + piece("query", "?")
    else:
        out += piece("ssp")
    out += piece("fragment", "#")
    return out


def mapping_document(catalog: Catalog) -> str:
    """Turtle-ish mapping doc for parity with R2RMLFromTables.write."""
    lines = [
        "@prefix rr: <http://www.w3.org/ns/r2rml#> .",
        "@prefix r2s2s: <https://r2s2-spark.example/ns#> .",
        "",
    ]
    for t in catalog.tables:
        lines.append(f"r2s2s:map_{t.name} a rr:TriplesMap ;")
        lines.append(f'  rr:logicalTable [ rr:tableName "{t.name}" ] ;')
        lines.append(
            f"  rr:subjectMap [ rr:template "
            f'"{_ttl_escape(_template(t.subject_columns, t.subject_kind))}" ] ;'
        )
        for pm in t.predicates:
            lines.append("  rr:predicateObjectMap [")
            lines.append(f"    rr:predicate <{pm.predicate}> ;")
            if pm.obj_kind == "literal":
                extra = (
                    f'rr:language "{pm.lang}"'
                    if pm.lang
                    else f"rr:datatype <{pm.datatype}>"
                )
                val = next(c for c in pm.columns if c.part in ("langvalue", "litvalue"))
                ref = (
                    f'rr:column "{val.name}"'
                    if val.physical
                    else f'rr:constant "{_ttl_escape(val.virtual_value)}"'
                )
                lines.append(f"    rr:objectMap [ {ref} ; {extra} ] ;")
            else:
                lines.append(
                    f'    rr:objectMap [ rr:template '
                    f'"{_ttl_escape(_template(pm.columns, pm.obj_kind))}" ] ;'
                )
            lines.append("  ] ;")
        lines.append("  .")
        lines.append("")
    return "\n".join(lines)
