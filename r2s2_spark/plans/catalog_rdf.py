"""Catalog <-> Turtle serialization (TableDescriptionAsRdf parity).

The reference checkpoints its table catalog as RDF after every step and
reloads it to resume (TableDescriptionAsRdf.java:35-120 write, :205-214
read; Loader.java:207-213). The engine's operational checkpoint is
catalog.json (plans/catalog.py — same round-trip guarantee), but the RDF
rendering is part of the reference's artifact surface, so both directions
are provided here: :func:`catalog_to_turtle` emits the document and
:func:`catalog_from_turtle` reads it back THROUGH THE ENGINE'S OWN TURTLE
PARSER (sources/turtle.py) — the round-trip doubles as an end-to-end test
of that parser on a real document.

Ordering: RDF statements are unordered, so every column/predicate-map
carries an explicit r2s2:index (the reference relies on rdf:List order;
an index literal survives any serializer)."""

from __future__ import annotations

from .catalog import Catalog, ColumnSpec, PredicateMapSpec, TableSpec

NS = "https://r2s2-spark.example/ns#"
_T = "urn:r2s2:table:"
_P = "urn:r2s2:pm:"
_C = "urn:r2s2:col:"
_CAT = "urn:r2s2:catalog"


def _esc(s: str) -> str:
    return (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


def _lit(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    return f'"{_esc(str(v))}"'


def catalog_to_turtle(catalog: Catalog) -> str:
    lines = [f"@prefix r2s2: <{NS}> .", ""]

    def stmt(subj: str, pairs: list[tuple[str, str]]) -> None:
        lines.append(f"<{subj}>")
        for i, (p, o) in enumerate(pairs):
            end = " ." if i == len(pairs) - 1 else " ;"
            lines.append(f"  r2s2:{p} {o}{end}")
        lines.append("")

    cat_pairs: list[tuple[str, str]] = []
    if catalog.default_graph is not None:
        cat_pairs.append(("defaultGraph", _lit(catalog.default_graph)))
    for prefix, ns in catalog.namespaces.items():  # insertion order preserved
        cat_pairs.append(("namespace", _lit(f"{prefix}\x00{ns}")))
    for name, rel in catalog.dictionaries.items():
        cat_pairs.append(("dictionary", _lit(f"{name}\x00{rel}")))
    for t in catalog.tables:
        cat_pairs.append(("table", f"<{_T}{t.name}>"))
    stmt(_CAT, cat_pairs or [("defaultGraph", '""')])

    def col_pairs(c: ColumnSpec, idx: int) -> list[tuple[str, str]]:
        pairs = [
            ("index", _lit(idx)),
            ("name", _lit(c.name)),
            ("part", _lit(c.part)),
            ("sqlType", _lit(c.sql_type)),
            ("physical", _lit(c.physical)),
            ("lcpPrefix", _lit(c.lcp_prefix)),
        ]
        if c.source is not None:
            pairs.append(("source", _lit(c.source)))
        if c.virtual_value is not None:
            pairs.append(("virtualValue", _lit(c.virtual_value)))
        if c.encoding is not None:
            pairs.append(("encoding", _lit(c.encoding)))
        return pairs

    for t in catalog.tables:
        t_pairs = [("name", _lit(t.name)), ("subjectKind", _lit(t.subject_kind))]
        if t.row_count is not None:
            t_pairs.append(("rowCount", _lit(t.row_count)))
        if t.path is not None:
            t_pairs.append(("path", _lit(t.path)))
        if t.subject_unique is not None:
            t_pairs.append(("subjectUnique", _lit(t.subject_unique)))
        if t.subject_repeating is not None:
            t_pairs.append(("subjectRepeating", _lit(t.subject_repeating)))
        if t.storage_columns is not None:
            # real column names in storage position order (c0..cN),
            # \x00-joined like the namespace/dictionary pairs
            t_pairs.append(("storageColumns", _lit("\x00".join(t.storage_columns))))
        for i, c in enumerate(t.subject_columns):
            cid = f"{_C}{t.name}:s{i}"
            t_pairs.append(("subjectColumn", f"<{cid}>"))
        for i, pm in enumerate(t.predicates):
            t_pairs.append(("predicateMap", f"<{_P}{t.name}:{i}>"))
        stmt(f"{_T}{t.name}", t_pairs)
        for i, c in enumerate(t.subject_columns):
            stmt(f"{_C}{t.name}:s{i}", col_pairs(c, i))
        for i, pm in enumerate(t.predicates):
            pm_pairs = [("index", _lit(i)), ("predicate", _lit(pm.predicate)),
                        ("objKind", _lit(pm.obj_kind))]
            if pm.lang is not None:
                pm_pairs.append(("lang", _lit(pm.lang)))
            if pm.datatype is not None:
                pm_pairs.append(("datatype", _lit(pm.datatype)))
            if pm.merged:
                pm_pairs.append(("merged", _lit("true")))
            for j, c in enumerate(pm.columns):
                pm_pairs.append(("column", f"<{_C}{t.name}:{i}:{j}>"))
            if pm.graph_column is not None:
                pm_pairs.append(("graphColumn", f"<{_C}{t.name}:{i}:g>"))
            stmt(f"{_P}{t.name}:{i}", pm_pairs)
            for j, c in enumerate(pm.columns):
                stmt(f"{_C}{t.name}:{i}:{j}", col_pairs(c, j))
            if pm.graph_column is not None:
                stmt(f"{_C}{t.name}:{i}:g", col_pairs(pm.graph_column, 0))
    return "\n".join(lines)


def catalog_from_turtle(text: str) -> Catalog:
    from ..sources.turtle import parse_turtle

    stmts, errors = parse_turtle(text, "urn:r2s2:catalog-doc")
    if errors:
        raise ValueError(f"catalog turtle parse errors: {errors[:3]}")
    props: dict[str, list[tuple[str, object]]] = {}
    for (_ln, _sk, s, p, o_kind, o_lex, _lang, o_dt, _g) in stmts:
        if not p.startswith(NS):
            continue
        key = p[len(NS):]
        val: object = o_lex
        if o_kind == "literal":
            if o_dt and o_dt.endswith("boolean"):
                val = o_lex == "true"
            elif o_dt and o_dt.endswith("integer"):
                val = int(o_lex)
        props.setdefault(s, []).append((key, val))

    def get(subj: str, key: str, default=None):
        for k, v in props.get(subj, []):
            if k == key:
                return v
        return default

    def get_all(subj: str, key: str) -> list:
        return [v for k, v in props.get(subj, []) if k == key]

    def col(subj: str) -> ColumnSpec:
        return ColumnSpec(
            name=get(subj, "name"),
            part=get(subj, "part"),
            sql_type=get(subj, "sqlType"),
            source=get(subj, "source"),
            physical=get(subj, "physical"),
            virtual_value=get(subj, "virtualValue"),
            lcp_prefix=get(subj, "lcpPrefix"),
            encoding=get(subj, "encoding"),
        )

    def by_index(subjs: list[str]) -> list[str]:
        return sorted(subjs, key=lambda s: get(s, "index", 0))

    tables = []
    for t_iri in get_all(_CAT, "table"):
        pms = []
        for pm_iri in by_index(get_all(t_iri, "predicateMap")):
            g_iris = get_all(pm_iri, "graphColumn")
            pms.append(
                PredicateMapSpec(
                    predicate=get(pm_iri, "predicate"),
                    obj_kind=get(pm_iri, "objKind"),
                    lang=get(pm_iri, "lang"),
                    datatype=get(pm_iri, "datatype"),
                    columns=[col(c) for c in by_index(get_all(pm_iri, "column"))],
                    graph_column=col(g_iris[0]) if g_iris else None,
                    merged=get(pm_iri, "merged") == "true",
                )
            )
        tables.append(
            TableSpec(
                name=get(t_iri, "name"),
                subject_kind=get(t_iri, "subjectKind"),
                subject_columns=[
                    col(c) for c in by_index(get_all(t_iri, "subjectColumn"))
                ],
                predicates=pms,
                row_count=get(t_iri, "rowCount"),
                path=get(t_iri, "path"),
                subject_unique=get(t_iri, "subjectUnique"),
                subject_repeating=get(t_iri, "subjectRepeating"),
                storage_columns=(
                    get(t_iri, "storageColumns").split("\x00")
                    if get(t_iri, "storageColumns") is not None
                    else None
                ),
            )
        )

    namespaces = {}
    for pair in get_all(_CAT, "namespace"):
        prefix, _, ns = pair.partition("\x00")
        namespaces[prefix] = ns
    dictionaries = {}
    for pair in get_all(_CAT, "dictionary"):
        name, _, rel = pair.partition("\x00")
        dictionaries[name] = rel
    return Catalog(
        tables=tables,
        dictionaries=dictionaries,
        namespaces=namespaces,
        default_graph=get(_CAT, "defaultGraph"),
    )
