"""Arrow-native N-Triples/N-Quads batch parser (pyarrow.compute, RE2).

The exact-semantics twin of :mod:`ntriples`'s pandas path, kept byte-for-
byte output-compatible (asserted in tests/test_extract.py) but built on
Arrow kernels end to end:

- the line regex and the 3-level IRI decomposition run through RE2
  (``pc.extract_regex``) instead of CPython's ``re`` — ~3x faster on the
  same patterns — and string columns never materialize as Python objects
  (the pandas path pays object-array building plus an Arrow round-trip on
  both sides of the boundary);
- group presence is disambiguated by capturing each delimiter WITH its
  group (RE2 reports non-participating groups as empty strings, not
  nulls): ``<iri>`` keeps its angle brackets, ``"lit"`` its quotes,
  ``@lang``/``^^<dt>``/``#frag``/``?query``/``user@``/``:port`` their
  markers — stripped vectorized afterwards. An empty group then always
  means "absent" because every present group is non-empty by
  construction.
- IRI decomposition dictionary-encodes first (IRIs repeat heavily), runs
  the part regexes over the distinct values only, and ``take``s back.

Two deliberate fallbacks to the pandas twin (``ntriples.parse_batch``):
files whose content contains a backslash (N-Triples escape resolution is
a per-match Python substitution) and non-NT syntaxes (Turtle / RDF-XML
tokenize per file). Routing is per FILE, so one escaped literal does not
push the whole batch off the fast path.

One visible semantic nuance: RE2's ``\\s`` is ASCII whitespace while
CPython's is Unicode. The N-Triples grammar only allows ASCII space/tab
between terms, so conforming input parses identically; a line using
exotic Unicode separators errors here and parses there (both keep the
row, one with ``parse_error`` set).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..naming import XSD_STRING
from . import ntriples

_BIG = 2**30

_IRI_D = r"<[^<>\s]*>"
_BN_D = r"_:[A-Za-z0-9][A-Za-z0-9._\-]*"
#: LINE_RE with delimiters captured inside each group (see module doc)
LINE_RE_D = (
    r"^\s*"
    rf"(?:(?P<s_iri>{_IRI_D})|(?P<s_bn>{_BN_D}))"
    r"\s+"
    rf"(?P<p_iri>{_IRI_D})"
    r"\s+"
    rf"(?:(?P<o_iri>{_IRI_D})|(?P<o_bn>{_BN_D})|"
    r'(?P<o_lit>"(?:[^"\\]|\\.)*")'
    r"(?:(?P<o_lang>@[A-Za-z][A-Za-z0-9]*(?:-[A-Za-z0-9]+)*)"
    rf"|(?P<o_dt>\^\^{_IRI_D}))?)"
    r"\s*"
    rf"(?:(?P<g_iri>{_IRI_D})|(?P<g_bn>{_BN_D}))?"
    r"\s*\.\s*(?:#.*)?$"
)

_TOP_RE_D = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*:)?"
    r"(?P<ssp>[^#]*)"
    r"(?P<fragment>#.*)?$"
)
_HIER_RE_D = (
    r"^//(?P<authority>[^/?#]*)"
    r"(?P<path>[^?]*)"
    r"(?P<query>\?.*)?$"
)
_AUTH_RE_D = r"^(?P<user_info>.*@)?(?P<host>.*?)(?P<port>:[0-9]+)?$"


def _schema(decompose: bool) -> pa.Schema:
    cols = ntriples.DECOMPOSED_COLUMNS if decompose else ntriples.STATEMENT_COLUMNS
    return pa.schema(
        [(c, pa.int64() if c == "line_no" else pa.string()) for c in cols]
    )


_NULL_STR = pa.scalar(None, pa.string())


def _present(g):
    """Delimiter-carrying group -> boolean presence (empty = absent;
    null struct rows stay null and propagate)."""
    return pc.not_equal(g, "")


def _opt(g, start: int, stop: int = _BIG):
    """Delimiter-carrying group -> stripped value or null when absent."""
    return pc.if_else(_present(g), pc.utf8_slice_codeunits(g, start, stop), _NULL_STR)


def decompose_arrow(iri: pa.Array) -> dict[str, pa.Array]:
    """IRI strings -> {part: array} with java.net.URI-parity semantics —
    the Arrow twin of uri_pandas.decompose_series (dictionary-encoded:
    part regexes run over distinct values only)."""
    de = pc.dictionary_encode(iri)
    u, idx = de.dictionary, de.indices

    top = pc.extract_regex(u, _TOP_RE_D)
    scheme_g = pc.struct_field(top, "scheme")
    ssp = pc.struct_field(top, "ssp")
    frag_g = pc.struct_field(top, "fragment")
    hier = pc.extract_regex(ssp, _HIER_RE_D)
    auth_g = pc.struct_field(hier, "authority")
    path = pc.struct_field(hier, "path")
    query_g = pc.struct_field(hier, "query")
    auth = pc.extract_regex(auth_g, _AUTH_RE_D)
    ui_g = pc.struct_field(auth, "user_info")
    host_g = pc.struct_field(auth, "host")
    port_g = pc.struct_field(auth, "port")

    # host presence decides the hierarchical-vs-opaque split (null -> False)
    has_host = pc.fill_null(pc.not_equal(host_g, ""), False)
    not_host = pc.invert(has_host)

    def where(cond, val):
        return pc.if_else(pc.fill_null(cond, False), val, _NULL_STR)

    parts = {
        "scheme": _opt(scheme_g, 0, -1),
        "ssp": where(not_host, ssp),
        "authority": where(
            pc.and_(not_host, pc.fill_null(pc.not_equal(auth_g, ""), False)), auth_g
        ),
        # present-but-empty user_info ("http://@h/x") stays '' — the @ is
        # the presence marker, the slice is the stored value
        "user_info": where(
            pc.and_(has_host, _present(ui_g)),
            pc.utf8_slice_codeunits(ui_g, 0, -1),
        ),
        "host": where(has_host, host_g),
        "port": where(
            pc.and_(has_host, _present(port_g)),
            pc.utf8_slice_codeunits(port_g, 1, _BIG),
        ),
        "path": where(has_host, path),
        "query": where(
            pc.and_(has_host, _present(query_g)),
            pc.utf8_slice_codeunits(query_g, 1, _BIG),
        ),
        "fragment": _opt(frag_g, 1),
    }
    return {k: pc.take(v, idx) for k, v in parts.items()}


def parse_nt_arrow(
    content: pa.Array, sha: pa.Array, default_graph: str, decompose: bool
) -> pa.RecordBatch:
    """Vectorized NT/NQ parse of escape-free files (see module doc for
    the fallback contract) -> one RecordBatch of statement rows."""
    schema = _schema(decompose)
    lines_list = pc.split_pattern(content, "\n")
    file_idx = pc.list_parent_indices(lines_list)
    lines = pc.list_flatten(lines_list)
    counts = pc.list_value_length(lines_list).to_numpy(zero_copy_only=False)
    starts = np.repeat(np.cumsum(counts) - counts, counts)
    line_no = np.arange(len(starts), dtype=np.int64) - starts + 1

    stripped = pc.utf8_trim_whitespace(lines)
    keep = pc.and_(
        pc.greater(pc.binary_length(stripped), 0),
        pc.invert(pc.starts_with(stripped, "#")),
    )
    keep_np = keep.to_numpy(zero_copy_only=False)
    stripped = pc.filter(stripped, keep)
    file_idx = pc.filter(file_idx, keep)
    line_no = line_no[keep_np]
    if len(stripped) == 0:
        return pa.RecordBatch.from_pylist([], schema=schema)

    g = pc.extract_regex(stripped, LINE_RE_D)
    f = {n: pc.struct_field(g, n) for n in (
        "s_iri", "s_bn", "p_iri", "o_iri", "o_bn", "o_lit", "o_lang", "o_dt",
        "g_iri", "g_bn",
    )}

    s_is_iri = _present(f["s_iri"])
    o_is_iri = _present(f["o_iri"])
    o_is_bn = _present(f["o_bn"])
    lang_p = _present(f["o_lang"])

    out = {
        "file_sha256": pc.take(sha, file_idx),
        "line_no": pa.array(line_no, pa.int64()),
        "s_kind": pc.if_else(s_is_iri, "iri", "bnode"),
        "s_lex": pc.if_else(
            s_is_iri,
            pc.utf8_slice_codeunits(f["s_iri"], 1, -1),
            pc.utf8_slice_codeunits(f["s_bn"], 2, _BIG),
        ),
        "p_iri": pc.utf8_slice_codeunits(f["p_iri"], 1, -1),
        "o_kind": pc.if_else(
            o_is_iri, "iri", pc.if_else(o_is_bn, "bnode", "literal")
        ),
        "o_lex": pc.if_else(
            o_is_iri,
            pc.utf8_slice_codeunits(f["o_iri"], 1, -1),
            pc.if_else(
                o_is_bn,
                pc.utf8_slice_codeunits(f["o_bn"], 2, _BIG),
                pc.utf8_slice_codeunits(f["o_lit"], 1, -1),
            ),
        ),
        "o_lang": _opt(f["o_lang"], 1),
        # plain literal (no lang, no ^^datatype) -> xsd:string
        "o_datatype": pc.if_else(
            pc.and_(pc.and_(pc.invert(o_is_iri), pc.invert(o_is_bn)), pc.invert(lang_p)),
            pc.if_else(
                _present(f["o_dt"]),
                pc.utf8_slice_codeunits(f["o_dt"], 3, -1),
                pa.scalar(XSD_STRING, pa.string()),
            ),
            _NULL_STR,
        ),
        # bnode graph labels keep their _: prefix as an opaque graph name
        "g_iri": pc.if_else(
            _present(f["g_iri"]),
            pc.utf8_slice_codeunits(f["g_iri"], 1, -1),
            pc.if_else(
                _present(f["g_bn"]), f["g_bn"], pa.scalar(default_graph, pa.string())
            ),
        ),
        "parse_error": pc.if_else(
            pc.is_valid(g), _NULL_STR, pc.utf8_slice_codeunits(stripped, 0, 200)
        ),
    }
    if decompose:
        s_parts = decompose_arrow(pc.if_else(s_is_iri, out["s_lex"], _NULL_STR))
        o_parts = decompose_arrow(pc.if_else(o_is_iri, out["o_lex"], _NULL_STR))
        for k in ntriples.uri_pandas.PART_KEYS:
            out[f"s_{k}"] = s_parts[k]
            out[f"o_{k}"] = o_parts[k]
    return pa.RecordBatch.from_arrays(
        [
            pa.array(out[c]) if isinstance(out[c], np.ndarray) else out[c]
            for c in schema.names
        ],
        schema=schema,
    )


def _pandas_fallback(
    batch: pa.RecordBatch, default_graph: str, decompose: bool
) -> pa.RecordBatch:
    pdf = batch.to_pandas()
    out = ntriples.parse_batch(pdf, default_graph, decompose)
    return pa.RecordBatch.from_pandas(
        out, schema=_schema(decompose), preserve_index=False
    )


def parse_iterator_arrow(
    batches: Iterator[pa.RecordBatch], default_graph: str, decompose: bool = False
) -> Iterator[pa.RecordBatch]:
    """Adapter for ``DataFrame.mapInArrow``: escape-free NT files take the
    Arrow fast path, escape-free LINE-ORIENTED Turtle files the vectorized
    Turtle subset (:mod:`turtle_arrow` — files it cannot prove eligible
    fall through to the tokenizer); escaped files, remaining Turtle and
    RDF-XML take the pandas/per-file twin — all routed per FILE."""
    from .turtle_arrow import parse_turtle_arrow

    for batch in batches:
        if batch.num_rows == 0:
            continue
        content = batch.column("content")
        sha = batch.column("file_sha256")
        is_nt = None
        is_ttl = None
        if "lang" in batch.schema.names:
            lang = batch.column("lang")
            is_nt = pc.invert(
                pc.is_in(
                    lang,
                    value_set=pa.array(
                        ["turtle", "ttl", "rdfxml", "rdf", "xml", "rdf/xml"]
                    ),
                )
            )
            # NULL lang -> NT (matches the pandas dispatch's isin defaults)
            is_nt = pc.fill_null(is_nt, True)
            is_ttl = pc.fill_null(
                pc.is_in(lang, value_set=pa.array(["turtle", "ttl"])), False
            )
        no_esc = pc.invert(pc.match_substring(content, "\\"))
        fast = no_esc if is_nt is None else pc.and_(is_nt, no_esc)
        n_fast = pc.sum(fast).as_py() or 0
        if n_fast == batch.num_rows:
            yield parse_nt_arrow(content, sha, default_graph, decompose)
            continue
        if n_fast:
            yield parse_nt_arrow(
                pc.filter(content, fast), pc.filter(sha, fast), default_graph, decompose
            )
        slow_mask = pc.invert(fast)
        if is_ttl is not None:
            ttl_try = pc.and_(is_ttl, no_esc)
            if pc.sum(ttl_try).as_py() or 0:
                ttl_content = pc.filter(content, ttl_try)
                ttl_sha = pc.filter(sha, ttl_try)
                rb, ok_ttl = parse_turtle_arrow(
                    ttl_content, ttl_sha, default_graph, decompose
                )
                if rb.num_rows:
                    yield rb
                # files the fast path proved eligible leave the slow set
                ok_np = ok_ttl.to_numpy(zero_copy_only=False)
                try_np = ttl_try.to_numpy(zero_copy_only=False)
                slow_np = slow_mask.to_numpy(zero_copy_only=False).copy()
                slow_np[try_np] = ~ok_np
                slow_mask = pa.array(slow_np)
        slow = batch.filter(slow_mask)
        if slow.num_rows:
            yield _pandas_fallback(slow, default_graph, decompose)
