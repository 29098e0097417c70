"""Vectorized N-Triples / N-Quads batch parser (pandas, Arrow-friendly).

The reference parses with rdf4j Rio on a thread pool, one file per thread
(ParseIntoSOGTables.java:91-96,402-445). Our parser is a *batch* pandas
program meant to run inside ``mapInPandas``: one Arrow batch of
``source_files`` rows in, one batch of statement rows out. N-Triples is
line-oriented, so the whole parse is pandas str ops + one compiled regex —
no per-row Python UDF, per the input contract.

Output statement columns (the pre-decomposition IR; SURVEY.md §3.1):
  repo, path, commit, file_sha256, line_no,
  s_kind ('iri'|'bnode'), s_lex (IRI string | bnode label),
  p_iri,
  o_kind ('iri'|'bnode'|'literal'), o_lex (IRI | label | lexical form),
  o_lang (lang tag | NULL), o_datatype (datatype IRI | NULL for non-literal),
  g_iri (explicit quad graph, else the per-file default graph —
         ParseIntoSOGTables.java:355-357).

Plain literals get xsd:string (RDF 1.1). RDF-star quoted triples are
rejected, matching the reference (GroupOfColumns.java:64-66).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd

from ..functions import uri_pandas
from ..naming import XSD_STRING

# One compiled regex per line. Literal bodies honour N-Triples escapes
# (\" inside is matched by the (?:[^"\\]|\\.)* alternation).
_IRI = r"<(?P<{0}>[^<>\s]*)>"
_BN = r"(?P<{0}>_:[A-Za-z0-9][A-Za-z0-9._\-]*)"
LINE_RE = re.compile(
    r"^\s*"
    rf"(?:{_IRI.format('s_iri')}|{_BN.format('s_bn')})"
    r"\s+"
    rf"{_IRI.format('p_iri')}"
    r"\s+"
    rf"(?:{_IRI.format('o_iri')}|{_BN.format('o_bn')}|"
    r'"(?P<o_lit>(?:[^"\\]|\\.)*)"'
    r"(?:@(?P<o_lang>[A-Za-z][A-Za-z0-9]*(?:-[A-Za-z0-9]+)*)"
    rf"|\^\^{_IRI.format('o_dt')})?)"
    r"\s*"
    rf"(?:{_IRI.format('g_iri')}|{_BN.format('g_bn')})?"
    r"\s*\.\s*(?:#.*)?$"
)

_ESCAPE_RE = re.compile(r"\\(?:[tbnrf\"'\\]|u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8})")
_ESCAPE_MAP = {
    "t": "\t",
    "b": "\b",
    "n": "\n",
    "r": "\r",
    "f": "\f",
    '"': '"',
    "'": "'",
    "\\": "\\",
}


def _unescape_one(m: re.Match) -> str:
    body = m.group(0)[1:]
    if body[0] in "uU":
        return chr(int(body[1:], 16))
    return _ESCAPE_MAP[body]


def _unescape(col: pd.Series) -> pd.Series:
    """Resolve N-Triples escapes; fast path skips rows without backslash."""
    mask = col.str.contains("\\", regex=False, na=False)
    if mask.any():
        col = col.copy()
        col.loc[mask] = col.loc[mask].str.replace(_ESCAPE_RE, _unescape_one, regex=True)
    return col


STATEMENT_COLUMNS = [
    "file_sha256",
    "line_no",
    "s_kind",
    "s_lex",
    "p_iri",
    "o_kind",
    "o_lex",
    "o_lang",
    "o_datatype",
    "g_iri",
    "parse_error",
]

STATEMENT_SCHEMA = (
    "file_sha256 string, "
    "line_no bigint, s_kind string, s_lex string, p_iri string, "
    "o_kind string, o_lex string, o_lang string, o_datatype string, "
    "g_iri string, parse_error string"
)

_PART_COLS = [f"{role}_{k}" for role in ("s", "o") for k in uri_pandas.PART_KEYS]
DECOMPOSED_COLUMNS = STATEMENT_COLUMNS + _PART_COLS
DECOMPOSED_SCHEMA = STATEMENT_SCHEMA + ", " + ", ".join(f"{c} string" for c in _PART_COLS)


def parse_batch(pdf: pd.DataFrame, default_graph: str, decompose: bool = False) -> pd.DataFrame:
    """Parse one batch of source_files rows into statement rows.

    ``pdf`` needs columns content, file_sha256 (the sha256 is computed
    JVM-side with ``F.sha2`` *before* the Python boundary so the per-row
    invariant is anchored to Spark, not Python) and optionally ``lang``:
    rows tagged turtle/ttl go through the Turtle tokenizer, rows tagged
    rdfxml/rdf/xml through the RDF/XML parser, all others through the
    vectorized N-Triples/N-Quads line parser (mirrors the reference's
    per-extension Rio format choice, ParseIntoSOGTables.java:138-141).
    """
    cols = DECOMPOSED_COLUMNS if decompose else STATEMENT_COLUMNS
    if len(pdf) == 0:
        return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})

    if "lang" in pdf.columns:
        is_ttl = pdf["lang"].isin(("turtle", "ttl"))
        is_xml = pdf["lang"].isin(("rdfxml", "rdf", "xml", "rdf/xml"))
        if is_ttl.any() or is_xml.any():
            parts = []
            if is_ttl.any():
                parts.append(_parse_per_file_rows(pdf[is_ttl], default_graph, "turtle"))
            if is_xml.any():
                parts.append(_parse_per_file_rows(pdf[is_xml], default_graph, "rdfxml"))
            rest = ~(is_ttl | is_xml)
            if rest.any():
                parts.append(_parse_nt_rows(pdf[rest], default_graph))
            out = pd.concat(parts, ignore_index=True)
            return _finish(out, decompose, cols)
    out = _parse_nt_rows(pdf, default_graph)
    return _finish(out, decompose, cols)


def _finish(out: pd.DataFrame, decompose: bool, cols: list[str]) -> pd.DataFrame:
    if decompose:
        s_parts = uri_pandas.decompose_series(out["s_lex"].where(out["s_kind"] == "iri"))
        o_parts = uri_pandas.decompose_series(out["o_lex"].where(out["o_kind"] == "iri"))
        for k in uri_pandas.PART_KEYS:
            out[f"s_{k}"] = s_parts[k]
            out[f"o_{k}"] = o_parts[k]
    return out[cols]


def _parse_per_file_rows(pdf: pd.DataFrame, default_graph: str, syntax: str) -> pd.DataFrame:
    """Context-sensitive syntaxes -> statement frame (per-file parsers:
    sources/turtle tokenizer or sources/rdfxml ElementTree walker)."""
    if syntax == "turtle":
        from .turtle import parse_turtle as parse_fn
    else:
        from .rdfxml import parse_rdfxml as parse_fn

    rows: list[tuple] = []
    for sha, content in zip(pdf["file_sha256"], pdf["content"]):
        stmts, errors = parse_fn(content, default_graph)
        for ln, s_kind, s_lex, p_iri, o_kind, o_lex, o_lang, o_dt, g in stmts:
            rows.append((sha, ln, s_kind, s_lex, p_iri, o_kind, o_lex, o_lang, o_dt, g, None))
        for ln, msg in errors:
            rows.append((sha, ln, None, None, None, None, None, None, None, None, msg[:200]))
    return pd.DataFrame(rows, columns=STATEMENT_COLUMNS).astype(object)


def _parse_nt_rows(pdf: pd.DataFrame, default_graph: str) -> pd.DataFrame:
    """Vectorized N-Triples/N-Quads path (line-oriented pandas ops)."""
    lines_per_file = pdf["content"].str.split("\n")
    counts = lines_per_file.str.len().to_numpy()
    file_idx = np.repeat(np.arange(len(pdf)), counts)
    lines = pd.Series(np.concatenate(lines_per_file.to_numpy()), dtype=object)
    line_no = pd.Series(
        np.concatenate([np.arange(1, c + 1) for c in counts]), dtype="int64"
    )

    stripped = lines.str.strip()
    keep = (stripped.str.len() > 0) & ~stripped.str.startswith("#")
    stripped = stripped[keep]
    line_no = line_no[keep]
    file_idx = file_idx[keep.to_numpy()]
    if len(stripped) == 0:
        return pd.DataFrame({c: pd.Series(dtype=object) for c in STATEMENT_COLUMNS})

    has_escapes = stripped.str.contains("\\", regex=False).any()
    g = stripped.str.extract(LINE_RE)

    out = pd.DataFrame(index=g.index)
    # statement rows carry ONLY the content hash; repo/path/commit live in
    # the per-file dictionary (E/files) — 3 fewer object columns per
    # statement is a double-digit allocation cut at 32 parallel workers
    out["file_sha256"] = pdf["file_sha256"].iloc[file_idx].to_numpy()
    out["line_no"] = line_no.to_numpy()

    if not has_escapes:
        unescape = lambda col: col  # noqa: E731 — no backslash in batch
    else:
        unescape = _unescape

    s_is_iri = g["s_iri"].notna()
    o_is_iri = g["o_iri"].notna()
    o_is_bn = g["o_bn"].notna()
    matched = g["p_iri"].notna()

    out["s_kind"] = np.where(s_is_iri, "iri", "bnode")
    out["s_lex"] = unescape(g["s_iri"]).where(s_is_iri, g["s_bn"].str[2:])
    out["p_iri"] = unescape(g["p_iri"])
    out["o_kind"] = np.select(
        [o_is_iri, o_is_bn], ["iri", "bnode"], default="literal"
    )
    out["o_lex"] = (
        unescape(g["o_iri"])
        .where(o_is_iri, g["o_bn"].str[2:])
        .where(o_is_iri | o_is_bn, unescape(g["o_lit"]))
    )
    out["o_lang"] = g["o_lang"]
    # plain literal (no lang, no ^^datatype) -> xsd:string
    out["o_datatype"] = np.where(
        (out["o_kind"] == "literal") & g["o_lang"].isna(),
        unescape(g["o_dt"]).fillna(XSD_STRING),
        None,
    )
    # bnode graph labels keep their _: prefix as an opaque graph name
    out["g_iri"] = (
        unescape(g["g_iri"]).where(g["g_iri"].notna(), g["g_bn"]).fillna(default_graph)
    )
    out["parse_error"] = None

    bad = ~matched
    if bad.any():
        for c in ("s_kind", "s_lex", "p_iri", "o_kind", "o_lex", "o_lang", "o_datatype"):
            out.loc[bad, c] = None
        out.loc[bad, "g_iri"] = None
        out.loc[bad, "parse_error"] = stripped[bad].str.slice(0, 200)
    return out


def parse_iterator(
    batches: Iterator[pd.DataFrame], default_graph: str, decompose: bool = False
) -> Iterator[pd.DataFrame]:
    """Adapter for ``DataFrame.mapInPandas``."""
    for pdf in batches:
        yield parse_batch(pdf, default_graph, decompose)
