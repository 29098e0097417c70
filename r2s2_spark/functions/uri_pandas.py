"""Vectorized (pandas) IRI decomposition — same semantics as functions.uri.

Used inside the Stage E ``mapInPandas`` batch so the decomposition rides the
existing Arrow boundary instead of a 40-expression Catalyst projection
(which blows past janino's 64KB codegen limit and falls back to interpreted
eval — observed OOM at 1g driver memory; see functions/uri.py for the
Catalyst twin used by the oracle-checked operators). Equality between the
two implementations is asserted in tests/test_extract.py.

Semantics: java.net.URI parity incl. the reference's host/ssp exclusivity
(LoadIntoTable.java:318-351).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

#: output column order == functions.uri.PART_KEYS
PART_KEYS = (
    "scheme",
    "ssp",
    "authority",
    "user_info",
    "host",
    "port",
    "path",
    "query",
    "fragment",
)

_TOP_RE = (
    r"^(?:(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*):)?"
    r"(?P<ssp>[^#]*)"
    r"(?:#(?P<fragment>.*))?$"
)
_HIER_RE = (
    r"^//(?P<authority>[^/?#]*)"
    r"(?P<path>[^?]*)"
    r"(?:\?(?P<query>.*))?$"
)
_AUTH_RE = (
    r"^(?:(?P<user_info>.*)@)?"
    r"(?P<host>.*?)"
    r"(?::(?P<port>[0-9]+))?$"
)


def decompose_series(iri: pd.Series) -> pd.DataFrame:
    """IRI strings -> DataFrame with PART_KEYS columns (object dtype,
    None for absent parts). NULL input rows -> all-None rows.

    IRIs repeat heavily in real RDF (predicates, classes, hot entities):
    decompose the *distinct* values and scatter back — regex cost drops
    from O(rows) to O(uniques)."""
    codes, uniques = pd.factorize(iri, use_na_sentinel=True)
    if len(uniques) < len(iri):
        parts_u = _decompose_unique(pd.Series(uniques, dtype=object))
        out = parts_u.reindex(codes)  # -1 (NaN input) -> all-NaN row
        out.index = iri.index
        return out.astype(object).where(out.notna(), None)
    return _decompose_unique(iri)


def _decompose_unique(iri: pd.Series) -> pd.DataFrame:
    top = iri.str.extract(_TOP_RE)
    hier = top["ssp"].str.extract(_HIER_RE)
    auth = hier["authority"].str.extract(_AUTH_RE)

    out = pd.DataFrame(index=iri.index, dtype=object)
    has_host = auth["host"].notna() & (auth["host"] != "")
    host = auth["host"].where(has_host)

    out["scheme"] = top["scheme"]
    out["ssp"] = top["ssp"].where(~has_host)
    # authority only stored when host is null AND the URI was hierarchical
    out["authority"] = hier["authority"].where(
        ~has_host & hier["authority"].notna() & (hier["authority"] != "")
    )
    out["user_info"] = auth["user_info"].where(has_host)
    out["host"] = host
    out["port"] = auth["port"].where(has_host)
    out["path"] = hier["path"].where(has_host)
    out["query"] = hier["query"].where(has_host)
    out["fragment"] = top["fragment"]

    isnull = iri.isna()
    if isnull.any():
        out.loc[isnull, :] = None
    return out.astype(object).where(out.notna(), None)
