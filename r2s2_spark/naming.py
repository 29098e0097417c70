"""SQL-safe table/column naming from IRIs.

Mirrors the reference's naming contract (Naming.java:17-46,
Table.java:40-63, GroupOfColumns.java:13-91) so that golden assertions from
the reference tests (e.g. ``subject_rdf_type_fragment``,
``object_rdfs_label_langvalue``, LoadingTest.java:106-124) hold verbatim.
Names only — no data depends on this module.
"""

from __future__ import annotations

import base64
import re

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
XSD = "http://www.w3.org/2001/XMLSchema#"
OWL = "http://www.w3.org/2002/07/owl#"
GEO = "http://www.opengis.net/ont/geosparql#"
SKOS = "http://www.w3.org/2004/02/skos/core#"
FOAF = "http://xmlns.com/foaf/0.1/"
DCT = "http://purl.org/dc/terms/"
EX = "https://example.org/"

RDF_TYPE = RDF + "type"
XSD_STRING = XSD + "string"
OWL_SAMEAS = OWL + "sameAs"

#: default namespace->prefix table. The reference collects namespaces from
#: parsed files (RDF/XML @prefix); N-Triples carries none, so we register the
#: well-known ones the fixtures use. Extendable per pipeline run.
DEFAULT_NAMESPACES: dict[str, str] = {
    "rdf": RDF,
    "rdfs": RDFS,
    "xsd": XSD,
    "owl": OWL,
    "geo": GEO,
    "skos": SKOS,
    "foaf": FOAF,
    "dct": DCT,
    "ex": EX,
}

# suffixes, GroupOfColumns.java:14-33
IRI_PART_SUFFIXES = (
    "_scheme",
    "_scheme_specific_part",
    "_authority",
    "_user_info",
    "_host",
    "_port",
    "_path",
    "_query",
    "_fragment",
)
LANG = "_lang"
LANG_VALUE = "_langvalue"
DATATYPE = "_datatype"
LIT_VALUE = "_litvalue"
BNODE_ID = "_id"
GRAPH = "_graph"

_SQL_UNSAFE = re.compile(r"[^A-Za-z0-9_]")


def _local_name(iri: str) -> str:
    for sep in ("#", "/", ":"):
        idx = iri.rfind(sep)
        if idx >= 0:
            return iri[idx + 1 :]
    return iri


def iri_to_sql_name_part(iri: str, namespaces: dict[str, str] | None = None) -> str:
    """IRI -> SQL-safe name fragment (Naming.java:17-46).

    Order: core datatypes (xsd_/rdf_/geo_ + lowercase local name), then
    registered namespace ``prefix_local``, else base64 (trailing '='
    stripped, lowercased — reference quirk we keep for name parity).
    """
    namespaces = namespaces or DEFAULT_NAMESPACES
    if iri.startswith(XSD):
        return "xsd_" + _local_name(iri).lower()
    if iri.startswith(GEO):
        return "geo_" + _local_name(iri).lower()
    if iri.startswith(RDF) and _local_name(iri) in ("HTML", "XMLLiteral", "langString", "JSON"):
        # CoreDatatype.RDF covers only rdf datatypes, not rdf:type etc.
        return "rdf_" + _local_name(iri).lower()
    for prefix, ns in namespaces.items():
        if prefix and iri.startswith(ns):
            return _sanitize(f"{prefix}_{iri[len(ns):]}".lower())
    enc = base64.b64encode(iri.encode("utf-8")).decode("ascii").rstrip("=")
    return _sanitize(enc.lower())


def _sanitize(name: str) -> str:
    return _SQL_UNSAFE.sub("_", name)


def add_lang_datatype(name: str, lang: str | None, datatype: str | None) -> str:
    """Table-name suffix for the literal subtype (Table.java:46-63)."""
    if lang is not None:
        return name + "_" + lang.replace("-", "_")
    if datatype is not None:
        if datatype.startswith(XSD):
            return name + "_xsd_" + _local_name(datatype)
        if datatype.startswith(RDF):
            return name + "_rdf_" + _local_name(datatype)
        if datatype.startswith(GEO):
            return name + "_geo_" + _local_name(datatype)
        return name + "_dt"
    return name


def table_name(
    predicate: str,
    table_id: int,
    subj_kind: str,
    obj_kind: str,
    lang: str | None,
    datatype: str | None,
    namespaces: dict[str, str] | None = None,
) -> str:
    """Deterministic table name (reference: Table.java:36-44 uses an atomic
    counter ``_pred_<n>``; we prepend the predicate part for readability and
    keep a deterministic id — atomic counters are illegal in Spark tasks).
    """
    base = f"{iri_to_sql_name_part(predicate, namespaces)}_pred_{table_id}"
    return _sanitize(add_lang_datatype(f"{base}_{subj_kind}_{obj_kind}", lang, datatype))


def column_names(
    role: str,
    predicate: str,
    obj_kind: str,
    lang: str | None,
    datatype: str | None,
    namespaces: dict[str, str] | None = None,
) -> list[str]:
    """Reference-style column names for one term group
    (GroupOfColumns.java:44-68). role is 'subject' or 'object'."""
    part = iri_to_sql_name_part(predicate, namespaces)
    prefix = f"{role}_{part}"
    if obj_kind == "iri":
        return [prefix + s for s in IRI_PART_SUFFIXES]
    if obj_kind == "bnode":
        return [prefix + BNODE_ID]
    if obj_kind == "literal":
        if lang is not None:
            return [prefix + LANG, prefix + LANG_VALUE]
        dt_part = iri_to_sql_name_part(datatype or XSD_STRING, namespaces)
        return [prefix + dt_part + DATATYPE, prefix + dt_part + LIT_VALUE]
    raise ValueError(f"unsupported kind {obj_kind!r} (RDF-star TRIPLE unsupported, "
                     "matching GroupOfColumns.java:64-66)")


def graph_column_name(
    predicate: str,
    obj_kind: str,
    lang: str | None,
    datatype: str | None,
    namespaces: dict[str, str] | None = None,
) -> str:
    """Graph column name (GroupOfColumns.java:70-91). The reference declares
    the typed-literal graph column TEXT (a bug we do not copy); ours is
    always an integer graph id."""
    part = iri_to_sql_name_part(predicate, namespaces)
    prefix = f"object_{part}"
    if obj_kind == "iri":
        return prefix + "_iri" + GRAPH
    if obj_kind == "bnode":
        return prefix + "_bnode" + GRAPH
    if lang is not None:
        return prefix + LANG + GRAPH
    dt_part = iri_to_sql_name_part(datatype or XSD_STRING, namespaces)
    return prefix + dt_part + DATATYPE + GRAPH
