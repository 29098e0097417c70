"""Textual SPARQL front-end: parse a SPARQL SELECT string and compile it
through :mod:`r2s2_spark.plans.sparql` to a DataFrame.

The reference exposes textual SPARQL through Ontop over its R2RML mapping
(SparqlOnLoadedTest.java:111-127 runs ``SELECT DISTINCT ?type FROM
<http://example.org/graph> WHERE {[] a ?type}`` verbatim); this module is
the Spark-side equivalent so a reference user can paste their query
strings unchanged. Parsing is a small recursive-descent pass; ALL
execution semantics live in ``sparql.bgp`` (predicate-pruned scans,
Catalyst joins) — the parser only builds the pattern/modifier structure.

Supported surface (SPARQL 1.1):
- query forms: ``SELECT``, ``ASK`` (one-row boolean frame), ``CONSTRUCT``
  (template instantiation to a (subject, predicate, object) triple frame,
  set semantics), ``DESCRIBE`` (subject-oriented description of constant
  and/or WHERE-bound resources)
- prologue: ``PREFIX``, ``BASE``
- ``SELECT [DISTINCT] ?v ... | * | (AGG(...) AS ?v)`` with COUNT / SUM /
  AVG / MIN / MAX / SAMPLE / GROUP_CONCAT(?v; SEPARATOR="...")
  (+ DISTINCT inside COUNT/GROUP_CONCAT), ``GROUP BY`` (vars and
  ``(expr [AS ?v])`` conditions — the expression binds per solution
  before grouping), ``HAVING``
  (aggregates compile to hidden agg columns; GROUP_CONCAT sorts its
  operands and SAMPLE picks MIN — deterministic choices the spec leaves
  open)
- ``FROM <iri>`` / ``FROM NAMED <iri>`` (SPARQL §13.2 dataset clause:
  repeated FROM merges the graphs into the query's default graph — one
  isin() dataset filter; FROM NAMED restricts the graphs GRAPH blocks
  may touch; with any dataset clause present the dataset is exactly what
  is listed — FROM without FROM NAMED leaves GRAPH blocks nothing to
  match, FROM NAMED without FROM leaves the default graph empty)
- ``WHERE { ... }`` group: triple blocks with ``;`` / ``,`` / ``a`` /
  ``[]`` / ``_:b`` abbreviations, property paths (``^``, ``/``, ``|``
  incl. sequence branches like ``(p1/p2)|p3``, ``+``, ``*``, ``?`` —
  closures compose over compound paths like ``(p1/p2)+`` —
  ``!(p1|^p2|...)`` negated sets incl. inverse members per §9.2,
  parens), OPTIONAL, FILTER (expression subset
  below), FILTER [NOT] EXISTS, MINUS, BIND, GRAPH <iri>|?g { ... }
  (fully general scoping: multiple distinct GRAPH scopes per group,
  GRAPH blocks mixed with default-graph patterns, cross-graph joins on
  shared variables, OPTIONAL/MINUS/EXISTS groups carrying their own
  GRAPH scope, GRAPH wrapping OPTIONAL/MINUS/EXISTS/BIND/VALUES/UNION —
  each pattern carries its scope as a 4-tuple, resolved per pattern by
  ``plans/sparql._join_patterns``),
  UNION groups (standalone, joined with the rest of the group on shared
  variables, or SEVERAL blocks per group joining each other; branches
  may carry their own FILTER/BIND), ``VALUES`` inline data incl. UNDEF
  wildcards (rows joined on their defined cells only),
  sub-``SELECT`` groups (evaluated first, joined on shared variables;
  also inside ASK/CONSTRUCT/DESCRIBE WHERE groups)
- solution modifiers: ``ORDER BY [ASC|DESC](expr)`` (multi-key, one
  sort), ``LIMIT``, ``OFFSET``, trailing ``VALUES``

FILTER/BIND expression subset: ``|| && !``, comparisons (numeric when one
side is a numeric literal — lexical values try_cast to double; string
equality otherwise), ``IN`` / ``NOT IN`` lists, arithmetic, ``BOUND
CONTAINS STRSTARTS STRENDS STRBEFORE STRAFTER REPLACE STRLEN UCASE
LCASE CONCAT SUBSTR REGEX COALESCE IF SAMETERM``, hashes ``MD5 SHA1
SHA256 SHA384 SHA512``, ``ENCODE_FOR_URI``, the xsd:dateTime component
accessors ``YEAR MONTH DAY HOURS MINUTES SECONDS TZ`` (read from the
LEXICAL form — the literal's own timezone is never shifted), ``IRI()/
URI()`` (RFC 3986 §5.3 merge against the prologue BASE, dot-segments
not normalized), ``STRDT/STRLANG`` (the lexical binds; a CONSTANT
type/tag annotation is carried as the result's static term shape, so
``LANG(STRLANG(?x, "en"))`` and ``DATATYPE(STRDT(?x, xsd:token))``
constant-fold; a computed annotation stays unknown — documented),
``UUID STRUUID RAND NOW BNODE() TIMEZONE``, and the term-inspection
family ``LANG() DATATYPE() LANGMATCHES() isIRI() isBlank() isLiteral()
isNumeric()`` — variables inside these make the compiler carry hidden
per-variable term-metadata columns (``plans/sparql.py`` ``term_meta``),
constant-folded per predicate map (object/subject kinds are catalog
metadata, known at plan time); NON-variable arguments constant-fold on
the expression's statically-known term shape (literal constants incl.
``@tag``/``^^dt`` annotations, numbers per §19.8, string-function
results per §17.4/§17.5 result types — ``DATATYPE(STR(?x))`` is
xsd:string, ``LANG(CONCAT(?a, "x"))`` is ``""`` because one untagged
argument forces a simple literal per §17.4.3.12,
``LANG(<iri>)`` is the spec's type error NULL), with
statically-unknown shapes a named error. Joins still compare lexical
forms — a documented narrowing; term inspection over a variable never
bound in a pattern position yields NULL (the spec's type error).

CONSTRUCT/DESCRIBE breadth: ``DESCRIBE *`` (every WHERE-bound variable),
UNION inside ASK/CONSTRUCT/DESCRIBE WHERE groups (pure or mixed with
required patterns), sequence paths in CONSTRUCT templates (``?s p1/p2
?o`` chains through fresh per-solution blank nodes), blank nodes in
CONSTRUCT templates (fresh per solution, SPARQL §16.2.1), and the
``CONSTRUCT WHERE { ... }`` shorthand (§16.2.4 — the plain-BGP WHERE
group doubles as the template; modifiers/GRAPH/paths rejected by name
per the grammar).

Modifier groups nest: OPTIONAL/MINUS/EXISTS bodies and UNION branches
are full sub-groups with their own OPTIONAL/MINUS/EXISTS/FILTER/BIND/
VALUES/UNION and sub-SELECTs (compiled recursively,
``plans/sparql._group_frame``; sub-SELECTs pre-compile to solution
frames, ``_resolve_subselects``). A FILTER inside such a group applies
to the group's own solutions; one that references variables bound only
OUTSIDE the group compiles as the JOIN CONDITION for OPTIONAL (the
spec's LeftJoin(Ω1, Ω2, expr) — failing rows keep the required solution
with the group unbound) and for (NOT) EXISTS (§8.1.2 correlation); in
MINUS or a UNION branch it stays a named error (§8.3: MINUS evaluates
independently). Sub-SELECTs also work inside GRAPH blocks with a
CONSTANT scope (the subquery's WHERE evaluates in that graph).

Aggregates work inside ORDER BY keys (``ORDER BY DESC(COUNT(?s))`` —
hidden agg columns kept through the sort, projected after), except
combined with DISTINCT (named narrowing: DISTINCT applies to projected
rows before the sort), and inside SELECT expressions
(``SELECT (COUNT(?s)*2 AS ?d)`` — the expression runs post-grouping
over its hidden agg columns and the group keys).

Out of scope (raises ``SparqlUnsupported`` with the construct named):
sub-SELECT inside a GRAPH ?var block (the per-solution graph binding
would have to correlate through the subquery's projection),
non-sequence paths in CONSTRUCT templates, DISTINCT with aggregate
ORDER BY keys, LANG()/DATATYPE() over MULTIPLE pure-UNION blocks
(duplicate metadata columns would collide in the join — a SINGLE
pure-UNION block works: each branch carries the term metadata,
non-binding branches union in NULL = the spec's type error),
HTTP federation (SERVICE evaluates against endpoints REGISTERED via
``KgPipeline.register_service`` — other loaded pipelines; ``SERVICE
?e`` ranges over the registry binding each IRI; an unregistered IRI is
named, SILENT yields the spec's empty solution). The programmatic
``bgp()`` surface remains the escape hatch.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from ..naming import RDF, XSD
from .sparql import (
    META_DT,
    META_KIND,
    META_LANG,
    Literal,
    PathAlt,
    PathInverse,
    PathNeg,
    PathOpt,
    PathPlus,
    PathSeq,
    PathStar,
    SparqlCompileError,
    bgp,
    bgp_union,
)


_AGG_NAMES = ("COUNT", "SUM", "AVG", "MIN", "MAX", "GROUP_CONCAT", "SAMPLE")

#: static-shape datatype marker for builtins whose result is NUMERIC but
#: whose exact XSD type follows the argument (ABS/CEIL/FLOOR/ROUND/RAND):
#: isNumeric() folds true-when-bound on it, DATATYPE() stays a named error
_NUMERIC_UNKNOWN = "\x00numeric"

#: the XSD numeric datatypes isNumeric() recognizes (SPARQL §17.4.2.4
#: over the XPath atomic numeric types and their derived types)
_NUMERIC_DTS = frozenset(
    "http://www.w3.org/2001/XMLSchema#" + t
    for t in (
        "integer", "decimal", "double", "float", "int",
        "long", "short", "byte", "nonNegativeInteger",
        "positiveInteger", "unsignedInt", "unsignedLong",
    )
)

#: VALUES UNDEF wildcard marker: the row leaves the variable unbound and
#: the inline-data join ignores it for that row (see sparql.join_values)
UNDEF = None


class SparqlUnsupported(SparqlCompileError):
    """Query uses a construct outside the supported subset.

    Subclasses ``sparql.SparqlCompileError`` so compile-time narrowings
    raised below the parser (e.g. a MINUS-group FILTER referencing outer
    variables) are caught by the same ``except SparqlUnsupported``-style
    handlers users already write against ``SparqlCompileError``."""


class SparqlSyntaxError(Exception):
    pass


_TOKEN = re.compile(
    r"""
      (?P<ws>\s+|\#[^\n]*)
    | (?P<iri><[^<>\s{}|^`\\]*>)
    | (?P<string>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
    | (?P<var>[?$][A-Za-z_][A-Za-z0-9_]*)
    | (?P<bnode>_:[A-Za-z0-9_]+)
    | (?P<number>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
    | (?P<pname>[A-Za-z_][A-Za-z0-9_.\-]*?:[A-Za-z0-9_.\-]*|:[A-Za-z0-9_.\-]*)
    | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<op>\^\^|&&|\|\||!=|<=|>=|[{}().;,*/|^?+!<>=\[\]$@-])
    """,
    re.VERBOSE,
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m:
            raise SparqlSyntaxError(f"lex error at {text[pos:pos + 30]!r}")
        if m.lastgroup != "ws":
            out.append((m.lastgroup, m.group(0)))
        pos = m.end()
    out.append(("eof", ""))
    return out


class _Parser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self.anon = 0
        # when parsing HAVING, aggregate calls compile to hidden agg
        # columns registered here (name -> agg lambda)
        self.agg_sink: dict | None = None
        self.hidden = 0
        # variables appearing inside LANG()/DATATYPE(): the compiler
        # carries hidden term-metadata columns for exactly these
        self.meta_vars: set[str] = set()
        # every variable referenced by an EXPRESSION (filter, BIND,
        # SELECT expr, ORDER BY key, HAVING, aggregate argument) of the
        # query currently being parsed — select_query scopes this per
        # (sub)query and stows the set in q["expr_vars"]. Expressions
        # compile to opaque lambdas, so structural facts like "does this
        # subquery's FILTER mention ?g" must be recorded at parse time
        # (the GRAPH ?var alpha-rename in _annotate_subselect_graph_var
        # is the consumer)
        self.expr_vars: set[str] = set()

    # -- token helpers ----------------------------------------------------
    def peek(self, k: int = 0) -> tuple[str, str]:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> tuple[str, str]:
        # clamp at the trailing eof token: consuming past end-of-input
        # (e.g. a bare 'PREFIX') must surface as a syntax error from the
        # caller, not an IndexError
        t = self.toks[min(self.i, len(self.toks) - 1)]
        self.i += 1
        return t

    def at_word(self, *words: str) -> bool:
        kind, val = self.peek()
        return kind == "word" and val.upper() in words

    def eat_word(self, word: str) -> None:
        kind, val = self.next()
        if kind != "word" or val.upper() != word:
            raise SparqlSyntaxError(f"expected {word}, got {val!r}")

    def eat_op(self, op: str) -> None:
        kind, val = self.next()
        if val != op:
            raise SparqlSyntaxError(f"expected {op!r}, got {val!r}")

    def _dataset_clause(self, q: dict) -> None:
        """FROM <iri> / FROM NAMED <iri> clauses -> q["graph"] (default
        graph: one IRI, or a tuple that merges per SPARQL §13.2) and
        q["named"] (tuple of named-graph IRIs, or None when no FROM NAMED
        appears). When ANY dataset clause is present the dataset is
        exactly what is listed: FROM without FROM NAMED leaves GRAPH
        blocks an EMPTY named-graph set (q["named"] = ())."""
        froms, named = [], []
        saw_clause = False
        while self.at_word("FROM"):
            self.next()
            saw_clause = True
            if self.at_word("NAMED"):
                self.next()
                kind, val = self.next()
                named.append(self._iri(val) if kind == "iri" else self._pname(val))
            else:
                kind, val = self.next()
                froms.append(self._iri(val) if kind == "iri" else self._pname(val))
        if froms:
            # repeated FROM merges the graphs into the query's default
            # graph (SPARQL §13.2) — compiles to one isin() dataset filter
            q["graph"] = froms[0] if len(froms) == 1 else tuple(froms)
        q["named"] = tuple(named) if saw_clause else None

    def int_modifier(self, what: str) -> int:
        """LIMIT/OFFSET operand: must be a non-negative INTEGER token —
        anything else (a var, a decimal, EOF) is a syntax error, keeping
        the parser total (SparqlSyntaxError, never ValueError)."""
        kind, val = self.next()
        if kind != "number" or not re.fullmatch(r"[+-]?\d+", val):
            raise SparqlSyntaxError(f"{what} expects an integer, got {val!r}")
        n = int(val)
        if n < 0:
            raise SparqlSyntaxError(f"{what} expects a non-negative integer")
        return n

    # -- terms ------------------------------------------------------------
    def _iri(self, raw: str) -> str:
        inner = raw[1:-1]
        if self.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", inner):
            from ..sources.iri import resolve

            return resolve(inner, self.base)
        return inner

    def _pname(self, raw: str) -> str:
        p, _, local = raw.partition(":")
        if p not in self.prefixes:
            raise SparqlSyntaxError(f"unknown prefix {p!r}:")
        return self.prefixes[p] + local

    def fresh_var(self) -> str:
        self.anon += 1
        return f"?__anon{self.anon}"

    def term(self, position: str):
        """One s/p/o term. Returns a str (var or IRI), Literal, or raises."""
        kind, val = self.peek()
        if kind == "var":
            self.next()
            return "?" + val[1:]
        if kind == "iri":
            self.next()
            return self._iri(val)
        if kind == "pname":
            self.next()
            return self._pname(val)
        if kind == "bnode":
            self.next()
            # a query bnode is an anonymous variable scoped to the query
            return "?__bn_" + val[2:]
        if kind == "word" and val == "a":
            self.next()
            return RDF + "type"
        if val == "[":
            self.next()
            self.eat_op("]")
            return self.fresh_var()
        if kind == "string":
            self.next()
            lex = _unquote(val)
            nk, nv = self.peek()
            if nv == "@":
                self.next()
                k2, v2 = self.next()
                # language tags may lex as word('en') ['-' word('UK')]*
                tag = v2
                while self.peek()[1] == "-":
                    self.next()
                    tag += "-" + self.next()[1]
                return Literal(lex, lang=tag)
            if nv == "^^":
                self.next()
                k2, v2 = self.next()
                dt = self._iri(v2) if k2 == "iri" else self._pname(v2)
                return Literal(lex, datatype=dt)
            return lex if position == "o" else lex
        if kind == "number":
            self.next()
            return Literal(val)
        raise SparqlSyntaxError(f"unexpected term {val!r} in {position}")

    # -- property paths ---------------------------------------------------
    def path(self):
        return self._path_alt()

    def _path_alt(self):
        parts = [self._path_seq()]
        while self.peek()[1] == "|":
            self.next()
            parts.append(self._path_seq())
        if len(parts) == 1:
            return parts[0]
        # sequence branches compile via _join_patterns on the branch's
        # real endpoints (plans/sparql._pattern_frame PathSeq case), so
        # (a/b)|c needs no manual distribution
        return PathAlt(tuple(parts))

    def _path_seq(self):
        parts = [self._path_elt()]
        while self.peek()[1] == "/":
            self.next()
            parts.append(self._path_elt())
        return parts[0] if len(parts) == 1 else PathSeq(tuple(parts))

    def _path_elt(self):
        inverse = False
        if self.peek()[1] == "^":
            self.next()
            inverse = True
        p = self._path_primary()
        mod = self.peek()[1]
        if mod in ("+", "*", "?"):
            # closure composes over compound paths too: (p1/p2)+ compiles
            # the inner path to an edge set and closes it transitively
            self.next()
            p = {"+": PathPlus, "*": PathStar, "?": PathOpt}[mod](p)
        return PathInverse(p) if inverse else p

    def _path_primary(self):
        kind, val = self.peek()
        if val == "!":
            # negated property set !p, !^p or !(p1|^p2|...): per SPARQL
            # 1.1 §9.2, !(F|^I) ≡ !(F) | ^(!(I)) — the forward members
            # exclude forward edges, the inverse members exclude REVERSED
            # edges, and the two components union. An empty component
            # contributes nothing (no members in a direction = no edges
            # matched in that direction).
            self.next()
            fwd, inv = [], []
            if self.peek()[1] == "(":
                self.next()
                while True:
                    if self.peek()[1] == "^":
                        self.next()
                        inv.append(self._nps_member())
                    else:
                        fwd.append(self._nps_member())
                    if self.peek()[1] != "|":
                        break
                    self.next()
                self.eat_op(")")
            elif self.peek()[1] == "^":
                self.next()
                inv.append(self._nps_member())
            else:
                fwd.append(self._nps_member())
            if fwd and inv:
                return PathAlt(
                    (PathNeg(tuple(fwd)), PathInverse(PathNeg(tuple(inv))))
                )
            if inv:
                return PathInverse(PathNeg(tuple(inv)))
            return PathNeg(tuple(fwd))
        if val == "(":
            self.next()
            inner = self.path()
            self.eat_op(")")
            return inner
        if kind == "iri":
            self.next()
            return self._iri(val)
        if kind == "pname":
            self.next()
            return self._pname(val)
        if kind == "word" and val == "a":
            self.next()
            return RDF + "type"
        raise SparqlSyntaxError(f"bad path element {val!r}")

    def _nps_member(self) -> str:
        kind, val = self.next()
        if kind == "iri":
            return self._iri(val)
        if kind == "pname":
            return self._pname(val)
        if kind == "word" and val == "a":
            return RDF + "type"
        raise SparqlSyntaxError(f"bad negated-property-set member {val!r}")

    # -- triples block ----------------------------------------------------
    def triples_block(self, patterns: list) -> None:
        """subject (path object (',' object)*) (';' path objects)* '.'"""
        s = self.term("s")
        if isinstance(s, Literal):
            raise SparqlSyntaxError("literal subject")
        while True:
            p = self.path() if self.peek()[0] != "var" else self.term("p")
            o = self.term("o")
            patterns.append((s, p, o))
            while self.peek()[1] == ",":
                self.next()
                patterns.append((s, p, self.term("o")))
            if self.peek()[1] != ";":
                break
            while self.peek()[1] == ";":
                self.next()
            # trailing ';' before '.' or '}' ends the block
            if self.peek()[1] in (".", "}"):
                break
        if self.peek()[1] == ".":
            self.next()

    # -- group graph pattern ----------------------------------------------
    def group(self) -> dict:
        """Parse '{ ... }' into {patterns, optional, minus, exists,
        not_exists, filters, binds, graph}."""
        self.eat_op("{")
        g = {
            "patterns": [], "optional": [], "minus": [], "exists": [],
            "not_exists": [], "filters": [], "binds": [], "graph": None,
            "unions": [], "values": [], "subselects": [], "services": [],
        }
        while True:
            kind, val = self.peek()
            if val == "}":
                self.next()
                break
            if val == ".":
                self.next()
                continue
            if self.at_word("OPTIONAL"):
                self.next()
                sub = self.group()
                g["optional"].append(_subgroup(sub, "OPTIONAL group"))
            elif self.at_word("MINUS"):
                self.next()
                sub = self.group()
                g["minus"].append(_subgroup(sub, "MINUS group"))
            elif self.at_word("FILTER"):
                self.next()
                if self.at_word("EXISTS"):
                    self.next()
                    sub = self.group()
                    g["exists"].append(_subgroup(sub, "EXISTS group"))
                elif self.at_word("NOT"):
                    self.next()
                    self.eat_word("EXISTS")
                    sub = self.group()
                    g["not_exists"].append(_subgroup(sub, "NOT EXISTS group"))
                else:
                    g["filters"].append(self.bracketed_expression())
            elif self.at_word("BIND"):
                self.next()
                self.eat_op("(")
                expr = self.expression()
                self.eat_word("AS")
                k2, v2 = self.next()
                if k2 != "var":
                    raise SparqlSyntaxError("BIND ... AS ?var")
                self.eat_op(")")
                g["binds"].append((expr, "?" + v2[1:]))
            elif self.at_word("GRAPH"):
                self.next()
                kind2, val2 = self.peek()
                if kind2 == "var":
                    self.next()
                    gterm = "?" + val2[1:]
                elif kind2 == "iri":
                    self.next()
                    gterm = self._iri(val2)
                elif kind2 == "pname":
                    self.next()
                    gterm = self._pname(val2)
                else:
                    raise SparqlSyntaxError("GRAPH needs an IRI or variable")
                sub = self.group()
                # the block's scope annotates each pattern as a 4-tuple
                # (s, p, o, scope) — default-graph patterns, multiple
                # distinct GRAPH scopes, and scoped OPTIONAL/MINUS/EXISTS
                # groups all mix freely; per-pattern scoping is resolved
                # by plans/sparql._join_patterns
                _annotate_graph(sub, gterm)
                g["patterns"].extend(sub["patterns"])
                g["optional"].extend(sub["optional"])
                g["minus"].extend(sub["minus"])
                g["exists"].extend(sub["exists"])
                g["not_exists"].extend(sub["not_exists"])
                # group-level FILTERs inside GRAPH are conjunctive at the
                # enclosing group, like any other filter; BIND and VALUES
                # are scope-free (expressions / inline data) and UNION
                # blocks carry the GRAPH scope on their branch patterns
                g["filters"].extend(sub["filters"])
                g["binds"].extend(sub["binds"])
                g["values"].extend(sub["values"])
                g["unions"].extend(sub["unions"])
                g["subselects"].extend(sub["subselects"])
                # SERVICE is untouched by an enclosing GRAPH (§13.3
                # scopes the LOCAL dataset; the remote endpoint's is its
                # own) — the blocks pass through unannotated
                g["services"].extend(sub["services"])
            elif self.at_word("SERVICE"):
                # SPARQL 1.1 Federated Query: the block's patterns
                # evaluate against a REGISTERED endpoint
                # (KgPipeline.register_service) and the solutions join
                # the enclosing group on shared variables — the block
                # wraps as a SELECT * sub-query compiled against the
                # endpoint's pipeline. Real HTTP federation is out of
                # scope; an unregistered endpoint is a named error
                # (SILENT: the spec's single empty solution instead).
                self.next()
                silent = False
                if self.at_word("SILENT"):
                    self.next()
                    silent = True
                kind2, val2 = self.peek()
                if kind2 == "iri":
                    self.next()
                    endpoint = self._iri(val2)
                elif kind2 == "pname":
                    self.next()
                    endpoint = self._pname(val2)
                elif kind2 == "var":
                    # SERVICE ?e: the endpoint variable ranges over the
                    # REGISTERED endpoints (federated-query §2.4 leaves
                    # the candidate set implementation-defined; the
                    # registry is ours), binding the IRI per solution
                    self.next()
                    endpoint = "?" + val2[1:]
                else:
                    raise SparqlSyntaxError("SERVICE needs an IRI endpoint")
                sub = self.group()
                g["services"].append({
                    "endpoint": endpoint, "silent": silent,
                    "select": {
                        "form": "select", "distinct": False, "select": [],
                        "agg": {}, "group_by": None, "graph": None,
                        "order": [], "limit": None, "offset": None,
                        "star": True, "having": None, "values": [],
                        "select_exprs": [], "where": sub,
                        "meta_vars": self.meta_vars, "expr_vars": set(),
                    },
                })
            elif self.at_word("VALUES"):
                self.next()
                g["values"].append(self._values_block())
            elif val == "{" and self.peek(1)[0] == "word" and self.peek(1)[1].upper() == "SELECT":
                # sub-SELECT group: evaluated first, joined on shared vars
                self.next()
                sub = self.select_query(embedded=True)
                self.eat_op("}")
                g["subselects"].append(sub)
            elif val == "{":
                # '{A} UNION {B} [UNION {C}...]'
                branches = [self.group()]
                while self.at_word("UNION"):
                    self.next()
                    branches.append(self.group())
                if len(branches) == 1:
                    # a bare nested group: flatten into the enclosing
                    # group (patterns conjoin; modifiers apply at the
                    # enclosing group, like GRAPH-block flattening)
                    b = branches[0]
                    for k in ("patterns", "optional", "minus", "exists",
                              "not_exists", "filters", "binds", "values",
                              "unions", "subselects", "services"):
                        g[k].extend(b[k])
                else:
                    # multiple UNION blocks per group are allowed: each
                    # block compiles to its own union frame and the blocks
                    # join on shared variables (SPARQL Join semantics).
                    # Branches with their own modifiers travel as
                    # sub-group dicts (sparql._group_frame compiles them
                    # recursively); plain branches stay lists.
                    g["unions"].append(
                        [_subgroup(b, "UNION branch") for b in branches]
                    )
            else:
                self.triples_block(g["patterns"])
        return g

    # -- VALUES inline data ------------------------------------------------
    def _values_datum(self) -> str:
        """One data term in a VALUES block -> lexical string (solution
        frames bind lexical forms), or ``UNDEF`` -> the UNDEF marker."""
        kind, val = self.next()
        if kind == "iri":
            return self._iri(val)
        if kind == "pname":
            return self._pname(val)
        if kind == "number":
            return val
        if kind == "string":
            lex = _unquote(val)
            nv = self.peek()[1]
            if nv == "@":  # language tag: bind the lexical form
                self.next()
                self.next()
                while self.peek()[1] == "-":
                    self.next()
                    self.next()
            elif nv == "^^":
                self.next()
                self.next()
            return lex
        if kind == "word" and val.upper() == "UNDEF":
            return UNDEF  # row-level wildcard: variable unbound this row
        if kind == "word" and val.upper() in ("TRUE", "FALSE"):
            return val.lower()
        raise SparqlSyntaxError(f"bad VALUES datum {val!r}")

    def _values_block(self) -> tuple:
        """'VALUES' already eaten: ?v { d* } | (?v ...) { (d ...)* }"""
        kind, val = self.peek()
        if kind == "var":
            self.next()
            names = [val[1:]]
            self.eat_op("{")
            rows = []
            while self.peek()[1] != "}":
                rows.append((self._values_datum(),))
            self.next()
            return names, rows
        self.eat_op("(")
        names = []
        while self.peek()[0] == "var":
            names.append(self.next()[1][1:])
        self.eat_op(")")
        if not names:
            raise SparqlSyntaxError("VALUES with no variables")
        self.eat_op("{")
        rows = []
        while self.peek()[1] != "}":
            self.eat_op("(")
            row = []
            while self.peek()[1] != ")":
                row.append(self._values_datum())
            self.next()
            if len(row) != len(names):
                raise SparqlSyntaxError(
                    f"VALUES row arity {len(row)} != {len(names)} variables"
                )
            rows.append(tuple(row))
        self.next()
        return names, rows

    # -- expressions ------------------------------------------------------
    def bracketed_expression(self):
        self.eat_op("(")
        e = self.expression()
        self.eat_op(")")
        return e

    def expression(self):
        return self._or_expr()

    def _or_expr(self):
        left = self._and_expr()
        while self.peek()[1] == "||":
            self.next()
            right = self._and_expr()
            left = _lift2(left, right, lambda a, b: a | b)
        return left

    def _and_expr(self):
        left = self._cmp_expr()
        while self.peek()[1] == "&&":
            self.next()
            right = self._cmp_expr()
            left = _lift2(left, right, lambda a, b: a & b)
        return left

    def _cmp_expr(self):
        left = self._add_expr()
        kind, val = self.peek()
        if kind == "word" and val.upper() == "IN":
            self.next()
            return self._in_list(left, negate=False)
        if (
            kind == "word"
            and val.upper() == "NOT"
            and self.peek(1)[1].upper() == "IN"
        ):
            self.next()
            self.next()
            return self._in_list(left, negate=True)
        op = self.peek()[1]
        if op in ("=", "!=", "<", ">", "<=", ">="):
            self.next()
            right = self._add_expr()
            numeric = isinstance(left, _Num) or isinstance(right, _Num)
            fns = {
                "=": lambda a, b: a == b, "!=": lambda a, b: a != b,
                "<": lambda a, b: a < b, ">": lambda a, b: a > b,
                "<=": lambda a, b: a <= b, ">=": lambda a, b: a >= b,
            }
            f = fns[op]
            if numeric:
                # SPARQL compares typed values; lexical forms try_cast to
                # double when either side is a numeric literal
                return _lift2(_as_num(left), _as_num(right), f)
            return _lift2(left, right, f)
        return left

    def _in_list(self, left, negate: bool):
        """?x [NOT] IN (e1, e2, ...) — an OR of equalities (SPARQL §17.4.1.9)."""
        self.eat_op("(")
        elems = []
        if self.peek()[1] != ")":
            elems.append(self.expression())
            while self.peek()[1] == ",":
                self.next()
                elems.append(self.expression())
        self.eat_op(")")

        def eq(df, e):
            # same coercion as '=' in _cmp_expr: numeric comparison when
            # either side is a numeric literal, lexical equality otherwise
            if isinstance(left, _Num) or isinstance(e, _Num):
                return _as_num(left)(df) == _as_num(e)(df)
            return left(df) == e(df)

        def compiled(df):
            if not elems:
                return F.lit(negate)  # IN () is false; NOT IN () is true
            cond = eq(df, elems[0])
            for e in elems[1:]:
                cond = cond | eq(df, e)
            return ~cond if negate else cond

        return compiled

    def _add_expr(self):
        left = self._mul_expr()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            right = self._mul_expr()
            f = (lambda a, b: a + b) if op == "+" else (lambda a, b: a - b)
            left = _lift2(_as_num(left), _as_num(right), f)
        return left

    def _mul_expr(self):
        left = self._unary_expr()
        while self.peek()[1] in ("*", "/"):
            op = self.next()[1]
            right = self._unary_expr()
            f = (lambda a, b: a * b) if op == "*" else (lambda a, b: a / b)
            left = _lift2(_as_num(left), _as_num(right), f)
        return left

    def _unary_expr(self):
        if self.peek()[1] == "!":
            self.next()
            inner = self._unary_expr()
            return lambda df: ~inner(df)
        return self._primary_expr()

    def _primary_expr(self):
        kind, val = self.peek()
        if val == "(":
            return self.bracketed_expression()
        if kind == "var":
            self.next()
            name = val[1:]
            self.expr_vars.add(name)
            return lambda df, n=name: df[n]
        if kind == "number":
            self.next()
            if "e" in val.lower():
                return _Num(float(val), dt=XSD + "double")
            if "." in val:
                return _Num(float(val), dt=XSD + "decimal")
            return _Num(int(val), dt=XSD + "integer")
        if kind == "string":
            self.next()
            s = _unquote(val)
            # optional annotation: "..."@tag binds the lexical form with
            # rdf:langString shape; "..."^^<dt> with that datatype —
            # solution frames bind LEXICAL forms, so the annotation only
            # feeds term inspection (LANG/DATATYPE/is*), not the value
            nv = self.peek()[1]
            if nv == "@":
                self.next()
                tag = self.next()[1]
                while self.peek()[1] == "-":
                    self.next()
                    tag += "-" + self.next()[1]
                return _Term(
                    lambda df, s=s: F.lit(s),
                    kind="literal", lang=tag, dt=RDF + "langString", const=s,
                )
            if nv == "^^":
                self.next()
                k2, v2 = self.next()
                dt = self._iri(v2) if k2 == "iri" else self._pname(v2)
                return _Term(
                    lambda df, s=s: F.lit(s),
                    kind="literal", lang="", dt=dt, const=s,
                )
            return _Term(
                lambda df, s=s: F.lit(s),
                kind="literal", lang="", dt=XSD + "string", const=s,
            )
        if kind in ("iri", "pname"):
            self.next()
            iri = self._iri(val) if kind == "iri" else self._pname(val)
            return _Term(lambda df, s=iri: F.lit(s), kind="iri", const=iri)
        if kind == "word":
            return self._function_call()
        raise SparqlSyntaxError(f"bad expression at {val!r}")

    def _function_call(self):
        name = self.next()[1].upper()
        if name in _AGG_NAMES:
            if self.agg_sink is None:
                raise SparqlUnsupported(
                    f"aggregate {name}() outside SELECT/HAVING"
                )
            # HAVING aggregate: compile to a hidden agg column that the
            # query compiler computes alongside the SELECT aggregates and
            # drops after the filter
            self.hidden += 1
            hname = f"__h{self.hidden}"
            self.agg_sink[hname] = self._aggregate_body(name)
            return lambda df, n=hname: df[n]
        if name in ("ISIRI", "ISURI", "ISBLANK", "ISLITERAL", "ISNUMERIC"):
            # term-kind tests compile on the hidden __kind_<v> metadata
            # column (the object kind is catalog metadata per predicate
            # map, so the test constant-folds per scan branch); over a
            # NON-variable expression they constant-fold on the
            # statically-known term shape (_Term/_Num) — constants,
            # IRI()/STR()/CONCAT()/STRDT()/... results — and an
            # expression of unknown shape stays a named error
            self.eat_op("(")
            if not (self.peek()[0] == "var" and self.peek(1)[1] == ")"):
                expr = self.expression()
                self.eat_op(")")
                tkind, _, tdt = _term_shape(expr)
                if tkind is None:
                    raise SparqlUnsupported(
                        f"{name}() over an expression of statically "
                        "unknown term shape"
                    )
                if name == "ISNUMERIC":
                    if tdt == _NUMERIC_UNKNOWN:
                        # ABS/CEIL/FLOOR/ROUND/RAND: the result is
                        # numeric whenever the function returned at all
                        # (§17.4.4) — numeric iff the inner didn't error.
                        # An inner ERROR must stay NULL (not become
                        # false), matching SPARQL error semantics under
                        # !/IF/COALESCE and the sibling constant-fold
                        # branch (ADVICE r5)
                        return lambda df, e=expr: F.when(
                            e(df).isNotNull(), F.lit(True)
                        )
                    ok = tdt is not None and tdt in _NUMERIC_DTS
                else:
                    want = {
                        "ISIRI": "iri", "ISURI": "iri", "ISBLANK": "bnode",
                        "ISLITERAL": "literal",
                    }[name]
                    ok = tkind == want
                if isinstance(expr, _Num) or (
                    isinstance(expr, _Term) and expr.const is not None
                ):
                    return lambda df, b=ok: F.lit(b)  # constants never error
                # an inner ERROR (NULL) must propagate, not fold away
                return lambda df, b=ok, e=expr: F.when(
                    e(df).isNotNull(), F.lit(b)
                )
            k, v = self.next()
            self.eat_op(")")
            var = v[1:]
            self.meta_vars.add("?" + var)
            kcol, dcol = META_KIND + var, META_DT + var
            if name in ("ISIRI", "ISURI"):
                want = "iri"
            elif name == "ISBLANK":
                want = "bnode"
            else:
                want = "literal"
            if name == "ISNUMERIC":
                return lambda df, c=dcol, ns=list(_NUMERIC_DTS): (
                    df[c].isin(ns) if c in df.columns else F.lit(None).cast("boolean")
                )
            return lambda df, c=kcol, w=want: (
                (df[c] == w) if c in df.columns else F.lit(None).cast("boolean")
            )
        if name in ("LANG", "DATATYPE"):
            # over a VARIABLE: compile against the hidden per-variable
            # term-metadata columns (plans/sparql.py term_meta); a
            # variable never bound in object position yields NULL (the
            # spec's type error). Over a NON-variable expression:
            # constant-fold on the statically-known term shape — literal
            # constants (incl. @tag / ^^dt annotations), numbers, string
            # function results (simple literals), STRDT/STRLANG with
            # constant annotations; an IRI/bnode-shaped argument is the
            # spec's type error (NULL); unknown shape stays a named error
            self.eat_op("(")
            if not (self.peek()[0] == "var" and self.peek(1)[1] == ")"):
                expr = self.expression()
                self.eat_op(")")
                tkind, tlang, tdt = _term_shape(expr)
                if tkind in ("iri", "bnode"):
                    return lambda df: F.lit(None).cast("string")
                want = tlang if name == "LANG" else tdt
                if tkind != "literal" or want is None or want == _NUMERIC_UNKNOWN:
                    # _NUMERIC_UNKNOWN: ABS()-family results are numeric
                    # but their exact XSD type follows the argument
                    raise SparqlUnsupported(
                        f"{name}() over an expression of statically "
                        "unknown term shape"
                    )
                return lambda df, s=want: F.lit(s)
            k, v = self.next()
            self.eat_op(")")
            var = v[1:]
            self.meta_vars.add("?" + var)
            col = (META_LANG if name == "LANG" else META_DT) + var
            return lambda df, c=col: (
                df[c] if c in df.columns else F.lit(None).cast("string")
            )
        if name == "LANGMATCHES":
            self.eat_op("(")
            a = self.expression()
            self.eat_op(",")
            b = self.expression()
            self.eat_op(")")

            def langmatches(df):
                tag = F.lower(a(df))
                rng = F.lower(b(df) if callable(b) else b)
                return F.when(rng == "*", tag != "").otherwise(
                    (tag == rng) | tag.startswith(F.concat(rng, F.lit("-")))
                )

            return langmatches
        if (
            name == "SAMETERM"
            and self.peek()[1] == "("
            and self.peek(1)[0] == "var"
            and self.peek(2)[1] == ","
            and self.peek(3)[0] == "var"
            and self.peek(4)[1] == ")"
        ):
            # sameTerm(?a, ?b) over two VARIABLES compiles to lexical
            # equality AND null-safe equality of the hidden term-metadata
            # columns (__kind/__lang/__dt) — an IRI and a plain literal
            # sharing a lexical form, or literals differing only in
            # language tag / datatype, compare DIFFERENT. A metadata
            # dimension tracked on only one side falls back to lexical
            # for that dimension (subject-position variables carry no
            # metadata columns). Non-variable operands use the generic
            # lexical-equality path below.
            self.next()                 # (
            va = self.next()[1][1:]
            self.next()                 # ,
            vb = self.next()[1][1:]
            self.next()                 # )
            self.meta_vars.add("?" + va)
            self.meta_vars.add("?" + vb)

            def sameterm_vars(df, a=va, b=vb):
                cond = df[a] == df[b]
                for pre in (META_KIND, META_LANG, META_DT):
                    ca, cb = pre + a, pre + b
                    if ca in df.columns and cb in df.columns:
                        cond = cond & df[ca].eqNullSafe(df[cb])
                return cond

            return sameterm_vars
        if name in ("TRUE", "FALSE"):
            return _Term(
                lambda df, b=(name == "TRUE"): F.lit(b),
                kind="literal", lang="", dt=XSD + "boolean",
                const=name.lower(),
            )
        self.eat_op("(")
        args = []
        if self.peek()[1] != ")":
            args.append(self.expression())
            while self.peek()[1] == ",":
                self.next()
                args.append(self.expression())
        self.eat_op(")")
        return _compile_function(name, args, base=self.base)

    # -- query ------------------------------------------------------------
    def _prologue(self) -> None:
        while True:
            if self.at_word("PREFIX"):
                self.next()
                _, pn = self.next()
                _, iri = self.next()
                self.prefixes[pn[:-1] if pn.endswith(":") else pn.partition(":")[0]] = self._iri(iri)
            elif self.at_word("BASE"):
                self.next()
                _, iri = self.next()
                self.base = self._iri(iri)
            else:
                break

    def parse_query(self) -> dict:
        """Parse a full query: prologue + SELECT | ASK | CONSTRUCT."""
        self._prologue()
        if self.at_word("SELECT"):
            q = self.select_query(embedded=False)
        elif self.at_word("ASK"):
            q = self.ask_query()
        elif self.at_word("CONSTRUCT"):
            q = self.construct_query()
        elif self.at_word("DESCRIBE"):
            q = self.describe_query()
        else:
            raise SparqlSyntaxError(f"expected a query form, got {self.peek()[1]!r}")
        kind, val = self.peek()
        if kind != "eof":
            raise SparqlSyntaxError(f"trailing content at {val!r}")
        return q

    def parse_select(self) -> dict:
        self._prologue()
        q = self.select_query(embedded=False)
        kind, val = self.peek()
        if kind != "eof":
            raise SparqlSyntaxError(f"trailing content at {val!r}")
        return q

    def ask_query(self) -> dict:
        self.eat_word("ASK")
        q = {"form": "ask", "graph": None}
        self._dataset_clause(q)
        if self.at_word("WHERE"):
            self.next()
        q["where"] = self.group()
        q["meta_vars"] = self.meta_vars
        return q

    def describe_query(self) -> dict:
        """DESCRIBE <iri>... ?var... [WHERE { ... }] — subject-oriented
        description (the spec leaves the description form to the
        implementation; this engine emits every triple whose SUBJECT is a
        described resource, the common concise-bounded-description core)."""
        self.eat_word("DESCRIBE")
        q = {"form": "describe", "resources": [], "vars": [], "where": None,
             "graph": None}
        while True:
            kind, val = self.peek()
            if kind == "iri":
                self.next()
                q["resources"].append(self._iri(val))
            elif kind == "pname":
                self.next()
                q["resources"].append(self._pname(val))
            elif kind == "var":
                self.next()
                q["vars"].append("?" + val[1:])
            elif val == "*":
                # DESCRIBE *: every variable the WHERE group binds
                self.next()
                q["star"] = True
            else:
                break
        if not q["resources"] and not q["vars"] and not q.get("star"):
            raise SparqlSyntaxError("DESCRIBE needs at least one resource")
        self._dataset_clause(q)
        if self.at_word("WHERE") or self.peek()[1] == "{":
            if self.at_word("WHERE"):
                self.next()
            q["where"] = self.group()
        if (q["vars"] or q.get("star")) and q["where"] is None:
            raise SparqlSyntaxError("DESCRIBE ?var requires a WHERE group")
        q["meta_vars"] = self.meta_vars
        return q

    def construct_query(self) -> dict:
        self.eat_word("CONSTRUCT")
        if self.peek()[1] != "{":
            # CONSTRUCT WHERE { ... } shorthand (SPARQL §16.2.4): the
            # WHERE group doubles as the template. The group must be a
            # plain BGP (triples only — the grammar forbids FILTER/
            # OPTIONAL/GRAPH/paths there); path patterns are rejected by
            # the same template expansion below.
            q = {"form": "construct", "template": None, "graph": None,
                 "limit": None, "offset": None}
            self._dataset_clause(q)
            self.eat_word("WHERE")
            q["where"] = self.group()
            w = q["where"]
            extras = [k for k in _SUBGROUP_KEYS[1:] if w[k]]
            if extras:
                raise SparqlUnsupported(
                    f"CONSTRUCT WHERE shorthand with {extras}"
                )
            for pat in w["patterns"]:
                if len(pat) > 3 and pat[3] is not None:
                    raise SparqlUnsupported(
                        "GRAPH inside CONSTRUCT WHERE shorthand"
                    )
                if not isinstance(pat[1], str):
                    raise SparqlUnsupported(
                        "property path in CONSTRUCT WHERE shorthand"
                    )
            q["template"] = [tuple(pat[:3]) for pat in w["patterns"]]
            self._construct_modifiers(q)
            return q
        template: list = []
        self.eat_op("{")
        while self.peek()[1] != "}":
            if self.peek()[1] == ".":
                self.next()
                continue
            self.triples_block(template)
        self.next()
        # paths with a FINITE triple rendering expand in the template
        # (the spec grammar forbids paths there outright — rendering the
        # renderable ones is a convenience superset): a SEQUENCE chains
        # through fresh per-solution variables (?s p1/p2 ?o -> ?s p1 ?m .
        # ?m p2 ?o), an INVERSE swaps its endpoints (?s ^p ?o -> ?o p
        # ?s), composing inside sequences. Closures/alternations have no
        # finite rendering and stay named.
        def render(s, p, o, out):
            if isinstance(p, str):
                out.append((s, p, o))
            elif isinstance(p, PathInverse):
                render(o, p.path, s, out)
            elif isinstance(p, PathSeq):
                terms = [s]
                for _ in range(len(p.parts) - 1):
                    terms.append(self.fresh_var())
                terms.append(o)
                for i, part in enumerate(p.parts):
                    render(terms[i], part, terms[i + 1], out)
            else:
                raise SparqlUnsupported(
                    "non-finite property path in CONSTRUCT template "
                    "(only IRIs, sequences, and inverses render)"
                )

        expanded: list = []
        for s, p, o in template:
            render(s, p, o, expanded)
        template = expanded
        q = {"form": "construct", "template": template, "graph": None,
             "limit": None, "offset": None}
        self._dataset_clause(q)
        if self.at_word("WHERE"):
            self.next()
        q["where"] = self.group()
        self._construct_modifiers(q)
        q["meta_vars"] = self.meta_vars
        return q

    def _construct_modifiers(self, q: dict) -> None:
        """Solution modifiers on CONSTRUCT (§16.2 over §15): ORDER BY
        with plain-variable or ASC/DESC(expr) keys — aggregates have no
        grouping to read and stay rejected by the agg_sink=None guard in
        ``_function_call`` — then LIMIT/OFFSET in either order. With
        ORDER BY present the slice applies to the ORDERED SOLUTION
        SEQUENCE before template instantiation (the spec's reading — the
        only one where ORDER BY is observable at all); without it, to
        the constructed triple set."""
        q["order"] = []
        if self.at_word("ORDER"):
            self.next()
            self.eat_word("BY")
            while True:
                if self.at_word("ASC", "DESC"):
                    desc = self.next()[1].upper() == "DESC"
                    e = self.bracketed_expression()
                elif self.peek()[0] == "var":
                    desc = False
                    name = self.next()[1][1:]
                    e = lambda df, n=name: df[n]  # noqa: E731
                else:
                    break
                q["order"].append((e, desc))
            if not q["order"]:
                raise SparqlSyntaxError("ORDER BY needs at least one key")
        while self.at_word("LIMIT", "OFFSET"):
            word = self.next()[1].upper()
            q["limit" if word == "LIMIT" else "offset"] = (
                self.int_modifier(word)
            )

    def select_query(self, embedded: bool = False) -> dict:
        self.eat_word("SELECT")
        q = {
            "form": "select",
            "distinct": False, "select": [], "agg": {}, "group_by": None,
            "graph": None, "order": [], "limit": None, "offset": None,
            "star": False, "having": None, "values": [], "select_exprs": [],
        }
        # scope the expression-variable record to THIS (sub)query; the
        # final set propagates to the enclosing query (an inner reference
        # is also textually inside the outer query)
        prev_expr_vars, self.expr_vars = self.expr_vars, set()
        if self.at_word("DISTINCT"):
            self.next()
            q["distinct"] = True
        if self.at_word("REDUCED"):
            self.next()  # REDUCED may legally return DISTINCT's answer
            q["distinct"] = True
        while True:
            kind, val = self.peek()
            if kind == "var":
                self.next()
                q["select"].append(val[1:])
            elif val == "*":
                self.next()
                q["star"] = True
            elif val == "(":
                self.next()
                k0, v0 = self.peek()
                if (
                    k0 == "word"
                    and v0.upper() in _AGG_NAMES
                    and self._direct_agg_ahead()
                ):
                    # bare '(AGG(...) AS ?v)': the aggregate IS the
                    # projected column — keep the user alias as the agg
                    # column name (HAVING/ORDER BY reference it directly)
                    agg = self._aggregate()
                    self.eat_word("AS")
                    k2, v2 = self.next()
                    self.eat_op(")")
                    q["agg"][v2[1:]] = agg
                    q["select"].append(v2[1:])
                else:
                    # SELECT (expr AS ?v): a per-solution projection
                    # expression — compiles as a trailing BIND, or, when
                    # it calls aggregates (registered as hidden agg
                    # columns through the same sink HAVING uses), as a
                    # post-aggregation column
                    n_agg = len(q["agg"])
                    prev_sink, self.agg_sink = self.agg_sink, q["agg"]
                    try:
                        expr = self.expression()
                    finally:
                        self.agg_sink = prev_sink
                    self.eat_word("AS")
                    k2, v2 = self.next()
                    if k2 != "var":
                        raise SparqlSyntaxError("SELECT (expr AS ?var)")
                    self.eat_op(")")
                    q["select_exprs"].append(
                        (expr, v2[1:], len(q["agg"]) > n_agg)
                    )
                    q["select"].append(v2[1:])
            else:
                break
        self._dataset_clause(q)
        if self.at_word("WHERE"):
            self.next()
        q["where"] = self.group()
        if self.at_word("GROUP"):
            self.next()
            self.eat_word("BY")
            q["group_by"] = []
            while True:
                if self.peek()[0] == "var":
                    q["group_by"].append("?" + self.next()[1][1:])
                elif self.peek()[1] == "(":
                    # GROUP BY (expr [AS ?v]): the group expression
                    # evaluates per solution — exactly a BIND before the
                    # aggregation (hidden __g var when no alias given)
                    self.next()
                    expr = self.expression()
                    if self.at_word("AS"):
                        self.next()
                        k2, v2 = self.next()
                        if k2 != "var":
                            raise SparqlSyntaxError("GROUP BY (expr AS ?var)")
                        var = v2[1:]
                    else:
                        self.hidden += 1
                        var = f"__g{self.hidden}"
                    self.eat_op(")")
                    q["where"]["binds"].append((expr, "?" + var))
                    q["group_by"].append("?" + var)
                else:
                    break
        if self.at_word("HAVING"):
            self.next()
            # aggregate calls inside the HAVING expression register hidden
            # agg columns in q["agg"]; the compiler drops them after the
            # post-aggregation filter
            prev_sink, self.agg_sink = self.agg_sink, q["agg"]
            try:
                q["having"] = self.bracketed_expression()
            finally:
                self.agg_sink = prev_sink
        if self.at_word("ORDER"):
            self.next()
            self.eat_word("BY")
            # aggregate calls inside ORDER BY keys register hidden agg
            # columns exactly like HAVING; the compiler keeps them through
            # the sort and projects them away after (q["order_agg"])
            n_agg = len(q["agg"])
            prev_sink, self.agg_sink = self.agg_sink, q["agg"]
            try:
                while True:
                    if self.at_word("ASC", "DESC"):
                        desc = self.next()[1].upper() == "DESC"
                        e = self.bracketed_expression()
                    elif self.peek()[0] == "var":
                        desc = False
                        name = self.next()[1][1:]
                        e = lambda df, n=name: df[n]
                    elif (
                        self.peek()[0] == "word"
                        and self.peek()[1].upper() in _AGG_NAMES
                    ):
                        # bare aggregate order key: ORDER BY COUNT(?s)
                        desc = False
                        e = self._function_call()
                    else:
                        break
                    q["order"].append((e, desc))
            finally:
                self.agg_sink = prev_sink
            q["order_agg"] = len(q["agg"]) > n_agg
        if self.at_word("LIMIT"):
            self.next()
            q["limit"] = self.int_modifier("LIMIT")
        if self.at_word("OFFSET"):
            self.next()
            q["offset"] = self.int_modifier("OFFSET")
        if not embedded and self.at_word("VALUES"):
            # trailing ValuesClause (SPARQL grammar rule [28])
            self.next()
            q["values"].append(self._values_block())
        q["meta_vars"] = self.meta_vars
        q["expr_vars"] = self.expr_vars
        self.expr_vars = prev_expr_vars | self.expr_vars
        return q

    def _direct_agg_ahead(self) -> bool:
        """Lookahead (no consumption): does the aggregate call starting
        at the current token end with 'AS' — i.e. '(AGG(...) AS ?v)'
        rather than an expression like '(AGG(...) * 2 AS ?v)'?"""
        j = self.i + 1  # past the aggregate name
        if j >= len(self.toks) or self.toks[j][1] != "(":
            return False
        depth = 0
        while j < len(self.toks):
            tok = self.toks[j][1]
            if tok == "(":
                depth += 1
            elif tok == ")":
                depth -= 1
                if depth == 0:
                    j += 1
                    break
            j += 1
        nk, nv = self.toks[min(j, len(self.toks) - 1)]
        return nk == "word" and nv.upper() == "AS"

    def _aggregate(self):
        name = self.next()[1].upper()
        if name not in _AGG_NAMES:
            raise SparqlUnsupported(f"aggregate {name}")
        return self._aggregate_body(name)

    def _aggregate_body(self, name: str):
        """Parse '( [DISTINCT] * | ?var [; SEPARATOR = "s"] )' for an
        already-consumed aggregate name and return the agg lambda."""
        self.eat_op("(")
        distinct = False
        if self.at_word("DISTINCT"):
            self.next()
            distinct = True
        if self.peek()[1] == "*":
            self.next()
            self.eat_op(")")
            if name != "COUNT":
                raise SparqlSyntaxError(f"{name}(*)")
            return lambda df: F.count(F.lit(1))
        var = self.next()[1][1:]
        self.expr_vars.add(var)
        sep = " "
        if name == "GROUP_CONCAT" and self.peek()[1] == ";":
            self.next()
            k2, v2 = self.next()
            if k2 != "word" or v2.upper() != "SEPARATOR":
                raise SparqlSyntaxError("GROUP_CONCAT(?v; SEPARATOR=\"s\")")
            self.eat_op("=")
            k3, v3 = self.next()
            if k3 != "string":
                raise SparqlSyntaxError("SEPARATOR expects a string literal")
            sep = _unquote(v3)
        self.eat_op(")")
        if name == "GROUP_CONCAT":
            # the spec leaves concatenation order undefined; sorting makes
            # it deterministic across engines/retries (documented choice)
            coll = F.collect_set if distinct else F.collect_list
            return lambda df, v=var, s=sep, c=coll: F.array_join(
                F.array_sort(c(df[v])), s
            )
        if name == "SAMPLE":
            # SAMPLE may return any value of the group; MIN is a valid,
            # DETERMINISTIC choice (stable across retries and engines)
            return lambda df, v=var: F.min(df[v])
        if name == "COUNT":
            return (lambda df, v=var: F.countDistinct(df[v])) if distinct else (
                lambda df, v=var: F.count(df[v])
            )
        num = lambda df, v=var: df[v].cast("string").try_cast("double")  # noqa: E731
        if name == "SUM":
            return lambda df, _n=num: F.sum(_n(df))
        if name == "AVG":
            return lambda df, _n=num: F.avg(_n(df))
        if name == "MIN":
            return lambda df, v=var: F.min(df[v])
        return lambda df, v=var: F.max(df[v])


class _Num:
    """Numeric literal marker: forces numeric comparison semantics.

    Carries the literal's XSD datatype (SPARQL §19.8 grammar: no
    decimal point and no exponent -> xsd:integer, decimal point ->
    xsd:decimal, exponent -> xsd:double) so term inspection
    (``DATATYPE(5)``, ``isNumeric(5)``) constant-folds."""

    def __init__(self, value, dt: str | None = None):
        self.value = value
        self.dt = dt

    def __call__(self, df):
        return F.lit(self.value)


class _Term:
    """Compiled expression carrying a statically-known RDF term shape.

    Wraps a compiled column lambda with whatever the parser can prove
    about the VALUE's term at parse time: ``kind`` ("iri" | "literal" |
    "bnode" | None = unknown), ``lang`` (None = unknown, "" = no
    language tag, else the tag), ``dt`` (None = unknown, else the
    datatype IRI) and ``const`` (the Python constant when the whole
    expression is a literal/IRI constant, else None). It behaves
    exactly like the bare lambda everywhere an expression is consumed;
    the term-inspection builtins (LANG/DATATYPE/isIRI/isLiteral/...)
    constant-fold on the static shape instead of raising
    SparqlUnsupported, and STRDT/STRLANG read constant annotations off
    ``const``."""

    def __init__(self, fn, kind=None, lang=None, dt=None, const=None):
        self.fn = fn
        self.kind = kind
        self.lang = lang
        self.dt = dt
        self.const = const

    def __call__(self, df):
        return self.fn(df)


def _term_shape(e) -> tuple:
    """(kind, lang, dt) of a compiled expression — None = unknown."""
    if isinstance(e, _Num):
        return ("literal", "", e.dt)
    if isinstance(e, _Term):
        return (e.kind, e.lang, e.dt)
    return (None, None, None)


def _arg_lang(e):
    kind, lang, _ = _term_shape(e)
    return lang if kind == "literal" else (None if kind is None else "")


def _dt_for_lang(lang):
    if lang is None:
        return None
    return XSD + "string" if lang == "" else RDF + "langString"


def _as_num(e):
    if isinstance(e, _Num):
        return e
    return lambda df: e(df).cast("string").try_cast("double")


def _lift2(a, b, f):
    return lambda df: f(a(df) if callable(a) else a, b(df) if callable(b) else b)


def _unquote(raw: str) -> str:
    body = raw[1:-1]
    return re.sub(
        r"\\(.)",
        lambda m: {"n": "\n", "t": "\t", "r": "\r"}.get(m.group(1), m.group(1)),
        body,
    )


def _static_shape(name: str, args: list):
    """(kind, lang, dt) statically known for a builtin's RESULT, or None.

    Follows SPARQL §17.4/§17.5 result types: the string functions that
    preserve the first argument's language tag (UCASE/LCASE/SUBSTR/
    REPLACE) propagate a statically-known tag; STRBEFORE/STRAFTER return
    a SIMPLE literal on no-match, so a tagged argument makes their tag
    runtime-dependent (unknown); CONCAT is tagged iff every argument
    carries the same known tag."""
    simple = ("literal", "", XSD + "string")
    if name in (
        "STR", "ENCODE_FOR_URI", "MD5", "SHA1", "SHA256", "SHA384",
        "SHA512", "STRUUID", "TZ", "LANG",
    ):
        return simple
    if name in ("UCASE", "LCASE", "SUBSTR", "REPLACE"):
        lang = _arg_lang(args[0])
        return ("literal", lang, _dt_for_lang(lang))
    if name in ("STRBEFORE", "STRAFTER"):
        lang = _arg_lang(args[0])
        return simple if lang == "" else ("literal", None, None)
    if name == "CONCAT":
        # §17.4.3.12: tagged iff EVERY argument carries the same tag —
        # one statically-untagged argument forces a simple literal no
        # matter what the unknown arguments turn out to be
        langs = [_arg_lang(a) for a in args]
        if any(l == "" for l in langs) or (langs and len(set(langs)) > 1 and None not in langs):
            lang = ""
        elif langs and len(set(langs)) == 1 and langs[0] is not None:
            lang = langs[0]
        elif not langs:
            lang = ""
        else:
            lang = None
        return ("literal", lang, _dt_for_lang(lang))
    if name == "STRDT" and len(args) == 2 and isinstance(args[1], _Term) and (
        args[1].kind == "iri" and args[1].const
    ):
        return ("literal", "", args[1].const)
    if name == "STRLANG" and len(args) == 2 and isinstance(args[1], _Term) and (
        args[1].kind == "literal" and args[1].const is not None
    ):
        return ("literal", args[1].const, RDF + "langString")
    if name in ("IRI", "URI", "UUID"):
        return ("iri", None, None)
    if name == "BNODE":
        return ("bnode", None, None)
    if name in (
        "BOUND", "CONTAINS", "STRSTARTS", "STRENDS", "REGEX",
        "LANGMATCHES", "SAMETERM",
    ):
        return ("literal", "", XSD + "boolean")
    if name in ("STRLEN", "YEAR", "MONTH", "DAY", "HOURS", "MINUTES"):
        return ("literal", "", XSD + "integer")
    if name == "SECONDS":
        return ("literal", "", XSD + "decimal")
    if name == "TIMEZONE":
        return ("literal", "", XSD + "dayTimeDuration")
    if name == "NOW":
        return ("literal", "", XSD + "dateTime")
    if name in ("ABS", "CEIL", "FLOOR", "ROUND", "RAND"):
        # numeric result — the exact XSD type follows the argument:
        # isNumeric() folds on the marker, DATATYPE() stays a named error
        return ("literal", "", _NUMERIC_UNKNOWN)
    return None


def _compile_function(name: str, args: list, base: str = ""):
    """Compile a builtin call, annotating the result with its statically
    known term shape (_Term) so nested term inspection constant-folds —
    e.g. ``LANG(CONCAT(?a, "x"))`` is ``""`` without touching metadata
    columns."""
    fn = _compile_function_raw(name, args, base)
    shape = _static_shape(name, args)
    if shape is None or isinstance(fn, (_Term, _Num)):
        return fn
    kind, lang, dt = shape
    return _Term(fn, kind=kind, lang=lang, dt=dt)


def _compile_function_raw(name: str, args: list, base: str = ""):
    fns = {
        "BOUND": lambda a: a.isNotNull(),
        "STR": lambda a: a.cast("string"),
        "UCASE": F.upper,
        "LCASE": F.lower,
        "STRLEN": F.length,
        "CONTAINS": lambda a, b: a.contains(b),
        "STRSTARTS": lambda a, b: a.startswith(b),
        "STRENDS": lambda a, b: a.endswith(b),
        "ABS": F.abs,
        "CEIL": F.ceil,
        "FLOOR": F.floor,
        "ROUND": F.round,
        "COALESCE": F.coalesce,
        "IF": F.when,  # handled below
        # term identity on stored lexical forms: NO numeric lifting (the
        # difference from '=' — sameTerm("1", "1.0") is false while
        # FILTER(?x = 1) lifts); term kind/lang/datatype distinctions
        # beyond the lexical form follow the engine's documented
        # lexical-join narrowing
        "SAMETERM": lambda a, b: a == b,
    }
    if name == "STRBEFORE":
        def strbefore(df):
            a, b = args[0](df), args[1](df)
            pos = F.position(b, a)
            return F.when(pos > 0, F.substring(a, F.lit(1), pos - 1)).otherwise(F.lit(""))
        return strbefore
    if name == "STRAFTER":
        def strafter(df):
            a, b = args[0](df), args[1](df)
            pos = F.position(b, a)
            return F.when(
                pos > 0,
                F.substring(a, pos + F.length(b), F.lit(2147483647)),
            ).otherwise(F.lit(""))
        return strafter
    if name == "REPLACE":
        def replace(df):
            return F.regexp_replace(args[0](df), args[1](df), args[2](df))
        return replace
    if name == "REGEX":
        def regex(df):
            col = args[0](df)
            pat = args[1](df)
            # flags: only a literal 'i' is honored, as (?i)
            if len(args) > 2:
                return F.regexp_like(col, F.concat(F.lit("(?i)"), pat))
            return F.regexp_like(col, pat)
        return regex
    if name == "SUBSTR":
        def substr(df):
            start = args[1](df) if not isinstance(args[1], _Num) else F.lit(args[1].value)
            if len(args) > 2:
                ln = args[2](df) if not isinstance(args[2], _Num) else F.lit(args[2].value)
                return F.substring(args[0](df), start, ln)
            return F.substring(args[0](df), start, F.lit(2147483647))
        return substr
    if name == "MD5":
        return lambda df: F.md5(args[0](df))
    if name == "SHA1":
        return lambda df: F.sha1(args[0](df))
    if name in ("SHA256", "SHA384", "SHA512"):
        bits = int(name[3:])
        return lambda df, b=bits: F.sha2(args[0](df), b)
    if name == "ENCODE_FOR_URI":
        # SPARQL §17.4.2.8: percent-encode everything outside RFC 3986's
        # unreserved set. Spark's url_encode is form-encoding — fix its
        # three deviations ('+' for space, raw '*', encoded '~'); a '%'
        # in the input became '%25', so the '%7E' rewrite is unambiguous
        def encode_for_uri(df):
            e = F.url_encode(args[0](df))
            e = F.regexp_replace(e, r"\+", "%20")
            e = F.regexp_replace(e, r"\*", "%2A")
            return F.regexp_replace(e, "%7E", "~")
        return encode_for_uri
    if name in ("YEAR", "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS", "TZ"):
        # xsd:dateTime/date component accessors over the LEXICAL form —
        # no timestamp parse, so the literal's own timezone is never
        # shifted to the session zone (SPARQL reads components as
        # written; Spark's to_timestamp would convert Z-suffixed values)
        pats = {
            "YEAR": (r"^(-?\d{4,})", "int"),
            "MONTH": (r"^-?\d{4,}-(\d{2})", "int"),
            "DAY": (r"^-?\d{4,}-\d{2}-(\d{2})", "int"),
            "HOURS": (r"T(\d{2})", "int"),
            "MINUTES": (r"T\d{2}:(\d{2})", "int"),
            "SECONDS": (r"T\d{2}:\d{2}:(\d{2}(?:\.\d+)?)", "double"),
            "TZ": (r"(Z|[+-]\d{2}:\d{2})$", None),
        }
        pat, cast = pats[name]

        def component(df, pat=pat, cast=cast):
            got = F.regexp_extract(args[0](df), pat, 1)
            if cast is None:  # TZ: simple literal, '' when absent
                return got
            return F.nullif(got, F.lit("")).try_cast(cast)
        return component
    if name in ("IRI", "URI"):
        # absolute IRIs pass through; with a prologue BASE, relative refs
        # merge per RFC 3986 §5.3 (dot-segment normalization is not
        # applied — documented narrowing)
        def make_iri(df):
            x = args[0](df)
            if not base:
                return x
            m = re.match(r"^([A-Za-z][A-Za-z0-9+.\-]*:(?://[^/?#]*)?)", base)
            root = m.group(1) if m else base
            rest = base[len(root):]
            slash = rest.rfind("/")
            dir_ = root + (rest[: slash + 1] if slash >= 0 else "/")
            return (
                F.when(x.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*:"), x)
                .when(x.startswith("/"), F.concat(F.lit(root), x))
                .when(
                    x.startswith("#") | x.startswith("?"),
                    F.concat(F.lit(base), x),
                )
                .otherwise(F.concat(F.lit(dir_), x))
            )
        return make_iri
    if name in ("STRDT", "STRLANG"):
        # constructs a typed / language-tagged literal; solution frames
        # bind LEXICAL forms, so the value is the lexical. A CONSTANT
        # annotation (the usual case) is carried as the result's static
        # term shape (_static_shape), so LANG(STRLANG(?x, "en")) = "en"
        # and DATATYPE(STRDT(?x, xsd:token)) = xsd:token constant-fold;
        # a computed annotation leaves the shape unknown (named error
        # under term inspection — documented narrowing)
        return lambda df: args[0](df)
    if name == "UUID":
        return lambda df: F.concat(F.lit("urn:uuid:"), F.expr("uuid()"))
    if name == "STRUUID":
        return lambda df: F.expr("uuid()")
    if name == "BNODE" and not args:
        # a FRESH blank node per solution (SPARQL §17.4.2.9's zero-arg
        # form); the labeled form BNODE(expr) — same label -> same bnode
        # WITHIN a solution, distinct ACROSS solutions — needs a
        # solution identity no expression context carries, so it stays
        # a named error below
        return lambda df: F.concat(F.lit("_:b"), F.expr("replace(uuid(), '-', '')"))
    if name == "TIMEZONE":
        # xsd:dayTimeDuration of the literal's timezone, read from the
        # LEXICAL form ("Z"/"+00:00" -> "PT0S", "-05:00" -> "-PT5H",
        # "+05:30" -> "PT5H30M"); no timezone -> NULL (the spec's type
        # error), matching the lexical-read convention of YEAR..TZ above
        def timezone(df):
            tz = F.regexp_extract(args[0](df), r"(Z|[+-]\d{2}:\d{2})$", 1)
            h = F.nullif(
                F.regexp_extract(tz, r"^[+-](\d{2}):", 1), F.lit("")
            ).try_cast("int")
            m = F.nullif(
                F.regexp_extract(tz, r":(\d{2})$", 1), F.lit("")
            ).try_cast("int")
            sign = F.when(
                tz.startswith("-") & ((h > 0) | (m > 0)), F.lit("-")
            ).otherwise(F.lit(""))
            body = (
                F.when((h == 0) & (m == 0), F.lit("PT0S"))
                .when(m == 0, F.concat(F.lit("PT"), h.cast("string"), F.lit("H")))
                .when(h == 0, F.concat(F.lit("PT"), m.cast("string"), F.lit("M")))
                .otherwise(
                    F.concat(
                        F.lit("PT"), h.cast("string"), F.lit("H"),
                        m.cast("string"), F.lit("M"),
                    )
                )
            )
            return (
                F.when(tz == "Z", F.lit("PT0S"))
                .when(tz != "", F.concat(sign, body))
            )
        return timezone
    if name == "RAND":
        return lambda df: F.rand()
    if name == "NOW":
        return lambda df: F.date_format(
            F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"
        )
    if name == "CONCAT":
        return lambda df: F.concat(*[a(df) for a in args])
    if name == "IF":
        return lambda df: F.when(args[0](df), args[1](df)).otherwise(args[2](df))
    if name == "COALESCE":
        return lambda df: F.coalesce(*[a(df) for a in args])
    if name in fns and len(args) == 1:
        return lambda df: fns[name](args[0](df))
    if name in fns and len(args) == 2:
        return lambda df: fns[name](args[0](df), args[1](df))
    raise SparqlUnsupported(f"function {name}()")


def _annotate_graph(sub: dict, gterm) -> None:
    """Mark every pattern of a GRAPH block's group (and of its OPTIONAL/
    MINUS/EXISTS sub-groups and UNION branches) with the block's scope,
    producing 4-tuples ``(s, p, o, scope)``. A pattern already scoped
    (nested GRAPH) keeps the inner scope — SPARQL's innermost-GRAPH-wins.
    BIND/VALUES inside GRAPH propagate unchanged (expressions and inline
    data have no graph scope). A sub-SELECT under a CONSTANT scope
    annotates its own WHERE group recursively (its patterns evaluate in
    that graph); under a VARIABLE scope the subquery evaluates once per
    named graph with the graph variable riding through its projection
    (see _annotate_subselect_graph_var)."""
    if sub["subselects"]:
        for sq in sub["subselects"]:
            if isinstance(gterm, str) and gterm.startswith("?"):
                _annotate_subselect_graph_var(sq, gterm)
            else:
                _annotate_graph(sq["where"], gterm)

    def mark(patterns):
        return [
            pat if len(pat) > 3 else (*pat, gterm)
            for pat in patterns
        ]

    def mark_group(grp):
        # a modifier group is a plain pattern list or a sub-group dict;
        # dicts mark recursively (nested modifier groups + union blocks +
        # nested sub-SELECT WHERE groups, same scope rules)
        if not isinstance(grp, dict):
            return mark(grp)
        for sq in grp.get("subselects") or []:
            if isinstance(gterm, str) and gterm.startswith("?"):
                _annotate_subselect_graph_var(sq, gterm)
            else:
                _annotate_graph(sq["where"], gterm)
        return {
            **grp,
            "patterns": mark(grp["patterns"]),
            "optional": [mark_group(x) for x in grp["optional"]],
            "minus": [mark_group(x) for x in grp["minus"]],
            "exists": [mark_group(x) for x in grp["exists"]],
            "not_exists": [mark_group(x) for x in grp["not_exists"]],
            "unions": [
                [mark_group(b) for b in block] for block in grp["unions"]
            ],
        }

    sub["patterns"] = mark(sub["patterns"])
    sub["optional"] = [mark_group(grp) for grp in sub["optional"]]
    sub["minus"] = [mark_group(grp) for grp in sub["minus"]]
    sub["exists"] = [mark_group(grp) for grp in sub["exists"]]
    sub["not_exists"] = [mark_group(grp) for grp in sub["not_exists"]]
    sub["unions"] = [
        [mark_group(branch) for branch in block]
        for block in sub["unions"]
    ]


def _annotate_subselect_graph_var(sq: dict, gvar: str) -> None:
    """Sub-SELECT under ``GRAPH ?g`` (SPARQL §13.3: the subquery evaluates
    once per named graph, with ?g binding outside): the subquery's own
    patterns take the VARIABLE scope, and ?g rides through its projection
    and grouping — per-graph evaluation of DISTINCT and aggregates is
    exactly "?g added to the group keys / projected set", and
    LIMIT/OFFSET becomes a per-graph row_number-window slice
    (``graph_slice`` in _compile_select, aggregate ORDER BY keys
    included — they materialize as hidden __o columns through the
    deferred projection). A subquery whose PATTERNS reuse the graph
    variable name is alpha-renamed: §18.2.1 scoping makes the inner
    occurrence a DIFFERENT variable (only projected variables leave a
    subquery), so a fresh name preserves semantics while keeping it
    clear of the graph scope column. Named residuals: the subquery
    PROJECTING the graph variable (that joins the projected values
    against the graph IRI — not rendered), and internal reuse inside an
    expression or a nested sub-SELECT (expressions are opaque lambdas by
    then; a nested projection would re-expose the renamed name)."""
    name = gvar[1:]
    if sq.get("limit") is not None or sq.get("offset"):
        # per-graph slice: _compile_select turns the subquery's
        # LIMIT/OFFSET into a row_number window partitioned by the graph
        # variable (a single-frame limit would cut across graphs)
        sq["graph_slice"] = name
    if name in sq["select"]:
        raise SparqlUnsupported(
            f"subquery inside GRAPH {gvar} projects {gvar}"
        )
    uses = set()
    for pat in _group_patterns_text(sq["where"]):
        # scope position included: an inner GRAPH ?g reuses the name too
        uses.update(x for x in pat if isinstance(x, str))
    # a variable SERVICE endpoint is a use the pattern walk cannot see
    uses |= _service_endpoint_vars(sq["where"])
    # BIND targets / VALUES names rebind the name too — their READERS are
    # opaque lambdas by now, so they cannot be alpha-renamed: named error
    rebound = gvar in _bound_target_vars(sq["where"])
    if gvar in uses or rebound:
        nested = any(
            sq2["star"] or name in sq2["select"] or any(
                gvar in pat
                for pat in _group_patterns_text(sq2["where"])
            )
            for sq2 in _nested_subselects(sq["where"])
        )
        # the outer graph binding rides on the scope column of the
        # subquery's UNSCOPED patterns; with none left (every pattern
        # sits under an inner GRAPH), the subquery is graph-independent
        # and ?g would need a graphs-list cross product — not rendered
        anchored = any(
            len(pat) == 3 for pat in sq["where"].get("patterns") or []
        )
        if sq["star"] or nested or not anchored or rebound or (
            name in sq.get("expr_vars", ())
        ):
            raise SparqlUnsupported(
                f"subquery inside GRAPH {gvar} already uses {gvar} "
                "internally (in an expression, a BIND/VALUES binding, "
                "a nested sub-SELECT, under SELECT *, or with no "
                "outer-scoped pattern)"
            )
        # pattern-only internal reuse: rename every occurrence (term and
        # scope positions) to a fresh variable — the §18.2.1 alpha-rename
        sq["where"] = _rename_var(sq["where"], gvar, f"?__gv_{name}")
    _annotate_graph(sq["where"], gvar)
    if not sq["star"] and name not in sq["select"]:
        sq["select"].append(name)
    if sq["agg"]:
        if sq["group_by"] is None:
            # implicit single group -> one group PER GRAPH
            sq["group_by"] = [gvar]
        elif gvar not in sq["group_by"]:
            sq["group_by"] = [*sq["group_by"], gvar]


def _bound_target_vars(g) -> set:
    """Every BIND target and VALUES name bound anywhere in a parsed group
    dict (nested modifier groups, union branches, sub-SELECTs, SERVICE
    bodies included), as ``?name`` strings — bindings the pattern walk
    cannot see."""
    out = set()
    if isinstance(g, dict):
        out |= {v for _, v in g.get("binds") or []}
        for names, _rows in g.get("values") or []:
            out |= {"?" + n for n in names}
        for sub in (
            *(g.get("optional") or []), *(g.get("minus") or []),
            *(g.get("exists") or []), *(g.get("not_exists") or []),
        ):
            out |= _bound_target_vars(sub)
        for block in g.get("unions") or []:
            for branch in block:
                out |= _bound_target_vars(branch)
        for sq in g.get("subselects") or []:
            out |= _bound_target_vars(sq["where"])
        for svc in g.get("services") or []:
            out |= _bound_target_vars(svc["select"]["where"])
    return out


def _group_patterns_text(g) -> list:
    """Every triple pattern of a parsed group dict (patterns + nested
    modifier groups + union branches), recursively — the textual-front-end
    twin of sparql._group_patterns (which walks compiled groups)."""
    out = []
    if isinstance(g, dict):
        out.extend(g.get("patterns") or [])
        for sub in (
            *(g.get("optional") or []), *(g.get("minus") or []),
            *(g.get("exists") or []), *(g.get("not_exists") or []),
        ):
            out.extend(_group_patterns_text(sub))
        for block in g.get("unions") or []:
            for branch in block:
                out.extend(_group_patterns_text(branch))
        for sq in g.get("subselects") or []:
            out.extend(_group_patterns_text(sq["where"]))
        for svc in g.get("services") or []:
            out.extend(_group_patterns_text(svc["select"]["where"]))
    else:
        out.extend(g)
    return out


def _nested_subselects(g):
    """Every sub-SELECT dict nested anywhere in a parsed group
    (directly, in modifier groups, in union branches, or inside other
    sub-SELECTs), depth-first."""
    out = []
    if isinstance(g, dict):
        for sq in g.get("subselects") or []:
            out.append(sq)
            out.extend(_nested_subselects(sq["where"]))
        for svc in g.get("services") or []:
            out.extend(_nested_subselects(svc["select"]["where"]))
        for sub in (
            *(g.get("optional") or []), *(g.get("minus") or []),
            *(g.get("exists") or []), *(g.get("not_exists") or []),
        ):
            out.extend(_nested_subselects(sub))
        for block in g.get("unions") or []:
            for branch in block:
                out.extend(_nested_subselects(branch))
    return out


def _rename_var(g, old: str, new: str):
    """Alpha-rename a variable in every pattern of a parsed group —
    term positions AND graph-scope positions (an inner ``GRAPH ?g``
    block reuses the name the same way) — recursively through modifier
    groups and union branches. Sub-SELECTs are left untouched (their
    occurrences are separate scopes; callers reject the ambiguous
    cases). Returns the renamed structure; plain pattern lists rebuild
    as lists."""
    def ren(pat):
        return tuple(new if x == old else x for x in pat)

    if isinstance(g, dict):
        out = dict(g)
        out["patterns"] = [ren(p) for p in g.get("patterns") or []]
        for key in ("optional", "minus", "exists", "not_exists"):
            out[key] = [_rename_var(x, old, new) for x in g.get(key) or []]
        out["unions"] = [
            [_rename_var(b, old, new) for b in block]
            for block in g.get("unions") or []
        ]
        # SERVICE bodies share the enclosing variable scope (federated
        # query joins on shared names), so the rename reaches them too —
        # a variable ENDPOINT included
        out["services"] = [
            {
                **svc,
                "endpoint": new if svc["endpoint"] == old else svc["endpoint"],
                "select": {
                    **svc["select"],
                    "where": _rename_var(svc["select"]["where"], old, new),
                },
            }
            for svc in g.get("services") or []
        ]
        return out
    return [ren(p) for p in g]


def _service_endpoint_vars(g) -> set:
    """Every variable SERVICE endpoint (``SERVICE ?e``) anywhere in a
    parsed group, recursively — these are variable uses the pattern walk
    cannot see."""
    out = set()
    if isinstance(g, dict):
        for svc in g.get("services") or []:
            if svc["endpoint"].startswith("?"):
                out.add(svc["endpoint"])
            out |= _service_endpoint_vars(svc["select"]["where"])
        for sub in (
            *(g.get("optional") or []), *(g.get("minus") or []),
            *(g.get("exists") or []), *(g.get("not_exists") or []),
        ):
            out |= _service_endpoint_vars(sub)
        for block in g.get("unions") or []:
            for branch in block:
                out |= _service_endpoint_vars(branch)
        for sq in g.get("subselects") or []:
            out |= _service_endpoint_vars(sq["where"])
    return out


def _dataset(q: dict):
    """Resolve the query's dataset clause: returns (default_graph,
    named_graphs). FROM NAMED without FROM leaves the DEFAULT graph empty
    (SPARQL §13.2) — compiled as an empty merge set that matches nothing."""
    named = q.get("named")
    graph = q["graph"]
    if graph is None and named is not None:
        graph = ()
    return graph, named


_SUBGROUP_KEYS = (
    "patterns", "optional", "minus", "exists", "not_exists",
    "filters", "binds", "values", "unions", "subselects", "services",
)


def _subgroup(sub: dict, what: str):
    """Reduce a parsed sub-group (OPTIONAL/MINUS/EXISTS body or a UNION
    branch) to what the engine compiles: a plain pattern list when the
    group is bare (the common fast path), else a sub-group dict carrying
    its own modifiers, compiled recursively by ``sparql._group_frame``
    (nested OPTIONAL, MINUS, EXISTS, FILTER, BIND, VALUES, UNION blocks,
    and sub-SELECTs — the latter pre-compiled to solution frames by
    ``_resolve_subselects``). A group with modifiers but nothing to
    match them against (no patterns, no unions, no sub-SELECTs) is
    rejected rather than silently empty."""
    extras = [k for k in _SUBGROUP_KEYS[1:] if sub[k]]
    if not extras:
        return sub["patterns"]
    if (
        not sub["patterns"] and not sub["unions"]
        and not sub["subselects"] and not sub["services"]
    ):
        raise SparqlUnsupported(
            f"{what} with only {extras} and no patterns"
        )
    return {k: sub[k] for k in _SUBGROUP_KEYS}


def _service_frames(pipe, grp, stage):
    """Compile a group's SERVICE blocks (SPARQL 1.1 Federated Query) to
    solution frames against REGISTERED endpoints — ``KgPipeline.
    register_service(iri, pipeline)`` maps an endpoint IRI to another
    loaded pipeline, and the block's patterns evaluate there, joining
    the enclosing group on shared variables exactly like sub-SELECT
    frames (reference surface: Ontop federation, pom.xml:118-127; real
    HTTP federation is out of scope — an unregistered endpoint is a
    named error). ``SERVICE SILENT`` turns ANY failure into the spec's
    single empty solution μ0 (§18.8, a join identity): the block
    contributes no frame and its exclusive variables stay unbound —
    returned as ``mu0_vars`` for the caller to NULL-bind."""
    def svc_vars(svc):
        names = {
            x[1:]
            for pat in _group_patterns_text(svc["select"]["where"])
            for x in pat
            if isinstance(x, str) and x.startswith("?")
        }
        if svc["endpoint"].startswith("?"):
            names.add(svc["endpoint"][1:])
        return names

    registry = getattr(pipe, "services", None) or {}
    frames, mu0_vars, framed_vars = [], set(), set()
    for svc in grp.get("services") or []:
        ep = svc["endpoint"]
        # outer term inspection (LANG/DATATYPE/is*/sameTerm) over a var
        # this block binds: the endpoint-side compile must carry the
        # hidden metadata columns out through its projection — without
        # this the outer read falls back to the type-error NULL even for
        # genuinely pattern-bound endpoint variables
        need_meta = {
            v[1:] for v in (svc["select"].get("meta_vars") or ())
        } & svc_vars(svc)
        svc["select"]["keep_meta"] = bool(need_meta)
        try:
            if ep.startswith("?"):
                # SERVICE ?e: evaluate against EVERY registered endpoint,
                # the variable binding each endpoint's IRI (the union of
                # per-endpoint solutions — federated-query §2.4's
                # implementation-defined candidate set is the registry)
                frames.append(
                    _variable_endpoint_frame(registry, svc, ep[1:], stage)
                )
            else:
                target = registry.get(ep)
                if target is None:
                    raise SparqlCompileError(
                        f"SERVICE endpoint not registered: <{ep}>"
                        " — map it to a pipeline with"
                        " KgPipeline.register_service(iri, pipeline)"
                    )
                frames.append(_compile_select(target, svc["select"], stage))
            framed_vars |= svc_vars(svc)
        except Exception:
            # SILENT swallows any failure by spec — unregistered
            # endpoint, endpoint-side compile/analysis error alike
            if not svc["silent"]:
                raise
            mu0_vars |= svc_vars(svc)
    # a variable another (successful) SERVICE frame provides is bound —
    # it must not be NULL-bound over
    return frames, mu0_vars - framed_vars


def _variable_endpoint_frame(registry, svc, ename: str, stage):
    """The union-over-registered-endpoints frame for ``SERVICE ?e``:
    each endpoint's solutions tagged with (or, when the block's own
    patterns bind the endpoint variable, filtered against) its IRI.
    Under SILENT an endpoint that fails to compile is skipped; no
    endpoints at all (or all skipped) raises, which the caller's SILENT
    handling turns into the empty solution."""
    parts = []
    for iri in sorted(registry):
        try:
            f = _compile_select(registry[iri], svc["select"], stage)
        except Exception:
            if not svc["silent"]:
                raise
            continue
        if ename in f.columns:
            f = f.where(F.col(ename) == F.lit(iri))
        else:
            f = f.withColumn(ename, F.lit(iri))
        parts.append(f)
    if not parts:
        raise SparqlCompileError(
            "SERVICE with a variable endpoint and no registered"
            " endpoints (KgPipeline.register_service)"
        )
    out = parts[0]
    for f in parts[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def _mu0_binds(grp, mu0_vars: set, frames=()):
    """NULL-binds for the μ0 (SERVICE SILENT failure) variables that
    nothing else in the group binds — those columns must still exist
    for the projection, unbound per the spec. "Bound elsewhere" covers
    the group's patterns (modifier groups and union branches included),
    BIND targets, VALUES names, and every column a compiled frame
    (sub-SELECT / successful SERVICE) provides — frame columns include
    expression ALIASES (``(MAX(?o) AS ?m)``) that no pattern walk can
    see; NULL-binding over one would blank a real joined column."""
    bound = {
        x[1:]
        for pat in _group_patterns_text({**grp, "services": []})
        for x in pat
        if isinstance(x, str) and x.startswith("?")
    }
    bound |= {v[1:] for _, v in grp.get("binds") or []}
    for names, _rows in grp.get("values") or []:
        bound |= set(names)
    for f in frames:
        bound |= {c for c in f.columns if not c.startswith("__")}
    return [
        (lambda df: F.lit(None).cast("string"), "?" + v)
        for v in sorted(mu0_vars - bound)
    ]


def _resolve_subselects(pipe, grp, stage):
    """Compile every sub-SELECT nested in a modifier group to its
    solution DataFrame (stowed under the group's ``frames`` key, which
    ``sparql._group_frame`` seeds ``bgp`` with) — recursively, so
    sub-SELECTs inside nested OPTIONAL/MINUS/EXISTS/UNION sub-groups
    compile too; SERVICE blocks compile to frames the same way. Plain
    pattern lists pass through untouched."""
    if not isinstance(grp, dict):
        return grp
    svc_frames, mu0 = _service_frames(pipe, grp, stage)
    out = {k: grp[k] for k in _SUBGROUP_KEYS if k in grp}
    out["frames"] = list(grp.get("frames") or []) + [
        _compile_select(pipe, sub, stage)
        for sub in grp.get("subselects") or []
    ] + svc_frames
    out["subselects"] = []
    out["services"] = []
    if mu0:
        # ahead of user binds, so a BIND may read the NULL column
        out["binds"] = _mu0_binds(grp, mu0, out["frames"]) + list(
            out.get("binds") or []
        )
    for key in ("optional", "minus", "exists", "not_exists"):
        out[key] = [_resolve_subselects(pipe, x, stage) for x in out.get(key, [])]
    out["unions"] = [
        [_resolve_subselects(pipe, b, stage) for b in block]
        for block in out.get("unions", [])
    ]
    return out


def parse_sparql(text: str) -> dict:
    """Parse a SPARQL query string (SELECT/ASK/CONSTRUCT) into the
    compile plan dict (``q["form"]`` names the query form)."""
    return _Parser(text).parse_query()


def _compile_select(pipe, q: dict, stage: str | None):
    """Compile a parsed SELECT plan dict to a DataFrame (recursive for
    sub-SELECT groups)."""
    from .sparql import bgp_on_pipeline, bgp_union_on_pipeline

    w = q["where"]
    graph, named = _dataset(q)
    if graph is None:
        graph = w["graph"]
    values = w["values"]
    post_agg_exprs: list = []
    deferred = False

    unions = w["unions"]
    pure_union = bool(unions) and not w["patterns"]
    if pure_union and len(unions) == 1 and not q.get("keep_meta") and not (
        q["agg"] or values or w["subselects"] or w["services"]
        or q["select_exprs"]
        or w["filters"] or w["optional"] or w["minus"] or w["binds"]
        or w["exists"] or w["not_exists"] or q["group_by"] is not None
    ):
        # pure union group, no modifiers: each branch compiles to its own
        # BGP and the solutions concatenate (NULL for variables a branch
        # leaves unbound)
        select = None if q["star"] else ["?" + v for v in q["select"]]
        out = bgp_union_on_pipeline(
            pipe,
            [_resolve_subselects(pipe, b, stage) for b in unions[0]],
            select=select, distinct=q["distinct"],
            stage=stage, graph=graph, named_graphs=named,
        )
    else:
        # a pure-UNION group WITH modifiers rides the mixed path: the
        # union frame seeds bgp's solution set (empty pattern list) and
        # FILTER/OPTIONAL/MINUS/BIND/aggregates apply on top. For a
        # SINGLE union block the branches themselves carry the term
        # metadata (each branch scans with term_meta; a branch not
        # binding the variable unions in NULL metadata = the spec's type
        # error). With SEVERAL blocks every block's frame carries its own
        # metadata and bgp joins them first-frame-wins, never on the
        # hidden columns (plans/sparql.py frame join).
        meta = frozenset(q.get("meta_vars") or ())
        union_meta = meta if pure_union else frozenset()
        filters = w["filters"]
        filt = None
        if filters:
            def filt(df, fs=filters):  # noqa: E731
                cond = fs[0](df)
                for f in fs[1:]:
                    cond = cond & f(df)
                return cond
        select = None if q["star"] else ["?" + v for v in q["select"]]
        binds = list(w["binds"])
        if q["select_exprs"]:
            if q["agg"]:
                # SELECT expressions over aggregate results run
                # post-grouping: their aggregate calls registered hidden
                # agg columns at parse time, the expression itself
                # becomes a plain column over the aggregation output
                # (group keys are plain columns there). A NON-aggregate
                # expression in an implicit-group query has no columns
                # to read — spec-invalid, named here.
                if q["group_by"] is None and any(
                    not has_agg for _, _, has_agg in q["select_exprs"]
                ):
                    raise SparqlUnsupported(
                        "non-aggregate SELECT expression combined with "
                        "aggregates and no GROUP BY"
                    )
                post_agg_exprs = [(e, v) for e, v, _ in q["select_exprs"]]
            else:
                # no aggregation: a per-solution projection expression
                # compiles as a trailing BIND
                binds.extend((e, "?" + v) for e, v, _ in q["select_exprs"])
        keyonly_group = q["group_by"] is not None and not q["agg"]
        group_keys: list = []
        if keyonly_group:
            # GROUP BY without any aggregate (§11): solutions group by
            # the keys and each group yields exactly one row of its key
            # values — implemented as select(keys).distinct() over ALL
            # keys (hidden __g expression keys included), projected to
            # the SELECT subset after. Only group keys are projectable;
            # SELECT * over a grouped query is spec-invalid.
            if q["star"]:
                raise SparqlUnsupported("SELECT * with GROUP BY")
            group_keys = [v[1:] for v in q["group_by"]]
            bad = [v for v in q["select"] if v not in group_keys]
            if bad:
                raise SparqlUnsupported(
                    "SELECT of non-group-key variable(s) "
                    f"{bad} with GROUP BY and no aggregate"
                )
            select = ["?" + k for k in group_keys]
        deferred = bool(q.get("order_agg") or post_agg_exprs)
        if deferred:
            # keep the full aggregation output (hidden __h columns, group
            # keys) through the post-agg expressions and the sort; the
            # projection runs after. DISTINCT + aggregate ORDER BY keeps
            # one best-ranked duplicate per projected tuple (see the
            # deferred projection below).
            select = None
        frames = [_compile_select(pipe, sub, stage) for sub in w["subselects"]]
        svc_frames, mu0 = _service_frames(pipe, w, stage)
        frames += svc_frames
        if mu0:
            # ahead of user binds, so a BIND may read the NULL column
            binds = _mu0_binds(w, mu0, frames) + binds
        groups = {
            key: [_resolve_subselects(pipe, x, stage) for x in w[key]]
            for key in ("optional", "minus", "exists", "not_exists")
        }
        for block in unions:
            # UNION mixed with other patterns (or several UNION blocks in
            # one group): SPARQL Join(Union(A,B), G) — each block compiles
            # to its own frame and joins the required part / the other
            # blocks on shared variables (bound compatibility; a branch-
            # unbound NULL does not match, the documented narrowing)
            frames.append(
                bgp_union_on_pipeline(
                    pipe,
                    [_resolve_subselects(pipe, b, stage) for b in block],
                    stage=stage, graph=graph, named_graphs=named,
                    term_meta=union_meta,
                )
            )
        frames = frames or None
        out = bgp_on_pipeline(
            pipe,
            w["patterns"],
            select=select,
            distinct=(q["distinct"] and not deferred) or keyonly_group,
            stage=stage,
            optional=groups["optional"] or None,
            filter=filt,
            graph=graph,
            minus=groups["minus"] or None,
            exists=groups["exists"] or None,
            not_exists=groups["not_exists"] or None,
            bind=binds or None,
            group_by=q["group_by"] if q["agg"] else None,
            agg={k: v for k, v in q["agg"].items()} or None,
            values=values or None,
            frames=frames,
            having=q["having"],
            term_meta=frozenset(q.get("meta_vars") or ()),
            named_graphs=named,
            # SERVICE-body compiles set keep_meta so the frame carries
            # the hidden term-metadata columns OUT to the enclosing
            # group (outer LANG()/DATATYPE() over service-bound vars)
            keep_meta=bool(q.get("keep_meta")),
        )
        if keyonly_group:
            # HAVING over a no-aggregate grouping filters the grouped
            # rows (bgp applies having only on its aggregate path)
            h = q["having"]
            if h is not None:
                out = out.where(h(out) if callable(h) else h)
            if list(q["select"]) != group_keys:
                # project to the SELECT subset, dropping hidden __g
                # expression keys; the projection can duplicate rows
                # (several groups sharing the selected key values) —
                # that IS the grouped multiset unless DISTINCT re-dedupes
                out = out.select(*q["select"])
                if q["distinct"]:
                    out = out.distinct()
    for e, v in post_agg_exprs:
        # post-aggregation SELECT expressions (aggregate calls read
        # their hidden __h columns; group keys are plain columns)
        out = out.withColumn(v, e(out) if callable(e) else e)
    for var_names, rows in q["values"]:
        # trailing VALUES joins the QUERY result (SPARQL rule [28] —
        # after projection), so it sees the projected columns. Bound
        # compatibility only: a solution with the variable unbound (NULL
        # from OPTIONAL) does not match — a documented narrowing. UNDEF
        # cells constrain nothing (see sparql.join_values).
        from .sparql import join_values

        out, _ = join_values(
            out, list(var_names), rows, set(out.columns)
        )

    def _sort(df):
        # one orderBy with ALL keys: chaining orderBy calls would re-sort
        # from scratch each time, dropping every earlier (secondary) key
        return df.orderBy(*[
            (e(df).desc() if desc else e(df).asc()) for e, desc in q["order"]
        ])

    if q["order"] and not (deferred and q["distinct"]):
        out = _sort(out)
    gslice = q.get("graph_slice")
    gslice_active = gslice is not None and (
        q["offset"] or q["limit"] is not None
    )
    # aggregate ORDER BY keys under a per-graph slice: the keys read
    # hidden __h columns the deferred projection drops, so materialize
    # them as __o columns that survive the projection for the slice
    # window to order by (dropped after the slice)
    gslice_okeys: list = []
    if deferred:
        if q["distinct"] and q.get("order_agg"):
            # DISTINCT + aggregate ORDER BY: the sort keys read hidden
            # __h columns the projection must drop, while DISTINCT
            # applies to the PROJECTED rows. Materialize each key as a
            # hidden __o column, keep ONE best-ranked duplicate per
            # projected tuple (row_number window — duplicates differ
            # only in hidden columns), order the survivors by their
            # keys, then drop the hidden columns.
            from pyspark.sql import Window

            okeys = []
            for i, (e, desc) in enumerate(q["order"]):
                nm = f"__o{i}"
                out = out.withColumn(nm, e(out) if callable(e) else e)
                okeys.append((nm, desc))
            sel = (
                q["select"]
                if not q["star"]
                else [
                    c for c in out.columns
                    if not c.startswith(("__h", "__g", "__o"))
                ]
            )
            by_keys = [
                F.col(nm).desc() if desc else F.col(nm).asc()
                for nm, desc in okeys
            ]
            wnd = Window.partitionBy(*sel).orderBy(*by_keys)
            out = (
                out.select(*sel, *[nm for nm, _ in okeys])
                .withColumn("__rn", F.row_number().over(wnd))
                .where(F.col("__rn") == 1)
                .orderBy(*by_keys)
            )
            if gslice_active:
                gslice_okeys = okeys  # the slice drops them after
            else:
                out = out.select(*sel)
        else:
            if gslice_active and q.get("order_agg") and q["order"]:
                for i, (e, desc) in enumerate(q["order"]):
                    nm = f"__o{i}"
                    out = out.withColumn(nm, e(out) if callable(e) else e)
                    gslice_okeys.append((nm, desc))
            # the deferred projection (hidden __h sort keys drop here; a
            # bare projection preserves the sort order)
            out = (
                out.select(*q["select"], *[nm for nm, _ in gslice_okeys])
                if not q["star"]
                else out.drop(
                    *[c for c in out.columns if c.startswith(("__h", "__g"))]
                )
            )
            if q["distinct"]:
                # DISTINCT applies to the projected rows; an ORDER BY
                # (plain alias keys here) re-sorts the distinct output
                out = out.distinct()
                if q["order"]:
                    out = _sort(out)
    if gslice_active:
        # sub-SELECT under GRAPH ?g (§13.3 evaluates the subquery once
        # per named graph): the LIMIT/OFFSET slice applies PER GRAPH — a
        # single-frame limit would take k rows across ALL graphs. Slice
        # with a row_number window partitioned by the graph variable,
        # ordered by the subquery's ORDER BY keys (materialized hidden
        # __o columns for aggregate keys, re-evaluated otherwise — plain
        # alias keys survive the projection) or, unordered, by every
        # projected column (arbitrary-but-deterministic; any k-subset is
        # spec-valid without ORDER BY). Runs after DISTINCT/projection,
        # matching the §15 modifier order.
        from pyspark.sql import Window

        if gslice_okeys:
            keys = [
                F.col(nm).desc() if desc else F.col(nm).asc()
                for nm, desc in gslice_okeys
            ]
        elif q["order"]:
            keys = []
            for e, desc in q["order"]:
                k = e(out) if callable(e) else e
                keys.append(k.desc() if desc else k.asc())
        else:
            keys = [F.col(c) for c in out.columns if c != gslice]
            if not keys:  # SELECT projects only the graph var
                keys = [F.lit(1)]
        wnd = Window.partitionBy(gslice).orderBy(*keys)
        out = out.withColumn("__rn", F.row_number().over(wnd))
        lo = q["offset"] or 0
        cond = F.col("__rn") > lo
        if q["limit"] is not None:
            cond = cond & (F.col("__rn") <= lo + q["limit"])
        return out.where(cond).drop(
            "__rn", *[nm for nm, _ in gslice_okeys]
        )
    if q["offset"]:
        out = out.offset(q["offset"])
    if q["limit"] is not None:
        out = out.limit(q["limit"])
    return out


def _where_solutions(pipe, q: dict, stage: str | None, keep_meta: bool = False):
    """Compile a parsed WHERE group (ASK/CONSTRUCT/DESCRIBE — the forms
    without projection) to its solution frame, sharing SELECT's UNION
    handling: a pure-UNION group concatenates branch solutions; a UNION
    mixed with required patterns joins on shared variables.

    ``keep_meta``: retain the hidden ``__kind_/__lang_/__dt_`` term
    metadata columns of ``q["meta_vars"]`` in the output (SPARQL Update
    template instantiation needs exact term identity per binding; the
    pure-union fast path drops them, so it is skipped)."""
    from .sparql import bgp_on_pipeline, bgp_union_on_pipeline

    w = q["where"]
    graph, named = _dataset(q)
    if graph is None:
        graph = w["graph"]
    unions = w["unions"]
    pure_union = bool(unions) and not w["patterns"]
    if pure_union and len(unions) == 1 and not keep_meta and not (
        w["filters"] or w["optional"] or w["minus"] or w["binds"]
        or w["exists"] or w["not_exists"] or w["values"] or w["subselects"]
        or w["services"]
    ):
        return bgp_union_on_pipeline(
            pipe,
            [_resolve_subselects(pipe, b, stage) for b in unions[0]],
            stage=stage, graph=graph, named_graphs=named,
        )
    meta = frozenset(q.get("meta_vars") or ())
    # each pure-union block's frame carries its own term metadata; bgp
    # joins frames first-frame-wins on lexical bindings only
    union_meta = meta if pure_union else frozenset()
    filters = w["filters"]
    filt = None
    if filters:
        def filt(df, fs=filters):  # noqa: E731
            cond = fs[0](df)
            for f in fs[1:]:
                cond = cond & f(df)
            return cond
    frames = [_compile_select(pipe, sub, stage) for sub in w["subselects"]]
    svc_frames, mu0 = _service_frames(pipe, w, stage)
    frames += svc_frames
    binds = list(w["binds"])
    if mu0:
        # ahead of user binds, so a BIND may read the NULL column
        binds = _mu0_binds(w, mu0, frames) + binds
    frames += [
        bgp_union_on_pipeline(
            pipe,
            [_resolve_subselects(pipe, b, stage) for b in block],
            stage=stage, graph=graph, named_graphs=named,
            term_meta=union_meta,
        )
        for block in unions
    ]
    groups = {
        key: [_resolve_subselects(pipe, x, stage) for x in w[key]]
        for key in ("optional", "minus", "exists", "not_exists")
    }
    return bgp_on_pipeline(
        pipe, w["patterns"], stage=stage,
        optional=groups["optional"] or None, filter=filt, graph=graph,
        minus=groups["minus"] or None, exists=groups["exists"] or None,
        not_exists=groups["not_exists"] or None, bind=binds or None,
        values=w["values"] or None, frames=frames or None,
        term_meta=meta,
        named_graphs=named,
        keep_meta=keep_meta,
    )


def _compile_ask(pipe, q: dict, stage: str | None):
    """ASK -> one-row DataFrame with a boolean ``ask`` column. Stays lazy
    and distributed: existence is a limit(1) left join against a
    constant row, not a driver-side count."""
    sol = _where_solutions(pipe, q, stage)
    marker = sol.limit(1).select(F.lit(True).alias("ask"))
    one = sol.sparkSession.range(1).select(F.lit(1).alias("__k"))
    return (
        one.join(marker.withColumn("__k", F.lit(1)), "__k", "left")
        .select(F.coalesce(F.col("ask"), F.lit(False)).alias("ask"))
    )


def _compile_construct(pipe, q: dict, stage: str | None):
    """CONSTRUCT -> (subject, predicate, object) triple frame, set
    semantics (the constructed result is an RDF graph). Template rows
    with an unbound variable are skipped per SPARQL §16.2; objects bind
    lexical forms."""
    from .sparql import Literal as _Lit

    sol = _where_solutions(pipe, q, stage)

    sliced = False
    if q.get("order"):
        # ORDER BY on CONSTRUCT: the solution sequence orders, the slice
        # applies to IT (before template instantiation) — a top-k of
        # solutions, each contributing all its template triples. Without
        # ORDER BY, which solutions a LIMIT keeps is unspecified and the
        # slice stays on the constructed triple set below.
        sol = sol.orderBy(*[
            (e(sol).desc() if desc else e(sol).asc())
            for e, desc in q["order"]
        ])
        if q["offset"]:
            sol = sol.offset(q["offset"])
        if q["limit"] is not None:
            sol = sol.limit(q["limit"])
        sliced = True

    # blank nodes in the template ([] / _:b) parse to synthetic variables
    # that the WHERE group never binds; per SPARQL §16.2.1 each solution
    # maps a template bnode to a FRESH bnode, so synthesize a label from
    # the template var + a row-unique id. A genuinely unbound NON-bnode
    # template variable stays NULL (its template rows emit no triples).
    bound = set(sol.columns)
    tmpl_bnodes = sorted(
        {
            t[1:]
            for trip in q["template"]
            for t in trip
            if isinstance(t, str)
            and t.startswith(("?__anon", "?__bn_"))
            and t[1:] not in bound
        }
    )
    if tmpl_bnodes:
        sol = sol.withColumn(
            "__cid", F.monotonically_increasing_id().cast("string")
        )
        for v in tmpl_bnodes:
            sol = sol.withColumn(
                v, F.concat(F.lit(f"_:{v.lstrip('_')}r"), F.col("__cid"))
            )
        bound = set(sol.columns)

    def term_col(t):
        if isinstance(t, str) and t.startswith("?"):
            # unbound template variable: NULL per solution, row filtered
            return F.col(t[1:]) if t[1:] in bound else F.lit(None)
        if isinstance(t, _Lit):
            return F.lit(t.lex)
        return F.lit(t)

    pieces = []
    for s, p, o in q["template"]:
        row = sol.select(
            term_col(s).alias("subject"),
            term_col(p).alias("predicate"),
            term_col(o).alias("object"),
        ).where(
            F.col("subject").isNotNull()
            & F.col("predicate").isNotNull()
            & F.col("object").isNotNull()
        )
        pieces.append(row)
    out = pieces[0]
    for piece in pieces[1:]:
        out = out.unionByName(piece)
    out = out.distinct()
    if not sliced:
        if q["offset"]:
            out = out.offset(q["offset"])
        if q["limit"] is not None:
            out = out.limit(q["limit"])
    return out


def _compile_describe(pipe, q: dict, stage: str | None):
    """DESCRIBE -> (subject, predicate, object) frame: every triple whose
    subject is a described resource (constants and/or the bindings of the
    described variables from the WHERE group). The described set joins
    the reconstructed triples with a semi join — plain (AQE broadcasts
    when the set is small; a DESCRIBE ?x over a huge solution set stays
    distributed)."""
    from .sparql import bgp_on_pipeline

    tr = pipe.triples(stage)
    spark = tr.sparkSession
    pieces = []
    if q["resources"]:
        pieces.append(
            spark.createDataFrame([(r,) for r in q["resources"]], "`s` string")
        )
    if q["where"] is not None and (q["vars"] or q.get("star")):
        sol = _where_solutions(pipe, q, stage)
        described = q["vars"]
        if q.get("star"):
            # DESCRIBE *: every variable the group binds (hidden columns
            # never appear — _where_solutions drops them)
            described = sorted(
                {*described, *("?" + c for c in sol.columns if not c.startswith("__"))}
            )
        for v in described:
            pieces.append(sol.select(F.col(v[1:]).alias("s")))
    subjects = pieces[0]
    for piece in pieces[1:]:
        subjects = subjects.unionByName(piece)
    subjects = subjects.where(F.col("s").isNotNull()).distinct()
    graph_all, _ = _dataset(q)
    if graph_all is not None:
        # the description draws from the query's default graph; an empty
        # merge set (FROM NAMED without FROM) describes nothing
        gs = (
            list(graph_all)
            if isinstance(graph_all, (list, tuple, set, frozenset))
            else [graph_all]
        )
        gd = pipe.graphs().where(
            F.col("iri").isin(gs) if gs else F.lit(False)
        ).select(F.col("id").alias("g_id"))
        tr = tr.join(gd, "g_id", "semi")
    return (
        tr.join(subjects, "s", "semi")
        .select(
            F.col("s").alias("subject"),
            F.col("p").alias("predicate"),
            F.col("o_lex").alias("object"),
        )
        .distinct()
    )


def sparql_query(pipe, text: str, stage: str | None = None):
    """Run a textual SPARQL query over a loaded :class:`KgPipeline`.

    The reference's flagship query runs verbatim::

        sparql_query(pipe, "SELECT DISTINCT ?type "
                           "FROM <http://example.org/graph> "
                           "WHERE {[] a ?type}")

    SELECT returns the solution frame; ASK a one-row boolean ``ask``
    frame; CONSTRUCT a deduplicated (subject, predicate, object) frame.
    """
    q = parse_sparql(text)
    if q["form"] == "ask":
        return _compile_ask(pipe, q, stage)
    if q["form"] == "construct":
        return _compile_construct(pipe, q, stage)
    if q["form"] == "describe":
        return _compile_describe(pipe, q, stage)
    return _compile_select(pipe, q, stage)
