"""RDF term / quad data model as Spark columns.

Reference model: Kineo's ``Term`` (IRI | blank | literal(lexical, type))
and ``Quad(subject, predicate, object, graph)`` —
/root/reference/Sources/Kineo/RDF/RDF.swift:335-391,
/root/reference/Sources/Kineo/QuadStore/QuadStore.swift:48-50.

Spark-native representation: a term is a 5-field struct column

    term = struct(kind tinyint, lex string, dt string, lang string, num double)

- ``kind``: 0 = IRI, 1 = blank node, 2 = literal.
- ``lex``:  IRI string / blank label / literal lexical form.
- ``dt``:   compact datatype token ('integer', 'double', 'string',
            'dateTime', ...) or a full custom datatype IRI; null for
            IRI/blank. Language-tagged literals use token 'langString'.
- ``lang``: language tag or null.
- ``num``:  typed shadow value so comparisons / aggregates / sorts run
            natively JVM-side: numeric value for numeric datatypes,
            0/1 for xsd:boolean, epoch MICROseconds for dateTime/date.
            This mirrors the reference's packed-ID value inlining
            (QuadStore/IdentityMap.swift:19-80) without a dictionary.

An *unbound* variable (and an errored expression — SPARQL error-as-
unbound, MaterializedQueryPlan.swift:427-439,501-513) is a NULL struct.

Join/group/dedup keys use a canonical string encoding (``term_key``)
rather than raw structs, so null-field semantics are never ambiguous and
shuffles carry a flat binary-comparable key.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, functions as F
from pyspark.sql import types as T

KIND_IRI = 0
KIND_BLANK = 1
KIND_LITERAL = 2
# RDF-star quoted triple (extension — the reference declares the
# rdf-tests-12 suite but ships no RDF-star surface). lex packs the three
# component term_keys behind a length header ("{l1}:{l2}:{l3}:"+keys),
# injective and flat-substring-extractable in pure Column expressions
# (see quoted()); dt, lang and num are NULL.
KIND_QUOTED = 3

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

# compact datatype tokens <-> full IRIs
_DT_TOKENS = [
    "string", "integer", "int", "long", "decimal", "float", "double",
    "boolean", "date", "dateTime", "time", "duration",
    "yearMonthDuration", "dayTimeDuration", "anyURI",
]
DT_IRI = {t: XSD + t for t in _DT_TOKENS}
DT_IRI["langString"] = RDF_NS + "langString"
IRI_DT = {v: k for k, v in DT_IRI.items()}

NUMERIC_DTS = {"integer", "int", "long", "decimal", "float", "double"}
TEMPORAL_DTS = {"date", "dateTime", "time"}

TERM_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.ByteType()),
        T.StructField("lex", T.StringType()),
        T.StructField("dt", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("num", T.DoubleType()),
    ]
)

# Flat quads-table schema (FIXTURES.md §0): the generic on-disk layout.
QUADS_SCHEMA = T.StructType(
    [
        T.StructField("s_kind", T.ByteType()),
        T.StructField("s_lex", T.StringType()),
        T.StructField("p_lex", T.StringType()),
        T.StructField("o_kind", T.ByteType()),
        T.StructField("o_lex", T.StringType()),
        T.StructField("o_dt", T.StringType()),
        T.StructField("o_lang", T.StringType()),
        T.StructField("o_num", T.DoubleType()),
        T.StructField("g_lex", T.StringType()),
    ]
)


# ---------------------------------------------------------------------------
# Column-side constructors
# ---------------------------------------------------------------------------

# Constant-Column interning (r12). Every Column operation is a py4j
# round trip (~0.2-0.5 ms of driver latency); the term constructors
# below rebuild identical constant expression trees (typed NULLs, kind
# bytes, datatype literals) hundreds of times per compiled query, so
# plan CONSTRUCTION was a measured ~30-50% of short-query wall. Column
# expression trees are immutable and session-independent, so interning
# them per py4j gateway is safe (the same pattern read_table uses for
# DataFrames). The cache token lives ON the gateway object, so a torn-
# down/recreated gateway can never serve stale JVM references through
# a recycled id().
_CONST_CACHE: dict = {}


def _const(key, build):
    from pyspark import SparkContext

    gw = SparkContext._gateway
    if gw is None:  # no JVM yet — don't cache what can't exist
        return build()
    tok = getattr(gw, "_kineo_const_token", None)
    if tok is None:
        tok = object()
        gw._kineo_const_token = tok
        _CONST_CACHE.clear()  # new JVM: old Column refs are dead
    k = (id(tok), key)
    col = _CONST_CACHE.get(k)
    if col is None:
        col = build()
        if len(_CONST_CACHE) > 8192:
            _CONST_CACHE.clear()
        _CONST_CACHE[k] = col
    return col


def _b(kind: int) -> Column:
    return _const(("b", kind), lambda: F.lit(kind).cast("tinyint"))


def _NULL_S() -> Column:
    return _const("ns", lambda: F.lit(None).cast("string"))


def _NULL_D() -> Column:
    return _const("nd", lambda: F.lit(None).cast("double"))


def _slit(s: str) -> Column:
    """Interned string-literal Column (datatype names etc.)."""
    return _const(("s", s), lambda: F.lit(s))


def term_struct(kind: Column, lex: Column, dt: Column, lang: Column, num: Column) -> Column:
    return F.struct(
        kind.alias("kind"), lex.alias("lex"), dt.alias("dt"),
        lang.alias("lang"), num.alias("num"),
    )


def iri_col(lex: Column, nonnull: bool = False) -> Column:
    """IRI term from a string column (null-propagating unless the caller
    guarantees non-null — bare structs let Catalyst fold field access
    back to raw columns and push filters into parquet)."""
    t = term_struct(_b(KIND_IRI), lex, _NULL_S(), _NULL_S(), _NULL_D())
    if nonnull:
        return t
    return F.when(lex.isNotNull(), t)


def blank_col(label: Column) -> Column:
    t = term_struct(_b(KIND_BLANK), label, _NULL_S(), _NULL_S(), _NULL_D())
    return F.when(label.isNotNull(), t)


def lit_string_col(lex: Column, nonnull: bool = False) -> Column:
    t = term_struct(_b(KIND_LITERAL), lex, _slit("string"), _NULL_S(), _NULL_D())
    if nonnull:
        return t
    return F.when(lex.isNotNull(), t)


def lit_lang_col(lex: Column, lang: Column) -> Column:
    t = term_struct(_b(KIND_LITERAL), lex, _slit("langString"), lang, _NULL_D())
    return F.when(lex.isNotNull() & lang.isNotNull(), t)


def lit_numeric_col(value: Column, dt: str, nonnull: bool = False) -> Column:
    """Numeric literal from a native numeric column; lexical form is the
    canonical decimal/integer formatting of the value."""
    if dt in ("integer", "int", "long"):
        lex = value.cast("long").cast("string")
        num = value.cast("double")
    else:
        lex = value.cast("string")
        num = value.cast("double")
    t = term_struct(_b(KIND_LITERAL), lex, _slit(dt), _NULL_S(), num)
    if nonnull:
        return t
    return F.when(value.isNotNull(), t)


def lit_bool_col(value: Column, nonnull: bool = False) -> Column:
    t = term_struct(
        _b(KIND_LITERAL),
        F.when(value, "true").otherwise("false"),
        _slit("boolean"), _NULL_S(),
        value.cast("double"),
    )
    if nonnull:
        return t
    return F.when(value.isNotNull(), t)


def lit_datetime_col(ts: Column, nonnull: bool = False) -> Column:
    """dateTime literal from a native timestamp column. num = epoch µs."""
    t = term_struct(
        _b(KIND_LITERAL),
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
        _slit("dateTime"), _NULL_S(),
        F.unix_micros(ts).cast("double"),
    )
    if nonnull:
        return t
    return F.when(ts.isNotNull(), t)


def lit_date_col(d: Column, nonnull: bool = False) -> Column:
    t = term_struct(
        _b(KIND_LITERAL),
        F.date_format(d, "yyyy-MM-dd"),
        _slit("date"), _NULL_S(),
        F.unix_micros(d.cast("timestamp")).cast("double"),
    )
    if nonnull:
        return t
    return F.when(d.isNotNull(), t)


def term_from_spark_col(col: Column, dtype: T.DataType, nonnull: bool = False) -> Column:
    """Map a native Spark column to a typed literal term (relational →
    RDF adapter; FIXTURES.md §5). With ``nonnull`` (caller already
    filtered NULLs) the struct is built bare, so Catalyst folds
    ``term.num`` back to the raw column and pushes filters to parquet."""
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return lit_numeric_col(col, "integer", nonnull)
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return lit_numeric_col(col, "double", nonnull)
    if isinstance(dtype, T.DecimalType):
        return lit_numeric_col(col, "decimal", nonnull)
    if isinstance(dtype, T.BooleanType):
        return lit_bool_col(col, nonnull)
    if isinstance(dtype, T.TimestampType):
        return lit_datetime_col(col, nonnull)
    if isinstance(dtype, T.DateType):
        return lit_date_col(col, nonnull)
    return lit_string_col(col.cast("string"), nonnull)


# ---------------------------------------------------------------------------
# Keys and ordering
# ---------------------------------------------------------------------------

_SEP = "\u0001"


def term_key(term: Column) -> Column:
    """Canonical string identity of a term (sameTerm equality): kind + lex
    + dt + lang. num is derived from lex so it is excluded. NULL iff the
    term is unbound."""
    return F.when(
        term.isNotNull(),
        F.concat_ws(
            _SEP,
            term["kind"].cast("string"),
            term["lex"],
            F.coalesce(term["dt"], _slit("")),
            F.coalesce(term["lang"], _slit("")),
        ),
    )


def sort_key(term: Column) -> Column:
    """Total-order sort key implementing SPARQL ORDER BY semantics:
    unbound < blank < IRI < literal; literals compare by typed value when
    comparable, else lexical form (reference: OrderPlan,
    MaterializedQueryPlan.swift:705-748; sparqlCompare,
    Expression.swift:903-957). Spark orders structs field-wise, nulls
    first — which is exactly the 'unbound first' rule."""
    kind_rank = (
        F.when(term.isNull(), F.lit(-1))
        .when(term["kind"] == KIND_BLANK, F.lit(0))
        .when(term["kind"] == KIND_IRI, F.lit(1))
        .when(term["kind"] == KIND_QUOTED, F.lit(3))  # after literals
        .otherwise(F.lit(2))
    )
    is_valued = term["num"].isNotNull()
    return F.struct(
        kind_rank.alias("k"),
        # valued literals (numeric/boolean/temporal) sort before others by value
        F.when(term.isNull(), F.lit(None)).otherwise(is_valued.cast("int") * -1).alias("vflag"),
        term["num"].alias("num"),
        term["lex"].alias("lex"),
        term["dt"].alias("dt"),
        term["lang"].alias("lang"),
    )


# ---------------------------------------------------------------------------
# Driver-side terms (constants in queries)
# ---------------------------------------------------------------------------

def lexical_num(lex: str, dt: str | None) -> float | None:
    """The numeric shadow of a literal: float value for numerics,
    0/1 for booleans, epoch-µs (UTC) for temporals, else None. The one
    definition every loader and PyTerm share — value comparisons and
    datetime accessors read this column."""
    if dt in NUMERIC_DTS:
        try:
            return float(lex)
        except ValueError:
            return None
    if dt == "boolean":
        return 1.0 if lex == "true" else 0.0
    if dt in TEMPORAL_DTS:
        import datetime as _dt

        s = lex.replace("Z", "+00:00")
        try:
            if dt == "date":
                d = _dt.date.fromisoformat(s)
                val = _dt.datetime(d.year, d.month, d.day, tzinfo=_dt.timezone.utc)
            else:
                val = _dt.datetime.fromisoformat(s)
                if val.tzinfo is None:
                    val = val.replace(tzinfo=_dt.timezone.utc)
            return float(int(val.timestamp() * 1_000_000))
        except ValueError:
            return None
    return None


@dataclass(frozen=True)
class PyTerm:
    """A constant RDF term in a query (driver-side)."""

    kind: int
    lex: str
    dt: str | None = None
    lang: str | None = None

    @property
    def num(self) -> float | None:
        return lexical_num(self.lex, self.dt)

    def as_column(self) -> Column:
        # interned per term value (constant expression tree — see
        # _const): queries re-create equal PyTerm constants on every
        # compile, and each uncached build is ~12 py4j round trips
        return _const(
            ("term", self.kind, self.lex, self.dt, self.lang),
            lambda: term_struct(
                _b(self.kind),
                F.lit(self.lex),
                F.lit(self.dt).cast("string"),
                F.lit(self.lang).cast("string"),
                F.lit(self.num).cast("double"),
            ),
        )

    def key(self) -> str:
        return _SEP.join(
            [str(self.kind), self.lex, self.dt or "", self.lang or ""]
        )

    def n3(self) -> str:
        if self.kind == KIND_IRI:
            return f"<{self.lex}>"
        if self.kind == KIND_BLANK:
            return f"_:{self.lex}"
        if self.kind == KIND_QUOTED:
            s, p, o = quoted_parts(self)
            return f"<< {s.n3()} {p.n3()} {o.n3()} >>"
        # N-Triples STRING_LITERAL_QUOTE forbids raw LF and CR (tab is
        # legal raw); CR escaping also keeps line-framed sinks intact
        esc = (self.lex.replace("\\", "\\\\").replace('"', '\\"')
               .replace("\n", "\\n").replace("\r", "\\r"))
        if self.lang:
            return f'"{esc}"@{self.lang}'
        if self.dt and self.dt != "string":
            return f'"{esc}"^^<{DT_IRI.get(self.dt, self.dt)}>'
        return f'"{esc}"'


def iri(s: str) -> PyTerm:
    return PyTerm(KIND_IRI, s)


def blank(label: str) -> PyTerm:
    return PyTerm(KIND_BLANK, label)


def lit(value, dt: str | None = None, lang: str | None = None) -> PyTerm:
    if lang is not None:
        return PyTerm(KIND_LITERAL, str(value), "langString", lang)
    if dt is not None:
        return PyTerm(KIND_LITERAL, str(value), dt)
    if isinstance(value, bool):
        return PyTerm(KIND_LITERAL, "true" if value else "false", "boolean")
    if isinstance(value, int):
        return PyTerm(KIND_LITERAL, str(value), "integer")
    if isinstance(value, float):
        return PyTerm(KIND_LITERAL, repr(value), "double")
    return PyTerm(KIND_LITERAL, str(value), "string")


# ---------------------------------------------------------------------------
# RDF-star quoted triples (extension; see KIND_QUOTED above)
# ---------------------------------------------------------------------------

def quoted(s: PyTerm, p: PyTerm, o: PyTerm) -> PyTerm:
    """Quoted-triple constant << s p o >>. The lex is
    ``"{len1}:{len2}:{len3}:" + key1 + key2 + key3`` over the component
    term_keys — injective (keys are canonical identities) and, because
    the three lengths sit in a fixed header, each component is one flat
    ``substring`` in Column space (a sequential length-prefix walk would
    nest expressions and blow up Catalyst's tree, which duplicates
    subtrees at every reference). Nesting is unbounded: an inner quoted
    key contains ':' but the header split is limit-4 so the payload
    stays intact."""
    k1, k2, k3 = s.key(), p.key(), o.key()
    return PyTerm(KIND_QUOTED, f"{len(k1)}:{len(k2)}:{len(k3)}:{k1}{k2}{k3}")


def term_from_key(key: str) -> PyTerm:
    """Inverse of PyTerm.key(). For quoted terms the key is
    '3' SEP lex SEP SEP (dt and lang empty), and lex may itself contain
    SEP — recovered positionally, not by split."""
    kind = int(key.split(_SEP, 1)[0])
    if kind == KIND_QUOTED:
        return PyTerm(KIND_QUOTED, key[2:-2])
    k, lex, dt, lang = key.split(_SEP)
    return PyTerm(kind, lex, dt or None, lang or None)


def quoted_parts(t: PyTerm) -> tuple[PyTerm, PyTerm, PyTerm]:
    """Decode the three components of a quoted-triple term."""
    assert t.kind == KIND_QUOTED
    l1, l2, l3, payload = t.lex.split(":", 3)
    n1, n2, n3 = int(l1), int(l2), int(l3)
    return (
        term_from_key(payload[:n1]),
        term_from_key(payload[n1:n1 + n2]),
        term_from_key(payload[n1 + n2:n1 + n2 + n3]),
    )


def lexical_num_col(lex: Column, dt: Column) -> Column:
    """Column twin of lexical_num (the loaders' num-shadow rule)."""
    return (
        F.when(dt.isin(*NUMERIC_DTS), lex.try_cast("double"))
        .when(dt == "boolean", (lex == "true").cast("double"))
        .when(dt.isin(*TEMPORAL_DTS),
              F.unix_micros(F.try_to_timestamp(lex)).cast("double"))
    )


def quoted_col(s: Column, p: Column, o: Column) -> Column:
    """TRIPLE(s, p, o): construct a quoted-triple term column. Unbound
    or error components propagate to an unbound result (SPARQL error
    semantics)."""
    k1, k2, k3 = term_key(s), term_key(p), term_key(o)
    c = F.lit(":")
    lex = F.concat(F.length(k1).cast("string"), c,
                   F.length(k2).cast("string"), c,
                   F.length(k3).cast("string"), c, k1, k2, k3)
    t = term_struct(_b(KIND_QUOTED), lex, _NULL_S(), _NULL_S(), _NULL_D())
    return F.when(
        s.isNotNull() & p.isNotNull() & o.isNotNull(), t
    ).otherwise(F.lit(None).cast(TERM_SCHEMA))


def term_of_key_col(key: Column) -> Column:
    """Column inverse of term_key: rebuild the full term struct from a
    canonical key. Base-term keys split on SEP (base lex never contains
    SEP — the repo-wide term_key invariant); quoted keys are recovered
    positionally ('3' SEP lex SEP SEP)."""
    kind_s = F.substring_index(key, _SEP, 1)
    parts = F.split(key, _SEP)
    # try_element_at: base keys always carry 4 SEP-fields, but the same
    # CSE speculative-evaluation hazard as _packed_component applies
    # when this expression shares a predicate with other key forms
    lex_nq = F.try_element_at(parts, F.lit(2))
    dt = F.nullif(F.try_element_at(parts, F.lit(3)), F.lit(""))
    lang = F.nullif(F.try_element_at(parts, F.lit(4)), F.lit(""))
    base = term_struct(kind_s.cast("tinyint"), lex_nq, dt, lang,
                       lexical_num_col(lex_nq, dt))
    quoted_t = term_struct(_b(KIND_QUOTED),
                           F.substring(key, F.lit(3), F.length(key) - 4),
                           _NULL_S(), _NULL_S(), _NULL_D())
    return F.when(key.isNull(), F.lit(None).cast(TERM_SCHEMA)) \
        .when(kind_s == str(KIND_QUOTED), quoted_t).otherwise(base)


def _packed_component(lex: Column, i: int) -> Column:
    """Component-i term_key out of a packed quoted lex (header format).

    try_element_at, NOT element_at: callers guard with
    when(kind == KIND_QUOTED, ...), but codegen's common-subexpression
    elimination can hoist a subexpression shared across when-branches
    and evaluate it EAGERLY on non-quoted rows (observed: a star Update
    WHERE predicate threw INVALID_ARRAY_INDEX_IN_ELEMENT_AT from
    SpecificPredicate.subExpr on a 2-part plain-IRI lex). try_element_at
    yields NULL on the speculative path and identical values on the
    guarded one."""
    parts = F.split(lex, ":", 4)  # [len1, len2, len3, payload]
    # try_cast for the same reason: a speculatively-evaluated plain-IRI
    # lex puts '//host/...' in parts[2], which an ANSI int cast throws on
    ln = lambda j: F.try_element_at(parts, F.lit(j)).try_cast("int")  # noqa: E731
    start = F.lit(1)
    for j in range(1, i + 1):
        start = start + ln(j)
    return F.substring(F.try_element_at(parts, F.lit(4)), start, ln(i + 1))


def quoted_component_key_col(t: Column, i: int) -> Column:
    """Raw component-i term_key of a quoted term — NULL when t is unbound
    or not quoted. This is the accessor's IDENTITY without the term-struct
    rebuild: sameTerm-style comparisons against another key (or a constant
    key string) stay a ~10-node expression instead of multiplying through
    term_key × bool_term × EBV fan-out (the 64KB-codegen cliff)."""
    return F.when(t.isNotNull() & (t["kind"] == KIND_QUOTED),
                  _packed_component(t["lex"], i))


def component_key_of_key(key: Column, i: int) -> Column:
    """Component-i term_key from a quoted term's KEY ('3' SEP lex SEP
    SEP) — key-space composition for nested accessor chains
    (SUBJECT(OBJECT(?qt))): each level costs ~4 references of the level
    below instead of the ~40 a full struct rebuild would multiply in.
    NULL when the key is NULL or not a quoted term's."""
    lex = F.substring(key, F.lit(3), F.length(key) - 4)
    return F.when(F.substring(key, F.lit(1), F.lit(2)) == f"{KIND_QUOTED}{_SEP}",
                  _packed_component(lex, i))


def quoted_component_col(t: Column, i: int) -> Column:
    """SUBJECT/PREDICATE/OBJECT(t): component i (0/1/2) of a quoted
    term, as a full term struct; unbound when t is not a quoted triple
    (SPARQL error → unbound; term_of_key_col propagates the NULL key)."""
    return term_of_key_col(quoted_component_key_col(t, i))
