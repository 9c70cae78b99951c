"""SPARQL expression AST → Spark Column compiler.

Reference evaluator: /root/reference/Sources/Kineo/SPARQL/Expression.swift
(28-876). Key semantics reproduced here (SURVEY §2.9, §7.4):

- **Error-as-NULL convention**: every compiled expression yields a NULL
  term struct where the reference would raise a query error; FILTER keeps
  a row only when EBV(expr) is literally true (errors drop the row,
  MaterializedQueryPlan.swift:427-439) and Extend/BIND leaves the
  variable unbound on error (:501-513).
- **EBV** (effective boolean value) with type errors
  (Expression.swift:14-26).
- **Numeric type promotion** for + - * / via resultType(for:withOperandType:)
  (Expression.swift:538-564); integer ÷ integer → decimal.
- **Value comparison** with type guards (sparqlCompare,
  Expression.swift:903-957): numeric/temporal/boolean compare by value,
  plain strings by codepoint, incomparable pairs → error (NULL).

Everything compiles to built-in Column expressions (JVM, whole-stage
codegen); there are NO Python UDFs in this module — the hot path stays
vectorized at 100 TB.
"""

from __future__ import annotations

import itertools
import threading
from contextlib import contextmanager
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import Column, functions as F

from kineo_spark.model import (
    DT_IRI,
    IRI_DT,
    KIND_BLANK,
    KIND_IRI,
    KIND_LITERAL,
    NUMERIC_DTS,
    TEMPORAL_DTS,
    PyTerm,
    blank_col,
    iri_col,
    lit_bool_col,
    term_key,
    term_struct,
)

# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


class Expr:
    # ergonomic builders --------------------------------------------------
    def __and__(self, o): return ECall("&&", (self, _e(o)))
    def __or__(self, o): return ECall("||", (self, _e(o)))
    def __invert__(self): return ECall("!", (self,))
    def __add__(self, o): return ECall("+", (self, _e(o)))
    def __sub__(self, o): return ECall("-", (self, _e(o)))
    def __mul__(self, o): return ECall("*", (self, _e(o)))
    def __truediv__(self, o): return ECall("/", (self, _e(o)))
    def __neg__(self): return ECall("NEG", (self,))
    def __eq__(self, o): return ECall("=", (self, _e(o)))  # type: ignore[override]
    def __ne__(self, o): return ECall("!=", (self, _e(o)))  # type: ignore[override]
    def __lt__(self, o): return ECall("<", (self, _e(o)))
    def __le__(self, o): return ECall("<=", (self, _e(o)))
    def __gt__(self, o): return ECall(">", (self, _e(o)))
    def __ge__(self, o): return ECall(">=", (self, _e(o)))
    def __hash__(self):
        return object.__hash__(self)


def _e(x) -> "Expr":
    if isinstance(x, Expr):
        return x
    if isinstance(x, PyTerm):
        return EConst(x)
    from kineo_spark.model import lit as mklit
    return EConst(mklit(x))


@dataclass(frozen=True, eq=False)
class EVar(Expr):
    name: str


@dataclass(frozen=True, eq=False)
class EConst(Expr):
    term: PyTerm


@dataclass(frozen=True, eq=False)
class ECall(Expr):
    op: str
    args: tuple = ()
    kwargs: tuple = ()  # ((key, value), ...) for e.g. CAST target


def expr_vars(e: "Expr", into: set, exists_algebras: list) -> None:
    """Collect the variable names an expression reads (into ``into``);
    EXISTS sub-patterns are appended to ``exists_algebras`` for the
    caller to walk (their vars are needed only per their own usage)."""
    if isinstance(e, EVar):
        into.add(e.name)
    elif isinstance(e, ECall):
        for x in e.args:
            expr_vars(x, into, exists_algebras)
    elif isinstance(e, EExists):
        exists_algebras.append(e.algebra)


@dataclass(frozen=True, eq=False)
class EExists(Expr):
    """EXISTS { pattern } — decorrelated by the compiler into a semi-join
    (reference ExistsPlan, MaterializedQueryPlan.swift:1617-1660;
    decorrelation QueryPlanner.swift:1047-1063). At the top level of a
    FILTER this becomes a plain semi/anti join; nested anywhere else in
    an expression (BIND, IF, &&/|| — EXISTS is a BuiltInCall, SPARQL 1.1
    §17.4.1.4) the compiler mark-joins it into a boolean column first
    (Compiler._mark_exists) and the expression reads an EMarker."""

    algebra: object
    anti: bool = False


@dataclass(frozen=True, eq=False)
class EMarker(Expr):
    """Reference to a compiler-computed boolean marker column (the mark
    join's output for a nested EXISTS). Compiles to an xsd:boolean term
    read straight off the column — never user-constructed."""

    col: str


def v(name: str) -> EVar:
    return EVar(name)


def c(term) -> EConst:
    return _e(term)  # type: ignore[return-value]


def fn(op: str, *args, **kwargs) -> ECall:
    return ECall(op, tuple(_e(a) for a in args), tuple(sorted(kwargs.items())))


# ---------------------------------------------------------------------------
# Term-column helpers
# ---------------------------------------------------------------------------

def _NULL_B() -> Column:
    return F.lit(None).cast("boolean")


def is_numeric_term(t: Column) -> Column:
    return (t["kind"] == KIND_LITERAL) & t["dt"].isin(*NUMERIC_DTS) & t["num"].isNotNull()


def is_temporal_term(t: Column) -> Column:
    return (t["kind"] == KIND_LITERAL) & t["dt"].isin(*TEMPORAL_DTS)


def is_string_lit(t: Column) -> Column:
    """simple / xsd:string / language-tagged literal (argument-compat
    domain of the string builtins, Expression.swift:303-316)."""
    return (t["kind"] == KIND_LITERAL) & t["dt"].isin("string", "langString")


# --- xsd:duration value space (reference Term.duration, RDF/RDF.swift:
# 408-480: lexical -?PnYnMnDTnHnMnS.sS -> (months, seconds)) ----------------

DURATION_DTS = ("duration", "yearMonthDuration", "dayTimeDuration")

# Anchored lexical form. Ordered fields, each optional; a "T" must be
# followed by at least one time field; at least one field overall.
_DUR_LEX = (
    r"^-?P(?=\d|T\d)(?:(\d+)Y)?(?:(\d+)M)?(?:(\d+)D)?"
    r"(?:T(?=\d)(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?$"
)


def is_duration_term(t: Column) -> Column:
    return (t["kind"] == KIND_LITERAL) & t["dt"].isin(*DURATION_DTS)


def _dur_field(lex: Column, group: int) -> Column:
    v = F.regexp_extract(lex, _DUR_LEX, group)
    return F.when(v == "", F.lit(0.0)).otherwise(v.cast("double"))


def _dur_sign(lex: Column) -> Column:
    return F.when(lex.startswith("-"), F.lit(-1.0)).otherwise(F.lit(1.0))


def duration_months(t: Column) -> Column:
    """Months component of a duration term's value; NULL when the lexical
    form is invalid (→ type error in any comparison, row drops)."""
    lex = t["lex"]
    m = 12.0 * _dur_field(lex, 1) + _dur_field(lex, 2)
    return F.when(is_duration_term(t) & lex.rlike(_DUR_LEX), _dur_sign(lex) * m)


def duration_seconds(t: Column) -> Column:
    """Seconds component (days folded in at 86400 s, as the reference
    does) of a duration term's value; NULL on invalid lexical form."""
    lex = t["lex"]
    s = (
        86400.0 * _dur_field(lex, 3) + 3600.0 * _dur_field(lex, 4)
        + 60.0 * _dur_field(lex, 5) + _dur_field(lex, 6)
    )
    return F.when(is_duration_term(t) & lex.rlike(_DUR_LEX), _dur_sign(lex) * s)


# Ops whose RESULT can never be a duration literal: their comparisons
# skip the duration branch entirely. This is a compile-time pruning, not
# a semantic choice — eq_terms/cmp_lt grow the Catalyst expression tree
# by every branch they carry, and IN-chains/EBV wrappers multiply that
# growth, so comparisons keep the duration arm only when an operand
# could statically BE a duration (variable, duration constant, TIMEZONE,
# extension function, or a conditional over one).
_NEVER_DURATION_OPS = frozenset({
    "&&", "||", "!", "IN", "NOT_IN", "BOUND",
    "=", "!=", "<", "<=", ">", ">=",
    "+", "-", "*", "/", "NEG",
    "STR", "LANG", "DATATYPE", "LANGMATCHES",
    "IRI", "URI", "BNODE", "UUID", "STRUUID", "STRLANG",
    "RAND", "ABS", "CEIL", "FLOOR", "ROUND",
    "CONCAT", "STRLEN", "UCASE", "LCASE", "ENCODE_FOR_URI",
    "CONTAINS", "STRSTARTS", "STRENDS", "STRBEFORE", "STRAFTER",
    "SUBSTR", "REPLACE", "REGEX",
    "ISIRI", "ISURI", "ISBLANK", "ISLITERAL", "ISNUMERIC", "SAMETERM",
    "CAST", "YEAR", "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS",
    "TZ", "NOW", "MD5", "SHA1", "SHA256", "SHA384", "SHA512",
    "TRIPLE", "ISTRIPLE",  # RDF-star (components CAN be durations —
    # SUBJECT/PREDICATE/OBJECT stay duration-possible, so not listed)
})


def maybe_duration(e) -> bool:
    """Could this expression evaluate to an xsd:duration-family literal?
    Conservative (True when unsure)."""
    if isinstance(e, EVar):
        return True
    if isinstance(e, EConst):
        return getattr(e.term, "dt", None) in DURATION_DTS
    if isinstance(e, ECall):
        if e.op == "IF":
            return any(maybe_duration(x) for x in e.args[1:])
        if e.op == "COALESCE":
            return any(maybe_duration(x) for x in e.args)
        return e.op not in _NEVER_DURATION_OPS
    return True


def duration_eq(a: Column, b: Column) -> Column:
    """Duration value equality: equal (months, seconds) pairs
    (reference value space, RDF/RDF.swift:408-480)."""
    return (duration_months(a) == duration_months(b)) & (
        duration_seconds(a) == duration_seconds(b)
    )


def duration_lt(a: Column, b: Column) -> Column:
    """Partial duration order (XPath op:yearMonthDuration-less-than /
    op:dayTimeDuration-less-than): decided when one dimension agrees or
    both dimensions agree in direction; indeterminate pairs (e.g.
    P1M vs P30D) are NULL — a type error, the row drops."""
    ma, mb = duration_months(a), duration_months(b)
    sa, sb = duration_seconds(a), duration_seconds(b)
    return (
        F.when(ma == mb, sa < sb)
        .when(sa == sb, ma < mb)
        .when((ma < mb) & (sa < sb), F.lit(True))
        .when((ma > mb) & (sa > sb), F.lit(False))
        .otherwise(_NULL_B())
    )


def _is_simple_string(t: Column) -> Column:
    """simple / xsd:string literal WITHOUT a language tag — the required
    first-argument domain of STRDT/STRLANG (§17.4.2.7-8): a lang-tagged
    literal is a type error, not a coercible string."""
    return (t["kind"] == KIND_LITERAL) & (t["dt"] == "string") & t["lang"].isNull()


def str_args_compatible(a: Column, b: Column) -> Column:
    """SPARQL 17.4.3.1.2 argument compatibility for the two-argument
    string builtins (CONTAINS/STRSTARTS/STRENDS/STRBEFORE/STRAFTER):
    both simple or xsd:string; or arg1 language-tagged and arg2
    simple/xsd:string; or both tagged with the SAME tag. Anything else
    (notably different language tags, or a tagged arg2 against a plain
    arg1) is a type ERROR, not false."""
    return (
        is_string_lit(a) & is_string_lit(b)
        & (b["lang"].isNull() | (a["lang"] == b["lang"]))
    )


def ebv(t: Column) -> Column:
    """Effective boolean value; NULL = type error (Expression.swift:14-26)."""
    return (
        F.when(t.isNull(), _NULL_B())
        .when(t["dt"] == "boolean", t["num"] != 0)
        .when(
            (t["kind"] == KIND_LITERAL) & t["dt"].isin(*NUMERIC_DTS),
            F.coalesce((t["num"] != 0) & ~F.isnan(t["num"]), F.lit(False)),
        )
        .when(t["dt"].isin("string", "langString"), F.length(t["lex"]) > 0)
        .otherwise(_NULL_B())
    )


def bool_term(b: Column) -> Column:
    """Wrap a (nullable) boolean Column as an xsd:boolean term; NULL stays
    NULL (error)."""
    return lit_bool_col(b)


def _regex_pattern(pat: Column, flags: Column | None) -> Column:
    """XPath fn:matches flags (§17.4.3.14: s m i x q) → a Java-regex
    pattern. s/m/i/x have inline Java forms; `q` (literal match) does
    not — it is lowered by backslash-escaping every metacharacter. An
    unrecognized flag is a type error (NULL pattern, so the row drops)
    rather than an executor PatternSyntaxException."""
    if flags is None:
        return pat
    quoted = F.regexp_replace(pat, r"([.\[\]{}()*+?\\^$|])", r"\\$1")
    body = F.when(flags.contains("q"), quoted).otherwise(pat)
    inline = F.regexp_replace(flags, "q", "")
    out = F.when(
        F.length(inline) > 0,
        F.concat(F.lit("(?"), inline, F.lit(")"), body),
    ).otherwise(body)
    return F.when(flags.rlike("^[smixq]*$"), out)


def eq_terms(a: Column, b: Column, dur: bool = True) -> Column:
    """SPARQL '=' value equality (§17.4.1.7 RDFterm-equal +
    the §17.3 operator table; reference sparqlCompare,
    Expression.swift:903-957): numeric/temporal/boolean pairs compare
    by value with type promotion, string-ish pairs of the same language
    by lexical form, IRIs/blanks by identity. Two LITERALS outside any
    value table that are not the same term are a type ERROR (NULL), not
    false — e.g. "abc" = 1, "a"@en = "a", or unknown datatypes."""
    both_num = is_numeric_term(a) & is_numeric_term(b)
    both_tmp = is_temporal_term(a) & is_temporal_term(b)
    both_bool = (a["dt"] == "boolean") & (b["dt"] == "boolean")
    both_plain = (
        is_string_lit(a) & is_string_lit(b)
        & (
            (a["lang"].isNull() & b["lang"].isNull())
            | (a["lang"] == b["lang"])
        )
    )
    both_lit = (a["kind"] == KIND_LITERAL) & (b["kind"] == KIND_LITERAL)
    same = term_key(a) == term_key(b)
    out = F.when(a.isNull() | b.isNull(), _NULL_B()).when(
        both_num | both_tmp | both_bool, a["num"] == b["num"]
    )
    if dur:  # compile-time pruning, see maybe_duration
        both_dur = is_duration_term(a) & is_duration_term(b)
        out = out.when(both_dur, duration_eq(a, b))
    return (
        out
        .when(both_plain, a["lex"] == b["lex"])
        .when(both_lit, F.when(same, F.lit(True)).otherwise(_NULL_B()))
        .otherwise(same)
    )


def cmp_lt(a: Column, b: Column, dur: bool = True) -> Column:
    """a < b under SPARQL ordering comparison; NULL on incomparable
    operands (type error). IRIs/blanks are not <-comparable in filters."""
    both_num = is_numeric_term(a) & is_numeric_term(b)
    both_tmp = is_temporal_term(a) & is_temporal_term(b)
    both_bool = (a["dt"] == "boolean") & (b["dt"] == "boolean")
    both_str = is_string_lit(a) & is_string_lit(b)
    out = F.when(a.isNull() | b.isNull(), _NULL_B()).when(
        both_num | both_tmp | both_bool, a["num"] < b["num"]
    )
    if dur:  # compile-time pruning, see maybe_duration
        both_dur = is_duration_term(a) & is_duration_term(b)
        out = out.when(both_dur, duration_lt(a, b))
    return out.when(both_str, a["lex"] < b["lex"]).otherwise(_NULL_B())


def _num_guard(t: Column) -> Column:
    return F.when(is_numeric_term(t), t["num"])


def _promote2(a: Column, b: Column) -> Column:
    """Numeric result datatype token per promotion rules
    (Expression.swift:538-564)."""
    return (
        F.when((a["dt"] == "double") | (b["dt"] == "double"), F.lit("double"))
        .when((a["dt"] == "float") | (b["dt"] == "float"), F.lit("float"))
        .when((a["dt"] == "decimal") | (b["dt"] == "decimal"), F.lit("decimal"))
        .otherwise(F.lit("integer"))
    )


def num_term(value: Column, dt: Column) -> Column:
    """Build a numeric literal term from a double value + dt-token column."""
    lex = F.when(
        dt.isin("integer", "int", "long"), value.cast("long").cast("string")
    ).otherwise(value.cast("string"))
    t = term_struct(F.lit(KIND_LITERAL).cast("tinyint"), lex, dt, F.lit(None).cast("string"), value)
    return F.when(value.isNotNull() & ~F.isnan(value), t)


def str_term(lex: Column, like: Optional[Column] = None) -> Column:
    """String literal; if ``like`` given, preserve its lang/dt (UCASE etc.
    keep the language tag, Expression.swift:318-430)."""
    if like is not None:
        dt = F.when(like["dt"].isin("string", "langString"), like["dt"]).otherwise(F.lit("string"))
        lang = F.when(like["dt"] == "langString", like["lang"])
    else:
        dt = F.lit("string")
        lang = F.lit(None).cast("string")
    t = term_struct(F.lit(KIND_LITERAL).cast("tinyint"), lex, dt, lang, F.lit(None).cast("double"))
    return F.when(lex.isNotNull(), t)


# ---------------------------------------------------------------------------
# Compiler
# ---------------------------------------------------------------------------


class ExprError(ValueError):
    pass


_FOLD_ERR = object()  # a constant subtree that is a guaranteed type error
_NUM_RANK = {"integer": 0, "int": 0, "long": 0, "decimal": 1,
             "float": 2, "double": 3}
_RANK_DT = {0: "integer", 1: "decimal", 2: "float", 3: "double"}


def _fold_arith(e: Expr):
    """Compile-time folding of constant numeric arithmetic (+ - * / NEG)
    to a PyTerm, _FOLD_ERR (e.g. integer ÷ 0), or None (not foldable).

    The runtime path computes on doubles, so Python float arithmetic is
    bit-identical; folding is RESTRICTED to results whose lexical form
    provably matches the runtime's rendering: exact integers for the
    integer family, and integral values < 1e7 for decimal/float/double
    (both Python repr and Java Double.toString render those as "N.0").
    Everything else stays un-folded. Besides matching Catalyst's own
    ConstantFolding (which can't see through the term-struct CASEs),
    this collapses constant subtrees BEFORE the term helpers multiply
    them (see _HIGH_DUP_OPS)."""
    if not isinstance(e, ECall) or e.op not in ("+", "-", "*", "/", "NEG"):
        return None
    vals: list = []
    for x in e.args:
        f = _fold_arith(x) if isinstance(x, ECall) else None
        if f is _FOLD_ERR:
            return _FOLD_ERR
        if f is not None:
            x = EConst(f)
        if not isinstance(x, EConst):
            return None
        t = x.term
        if t.dt not in _NUM_RANK or t.num is None:
            return None
        vals.append((float(t.num), _NUM_RANK[t.dt]))
    rank = max(r for _, r in vals)
    if e.op == "NEG":
        v = -vals[0][0]
    elif e.op == "+":
        v = vals[0][0] + vals[1][0]
    elif e.op == "-":
        v = vals[0][0] - vals[1][0]
    elif e.op == "*":
        v = vals[0][0] * vals[1][0]
    else:  # "/"
        if rank == 0:
            rank = 1  # integer ÷ integer → decimal
        if vals[1][0] == 0.0:
            # fp ÷0 → ±Inf/NaN whose lexical forms differ between
            # Python and the engine — leave to the runtime
            return _FOLD_ERR if rank == 1 else None
        v = vals[0][0] / vals[1][0]
    if v != v or v in (float("inf"), float("-inf")):
        return None
    if rank == 0:
        if v != int(v) or abs(v) > 2 ** 53:
            return None
        return PyTerm(KIND_LITERAL, str(int(v)), "integer")
    if v == int(v) and abs(v) < 1e7:
        return PyTerm(KIND_LITERAL, f"{v:.1f}", _RANK_DT[rank])
    return None


def compile_expr(e: Expr, env: dict[str, Column]) -> Column:
    """Compile to a Column producing a term struct (NULL = error/unbound)."""
    if isinstance(e, EVar):
        col = env.get(e.name)
        if col is None:
            return F.lit(None).cast("struct<kind:tinyint,lex:string,dt:string,lang:string,num:double>")
        return col
    if isinstance(e, EConst):
        return e.term.as_column()
    if isinstance(e, EMarker):
        return bool_term(F.col(e.col))
    if isinstance(e, EExists):
        raise ExprError(
            "EXISTS must be decorrelated before expression compilation "
            "(Compiler._mark_exists) — reached compile_expr directly")
    assert isinstance(e, ECall)
    folded = _fold_arith(e)
    if folded is _FOLD_ERR:
        return F.lit(None).cast(
            "struct<kind:tinyint,lex:string,dt:string,lang:string,num:double>")
    if folded is not None:
        return folded.as_column()
    return _compile_call(e, env)


def _call_depth(e: Expr) -> int:
    if isinstance(e, ECall):
        return 1 + max((_call_depth(x) for x in e.args), default=0)
    return 0


def _let_deep(args: list[Column], deep: list[int], body) -> Column:
    """Bind the columns at positions ``deep`` each exactly ONCE via a
    higher-order-function lambda (``element_at(transform(array(x), v ->
    …), 1)``) before handing the arg list to ``body``.

    Why: every term-level helper (eq_terms, num_term, ebv, …) references
    its operand Column several times; Catalyst's analyzer expands the
    shared Python DAG into a tree, so nested calls multiply — a 4-clause
    constant conjunction OOMed a 24 GiB driver at ANALYSIS time. Lambda
    variables are never inlined, so binding deep sub-expressions keeps
    the analyzed tree linear in expression size. Shallow args (depth
    ≤ 1 call) stay inline and keep whole-stage codegen on hot paths."""
    if not deep:
        return body(args)
    i, rest = deep[0], deep[1:]
    return F.element_at(
        F.transform(
            F.array(args[i]),
            lambda v: _let_deep(args[:i] + [v] + args[i + 1:], rest, body),
        ),
        1,
    )


# Ops whose compile helpers reference each operand tree MANY times
# (numeric guard + promotion + num_term/value checks: ~100-200 copies per
# layer, measured r4 — a constant (i*3)/3 division expanded to a 1.7 MB
# analyzed tree). Their non-leaf args are let-bound at depth 1 already;
# other ops keep the depth-2 threshold so shallow hot paths stay inside
# whole-stage codegen.
_HIGH_DUP_OPS = frozenset({"+", "-", "*", "/", "NEG", "ABS", "ROUND",
                           "CEIL", "FLOOR"})


# --- hoist scope ---------------------------------------------------------
# Catalyst analyzes expression trees nested inside higher-order-function
# lambdas (F.aggregate / F.transform) far more slowly than the same trees
# sitting in a plain Project: lambda-variable resolution re-walks the
# collection argument on every analyzer fixpoint iteration. A computed
# IN/NOT IN branch (itself a _let_deep nested-HOF tree) cost ~10-22 s of
# one-time ANALYSIS per branch when inlined into the fold's array literal
# (measured r6/r7). The fix is to bind such trees ONCE as projected
# columns — the enclosing plan compiler (Filter/Extend in compiler.py)
# opens a scope, the IN compiler registers `array(branch1..branchN)` under
# a fresh name, and the fold references a bare attribute instead. The
# scope owner materializes the registered columns with one select() before
# applying the condition and drops them after.
_HOIST_TLS = threading.local()
_HOIST_SEQ = itertools.count()


def _hoist_scopes() -> list:
    """Per-thread scope stack: concurrent query compilation from
    multiple driver threads must not interleave registrations across
    each other's scopes (that yields unresolved __hoist_* refs)."""
    scopes = getattr(_HOIST_TLS, "scopes", None)
    if scopes is None:
        scopes = _HOIST_TLS.scopes = []
    return scopes


@contextmanager
def hoist_scope():
    """Collect (name, Column, level) triples that expression compilation
    wants projected before the consuming Filter/Extend. Yields the list;
    the caller must materialize level-by-level (``apply_hoisted``) iff it
    is non-empty. Level k columns may reference level <k names, so each
    level is one select() — Spark analyzes Datasets eagerly per
    transformation, which makes one-select-per-COLUMN O(k²) in total tree
    size; one-select-per-LEVEL is O(depth × tree) with depth ≈ the
    expression nesting depth (single digits)."""
    slot: list[tuple[str, Column, int]] = []
    scopes = _hoist_scopes()
    scopes.append(slot)
    try:
        yield slot
    finally:
        scopes.pop()


def apply_hoisted(df, hoisted):
    """Materialize hoist-scope columns onto ``df`` level by level.

    Returns (df, names_to_drop). The top level carries a nondeterministic
    barrier column: PushPredicateThroughNonJoin substitutes project
    aliases into a pushed condition with NO duplication-cost guard, which
    would re-inline the hoisted subtrees (×100-200 refs per level) and
    reconstruct the exponential tree the hoist exists to avoid — but the
    rule requires every project field to be deterministic, so one rand()
    field pins the consuming Filter above the hoist Projects. Adjacent
    hoist Projects are safe from CollapseProject by its own cost check
    (SPARK-36718: never duplicates non-cheap multi-referenced exprs)."""
    if not hoisted:
        return df, []
    names = [n for n, _, _ in hoisted]
    levels = sorted({l for _, _, l in hoisted})
    for lvl in levels[:-1]:
        df = df.select(
            "*", *[c.alias(n) for n, c, l in hoisted if l == lvl])
    nd = f"__hoist_nd_{next(_HOIST_SEQ)}"
    df = df.select(
        "*", *[c.alias(n) for n, c, l in hoisted if l == levels[-1]],
        F.rand().alias(nd))
    return df, names + [nd]


def _nd_identity(col: Column) -> Column:
    """Value-preserving wrap that marks the expression nondeterministic:
    shuffle() of a 1-element array is the identity on values but carries
    the nondeterministic flag, which stops CollapseProject from
    re-inlining the hoisted tree into its (single) consumer and stops
    predicate pushdown from substituting it into a Filter condition —
    both of which would undo the once-only binding and hand the
    optimizer back a tree it processes quadratically."""
    return F.element_at(F.shuffle(F.array(col)), 1)


def _hoist(col: Column, tag: str, level: int = 0, nd: bool = False) -> Column:
    """Register ``col`` in the innermost hoist scope and return a bare
    reference to it. No active scope → return the column inline (always
    correct, just slower to analyze). ``nd=True`` additionally pins the
    column against optimizer re-inlining (see _nd_identity)."""
    scopes = _hoist_scopes()
    if not scopes:
        return col
    name = f"__hoist_{tag}_{next(_HOIST_SEQ)}"
    scopes[-1].append((name, _nd_identity(col) if nd else col, level))
    return F.col(name)


def _compile_call(e: ECall, env: dict[str, Column]) -> Column:
    # compile args; when a hoist scope is active, also compute each arg's
    # hoist LEVEL: 1 + the max level registered while compiling that arg
    # (0 if its subtree registered nothing), so a column containing the
    # arg lands in a select() strictly after everything it references
    a, lv = [], []
    scopes = _hoist_scopes()
    for x in e.args:
        start = len(scopes[-1]) if scopes else 0
        a.append(compile_expr(x, env))
        if scopes:
            sub = scopes[-1][start:]
            lv.append(1 + max((l for _, _, l in sub), default=-1))
        else:
            lv.append(0)
    if e.op in ("IN", "NOT_IN"):
        if len(a) > 1 and scopes and any(
                _call_depth(x) >= 1 for x in e.args[1:]):
            # computed branch terms: project them ONCE as an array column
            # (and a deep lhs as its own column) so Catalyst analyzes each
            # branch tree in a plain Project instead of inside the fold's
            # lambda literal — ~10-22 s/branch inlined vs <1 s hoisted
            md = maybe_duration(e.args[0]) and any(
                maybe_duration(xe) for xe in e.args[1:])
            # each branch becomes its OWN projected column (kept apart so
            # per-expression optimizer work — canonicalization is
            # quadratic per tree — stays per-branch, not over one giant
            # array literal), the array over their refs one level up
            refs = [_hoist(x, "inb", l, nd=True) for x, l in zip(a[1:], lv[1:])]
            arr = _hoist(F.array(*refs), "inarr", max(lv[1:]) + 1)
            lhs = (_hoist(a[0], "inlhs", lv[0])
                   if _call_depth(e.args[0]) >= 1 else a[0])
            # hoist the fold RESULT as well: the consuming ebv/bool_term
            # wrappers reference their operand ~5-10×, and canonicalizing
            # the resulting And-chains is quadratic in Catalyst
            # (gatherCommutative re-walks subtrees) — a bare attribute
            # ref keeps the Filter condition tiny
            return _hoist(_in_fold(lhs, arr, md, e.op), "inres",
                          max(max(lv[1:]) + 1, lv[0]) + 1)
        # branch sharing comes from the fold-over-array in the dispatch
        # (each branch tree appears once in the array literal); nesting
        # one _let_deep lambda per branch instead made ANALYSIS time
        # explode on wide lists (37 nested HOFs)
        deep = [0] if _call_depth(e.args[0]) >= 2 else []
    else:
        min_depth = 1 if e.op in _HIGH_DUP_OPS else 2
        deep = [i for i, x in enumerate(e.args) if _call_depth(x) >= min_depth]
    if deep:
        return _let_deep(a, deep, lambda bound: _dispatch_call(e, bound, env))
    return _dispatch_call(e, a, env)


def _in_fold(lhs: Column, arr: Column, md: bool, op: str) -> Column:
    """§17.4.1.9 IN as a fold over the branch-term array: code 2 = some
    branch equal, 1 = no match but some branch errored, 0 = all false
    ("true beats error beats false"); NOT IN is the 3-valued negation.
    ``arr`` may be an inline array literal or a hoisted column ref."""
    def _step(acc, x):
        s = eq_terms(lhs, x, dur=md)
        return F.greatest(
            acc, F.when(s, 2).when(s.isNull(), 1).otherwise(0)
        )

    code = F.aggregate(arr, F.lit(0), _step)
    cond = (
        F.when(code == 2, F.lit(True))
        .when(code == 1, _NULL_B())
        .otherwise(F.lit(False))
    )
    inner = F.when(lhs.isNull(), _NULL_B()).otherwise(cond)
    return bool_term(~inner if op == "NOT_IN" else inner)


def _dispatch_call(e: ECall, a: list[Column], env: dict[str, Column]) -> Column:  # noqa: C901
    op = e.op
    kw = dict(e.kwargs)

    # --- logical (Kleene 3-valued == SPARQL error semantics here) ---
    if op == "&&":
        return bool_term(ebv(a[0]) & ebv(a[1]))
    if op == "||":
        return bool_term(ebv(a[0]) | ebv(a[1]))
    if op == "!":
        return bool_term(~ebv(a[0]))
    if op == "IF":
        cond = ebv(a[0])
        return F.when(cond, a[1]).when(~cond, a[2])
    if op == "COALESCE":
        return F.coalesce(*a)
    if op in ("IN", "NOT_IN"):
        # §17.4.1.9: IN is an ||-chain of `=` — a branch error only
        # surfaces when no other branch matches (true||err = true,
        # false||err = err); NOT IN is its 3-valued negation.
        #
        # Tree-size discipline: the branch terms go into ONE array (each
        # tree appears once) and the `=` comparison runs INSIDE the fold
        # lambda against the lambda variable — the eq logic exists once
        # in the plan, not once per branch, and no nested let-binding is
        # needed. The earlier or-chain referenced every eq tree twice
        # and compounded: a ~40-branch NOT IN of computed operands
        # exhausted the JVM heap at ANALYSIS time (pinned by
        # tests/test_sparql_parser.py wide-NOT-IN guard).
        if len(a) == 1:
            inner = F.when(a[0].isNull(), _NULL_B()).otherwise(F.lit(False))
            return bool_term(~inner if op == "NOT_IN" else inner)
        md = maybe_duration(e.args[0]) and any(
            maybe_duration(xe) for xe in e.args[1:]
        )
        return _in_fold(a[0], F.array(*a[1:]), md, op)
    if op == "BOUND":
        return bool_term(a[0].isNotNull().cast("boolean"))

    # --- comparison ---
    if op in ("=", "!=", "<", ">", "<=", ">="):
        md = maybe_duration(e.args[0]) and maybe_duration(e.args[1])
        if op == "=":
            return bool_term(eq_terms(a[0], a[1], dur=md))
        if op == "!=":
            return bool_term(~eq_terms(a[0], a[1], dur=md))
        if op == "<":
            return bool_term(cmp_lt(a[0], a[1], dur=md))
        if op == ">":
            return bool_term(cmp_lt(a[1], a[0], dur=md))
        if op == "<=":
            return bool_term(~cmp_lt(a[1], a[0], dur=md))
        if op == ">=":
            return bool_term(~cmp_lt(a[0], a[1], dur=md))
    if op == "SAMETERM":
        # key-vs-key compare; _term_identity_key keeps quoted-component
        # accessors and constants as flat key strings (no struct rebuild,
        # no expression-tree multiplication). NULL key = unbound/error on
        # that side → NULL boolean → error, exactly sameTerm's semantics.
        return bool_term(
            _term_identity_key(e.args[0], env) == _term_identity_key(e.args[1], env)
        )

    # --- arithmetic ---
    if op in ("+", "-", "*", "/"):
        x, y = _num_guard(a[0]), _num_guard(a[1])
        dt = _promote2(a[0], a[1])
        if op == "/":
            # integer ÷ integer → decimal (Expression.swift:538-564)
            dt = F.when(dt == "integer", F.lit("decimal")).otherwise(dt)
            # ÷0: error (→NULL) for integer/decimal, IEEE ±Inf/NaN for
            # float/double. Plain `/` throws under Spark's ANSI mode.
            fp = dt.isin("double", "float")
            val = F.when(
                y == 0,
                F.when(fp & (x > 0), F.lit(float("inf")))
                .when(fp & (x < 0), F.lit(float("-inf")))
                .when(fp & (x == 0), F.lit(float("nan"))),
            ).otherwise(x / F.nullif(y, F.lit(0.0)))
        else:
            val = {"+": x + y, "-": x - y, "*": x * y}[op]
        return num_term(val.cast("double"), dt)
    if op == "NEG":
        return num_term(-_num_guard(a[0]), a[0]["dt"])
    if op == "ABS":
        return num_term(F.abs(_num_guard(a[0])), a[0]["dt"])
    if op == "ROUND":
        # xsd round-half-toward-+inf, not banker's (Expression.swift:432-455)
        return num_term(F.floor(_num_guard(a[0]) + 0.5).cast("double"), a[0]["dt"])
    if op == "CEIL":
        return num_term(F.ceil(_num_guard(a[0])).cast("double"), a[0]["dt"])
    if op == "FLOOR":
        return num_term(F.floor(_num_guard(a[0])).cast("double"), a[0]["dt"])
    if op == "RAND":
        return num_term(F.rand(), F.lit("double"))

    # --- strings ---
    if op == "STR":
        return str_term(F.when(a[0]["kind"] != KIND_BLANK, a[0]["lex"]))
    if op == "STRLEN":
        return num_term(
            F.when(is_string_lit(a[0]), F.length(a[0]["lex"]).cast("double")),
            F.lit("integer"),
        )
    if op == "UCASE":
        return str_term(F.when(is_string_lit(a[0]), F.upper(a[0]["lex"])), like=a[0])
    if op == "LCASE":
        return str_term(F.when(is_string_lit(a[0]), F.lower(a[0]["lex"])), like=a[0])
    if op == "CONCAT":
        if not a:  # CONCAT() is the empty simple literal (fn:concat)
            return str_term(F.lit(""))
        lex = F.concat(*[F.when(is_string_lit(x), x["lex"]) for x in a])
        # all-same-language → keep it, else simple literal (:303-316)
        lang = a[0]["lang"]
        same = F.lit(True)
        for x in a[1:]:
            same = same & (x["lang"] == lang)
        lang_out = F.when(same & lang.isNotNull(), lang)
        t = term_struct(
            F.lit(KIND_LITERAL).cast("tinyint"), lex,
            F.when(lang_out.isNotNull(), F.lit("langString")).otherwise(F.lit("string")),
            lang_out, F.lit(None).cast("double"),
        )
        return F.when(lex.isNotNull(), t)
    if op == "CONTAINS":
        return bool_term(F.when(str_args_compatible(a[0], a[1]),
                                a[0]["lex"].contains(a[1]["lex"])))
    if op == "STRSTARTS":
        return bool_term(F.when(str_args_compatible(a[0], a[1]),
                                a[0]["lex"].startswith(a[1]["lex"])))
    if op == "STRENDS":
        return bool_term(F.when(str_args_compatible(a[0], a[1]),
                                a[0]["lex"].endswith(a[1]["lex"])))
    if op == "SUBSTR":
        # XPath fn:substring semantics (17.4.3.3): characters at
        # 1-based positions p with round(start) <= p < round(start) +
        # round(len) — so start <= 0 clips from position 1 and SHORTENS
        # the window (SUBSTR("hello", 0, 3) = "he"). fn:round rounds
        # half toward +inf: floor(x + 0.5).
        start = F.floor(_num_guard(a[1]) + F.lit(0.5)).cast("long")
        lo = F.greatest(start, F.lit(1).cast("long"))
        if len(a) > 2:
            end = start + F.floor(_num_guard(a[2]) + F.lit(0.5)).cast("long")
            cnt = F.greatest(end - lo, F.lit(0).cast("long"))
            lex = F.when(
                start.isNotNull() & cnt.isNotNull(),
                F.substring(a[0]["lex"], lo.cast("int"), cnt.cast("int")),
            )
        else:
            lex = F.when(
                start.isNotNull(),
                F.substring(a[0]["lex"], lo.cast("int"), F.lit(1 << 30)),
            )
        return str_term(F.when(is_string_lit(a[0]), lex), like=a[0])
    if op == "REPLACE":
        pat = _regex_pattern(a[1]["lex"], a[3]["lex"] if len(a) > 3 else None)
        lex = F.regexp_replace(a[0]["lex"], pat, a[2]["lex"])
        return str_term(F.when(is_string_lit(a[0]), lex), like=a[0])
    if op == "REGEX":
        pat = _regex_pattern(a[1]["lex"], a[2]["lex"] if len(a) > 2 else None)
        return bool_term(F.when(is_string_lit(a[0]), F.regexp_like(a[0]["lex"], pat)))
    if op in ("STRBEFORE", "STRAFTER"):
        pos = F.instr(a[0]["lex"], a[1]["lex"])
        if op == "STRBEFORE":
            found = F.substring(a[0]["lex"], 1, pos - 1)
        else:
            found = F.substring(a[0]["lex"], pos + F.length(a[1]["lex"]), F.lit(1 << 30))
        # no-match result is a SIMPLE "" (language dropped), match keeps
        # arg1's language — hence the conditional `like`
        lex = F.when(pos > 0, found)
        matched = str_term(F.when(str_args_compatible(a[0], a[1]), lex), like=a[0])
        empty = str_term(F.when(str_args_compatible(a[0], a[1]), F.lit("")))
        return F.when(pos > 0, matched).otherwise(empty)
    if op == "ENCODE_FOR_URI":
        enc = F.replace(F.url_encode(a[0]["lex"]), F.lit("+"), F.lit("%20"))
        return str_term(F.when(is_string_lit(a[0]), enc))
    if op == "LANG":
        return str_term(
            F.when(a[0]["kind"] == KIND_LITERAL, F.coalesce(a[0]["lang"], F.lit("")))
        )
    if op == "LANGMATCHES":
        lang, rng = F.lower(a[0]["lex"]), F.lower(a[1]["lex"])
        m = F.when(rng == "*", F.length(lang) > 0).otherwise(
            (lang == rng) | lang.startswith(F.concat(rng, F.lit("-")))
        )
        return bool_term(m)
    if op == "DATATYPE":
        tok = F.when(a[0]["kind"] == KIND_LITERAL, F.coalesce(a[0]["dt"], F.lit("string")))
        mapping = F.create_map(*[F.lit(x) for kvs in DT_IRI.items() for x in kvs])
        return iri_col(F.coalesce(mapping[tok], tok))

    # --- constructors ---
    if op == "IRI" or op == "URI":
        base = kw.get("base", "")
        rel = a[0]["lex"]
        if base:
            # §17.4.2.8 resolution against the (constant) query base,
            # restructured r8 as RFC 3986 §5.2.3 merge + §5.2.4
            # remove_dot_segments: the base root and directory are
            # driver-side constants, the per-row work is one merge
            # concat and a bounded collapse loop of regexp_replaces on
            # the PATH part only (query/fragment split off first). This
            # replaced the r7 per-depth "../" when-cascade — smaller
            # expression tree AND full mid-path dot-segment coverage
            # (rel='a/../b', 'a/..', 'x/./y').
            from urllib.parse import urlsplit
            sp = urlsplit(base)
            root = f"{sp.scheme}://{sp.netloc}"
            bdir_path = (sp.path[: sp.path.rfind("/") + 1]
                         if "/" in sp.path else "/")
            # §5.3: '#f' replaces the base FRAGMENT (query kept), '?q'
            # replaces query+fragment — never appended to the full base
            base_nofrag = base.split("#", 1)[0]
            base_noquery = base_nofrag.split("?", 1)[0]
            rhead = F.regexp_replace(rel, r"[?#].*$", "")
            rtail = F.regexp_extract(rel, r"([?#].*)$", 1)
            # lone '.'/'..' behave as './' / '../' (§5.2.4 output never
            # keeps a dot segment)
            rhead = F.when(rhead.rlike(r"(^|/)\.\.?$"),
                           F.concat(rhead, F.lit("/"))).otherwise(rhead)
            # §5.2.3 merge: absolute-path refs replace the base path,
            # relative ones append to the base directory
            merged = F.when(rhead.startswith("/"), rhead) \
                .otherwise(F.concat(F.lit(bdir_path), rhead))
            # §5.2.4: each pass removes all '/./', one nesting level of
            # 'seg/../', and one leading '/..' (floor at the root); 12
            # passes cover any sane IRI, deeper residuals stay (bounded
            # by construction, never wrong direction)
            for _ in range(12):
                merged = F.regexp_replace(merged, r"/\.(?=/|$)", "")
                merged = F.regexp_replace(
                    merged, r"(^|/)(?!\.\./)[^/]+/\.\.(/|$)", "$1")
                merged = F.regexp_replace(merged, r"^/\.\.(?=/|$)", "")
            resolved = (
                F.when(rel == "", F.lit(base_nofrag))
                .when(rel.startswith("//"),
                      F.concat(F.lit(sp.scheme + ":"), rel))
                .when(rel.startswith("#"), F.concat(F.lit(base_nofrag), rel))
                .when(rel.startswith("?"), F.concat(F.lit(base_noquery), rel))
                .otherwise(F.concat(F.lit(root), merged, rtail))
            )
        else:
            resolved = rel
        lex = F.when(a[0]["kind"] == KIND_IRI, a[0]["lex"]).when(
            is_string_lit(a[0]),
            F.when(rel.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), rel)
            .otherwise(resolved),
        )
        return iri_col(lex)
    if op == "BNODE":
        # fresh label per evaluation; BNODE(label) per-row coherence caveat
        # documented (reference NextRowPlan, MaterializedQueryPlan.swift:517-537)
        seed = a[0]["lex"] if a else F.lit("")
        return blank_col(F.md5(F.concat(seed, F.expr("uuid()"))))
    if op == "STRDT":
        iri_str = a[1]["lex"]
        tok = F.coalesce(
            F.create_map(*[F.lit(x) for kvs in IRI_DT.items() for x in kvs])[iri_str],
            iri_str,
        )
        t = term_struct(
            F.lit(KIND_LITERAL).cast("tinyint"), a[0]["lex"], tok,
            F.lit(None).cast("string"),
            F.when(tok.isin(*NUMERIC_DTS), a[0]["lex"].cast("double")),
        )
        return F.when(_is_simple_string(a[0]) & (a[1]["kind"] == KIND_IRI), t)
    if op == "STRLANG":
        t = term_struct(
            F.lit(KIND_LITERAL).cast("tinyint"), a[0]["lex"], F.lit("langString"),
            a[1]["lex"], F.lit(None).cast("double"),
        )
        return F.when(_is_simple_string(a[0]) & _is_simple_string(a[1]), t)
    if op == "UUID":
        return iri_col(F.concat(F.lit("urn:uuid:"), F.expr("uuid()")))
    if op == "STRUUID":
        return str_term(F.expr("uuid()"))

    # --- term tests ---
    if op == "ISIRI" or op == "ISURI":
        return bool_term(F.when(a[0].isNotNull(), a[0]["kind"] == KIND_IRI))
    if op == "ISBLANK":
        return bool_term(F.when(a[0].isNotNull(), a[0]["kind"] == KIND_BLANK))
    if op == "ISLITERAL":
        return bool_term(F.when(a[0].isNotNull(), a[0]["kind"] == KIND_LITERAL))
    if op == "ISNUMERIC":
        return bool_term(F.when(a[0].isNotNull(), is_numeric_term(a[0])))

    # --- RDF-star (SPARQL-star builtins; KIND_QUOTED extension) ---
    if op == "ISTRIPLE":
        from kineo_spark.model import KIND_QUOTED
        return bool_term(F.when(a[0].isNotNull(), a[0]["kind"] == KIND_QUOTED))
    if op == "TRIPLE":
        from kineo_spark.model import quoted_col
        return quoted_col(a[0], a[1], a[2])
    if op in ("SUBJECT", "PREDICATE", "OBJECT"):
        # key-space chain composition, ONE struct rebuild at the end —
        # nested accessors otherwise multiply past the 64KB codegen cliff
        from kineo_spark.model import term_of_key_col
        return term_of_key_col(_component_key_col(e, env))
    if op == "TRIPLECOMP":
        # internal (rewrite.fold_star_accessors): component of a
        # TRIPLE(...) call folded past the packed encoding — the selected
        # component itself, unbound unless all three are bound (TRIPLE
        # would have errored)
        sel = a[kw["comp"]]
        return F.when(
            a[0].isNotNull() & a[1].isNotNull() & a[2].isNotNull(), sel)
    if op == "ALLBOUNDTRUE":
        # internal (rewrite.fold_star_accessors): isTRIPLE over a folded
        # TRIPLE(...) — true when every component is bound, error (NULL)
        # otherwise
        cond = a[0].isNotNull()
        for c in a[1:]:
            cond = cond & c.isNotNull()
        return bool_term(F.when(cond, F.lit(True)))

    # --- casts (Expression.swift:602-748): lexical validation, error→NULL ---
    if op == "CAST":
        return _compile_cast(kw["to"], a[0])

    # --- date/time (UTC calendar, Expression.swift:65-75,115-176) ---
    if op == "NOW":
        from kineo_spark.model import lit_datetime_col
        return lit_datetime_col(F.current_timestamp())
    if op in ("YEAR", "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS"):
        ts = F.timestamp_micros(F.when(is_temporal_term(a[0]), a[0]["num"]).cast("long"))
        part = {
            "YEAR": F.year, "MONTH": F.month, "DAY": F.dayofmonth,
            "HOURS": F.hour, "MINUTES": F.minute,
        }.get(op)
        if op == "SECONDS":
            val = (F.second(ts) + (F.unix_micros(ts) % 60_000_000 % 1_000_000) / 1e6).cast("double")
            return num_term(val, F.lit("decimal"))
        return num_term(part(ts).cast("double"), F.lit("integer"))
    if op == "TZ":
        tz = F.when(a[0]["lex"].endswith("Z"), F.lit("Z")).otherwise(
            F.regexp_extract(a[0]["lex"], r"([+-]\d{2}:\d{2})$", 1)
        )
        return str_term(F.when(is_temporal_term(a[0]), tz))
    if op == "TIMEZONE":
        # §17.4.5.7 / reference Expression.swift:140-160: the timezone of
        # the dateTime as an xsd:dayTimeDuration literal — "PT0S" for Z or
        # +00:00, "-?PT<h>H[<m>M]" otherwise; a dateTime WITHOUT a
        # timezone is a type error (NULL → unbound / row drops).
        lex = a[0]["lex"]
        off = F.when(lex.endswith("Z"), F.lit("Z")).otherwise(
            F.regexp_extract(lex, r"([+-]\d{2}:\d{2})$", 1)
        )
        hh = F.regexp_extract(off, r"^[+-](\d{2}):", 1).cast("int")
        mm = F.regexp_extract(off, r":(\d{2})$", 1).cast("int")
        neg = F.when(off.startswith("-"), F.lit("-")).otherwise(F.lit(""))
        dur = F.when(
            (off == "Z") | ((hh == 0) & (mm == 0)), F.lit("PT0S")
        ).otherwise(
            F.concat(
                neg, F.lit("PT"), hh.cast("string"), F.lit("H"),
                F.when(
                    mm > 0, F.concat(mm.cast("string"), F.lit("M"))
                ).otherwise(F.lit("")),
            )
        )
        # signed offset seconds as the term's value slot, so TIMEZONE()
        # results compare/sort without re-parsing the lexical form
        secs = F.when(off == "Z", F.lit(0.0)).otherwise(
            F.when(off.startswith("-"), F.lit(-1.0)).otherwise(F.lit(1.0))
            * (hh.cast("double") * 3600.0 + mm.cast("double") * 60.0)
        )
        t = term_struct(
            F.lit(KIND_LITERAL).cast("tinyint"), dur,
            F.lit("dayTimeDuration"), F.lit(None).cast("string"), secs,
        )
        return F.when(is_temporal_term(a[0]) & (off != ""), t)

    # --- hashes (Expression.swift:57-63,207-238) ---
    if op in ("MD5", "SHA1", "SHA256", "SHA384", "SHA512"):
        h = {
            "MD5": lambda x: F.md5(x),
            "SHA1": lambda x: F.sha1(x),
            "SHA256": lambda x: F.sha2(x, 256),
            "SHA384": lambda x: F.sha2(x, 384),
            "SHA512": lambda x: F.sha2(x, 512),
        }[op](a[0]["lex"])
        return str_term(F.when(is_string_lit(a[0]), h))

    # --- extension-function registry (reference: functions[iri] registry,
    # Expression.swift:92,786-795; QueryPlanner.addFunction,
    # QueryPlanner.swift:135-137) ---
    if op in FUNCTION_REGISTRY:
        return FUNCTION_REGISTRY[op](*a)

    raise ExprError(f"unknown function {op}")


# IRI → callable(Column(term), ...) -> Column(term). This is the engine's
# whole UDF surface, matching the reference (no UDAF/UDTF there either).
FUNCTION_REGISTRY: dict[str, object] = {}


# ---------------------------------------------------------------------------
# FILTER-context compilation (pushdown-friendly)
# ---------------------------------------------------------------------------

def _valued(t: Column) -> Column:
    return (
        (is_numeric_term(t) | (is_temporal_term(t) & t["num"].isNotNull())
         | (t["dt"] == "boolean"))
    )


def _eq_cond(a: Column, b: Column, dur: bool = True) -> Column:
    out = (_valued(a) & _valued(b) & (a["num"] == b["num"])) | (
        term_key(a) == term_key(b)
    )
    if dur:  # compile-time pruning, see maybe_duration
        out = out | (
            is_duration_term(a) & is_duration_term(b)
            & duration_eq(a, b).eqNullSafe(F.lit(True))
        )
    return out


_STAR_ACCESSORS = ("SUBJECT", "PREDICATE", "OBJECT")


def _is_accessor(arg: Expr) -> bool:
    return (isinstance(arg, ECall) and arg.op in _STAR_ACCESSORS
            and len(arg.args) == 1)


def _component_key_col(arg: ECall, env: dict[str, Column]) -> Column:
    """Key-space compile of a SUBJECT/PREDICATE/OBJECT accessor (chain):
    nested accessors compose via component_key_of_key so each level
    costs ~4 references of the level below, not a full struct rebuild."""
    from kineo_spark.model import component_key_of_key, quoted_component_key_col

    i = _STAR_ACCESSORS.index(arg.op)
    inner = arg.args[0]
    if _is_accessor(inner):
        return component_key_of_key(_component_key_col(inner, env), i)
    return quoted_component_key_col(compile_expr(inner, env), i)


def _term_identity_key(arg: Expr, env: dict[str, Column]) -> Column:
    """Canonical term_key of ``arg`` for identity (sameTerm) comparisons,
    compiled SMALL: a constant becomes a literal key string, a quoted-
    component accessor extracts the component key positionally from the
    packed lex (never rebuilding the term struct), anything else goes
    through term_key of the compiled term. NULL = unbound/error."""
    if isinstance(arg, EConst):
        return F.lit(arg.term.key())
    if _is_accessor(arg):
        return _component_key_col(arg, env)
    return term_key(compile_expr(arg, env))


def compile_filter_condition(e: Expr, env: dict[str, Column]) -> Column:
    """Compile an expression for FILTER context as a plain boolean
    conjunction/disjunction tree. In FILTER position, SPARQL type errors
    and 3-valued NULL both mean "drop the row", so error→false is
    semantically identical (MaterializedQueryPlan.swift:427-439) — and
    unlike the general ``ebv(compile_expr(...))`` CASE-chains, plain
    AND/OR of comparisons survives Catalyst simplification all the way
    into parquet PushedFilters. Ops with NOT-like semantics (where
    error→false would flip) fall back to the exact path."""
    if isinstance(e, ECall):
        op = e.op
        if op == "&&":
            return compile_filter_condition(e.args[0], env) & compile_filter_condition(e.args[1], env)
        if op == "||":
            return compile_filter_condition(e.args[0], env) | compile_filter_condition(e.args[1], env)
        if op == "IN":
            if _hoist_scopes() and any(_call_depth(x) >= 1 for x in e.args[1:]):
                # computed branches: the or-chain inlines every branch
                # tree (multiply-referenced by _eq_cond) — use the exact
                # fold path, which hoists the branch array into a Project
                return ebv(compile_expr(e, env)).eqNullSafe(F.lit(True))
            a = compile_expr(e.args[0], env)
            out = None
            md0 = maybe_duration(e.args[0])
            for xe in e.args[1:]:
                cond = _eq_cond(a, compile_expr(xe, env),
                                dur=md0 and maybe_duration(xe))
                out = cond if out is None else (out | cond)
            return out if out is not None else F.lit(False)
        if op == "SAMETERM" and len(e.args) == 2:
            # NULL (either side unbound / accessor error) drops the row —
            # error→false, identical to sameTerm's FILTER behaviour
            return (_term_identity_key(e.args[0], env)
                    == _term_identity_key(e.args[1], env))
        if op == "ISTRIPLE" and len(e.args) == 1:
            from kineo_spark.model import _SEP, KIND_QUOTED
            if _is_accessor(e.args[0]):
                k = _component_key_col(e.args[0], env)
                return k.startswith(f"{KIND_QUOTED}{_SEP}")
            t = compile_expr(e.args[0], env)
            return t.isNotNull() & (t["kind"] == KIND_QUOTED)
        if op in ("CONTAINS", "STRSTARTS", "STRENDS"):
            a = compile_expr(e.args[0], env)
            b = compile_expr(e.args[1], env)
            meth = {"CONTAINS": "contains", "STRSTARTS": "startswith", "STRENDS": "endswith"}[op]
            # incompatible args are an ERROR (= false here), not a lex test
            return str_args_compatible(a, b) & getattr(a["lex"], meth)(b["lex"])
        if op in ("<", ">", "<=", ">=", "=", "!="):
            a = compile_expr(e.args[0], env)
            b = compile_expr(e.args[1], env)
            md = maybe_duration(e.args[0]) and maybe_duration(e.args[1])
            if op == "=":
                return _eq_cond(a, b, dur=md)
            if op == "!=":
                # NOT-like: under strict RDFterm-equal an incomparable
                # literal pair is an error (drop), but ~_eq_cond would
                # keep it — use the exact three-valued path
                return eq_terms(a, b, dur=md).eqNullSafe(F.lit(False))
            both_valued = _valued(a) & _valued(b)
            both_str = is_string_lit(a) & is_string_lit(b)
            num_cmp = {
                "<": a["num"] < b["num"], ">": a["num"] > b["num"],
                "<=": a["num"] <= b["num"], ">=": a["num"] >= b["num"],
            }[op]
            str_cmp = {
                "<": a["lex"] < b["lex"], ">": a["lex"] > b["lex"],
                "<=": a["lex"] <= b["lex"], ">=": a["lex"] >= b["lex"],
            }[op]
            out = (both_valued & num_cmp) | (both_str & str_cmp)
            if md:  # compile-time pruning, see maybe_duration
                both_dur = is_duration_term(a) & is_duration_term(b)
                dur_cmp = {
                    "<": lambda: duration_lt(a, b),
                    ">": lambda: duration_lt(b, a),
                    "<=": lambda: duration_lt(a, b) | duration_eq(a, b),
                    ">=": lambda: duration_lt(b, a) | duration_eq(a, b),
                }[op]()
                out = out | (both_dur & dur_cmp.eqNullSafe(F.lit(True)))
            return out
    # exact path (3-valued, error-aware)
    return ebv(compile_expr(e, env)).eqNullSafe(F.lit(True))


def register_function(iri_str: str, f) -> None:
    """Register a custom function by IRI; call it from queries with
    fn(iri_str, args...). The callable receives/returns term-struct
    Columns, so pure-Column implementations stay JVM-side; a Python UDF
    inside is the author's choice (and cost)."""
    FUNCTION_REGISTRY[iri_str] = f


def _compile_cast(to: str, t: Column) -> Column:
    lex = t["lex"]
    if to in ("integer", "int", "long"):
        val = (
            F.when(is_numeric_term(t), t["num"])
            .when(t["dt"] == "boolean", t["num"])
            .when(lex.rlike(r"^\s*[+-]?\d+\s*$"), lex.cast("double"))
        )
        iv = val.try_cast("long")  # try_: ANSI would throw on overflow/NaN
        return F.when(iv.isNotNull(), num_term(iv.cast("double"), F.lit("integer")))
    if to in ("double", "float", "decimal"):
        # xsd:decimal's lexical space has NO exponent (unlike
        # float/double) — "1e3" must be a cast error
        pat = (r"^\s*[+-]?(\d+\.?\d*|\.\d+)\s*$" if to == "decimal"
               else r"^\s*[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?\s*$")
        val = (
            F.when(is_numeric_term(t) | (t["dt"] == "boolean"), t["num"])
            .when(lex.rlike(pat), lex.cast("double"))
        )
        return num_term(val, F.lit(to))
    if to == "boolean":
        b = (
            F.when(t["dt"] == "boolean", t["num"] != 0)
            .when(is_numeric_term(t), t["num"] != 0)
            .when(lex.isin("true", "1"), F.lit(True))
            .when(lex.isin("false", "0"), F.lit(False))
        )
        return bool_term(b)
    if to == "string":
        return str_term(F.when(t["kind"] != KIND_BLANK, lex))
    if to in ("dateTime", "date"):
        ts = F.when(is_temporal_term(t), F.timestamp_micros(t["num"].cast("long"))).otherwise(
            # try_: malformed lexical is a cast error (→NULL), not a crash
            F.try_to_timestamp(F.replace(lex, F.lit("T"), F.lit(" ")))
        )
        from kineo_spark.model import lit_date_col, lit_datetime_col
        return lit_datetime_col(ts) if to == "dateTime" else lit_date_col(ts.cast("date"))
    raise ExprError(f"unsupported cast target {to}")
