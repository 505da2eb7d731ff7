"""NiFi Expression Language *string* compiler → Spark Column.

NiFi users write flows with EL text like ``${attr:toUpper():substring(0,3)}``
(the 2.7.2 engine's scalar language; SURVEY.md §2.9).  ``functions/el.py``
already provides the function *surface* as Column wrappers; this module adds
the missing front end — a parser from EL source text to a Spark Column —
so routing predicates, UpdateAttribute rules, and flow definitions can be
given as the strings a NiFi user actually writes.

Grammar (subset of the public NiFi EL guide — Apache NiFi docs,
"Expression Language Guide"):

    text     := (literal | '$$' | expr)*          # embedded expressions
    expr     := '${' subject (':' call)* '}'
    subject  := attrName | 'quoted attr' | "quoted attr" | call | multiAttr
    call     := name '(' [arg (',' arg)*] ')'
    multiAttr:= anyAttribute(...) | allAttributes(...)
    arg      := 'string' | "string" | number | true | false | expr

Everything compiles to built-in Spark SQL expressions (whole-stage
codegen); the parser runs once on the driver at plan-build time, so EL
adds zero per-row cost.  Attribute references resolve through a
``resolver`` callable (default ``F.col``) — pass e.g.
``lambda n: F.col("attrs").getItem(n)`` to read a NiFi-style attributes
map column.

``anyMatchingAttribute``/``allMatchingAttributes`` resolve their regex
against the attribute universe — compile with ``compile_el_for(df, text)``
so the DataFrame schema provides it.  ``getDelimitedField`` implements the
full quote/escape-aware 2.7.2 signature.  Parameter contexts (NiFi 2.x
``#{param}`` references, resolved BEFORE EL evaluation per the admin
guide, ``##{`` escaping a literal) substitute from the ``parameters``
mapping; ``${getStateValue('key')}`` reads the ``state`` mapping — the
processor-local state map a stateful UpdateAttribute accumulates (state
WRITES happen through the engine's stateful operators, registry §2.11;
this is the read scope).  Both resolve at compile time: parameters and
state are driver-side scalars in NiFi too, never per-row data.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from apache_nifi_spark.functions import el as E

__all__ = [
    "compile_el",
    "compile_el_for",
    "ELSyntaxError",
    "el_predicate",
    "el_select",
    "resolve_parameters",
]


class ELSyntaxError(ValueError):
    """Raised on malformed EL text, with position context."""


# ------------------------------------------------------------------ lexer ---

class _Scanner:
    def __init__(self, s: str, offset: int = 0):
        self.s = s
        self.i = 0
        self.offset = offset  # for error messages relative to full text

    def err(self, msg: str) -> ELSyntaxError:
        return ELSyntaxError(f"{msg} at position {self.offset + self.i}: {self.s!r}")

    def peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ""

    def skip_ws(self) -> None:
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1

    def expect(self, ch: str) -> None:
        self.skip_ws()
        if self.peek() != ch:
            raise self.err(f"expected {ch!r}, found {self.peek()!r}")
        self.i += 1

    def match(self, ch: str) -> bool:
        self.skip_ws()
        if self.peek() == ch:
            self.i += 1
            return True
        return False

    def ident(self) -> str:
        self.skip_ws()
        j = self.i
        while self.i < len(self.s) and (self.s[self.i].isalnum() or self.s[self.i] in "_."):
            self.i += 1
        if j == self.i:
            raise self.err("expected identifier")
        return self.s[j : self.i]

    def quoted(self) -> str:
        q = self.peek()
        assert q in "'\""
        self.i += 1
        out = []
        while True:
            if self.i >= len(self.s):
                raise self.err("unterminated string literal")
            ch = self.s[self.i]
            if ch == "\\" and self.i + 1 < len(self.s):
                out.append(self.s[self.i + 1])
                self.i += 2
                continue
            if ch == q:
                self.i += 1
                return "".join(out)
            out.append(ch)
            self.i += 1

    def balanced_expr(self) -> str:
        """Consume a nested ``${...}`` starting at ``${``; return the inside."""
        assert self.s[self.i : self.i + 2] == "${"
        start = self.i + 2
        depth = 1
        self.i += 2
        while self.i < len(self.s):
            ch = self.s[self.i]
            if ch in "'\"":
                self.quoted()
                continue
            if self.s[self.i : self.i + 2] == "${":
                depth += 1
                self.i += 2
                continue
            if ch == "}":
                depth -= 1
                self.i += 1
                if depth == 0:
                    return self.s[start : self.i - 1]
                continue
            self.i += 1
        raise self.err("unterminated ${ expression")


# ------------------------------------------------------------------- AST ----
# subject node: ("attr", name) | ("call", name, [args]) | ("multi", op, names)
# arg node:     ("lit", python value) | ("expr", exprnode)
# expr node:    (subject, [(funcname, [args]), ...])

_MULTI = {"anyAttribute": "any", "allAttributes": "all"}

#: regex multi-attribute forms — expanded against the attribute UNIVERSE
#: (a DataFrame schema) at compile time via ``compile_el_for``.
_MULTI_RE = {"anyMatchingAttribute": "any", "allMatchingAttributes": "all"}


def _parse_expr(sc: _Scanner):
    sc.skip_ws()
    ch = sc.peek()
    if ch in "'\"":
        subject = ("attr", sc.quoted())
    else:
        name = sc.ident()
        sc.skip_ws()
        if sc.peek() == "(":
            args = _parse_args(sc)
            if name in _MULTI:
                names = []
                for a in args:
                    if a[0] != "lit" or not isinstance(a[1], str):
                        raise sc.err(f"{name}() takes quoted attribute names")
                    names.append(a[1])
                subject = ("multi", _MULTI[name], names)
            elif name in _MULTI_RE:
                pats = []
                for a in args:
                    if a[0] != "lit" or not isinstance(a[1], str):
                        raise sc.err(f"{name}() takes quoted regex patterns")
                    pats.append(a[1])
                subject = ("multire", _MULTI_RE[name], pats)
            else:
                subject = ("call", name, args)
        else:
            subject = ("attr", name)
    calls = []
    while sc.match(":"):
        fname = sc.ident()
        sc.skip_ws()
        if sc.peek() == "(":
            args = _parse_args(sc)
        else:
            args = []
        calls.append((fname, args))
    sc.skip_ws()
    if sc.i < len(sc.s):
        raise sc.err(f"unexpected trailing input {sc.s[sc.i:]!r}")
    return subject, calls


def _parse_args(sc: _Scanner) -> list:
    sc.expect("(")
    args: list = []
    sc.skip_ws()
    if sc.match(")"):
        return args
    while True:
        sc.skip_ws()
        ch = sc.peek()
        if ch in "'\"":
            args.append(("lit", sc.quoted()))
        elif sc.s[sc.i : sc.i + 2] == "${":
            inner = sc.balanced_expr()
            args.append(("expr", _parse_expr(_Scanner(inner, sc.offset + sc.i))))
        else:
            j = sc.i
            while sc.i < len(sc.s) and sc.s[sc.i] not in ",)":
                sc.i += 1
            tok = sc.s[j : sc.i].strip()
            if tok == "true":
                args.append(("lit", True))
            elif tok == "false":
                args.append(("lit", False))
            else:
                try:
                    args.append(("lit", int(tok)))
                except ValueError:
                    try:
                        args.append(("lit", float(tok)))
                    except ValueError:
                        raise sc.err(f"bad argument {tok!r}") from None
        sc.skip_ws()
        if sc.match(","):
            continue
        sc.expect(")")
        return args


# ------------------------------------------------------------ evaluation ----

def _lit(v) -> Column:
    return v if isinstance(v, Column) else F.lit(v)


def _req_str(v, fname: str) -> str:
    if isinstance(v, Column) or not isinstance(v, str):
        raise ELSyntaxError(f"{fname}() requires a string literal argument")
    return v


def _req_int(v, fname: str) -> int:
    if not isinstance(v, int) or isinstance(v, bool):
        raise ELSyntaxError(f"{fname}() requires an integer literal argument")
    return v


def _el_substring(s: Column, *args) -> Column:
    # EL substring(start[, end]): 0-based, end-exclusive.
    start = _req_int(args[0], "substring")
    if len(args) == 1:
        return F.substring(s, start + 1, 2**31 - 1)
    end = _req_int(args[1], "substring")
    return F.substring(s, start + 1, end - start)


def _el_if_else(s: Column, a, b) -> Column:
    return F.when(s, _lit(a)).otherwise(_lit(b))


def _el_get_delimited_field(s: Column, *args) -> Column:
    """NiFi getDelimitedField(index[, delim[, quote[, escape[, strip]]]]):
    1-based field extraction that respects quoted fields (delimiters
    inside quotes don't split) and escape characters — the full 2.7.2
    signature, not a naive split.  Compiles to one regexp_extract: field
    := (quoted-run | escaped-char | non-delim)*, Nth field anchored by
    N-1 (field delim) repetitions.  Java regex, whole-stage codegen."""
    import re as _re

    idx = _req_int(args[0], "getDelimitedField")
    delim = _req_str(args[1], "getDelimitedField") if len(args) > 1 else ","
    quote = _req_str(args[2], "getDelimitedField") if len(args) > 2 else '"'
    escape = _req_str(args[3], "getDelimitedField") if len(args) > 3 else "\\"
    strip = bool(args[4]) if len(args) > 4 else False
    if idx < 1:
        raise ELSyntaxError("getDelimitedField index is 1-based")
    D, Q, E = _re.escape(delim), _re.escape(quote), _re.escape(escape)
    field = f"(?:{Q}(?:{E}.|[^{Q}])*{Q}|{E}.|[^{D}])*"
    out = F.regexp_extract(s, f"^(?:{field}{D}){{{idx - 1}}}({field})", 1)
    if strip:
        out = F.translate(out, quote + escape, "")
    return out


#: EL function name → handler(subject Column, *evaluated args) → Column.
#: Reuses functions/el.py wherever the wrapper signature lines up.
FUNCS: dict[str, Callable[..., Column]] = {
    # string
    "toUpper": E.to_upper,
    "toLower": E.to_lower,
    "trim": E.trim,
    "substring": _el_substring,
    "substringBefore": lambda s, a: E.substring_before(s, _req_str(a, "substringBefore")),
    "substringAfter": lambda s, a: E.substring_after(s, _req_str(a, "substringAfter")),
    "substringBeforeLast": lambda s, a: E.substring_before_last(
        s, _req_str(a, "substringBeforeLast")
    ),
    "substringAfterLast": lambda s, a: E.substring_after_last(
        s, _req_str(a, "substringAfterLast")
    ),
    "indexOf": lambda s, a: E.index_of(s, _req_str(a, "indexOf")),
    "lastIndexOf": lambda s, a: E.last_index_of(s, _req_str(a, "lastIndexOf")),
    "replace": lambda s, a, b: F.replace(s, _lit(a), _lit(b)),
    "replaceAll": lambda s, a, b: E.replace_all(
        s, _req_str(a, "replaceAll"), _req_str(b, "replaceAll")
    ),
    "replaceNull": lambda s, a: E.replace_null(s, _lit(a)),
    "replaceEmpty": lambda s, a: E.replace_empty(s, _lit(a)),
    "append": lambda s, a: F.concat(s, _lit(a).cast("string")),
    "prepend": lambda s, a: F.concat(_lit(a).cast("string"), s),
    "length": E.length,
    "startsWith": lambda s, a: F.startswith(s, _lit(a)),
    "endsWith": lambda s, a: F.endswith(s, _lit(a)),
    "contains": lambda s, a: F.contains(s, _lit(a)),
    "matches": lambda s, a: E.matches(s, _req_str(a, "matches")),
    "find": lambda s, a: E.find(s, _req_str(a, "find")),
    "padLeft": lambda s, *a: E.pad_left(
        s, _req_int(a[0], "padLeft"), _req_str(a[1], "padLeft") if len(a) > 1 else "_"
    ),
    "padRight": lambda s, *a: E.pad_right(
        s, _req_int(a[0], "padRight"), _req_str(a[1], "padRight") if len(a) > 1 else "_"
    ),
    "getDelimitedField": _el_get_delimited_field,
    # encode / decode / hash
    "urlEncode": E.url_encode,
    "urlDecode": E.url_decode,
    "base64Encode": E.base64_encode,
    "base64Decode": E.base64_decode,
    "hash": lambda s, a: E.hash_content(s, _req_str(a, "hash")),
    # math
    "plus": lambda s, a: s + _lit(a),
    "minus": lambda s, a: s - _lit(a),
    "multiply": lambda s, a: s * _lit(a),
    "divide": lambda s, a: s / _lit(a),
    "mod": lambda s, a: s % _lit(a),
    "toRadix": lambda s, a: E.to_radix(s, _req_int(a, "toRadix")),
    "fromRadix": lambda s, a: E.from_radix(s, _req_int(a, "fromRadix")),
    # date/time
    "format": lambda s, a: E.format_ts(s, _req_str(a, "format")),
    "toDate": lambda s, *a: E.to_date_el(s, _req_str(a[0], "toDate") if a else None),
    # boolean / conditional
    "isNull": E.is_null,
    "notNull": E.not_null,
    "isEmpty": E.is_empty,
    "equals": lambda s, a: s == _lit(a),
    "equalsIgnoreCase": lambda s, a: F.upper(s) == F.upper(_lit(a)),
    "gt": lambda s, a: s > _lit(a),
    "ge": lambda s, a: s >= _lit(a),
    "lt": lambda s, a: s < _lit(a),
    "le": lambda s, a: s <= _lit(a),
    "and": lambda s, a: s & _as_bool(a),
    "or": lambda s, a: s | _as_bool(a),
    "not": lambda s: ~s,
    "ifElse": _el_if_else,
    # coercion
    "toNumber": E.to_number,
    "toDecimal": E.to_decimal,
    "toString": E.to_string,
    # JSON
    "jsonPath": lambda s, a: E.json_path(s, _req_str(a, "jsonPath")),
}

#: subject-position functions (``${literal(5)}``, ``${UUID()}``, ``${now()}``)
SUBJECT_FUNCS: dict[str, Callable[..., Column]] = {
    "literal": lambda *a: _lit(a[0]),
    "UUID": lambda: E.new_uuid(),
    "now": lambda: E.now(),
}


def _as_bool(v) -> Column:
    if isinstance(v, Column):
        return v
    if isinstance(v, bool):
        return F.lit(v)
    raise ELSyntaxError("and()/or() take a nested ${...} expression or boolean")


def _eval_arg(arg, resolver, universe=None, state=None) -> object:
    kind, val = arg
    if kind == "lit":
        return val
    return _eval_expr(val, resolver, universe, state)


def _apply_chain(col: Column, calls, resolver, universe=None, state=None) -> Column:
    for fname, raw_args in calls:
        fn = FUNCS.get(fname)
        if fn is None:
            raise ELSyntaxError(
                f"unknown EL function {fname!r} (supported: {sorted(FUNCS)})"
            )
        args = [_eval_arg(a, resolver, universe, state) for a in raw_args]
        col = fn(col, *args)
    return col


def _eval_expr(node, resolver, universe=None, state=None) -> Column:
    subject, calls = node
    if subject[0] == "attr":
        return _apply_chain(resolver(subject[1]), calls, resolver, universe, state)
    if subject[0] == "call":
        _, name, raw_args = subject
        if name == "getStateValue":
            # processor-local state read (NiFi stateful UpdateAttribute):
            # a driver-side scalar, resolved at compile time
            if state is None:
                raise ELSyntaxError(
                    "getStateValue needs a state mapping — pass state= to compile_el"
                )
            args = [_eval_arg(a, resolver, universe, state) for a in raw_args]
            if len(args) != 1 or not isinstance(args[0], str):
                raise ELSyntaxError("getStateValue takes one quoted key")
            base = _lit(state.get(args[0]))
            return _apply_chain(base, calls, resolver, universe, state)
        fn = SUBJECT_FUNCS.get(name)
        if fn is None:
            raise ELSyntaxError(f"unknown subjectless EL function {name!r}")
        base = fn(*[_eval_arg(a, resolver, universe, state) for a in raw_args])
        return _apply_chain(base, calls, resolver, universe, state)
    if subject[0] == "multire":
        # regex multi-attribute: expand patterns against the attribute
        # universe (the DataFrame schema) at COMPILE time — NiFi matches
        # against the flowfile's attribute map the same way; here the
        # schema is the attribute map's key set.  Driver-side regex,
        # zero per-row cost.
        import re

        _, op, pats = subject
        if universe is None:
            raise ELSyntaxError(
                "anyMatchingAttribute/allMatchingAttributes need the attribute "
                "universe — compile with compile_el_for(df, text)"
            )
        names = [
            n for n in universe if any(re.fullmatch(p, n) for p in pats)
        ]
        if not names:
            # NiFi: any-quantifier over zero attributes is false, all- is true
            return F.lit(op == "all")
        parts = [
            _apply_chain(resolver(n), calls, resolver, universe, state)
            for n in names
        ]
        out = parts[0]
        for p in parts[1:]:
            out = (out | p) if op == "any" else (out & p)
        return out
    # multi-attribute: apply the chain per attribute, then OR/AND-reduce —
    # NiFi's anyAttribute/allAttributes semantics.
    _, op, names = subject
    parts = [
        _apply_chain(resolver(n), calls, resolver, universe, state) for n in names
    ]
    out = parts[0]
    for p in parts[1:]:
        out = (out | p) if op == "any" else (out & p)
    return out


# -------------------------------------------------------------- front end ---

def _split_top(text: str) -> list:
    """Split full EL text into ('lit', str) / ('expr', node) parts,
    honouring ``$$`` escapes and nested/quoted braces."""
    parts: list = []
    buf: list[str] = []
    i = 0
    while i < len(text):
        if text[i : i + 2] == "$$":
            buf.append("$")
            i += 2
            continue
        if text[i : i + 2] == "${":
            if buf:
                parts.append(("lit", "".join(buf)))
                buf = []
            sc = _Scanner(text)
            sc.i = i
            inner = sc.balanced_expr()
            parts.append(("expr", _parse_expr(_Scanner(inner, i + 2))))
            i = sc.i
            continue
        buf.append(text[i])
        i += 1
    if buf:
        parts.append(("lit", "".join(buf)))
    return parts


def resolve_parameters(text: str, parameters: dict[str, str]) -> str:
    """NiFi 2.x parameter-context substitution: ``#{name}`` → the
    parameter's value, applied to the property text BEFORE EL parsing
    (parameters may thus contribute EL fragments, as in NiFi);
    ``##{`` escapes a literal ``#{``.  Unknown parameters raise — a
    flow referencing an unassigned parameter fails validation in NiFi
    too."""
    out: list[str] = []
    i = 0
    while i < len(text):
        if text[i : i + 3] == "##{":
            out.append("#{")
            i += 3
        elif text[i : i + 2] == "#{":
            j = text.find("}", i)
            if j < 0:
                raise ELSyntaxError(f"unterminated parameter reference at {i}")
            name = text[i + 2 : j].strip()
            if name not in parameters:
                raise ELSyntaxError(f"unassigned parameter {name!r}")
            out.append(str(parameters[name]))
            i = j + 1
        else:
            out.append(text[i])
            i += 1
    return "".join(out)


def compile_el(
    text: str,
    resolver: Callable[[str], Column] | None = None,
    universe: list[str] | None = None,
    parameters: dict[str, str] | None = None,
    state: dict[str, object] | None = None,
) -> Column:
    """Compile NiFi EL source text to a Spark Column.

    A lone ``${...}`` keeps its natural type (boolean for predicates,
    numeric for math chains); text with embedded expressions concatenates
    as string, exactly like NiFi property evaluation.  ``universe`` is
    the attribute-name universe for ``anyMatchingAttribute`` /
    ``allMatchingAttributes`` — usually ``df.columns``; use
    ``compile_el_for`` to pass it from a DataFrame.

    >>> df.filter(compile_el("${event_type:equals('click')}"))
    >>> df.withColumn("tag", compile_el("c-${c_custkey}-${c_mktsegment:toLower()}"))
    """
    resolver = resolver or F.col
    if parameters is not None:
        text = resolve_parameters(text, parameters)
    parts = _split_top(text)
    if not parts:
        return F.lit("")
    if len(parts) == 1:
        kind, val = parts[0]
        return (
            F.lit(val)
            if kind == "lit"
            else _eval_expr(val, resolver, universe, state)
        )
    cols = [
        F.lit(val)
        if kind == "lit"
        else _eval_expr(val, resolver, universe, state).cast("string")
        for kind, val in parts
    ]
    return F.concat(*cols)


def compile_el_for(df, text: str) -> Column:
    """Schema-aware EL compile: the DataFrame's columns are the attribute
    universe, so regex multi-attribute forms (``anyMatchingAttribute``)
    resolve — NiFi evaluates them against the flowfile's attribute map;
    a record's schema is that map here."""
    return compile_el(text, universe=df.columns)


def el_predicate(text: str, resolver: Callable[[str], Column] | None = None) -> Column:
    """Compile EL text that must evaluate to a boolean (RouteOnAttribute
    property semantics): non-boolean results error at analysis, like
    NiFi's 'expression must return a boolean' validation."""
    return compile_el(text, resolver).cast("boolean")


def el_select(df, exprs: dict[str, str], keep: list[str] | None = None):
    """UpdateAttribute analog driven entirely by EL strings: each value in
    ``exprs`` is EL source evaluated against the DataFrame's columns."""
    cols = [F.col(c) for c in (keep or df.columns)]
    cols += [compile_el(src).alias(name) for name, src in exprs.items()]
    return df.select(*cols)
