"""NiFi RecordPath *string* parser → Spark nested-type Columns.

RecordPath is NiFi's path language for record-aware processors
(UpdateRecord, RenameRecordField, RecordPath-driven lookups)
[2.7.2-surface; SURVEY.md §2.4/§2.9].  ``functions/recordpath.py`` has the
function surface; this module adds the front end that parses the path
*text* a NiFi user writes into Column expressions:

    /a/b            child navigation (struct fields)
    /arr[0]         array index (0-based; negatives count from the end)
    /arr[0..2]      inclusive range → array
    /arr[0,2,4]     explicit indices → array
    /arr[*]         all elements → array; later steps map per-element
    /map['key']     map lookup
    /arr[. > 5]     predicate on elements (``.`` = element,
    /arr[./f = 'x']  ``./f`` = element field) → filtered array
    concat(/a, '-', /b), coalesce(/a, /b), count(/arr), replace(/a,'x','y')
                    top-level RecordPath functions

Everything compiles to built-in complex-type expressions
(``getField``/``get``/``element_at``/``slice``/``transform``/``filter``)
— JVM lambdas, no Python in the data path; parsing happens once on the
driver.  Descendant search (``//name``) and parent (``..``) resolve by
StructType reflection — use ``compile_record_path_for(df, path)``, which
has the schema; the schemaless ``compile_record_path`` rejects those
axes with a pointer to it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from apache_nifi_spark.functions import el as E
from apache_nifi_spark.functions.el_parser import ELSyntaxError, _Scanner

__all__ = [
    "compile_record_path",
    "compile_record_path_for",
    "record_path_update",
    "record_path_remove",
    "RecordPathError",
]


class RecordPathError(ELSyntaxError):
    """Malformed or unsupported RecordPath text."""


# ---------------------------------------------------------------- parsing ---
# step:      (name, [selector, ...])
# selector:  ("index", i) | ("key", k) | ("star",) | ("range", a, b)
#          | ("indices", [i...]) | ("pred", (lhs_steps, op, value))
#   lhs_steps: [] for ``.`` itself, else the ``./f/g`` child steps

_OPS = ("!=", ">=", "<=", "=", ">", "<")


def _parse_steps(sc: _Scanner) -> list:
    steps = []
    while True:
        sc.skip_ws()
        if sc.peek() != "/":
            break
        sc.i += 1
        if sc.peek() == "/":
            # descendant axis //name — resolved by schema reflection in
            # compile_record_path_for; marker name keeps the tuple shape
            sc.i += 1
            name = "//" + sc.ident()
        elif sc.s.startswith("..", sc.i):
            sc.i += 2
            name = ".."
        else:
            name = sc.ident()
        sels = []
        sc.skip_ws()
        while sc.peek() == "[":
            sels.append(_parse_selector(sc))
            sc.skip_ws()
        if name == ".." and sels:
            raise sc.err("'..' takes no selectors")
        steps.append((name, sels))
    if not steps:
        raise sc.err("RecordPath must start with '/'")
    return steps


def _parse_selector(sc: _Scanner):
    sc.expect("[")
    sc.skip_ws()
    ch = sc.peek()
    if ch == "*":
        sc.i += 1
        sc.expect("]")
        return ("star",)
    if ch in "'\"":
        key = sc.quoted()
        sc.expect("]")
        return ("key", key)
    if ch == "." :
        # predicate: . or ./f chain, operator, literal
        sc.i += 1
        lhs = []
        while sc.peek() == "/":
            sc.i += 1
            lhs.append(sc.ident())
        sc.skip_ws()
        op = next((o for o in _OPS if sc.s.startswith(o, sc.i)), None)
        if op is None:
            raise sc.err("expected comparison operator in predicate")
        sc.i += len(op)
        sc.skip_ws()
        if sc.peek() in "'\"":
            val = sc.quoted()
        else:
            j = sc.i
            while sc.i < len(sc.s) and sc.s[sc.i] not in "]":
                sc.i += 1
            tok = sc.s[j : sc.i].strip()
            try:
                val = int(tok)
            except ValueError:
                try:
                    val = float(tok)
                except ValueError:
                    raise sc.err(f"bad predicate literal {tok!r}") from None
        sc.expect("]")
        return ("pred", (lhs, op, val))
    # numbers: index, range, or list
    nums = []
    is_range = False
    while True:
        sc.skip_ws()
        j = sc.i
        if sc.peek() == "-":
            sc.i += 1
        while sc.i < len(sc.s) and sc.s[sc.i].isdigit():
            sc.i += 1
        if j == sc.i or sc.s[j : sc.i] == "-":
            raise sc.err("expected array index")
        nums.append(int(sc.s[j : sc.i]))
        sc.skip_ws()
        if sc.s.startswith("..", sc.i):
            sc.i += 2
            is_range = True
            continue
        if sc.match(","):
            continue
        sc.expect("]")
        break
    if is_range:
        if len(nums) != 2 or nums[0] < 0 or nums[1] < nums[0]:
            raise sc.err(f"bad range {nums}")
        return ("range", nums[0], nums[1])
    if len(nums) == 1:
        return ("index", nums[0])
    return ("indices", nums)


# ------------------------------------------------------------- navigation ---

def _at(c: Column, i: int) -> Column:
    # RecordPath indices are 0-based; negatives count from the end.
    return F.get(c, i) if i >= 0 else F.element_at(c, i)


def _eval_pred(pred, elem: Column) -> Column:
    lhs_steps, op, val = pred
    lhs = elem
    for name in lhs_steps:
        lhs = lhs.getField(name)
    rhs = F.lit(val)
    return {
        "=": lhs == rhs, "!=": lhs != rhs, ">": lhs > rhs,
        "<": lhs < rhs, ">=": lhs >= rhs, "<=": lhs <= rhs,
    }[op]


def _apply_sels(c: Column, sels: list, rest: list) -> Column:
    if not sels:
        return _nav_steps(c, rest)
    s, tail = sels[0], sels[1:]
    kind = s[0]
    if kind == "index":
        return _apply_sels(_at(c, s[1]), tail, rest)
    if kind == "key":
        return _apply_sels(c.getItem(s[1]), tail, rest)
    if kind == "star":
        arr = c
    elif kind == "range":
        arr = F.slice(c, s[1] + 1, s[2] - s[1] + 1)
    elif kind == "indices":
        arr = F.array(*[_at(c, i) for i in s[1]])
    else:  # pred
        arr = F.filter(c, lambda e: _eval_pred(s[1], e))
    if tail or rest:
        return F.transform(arr, lambda e: _apply_sels(e, tail, rest))
    return arr


def _nav_steps(c: Column, steps: list) -> Column:
    if not steps:
        return c
    name, sels = steps[0]
    return _apply_sels(c.getField(name), sels, steps[1:])


# --------------------------------------------------- top-level functions ----

def _fn_count(c: Column) -> Column:
    return F.size(c)


def _c(v) -> Column:
    return v if isinstance(v, Column) else F.lit(v)


_RP_FUNCS: dict[str, Callable[..., Column]] = {
    "concat": lambda *a: F.concat(*[_c(x).cast("string") for x in a]),
    "coalesce": lambda *a: F.coalesce(*[_c(x) for x in a]),
    "count": _fn_count,
    "replace": lambda c, x, y: F.replace(c, _c(x), _c(y)),
    "replaceRegex": lambda c, x, y: F.regexp_replace(c, _s(x), _s(y)),
    "substringBefore": lambda c, sep: F.substring_index(c, _s(sep), 1),
    "substringAfter": lambda c, sep: E.substring_after(c, _s(sep)),
    "contains": lambda c, x: F.contains(c, _c(x)),
    "matches": lambda c, x: E.matches(c, _s(x)),
    "padLeft": lambda c, n, p=None: F.lpad(c, _i(n), _s(p) if p is not None else "_"),
    "padRight": lambda c, n, p=None: F.rpad(c, _i(n), _s(p) if p is not None else "_"),
    "hash": lambda c, alg: E.hash_content(c, _s(alg)),
    "base64Encode": E.base64_encode,
    "base64Decode": E.base64_decode,
    "toUpperCase": F.upper,
    "toLowerCase": F.lower,
    "trim": F.trim,
    "toString": lambda c: c.cast("string"),
    "unescapeJson": lambda c, schema: F.from_json(c, _s(schema)),
    "escapeJson": F.to_json,
    "fieldCount": _fn_count,
}


def _s(v) -> str:
    if isinstance(v, Column):
        raise RecordPathError("this RecordPath function needs a literal argument")
    return str(v)


def _i(v) -> int:
    if isinstance(v, Column) or not isinstance(v, int):
        raise RecordPathError("this RecordPath function needs an integer literal")
    return v


def _parse_fn_args(sc: _Scanner) -> list:
    sc.expect("(")
    args: list = []
    if sc.match(")"):
        return args
    while True:
        sc.skip_ws()
        ch = sc.peek()
        if ch == "/":
            args.append(_compile_steps(sc))
        elif ch in "'\"":
            args.append(sc.quoted())
        else:
            j = sc.i
            while sc.i < len(sc.s) and sc.s[sc.i] not in ",)":
                sc.i += 1
            tok = sc.s[j : sc.i].strip()
            try:
                args.append(int(tok))
            except ValueError:
                try:
                    args.append(float(tok))
                except ValueError:
                    raise sc.err(f"bad argument {tok!r}") from None
        if sc.match(","):
            continue
        sc.expect(")")
        return args


def _compile_steps(sc: _Scanner) -> Column:
    steps = _parse_steps(sc)
    for name, _ in steps:
        if name == ".." or name.startswith("//"):
            raise RecordPathError(
                f"axis {name!r} needs the record schema — use "
                "compile_record_path_for(df, path)"
            )
    name, sels = steps[0]
    return _apply_sels(F.col(name), sels, steps[1:])


# ------------------------------------------------- schema-aware axes --------

def _descend_paths(dtype, name: str) -> list[list[str]]:
    """Depth-first child-step chains from ``dtype`` to every struct field
    named ``name`` (descendant axis).  Descends through structs and
    through array<struct> ELEMENT types (the nav layer's per-element
    ``transform`` handles the mapping); map value types are opaque."""
    from pyspark.sql.types import ArrayType, StructType

    if isinstance(dtype, ArrayType):
        return _descend_paths(dtype.elementType, name)
    out: list[list[str]] = []
    if isinstance(dtype, StructType):
        for f in dtype.fields:
            if f.name == name:
                out.append([f.name])
            inner = f.dataType
            if isinstance(inner, ArrayType):
                inner = inner.elementType
            if isinstance(inner, StructType):
                out.extend([f.name] + p for p in _descend_paths(inner, name))
    return out


def _dtype_at(root, chain: list) -> object:
    """Data type after walking ``chain`` of (name, sels) from the root
    schema — selectors unwrap array/map element types."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    dt = root
    for name, sels in chain:
        if isinstance(dt, ArrayType):
            dt = dt.elementType
        if not isinstance(dt, StructType) or name not in dt.fieldNames():
            raise RecordPathError(f"no field {name!r} at /{'/'.join(n for n, _ in chain)}")
        dt = dt[name].dataType
        for _ in sels:
            if isinstance(dt, ArrayType):
                dt = dt.elementType
            elif isinstance(dt, MapType):
                dt = dt.valueType
    return dt


def compile_record_path_for(df: DataFrame, path: str) -> Column:
    """Schema-aware RecordPath compile: additionally resolves the
    descendant (``//name``) and parent (``..``) axes by StructType
    reflection — NiFi walks the record's schema the same way; here the
    DataFrame schema IS that schema.  ``//name`` expands depth-first to
    every matching field (through structs and array<struct> elements);
    one match compiles to its value, several to an array of them.
    ``..`` pops one step (the parent of an array element is the array's
    parent record, matching the nav layer's per-element view).
    Resolution is all driver-side; the emitted Columns are the same
    complex-type expressions the plain compiler produces."""
    try:
        sc = _Scanner(path)
        sc.skip_ws()
        if sc.peek() != "/":
            raise RecordPathError("schema-aware RecordPath must start with '/'")
        steps = _parse_steps(sc)
        sc.skip_ws()
        if sc.i < len(sc.s):
            raise sc.err(f"unexpected trailing input {sc.s[sc.i:]!r}")
        chains: list[list] = [[]]
        for name, sels in steps:
            if name == "..":
                for ch in chains:
                    if not ch:
                        raise RecordPathError("'..' above the record root")
                    ch.pop()
            elif name.startswith("//"):
                target = name[2:]
                new_chains: list[list] = []
                for ch in chains:
                    dt = _dtype_at(df.schema, ch) if ch else df.schema
                    for desc in _descend_paths(dt, target):
                        new_chains.append(
                            ch + [(n, []) for n in desc[:-1]] + [(desc[-1], sels)]
                        )
                if not new_chains:
                    raise RecordPathError(f"descendant axis //{target} matched nothing")
                chains = new_chains
            else:
                for ch in chains:
                    ch.append((name, sels))
        cols = []
        for ch in chains:
            if not ch:
                raise RecordPathError("path resolved to the record root")
            (n0, s0), rest = ch[0], ch[1:]
            cols.append(_apply_sels(F.col(n0), s0, rest))
        return cols[0] if len(cols) == 1 else F.array(*cols)
    except RecordPathError:
        raise
    except ELSyntaxError as e:
        raise RecordPathError(str(e)) from None


def compile_record_path(path: str) -> Column:
    """Compile RecordPath text to a Column over the DataFrame's columns.

    >>> df.select(compile_record_path("/user/id"))
    >>> df.select(compile_record_path("/items[./qty > 2]/name"))
    >>> df.select(compile_record_path("concat(/first, ' ', /last)"))
    """
    try:
        sc = _Scanner(path)
        sc.skip_ws()
        if sc.peek() == "/":
            col = _compile_steps(sc)
        else:
            fname = sc.ident()
            fn = _RP_FUNCS.get(fname)
            if fn is None:
                raise RecordPathError(
                    f"unknown RecordPath function {fname!r} "
                    f"(supported: {sorted(_RP_FUNCS)})"
                )
            col = fn(*_parse_fn_args(sc))
        sc.skip_ws()
        if sc.i < len(sc.s):
            raise sc.err(f"unexpected trailing input {sc.s[sc.i:]!r}")
        return col
    except RecordPathError:
        raise
    except ELSyntaxError as e:  # scanner-level errors → RecordPath flavor
        raise RecordPathError(str(e)) from None


# ----------------------------------------------------------------- update ---

def record_path_update(
    df: DataFrame, path: str, fn: Callable[[Column], Column]
) -> DataFrame:
    """UpdateRecord analog driven by a RecordPath string: replace the value
    at ``path`` with ``fn(current)``.  Supports nested struct paths and
    ``[*]`` over arrays (mapped via ``transform`` — per-element JVM lambda,
    no shuffle, no Python)."""
    try:
        sc = _Scanner(path)
        steps = _parse_steps(sc)
        if sc.i < len(sc.s):
            raise sc.err("trailing input after update path")
        name, sels = steps[0]
        return df.withColumn(name, _upd(F.col(name), sels, steps[1:], fn))
    except RecordPathError:
        raise
    except ELSyntaxError as e:
        raise RecordPathError(str(e)) from None


def _upd(col: Column, sels: list, rest: list, fn) -> Column:
    if sels:
        if sels[0] != ("star",) or len(sels) > 1:
            raise RecordPathError("update paths support only the [*] selector")
        return F.transform(col, lambda e: _upd(e, [], rest, fn))
    if not rest:
        return fn(col)
    name, s2 = rest[0]
    return col.withField(name, _upd(col.getField(name), s2, rest[1:], fn))


def record_path_remove(df: DataFrame, path: str) -> DataFrame:
    """RemoveRecordField analog: drop the field at ``path``.  Top-level
    paths drop the column; nested paths use ``dropFields``; ``[*]`` maps
    the removal over array elements."""
    sc = _Scanner(path)
    steps = _parse_steps(sc)
    if sc.i < len(sc.s):
        raise sc.err("trailing input after remove path")
    if len(steps) == 1 and not steps[0][1]:
        return df.drop(steps[0][0])
    name, sels = steps[0]
    return df.withColumn(name, _remove(F.col(name), sels, steps[1:]))


def _remove(col: Column, sels: list, rest: list) -> Column:
    if sels:
        if sels[0] != ("star",) or len(sels) > 1:
            raise RecordPathError("remove paths support only the [*] selector")
        return F.transform(col, lambda e: _remove(e, [], rest))
    if len(rest) == 1 and not rest[0][1]:
        return col.dropFields(rest[0][0])
    name, s2 = rest[0]
    return col.withField(name, _remove(col.getField(name), s2, rest[1:]))
