"""Method-name → Column-function dispatch.

The reference broadcasts *arbitrary* Python method calls element-wise
(``call`` at ``src/dask_obj/core.py:74-76``; call capture in ``Expr`` at
``src/dask_obj/expr.py:301-302``).  A naive rebuild would run those as
row-at-a-time Python UDFs — the slow path.  This table maps the common
str/dict/list/float method names onto ``pyspark.sql.functions`` so the
call stays JVM-side and codegen'd; only unknown methods fall back to a
(vectorized) UDF.

Keep entries *semantics-faithful to the Python method*, not merely
name-alike: e.g. ``str.find`` returns -1 when missing while Spark
``instr`` returns 0, so we shift; ``str.count`` counts substring
occurrences, mapped via split-length arithmetic.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def _strip(col: Column, chars: str | None = None) -> Column:
    return F.trim(col) if chars is None else F.btrim(col, F.lit(chars))


def _lstrip(col: Column, chars: str | None = None) -> Column:
    return F.ltrim(col) if chars is None else F.ltrim(col, F.lit(chars))


def _rstrip(col: Column, chars: str | None = None) -> Column:
    return F.rtrim(col) if chars is None else F.rtrim(col, F.lit(chars))


def _split(col: Column, sep: str | None = None, maxsplit: int = -1) -> Column:
    # Python str.split(None) splits on whitespace runs; Spark split takes a
    # Java regex.  Python maxsplit counts SPLITS (maxsplit=1 → up to 2
    # parts, maxsplit=0 → no split) while Spark's limit counts PARTS —
    # so limit = maxsplit + 1, not maxsplit (r13 review finding: the
    # 1:1 mapping returned ['a b c'] for 'a b c'.split(' ', 1)).
    limit = maxsplit + 1 if maxsplit >= 0 else -1
    if sep is None:
        if maxsplit >= 0:
            # CPython with a limit: skip LEADING whitespace, split at
            # whole \s+ runs until maxsplit is exhausted, then append
            # the remainder VERBATIM iff non-empty after skipping its
            # leading run — 'a b '.split(None, 1) == ['a', 'b '], so a
            # full trim here ate the trailing whitespace Python keeps
            # (r14 advice).  With ltrim, the only '' element \s+ can
            # produce is a trailing one (the trailing-run artifact,
            # exactly the case Python drops) — strip it.
            parts = F.split(F.ltrim(col), r"\s+", limit)
            return F.when(
                F.element_at(parts, -1) == "",
                F.slice(parts, 1, F.size(parts) - 1),
            ).otherwise(parts)
        # ''.split() and '   '.split() are [] in Python; Spark's
        # split('', ...) is [''] (r14 review — the same empty-input
        # divergence class as the udtf_word_explode oracle)
        return F.when(
            F.length(F.trim(col)) == 0, F.array().cast("array<string>")
        ).otherwise(F.split(F.trim(col), r"\s+", limit))
    import re

    return F.split(col, re.escape(sep), limit)


def _replace(col: Column, old: str, new: str, count: int = -1) -> Column:
    if count != -1:
        raise TypeError("replace with a count is not supported JVM-side")
    return F.replace(col, F.lit(old), F.lit(new))


def _find(col: Column, sub: str) -> Column:
    # Python returns -1 when absent and is 0-based; instr is 1-based, 0 when absent.
    return F.instr(col, sub) - 1


def _count_sub(col: Column, sub: str) -> Column:
    import re

    if sub == "":
        # Python: ''.join-points count — 'abc'.count('') == 4 == len + 1
        return F.length(col) + 1
    return F.size(F.split(col, re.escape(sub), -1)) - 1


def _islower(col: Column) -> Column:
    # Python islower(): at least one cased char AND no uppercase cased char.
    # 'abc1'.islower() is True, '123'.islower() is False (uncased-only).
    return col.rlike("[a-zA-Z]") & (col == F.lower(col))


def _isupper(col: Column) -> Column:
    return col.rlike("[a-zA-Z]") & (col == F.upper(col))


def _get(col: Column, key: Any, default: Any = None) -> Column:
    # dict.get semantics over a MapType column.
    got = F.element_at(col, F.lit(key))
    return got if default is None else F.coalesce(got, F.lit(default))


def _zfill(col: Column, width: int) -> Column:
    # Python zfill NEVER truncates ('abcdef'.zfill(3) == 'abcdef' while
    # lpad cuts to width) and pads AFTER a leading sign
    # ('-42'.zfill(6) == '-00042', not '00-42') — r14 review findings.
    signed = col.rlike(r"^[+-]")
    padded = F.when(
        signed,
        F.concat(
            F.substring(col, 1, 1),
            F.lpad(F.substring(col, 2, 2147483647), max(width - 1, 0), "0"),
        ),
    ).otherwise(F.lpad(col, width, "0"))
    return F.when(F.length(col) >= width, col).otherwise(padded)


def _capitalize(col: Column) -> Column:
    return F.concat(F.upper(F.substring(col, 1, 1)), F.lower(F.substring(col, 2, 2147483647)))


def _index_arr(col: Column, item: Any) -> Column:
    # list.index: 0-based; array_position is 1-based, 0 when absent.
    return F.array_position(col, F.lit(item)) - 1


COLUMN_METHODS: dict[str, Callable[..., Column]] = {
    # -- str methods --
    "upper": F.upper,
    "lower": F.lower,
    "strip": _strip,
    "lstrip": _lstrip,
    "rstrip": _rstrip,
    "split": _split,
    "startswith": lambda c, p: F.startswith(c, F.lit(p)),
    "endswith": lambda c, p: F.endswith(c, F.lit(p)),
    "replace": _replace,
    # NO "title" entry: Python str.title() word-starts at ANY non-cased
    # boundary ("can't".title() == "Can'T") while initcap only splits on
    # whitespace — name-alike, not semantics-faithful, so it takes the
    # documented UDF fallback instead (r14 review)
    "capitalize": _capitalize,
    "find": _find,
    "count": _count_sub,
    "zfill": _zfill,
    "isdigit": lambda c: c.rlike(r"^[0-9]+$"),
    "isalpha": lambda c: c.rlike(r"^[A-Za-z]+$"),
    "isspace": lambda c: c.rlike(r"^\s+$"),
    "islower": _islower,
    "isupper": _isupper,
    "join": lambda c, arr=None: F.array_join(arr, c) if arr is not None else F.array_join(c, ""),
    "encode": lambda c: F.encode(c, "utf-8"),
    "decode": lambda c: F.decode(c, "utf-8"),
    # -- dict methods (MapType) --
    "get": _get,
    "keys": F.map_keys,
    "values": F.map_values,
    "items": F.map_entries,
    # -- list methods (ArrayType) --
    "index": _index_arr,
    # -- numeric methods --
    # int.bit_length() = bits to represent the integer ((5).bit_length()
    # == 3, (0).bit_length() == 0); F.bit_length is the STRING/binary
    # bit count (8x bytes) — wrong object.  bin() length is exact
    # integer algebra at any magnitude (r14 review).  abs() would ANSI-
    # overflow on the type minimum (-2^63 as long, -2^31 as int), where
    # Python returns 64/32: cast to long FIRST (absorbs INT_MIN) and
    # special-case LONG_MIN, whose magnitude has no long representation
    # (r14 advice).
    "bit_length": lambda c: F.when(c == 0, F.lit(0))
    .when(c.cast("long") == F.lit(-(2**63)), F.lit(64))
    .otherwise(F.length(F.bin(F.abs(c.cast("long"))))),
    # x % 1.0 == 0.0: floor(c).cast(long) saturates at 2^63, so
    # (1e300).is_integer() came back False (Python: True); fmod keeps
    # double algebra — inf % 1 = NaN → False, matching Python (r14)
    "is_integer": lambda c: (c % F.lit(1.0)) == 0.0,
    "conjugate": lambda c: c,
    # -- datetime-ish accessors used as methods --
    "date": F.to_date,
    # datetime.isoformat() appends '.%06d' microseconds IFF nonzero —
    # a fixed seconds-only pattern silently dropped sub-second
    # precision for every µs-granular timestamp (r14 review)
    "isoformat": lambda c: F.when(
        F.unix_micros(c) % 1_000_000 == 0,
        F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss"),
    ).otherwise(F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")),
    # datetime.timestamp() returns float seconds WITH microseconds —
    # unix_timestamp truncates to whole seconds, unix_micros does not
    "timestamp": lambda c: F.unix_micros(c) / F.lit(1_000_000.0),
    "weekday": lambda c: ((F.dayofweek(c) + 5) % 7),  # Monday=0 like Python
}


def dispatch_method(name: str, col: Column, *args, **kwargs) -> Column | None:
    """Return the Column for ``elem.name(*args)`` if JVM-expressible, else None."""
    fn = COLUMN_METHODS.get(name)
    if fn is None:
        return None
    try:
        return fn(col, *args, **kwargs)
    except TypeError:
        return None
