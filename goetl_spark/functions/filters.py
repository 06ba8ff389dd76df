"""Filter predicates as Column factories.

Reference surface: ``filter/filters.go`` (SURVEY.md §2.3). Every predicate
returns a :class:`pyspark.sql.Column` so it can be pushed down by Catalyst
(into parquet scans / JDBC) — the reference evaluates Go closures per
record and can push nothing.

Deviations (documented per SURVEY §2.3 guidance):

- ``filter.GreaterThan/LessThan`` coerce non-numeric values to 0
  (filter/filters.go:249-264) — we do NOT replicate that quirk; Spark's
  typed comparison (NULL-safe exclusion) is used instead.
- ``filter.MatchesRegex`` is Go RE2; ``rlike`` is Java regex. The corpus
  of patterns used in tests sticks to the common subset.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def not_null(col: str | Column) -> Column:
    """Exclude missing, NULL, **and empty-string** values.

    Reference: filter.NotNull drops ``""`` too (filter/filters.go:38-52).
    """
    c = _c(col)
    return c.isNotNull() & (c.cast("string") != F.lit(""))


def equals(col: str | Column, value) -> Column:
    """Equality; NULL (missing field) rows are excluded, matching the
    reference's missing-field→exclude rule (filter/filters.go:55-63)."""
    return _c(col) == F.lit(value)


def contains(col: str | Column, sub: str) -> Column:
    """Substring match on strings (filter/filters.go:66-78)."""
    return _c(col).contains(sub)


def starts_with(col: str | Column, prefix: str) -> Column:
    """Prefix match (filter/filters.go:81-92)."""
    return _c(col).startswith(prefix)


def ends_with(col: str | Column, suffix: str) -> Column:
    """Suffix match (filter/filters.go:95-105)."""
    return _c(col).endswith(suffix)


def matches_regex(col: str | Column, pattern: str) -> Column:
    """Regex match (filter/filters.go:108-120). Java dialect, not RE2."""
    return _c(col).rlike(pattern)


def greater_than(col: str | Column, x) -> Column:
    """Numeric > (filter/filters.go:123-138). Typed compare; no coerce-to-0."""
    return _c(col) > F.lit(x)


def less_than(col: str | Column, x) -> Column:
    """Numeric < (filter/filters.go:141-155)."""
    return _c(col) < F.lit(x)


def between(col: str | Column, lo, hi) -> Column:
    """Inclusive range (filter/filters.go:158-172)."""
    return _c(col).between(lo, hi)


def is_in(col: str | Column, values: Sequence) -> Column:
    """Set membership (filter/filters.go:175-189)."""
    return _c(col).isin(list(values))


def all_of(*preds: Column) -> Column:
    """AND combinator, short-circuit (filter.And, filter/filters.go:192-205)."""
    return reduce(lambda a, b: a & b, preds)


def any_of(*preds: Column) -> Column:
    """OR combinator (filter.Or, filter/filters.go:208-221)."""
    return reduce(lambda a, b: a | b, preds)


def not_(pred: Column) -> Column:
    """NOT combinator (filter.Not, filter/filters.go:224-232)."""
    return ~pred


def custom(fn: Callable, *cols: str | Column) -> Column:
    """Arbitrary Python predicate → boolean UDF over the given columns.

    Reference: filter.Custom (filter/filters.go:236-246). This is the slow
    path (row-at-a-time Python); prefer the Column predicates above which
    stay JVM-side and push down into the scan.
    """
    from pyspark.sql.types import BooleanType

    udf = F.udf(fn, BooleanType())
    return udf(*[_c(c) for c in cols])
