"""Slowly-changing-dimension operators (types 1, 2, 3).

Reference: ``dag/tasks/scd.go`` (SURVEY.md §2.7). The reference indexes the
current dimension rows in memory and walks source records one at a time;
here each SCD type is a join + column algebra + union — all lazy, one
shuffle on the business key (or zero if the dimension is broadcast-able).

Date convention parity: effective dates are ``yyyy-MM-dd`` strings with the
open-ended sentinel ``9999-12-31`` (scd.go:116, 131-148). Pass
``effective_date=`` for determinism; defaults to today.

Scale note: SCD2/3 at 100 TB is the canonical Delta/Iceberg MERGE use case;
the pure-DataFrame recipes here produce the full new dimension content,
which a table-format MERGE would apply incrementally. The join key is the
business key — bucket the dimension by it on write to make every daily run
shuffle-free on the dimension side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OPEN_END_DATE = "9999-12-31"


def scd_type1(source: DataFrame, dimension: DataFrame) -> DataFrame:
    """SCD1 = overwrite. The reference returns source records unchanged
    (dag/tasks/scd.go:182-186); the caller replaces the dimension."""
    return source


def scd_type2(
    source: DataFrame,
    dimension: DataFrame,
    key_fields: Sequence[str],
    tracked_fields: Sequence[str],
    effective_from_field: str = "effective_from",
    effective_to_field: str = "effective_to",
    current_flag_field: str = "is_current",
    effective_date: str | None = None,
) -> DataFrame:
    """Versioned dimension update (dag/tasks/scd.go:97-161).

    Returns the complete new dimension content:
    - history rows (``is_current=false``) pass through untouched;
    - current rows whose tracked fields changed are CLOSED
      (``effective_to=effective_date``, flag→false);
    - changed + brand-new business keys are INSERTED as current rows
      (``effective_from=effective_date``, ``effective_to=9999-12-31``);
    - unchanged current rows pass through.

    Source is expected to carry key+tracked (+any payload) columns;
    dimension carries the same plus the three SCD columns.
    """
    keys = list(key_fields)
    eff = effective_date or None
    eff_col = F.lit(eff) if eff else F.date_format(F.current_date(), "yyyy-MM-dd")

    history = dimension.filter(~F.col(current_flag_field))
    current = dimension.filter(F.col(current_flag_field))

    src = source.alias("src")
    cur = current.alias("cur")

    cond = None
    for k in keys:
        c = F.col(f"src.{k}") == F.col(f"cur.{k}")
        cond = c if cond is None else (cond & c)

    joined = src.join(cur, on=cond, how="full_outer")
    in_src = F.col(f"src.{keys[0]}").isNotNull()
    in_cur = F.col(f"cur.{keys[0]}").isNotNull()

    changed = F.lit(False)
    for t in tracked_fields:
        changed = changed | ~F.col(f"src.{t}").eqNullSafe(F.col(f"cur.{t}"))

    dim_cols = dimension.columns
    payload_cols = [c for c in dim_cols if c not in
                    (effective_from_field, effective_to_field, current_flag_field)]

    # 1. existing current rows: closed if changed, untouched otherwise;
    #    rows absent from source also pass through (reference keeps them,
    #    scd.go:150-157 only ever adds).
    kept = joined.filter(in_cur).select(
        *[F.col(f"cur.{c}").alias(c) for c in payload_cols],
        F.col(f"cur.{effective_from_field}").alias(effective_from_field),
        F.when(in_src & changed, eff_col)
         .otherwise(F.col(f"cur.{effective_to_field}"))
         .alias(effective_to_field),
        F.when(in_src & changed, F.lit(False))
         .otherwise(F.col(f"cur.{current_flag_field}"))
         .alias(current_flag_field),
    )

    # 2. new current rows: source rows that are brand-new keys or changed.
    inserts = joined.filter(in_src & (~in_cur | changed)).select(
        *[
            (F.col(f"src.{c}") if c in source.columns else F.lit(None))
            .alias(c)
            for c in payload_cols
        ],
        eff_col.alias(effective_from_field),
        F.lit(OPEN_END_DATE).alias(effective_to_field),
        F.lit(True).alias(current_flag_field),
    )

    return history.select(*kept.columns).unionByName(kept).unionByName(inserts)


def scd_type3(
    source: DataFrame,
    dimension: DataFrame,
    key_fields: Sequence[str],
    tracked_fields: Sequence[str],
    version_field: str = "version",
    previous_prefix: str = "previous_",
) -> DataFrame:
    """Previous-value columns (dag/tasks/scd.go:189-238).

    For each source row: left-join the dimension on the business key; for
    each tracked field emit ``previous_<field>`` = the dimension's old
    value (NULL for brand-new keys); ``version`` = dimension version + 1,
    or 1 for new keys (scd.go:219-226).
    """
    keys = list(key_fields)
    src = source.alias("src")
    dim = dimension.alias("dim")

    cond = None
    for k in keys:
        c = F.col(f"src.{k}") == F.col(f"dim.{k}")
        cond = c if cond is None else (cond & c)

    joined = src.join(dim, on=cond, how="left")

    out_cols = [F.col(f"src.{c}").alias(c) for c in source.columns]
    for t in tracked_fields:
        out_cols.append(F.col(f"dim.{t}").alias(f"{previous_prefix}{t}"))
    ver_src = (
        F.col(f"dim.{version_field}") if version_field in dimension.columns
        else F.lit(None).cast("bigint")
    )
    out_cols.append(
        F.coalesce(ver_src + F.lit(1), F.lit(1)).alias(version_field)
    )
    return joined.select(*out_cols)
