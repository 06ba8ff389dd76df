"""Transform/filter parity tests (SURVEY §2.3 semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from goetl_spark.functions import (
    transforms as T,
)
from goetl_spark.functions import filters as flt


def test_select_drops_missing_silently(spark):
    df = spark.createDataFrame([Row(a=1, b=2)])
    out = T.select(df, ["a", "nope"])
    assert out.columns == ["a"]  # transform.Select silently drops missing


def test_select_strict_raises(spark):
    df = spark.createDataFrame([Row(a=1)])
    with pytest.raises(Exception):
        T.select(df, ["a", "nope"], strict=True).collect()


def test_rename(spark):
    df = spark.createDataFrame([Row(a=1, b=2)])
    out = T.rename(df, {"a": "x"})
    assert out.columns == ["x", "b"]


def test_add_remove_field(spark):
    df = spark.createDataFrame([Row(a=1, b=2)])
    out = T.add_field(df, "c", F.col("a") + F.col("b"))
    assert out.collect()[0].c == 3
    out2 = T.remove_fields(out, "b", "missing")
    assert out2.columns == ["a", "c"]


def test_convert_type_trims_before_numeric_parse(spark):
    # goetl trims whitespace before numeric parse (transforms.go:268,280)
    df = spark.createDataFrame([Row(v=" 42 ")])
    out = T.convert_type(df, "v", "int")
    assert out.collect()[0].v == 42


def test_convert_type_fail_fast_vs_null(spark):
    df = spark.createDataFrame([Row(v="abc")])
    with pytest.raises(Exception):
        T.convert_type(df, "v", "int", on_error="fail").collect()
    assert T.convert_type(df, "v", "int", on_error="null").collect()[0].v is None


def test_string_transforms(spark):
    df = spark.createDataFrame([Row(s="  Hi There  ")])
    assert T.trim_space(df, "s").collect()[0].s == "Hi There"
    assert T.to_upper(df, "s").collect()[0].s == "  HI THERE  "
    assert T.to_lower(df, "s").collect()[0].s == "  hi there  "


def test_go_layout_to_java():
    assert T.go_layout_to_java("2006-01-02 15:04:05") == "yyyy-MM-dd HH:mm:ss"
    assert T.go_layout_to_java("02/01/2006") == "dd/MM/yyyy"
    assert T.go_layout_to_java("Jan 2, 2006") == "MMM d, yyyy"


def test_parse_time_go_layout(spark):
    df = spark.createDataFrame([Row(d="2024-03-05 10:30:00")])
    out = T.parse_time(df, "d", "2006-01-02 15:04:05").collect()[0].d
    assert (out.year, out.month, out.day, out.hour, out.minute) == (2024, 3, 5, 10, 30)


def test_not_null_excludes_empty_string(spark):
    # filter.NotNull drops missing, nil AND "" (filter/filters.go:38-52)
    df = spark.createDataFrame(
        [Row(v="x"), Row(v=""), Row(v=None)], "v string"
    )
    assert df.filter(flt.not_null("v")).count() == 1


def test_filter_null_excluded_from_comparisons(spark):
    # missing field → exclude (filter/filters.go:55-63); NULL compare is
    # never true in SQL, same net behavior
    df = spark.createDataFrame([Row(v=1), Row(v=None)], "v int")
    assert df.filter(flt.equals("v", 1)).count() == 1
    assert df.filter(flt.greater_than("v", 0)).count() == 1


def test_combinators(spark):
    df = spark.createDataFrame([Row(a=1, s="abc"), Row(a=9, s="xyz")])
    pred = flt.all_of(
        flt.between("a", 0, 5),
        flt.any_of(flt.starts_with("s", "a"), flt.ends_with("s", "q")),
        flt.not_(flt.equals("s", "zzz")),
    )
    rows = df.filter(pred).collect()
    assert len(rows) == 1 and rows[0].a == 1


def test_custom_udf_filter(spark):
    df = spark.createDataFrame([Row(a=3), Row(a=4)])
    assert df.filter(flt.custom(lambda a: a % 2 == 0, "a")).collect()[0].a == 4


def test_winsorize_methods_and_thresholds(spark):
    from goetl_spark.functions.transforms import winsorize, winsorize_thresholds

    df = spark.createDataFrame([Row(v=float(i)) for i in range(1, 101)])
    lo, hi = winsorize_thresholds(df, "v", 0.10, 0.90)
    # exact interpolated percentile on 1..100
    assert lo == pytest.approx(10.9) and hi == pytest.approx(90.1)
    # thresholds= path runs no agg and clips identically to the default
    a = winsorize(df, "v", 0.10, 0.90, out_col="w").collect()
    b = winsorize(df, "v", 0.10, 0.90, out_col="w",
                  thresholds=(lo, hi)).collect()
    assert sorted(r.w for r in a) == sorted(r.w for r in b)
    assert min(r.w for r in a) == pytest.approx(10.9)
    assert max(r.w for r in a) == pytest.approx(90.1)
    # scale methods land within a loose band of the exact thresholds
    for method in ("approx", "tdigest"):
        mlo, mhi = winsorize_thresholds(df, "v", 0.10, 0.90, method=method)
        assert 5.0 <= mlo <= 15.0 and 85.0 <= mhi <= 95.0


def test_winsorize_rejects_bad_bounds(spark):
    from goetl_spark.functions.transforms import winsorize

    df = spark.createDataFrame([Row(v=1.0)])
    with pytest.raises(ValueError):
        winsorize(df, "v", 0.9, 0.1)
    with pytest.raises(ValueError):
        winsorize(df, "v", -0.1, 0.5)
