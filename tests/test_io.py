"""Source/sink tests: file round-trips, HTTP fetcher, JDBC option/upsert."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from goetl_spark.sources.files import read_csv, read_jsonl, read_parquet
from goetl_spark.sources.http import (
    HTTPReader,
    HTTPResponse,
    PaginationMode,
    _parse_link_next,
)
from goetl_spark.sources.jdbc import jdbc_options
from goetl_spark.sources.mongo import mongo_options
from goetl_spark.sinks.files import write_csv, write_jsonl, write_parquet
from goetl_spark.stats import IOStats
from goetl_spark.sinks.jdbc import JdbcUpsertWriter, build_upsert_sql


def _df(spark):
    return spark.createDataFrame(
        [Row(id=1, name="a, b", score=1.5), Row(id=2, name=None, score=None)],
        "id int, name string, score double",
    )


# --- file round-trips (reference writer-test families, SURVEY §5.1) ---------

def test_csv_roundtrip_nulls_and_escaping(spark, tmp_path):
    p = str(tmp_path / "csv")
    write_csv(_df(spark), p, partitions=1)
    back = read_csv(spark, p, schema="id int, name string, score double")
    rows = {r.id: r for r in back.collect()}
    assert rows[1].name == "a, b"          # comma survives quoting
    assert rows[2].name is None            # NULL → "" → NULL
    assert rows[2].score is None


def test_csv_options(spark, tmp_path):
    p = str(tmp_path / "csv2")
    write_csv(_df(spark), p, delimiter=";", header=False, partitions=1)
    back = read_csv(spark, p, delimiter=";", header=False,
                    schema="id int, name string, score double")
    assert back.count() == 2
    # header=False synthesizes col_0..col_N names when no schema (csv.go:171-176)
    anon = read_csv(spark, p, delimiter=";", header=False, infer_schema=False)
    assert anon.columns == ["col_0", "col_1", "col_2"]


def test_jsonl_roundtrip(spark, tmp_path):
    p = str(tmp_path / "jsonl")
    write_jsonl(_df(spark), p, partitions=1)
    back = read_jsonl(spark, p, schema="id int, name string, score double")
    assert back.filter(F.col("id") == 1).collect()[0].score == 1.5
    # files really are line-delimited JSON
    part = [f for f in os.listdir(p) if f.startswith("part-")][0]
    first = open(os.path.join(p, part)).readline()
    assert json.loads(first)["id"] in (1, 2)


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    p = str(tmp_path / "pq")
    df = spark.createDataFrame(
        [Row(k="x", v=1), Row(k="y", v=2)], "k string, v int")
    write_parquet(df, p, partition_by=["k"])
    assert sorted(d for d in os.listdir(p) if d.startswith("k=")) == ["k=x", "k=y"]
    back = read_parquet(spark, p, columns=["v"])
    assert back.columns == ["v"] and back.count() == 2


# --- per-pass I/O stats (readers/csv.go:54-60, writers/json.go:169-172) -----

def test_read_stats_one_pass_no_extra_jobs(spark, tmp_path):
    p = str(tmp_path / "stats_src")
    _df(spark).write.parquet(p)
    stats = IOStats()
    df = read_parquet(spark, p, stats=stats)
    assert df.count() == 2                       # the ONE materializing pass
    jobs_before = len(spark.sparkContext.statusTracker().getJobIdsForGroup(None) or [])
    assert stats.record_count == 2
    assert stats.null_counts == {"id": 0, "name": 1, "score": 1}
    jobs_after = len(spark.sparkContext.statusTracker().getJobIdsForGroup(None) or [])
    assert jobs_after == jobs_before, "reading stats must not launch a job"


def test_write_stats_filled_by_write_pass(spark, tmp_path):
    p = str(tmp_path / "stats_out")
    stats = IOStats()
    write_parquet(_df(spark), p, stats=stats)    # write IS the action
    assert stats.record_count == 2
    assert stats.null_counts["name"] == 1 and stats.null_counts["id"] == 0


def test_stats_single_use(spark):
    stats = IOStats()
    stats.attach(_df(spark))
    with pytest.raises(ValueError, match="single-use"):
        stats.attach(_df(spark))


def test_csv_inference_is_column_level_deviation(spark, tmp_path):
    """Documented deviation from readers/csv.go:204-218: the reference
    types each VALUE independently (row 1 gets int 1, row 2 gets string
    "x" in the same column); Spark's inferSchema types the COLUMN, so a
    mixed column uniformly widens to string. This test pins the Spark
    behavior the docstring promises."""
    src = tmp_path / "mixed.csv"
    src.write_text("a,b\n1,10\nx,20\n")
    df = read_csv(spark, str(src))
    assert dict(df.dtypes) == {"a": "string", "b": "int"}
    assert {r.a for r in df.collect()} == {"1", "x"}  # int value widened too


# --- HTTP fetcher (readers/http.go port) ------------------------------------

def _fake_server(pages, fail_first=0, headers_seen=None):
    calls = {"n": 0}

    def fetch(url, headers, timeout):
        if headers_seen is not None:
            headers_seen.append(dict(headers))
        calls["n"] += 1
        if calls["n"] <= fail_first:
            return HTTPResponse(503, b"busy")
        # route by offset/page/cursor param; default first page
        import urllib.parse
        q = urllib.parse.parse_qs(urllib.parse.urlparse(url).query)
        if "offset" in q:
            idx = int(q["offset"][0]) // int(q.get("limit", ["2"])[0])
        elif "page" in q:
            idx = int(q["page"][0]) - 1
        elif "cursor" in q:
            idx = int(q["cursor"][0])
        else:
            idx = 0
        body = pages[idx] if idx < len(pages) else {"data": []}
        return HTTPResponse(200, json.dumps(body).encode())

    return fetch, calls


def test_http_offset_pagination_and_data_path(spark):
    pages = [
        {"data": [{"id": 1}, {"id": 2}]},
        {"data": [{"id": 3}]},   # short page → stop
    ]
    fetch, calls = _fake_server(pages)
    r = HTTPReader("http://api.test/items", pagination=PaginationMode.OFFSET,
                   page_size=2, data_path="data", fetch_fn=fetch)
    recs = r.fetch_records()
    assert [x["id"] for x in recs] == [1, 2, 3]
    df = r.to_dataframe(spark, schema="id int")
    assert df.count() == 3


def test_http_cursor_pagination(spark):
    pages = [
        {"data": [{"id": 1}], "next_cursor": "1"},
        {"data": [{"id": 2}], "next_cursor": "2"},
        {"data": [{"id": 3}]},  # no cursor → stop
    ]
    fetch, _ = _fake_server(pages)
    r = HTTPReader("http://api.test/items", pagination=PaginationMode.CURSOR,
                   data_path="data", fetch_fn=fetch)
    assert [x["id"] for x in r.fetch_records()] == [1, 2, 3]


def test_http_retry_on_503_then_success():
    pages = [{"data": [{"id": 1}]}]
    fetch, calls = _fake_server(pages, fail_first=2)
    r = HTTPReader("http://api.test/items", data_path="data",
                   backoff_seconds=0.01, fetch_fn=fetch)
    assert r.fetch_records() == [{"id": 1}]
    assert calls["n"] == 3  # 2 failures + 1 success


def test_http_retry_exhausted():
    fetch, _ = _fake_server([], fail_first=99)
    r = HTTPReader("http://api.test/items", max_retries=2,
                   backoff_seconds=0.01, fetch_fn=fetch)
    with pytest.raises(IOError, match="HTTP 503"):
        r.fetch_records()


def test_http_auth_headers():
    seen: list[dict] = []
    fetch, _ = _fake_server([{"data": []}], headers_seen=seen)
    HTTPReader("http://x", bearer_token="tok", data_path="data",
               fetch_fn=fetch).fetch_records()
    assert seen[0]["Authorization"] == "Bearer tok"
    seen.clear()
    HTTPReader("http://x", basic_auth=("u", "p"), data_path="data",
               fetch_fn=fetch).fetch_records()
    assert seen[0]["Authorization"].startswith("Basic ")
    seen.clear()
    HTTPReader("http://x", api_key=("X-Api-Key", "k"), data_path="data",
               fetch_fn=fetch).fetch_records()
    assert seen[0]["X-Api-Key"] == "k"


def test_link_header_parse():
    assert _parse_link_next(
        '<http://api/x?page=2>; rel="next", <http://api/x?page=9>; rel="last"'
    ) == "http://api/x?page=2"
    assert _parse_link_next('<http://api/x?page=9>; rel="last"') is None


# --- JDBC -------------------------------------------------------------------

def test_jdbc_options_validation():
    with pytest.raises(ValueError, match="exactly one"):
        jdbc_options(url="jdbc:postgresql://h/db")
    opts = jdbc_options(url="jdbc:postgresql://h/db", table="t",
                        partition_column="id", lower_bound=0,
                        upper_bound=100, num_partitions=8, fetchsize=500)
    assert opts["partitionColumn"] == "id" and opts["fetchsize"] == "500"
    with pytest.raises(ValueError, match="require table"):
        jdbc_options(url="u", query="SELECT 1", partition_column="id",
                     lower_bound=0, upper_bound=1, num_partitions=2)


def test_upsert_sql():
    sql = build_upsert_sql("t", ["id", "a", "b"], ["id"])
    assert sql == ("INSERT INTO t (id, a, b) VALUES (%s, %s, %s) "
                   "ON CONFLICT (id) DO UPDATE SET a = EXCLUDED.a, b = EXCLUDED.b")
    sql2 = build_upsert_sql("t", ["id", "a"], ["id"], update_on_conflict=False)
    assert sql2.endswith("ON CONFLICT (id) DO NOTHING")
    with pytest.raises(ValueError, match="invalid SQL identifier"):
        build_upsert_sql("t; DROP TABLE x", ["id"], ["id"])


def test_upsert_sql_all_columns_are_keys():
    # empty non-key update list must not emit `DO UPDATE SET ` (ADVICE r01)
    sql = build_upsert_sql("t", ["id", "k2"], ["id", "k2"])
    assert sql.endswith("ON CONFLICT (id, k2) DO NOTHING")


def test_http_page_pagination_sends_limit_and_stops_short():
    urls: list[str] = []
    pages = [
        {"data": [{"id": 1}, {"id": 2}]},
        {"data": [{"id": 3}]},   # short page → stop (http.go:776)
        {"data": [{"id": 99}]},  # must never be fetched
    ]

    def fetch(url, headers, timeout):
        urls.append(url)
        import urllib.parse
        q = urllib.parse.parse_qs(urllib.parse.urlparse(url).query)
        idx = int(q["page"][0]) - 1
        return HTTPResponse(200, json.dumps(pages[idx]).encode())

    r = HTTPReader("http://api.test/items", pagination=PaginationMode.PAGE,
                   page_size=2, data_path="data", fetch_fn=fetch)
    recs = r.fetch_records()
    assert [x["id"] for x in recs] == [1, 2, 3]
    assert len(urls) == 2, "short page must end PAGE-mode pagination"
    assert all("limit=2" in u for u in urls), "PAGE mode must send page size"


class _FileConn:
    """Fake DBAPI connection recording committed batches to a file —
    executor processes share only the filesystem, so that's where the
    evidence goes."""

    def __init__(self, path):
        self.path = path
        self.pending = []

    def cursor(self):
        return self

    def executemany(self, sql, rows):
        self.pending.append((sql, rows))

    def execute(self, sql, *a):
        self.pending.append((sql, None))

    def commit(self):
        import json as j
        import os
        import uuid
        if self.pending:
            with open(os.path.join(self.path, uuid.uuid4().hex), "w") as f:
                f.write(j.dumps([(s, r) for s, r in self.pending]))
        self.pending = []

    def rollback(self):
        self.pending = []

    def close(self):
        pass


def test_jdbc_upsert_foreach_partition(spark, tmp_path):
    out = str(tmp_path / "commits")
    os.makedirs(out)
    df = spark.createDataFrame(
        [Row(id=1, v="a"), Row(id=2, v="b"), Row(id=3, v="c")]
    ).repartition(2)
    w = JdbcUpsertWriter(
        table="target", key_columns=["id"],
        connect_fn=lambda: _FileConn(out), batch_size=2,
    )
    w.write(df)
    committed = []
    for fn in os.listdir(out):
        committed.extend(json.load(open(os.path.join(out, fn))))
    rows = [tuple(r) for _, batch in committed if batch for r in batch]
    assert sorted(rows) == [(1, "a"), (2, "b"), (3, "c")]
    assert all("ON CONFLICT (id) DO UPDATE" in s for s, b in committed if b)


class _FlakyConn(_FileConn):
    """Fake DBAPI connection where any batch containing a poison row
    fails at commit — simulates per-batch constraint violations."""

    def executemany(self, sql, rows):
        if any(r[1] == "poison" for r in rows):
            raise RuntimeError("constraint violation")
        super().executemany(sql, rows)


def test_jdbc_upsert_error_budget_tolerates_within_max(spark, tmp_path):
    out = str(tmp_path / "commits_ok")
    os.makedirs(out)
    df = spark.createDataFrame(
        [Row(id=i, v="poison" if i in (2, 5) else f"v{i}") for i in range(8)]
    ).repartition(4)
    w = JdbcUpsertWriter(
        table="target", key_columns=["id"],
        connect_fn=lambda: _FlakyConn(out), batch_size=1, max_errors=5,
    )
    w.write(df)                      # 2 failed batches < budget of 5
    assert w.error_count == 2
    committed = []
    for fn in os.listdir(out):
        committed.extend(json.load(open(os.path.join(out, fn))))
    rows = sorted(r[0] for _, batch in committed if batch for r in batch)
    assert rows == [0, 1, 3, 4, 6, 7]   # good rows landed, poison skipped


def test_jdbc_upsert_error_budget_latches_past_max(spark, tmp_path):
    out = str(tmp_path / "commits_bad")
    os.makedirs(out)
    df = spark.createDataFrame(
        [Row(id=i, v="poison" if i % 2 else f"v{i}") for i in range(6)]
    ).repartition(2)
    w = JdbcUpsertWriter(
        table="target", key_columns=["id"],
        connect_fn=lambda: _FlakyConn(out), batch_size=1, max_errors=1,
    )
    with pytest.raises(Exception):
        w.write(df)                  # 3 failed batches > budget of 1
    # error-state latch (postgresql.go:275-277): writer stays failed
    with pytest.raises(RuntimeError, match="latched"):
        w.write(df)


def test_mongo_options_find_pushdown():
    opts = mongo_options("mongodb://h", "db", "coll", mode="find",
                         filter={"status": "active"}, sort={"ts": -1},
                         limit=10, projection=["a", "b"])
    pipe = json.loads(opts["aggregation.pipeline"])
    assert pipe == [{"$match": {"status": "active"}}, {"$sort": {"ts": -1}},
                    {"$limit": 10}, {"$project": {"a": 1, "b": 1}}]
    with pytest.raises(ValueError, match="unknown mongo mode"):
        mongo_options("u", "d", "c", mode="bogus")


def test_bucketed_join_no_shuffle(spark, tmp_path):
    from goetl_spark.sinks.files import write_bucketed_table

    left = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS a")
    right = spark.range(0, 1000).selectExpr("id AS k", "id * 3 AS b")
    write_bucketed_table(left, "t_buck_l", ["k"], num_buckets=4,
                         sort_cols=["k"], path=str(tmp_path / "l"))
    write_bucketed_table(right, "t_buck_r", ["k"], num_buckets=4,
                         sort_cols=["k"], path=str(tmp_path / "r"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("t_buck_l").join(spark.table("t_buck_r"), "k")
        assert j.count() == 1000
        plan = j._jdf.queryExecution().executedPlan().toString()
        # both sides pre-clustered on k: no shuffle Exchange in the plan
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_buck_l")
        spark.sql("DROP TABLE IF EXISTS t_buck_r")


def test_csv_no_header_synthesizes_col_names(spark, tmp_path):
    from goetl_spark.sources.files import read_csv

    p = tmp_path / "nh.csv"
    p.write_text("1,a\n2,b\n")
    df = read_csv(spark, str(p), header=False)
    assert df.columns == ["col_0", "col_1"]  # csv.go:171-176 naming
    assert df.count() == 2


def test_kafka_options():
    from goetl_spark.sources.kafka import kafka_options

    opts = kafka_options("b1:9092,b2:9092", topics=["a", "b"],
                         starting_offsets={"a": {"0": 100}},
                         max_offsets_per_trigger=5000, min_partitions=64)
    assert opts["subscribe"] == "a,b"
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert '"a"' in opts["startingOffsets"]
    assert opts["maxOffsetsPerTrigger"] == "5000"
    assert opts["minPartitions"] == "64"

    pat = kafka_options("b:9092", pattern="events-.*")
    assert pat["subscribePattern"] == "events-.*"

    import pytest
    with pytest.raises(ValueError):
        kafka_options("b:9092")                      # neither
    with pytest.raises(ValueError):
        kafka_options("b:9092", topics="t", pattern="x")  # both


def test_write_clustered_files_have_disjoint_ranges(spark, tmp_path):
    from goetl_spark.sinks.files import write_clustered

    p = str(tmp_path / "clustered")
    df = spark.range(0, 10_000).selectExpr("id AS k", "id % 97 AS v")
    write_clustered(df, p, ["k"], num_files=4)
    import pyarrow.parquet as pq
    ranges = []
    for f in os.listdir(p):
        if f.startswith("part-") and f.endswith(".parquet"):
            md = pq.ParquetFile(os.path.join(p, f)).metadata
            stats = [md.row_group(i).column(0).statistics
                     for i in range(md.num_row_groups)]
            ranges.append((min(s.min for s in stats), max(s.max for s in stats)))
    ranges.sort()
    assert len(ranges) == 4
    # file key ranges must not overlap → a selective scan skips 3 of 4
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
    assert spark.read.parquet(p).count() == 10_000


def test_read_jdbc_predicates_forwarding():
    from goetl_spark.sources.jdbc import read_jdbc_predicates

    class _Reader:
        def jdbc(self, url, table, predicates, properties):
            return {"url": url, "table": table,
                    "predicates": predicates, "properties": properties}

    class _Spark:
        read = _Reader()

    got = read_jdbc_predicates(
        _Spark(), "jdbc:postgresql://h/db", "t",
        predicates=["id % 2 = 0", "id % 2 = 1"],
        user="u", fetchsize=500)
    assert got["predicates"] == ["id % 2 = 0", "id % 2 = 1"]
    assert got["properties"]["fetchsize"] == "500"
    assert got["properties"]["user"] == "u"


def test_zorder_files_cover_small_rectangles(spark, tmp_path):
    """Z-ordered files must each cover a narrow min/max range in BOTH
    clustered dimensions (footer-level skipping on either predicate);
    a hash-partitioned write covers ~the full range in every file."""
    import os

    import pyarrow.parquet as pq

    from goetl_spark.sinks.files import write_zordered

    n = 1 << 14
    df = spark.range(0, n).selectExpr(
        "CAST(pmod(hash(id), 4096) AS DOUBLE) AS x",
        "CAST(pmod(hash(id + 99), 4096) AS DOUBLE) AS y",
        "id AS payload")

    def coverage(path):
        spans = {"x": [], "y": []}
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            lo, hi = {}, {}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name in spans and col.statistics is not None:
                        st = col.statistics
                        lo[name] = min(lo.get(name, st.min), st.min)
                        hi[name] = max(hi.get(name, st.max), st.max)
            for name in spans:
                if name in lo:
                    spans[name].append((hi[name] - lo[name]) / 4096.0)
        return {k: sum(v) / len(v) for k, v in spans.items()}

    plain = str(tmp_path / "plain")
    df.repartition(8).write.parquet(plain)
    zord = str(tmp_path / "zord")
    write_zordered(df, zord, ["x", "y"], num_files=8, bits=10)

    cp, cz = coverage(plain), coverage(zord)
    # hash layout: every file spans ~the whole range of both dims
    assert cp["x"] > 0.8 and cp["y"] > 0.8
    # z-order: 8 ranges split the top 3 interleaved bits -> each file
    # covers ~1/4 of one dim and ~1/2 of the other (plus edge slop)
    assert cz["x"] < 0.7 and cz["y"] < 0.7
    assert (cz["x"] + cz["y"]) / 2 < 0.55

    back = spark.read.parquet(zord)
    assert back.count() == n
    assert back.agg(F.sum("payload")).collect()[0][0] == n * (n - 1) // 2


def test_zorder_null_and_constant_columns(spark, tmp_path):
    from goetl_spark.sinks.files import write_zordered

    df = spark.createDataFrame(
        [(None, 1.0, 1), (2.0, 1.0, 2), (3.0, 1.0, 3)],
        "x double, y double, id int")
    p = str(tmp_path / "zn")
    write_zordered(df, p, ["x", "y"], num_files=2, bits=4)
    assert spark.read.parquet(p).count() == 3


def test_orc_roundtrip_with_stats(spark, tmp_path):
    from goetl_spark.sinks.files import write_orc
    from goetl_spark.sources.files import read_orc
    from goetl_spark.stats import IOStats

    df = spark.createDataFrame(
        [(1, "a", None), (2, None, 3.5), (3, "c", 1.25)],
        "id long, s string, v double")
    wstats = IOStats()
    write_orc(df, str(tmp_path / "t.orc"), partition_by=["id"],
              stats=wstats)
    assert wstats.record_count == 3
    assert wstats.null_counts["s"] == 1 and wstats.null_counts["v"] == 1

    rstats = IOStats()
    back = read_orc(spark, str(tmp_path / "t.orc"), columns=["id", "v"],
                    stats=rstats)
    rows = {r.id: r.v for r in back.collect()}
    assert rows == {1: None, 2: 3.5, 3: 1.25}
    assert back.columns == ["id", "v"]          # projection pruned
    assert rstats.record_count == 3
