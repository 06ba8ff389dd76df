"""URL parsing/canonicalization (operators/web.py) and Unicode
normalization (operators/text.py::normalize_unicode).

Contracts: part extraction on assorted real-world URL shapes (userinfo,
ports, fragments, bare hosts, non-URLs), tracking-param removal with
clean separator tidy-up, canonicalization idempotence, NFC/NFKC
behavior with NULL propagation, and control-char stripping.
"""

from __future__ import annotations

import unicodedata

import pytest
from pyspark.sql import functions as F

from goetl_spark.operators.text import normalize_unicode
from goetl_spark.operators.web import (
    normalize_url,
    strip_tracking_params,
    url_parts,
)

URLS = [
    "https://u:p@www.Example.COM:8443/Path/Sub?b=2&a=1#frag",
    "http://example.com",
    "http://example.com:80/x?y=1",
    "https://sub.example.org/",
    "ftp://files.example.net/pub/file.txt",
    "not a url at all",
    "//protocol-relative.example.com/x",
]


def test_url_parts_shapes(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    rows = {r["url"]: r for r in url_parts(df, "url").collect()}

    r = rows[URLS[0]]
    assert (r["scheme"], r["host"], r["port"]) == ("https", "www.Example.COM", "8443")
    assert (r["path"], r["query"], r["fragment"]) == ("/Path/Sub", "b=2&a=1", "frag")
    assert r["domain"] == "example.com"

    r = rows["http://example.com"]
    assert (r["scheme"], r["host"], r["path"], r["query"]) == \
        ("http", "example.com", "", "")
    assert rows["http://example.com:80/x?y=1"]["port"] == "80"
    assert rows["https://sub.example.org/"]["domain"] == "sub.example.org"
    assert rows["ftp://files.example.net/pub/file.txt"]["path"] == "/pub/file.txt"
    # non-URLs and protocol-relative URLs: all parts empty, never an error
    for u in ("not a url at all", "//protocol-relative.example.com/x"):
        r = rows[u]
        assert all(r[p] == "" for p in
                   ("scheme", "host", "port", "path", "query", "fragment", "domain"))


def test_url_query_scoped_to_pre_fragment_region(spark):
    # RFC 3986: a '?' first appearing inside the fragment is NOT a query
    df = spark.createDataFrame(
        [("http://a/p#x?y=1",), ("http://a/p?q=1#x?y=2",)], "url string")
    rows = {r["url"]: r for r in url_parts(df, "url").collect()}
    assert (rows["http://a/p#x?y=1"]["query"],
            rows["http://a/p#x?y=1"]["fragment"]) == ("", "x?y=1")
    assert rows["http://a/p?q=1#x?y=2"]["query"] == "q=1"


@pytest.mark.parametrize("dirty,clean", [
    ("https://a.com/p?utm_source=x&id=7", "https://a.com/p?id=7"),
    ("https://a.com/p?id=7&utm_source=x", "https://a.com/p?id=7"),
    ("https://a.com/p?utm_a=1&utm_b=2&id=7", "https://a.com/p?id=7"),
    ("https://a.com/p?utm_a=1&utm_b=2", "https://a.com/p"),
    ("https://a.com/p?fbclid=abc#sec", "https://a.com/p#sec"),
    ("https://a.com/p?gclid=1&x=2&msclkid=3", "https://a.com/p?x=2"),
    ("https://a.com/p?keep=utm_source", "https://a.com/p?keep=utm_source"),
    ("https://a.com/p", "https://a.com/p"),
])
def test_strip_tracking_params(spark, dirty, clean):
    df = spark.createDataFrame([(dirty,)], "url string")
    got = df.select(strip_tracking_params("url").alias("u")).collect()[0]["u"]
    assert got == clean


def test_normalize_url_canonicalizes(spark):
    cases = [
        ("HTTPS://WWW.Example.COM/KeepCase?utm_x=1&q=Y#frag",
         "https://www.example.com/KeepCase?q=Y"),
        ("http://a.com:80/x", "http://a.com/x"),
        ("https://a.com:443/x", "https://a.com/x"),
        ("https://a.com:8443/x", "https://a.com:8443/x"),  # non-default kept
        ("http://a.com:443/x", "http://a.com:443/x"),      # scheme-mismatched kept
        ("https://a.com/path/", "https://a.com/path"),
        ("https://a.com/", "https://a.com/"),              # root slash kept
        ("https://a.com/path/?x=1", "https://a.com/path?x=1"),
    ]
    df = spark.createDataFrame([(d,) for d, _ in cases], "url string")
    got = [r["u"] for r in
           df.select("url", normalize_url("url").alias("u")).collect()]
    assert got == [c for _, c in cases]
    # idempotent: normalizing a normalized URL is a no-op
    df2 = spark.createDataFrame([(c,) for _, c in cases], "url string")
    again = [r["u"] for r in df2.select(normalize_url("url").alias("u")).collect()]
    assert again == [c for _, c in cases]


def test_normalize_unicode_forms_and_nulls(spark):
    composed = "café"                                  # U+00E9
    decomposed = "café"                          # e + combining acute
    fullwidth = "ＡＢＣ１２３"
    df = spark.createDataFrame(
        [(1, decomposed), (2, fullwidth), (3, None), (4, "plain")],
        "id int, text string")
    out = {r["id"]: r["n"] for r in
           df.select("id", normalize_unicode("text").alias("n")).collect()}
    assert out[1] == composed
    assert out[2] == fullwidth          # NFC leaves compatibility chars
    assert out[3] is None               # NULL propagates
    assert out[4] == "plain"

    nfkc = {r["id"]: r["n"] for r in
            df.select("id", normalize_unicode("text", "NFKC").alias("n"))
            .collect()}
    assert nfkc[2] == "ABC123"
    assert nfkc[1] == composed
    # cross-check against the stdlib on the same inputs
    assert nfkc[2] == unicodedata.normalize("NFKC", fullwidth)

    with pytest.raises(ValueError):
        normalize_unicode("text", "NFX")


def test_normalize_unicode_strip_controls(spark):
    df = spark.createDataFrame(
        [(1, "a\x00b\x07c\tkeep\nme\x7f!")], "id int, text string")
    got = df.select(
        normalize_unicode("text", strip_controls=True).alias("n")
    ).collect()[0]["n"]
    assert got == "abc\tkeep\nme!"      # tab/newline survive, C0/DEL gone


def test_url_dedup_composition(spark):
    """normalize_url + exact_dedup: tracking-param and case variants of
    one URL collapse to a single representative."""
    from goetl_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "https://A.com/x?utm_source=mail"),
         (2, "https://a.com/x"),
         (3, "HTTPS://a.com/x#section"),
         (4, "https://a.com/y")],
        "doc_id int, url string")
    canon = df.select("doc_id", normalize_url("url").alias("url"))
    groups = exact_dedup(canon, text_col="url", id_col="doc_id").collect()
    by_keep = {r["keep_id"]: r["n_copies"] for r in groups}
    assert by_keep == {1: 3, 4: 1}


def test_normalize_url_non_urls_and_nulls_pass_through(spark):
    df = spark.createDataFrame(
        [(1, "not a url"), (2, ""), (3, None)], "id int, url string")
    got = {r["id"]: r["u"] for r in
           df.select("id", normalize_url("url").alias("u")).collect()}
    assert got == {1: "not a url", 2: "", 3: None}


def test_strip_tracking_params_fragment_caveat(spark):
    """Documented scope caveat: a tracking-param LOOKALIKE inside the
    fragment is also stripped (RE2-portable regexes can't see the '#'
    boundary without lookbehind). Pinned so a future regex change that
    alters this behavior is a conscious one."""
    df = spark.createDataFrame(
        [("https://a.com/p?x=1#sec&utm_a=2",)], "url string")
    got = df.select(strip_tracking_params("url").alias("u")).collect()[0]["u"]
    assert got == "https://a.com/p?x=1#sec"


def test_url_parts_prefix_and_keep_fragment(spark):
    df = spark.createDataFrame(
        [("https://a.com/p?utm_x=1#sec",)], "url string")
    cols = url_parts(df, "url", prefix="u_").columns
    assert {"u_scheme", "u_host", "u_domain"} <= set(cols)
    kept = df.select(
        normalize_url("url", keep_fragment=True).alias("u")
    ).collect()[0]["u"]
    assert kept == "https://a.com/p#sec"


def test_strip_tracking_params_custom_list(spark):
    df = spark.createDataFrame([("https://a.com/p?sid=9&x=1",)],
                               "url string")
    got = df.select(
        strip_tracking_params("url", params="sid").alias("u")
    ).collect()[0]["u"]
    assert got == "https://a.com/p?x=1"


def test_registrable_domain(spark):
    from goetl_spark.operators.web import registrable_domain

    cases = [
        ("news.bbc.co.uk", "bbc.co.uk"),
        ("bbc.co.uk", "bbc.co.uk"),
        ("co.uk", "co.uk"),            # the bare suffix stays itself
        ("news.bbc.com", "bbc.com"),
        ("a.b.c.example.com.au", "example.com.au"),
        ("WWW.Example.COM", "example.com"),
        ("localhost", "localhost"),
        ("example.com", "example.com"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = [r["d"] for r in
           df.select(registrable_domain("host").alias("d")).collect()]
    assert got == [d for _, d in cases]


def test_registrable_domain_psl_table(spark):
    from goetl_spark.operators.web import (
        TWO_LABEL_SUFFIXES,
        registrable_domain,
        registrable_domain_psl,
    )

    suffixes = spark.createDataFrame(
        [("uk",), ("co.uk",), ("com.au",), ("k12.ma.us",), ("com",)],
        "suffix string")
    df = spark.createDataFrame(
        [(1, "news.bbc.co.uk"), (2, "a.b.example.com.au"),
         (3, "school.k12.ma.us"), (4, "x.school.k12.ma.us"),
         (5, "plain.com"), (6, "co.uk"), (7, "unlisted.zz"),
         (8, "deep.sub.unlisted.zz")],
        "id int, host string")
    got = {r["id"]: r["registrable_domain"] for r in
           registrable_domain_psl(df, "host", suffixes).collect()}
    assert got[1] == "bbc.co.uk"
    assert got[2] == "example.com.au"
    assert got[3] == "school.k12.ma.us"   # host == suffix+1 already
    assert got[4] == "school.k12.ma.us"   # 3-label suffix matched
    assert got[5] == "plain.com"
    assert got[6] == "co.uk"              # bare suffix passthrough
    assert got[7] == "unlisted.zz"        # PSL default: last 2 labels
    assert got[8] == "unlisted.zz"

    # parity with the isin variant on the starter list
    starter = spark.createDataFrame(
        [(s,) for s in TWO_LABEL_SUFFIXES], "suffix string")
    hosts = spark.createDataFrame(
        [("news.bbc.co.uk",), ("a.b.c.example.com.au",),
         ("www.example.com",), ("singleton",)], "host string")
    via_table = {r["host"]: r["registrable_domain"] for r in
                 registrable_domain_psl(hosts, "host", starter).collect()}
    via_isin = {r["host"]: r["d"] for r in
                hosts.select("host",
                             registrable_domain("host").alias("d"))
                .collect()}
    assert via_table == via_isin


def test_psl_wildcard_and_exception_rules(spark):
    """publicsuffix.org canon (.ck): '*.ck' makes every label under ck
    a public suffix, '!www.ck' carves www.ck back out as registrable;
    plain rules keep working alongside."""
    from goetl_spark.operators.web import registrable_domain_psl

    rules = spark.createDataFrame(
        [("com",), ("co.uk",), ("*.ck",), ("!www.ck",)], "suffix string")
    hosts = ["foo.www.ck", "www.ck", "a.b.ck", "b.ck", "x.com",
             "news.bbc.co.uk", "unmatched.zz"]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    out = {r["host"]: r["registrable_domain"]
           for r in registrable_domain_psl(df, "host", rules).collect()}
    assert out["foo.www.ck"] == "www.ck"      # exception beats wildcard
    assert out["www.ck"] == "www.ck"          # exception: ps=ck, +1
    assert out["a.b.ck"] == "a.b.ck"          # wildcard ps = b.ck, +1
    assert out["b.ck"] == "b.ck"              # is itself a public suffix
    assert out["x.com"] == "x.com"
    assert out["news.bbc.co.uk"] == "bbc.co.uk"
    assert out["unmatched.zz"] == "unmatched.zz"  # default '*' rule


def test_psl_longest_rule_prevails(spark):
    """Rule length (counting '*') decides precedence: with both 'jp'
    and '*.hokkaido.jp', a deep host follows the wildcard while a
    plain .jp host follows the shorter rule."""
    from goetl_spark.operators.web import registrable_domain_psl

    rules = spark.createDataFrame(
        [("jp",), ("*.hokkaido.jp",)], "suffix string")
    df = spark.createDataFrame(
        [("www.site.sapporo.hokkaido.jp",), ("site.jp",)], "host string")
    out = {r["host"]: r["registrable_domain"]
           for r in registrable_domain_psl(
               df, "host", rules, max_suffix_labels=4).collect()}
    # ps = sapporo.hokkaido.jp (3 labels via wildcard), +1
    assert out["www.site.sapporo.hokkaido.jp"] == "site.sapporo.hokkaido.jp"
    assert out["site.jp"] == "site.jp"


# ---------------------------------------------------------------------------
# url_quality_flags
# ---------------------------------------------------------------------------


def test_url_quality_flags_rules(spark):
    from goetl_spark.operators.web import url_quality_flags

    rows = [
        (1, "https://www.example.com/a/b?x=1"),                 # clean
        (2, "http://192.168.10.1/admin"),                       # ip literal
        (3, "https://a.b.c.d.e.f.example.com/"),                # deep labels
        (4, "https://cdn4x9z123456.example.com/"),              # digit-heavy? (6/21 < 33%) ok
        (5, "https://777888999000111.net/"),                    # digit-heavy host
        (6, "https://xn--e1awd7f.example/"),                    # punycode
        (7, "https://example.com/" + "p" * 600),                # too long
        (8, "https://example.com/?" + "&".join(f"k{i}=v" for i in range(20))),
        (9, "https://example.com/obj/deadbeefdeadbeefdeadbeef00/x"),  # hex blob
        (10, "not a url"),
        (11, None),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    out = {r["id"]: r for r in url_quality_flags(df).collect()}
    assert out[1]["url_pass"] is True
    assert out[2]["ip_ok"] is False and out[2]["url_pass"] is False
    assert out[3]["subdomain_ok"] is False
    assert out[4]["digit_ok"] is True and out[4]["url_pass"] is True
    assert out[5]["digit_ok"] is False
    assert out[6]["punycode_ok"] is False
    assert out[7]["len_ok"] is False
    assert out[8]["query_ok"] is False
    assert out[9]["hexblob_ok"] is False
    for bad_id in (10, 11):
        assert out[bad_id]["host_ok"] is False
        assert out[bad_id]["url_pass"] is False


def test_url_quality_flags_thresholds_parametrize(spark):
    from goetl_spark.operators.web import url_quality_flags

    df = spark.createDataFrame(
        [(1, "https://a.b.example.com/x?p=1&q=2")], "id long, url string")
    strict = url_quality_flags(df, max_host_labels=2, max_params=1).first()
    assert strict["subdomain_ok"] is False and strict["query_ok"] is False
    loose = url_quality_flags(df).first()
    assert loose["url_pass"] is True
