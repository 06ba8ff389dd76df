"""Round-7 additions: Gopher quality-rule bundle, SemDeDup-style
embedding dedup, epoch-deterministic shuffle."""
from __future__ import annotations

from pyspark.sql import functions as F


GOOD = (
    "The quick brown fox jumped over the lazy dog and then ran off to "
    "the river of the north with a basket that it seemed to have found "
    "near the old mill. " * 4
)


def _flags_row(spark, text, **kw):
    from goetl_spark.operators.text import gopher_quality_flags

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return gopher_quality_flags(df, **kw).collect()[0]


def test_gopher_pass_on_clean_prose(spark):
    r = _flags_row(spark, GOOD)
    assert r.words_ok and r.mwl_ok and r.symbol_ok and r.bullet_ok
    assert r.ellipsis_ok and r.alpha_ok and r.stopword_ok
    assert r.gopher_pass


def test_gopher_word_count_bounds(spark):
    r = _flags_row(spark, "too short to have fifty words")
    assert not r.words_ok and not r.gopher_pass
    assert r.n_words == 6
    # the bound is parameterized — same doc passes with a lower floor
    assert _flags_row(spark, "the words be to of and that have with ok",
                      min_words=5).words_ok


def test_gopher_symbol_ratio(spark):
    hashy = GOOD + " " + "# " * 30
    r = _flags_row(spark, hashy)
    assert not r.symbol_ok and not r.gopher_pass
    # unicode ellipsis counts like '...'
    dotty = GOOD + " " + "word… " * 40
    assert not _flags_row(spark, dotty).symbol_ok


def test_gopher_bullet_and_ellipsis_lines(spark):
    bullets = "\n".join(["- item %d of the list" % i for i in range(20)])
    r = _flags_row(spark, bullets, min_words=10)
    assert not r.bullet_ok
    ell = "\n".join(["the line trails off..." for _ in range(10)])
    assert not _flags_row(spark, ell, min_words=10).ellipsis_ok
    # one bullet among many prose lines is fine
    mixed = GOOD + "\n- a single bullet\n" + GOOD
    assert _flags_row(spark, mixed).bullet_ok


def test_gopher_alpha_and_stopwords(spark):
    nums = " ".join(str(i) for i in range(80))
    r = _flags_row(spark, nums)
    assert not r.alpha_ok and not r.stopword_ok
    # 'the' and 'with' as substrings of other words must NOT count
    camo = "brother without theory " * 30
    assert not _flags_row(spark, camo).stopword_ok


def test_gopher_empty_doc_fails_cleanly(spark):
    r = _flags_row(spark, "   ")
    assert r.n_words == 0 and not r.gopher_pass


def test_semantic_dedup_exact_allpairs(spark):
    from goetl_spark.operators.similarity import semantic_dedup

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.998, 0.02]),   # near-dup of 3
        (5, [0.0, 0.0, 1.0]),      # singleton
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup(df, threshold=0.99).collect()
    by_id = {r.vec_id: r for r in out}
    assert by_id[1].keep and not by_id[2].keep
    assert by_id[2].sem_cluster_id == 1
    assert by_id[3].keep and not by_id[4].keep
    assert by_id[5].keep and by_id[5].sem_cluster_id == 5
    assert "embedding" in out[0].asDict()  # original columns preserved


def test_semantic_dedup_lsh_blocking_matches_allpairs_here(spark):
    """With well-separated clusters the blocked path finds the same
    components as all-pairs (blocking only risks recall ACROSS buckets;
    antipodal clusters always split)."""
    from goetl_spark.operators.similarity import semantic_dedup

    rows = [(i, [1.0, float(i) * 1e-4, 0.0]) for i in range(1, 4)] + [
        (10 + i, [-1.0, 0.0, float(i) * 1e-4]) for i in range(1, 4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {(r.vec_id, r.sem_cluster_id)
             for r in semantic_dedup(df, threshold=0.999).collect()}
    blocked = {(r.vec_id, r.sem_cluster_id)
               for r in semantic_dedup(df, threshold=0.999, n_planes=4,
                                       dim=3).collect()}
    assert exact == blocked
    keeps = {r.vec_id for r in semantic_dedup(df, threshold=0.999).collect()
             if r.keep}
    assert keeps == {1, 11}


def test_semantic_dedup_requires_dim_for_blocking(spark):
    from goetl_spark.operators.similarity import semantic_dedup
    import pytest

    df = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="dim"):
        semantic_dedup(df, n_planes=4)


def test_epoch_shuffle_deterministic_and_epoch_varying(spark):
    from goetl_spark.operators.sampling import epoch_shuffle

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = [r.doc_id for r in epoch_shuffle(df, "doc_id", epoch=1).collect()]
    b = [r.doc_id for r in epoch_shuffle(df, "doc_id", epoch=1).collect()]
    c = [r.doc_id for r in epoch_shuffle(df, "doc_id", epoch=2).collect()]
    assert a == b                      # reproducible
    assert a != c                      # epochs permute differently
    assert sorted(a) == sorted(c) == list(range(500))  # a permutation
    # order is the md5 order — verifiable cross-engine
    hashes = [r["__shuffle_key"] for r in
              epoch_shuffle(df, "doc_id", epoch=1).collect()]
    assert hashes == sorted(hashes)


def _boiler_docs(spark):
    rows = []
    for i in range(10):
        rows.append((i, "srcA", f"unique content {i}\n(c) 2024 SiteA footer\nmore {i}"))
    for i in range(10, 14):
        rows.append((i, "srcB", f"only body {i}"))
    rows.append((14, "srcB", "only body 10\nonly body 10"))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_frequent_lines_per_group(spark):
    from goetl_spark.operators.dedup import frequent_lines

    out = frequent_lines(_boiler_docs(spark), group_col="source",
                         min_doc_frac=0.5, min_docs=2).collect()
    assert {(r.grp, r.line) for r in out} == {("srcA", "(c) 2024 SiteA footer")}
    assert out[0].n_docs == 10 and out[0].doc_frac == 1.0
    # within-doc repeats count once: 'only body 10' appears twice in one
    # doc, once in another doc -> n_docs 2, but frac 2/5 < 0.5 -> out


def test_strip_boilerplate_order_preserving(spark):
    from goetl_spark.operators.dedup import strip_boilerplate

    out = {r.doc_id: r for r in strip_boilerplate(
        _boiler_docs(spark), group_col="source",
        min_doc_frac=0.5, min_docs=2).collect()}
    assert out[3].text == "unique content 3\nmore 3"
    assert out[3].n_kept == 2 and out[3].n_dropped == 1
    # untouched group keeps text verbatim (incl. duplicate lines)
    assert out[14].text == "only body 10\nonly body 10"
    assert out[14].n_dropped == 0
    assert set(out[3].asDict()) == {
        "doc_id", "source", "text", "n_kept", "n_dropped"}


def test_strip_boilerplate_accepts_precomputed_table(spark):
    from goetl_spark.operators.dedup import frequent_lines, strip_boilerplate

    docs = _boiler_docs(spark)
    boiler = frequent_lines(docs, group_col="source",
                            min_doc_frac=0.5, min_docs=2)
    out = strip_boilerplate(docs, group_col="source", boiler=boiler)
    assert out.filter("doc_id = 0").first().n_dropped == 1


def test_epoch_shuffle_rejects_null_keys(spark):
    import pytest
    from pyspark.sql import functions as F
    from goetl_spark.operators.sampling import epoch_shuffle

    df = spark.createDataFrame([(1,), (None,)], "doc_id long")
    with pytest.raises(Exception, match="NULL doc_id"):
        epoch_shuffle(df, "doc_id").collect()


def test_semantic_dedup_all_singletons(spark):
    """No pair crosses the threshold: every row keeps itself."""
    from goetl_spark.operators.similarity import semantic_dedup

    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [-1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup(df, threshold=0.99).collect()
    assert all(r.keep and r.sem_cluster_id == r.vec_id for r in out)
    assert len(out) == 3


def test_lsh_recall_report(spark):
    from goetl_spark.operators.dedup import lsh_recall_report

    base = ("the quick brown fox jumps over the lazy dog and runs to "
            "the river bank every single morning before dawn")
    rows = [(i, base + f" tail{i}") for i in range(6)]          # near-dups
    rows += [(100 + i, " ".join(f"w{i}x{j}" for j in range(20)))
             for i in range(6)]                                  # unrelated
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = lsh_recall_report(df, threshold=0.5,
                          num_hashes=32, band_size=4).collect()[0]
    assert r.n_true_pairs == 15            # C(6,2) near-dup pairs
    assert r.n_caught == r.n_true_pairs    # strong config catches all
    assert r.recall == 1.0
    assert 0.0 < r.precision <= 1.0
    # deterministic sampling path returns a plausible (possibly empty)
    # subset without error
    r2 = lsh_recall_report(df, threshold=0.5, sample_fraction=0.5,
                           num_hashes=32, band_size=4).collect()[0]
    assert r2.n_candidates >= 0 and 0.0 <= r2.recall <= 1.0


def test_lsh_index_incremental_matches_full_recompute(spark, tmp_path):
    from goetl_spark.operators.dedup import (
        lsh_index_candidates, lsh_index_write, minhash_lsh_candidates)

    base = ("the quick brown fox jumps over the lazy dog near the old "
            "river bank every single morning before dawn breaks")
    corpus = spark.createDataFrame(
        [(i, base + f" v{i}") for i in range(4)]
        + [(50, " ".join(f"u{j}" for j in range(25)))],
        "doc_id long, text string")
    path = str(tmp_path / "lsh_index")
    lsh_index_write(corpus, path)

    # batch: one near-dup of the corpus family, one brand-new unique doc,
    # and one near-dup PAIR within the batch
    batch = spark.createDataFrame(
        [(100, base + " v100"),
         (101, " ".join(f"z{j}" for j in range(25))),
         (102, " ".join(f"q{j}" for j in range(20)) + " same tail here"),
         (103, " ".join(f"q{j}" for j in range(20)) + " same tail here!")],
        "doc_id long, text string")
    got = {(r.query_id, r.match_id)
           for r in lsh_index_candidates(batch, path).collect()}

    # ground truth: full recompute over corpus+batch, restricted to
    # pairs touching the new batch
    full = minhash_lsh_candidates(corpus.unionByName(batch))
    new_ids = {100, 101, 102, 103}
    want = set()
    for r in full.collect():
        a, b = r.id_a, r.id_b
        if a in new_ids and b in new_ids:
            want.add((a, b))
        elif a in new_ids:
            want.add((a, b))
        elif b in new_ids:
            want.add((b, a))
    assert got == want
    assert (100, 0) in got or any(q == 100 for q, _ in got)  # corpus hit
    assert (102, 103) in got                                  # within-batch
    assert not any(q == 101 or m == 101 for q, m in got)      # unique doc clean

    # append the accepted batch and re-query: batch docs now indexed
    lsh_index_write(batch, path, mode="append")
    got2 = {(r.query_id, r.match_id) for r in lsh_index_candidates(
        spark.createDataFrame([(200, base + " v200")],
                              "doc_id long, text string"), path).collect()}
    assert any(m == 100 for _, m in got2)  # matches the appended doc too


def test_lsh_index_config_mismatch_raises(spark, tmp_path):
    import pytest
    from goetl_spark.operators.dedup import (
        lsh_index_candidates, lsh_index_write)

    docs = spark.createDataFrame([(1, "a b c d e f g")],
                                 "doc_id long, text string")
    path = str(tmp_path / "idx")
    lsh_index_write(docs, path, num_hashes=32, band_size=4)
    with pytest.raises(ValueError, match="incomparable"):
        lsh_index_candidates(docs, path, num_hashes=16, band_size=4)
    with pytest.raises(ValueError, match="incomparable"):
        lsh_index_write(docs, path, num_hashes=16, band_size=4,
                        mode="append")
    # matching config still works
    assert lsh_index_candidates(docs, path).count() == 0


def test_simhash_index_lossless_vs_full_recompute(spark, tmp_path):
    from goetl_spark.operators.dedup import (
        simhash_index_candidates, simhash_index_write, simhash_pairs)

    base = ("the quick brown fox jumps over the lazy dog near the old "
            "river bank every single morning before dawn breaks again")
    corpus = spark.createDataFrame(
        [(i, base + f" v{i}") for i in range(4)]
        + [(50, " ".join(f"u{j}" for j in range(25)))],
        "doc_id long, text string")
    path = str(tmp_path / "sh_index")
    simhash_index_write(corpus, path, max_hamming=8)

    batch = spark.createDataFrame(
        [(100, base + " v100"),
         (101, " ".join(f"z{j}" for j in range(25)))],
        "doc_id long, text string")
    got = {(r.query_id, r.match_id, r.hamming)
           for r in simhash_index_candidates(batch, path,
                                             max_hamming=8).collect()}

    full = simhash_pairs(corpus.unionByName(batch), max_hamming=8)
    want = set()
    for r in full.collect():
        if r.id_a >= 100 and r.id_b >= 100:
            want.add((r.id_a, r.id_b, r.hamming))
        elif r.id_b >= 100:
            want.add((r.id_b, r.id_a, r.hamming))
        elif r.id_a >= 100:
            want.add((r.id_a, r.id_b, r.hamming))
    assert got == want            # lossless: identical within-bound set
    assert any(q == 100 for q, _, _ in got)

    # config mismatch raises
    import pytest
    with pytest.raises(ValueError, match="incomparable"):
        simhash_index_candidates(batch, path, max_hamming=4)


def test_compression_ratio_bands(spark):
    from goetl_spark.operators.text import compression_ratio

    rows = [
        (1, "the cat sat on the mat and watched the evening boats " * 4),
        (2, "spam spam spam " * 50),               # templated junk
        (3, "kq9x zv7w jd3p mn8r " * 30),          # high-entropy-ish
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.ratio for r in
           df.select("doc_id",
                     compression_ratio("text").alias("ratio")).collect()}
    assert out[2] < out[1] < 1.0       # junk compresses far better
    assert out[3] > out[2]             # noise compresses worse than junk
    assert out[4] is None and out[5] is None
    # deterministic
    again = {r.doc_id: r.ratio for r in
             df.select("doc_id",
                       compression_ratio("text").alias("ratio")).collect()}
    assert again == out


def test_ks_distance_exact_vs_brute_force(spark):
    # r14: exact two-sample KS — whole-frame and grouped (incl. NULL
    # group key, one-sided group -> NULL), NULL values excluded, NaN
    # raises, partition-independent
    import random

    from pyspark.sql import functions as F

    from goetl_spark.quality import ks_distance

    rng = random.Random(3)

    def ks_ref(a, b):
        vals = sorted(set(a) | set(b))
        na, nb = len(a), len(b)
        return max(abs(sum(1 for x in a if x <= v) / na
                       - sum(1 for x in b if x <= v) / nb)
                   for v in vals)

    a = [round(rng.gauss(0, 1), 3) for _ in range(200)]
    b = [round(rng.gauss(0.4, 1.2), 3) for _ in range(170)]
    A = spark.createDataFrame([(x,) for x in a], "v double")
    B = spark.createDataFrame([(x,) for x in b], "v double")
    r = ks_distance(A, B, "v").collect()[0]
    assert (r["n_a"], r["n_b"]) == (200, 170)
    assert abs(r["ks"] - ks_ref(a, b)) < 1e-12
    assert ks_distance(A, A, "v").collect()[0]["ks"] == 0.0

    rows_a = [(("g%d" % (i % 2)) if i % 7 else None, a[i % len(a)])
              for i in range(150)] + [("only_a", 1.0), ("only_a", 2.0)]
    rows_b = [(("g%d" % (i % 2)) if i % 7 else None, b[i % len(b)])
              for i in range(140)]
    GA = spark.createDataFrame(rows_a, "g string, v double")
    GB = spark.createDataFrame(rows_b, "g string, v double")
    got = {r["g"]: r for r in ks_distance(GA, GB, "v", ["g"]).collect()}
    for gval in [None, "g0", "g1"]:
        sa = [x for gg, x in rows_a if gg == gval]
        sb = [x for gg, x in rows_b if gg == gval]
        assert abs(got[gval]["ks"] - ks_ref(sa, sb)) < 1e-12
    assert got["only_a"]["ks"] is None and got["only_a"]["n_b"] == 0

    x1 = sorted(map(tuple, ks_distance(GA, GB, "v", ["g"]).collect()),
                key=str)
    x2 = sorted(map(tuple,
                    ks_distance(GA.repartition(13), GB.repartition(7),
                                "v", ["g"]).collect()), key=str)
    assert x1 == x2

    AN = A.union(spark.createDataFrame([(None,)], "v double"))
    assert ks_distance(AN, B, "v").collect()[0]["n_a"] == 200

    import pytest as _pytest
    nanA = A.union(spark.createDataFrame([(float("nan"),)], "v double"))
    with _pytest.raises(Exception, match="NaN"):
        ks_distance(nanA, B, "v").collect()


def test_ks_distance_empty_edges(spark):
    from goetl_spark.quality import ks_distance

    empty = spark.createDataFrame([], "v double")
    # both empty: empty out (no all-NULL aggregate row)
    assert ks_distance(empty, empty, "v").collect() == []
    # one side empty: NULL ks with the zero count visible
    A = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    r = ks_distance(A, empty, "v").collect()
    assert len(r) == 1 and r[0]["n_b"] == 0 and r[0]["ks"] is None


def test_categorical_association_reference_and_bounds(spark):
    # r14: MI/chi2/Cramér's V vs a pure-python scale-9 reference;
    # perfect bijection reaches V == 1 (the zero-cell mass is
    # recovered as N - sum(observed e)); constant column -> NULL V
    import math
    import random
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from goetl_spark.quality import categorical_association

    def rnd9(x):
        return float(Decimal(repr(x)).quantize(Decimal("1e-9"),
                                               ROUND_HALF_UP))

    def ref(pairs):
        n = len(pairs)
        ab = Counter(pairs)
        ca = Counter(a for a, _ in pairs)
        cb = Counter(b for _, b in pairs)
        mi = sum(rnd9((m / n) * math.log(
            (m / n) / ((ca[a] / n) * (cb[b] / n))))
            for (a, b), m in ab.items())
        s9 = 0
        for (a, b), m in ab.items():
            d = ca[a] * cb[b]
            q = 1_000_000_000 if m * m >= d else 0
            r = m * m - (d if q else 0)
            s9 += q + (r * 10**9) // d
        s_minus_1 = max(0.0, (s9 - 10**9) / 1e9)
        chi = s_minus_1 * n
        kmin = min(len(ca), len(cb))
        v = (math.sqrt(s_minus_1 / (kmin - 1))
             if kmin > 1 else None)
        return n, len(ca), len(cb), mi, chi, v

    rng = random.Random(5)
    pairs = [(rng.choice(["x", "y", "z", None]),
              rng.choice(["p", "q", None])) for _ in range(400)]
    df = spark.createDataFrame(pairs, "a string, b string")
    r = categorical_association(df, "a", "b").collect()[0]
    n, ka, kb, mi, chi, v = ref(pairs)
    assert (r["n"], r["k_a"], r["k_b"]) == (n, ka, kb)
    assert abs(r["mi_nats"] - mi) < 1e-8
    assert r["chi2"] == chi
    assert r["cramers_v"] == v

    dep = spark.createDataFrame([(c, c.upper()) for c in "xyzxyz" * 20],
                                "a string, b string")
    rd = categorical_association(dep, "a", "b").collect()[0]
    assert abs(rd["cramers_v"] - 1.0) < 1e-9
    const = spark.createDataFrame([("x", "k"), ("y", "k")],
                                  "a string, b string")
    rc = categorical_association(const, "a", "b").collect()[0]
    assert rc["cramers_v"] is None and abs(rc["mi_nats"]) < 1e-12
    p1 = categorical_association(df, "a", "b").collect()[0]
    p2 = categorical_association(df.repartition(13), "a", "b").collect()[0]
    assert tuple(p1) == tuple(p2)
