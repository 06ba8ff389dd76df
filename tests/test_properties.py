"""Property-based tests (hypothesis) — beyond the reference's test
strategy, which has no randomized testing at all (SURVEY.md §5).

Pure-Python properties run at full hypothesis example counts; the one
Spark-backed property caps examples to keep the suite fast.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from goetl_spark.functions.transforms import go_layout_to_java
from goetl_spark.plans.dag import RetryConfig
from goetl_spark.sinks.jdbc import build_upsert_sql

# --- Go layout -> Java pattern ---------------------------------------------

_GO_FRAGMENTS = ["2006", "01", "02", "15", "04", "05", ".000", "Jan", "Mon",
                 "-07:00", "Z07:00"]


@given(st.lists(st.sampled_from(_GO_FRAGMENTS + ["-", ":", " ", "/", "T"]),
                min_size=1, max_size=8))
def test_go_layout_never_emits_bare_letters(frags):
    """Any untranslated ASCII letter in the output must be quoted —
    otherwise Java would interpret it as a pattern char."""
    out = go_layout_to_java("".join(frags))
    unquoted = re.sub(r"'[^']*'", "", out)
    assert re.fullmatch(r"[yMdHmsSaEVXxZO:\-/ T.]*", unquoted), (frags, out)


@given(st.text(alphabet="bcfgkpqruvw", min_size=1, max_size=10))
def test_go_layout_literal_letters_are_quoted(s):
    """A layout of letters that match no Go fragment becomes per-char
    quoted literals — exactly, with nothing dropped or injected."""
    assert go_layout_to_java(s) == "".join(f"'{ch}'" for ch in s)


# --- upsert SQL builder -----------------------------------------------------

_ident = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)


@given(st.lists(_ident, min_size=2, max_size=6, unique=True),
       st.data())
def test_upsert_sql_shape(cols, data):
    keys = data.draw(st.lists(st.sampled_from(cols), min_size=1,
                              max_size=len(cols) - 1, unique=True))
    sql = build_upsert_sql("t", cols, keys, update_on_conflict=True)
    assert sql.startswith("INSERT INTO t (")
    assert sql.count("%s") == len(cols)
    assert f"ON CONFLICT ({', '.join(keys)})" in sql
    # key columns never appear in the UPDATE SET list
    set_clause = sql.split("DO UPDATE SET ")[1]
    for k in keys:
        assert not re.search(rf"(^|, ){k} = EXCLUDED\.", set_clause)


@given(st.text(min_size=1, max_size=20).filter(
    lambda s: not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", s)))
def test_upsert_sql_rejects_bad_identifiers(bad):
    with pytest.raises(ValueError):
        build_upsert_sql(bad, ["a"], ["a"])


# --- retry backoff ----------------------------------------------------------

@given(st.sampled_from(["exponential", "linear", "fixed", "jittered", "none"]),
       st.integers(min_value=0, max_value=10),
       st.floats(min_value=0.001, max_value=10.0))
def test_backoff_bounds(strategy, attempt, base):
    """Delays are non-negative and bounded by the exponential envelope;
    jittered stays within [0.5, 1.0] x exponential (base.go:80-144)."""
    cfg = RetryConfig(max_retries=3, backoff_seconds=base, strategy=strategy)
    d = cfg.delay(attempt)
    assert d >= 0.0
    env = base * (2 ** attempt)
    if strategy == "jittered":
        assert env * 0.5 <= d <= env
    elif strategy == "none":
        assert d == 0.0
    else:
        assert d <= env


@given(st.integers(min_value=0, max_value=5))
def test_retry_stops_at_max(attempt):
    cfg = RetryConfig(max_retries=3)
    assert cfg.should_retry(RuntimeError("x"), attempt) == (attempt < 3)


# --- CDC set-algebra invariant (Spark-backed, capped examples) --------------

@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.sets(st.integers(min_value=0, max_value=30)),
       st.sets(st.integers(min_value=0, max_value=30)),
       st.sets(st.integers(min_value=0, max_value=30)))
def test_cdc_counts_match_set_algebra(spark, prev_keys, cur_keys, changed):
    """INSERTs = cur\\prev, DELETEs = prev\\cur, UPDATEs ⊆ intersection
    limited to rows whose compared value changed (dag/tasks/cdc.go)."""
    from goetl_spark.operators.cdc import capture_changes

    prev = spark.createDataFrame(
        [(k, 0) for k in prev_keys] or [(None, None)], "k long, v long"
    ).filter("k IS NOT NULL")
    cur = spark.createDataFrame(
        [(k, 1 if k in changed else 0) for k in cur_keys] or [(None, None)],
        "k long, v long",
    ).filter("k IS NOT NULL")
    out = capture_changes(cur, prev, ["k"], ["v"]).collect()
    by_type = {"INSERT": set(), "UPDATE": set(), "DELETE": set()}
    for r in out:
        by_type[r.change_type].add(r.k)
    assert by_type["INSERT"] == cur_keys - prev_keys
    assert by_type["DELETE"] == prev_keys - cur_keys
    assert by_type["UPDATE"] == (cur_keys & prev_keys & changed)


def test_fuzzy_pairs_distance_lower_bound(spark):
    """Edit distance >= |len(a)-len(b)| — so the length band is a
    lossless prefilter whenever tolerance >= max_dist (dedup.fuzzy_pairs
    docstring claim)."""
    from goetl_spark.operators.dedup import fuzzy_pairs

    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(
        ["abc", "abcd", "abcde", "xbcde", "zzzzz", "ab", "abcf"])]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    out = fuzzy_pairs(df, max_dist=50, length_tolerance=50, prefix_len=40)
    texts = {r[0]: r[1] for r in rows}
    for r in out.collect():
        lo = abs(len(texts[r.id_a]) - len(texts[r.id_b]))
        assert r.edit_dist >= lo


def test_scd2_idempotent_reapply(spark):
    """Applying the same source batch twice yields the identical dimension
    — the invariant that makes streaming SCD2 (foreachBatch, at-least-once
    replay) converge (streaming/warehouse.py::stream_scd2)."""
    from goetl_spark.operators.scd import scd_type2

    dim = spark.createDataFrame(
        [(1, "paris", "2023-01-01", "9999-12-31", True),
         (2, "rome", "2023-01-01", "9999-12-31", True)],
        "id int, city string, effective_from string, "
        "effective_to string, is_current boolean")
    src = spark.createDataFrame([(1, "berlin"), (3, "oslo")], "id int, city string")

    once = scd_type2(src, dim, ["id"], ["city"], effective_date="2024-06-01")
    twice = scd_type2(src, once, ["id"], ["city"], effective_date="2024-06-01")
    cols = once.columns
    a = sorted(tuple(r) for r in once.select(*cols).collect())
    b = sorted(tuple(r) for r in twice.select(*cols).collect())
    assert a == b


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.tuples(st.integers(0, 49), st.integers(0, 3),
                       st.integers(-100, 100)),
             min_size=1, max_size=12, unique_by=lambda t: t[0]),
)
def test_merge_partitioned_equals_full_merge(spark, tmp_path_factory, changes):
    """Property: for ANY changeset confined to its own partitions, the
    partition-pruned merge equals the full-table merge."""
    import pyspark.sql.functions as F

    from goetl_spark.operators.merge import merge, merge_partitioned

    tmp = tmp_path_factory.mktemp("mp")
    path = str(tmp / "t")
    target = spark.createDataFrame(
        [(i, float(i), i % 4) for i in range(50)],
        "id int, v double, part int")
    target.write.partitionBy("part").parquet(path)

    # changesets keep each key's original partition (constraint documented
    # in merge_partitioned); negative v triggers delete for some rows
    src_rows = [(i, float(x), i % 4) for i, _p, x in changes]
    source = spark.createDataFrame(src_rows, "id int, v double, part int")

    merge_partitioned(spark, path, source, on=["id"], partition_col="part",
                      delete_condition=F.col("v") < 0)
    got = sorted(tuple(r) for r in spark.read.parquet(path)
                 .select("id", "v", "part").collect())
    want = sorted(tuple(r) for r in merge(
        target, source, on=["id"], delete_condition=F.col("v") < 0)
        .select("id", "v", "part").collect())
    assert got == want


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.integers(2, 5), st.integers(4, 10))
def test_zorder_roundtrip_preserves_rows(spark, tmp_path_factory, nf, bits):
    """Property: z-ordering is a pure layout change — the multiset of rows
    survives any (num_files, bits) choice."""
    from goetl_spark.sinks.files import write_zordered

    tmp = tmp_path_factory.mktemp("zp")
    p = str(tmp / "z")
    df = spark.range(0, 500).selectExpr(
        "CAST(pmod(hash(id), 97) AS DOUBLE) AS x",
        "CAST(pmod(hash(id+7), 89) AS DOUBLE) AS y", "id")
    write_zordered(df, p, ["x", "y"], num_files=nf, bits=bits)
    back = sorted(tuple(r) for r in spark.read.parquet(p)
                  .select("x", "y", "id").collect())
    orig = sorted(tuple(r) for r in df.collect())
    assert back == orig


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=400),
       st.integers(20, 120))
def test_tdigest_quantiles_within_value_range(vals, compression):
    """Property: merged t-digest quantiles always lie inside [min, max]
    and are monotone in p."""
    import numpy as np

    from goetl_spark.operators.sketch import (
        _compress, tdigest_quantiles)

    v = np.array(vals, dtype=float)
    m, w = _compress(v, np.ones_like(v), compression)
    assert len(m) <= max(10, compression + 2)
    qs = tdigest_quantiles(m, w, [0.0, 0.25, 0.5, 0.75, 1.0])
    assert min(vals) <= qs[0] and qs[-1] <= max(vals)
    assert all(a <= b + 1e-9 for a, b in zip(qs, qs[1:]))


# --- WordPiece greedy matcher (operators/tokenizer.py) ----------------------

@given(st.text(alphabet="abc", min_size=1, max_size=12),
       st.sets(st.text(alphabet="abc", min_size=1, max_size=4),
               min_size=1, max_size=12))
@settings(max_examples=200, deadline=None)
def test_wordpiece_pieces_invariants(word, base_vocab):
    from goetl_spark.operators.tokenizer import wordpiece_pieces

    vocab = set(base_vocab) | {"##" + v for v in base_vocab}
    pieces = wordpiece_pieces(word, vocab)
    assert pieces, "never empty for a non-empty word"
    if pieces != ["[UNK]"]:
        # pieces reassemble the word exactly; continuations after head
        assert pieces[0] + "".join(p[2:] for p in pieces[1:]) == word
        assert not pieces[0].startswith("##")
        assert all(p.startswith("##") for p in pieces[1:])
        assert all(p in vocab for p in pieces)


@given(st.text(alphabet="ab", min_size=1, max_size=10))
@settings(max_examples=100, deadline=None)
def test_wordpiece_full_char_vocab_never_unk(word):
    from goetl_spark.operators.tokenizer import wordpiece_pieces

    vocab = {"a", "b", "##a", "##b"}
    pieces = wordpiece_pieces(word, vocab)
    assert pieces != ["[UNK]"]
    assert len(pieces) <= len(word)  # greedy never over-segments chars


# --- exact NTILE arithmetic (operators/ranking.py) --------------------------

def _ansi_ntile(rank0: int, n_rows: int, n_bins: int) -> int:
    """Reference NTILE: first n_rows % n_bins bins get one extra row."""
    size, rem = divmod(n_rows, n_bins)
    boundary = rem * (size + 1)
    if rank0 < boundary:
        return rank0 // (size + 1) + 1
    return rem + (rank0 - boundary) // max(size, 1) + 1


@given(st.integers(min_value=1, max_value=500),
       st.integers(min_value=1, max_value=30))
@settings(max_examples=200, deadline=None)
def test_ntile_formula_bin_sizes(n_rows, n_bins):
    bins = [_ansi_ntile(r, n_rows, n_bins) for r in range(n_rows)]
    # monotone non-decreasing over the rank order
    assert bins == sorted(bins)
    from collections import Counter
    sizes = Counter(bins)
    # bins numbered 1..min(n_bins, n_rows), sizes differ by at most one,
    # larger bins strictly first — the ANSI contract
    assert set(sizes) == set(range(1, min(n_bins, n_rows) + 1))
    vals = [sizes[b] for b in sorted(sizes)]
    assert max(vals) - min(vals) <= 1
    assert vals == sorted(vals, reverse=True)
    assert sum(vals) == n_rows


# --- Gopher rule bundle vs pure-Python reference ---------------------------

_GOPHER_ALPHABET = "abc THE the of and#.…-*•\t\n0123456789"


def _gopher_py(text: str) -> dict:
    """Independent reference implementation of the Gopher flag math
    (same RE2-portable semantics, ASCII \\s only)."""
    stripped = re.sub(r"[ \t\n]+", "", text)
    trimmed = text.strip(" \t\n")
    words = re.split(r"[ \t\n]+", trimmed) if trimmed else []
    n_words = len(words)
    denom = max(n_words, 1)
    hashes = text.count("#")
    dots3 = (len(text) - len(text.replace("...", ""))) / 3
    uni = text.count("…")
    lines = text.split("\n")
    n_lines = max(len(lines), 1)
    bullet = sum(bool(re.search(r"^[ \t\n]*[-*•]", l)) for l in lines)
    ell = sum(bool(re.search(r"(\.\.\.|…)[ \t\n]*$", l)) for l in lines)
    alpha = sum(bool(re.search(r"[A-Za-z]", w)) for w in words)
    low = text.lower()
    sw = sum(bool(re.search(rf"(^|[^a-z]){w}([^a-z]|$)", low))
             for w in ("the", "be", "to", "of", "and", "that", "have",
                       "with"))
    return {
        "n_words": n_words,
        "words_ok": 2 <= n_words <= 100,
        "mwl_ok": 3.0 <= len(stripped) / denom <= 10.0,
        "symbol_ok": (hashes + dots3 + uni) / denom <= 0.1,
        "bullet_ok": bullet / n_lines <= 0.9,
        "ellipsis_ok": ell / n_lines <= 0.3,
        "alpha_ok": alpha / denom >= 0.8,
        "stopword_ok": sw >= 2,
    }


@pytest.mark.usefixtures("spark")
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.text(alphabet=_GOPHER_ALPHABET, max_size=60),
                min_size=1, max_size=6))
def test_gopher_flags_match_python_reference(spark, texts):
    from goetl_spark.operators.text import gopher_quality_flags

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in
           gopher_quality_flags(df, min_words=2, max_words=100).collect()}
    for i, t in enumerate(texts):
        want = _gopher_py(t)
        for key, val in want.items():
            assert got[i][key] == val, (key, repr(t), got[i][key], val)


# --- epoch_shuffle md5 parity with the Python reference --------------------

@pytest.mark.usefixtures("spark")
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(min_value=0, max_value=10**12),
                min_size=1, max_size=20, unique=True),
       st.integers(min_value=0, max_value=99))
def test_epoch_shuffle_md5_matches_hashlib(spark, keys, epoch):
    """The shuffle key must be exactly md5('goetl:<epoch>:<key>') so any
    engine (DuckDB oracle, a downstream consumer) reproduces the
    permutation byte-for-byte."""
    import hashlib

    from goetl_spark.operators.sampling import epoch_shuffle

    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    got = {r.doc_id: r["__shuffle_key"]
           for r in epoch_shuffle(df, "doc_id", epoch=epoch).collect()}
    for k in keys:
        want = hashlib.md5(f"goetl:{epoch}:{k}".encode()).hexdigest()
        assert got[k] == want, (k, epoch)


# --- boilerplate strip vs pure-Python reference ----------------------------

_LINES = ["alpha beta", "gamma", "shared footer", "delta eps", ""]


def _strip_py(docs, min_doc_frac, min_docs):
    """Independent reference: per-source frequent-line detection over
    DISTINCT (doc, line) pairs, then order/repeat-preserving strip."""
    from collections import defaultdict

    per_group = defaultdict(list)
    for _, src, text in docs:
        per_group[src].append(text)
    boiler = {}
    for src, texts in per_group.items():
        counts = defaultdict(int)
        for t in texts:
            for line in set(t.split("\n")):
                counts[line] += 1
        n = len(texts)
        boiler[src] = {l for l, c in counts.items()
                       if c >= min_docs and c / n >= min_doc_frac}
    out = {}
    for did, src, text in docs:
        lines = text.split("\n")
        kept = [l for l in lines if l not in boiler[src]]
        out[did] = ("\n".join(kept), len(kept), len(lines) - len(kept))
    return out


@pytest.mark.usefixtures("spark")
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.tuples(st.sampled_from(["s1", "s2"]),
              st.lists(st.sampled_from(_LINES), min_size=1, max_size=4)),
    min_size=1, max_size=8))
def test_strip_boilerplate_matches_python_reference(spark, raw):
    from goetl_spark.operators.dedup import strip_boilerplate

    docs = [(i, src, "\n".join(lines)) for i, (src, lines) in enumerate(raw)]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    got = {r.doc_id: (r.text, r.n_kept, r.n_dropped)
           for r in strip_boilerplate(df, group_col="source",
                                      min_doc_frac=0.5, min_docs=2).collect()}
    want = _strip_py(docs, 0.5, 2)
    assert got == want


# --- BPE merge learning vs a pure-Python reference --------------------------

def _ref_bpe(word_freqs: dict[str, int], num_merges: int,
             min_pair_count: int = 1):
    """Straight-line Sennrich 2016 reference: weighted adjacent-pair
    counts over symbol tuples, (count DESC, left, right) tie-break,
    greedy left-to-right non-overlapping merge."""
    words = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_pair_count:
            break
        merges.append((l, r, c))
        new_words: dict[tuple, int] = {}
        for syms, f in words.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            k = tuple(out)
            new_words[k] = new_words.get(k, 0) + f
        words = new_words
    return merges


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.text(alphabet="abcd", min_size=1, max_size=6),
                min_size=1, max_size=12))
def test_learn_bpe_matches_reference(spark, words):
    """The distributed loop (JVM fold merge, argmax-by-limit) must
    reproduce the pure-Python reference exactly — merge order, symbols,
    and weighted counts — on arbitrary small corpora, including repeat
    chains ('aaaa') where greedy non-overlap semantics matter."""
    from goetl_spark.operators.tokenizer import learn_bpe_merges

    freqs: dict[str, int] = {}
    for w in words:
        freqs[w] = freqs.get(w, 0) + 1
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    got = learn_bpe_merges(df, num_merges=4, min_pair_count=1)
    assert got == _ref_bpe(freqs, 4)
