"""WordPiece tokenizer tests (operators/tokenizer.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from goetl_spark.operators.tokenizer import (
    vocab_from_corpus, wordpiece_pieces, wordpiece_tokenize)

VOCAB = {"un", "##aff", "##able", "##ed", "aff", "able", "run", "##ning",
         "a", "b", "##a", "##b", "1", "##1"}


def test_pieces_greedy_longest_match():
    assert wordpiece_pieces("unaffable", VOCAB) == ["un", "##aff", "##able"]
    assert wordpiece_pieces("running", VOCAB) == ["run", "##ning"]
    assert wordpiece_pieces("able", VOCAB) == ["able"]


def test_pieces_unk_on_uncoverable_word():
    assert wordpiece_pieces("xyz", VOCAB) == ["[UNK]"]
    # covered prefix but uncoverable tail still collapses to UNK
    assert wordpiece_pieces("runx", VOCAB) == ["[UNK]"]


def test_tokenize_dataframe(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, text="Unaffable RUNNING!"),
         Row(doc_id=1, text=""),
         Row(doc_id=2, text=None)],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           wordpiece_tokenize(df, VOCAB).collect()}
    assert out[0].tokens == ["un", "##aff", "##able", "run", "##ning"]
    assert out[0].n_tokens == 5
    assert out[1].tokens == [] and out[1].n_tokens == 0
    assert out[2].tokens == [] and out[2].n_tokens == 0


def test_tokenize_requires_vocab(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="x")],
                               "doc_id long, text string")
    with pytest.raises(ValueError):
        wordpiece_tokenize(df, [])


def test_vocab_from_corpus_covers_frequent_text(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text="the quick brown fox jumps")
         for i in range(5)],
        "doc_id long, text string")
    vocab = vocab_from_corpus(df, min_count=2)
    out = wordpiece_tokenize(df, vocab).collect()
    assert all("[UNK]" not in r.tokens for r in out)
    assert all(r.n_tokens == 5 for r in out)  # every word is a vocab hit


# --- BPE merge learning (learn_bpe_merges / apply_bpe_merges) ---------------

def _corpus(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id long, text string")


def test_learn_bpe_merges_hand_computed(spark):
    """Classic Sennrich-style replay: 3x'abab' + 2x'abc' must learn
    (a,b):8 -> (ab,ab):3 -> (ab,c):2 in that order."""
    from goetl_spark.operators.tokenizer import learn_bpe_merges

    df = _corpus(spark, ["abab abab", "abab abc", "abc"])
    merges = learn_bpe_merges(df, num_merges=3)
    assert merges == [("a", "b", 8), ("ab", "ab", 3), ("ab", "c", 2)]


def test_learn_bpe_greedy_repeat_chains(spark):
    """'aaaa' repeats: pair (a,a) counts every adjacency (9), the fold
    merges non-overlapping left-to-right (aaaa -> aa,aa), and the next
    round learns (aa,aa)."""
    from goetl_spark.operators.tokenizer import learn_bpe_merges

    df = _corpus(spark, ["aaaa", "aaaa", "aaaa"])
    merges = learn_bpe_merges(df, num_merges=5)
    assert merges[0] == ("a", "a", 9)
    assert merges[1] == ("aa", "aa", 3)
    assert len(merges) == 2  # no pair left after [aaaa]


def test_learn_bpe_tiebreak_and_min_count(spark):
    """Equal counts break lexicographically on (left, right); pairs
    under min_pair_count stop the loop."""
    from goetl_spark.operators.tokenizer import learn_bpe_merges

    df = _corpus(spark, ["xy pq", "xy pq"])
    merges = learn_bpe_merges(df, num_merges=10, min_pair_count=2)
    assert merges[0] == ("p", "q", 2)
    assert merges[1] == ("x", "y", 2)
    assert len(merges) == 2  # singleton merged words can't pair again

    assert learn_bpe_merges(df, num_merges=10, min_pair_count=3) == []


def test_apply_bpe_merges_matches_training_replay(spark):
    """Inference (lowest-rank-first) reproduces the training-time fold:
    learned tokens come back whole, unseen symbols stay single chars,
    NULL text propagates."""
    from goetl_spark.operators.tokenizer import (
        apply_bpe_merges, learn_bpe_merges)

    train = _corpus(spark, ["abab abab", "abab abc", "abc"])
    merges = learn_bpe_merges(train, num_merges=3)
    test = spark.createDataFrame(
        [Row(doc_id=0, text="abab abc ababd"),
         Row(doc_id=1, text="zz"),
         Row(doc_id=2, text=None)],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           apply_bpe_merges(test, merges).collect()}
    assert out[0]["tokens"] == ["abab", "abc", "abab", "d"]
    assert out[0]["n_tokens"] == 4
    assert out[1]["tokens"] == ["z", "z"]
    assert out[2]["tokens"] is None and out[2]["n_tokens"] is None


def test_learn_bpe_validates(spark):
    from goetl_spark.operators.tokenizer import learn_bpe_merges

    df = _corpus(spark, ["ab"])
    with pytest.raises(ValueError):
        learn_bpe_merges(df, num_merges=0)


def test_token_count_bpe_matches_full_tokenize(spark):
    """The count-only path (r8 verdict ask #7) agrees exactly with
    size(apply_bpe_merges(...).tokens), NULL text -> NULL count, and a
    string id column survives (dynamic id schema)."""
    from goetl_spark.operators.tokenizer import (
        apply_bpe_merges, learn_bpe_merges, token_count_bpe)

    df = _corpus(spark, ["abab abc ZZ", "abab", "xyz abc abab abab"])
    merges = learn_bpe_merges(df, num_merges=3)
    full = {r["doc_id"]: len(r["tokens"])
            for r in apply_bpe_merges(df, merges).collect()}
    counts = {r["doc_id"]: r["n_tokens"]
              for r in token_count_bpe(df, merges).collect()}
    assert counts == full and len(counts) == 3

    with_null = df.union(spark.createDataFrame(
        [(99, None)], "doc_id long, text string"))
    out = {r["doc_id"]: r["n_tokens"]
           for r in token_count_bpe(with_null, merges).collect()}
    assert out[99] is None

    sdf = spark.createDataFrame([("u1", "abab abc")], "url string, text string")
    row = token_count_bpe(sdf, merges, id_col="url").collect()[0]
    assert row["url"] == "u1" and row["n_tokens"] == full[1] + 1


def test_pack_sequences_on_bpe_counts(spark):
    """Composition promised by the token_count_bpe docstring: packs
    sized on model-real BPE counts respect the budget + max-doc bound
    and cover every document exactly once."""
    from goetl_spark.operators.sampling import pack_sequences
    from goetl_spark.operators.tokenizer import (
        learn_bpe_merges, token_count_bpe)

    texts = ["abab " * k for k in (1, 2, 3, 5, 8, 13, 2, 4)]
    df = _corpus(spark, texts)
    merges = learn_bpe_merges(df, num_merges=2)
    counts = token_count_bpe(df, merges)
    packed = pack_sequences(df.join(counts, "doc_id"),
                            token_col="n_tokens", budget=10)
    rows = packed.collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(8))
    by_pack: dict[int, int] = {}
    max_doc = max(r["n_tokens"] for r in rows)
    for r in rows:
        by_pack[r["pack_id"]] = by_pack.get(r["pack_id"], 0) + r["n_tokens"]
    assert all(v < 10 + max_doc for v in by_pack.values())


# ---------------------------------------------------------------------------
# Unigram LM (SentencePiece-style)
# ---------------------------------------------------------------------------


def test_unigram_tokenize_picks_max_score(spark):
    from goetl_spark.operators.tokenizer import unigram_tokenize

    # 'abc': one piece (score 5) beats 'ab'+'c' (3+1=4) and chars (3)
    vocab = {"abc": 5.0, "ab": 3.0, "a": 1.0, "b": 1.0, "c": 1.0}
    df = spark.createDataFrame([(1, "abc ab c xyz")], "doc_id long, text string")
    r = unigram_tokenize(df, vocab, unk_score=-9.0).first()
    # xyz has no pieces -> per-char unk fallback
    assert r["tokens"] == ["abc", "ab", "c", "x", "y", "z"]
    assert r["n_tokens"] == 6


def test_unigram_tokenize_tie_break_lexicographic(spark):
    from goetl_spark.operators.tokenizer import unigram_tokenize

    # 'ab': 'ab'(2) ties 'a'+'b'(1+1) -> joined-path compare:
    # 'a\x1fb' < 'ab' so the two-piece split wins
    vocab = {"ab": 2.0, "a": 1.0, "b": 1.0}
    df = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    assert unigram_tokenize(df, vocab).first()["tokens"] == ["a", "b"]
    # raise the whole-word score -> single piece wins
    vocab2 = {"ab": 2.5, "a": 1.0, "b": 1.0}
    assert unigram_tokenize(df, vocab2).first()["tokens"] == ["ab"]


def test_unigram_tokenize_null_and_unsegmentable(spark):
    from goetl_spark.operators.tokenizer import unigram_tokenize

    df = spark.createDataFrame([(1, None), (2, "qq aa")],
                               "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           unigram_tokenize(df, {"aa": 1.0}, unk_score=None).collect()}
    assert out[1]["tokens"] is None and out[1]["n_tokens"] is None
    assert out[2]["tokens"] == ["aa"]          # 'qq' dropped (no fallback)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        unigram_tokenize(df, {})


def test_unigram_viterbi_matches_bruteforce_property():
    """Viterbi (with the documented tie-break) == exhaustive
    enumeration picking (max score, lexicographically smallest
    \\x1f-joined path)."""
    import itertools

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from goetl_spark.operators.tokenizer import _SEP, _viterbi_pieces

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet="abc", min_size=1, max_size=8),
           st.sets(st.text(alphabet="abc", min_size=1, max_size=3),
                   min_size=1, max_size=8),
           st.randoms(use_true_random=False))
    def check(word, pieces, rnd):
        scores = {p: float(rnd.randint(1, 5)) for p in pieces}
        for ch in "abc":
            scores.setdefault(ch, 1.0)       # guarantee coverage
        max_len = max(len(p) for p in scores)
        got = _viterbi_pieces(word, scores, max_len, None)

        best = None
        n = len(word)
        for cuts in itertools.product([0, 1], repeat=n - 1):
            segs, start = [], 0
            for i, cut in enumerate(cuts, start=1):
                if cut:
                    segs.append(word[start:i])
                    start = i
            segs.append(word[start:])
            if any(s not in scores for s in segs):
                continue
            cand = (sum(scores[s] for s in segs), _SEP.join(segs))
            if (best is None or cand[0] > best[0]
                    or (cand[0] == best[0] and cand[1] < best[1])):
                best = cand
        assert got == (best[1].split(_SEP) if best else None)

    check()


def test_learn_unigram_vocab_and_roundtrip(spark):
    from goetl_spark.operators.tokenizer import (
        learn_unigram_vocab, unigram_tokenize)

    rows = [(i, "sparkle sparkle merge merge merge stream") for i in range(8)]
    rows += [(100 + i, "spark stream sparkle") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = learn_unigram_vocab(df, vocab_size=30, seed_size=200,
                                max_piece_len=8, iterations=2)
    again = learn_unigram_vocab(df, vocab_size=30, seed_size=200,
                                max_piece_len=8, iterations=2)
    assert vocab == again                       # deterministic end to end
    pieces = dict(vocab)
    assert all(lp < 0 for lp in pieces.values())
    # frequent whole words survive as single pieces
    assert "merge" in pieces and "stream" in pieces
    out = unigram_tokenize(df, pieces, unk_score=None).collect()
    # full coverage: every word segments (chars never prune)
    assert all(r["n_tokens"] > 0 for r in out)
    # and frequent words tokenize to ONE piece
    one = unigram_tokenize(
        spark.createDataFrame([(1, "merge stream")], "doc_id long, text string"),
        pieces, unk_score=None).first()
    assert one["tokens"] == ["merge", "stream"]


def test_learn_unigram_vocab_case_sensitive(spark):
    """lowercase=False must NOT treat uppercase letters as separators
    (r9 ADVICE: the Spark-side split regex now mirrors
    unigram_tokenize's [^A-Za-z0-9]+ path)."""
    from goetl_spark.operators.tokenizer import (
        learn_unigram_vocab, unigram_tokenize)

    rows = [(i, "Spark Spark Spark MERGE MERGE") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = learn_unigram_vocab(df, vocab_size=20, seed_size=100,
                                max_piece_len=8, iterations=1,
                                lowercase=False)
    pieces = dict(vocab)
    # whole mixed-case / uppercase words survive intact — under the old
    # lowercase-only split they shattered into 'park' + uppercase chars
    assert "Spark" in pieces and "MERGE" in pieces
    # coverage chars include the uppercase alphabet actually seen
    assert "S" in pieces and "M" in pieces
    out = unigram_tokenize(
        spark.createDataFrame([(1, "Spark MERGE")],
                              "doc_id long, text string"),
        pieces, unk_score=None, lowercase=False).first()
    assert out["tokens"] == ["Spark", "MERGE"]
