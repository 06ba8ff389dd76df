"""Text analysis operators for training-data pipelines.

Beyond the reference surface (BASELINE.json north star): language ID,
quality scoring, token counting, document fingerprinting. All pure
Column-expression pipelines — no Python UDFs — so they run JVM-side in
whole-stage codegen and scale linearly with no shuffle (per-document map
work). At 100 TB these are exactly the ops you want to be scan-bound.

Determinism: every function is a pure expression over the document text,
so results are reproducible and oracle-checkable in SQL. (Exception:
:func:`compression_ratio` needs real bytes, so it is an Arrow-batched
pandas UDF — still map-only and deterministic, just not SQL-mirrorable.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small, fixed stopword lists for the language-ID heuristic — deliberately
# tiny so the same lists can be inlined into oracle SQL
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "que"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ein", "auf"],
}

_PUNCT_CLASS = r"[.!?,;:]"


def spread_small_input(df: DataFrame) -> DataFrame:
    """Spread an under-partitioned input across the cluster before a
    per-row-heavy map stage (guide §2.5 "input skew — one huge
    unsplittable file ... repartition immediately after the read"): a
    small parquet table is often ONE row group = ONE scan partition,
    so an expensive map pass (shingling, per-ngram hashing, per-token
    simhash, vector kernels) runs on a single core while the rest of
    the cluster idles. Round-robin repartition to the default
    parallelism when the input carries fewer scan partitions than the
    machine; a corpus-scale input already has >= parallelism partitions
    and this is a NO-OP — the shuffle only ever moves a
    sub-parallelism-partition (i.e. small) input. The kmeans_fit
    spread, promoted to a shared helper (r17 optimization round).

    The under-partitioned test uses the optimizer's size estimate, NOT
    ``df.rdd.getNumPartitions()``: under AQE ``.rdd`` materializes
    every upstream query stage — a full throwaway execution whose
    shuffles the real run does not reuse (the same pitfall
    sampling.py::_plan_free_partitions documents; r18 fix). Scan
    partitions ~= bytes / maxPartitionBytes (128 MB), so "fewer
    partitions than cores" is "estimated size under cores x 128 MB";
    estimation failure spreads nothing (never a throwaway execution)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    try:
        size = int(str(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    except Exception:
        return df
    if size < par * (128 << 20):
        return df.repartition(par)
    return df


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization (the baseline tokenizer)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, r"\s+")


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: str | Column) -> Column:
    """Subword-ish token count: splits on whitespace AND word/punct/digit
    boundaries — a deterministic regex approximation of BPE pre-tokenization
    (the GPT-2 pre-tokenizer splits letters/digits/punct runs apart)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)))


def stopword_hits(col: str | Column, lang: str) -> Column:
    """Count of tokens that are stopwords of ``lang``."""
    toks = tokens(col)
    words = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: F.lower(t).isin(words)))


def detect_language(col: str | Column) -> Column:
    """Heuristic language ID: argmax of per-language stopword hits with a
    fixed tie-break order (en > es > fr > de). Deterministic; designed to
    be replicable in oracle SQL with the same lists."""
    s_en = stopword_hits(col, "en")
    s_es = stopword_hits(col, "es")
    s_fr = stopword_hits(col, "fr")
    s_de = stopword_hits(col, "de")
    return (
        F.when((s_en >= s_es) & (s_en >= s_fr) & (s_en >= s_de), F.lit("en"))
        .when((s_es >= s_fr) & (s_es >= s_de), F.lit("es"))
        .when(s_fr >= s_de, F.lit("fr"))
        .otherwise(F.lit("de"))
    )


def punct_ratio(col: str | Column) -> Column:
    """Punctuation chars / total chars."""
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, _PUNCT_CLASS, ""))
    return n_punct.cast("double") / F.length(c)


def mean_word_length(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.length(F.regexp_replace(c, r"\s+", ""))
    return stripped.cast("double") / token_count(col)


def quality_score(col: str | Column, lang: str = "en") -> Column:
    """Composite quality score in [0,1]: length band + stopword presence +
    punctuation sanity + word-length sanity.

    Heuristics follow the C4/Gopher-style filters (length bounds, symbol
    ratios, stopword presence) as simple deterministic arithmetic.
    """
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    n_tokens = token_count(col)
    sw_ratio = stopword_hits(col, lang).cast("double") / n_tokens
    p_ratio = punct_ratio(col)
    mwl = mean_word_length(col)

    length_ok = F.when((n_chars >= 100) & (n_chars <= 20000), 1.0).otherwise(0.0)
    token_ok = F.when((n_tokens >= 20) & (n_tokens <= 5000), 1.0).otherwise(0.0)
    sw_ok = F.when(sw_ratio >= 0.01, 1.0).otherwise(0.0)
    punct_ok = F.when(p_ratio <= 0.1, 1.0).otherwise(0.0)
    mwl_ok = F.when((mwl >= 2.0) & (mwl <= 12.0), 1.0).otherwise(0.0)
    return (length_ok + token_ok + sw_ok + punct_ok + mwl_ok) / F.lit(5.0)


# PII patterns kept RE2-compatible (no lookarounds) so the identical
# regex runs in Java (Spark) and RE2 (DuckDB oracle) with the same matches
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    "phone": (r"\+[0-9][0-9\- ]{7,}[0-9]", "<PHONE>"),
}


def redact_pii(col: str | Column, kinds: tuple[str, ...] = ("email", "ipv4", "phone")) -> Column:
    """Replace PII spans with typed placeholders — the standard scrub pass
    before a corpus enters training. Pure regexp_replace chain: JVM-side,
    scan-bound, zero shuffle; patterns applied in the order given."""
    c = F.col(col) if isinstance(col, str) else col
    for kind in kinds:
        pat, repl = PII_PATTERNS[kind]
        c = F.regexp_replace(c, pat, repl)
    return c


# common named entities; numeric entities other than &#39; are left as-is
# (decoding the long tail isn't worth a UDF in the cleaning hot path)
_HTML_ENTITIES = [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                  ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " ")]


def strip_html(col: str | Column) -> Column:
    """Drop markup from a web-corpus text column: script/style blocks
    with their contents, then every remaining tag, then the common named
    entities — the first cleaning pass for crawled HTML. Pure
    regexp_replace/replace chain (RE2-portable, no lookarounds):
    JVM-side, scan-bound, zero shuffle, mirrorable in any SQL engine.
    Not a spec-complete HTML parser (CDATA, conditional comments and
    malformed nesting pass through) — corpus cleaning wants cheap and
    deterministic, not lossless DOM fidelity."""
    c = F.col(col) if isinstance(col, str) else col
    # (?is): case-insensitive, dot-matches-newline — both RE2-supported
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?s)<[^>]+>", " ")
    for ent, ch in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def normalize_whitespace(col: str | Column) -> Column:
    """Collapse runs of whitespace (incl. newlines/tabs) to single spaces
    and trim — the companion pass after :func:`strip_html` so token
    counts and shingles are stable across markup variants."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def md5_int(col: Column, hex_chars: int = 8) -> Column:
    """First ``hex_chars`` hex digits of md5 as a bigint — the shared,
    engine-portable hash used by fingerprinting/minhash (DuckDB can compute
    the identical value, unlike xxhash64/murmur)."""
    return F.conv(F.substring(F.md5(col), 1, hex_chars), 16, 10).cast("bigint")


def fingerprint(col: str | Column, k: int = 5) -> Column:
    """Rolling-hash document fingerprint: min md5-int over all character
    ``k``-grams (winnowing with window = whole doc). Equal fingerprints →
    near-certain shared k-gram; cheap first-pass clustering key."""
    c = F.col(col) if isinstance(col, str) else col
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(1))),
        lambda i: c.substr(i, F.lit(k)),
    )
    return F.array_min(F.transform(grams, lambda g: md5_int(g)))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the standard text-stat columns in one projection."""
    return df.withColumns({
        "n_tokens": token_count(text_col),
        "n_tokens_bpe": bpe_ish_token_count(text_col),
        "lang_pred": detect_language(text_col),
        "punct_ratio": punct_ratio(text_col),
        "quality": quality_score(text_col),
        "fingerprint": fingerprint(text_col),
    })


def remove_repeated_segments(col: str | Column, sep: str = "\n") -> Column:
    """C4-style within-document repetition removal: drop repeated
    segments (lines, sentences, tokens — whatever ``sep`` splits) keeping
    the FIRST occurrence, order preserved.

    Pure expression: ``split → array_distinct → array_join``. Spark's
    ``array_distinct`` keeps first-occurrence order, which is the C4
    semantic (the first copy of a boilerplate line survives, later ones
    go). Zero shuffle, zero UDF — scan-bound like the rest of this
    module. (DuckDB's ``list_distinct`` does NOT preserve order; the
    cross-engine oracle uses an index-position filter instead —
    goetl_spark/queries.py q71.)
    """
    import re as _re

    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(F.array_distinct(F.split(c, _re.escape(sep))), sep)


def bm25_scores(
    df: DataFrame, query_terms: "list[str]", text_col: str = "text",
    id_col: str = "doc_id", k1: float = 1.2, b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 relevance for a bag of query terms — the
    standard lexical ranking function (Robertson/Sparck Jones; the
    Lucene/Elasticsearch default), and the workhorse for corpus search,
    quality-weighted sampling, and seed-document expansion in a
    training-data pipeline.

    score(D) = Σ_t idf_t · tf_t·(k1+1) / (tf_t + k1·(1 − b + b·dl/avgdl))
    with idf_t = ln(1 + (N − df_t + 0.5)/(df_t + 0.5)) (the +1 form —
    never negative).

    Scale shape: tokenization and per-term tf are pure Column
    expressions (lowercase split on non-alphanumeric, empties dropped) —
    JVM-side, codegen, zero UDF; the corpus statistics (N, avgdl, df_t)
    come from ONE tiny aggregate whose scalars broadcast into a map-only
    scoring projection. No shuffle of document rows at any point, so the
    op stays scan-bound at 100 TB. Returns (id_col, dl, tf_<term>...,
    score) with the score summed in query-term order (deterministic
    float addition order — mirrors the SQL oracle term-for-term).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    # dedupe (order-preserving): repeated terms would emit duplicate
    # tf_<term> columns and make the stats agg ambiguous
    query_terms = list(dict.fromkeys(query_terms))
    c = F.col(text_col)
    toks = F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda x: x != "")

    def _tf(term: str):
        # closure factory, NOT a two-param lambda: F.filter passes the
        # element INDEX to a second lambda parameter
        return F.size(F.filter(toks, lambda x: x == term))

    base = df.select(
        id_col,
        F.size(toks).alias("dl"),
        *[_tf(t).alias(f"tf_{t}") for t in query_terms],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("sum_dl"),
        *[F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
          for t in query_terms],
    ).collect()[0]
    n = stats["n"]
    if not n:
        raise ValueError("bm25_scores: corpus is empty (no rows to score)")
    avgdl = stats["sum_dl"] / n  # exact ints -> one IEEE division
    score = None
    for t in query_terms:
        import math

        idf = math.log(1.0 + (n - stats[f"df_{t}"] + 0.5)
                       / (stats[f"df_{t}"] + 0.5))
        tf = F.col(f"tf_{t}").cast("double")
        term = F.lit(idf) * tf * (k1 + 1.0) / (
            tf + k1 * (1.0 - b + b * F.col("dl").cast("double") / avgdl))
        score = term if score is None else score + term
    return base.withColumn("score", score)


def vocabulary(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Corpus vocabulary: per token, total occurrences (``n``) and
    document frequency (``df_docs``) — the input to stopword discovery,
    BPE-merge seeding, and idf tables (:func:`bm25_scores` could read
    its df's from here instead of per-query aggregation).

    Same tokenizer as BM25 (lowercase, split on non-alphanumeric,
    empties dropped). Scale shape: explode → ONE partially-aggregated
    groupBy on the token — counts combine map-side, so the shuffle
    carries ≤ |vocab| rows per partition, not corpus tokens;
    ``count_distinct(doc_id)`` rides the same exchange."""
    c = F.col(text_col)
    toks = F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda t: t != "")
    return (
        df.select(F.col(id_col), F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"),
             F.count_distinct(F.col(id_col)).alias("df_docs"))
    )


def split_sentences(col: str | Column) -> Column:
    """Sentence segmentation as a pure Column expression (array of
    trimmed sentences): split after ``.!?`` runs followed by
    whitespace, keeping the terminator with its sentence. Heuristic by
    design (no abbreviation dictionary — 'Dr. Smith' splits); the
    zero-UDF primitive for sentence-level chunking, per-sentence
    dedup, and quality stats. Empty fragments drop."""
    c = F.col(col) if isinstance(col, str) else col
    # insert a sentinel after terminator+space runs, then split on it —
    # RE2-portable (no lookbehind)
    marked = F.regexp_replace(c, r"([.!?]+)\s+", "$1\x1f")
    return F.filter(
        F.transform(F.split(marked, "\x1f"), lambda s: F.trim(s)),
        lambda s: s != "")


def sentence_stats(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-document sentence statistics (count, mean length in chars)
    from :func:`split_sentences` — all expression-level, zero shuffle
    beyond the scan."""
    sents = split_sentences(text_col)
    n = F.size(sents)
    total_chars = F.aggregate(
        F.transform(sents, lambda s: F.length(s)),
        F.lit(0), lambda acc, x: acc + x)
    return df.select(
        F.col(id_col),
        n.alias("n_sentences"),
        F.when(n > 0, total_chars / n).alias("mean_sentence_chars"))


def readability_scores(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Flesch reading-ease and Flesch–Kincaid grade level per document
    (ref test surface: quality scoring family; Flesch 1948 / Kincaid
    1975 constants). Deterministic regex proxies keep every count a
    pure JVM expression and the whole thing SQL-mirrorable:

    - words      = non-whitespace runs (``\\S+``)
    - syllables  = ``[aeiouy]+`` vowel-group runs in the lowercased
      text (the standard dictionary-free estimator; 'the' → 1,
      'beautiful' → eau+i+u ≈ 3)
    - sentences  = :func:`split_sentences` count, floored at 1 so a
      fragment without a terminator is one sentence

    ``flesch_ease`` = 206.835 − 1.015·(W/S) − 84.6·(Syl/W);
    ``fk_grade`` = 0.39·(W/S) + 11.8·(Syl/W) − 15.59. Both NULL when
    the document has zero words, both rounded at 1e-6 (house ln/round
    convention) so cross-engine compares are hash-exact. Zero UDF,
    zero shuffle beyond the scan — at 100 TB this is a mapper fused
    into whatever pass already reads the text."""
    c = F.col(text_col)
    words = F.size(F.regexp_extract_all(c, F.lit(r"\S+"), F.lit(0)))
    syl = F.regexp_count(F.lower(c), F.lit(r"[aeiouy]+"))
    sents = F.greatest(F.size(split_sentences(text_col)), F.lit(1))
    wps = words.cast("double") / sents.cast("double")
    spw = syl.cast("double") / words.cast("double")
    ease = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    grade = F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    nz = words > 0
    return df.select(
        F.col(id_col),
        words.alias("n_words"),
        sents.alias("n_sentences"),
        syl.alias("n_syllables"),
        F.when(nz, F.round(ease, 6)).alias("flesch_ease"),
        F.when(nz, F.round(grade, 6)).alias("fk_grade"))


# the 8-word presence list from the Gopher paper's document filter
# (Rae et al. 2021, arXiv:2112.11446, Appendix A1.1) — fixed and tiny so
# the identical list inlines into oracle SQL
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50, max_words: int = 100_000,
    min_mean_word_len: float = 3.0, max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher document-level quality rules (Rae et al. 2021, Appendix A)
    as one flag per rule plus the conjunction ``gopher_pass`` — the
    standard pre-training corpus filter, applied before dedup.

    Appended columns: ``n_words`` (int) and booleans ``words_ok``
    (count in [min_words, max_words]), ``mwl_ok`` (mean word length in
    [3, 10]), ``symbol_ok`` (hash+ellipsis per word ≤ 0.1), ``bullet_ok``
    (≤ 90% of lines start with a bullet), ``ellipsis_ok`` (≤ 30% of
    lines end with …), ``alpha_ok`` (≥ 80% of words contain a letter),
    ``stopword_ok`` (≥ 2 distinct words of the paper's 8-word list
    present), and ``gopher_pass``.

    Scale: pure Column expressions over the text (split / filter /
    regexp — all JVM-side higher-order functions), so the pass is
    scan-bound map work with zero shuffle and survives 100 TB unchanged.
    Integer counts + boolean flags only — no float ratio columns — so
    results hash identically cross-engine. Every regex is RE2-portable
    (no lookarounds) and each flag is a single expression, mirrorable
    one-to-one in oracle SQL (DuckDB ``list_filter`` + ``regexp_matches``).
    """
    c = F.col(text_col)
    # regexp trim, not F.trim: SQL trim() strips only spaces, so a
    # newline-padded doc would grow phantom empty words (caught by the
    # hypothesis property vs the pure-Python reference)
    trimmed = F.regexp_replace(c, r"^\s+|\s+$", "")
    words = F.split(trimmed, r"\s+")
    # split('') yields [''] — count words only when the trimmed text is
    # non-empty, and floor the ratio denominator at 1 so empty docs fail
    # words_ok instead of dividing by zero
    n_words = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(F.size(words))
    denom = F.greatest(n_words, F.lit(1)).cast("double")

    non_space_chars = F.length(F.regexp_replace(c, r"\s+", ""))
    mwl = non_space_chars.cast("double") / denom

    hashes = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    dots3 = (F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))) / 3
    uni_ell = F.length(c) - F.length(F.replace(c, F.lit("…"), F.lit("")))
    symbol_ratio = (hashes + dots3 + uni_ell).cast("double") / denom

    lines = F.split(c, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_lines = F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]")))
    ellipsis_lines = F.size(F.filter(
        lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$")))

    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))

    low = F.lower(c)
    sw_hits = None
    for w in GOPHER_STOPWORDS:
        hit = low.rlike(rf"(^|[^a-z]){w}([^a-z]|$)").cast("int")
        sw_hits = hit if sw_hits is None else sw_hits + hit

    flags = {
        "words_ok": (n_words >= min_words) & (n_words <= max_words),
        "mwl_ok": (mwl >= min_mean_word_len) & (mwl <= max_mean_word_len),
        "symbol_ok": symbol_ratio <= max_symbol_ratio,
        "bullet_ok": bullet_lines / n_lines <= max_bullet_ratio,
        "ellipsis_ok": ellipsis_lines / n_lines <= max_ellipsis_ratio,
        "alpha_ok": alpha_words.cast("double") / denom >= min_alpha_ratio,
        "stopword_ok": sw_hits >= min_stopword_hits,
    }
    out = df.withColumn("n_words", n_words)
    gopher_pass = None
    for name, expr in flags.items():
        out = out.withColumn(name, expr)
        gopher_pass = expr if gopher_pass is None else gopher_pass & expr
    return out.withColumn("gopher_pass", gopher_pass)


def compression_ratio(col: str | Column):
    """zlib-compressed length / raw byte length — the classic
    "too compressible = templated junk, too incompressible = random
    noise" quality signal (complement of :func:`char_entropy`'s
    model-free cousin; both band natural text in a narrow range).
    NULL/empty text → NULL.

    Arrow-batched pandas UDF (compression needs real bytes — no Column
    expression can do it), map-only over the scan, so it scales like
    every other per-document scorer. zlib level 6 is pinned for
    reproducibility across runs; treat cross-version drift as possible
    and compare bands, not exact ratios, in cross-system contracts."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _ratio(texts):
        import zlib

        def one(t):
            if t is None or len(t) == 0:
                return None
            raw = t.encode("utf-8")
            return len(zlib.compress(raw, 6)) / len(raw)

        return texts.map(one)

    # real annotation objects: the module-wide `from __future__ import
    # annotations` would otherwise hand pandas_udf unresolvable strings
    _ratio.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    c = F.col(col) if isinstance(col, str) else col
    return pandas_udf(_ratio, "double")(c)


def normalize_unicode(col: str | Column, form: str = "NFC",
                      strip_controls: bool = False) -> Column:
    """Unicode-normalize text (NFC/NFD/NFKC/NFKD) — the canonical
    first pass of corpus hygiene: composed-vs-decomposed accents,
    full-width forms (NFKC), and ligatures otherwise defeat exact and
    shingle dedup on byte-identical prose.

    The normalization table lookup has no Spark builtin, so this is the
    one Arrow-batched pandas step (``Series.str.normalize`` — NULLs
    propagate); ``strip_controls`` then removes C0/DEL control
    characters except tab/newline JVM-side. Map-only either way: no
    shuffle, scan-bound at any scale. NFC agrees with DuckDB's
    ``nfc_normalize`` on the common plane (staged oracle pins it);
    NFKC/NFKD have no DuckDB twin and are pytest-covered.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    def _norm(texts):
        return texts.str.normalize(form)

    # real annotation objects — see compression_ratio's note on the
    # module-wide `from __future__ import annotations`
    _norm.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    c = F.col(col) if isinstance(col, str) else col
    out = pandas_udf(_norm, "string")(c)
    if strip_controls:
        out = F.regexp_replace(
            out, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "")
    return out


def tfidf_vectors(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
    min_df: int = 1,
) -> DataFrame:
    """Sparse TF-IDF vectors over the corpus's top-``vocab_size``
    vocabulary — the classic lexical feature extraction (sklearn's
    smooth-idf form: ``idf = ln((1 + N) / (1 + df)) + 1``, never
    negative, tf left raw). One output row per (doc, vocab term) with
    a nonzero count; feed to the quality classifier, clustering, or
    cosine retrieval as an exact, cheap alternative to embeddings.

    Scale shape: tokenization is the same pure-Column split
    :func:`bm25_scores` uses; (doc, term) counts shuffle once with
    map-side combine; document frequencies reduce that table by term;
    the vocabulary (≤ ``vocab_size`` rows, (df DESC, term) ordered for
    determinism) collects to the driver where idf is computed with
    libm ``ln`` (bit-identical to DuckDB's — the q102 precedent) and
    broadcast back, so scoring is a map-side hash join + one float
    multiply. Nothing driver-side scales with corpus size.
    """
    import math

    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    c = F.col(text_col)
    toks = F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda x: x != "")
    n_docs = df.count()
    tf = (df.select(F.col(id_col), F.explode(toks).alias("term"))
          .groupBy(id_col, "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    dfs = (tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
           .filter(F.col("df") >= min_df)
           .orderBy(F.desc("df"), "term")
           .limit(vocab_size)
           .collect())
    spark = df.sparkSession
    vocab = spark.createDataFrame(
        [(r["term"], int(r["df"]),
          math.log((1.0 + n_docs) / (1.0 + r["df"])) + 1.0)
         for r in dfs],
        "term string, df long, idf double")
    return (tf.join(F.broadcast(vocab), "term")
            .select(id_col, "term", "tf",
                    (F.col("tf") * F.col("idf")).alias("tfidf")))


def term_blocklist_hits(
    df: DataFrame,
    terms,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_prefix: str = "block",
    broadcast_threshold: int = 1_000_000,
) -> DataFrame:
    """Flag documents against a term blocklist (profanity / unsafe-topic
    / PII-keyword lists — the filter every production corpus pass runs).

    Matching is TOKEN-exact, not substring: the document lowercases and
    splits on non-alphanumeric runs (the same tokenization
    :func:`tfidf_vectors` and :func:`vocabulary` use, so "class" never
    trips a blocklist entry "ass"), and a token hits when it equals a
    (lowercased) blocklist term. Appends three columns:
    ``<prefix>_hits`` total occurrences, ``<prefix>_terms`` the sorted
    distinct terms that hit, ``<prefix>_flag`` hits > 0.

    ``terms`` is a Python list (inlined as a broadcast literal table) or
    a DataFrame with a ``term`` column — the 100 TB path: a million-term
    list stays a DataFrame, is deduped lowercased, and joins the
    exploded token stream map-side when under ``broadcast_threshold``
    rows (the explode is a flatMap — no shuffle; only per-document hit
    aggregates move). Documents with no hits keep hits=0 via the final
    left join on ``id_col``, which also means the corpus text itself is
    never shuffled — just (id, count, terms) triples.
    """
    spark = df.sparkSession
    if isinstance(terms, DataFrame):
        term_df = terms.select(F.lower(F.col("term")).alias("term")).distinct()
        n_terms = term_df.count()
    else:
        uniq = sorted({t.lower() for t in terms})
        if not uniq:
            raise ValueError("terms must be non-empty")
        term_df = spark.createDataFrame([(t,) for t in uniq], "term string")
        n_terms = len(uniq)
    if n_terms <= broadcast_threshold:
        term_df = F.broadcast(term_df)

    c = F.col(text_col)
    toks = F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda x: x != "")
    hits = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .join(term_df, "term")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias(f"{out_prefix}_hits"),
             F.array_sort(F.collect_set("term"))
              .alias(f"{out_prefix}_terms"))
    )
    return (
        df.join(hits, id_col, "left")
        .withColumn(f"{out_prefix}_hits",
                    F.coalesce(F.col(f"{out_prefix}_hits"), F.lit(0)))
        .withColumn(f"{out_prefix}_terms",
                    F.coalesce(F.col(f"{out_prefix}_terms"),
                               F.array().cast("array<string>")))
        .withColumn(f"{out_prefix}_flag", F.col(f"{out_prefix}_hits") > 0)
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_cols: Sequence[str] = ("doc_id",),
    top_n: int = 2,
    dup_n: int = 5,
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top_ngram_char_frac: float = 0.20,
    max_dup_ngram_char_frac: float = 0.15,
) -> DataFrame:
    """Gopher repetition rules (Rae et al. 2021, Appendix A1 "Repetition
    removal") — the within-document complement of
    :func:`gopher_quality_flags`' document-level section: documents made
    of repeated lines or a few looping n-grams are boilerplate/spam even
    when their word counts and symbol ratios look healthy.

    Per input row, appends:

    - ``n_lines``, ``dup_line_frac`` — fraction of non-empty trimmed
      lines that are repeats of an earlier line (``1 - distinct/total``);
    - ``dup_line_char_frac`` — fraction of line characters contributed
      by those repeat occurrences (total line chars minus the chars of
      one copy of each distinct line, over total line chars);
    - ``top_ngram_char_frac`` — the paper's "fraction of characters
      contained in the most frequently-occurring {top_n}-gram":
      ``count * chars(gram)`` of the HIGHEST-COUNT word {top_n}-gram
      divided by total word characters (joining spaces excluded on both
      sides; ties on count resolve toward the larger product, so the
      stat is deterministic and order-independent);
    - ``dup_ngram_char_frac`` — fraction of word characters covered by
      {dup_n}-grams occurring at least twice, counting EVERY occurrence
      (``sum(count * chars)`` over duplicated grams / total word chars).
      Deviation from the paper noted: Rae et al. count overlapping
      occurrences' characters once; the occurrence-weighted sum used
      here is deterministic, engine-portable, and upper-bounds it;
    - per-rule booleans ``dup_line_ok`` / ``dup_line_char_ok`` /
      ``top_ngram_ok`` / ``dup_ngram_ok`` and the conjunction
      ``rep_pass`` (paper thresholds: 0.30 / 0.20 / 0.20(n=2) /
      0.15(n=5) as defaults).

    Words are the corpus tokenizer's convention (lowercase, split on
    ``[^a-z0-9]+`` — lm.py/q116); lines are ``\\n``-split, space-trimmed,
    non-empty. Empty docs yield 0.0 fractions and pass.

    Scale shape: line stats and n-gram ASSEMBLY are pure higher-order
    Column expressions (zero shuffle). The per-doc top/dup n-gram
    frequencies need within-doc grouping, so the grams explode into
    (doc, gram) rows and aggregate twice — groupBy(doc, gram) then
    groupBy(doc) — i.e. two map-side-combinable shuffles proportional to
    corpus token count, then one equi-join back on the doc key. No
    driver state, no UDFs; every fraction is a single int/int double
    division, so results hash identically cross-engine.
    """
    for p, nm in ((top_n, "top_n"), (dup_n, "dup_n")):
        if p < 1:
            raise ValueError(f"{nm} must be >= 1, got {p}")
    ids = [F.col(c) for c in id_cols]
    c = F.col(text_col)

    lines = F.filter(
        F.transform(F.split(c, "\n"), lambda l: F.trim(l)),
        lambda l: l != "")
    dist = F.array_distinct(lines)
    chars_of = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0), lambda a, x: a + F.length(x))
    n_lines = F.size(lines)
    line_chars = chars_of(lines)
    dist_chars = chars_of(dist)
    dup_line_frac = F.when(
        n_lines > 0,
        (n_lines - F.size(dist)).cast("double") / n_lines
    ).otherwise(F.lit(0.0))
    dup_line_char_frac = F.when(
        line_chars > 0,
        (line_chars - dist_chars).cast("double") / line_chars
    ).otherwise(F.lit(0.0))

    words = F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda x: x != "")
    word_chars = chars_of(words)

    def grams(n: int) -> Column:
        # i-th gram joins words[i..i+n-1]; empty when the doc is shorter
        return F.when(F.size(words) >= n, F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        )).otherwise(F.array().cast("array<string>"))

    base = df.withColumn("n_lines", n_lines) \
             .withColumn("dup_line_frac", dup_line_frac) \
             .withColumn("dup_line_char_frac", dup_line_char_frac) \
             .withColumn("__wc", word_chars)

    def gram_agg(n: int, agg_expr, alias: str) -> DataFrame:
        counted = (
            base.select(*id_cols, F.explode(grams(n)).alias("__g"))
            .groupBy(*id_cols, "__g")
            .agg(F.count(F.lit(1)).alias("__cnt"))
            # chars of one occurrence, joining spaces excluded
            .withColumn("__gc", F.length(F.col("__g")) - (n - 1))
        )
        return counted.groupBy(*id_cols).agg(agg_expr.alias(alias))

    # the paper's rule: chars of the MOST FREQUENTLY-OCCURRING gram —
    # struct max picks highest count first, then the larger count*chars
    # product as a deterministic, engine-portable tie-break (plain
    # max(cnt*gc) would let a long-but-rare gram outrank the most
    # frequent one)
    top = gram_agg(
        top_n,
        F.max(F.struct(F.col("__cnt").alias("c"),
                       (F.col("__cnt") * F.col("__gc")).alias("p")))["p"],
        "__top_chars")
    dup = gram_agg(
        dup_n,
        F.sum(F.when(F.col("__cnt") >= 2,
                     F.col("__cnt") * F.col("__gc")).otherwise(F.lit(0))),
        "__dup_chars")

    out = (
        base.join(top, list(id_cols), "left")
        .join(dup, list(id_cols), "left")
        .withColumn(
            "top_ngram_char_frac",
            F.when(F.col("__wc") > 0,
                   F.coalesce(F.col("__top_chars"), F.lit(0))
                   .cast("double") / F.col("__wc"))
            .otherwise(F.lit(0.0)))
        .withColumn(
            "dup_ngram_char_frac",
            F.when(F.col("__wc") > 0,
                   F.coalesce(F.col("__dup_chars"), F.lit(0))
                   .cast("double") / F.col("__wc"))
            .otherwise(F.lit(0.0)))
        .drop("__wc", "__top_chars", "__dup_chars")
        .withColumn("dup_line_ok", F.col("dup_line_frac") <= max_dup_line_frac)
        .withColumn("dup_line_char_ok",
                    F.col("dup_line_char_frac") <= max_dup_line_char_frac)
        .withColumn("top_ngram_ok",
                    F.col("top_ngram_char_frac") <= max_top_ngram_char_frac)
        .withColumn("dup_ngram_ok",
                    F.col("dup_ngram_char_frac") <= max_dup_ngram_char_frac)
    )
    return out.withColumn(
        "rep_pass",
        F.col("dup_line_ok") & F.col("dup_line_char_ok")
        & F.col("top_ngram_ok") & F.col("dup_ngram_ok"))


def vocab_coverage(
    df: DataFrame,
    vocab_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_col: str = "token",
) -> DataFrame:
    """Per-document vocabulary coverage / OOV rate against a fixed
    vocabulary table (e.g. the top-N rows of :func:`vocabulary`, a
    learned BPE/WordPiece vocab, or a product glossary): appends
    ``n_tokens``, ``n_oov`` (tokens absent from ``vocab_df``) and
    ``oov_rate`` — the standard pre-flight check before committing a
    tokenizer to a corpus (high OOV ⇒ wrong domain or wrong vocab
    size). Same tokenizer convention as :func:`vocabulary`. Empty docs
    get 0/0/0.0.

    Scale shape: the vocabulary is BROADCAST (vocabularies are bounded
    by construction — collecting them is the tokenizer-family
    contract), tokens explode map-side into one doc-keyed
    partially-aggregated groupBy, and one equi-join puts the counts
    back on the rows. No driver state beyond the broadcast."""
    vocab = F.broadcast(
        vocab_df.select(F.col(token_col).alias("__v")).distinct())
    c = F.col(text_col)
    toks = F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda t: t != "")
    per = (
        df.select(F.col(id_col), F.explode(toks).alias("__t"))
        .join(vocab, F.col("__t") == F.col("__v"), "left")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tokens"),
             F.sum(F.when(F.col("__v").isNull(), 1).otherwise(0))
             .alias("n_oov"))
    )
    return (
        df.join(per, id_col, "left")
        .withColumn("n_tokens", F.coalesce(F.col("n_tokens"), F.lit(0)))
        .withColumn("n_oov", F.coalesce(F.col("n_oov"), F.lit(0)))
        .withColumn(
            "oov_rate",
            F.when(F.col("n_tokens") > 0,
                   F.col("n_oov").cast("double") / F.col("n_tokens"))
            .otherwise(F.lit(0.0)))
    )


def vocabulary_richness(df: DataFrame, text_col: str = "text",
                        group_cols=()) -> DataFrame:
    """Vocabulary saturation diagnostics — "how much of this corpus
    slice's TRUE vocabulary have we actually seen?", the
    collect-more-or-stop question a data-acquisition loop asks per
    language/source. One row per group: ``n_tokens / distinct_tokens
    / f1 / f2 / chao1 / coverage`` — ``chao1`` is the bias-corrected
    Chao (1984) richness floor ``D + f1(f1−1)/(2(f2+1))`` estimating
    the unseen-species mass from singletons/doubletons, and
    ``coverage`` the Good-Turing sample coverage ``1 − f1/n`` (the
    probability the NEXT token drawn is one we already know).

    Same tokenizer as :func:`vocabulary`/BM25 (lowercase, split on
    non-alphanumeric, empties dropped) so richness numbers are
    comparable with every other text diagnostic. NULL/empty texts
    simply contribute no tokens; a group with zero tokens emits
    nothing (there is no sample to estimate from).

    Determinism: D/f1/f2/n are exact longs off the frequency table;
    chao1's rational correction lands on the exact 1e-9 grid by
    integer floor division (the q236 discipline; f1 ≲ 3e9 keeps the
    DECIMAL(38) intermediate in range — vocabularies are bounded by
    construction long before that) and adds to D in one IEEE op;
    coverage is one exact long/long division — hash-exact in oracle
    SQL.

    Scale shape: explode → ONE partially-aggregated (group, token)
    collapse (the shuffle carries per-partition vocabularies, never
    corpus tokens — the :func:`vocabulary` shape) → one groups-
    bounded aggregate over the frequency table. No window, no join,
    no collect."""
    groups = list(group_cols)
    c = F.col(text_col)
    toks = F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda t: t != "")
    freq = (df.select(*groups, F.explode(toks).alias("__t"))
            .groupBy(*groups, "__t")
            .agg(F.count(F.lit(1)).alias("__c")))
    aggs = [
        F.sum("__c").alias("__n"),
        F.count(F.lit(1)).alias("__d"),
        F.sum(F.when(F.col("__c") == 1, 1).otherwise(0)).alias("__f1"),
        F.sum(F.when(F.col("__c") == 2, 1).otherwise(0)).alias("__f2"),
    ]
    m = freq.groupBy(*groups).agg(*aggs) if groups else freq.agg(*aggs)
    chao9 = F.expr("""
        (CAST(__f1 AS DECIMAL(19,0)) * (__f1 - 1) * 1000000000)
        DIV (2 * (__f2 + 1))""")
    return (m.filter(F.col("__n").isNotNull())
            .select(*groups,
                    F.col("__n").cast("long").alias("n_tokens"),
                    F.col("__d").cast("long").alias("distinct_tokens"),
                    F.col("__f1").cast("long").alias("f1"),
                    F.col("__f2").cast("long").alias("f2"),
                    (F.col("__d").cast("double")
                     + chao9.cast("double") / F.lit(1.0e9)).alias("chao1"),
                    (F.lit(1.0) - F.col("__f1") / F.col("__n"))
                     .alias("coverage")))
