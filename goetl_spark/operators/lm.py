"""Statistical language-model corpus scoring: bigram log-probability,
token-distribution KL divergence, character entropy.

The data-quality trio a pretraining pipeline runs before (and after)
filtering: LM fluency scoring flags boilerplate/garbage text, KL
divergence quantifies domain drift between corpus slices, and char
entropy catches low-diversity documents (repeated padding, binary
spill). All three are pure DataFrame compositions over the shared
tokenizer (lowercase, split on non-alphanumeric — same convention as
text.vocabulary / text.bm25_scores so df/idf tables interoperate).

Cross-engine float determinism: ``ln`` is a libm call and Spark's JVM
log differs from DuckDB's in the last ulp for ~2 % of inputs (measured
in this sandbox), so every log-term is ROUNDED (half-away-from-zero,
identical in both engines) before being summed EXACTLY as a decimal —
sums are then order-independent and bit-equal, and only the final
divide runs in doubles. The rounding granularity (1e-6 per bigram
term, 1e-9 for entropy/KL terms) is far below any useful signal in
these scores.

Scale design: token/bigram count tables are built with map-side
partial aggregation (shuffle carries ≤ |vocab| rows per partition);
scoring joins are equi-joins on token keys, never broadcast-assumed
(a 100 TB corpus has a bigram table far beyond driver memory); the
three corpus scalars (N, V, total) ride a one-row crossJoin broadcast.
Bigram extraction is slice+zip inside the row (map-only) — the
token stream is never exploded twice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _tokens(text_col: str) -> Column:
    return F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda t: t != "")


def _rounded_decimal_sum(term: Column, scale: int, alias: str) -> Column:
    return F.sum(F.round(term, scale).cast(f"decimal(38,{scale})")) \
        .cast("double").alias(alias)


def bigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> DataFrame:
    """Average add-k-smoothed bigram log-probability per document,
    trained on the same corpus (self-scoring — the usual first-pass
    fluency filter). P(w2|w1) = (c(w1,w2)+k) / (c(w1)+k·V) with V the
    unigram vocabulary size. Documents with < 2 tokens drop out (no
    bigrams to score). Returns (id_col, n_bigrams, avg_logprob)."""
    toks = _tokens(text_col)
    base = df.select(F.col(id_col), toks.alias("__toks"))

    n = F.size("__toks")
    bigrams = base.select(
        id_col,
        F.explode(F.arrays_zip(
            F.slice("__toks", 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
            F.slice("__toks", 2, F.greatest(n - 1, F.lit(0))).alias("w2"),
        )).alias("bg"),
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    uni = (base.select(F.explode("__toks").alias("w1"))
           .groupBy("w1").agg(F.count(F.lit(1)).alias("c1")))
    big = (bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2")))
    scalars = uni.agg(F.count(F.lit(1)).alias("v"))

    term = F.log((F.col("c2") + F.lit(k))
                 / (F.col("c1") + F.lit(k) * F.col("v")))
    # assemble the per-bigram-TYPE probability table first (joins among
    # type-sized tables), then join the corpus-sized bigram stream
    # exactly once on (w1, w2) — the stream paying one shuffle instead
    # of re-shuffling through each count join (r8; values unchanged:
    # the decimal-rounded sum is associative)
    probs = (big.join(uni, on="w1")
             .crossJoin(F.broadcast(scalars))
             .select("w1", "w2", term.alias("__term")))
    return (
        bigrams
        .join(probs, on=["w1", "w2"])
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_bigrams"),
             _rounded_decimal_sum(F.col("__term"), 6, "__s"))
        .withColumn("avg_logprob", F.col("__s") / F.col("n_bigrams"))
        .drop("__s")
    )


def token_kl_divergence(
    df: DataFrame,
    slice_col: Column,
    text_col: str = "text",
    k: float = 0.5,
) -> DataFrame:
    """KL divergence between the token distributions of two corpus
    slices (``slice_col`` boolean: True side = P, False side = Q),
    add-k smoothed over the UNION vocabulary so both distributions are
    everywhere-positive. Returns one row: vocab size, per-side token
    totals, KL(P||Q), KL(Q||P)."""
    toks = _tokens(text_col)
    counts = (
        df.select(slice_col.alias("__p"), F.explode(toks).alias("token"))
        .groupBy("token")
        # CASE-expression semantics: a NULL slice predicate falls to the
        # ELSE branch (Q side) in both branches — `when(~p, 1)` would
        # silently drop NULL-slice rows from BOTH distributions
        .agg(F.sum(F.when(F.col("__p"), 1).otherwise(0)).alias("ca"),
             F.sum(F.when(F.col("__p"), 0).otherwise(1)).alias("cb"))
    )
    scalars = counts.agg(F.count(F.lit(1)).alias("v"),
                         F.sum("ca").alias("na"),
                         F.sum("cb").alias("nb"))
    p = (F.col("ca") + F.lit(k)) / (F.col("na") + F.lit(k) * F.col("v"))
    q = (F.col("cb") + F.lit(k)) / (F.col("nb") + F.lit(k) * F.col("v"))
    return (
        counts.crossJoin(F.broadcast(scalars))
        .agg(F.first("v").alias("vocab"),
             F.first("na").alias("n_tokens_p"),
             F.first("nb").alias("n_tokens_q"),
             _rounded_decimal_sum(p * F.log(p / q), 9, "kl_pq"),
             _rounded_decimal_sum(q * F.log(q / p), 9, "kl_qp"))
    )


def char_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Shannon entropy (nats) of each document's character
    distribution — near-zero entropy means repeated-padding or
    single-symbol junk. Empty documents drop out. Returns
    (id_col, n_chars, entropy)."""
    chars = (df.select(F.col(id_col), F.explode(
                F.split(F.col(text_col), "")).alias("ch"))
             # split('') on an EMPTY string yields [''] in both Spark
             # and DuckDB — drop it so empty docs produce no row
             .filter(F.col("ch") != "")
             .groupBy(id_col, "ch").agg(F.count(F.lit(1)).alias("c")))
    totals = chars.groupBy(id_col).agg(F.sum("c").alias("n_chars"))
    frac = F.col("c") / F.col("n_chars")
    return (
        chars.join(totals, on=id_col)
        .groupBy(id_col)
        .agg(F.first("n_chars").alias("n_chars"),
             _rounded_decimal_sum(-frac * F.log(frac), 9, "entropy"))
    )


def perplexity_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
    cuts: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020,
    arXiv:1911.00359): score every document with the corpus bigram LM
    (:func:`bigram_logprob_scores`) and label the best-scoring
    ``cuts[0]`` fraction ``head``, the next slice ``middle``, the rest
    ``tail`` — the standard LM-quality tiers used to stratify a crawl
    before sampling. Higher avg_logprob = lower perplexity = head.

    Bucketing rides the same distributed exact global rank that powers
    :func:`~goetl_spark.operators.ranking.ntile_bins` (ties broken by
    id for determinism) — no single-task global window, so the tiers
    stay exact at any scale, and the fraction cuts become exact integer
    rank thresholds. Returns (id_col, n_bigrams, avg_logprob, lm_bucket).
    """
    if not (0.0 < cuts[0] < cuts[1] < 1.0):
        raise ValueError(f"cuts must satisfy 0 < c0 < c1 < 1, got {cuts}")
    from goetl_spark.operators.ranking import _ranked

    scored = bigram_logprob_scores(df, text_col, id_col, k=k) \
        .withColumn("__neg", -F.col("avg_logprob"))
    # distributed exact global rank, best-first (ascending negated
    # score, id tie-break); _ranked also returns the total row count,
    # so the fraction cuts become exact integer rank thresholds
    ranked, total = _ranked(scored, ["__neg", id_col], "__r", None)
    c0 = int(round(cuts[0] * total))
    c1 = int(round(cuts[1] * total))
    return ranked.withColumn(
        "lm_bucket",
        F.when(F.col("__r") <= c0, "head")
         .when(F.col("__r") <= c1, "middle")
         .otherwise("tail"),
    ).drop("__r", "__neg")


def collocation_pmi(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """PMI-scored collocations (Church & Hanks 1990): rank corpus
    bigram TYPES by pointwise mutual information so fixed phrases
    ("new york") outrank chance co-occurrences of two frequent words.
    With positional marginals taken from the bigram table itself —
    cl = c(w1,·), cr = c(·,w2), n = total bigram tokens —

        pmi(w1,w2) = ln( (c(w1,w2) · n) / (cl · cr) )

    ``min_count`` drops rare pairs AFTER the marginals are computed
    (the standard convention: hapax bigrams have wildly inflated PMI,
    but they still contribute probability mass). Complements
    :func:`~goetl_spark.operators.mining.cooccurrence_pairs`, which
    counts basket-level pairs without an association score.

    Cross-engine determinism: every factor is cast to double and the
    expression is evaluated in one fixed order, then the single ln is
    rounded to 1e-6 (see module header — JVM vs libm ln differs in the
    last ulp for ~2 % of inputs; rounding is the established remedy).

    Scale shape: bigram extraction is in-row slice+zip (map-only); the
    pair/marginal tables are TYPE-sized with map-side partial aggs;
    joins are equi-joins on single token keys; the total rides a
    one-row broadcast crossJoin. The corpus-sized token stream is
    touched exactly once. Returns (w1, w2, n_pair, pmi)."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    toks = _tokens(text_col)
    base = df.select(toks.alias("__toks"))
    n = F.size("__toks")
    bigrams = base.select(
        F.explode(F.arrays_zip(
            F.slice("__toks", 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
            F.slice("__toks", 2, F.greatest(n - 1, F.lit(0))).alias("w2"),
        )).alias("bg"),
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    big = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    left = big.groupBy("w1").agg(F.sum("n_pair").alias("__cl"))
    right = big.groupBy("w2").agg(F.sum("n_pair").alias("__cr"))
    scalars = big.agg(F.sum("n_pair").alias("__n"))
    # doubles BEFORE multiplying: n_pair·n and cl·cr overflow int64 at
    # corpus scale (n ~ 1e12); order mirrored verbatim in SQL oracles
    pmi = F.round(F.log(
        (F.col("n_pair").cast("double") * F.col("__n"))
        / (F.col("__cl").cast("double") * F.col("__cr"))), 6)
    return (big.join(left, on="w1")
            .join(right, on="w2")
            .crossJoin(F.broadcast(scalars))
            .filter(F.col("n_pair") >= min_count)
            .select("w1", "w2", "n_pair", pmi.alias("pmi")))


def kneser_ney_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> DataFrame:
    """Average INTERPOLATED KNESER-NEY bigram log-probability per
    document — the smoothing family CCNet-class pipelines actually use
    (KenLM is modified-KN): instead of add-k's uniform mass, unseen
    mass goes to words in proportion to how many distinct CONTEXTS
    they follow, which stops high-frequency-but-fixed-context tokens
    ("francisco") from inflating scores.

        P(w2|w1) = max(c(w1,w2) − D, 0) / c(w1·)
                 + (D · N1+(w1,·) / c(w1·)) · N1+(·,w2) / N1+(·,·)

    with c(w1·) the bigram-context count, N1+(w1,·)/N1+(·,w2) the
    forward/backward continuation type counts, and N1+(·,·) the total
    distinct bigram types. Self-scored on the training corpus (the
    q116 pattern), so every scored bigram has c ≥ 1 and the max() is
    formula fidelity, not a reachable branch.

    Scale shape mirrors :func:`bigram_logprob_scores`: in-row
    slice+zip bigrams, map-side-combined count tables, equi-joins on
    token keys (nothing corpus-sized broadcasts), the single type-total
    scalar on a one-row crossJoin, decimal-rounded log sum for
    cross-engine bit-exactness. Returns (id_col, n_bigrams,
    avg_logprob)."""
    if not 0.0 < discount < 1.0:
        raise ValueError("discount must be in (0, 1)")
    toks = _tokens(text_col)
    base = df.select(F.col(id_col), toks.alias("__toks"))
    n = F.size("__toks")
    bigrams = base.select(
        id_col,
        F.explode(F.arrays_zip(
            F.slice("__toks", 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
            F.slice("__toks", 2, F.greatest(n - 1, F.lit(0))).alias("w2"),
        )).alias("bg"),
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    big = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    ctx = big.groupBy("w1").agg(F.sum("c2").alias("c1"),
                                F.count(F.lit(1)).alias("n1p_fwd"))
    cont = big.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_bwd"))
    scalars = big.agg(F.count(F.lit(1)).alias("t"))

    d = F.lit(discount)
    # expression order mirrored verbatim in the SQL oracle — per-row
    # double ops are IEEE-identical across engines when ordered alike
    term = F.log(
        F.greatest(F.col("c2") - d, F.lit(0.0)) / F.col("c1")
        + d * F.col("n1p_fwd") / F.col("c1")
        * (F.col("n1p_bwd") / F.col("t")))
    # per-TYPE probability table first (type-sized joins), then ONE
    # (w1, w2) join for the corpus-sized stream — see
    # bigram_logprob_scores for the shuffle argument
    probs = (big.join(ctx, on="w1")
             .join(cont, on="w2")
             .crossJoin(F.broadcast(scalars))
             .select("w1", "w2", term.alias("__term")))
    return (
        bigrams
        .join(probs, on=["w1", "w2"])
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_bigrams"),
             _rounded_decimal_sum(F.col("__term"), 6, "__s"))
        .withColumn("avg_logprob", F.col("__s") / F.col("n_bigrams"))
        .drop("__s")
    )


def textrank_keywords(
    df: DataFrame,
    text_col: str = "text",
    damping: float = 0.85,
    iterations: int = 4,
    min_weight: int = 1,
) -> DataFrame:
    """TextRank keyword scores (Mihalcea & Tarau 2004) over the corpus
    word graph: words are vertices, adjacent-token co-occurrences are
    undirected weighted edges (weight = total adjacency count, both
    directions; self-adjacency dropped), scored by weighted PageRank

        r(v) = (1−d)/N + d · Σ_{u~v} (r(u) · w_uv) / W_u

    with W_u = u's total incident weight. The unsupervised
    keyword/keyphrase primitive for corpus tagging and topic surfacing
    — frequency alone overrates stop-like tokens, TextRank promotes
    words that frequent words co-occur with. ``min_weight`` prunes
    rare edges BEFORE weights/degrees are computed (mirrored in
    oracles); a symmetric graph has no dangling mass, so each
    iteration is pure neighbor propagation.

    Determinism: per-target sums accumulate in DECIMAL(38,12) over the
    fixed-order double ``(rank · w) / W`` (pagerank's q135 convention),
    so every iteration — and therefore the final score — is replayable
    bit-for-bit in oracle SQL, no rounding step.

    Scale shape: the corpus token stream is read once (in-row bigram
    zip); the edge/weight tables are TYPE-sized; each iteration is one
    equi-join + one map-side-combined agg + a flat checkpoint, exactly
    :func:`~goetl_spark.operators.graph.pagerank`'s loop. Returns
    (word, score)."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if min_weight < 1:
        raise ValueError(f"min_weight must be >= 1, got {min_weight}")
    toks = _tokens(text_col)
    base = df.select(toks.alias("__toks"))
    n = F.size("__toks")
    adj = base.select(
        F.explode(F.arrays_zip(
            F.slice("__toks", 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
            F.slice("__toks", 2, F.greatest(n - 1, F.lit(0))).alias("w2"),
        )).alias("bg"),
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")) \
     .filter(F.col("w1") != F.col("w2"))
    e = (adj.select(F.col("w1").alias("s"), F.col("w2").alias("t"))
         .union(adj.select(F.col("w2").alias("s"), F.col("w1").alias("t")))
         .groupBy("s", "t").agg(F.count(F.lit(1)).alias("ew")))
    if min_weight > 1:
        e = e.filter(F.col("ew") >= min_weight)
    e = e.localCheckpoint(eager=True)
    wsum = (e.groupBy("s").agg(F.sum("ew").alias("tw"))
            .localCheckpoint(eager=True))
    nodes = wsum.select(F.col("s").alias("node"))
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select(F.col("node").alias("word"),
                            F.lit(0.0).alias("score"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e["s"] == ranks["node"])
            .join(wsum, "s")
            .groupBy("t")
            .agg(F.sum(((F.col("rank") * F.col("ew")) / F.col("tw"))
                       .cast("decimal(38,12)"))
                 .cast("double").alias("c")))
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["t"], "left")
            .select(
                "node",
                (F.lit((1.0 - damping) / n_nodes)
                 + F.lit(damping)
                 * F.coalesce(F.col("c"), F.lit(0.0))).alias("rank"))
            .localCheckpoint(eager=True))
    return ranks.select(F.col("node").alias("word"),
                        F.col("rank").alias("score"))
