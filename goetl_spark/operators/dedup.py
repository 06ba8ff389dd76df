"""Deduplication: exact and near-duplicate detection at corpus scale.

Beyond the reference surface (BASELINE.json north star). Strategies,
ordered by cost:

1. :func:`exact_dedup` — hash-groupBy on content digest. One shuffle of
   (digest, id) pairs; the canonical 100 TB first pass.
   :func:`dedup_against` is its incremental form (daily batch vs a
   standing corpus); :func:`paragraph_dedup` its sub-document form
   (first-occurrence paragraphs corpus-wide).
2. :func:`ngram_jaccard_pairs` — exact n-gram-shingle Jaccard for pairs
   sharing at least one shingle (inverted-index join), hot-shingle
   document-frequency cap on by default (``max_df``).
3. :func:`minhash_signatures` / :func:`minhash_lsh_candidates` — MinHash +
   banded LSH. Cost linear in corpus size + candidate verification only;
   THE scale path for near-dedup (the MapReduce/Spark standard).
4. :func:`simhash` — 60-bit SimHash per doc; near-dups have small Hamming
   distance. Cheapest signature; pairs via band join on hash prefixes.
5. :mod:`goetl_spark.operators.similarity` — embedding-cosine near-dup,
   plus the ANN family (IVF, LSH, PQ, IVF-PQ) for the candidate stage.

Related hygiene passes here: :func:`contamination_flags` (benchmark
n-gram leak detection), :func:`winnow_fingerprints` (partial overlap),
:func:`frequent_lines`/:func:`strip_boilerplate` (per-source
boilerplate). Standing-index forms for incremental ingest:
:func:`lsh_index_write`/:func:`lsh_index_candidates` (MinHash bands)
and :func:`simhash_index_write`/:func:`simhash_index_candidates`
(lossless pigeonhole bands); :func:`lsh_recall_report` measures a
band config before it ships.

All hashing is md5-based (:func:`goetl_spark.operators.text.md5_int`) so an
external SQL engine (the DuckDB oracle) can reproduce results bit-for-bit
— xxhash64 would be faster but engine-private. Swap ``hash_fn`` for
xxhash64 in production where cross-engine reproducibility isn't needed.

MinHash constants: h_i(x) = (A_i * x + B_i) mod P with P = 2^31-1 (prime),
A_i = 1 + 3*i, B_i = 7 + 11*i — fixed, documented, reproducible in SQL.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from goetl_spark.operators.text import md5_int, spread_small_input

MINHASH_P = 2_147_483_647  # 2^31 - 1


def _once(col: Column, cast: str | None = None) -> Column:
    """Value-neutral nondeterministic wrapper: ``col + floor(rand()*0)``.

    Catalyst pushes a filter on a derived column below the projection
    that computes it, leaving the expensive expression evaluated TWICE
    — once inside the pushed-down filter/join condition and once in the
    surviving projection (guide §4.4 shows the same duplication for
    Python UDFs). Adding an exact zero built from ``rand()`` marks the
    whole expression non-deterministic, which Catalyst may not
    duplicate or reorder, so it is evaluated exactly once; the added
    term is floor of a value in [0, 0] = 0, so results are bit-equal.
    Use only on EXPENSIVE verify expressions (levenshtein /
    array_intersect) immediately filtered after being projected — a
    nondeterministic column also blocks legitimate pushdown of OTHER
    filters past it.
    """
    zero = F.floor(F.rand(42) * F.lit(0))
    if cast is not None:
        zero = zero.cast(cast)
    return col + zero


def _word_shingles(col: Column, n: int) -> Column:
    """Distinct n-gram word shingles of a text column."""
    toks = F.split(col, r"\s+")
    k = F.size(toks) - (n - 1)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the lowest id per content digest.

    groupBy(md5) shuffles only (digest, id) — never the text — so the
    shuffle is tiny relative to the corpus.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def shingle_index(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  n: int = 3) -> DataFrame:
    """Inverted index: one row per (doc, distinct shingle).

    Arrow-batched ``mapInPandas``, not the Column-expression formulation
    (:func:`_word_shingles` + explode): shingling is per-row array work
    that Catalyst runs as *interpreted* higher-order-function lambdas —
    measured 4.4x slower than this Python loop at sf0.1 with identical
    output. Both shapes are map-only (zero shuffle), so this keeps the
    100 TB property (scan-bound, embarrassingly parallel) while winning
    locally. Semantics match ``_word_shingles``: whitespace tokens, docs
    with <= n tokens yield one whole-doc shingle, shingles deduplicated
    per doc.
    """
    import pandas as pd

    n_ = n

    def gen(batches):
        for pdf in batches:
            ids, shingles = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                toks = t.split()
                if len(toks) <= n_:
                    ss = {" ".join(toks)}
                else:
                    ss = {" ".join(toks[j:j + n_]) for j in range(len(toks) - n_ + 1)}
                ids.extend([i] * len(ss))
                shingles.extend(ss)
            yield pd.DataFrame({id_col: ids, "shingle": shingles})

    id_type = dict(df.dtypes)[id_col]
    # NO input spread here: measured a loss (q171 6.3 -> 2.9 s median
    # without it) — the exploded shingle output dwarfs the input, so
    # the downstream self-join layout matters more than kernel-side
    # parallelism (guide §1.1 measure-first)
    return df.select(id_col, text_col).mapInPandas(
        gen, f"{id_col} {id_type}, shingle string"
    )


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n: int = 3, threshold: float = 0.5,
    max_df: int | float | None = 256, materialize: bool = True,
) -> DataFrame:
    """Exact Jaccard over n-gram shingles for candidate pairs.

    Inverted-index self-join: only pairs sharing ≥1 shingle are scored
    (|A∩B| from the join, |A| and |B| from per-doc counts — Jaccard =
    inter / (|A|+|B|-inter), exact integer arithmetic).

    ``max_df`` (round-3 verdict ask #2 — the one 100 TB scale-killer
    without it): a shingle appearing in k documents contributes k² rows
    to the self-join on ONE shuffle key, so boilerplate (license
    headers, navigation chrome) is both a quadratic blowup and a skewed
    key. Shingles with document frequency above the cap (int = absolute
    count — the default, since a fraction of a 10B-doc corpus is no skew
    bound at all; float = fraction of the corpus; None = uncapped) are
    dropped
    from the index BEFORE the join via a broadcast anti-join against the
    (by construction small) hot set; sizes are computed over the SAME
    capped universe, so the Jaccard is the exact Jaccard of the capped
    shingle sets — mirror the cap in any SQL oracle. Near-dup recall at
    real thresholds is unaffected in practice: true near-dups share many
    RARE shingles (pinned by the hot-shingle case in
    tests/test_text_dedup_similarity.py; on the sf0.01/sf0.1 corpus the
    cap drops zero shingles — max document frequency there is 7 — so
    q22 output is bit-identical: 260 pairs either way at sf0.1, warm
    runtime 2.43 s uncapped vs 2.59 s capped, the cost of the one extra
    df-count pass over the cached index).

    ``materialize`` scopes the cached shingle index (round-3 verdict ask
    #6): the result is computed eagerly (``localCheckpoint``) so the
    cache can be released before returning instead of leaking into the
    session. Pass False to get the fully-lazy plan and manage the
    returned plan's recomputation cost yourself.
    """
    # join on a 60-bit md5 key, not the shingle string: the shuffle moves
    # 8-byte longs instead of ~25-byte strings and the hash join compares
    # integers — measured 2.9x faster at sf0.1 with identical output.
    # Collision math: k distinct shingles collide in a 60-bit space with
    # p ≈ k²/2^61 (k=10^9 → p ≈ 5e-4), so equal keys ⇔ equal shingles for
    # any realistic corpus; the string-keyed DuckDB oracle stays exact.
    idx = shingle_index(df, text_col, id_col, n).select(
        F.col(id_col), md5_int(F.col("shingle"), 15).alias("hk")
    ).cache()
    try:
        if max_df is not None:
            cap = (max_df if isinstance(max_df, int)
                   else max(int(max_df * df.count()), 2))
            hot = (idx.groupBy("hk").agg(F.count(F.lit(1)).alias("df_"))
                   .filter(F.col("df_") > cap).select("hk"))
            idx_f = idx.join(F.broadcast(hot), "hk", "left_anti")
        else:
            idx_f = idx
        sizes = idx_f.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))

        a = idx_f.alias("a")
        b = idx_f.alias("b")
        inter = (
            a.join(b, (F.col("a.hk") == F.col("b.hk"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        sa = sizes.select(F.col(id_col).alias("id_a"),
                          F.col("n_shingles").alias("n_a"))
        sb = sizes.select(F.col(id_col).alias("id_b"),
                          F.col("n_shingles").alias("n_b"))
        scored = (
            inter.join(sa, "id_a").join(sb, "id_b")
            .withColumn(
                "jaccard",
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
            )
        )
        out = scored.filter(F.col("jaccard") >= threshold).select(
            "id_a", "id_b", "n_common", "jaccard"
        )
        if materialize:
            # pair set is tiny next to the corpus; persist it so the
            # shingle-index cache can be dropped in the finally block
            out = out.localCheckpoint(eager=True)
        return out
    finally:
        if materialize:
            idx.unpersist()


def contamination_flags(
    corpus: DataFrame, benchmark: DataFrame,
    text_col: str = "text", id_col: str = "doc_id", n: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """Test-set decontamination: flag corpus documents sharing ≥
    ``min_hits`` n-gram shingles with any benchmark/eval document.

    The canonical pre-training hygiene pass (benchmark answers leaking
    into training data inflate evals): shingle both sides with the same
    tokenizer as the dedup family, aggregate the benchmark side to its
    DISTINCT shingle set, and count per corpus doc how many of its
    shingles appear in that set. Returns (id, n_matched) for flagged
    docs — anti-join the corpus against it to clean.

    Scale shape: the benchmark set is small by definition (evals are
    thousands of docs, the corpus is billions), so its distinct shingle
    keys broadcast and the probe is a map-side broadcast semi-join +
    partial count — the corpus never shuffles its text, only flagged
    (id, shingle-hit) pairs reach the final per-doc count, and that
    count groups on the already-flagged minority. 60-bit md5 keys as in
    :func:`ngram_jaccard_pairs` (engine-portable, collision math in its
    docstring)."""
    c_idx = shingle_index(corpus, text_col, id_col, n).select(
        F.col(id_col), md5_int(F.col("shingle"), 15).alias("hk"))
    b_keys = (shingle_index(benchmark, text_col, id_col, n)
              .select(md5_int(F.col("shingle"), 15).alias("hk"))
              .distinct())
    return (
        c_idx.join(F.broadcast(b_keys), "hk", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_matched"))
        .filter(F.col("n_matched") >= min_hits)
    )


def dedup_against(
    incoming: DataFrame, existing: DataFrame,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Incremental exact dedup — the daily-ingest shape: drop incoming
    documents whose content already exists in the corpus, and collapse
    in-batch duplicates to their lowest id (same keep rule as
    :func:`exact_dedup`). Returns surviving incoming rows unchanged.

    Scale shape: the corpus side reduces to DISTINCT content digests
    (never text) before the anti-join, so the daily batch — typically
    orders of magnitude smaller than the corpus — shuffles on a 32-char
    digest against a digest-only build side; in practice the corpus
    digest set is a maintained artifact appended per batch, not
    recomputed (store `md5(text)` at ingest). In-batch keep-min is a
    partial-aggregating groupBy on the digest."""
    inc = incoming.withColumn("__h", F.md5(F.col(text_col)))
    seen = existing.select(F.md5(F.col(text_col)).alias("__h")).distinct()
    fresh = inc.join(seen, "__h", "left_anti")
    keep = fresh.groupBy("__h").agg(F.min(id_col).alias("__keep_id"))
    return (
        fresh.join(keep, "__h")
        .filter(F.col(id_col) == F.col("__keep_id"))
        .drop("__h", "__keep_id")
    )


def paragraph_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    sep: str = "\n\n",
) -> DataFrame:
    """Corpus-level paragraph dedup (the Dolma/FineWeb hygiene pass):
    split every document on ``sep``, keep each distinct paragraph only at
    its FIRST occurrence — (lowest ``id_col``, lowest position) — and
    reassemble documents from their surviving paragraphs.

    Boilerplate that exact doc-level dedup can't touch (shared headers,
    navigation, license blocks pasted into otherwise-distinct pages)
    disappears corpus-wide. Returns (id, text, n_kept, n_dropped);
    documents whose every paragraph already appeared elsewhere come back
    with an empty text and n_kept = 0.

    Scale shape: winners are a ``groupBy(md5)`` MIN-struct aggregate —
    partial (map-side) min per paragraph hash, so the winner table
    shuffles one (hash, id, pos) row per DISTINCT paragraph; the
    survivors join is hash-co-partitioned with it, and reassembly is one
    groupBy(doc) of surviving paragraphs. No window sort over the full
    exploded corpus."""
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para"),
    ).withColumn("ph", F.md5("para"))
    winners = (paras.groupBy("ph")
               .agg(F.min(F.struct(id_col, "pos")).alias("w"))
               .select("ph", F.col(f"w.{id_col}").alias("__wid"),
                       F.col("w.pos").alias("__wpos")))
    kept = (paras.join(winners,
                       (paras.ph == winners.ph)
                       & (F.col(id_col) == F.col("__wid"))
                       & (F.col("pos") == F.col("__wpos")))
            .select(id_col, "pos", "para"))
    totals = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), sep)).alias("__n_paras"))
    rebuilt = (
        kept.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "para")))
             .alias("ps"))
        .select(
            F.col(id_col),
            F.concat_ws(sep, F.transform("ps", lambda s: s["para"]))
            .alias(text_col),
            F.size("ps").alias("n_kept"),
        )
    )
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            (F.col("__n_paras") - F.coalesce("n_kept", F.lit(0)))
            .alias("n_dropped"),
        )
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n: int = 3, num_hashes: int = 32,
) -> DataFrame:
    """MinHash signature per document: one row per (doc, hash index i) with
    sig = min over shingles of (A_i*md5int(shingle) + B_i) mod P.

    Shape note (measured, not guessed): explode shingles × broadcast
    hash-function table → codegen'd partial min-aggregation. The shuffle
    is only num_hashes rows per doc (map-side combine collapses the
    explosion). An alternative zero-shuffle formulation with nested array
    higher-order functions benchmarked ~9x SLOWER — Catalyst HOF lambdas
    are interpreted per element, while this shape stays in whole-stage
    codegen.
    """
    idx = shingle_index(df, text_col, id_col, n)
    hashed = idx.select(
        id_col, md5_int(F.col("shingle")).alias("h")
    ).join(
        # hash-function table: tiny, broadcast
        F.broadcast(
            df.sparkSession.range(num_hashes).select(
                F.col("id").cast("int").alias("i"),
                (1 + 3 * F.col("id")).alias("a"),
                (7 + 11 * F.col("id")).alias("b"),
            )
        ),
    )
    return (
        hashed.groupBy(id_col, "i")
        .agg(F.min((F.col("a") * F.col("h") + F.col("b")) % MINHASH_P).alias("sig"))
    )


def minhash_signatures_wide(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n: int = 3, num_hashes: int = 32,
) -> DataFrame:
    """MinHash signature in wide form: one row per doc, columns s0..s{k-1}.

    One codegen'd aggregation — ``num_hashes`` min-expressions evaluated
    per shingle row, shuffling a single row per doc. Feeds the LSH band
    join; :func:`minhash_signatures` is the long-form (per hash index)
    surface with identical values.
    """
    idx = shingle_index(df, text_col, id_col, n)
    hashed = idx.select(id_col, md5_int(F.col("shingle")).alias("h"))
    return hashed.groupBy(id_col).agg(*[
        F.min((F.lit(1 + 3 * i) * F.col("h") + F.lit(7 + 11 * i)) % MINHASH_P)
        .alias(f"s{i}")
        for i in range(num_hashes)
    ])


def lsh_band_rows(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n: int = 3, num_hashes: int = 32, band_size: int = 4,
) -> DataFrame:
    """(id, band, band_hash) rows — the banded-LSH key material shared
    by :func:`minhash_lsh_candidates` (in-memory self-join) and the
    persisted incremental index (:func:`lsh_index_write` /
    :func:`lsh_index_candidates`). Wide signatures (one shuffle) →
    band hashes as pure expressions → explode."""
    sig = minhash_signatures_wide(df, text_col, id_col, n, num_hashes)
    num_bands = num_hashes // band_size
    band_structs = F.array(*[
        F.struct(
            F.lit(bi).alias("band"),
            F.md5(F.concat_ws(",", *[
                F.col(f"s{i}")
                for i in range(bi * band_size, (bi + 1) * band_size)
            ])).alias("band_hash"),
        )
        for bi in range(num_bands)
    ])
    return (
        sig.select(F.col(id_col), F.explode(band_structs).alias("bb"))
        .select(F.col(id_col), F.col("bb.band").alias("band"),
                F.col("bb.band_hash").alias("band_hash"))
    )


def minhash_lsh_candidates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n: int = 3, num_hashes: int = 32, band_size: int = 4,
) -> DataFrame:
    """Banded LSH candidate pairs: docs agreeing on ALL rows of ≥1 band.

    Bands of ``band_size`` signature rows are hashed (md5 of the
    concatenated sigs) and equal band-hashes are joined — the classic
    s-curve: with 32 hashes / bands of 4, an 80 %-similar pair is caught
    with probability ~1-(1-0.8^4)^8 ≈ 0.98.

    Shape: wide signatures (ONE shuffle) → band hashes as pure
    expressions → explode to (doc, band, hash) → equi-join. The band
    hash is position-ordered md5; any injective formula yields the same
    candidate set, since band equality ⇔ the band's sigs all agree.
    """
    bands = lsh_band_rows(df, text_col, id_col, n, num_hashes, band_size)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def dedup_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over near-duplicate pairs → (doc_id,
    cluster_id), cluster_id = min doc id in the component. The step that
    turns candidate PAIRS (LSH/Jaccard/SimHash output) into dedup
    DECISIONS: keep cluster_id, drop the rest.

    Pregel-style min-label propagation: each iteration is one
    join + min-aggregation (a key-partitioned shuffle), converging in
    O(graph diameter) rounds — near-dup graphs are shallow (dense
    clusters, tiny diameter), so 3-5 rounds typical. ``localCheckpoint``
    truncates lineage each round so plans stay O(1). This is the standard
    large-scale formulation (GraphX/GraphFrames connected components);
    the driver loop holds only a per-round changed-count, never rows.

    Session-level caveat (Spark 4.1): in a session with registered
    Observations (this function registers one per iteration; the
    IOStats readers register others), executing a pyspark.ml TRANSFORM
    lineage can fail with ``NotSerializableException:
    ObservationManager`` during task serialization. This engine's
    scoring path is immune — classifier.score_quality inlines fitted
    coefficients as Column expressions instead of keeping the ML
    runtime in the plan; if you call ``model.transform`` directly,
    localCheckpoint its output before mixing with Observation users.
    """
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    edges = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).union(
        pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    ).distinct().localCheckpoint(eager=True)

    from pyspark.sql import Observation

    from goetl_spark.operators.join import bcast_if_small

    # node count rides the labels materialization (zero extra jobs) and
    # drives the adaptive broadcast below: checkpointed label tables hide
    # their stats from Catalyst, so every propagation round otherwise
    # plans sort-merge and re-shuffles the edge set even for a few
    # thousand labels (guide §2.4/§3.1). Above the threshold the rounds
    # keep their shuffle joins — billion-node graphs unaffected.
    obs0 = Observation()
    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .withColumn("label", F.col("id"))
        .observe(obs0, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    n_nodes = int(obs0.get["n"] or 0)
    for _ in range(max_iter):
        nbr = (
            edges.join(bcast_if_small(labels, n_nodes),
                       edges.dst == labels.id)
            .groupBy("src").agg(F.min("label").alias("nbr_label"))
        )
        # the changed-count rides the checkpoint materialization via the
        # Observation API (zero extra jobs) instead of a separate
        # join+count pass per round — the old label is carried alongside,
        # observed, then dropped
        obs = Observation()
        new_labels = (
            labels.join(bcast_if_small(nbr, n_nodes),
                        labels.id == nbr.src, "left")
            .select(
                labels.id,
                F.col("label").alias("__old"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .observe(obs, F.sum(
                (F.col("label") != F.col("__old")).cast("long")
            ).alias("changed"))
            .select("id", "label")
            .localCheckpoint(eager=True)
        )
        changed = int(obs.get["changed"] or 0)
        labels = new_labels
        if changed == 0:
            break
    else:
        # fell off max_iter with labels still moving (diameter > max_iter,
        # e.g. a long chain of near-dups): partial labels would silently
        # split one component into several clusters
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iter} iterations "
            f"({changed} labels still changing); raise max_iter — rounds "
            "needed grow with graph diameter, not data size")
    return labels.select(F.col("id").alias("doc_id"),
                         F.col("label").alias("cluster_id"))


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 60) -> DataFrame:
    """SimHash per document over whitespace tokens (md5-based 60-bit token
    hashes; 60 not 64 so the value fits a signed bigint in every engine).

    bit_j(doc) = 1 iff sum over distinct tokens of (token has bit j ? +1 : -1) > 0.
    Near-duplicates differ in few bits (compare with hamming/bit_count(xor)).

    Map-only (r17 optimization round): the token hashes are computed
    per row with a ``transform`` HOF (no explode) and the 60 bit sums
    fold per document inside one Arrow kernel — the old shape
    (explode → shuffle → groupBy with 60 conditional-sum aggregate
    buffers) spent its time in the 60-buffer hash aggregate (measured
    3.4 s → 0.5 s on a 1.6k-doc slice at sf0.1, bit-identical
    output). ``sum(±1) ≡ 2·popcount_j − n`` in exact integer
    arithmetic, so the packed hash is unchanged. NULL/empty texts
    drop, as the explode used to drop them.
    """
    import numpy as np
    import pandas as pd

    # NO input spread: since the bit folds became one vectorized Arrow
    # kernel the round-robin exchange of raw text cost more than the
    # parallelism bought (q176 measured 5.8-9.5 -> 2.5-3.5 s without).
    # NULL-text docs drop exactly as the explode used to drop them;
    # filtering on text (not on __hs) keeps the predicate cheap and
    # pushable — a filter on __hs re-evaluates the per-token md5
    # transform below the exchange (guide §4.4's duplication, in
    # expression form). split() of a non-null string is never
    # NULL/empty, so the conditions are equivalent.
    base = (df.select(id_col, text_col)
            .filter(F.col(text_col).isNotNull())
            .select(F.col(id_col),
                    F.transform(
                        F.array_distinct(F.split(F.col(text_col), r"\s+")),
                        lambda t: md5_int(t, 15)).alias("__hs")))

    def kern(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            lens = np.fromiter((len(h) for h in pdf["__hs"]),
                               dtype=np.int64, count=len(pdf))
            flat = np.concatenate(
                [np.asarray(h, dtype=np.int64) for h in pdf["__hs"]])
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            sim = np.zeros(len(lens), dtype=np.int64)
            for j in range(bits):
                s = np.add.reduceat((flat >> j) & 1, starts)
                sim |= ((2 * s - lens > 0).astype(np.int64) << j)
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": sim})

    id_type = df.schema[id_col].dataType.simpleString()
    return base.mapInPandas(
        kern, schema=f"{id_col} {id_type}, simhash long")


def simhash_band_rows(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    max_hamming: int = 8, bits: int = 60,
    _sig: DataFrame | None = None,
) -> DataFrame:
    """(id, simhash, band, key) pigeonhole-band rows — the key material
    shared by :func:`simhash_pairs` and the persisted simhash index
    (:func:`simhash_index_write` / :func:`simhash_index_candidates`).
    The ``bits``-bit hash splits into ``max_hamming + 1`` contiguous
    bands: any pair within the Hamming bound agrees on ≥ 1 band."""
    s = _sig if _sig is not None else simhash(df, text_col, id_col, bits)
    n_bands = max_hamming + 1
    bands = []
    for j in range(n_bands):
        start = j * bits // n_bands
        width = (j + 1) * bits // n_bands - start
        bands.append(F.struct(
            F.lit(j).alias("band"),
            F.shiftright(F.col("simhash"), start)
            .bitwiseAND(F.lit((1 << width) - 1)).alias("key"),
        ))
    return s.select(
        F.col(id_col), F.col("simhash"),
        F.explode(F.array(*bands)).alias("bk"),
    ).select(id_col, "simhash", F.col("bk.band").alias("band"),
             F.col("bk.key").alias("key"))


def simhash_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 8, bits: int = 60,
                  all_pairs: bool = False) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.

    DEFAULT = pigeonhole band blocking, which is both scalable and
    LOSSLESS: the ``bits``-bit simhash is split into ``max_hamming + 1``
    contiguous bands; two hashes within Hamming distance ``max_hamming``
    have at most ``max_hamming`` differing bits, so at least one band is
    bit-identical (pigeonhole) — candidate pairs are generated by
    equi-joining on (band index, band value) and the exact ``bit_count``
    filter then removes false candidates. Result is provably EQUAL to the
    all-pairs answer (test pins this), with the O(n²) cross join replaced
    by a shuffle equi-join whose per-bucket cost is quadratic only within
    a band-value bucket.

    Scale: bits-per-band = bits // (max_hamming+1). Keep ``max_hamming``
    small at corpus scale (e.g. ≤ 4 → ≥ 12-bit bands → ≥ 4k buckets per
    band); a large threshold shrinks bands toward few-bit keys whose
    buckets go quadratic — the knob trades exactly recall-threshold
    against blocking power.

    ``all_pairs=True`` (or ``max_hamming >= bits``, where banding is
    vacuous) opts OUT into the quadratic self-join — only for small
    inputs (≤ ~100k docs).
    """
    s = simhash(df, text_col, id_col, bits)
    if all_pairs or max_hamming >= bits:
        a, b = s.alias("a"), s.alias("b")
        return (
            a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                F.bit_count(
                    F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
                ).alias("hamming"),
            )
            .filter(F.col("hamming") <= max_hamming)
        )

    e = simhash_band_rows(df, text_col, id_col, max_hamming, bits,
                          _sig=s)
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()  # a pair can agree on several bands
    )


def winnow_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 5, window: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): hash every character ``k``-gram with a rolling polynomial
    hash, slide a ``window`` over the hash sequence, keep each window's
    minimum — one row per (doc, distinct fingerprint).

    Why it matters at 100 TB: the fingerprint index is ~``2/(window+1)``
    the size of a full k-gram index while GUARANTEEING that any substring
    shared between two documents of length ≥ ``window + k - 1`` produces
    at least one shared fingerprint (every length-w window over the
    shared region picks the same minimum in both documents). That makes
    it the standard index for PARTIAL-overlap detection — quoted
    passages, boilerplate, contained duplicates — which doc-level shingle
    Jaccard (:func:`ngram_jaccard_pairs`) dilutes away. Detection is then
    one equi-join (:func:`fingerprint_overlap_pairs`), never a scan pair.

    Implementation: Arrow-batched ``mapInPandas``; the rolling hash is a
    vectorized numpy polynomial over byte values (uint64 wraparound,
    masked to 63 bits for a positive bigint column), window minima via a
    sliding view — O(k·n) vectorized work per doc, zero shuffle (the
    same map-only scale shape as :func:`shingle_index`). Docs shorter
    than ``k`` chars emit a single hash of the whole text. Fingerprint
    VALUES are engine-specific (no cross-engine oracle); correctness is
    pinned by property tests: the planted-overlap guarantee and the
    2/(w+1) density bound.
    """
    import pandas as pd

    if k < 1 or window < 1:
        raise ValueError(f"k and window must be >= 1, got k={k} window={window}")

    B = 1000003  # odd base, same spirit as CPython's string hash multiplier
    MASK63 = (1 << 63) - 1

    def gen(batches):
        import numpy as np

        powers = np.array([pow(B, k - 1 - j, 1 << 64) for j in range(k)],
                          dtype=np.uint64)

        def doc_prints(text: str) -> np.ndarray:
            b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
            if len(b) < k:
                h = np.uint64(0)
                for x in b:
                    h = h * np.uint64(B) + np.uint64(x)
                return np.array([int(h) & MASK63], dtype=np.int64)
            n_grams = len(b) - k + 1
            H = np.zeros(n_grams, dtype=np.uint64)
            for j in range(k):  # k vectorized shifted adds
                H += b[j:j + n_grams].astype(np.uint64) * powers[j]
            if n_grams <= window:
                mins = np.array([H.min()])
            else:
                from numpy.lib.stride_tricks import sliding_window_view

                mins = sliding_window_view(H, window).min(axis=1)
            return np.unique(mins).astype(np.int64) & np.int64(MASK63)

        for pdf in batches:
            ids, prints = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                fps = doc_prints(t or "")
                ids.extend([i] * len(fps))
                prints.extend(fps.tolist())
            yield pd.DataFrame({id_col: ids, "fingerprint": prints})

    id_type = dict(df.dtypes)[id_col]
    # spread a one-row-group input so the Python rolling-hash kernel
    # uses every core, not one (guide §2.5; no-op at corpus scale)
    return spread_small_input(df.select(id_col, text_col)).mapInPandas(
        gen, f"{id_col} {id_type}, fingerprint long"
    )


def fingerprint_overlap_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 5, window: int = 4, min_shared: int = 2,
) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` winnowing fingerprints —
    the partial-overlap detector. One inverted-index equi-join on the
    64-bit fingerprint (the q22 join shape on a 2/(window+1)-sized
    index); ``min_shared`` > 1 suppresses single-hash coincidences."""
    idx = winnow_fingerprints(df, text_col, id_col, k, window)
    a, b = idx.alias("a"), idx.alias("b")
    return (
        a.join(b, (F.col("a.fingerprint") == F.col("b.fingerprint"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                 F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def fuzzy_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: Sequence[str] = ("lang", "source"),
    length_col: str | None = "n_chars",
    length_tolerance: int = 5,
    prefix_len: int = 40,
    max_dist: int = 20,
) -> DataFrame:
    """Edit-distance near-dup pairs with equi-join blocking.

    Levenshtein is O(m·n) per pair, so the join graph must be pruned
    BEFORE scoring: pairs are generated only within equal ``block_cols``
    buckets and a ``length_tolerance`` band on ``length_col`` (edit
    distance ≥ length difference, so the band is a lossless filter for
    small ``max_dist`` thresholds when tolerance ≥ max_dist; a tighter
    band is an explicit recall trade). Distance is computed on a
    ``prefix_len`` prefix — the standard bounded-cost approximation.

    Scale: the block join is a plain shuffle equi-join on the block key;
    per-bucket pair count is quadratic in bucket size, so block on
    columns with bounded fan-out (language × source × length-band, not
    just language). All JVM-side: ``F.levenshtein`` is codegen'd.
    """
    sel = [F.col(id_col).alias("id"),
           F.substring(F.col(text_col), 1, prefix_len).alias("pfx"),
           *[F.col(c) for c in block_cols]]
    if length_col:
        sel.append(F.col(length_col).alias("len"))
    base = df.select(*sel)

    # The length band is part of the JOIN KEY, not a post-join filter:
    # band width W > tolerance means |len_a - len_b| <= tolerance implies
    # the bands differ by at most 1, so probing with {band-1, band, band+1}
    # on one side is lossless — and each qualifying pair matches exactly
    # ONE of the three keys (bands are disjoint), so no dedup pass is
    # needed. This shrinks the hash-matched candidate set to the band
    # (Catalyst pushes the distance filter into the join condition, where
    # conjunct order would otherwise run levenshtein on every
    # block-matched pair — measured 159k evals for 3.5k band survivors
    # at sf0.1).
    band_w = length_tolerance + 1
    if length_col:
        a = base.withColumn("band", F.floor(F.col("len") / band_w)).alias("a")
        b = base.withColumn(
            "band",
            F.explode(F.array(
                F.floor(F.col("len") / band_w) - 1,
                F.floor(F.col("len") / band_w),
                F.floor(F.col("len") / band_w) + 1,
            )),
        ).alias("b")
    else:
        a, b = base.alias("a"), base.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    if length_col:
        cond = cond & (F.col("a.band") == F.col("b.band")) \
            & (F.abs(F.col("a.len") - F.col("b.len")) <= length_tolerance)
    # Banded levenshtein (Spark 4 3-arg form: -1 when distance exceeds
    # the bound, exact below — O(max_dist·n) with early exit instead of
    # O(n·m)) + _once so the distance is computed exactly once instead
    # of in the pushed-down join condition AND the projection.
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            _once(F.levenshtein(F.col("a.pfx"), F.col("b.pfx"),
                                max_dist), "int").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") >= 0)
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    sort_key,
    id_col: str = "doc_id",
    window: int = 5,
) -> DataFrame:
    """Sorted-neighborhood blocking (the classic record-linkage method,
    complementing the hash-family blockers here): order all records by
    a blocking key (e.g. a normalized title prefix) and emit every pair
    within ``window`` positions. Catches near-duplicates that sort
    adjacently even when they share few shingles (truncation, heavy
    suffix edits) — the failure mode of Jaccard/minhash blocking.

    Scale: the global order comes from the distributed rank
    (operators/ranking.py — range partition + offsets, no single-task
    window); the neighborhood join is an EQUI-join on rank buckets of
    size ``window`` (each left row probes its own and the next bucket),
    so candidates ~ N·window rows and the shuffle is bucket-keyed —
    never an all-pairs product. Returns (id_a, id_b, rank_distance)
    with id_a the earlier-sorted record."""
    from goetl_spark.operators.ranking import global_row_number

    if window < 1:
        raise ValueError("window must be >= 1")
    key = F.col(sort_key) if isinstance(sort_key, str) else sort_key
    base = df.select(key.alias("__k"), F.col(id_col).alias("__id"))
    ranked = global_row_number(base, ["__k", "__id"], out="__r")

    left = ranked.select(
        F.col("__id").alias("id_a"), F.col("__r").alias("__ra"),
        F.explode(F.array(
            F.floor((F.col("__r") - 1) / window),
            F.floor((F.col("__r") - 1) / window) + 1)).alias("__b"))
    right = ranked.select(
        F.col("__id").alias("id_b"), F.col("__r").alias("__rb"),
        F.floor((F.col("__r") - 1) / window).alias("__b"))
    return (
        left.join(right, on="__b")
        .filter((F.col("__rb") > F.col("__ra"))
                & (F.col("__rb") - F.col("__ra") <= window))
        .select("id_a", "id_b",
                (F.col("__rb") - F.col("__ra")).cast("int")
                .alias("rank_distance"))
    )


def winnow_anchor_positions(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 20, window: int = 8,
) -> DataFrame:
    """Positional variant of :func:`winnow_fingerprints`: one row per
    winnow-selected anchor with its CHARACTER offset and the exact
    ``k``-gram substring — the index for span-level dedup, where "which
    fingerprint" is not enough and "where, and what text" is needed.

    Returns (id_col, pos, gram): ``pos`` is the 0-based char offset,
    ``gram`` is ``text[pos:pos+k]`` verbatim. Because winnowing selects
    positions by CONTENT (each window keeps its minimum hash), the two
    copies of any duplicated region pick the same anchors at the same
    in-region offsets — the property span detection needs and a fixed
    stride cannot give (arbitrary alignment).

    Implementation: the same vectorized rolling polynomial hash as
    :func:`winnow_fingerprints`, but over per-CHARACTER code points
    (utf-32 view — byte hashing would return byte offsets that split
    multibyte chars when slicing), keeping window-argmin positions
    instead of min values. Map-only, Arrow-batched, zero shuffle.
    Density ~2/(window+1) anchors per char.
    """
    import pandas as pd

    if k < 1 or window < 1:
        raise ValueError(f"k and window must be >= 1, got k={k} window={window}")

    B = 1000003

    def gen(batches):
        import numpy as np

        powers = np.array([pow(B, k - 1 - j, 1 << 64) for j in range(k)],
                          dtype=np.uint64)

        def doc_anchor_pos(text: str) -> np.ndarray:
            cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
            if len(cp) < k:
                return np.zeros(0, dtype=np.int64)
            n_grams = len(cp) - k + 1
            H = np.zeros(n_grams, dtype=np.uint64)
            for j in range(k):  # k vectorized shifted adds
                H += cp[j:j + n_grams].astype(np.uint64) * powers[j]
            if n_grams <= window:
                idx = np.array([int(H.argmin())])
            else:
                from numpy.lib.stride_tricks import sliding_window_view

                sw = sliding_window_view(H, window)
                idx = sw.argmin(axis=1) + np.arange(sw.shape[0])
            return np.unique(idx).astype(np.int64)

        for pdf in batches:
            ids, poss, grams = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                t = t or ""
                for p in doc_anchor_pos(t):
                    ids.append(i)
                    poss.append(int(p))
                    grams.append(t[p:p + k])
            yield pd.DataFrame({id_col: ids, "pos": poss, "gram": grams})

    id_type = dict(df.dtypes)[id_col]
    # spread a one-row-group input so the Python anchor kernel uses
    # every core, not one (guide §2.5; no-op at corpus scale)
    return spread_small_input(df.select(id_col, text_col)).mapInPandas(
        gen, f"{id_col} {id_type}, pos long, gram string"
    )


def duplicate_spans(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 20, window: int = 8, min_df: int = 2,
    merge_gap: int | None = None,
) -> DataFrame:
    """Cross-document duplicated-SPAN detection — the training-data
    dedup problem of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better"): find the regions of each document
    whose text also occurs elsewhere in the corpus, so they can be cut
    (:func:`cut_spans`) rather than dropping whole near-identical docs.
    Doc-level Jaccard/MinHash misses these entirely when the duplicated
    passage is a small fraction of both documents.

    Mechanics (suffix-array-free, join-shaped):

    1. winnow-selected anchor k-grams with positions
       (:func:`winnow_anchor_positions` — content-defined, so every
       copy of a duplicated region anchors identically);
    2. keep anchors whose EXACT gram text occurs in ≥ ``min_df``
       distinct documents (grouped on the substring itself, not a
       hash — no collision risk, no verification pass);
    3. per document, merge anchors closer than ``merge_gap`` (default
       ``window + k − 1``, the winnowing guarantee distance) into
       maximal spans [span_start, span_end).

    GUARANTEE (inherited from winnowing): every copy of a substring
    duplicated across ≥ ``min_df`` documents with length ≥
    ``window + k − 1`` contains at least one anchor, hence intersects
    at least one reported span. Reported spans only cover duplicated
    anchors — a span's grams all occur verbatim in other documents.

    At 100 TB: the anchor index is ~2/(window+1) of a full k-gram
    index; one shuffle groups grams for document-frequency, one joins
    the frequent set back, and the islands merge is a per-DOC window
    (anchors per doc are bounded by len/1 · density). Returns
    (id_col, span_start, span_end, n_anchors).
    """
    from pyspark.sql import Window

    if min_df < 2:
        raise ValueError("min_df must be >= 2 (a span duplicated across "
                         "fewer than 2 documents is not a duplicate)")
    gap = merge_gap if merge_gap is not None else window + k - 1

    anchors = winnow_anchor_positions(df, text_col, id_col, k, window)
    freq = (anchors.groupBy("gram")
            .agg(F.count_distinct(F.col(id_col)).alias("__df"))
            .filter(F.col("__df") >= min_df)
            .select("gram"))
    dup = anchors.join(freq, "gram")

    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + k).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    new_island = (prev_end.isNull()
                  | (F.col("pos") > prev_end + gap)).cast("int")
    island = F.sum(new_island).over(
        w.rowsBetween(Window.unboundedPreceding, 0))
    return (dup.withColumn("__island", island)
            .groupBy(id_col, "__island")
            .agg(F.min("pos").alias("span_start"),
                 (F.max("pos") + k).alias("span_end"),
                 F.count(F.lit(1)).alias("n_anchors"))
            .drop("__island"))


def cut_spans(
    df: DataFrame, spans: DataFrame, text_col: str = "text",
    id_col: str = "doc_id", out_col: str = "text_deduped",
) -> DataFrame:
    """Remove character spans from each document's text — the removal
    half of span dedup (filter ``spans`` first to keep one canonical
    copy, e.g. the lowest (doc_id, span_start) per duplicate cluster,
    if removal from every copy is not wanted).

    ``spans`` is (id_col, span_start, span_end) with 0-based
    half-open char offsets. Overlapping spans are tolerated (clamped
    while folding). Documents with no spans pass through unchanged.

    Zero-UDF: spans are collected per doc (bounded by doc length ·
    anchor density), sorted in-row, and the kept text is built with a
    single ``aggregate`` fold over the span array — concat the slice
    between the previous span's end and this span's start, then the
    tail. One shuffle (the per-doc collect); the fold is whole-stage
    codegen, not Python."""
    per_doc = (spans.groupBy(id_col)
               .agg(F.array_sort(F.collect_list(
                   F.struct(F.col("span_start").alias("s"),
                            F.col("span_end").alias("e")))).alias("__spans")))
    joined = df.join(per_doc, id_col, "left")
    txt = F.col(text_col)
    folded = F.aggregate(
        F.col("__spans"),
        F.struct(F.lit("").alias("out"), F.lit(0).cast("long").alias("prev")),
        lambda acc, sp: F.struct(
            F.concat(
                acc["out"],
                F.substring(
                    txt, (acc["prev"] + 1).cast("int"),
                    F.greatest(sp["s"] - acc["prev"],
                               F.lit(0).cast("long")).cast("int"))
            ).alias("out"),
            F.greatest(sp["e"], acc["prev"]).alias("prev")),
        lambda acc: F.concat(
            acc["out"],
            F.substring(txt, (acc["prev"] + 1).cast("int"),
                        F.length(txt))),
    )
    return (joined.withColumn(
        out_col,
        F.when(F.col("__spans").isNull(), txt).otherwise(folded))
        .drop("__spans"))


def frequent_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | None = None,
    sep: str = "\n",
    min_doc_frac: float = 0.05,
    min_docs: int = 2,
    max_lines_per_group: int = 10_000,
) -> DataFrame:
    """Boilerplate detection (the CCNet/Dolma hygiene companion to
    :func:`paragraph_dedup`): lines occurring in at least ``min_docs``
    AND ``min_doc_frac`` of the documents of the same ``group_col``
    (source / domain — None treats the corpus as one group). Shared
    headers, footers, nav bars and license blocks surface here; feed the
    result to :func:`strip_boilerplate`.

    Returns (grp, line, n_docs, doc_frac) capped at
    ``max_lines_per_group`` per group (highest-frequency first, line
    tie-break) so an adversarial group cannot materialize an unbounded
    boilerplate table.

    Scale: within-doc repeats collapse via in-row ``array_distinct``
    BEFORE the explode, so the count shuffle carries one row per
    (doc, distinct line); the group-total join is tiny (one row per
    group) and broadcasts."""
    from pyspark.sql import Window

    g = (F.col(group_col) if group_col else F.lit("")).alias("grp")
    pairs = df.select(
        g, F.explode(F.array_distinct(F.split(F.col(text_col), sep)))
        .alias("line"))
    counts = pairs.groupBy("grp", "line").agg(
        F.count(F.lit(1)).alias("n_docs"))
    totals = df.select(g).groupBy("grp").agg(
        F.count(F.lit(1)).alias("__n_total"))
    w = Window.partitionBy("grp").orderBy(F.desc("n_docs"), F.asc("line"))
    return (counts.join(F.broadcast(totals), "grp")
            .withColumn("doc_frac",
                        F.col("n_docs") / F.col("__n_total"))
            .filter((F.col("n_docs") >= min_docs)
                    & (F.col("doc_frac") >= min_doc_frac))
            .withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= max_lines_per_group)
            .drop("__n_total", "__rk"))


def strip_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | None = None,
    sep: str = "\n",
    min_doc_frac: float = 0.05,
    min_docs: int = 2,
    boiler: DataFrame | None = None,
) -> DataFrame:
    """Remove every :func:`frequent_lines` line from its group's
    documents, preserving the order (and repeats) of the surviving
    lines — line-level boilerplate stripping per source/domain. Pass a
    precomputed ``boiler`` frame to reuse one detection pass across
    many strips (or to strip against a REFERENCE corpus's boilerplate).

    Returns the input columns with ``text_col`` rewritten plus
    (n_kept, n_dropped).

    Scale: the boilerplate table is aggregated to ONE array row per
    group and broadcast — documents never shuffle; the strip is an
    in-row higher-order filter (JVM-side, order-preserving, keeps
    duplicate non-boilerplate lines that array-set ops would lose)."""
    if boiler is None:
        boiler = frequent_lines(df, text_col, id_col, group_col, sep,
                                min_doc_frac, min_docs)
    per_group = boiler.groupBy("grp").agg(
        F.collect_list("line").alias("__boiler"))
    g = (F.col(group_col) if group_col else F.lit("")).alias("grp")
    joined = (df.withColumn("grp", g)
              .join(F.broadcast(per_group), "grp", "left"))
    lines = F.split(F.col(text_col), sep)
    ba = F.coalesce(F.col("__boiler"),
                    F.array().cast("array<string>"))
    kept = F.filter(lines, lambda l: ~F.array_contains(ba, l))
    out_cols = [c for c in df.columns if c != text_col]
    return (joined
            .withColumn("__kept", kept)
            .select(*out_cols,
                    F.concat_ws(sep, F.col("__kept")).alias(text_col),
                    F.size("__kept").alias("n_kept"),
                    (F.size(lines) - F.size("__kept")).alias("n_dropped")))


def lsh_recall_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 32,
    band_size: int = 4,
    sample_fraction: float = 1.0,
) -> DataFrame:
    """Measure the banded-LSH config against exact Jaccard on a (hash-
    deterministic) sample: one row with the candidate count, the true
    near-dup count, recall (true pairs the bands caught), and the
    candidate precision — the go/no-go check before committing a
    (num_hashes, bands) choice to a 100 TB dedup run, mirroring q100's
    PQ-recall-floor discipline for the ANN family.

    The sample keeps the exact-Jaccard ground truth affordable (it is
    the quadratic-ish part); LSH candidates are computed on the SAME
    sample so the two pair sets are comparable. Selection is by md5
    bucket of the id (deterministic, reproducible — no RNG).
    """
    work = df
    if sample_fraction < 1.0:
        buckets = 10_000
        cut = int(sample_fraction * buckets)
        work = df.filter(
            md5_int(F.col(id_col).cast("string"), 8) % buckets < cut)
    work = work.localCheckpoint(eager=True)

    truth = (ngram_jaccard_pairs(work, text_col, id_col, n=n,
                                 threshold=threshold)
             .select("id_a", "id_b"))
    cand = (minhash_lsh_candidates(work, text_col, id_col, n=n,
                                   num_hashes=num_hashes,
                                   band_size=band_size)
            .select("id_a", "id_b"))
    n_truth = truth.count()
    n_cand = cand.count()
    n_hit = truth.join(cand, ["id_a", "id_b"]).count()
    spark = df.sparkSession
    return spark.createDataFrame(
        [(n_cand, n_truth, n_hit,
          (n_hit / n_truth) if n_truth else 1.0,
          (n_hit / n_cand) if n_cand else 1.0)],
        "n_candidates long, n_true_pairs long, n_caught long, "
        "recall double, precision double")


def _lsh_meta_read(spark, path: str) -> dict | None:
    """Index-config manifest reader — the scheme-agnostic
    ``{path}/_meta.json`` written through the Hadoop FileSystem API
    (see operators/index_meta.py), with the pre-migration
    driver-local ``_lsh_meta.json`` as a local-path fallback. Returns
    None only when no manifest is readable; callers raise in that
    case rather than skip validation."""
    from .index_meta import meta_read

    return meta_read(spark, path, legacy="_lsh_meta.json")


def lsh_index_write(
    df: DataFrame, path: str,
    text_col: str = "text", id_col: str = "doc_id",
    n: int = 3, num_hashes: int = 32, band_size: int = 4,
    mode: str = "overwrite", batch_stamp: str | None = None,
) -> None:
    """Persist the banded-LSH index of a corpus: (id, band, band_hash)
    parquet partitioned by band — the standing near-dup index the daily
    batch queries against (:func:`lsh_index_candidates`), the MinHash
    analog of :func:`dedup_against`'s exact-digest corpus. Shingling +
    minhashing of the standing corpus happens ONCE, here; incremental
    batches never recompute it. ``mode='append'`` adds a day's accepted
    documents to the index — after the manifest check (band hashes
    written under a different config are incomparable; a missing
    manifest RAISES rather than skipping the check). On a layout-2
    index (any build since r17) appends land in a per-batch
    ``_b={batch_stamp}`` subdirectory: pass a deterministic
    ``batch_stamp`` to make the append IDEMPOTENT — retrying the same
    stamp after a failure replaces that batch's rows instead of
    duplicating them (with no stamp a random one is used, and a
    caller-retried failed append duplicates whichever bands already
    landed — dropDuplicates the candidates or rebuild, the legacy
    semantics)."""
    from .index_meta import (
        LAYOUT, file_delete_recursive, leg_write, meta_config,
        meta_invalidate, meta_write, resolve_stamp)

    spark = df.sparkSession
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    meta = {"n": n, "num_hashes": num_hashes, "band_size": band_size}
    if mode == "append":
        existing = _lsh_meta_read(spark, path)
        if existing is None:
            raise ValueError(
                f"lsh_index_write(append): no readable manifest at "
                f"{path!r} — cannot confirm the index config; rebuild "
                f"with mode='overwrite'")
        if meta_config(existing) != meta:
            raise ValueError(
                f"lsh_index_write(append): config {meta} != index config "
                f"{meta_config(existing)} — band hashes are incomparable "
                f"across configs")
        stamp = resolve_stamp(existing, batch_stamp, "lsh_index_write")
    else:
        # invalidate-first / commit-last (index_meta.py protocol),
        # then explicit truncation: layout-2 base data lives under
        # _b=base, which no longer sweeps stale band partitions (or
        # stale batch subdirectories) from a previous index the way
        # the old root static overwrite did.
        meta_invalidate(spark, path)
        file_delete_recursive(spark, path)
        stamp = "base"
    bands = lsh_band_rows(df, text_col, id_col, n, num_hashes, band_size)
    leg_write(bands, path, mode, stamp, parts=("band",))
    if mode == "overwrite":
        meta_write(spark, path, {**meta, "layout": LAYOUT})


def lsh_index_candidates(
    new_docs: DataFrame, path: str,
    text_col: str = "text", id_col: str = "doc_id",
    n: int = 3, num_hashes: int = 32, band_size: int = 4,
    include_new_pairs: bool = True,
) -> DataFrame:
    """Near-dup candidates of a NEW batch against the persisted index
    (plus, by default, within-batch pairs): returns (query_id,
    match_id) where match_id is an indexed id (query_id < match_id for
    within-batch pairs). The config (n, num_hashes, band_size) must
    match the one the index was written with — band hashes are only
    comparable under identical parameters.

    Scale: the new batch's band rows are tiny next to the index; the
    join shuffles on (band, band_hash) — the index side was written
    partitioned by band, so a band-pruned read feeds the join without
    re-deriving any corpus signatures. Feed the output through
    ``ngram_jaccard_pairs``-style verification or straight to
    :func:`dedup_clusters`."""
    from .index_meta import meta_config

    spark = new_docs.sparkSession
    existing = _lsh_meta_read(spark, path)
    ours = {"n": n, "num_hashes": num_hashes, "band_size": band_size}
    if existing is None:
        raise ValueError(
            f"lsh_index_candidates: no readable manifest at {path!r} — "
            f"cannot confirm the index config matches {ours}; rebuild "
            f"the index (a skipped config check is a silent recall hole)")
    if meta_config(existing) != ours:
        raise ValueError(
            f"lsh_index_candidates: config {ours} != index config "
            f"{meta_config(existing)} — band hashes are incomparable "
            f"across configs")
    new_bands = lsh_band_rows(new_docs, text_col, id_col, n,
                              num_hashes, band_size) \
        .localCheckpoint(eager=True)
    idx = spark.read.parquet(path)
    cross = (
        new_bands.alias("q")
        .join(idx.alias("m"),
              (F.col("q.band") == F.col("m.band"))
              & (F.col("q.band_hash") == F.col("m.band_hash"))
              & (F.col(f"q.{id_col}") != F.col(f"m.{id_col}")))
        .select(F.col(f"q.{id_col}").alias("query_id"),
                F.col(f"m.{id_col}").alias("match_id"))
    )
    if not include_new_pairs:
        return cross.distinct()
    a, b = new_bands.alias("a"), new_bands.alias("b")
    within = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_hash") == F.col("b.band_hash"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("query_id"),
                F.col(f"b.{id_col}").alias("match_id"))
    )
    # ONE distinct over the union instead of one per branch plus a
    # third over the union (r17, guide §2.4): same pair SET — a pair
    # colliding on several bands, or appearing in both branches when
    # an id sits on both sides, collapses identically — for two fewer
    # exchanges over the (large) candidate stream.
    return cross.unionByName(within).distinct()


def simhash_index_write(
    df: DataFrame, path: str,
    text_col: str = "text", id_col: str = "doc_id",
    max_hamming: int = 8, bits: int = 60,
    mode: str = "overwrite", batch_stamp: str | None = None,
) -> None:
    """Persist the pigeonhole-band simhash index of a corpus —
    the LOSSLESS standing near-dup index (unlike the probabilistic
    MinHash bands of :func:`lsh_index_write`, every pair within the
    Hamming bound is guaranteed a band collision). Cheapest signature
    of the family: one 60-bit hash per document, ``max_hamming + 1``
    band rows each. Same manifest discipline as the LSH index —
    mismatched (max_hamming, bits) raise at query time, and a missing
    manifest raises rather than skipping the check. Appends take the
    same per-batch ``batch_stamp`` idempotence contract as
    :func:`lsh_index_write` (retry the same stamp after a failure —
    it replaces, never duplicates)."""
    from .index_meta import (
        LAYOUT, file_delete_recursive, leg_write, meta_config,
        meta_invalidate, meta_write, resolve_stamp)

    spark = df.sparkSession
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    meta = {"max_hamming": max_hamming, "bits": bits}
    if mode == "append":
        existing = _lsh_meta_read(spark, path)
        if existing is None:
            raise ValueError(
                f"simhash_index_write(append): no readable manifest at "
                f"{path!r} — cannot confirm the index config; rebuild "
                f"with mode='overwrite'")
        if meta_config(existing) != meta:
            raise ValueError(
                f"simhash_index_write(append): config {meta} != index "
                f"config {meta_config(existing)} — band keys are "
                f"incomparable")
        stamp = resolve_stamp(existing, batch_stamp,
                              "simhash_index_write")
    else:
        # invalidate-first / commit-last + explicit truncation (see
        # lsh_index_write: the layout-2 base write no longer sweeps
        # stale bands or batch subdirectories)
        meta_invalidate(spark, path)
        file_delete_recursive(spark, path)
        stamp = "base"
    rows = simhash_band_rows(df, text_col, id_col, max_hamming, bits)
    leg_write(rows, path, mode, stamp, parts=("band",))
    if mode == "overwrite":
        meta_write(spark, path, {**meta, "layout": LAYOUT})


def simhash_index_candidates(
    new_docs: DataFrame, path: str,
    text_col: str = "text", id_col: str = "doc_id",
    max_hamming: int = 8, bits: int = 60,
    include_new_pairs: bool = True,
) -> DataFrame:
    """Verified near-dup matches of a NEW batch against the persisted
    simhash index: (query_id, match_id, hamming) with hamming ≤
    ``max_hamming`` — exact within the bound, because the pigeonhole
    bands are lossless and the stored simhash rides along for the
    final ``bit_count`` check (no second pass over corpus text).
    ``include_new_pairs`` adds within-batch pairs the same way."""
    from .index_meta import meta_config

    spark = new_docs.sparkSession
    ours = {"max_hamming": max_hamming, "bits": bits}
    existing = _lsh_meta_read(spark, path)
    if existing is None:
        raise ValueError(
            f"simhash_index_candidates: no readable manifest at "
            f"{path!r} — cannot confirm the index config matches "
            f"{ours}; rebuild the index (a skipped config check is a "
            f"silent recall hole)")
    if meta_config(existing) != ours:
        raise ValueError(
            f"simhash_index_candidates: config {ours} != index config "
            f"{meta_config(existing)} — band keys are incomparable")
    nb = simhash_band_rows(new_docs, text_col, id_col, max_hamming,
                           bits).localCheckpoint(eager=True)
    idx = spark.read.parquet(path)

    def matches(left, right, cond):
        return (left.join(right, cond)
                .select(F.col(f"q.{id_col}").alias("query_id"),
                        F.col(f"m.{id_col}").alias("match_id"),
                        F.bit_count(F.col("q.simhash")
                                    .bitwiseXOR(F.col("m.simhash")))
                        .alias("hamming"))
                .filter(F.col("hamming") <= max_hamming))

    cross = matches(
        nb.alias("q"), idx.alias("m"),
        (F.col("q.band") == F.col("m.band"))
        & (F.col("q.key") == F.col("m.key"))
        & (F.col(f"q.{id_col}") != F.col(f"m.{id_col}")))
    if not include_new_pairs:
        return cross.distinct()
    within = matches(
        nb.alias("q"), nb.alias("m"),
        (F.col("q.band") == F.col("m.band"))
        & (F.col("q.key") == F.col("m.key"))
        & (F.col(f"q.{id_col}") < F.col(f"m.{id_col}")))
    # ONE distinct over the union (see lsh_index_candidates): identical
    # pair set, two fewer exchanges over the candidate stream
    return cross.unionByName(within).distinct()


def ngram_containment_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n: int = 3, threshold: float = 0.8,
    max_df: int | float | None = 256, materialize: bool = True,
) -> DataFrame:
    """Exact n-gram CONTAINMENT for candidate pairs — the asymmetric
    sibling of :func:`ngram_jaccard_pairs`: score = |A∩B| / min(|A|,|B|)
    (Broder's containment, max over both directions). Jaccard punishes
    size asymmetry (a 50-shingle quote inside a 5000-shingle article
    scores ≈ 0.01), so excerpt/quote/boilerplate-wrapper relationships
    pass a Jaccard filter — containment is the measure that catches the
    smaller document living inside the bigger one.

    Same scale machinery as the Jaccard pass, same exactness contract:
    inverted-index self-join over 60-bit shingle keys, the ``max_df``
    hot-shingle cap applied BEFORE the join with sizes computed over
    the SAME capped universe (so the score is the exact containment of
    the capped shingle sets — mirror the cap in any SQL oracle), and
    ``materialize`` scoping the cached index. Returns
    (id_a, id_b, n_common, n_a, n_b, containment), id_a < id_b."""
    idx = shingle_index(df, text_col, id_col, n).select(
        F.col(id_col), md5_int(F.col("shingle"), 15).alias("hk")
    ).cache()
    try:
        if max_df is not None:
            cap = (max_df if isinstance(max_df, int)
                   else max(int(max_df * df.count()), 2))
            hot = (idx.groupBy("hk").agg(F.count(F.lit(1)).alias("df_"))
                   .filter(F.col("df_") > cap).select("hk"))
            idx_f = idx.join(F.broadcast(hot), "hk", "left_anti")
        else:
            idx_f = idx
        sizes = idx_f.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("n_shingles"))
        a, b = idx_f.alias("a"), idx_f.alias("b")
        inter = (
            a.join(b, (F.col("a.hk") == F.col("b.hk"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("n_common")))
        sa = sizes.select(F.col(id_col).alias("id_a"),
                          F.col("n_shingles").alias("n_a"))
        sb = sizes.select(F.col(id_col).alias("id_b"),
                          F.col("n_shingles").alias("n_b"))
        out = (
            inter.join(sa, "id_a").join(sb, "id_b")
            .withColumn("containment",
                        F.col("n_common").cast("double")
                        / F.least("n_a", "n_b"))
            .filter(F.col("containment") >= threshold)
            .select("id_a", "id_b", "n_common", "n_a", "n_b",
                    "containment"))
        if materialize:
            out = out.localCheckpoint(eager=True)
        return out
    finally:
        if materialize:
            idx.unpersist()


def dedup_keep_best(
    df: DataFrame,
    pairs: DataFrame,
    quality_col: str,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Near-dup resolution keeping the BEST copy per duplicate cluster
    instead of the lowest id: connected components over the candidate
    pairs (:func:`dedup_clusters`), then each cluster's representative
    is its highest-``quality_col`` member (id ascending tie-break, so
    the choice is total-ordered and deterministic; the id may be any
    orderable type — string doc ids work, only ``quality_col`` must be
    numeric, which a score always is). Documents outside
    every pair keep themselves. min-id keeps whichever copy happened to
    be crawled first; in a training corpus you want the cleanest
    rendition of the duplicated content — feed any score (quality_score,
    gopher pass counts, classifier probability, -perplexity).

    Returns (id_col, cluster_id, ``quality_col``, keep) — filter
    ``keep`` for the surviving corpus. Scale shape: components as in
    dedup_clusters (shallow near-dup graphs, O(diameter) rounds); the
    representative choice is one per-cluster max_by aggregation joined
    back on the cluster key; singletons bypass both (left join, keep
    defaults true)."""
    clusters = dedup_clusters(pairs, id_a=id_a, id_b=id_b,
                              max_iter=max_iter)
    if id_col != "doc_id":
        # dedup_clusters names its id column "doc_id"; align with the
        # caller's frame so the membership join resolves
        clusters = clusters.withColumnRenamed("doc_id", id_col)
    scored = df.select(F.col(id_col), F.col(quality_col))
    members = scored.join(clusters, id_col, "left").withColumn(
        "cluster_id", F.coalesce("cluster_id", F.col(id_col)))
    # min_by over (-quality, id): highest quality wins, then ascending
    # id — struct ordering is ascending per field, so negating the
    # (numeric by contract) score keeps the id tie-break type-agnostic
    # (a max_by with -id would ANSI-fail on string ids)
    best = (members.groupBy("cluster_id")
            .agg(F.min_by(
                F.col(id_col),
                F.struct((-F.col(quality_col)).alias("nq"),
                         F.col(id_col).alias("tie"))).alias("best_id")))
    return (members.join(best, "cluster_id")
            .select(id_col, "cluster_id", quality_col,
                    (F.col(id_col) == F.col("best_id")).alias("keep")))


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    max_dist: int = 2,
) -> DataFrame:
    """LOSSLESS edit-distance join between two tables: every pair with
    ``levenshtein(left_col, right_col) <= max_dist``, as (left id,
    right id, edit_dist) — the record-linkage / entity-resolution
    primitive (:func:`fuzzy_pairs` prunes with caller-chosen block
    columns and a prefix approximation — an explicit recall trade;
    :func:`sorted_neighborhood_pairs` is windowed-approximate; this
    one GUARANTEES completeness, the simhash-band discipline applied
    to edit distance).

    Candidate generation is the PassJoin pigeonhole (Li, Deng, Feng,
    ICDE 2011 — public algorithm): each right string of length L >= d+1
    splits into d+1 deterministic segments; if ed(s, t) <= d, some
    segment of s has NO edits inside it under an optimal alignment, so
    it appears in t verbatim, shifted at most d positions by prior
    indels. Rights emit (segment_index, segment, L) keys — d+1 rows
    each; lefts emit, for every candidate right-length L within d of
    their own and every segment slot, the substrings at the allowed
    positions — a BOUNDED in-row expansion of at most
    (2d+1)·(d+1)·(2d+1) keys per row (why this operator is for small
    d, the regime edit-distance linkage actually uses; larger
    thresholds belong to the shingle/minhash family). Candidates
    equi-join on the key, distinct to one row per pair, then one exact
    JVM-side ``levenshtein`` verifies — candidates are a superset by
    the pigeonhole, never a miss. Right strings shorter than d+1
    segments route through a tiny length-keyed side branch (their
    matches have length <= 2d — a bounded domain on both sides).

    NULL strings on either side are dropped (an unmatched key is a
    caller bug the same way an unrankable score is). Ids must be
    unique per side. Deterministic: the output is a set — exact
    integer distances, no order sensitivity anywhere — so it replays
    hash-exact against a naive all-pairs oracle.

    Scale shape: two in-row expansions (map-side), one equi-join on
    the segment key, one distinct, one hash join back to each side's
    strings for the verify — never a cartesian product. A segment key
    shared by many strings (common prefixes at equal lengths) fattens
    its join cell — the hot-shingle shape; the verify pass bounds the
    damage to candidate count, and a skewed cell is AQE's job (the
    ann_join precedent). At 100 TB: candidates ~ pairs that genuinely
    collide on a segment, not N·M."""
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    if max_dist > 8:
        raise ValueError(
            f"max_dist={max_dist}: the in-row candidate expansion is "
            f"(2d+1)²·(d+1) keys per left row — past d=8 that is the "
            f"wrong tool; use the shingle/minhash family for loose "
            f"similarity")
    d, k = max_dist, max_dist + 1
    lc = (left.select(F.col(left_id).alias("__lid"),
                      F.col(left_col).alias("__ls"))
          .filter(F.col("__ls").isNotNull()))
    rc = (right.select(F.col(right_id).alias("__rid"),
                       F.col(right_col).alias("__rs"))
          .filter(F.col("__rs").isNotNull()))

    # right: d+1 segment keys per string (0-based starts; segment i of
    # a length-L string starts at i·(L div k) + min(i, L mod k) and is
    # (L div k) + [i < L mod k] long — first (L mod k) segments carry
    # the remainder)
    seg_len = f"((L div {k}) + IF(i < L % {k}, 1, 0))"
    seg_start = f"(i * (L div {k}) + least(i, L % {k}))"
    r_segs = f"""
    transform(sequence(0, {d}), i ->
        struct(i AS seg_i, length(__rs) AS seg_l,
               substring(__rs,
                         (i * (length(__rs) div {k})
                          + least(i, length(__rs) % {k})) + 1,
                         ((length(__rs) div {k})
                          + IF(i < length(__rs) % {k}, 1, 0))) AS seg))
    """
    r_keys = (rc.filter(F.length("__rs") >= k)
              .select("__rid", F.explode(F.expr(r_segs)).alias("p"))
              .select("__rid", "p.seg_i", "p.seg_l", "p.seg"))

    # left: for every candidate right-length L in [|t|-d, |t|+d] with
    # L >= k and every segment slot i, the substrings of t with the
    # slot's length at positions within d of the slot's start — the
    # pigeonhole superset. filter() keeps every sequence() ascending
    # (Spark's sequence auto-REVERSES when start > stop — a silent
    # wrong-direction hazard, hence greatest() padding + filter).
    l_cands = f"""
    flatten(transform(
        filter(sequence(greatest(length(__ls) - {d}, {k}),
                        greatest(length(__ls) + {d}, {k})),
               L -> L <= length(__ls) + {d}),
        L -> flatten(transform(sequence(0, {d}), i ->
            transform(
                filter(sequence(greatest({seg_start} - {d}, 0),
                                {seg_start} + {d}),
                       q -> q + {seg_len} <= length(__ls)),
                q -> struct(i AS seg_i, L AS seg_l,
                            substring(__ls, q + 1, {seg_len}) AS seg))))))
    """
    l_keys = (lc.select("__lid", F.explode(F.expr(l_cands)).alias("p"))
              .select("__lid", "p.seg_i", "p.seg_l", "p.seg"))

    cand = (l_keys.join(r_keys, ["seg_i", "seg_l", "seg"])
            .select("__lid", "__rid").distinct())

    # short rights (|s| < d+1 — zero-length segments would match
    # everything): their matches have |t| <= |s|+d <= 2d, so both
    # sides are tiny; a length-keyed equi-join keeps it a hash join
    r_short = rc.filter(F.length("__rs") < k).select(
        "__rid", F.length("__rs").alias("__L"))
    l_short = (lc.filter(F.length("__ls") <= 2 * d)
               .select("__lid", F.explode(F.expr(
                   f"filter(sequence(greatest(length(__ls) - {d}, 0), "
                   f"length(__ls) + {d}), L -> L < {k})")).alias("__L")))
    cand = cand.unionByName(
        l_short.join(r_short, "__L").select("__lid", "__rid").distinct())

    # Banded + single-evaluation verify (see _once): the 3-arg
    # levenshtein early-exits at d (-1 above the bound, exact below),
    # and the wrapper stops Catalyst from ALSO evaluating it inside the
    # pushed-down join condition.
    dist = _once(F.levenshtein(F.col("__ls"), F.col("__rs"), d), "int")
    return (cand.join(lc, "__lid").join(rc, "__rid")
            .withColumn("edit_dist", dist)
            .filter(F.col("edit_dist") >= 0)
            .select(F.col("__lid").alias(left_id),
                    F.col("__rid").alias(right_id),
                    F.col("edit_dist").cast("int").alias("edit_dist")))


def jaccard_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_tokens: str,
    right_id: str,
    right_tokens: str,
    threshold: float,
) -> DataFrame:
    """EXACT Jaccard-threshold join between two token-set tables: every
    pair with ``|x ∩ y| / |x ∪ y| >= threshold``, as (left id, right
    id, jaccard) — the lossless set-similarity sibling of
    :func:`edit_distance_join` (minhash_lsh answers the same question
    APPROXIMATELY with a banding recall curve; this one guarantees the
    exact threshold, the trade being candidate counts that grow with
    how self-similar the corpus actually is).

    Candidate generation is the AllPairs/PPJoin prefix filter
    (Bayardo et al. WWW'07; Xiao et al. WWW'08 — public algorithms):
    order every token by global rarity (one shared count table, ties
    broken by the token itself so the order is total and
    deterministic), sort each record's DISTINCT tokens by that order,
    and emit only the first ``|x| − ⌈τ·|x|⌉ + 1`` tokens as join keys
    — the pigeonhole: J(x,y) >= τ forces an overlap of at least
    ⌈τ·max(|x|,|y|)⌉, and any overlap that large must touch both
    records' prefixes. Rare-first ordering makes the surviving keys
    the LEAST shared tokens, so candidate cells stay thin exactly
    where the corpus is diverse. A length filter
    (τ·|x| <= |y| <= |x|/τ) rides the candidate join; one exact
    ``array_intersect`` verifies each distinct pair.

    Duplicate tokens collapse (Jaccard is a SET measure); NULL or
    EMPTY token sets are dropped (J against the empty set is 0 — or
    0/0 — never >= a positive τ); a NULL element INSIDE a set is
    excluded on both sides (it matches nothing — the rarity join is
    null-strict, and the verify arrays are rebuilt from the same
    join, so the exclusion is consistent by construction; pinned by
    tests). ``threshold`` must be in (0, 1].
    Deterministic set output — integer intersection sizes, one IEEE
    division — replays hash-exact against the naive all-pairs oracle.

    Scale shape: one token-count aggregate shared by both sides, one
    sort-within-record map pass each, a prefix-key equi-join (never a
    cartesian), distinct, and a verify join carrying the sorted
    arrays. Hot prefix tokens (a token both rare enough to survive
    the prefix AND shared by many records) fatten one cell — AQE's
    job, the edit_distance_join/ann_join precedent. At 100 TB:
    candidates ~ genuine prefix collisions; a corpus where most pairs
    really exceed τ has quadratic OUTPUT, which no algorithm beats."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    tau = float(threshold)
    lc = (left.select(F.col(left_id).alias("__lid"),
                      F.array_distinct(F.col(left_tokens)).alias("__lt"))
          .filter(F.col("__lt").isNotNull() & (F.size("__lt") > 0)))
    rc = (right.select(F.col(right_id).alias("__rid"),
                       F.array_distinct(F.col(right_tokens)).alias("__rt"))
          .filter(F.col("__rt").isNotNull() & (F.size("__rt") > 0)))

    # one global rarity table over BOTH sides: (token -> count); the
    # sort key is the (count, token) struct itself, so no dense-rank
    # pass is needed and the order is total + deterministic
    toks = (lc.select(F.explode("__lt").alias("tok"))
            .unionByName(rc.select(F.explode("__rt").alias("tok")))
            .groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
            .localCheckpoint(eager=True))

    def _sorted_side(df: DataFrame, id_c: str, arr_c: str) -> DataFrame:
        e = (df.select(id_c, F.explode(arr_c).alias("tok"))
             .join(toks, "tok"))
        return (e.groupBy(id_c)
                .agg(F.array_sort(F.collect_list(
                    F.struct(F.col("cnt"), F.col("tok")))).alias("__st"))
                .select(id_c,
                        F.transform(F.col("__st"), lambda s: s["tok"])
                         .alias(arr_c),
                        F.size("__st").alias("__n")))

    ls = _sorted_side(lc, "__lid", "__lt")
    rs = _sorted_side(rc, "__rid", "__rt")

    # prefix length |x| - ceil(tau*|x|) + 1; slice() is 1-based
    def _prefix(arr_c: str) -> Column:
        p = (F.col("__n") - F.ceil(F.lit(tau) * F.col("__n")) + 1) \
            .cast("int")
        return F.slice(F.col(arr_c), 1, p)

    l_keys = ls.select("__lid", F.col("__n").alias("__ln"),
                       F.explode(_prefix("__lt")).alias("tok"))
    r_keys = rs.select("__rid", F.col("__n").alias("__rn"),
                       F.explode(_prefix("__rt")).alias("tok"))
    cand = (l_keys.join(r_keys, "tok")
            .filter((F.col("__rn") >= F.lit(tau) * F.col("__ln"))
                    & (F.col("__rn") <= F.col("__ln") / F.lit(tau)))
            .select("__lid", "__rid").distinct())

    o = F.size(F.array_intersect(F.col("__lt"), F.col("__rt")))
    union_n = F.col("__lln") + F.col("__rrn") - o
    return (cand
            .join(ls.select("__lid", "__lt",
                            F.col("__n").alias("__lln")), "__lid")
            .join(rs.select("__rid", "__rt",
                            F.col("__n").alias("__rrn")), "__rid")
            .withColumn("jaccard", _once(o / union_n))
            .filter(F.col("jaccard") >= tau)
            .select(F.col("__lid").alias(left_id),
                    F.col("__rid").alias(right_id), "jaccard"))


def _jaccard_sorted(df: DataFrame, id_c: str, arr_c: str,
                    toks: DataFrame) -> DataFrame:
    """Per-record DISTINCT tokens sorted by the given (tok, cnt)
    rarity table — tokens absent from the table count 0 (rarest), so
    a FROZEN build-time table keeps ordering every future batch
    totally and deterministically. NULL elements are dropped BEFORE
    the left join (r16 ADVICE): :func:`jaccard_join`'s inner rarity
    join is null-strict, and a NULL element kept here would both
    inflate the set size ``__n`` and land in prefixes as an equi-join
    key that can never match — a silent recall hole vs the one-shot
    join's answer."""
    e = (df.select(id_c, arr_c)
         .select(id_c, F.explode(arr_c).alias("tok"))
         .filter(F.col("tok").isNotNull())
         .join(toks, "tok", "left")
         .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0))))
    return (e.groupBy(id_c)
            .agg(F.array_sort(F.collect_list(
                F.struct(F.col("cnt"), F.col("tok")))).alias("__st"))
            .select(id_c,
                    F.transform(F.col("__st"), lambda s: s["tok"])
                     .alias(arr_c),
                    F.size("__st").alias("__n")))


def _jaccard_prefix(arr_c: str, tau: float):
    p = (F.col("__n") - F.ceil(F.lit(tau) * F.col("__n")) + 1).cast("int")
    return F.slice(F.col(arr_c), 1, p)


def jaccard_index_write(
    df: DataFrame, path: str,
    id_col: str = "doc_id", tokens_col: str = "tokens",
    threshold: float = 0.8, mode: str = "overwrite",
    batch_stamp: str | None = None,
) -> None:
    """Persist the prefix-filter index of a token-set corpus — the
    standing-index variant of :func:`jaccard_join`, the exact-Jaccard
    analog of :func:`lsh_index_write` (r14 verdict depth candidate:
    repeated corpus pulls were re-sorting every record's token set on
    every call). Three parquet legs under ``path``: ``tokens/`` (the
    build-corpus rarity table — FROZEN; every later batch is ordered
    by it), ``records/`` (id, rarity-sorted distinct tokens, set
    size — the verify side), ``prefix/`` (tok, id, set size — the
    candidate join keys, |x| − ⌈τ·|x|⌉ + 1 rarest tokens per record),
    plus a scheme-agnostic ``_meta.json`` config manifest (written
    through the Hadoop FileSystem API under the invalidate-first /
    commit-last protocol — see operators/index_meta.py: the old
    manifest is removed before any data leg is touched and the new
    one commits only after every leg landed, so no rebuild-crash
    window leaves a readable config over data it does not match).

    Freezing the rarity order is CORRECT, not a compromise: the
    AllPairs/PPJoin prefix pigeonhole (Bayardo WWW'07; Xiao WWW'08)
    holds for ANY total token order as long as both sides use the
    SAME one — rarity ordering is purely a selectivity heuristic.
    What drifts as the corpus grows is only candidate THINNESS
    (tokens that were rare at build time may become common); rebuild
    when candidate counts creep, exactly like re-banding an LSH
    index. ``mode='append'`` adds a day's accepted documents —
    sorted under the frozen order, tokens table untouched — after
    the same config check the LSH index makes (a prefix written at a
    different τ is incomparable).

    NULL/empty token sets are dropped, duplicate tokens collapse,
    NULL elements are excluded — the :func:`jaccard_join` set
    contract. Scale shape: one token-count aggregate (build only),
    one sort-within-record map pass, three columnar writes; the
    queries (:func:`jaccard_index_candidates`) then skip the corpus
    sort forever.

    Append idempotence: on a layout-2 index (any build since r17)
    each append lands in a per-batch ``_b={batch_stamp}``
    subdirectory of ``records/`` and ``prefix/`` — pass a
    deterministic ``batch_stamp`` and a RETRY of a failed append
    replaces that batch's rows in BOTH legs instead of duplicating
    whichever leg had already landed. With no stamp a random one
    keeps the layout consistent but a caller-retried failure
    duplicates candidate pairs (true pairs re-emitted, none lost) —
    ``dropDuplicates()`` the candidates or rebuild, and prefer a
    stamp."""
    from .index_meta import (
        LAYOUT, file_delete_recursive, leg_write, meta_config,
        meta_invalidate, meta_read, meta_write, resolve_stamp)

    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    spark = df.sparkSession
    meta = {"threshold": float(threshold)}
    if mode == "append":
        existing = meta_read(spark, path, legacy="_jaccard_meta.json")
        if existing is None:
            raise ValueError(
                f"jaccard_index_write(append): no readable manifest at "
                f"{path!r} — cannot confirm the index threshold; an "
                f"append under a mismatched tau would mix incomparable "
                f"prefixes silently. Rebuild with mode='overwrite'")
        if meta_config(existing) != meta:
            raise ValueError(
                f"jaccard_index_write(append): config {meta} != "
                f"index config {meta_config(existing)} — prefixes are "
                f"incomparable across thresholds")
        stamp = resolve_stamp(existing, batch_stamp,
                              "jaccard_index_write")
    base = (df.select(F.col(id_col).alias("__id"),
                      F.array_distinct(F.col(tokens_col)).alias("__t"))
            .filter(F.col("__t").isNotNull() & (F.size("__t") > 0)))
    if mode == "overwrite":
        # invalidate-first / commit-last (index_meta.py protocol): a
        # rebuild crash must never leave a readable manifest over data
        # legs it does not describe — in either direction. The
        # appendable legs are explicitly truncated (their layout-2
        # base data lives under _b=base, which no longer sweeps a
        # previous index's batch subdirectories).
        meta_invalidate(spark, path)
        file_delete_recursive(spark, f"{path}/records")
        file_delete_recursive(spark, f"{path}/prefix")
        stamp = "base"
        toks = (base.select(F.explode("__t").alias("tok"))
                .filter(F.col("tok").isNotNull())
                .groupBy("tok").agg(F.count(F.lit(1)).alias("cnt")))
        toks.write.mode("overwrite").parquet(f"{path}/tokens")
    toks = spark.read.parquet(f"{path}/tokens")
    recs = _jaccard_sorted(base, "__id", "__t", toks)
    leg_write(recs, f"{path}/records", mode, stamp)
    if stamp is not None:
        # r17 optimization (guide §1.2 "don't compute things twice"):
        # the prefix leg is a projection of the records leg — derive it
        # from the batch subdirectory records/ just landed in instead
        # of re-running the whole rarity sort (explode + rarity join +
        # per-record array_sort) a second time. One columnar read of
        # this batch's own rows replaces a full second pass over the
        # batch text; identical rows by construction.
        # explicit schema: an all-empty batch writes zero part files
        # and a bare read of the subdir could not infer one
        recs = (spark.read.schema(recs.schema)
                .parquet(f"{path}/records/_b={stamp}"))
    pref = (recs.select("__id", "__n",
                        F.explode(_jaccard_prefix("__t", float(threshold)))
                         .alias("tok")))
    leg_write(pref, f"{path}/prefix", mode, stamp)
    if mode == "overwrite":
        meta_write(spark, path, {**meta, "layout": LAYOUT})


def jaccard_index_candidates(
    new_docs: DataFrame, path: str,
    id_col: str = "doc_id", tokens_col: str = "tokens",
    threshold: float | None = None,
    include_new_pairs: bool = True,
) -> DataFrame:
    """Exact Jaccard matches of a NEW batch against the persisted
    :func:`jaccard_index_write` index (plus, by default, within-batch
    pairs): (query_id, match_id, jaccard) with jaccard >= τ — every
    answer VERIFIED by exact ``array_intersect``, so unlike
    :func:`lsh_index_candidates` there is no recall curve to tune;
    the index only accelerates.

    ``threshold`` defaults to the index's τ; a HIGHER τ is accepted
    (the stored prefixes, computed at the lower build τ, are longer
    than this query needs — a candidate superset, the verify join
    filters it); a LOWER τ raises, because stored prefixes would be
    too short and the pigeonhole guarantee — an overlap of
    ⌈τ·max(|x|,|y|)⌉ must touch both prefixes — breaks silently (a
    recall hole, the one thing an exact operator must never have).

    The batch is sorted under the index's FROZEN rarity order
    (unseen tokens rank rarest — deterministic; see
    :func:`jaccard_index_write` for why any shared total order is
    correct); its prefixes at the query τ equi-join the stored
    prefix table with the τ·|x| <= |y| <= |x|/τ length filter riding
    the join, then one verify join against ``records/`` plus the
    batch arrays. Scale: the batch side is tiny next to the index;
    the candidate join shuffles on tok — hot prefix tokens fatten
    one cell, AQE's skew-join job (the :func:`jaccard_join`
    story)."""
    from .index_meta import meta_read

    spark = new_docs.sparkSession
    existing = meta_read(spark, path, legacy="_jaccard_meta.json")
    if existing is None:
        # the manifest is PART of the index: without it the tau
        # direction guard cannot be validated and a too-low query tau
        # would lose matches silently (r15 verdict ask #2)
        raise ValueError(
            f"jaccard_index_candidates: no readable manifest at "
            f"{path!r} — cannot validate the pigeonhole direction "
            f"guard; rebuild the index with jaccard_index_write")
    idx_tau = float(existing["threshold"])
    if threshold is None:
        tau = idx_tau
    else:
        tau = float(threshold)
        if not 0.0 < tau <= 1.0:
            raise ValueError(f"threshold must be in (0, 1], got {tau}")
        if tau < idx_tau:
            raise ValueError(
                f"jaccard_index_candidates: query threshold {tau} < "
                f"index threshold {idx_tau} — stored prefixes are too "
                f"short for the pigeonhole guarantee; rebuild the "
                f"index at the lower threshold")
    toks = spark.read.parquet(f"{path}/tokens")
    base = (new_docs.select(F.col(id_col).alias("__qid"),
                            F.array_distinct(F.col(tokens_col))
                             .alias("__qt"))
            .filter(F.col("__qt").isNotNull() & (F.size("__qt") > 0)))
    qs = (_jaccard_sorted(base, "__qid", "__qt", toks)
          .localCheckpoint(eager=True))
    q_keys = qs.select("__qid", F.col("__n").alias("__qn"),
                       F.explode(_jaccard_prefix("__qt", tau)).alias("tok"))
    idx_pref = spark.read.parquet(f"{path}/prefix").select(
        F.col("__id").alias("__mid"), F.col("__n").alias("__mn"), "tok")
    cand = (q_keys.join(idx_pref, "tok")
            .filter((F.col("__mn") >= F.lit(tau) * F.col("__qn"))
                    & (F.col("__mn") <= F.col("__qn") / F.lit(tau)))
            .select("__qid", "__mid").distinct())
    recs = spark.read.parquet(f"{path}/records").select(
        F.col("__id").alias("__mid"), F.col("__t").alias("__mt"),
        F.col("__n").alias("__mmn"))
    o = F.size(F.array_intersect(F.col("__qqt"), F.col("__mt")))
    vs = (cand
          .join(qs.select(F.col("__qid"), F.col("__qt").alias("__qqt"),
                          F.col("__n").alias("__qqn")), "__qid")
          .join(recs, "__mid")
          .withColumn("jaccard",
                      _once(o / (F.col("__qqn") + F.col("__mmn") - o)))
          .filter(F.col("jaccard") >= F.lit(tau))
          .select(F.col("__qid").alias("query_id"),
                  F.col("__mid").alias("match_id"), "jaccard"))
    if not include_new_pairs:
        return vs
    a_keys = qs.select(F.col("__qid").alias("__aid"),
                       F.col("__n").alias("__an"),
                       F.explode(_jaccard_prefix("__qt", tau)).alias("tok"))
    b_keys = qs.select(F.col("__qid").alias("__bid"),
                       F.col("__n").alias("__bn"),
                       F.explode(_jaccard_prefix("__qt", tau)).alias("tok"))
    wc = (a_keys.join(b_keys, "tok")
          .filter((F.col("__aid") < F.col("__bid"))
                  & (F.col("__bn") >= F.lit(tau) * F.col("__an"))
                  & (F.col("__bn") <= F.col("__an") / F.lit(tau)))
          .select("__aid", "__bid").distinct())
    ow = F.size(F.array_intersect(F.col("__at"), F.col("__bt")))
    within = (wc
              .join(qs.select(F.col("__qid").alias("__aid"),
                              F.col("__qt").alias("__at"),
                              F.col("__n").alias("__wan")), "__aid")
              .join(qs.select(F.col("__qid").alias("__bid"),
                              F.col("__qt").alias("__bt"),
                              F.col("__n").alias("__wbn")), "__bid")
              .withColumn("jaccard",
                          _once(ow / (F.col("__wan") + F.col("__wbn") - ow)))
              .filter(F.col("jaccard") >= F.lit(tau))
              .select(F.col("__aid").alias("query_id"),
                      F.col("__bid").alias("match_id"), "jaccard"))
    return vs.unionByName(within)


def edit_distance_index_write(
    df: DataFrame, path: str,
    id_col: str = "doc_id", str_col: str = "text",
    max_dist: int = 2, mode: str = "overwrite",
    batch_stamp: str | None = None,
) -> None:
    """Persist the PassJoin segment index of a string corpus — the
    standing-index variant of :func:`edit_distance_join` (the
    :func:`jaccard_index_write` sibling; r14 verdict depth
    candidate): the corpus takes the join's RIGHT role once —
    ``strings/`` (id, string — the verify side), ``segments/`` (the
    d+1 deterministic per-string segment keys for strings of length
    >= d+1), ``short/`` (id, length — strings too short to segment,
    length < d+1) — and every future batch pays only its own LEFT
    expansion.

    The threshold direction is the MIRROR of the Jaccard index:
    there a LOWER query τ breaks the stored prefixes and a higher τ
    is a superset; here a HIGHER query d breaks the pigeonhole (d
    edits over d_idx+1 <= d segments can touch every segment —
    silent recall hole, raises) while any LOWER d still guarantees
    completeness: d_q edits over d_idx+1 > d_q segments leave some
    segment unedited, shifted at most d_q positions — the batch
    expansion just enumerates the INDEX's segmentation (k = d_idx+1
    slots) with the query's tighter ±d_q tolerances. Build at the
    loosest threshold the pipeline will ever query.

    NULL strings are dropped (the :func:`edit_distance_join`
    contract); ids must be unique per side; ``mode='append'`` adds a
    day's accepted strings after the config check. Scale shape: one
    bounded (d+1)-per-row map expansion + three columnar writes;
    queries never re-segment the corpus.

    Append idempotence: on a layout-2 index (any build since r17)
    each append lands in a per-batch ``_b={batch_stamp}``
    subdirectory of all three legs — pass a deterministic
    ``batch_stamp`` and a RETRY of a failed append replaces that
    batch's rows everywhere instead of duplicating whichever legs
    already landed. With no stamp a random one is used and a
    caller-retried failure duplicates candidate pairs (true pairs
    re-emitted, none lost) — ``dropDuplicates()`` or rebuild, and
    prefer a stamp."""
    from .index_meta import (
        LAYOUT, file_delete_recursive, leg_write, meta_config,
        meta_invalidate, meta_read, meta_write, resolve_stamp)

    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    if max_dist > 8:
        raise ValueError(
            f"max_dist={max_dist}: past d=8 the candidate expansion "
            f"is the wrong tool; use the shingle/minhash family")
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    spark = df.sparkSession
    d, k = int(max_dist), int(max_dist) + 1
    meta = {"max_dist": d}
    if mode == "append":
        existing = meta_read(spark, path, legacy="_edit_meta.json")
        if existing is None:
            raise ValueError(
                f"edit_distance_index_write(append): no readable "
                f"manifest at {path!r} — cannot confirm the index "
                f"segmentation width; an append under a mismatched "
                f"max_dist would mix incomparable segmentations "
                f"silently. Rebuild with mode='overwrite'")
        if meta_config(existing) != meta:
            raise ValueError(
                f"edit_distance_index_write(append): config {meta} "
                f"!= index config {meta_config(existing)} — "
                f"segmentations are incomparable across max_dist")
        stamp = resolve_stamp(existing, batch_stamp,
                              "edit_distance_index_write")
    else:
        # invalidate-first / commit-last (index_meta.py protocol) +
        # explicit truncation of the legs (layout-2 base data lives
        # under _b=base; see jaccard_index_write)
        meta_invalidate(spark, path)
        for leg in ("strings", "segments", "short"):
            file_delete_recursive(spark, f"{path}/{leg}")
        stamp = "base"
    rc = (df.select(F.col(id_col).alias("__rid"),
                    F.col(str_col).alias("__rs"))
          .filter(F.col("__rs").isNotNull()))
    leg_write(rc, f"{path}/strings", mode, stamp)
    if stamp is not None:
        # r17 optimization (guide §1.2): the segments and short legs
        # are in-row projections of the strings leg — derive them from
        # the batch subdirectory just written instead of scanning the
        # input twice more (at corpus scale ``df`` may itself be an
        # expensive upstream plan). Explicit schema: an all-NULL batch
        # writes zero part files and a bare read could not infer one.
        rc = (spark.read.schema(rc.schema)
              .parquet(f"{path}/strings/_b={stamp}"))
    # the edit_distance_join right-side expansion verbatim (segment i
    # of a length-L string starts at i·(L div k) + min(i, L mod k))
    r_segs = f"""
    transform(sequence(0, {d}), i ->
        struct(i AS seg_i, length(__rs) AS seg_l,
               substring(__rs,
                         (i * (length(__rs) div {k})
                          + least(i, length(__rs) % {k})) + 1,
                         ((length(__rs) div {k})
                          + IF(i < length(__rs) % {k}, 1, 0))) AS seg))
    """
    leg_write(rc.filter(F.length("__rs") >= k)
              .select("__rid", F.explode(F.expr(r_segs)).alias("p"))
              .select("__rid", "p.seg_i", "p.seg_l", "p.seg"),
              f"{path}/segments", mode, stamp)
    leg_write(rc.filter(F.length("__rs") < k)
              .select("__rid", F.length("__rs").alias("__L")),
              f"{path}/short", mode, stamp)
    if mode == "overwrite":
        meta_write(spark, path, {**meta, "layout": LAYOUT})


def edit_distance_index_candidates(
    new_docs: DataFrame, path: str,
    id_col: str = "doc_id", str_col: str = "text",
    max_dist: int | None = None,
) -> DataFrame:
    """Exact edit-distance matches of a NEW batch against the
    persisted :func:`edit_distance_index_write` index: (query_id,
    match_id, edit_dist) with edit_dist <= d, every pair verified by
    one exact JVM ``levenshtein`` — complete by the PassJoin
    pigeonhole (Li/Deng/Feng ICDE'11), so like the Jaccard index
    there is no recall curve: the index only accelerates.

    ``max_dist`` defaults to the index's d; a LOWER d is accepted
    (the stored d_idx+1-way segmentation still pigeonholes d_q <
    d_idx+1 edits — the batch enumerates the index's segment slots
    with the tighter ±d_q position/length tolerances, and the exact
    verify discards the slack); a HIGHER d raises (d edits can touch
    every stored segment — a silent recall hole, the one thing an
    exact operator must never have; rebuild at the looser d).
    Strings the index holds in ``short/`` (length <= d_idx) match
    through an exact length-keyed equi-join — both sides bounded by
    the <= 2·d_idx length domain.

    Scale: the batch pays the (2d+1)·(d_idx+1)·(2d+1)-bounded in-row
    expansion; the candidate equi-join shuffles on the segment key
    against the pre-built index — hot segment cells are AQE's job
    (the :func:`edit_distance_join` story)."""
    from .index_meta import meta_read

    spark = new_docs.sparkSession
    existing = meta_read(spark, path, legacy="_edit_meta.json")
    if existing is None:
        # the manifest is PART of the index: without idx_d the stored
        # segmentation width cannot be enumerated, and guessing it from
        # the query d would mis-enumerate the segments and yield
        # near-empty candidates silently (r15 verdict ask #2 / ADVICE)
        raise ValueError(
            f"edit_distance_index_candidates: no readable manifest at "
            f"{path!r} — cannot confirm the index segmentation width; "
            f"rebuild the index with edit_distance_index_write")
    idx_d = int(existing["max_dist"])
    if max_dist is None:
        d = idx_d
    else:
        d = int(max_dist)
        if d < 0:
            raise ValueError(f"max_dist must be >= 0, got {d}")
        if d > idx_d:
            raise ValueError(
                f"edit_distance_index_candidates: query max_dist {d} > "
                f"index max_dist {idx_d} — the stored {idx_d + 1}-way "
                f"segmentation cannot pigeonhole {d} edits; rebuild the "
                f"index at the looser threshold")
    k = idx_d + 1  # the INDEX segmentation; query tolerances are ±d
    lc = (new_docs.select(F.col(id_col).alias("__lid"),
                          F.col(str_col).alias("__ls"))
          .filter(F.col("__ls").isNotNull())
          .localCheckpoint(eager=True))
    seg_len = f"((L div {k}) + IF(i < L % {k}, 1, 0))"
    seg_start = f"(i * (L div {k}) + least(i, L % {k}))"
    l_cands = f"""
    flatten(transform(
        filter(sequence(greatest(length(__ls) - {d}, {k}),
                        greatest(length(__ls) + {d}, {k})),
               L -> L <= length(__ls) + {d}),
        L -> flatten(transform(sequence(0, {idx_d}), i ->
            transform(
                filter(sequence(greatest({seg_start} - {d}, 0),
                                {seg_start} + {d}),
                       q -> q + {seg_len} <= length(__ls)),
                q -> struct(i AS seg_i, L AS seg_l,
                            substring(__ls, q + 1, {seg_len}) AS seg))))))
    """
    l_keys = (lc.select("__lid", F.explode(F.expr(l_cands)).alias("p"))
              .select("__lid", "p.seg_i", "p.seg_l", "p.seg"))
    idx_segs = spark.read.parquet(f"{path}/segments")
    cand = (l_keys.join(idx_segs, ["seg_i", "seg_l", "seg"])
            .select("__lid", "__rid").distinct())
    r_short = spark.read.parquet(f"{path}/short")
    l_short = (lc.filter(F.length("__ls") <= F.lit(idx_d + d))
               .select("__lid", F.explode(F.expr(
                   f"filter(sequence(greatest(length(__ls) - {d}, 0), "
                   f"length(__ls) + {d}), L -> L < {k})")).alias("__L")))
    cand = cand.unionByName(
        l_short.join(r_short, "__L").select("__lid", "__rid").distinct())
    rc = spark.read.parquet(f"{path}/strings")
    # Banded + single-evaluation verify — same rationale as
    # edit_distance_join (see _once).
    dist = _once(F.levenshtein(F.col("__ls"), F.col("__rs"), d), "int")
    return (cand.join(lc, "__lid").join(rc, "__rid")
            .withColumn("edit_dist", dist)
            .filter(F.col("edit_dist") >= 0)
            .select(F.col("__lid").alias("query_id"),
                    F.col("__rid").alias("match_id"),
                    F.col("edit_dist").cast("int").alias("edit_dist")))
