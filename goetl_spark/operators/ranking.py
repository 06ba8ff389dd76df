"""Distributed global ranking and exact equi-depth (NTILE) binning —
without the single-partition window trap.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY collapses to
ONE task in Spark — the classic scale killer. This module computes the
same total-order rank in three scale-safe steps (the pattern
sampling.py::pack_sequences uses for its distributed cumsum):

1. ``repartitionByRange`` on the order key (range exchange — each
   partition holds a contiguous key range),
2. per-partition ``row_number`` over a PARTITIONED window,
3. add per-partition offsets — the cumsum of partition COUNTS, a
   ≤ #partitions-row driver array joined back as a broadcast map.

The order key must be made unique via tie columns (a non-total order
would make ranks nondeterministic in any engine) and NON-NULL (Spark
windows sort NULLS FIRST ascending where ANSI engines default to
NULLS LAST — a NULL order key would rank differently per engine).
Exact NTILE bins
then follow from the rank arithmetically — bin sizes differ by at most
one, first ``N % B`` bins larger, matching ANSI NTILE exactly; the
row total comes from the already-collected partition sizes, not a
second pass."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def _ranked(df: DataFrame, order_cols: Sequence[str], out: str,
            num_partitions: int | None) -> tuple[DataFrame, int]:
    cols = [F.col(c) for c in order_cols]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # persisted for the same reason as sampling.pack_sequences: the
    # size-collection pass and the final plan must observe IDENTICAL
    # range boundaries (repartitionByRange re-samples on recompute);
    # the eager localCheckpoint below lets us release the cache before
    # returning.
    ranged = (df.repartitionByRange(n, *cols)
                .withColumn("__pid", F.spark_partition_id())
                .persist())
    try:
        sizes = sorted(
            ranged.groupBy("__pid")
                  .agg(F.count(F.lit(1)).alias("c")).collect())
        offsets, total = {}, 0
        for pid, c in sizes:
            offsets[pid] = total
            total += c
        if not offsets:  # empty input
            empty = ranged.withColumn(out, F.lit(1).cast("long")).drop("__pid")
            return empty, 0
        off = F.create_map(*[x for pid, o in offsets.items()
                             for x in (F.lit(pid), F.lit(o).cast("long"))])
        w = Window.partitionBy("__pid").orderBy(*cols)
        # rank is LONG: row_number() is 32-bit and per-partition counts
        # stay under 2^31, but offset + row_number crosses 2^31 at ~2.1B
        # total rows — and downstream arithmetic like the shard writer's
        # (rank - 1) * n_shards overflows 32-bit far earlier (ANSI-mode
        # error under Spark 4). Emitting long here fixes every consumer.
        ranked = (ranged
                  .withColumn(out,
                              F.row_number().over(w).cast("long")
                              + off[F.col("__pid")])
                  .drop("__pid")
                  .localCheckpoint(eager=True))
        return ranked, total
    finally:
        ranged.unpersist()


def global_row_number(
    df: DataFrame,
    order_cols: Sequence[str],
    out: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Total-order 1-based rank over ``order_cols`` (must be a unique
    key combination for determinism) — distributed, never a global
    single-partition sort. The result is materialized eagerly
    (localCheckpoint) so the internal range-partition cache can be
    released before returning."""
    ranked, _ = _ranked(df, order_cols, out, num_partitions)
    return ranked


def ntile_bins(
    df: DataFrame,
    order_cols: Sequence[str],
    n_bins: int,
    out: str = "bin",
) -> DataFrame:
    """Exact ANSI ``NTILE(n_bins) OVER (ORDER BY order_cols)`` at
    scale: first ``N % n_bins`` bins hold ``ceil(N/n_bins)`` rows, the
    rest ``floor(N/n_bins)`` — identical to Spark's and DuckDB's
    single-window ntile, computed arithmetically from the distributed
    global rank."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    ranked, n_rows = _ranked(df, order_cols, "__r", None)
    size = n_rows // n_bins
    rem = n_rows % n_bins
    r0 = F.col("__r") - 1  # 0-based
    boundary = rem * (size + 1)
    bin_col = F.when(
        r0 < boundary, F.floor(r0 / (size + 1)) + 1
    ).otherwise(
        rem + F.floor((r0 - boundary) / F.greatest(F.lit(size), F.lit(1)))
        + 1
    ).cast("int")
    return ranked.withColumn(out, bin_col).drop("__r")


def exact_quantiles(
    df: DataFrame,
    col: str,
    probs: Sequence[float],
    num_partitions: int | None = None,
) -> list[float]:
    """EXACT interpolated quantiles (the ``quantile_cont`` /
    ``percentile`` definition: value at rank p·(n−1), linearly
    interpolated between the neighboring order statistics) — computed
    DISTRIBUTED, replacing the single-aggregation-buffer
    ``percentile()`` that must hold every value in one merge task.

    Plan: one range exchange on the value (parallel sort-free
    placement), per-partition COUNTS (≤ #partitions rows to the
    driver) locate which partition holds each needed order statistic
    and at what local offset, and only THOSE partitions are sorted —
    each in its own single task over ~n/#partitions rows. Nothing
    outside the target partitions is ever sorted or collected, so the
    op scales to arbitrary n while returning bit-identical values to
    the buffered exact percentile (same IEEE interpolation on the same
    order statistics — pinned by tests and the q97 oracle).
    """
    import math

    for p in probs:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"prob out of range: {p}")
    vals = df.select(F.col(col).alias("v")).where(F.col("v").isNotNull())
    n_part = (num_partitions
              or df.sparkSession.sparkContext.defaultParallelism)
    parts = (vals.repartitionByRange(n_part, F.col("v"))
                 .withColumn("__pid", F.spark_partition_id())
                 .persist())
    try:
        sizes = sorted(
            parts.groupBy("__pid").agg(F.count(F.lit(1)).alias("c"))
                 .collect())
        offsets, total = {}, 0
        for pid, c in sizes:
            offsets[pid] = (total, c)   # (rows before, rows inside)
            total += c
        if total == 0:
            raise ValueError(f"exact_quantiles: no non-null values in {col}")

        # global 1-based ranks needed for all probs
        targets: set[int] = set()
        for p in probs:
            rp = p * (total - 1)
            targets.add(int(math.floor(rp)) + 1)
            targets.add(int(math.ceil(rp)) + 1)

        # group target ranks by owning partition
        by_pid: dict[int, list[int]] = {}
        for rank in targets:
            for pid, (before, inside) in offsets.items():
                if before < rank <= before + inside:
                    by_pid.setdefault(pid, []).append(rank - before)
                    break

        # ALL target partitions in ONE job (was one job per partition —
        # a 101-point grid over 32 range partitions paid ~32 job
        # launches): filter to the target partitions, rank each within
        # its own window partition (same per-task sort as before), and
        # keep exactly the needed (partition, local-rank) rows. Values
        # are identical — row_number ties only occur between equal v.
        cond = None
        for pid, local_ranks in sorted(by_pid.items()):
            c = (F.col("__pid") == pid) & F.col("__lr").isin(local_ranks)
            cond = c if cond is None else (cond | c)
        w = Window.partitionBy("__pid").orderBy("v")
        found = (parts.filter(F.col("__pid").isin(list(by_pid)))
                 .withColumn("__lr", F.row_number().over(w))
                 .filter(cond)
                 .collect())
        got: dict[int, float] = {}
        for r in found:
            got[offsets[r["__pid"]][0] + r["__lr"]] = r["v"]

        out = []
        for p in probs:
            rp = p * (total - 1)
            lo, hi = int(math.floor(rp)), int(math.ceil(rp))
            vlo = got[lo + 1]
            if lo == hi:
                out.append(float(vlo))
            else:
                # Spark's Percentile (and DuckDB's quantile_cont, per the
                # q97 hash history) interpolate as lo·(1−d) + hi·d — the
                # algebraically-equal lo + d·(hi−lo) differs in the last
                # ulp and would break bit-parity
                vhi = got[hi + 1]
                d = rp - lo
                out.append(float(vlo * (1.0 - d) + vhi * d))
        return out
    finally:
        parts.unpersist()


def quantile_normalize(
    df: DataFrame,
    col: str,
    group_cols: Sequence[str],
    tie_cols: Sequence[str] = (),
    n_quantiles: int = 101,
    out: str | None = None,
) -> DataFrame:
    """Quantile normalization across groups: map each value onto the
    GLOBAL distribution at its within-group quantile rank — the
    standard cross-domain score calibration (a 0.9-quantile document
    in a lenient domain and a 0.9-quantile document in a strict one
    land on the same normalized score), composing the distributed
    exact-quantile machinery with a per-group rank window.

    Mechanics: ``percent_rank()`` over (group, col, ties) gives each
    row its within-group rank r ∈ [0, 1]; the global quantile function
    is sampled once at ``n_quantiles`` evenly spaced probabilities
    (:func:`exact_quantiles` — distributed, never a single buffer) and
    linearly interpolated at r as a broadcast array literal — the
    normalization itself is a map-only expression.

    Scale: one shuffle for the rank window (partitioned BY GROUP — no
    global window), one range exchange inside exact_quantiles; the
    grid is ``n_quantiles`` doubles on the driver. NULL values and
    NULL order keys are excluded (cross-engine window NULL ordering
    differs; see module docstring)."""
    if n_quantiles < 2:
        raise ValueError("n_quantiles must be >= 2")
    target = out or f"{col}_qnorm"
    probs = [i / (n_quantiles - 1) for i in range(n_quantiles)]
    grid = exact_quantiles(df, col, probs)

    base = df.where(F.col(col).isNotNull())
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(col), *[F.col(c) for c in tie_cols])
    r = F.percent_rank().over(w)

    garr = F.array(*[F.lit(float(v)) for v in grid])
    pos = r * (n_quantiles - 1)
    lo = F.floor(pos).cast("int")
    hi = F.ceil(pos).cast("int")
    d = pos - lo
    vlo = F.element_at(garr, lo + 1)
    vhi = F.element_at(garr, hi + 1)
    # same interpolation form as exact_quantiles (lo·(1−d) + hi·d)
    return base.withColumn(target, vlo * (1.0 - d) + vhi * d)


def median_abs_deviation(
    df: DataFrame,
    col: str,
    scale: float = 1.0,
) -> tuple[float, float]:
    """(median, MAD): the robust location/dispersion pair — MAD =
    median(|x − median|), optionally scaled (1.4826 makes it a normal-
    consistent sigma estimate). Two passes of the DISTRIBUTED exact
    quantiles (no single-buffer percentile); deterministic and
    oracle-checkable.

    MAD tolerates up to 50 % arbitrarily bad values where stddev
    breaks at one — pair with robust_scale / winsorize for outlier
    policy decisions."""
    [med] = exact_quantiles(df, col, [0.5])
    dev = df.select((F.abs(F.col(col) - F.lit(med))).alias("__d"))
    [mad] = exact_quantiles(dev, "__d", [0.5])
    return float(med), float(mad * scale)


def rrf_fuse(
    ranked_lists: Sequence[DataFrame],
    id_cols: Sequence[str],
    score_col: str,
    k: int = 60,
    group_cols: Sequence[str] = (),
    higher_better: bool = True,
    assume_unique: bool = False,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009): combine N rankers'
    candidate lists into one consensus ranking without score
    calibration — ``rrf = Σ_lists 1/(k + rank_in_list)``. The standard
    way to fuse BM25 with embedding retrieval (hybrid search) or to
    ensemble quality scorers before a dedup keep-best pass.

    Each input frame carries ``group_cols`` (e.g. the query id — ranks
    are computed within a group), ``id_cols`` (the candidate key) and
    ``score_col``. Ranks are 1-based with a deterministic tie-break on
    ascending ``id_cols``. Rows an input is missing simply contribute
    nothing (classic RRF); ``n_lists`` reports how many lists ranked
    each candidate. NULL-score rows are dropped before ranking — an
    unscored candidate is "not ranked by this list", and letting it
    through would hand it rank 1 under ``higher_better=False``
    (ascending sorts put NULLs first). A duplicate (group, id) WITHIN
    one input list is collapsed to its best score before ranking (r9
    ADVICE: a dup would otherwise inflate ``n_lists`` past
    ``len(ranked_lists)`` and double-credit that candidate), so
    ``n_lists <= len(ranked_lists)`` always holds. That collapse costs
    one groupBy exchange per list keyed on (group, id) — a DIFFERENT
    key than the rank window's (group) partitioning — so callers whose
    lists are already unique (e.g. the output of a top-k retriever)
    should pass ``assume_unique=True`` to skip it (r10 verdict #5);
    each list then pays exactly one exchange.

    Determinism: each contribution is ``round(1/(k+rank), 12)`` cast to
    DECIMAL(38,12) before the sum, so the fused score is exact,
    shuffle-order independent, and replayable in oracle SQL (dsum
    convention). Scale shape: with ``group_cols`` every window is
    PARTITIONED by group (per-query lists — never a global sort); the
    ungrouped path routes through :func:`global_row_number`'s
    range-partitioned rank (numeric score required). Only
    (group, id, contribution) triples shuffle into the final sum."""
    if not ranked_lists:
        raise ValueError("ranked_lists must be non-empty")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    gcols = list(group_cols)
    icols = list(id_cols)
    parts = []
    for df in ranked_lists:
        df = df.filter(F.col(score_col).isNotNull())
        if not assume_unique:
            # collapse intra-list duplicates to their best score so every
            # candidate contributes at most once per list (see docstring)
            best = F.max(score_col) if higher_better else F.min(score_col)
            df = df.groupBy(*gcols, *icols).agg(best.alias(score_col))
        if gcols:
            order = ([F.col(score_col).desc() if higher_better
                      else F.col(score_col).asc()]
                     + [F.col(c).asc() for c in icols])
            w = Window.partitionBy(*gcols).orderBy(*order)
            with_rank = df.select(*gcols, *icols,
                                  F.row_number().over(w).alias("__rk"))
        else:
            neg = (-F.col(score_col)) if higher_better else F.col(score_col)
            with_rank = global_row_number(
                df.select(*icols, neg.alias("__ord")),
                ["__ord", *icols], out="__rk").drop("__ord")
        contrib = F.round(F.lit(1.0) / (F.lit(k) + F.col("__rk")), 12) \
            .cast("decimal(38,12)")
        parts.append(with_rank.select(*gcols, *icols,
                                      contrib.alias("__c")))
    fanin = parts[0]
    for p in parts[1:]:
        fanin = fanin.unionByName(p)
    return (fanin.groupBy(*gcols, *icols)
            .agg(F.count(F.lit(1)).cast("int").alias("n_lists"),
                 F.sum("__c").cast("double").alias("rrf_score")))


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query retrieval evaluation at cutoff ``k`` — the missing
    measurement half of the ANN/retrieval family (knn_bruteforce, IVF,
    PQ, ann_join, rrf_fuse all PRODUCE ranked lists; this grades one
    against binary relevance judgments): hits@k, recall@k,
    precision@k, MRR@k, AP@k (mean over queries = MAP@k, left to the
    caller — per-query rows are the operator so failures are
    attributable).

    ``results`` carries (query_col, doc_col, rank_col) with 1-based
    ranks unique per query (any top-k operator in this repo).
    ``qrels`` carries (query_col, doc_col) relevant pairs — duplicates
    are collapsed. Every JUDGED query gets a row (a query with
    relevant docs but no retrieved hits scores 0 everywhere);
    unjudged queries in ``results`` are dropped — scoring them 0
    would say "wrong" when the truth is "ungraded".

    The rank-uniqueness contract is ENFORCED, not assumed (r13 advisor
    item): a duplicate (query, doc) pair or a repeated rank among a
    query's top-k HITS would double-count — recall@k silently past
    1.0, AP inflated — so the aggregate also counts distinct docs and
    distinct ranks per query and the plan raises loudly on mismatch
    (assert_true rides the output expressions — no extra scan; the
    only duplicates that are metric-neutral, non-relevant docs
    repeated in results, pass through like the siblings' clean data).

    Determinism (hash-exact in oracle SQL, no float sums anywhere):
    AP@k's running-precision sum is computed as EXACT integers by
    multiplying through with L = lcm(1..k) — each term
    precision@r_i = i/r_i becomes i·(L DIV r_i), an exact long since
    every r ≤ k divides L — then ONE long→double conversion and two
    IEEE divisions (/L, /min(nrel,k)). recall/precision/MRR are
    single int/int divisions. Order-independent, tie-free by
    construction; ``k <= 42`` keeps L·k inside long range (the guard).

    Scale shape: one rank-window per query partition (bounded: ≤ k
    rows each), equi-joins on the query key, aggregates map-side
    combinable. qrels is eval-set-sized — Catalyst broadcasts it when
    small; nothing here is corpus-sized."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if k > 42:
        raise ValueError(
            f"k={k}: lcm(1..k) must stay in long range for the exact-"
            f"integer AP accumulation — k <= 42 (recall/precision at "
            f"larger cutoffs: call with the metrics you need per slice)")
    import math

    lcm = math.lcm(*range(1, k + 1))

    rel = (qrels.select(F.col(query_col).alias("__q"),
                        F.col(doc_col).alias("__d"))
           .distinct())
    base = rel.groupBy("__q").agg(F.count(F.lit(1)).alias("nrel"))

    top = (results.select(F.col(query_col).alias("__q"),
                          F.col(doc_col).alias("__d"),
                          F.col(rank_col).cast("long").alias("__r"))
           .filter((F.col("__r") >= 1) & (F.col("__r") <= k)))
    hits = top.join(rel, ["__q", "__d"])
    w = Window.partitionBy("__q").orderBy("__r")
    hit_agg = (hits.withColumn("__i", F.row_number().over(w))
               .groupBy("__q")
               .agg(F.count(F.lit(1)).alias("__hits"),
                    F.count_distinct(F.col("__d")).alias("__dd"),
                    F.count_distinct(F.col("__r")).alias("__dr"),
                    F.min("__r").alias("__first"),
                    F.sum(F.expr(f"__i * (CAST({lcm} AS BIGINT) DIV __r)"))
                     .alias("__apnum")))

    dup_ok = F.assert_true(
        F.col("__hits").isNull()
        | ((F.col("__hits") == F.col("__dd"))
           & (F.col("__hits") == F.col("__dr"))),
        F.concat(
            F.lit("retrieval_metrics: duplicate (query, doc) pair or "
                  "repeated rank among top-k hits for query "),
            F.col("__q").cast("string"),
            F.lit(" — ranks must be unique per query (dedup results "
                  "keeping min rank upstream)")))
    m = F.least(F.col("nrel"), F.lit(k)).cast("long")
    out = (base.join(hit_agg, "__q", "left")
           .select(
               F.col("__q").alias(query_col),
               F.col("nrel").cast("long").alias("nrel"),
               F.when(dup_ok.isNull(),
                      F.coalesce(F.col("__hits"), F.lit(0)))
                .cast("long").alias("hits_at_k"),
               (F.coalesce(F.col("__hits"), F.lit(0)).cast("double")
                / F.col("nrel")).alias("recall_at_k"),
               (F.coalesce(F.col("__hits"), F.lit(0)).cast("double")
                / F.lit(float(k))).alias("precision_at_k"),
               F.when(F.col("__first").isNull(), F.lit(0.0))
                .otherwise(F.lit(1.0) / F.col("__first"))
                .alias("mrr_at_k"),
               F.when(F.col("__apnum").isNull(), F.lit(0.0))
                .otherwise(F.col("__apnum").cast("double")
                           / F.lit(float(lcm)) / m)
                .alias("ap_at_k")))
    return out


def ndcg_at_k(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "neighbor_id",
    rank_col: str = "rank",
    grade_col: str = "grade",
) -> DataFrame:
    """Per-query nDCG at cutoff ``k`` with GRADED relevance — the
    companion :func:`retrieval_metrics` deliberately is not (binary
    qrels can't say "the best answer ranked below a merely-okay one";
    nDCG's log-position discount grades exactly that). One row per
    JUDGED query: ``n_judged`` (docs with grade > 0), ``dcg_at_k``,
    ``idcg_at_k`` (the same discounted sum over that query's own
    grades ideally ordered), and ``ndcg_at_k = dcg/idcg``.

    ``qrels`` carries (query_col, doc_col, grade_col) with numeric
    grades >= 0 (0 = judged irrelevant — contributes nothing but IS a
    judgment; negative grades raise). Duplicate judgments collapse to
    MAX grade. Gains are linear (``grade / log2(rank+1)``) — callers
    wanting the exponential form pre-map grade to 2^grade − 1.
    Unjudged queries drop, zero-relevant judged queries get NULL nDCG
    (0/0 is "nothing to rank", not a zero score); the
    :func:`retrieval_metrics` duplicate-hit guard applies (a repeated
    doc or rank among scored hits raises).

    Determinism (the lm.py transcendental recipe): each term
    ``grade / log2(rank+1)`` is rounded half-up at scale 9 and summed
    as DECIMAL(38,9) — log2 differs from DuckDB's in the last ulp on
    some inputs, the rounding absorbs it — then ONE string-crossed
    double division for the ratio. Hash-exact in oracle SQL.

    Scale shape: qrels is eval-set-sized; the ideal ranking is one
    rank-window per query partition over qrels (bounded per query),
    the observed side an equi-join on (query, doc) — nothing here is
    corpus-sized, matching :func:`retrieval_metrics`."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    g = F.col(grade_col).cast("double")
    rel = (qrels.select(F.col(query_col).alias("__q"),
                        F.col(doc_col).alias("__d"),
                        g.alias("__g"))
           .groupBy("__q", "__d").agg(F.max("__g").alias("__g")))
    neg_ok = F.assert_true(
        F.col("__g") >= 0,
        F.concat(F.lit("ndcg_at_k: negative grade for query "),
                 F.col("__q").cast("string"),
                 F.lit(" — grades must be >= 0 (NULL grades are "
                       "excluded by the max-collapse)")))
    rel = rel.filter(F.col("__g").isNotNull()) \
             .withColumn("__g", F.when(neg_ok.isNull(), F.col("__g")))

    def disc_term(grade: Column, pos: Column) -> Column:
        return (F.round(grade / F.log2(pos.cast("double") + F.lit(1.0)), 9)
                .cast("decimal(38,9)"))

    # ideal side: each query's own grades, best-first; one bounded
    # window per query partition (ties in grade order don't matter —
    # equal grades contribute equal terms at the swapped positions)
    wi = Window.partitionBy("__q").orderBy(F.col("__g").desc(),
                                           F.col("__d").asc())
    ideal = (rel.withColumn("__pos", F.row_number().over(wi))
             .filter((F.col("__pos") <= k) & (F.col("__g") > 0))
             .groupBy("__q")
             .agg(F.sum(disc_term(F.col("__g"), F.col("__pos")))
                   .alias("__idcg")))
    n_judged = (rel.groupBy("__q")
                .agg(F.sum(F.when(F.col("__g") > 0, 1).otherwise(0))
                      .cast("long").alias("n_judged")))

    top = (results.select(F.col(query_col).alias("__q"),
                          F.col(doc_col).alias("__d"),
                          F.col(rank_col).cast("long").alias("__r"))
           .filter((F.col("__r") >= 1) & (F.col("__r") <= k)))
    hits = top.join(rel.filter(F.col("__g") > 0), ["__q", "__d"])
    got = (hits.groupBy("__q")
           .agg(F.sum(disc_term(F.col("__g"), F.col("__r")))
                 .alias("__dcg"),
                F.count(F.lit(1)).alias("__h"),
                F.count_distinct(F.col("__d")).alias("__dd"),
                F.count_distinct(F.col("__r")).alias("__dr")))
    dup_ok = F.assert_true(
        F.col("__h").isNull()
        | ((F.col("__h") == F.col("__dd"))
           & (F.col("__h") == F.col("__dr"))),
        F.concat(F.lit("ndcg_at_k: duplicate (query, doc) pair or "
                       "repeated rank among top-k hits for query "),
                 F.col("__q").cast("string")))

    zero = F.lit(0).cast("decimal(38,9)")
    dcg = F.when(dup_ok.isNull(), F.coalesce(F.col("__dcg"), zero))
    idcg = F.coalesce(F.col("__idcg"), zero)
    return (n_judged.join(ideal, "__q", "left").join(got, "__q", "left")
            .select(
                F.col("__q").alias(query_col),
                F.col("n_judged"),
                dcg.cast("double").alias("dcg_at_k"),
                idcg.cast("double").alias("idcg_at_k"),
                F.when(idcg > 0,
                       dcg.cast("string").cast("double")
                       / idcg.cast("string").cast("double"))
                 .alias("ndcg_at_k")))
