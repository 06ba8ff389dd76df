"""Model-based document quality filtering.

The second quality layer every production pre-training pipeline adds
after rule filters: a lightweight classifier trained to distinguish
high-quality reference text from crawl noise, used to score (and
stratify or threshold) the whole corpus — the CCNet / WebText-style
"quality classifier" (Wenzek et al. 2020 §4.3 use a fastText model;
GPT-3's data work trained an LR over WebText-vs-crawl). Here the model
is Spark-native logistic regression over the engine's deterministic
text features, so training is a handful of distributed treeAggregate
passes and scoring is pure map work — no Python in either hot path.

Scale: feature extraction is the same zero-shuffle Column-expression
layer as :mod:`goetl_spark.operators.text`; training cost is
O(iterations) full scans of the (tiny) feature matrix; scoring adds one
JVM-side vector transform per row. At 100 TB you train on a sample
(`df.sample` or :func:`~goetl_spark.operators.sampling.hash_sample`)
and score everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from goetl_spark.operators.text import (
    mean_word_length, punct_ratio, stopword_hits, token_count, tokens)

#: feature column names produced by :func:`text_features` — fixed order,
#: part of the model contract
QUALITY_FEATURES = (
    "f_log_chars", "f_log_tokens", "f_mean_word_len", "f_punct_ratio",
    "f_stopword_ratio", "f_alpha_ratio", "f_digit_ratio", "f_upper_ratio",
)


def text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the :data:`QUALITY_FEATURES` numeric columns — pure Column
    expressions (log-scaled lengths, ratio features in [0,1]), NULL-safe
    (empty docs get zeros, never NULL/NaN, so downstream vector assembly
    cannot poison the model)."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tok = token_count(text_col)
    denom_t = F.greatest(n_tok, F.lit(1)).cast("double")
    denom_c = F.greatest(n_chars, F.lit(1)).cast("double")
    alpha_words = F.size(F.filter(tokens(text_col),
                                  lambda w: w.rlike("[A-Za-z]")))
    n_digit = F.length(c) - F.length(F.regexp_replace(c, "[0-9]", ""))
    n_upper = F.length(c) - F.length(F.regexp_replace(c, "[A-Z]", ""))

    feats = {
        "f_log_chars": F.log1p(n_chars.cast("double")),
        "f_log_tokens": F.log1p(n_tok.cast("double")),
        # guard the ratio primitives: under ANSI mode x/0 raises, and an
        # empty/NULL doc has length 0 and token_count 0
        "f_mean_word_len": F.when(n_chars > 0, mean_word_length(text_col)),
        "f_punct_ratio": F.when(n_chars > 0, punct_ratio(text_col)),
        "f_stopword_ratio": stopword_hits(text_col, "en").cast("double")
        / denom_t,
        "f_alpha_ratio": alpha_words.cast("double") / denom_t,
        "f_digit_ratio": n_digit.cast("double") / denom_c,
        "f_upper_ratio": n_upper.cast("double") / denom_c,
    }
    out = df
    for name, expr in feats.items():
        out = out.withColumn(name, F.coalesce(expr, F.lit(0.0)))
    return out


def _grouping_sets_counts(df: DataFrame, cat_cols, aggs,
                          max_categories: int):
    """ONE scan over ``df`` producing per-(column, category) aggregate
    rows for every column at once: ``GROUPING SETS ((c1), (c2), ...)``
    with ``grouping_id()`` attributing each output row to its column
    (NULL is a real category — a row whose value for column i is NULL
    with grouping bit i = 0 IS the NULL class, distinct from the other
    columns' placeholder NULLs). Returns ``{col: [Row, ...]}``.

    The collect is capped at ``len(cats) · max_categories`` rows —
    past that, some column's domain is too large for a literal-CASE
    encoder and the error path (only) re-scans to name the offender
    with the 'use hashed features' diagnostic."""
    cats = list(cat_cols)
    if not cats:
        raise ValueError("cat_cols must be non-empty")
    k = len(cats)
    gd = df.groupingSets([[c] for c in cats], *cats)
    agg_df = gd.agg(F.grouping_id().alias("__gid"), *aggs)
    cap = k * max_categories
    rows = agg_df.limit(cap + 1).collect()
    if len(rows) > cap:
        sizes = df.agg(*[F.countDistinct(c).alias(c) for c in cats]) \
                  .collect()[0].asDict()
        worst = max(sizes, key=sizes.get)
        raise ValueError(
            f"encoder fit: categorical domains too large to collect "
            f"(> {max_categories} categories/column; per-column distinct "
            f"counts {sizes}, worst {worst!r}) — a near-unique column "
            f"belongs in hashed features, not a literal-CASE encoder; "
            f"raise max_categories only if the domain is genuinely "
            f"bounded")
    # grouping_id bit i is 0 when column i IS grouped: set j has
    # exactly bit j clear
    by_col: dict[str, list] = {c: [] for c in cats}
    all_set = (1 << k) - 1
    for r in rows:
        gid = r["__gid"]
        j = next(i for i in range(k) if not (gid >> (k - 1 - i)) & 1)
        assert gid == all_set - (1 << (k - 1 - j))
        by_col[cats[j]].append(r)
    return by_col


def fit_category_encoders(
    labeled: DataFrame,
    cat_cols,
    target_col: str,
    smoothing: float = 10.0,
    max_categories: int = 10_000,
) -> dict[str, dict]:
    """Fit smoothed mean-target encoders for the categorical feature
    layer — the model-side consumer encoding.py was built for. The
    per-category statistics are the SAME exact-decimal (sum, count)
    pairs :func:`~goetl_spark.operators.encoding.target_encode`
    aggregates (operators/encoding.py::target_encoding_table), and the
    encoding formula replays the identical fixed IEEE chain (decimal →
    string → double crossing, then one multiply-add-divide), so a
    category's served value is bit-identical to the batch encoder's
    join-back — pinned by tests, not assumed.

    Returns ``{col: {"values": {category: encoding}, "default": g}}``
    — ``values`` may carry a ``None`` key (NULL categories form their
    own class); ``default`` is the global target mean, which is
    exactly what an unseen category's shrinkage formula degenerates to
    at count 0. Feed to :func:`encode_categories`.

    Scale shape: ONE domain-bounded GROUPING SETS aggregate + one
    bounded collect over the labeled TRAINING frame for ALL columns
    together (a sample at 100 TB — see module docstring; k columns
    used to cost k scans). The collect is capped at ``max_categories``
    per column — a domain past that belongs in hashed features, and
    the guard raises that diagnostic instead of OOMing the driver or
    emitting a CASE expression past codegen limits."""
    if smoothing < 0:
        raise ValueError(f"smoothing must be >= 0, got {smoothing}")
    cats = list(cat_cols)
    t = F.col(target_col).cast("double")
    base = labeled.filter(t.isNotNull())
    by_col = _grouping_sets_counts(
        base, cats,
        [F.sum(t.cast("decimal(38,6)")).alias("__sd"),
         F.count(F.lit(1)).alias("__n")],
        max_categories)
    if not any(by_col.values()):
        raise ValueError(f"target_encode: {target_col!r} is all NULL")
    # global mean: exact-decimal total of any one column's class sums
    # (every set partitions the same filtered rows, and decimal sums
    # are exact, so the total is identical whichever set derives it),
    # crossed to double via the house string round-trip
    first = by_col[cats[0]]
    total_sd = None
    total_n = 0
    for r in first:
        total_sd = r["__sd"] if total_sd is None else total_sd + r["__sd"]
        total_n += r["__n"]
    gmean = float(str(total_sd)) / total_n
    m = float(smoothing)
    out = {}
    for c in cats:
        vals = {r[c]: (float(str(r["__sd"])) + m * gmean) / (r["__n"] + m)
                for r in by_col[c]}
        out[c] = {"values": vals, "default": gmean}
    return out


def fit_frequency_encoders(
    df: DataFrame, cat_cols, max_categories: int = 10_000,
) -> dict[str, dict]:
    """Label-free companion to :func:`fit_category_encoders`: each
    category maps to its share of the fitting frame (n_c / N — the
    exact expression operators/encoding.py::frequency_encoding_table
    computes, replayed on the collected counts; bit-identical, pinned
    by tests). Unseen categories default to 0.0 — they appeared in no
    rows. Same single-scan GROUPING SETS shape and ``max_categories``
    guard as the target-encoder fit."""
    cats = list(cat_cols)
    by_col = _grouping_sets_counts(
        df, cats, [F.count(F.lit(1)).alias("__n")], max_categories)
    out = {}
    for c in cats:
        total = sum(r["__n"] for r in by_col[c])
        if total == 0:
            raise ValueError("frequency_encode: empty input")
        out[c] = {"values": {r[c]: float(r["__n"]) / float(total)
                             for r in by_col[c]},
                  "default": 0.0}
    return out


def _sql_literal(v) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, int):
        return str(v)
    raise TypeError(
        f"encode_categories: unsupported category literal type "
        f"{type(v).__name__!r} ({v!r}) — str/int/bool categories only")


def _dbl_literal(f: float) -> str:
    # string->double, the house cross-engine-exact double literal
    return f"CAST('{float(f)!r}' AS DOUBLE)"


def encode_categories(
    df: DataFrame,
    encoders: dict[str, dict],
    prefix: str = "f_cat_",
) -> DataFrame:
    """Append ``{prefix}{col}`` numeric features from fitted encoder
    dicts (:func:`fit_category_encoders` / :func:`fit_frequency_encoders`)
    — the serving half of the categorical feature layer, in
    :func:`score_quality`'s serving shape: each column becomes ONE
    literal ``CASE`` expression (a single ``F.expr`` string — py4j
    Column construction costs a driver round-trip per node, the r12
    measured lesson), so scoring is pure whole-stage-codegen map work
    with no join, no broadcast, no ML runtime, and an encoder exported
    as numbers reproduces identical features anywhere.

    NULL categories hit their own fitted class when present (explicit
    ``IS NULL`` branch); anything unseen — including NULL with no
    fitted NULL class — falls to the encoder's ``default``."""
    for col, spec in encoders.items():
        vals = dict(spec["values"])
        branches = []
        if None in vals:
            branches.append(
                f"WHEN `{col}` IS NULL THEN {_dbl_literal(vals.pop(None))}")
        for v in sorted(vals, key=str):
            branches.append(f"WHEN `{col}` = {_sql_literal(v)} "
                            f"THEN {_dbl_literal(vals[v])}")
        case = (" ".join(["CASE", *branches]) +
                f" ELSE {_dbl_literal(spec['default'])} END")
        df = df.withColumn(prefix + col, F.expr(case))
    return df


def classification_metrics(
    df: DataFrame,
    label_col: str,
    pred_col: str,
) -> DataFrame:
    """Per-class evaluation of a (multiclass) classifier: one row per
    class observed in labels OR predictions with ``tp/fp/fn/support``
    counts and one-vs-rest ``precision/recall/f1`` — the measurement
    half of the quality-classifier family (train/score produce
    predictions; this grades them). Macro/micro averages are one
    aggregate over the per-class rows, left to the caller so failures
    stay attributable to a class.

    NULL labels and NULL predictions form their own class (the house
    NULL semantics — an unlabeled row is itself a category; null-safe
    equality throughout). Undefined ratios are NULL, not 0: precision
    for a never-predicted class and recall for a zero-support class
    have no value to report (sklearn's zero_division=0 silently calls
    these 0.0 — a class you never predicted is not "0% precise").

    Determinism: every metric is a single long/long IEEE division
    (f1 via its closed form 2·tp/(2·tp+fp+fn), never 2PR/(P+R) — no
    computed value feeds another division), so rows replay hash-exact
    in oracle SQL.

    Scale shape: ONE fact pass into the confusion matrix (a
    map-side-combinable groupBy bounded by classes², eagerly
    localCheckpointed); everything after reduces/joins that bounded
    table. Class-valued columns only — near-unique "classes" are a
    caller bug, and the classes² bound is the diagnostic."""
    lab, prd = F.col(label_col), F.col(pred_col)
    cm = (df.groupBy(lab.alias("__l"), prd.alias("__p"))
          .agg(F.count(F.lit(1)).alias("__n"))
          .localCheckpoint(eager=True))

    classes = (cm.select(F.col("__l").alias("cls"))
               .union(cm.select(F.col("__p").alias("cls")))
               .distinct())
    diag = cm.filter(F.col("__l").eqNullSafe(F.col("__p"))).select(
        F.col("__l").alias("__k"), F.col("__n").alias("tp"))
    off = cm.filter(~F.col("__l").eqNullSafe(F.col("__p")))
    fp = off.groupBy(F.col("__p").alias("__k")).agg(
        F.sum("__n").alias("fp"))
    fn = off.groupBy(F.col("__l").alias("__k")).agg(
        F.sum("__n").alias("fn"))
    sup = cm.groupBy(F.col("__l").alias("__k")).agg(
        F.sum("__n").alias("support"))

    out = classes
    for part in (diag, fp, fn, sup):
        out = (out.join(part, on=F.col("cls").eqNullSafe(F.col("__k")),
                        how="left")
               .drop("__k"))
    tp = F.coalesce(F.col("tp"), F.lit(0)).cast("long")
    fpc = F.coalesce(F.col("fp"), F.lit(0)).cast("long")
    fnc = F.coalesce(F.col("fn"), F.lit(0)).cast("long")
    return out.select(
        "cls",
        tp.alias("tp"), fpc.alias("fp"), fnc.alias("fn"),
        F.coalesce(F.col("support"), F.lit(0)).cast("long")
         .alias("support"),
        F.when(tp + fpc > 0, tp / (tp + fpc)).alias("precision"),
        F.when(tp + fnc > 0, tp / (tp + fnc)).alias("recall"),
        F.when(2 * tp + fpc + fnc > 0,
               (2 * tp) / (2 * tp + fpc + fnc)).alias("f1"))


def calibration_bins(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a probabilistic classifier — the
    calibration leg of the eval suite (:func:`classification_metrics`
    grades decisions; this grades the CONFIDENCE behind them): scores
    bin into ``n_bins`` equal-width bins over [0, 1] and each bin
    reports its count, positive count, observed positive rate, the
    bin midpoint (the confidence the bin CLAIMS), and its expected-
    calibration-error contribution ``|obs_rate − midpoint| · n / N``
    — ECE is the caller's one sum over the ≤ n_bins rows, left
    per-bin so miscalibration stays attributable to a score range.

    Bin edges are the exact rationals i/n_bins (a score of exactly an
    edge goes UP, 1.0 into the last bin). Rows with a NULL, NaN, or
    out-of-range score, or a NULL label, are rejected with a clear
    error — a "probability" outside [0, 1] is a caller bug worth
    failing loudly on, and an unlabeled row would silently dilute a
    bin's observed rate; calibration is only defined on labeled,
    scored rows. The check rides the binning aggregate itself (bad
    rows land in a sentinel bin that raises after the pass), so clean
    data pays exactly ONE fact scan — only the error path re-scans to
    fetch a first offender for the message.

    Determinism: every output is either an integer count or a fixed
    chain of IEEE ops on exact inputs (int/int divisions, the exact
    midpoint rational, one subtraction, one multiply) — no
    transcendental, no float sum — so rows replay hash-exact in
    oracle SQL. Scale shape: one fact pass into an n_bins-bounded
    count table; the total re-derives from it."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    p = F.col(prob_col)
    bad_row = (p.isNull() | F.isnan(p.cast("double"))
               | (p < 0.0) | (p > 1.0) | F.col(label_col).isNull())
    bin_id = F.when(bad_row, F.lit(-1)).otherwise(
        F.least(F.floor(p * n_bins).cast("int"), F.lit(n_bins - 1)))
    y = F.col(label_col).cast("double")
    counts = (df.groupBy(bin_id.alias("bin_id"))
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.when(y > 0, 1).otherwise(0)).alias("n_pos"))
              .localCheckpoint(eager=True))
    if counts.filter(F.col("bin_id") == -1).head() is not None:
        offender = df.filter(bad_row).limit(1).collect()
        raise ValueError(
            f"calibration_bins: NULL/NaN/out-of-range {prob_col!r} or NULL "
            f"{label_col!r} (first offender: {offender[0].asDict()}) — "
            f"scores must be probabilities in [0,1] on labeled rows")
    total = counts.agg(F.sum("n").alias("__N"))
    mid = ((F.col("bin_id") * 2 + 1) / F.lit(float(2 * n_bins)))
    obs = F.col("n_pos") / F.col("n")
    return (counts.crossJoin(F.broadcast(total))
            .select(
                "bin_id",
                F.col("n").cast("long").alias("n"),
                F.col("n_pos").cast("long").alias("n_pos"),
                mid.alias("midpoint"),
                obs.alias("obs_rate"),
                (F.abs(obs - mid) * F.col("n") / F.col("__N"))
                 .alias("ece_term")))


def _raise_unrankable(df, p, y, row, op, score_col, label_col):
    """Shared guard tail for :func:`roc_auc` / :func:`pr_auc`: the bad
    counts were aggregated inside the main pass (clean data = one
    scan); only when they're non-zero does this re-scan for a first
    offender to name in the error."""
    if int(row["bad_score"] or 0) == 0 and int(row["bad_label"] or 0) == 0:
        return
    offender = df.filter(
        p.isNull() | F.isnan(p.cast("double")) | y.isNull()
    ).limit(1).collect()
    detail = offender[0].asDict() if offender else "?"
    raise ValueError(
        f"{op}: NULL/NaN {score_col!r} or NULL {label_col!r} "
        f"(first offender: {detail}) — every row must be "
        f"scored and labeled")


def calibration_bins_by(
    df: DataFrame,
    group_cols,
    prob_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Per-SEGMENT reliability bins — :func:`calibration_bins` with one
    diagram per group (the grouped-eval sibling of :func:`roc_auc_by`:
    an aggregate ECE happily hides one slice whose confidences are
    upside down). One row per (group, bin) with the same columns;
    ``ece_term`` normalizes by the GROUP's row count, so each group's
    ECE is the sum of its own rows. NULL group keys form their own
    segment.

    Same rejection contract as the sibling (NULL/NaN/out-of-range
    scores, NULL labels), enforced LAZILY: bad rows land in a sentinel
    bin whose per-group count rides the totals table, and an
    assert_true in the totals projection raises at execution — it
    lives on the broadcast side, so even a group consisting ENTIRELY
    of bad rows (whose output rows are all filtered) still trips it.
    Clean data pays one fact scan and zero driver actions.

    Scale shape: one fact pass into a groups×(n_bins+1)-bounded count
    table; totals reduce it and broadcast back."""
    groups = list(group_cols)
    if not groups:
        raise ValueError("group_cols must be non-empty — use "
                         "calibration_bins for the whole-frame diagram")
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    p = F.col(prob_col)
    bad_row = (p.isNull() | F.isnan(p.cast("double"))
               | (p < 0.0) | (p > 1.0) | F.col(label_col).isNull())
    bin_id = F.when(bad_row, F.lit(-1)).otherwise(
        F.least(F.floor(p * n_bins).cast("int"), F.lit(n_bins - 1)))
    y = F.col(label_col).cast("double")
    counts = (df.groupBy(*groups, bin_id.alias("bin_id"))
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.when(y > 0, 1).otherwise(0)).alias("n_pos")))
    ok = F.assert_true(
        F.col("__nbad") == 0,
        F.concat(
            F.lit(f"calibration_bins_by: NULL/NaN/out-of-range "
                  f"{prob_col!r} or NULL {label_col!r} in group ("),
            F.concat_ws(
                ", ", *[F.coalesce(F.col(g).cast("string"), F.lit("NULL"))
                        for g in groups]),
            F.lit(") — scores must be probabilities in [0,1] on "
                  "labeled rows")))
    totals = (counts.groupBy(*groups)
              .agg(F.sum(F.when(F.col("bin_id") == -1, F.col("n"))
                          .otherwise(0)).alias("__nbad"),
                   F.sum(F.when(F.col("bin_id") >= 0, F.col("n"))
                          .otherwise(0)).alias("__rawN"))
              .select(*groups,
                      F.when(ok.isNull(), F.col("__rawN")).alias("__N")))
    joined = _group_offset_join(counts.filter(F.col("bin_id") >= 0),
                                groups, totals)
    mid = ((F.col("bin_id") * 2 + 1) / F.lit(float(2 * n_bins)))
    obs = F.col("n_pos") / F.col("n")
    return joined.select(
        *groups, "bin_id",
        F.col("n").cast("long").alias("n"),
        F.col("n_pos").cast("long").alias("n_pos"),
        mid.alias("midpoint"),
        obs.alias("obs_rate"),
        (F.abs(obs - mid) * F.col("n") / F.col("__N")).alias("ece_term"))


def _mw_rank_sum_row(g: DataFrame):
    """Collect the Mann-Whitney rank-sum aggregate from a distinct-
    score group table ``(__score, n, n_pos, __nolabel)`` — the exact-
    integer core shared by :func:`roc_auc` (which builds the groups
    from fact rows) and quality.py::classifier_two_sample_test (which
    builds them from its cells-bounded count table, so the fact side
    never shuffles a second time). Returns the 1-row aggregate with
    ``num2/np/nn/nt/bad_score/bad_label``; callers own the guards."""
    from goetl_spark.operators.sampling import _with_exclusive_cumsum

    c = _with_exclusive_cumsum(g, "n", ["__score"], "cum_before")
    sk = F.col("__score")
    bad_key = sk.isNull() | F.isnan(sk.cast("double"))
    return c.agg(
        F.sum(F.col("n_pos")
              * (2 * F.col("cum_before") + F.col("n") + 1)).alias("num2"),
        F.sum("n_pos").alias("np"),
        F.sum(F.col("n") - F.col("n_pos")).alias("nn"),
        F.sum("n").alias("nt"),
        F.sum(F.when(bad_key, F.col("n")).otherwise(0)).alias("bad_score"),
        F.sum("__nolabel").alias("bad_label")).collect()[0]


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact tie-aware ROC-AUC (one row: n / n_pos / n_neg / auc) —
    the threshold-free ranking leg of the eval suite
    (:func:`classification_metrics` grades one threshold,
    :func:`calibration_bins` the confidences; AUC grades the whole
    ranking). Computed via the Mann-Whitney rank form with midrank
    ties, all in EXACT integer arithmetic: scores collapse to their
    distinct-value groups, an exclusive cumulative count gives each
    group's rank offset, and twice the positive rank-sum is
    ``Σ_g n_pos_g · (2·cum_before_g + n_g + 1)`` — an exact long —
    so ``auc = (2Σr − n_pos(n_pos+1)) / (2·n_pos) / n_neg`` is two
    IEEE divisions of exact integers, hash-exact in oracle SQL and
    identical to sklearn's tie-corrected AUC.

    NULL/NaN scores and NULL labels are rejected loudly (an unrankable
    row is a caller bug, the :func:`calibration_bins` contract), as is
    a single-class eval set (AUC is undefined — returning 0.5 would
    disguise a broken label join as a coin-flip model). The check
    rides the score-collapse groupBy (bad counts aggregate alongside
    the rank sums and raise after), so clean data pays exactly ONE
    fact scan — only the error path re-scans for a first offender.

    Scale shape: one groupBy collapses the data to distinct scores;
    the rank offsets come from the range-partitioned two-phase cumsum
    (sampling.py::_with_exclusive_cumsum — NEVER a global window); one
    bounded 1-row aggregate ends it. Exactness bound: the rank sum is
    ≤ n_pos·n_total on the ×2 grid — past ~4.6e18 the long sum
    overflows and ANSI mode fails loudly rather than rounding."""
    p, y = F.col(score_col), F.col(label_col)
    g = (df.groupBy(p.alias("__score"))
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(F.when(y.cast("double") > 0, 1).otherwise(0))
               .alias("n_pos"),
              F.sum(F.when(y.isNull(), 1).otherwise(0)).alias("__nolabel")))
    row = _mw_rank_sum_row(g)
    _raise_unrankable(df, p, y, row, "roc_auc", score_col, label_col)
    if row["nt"] is None:
        raise ValueError("roc_auc: empty input")
    np_, nn, nt = int(row["np"]), int(row["nn"]), int(row["nt"])
    if np_ == 0 or nn == 0:
        raise ValueError(
            f"roc_auc: eval set has n_pos={np_}, n_neg={nn} — AUC is "
            f"undefined on a single-class set")
    auc = (int(row["num2"]) - np_ * (np_ + 1)) / (2.0 * np_) / nn
    return df.sparkSession.createDataFrame(
        [(nt, np_, nn, float(auc))],
        "n long, n_pos long, n_neg long, auc double")


def pr_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Average precision over the full ranking (one row: n / n_pos /
    n_neg / average_precision) — sklearn's threshold form
    ``AP = Σ_k (R_k − R_{k−1}) · P_k``, the imbalance-robust companion
    to :func:`roc_auc` (AUC stays high when negatives dwarf positives;
    AP collapses with precision, which is what a rare-positive quality
    filter actually feels). Thresholds are the distinct scores
    DESCENDING, ties grouped (all equal scores cross a threshold
    together, the sklearn semantics): per group
    ``term = (tp_g / n_pos) · (tp_cum_g / n_cum_g)`` with INCLUSIVE
    cumulative counts.

    Determinism: group counts and both cumulative counts are exact
    longs (the :func:`roc_auc` machinery — range-partitioned cumsum,
    never a global window); each term is two exact-long divisions and
    one multiply in fixed order, then scale-9 rounding into
    DECIMAL(38,9) before the sum (the lm.py recipe — terms carry
    unequal denominators, so unlike AUC the sum cannot stay on an
    integer grid). Hash-exact in oracle SQL.

    Same guards as :func:`roc_auc` (folded into the main pass the same
    way — clean data pays one fact scan): NULL/NaN scores, NULL
    labels, and single-class sets are rejected loudly."""
    p, y = F.col(score_col), F.col(label_col)
    from goetl_spark.operators.sampling import _with_exclusive_cumsums

    g = (df.groupBy(p.alias("__score"))
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(F.when(y.cast("double") > 0, 1).otherwise(0))
               .alias("n_pos"),
              F.sum(F.when(y.isNull(), 1).otherwise(0)).alias("__nolabel"))
         # descending scores: cumsum over the NEGATED key (the helper
         # ranges ascending); scores are distinct post-groupBy so the
         # order is total
         .withColumn("__negscore", -F.col("__score")))
    c = _with_exclusive_cumsums(
        g, [("n", "n_before"), ("n_pos", "tp_before")], ["__negscore"])
    sk = F.col("__score")
    bad_key = sk.isNull() | F.isnan(sk.cast("double"))
    # totals (and the folded bad-row counts) ride a 1-row crossJoin —
    # no second pass over the data
    tot = c.agg(F.sum("n_pos").alias("__np_total"),
                F.sum(F.col("n") - F.col("n_pos")).alias("__nn_total"),
                F.sum("n").alias("__nt"),
                F.sum(F.when(bad_key, F.col("n")).otherwise(0))
                 .alias("bad_score"),
                F.sum("__nolabel").alias("bad_label"))
    # term = ΔR·P = (n_pos_g / n_pos_total) · (tp_cum_incl / n_cum_incl)
    term = (F.col("n_pos") / F.col("__np_total")
            * ((F.col("n_pos") + F.col("tp_before"))
               / (F.col("n") + F.col("n_before"))))
    row = (c.crossJoin(F.broadcast(tot))
           .select(
               F.col("__np_total"), F.col("__nn_total"), F.col("__nt"),
               F.col("bad_score"), F.col("bad_label"),
               F.when(F.col("n_pos") > 0,
                      F.round(term, 9).cast("decimal(38,9)"))
                .otherwise(F.lit(0).cast("decimal(38,9)")).alias("__t"))
           .groupBy("__np_total", "__nn_total", "__nt",
                    "bad_score", "bad_label")
           .agg(F.sum("__t").cast("double").alias("ap"))
           .collect())
    if not row:
        raise ValueError("pr_auc: empty input")
    r = row[0]
    _raise_unrankable(df, p, y, r, "pr_auc", score_col, label_col)
    np_, nn = int(r["__np_total"]), int(r["__nn_total"])
    if np_ == 0 or nn == 0:
        raise ValueError(
            f"pr_auc: eval set has n_pos={np_}, n_neg={nn} — average "
            f"precision is undefined on a single-class set")
    return df.sparkSession.createDataFrame(
        [(int(r["__nt"]), np_, nn, float(r["ap"]))],
        "n long, n_pos long, n_neg long, average_precision double")


def _group_offset_join(c: DataFrame, groups, offs: DataFrame) -> DataFrame:
    """Null-safe equi-join of per-group offset/total columns back onto
    the collapsed score table (NULL group keys are real classes — the
    encoding.py `_join_back` contract)."""
    keyed = offs.select(
        *[F.col(g).alias(f"__g_{i}") for i, g in enumerate(groups)],
        *[c2 for c2 in offs.columns if c2 not in groups])
    cond = None
    for i, g in enumerate(groups):
        eq = F.col(g).eqNullSafe(F.col(f"__g_{i}"))
        cond = eq if cond is None else cond & eq
    return (c.join(F.broadcast(keyed), on=cond, how="inner")
            .drop(*[f"__g_{i}" for i in range(len(groups))]))


def roc_auc_by(
    df: DataFrame,
    group_cols,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Per-segment exact tie-aware ROC-AUC — one row per group with
    ``n / n_pos / n_neg / auc``: the per-slice quality question a
    curation pipeline actually asks ("does the scorer rank well on
    EVERY language/source?", not just on average — aggregate AUC
    happily hides a slice where the ranking is inverted). Same exact
    Mann-Whitney midrank arithmetic as :func:`roc_auc`; the rank
    offsets come from ONE total-order cumsum over (group..., score) —
    group keys lead the order, so each group's rows are contiguous and
    its in-group exclusive count is ``cum_total − min(cum_total over
    the group)``, a per-group offset subtraction instead of a per-group
    window. NULL group keys form their own segment (null-safe offset
    join back, the house NULL semantics).

    Single-class GROUPS yield NULL auc instead of raising (the
    :func:`classification_metrics` undefined-ratio convention — one
    degenerate slice must not kill the other segments' evaluation;
    n_pos/n_neg in the row say why). NULL/NaN scores and NULL labels
    still raise loudly — via assert_true riding the output expressions,
    so there is no separate validation scan and clean data pays one
    fact pass (the cumsum machinery's internal partition-totals
    collect — ≤ #partitions rows, the pack_sequences contract — is
    the only driver exchange).

    Scale shape: one (group, score) collapse shuffle, the
    range-partitioned two-phase cumsum, one groups-bounded offset
    aggregate broadcast back — never a global or per-group window over
    fact rows."""
    groups = list(group_cols)
    if not groups:
        raise ValueError("group_cols must be non-empty — use roc_auc "
                         "for the whole-frame AUC")
    p, y = F.col(score_col), F.col(label_col)
    from goetl_spark.operators.sampling import _with_exclusive_cumsum

    g = (df.groupBy(*groups, p.alias("__score"))
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(F.when(y.cast("double") > 0, 1).otherwise(0))
               .alias("n_pos"),
              F.sum(F.when(y.isNull(), 1).otherwise(0)).alias("__nolabel")))
    c = _with_exclusive_cumsum(g, "n", [*groups, "__score"], "__cumt")
    offs = c.groupBy(*groups).agg(F.min("__cumt").alias("__goff"))
    c = _group_offset_join(c, groups, offs)

    sk = F.col("__score")
    bad_key = sk.isNull() | F.isnan(sk.cast("double"))
    cum_before = F.col("__cumt") - F.col("__goff")
    per = (c.groupBy(*groups)
           .agg(F.sum(F.col("n_pos") * (2 * cum_before + F.col("n") + 1))
                 .alias("__num2"),
                F.sum("n_pos").alias("__np"),
                F.sum(F.col("n") - F.col("n_pos")).alias("__nn"),
                F.sum("n").alias("__nt"),
                F.sum(F.when(bad_key, F.col("n")).otherwise(0))
                 .alias("__bads"),
                F.sum("__nolabel").alias("__badl")))
    ok = F.assert_true(
        (F.col("__bads") == 0) & (F.col("__badl") == 0),
        F.lit(f"roc_auc_by: NULL/NaN {score_col!r} or NULL "
              f"{label_col!r} — every row must be scored and labeled"))
    np_, nn = F.col("__np"), F.col("__nn")
    auc = F.when(ok.isNull() & (np_ > 0) & (nn > 0),
                 (F.col("__num2") - np_ * (np_ + 1)).cast("double")
                 / (F.lit(2.0) * np_) / nn)
    return per.select(
        *groups,
        F.col("__nt").cast("long").alias("n"),
        np_.cast("long").alias("n_pos"),
        nn.cast("long").alias("n_neg"),
        auc.alias("auc"))


def pr_auc_by(
    df: DataFrame,
    group_cols,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Per-segment average precision — one row per group with
    ``n / n_pos / n_neg / average_precision``: :func:`pr_auc`'s
    sklearn threshold form computed per slice with the
    :func:`roc_auc_by` machinery (total-order cumsums over
    (group..., score DESC), per-group offset subtraction, null-safe
    offset join, assert_true guards — no separate validation scan,
    same bounded cumsum-internal driver exchange). Terms round
    scale-9 into DECIMAL(38,9) before the per-group sum (the lm.py
    recipe — unequal denominators, no integer grid). Single-class
    groups yield NULL average_precision; NULL/NaN scores and NULL
    labels raise loudly."""
    groups = list(group_cols)
    if not groups:
        raise ValueError("group_cols must be non-empty — use pr_auc "
                         "for the whole-frame average precision")
    p, y = F.col(score_col), F.col(label_col)
    from goetl_spark.operators.sampling import _with_exclusive_cumsums

    g = (df.groupBy(*groups, p.alias("__score"))
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(F.when(y.cast("double") > 0, 1).otherwise(0))
               .alias("n_pos"),
              F.sum(F.when(y.isNull(), 1).otherwise(0)).alias("__nolabel"))
         .withColumn("__negscore", -F.col("__score")))
    c = _with_exclusive_cumsums(
        g, [("n", "__nbt"), ("n_pos", "__tpt")], [*groups, "__negscore"])
    offs = c.groupBy(*groups).agg(
        F.min("__nbt").alias("__goffn"),
        F.min("__tpt").alias("__gofftp"),
        F.sum("n_pos").alias("__np_g"),
        F.sum(F.col("n") - F.col("n_pos")).alias("__nn_g"),
        F.sum("n").alias("__nt_g"))
    c = _group_offset_join(c, groups, offs)

    sk = F.col("__score")
    bad_key = sk.isNull() | F.isnan(sk.cast("double"))
    n_before = F.col("__nbt") - F.col("__goffn")
    tp_before = F.col("__tpt") - F.col("__gofftp")
    term = (F.col("n_pos") / F.col("__np_g")
            * ((F.col("n_pos") + tp_before) / (F.col("n") + n_before)))
    per = (c.groupBy(*groups)
           .agg(F.first("__np_g").alias("__np"),
                F.first("__nn_g").alias("__nn"),
                F.first("__nt_g").alias("__nt"),
                F.sum(F.when(F.col("n_pos") > 0,
                             F.round(term, 9).cast("decimal(38,9)"))
                       .otherwise(F.lit(0).cast("decimal(38,9)")))
                 .alias("__ap"),
                F.sum(F.when(bad_key, F.col("n")).otherwise(0))
                 .alias("__bads"),
                F.sum("__nolabel").alias("__badl")))
    ok = F.assert_true(
        (F.col("__bads") == 0) & (F.col("__badl") == 0),
        F.lit(f"pr_auc_by: NULL/NaN {score_col!r} or NULL "
              f"{label_col!r} — every row must be scored and labeled"))
    np_, nn = F.col("__np"), F.col("__nn")
    ap = F.when(ok.isNull() & (np_ > 0) & (nn > 0),
                F.col("__ap").cast("double"))
    return per.select(
        *groups,
        F.col("__nt").cast("long").alias("n"),
        np_.cast("long").alias("n_pos"),
        nn.cast("long").alias("n_neg"),
        ap.alias("average_precision"))


def regression_metrics(
    df: DataFrame,
    label_col: str,
    pred_col: str,
    group_cols=(),
    moment_scale: int = 1,
) -> DataFrame:
    """Regression evaluation — the eval-suite leg for CONTINUOUS
    targets (:func:`classification_metrics` grades decisions,
    :func:`roc_auc` rankings, :func:`calibration_bins` confidences;
    value predictors — demand forecasts, score regressors, the OLS
    trends of timeseries.py — grade here). One row per group (one row
    total with no ``group_cols``): ``n / mae / bias / rmse / r2``.
    ``bias`` is the signed mean error (pred − label) — the
    over/under-forecast direction MAE deliberately hides; ``r2`` is
    ``1 − SS_res/SS_tot`` via the one-pass algebraic form
    ``SS_tot = n·Σy² − (Σy)²``, NULL on a constant-label group
    (explaining zero variance is undefined, not perfect — the
    single-class-AUC convention).

    NULL/NaN on either side is rejected loudly (an ungradable row is
    a caller bug — the :func:`roc_auc` contract); the check rides the
    main aggregate as a folded bad-row count raised via assert_true
    inside the output projection, so clean data pays exactly ONE fact
    scan. Empty input returns an empty frame (grouped or not).

    Determinism (stats.pearson_corr_exact's recipe): the per-row
    error is plain IEEE (same parquet bits, same ops in both
    engines); every SUM accumulates in exact decimal — Σ|e|, Σe, Σy
    at scale 6, with second moments e², y² squared IN decimal
    (19,6)×(19,6) — then rounds to ``moment_scale`` before its double
    cast (the measured cross-engine scale-cast hazard), and only the
    final fixed chain of IEEE ops runs in doubles — hash-exact in
    oracle SQL. Raise ``moment_scale`` for |err| ≪ 1 columns, where
    scale-1 sums would collapse to 0 (the standardize dial).

    Scale shape: ONE partial-aggregated fact pass into a
    groups-bounded moment table; everything after is per-row
    arithmetic on that bounded table. No window, no join, no second
    scan."""
    y = F.col(label_col).cast("double")
    f = F.col(pred_col).cast("double")
    err = f - y
    bad = (F.col(label_col).isNull() | F.isnan(y)
           | F.col(pred_col).isNull() | F.isnan(f))
    good = ~bad

    def shrink(c):  # exact decimal -> double, the pearson_corr_exact recipe
        return (F.round(c, moment_scale)
                .cast(f"decimal(38,{moment_scale})").cast("double"))

    yq = y.cast("decimal(19,6)")
    eq = err.cast("decimal(19,6)")
    aggs = [
        F.sum(F.when(good, 1).otherwise(0)).cast("long").alias("n"),
        F.sum(F.when(bad, 1).otherwise(0)).alias("__nbad"),
        shrink(F.sum(F.when(good, F.abs(err).cast("decimal(38,6)"))))
            .alias("__sa"),
        shrink(F.sum(F.when(good, err.cast("decimal(38,6)"))))
            .alias("__se"),
        shrink(F.sum(F.when(good, eq * eq))).alias("__see"),
        shrink(F.sum(F.when(good, y.cast("decimal(38,6)")))).alias("__sy"),
        shrink(F.sum(F.when(good, yq * yq))).alias("__syy"),
    ]
    groups = list(group_cols)
    g = df.groupBy(*groups).agg(*aggs) if groups else df.agg(*aggs)
    ok = F.assert_true(
        F.col("__nbad") == 0,
        F.lit(f"regression_metrics: NULL/NaN {label_col!r} or "
              f"{pred_col!r} — every row must be labeled and predicted; "
              f"filter or impute upstream"))
    nd = F.col("n").cast("double")
    live = ok.isNull() & (F.col("n") > 0)
    ss_tot = nd * F.col("__syy") - F.col("__sy") * F.col("__sy")
    return (g
            # whole-frame empty input: the global aggregate still emits
            # one all-zero row — drop it (empty in, empty out); kept when
            # __nbad > 0 so the assert still fires on all-bad input
            .filter((F.col("n") > 0) | (F.col("__nbad") > 0))
            .select(
                *groups,
                F.col("n"),
                F.when(live, F.col("__sa") / nd).alias("mae"),
                F.when(live, F.col("__se") / nd).alias("bias"),
                F.when(live, F.sqrt(F.col("__see") / nd)).alias("rmse"),
                F.when(live & (ss_tot > 0),
                       F.lit(1.0) - nd * F.col("__see") / ss_tot)
                 .alias("r2")))


def train_quality_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    max_iter: int = 50,
    reg_param: float = 0.01,
    extra_cols=(),
):
    """Train the LR quality model on a labeled frame (label 1 =
    high-quality reference text, 0 = noise). Returns the fitted
    ``pyspark.ml`` PipelineModel (assembler + scaler + LR) — pass it to
    :func:`score_quality`. Standard-scaling the features keeps the
    L2-regularized coefficients comparable across ratio vs log-length
    features.

    ``extra_cols`` appends caller-provided numeric feature columns —
    e.g. the categorical encodings from :func:`encode_categories` —
    to the text features; they must already be on ``labeled`` (and on
    every frame later passed to :func:`score_quality`, which reads the
    feature list back from the fitted assembler)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    feats = text_features(labeled, text_col)
    pipe = Pipeline(stages=[
        VectorAssembler(inputCols=list(QUALITY_FEATURES) + list(extra_cols),
                        outputCol="__raw"),
        StandardScaler(inputCol="__raw", outputCol="__feat",
                       withMean=True, withStd=True),
        LogisticRegression(featuresCol="__feat", labelCol=label_col,
                           maxIter=max_iter, regParam=reg_param),
    ])
    return pipe.fit(feats)


def score_quality(
    df: DataFrame, model, text_col: str = "text",
    out: str = "quality_prob",
) -> DataFrame:
    """Append ``out`` = P(high quality) from a trained model — as a
    PURE Column expression: the LR coefficients, intercept, and scaler
    moments are extracted from the fitted pipeline ONCE on the driver
    and inlined as literals, so scoring is sigmoid(Σ wᵢ·(fᵢ−μᵢ)/σᵢ + b)
    over the feature expressions with no ML runtime in the plan.

    Serving-shaped on purpose: the scoring scan stays inside
    whole-stage codegen (no vector UDFs), the plan serializes like any
    other expression plan (pyspark.ml transform plans trip a Spark 4.1
    task-serialization bug — NotSerializableException:
    ObservationManager — in sessions with registered Observations), and
    a model exported as numbers reproduces identical scores anywhere.
    Matches ``model.transform``'s probabilities to float round-off
    (same per-feature operation order)."""
    lr = model.stages[-1]
    scaler = model.stages[1]
    # the fitted assembler is the source of truth for the feature list
    # (QUALITY_FEATURES plus any extra_cols the model was trained with)
    names = list(model.stages[0].getInputCols())
    coefs = [float(c) for c in lr.coefficients]
    mean = [float(m) for m in scaler.mean]
    std = [float(s) for s in scaler.std]

    feats = text_features(df, text_col)
    margin = F.lit(float(lr.intercept))
    for name, w, mu, sd in zip(names, coefs, mean, std):
        # MLlib StandardScalerModel semantics: zero-variance features
        # scale to 0 (factor 0), not NaN
        scaled = (F.lit(0.0) if sd == 0.0
                  else (F.col(name) - F.lit(mu)) / F.lit(sd))
        margin = margin + F.lit(w) * scaled
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    drop = [c for c in feats.columns if c.startswith("f_")]
    return feats.withColumn(out, prob).drop(*drop)


def gains_at_k(
    df: DataFrame,
    score_col: str,
    label_col: str,
    ks=(10, 100, 1000),
) -> DataFrame:
    """Cumulative gains / lift table at selection depths — the
    TARGETING readout of the eval suite (:func:`roc_auc` grades the
    whole ranking; a campaign asks the operational "if I can only
    act on the top k, how many positives do I capture and how much
    better than random is that?"). One row per requested depth:
    ``k / k_eff / expected_pos / precision / recall / lift``.

    Ties are handled by EXPECTATION, not by an arbitrary row order
    (the Mann-Whitney midrank philosophy): rows tied at the k-th
    score are interchangeable, so the boundary block contributes
    ``pos_block · take/cnt`` — the expected positives under random
    tie-breaking, which is also the unique permutation-invariant
    answer. Scores collapse to distinct values; ``heavier`` (rows
    strictly above) comes from ONE descending-score cumsum (the
    range-partitioned two-phase machinery, never a global window);
    every depth reads the same collapsed table.

    Determinism: expected_pos accumulates per distinct score as
    ``(pos·take·10⁹) DIV cnt`` — exact integers, zero remainder off
    the boundary block — and precision/recall/lift land on the same
    1e-9 grid by further exact integer division (documented ≤ 2e-9
    understatement; lift's numerator E9·N stays inside DECIMAL(38)
    for N ≲ 1e12). Hash-exact in oracle SQL. NULL/NaN scores and
    NULL labels reject loudly via counts folded into the collapse
    (the :func:`roc_auc` guard contract, one fact scan). Zero
    positives → recall/lift NULL (capturing a share of nothing is
    undefined); ``k_eff = min(k, n)`` reports saturation. Empty
    input returns an empty frame.

    Scale shape: one (score) collapse shuffle, ONE cumsum range
    exchange over the collapsed table, a 1-row totals broadcast, a
    ks-sized explode of the COLLAPSED table — fact rows cross the
    network once."""
    from goetl_spark.operators.sampling import _with_exclusive_cumsum

    ks = sorted(set(int(k) for k in ks))
    if not ks or ks[0] < 1:
        raise ValueError(f"gains_at_k: depths must be >= 1, got {ks}")
    p, y = F.col(score_col), F.col(label_col)
    g = (df.groupBy(p.alias("__score"))
         .agg(F.count(F.lit(1)).alias("__cnt"),
              F.sum(F.when(y.cast("double") > 0, 1).otherwise(0))
               .alias("__pos"),
              F.sum(F.when(y.isNull(), 1).otherwise(0)).alias("__nolabel")))
    sk = F.col("__score")
    g = g.withColumn(
        "__badscore",
        F.when(sk.isNull() | F.isnan(sk.cast("double")), F.col("__cnt"))
         .otherwise(0))
    # negate in the score's NATIVE type — a double cast here could
    # collide distinct integer scores past 2^53 and make `heavier`
    # order-dependent; NULL scores order at 0 (they raise anyway)
    g = g.withColumn("__ord", F.when(sk.isNull(), F.lit(0)).otherwise(-sk))
    c = _with_exclusive_cumsum(g, "__cnt", ["__ord"], "__hv")
    tot = c.agg(F.sum("__cnt").alias("__N"),
                F.sum("__pos").alias("__P"),
                F.sum("__badscore").alias("__bs"),
                F.sum("__nolabel").alias("__bl"))
    c = c.crossJoin(F.broadcast(tot))
    c = c.withColumn("__k", F.explode(F.array(*[F.lit(k) for k in ks])))

    take = F.least(F.col("__cnt").cast("long"),
                   F.greatest(F.lit(0).cast("long"),
                              F.col("__k") - F.col("__hv")))
    t9 = F.expr("""
        (CAST(__pos AS DECIMAL(19,0)) * __take * 1000000000)
        DIV __cnt""")
    agg = (c.withColumn("__take", take)
           .groupBy("__k")
           .agg(F.sum(t9).alias("__e9"),
                F.first("__N").alias("__fN"),
                F.first("__P").alias("__fP"),
                F.first("__bs").alias("__fbs"),
                F.first("__bl").alias("__fbl")))
    ok = F.assert_true(
        (F.col("__fbs") == 0) & (F.col("__fbl") == 0),
        F.lit(f"gains_at_k: NULL/NaN {score_col!r} or NULL "
              f"{label_col!r} — every row must be scored and labeled"))
    keff = F.least(F.col("__k").cast("long"), F.col("__fN"))
    live = ok.isNull() & (F.col("__fN") > 0)
    prec9 = F.expr("CAST(__e9 AS DECIMAL(38,0)) DIV __keff")
    rec9 = F.expr("CAST(__e9 AS DECIMAL(38,0)) DIV __fP")
    lift9 = F.expr(
        "(CAST(__e9 AS DECIMAL(38,0)) * __fN) DIV "
        "(CAST(__keff AS DECIMAL(19,0)) * __fP)")
    return (agg.withColumn("__keff", keff)
            .filter(F.col("__fN").isNotNull())
            .select(
                F.col("__k").cast("long").alias("k"),
                F.col("__keff").cast("long").alias("k_eff"),
                F.when(live, F.col("__e9").cast("double") / F.lit(1.0e9))
                 .alias("expected_pos"),
                F.when(live, prec9.cast("double") / F.lit(1.0e9))
                 .alias("precision"),
                F.when(live & (F.col("__fP") > 0),
                       rec9.cast("double") / F.lit(1.0e9)).alias("recall"),
                F.when(live & (F.col("__fP") > 0),
                       lift9.cast("double") / F.lit(1.0e9)).alias("lift"))
            .orderBy("k"))


def matthews_corr(
    df: DataFrame,
    label_col: str,
    pred_col: str,
) -> DataFrame:
    """Matthews correlation coefficient (multiclass Rₖ) — the
    single-number balanced summary of a classifier's confusion matrix
    (:func:`classification_metrics` reports per-class P/R/F1;
    accuracy and F1 both reward majority-class collapse on skewed
    labels, MCC ∈ [−1, 1] only rewards doing well on EVERY class —
    Chicco & Jurman 2020's case for it as the default single metric).
    One row: ``n / mcc`` with
    ``mcc = (N·Σc_kk − Σ t_k·p_k) / (√(N² − Σp_k²)·√(N² − Σt_k²))``
    over truth marginals t and prediction marginals p.

    Same numerator as :func:`~goetl_spark.quality.cohens_kappa`
    (agreement beyond chance), different normalizer — kappa grades
    RATERS sharing a label space, MCC grades a PREDICTOR against
    truth. NULL labels/predictions form their own class (null-safe
    diagonal); a constant truth or constant prediction yields NULL
    (a zero-variance side has no correlation to report, the
    single-class-AUC convention). Empty input → empty frame.

    Determinism: ONE fact pass into the classes²-bounded confusion
    table, collected (the bounded-collect pattern); the three
    assembled integers are exact in arbitrary-precision Python and
    the final chain is num/(√d1·√d2) on their double casts — every
    cast correctly rounded while the values sit inside 2⁵³, i.e.
    bit-exact oracle parity for N ≲ 9e7 (beyond, correct to the last
    ulp; within-Spark reproducibility unconditional).

    Scale shape: one partial-aggregated fact pass, a classes²-row
    collect, nothing else."""
    a, b = F.col(label_col), F.col(pred_col)
    cm = (df.groupBy(a.alias("__a"), b.alias("__b"))
          .agg(F.count(F.lit(1)).alias("__n"))
          .collect())
    spark = df.sparkSession
    schema = "n long, mcc double"
    if not cm:
        return spark.createDataFrame([], schema)
    n = sum(int(r["__n"]) for r in cm)
    diag = sum(int(r["__n"]) for r in cm
               if (r["__a"] is None and r["__b"] is None)
               or (r["__a"] is not None and r["__a"] == r["__b"]))
    t_m: dict = {}
    p_m: dict = {}
    for r in cm:
        t_m[r["__a"]] = t_m.get(r["__a"], 0) + int(r["__n"])
        p_m[r["__b"]] = p_m.get(r["__b"], 0) + int(r["__n"])
    num = n * diag - sum(t_m[k] * p_m.get(k, 0) for k in t_m)
    d1 = n * n - sum(v * v for v in p_m.values())
    d2 = n * n - sum(v * v for v in t_m.values())
    if d1 == 0 or d2 == 0:
        mcc = None
    else:
        import math
        mcc = float(num) / (math.sqrt(float(d1)) * math.sqrt(float(d2)))
    return spark.createDataFrame([(n, mcc)], schema)
