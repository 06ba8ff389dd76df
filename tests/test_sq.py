"""Scalar quantization (SQ8) ANN family — operators/similarity.py.

Beyond-reference north-star surface (BASELINE.json): faiss-style SQ —
per-dimension trained bounds, uint8-level codes (4x shrink vs float32),
symmetric integer-dot search (value-exact, q179's oracle) and asymmetric
float search (ADC, recall-floor-pinned here).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from goetl_spark.operators.similarity import (
    knn_sq,
    knn_sq_adc,
    sq_encode,
    train_sq_bounds,
)

SF = "/root/testdata/sf0.001"


def test_train_sq_bounds(spark):
    df = spark.createDataFrame(
        [(1, [0.0, -2.0]), (2, [4.0, 6.0]), (3, [2.0, 1.0])],
        "vec_id long, embedding array<float>")
    mins, maxs = train_sq_bounds(df)
    assert mins == [0.0, -2.0]
    assert maxs == [4.0, 6.0]


def test_sq_encode_formula_and_clamp(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.5, 1.0]),   # exact endpoints + midpoint
         (2, [-1.0, 2.0, 7.0]),  # out-of-range both sides -> clamp
         (3, [0.25, 0.25, 7.0])],
        "vec_id long, embedding array<float>")
    codes = {r["vec_id"]: r["sq_codes"] for r in sq_encode(
        df, mins=[0.0, 0.0, 0.0], maxs=[1.0, 1.0, 7.0]).collect()}
    # floor(x*255 + 0.5): 0 -> 0, 0.5 -> 128, 1.0 -> 255
    assert codes[1] == [0, 128, 36]          # 1.0/7*255+0.5 = 36.9 -> 36
    assert codes[2] == [0, 255, 255]         # clamped low / clamped high
    assert codes[3][0] == 64                 # 0.25*255+0.5 = 64.25 -> 64


def test_sq_encode_constant_dim_is_zero(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 1.0]), (2, [3.0, 2.0])],
        "vec_id long, embedding array<float>")
    mins, maxs = train_sq_bounds(df)
    assert mins[0] == maxs[0] == 3.0
    for r in sq_encode(df, mins, maxs).collect():
        assert r["sq_codes"][0] == 0


def test_knn_sq_matches_numpy_reference(spark):
    """Symmetric integer search == a numpy replay of the same codes."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet").limit(60)
    mins, maxs = train_sq_bounds(e)
    codes = sq_encode(e, mins, maxs)
    qpd = codes.filter("vec_id < 3").toPandas()
    got = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["score"])
           for r in knn_sq(codes, qpd, k=4).collect()}

    cpd = codes.toPandas()
    C = np.stack(cpd["sq_codes"].to_numpy()).astype(np.int64)
    ids = cpd["vec_id"].to_numpy()
    for _, qrow in qpd.iterrows():
        q = np.asarray(qrow["sq_codes"], dtype=np.int64)
        scores = C @ q
        order = sorted(
            [(int(s), int(i)) for s, i in zip(scores, ids) if i != qrow["vec_id"]],
            key=lambda t: (-t[0], t[1]))
        for rank, (s, i) in enumerate(order[:4], start=1):
            assert got[(qrow["vec_id"], rank)] == (i, s)


def test_knn_sq_adc_exact_on_grid(spark):
    """Vectors already at quantization grid points dequantize losslessly,
    so ADC scores equal the true float dot product exactly."""
    # grid for bounds [0, 2.55] at 255 levels: step 0.01
    rows = [(1, [0.00, 2.55]), (2, [2.55, 0.00]), (3, [1.00, 1.00]),
            (4, [0.50, 2.00])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    mins, maxs = [0.0, 0.0], [2.55, 2.55]
    codes = sq_encode(df, mins, maxs)
    qpd = pd.DataFrame({"vec_id": [1], "embedding": [[1.0, 2.0]]})
    out = {r["rank"]: (r["neighbor_id"], r["score"])
           for r in knn_sq_adc(codes, qpd, mins, maxs, k=3).collect()}
    # true dots of [1,2] with rows 2,3,4: 2.55, 3.0, 4.5
    assert out[1][0] == 4 and abs(out[1][1] - 4.5) < 1e-9
    assert out[2][0] == 3 and abs(out[2][1] - 3.0) < 1e-9
    assert out[3][0] == 2 and abs(out[3][1] - 2.55) < 1e-9


def test_knn_sq_adc_recall_floor_on_embeddings(spark):
    """ADC@10 vs exact float-dot top-10 on real embeddings: 255 levels
    keeps quantization error tiny -> recall well above 0.9."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    mins, maxs = train_sq_bounds(e)
    codes = sq_encode(e, mins, maxs)
    qpd = e.filter("vec_id < 10").toPandas()
    got = (knn_sq_adc(codes, qpd, mins, maxs, k=10)
           .toPandas().groupby("query_id")["neighbor_id"].apply(set))

    epd = e.toPandas()
    X = np.stack(epd["embedding"].to_numpy()).astype(np.float64)
    ids = epd["vec_id"].to_numpy()
    hits = total = 0
    for _, qrow in qpd.iterrows():
        q = np.asarray(qrow["embedding"], dtype=np.float64)
        scores = X @ q
        mask = ids != qrow["vec_id"]
        order = sorted(zip(-scores[mask], ids[mask]))
        truth = {int(i) for _, i in order[:10]}
        hits += len(truth & got[qrow["vec_id"]])
        total += 10
    assert hits / total >= 0.9
