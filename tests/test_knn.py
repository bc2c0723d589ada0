"""KNN outlier operator vs a numpy brute-force oracle (SURVEY §2.4 A14)."""

import numpy as np
import pandas as pd
import pytest

from packs_spark.ml.knn import knn_normality, knn_scores


def _oracle_kth(X, fit, k):
    d2 = np.zeros((len(X), len(fit)))
    for j in range(X.shape[1]):
        diff = X[:, j][:, None] - fit[:, j][None, :]
        d2 += diff * diff
    return np.sqrt(np.sort(d2, axis=1)[:, k - 1])


def test_knn_scores_match_bruteforce(spark):
    rng = np.random.default_rng(7)
    n = 400
    pdf = pd.DataFrame(
        {
            "id": np.arange(n),
            "x": rng.normal(0, 1, n),
            "y": rng.normal(5, 2, n),
        }
    )
    # plant outliers
    pdf.loc[5, ["x", "y"]] = [40.0, -40.0]
    pdf.loc[17, ["x", "y"]] = [-35.0, 60.0]
    df = spark.createDataFrame(pdf)

    scored = (
        knn_scores(df, ["x", "y"], ["id"], k=5, fit_cap=100)
        .select("id", "knn_score")
        .toPandas()
        .sort_values("id")
    )
    fit = pdf.sort_values("id").head(100)[["x", "y"]].to_numpy()
    want = _oracle_kth(pdf[["x", "y"]].to_numpy(), fit, k=5)
    assert np.allclose(scored["knn_score"].to_numpy(), want, atol=1e-9)


def test_knn_normality_flags_planted_outliers(spark):
    rng = np.random.default_rng(11)
    n = 300
    pdf = pd.DataFrame({"id": np.arange(n), "v": rng.normal(100, 5, n)})
    pdf.loc[3, "v"] = 10_000.0  # the max-score point defines the scale
    df = spark.createDataFrame(pdf)
    row = knn_normality(df, ["v"], ["id"], k=5, fit_cap=100).collect()[0]
    assert row.n_rows == n
    # inlier(x) = 1 - s/(max+eps): only points near the extreme get < 0.5
    assert row.n_outliers == 1
    assert 0.9 < row.normality_score <= 1.0


def test_knn_mean_imputation_and_guard(spark):
    pdf = pd.DataFrame({"id": range(10), "v": [1.0, None] * 5})
    df = spark.createDataFrame(pdf)
    scored = knn_scores(df, ["v"], ["id"], k=2, fit_cap=10).toPandas()
    assert scored["v"].notna().all()  # nulls mean-imputed (reference :183)

    tiny = spark.createDataFrame(pd.DataFrame({"id": [1, 2], "v": [1.0, 2.0]}))
    with pytest.raises(ValueError, match="KNN needs more than"):
        knn_scores(tiny, ["v"], ["id"], k=5, fit_cap=10)


def test_chunked_kth_nn_identical_to_full_matrix_at_reference_cap():
    """fit_cap=100_000 is the reference's own MAX_ROWS_FOR_FULL_KNN; the
    chunked running-top-k path must be bounded-memory AND bit-identical
    to the naive full len(batch)x len(fit) matrix."""
    from packs_spark.ml.knn import _kth_nn_dist_np

    rng = np.random.default_rng(7)
    Y = rng.normal(size=(100_000, 3)) * np.array([1e5, 1.0, 1e-2])
    X = rng.normal(size=(50, 3)) * np.array([1e5, 1.0, 1e-2])
    k = 5

    got = _kth_nn_dist_np(X, Y, k)

    d2 = np.zeros((len(X), len(Y)))
    for j in range(X.shape[1]):
        diff = X[:, j][:, None] - Y[:, j][None, :]
        d2 += diff * diff
    expected = np.sqrt(np.partition(d2, k - 1, axis=1)[:, k - 1])

    np.testing.assert_array_equal(got, expected)


def test_knn_integer_features_not_truncated(spark):
    """Integer feature columns must be cast to double before mean
    imputation — na.fill with a float mean on an int column truncates."""
    pdf = pd.DataFrame(
        {
            "id": range(12),
            "x": [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, None, None],
        }
    )
    df = spark.createDataFrame(pdf.astype({"x": "Int64"}))
    scored = knn_scores(df, ["x"], ["id"], k=2, fit_cap=100)
    vals = {r.id: r.x for r in scored.collect()}
    mean = sum(range(1, 11)) / 10.0  # 5.5 — truncation would give 5.0
    assert vals[10] == mean and vals[11] == mean
