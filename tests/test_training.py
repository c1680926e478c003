"""Unit tests for operators/training.py — full-batch logistic GD and
the tie-aware Mann-Whitney ROC-AUC. Catalog-level oracle parity for
train_logreg_gd / score_auc_eval is covered by test_oracle_parity."""

import math

from pyspark.sql import functions as F

from vul_dbgen_spark.operators.training import (
    LOGREG_FEATURE_SQL,
    logreg_features,
    logreg_train_gd,
    logreg_train_report,
    roc_auc,
)


def _scored(spark, rows):
    return spark.createDataFrame(rows, "score double, y double")


def test_roc_auc_hand_case_with_tie(spark):
    # ranks: 0.1→1, 0.8→(2,3) avg 2.5, 0.9→4; pos rank sum 6.5
    # AUC = (6.5 - 2*3/2) / (2*2) = 0.875; pairwise check: 3 wins +
    # 1 tie (counted 1/2) over 4 pos-neg pairs = 0.875
    df = _scored(
        spark, [(0.9, 1.0), (0.8, 0.0), (0.8, 1.0), (0.1, 0.0)]
    )
    row = roc_auc(df).first()
    assert row["auc"] == 0.875
    assert row["n_pos"] == 2 and row["n_neg"] == 2


def test_roc_auc_perfect_and_inverted(spark):
    sep = _scored(spark, [(0.9, 1.0), (0.8, 1.0), (0.2, 0.0), (0.1, 0.0)])
    assert roc_auc(sep).first()["auc"] == 1.0
    inv = _scored(spark, [(0.9, 0.0), (0.8, 0.0), (0.2, 1.0), (0.1, 1.0)])
    assert roc_auc(inv).first()["auc"] == 0.0


def test_roc_auc_all_tied_is_half(spark):
    df = _scored(spark, [(0.5, 1.0), (0.5, 0.0), (0.5, 1.0), (0.5, 0.0)])
    assert roc_auc(df).first()["auc"] == 0.5


def _toy_feats(spark):
    # y perfectly separable on x1; x2 is noise-ish
    rows = [
        (1.0, 1.0, 0.2), (1.0, 0.9, 0.1), (1.0, 0.8, 0.3),
        (0.0, -1.0, 0.2), (0.0, -0.9, 0.3), (0.0, -0.8, 0.1),
    ]
    return spark.createDataFrame(rows, "y double, x1 double, x2 double")


def test_logreg_gd_descends_and_learns_sign(spark):
    feats = _toy_feats(spark)

    def logloss(w):
        z = " + ".join([repr(w[0]), f"{w[1]!r} * x1", f"{w[2]!r} * x2"])
        s = f"(1.0 / (1.0 + exp(-({z}))))"
        return feats.agg(
            F.expr(f"avg(-(y * ln({s}) + (1.0 - y) * ln(1.0 - {s})))")
        ).first()[0]

    losses = [logloss([0.0, 0.0, 0.0])]
    for it in (1, 2, 4):
        w = logreg_train_gd(feats, ["x1", "x2"], lr=0.5, iters=it)
        losses.append(logloss(w))
    assert math.isclose(losses[0], math.log(2.0), rel_tol=1e-12)
    assert all(b < a for a, b in zip(losses, losses[1:])), losses
    # the separating feature dominates and points the right way
    assert w[1] > 0 and w[1] > abs(w[2])


def test_logreg_gd_rerun_stable(spark):
    feats = _toy_feats(spark)
    w1 = logreg_train_gd(feats, ["x1", "x2"], lr=0.5, iters=3)
    w2 = logreg_train_gd(feats, ["x1", "x2"], lr=0.5, iters=3)
    assert w1 == w2


def test_hashed_logreg_closes_the_loop(spark, sf_dir):
    """Train → infer → eval: the trained hashed classifier must beat
    the frozen md5 stand-in's AUC on the same label by a wide margin
    (the stand-in anti-correlates at ≈0.36; trained lands ≈0.9+)."""
    from vul_dbgen_spark.functions.text import (
        hashed_linear_score,
        hashed_scorer_weights,
    )
    from vul_dbgen_spark.functions import text as TX
    from vul_dbgen_spark.operators.training import (
        LOGREG_LABEL_SQL,
        _fold_sigmoid,
        _with_weights,
        hashed_logreg_train,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.select(
        TX.tokens(F.col("text")).alias("toks"),
        F.expr(LOGREG_LABEL_SQL).alias("y"),
    ).localCheckpoint()
    b, w = hashed_logreg_train(base)
    s = _fold_sigmoid(F.col("wv"), F.col("b"), F.col("toks"), 1024)
    trained = roc_auc(
        _with_weights(base, w, b).select(
            F.round(s, 6).alias("score"), "y"
        )
    ).first()["auc"]
    standin = roc_auc(
        base.select(
            F.round(
                hashed_linear_score(
                    F.col("toks"), hashed_scorer_weights()
                ),
                6,
            ).alias("score"),
            "y",
        )
    ).first()["auc"]
    assert trained > 0.85, trained
    assert trained > standin + 0.3, (trained, standin)


def test_trained_weights_drop_into_serving_fold(spark, sf_dir):
    """The trained artifact must be a bit-exact drop-in for the literal
    serving fold: scoring with hashed_linear_score(trained w as plan
    literals) equals scoring via the 1-row broadcast column path —
    same left fold, same floats, no rounding needed."""
    from vul_dbgen_spark.functions.text import hashed_linear_score
    from vul_dbgen_spark.functions import text as TX
    from vul_dbgen_spark.operators.training import (
        LOGREG_LABEL_SQL,
        _fold_sigmoid,
        _with_weights,
        hashed_logreg_train,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    base = docs.select(
        F.col("doc_id"),
        TX.tokens(F.col("text")).alias("toks"),
        F.expr(LOGREG_LABEL_SQL).alias("y"),
    ).localCheckpoint()
    b, w = hashed_logreg_train(
        base.select("toks", "y"), iters=2
    )
    via_literal = base.select(
        "doc_id", hashed_linear_score(F.col("toks"), w, b).alias("s")
    )
    via_column = _with_weights(base, w, b).select(
        "doc_id",
        _fold_sigmoid(
            F.col("wv"), F.col("b"), F.col("toks"), 1024
        ).alias("s"),
    )
    assert via_literal.exceptAll(via_column).count() == 0
    assert via_column.exceptAll(via_literal).count() == 0


def test_hashed_logreg_rerun_stable(spark, sf_dir):
    from vul_dbgen_spark.functions import text as TX
    from vul_dbgen_spark.operators.training import (
        LOGREG_LABEL_SQL,
        hashed_logreg_train,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.select(
        TX.tokens(F.col("text")).alias("toks"),
        F.expr(LOGREG_LABEL_SQL).alias("y"),
    )
    b1, w1 = hashed_logreg_train(base, iters=2)
    b2, w2 = hashed_logreg_train(base, iters=2)
    assert b1 == b2 and w1 == w2


def test_train_report_shape_on_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = logreg_features(docs)
    rep = logreg_train_report(
        spark, feats, list(LOGREG_FEATURE_SQL)
    ).toPandas()
    assert list(rep.columns) == ["feature", "weight"]
    got = set(rep["feature"])
    assert got == {"bias", "train_logloss", *LOGREG_FEATURE_SQL}
    logloss = float(
        rep.loc[rep["feature"] == "train_logloss", "weight"].iloc[0]
    )
    # learning happened: below the w=0 loss ln 2
    assert 0.0 < logloss < math.log(2.0)
