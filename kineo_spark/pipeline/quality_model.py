"""Learned quality classifier: hashed n-gram bag-of-words logistic
regression (the fastText-style model behind GPT-3/LLaMA-era "looks
like wiki/books" quality filters; Brown et al. 2020 Appendix A).

Idiomatic Spark ML: HashingTF (feature hashing, no vocabulary state)
→ LogisticRegression; both distribute training over the corpus and
score in one pass. At 100 TB the scoring path is the whole job: a
broadcast coefficient vector and one scan — the trained model is a
few MB regardless of corpus size, and training typically runs on a
small labeled sample anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kineo_spark.pipeline.text import tokens


def _featurize(df: DataFrame, text_col: str, n_features: int):
    from pyspark.ml.feature import HashingTF

    with_toks = df.withColumn(
        "__toks",
        F.concat(
            tokens(F.lower(F.col(text_col))),
            F.transform(  # bigram features, fastText-style
                F.sequence(
                    F.lit(0),
                    F.greatest(F.size(tokens(F.col(text_col))) - 2, F.lit(-1)),
                ),
                lambda i: F.concat_ws(
                    " ",
                    tokens(F.lower(F.col(text_col)))[i],
                    tokens(F.lower(F.col(text_col)))[i + 1],
                ),
            ),
        ),
    )
    tf = HashingTF(inputCol="__toks", outputCol="__feat", numFeatures=n_features)
    return tf.transform(with_toks).drop("__toks")


def train_quality_classifier(
    df: DataFrame,
    label: "F.Column",
    text_col: str = "text",
    n_features: int = 1 << 14,
    max_iter: int = 30,
    reg: float = 1e-4,
):
    """Fit the classifier on rows labeled by the ``label`` boolean
    Column (1 = high quality / target domain). Returns the fitted
    LogisticRegressionModel."""
    from pyspark.ml.classification import LogisticRegression

    feat = _featurize(
        df.withColumn("__label", label.cast("double")), text_col, n_features
    )
    lr = LogisticRegression(
        featuresCol="__feat", labelCol="__label",
        maxIter=max_iter, regParam=reg,
    )
    model = lr.fit(feat)
    # Drop the training summary: it captures the SparkSession, and the
    # scoring UDF serializes the whole model into every task — which
    # fails with NotSerializableException(ObservationManager) in any
    # session where a Dataset Observation was ever registered (the
    # manager field is lazily created and not transient). The summary
    # is training-time metadata a scorer never needs.
    try:
        from pyspark import SparkContext
        jvm = SparkContext._active_spark_context._jvm
        none = jvm.scala.__getattr__("None$").__getattr__("MODULE$")
        model._java_obj.setSummary(none)
    except Exception:
        pass  # future Spark renames: keep the model usable regardless
    return model


def load_frozen() -> dict:
    """Load the checked-in frozen classifier (trained offline by
    tools/freeze_quality_model.py — deterministic IRLS, coefficients
    in exact integer micro-units)."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "quality_coefs.json")
    with open(path) as f:
        return json.load(f)


def score_quality_frozen(
    spark,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    coefs: dict | None = None,
) -> DataFrame:
    """Score documents with the frozen classifier — the 100 TB path:
    one scan, a broadcast join against the (≤n_features)-row
    coefficient table, and exact int64 arithmetic throughout.

    Feature hashing is md5-hex-prefix mod n_features, which DuckDB
    computes identically, and the logit is intercept_micro +
    SUM(cnt * coef_micro) in int64 — no floats, so the oracle hash
    comparison cannot be perturbed by summation order.

    Returns (id, logit_micro BIGINT, predicted INT).
    """
    if coefs is None:
        coefs = load_frozen()
    n = coefs["n_features"]
    intercept = int(coefs["intercept_micro"])
    pairs = [(i, int(c)) for i, c in enumerate(coefs["coef_micro"]) if c]
    coef_df = spark.createDataFrame(pairs, "idx BIGINT, coef_micro BIGINT")

    toked = df.select(
        F.col(id_col).alias("id"),
        tokens(F.lower(F.col(text_col))).alias("__w"),
    )
    unis = toked.select("id", F.explode("__w").alias("term"))
    bis = toked.select(
        "id",
        F.explode(
            F.when(
                F.size("__w") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("__w") - 2),
                    lambda i: F.concat_ws(" ", F.col("__w")[i],
                                          F.col("__w")[i + 1]),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("term"),
    )
    terms = unis.unionByName(bis)
    idx = (F.conv(F.substring(F.md5("term"), 1, 8), 16, 10)
           .cast("long") % n).alias("idx")
    counts = terms.select("id", idx).groupBy("id", "idx").agg(
        F.count(F.lit(1)).alias("cnt"))
    contrib = (
        counts.join(F.broadcast(coef_df), "idx")
        .groupBy("id")
        .agg(F.sum(F.col("cnt") * F.col("coef_micro")).alias("__contrib"))
    )
    logit = (F.lit(intercept).cast("long")
             + F.coalesce(F.col("__contrib"), F.lit(0).cast("long")))
    return (
        df.select(F.col(id_col).alias("id"))
        .join(contrib, "id", "left")
        .select(
            "id",
            logit.alias("logit_micro"),
            (logit > 0).cast("int").alias("predicted"),
        )
    )


def frozen_oracle_sql(coefs: dict | None = None) -> str:
    """The DuckDB twin of score_quality_frozen, with the frozen
    coefficients embedded as a VALUES list — same tokenization, same
    md5 hashing, same exact int64 arithmetic."""
    if coefs is None:
        coefs = load_frozen()
    n = coefs["n_features"]
    intercept = int(coefs["intercept_micro"])
    values = ", ".join(
        f"({i}, {int(c)})" for i, c in enumerate(coefs["coef_micro"]) if c
    )
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                     x -> len(x) > 0) AS w
  FROM documents),
terms AS (
  SELECT doc_id, unnest(w) AS term FROM toks
  UNION ALL
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                               i -> w[i] || ' ' || w[i + 1])) AS term
  FROM toks),
cnts AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(term), 1, 8)) AS BIGINT) % {n} AS idx,
         COUNT(*) AS cnt
  FROM terms GROUP BY doc_id, idx),
coefs(idx, coef_micro) AS (VALUES {values}),
contrib AS (
  SELECT doc_id, SUM(cnt * coef_micro) AS c
  FROM cnts JOIN coefs USING (idx) GROUP BY doc_id)
SELECT d.doc_id AS id,
       CAST({intercept} + COALESCE(c, 0) AS BIGINT) AS logit_micro,
       CAST(CASE WHEN {intercept} + COALESCE(c, 0) > 0
                 THEN 1 ELSE 0 END AS INT) AS predicted
FROM documents d LEFT JOIN contrib ON d.doc_id = contrib.doc_id
ORDER BY id
"""


def score_quality(
    model,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 1 << 14,
) -> DataFrame:
    """Score documents with a trained classifier. Returns
    (id, p_good, predicted) — P(label=1) rounded to 6 decimals."""
    from pyspark.ml.functions import vector_to_array

    feat = _featurize(df, text_col, n_features)
    out = model.transform(feat)
    return out.select(
        F.col(id_col).alias("id"),
        F.round(vector_to_array("probability")[1], 6).alias("p_good"),
        F.col("prediction").cast("int").alias("predicted"),
    )
