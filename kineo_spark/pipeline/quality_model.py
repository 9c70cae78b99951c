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
