"""Linear text-quality classifier (the fastText-style supervised filter
of CCNet / RefinedWeb-class pipelines): hashed bag-of-tokens features →
logistic regression. Training uses MLlib (HashingTF + LogisticRegression,
one fit over a bounded labeled set — the model is the small artifact);
SCORING — the part that touches the 100 TB corpus — is pure JVM
expressions: the weight vector rides a broadcast 1-row array frame and
each document's logit is a per-token ``element_at`` fold, zero shuffle,
zero Python.

Hash families (the repo-wide convention):

- ``"murmur3"`` — ``F.hash`` = Spark SQL's Murmur3_x86_32 seed 42
  (32-bit codegen hash; note MLlib's ``HashingTF`` hashes with
  ``hashUnsafeBytes2`` and does NOT match — training therefore builds
  features from this module's own bucket expression, never HashingTF);
- ``"xxhash64"`` — cheapest, for models trained elsewhere against the
  same convention;
- ``"md5_32"`` — engine-neutral, for cross-engine value verification
  (the correctness-gate family).
"""

from __future__ import annotations

from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from tempo_spark.pipeline.text import tokens_col


def _bucket(tok: Column, n_features: int, hash_family: str) -> Column:
    if hash_family == "murmur3":
        # nonNegativeMod(murmur3, n) — bit-compatible with HashingTF's
        # indexOf (pmod of a possibly-negative int32)
        return F.pmod(F.hash(tok), F.lit(n_features))
    if hash_family == "xxhash64":
        return F.pmod(F.xxhash64(tok), F.lit(n_features))
    if hash_family == "md5_32":
        from tempo_spark.pipeline.dedup import md5_32

        return F.pmod(md5_32(tok), F.lit(n_features))
    raise ValueError(
        f"unknown hash_family {hash_family!r}; use murmur3/xxhash64/md5_32"
    )


class LinearTextModel:
    """Frozen linear model: ``logit(doc) = Σ_tokens w[bucket(token)] +
    intercept`` (bag-of-tokens with counts — each occurrence contributes
    its bucket weight once, which IS the count·weight dot product)."""

    def __init__(
        self,
        weights: list,
        intercept: float,
        hash_family: str = "murmur3",
    ):
        if not weights:
            raise ValueError("LinearTextModel needs a non-empty weight vector")
        self.weights = [float(w) for w in weights]
        self.intercept = float(intercept)
        self.n_features = len(self.weights)
        self.hash_family = hash_family

    def score(
        self,
        df: DataFrame,
        text_col: str = "text",
        out_logit: str = "clf_logit",
        out_prob: Optional[str] = "clf_prob",
    ) -> DataFrame:
        """Append the logit (and sigmoid probability unless
        ``out_prob=None``). The weight vector is DATA on a broadcast
        1-row frame — invisible to the expression tree, so the plan stays
        flat in ``n_features`` (the ASSIGN_LITERAL_MAX lesson: 2¹⁸ floats
        as literals would melt the driver); the per-token lookup is an
        O(1) ``element_at``. Null text scores NULL. Zero shuffle."""
        wc = "__clf_w"
        spark = df.sparkSession
        wframe = spark.createDataFrame(
            [(self.weights,)], f"{wc} array<double>"
        )
        toks = tokens_col(F.col(text_col))
        n = self.n_features
        fam = self.hash_family
        logit = F.aggregate(
            F.transform(
                toks,
                lambda t: F.element_at(
                    F.col(wc), _bucket(t, n, fam).cast("int") + 1
                ),
            ),
            F.lit(float(self.intercept)),
            lambda acc, x: acc + x,
        )
        out = (
            df.crossJoin(F.broadcast(wframe))
            .withColumn(
                out_logit,
                F.when(F.col(text_col).isNotNull(), logit),
            )
            .drop(wc)
        )
        if out_prob is not None:
            out = out.withColumn(
                out_prob, F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col(out_logit)))
            )
        return out

    # ---------------------------------------------------------- persist

    def save(self, spark, path: str, mode: str = "overwrite") -> None:
        spark.createDataFrame(
            [(self.weights, self.intercept, self.hash_family)],
            "weights array<double>, intercept double, hash_family string",
        ).coalesce(1).write.mode(mode).parquet(path)

    @staticmethod
    def load(spark, path: str) -> "LinearTextModel":
        r = spark.read.parquet(path).collect()[0]
        return LinearTextModel(list(r.weights), r.intercept, r.hash_family)


def train_linear_classifier(
    df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n_features: int = 1 << 15,
    reg_param: float = 0.0,
    max_iter: int = 50,
    hash_family: str = "murmur3",
) -> LinearTextModel:
    """Fit the logistic model on a LABELED frame (``label_col`` ∈ {0, 1}
    — e.g. curated-positive vs random-crawl-negative, the CCNet recipe).

    Features are token counts over the SAME ``_bucket`` expression the
    returned model scores with, so training-time and scoring-time
    buckets cannot drift (MLlib's own ``HashingTF`` hashes with
    ``hashUnsafeBytes2`` — NOT the SQL ``hash()`` — so its indices are
    not expression-replayable; measured mismatch, hence the shared
    bucket). The sparse-vector build is a row UDF — acceptable here and
    only here because the labeled set is bounded by construction (you
    label thousands, not the corpus); the returned model scores the
    corpus with pure expressions, MLlib and Python never touch it."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.linalg import SparseVector, VectorUDT

    n = n_features

    @F.udf(returnType=VectorUDT())
    def to_vec(buckets):
        from collections import Counter

        c = Counter(buckets or [])
        idx = sorted(c)
        return SparseVector(n, idx, [float(c[i]) for i in idx])

    bucketed = df.where(F.col(text_col).isNotNull()).select(
        F.col(label_col).cast("double").alias("label"),
        to_vec(
            F.transform(
                tokens_col(F.col(text_col)),
                lambda t: _bucket(t, n, hash_family).cast("int"),
            )
        ).alias("__feat"),
    )
    lr = LogisticRegression(
        featuresCol="__feat", labelCol="label", regParam=reg_param,
        maxIter=max_iter, standardization=False,
    )
    model = lr.fit(bucketed)
    return LinearTextModel(
        [float(x) for x in model.coefficients.toArray()],
        float(model.intercept),
        hash_family=hash_family,
    )
