"""Unit tests for the multimodal plumbing beyond the oracle-checked
queries: resize (binary->binary, constant size) and feature extraction
(binary->vector) through mapInPandas."""

from pyspark.sql import functions as F

from hadoop_distexec_spark.operators.multimodal import extract_features, resize_image
from hadoop_distexec_spark.sources.tables import table
from tests.conftest import SF_SMALL


def _media(spark):
    return table(spark, SF_SMALL, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("content")
    )


def test_resize_constant_output_size(spark):
    out = resize_image(_media(spark), width=8, height=4)
    rows = out.select("doc_id", F.octet_length("content").alias("n"), "width", "height")
    bad = rows.filter((F.col("n") != 32) | (F.col("width") != 8) | (F.col("height") != 4)).count()
    assert bad == 0
    assert out.count() == _media(spark).count()


def test_resize_deterministic(spark):
    a = resize_image(_media(spark)).orderBy("doc_id").collect()
    b = resize_image(_media(spark)).orderBy("doc_id").collect()
    assert [bytes(r["content"]) for r in a] == [bytes(r["content"]) for r in b]


def test_features_shape_and_norm(spark):
    out = extract_features(_media(spark), dim=16)
    assert out.schema["feature"].dataType.simpleString() == "array<float>"
    sums = out.select(
        F.size("feature").alias("d"),
        F.aggregate("feature", F.lit(0.0), lambda a, v: a + v.cast("double")).alias("s"),
    )
    assert sums.filter(F.col("d") != 16).count() == 0
    # L1-normalized (fixture docs are non-empty)
    assert sums.filter(F.abs(F.col("s") - 1.0) > 1e-3).count() == 0


def test_features_feed_similarity_ops(spark):
    """The stub features must plug straight into the embedding operators'
    expected shape (vec_id, embedding array<float>)."""
    feats = extract_features(_media(spark)).selectExpr("doc_id AS vec_id", "feature AS embedding")
    n = feats.filter(F.size("embedding") == 16).count()
    assert n == feats.count() and n > 0
