"""Unit tests for the training-data pipeline operators (operators/pipeline.py):
connected-components semantics on a hand-built graph, chunking reassembly,
split determinism. Oracle parity for the same ops is covered by
test_oracle_parity.py via the registry."""

import pytest
from pyspark.sql import functions as F

from hadoop_distexec_spark.operators.pipeline import (
    connected_components,
    q_doc_chunks,
    q_split_train_test,
)
from tests.conftest import SF_SMALL


def test_connected_components_graph(spark):
    # chain 1-2-3, pair 5-6, singleton 7; expect min-label components
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 5, 6, 7)], ["doc_id"])
    edges = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], ["doc_a", "doc_b"])
    got = {r.doc_id: r.component for r in connected_components(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 7: 7}


def test_connected_components_long_chain(spark):
    # a 12-node chain exercises multi-round propagation (diameter > 1 round)
    n = 12
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["doc_a", "doc_b"])
    comps = connected_components(nodes, edges).select("component").distinct().collect()
    assert [r.component for r in comps] == [0]


def test_chunks_reassemble(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select("doc_id", "text")
    rebuilt = (
        q_doc_chunks(spark, SF_SMALL)
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "", F.transform(F.array_sort(F.collect_list(F.struct("chunk_id", "chunk"))), lambda s: s["chunk"])
            ).alias("rebuilt")
        )
    )
    bad = (
        docs.join(rebuilt, "doc_id", "left")
        .filter(F.length("text") > 0)
        .filter((F.col("rebuilt").isNull()) | (F.col("rebuilt") != F.col("text")))
        .count()
    )
    assert bad == 0


def test_split_deterministic_and_both_sides(spark):
    a = q_split_train_test(spark, SF_SMALL).toPandas().sort_values("doc_id", ignore_index=True)
    b = q_split_train_test(spark, SF_SMALL).toPandas().sort_values("doc_id", ignore_index=True)
    assert a.equals(b)
    counts = a["split"].value_counts()
    assert counts.get("train", 0) > 0 and counts.get("test", 0) > 0
    # hash split: ratio should be loosely near 26/256 for the test side
    frac = counts["test"] / len(a)
    assert 0.02 < frac < 0.25
