"""Query registry: every engine operator exposed as a (spark, sf_dir) ->
DataFrame callable, optionally paired with a DuckDB oracle SQL twin.

The driver contract (/root/repo/__spark_entry__.py) consumes this via
``all_queries()`` and ``oracle_sqls()``. Oracle SQL must produce the same
column names and (bit-deterministic) values as the Spark query; see
``hadoop_distexec_spark.functions.numeric`` for the determinism rules
(decimal-cast sums, epoch bigints, explicit tiebreakers).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    qid: str
    fn: QueryFn
    oracle: Optional[str]  # DuckDB SQL; None => rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(qid: str, oracle: Optional[str] = None, doc: str = ""):
    """Decorator registering a query operator under ``qid``."""

    def deco(fn: QueryFn) -> QueryFn:
        if qid in _REGISTRY:
            raise ValueError(f"duplicate query id {qid!r}")
        _REGISTRY[qid] = QuerySpec(qid, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load_modules() -> None:
    # Import for side effect: each module registers its queries.
    from hadoop_distexec_spark.operators import (  # noqa: F401
        llmops,
        multimodal,
        pipeline,
        relational,
        relational_ext,
        skew,
    )
    from hadoop_distexec_spark.plans import manifest_plan  # noqa: F401
    from hadoop_distexec_spark.pipe import queries as pipe_queries  # noqa: F401
    from hadoop_distexec_spark.streaming import windows  # noqa: F401


def specs() -> dict[str, QuerySpec]:
    _load_modules()
    return dict(_REGISTRY)


def all_queries() -> dict[str, QueryFn]:
    return {qid: s.fn for qid, s in specs().items()}


def oracle_sqls() -> dict[str, str]:
    return {qid: s.oracle for qid, s in specs().items() if s.oracle is not None}
