"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: full KG extraction (tokenize -> broadcast-
                weight batched scoring -> canonical triple dedup) on
                /root/testdata/sf0.001.
queries()     — one entry per implemented operator (SURVEY.md §2),
                from deepref_spark.queries.REGISTRY.
oracle_sql()  — DuckDB oracles built from the same portable formulas
                (deepref_spark/portable.py); model-forward queries are
                rows-only by design.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from deepref_spark.queries import REGISTRY, oracle_sql_for  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["kg_triples_model"]["spark"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec["spark"] for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    # oracle_sql_for resolves lazily-declared oracles (callables) so
    # importing the module stays I/O-free
    return {
        name: oracle_sql_for(name)
        for name, spec in REGISTRY.items()
        if spec["oracle"] is not None
    }
