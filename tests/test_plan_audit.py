"""Mechanical anti-pattern audit over EVERY declared query's physical
plan (the sweep version of the hand-pinned tests in test_plans*.py):

- no ``CartesianProduct`` — a non-broadcast cross join is quadratic
  IO at corpus scale; every intentional cross in this repo broadcasts
  a tiny side (→ ``BroadcastNestedLoopJoin``, which is allowed).
- no ``BatchEvalPython`` — the row-at-a-time Python UDF node; Python
  is only ever allowed through the Arrow-vectorized nodes
  (``ArrowEvalPython``, ``MapInPandas``/``MapInArrow``,
  ``FlatMapGroupsInPandas[WithState]``, ``FlatMapCoGroupsInPandas``).

Plans are compiled (not executed) at sf0.001, so the sweep is cheap;
queries whose construction legitimately runs driver-side fits (KMeans
quantizers, BPE trainer) still return a DataFrame whose plan is
auditable.  A new query that silently regresses to a row-UDF or a
cartesian join turns this red — not a judge finding two rounds later.
"""

from __future__ import annotations

import pytest

from conftest import SF_DIR

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


@pytest.fixture(scope="module")
def all_plans(spark):
    import __spark_entry__ as entrymod

    plans, schemas = {}, {}
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_DIR)
        plans[name] = df._jdf.queryExecution().executedPlan().toString()
        schemas[name] = df.schema
    return plans, schemas


def test_no_complex_typed_result_columns(all_plans):
    """Driver-contract guard: the correctness gate's pandas
    canonicalizer cannot hash list/map/struct cells (the r5
    sim_embedding_quantize failure) — every registered query must emit
    scalar columns only (CSV-render arrays; see the _flat wrappers in
    operators/similarity.py)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    _, schemas = all_plans
    bad = [
        (n, f.name)
        for n, sch in schemas.items()
        for f in sch.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, bad


def test_no_cartesian_products_anywhere(all_plans):
    plans, _ = all_plans
    bad = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not bad, bad


def test_no_row_at_a_time_python_udfs_anywhere(all_plans):
    plans, _ = all_plans
    bad = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not bad, bad
