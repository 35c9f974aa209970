"""sf0.001 oracle-parity smoke — the driver's t2 gate in miniature,
reusing the checker from tools/parity.py."""

from __future__ import annotations

import __spark_entry__ as entrymod
from tools.parity import compare

from conftest import SF_DIR

# The end-to-end chain: if these agree with DuckDB, the intermediate
# queries they compose (clean/tokens/vocab/model) are exercised too.
SMOKE_QUERIES = ["nb_corpus_stats", "nb_model", "nb_confusion", "nb_accuracy"]


def test_oracle_parity_smoke(spark, duck):
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = {}
    for name in SMOKE_QUERIES:
        df = queries[name](spark, SF_DIR)
        res = duck.execute(oracles[name])
        o_cols = [d[0] for d in res.description]
        o_rows = res.fetchall()
        errs = compare(name, df, o_rows, o_cols)
        if errs:
            failures[name] = errs
    assert not failures, failures


def test_every_query_has_entry_or_rows_only(spark):
    """Every oracle key must correspond to a declared query."""
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert o <= q, f"oracles without queries: {o - q}"


def test_entry_smoke(spark):
    rows = entrymod.entry(spark).collect()
    assert len(rows) >= 1
