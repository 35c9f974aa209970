"""Blocked fuzzy-join and curriculum-staging semantics on crafted
documents (operators/er.py, operators/pipeline.py)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.er import (
    q_er_blocks,
    q_er_fuzzy_pairs,
)
from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.pipeline import (
    q_curriculum,
)


def _write_docs(tmp_path, rows, name="docs"):
    """rows: (doc_id, text, lang, source)."""
    d = tmp_path / name
    d.mkdir()
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[2] for r in rows]),
            "source": pa.array([r[3] for r in rows]),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{d}/documents.parquet")
    return str(d)


def test_fuzzy_pairs_found_within_block_only(spark, tmp_path):
    base = "the quick brown fox jumps over the lazy dog again and again"
    typo = "the quick brown fax jumps over the lazy dog again and again"
    far = "completely different text that shares no prefix with the others"
    other_block = base * 3  # same lang, different length bucket
    sf = _write_docs(
        tmp_path,
        [
            (1, base, "en", "s0"),
            (2, typo, "en", "s0"),
            (3, far, "en", "s0"),
            (4, base, "de", "s0"),  # different lang → different block
            (5, other_block, "en", "s0"),
        ],
    )
    pairs = {(r["doc_a"], r["doc_b"]): r for r in q_er_fuzzy_pairs(spark, sf).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)]["lev"] == 1
    assert (1, 4) not in pairs  # lang block boundary respected
    assert (1, 5) not in pairs  # length block boundary respected
    assert (1, 3) not in pairs  # beyond LEV_MAX

    blocks = {
        (r["b_lang"], r["b_len"]): r for r in q_er_blocks(spark, sf).collect()
    }
    assert blocks[("en", 0)]["n_docs"] == 3
    assert blocks[("en", 0)]["n_cand_pairs"] == 3
    assert blocks[("de", 0)]["n_docs"] == 1


def test_curriculum_quartile_stages(spark, tmp_path):
    # lengths 1..8 → quartile boundaries 2.75 / 4.5 / 6.25 →
    # stages of exactly 2 docs each, ordered by length
    rows = [(i, "x" * i, "en", "s0") for i in range(1, 9)]
    sf = _write_docs(tmp_path, rows)
    out = {r["stage"]: r for r in q_curriculum(spark, sf).collect()}
    assert sorted(out) == [1, 2, 3, 4]
    assert all(out[s]["n_docs"] == 2 for s in out)
    assert out[1]["max_chars"] == 2 and out[4]["min_chars"] == 7


# --- er_entities -----------------------------------------------------

from pyspark.sql import functions as F

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.er import (
    q_er_entities,
)


def test_entities_cover_every_doc_once_with_one_canon_each(spark):
    from conftest import SF_DIR

    ent = q_er_entities(spark, SF_DIR).cache()
    try:
        docs = spark.read.parquet(SF_DIR + "/documents.parquet")
        assert ent.count() == docs.count()
        assert ent.select("doc_id").distinct().count() == docs.count()
        per = ent.groupBy("entity_id").agg(
            F.sum("is_canon").alias("n_canon")
        )
        assert per.filter(F.col("n_canon") != 1).count() == 0
    finally:
        ent.unpersist()


def test_entities_absorb_every_matched_pair(spark):
    from conftest import SF_DIR

    ent = q_er_entities(spark, SF_DIR).select("doc_id", "entity_id")
    pairs = q_er_fuzzy_pairs(spark, SF_DIR).select("doc_a", "doc_b")
    a = ent.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
        "entity_id", "ea"
    )
    b = ent.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
        "entity_id", "eb"
    )
    split = (
        pairs.join(a, "doc_a").join(b, "doc_b")
        .filter(F.col("ea") != F.col("eb"))
    )
    assert split.count() == 0, "a matched pair landed in two entities"


def test_entity_canonical_is_longest_then_lowest_id(spark):
    from conftest import SF_DIR

    ent = q_er_entities(spark, SF_DIR)
    docs = spark.read.parquet(SF_DIR + "/documents.parquet").select(
        "doc_id", "n_chars"
    )
    j = ent.join(docs, "doc_id")
    canon = j.filter(F.col("is_canon") == 1).select(
        F.col("entity_id").alias("eid"),
        F.col("n_chars").alias("canon_chars"),
        F.col("doc_id").alias("cid"),
    )
    viol = (
        j.join(canon, j.entity_id == canon.eid)
        .filter(
            (F.col("n_chars") > F.col("canon_chars"))
            | (
                (F.col("n_chars") == F.col("canon_chars"))
                & (F.col("doc_id") < F.col("cid"))
            )
        )
    )
    assert viol.count() == 0


def test_blocking_quality_bounds(spark):
    from conftest import SF_DIR
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.er import (
        q_er_blocking_quality,
    )

    r = q_er_blocking_quality(spark, SF_DIR).collect()[0]
    assert r["n_truth"] > 0
    assert 0 <= r["n_truth_blocked"] <= r["n_truth"]
    assert 0.0 <= r["completeness"] <= 1.0
    assert 0.0 <= r["reduction_ratio"] <= 1.0
    # blocking must actually block: candidate space far below quadratic
    assert r["reduction_ratio"] > 0.5


def test_survivorship_attribute_rules(spark, tmp_path):
    """Golden record per entity (r7): text provenance from the
    longest member, lang/source by majority vote with value-asc
    tie-break, correct member counts — on a planted 3-member entity
    plus a singleton."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.er import (
        q_er_survivorship,
    )

    base = "the quick brown fox jumps over the lazy dog again"
    rows = [
        # one fuzzy family: the block key includes lang, so members
        # share it by construction — the vote under test is source
        (1, base, "en", "web"),
        (2, base + " x", "en", "book"),
        (3, base + " yy", "en", "book"),
        # singleton far away
        (9, "completely different text entirely unrelated", "fr", "web"),
    ]
    sf = _write_docs(tmp_path, rows, name="surv")
    out = {
        r["entity_id"]: r for r in q_er_survivorship(spark, sf).collect()
    }
    fam = out[1]
    assert fam["n_members"] == 3
    # longest member (doc 3) wins text provenance
    assert fam["canon_doc_id"] == 3
    # source: book beats web 2-1; lang unanimous within a block
    assert fam["lang"] == "en" and fam["source"] == "book"
    solo = out[9]
    assert solo["n_members"] == 1 and solo["canon_doc_id"] == 9
    assert solo["lang"] == "fr" and solo["source"] == "web"


def test_overcap_block_refines_instead_of_dropping(spark, tmp_path):
    """r10 hierarchical blocking: a level-1 block over BLOCK_CAP
    REFINES by the prefix-4 sub-key (instead of dropping, which the
    decade probe showed silencing the operator on a 10x corpus) —
    within-sub-block pairs survive, cross-sub-block pairs are the
    documented trade, and the DuckDB oracle mirrors the exact same
    hierarchy."""
    import duckdb

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.er import (
        BLOCK_CAP,
        ORACLES,
    )

    rows = []
    n_groups, per_group = 26, 20  # 520 > BLOCK_CAP, sub-blocks of 20
    assert n_groups * per_group > BLOCK_CAP
    for g in range(n_groups):
        for i in range(per_group):
            text = f"g{chr(97 + g)}: " + "x" * 94 + f"{i:02d}"
            rows.append((g * per_group + i, text, "en", "s0"))
    # under-cap control block in another lang: level-1 path intact
    rows.append((100000, "k" * 100, "de", "s0"))
    rows.append((100001, "k" * 99 + "q", "de", "s0"))
    sf = _write_docs(tmp_path, rows)

    got = {
        (r["doc_a"], r["doc_b"])
        for r in q_er_fuzzy_pairs(spark, sf).collect()
    }
    # every within-sub-block pair, no cross-sub-block pair
    expect = {
        (g * per_group + i, g * per_group + j)
        for g in range(n_groups)
        for i in range(per_group)
        for j in range(i + 1, per_group)
    }
    expect.add((100000, 100001))
    assert got == expect

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf}/documents.parquet'"
    )
    oracle = {
        (a, b) for a, b, *_ in con.execute(
            ORACLES["er_fuzzy_pairs"]
        ).fetchall()
    }
    assert oracle == expect

    # the observability twin reports the same hierarchy: the en block
    # refined into 26 sub-blocks of 20, nothing dropped; the de block
    # is an un-refined singleton sub-block
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.er import (
        q_er_refinement_audit,
    )

    audit = {
        (r["b_lang"], r["b_len"]): r
        for r in q_er_refinement_audit(spark, sf).collect()
    }
    en = audit[("en", 1)]
    assert en["refined"] == 1 and en["n_docs"] == 520
    assert en["n_sub_blocks"] == n_groups
    assert en["max_sub_block"] == per_group
    assert en["dropped_docs"] == 0
    de = audit[("de", 1)]
    assert de["refined"] == 0 and de["n_sub_blocks"] == 1
    assert de["max_sub_block"] == de["n_docs"] == 2
