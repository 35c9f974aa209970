"""The streaming incremental-dedup probe (streaming/ingest.py) must
admit exactly the docs the batch-mode q_incremental would admit —
stream ≡ batch, with the arrivals split across multiple files so more
than one micro-batch runs."""

from __future__ import annotations

from conftest import SF_DIR


def test_stream_admits_equal_batch_admits(spark, tmp_path):
    from pyspark.sql import functions as F

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.dedup import (
        BATCH_MOD,
        QUERIES as DEDUP_QUERIES,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.sources.tables import (
        load_table,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.ingest import (
        admit_stream,
    )

    arrivals = load_table(spark, SF_DIR, "documents").filter(
        F.col("doc_id") % BATCH_MOD == 0
    ).select("doc_id", "text")

    # batch-mode expectation: arrival decile minus the matched docs
    matched = {
        r["doc_id"]
        for r in DEDUP_QUERIES["dedup_incremental"](spark, SF_DIR).collect()
    }
    expect = {
        r["doc_id"] for r in arrivals.collect()
    } - matched

    # land the arrivals as TWO flat files → two discovery points (the
    # file source does not recurse into nested write directories)
    import glob
    import shutil

    land = tmp_path / "land"
    land.mkdir()

    def land_file(df, name):
        out = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(out))
        part = glob.glob(str(out / "part-*.parquet"))[0]
        shutil.copy(part, land / f"{name}.parquet")

    half = arrivals.filter(F.col("doc_id") % (2 * BATCH_MOD) == 0)
    rest = arrivals.filter(F.col("doc_id") % (2 * BATCH_MOD) != 0)
    land_file(half, "f1")

    admitted: set[int] = set()

    def sink(df, batch_id):
        admitted.update(r["doc_id"] for r in df.collect())

    q = admit_stream(spark, str(land), SF_DIR, sink)
    try:
        q.processAllAvailable()
        land_file(rest, "f2")
        q.processAllAvailable()
        progress = q.lastProgress
    finally:
        q.stop()

    assert admitted == expect
    # zero streaming state: the probe is pure batch logic per micro-batch
    assert not (progress or {}).get("stateOperators")


def test_novel_doc_id_duplicate_is_rejected(spark):
    """ADVICE r4: an arrival whose doc_id does NOT exist in the corpus
    documents table but whose text exactly duplicates an index doc must
    be rejected — the verify stage has to shingle the batch's own text,
    not look the arrival up in the corpus."""
    from pyspark.sql import functions as F

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.dedup import (
        BATCH_MOD,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.sources.tables import (
        load_table,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.streaming.ingest import (
        probe_batch_against_index,
    )

    docs = load_table(spark, SF_DIR, "documents")
    # pick an INDEX doc (outside the arrival decile) and re-land its
    # exact text under a doc_id no corpus row uses
    src = (
        docs.filter(F.col("doc_id") % BATCH_MOD != 0)
        .select("doc_id", "text")
        .orderBy("doc_id")
        .first()
    )
    novel_id = 10_000_019  # prime, far past any corpus doc_id
    assert docs.filter(F.col("doc_id") == novel_id).count() == 0
    batch = spark.createDataFrame(
        [(novel_id, src["text"]), (novel_id + 1, "zxqv unseen gibberish wholly novel text")],
        "doc_id LONG, text STRING",
    )
    admitted = {
        r["doc_id"]
        for r in probe_batch_against_index(spark, batch, SF_DIR).collect()
    }
    assert novel_id not in admitted  # exact dup of index doc → rejected
    assert novel_id + 1 in admitted  # genuinely novel text → admitted
