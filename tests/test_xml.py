"""XML source round-trip fidelity + escaping hostile content
(sources/xmlsrc.py)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from text_sentiment_analysis_in_hadoop_and_spark_spark.sources.xmlsrc import (
    q_xml_roundtrip_stats,
)


def _write_docs(tmp_path, rows):
    d = tmp_path / "docs"
    d.mkdir()
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[2] for r in rows]),
            "source": pa.array(["s0"] * len(rows)),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{d}/documents.parquet")
    return str(d)


def test_xml_roundtrip_preserves_markup_hostile_text(spark, tmp_path):
    """Text containing the five XML special characters plus quotes
    must survive write→escape→parse→unescape unchanged (the checksum
    is over the decoded text, so any escaping residue fails)."""
    hostile = "a < b && c > d \"quoted\" 'apos' <tag/> &amp;"
    rows = [
        (1, hostile, "en"),
        (2, "plain text", "en"),
        (3, "hallo welt", "de"),
    ]
    sf = _write_docs(tmp_path, rows)
    out = {r["lang"]: r for r in q_xml_roundtrip_stats(spark, sf).collect()}
    assert out["en"]["n_docs"] == 2 and out["en"]["n_distinct_ids"] == 2
    assert out["en"]["sum_chars"] == len(hostile) + len("plain text")
    assert out["de"]["n_docs"] == 1

    # checksum equals the one computed straight from the parquet —
    # the XML layer added or lost nothing
    from text_sentiment_analysis_in_hadoop_and_spark_spark.functions.hashing import (
        hex32,
    )
    import pyspark.sql.functions as F

    direct = {
        r["lang"]: r["cs"]
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .groupBy("lang")
        .agg(F.sum(hex32(F.col("text"))).alias("cs"))
        .collect()
    }
    for lang, row in out.items():
        assert row["text_checksum"] == direct[lang], lang
