"""Script-mix detection and dup-rate-by-length semantics on crafted
docs (operators/textstats.py, operators/dedup.py)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.dedup import (
    q_dup_rate_by_length,
)
from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.textstats import (
    q_script_mix,
)


def _write_docs(tmp_path, rows):
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array([r[2] for r in rows]),
                "source": pa.array(["s0"] * len(rows)),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        f"{d}/documents.parquet",
    )
    return str(d)


def test_script_mix_flags_code_switching(spark, tmp_path):
    rows = [
        (1, "pure latin text", "en"),
        (2, "混合 mixed 文本", "zh"),  # both scripts → mixed
        (3, "纯中文文本", "zh"),  # CJK only → not mixed
    ]
    sf = _write_docs(tmp_path, rows)
    out = {r["lang"]: r for r in q_script_mix(spark, sf).collect()}
    assert out["en"]["n_mixed_docs"] == 0
    assert out["en"]["n_latin_chars"] == 13 and out["en"]["n_cjk_chars"] == 0
    assert out["zh"]["n_mixed_docs"] == 1
    assert out["zh"]["n_cjk_chars"] == 2 + 2 + 5
    assert abs(out["zh"]["mixed_share"] - 0.5) < 1e-9


def test_dup_rate_concentrates_in_planted_quartile(spark, tmp_path):
    # 8 unique docs with lengths 1..8, plus 4 copies of the SHORTEST
    # doc → dups concentrate in quartile 1
    rows = [(i, "x" * i, "en") for i in range(1, 9)]
    rows += [(100 + j, "x", "en") for j in range(4)]
    sf = _write_docs(tmp_path, rows)
    out = {
        r["length_quartile"]: r
        for r in q_dup_rate_by_length(spark, sf).collect()
    }
    assert out[1]["n_dups"] == 4
    assert all(out[q]["n_dups"] == 0 for q in out if q != 1)
    assert sum(r["n_docs"] for r in out.values()) == 12
