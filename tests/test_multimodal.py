"""Multimodal plumbing: Arrow-batched mapInPandas over binary
payload columns (decode itself is stubbed — no codec libs here)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tools.parity import compare

from conftest import SF_DIR


def test_mm_decode_meta_oracle(spark, duck):
    df = entrymod.queries()["mm_decode_meta"](spark, SF_DIR)
    res = duck.execute(entrymod.oracle_sql()["mm_decode_meta"])
    errs = compare(
        "mm_decode_meta", df, res.fetchall(), [d[0] for d in res.description]
    )
    assert not errs, errs


def test_payload_is_binary(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.multimodal import (
        with_payload,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.sources.tables import (
        load_table,
    )

    df = with_payload(load_table(spark, SF_DIR, "documents"))
    assert dict(df.dtypes)["payload"] == "binary"
    row = df.first()
    assert isinstance(row["payload"], (bytes, bytearray))


def test_real_decode_is_honestly_stubbed():
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.multimodal import (
        decode_image,
    )

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_decode_meta_batch_shape():
    """The pandas worker maps batch→batch with the declared columns."""
    import pandas as pd

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.multimodal import (
        decode_meta_batches,
    )

    batch = pd.DataFrame({"doc_id": [1, 2], "payload": [b"abc", b"x" * 700]})
    out = list(decode_meta_batches(iter([batch])))
    assert len(out) == 1
    o = out[0]
    assert list(o.columns) == ["doc_id", "n_bytes", "width", "height", "n_frames"]
    assert o["n_bytes"].tolist() == [3, 700]
    assert o["width"].tolist() == [1 + 3 % 640, 1 + 700 % 640]
    assert o["height"].tolist() == [1 + 0, 1 + 1]
