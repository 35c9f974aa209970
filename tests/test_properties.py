"""Property-based pins (hypothesis): reference implementations in
plain Python checked against the Spark Column-expression twins over
randomized inputs.  Each property batches all generated cases into ONE
DataFrame so a hypothesis example costs one Spark job, not dozens."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F


def _py_greedy_merge(syms: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


tokens = st.lists(
    st.sampled_from(["a", "b", "ab", "c", "</w>"]), min_size=1, max_size=12
)


@settings(max_examples=5, deadline=None)
@given(st.lists(tokens, min_size=1, max_size=25))
def test_bpe_merge_fold_matches_python_reference(spark, cases):
    """The higher-order-fold greedy merge must equal the sequential
    Python reference on arbitrary symbol runs — including overlapping
    runs like [a, a, a] where left-to-right non-overlap matters."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.bpe import (
        _merge_expr,
    )

    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i INT, syms ARRAY<STRING>"
    )
    got = {
        r["i"]: r["m"]
        for r in df.select(
            "i", F.expr(_merge_expr("a", "b")).alias("m")
        ).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == _py_greedy_merge(c, "a", "b"), c


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1023),
            st.integers(min_value=0, max_value=1023),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_zorder_interleave_is_a_bijection(spark, pairs):
    """Morton interleave must round-trip: deinterleaving the z-value
    recovers (x, y) exactly, so z-ordering never conflates cells."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.layout import (
        Z_BITS,
        _interleave,
    )

    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pairs)],
        "i INT, x LONG, y LONG",
    )
    got = {
        r["i"]: r["z"]
        for r in df.select(
            "i", _interleave(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    for i, (x, y) in enumerate(pairs):
        z = got[i]
        rx = sum(((z >> (2 * k + 1)) & 1) << k for k in range(Z_BITS))
        ry = sum(((z >> (2 * k)) & 1) << k for k in range(Z_BITS))
        assert (rx, ry) == (x, y)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from("ab,x\""), min_size=0, max_size=12
        ),
        min_size=1,
        max_size=20,
    )
)
def test_fidelity_csv_parse_matches_java_split_semantics(spark, texts):
    """The naive-split + comma-restitch Column expression must agree
    with the reference's algorithm (split(','), re-append fields 4+
    dropping the commas) for arbitrary comma-bearing text — trailing
    empty fields excluded (documented Java/Spark split divergence,
    unobservable for the reference layout)."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.sources.csv import (
        fidelity_parse,
    )

    lines = [f"{i},1,src,{t}" for i, t in enumerate(texts) if not t.endswith(",")]
    if not lines:
        return
    df = spark.createDataFrame([(l,) for l in lines], "line STRING")
    got = [
        (r["item_id"], r["text"])
        for r in df.select(*fidelity_parse(F.col("line"))).collect()
    ]
    for (iid, text), line in zip(got, lines):
        cols = line.split(",")
        expect = cols[3] + "".join(cols[4:]) if len(cols) > 4 else cols[3]
        assert iid == cols[0] and text == expect, line


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.lists(
        st.integers(min_value=0, max_value=4), min_size=1, max_size=6
    ),
)
def test_png_codec_roundtrip_property(h, w, seed, filters):
    """encode→decode is the identity for ANY image shape, pixel
    content, and per-row filter schedule — the codec property that
    makes the PNG decoder trustworthy on payloads it didn't
    synthesize itself (pure Python/numpy, no Spark job needed)."""
    import numpy as np

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
    )

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype="uint8")
    got = decode_png_pixels(encode_png(px, filters=filters))
    assert np.array_equal(got, px)
