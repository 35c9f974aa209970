"""Winnowing fingerprint property: any two documents sharing a long
enough substring are GUARANTEED to share a selected fingerprint —
the local-similarity guarantee windows+min provide (and simple random
sampling would not)."""

from __future__ import annotations

from pyspark.sql import functions as F

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.textstats import (
    WINNOW_K,
    WINNOW_W,
    q_winnow_fingerprints,
)


def test_shared_substring_shares_fingerprint(spark, tmp_path):
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, f"unique prefix one {shared} tail a"),
        (2, f"completely different opening words {shared} other ending"),
        (3, "no overlap with those documents at all whatsoever here"),
    ]
    d = tmp_path / "w"
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING").coalesce(
        1
    ).write.parquet(str(d / "documents.parquet"))

    fps: dict[int, set[int]] = {}
    for r in q_winnow_fingerprints(spark, str(d)).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])

    # shared run of 10 tokens ≫ guarantee threshold (W + K - 1 = 6)
    assert fps[1] & fps[2], (fps[1], fps[2])
    assert not (fps[1] & fps[3])


def test_chunk_windows_cover_and_overlap(spark):
    from conftest import SF_DIR

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.textstats import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        q_chunk_windows,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.sources.tables import (
        load_table,
    )

    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    out = {}
    for r in q_chunk_windows(spark, SF_DIR).collect():
        out.setdefault(r["doc_id"], []).append(r)
    assert set(out) == set(docs)  # every doc chunks
    for doc_id, chunks in list(out.items())[:30]:
        toks = docs[doc_id]
        chunks.sort(key=lambda r: r["chunk_idx"])
        # chunk k starts at k·stride and carries the right tokens
        for r in chunks:
            s = r["chunk_idx"] * CHUNK_STRIDE
            expect = toks[s : s + CHUNK_SIZE]
            assert r["chunk_text"].split(" ") == expect
            assert r["n_chunk_tokens"] == len(expect)
        # coverage: the last chunk reaches the end of the doc
        last = chunks[-1]
        assert last["chunk_idx"] * CHUNK_STRIDE + last["n_chunk_tokens"] == len(toks)


def test_top_tokens_approx_tie_boundary_beyond_k(spark, tmp_path):
    """ADVICE r4: with > TOP_TOKENS_K distinct tokens and counts tied
    at the rank-K boundary, the approx twin must still produce the
    exact (n DESC, token ASC) cut while the vocabulary fits the
    sketch's tracked width — the sketch emits its full tracked map and
    the deterministic re-sort decides the boundary, not the sketch."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.textstats import (
        QUERIES,
        TOP_TOKENS_K,
    )

    # 40 heavy tokens (count 3) + 660 tied singletons → 700 distinct,
    # the K-row cut lands mid-tie among the singletons
    rows = []
    doc_id = 0
    for i in range(40):
        rows.append((doc_id, " ".join([f"hv{i:03d}"] * 3)))
        doc_id += 1
    for i in range(660):
        rows.append((doc_id, f"tie{i:04d}"))
        doc_id += 1
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING").select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.lit("synth").alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )
    sf = tmp_path / "sf_tie"
    sf.mkdir()
    docs.coalesce(1).write.parquet(str(sf / "documents.parquet"))

    exact = QUERIES["text_top_tokens"](spark, str(sf)).collect()
    approx = QUERIES["text_top_tokens_approx"](spark, str(sf)).collect()
    assert len(exact) == TOP_TOKENS_K
    assert [tuple(r) for r in approx] == [tuple(r) for r in exact]


def test_zipf_fit_recovers_planted_power_law(spark, tmp_path):
    """A corpus whose token frequencies are an exact rank^-1 power law
    must fit slope ≈ −1; the fit runs over the full planted
    spectrum."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.textstats import (
        q_zipf_fit,
    )

    # token t_r appears floor(1200 / r) times, r = 1..40
    words = []
    for r in range(1, 41):
        words += [f"t{r:02d}"] * (1200 // r)
    docs, chunk = [], 50
    for i in range(0, len(words), chunk):
        docs.append((i // chunk, " ".join(words[i : i + chunk])))
    d = tmp_path / "zipf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([x[0] for x in docs], pa.int64()),
                "text": pa.array([x[1] for x in docs], pa.string()),
            }
        ),
        f"{d}/documents.parquet",
    )
    r = q_zipf_fit(spark, str(d)).collect()[0]
    assert r["n_tokens_fit"] == 40
    assert -1.1 <= r["zipf_slope"] <= -0.9


def test_heaps_curve_monotone_and_complete(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.textstats import (
        HEAPS_BINS,
        q_heaps_curve,
    )

    sf = "/root/testdata/sf0.001"
    rows = sorted(
        q_heaps_curve(spark, sf).collect(), key=lambda r: r["decile"]
    )
    assert [r["decile"] for r in rows] == list(range(1, HEAPS_BINS + 1))
    cv = [r["cum_vocab"] for r in rows]
    assert cv == sorted(cv)                       # vocabulary only grows
    assert sum(r["n_new_tokens"] for r in rows) == cv[-1]
    # sublinear growth on the word-salad corpus: the last decile adds
    # far fewer new tokens than the first
    assert rows[-1]["n_new_tokens"] < rows[0]["n_new_tokens"]


def test_burstiness_separates_scattered_from_clumped(spark, tmp_path):
    """A token spread one-per-doc has dispersion < 1 (under-dispersed);
    the same total mass clumped into one doc is strongly
    over-dispersed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.textstats import (
        q_token_burstiness,
    )

    rows = [(i, "spread " + ("clump " * 20 if i == 0 else "filler")) for i in range(20)]
    d = tmp_path / "burst"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1].strip() for r in rows], pa.string()),
            }
        ),
        f"{d}/documents.parquet",
    )
    out = {r["token"]: r["dispersion"] for r in q_token_burstiness(spark, str(d)).collect()}
    assert out["spread"] < 1.0       # one per doc: sub-Poisson
    assert out["clump"] > 10.0       # all 20 in one doc: heavily bursty


def test_compressibility_orders_repetitive_below_random(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.textstats import (
        q_compressibility,
    )

    import random

    rng = random.Random(3)
    rows = [
        (1, "spam " * 200),                                       # pure repetition
        (2, " ".join(rng.choice("abcdefgh") * rng.randint(1, 8)
                     for _ in range(200))),                       # semi-random
        (3, "".join(chr(rng.randint(33, 126)) for _ in range(1000))),  # noise
    ]
    d = tmp_path / "cmp"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        f"{d}/documents.parquet",
    )
    out = {r["doc_id"]: r["ratio"] for r in q_compressibility(spark, str(d)).collect()}
    assert out[1] < 0.05          # boilerplate collapses
    assert out[1] < out[2] < out[3]
    assert out[3] > 0.8           # noise barely compresses
    # determinism
    again = {r["doc_id"]: r["ratio"] for r in q_compressibility(spark, str(d)).collect()}
    assert out == again


def test_chunk_dedup_rate_consistency(spark):
    from conftest import SF_DIR
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.textstats import (
        q_chunk_dedup_rate,
        q_chunk_windows,
    )

    r = q_chunk_dedup_rate(spark, SF_DIR).collect()[0]
    chunks = [
        x["chunk_text"] for x in q_chunk_windows(spark, SF_DIR).collect()
    ]
    from collections import Counter

    c = Counter(chunks)
    assert r["n_chunks"] == len(chunks)
    assert r["n_distinct"] == len(c)
    assert r["max_multiplicity"] == max(c.values())
    assert abs(r["dup_share"] - (1 - len(c) / len(chunks))) < 1e-6


def test_stylometry_delta_properties(spark):
    """Delta is a pseudo-metric on sources: symmetric by construction
    (a<b emitted once), non-negative, complete pair coverage; and a
    python recompute for one pair agrees."""
    from conftest import SF_DIR
    from collections import Counter, defaultdict
    import math

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.textstats import (
        DELTA_TOP_K,
        q_source_stylometry_delta,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.sources.tables import load_table

    rows = q_source_stylometry_delta(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents").select(
        "source", "text"
    ).collect()
    sources = sorted({r["source"] for r in docs})
    n_src = len(sources)
    assert len(rows) == n_src * (n_src - 1) // 2
    for r in rows:
        assert r["delta"] >= 0
        assert r["source_a"] < r["source_b"]
        assert 0 < r["n_tokens"] <= DELTA_TOP_K
    # recompute for the first emitted pair
    cnt = defaultdict(Counter)
    tot = Counter()
    for d in docs:
        toks = d["text"].split(" ")
        cnt[d["source"]].update(toks)
        tot.update(toks)
    topk = [
        t
        for t, _ in sorted(tot.items(), key=lambda kv: (-kv[1], kv[0]))[
            :DELTA_TOP_K
        ]
    ]
    f = {
        s: {t: cnt[s][t] / sum(cnt[s].values()) for t in topk}
        for s in sources
    }
    pick = rows[0]
    deltas = []
    for t in topk:
        vals = [f[s][t] for s in sources]
        mu = sum(vals) / n_src
        sd = math.sqrt(sum((v - mu) ** 2 for v in vals) / n_src)
        if sd > 0:
            za = (f[pick["source_a"]][t] - mu) / sd
            zb = (f[pick["source_b"]][t] - mu) / sd
            deltas.append(abs(za - zb))
    assert pick["n_tokens"] == len(deltas)
    assert abs(pick["delta"] - sum(deltas) / len(deltas)) < 1e-6
