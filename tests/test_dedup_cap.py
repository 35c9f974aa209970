"""MinHash LSH hot-bucket cap (VERDICT r2 item 4): a boilerplate
"shingle bomb" — many docs sharing one shingle set — must NOT go
quadratic through the band self-join; docs outside the bomb keep
their candidate pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.dedup import (
    banded_signatures,
    candidate_pairs,
    doc_shingles,
    minhash_signatures,
)

BOMB = 60   # identical boilerplate docs — one band bucket of 60
CAP = 30


def _banded(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    return banded_signatures(minhash_signatures(doc_shingles(docs)))


def test_shingle_bomb_is_capped(spark):
    rows = [
        (i, "all rights reserved standard license header text")
        for i in range(BOMB)
    ]
    # one legitimate duplicate pair, disjoint from the bomb (identical
    # text → identical signatures → all 4 bands collide, cold bucket of 2)
    rows.append((1000, "the quick brown fox jumps over the lazy dog tonight"))
    rows.append((1001, "the quick brown fox jumps over the lazy dog tonight"))
    banded = _banded(spark, rows)

    capped = candidate_pairs(banded, cap=CAP)
    pairs = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    # the bomb (60 > CAP in every band) contributes nothing ...
    assert not any(a < BOMB and b < BOMB for a, b in pairs), pairs
    # ... but the legitimate near-dup pair survives
    assert (1000, 1001) in pairs
    # bound: without the cap the bomb alone is 60*59/2 = 1770 pairs
    assert len(pairs) < 10


def test_cap_is_inactive_below_threshold(spark):
    """With the default cap (1000) the same corpus keeps ALL its
    same-bucket pairs — the cap only fires on pathological buckets."""
    rows = [
        (i, "all rights reserved standard license header text")
        for i in range(BOMB)
    ]
    banded = _banded(spark, rows)
    n = candidate_pairs(banded).count()
    assert n == BOMB * (BOMB - 1) // 2


def test_hot_list_is_per_band(spark):
    """Capping band b must not leak into band b' — a doc set hot in one
    band but cold in others keeps the cold bands' pairs.  (Identical
    docs are hot in all 4 bands, so use the bomb + distinct docs and
    check pair counts stay consistent between runs with/without cap.)"""
    rows = [(i, f"unique document number {i} with its own words {i * 7}")
            for i in range(20)]
    banded = _banded(spark, rows)
    with_cap = candidate_pairs(banded, cap=5).count()
    without = candidate_pairs(banded, cap=10**9).count()
    # distinct docs form no bucket > 5, so the cap changes nothing
    assert with_cap == without


def test_containment_catches_quoted_subset_doc(spark, tmp_path):
    """A doc that is a strict prefix-subset of a bigger doc has high
    containment_a but diluted jaccard — the asymmetric signal the
    symmetric verify misses.  Fixture texts are fixed, so the LSH
    band collision (and thus the emitted pair) is deterministic."""
    from pyspark.sql import functions as F

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import (
        common,
        dedup,
    )

    base = [f"tok{i:02d}" for i in range(40)]
    big = " ".join(base)
    small = " ".join(base[:30])  # strict subset → containment_a = 1.0
    rows = [
        (1, small, "en", "synth", len(small)),
        (2, big, "en", "synth", len(big)),
        (3, "completely unrelated filler words here", "en", "synth", 38),
    ]
    sf = tmp_path / "sf_contain"
    sf.mkdir()
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    ).coalesce(1).write.parquet(str(sf / "documents.parquet"))
    try:
        out = {
            (r["doc_a"], r["doc_b"]): (r["containment_a"], r["containment_b"])
            for r in dedup.QUERIES["dedup_containment_pairs"](
                spark, str(sf)
            ).collect()
        }
    finally:
        common.clear_caches(str(sf))
    assert (1, 2) in out, out
    ca, cb = out[(1, 2)]
    # shingle ground truth: A has 28 3-gram shingles, all inside B's 38
    assert ca == 1.0
    assert cb == round(28 / 38, 6)


def test_simhash_pairs_banding_is_exact(spark):
    """Pigeonhole exactness: the banded equi-join must recover EVERY
    pair within Hamming ≤ HAMMING_MAX — recall 1.0 is a theorem for
    SIMHASH_BANDS = HAMMING_MAX + 1 blocks, so the banded result
    equals the brute-force all-pairs scan exactly."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.dedup import (
        HAMMING_MAX,
        q_simhash,
        q_simhash_pairs,
    )

    sf = "/root/testdata/sf0.001"
    sims = {r["doc_id"]: r["simhash"] for r in q_simhash(spark, sf).collect()}
    ids = sorted(sims)
    brute = {
        (a, b, bin(sims[a] ^ sims[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sims[a] ^ sims[b]).count("1") <= HAMMING_MAX
    }
    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in q_simhash_pairs(spark, sf).collect()
    }
    assert banded == brute
    assert brute  # non-vacuous: the corpus does contain near-dups


def test_prefix_filter_join_is_lossless(spark):
    """Prefix filtering is a theorem, not a heuristic: the filtered
    join must return EXACTLY the brute-force all-pairs Jaccard >= t
    set on the real corpus."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.dedup import (
        PREFIX_JACCARD_T,
        _shingles_cached,
        q_prefix_jaccard_join,
    )

    sf = "/root/testdata/sf0.001"
    sets: dict[int, set] = {}
    for r in _shingles_cached(spark, sf).collect():
        sets.setdefault(r["doc_id"], set()).add(r["shingle"])
    ids = sorted(sets)
    brute = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter:
                j = inter / (len(sets[a]) + len(sets[b]) - inter)
                if j >= PREFIX_JACCARD_T:
                    brute[(a, b)] = round(j, 6)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in q_prefix_jaccard_join(spark, sf).collect()
    }
    assert got == brute
    assert brute  # non-vacuous on the real corpus


def test_minhash_error_audit_is_bounded(spark):
    """The sketch audit on the real corpus: 64-perm estimates stay
    within a loose error envelope and threshold flips are a small
    minority of pairs (if this drifts, N_PERM is under-budgeted)."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.dedup import (
        q_minhash_error,
    )

    r = q_minhash_error(spark, "/root/testdata/sf0.001").collect()[0]
    assert r["n_pairs"] > 0
    assert r["mean_abs_err"] <= 0.15
    assert r["n_threshold_flips"] <= max(1, 0.2 * r["n_pairs"])


def test_cluster_size_dist_accounts_every_doc(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.dedup import (
        q_cluster_size_dist,
    )

    sf = "/root/testdata/sf0.001"
    out = q_cluster_size_dist(spark, sf).collect()
    assert sum(r["n_docs"] for r in out) == 500       # every doc in a cluster
    assert any(r["cluster_size"] > 1 for r in out)    # real dup families exist


def test_ngram_novelty_exact_recrawl_scores_zero(spark, tmp_path):
    """An exact re-crawl of an earlier doc must score novelty 0; the
    original scores 1; partially-copied docs land in between."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators import common
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.dedup import (
        q_ngram_novelty,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),     # exact re-crawl
        (3, "alpha beta gamma delta NEW words here"),   # partial copy
        (4, "totally fresh content nothing shared at"),  # original
    ]
    d = tmp_path / "nov"
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
    try:
        got = {
            r["doc_id"]: r["novelty"]
            for r in q_ngram_novelty(spark, str(d)).collect()
        }
    finally:
        common.clear_caches(str(d))
    assert got[1] == 1.0
    assert got[2] == 0.0
    assert 0.0 < got[3] < 1.0
    assert got[4] == 1.0


def test_tfidf_cosine_pairs_bounds_and_ordering(spark):
    """Cosine in [-eps, 1+eps]; exact-duplicate text pairs must score
    ~1; weighted cosine is defined for every banded candidate."""
    from conftest import SF_DIR
    from pyspark.sql import functions as F
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.dedup import (
        q_minhash_pairs,
        q_tfidf_cosine_pairs,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.sources.tables import load_table

    rows = q_tfidf_cosine_pairs(spark, SF_DIR).collect()
    n_pairs = q_minhash_pairs(spark, SF_DIR).count()
    assert len(rows) == n_pairs
    for r in rows:
        assert -1e-6 <= r["cosine"] <= 1 + 1e-6
    # independent recomputation for a handful of pairs: raw python
    # token counts + smooth idf, no Spark expressions shared
    import math
    from collections import Counter

    texts = {
        d["doc_id"]: d["text"]
        for d in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    }
    n = len(texts)
    df = Counter()
    tfs = {}
    for doc_id, t in texts.items():
        c = Counter(t.split(" "))
        tfs[doc_id] = c
        df.update(c.keys())

    def vec(doc_id):
        return {
            w: tf * math.log((1 + n) / (1 + df[w]))
            for w, tf in tfs[doc_id].items()
        }

    for r in sorted(rows, key=lambda r: -r["cosine"])[:5]:
        va, vb = vec(r["doc_a"]), vec(r["doc_b"])
        dot = sum(va[w] * vb.get(w, 0.0) for w in va)
        na = math.sqrt(sum(x * x for x in va.values()))
        nb = math.sqrt(sum(x * x for x in vb.values()))
        assert abs(r["cosine"] - dot / (na * nb)) < 1e-5, r


def test_method_agreement_counts_are_consistent(spark):
    from conftest import SF_DIR

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.dedup import (
        q_method_agreement,
        q_minhash_pairs,
        q_prefix_jaccard_join,
    )

    rows = {r["method"]: r for r in q_method_agreement(spark, SF_DIR).collect()}
    assert set(rows) == {"minhash", "simhash", "tfidf_cosine"}
    n_truth = q_prefix_jaccard_join(spark, SF_DIR).count()
    for r in rows.values():
        assert r["n_truth"] == n_truth
        assert 0 <= r["n_both"] <= min(r["n_truth"], r["n_method"])
        assert 0.0 <= r["precision"] <= 1.0
        assert 0.0 <= r["recall"] <= 1.0
        assert r["set_jaccard"] <= min(r["precision"], r["recall"]) + 1e-9
    # pigeonhole SimHash banding has recall 1.0 BY THEOREM only for
    # Hamming-near pairs — but MinHash overlap must reconcile exactly
    mh = {
        (r["doc_a"], r["doc_b"])
        for r in q_minhash_pairs(spark, SF_DIR).collect()
    }
    tr = {
        (r["doc_a"], r["doc_b"])
        for r in q_prefix_jaccard_join(spark, SF_DIR).collect()
    }
    assert rows["minhash"]["n_both"] == len(mh & tr)
    assert rows["minhash"]["n_method"] == len(mh)


def test_split_overlap_counts_and_flags_reconcile(spark):
    from conftest import SF_DIR

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.dedup import (
        SPLIT_OVERLAP_MEMORIZED,
        _shingles_cached,
        q_split_overlap,
    )

    rows = {r["doc_id"]: r for r in q_split_overlap(spark, SF_DIR).collect()}
    assert rows and all(d % 8 < 2 for d in rows)
    sh = _shingles_cached(spark, SF_DIR).collect()
    train = {r["shingle"] for r in sh if r["doc_id"] % 8 >= 2}
    import collections

    per = collections.defaultdict(lambda: [0, 0])
    for r in sh:
        if r["doc_id"] % 8 < 2:
            per[r["doc_id"]][0] += 1
            per[r["doc_id"]][1] += 1 if r["shingle"] in train else 0
    assert set(per) == set(rows)
    for d, (n, seen) in per.items():
        assert rows[d]["n_shingles"] == n
        assert rows[d]["n_seen"] == seen
        want = round(seen / n, 6)
        assert abs(rows[d]["overlap_frac"] - want) <= 1e-9
        assert rows[d]["memorization_risk"] == (
            want >= SPLIT_OVERLAP_MEMORIZED
        )


def test_cluster_topics_rank_multi_doc_clusters_only(spark):
    import math

    from conftest import SF_DIR

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.dedup import (
        TOPIC_TERMS,
        q_cluster_topics,
        q_dedup_clusters,
    )

    rows = q_cluster_topics(spark, SF_DIR).collect()
    assert rows
    import collections

    sizes = collections.Counter(
        r["cluster_id"] for r in q_dedup_clusters(spark, SF_DIR).collect()
    )
    by_cluster = collections.defaultdict(list)
    for r in rows:
        assert sizes[r["cluster_id"]] >= 2  # singletons excluded
        assert r["n_docs"] == sizes[r["cluster_id"]]
        by_cluster[r["cluster_id"]].append(r)
    # every labeled cluster carries at most TOPIC_TERMS ranked terms,
    # scores non-increasing in rank, all positive (ln(1 + C/df) > 0)
    for c, rs in by_cluster.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TOPIC_TERMS
        for a, b in zip(rs, rs[1:]):
            assert a["score"] >= b["score"] - 1e-9
        assert all(r["score"] > 0 for r in rs)
    # every multi-doc cluster got a label row
    assert set(by_cluster) == {c for c, n in sizes.items() if n >= 2}


def test_quality_by_dupsize_tiles_the_corpus(spark):
    from conftest import SF_DIR

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.dedup import (
        q_dedup_clusters,
        q_quality_by_dupsize,
    )

    rows = {r["dup_class"]: r for r in q_quality_by_dupsize(spark, SF_DIR).collect()}
    assert "singleton" in rows
    n_docs = spark.read.parquet(SF_DIR + "/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows.values()) == n_docs
    import collections

    sizes = collections.Counter(
        r["cluster_id"] for r in q_dedup_clusters(spark, SF_DIR).collect()
    )
    want = collections.Counter()
    for c, n in sizes.items():
        cls = "singleton" if n == 1 else ("family_2_3" if n <= 3 else "family_4_plus")
        want[cls] += n
    for cls, n in want.items():
        assert rows[cls]["n_docs"] == n
    for r in rows.values():
        assert 0.0 <= r["mean_quality"] <= 1.0
        assert r["mean_chars"] > 0


def test_prefix_filter_lossless_on_clique_corpus(spark, tmp_path):
    """The r10 decade-probe shape, shrunk: variant FAMILIES with
    varied lengths (each doc's text truncated to different prefix
    fractions) stress both asymmetric prefixes, the generation-time
    length filter, and the positional filter — exactly the structure
    where a one-token-too-short prefix would silently lose pairs.
    Brute force is the referee."""
    import os
    import shutil

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.common import (
        clear_caches,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.dedup import (
        PREFIX_JACCARD_T,
        _shingles_cached,
        q_prefix_jaccard_join,
    )

    src = "/root/testdata/sf0.001"
    d = str(tmp_path / "clique_sf")
    os.makedirs(d)
    base = spark.read.parquet(os.path.join(src, "documents.parquet"))
    k = spark.range(4).select(F.col("id").cast("int").alias("k"))
    frac = 0.30 + 0.17 * ((F.col("doc_id") + F.col("k")) % 4)
    cut = F.when(F.col("k") == 0, F.length("text")).otherwise(
        F.greatest(F.lit(40), F.round(F.length("text") * frac).cast("int"))
    )
    (
        base.crossJoin(k)
        .select(
            (F.col("doc_id") * 4 + F.col("k")).alias("doc_id"),
            F.concat(
                F.substring(F.col("text"), 1, cut),
                F.lit(" zv"),
                F.col("k").cast("string"),
            ).alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text").cast("long"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(d, "documents.parquet"))
    )
    clear_caches()
    try:
        sets: dict[int, set] = {}
        for r in _shingles_cached(spark, d).collect():
            sets.setdefault(r["doc_id"], set()).add(r["shingle"])
        ids = sorted(sets)
        brute = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                inter = len(sets[a] & sets[b])
                if inter:
                    j = inter / (len(sets[a]) + len(sets[b]) - inter)
                    if j >= PREFIX_JACCARD_T:
                        brute[(a, b)] = round(j, 6)
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in q_prefix_jaccard_join(spark, d).collect()
        }
        assert got == brute
        # non-vacuous: the clique corpus must actually produce
        # cross-length near-dup pairs
        assert len(brute) >= 100
    finally:
        clear_caches()
        shutil.rmtree(d, ignore_errors=True)


def test_prefix_filter_lossless_on_salted_group_corpus(spark, tmp_path):
    """The sf10 decade-2 shape, shrunk: REPLICA GROUPS diverged by
    salting every 7th token, so cross-group pairs share rare unsalted
    prefix shingles while their true Jaccard sits below threshold —
    exactly the candidate class the r11 suffix-bound filter prunes
    (BENCH_NOTES r10: a constant ~9× candidate overhead).  The filter
    is a theorem (an upper bound on |A∩B| from downward-closed prefix
    arrays in one shared total order), so the joined output must equal
    brute force EXACTLY, including every exactly-at-threshold pair."""
    import os
    import shutil

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.common import (
        clear_caches,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.dedup import (
        PREFIX_JACCARD_T,
        _shingles_cached,
        q_prefix_jaccard_join,
    )

    src = "/root/testdata/sf0.001"
    d = str(tmp_path / "salted_sf")
    os.makedirs(d)
    base = spark.read.parquet(os.path.join(src, "documents.parquet")).limit(
        120
    )
    copies = spark.range(9).select(
        (F.col("id") % 3).cast("int").alias("g"),
        (F.col("id") / 3).cast("int").alias("k"),
    )
    toks = F.split(F.col("text"), " ")
    salted = F.array_join(
        F.transform(
            toks,
            lambda x, i: F.when(
                (i + F.col("g")) % 7 == 0,
                F.concat(
                    F.lit("r"),
                    F.col("g").cast("string"),
                    F.lit("t"),
                    (i % 13).cast("string"),
                ),
            ).otherwise(x),
        ),
        " ",
    )
    frac = 0.30 + 0.21 * ((F.col("doc_id") + F.col("k")) % 3)
    cut = F.when(F.col("k") == 0, F.length(salted)).otherwise(
        F.greatest(F.lit(40), F.round(F.length(salted) * frac).cast("int"))
    )
    (
        base.crossJoin(copies)
        .select(
            (F.col("doc_id") * 9 + F.col("g") * 3 + F.col("k")).alias(
                "doc_id"
            ),
            F.concat(
                F.substring(salted, 1, cut),
                F.lit(" zv"),
                F.col("k").cast("string"),
            ).alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text").cast("long"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(d, "documents.parquet"))
    )
    clear_caches()
    try:
        sets: dict[int, set] = {}
        for r in _shingles_cached(spark, d).collect():
            sets.setdefault(r["doc_id"], set()).add(r["shingle"])
        ids = sorted(sets)
        brute = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                inter = len(sets[a] & sets[b])
                if inter:
                    j = inter / (len(sets[a]) + len(sets[b]) - inter)
                    if j >= PREFIX_JACCARD_T:
                        brute[(a, b)] = round(j, 6)
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in q_prefix_jaccard_join(spark, d).collect()
        }
        assert got == brute
        # non-vacuous: within-group near-dups exist AND cross-group
        # docs exist that share shingles without being near-dups (the
        # candidate class the suffix bound prunes)
        assert len(brute) >= 50
        cross_sharing = sum(
            1
            for i, a in enumerate(ids)
            for b in ids[i + 1:]
            if (a // 3) % 3 != (b // 3) % 3
            and sets[a] & sets[b]
            and (a, b) not in brute
        )
        assert cross_sharing >= 50
    finally:
        clear_caches()
        shutil.rmtree(d, ignore_errors=True)
