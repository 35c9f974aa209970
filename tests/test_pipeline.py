"""Pipeline-operator invariants: packing respects the token budget
(modulo single oversized docs) and hash sampling is deterministic and
duplicate-consistent."""

from __future__ import annotations

from conftest import SF_DIR

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.pipeline import (
    PACK_BUDGET,
    q_pack_nextfit,
    q_pack_sequences,
    q_sample_decile,
)


def test_pack_bins_respect_budget(spark):
    rows = q_pack_sequences(spark, SF_DIR).collect()
    bins: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for r in rows:
        bins.setdefault((r["bucket"], r["bin"]), []).append(
            (r["doc_id"], r["n_tokens"])
        )
    assert len(bins) > 1
    for (bucket, b), docs in bins.items():
        toks = [t for _, t in sorted(docs)]  # packing order = doc_id
        # next-fit: everything before the bin's last doc fits within
        # the budget; only the last doc may spill past it
        assert sum(toks[:-1]) < PACK_BUDGET, (bucket, b, toks)


def test_pack_is_exhaustive_and_unique(spark):
    rows = q_pack_sequences(spark, SF_DIR).collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids)) == 500  # every doc packed once


def test_nextfit_bins_never_overflow(spark):
    """The ADVICE-r3 contract: under true next-fit, a bin's total is
    ≤ PACK_BUDGET unless the bin is a single oversized doc — no
    straddling doc ever overflows a shared bin."""
    rows = q_pack_nextfit(spark, SF_DIR).collect()
    bins: dict[tuple[int, int], list[int]] = {}
    for r in rows:
        bins.setdefault((r["bucket"], r["bin"]), []).append(r["n_tokens"])
    assert len(bins) > 1
    for (bucket, b), toks in bins.items():
        assert sum(toks) <= PACK_BUDGET or len(toks) == 1, (bucket, b, toks)
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids)) == 500  # exhaustive, no dup packs


def test_nextfit_matches_serial_reference(spark):
    """Cross-check the distributed packer against a driver-side serial
    next-fit over each bucket's doc_id-ordered stream."""
    rows = q_pack_nextfit(spark, SF_DIR).collect()
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for bucket, rs in by_bucket.items():
        rs.sort(key=lambda r: r["doc_id"])
        cur_bin, cur = 0, 0
        for r in rs:
            t = r["n_tokens"]
            if cur > 0 and cur + t > PACK_BUDGET:
                cur_bin += 1
                cur = 0
            assert r["bin"] == cur_bin, (bucket, r)
            cur += t


def test_sample_is_deterministic(spark):
    a = {r["doc_id"] for r in q_sample_decile(spark, SF_DIR).collect()}
    b = {r["doc_id"] for r in q_sample_decile(spark, SF_DIR).collect()}
    assert a == b
    assert 0 < len(a) < 500  # nontrivial cut


def test_balanced_sample_evens_classes(spark):
    """Rate-based class balancing: the minority class is kept ~whole
    (rate 1.0 keeps every doc), the majority thinned toward it, and
    membership is deterministic."""
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.pipeline import (
        q_sample_balanced,
    )

    rows = q_sample_balanced(spark, SF_DIR).collect()
    by_label: dict[int, set[int]] = {}
    for r in rows:
        by_label.setdefault(r["label"], set()).add(r["doc_id"])
    assert set(by_label) == {0, 1}
    n0, n1 = len(by_label[0]), len(by_label[1])
    # sf0.001 labels split 250/250 → both rates 1.0 → everything kept
    assert abs(n0 - n1) <= 0.2 * max(n0, n1), (n0, n1)
    again = {
        (r["label"], r["doc_id"])
        for r in q_sample_balanced(spark, SF_DIR).collect()
    }
    assert again == {(lab, d) for lab, ds in by_label.items() for d in ds}


def test_balanced_sample_thins_majority_class(spark):
    """The thinning path on a genuinely skewed mix: 1000 majority vs
    100 minority docs → the majority must come down to ~100 (binomial
    noise around rate n_min/n_c = 0.1) while the minority is kept
    whole (rate 1.0 keeps every doc)."""
    from pyspark.sql import functions as F

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.pipeline import (
        balanced_sample,
    )

    docs = spark.range(1100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1000, 0).otherwise(1).cast("int").alias("label"),
        F.concat(F.lit("document text number "), F.col("id")).alias("text"),
    )
    rows = balanced_sample(docs).collect()
    n = {0: 0, 1: 0}
    for r in rows:
        n[r["label"]] += 1
    assert n[1] == 100                      # minority kept whole
    assert 60 <= n[0] <= 140, n             # majority thinned to ~100


def test_profile_one_row_per_column(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.pipeline import (
        PROFILE_COLUMNS,
        q_profile,
    )

    rows = {r["col_name"]: r for r in q_profile(spark, SF_DIR).collect()}
    assert set(rows) == set(PROFILE_COLUMNS)
    n = {r["n_rows"] for r in rows.values()}
    assert len(n) == 1  # every column profiled over the same corpus
    assert rows["doc_id"]["n_nulls"] == 0
    # numeric min/max must order numerically, not lexically
    assert int(rows["n_chars"]["min_repr"]) <= int(rows["n_chars"]["max_repr"])


def test_mixture_weighted_thinning(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.pipeline import (
        q_mixture,
    )

    rows = {r["source"]: r for r in q_mixture(spark, SF_DIR).collect()}
    assert rows  # every source reported
    for r in rows.values():
        assert 0 <= r["n_kept"] <= r["n_avail"]
        assert 0.0 <= r["target_frac"] <= 1.0
        assert r["realized_frac"] == round(r["n_kept"] / r["n_avail"], 6)
    # target fractions order by weight (exact math, no sampling noise);
    # realized counts are too noisy to compare at this corpus size
    # (2-3 docs/source at sf0.001) — the deterministic filter itself is
    # pinned by the DuckDB oracle at sf0.01
    by_w = {}
    for r in rows.values():
        by_w.setdefault(r["w"], set()).add(r["target_frac"])
    if 1 in by_w and 3 in by_w:
        assert min(by_w[3]) > max(by_w[1])


def test_training_corpus_is_intersection_of_gates(spark):
    from pyspark.sql import functions as F

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.dedup import (
        QUERIES as DEDUP_QUERIES,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.pipeline import (
        CONTAM_MAX,
        q_training_corpus,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.quality import (
        q_contamination,
    )

    corpus = {r["doc_id"] for r in q_training_corpus(spark, SF_DIR).collect()}
    assert corpus  # the composition keeps a nonempty corpus
    keep = {
        r["doc_id"]
        for r in DEDUP_QUERIES["dedup_corpus_keep"](spark, SF_DIR).collect()
    }
    assert corpus <= keep
    dirty = {
        r["doc_id"]
        for r in q_contamination(spark, SF_DIR)
        .filter(F.col("contam_frac") > CONTAM_MAX)
        .collect()
    }
    assert not (corpus & dirty)


def test_leakage_safe_split_never_straddles_near_dups(spark):
    """The whole point of pipe_split_leakage_safe: every verified
    near-dup pair lands in ONE split, and the 8/1/1 fan covers all
    three splits across clusters."""
    from pyspark.sql import functions as F

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.dedup import (
        JACCARD_DUP_MIN,
        q_jaccard_pairs,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.pipeline import (
        q_split_leakage_safe,
    )

    splits = q_split_leakage_safe(spark, SF_DIR)
    pairs = q_jaccard_pairs(spark, SF_DIR).filter(
        F.col("jaccard") >= JACCARD_DUP_MIN
    )
    straddling = (
        pairs.join(
            splits.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")),
            "doc_a",
        )
        .join(
            splits.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")),
            "doc_b",
        )
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert straddling == 0
    # one split per doc, full corpus covered
    from text_sentiment_analysis_in_hadoop_and_spark_spark.sources.tables import (
        load_table,
    )

    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert splits.count() == n_docs
    assert splits.select("doc_id").distinct().count() == n_docs


def test_ttr_weighted_sample_rate_tracks_ttr(spark):
    """Acceptance is exactly `hash % n < n_distinct`: a doc with all
    tokens distinct (TTR 1.0) is always kept; overall keep rate sits
    near the corpus mean TTR."""
    from pyspark.sql import functions as F

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.pipeline import (
        q_sample_ttr_weighted,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.sources.tables import (
        load_table,
    )

    kept = q_sample_ttr_weighted(spark, SF_DIR)
    # TTR == 1 → n_distinct == n_tokens → hash % n < n always
    assert kept.filter(F.col("n_distinct") == F.col("n_tokens")).count() > 0
    docs = load_table(spark, SF_DIR, "documents")
    toks = F.split(F.col("text"), " ")
    mean_ttr = docs.select(
        F.avg(F.size(F.array_distinct(toks)) / F.size(toks)).alias("m")
    ).first()["m"]
    rate = kept.count() / docs.count()
    assert abs(rate - mean_ttr) < 0.15, (rate, mean_ttr)


def test_global_shuffle_is_a_permutation(spark):
    """(shard, pos) must be a bijection over the corpus: positions
    within each shard are 1..n_shard with no gaps or dupes."""
    from pyspark.sql import functions as F

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.pipeline import (
        q_global_shuffle,
    )

    out = q_global_shuffle(spark, SF_DIR)
    per_shard = out.groupBy("shard").agg(
        F.count("*").alias("n"),
        F.min("pos").alias("lo"),
        F.max("pos").alias("hi"),
        F.countDistinct("pos").alias("nd"),
    )
    bad = per_shard.filter(
        (F.col("lo") != 1) | (F.col("hi") != F.col("n")) | (F.col("nd") != F.col("n"))
    ).count()
    assert bad == 0


def test_incremental_agg_merge_algebra(spark):
    """The base+delta partial merge must equal a one-pass full
    recompute exactly — averaging averages (the classic wrong merge)
    would diverge on unequal split sizes."""
    from pyspark.sql import functions as F

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.pipeline import (
        q_incremental_agg,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.sources.tables import (
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    got = {r["lang"]: r for r in q_incremental_agg(spark, sf).collect()}
    full = {
        r["lang"]: r
        for r in load_table(spark, sf, "documents")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.round(F.avg("n_chars"), 6).alias("mean_chars"),
        )
        .collect()
    }
    assert set(got) == set(full)
    for lang in full:
        assert got[lang]["n_docs"] == full[lang]["n_docs"]
        assert got[lang]["sum_chars"] == full[lang]["sum_chars"]
        assert got[lang]["mean_chars"] == full[lang]["mean_chars"]


def test_shard_skew_report_consistency(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.pipeline import (
        N_SHARDS,
        q_shard_skew_report,
    )

    r = q_shard_skew_report(spark, "/root/testdata/sf0.001").collect()[0]
    assert r["n_shards"] == N_SHARDS
    assert r["min_tokens"] <= r["mean_tokens"] <= r["max_tokens"]
    assert r["max_over_mean"] >= 1.0
    assert r["cv"] >= 0.0


def test_data_card_mass_and_rates(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.pipeline import (
        q_data_card,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.sources.tables import (
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    rows = q_data_card(spark, sf).collect()
    n_docs_total = load_table(spark, sf, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs_total
    for r in rows:
        assert 0.0 <= r["quality_pass_rate"] <= 1.0
        assert 0.0 <= r["exact_dup_rate"] < 1.0
    # dup-mass consistency: the card's implied canonical count equals
    # the exact-dedup operator's keep-list size (sf0.001 happens to
    # have zero exact dups — the consistency check still bites)
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.dedup import (
        q_dedup_keep_first,
    )

    implied_canon = round(
        sum(r["n_docs"] * (1 - r["exact_dup_rate"]) for r in rows)
    )
    assert implied_canon == q_dedup_keep_first(spark, sf).count()


def test_manifest_diff_both_directions_nonzero(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.pipeline import (
        q_manifest_diff,
    )

    out = q_manifest_diff(spark, "/root/testdata/sf0.001").collect()
    assert sum(r["docs_added"] for r in out) > 0
    assert sum(r["docs_removed"] for r in out) > 0
    # a doc can never be both: the residue classes are applied to
    # disjoint snapshot sides, so totals stay within the corpus size
    assert sum(r["docs_added"] + r["docs_removed"] for r in out) <= 500


def test_ffd_dominates_nextfit_and_never_overflows(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.pipeline import (
        PACK_BUDGET,
        q_pack_ffd,
        q_pack_nextfit,
    )

    sf = "/root/testdata/sf0.001"
    ffd = q_pack_ffd(spark, sf).collect()
    nf = q_pack_nextfit(spark, sf).collect()

    def bin_loads(rows):
        loads = {}
        for r in rows:
            loads[(r["bucket"], r["bin"])] = loads.get(
                (r["bucket"], r["bin"]), 0
            ) + r["n_tokens"]
        return loads

    f_loads = bin_loads(ffd)
    # no-overflow: a bin over budget must be a single oversized doc
    from collections import Counter

    per_bin = Counter((r["bucket"], r["bin"]) for r in ffd)
    for k, load in f_loads.items():
        if load > PACK_BUDGET:
            assert per_bin[k] == 1

    # FFD uses <= bins than next-fit in EVERY bucket
    def bins_per_bucket(rows):
        out = {}
        for r in rows:
            out.setdefault(r["bucket"], set()).add(r["bin"])
        return {b: len(s) for b, s in out.items()}

    fb, nb = bins_per_bucket(ffd), bins_per_bucket(nf)
    assert set(fb) == set(nb)
    assert all(fb[b] <= nb[b] for b in fb)
    assert sum(fb.values()) < sum(nb.values())  # strictly better overall

    # serial reference: python FFD over one bucket matches
    import pandas as pd

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.pipeline import (
        _pack_bucket_ffd,
    )

    b0 = [r for r in ffd if r["bucket"] == ffd[0]["bucket"]]
    pdf = pd.DataFrame(
        {
            "doc_id": [r["doc_id"] for r in b0],
            "n_tokens": [r["n_tokens"] for r in b0],
            "bucket": [r["bucket"] for r in b0],
        }
    )
    ref = _pack_bucket_ffd(pdf)
    got = {r["doc_id"]: r["bin"] for r in b0}
    assert got == dict(zip(ref["doc_id"], ref["bin"]))


def test_water_filling_exhausts_budget_exactly(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.pipeline import (
        WF_BUDGET_FRAC,
        q_water_filling,
    )

    sf = "/root/testdata/sf0.001"
    rows = q_water_filling(spark, sf).collect()
    total_demand = sum(r["demand"] for r in rows)
    budget = total_demand // WF_BUDGET_FRAC
    allocated = sum(r["allocation"] for r in rows)
    # allocations sum to the budget (within rounding of the level)
    assert abs(allocated - budget) < 1e-3 * budget
    # capped sources all sit at the same water level (the synthetic
    # corpus' near-uniform sources all cap — the full branch is
    # exercised on the crafted corpus below)
    capped = [r for r in rows if r["fill_frac"] < 1.0]
    assert capped
    assert len({r["allocation"] for r in capped}) == 1


def test_water_filling_satisfies_small_sources_fully(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.pipeline import (
        q_water_filling,
    )

    # demands 4 / 4 / 40 tokens, budget = 24: smalls take 4 each,
    # the big one caps at the 16-token water level
    rows = [
        (1, "a b c d", "tiny1"),
        (2, "a b c d", "tiny2"),
        (3, " ".join(["w"] * 40), "huge"),
    ]
    d = tmp_path / "wf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "source": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        f"{d}/documents.parquet",
    )
    out = {r["source"]: r for r in q_water_filling(spark, str(d)).collect()}
    assert out["tiny1"]["fill_frac"] == 1.0 == out["tiny2"]["fill_frac"]
    assert out["huge"]["allocation"] == 16.0
    assert sum(r["allocation"] for r in out.values()) == 24.0


def test_dsir_weights_favor_target_language(spark):
    """DSIR log-weights are the log-likelihood ratio toward the target
    distribution (the en subcorpus): the mean per-bigram weight of en
    docs must exceed that of every other language, and every doc must
    get exactly one row."""
    import pyspark.sql.functions as F

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.pipeline import (
        q_dsir_weights,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.sources.tables import (
        load_table,
    )

    from conftest import SF_DIR

    w = q_dsir_weights(spark, SF_DIR)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang")
    assert w.count() == docs.count()

    per_lang = {
        r["lang"]: r["m"]
        for r in w.join(docs, "doc_id")
        .filter(F.col("n_bigrams") > 0)
        .groupBy("lang")
        .agg(
            F.avg(F.col("log_weight") / F.col("n_bigrams")).alias("m")
        )
        .collect()
    }
    for lang, m in per_lang.items():
        if lang != "en":
            assert per_lang["en"] > m, (lang, per_lang)


def test_rendezvous_minimal_movement_and_balance(spark):
    """The HRW property: S -> S+1 relocates ~1/(S+1) of keys (never to
    anywhere but the NEW shard), and load stays roughly balanced."""
    from conftest import SF_DIR
    from pyspark.sql import functions as F
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.pipeline import (
        RENDEZVOUS_SHARDS,
        _rendezvous_shard,
        q_rendezvous_shards,
    )
    from text_sentiment_analysis_in_hadoop_and_spark_spark.sources.tables import load_table

    s_now = {
        r["doc_id"]: r["shard"]
        for r in q_rendezvous_shards(spark, SF_DIR).collect()
    }
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    s_next = {
        r["doc_id"]: r["s2"]
        for r in docs.select(
            "doc_id",
            _rendezvous_shard(F.col("doc_id"), RENDEZVOUS_SHARDS + 1)
            .cast("long")
            .alias("s2"),
        ).collect()
    }
    n = len(s_now)
    moved = [d for d in s_now if s_now[d] != s_next[d]]
    # every moved key lands on the NEW shard — the defining property
    for d in moved:
        assert s_next[d] == RENDEZVOUS_SHARDS
    frac = len(moved) / n
    expect = 1.0 / (RENDEZVOUS_SHARDS + 1)
    assert 0.3 * expect <= frac <= 2.0 * expect, frac
    # rough balance: no shard holds more than 3x the fair share
    from collections import Counter

    loads = Counter(s_now.values())
    assert max(loads.values()) <= 3.0 * n / RENDEZVOUS_SHARDS


def test_temperature_mixture_flattens_toward_small_sources(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.pipeline import (
        TEMP_BUDGET_FRAC,
        q_temperature_mixture,
    )

    rows = q_temperature_mixture(spark, SF_DIR).collect()
    assert rows
    total = sum(r["n_avail"] for r in rows)
    # target keep-rate must be non-increasing in source size: that is
    # the whole point of the n^0.5 temperature (uniform-rate thinning
    # would make target_frac constant across sources)
    by_size = sorted(rows, key=lambda r: r["n_avail"])
    for small, big in zip(by_size, by_size[1:]):
        if small["n_avail"] < big["n_avail"]:
            assert small["target_frac"] >= big["target_frac"] - 1e-9
    for r in rows:
        assert 0.0 <= r["realized_frac"] <= 1.0
        assert r["n_kept"] <= r["n_avail"]
        # hash thinning realizes the target rate within sampling noise
        # (binomial: 4σ = 4·sqrt(t(1−t)/n), wide at sf0.001's ~50-doc
        # sources, tight as n grows)
        t = r["target_frac"]
        bound = 4.0 * (t * (1.0 - t) / max(r["n_avail"], 1)) ** 0.5
        assert abs(r["realized_frac"] - t) <= bound + 1e-9
    # the clamped targets stay at or under the global budget
    kept_target = sum(r["target_frac"] * r["n_avail"] for r in rows)
    assert kept_target <= total / TEMP_BUDGET_FRAC + len(rows)


def test_temperature_mixture_is_deterministic(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.pipeline import (
        q_temperature_mixture,
    )

    a = sorted(map(tuple, q_temperature_mixture(spark, SF_DIR).collect()))
    b = sorted(map(tuple, q_temperature_mixture(spark, SF_DIR).collect()))
    assert a == b


def test_length_batching_plan_accounts_every_doc(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.pipeline import (
        BATCH_TOKENS,
        LEN_FENCES,
        q_length_batching,
    )

    rows = q_length_batching(spark, SF_DIR).collect()
    assert rows
    n_docs = spark.read.parquet(SF_DIR + "/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert r["bucket_cap"] in LEN_FENCES
        assert r["batch_size"] == max(1, BATCH_TOKENS // r["bucket_cap"])
        import math

        assert r["n_batches"] == math.ceil(r["n_docs"] / r["batch_size"])
        # padding waste is bounded by the bucket capacity
        assert 0 <= r["pad_tokens"] <= r["n_docs"] * r["bucket_cap"]
        assert 0.0 <= r["pad_frac"] < 1.0
        # nothing truncates below the top fence
        if r["bucket_cap"] < LEN_FENCES[-1]:
            assert r["n_truncated"] == 0


def test_corpus_fingerprint_is_order_invariant_and_change_sensitive(spark):
    from pyspark.sql import functions as F

    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.pipeline import (
        q_corpus_fingerprint,
    )

    rows = {r["source"]: r for r in q_corpus_fingerprint(spark, SF_DIR).collect()}
    assert "__ALL__" in rows
    per_source = {k: v for k, v in rows.items() if k != "__ALL__"}
    assert rows["__ALL__"]["n_docs"] == sum(r["n_docs"] for r in per_source.values())
    # xor of the per-source xors reproduces the global xor
    acc = 0
    for r in per_source.values():
        acc ^= r["xor_hash"]
    assert acc == rows["__ALL__"]["xor_hash"]
    # repartitioned input → identical fingerprint (order invariance)
    import tempfile

    d = tempfile.mkdtemp(prefix="fp_")
    (
        spark.read.parquet(SF_DIR + "/documents.parquet")
        .repartition(13)
        .sortWithinPartitions(F.desc("doc_id"))
        .write.mode("overwrite")
        .parquet(d + "/documents.parquet")
    )
    again = {r["source"]: r for r in q_corpus_fingerprint(spark, d).collect()}
    assert {k: (v["xor_hash"], v["n_docs"]) for k, v in again.items()} == {
        k: (v["xor_hash"], v["n_docs"]) for k, v in rows.items()
    }
    # a single mutated doc flips the global fingerprint
    d2 = tempfile.mkdtemp(prefix="fp2_")
    (
        spark.read.parquet(SF_DIR + "/documents.parquet")
        .withColumn(
            "text",
            F.when(F.col("doc_id") == 0, F.lit("tampered")).otherwise(
                F.col("text")
            ),
        )
        .write.mode("overwrite")
        .parquet(d2 + "/documents.parquet")
    )
    tampered = {r["source"]: r for r in q_corpus_fingerprint(spark, d2).collect()}
    assert tampered["__ALL__"]["xor_hash"] != rows["__ALL__"]["xor_hash"]


def test_packing_scoreboard_floors_and_dominance(spark):
    from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.pipeline import (
        PACK_BUDGET,
        q_packing_efficiency,
    )

    rows = {r["packer"]: r for r in q_packing_efficiency(spark, SF_DIR).collect()}
    assert set(rows) == {"chunked", "nextfit", "ffd"}
    totals = {r["total_tokens"] for r in rows.values()}
    assert len(totals) == 1  # every packer packed the same corpus
    import math

    floor = math.ceil(totals.pop() / PACK_BUDGET)
    for r in rows.values():
        assert r["floor_bins"] == floor
        assert r["n_bins"] >= floor  # nothing beats the LP floor
        assert abs(
            r["overhead_frac"] - round(r["n_bins"] / floor - 1.0, 6)
        ) <= 1e-9
        assert 0.0 < r["mean_fill_frac"] <= 1.0 + 1e-9
    # FFD never uses more bins than next-fit (per-bucket dominance sums)
    assert rows["ffd"]["n_bins"] <= rows["nextfit"]["n_bins"]
