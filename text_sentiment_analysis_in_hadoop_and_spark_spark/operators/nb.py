"""Relational Naive Bayes — the reference's core computation as one
Catalyst DAG.

Reference semantics re-expressed (SURVEY §2.3/§2.4/§2.6):

- A1/A2  corpus counters            /root/reference/Hadoop/NB.java:50,79-85
- A3     per-word conditional counts (the trained model)   NB.java:103-124
- J1     vocab probe → broadcast hash join                 NB.java:161-194,230-243
- M8     multinomial NB scoring, Laplace smoothing         NB.java:148-267
- M9     argmax, ties → NEGATIVE                           NB.java:250,259
- A7/A8  confusion matrix + accuracy                       NB.java:330-341

Deliberate divergence: the reference multiplies raw probabilities and
underflows to 0.0 on long docs (NB.java:224-247).  We score in
log-space (sum of logs) — same argmax on docs that don't underflow,
correct behavior on docs that would.

Scale notes (100 TB posture):
- The model (vocab) is tiny relative to the corpus → ``F.broadcast``
  join; the probe side stays a narrow map stage, no shuffle.
- Corpus scalars (6 numbers) are collected to the driver and inlined
  as literals — the reference's Hadoop-Counter→Configuration relay
  (NB.java:305-316) with one tiny Spark job instead.
- Everything else is partial-aggregating hash aggregation; no Python
  touches a row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import (
    DOCS_CTE,
    TEST_TOKENS_CTE,
    TOKENS_CTE,
    TRAIN_TOKENS_CTE,
    doc_tokens,
    labeled_docs,
    register_cache,
    test_filter,
    train_filter,
    with_ctes,
)

WS_SPLIT = r"\s+"  # word-count tokenization, NB.java:80 split("\\s+")


# --------------------------------------------------------------------------
# building blocks (Spark side)
# --------------------------------------------------------------------------


def vocab_counts(train_tokens: DataFrame) -> DataFrame:
    """A3 — per-word conditional counts (NB.java:103-124).  Catalyst
    runs this as partial+final hash aggregate (the reference needed an
    explicit combiner for the same effect)."""
    return train_tokens.groupBy("word").agg(
        F.sum(F.when(F.col("label") == 1, 1).otherwise(0))
        .cast("long")
        .alias("pos_count"),
        F.sum(F.when(F.col("label") == 0, 1).otherwise(0))
        .cast("long")
        .alias("neg_count"),
    )


def corpus_stats_df(train_docs: DataFrame, train_tokens: DataFrame) -> DataFrame:
    """A1/A2 + FEATURES_SIZE counters (NB.java:50,79-85,107).

    Quirk preserved: per-class word totals are counted *before* the
    empty-text check, and ``"".split("\\s+")`` has length 1, so a doc
    that cleans to empty still contributes 1 (SURVEY §2.3 A2)."""
    wc = F.size(F.split(F.col("text"), WS_SPLIT))
    stats = train_docs.agg(
        F.count("*").cast("long").alias("tweets"),
        F.sum(F.when(F.col("label") == 1, 1).otherwise(0))
        .cast("long")
        .alias("pos_tweets"),
        F.sum(F.when(F.col("label") == 0, 1).otherwise(0))
        .cast("long")
        .alias("neg_tweets"),
        F.sum(F.when(F.col("label") == 1, wc).otherwise(0))
        .cast("long")
        .alias("pos_words"),
        F.sum(F.when(F.col("label") == 0, wc).otherwise(0))
        .cast("long")
        .alias("neg_words"),
    )
    vsize = train_tokens.agg(
        F.countDistinct("word").cast("long").alias("vocab_size")
    )
    return stats.crossJoin(vsize)


# Model + stats memoized per (session, sf_dir): score/predict/confusion/
# accuracy all retrain otherwise (judge finding r1 — the clean+tokenize+
# train DAG ran ~3× per query and once per query entry).
_MODEL_CACHE: dict[tuple[str, str], tuple[DataFrame, dict]] = register_cache({})


def model_for_docs(docs: DataFrame) -> tuple[DataFrame, dict]:
    """Train over an arbitrary cleaned-docs frame (doc_id, label, text):
    returns (model_df(word, lpw_pos, lpw_neg), stats dict).

    ``lpw_c = ln((count_c(w)+1) / (words_c + V))`` — Laplace-smoothed
    multinomial likelihood (NB.java:190-194) in log-space.  The six
    corpus scalars are collected to the driver (the reference's
    Hadoop-Counter→Configuration relay, NB.java:305-316)."""
    train_docs = docs.filter(train_filter())
    train_tokens = doc_tokens(train_docs)
    stats = corpus_stats_df(train_docs, train_tokens).collect()[0].asDict()
    v = stats["vocab_size"]
    model = vocab_counts(train_tokens).select(
        "word",
        F.log((F.col("pos_count") + 1) / F.lit(stats["pos_words"] + v)).alias(
            "lpw_pos"
        ),
        F.log((F.col("neg_count") + 1) / F.lit(stats["neg_words"] + v)).alias(
            "lpw_neg"
        ),
    )
    return model, stats


def nb_model(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, dict]:
    """Memoized :func:`model_for_docs` over the parquet documents table."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _MODEL_CACHE.get(key)
    if hit is not None:
        return hit
    model, stats = model_for_docs(labeled_docs(spark, sf_dir))
    model = model.cache()
    _MODEL_CACHE[key] = (model, stats)
    return model, stats


def scores_for_docs(docs: DataFrame, model: DataFrame, stats: dict) -> DataFrame:
    """Score test docs: broadcast-join tokens against the model (J1 —
    the reference's O(doc·V) HashMap probe, NB.java:230-243, becomes a
    broadcast hash join), sum logs per doc, add the class prior.
    Unknown words are skipped (inner-join ≡ the reference's semi-join
    semantics); docs with no known words fall back to the prior.

    Docs that clean to empty are scored too: the reference classifies
    every test tweet (Hadoop/NB.java:482-521 — an empty tweet keeps the
    1.0 product, scores prior-only, tie → NEGATIVE) and counts it in
    the confusion counters, so no nonempty filter here (ADVICE r1)."""
    test_docs = docs.filter(test_filter())
    ttok = doc_tokens(test_docs).select("doc_id", "word")
    scored = (
        ttok.join(F.broadcast(model), "word")
        .groupBy("doc_id")
        .agg(F.sum("lpw_pos").alias("s_pos"), F.sum("lpw_neg").alias("s_neg"))
    )
    prior_pos = F.log(F.lit(stats["pos_tweets"] / stats["tweets"]))
    prior_neg = F.log(F.lit(stats["neg_tweets"] / stats["tweets"]))
    return (
        test_docs.select("doc_id", "label")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            "label",
            (prior_pos + F.coalesce(F.col("s_pos"), F.lit(0.0))).alias("pos_score"),
            (prior_neg + F.coalesce(F.col("s_neg"), F.lit(0.0))).alias("neg_score"),
        )
    )


def nb_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    model, stats = nb_model(spark, sf_dir)
    return scores_for_docs(labeled_docs(spark, sf_dir), model, stats)


def nb_predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9 argmax: pos > neg → 1 else 0 (ties → negative, NB.java:250,259)."""
    s = nb_scores(spark, sf_dir)
    return s.select(
        "doc_id",
        "label",
        F.when(F.col("pos_score") > F.col("neg_score"), 1)
        .otherwise(0)
        .cast("int")
        .alias("prediction"),
    )


# --------------------------------------------------------------------------
# Fidelity mode — the reference's raw-probability scoring, underflow and
# all (NB.java:224-267).  The default engine path scores in log-space
# (correct on long docs); this mode reproduces the reference bit-for-bit
# for users A/B-ing against its outputs: per-token probabilities are
# multiplied as raw doubles IN DOCUMENT ORDER (float multiplication is
# order-sensitive), the class prior multiplies LAST, and a long doc
# underflows both products to 0.0 → Double.compare tie → NEGATIVE.
# --------------------------------------------------------------------------

_FID_CACHE: dict[tuple[str, str], DataFrame] = register_cache({})


def nb_model_fidelity(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, dict]:
    """Raw smoothed probabilities ``(cnt+1)/(words_c + V)`` as doubles
    (NB.java:190-193) — NOT exp(log-model), which would differ in the
    last bits from the reference's direct division."""
    key = (spark.sparkContext.applicationId, sf_dir)
    _, stats = nb_model(spark, sf_dir)
    model = _FID_CACHE.get(key)
    if model is None:
        v = stats["vocab_size"]
        docs = labeled_docs(spark, sf_dir)
        train_tokens = doc_tokens(docs.filter(train_filter()))
        model = vocab_counts(train_tokens).select(
            "word",
            (
                (F.col("pos_count") + 1)
                / F.lit(float(stats["pos_words"] + v))
            ).alias("pw_pos"),
            (
                (F.col("neg_count") + 1)
                / F.lit(float(stats["neg_words"] + v))
            ).alias("pw_neg"),
        ).cache()
        _FID_CACHE[key] = model
    return model, stats


def _ordered_product(pos_col: str, val_col: str) -> Column:
    """Left-fold product of ``val_col`` in ascending ``pos_col`` order —
    the exact multiplication sequence of the reference's per-token loop
    (NB.java:230-243).  collect_list order is nondeterministic, so sort
    (position, value) structs first; positions are unique per doc."""
    ordered = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(F.col(pos_col).alias("p"), F.col(val_col).alias("v"))
            )
        ),
        lambda s: s["v"],
    )
    return F.aggregate(ordered, F.lit(1.0), lambda acc, x: acc * x)


def nb_scores_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, label, pos_prob, neg_prob) with the reference's raw
    products: in-vocab tokens multiply in doc order, unknown words are
    skipped, empty docs never enter the loop (product stays 1.0), and
    the prior multiplies last (NB.java:224-247)."""
    from ..functions.cleaning import nonempty

    model, stats = nb_model_fidelity(spark, sf_dir)
    docs = labeled_docs(spark, sf_dir)
    test_docs = docs.filter(test_filter())
    toks = test_docs.filter(nonempty(F.col("text"))).select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word"),
    )
    prods = (
        toks.join(F.broadcast(model), "word")
        .groupBy("doc_id")
        .agg(
            _ordered_product("pos", "pw_pos").alias("prod_pos"),
            _ordered_product("pos", "pw_neg").alias("prod_neg"),
        )
    )
    prior_pos = F.lit(stats["pos_tweets"] / stats["tweets"])
    prior_neg = F.lit(stats["neg_tweets"] / stats["tweets"])
    return (
        test_docs.select("doc_id", "label")
        .join(prods, "doc_id", "left")
        .select(
            "doc_id",
            "label",
            (F.coalesce(F.col("prod_pos"), F.lit(1.0)) * prior_pos).alias(
                "pos_prob"
            ),
            (F.coalesce(F.col("prod_neg"), F.lit(1.0)) * prior_neg).alias(
                "neg_prob"
            ),
        )
    )


def nb_predictions_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax on the RAW products (NB.java:250: ``Double.compare(pos,
    neg) > 0``) — an underflowed doc compares 0.0 vs 0.0 → NEGATIVE.
    ``underflow`` flags those docs (engine observability; the reference
    silently misclassifies them)."""
    s = nb_scores_fidelity(spark, sf_dir)
    return s.select(
        "doc_id",
        "label",
        F.when(F.col("pos_prob") > F.col("neg_prob"), 1)
        .otherwise(0)
        .cast("int")
        .alias("prediction"),
        ((F.col("pos_prob") == 0.0) & (F.col("neg_prob") == 0.0)).alias(
            "underflow"
        ),
    )


# --------------------------------------------------------------------------
# queries() entries
# --------------------------------------------------------------------------


def q_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    return labeled_docs(spark, sf_dir).select(
        "doc_id", "label", F.col("text").alias("cleaned")
    )


def q_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_tokens(labeled_docs(spark, sf_dir))


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = labeled_docs(spark, sf_dir)
    train_docs = docs.filter(train_filter())
    return corpus_stats_df(train_docs, doc_tokens(train_docs))


def q_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = labeled_docs(spark, sf_dir)
    return vocab_counts(doc_tokens(docs.filter(train_filter())))


def q_nb_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    model, _ = nb_model(spark, sf_dir)
    return model.select(
        "word",
        F.round("lpw_pos", 6).alias("lpw_pos"),
        F.round("lpw_neg", 6).alias("lpw_neg"),
    )


def q_nb_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = nb_scores(spark, sf_dir)
    return s.select(
        "doc_id",
        "label",
        F.round("pos_score", 6).alias("pos_score"),
        F.round("neg_score", 6).alias("neg_score"),
    )


def q_nb_predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return nb_predictions(spark, sf_dir)


def q_nb_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — confusion matrix as a tall table (NB.java:250-267,330-341)."""
    return (
        nb_predictions(spark, sf_dir)
        .groupBy("label", "prediction")
        .agg(F.count("*").cast("long").alias("n"))
    )


def q_nb_f1_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/M7 — accuracy + weighted precision/recall/F1, the Spark
    reference's MulticlassMetrics surface (NB.scala:96-99) as one
    hash aggregate."""
    from .metrics import weighted_metrics

    return weighted_metrics(nb_predictions(spark, sf_dir))


def q_nb_predictions_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return nb_predictions_fidelity(spark, sf_dir)


def _output_rows(preds: DataFrame, docs: DataFrame) -> DataFrame:
    """S6 row shape (NB.java:257,266,302): ``tweet_id@cleaned_text``
    TAB ``POSITIVE|NEGATIVE``."""
    return preds.join(docs.select("doc_id", "text"), "doc_id").select(
        F.concat(
            F.col("doc_id").cast("string"), F.lit("@"), F.col("text")
        ).alias("key"),
        F.when(F.col("prediction") == 1, "POSITIVE")
        .otherwise("NEGATIVE")
        .alias("sentiment"),
    )


def output_for_docs(docs: DataFrame) -> DataFrame:
    """The reference's whole front door over an arbitrary cleaned-docs
    frame: train (75% split) → score the 25% test split → argmax →
    ``id@text \\t sentiment`` rows — one Catalyst DAG, used by the
    end-to-end CSV pipeline (sources/csv.py: csv_nb_frontdoor)."""
    model, stats = model_for_docs(docs)
    scores = scores_for_docs(docs, model, stats)
    preds = scores.select(
        "doc_id",
        "label",
        F.when(F.col("pos_score") > F.col("neg_score"), 1)
        .otherwise(0)
        .cast("int")
        .alias("prediction"),
    )
    return _output_rows(preds, docs)


def q_nb_output(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's user-visible output rows (NB.java:257,266,302).
    Feed this to sources.sinks.write_text for the byte-identical
    text-dir layout; tests/test_io.py round-trips it."""
    preds = nb_predictions(spark, sf_dir)
    docs = labeled_docs(spark, sf_dir)
    return _output_rows(preds, docs)


def q_nb_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — accuracy = (tp+tn)/total (NB.java:341)."""
    p = nb_predictions(spark, sf_dir)
    return p.agg(
        F.round(
            F.sum(F.when(F.col("label") == F.col("prediction"), 1).otherwise(0))
            / F.count("*"),
            6,
        ).alias("accuracy"),
        F.count("*").cast("long").alias("n_test"),
    )


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

_VOCAB_CTE = (
    "vocab AS (SELECT word, "
    "CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS pos_count, "
    "CAST(sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg_count "
    "FROM train_tokens GROUP BY word)"
)

_STATS_CTE = (
    "stats AS (SELECT CAST(count(*) AS BIGINT) AS tweets, "
    "CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS pos_tweets, "
    "CAST(sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg_tweets, "
    "CAST(sum(CASE WHEN label = 1 THEN len(regexp_split_to_array(text, '\\s+')) "
    "ELSE 0 END) AS BIGINT) AS pos_words, "
    "CAST(sum(CASE WHEN label = 0 THEN len(regexp_split_to_array(text, '\\s+')) "
    "ELSE 0 END) AS BIGINT) AS neg_words "
    "FROM docs WHERE doc_id % 8 >= 2)"
)

_VSIZE_CTE = (
    "vsize AS (SELECT CAST(count(DISTINCT word) AS BIGINT) AS vocab_size "
    "FROM train_tokens)"
)

_MODEL_CTE = (
    "model AS (SELECT word, "
    "ln((pos_count + 1) / (stats.pos_words + vsize.vocab_size)) AS lpw_pos, "
    "ln((neg_count + 1) / (stats.neg_words + vsize.vocab_size)) AS lpw_neg "
    "FROM vocab, stats, vsize)"
)

_SCORED_CTE = (
    "scored AS (SELECT t.doc_id, sum(m.lpw_pos) AS s_pos, sum(m.lpw_neg) AS s_neg "
    "FROM test_tokens t JOIN model m USING (word) GROUP BY t.doc_id)"
)

_TESTD_CTE = (
    "testd AS (SELECT doc_id, label FROM docs WHERE doc_id % 8 < 2)"
)

_SCORES_SELECT = (
    "SELECT d.doc_id, d.label, "
    "ln(stats.pos_tweets / stats.tweets) + coalesce(s.s_pos, 0) AS pos_score, "
    "ln(stats.neg_tweets / stats.tweets) + coalesce(s.s_neg, 0) AS neg_score "
    "FROM testd d LEFT JOIN scored s USING (doc_id), stats"
)

def _nb_prelude(docs_cte: str) -> tuple[str, ...]:
    """The full train→score CTE chain over a caller-supplied ``docs``
    CTE — every downstream CTE references only ``docs(doc_id, label,
    text)``, so the same SQL trains on parquet docs or on CSV-parsed
    docs (the front-door pipeline in sources/csv.py)."""
    return (
        docs_cte,
        TOKENS_CTE,
        TRAIN_TOKENS_CTE,
        TEST_TOKENS_CTE,
        _VOCAB_CTE,
        _STATS_CTE,
        _VSIZE_CTE,
        _MODEL_CTE,
        _SCORED_CTE,
        _TESTD_CTE,
    )


def preds_sql_for(docs_cte: str) -> str:
    return (
        with_ctes(*_nb_prelude(docs_cte), "scores AS (" + _SCORES_SELECT + ")")
        + "SELECT doc_id, label, CAST(CASE WHEN pos_score > neg_score THEN 1 "
        "ELSE 0 END AS INTEGER) AS prediction FROM scores"
    )


def output_oracle_sql(docs_cte: str) -> str:
    """``nb_output``-shaped oracle (id@text, sentiment) over a custom
    docs CTE — shared by nb_output and the CSV front door."""
    return (
        "WITH preds AS (" + preds_sql_for(docs_cte) + "), " + docs_cte + " "
        "SELECT CAST(p.doc_id AS VARCHAR) || '@' || d.text AS key, "
        "CASE WHEN p.prediction = 1 THEN 'POSITIVE' ELSE 'NEGATIVE' END "
        "AS sentiment FROM preds p JOIN docs d USING (doc_id)"
    )


_NB_PRELUDE = _nb_prelude(DOCS_CTE)

_PREDS_SQL = preds_sql_for(DOCS_CTE)

# --- fidelity-mode oracle: raw double products in document order ----------

_FID_MODEL_CTE = (
    "fid_model AS (SELECT word, "
    "(pos_count + 1) / CAST(stats.pos_words + vsize.vocab_size AS DOUBLE) "
    "AS pw_pos, "
    "(neg_count + 1) / CAST(stats.neg_words + vsize.vocab_size AS DOUBLE) "
    "AS pw_neg FROM vocab, stats, vsize)"
)

# zip-unnest gives (position, word) pairs; position order reproduces the
# reference's per-token multiplication sequence
_FID_TOK_CTE = (
    "fid_tok AS (SELECT doc_id, unnest(range(1, len(arr) + 1)) AS pos, "
    "unnest(arr) AS word FROM (SELECT doc_id, string_split(text, ' ') AS arr "
    "FROM docs WHERE doc_id % 8 < 2 AND trim(text) <> ''))"
)

_FID_PROD_CTE = (
    "fid_prod AS (SELECT t.doc_id, "
    "list_reduce([CAST(1.0 AS DOUBLE)] || list(m.pw_pos ORDER BY t.pos), "
    "(a, b) -> a * b) AS prod_pos, "
    "list_reduce([CAST(1.0 AS DOUBLE)] || list(m.pw_neg ORDER BY t.pos), "
    "(a, b) -> a * b) AS prod_neg "
    "FROM fid_tok t JOIN fid_model m USING (word) GROUP BY t.doc_id)"
)

_FID_POS = (
    "coalesce(p.prod_pos, 1.0) * (CAST(stats.pos_tweets AS DOUBLE) / stats.tweets)"
)
_FID_NEG = (
    "coalesce(p.prod_neg, 1.0) * (CAST(stats.neg_tweets AS DOUBLE) / stats.tweets)"
)

_FID_PRED_SQL = (
    with_ctes(
        DOCS_CTE, TOKENS_CTE, TRAIN_TOKENS_CTE, _VOCAB_CTE, _STATS_CTE,
        _VSIZE_CTE, _FID_MODEL_CTE, _FID_TOK_CTE, _FID_PROD_CTE, _TESTD_CTE,
    )
    + "SELECT d.doc_id, d.label, "
    f"CAST(CASE WHEN {_FID_POS} > {_FID_NEG} THEN 1 ELSE 0 END AS INTEGER) "
    "AS prediction, "
    f"({_FID_POS} = 0 AND {_FID_NEG} = 0) AS underflow "
    "FROM testd d LEFT JOIN fid_prod p USING (doc_id), stats"
)

ORACLES: dict[str, str] = {
    "nb_clean_text": with_ctes(DOCS_CTE)
    + "SELECT doc_id, label, text AS cleaned FROM docs",
    "nb_tokens": with_ctes(DOCS_CTE, TOKENS_CTE)
    + "SELECT doc_id, label, word FROM tokens",
    "nb_corpus_stats": with_ctes(
        DOCS_CTE, TOKENS_CTE, TRAIN_TOKENS_CTE, _STATS_CTE, _VSIZE_CTE
    )
    + "SELECT stats.*, vsize.vocab_size FROM stats, vsize",
    "nb_vocab": with_ctes(DOCS_CTE, TOKENS_CTE, TRAIN_TOKENS_CTE, _VOCAB_CTE)
    + "SELECT * FROM vocab",
    "nb_model": with_ctes(
        DOCS_CTE, TOKENS_CTE, TRAIN_TOKENS_CTE, _VOCAB_CTE, _STATS_CTE,
        _VSIZE_CTE, _MODEL_CTE,
    )
    + "SELECT word, round(lpw_pos, 6) AS lpw_pos, round(lpw_neg, 6) AS lpw_neg "
    "FROM model",
    "nb_scores": (
        with_ctes(*_NB_PRELUDE, "scores AS (" + _SCORES_SELECT + ")")
        + "SELECT doc_id, label, round(pos_score, 6) AS pos_score, "
        "round(neg_score, 6) AS neg_score FROM scores"
    ),
    "nb_predictions": _PREDS_SQL,
    "nb_predictions_fidelity": _FID_PRED_SQL,
    "nb_output": output_oracle_sql(DOCS_CTE),
    "nb_confusion": (
        "WITH preds AS (" + _PREDS_SQL + ") "
        "SELECT label, prediction, CAST(count(*) AS BIGINT) AS n "
        "FROM preds GROUP BY label, prediction"
    ),
    "nb_accuracy": (
        "WITH preds AS (" + _PREDS_SQL + ") "
        "SELECT round(sum(CASE WHEN label = prediction THEN 1 ELSE 0 END) "
        "/ count(*), 6) AS accuracy, CAST(count(*) AS BIGINT) AS n_test "
        "FROM preds"
    ),
}


def _add_f1_oracle() -> None:
    from .metrics import weighted_metrics_sql

    ORACLES["nb_f1_metrics"] = weighted_metrics_sql(_PREDS_SQL)


_add_f1_oracle()

QUERIES = {
    "nb_clean_text": q_clean_text,
    "nb_tokens": q_tokens,
    "nb_corpus_stats": q_corpus_stats,
    "nb_vocab": q_vocab,
    "nb_model": q_nb_model,
    "nb_scores": q_nb_scores,
    "nb_predictions": q_nb_predictions,
    "nb_predictions_fidelity": q_nb_predictions_fidelity,
    "nb_output": q_nb_output,
    "nb_confusion": q_nb_confusion,
    "nb_accuracy": q_nb_accuracy,
    "nb_f1_metrics": q_nb_f1_metrics,
}


# --- score calibration (r5, late namespace) ---------------------------

CALIB_FENCES = (1.0, 2.0, 4.0, 8.0)  # |log-odds margin| bucket edges


def q_nb_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability of the hand-rolled NB: accuracy per |log-odds
    margin| bucket.  A calibrated scorer's accuracy should rise with
    the margin; a flat curve means the log-odds carry no confidence
    signal and downstream abstention thresholds are meaningless.
    This is the model-eval twin of sim_cosine_calibration, applied to
    the flagship classifier.

    Determinism: buckets and predictions BOTH derive from the
    6-rounded scores (the same pre-round-then-derive discipline as
    the parity sort keys), so bucket membership cannot straddle an
    engine-specific float edge.  One pass over the memoized scores;
    the rollup is bucket-bounded."""
    s = q_nb_scores(spark, sf_dir)
    margin = F.col("pos_score") - F.col("neg_score")
    absm = F.abs(margin)
    bucket = (
        F.when(absm < CALIB_FENCES[0], F.lit("0-1"))
        .when(absm < CALIB_FENCES[1], F.lit("1-2"))
        .when(absm < CALIB_FENCES[2], F.lit("2-4"))
        .when(absm < CALIB_FENCES[3], F.lit("4-8"))
        .otherwise(F.lit("8+"))
    )
    pred = (margin > 0).cast("int")
    return (
        s.select(
            bucket.alias("margin_bucket"),
            (pred == F.col("label")).cast("double").alias("hit"),
            absm.alias("absm"),
            pred.cast("double").alias("p"),
        )
        .groupBy("margin_bucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.avg("hit"), 6).alias("accuracy"),
            F.round(F.avg("absm"), 6).alias("mean_abs_margin"),
            F.round(F.avg("p"), 6).alias("frac_pos_pred"),
        )
    )


def _calibration_sql() -> str:
    fences = CALIB_FENCES
    return (
        "WITH sc AS (" + ORACLES["nb_scores"] + "), "
        "m AS (SELECT label, pos_score - neg_score AS margin, "
        "abs(pos_score - neg_score) AS absm FROM sc), "
        "bk AS (SELECT CASE "
        f"WHEN absm < {fences[0]} THEN '0-1' "
        f"WHEN absm < {fences[1]} THEN '1-2' "
        f"WHEN absm < {fences[2]} THEN '2-4' "
        f"WHEN absm < {fences[3]} THEN '4-8' "
        "ELSE '8+' END AS margin_bucket, "
        "CASE WHEN margin > 0 THEN 1 ELSE 0 END AS pred, label, absm "
        "FROM m) "
        "SELECT margin_bucket, CAST(count(*) AS BIGINT) AS n, "
        "round(avg(CASE WHEN pred = label THEN 1.0 ELSE 0.0 END), 6) "
        "AS accuracy, "
        "round(avg(absm), 6) AS mean_abs_margin, "
        "round(avg(CAST(pred AS DOUBLE)), 6) AS frac_pos_pred "
        "FROM bk GROUP BY margin_bucket"
    )


# registered via the _nb_late namespace in __spark_entry__ (the
# window policy: mid-round additions to early modules must land past
# the driver's 50-query cap)
QUERIES_LATE = {"nb_calibration": q_nb_calibration}
ORACLES_LATE = {"nb_calibration": _calibration_sql()}


# --- ROC AUC via the rank identity (r5) ------------------------------


def q_nb_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-free ranking quality of the hand-rolled NB scorer:
    ROC AUC computed through the Mann-Whitney identity
    AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻) with midranks, so ties (docs
    the model cannot separate) count half — the accuracy/F1 metrics
    judge ONE threshold, this judges the whole score ordering (and
    is the number that survives class imbalance).

    Scale shape: ranks come from the margin HISTOGRAM (one margin-
    keyed partial agg + a cumulative window over the distinct-margin
    artifact), never a global sort of row-level scores; doubled-rank
    integer arithmetic to the final division (the
    ``events_mwu_test`` discipline).  Margins subtract two already-
    6-rounded doubles, so both engines bucket identically."""
    sc = q_nb_scores(spark, sf_dir)
    m = sc.select(
        "label", (F.col("pos_score") - F.col("neg_score")).alias("margin")
    )
    hist = m.groupBy("margin").agg(
        F.sum(F.when(F.col("label") == 1, 1).otherwise(0))
        .cast("long")
        .alias("np"),
        F.sum(F.when(F.col("label") == 0, 1).otherwise(0))
        .cast("long")
        .alias("nn"),
        F.count("*").cast("long").alias("t"),
    )
    w = Window.orderBy("margin").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = hist.withColumn(
        "rank2",
        2 * F.coalesce(F.sum("t").over(w), F.lit(0)) + F.col("t") + 1,
    )
    agg = ranked.agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum("nn").cast("long").alias("n_neg"),
        F.sum(F.col("np") * F.col("rank2")).cast("long").alias("r2_pos"),
    )
    auc = (
        (F.col("r2_pos") - F.col("n_pos") * (F.col("n_pos") + 1))
        .cast("double")
        / (2.0 * F.col("n_pos") * F.col("n_neg"))
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.round(auc, 6).alias("auc"),
        F.round(2.0 * auc - 1.0, 6).alias("gini"),
    )


def _auc_sql() -> str:
    return (
        "WITH sc AS (" + ORACLES["nb_scores"] + "), "
        "m AS (SELECT label, pos_score - neg_score AS margin FROM sc), "
        "hist AS (SELECT margin, "
        "CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS np, "
        "CAST(sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nn, "
        "CAST(count(*) AS BIGINT) AS t FROM m GROUP BY margin), "
        "ranked AS (SELECT *, 2 * coalesce(sum(t) OVER (ORDER BY margin "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 "
        "AS rank2 FROM hist), "
        "agg AS (SELECT CAST(sum(np) AS BIGINT) AS n_pos, "
        "CAST(sum(nn) AS BIGINT) AS n_neg, "
        "CAST(sum(np * rank2) AS BIGINT) AS r2_pos FROM ranked) "
        "SELECT n_pos, n_neg, "
        "round(CAST(r2_pos - n_pos * (n_pos + 1) AS DOUBLE) / "
        "(2.0 * n_pos * n_neg), 6) AS auc, "
        "round(CAST(r2_pos - n_pos * (n_pos + 1) AS DOUBLE) / "
        "(1.0 * n_pos * n_neg) - 1.0, 6) AS gini "
        "FROM agg"
    )


QUERIES_LATE["nb_auc"] = q_nb_auc
ORACLES_LATE["nb_auc"] = _auc_sql()


# --- learning curve over deterministic train fractions (r5) ----------

CURVE_QUARTERS = (1, 2, 3, 4)


def q_nb_learning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy vs training-set size for the hand-rolled NB: the model
    retrains on hash-deterministic 25/50/75/100% subsets of the train
    split and scores the SAME fixed test split — the curve that
    answers "is this model data-starved or saturated" before anyone
    pays for more labels.  Deterministic fractions (portable hash of
    doc_id mod 4) are nested — each quarter's train set contains the
    previous one's — so the curve is monotone in DATA, not in
    sampling noise.

    Shape: four trainings of the same broadcast-model pipeline over
    shrinking inputs (each is the S4/S5 pattern: vocab partial-agg +
    six-scalar collect); the test side and its tokens are computed
    from the shared cleaned-docs memo.  The oracle re-parameterizes
    the ONE nb prelude with each fraction filter — same SQL text,
    four instantiations."""
    from ..functions.hashing import hex32

    docs = labeled_docs(spark, sf_dir)
    frac = F.pmod(hex32(F.col("doc_id").cast("string")), 4)

    # r12 fusion (guide §1.2/§2.4): the four per-quarter trainings
    # (each a stats-collect job + a vocab rollup + a broadcast scoring
    # join) collapse into ONE training rollup and ONE scoring pass.
    # Quarters are NESTED (frac < q), so the per-quarter counts are
    # conditional sums over the same token rows, the per-quarter vocab
    # is "any occurrence below q", and the model table carries the four
    # (lpw_pos, lpw_neg) pairs side by side.  Counts, denominators and
    # priors are bit-identical to the per-arm build.
    train = docs.filter(train_filter())
    ttrain = doc_tokens(train)
    wf = ttrain.groupBy("word").agg(
        *[
            F.sum(
                F.when((F.col("label") == lbl) & (frac < q), 1).otherwise(0)
            )
            .cast("long")
            .alias(f"{name}_{q}")
            for q in CURVE_QUARTERS
            for lbl, name in ((1, "pos"), (0, "neg"))
        ]
    )
    wc = F.size(F.split(F.col("text"), WS_SPLIT))
    stats_row = train.agg(
        *[
            F.sum(F.when(frac < q, contrib).otherwise(0))
            .cast("long")
            .alias(f"{name}_{q}")
            for q in CURVE_QUARTERS
            for contrib, name in (
                (F.lit(1), "tweets"),
                (F.when(F.col("label") == 1, 1).otherwise(0), "pos_tweets"),
                (F.when(F.col("label") == 0, 1).otherwise(0), "neg_tweets"),
                (F.when(F.col("label") == 1, wc).otherwise(0), "pos_words"),
                (F.when(F.col("label") == 0, wc).otherwise(0), "neg_words"),
            )
        ]
    )
    vocab_row = wf.agg(
        *[
            F.sum(
                ((F.col(f"pos_{q}") + F.col(f"neg_{q}")) > 0).cast("long")
            )
            .cast("long")
            .alias(f"v_{q}")
            for q in CURVE_QUARTERS
        ]
    )
    srow = stats_row.crossJoin(vocab_row).collect()[0].asDict()

    model_cols = []
    for q in CURVE_QUARTERS:
        pos_den = srow[f"pos_words_{q}"] + srow[f"v_{q}"]
        neg_den = srow[f"neg_words_{q}"] + srow[f"v_{q}"]
        model_cols.extend(
            [
                ((F.col(f"pos_{q}") + F.col(f"neg_{q}")) > 0).alias(
                    f"in_{q}"
                ),
                F.log((F.col(f"pos_{q}") + 1) / F.lit(pos_den)).alias(
                    f"lpw_pos_{q}"
                ),
                F.log((F.col(f"neg_{q}") + 1) / F.lit(neg_den)).alias(
                    f"lpw_neg_{q}"
                ),
            ]
        )
    model = wf.select("word", *model_cols)

    test_docs = docs.filter(test_filter())
    ttok = doc_tokens(test_docs).select("doc_id", "word")
    scored = (
        ttok.join(F.broadcast(model), "word")
        .groupBy("doc_id")
        .agg(
            *[
                F.sum(
                    F.when(F.col(f"in_{q}"), F.col(f"lpw_{side}_{q}"))
                ).alias(f"s_{side}_{q}")
                for q in CURVE_QUARTERS
                for side in ("pos", "neg")
            ]
        )
    )
    sc = test_docs.select("doc_id", "label").join(scored, "doc_id", "left")
    acc_cols = []
    for q in CURVE_QUARTERS:
        tw = srow[f"tweets_{q}"]
        prior_pos = F.log(
            F.lit(srow[f"pos_tweets_{q}"] / tw if tw else 0.0)
        )
        prior_neg = F.log(
            F.lit(srow[f"neg_tweets_{q}"] / tw if tw else 0.0)
        )
        pred = (
            (prior_pos + F.coalesce(F.col(f"s_pos_{q}"), F.lit(0.0)))
            > (prior_neg + F.coalesce(F.col(f"s_neg_{q}"), F.lit(0.0)))
        ).cast("int")
        acc_cols.append(
            F.round(
                F.sum((pred == F.col("label")).cast("int")) / F.count("*"),
                6,
            ).alias(f"acc_{q}")
        )
    agg1 = sc.agg(F.count("*").cast("long").alias("n_test"), *acc_cols)
    # ONE aggregate evaluation → four output rows via explode (no
    # re-computation per arm, no cache needed)
    arms = F.array(
        *[
            F.struct(
                F.lit(q).cast("long").alias("train_quarter"),
                F.lit(srow[f"tweets_{q}"]).cast("long").alias("n_train"),
                F.col(f"acc_{q}").alias("accuracy"),
                F.col("n_test").alias("n_test"),
            )
            for q in CURVE_QUARTERS
        ]
    )
    return agg1.select(F.explode(arms).alias("s")).select("s.*")


def _learning_curve_sql() -> str:
    from ..functions.hashing import hex32_sql

    h = hex32_sql("CAST(doc_id AS VARCHAR)")
    base = preds_sql_for(DOCS_CTE)
    assert base.count("doc_id % 8 >= 2") == 2
    parts = []
    for q in CURVE_QUARTERS:
        sql_q = base.replace(
            "doc_id % 8 >= 2",
            f"doc_id % 8 >= 2 AND {h} % 4 < {q}",
        )
        # n_train replays the same cleaned-docs + fraction filter the
        # stats CTE uses (count of train docs post-cleaning)
        ntrain = (
            "WITH " + DOCS_CTE + " SELECT CAST(count(*) AS BIGINT) "
            f"FROM docs WHERE doc_id % 8 >= 2 AND {h} % 4 < {q}"
        )
        parts.append(
            f"SELECT CAST({q} AS BIGINT) AS train_quarter, "
            f"({ntrain}) AS n_train, "
            "round(sum(CASE WHEN label = prediction THEN 1 ELSE 0 END) "
            "/ count(*), 6) AS accuracy, "
            "CAST(count(*) AS BIGINT) AS n_test "
            f"FROM ({sql_q}) preds"
        )
    return " UNION ALL ".join(parts)


QUERIES_LATE["nb_learning_curve"] = q_nb_learning_curve
ORACLES_LATE["nb_learning_curve"] = _learning_curve_sql()


# --- decile lift / gains table (r5) --------------------------------------
#
# The campaign-targeting readout next to nb_auc and nb_calibration:
# rank the test docs by NB margin (descending), cut into 10 equal
# deciles, and report per-decile precision, cumulative capture of all
# positives (the gains curve), and lift over the base rate.  A model
# that front-loads positives shows lift ≫ 1 in decile 1 and a gains
# curve that dominates the diagonal; lift ≈ 1 everywhere means the
# scores carry no ranking signal even if accuracy looks fine.
#
# Determinism: the margin is a difference of the 6-rounded score
# columns (identical doubles in both engines), and the ntile order
# breaks margin ties by doc_id, so the decile assignment is a total
# order.  Scale note: ntile needs one global sort — over the TEST
# SPLIT only (the bounded eval artifact, like nb_auc's rank), never
# the corpus; at petabyte eval sizes the swap is approx_percentile
# decile fences, documented here as the escape hatch.

LIFT_DECILES = 10


def q_nb_lift_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = q_nb_scores(spark, sf_dir).select(
        "doc_id",
        "label",
        (F.col("pos_score") - F.col("neg_score")).alias("margin"),
    )
    w = Window.orderBy(F.desc("margin"), F.asc("doc_id"))
    dec = s.select(
        "label", F.ntile(LIFT_DECILES).over(w).alias("decile")
    )
    agg = dec.groupBy("decile").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("label").cast("long").alias("n_pos"),
    )
    tot = agg.agg(
        F.sum("n").cast("long").alias("t_n"),
        F.sum("n_pos").cast("long").alias("t_pos"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n",
            "n_pos",
            F.round(F.col("n_pos") / F.col("n").cast("double"), 6).alias(
                "precision"
            ),
            F.round(
                F.sum("n_pos").over(w_cum) / F.col("t_pos").cast("double"),
                6,
            ).alias("cum_capture"),
            F.round(
                (F.col("n_pos") * F.col("t_n")).cast("double")
                / (F.col("n") * F.col("t_pos")).cast("double"),
                6,
            ).alias("lift"),
        )
    )


def _lift_gains_sql() -> str:
    return (
        "WITH sc AS (" + ORACLES["nb_scores"] + "), "
        "d AS (SELECT label, "
        f"ntile({LIFT_DECILES}) OVER (ORDER BY pos_score - neg_score "
        "DESC, doc_id) AS decile FROM sc), "
        "agg AS (SELECT decile, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(label) AS BIGINT) AS n_pos FROM d GROUP BY decile), "
        "tot AS (SELECT CAST(sum(n) AS BIGINT) AS t_n, "
        "CAST(sum(n_pos) AS BIGINT) AS t_pos FROM agg) "
        "SELECT CAST(a.decile AS INTEGER) AS decile, a.n, a.n_pos, "
        "round(a.n_pos / CAST(a.n AS DOUBLE), 6) AS precision, "
        "round(sum(a.n_pos) OVER (ORDER BY a.decile ROWS BETWEEN "
        "UNBOUNDED PRECEDING AND CURRENT ROW) / CAST(t.t_pos AS DOUBLE), "
        "6) AS cum_capture, "
        "round(CAST(a.n_pos * t.t_n AS DOUBLE) / "
        "CAST(a.n * t.t_pos AS DOUBLE), 6) AS lift "
        "FROM agg a CROSS JOIN tot t"
    )


QUERIES_LATE["nb_lift_gains"] = q_nb_lift_gains
ORACLES_LATE["nb_lift_gains"] = _lift_gains_sql()


# --- k-fold cross-validated accuracy (r5) ---------------------------------
#
# The single 75/25 split (M4) gives ONE accuracy number; 5-fold CV
# gives a variance estimate around it — the difference between "the
# model scores 0.54" and "the model scores 0.54 ± 0.03", which is what
# decides whether nb_mcnemar_test's comparison is worth running at
# all.  Fold = doc_id % 5 (odd modulus, so the doc_id%2 label is
# represented in every fold on both sides of the split).
#
# Each fold retrains the full chain (clean docs are the shared cached
# snapshot).  The corpus scalars for ALL five training complements
# come from ONE stats job (r9 verdict #3 — this was five sequential
# scan+agg collects, one per fold): a single groupBy(doc_id % 5) pass
# gives per-fold doc/word contributions (train_k = total − fold_k,
# sum-decomposable), and a single per-(word, fold) token rollup gives
# both the five vocabulary sizes (a word counts for fold k's training
# vocab iff it appears in ANY other fold) and the five models (the
# complement re-aggregation runs over the tiny vocab×5 frame, and its
# shared token-scan Exchange is reused across arms, not re-scanned).
# Still the S5 scalar-side-input shape (reference's Counter→
# Configuration relay, Hadoop/NB.java:305-316) — one driver round-trip
# of 5 rows instead of five.  The per-fold model stays a broadcast
# join exactly like nb_scores; fold outputs are 1-row aggregates
# unioned at the end, so the whole query ships 5 rows.

CV_FOLDS = 5


def q_nb_cv_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = labeled_docs(spark, sf_dir)
    fold = (F.col("doc_id") % CV_FOLDS).cast("int")
    tokens = doc_tokens(docs)
    # one (word, fold) rollup feeds the vocab sizes AND the 5 models
    wf = tokens.groupBy("word", fold.alias("fold")).agg(
        F.sum(F.when(F.col("label") == 1, 1).otherwise(0))
        .cast("long")
        .alias("pos_count"),
        F.sum(F.when(F.col("label") == 0, 1).otherwise(0))
        .cast("long")
        .alias("neg_count"),
    )
    # ONE stats job: per-fold doc/word contributions × the five
    # training-vocab sizes (empty-doc quirk preserved — same wc expr
    # as corpus_stats_df: "".split("\\s+") has length 1)
    wc = F.size(F.split(F.col("text"), WS_SPLIT))
    per_fold = docs.groupBy(fold.alias("fold")).agg(
        F.count("*").cast("long").alias("tweets"),
        F.sum(F.when(F.col("label") == 1, 1).otherwise(0))
        .cast("long")
        .alias("pos_tweets"),
        F.sum(F.when(F.col("label") == 0, 1).otherwise(0))
        .cast("long")
        .alias("neg_tweets"),
        F.sum(F.when(F.col("label") == 1, wc).otherwise(0))
        .cast("long")
        .alias("pos_words"),
        F.sum(F.when(F.col("label") == 0, wc).otherwise(0))
        .cast("long")
        .alias("neg_words"),
    )
    in_fold = wf.groupBy("word").agg(
        *[
            F.max(F.when(F.col("fold") == j, 1).otherwise(0)).alias(
                f"in{j}"
            )
            for j in range(CV_FOLDS)
        ]
    )
    vocab_row = in_fold.agg(
        *[
            F.sum(
                F.when(
                    sum(
                        (F.col(f"in{j}") for j in range(CV_FOLDS) if j != k),
                        F.lit(0),
                    )
                    > 0,
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias(f"v{k}")
            for k in range(CV_FOLDS)
        ]
    )
    rows = [r.asDict() for r in per_fold.crossJoin(vocab_row).collect()]
    by_fold = {r["fold"]: r for r in rows}
    tot = {
        c: sum(r[c] for r in rows)
        for c in ("tweets", "pos_tweets", "neg_tweets", "pos_words",
                  "neg_words")
    }
    # per-arm driver scalars (training stats = totals minus fold k's
    # contribution; rows is empty on an empty documents table — default
    # v=0 so the degenerate input still returns a well-formed zero
    # result, ADVICE r10/r11)
    arm = []
    for k in range(CV_FOLDS):
        fr = by_fold.get(k, {})
        stats = {
            c: tot[c] - fr.get(c, 0)
            for c in ("tweets", "pos_tweets", "neg_tweets", "pos_words",
                      "neg_words")
        }
        v = rows[0][f"v{k}"] if rows else 0
        n_tw = stats["tweets"]
        arm.append(
            {
                "n_train": stats["tweets"],
                # int denominators, same as the pre-fusion F.lit args
                "pos_den": stats["pos_words"] + v,
                "neg_den": stats["neg_words"] + v,
                # guard the driver-side division for the empty input
                # (F.log(0.0) is NULL JVM-side, so an absent class
                # degrades to NULL scores rather than raising)
                "prior_pos": stats["pos_tweets"] / n_tw if n_tw else 0.0,
                "prior_neg": stats["neg_tweets"] / n_tw if n_tw else 0.0,
            }
        )

    # r12 fusion (guide §1.2/§2.4 — remove redundant passes): each doc
    # is TESTED in exactly its own fold, so the five per-arm broadcast
    # joins + five wf re-evaluations collapse into ONE scoring pass.
    # The word side carries per-fold counts; the arm-k model values
    # (counts-outside-k, the old wf.filter(fold != k) rollup) are CASE
    # branches selected by the doc's own fold at join time.  Counts,
    # denominators and priors are bit-identical to the per-arm build.
    word_tbl = wf.groupBy("word").agg(
        F.sum("pos_count").alias("pos_tot"),
        F.sum("neg_count").alias("neg_tot"),
        *[
            F.sum(F.when(F.col("fold") == k, F.col(cnt)).otherwise(0)).alias(
                f"{cnt[:3]}_{k}"
            )
            for k in range(CV_FOLDS)
            for cnt in ("pos_count", "neg_count")
        ],
    )

    f_col = (F.col("doc_id") % CV_FOLDS).cast("int")

    def arm_case(builder):
        expr = None
        for k in range(CV_FOLDS):
            cond = f_col == k
            expr = (
                F.when(cond, builder(k))
                if expr is None
                else expr.when(cond, builder(k))
            )
        return expr

    def _pos_cnt(k):
        return F.col("pos_tot") - F.col(f"pos_{k}")

    def _neg_cnt(k):
        return F.col("neg_tot") - F.col(f"neg_{k}")

    # word is in arm k's model iff it occurs in some fold != k — the
    # membership the old inner join against the arm-k rollup enforced
    incl = arm_case(lambda k: (_pos_cnt(k) + _neg_cnt(k)) > 0)
    lpw_pos = arm_case(
        lambda k: F.log((_pos_cnt(k) + 1) / F.lit(arm[k]["pos_den"]))
    )
    lpw_neg = arm_case(
        lambda k: F.log((_neg_cnt(k) + 1) / F.lit(arm[k]["neg_den"]))
    )
    ttok = doc_tokens(docs).select("doc_id", "word")
    scored = (
        ttok.join(F.broadcast(word_tbl), "word")
        .groupBy("doc_id")
        .agg(
            # SUM of an all-NULL/empty group is NULL — same "doc has no
            # known words" sentinel the old left join produced
            F.sum(F.when(incl, lpw_pos)).alias("s_pos"),
            F.sum(F.when(incl, lpw_neg)).alias("s_neg"),
        )
    )
    prior_pos = arm_case(lambda k: F.log(F.lit(arm[k]["prior_pos"])))
    prior_neg = arm_case(lambda k: F.log(F.lit(arm[k]["prior_neg"])))
    counts = (
        docs.select("doc_id", "label")
        .join(scored, "doc_id", "left")
        .select(
            f_col.alias("fold"),
            "label",
            (
                (prior_pos + F.coalesce(F.col("s_pos"), F.lit(0.0)))
                > (prior_neg + F.coalesce(F.col("s_neg"), F.lit(0.0)))
            )
            .cast("int")
            .alias("prediction"),
        )
        .groupBy("fold")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.coalesce(
                F.sum((F.col("prediction") == F.col("label")).cast("long")),
                F.lit(0),
            )
            .cast("long")
            .alias("n_correct"),
        )
    )
    # driver-built 5-row spine: an empty fold (or the empty corpus)
    # still yields its row with n_test = 0, n_correct = 0 — the
    # degenerate contract the old per-arm aggregates provided
    folds_df = spark.createDataFrame(
        [(k, arm[k]["n_train"]) for k in range(CV_FOLDS)],
        "fold INT, n_train BIGINT",
    )
    return folds_df.join(counts, "fold", "left").select(
        F.col("fold").cast("int").alias("fold"),
        F.col("n_train").cast("long").alias("n_train"),
        F.coalesce(F.col("n_test"), F.lit(0)).cast("long").alias("n_test"),
        F.coalesce(F.col("n_correct"), F.lit(0))
        .cast("long")
        .alias("n_correct"),
        # NULL (not NaN) accuracy on an empty fold — identical to the
        # oracle's value for every non-degenerate input
        F.when(
            F.col("n_test") > 0,
            F.round(F.col("n_correct") / F.col("n_test").cast("double"), 6),
        ).alias("accuracy"),
    )


def _cv_arm_sql(k: int) -> str:
    from .common import DOCS_CTE, TOKENS_CTE, with_ctes

    train_tok = (
        f"train_tokens AS (SELECT * FROM tokens WHERE doc_id % {CV_FOLDS} "
        f"<> {k})"
    )
    test_tok = (
        f"test_tokens AS (SELECT * FROM tokens WHERE doc_id % {CV_FOLDS} "
        f"= {k})"
    )
    stats = (
        "stats AS (SELECT CAST(count(*) AS BIGINT) AS tweets, "
        "CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS pos_tweets, "
        "CAST(sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS neg_tweets, "
        "CAST(sum(CASE WHEN label = 1 THEN "
        "len(regexp_split_to_array(text, '\\s+')) ELSE 0 END) AS BIGINT) "
        "AS pos_words, "
        "CAST(sum(CASE WHEN label = 0 THEN "
        "len(regexp_split_to_array(text, '\\s+')) ELSE 0 END) AS BIGINT) "
        "AS neg_words "
        f"FROM docs WHERE doc_id % {CV_FOLDS} <> {k})"
    )
    testd = (
        "testd AS (SELECT doc_id, label FROM docs "
        f"WHERE doc_id % {CV_FOLDS} = {k})"
    )
    return (
        with_ctes(
            DOCS_CTE,
            TOKENS_CTE,
            train_tok,
            _VOCAB_CTE,
            stats,
            _VSIZE_CTE,
            _MODEL_CTE,
            test_tok,
            _SCORED_CTE,
            testd,
            "sc AS (SELECT d.doc_id, d.label, "
            "ln(stats.pos_tweets / stats.tweets) + coalesce(s.s_pos, 0) "
            "AS pos_score, "
            "ln(stats.neg_tweets / stats.tweets) + coalesce(s.s_neg, 0) "
            "AS neg_score "
            "FROM testd d LEFT JOIN scored s USING (doc_id), stats)",
        )
        + f"SELECT CAST({k} AS INTEGER) AS fold, "
        "(SELECT tweets FROM stats) AS n_train, "
        "CAST(count(*) AS BIGINT) AS n_test, "
        "CAST(sum(CASE WHEN (CASE WHEN pos_score > neg_score THEN 1 "
        "ELSE 0 END) = label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct "
        "FROM sc"
    )


def _cv_sql() -> str:
    arms = ", ".join(
        f"arm{k} AS ({_cv_arm_sql(k)})" for k in range(CV_FOLDS)
    )
    union = " UNION ALL ".join(
        f"SELECT * FROM arm{k}" for k in range(CV_FOLDS)
    )
    return (
        f"WITH {arms}, u AS ({union}) "
        "SELECT fold, n_train, n_test, n_correct, "
        "round(n_correct / CAST(n_test AS DOUBLE), 6) AS accuracy FROM u"
    )


QUERIES_LATE["nb_cv_accuracy"] = q_nb_cv_accuracy
ORACLES_LATE["nb_cv_accuracy"] = _cv_sql()


# --- active-learning uncertainty sample (r5) -------------------------------
#
# The labeling-budget selector: the next docs a human annotator (or a
# teacher model) should look at are the ones the current model is
# LEAST sure about — smallest |pos − neg| margin (binary
# least-confidence ≡ margin ≡ entropy sampling for two classes).
# Emits the UNCERTAIN_K most ambiguous test docs with their margins
# and current predictions, ranked.
#
# Scale shape: a bounded top-k, not a global sort — Spark plans the
# (|margin|, doc_id) ascending limit as TakeOrderedAndProject
# (per-partition heaps + one k-sized merge), the same distributed
# top-k shape the retrieval rankers pin in tests/test_plans.py.
# The margin is 6-rounded before ordering, doc_id breaks ties, so
# rank is a total order in both engines.

UNCERTAIN_K = 50


def q_nb_uncertainty_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = q_nb_scores(spark, sf_dir).select(
        "doc_id",
        "label",
        F.round(
            F.abs(F.col("pos_score") - F.col("neg_score")), 6
        ).alias("abs_margin"),
        (F.col("pos_score") > F.col("neg_score"))
        .cast("int")
        .alias("prediction"),
    )
    ranked = s.orderBy(F.asc("abs_margin"), F.asc("doc_id")).limit(
        UNCERTAIN_K
    )
    w = Window.orderBy(F.asc("abs_margin"), F.asc("doc_id"))
    return ranked.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "doc_id",
        "label",
        "prediction",
        "abs_margin",
    )


def _uncertainty_sql() -> str:
    return (
        "WITH sc AS (" + ORACLES["nb_scores"] + "), "
        "m AS (SELECT doc_id, label, "
        "round(abs(pos_score - neg_score), 6) AS abs_margin, "
        "CAST(pos_score > neg_score AS INTEGER) AS prediction FROM sc) "
        "SELECT CAST(row_number() OVER "
        "(ORDER BY abs_margin, doc_id) AS INTEGER) AS rank, "
        "doc_id, label, prediction, abs_margin FROM m "
        f"ORDER BY abs_margin, doc_id LIMIT {UNCERTAIN_K}"
    )


QUERIES_LATE["nb_uncertainty_sample"] = q_nb_uncertainty_sample
ORACLES_LATE["nb_uncertainty_sample"] = _uncertainty_sql()


# --- top discriminative features (r5) --------------------------------------
#
# Model interpretability: the words the trained NB actually leans on,
# ranked by the log-odds ratio lpw_pos − lpw_neg (both already
# Laplace-smoothed, so hapax words can't blow up the ratio the way a
# raw count quotient would).  TOP_FEATURES per direction, the
# "why does the classifier think this" table every model card wants.
#
# Scale shape: the model table is vocabulary-sized; each direction is
# a bounded TakeOrderedAndProject top-k over it (6-rounded score,
# word tiebreak), unioned to 2·TOP_FEATURES rows.

TOP_FEATURES = 25


def q_nb_top_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    model, _stats = nb_model(spark, sf_dir)
    scored = model.select(
        "word",
        F.round(F.col("lpw_pos") - F.col("lpw_neg"), 6).alias("log_odds"),
    )
    pos = (
        scored.orderBy(F.desc("log_odds"), F.asc("word"))
        .limit(TOP_FEATURES)
        .select(F.lit("positive").alias("direction"), "word", "log_odds")
    )
    neg = (
        scored.orderBy(F.asc("log_odds"), F.asc("word"))
        .limit(TOP_FEATURES)
        .select(F.lit("negative").alias("direction"), "word", "log_odds")
    )
    w_pos = Window.orderBy(F.desc("log_odds"), F.asc("word"))
    w_neg = Window.orderBy(F.asc("log_odds"), F.asc("word"))
    return pos.select(
        "direction",
        F.row_number().over(w_pos).cast("int").alias("rank"),
        "word",
        "log_odds",
    ).unionByName(
        neg.select(
            "direction",
            F.row_number().over(w_neg).cast("int").alias("rank"),
            "word",
            "log_odds",
        )
    )


def _top_features_sql() -> str:
    prelude = with_ctes(
        *_NB_PRELUDE,
        "sc AS (SELECT word, round(lpw_pos - lpw_neg, 6) AS log_odds "
        "FROM model)",
    )
    return (
        prelude
        + "SELECT * FROM ("
        "SELECT 'positive' AS direction, CAST(row_number() OVER "
        "(ORDER BY log_odds DESC, word) AS INTEGER) AS rank, "
        f"word, log_odds FROM sc ORDER BY log_odds DESC, word "
        f"LIMIT {TOP_FEATURES}) "
        "UNION ALL SELECT * FROM ("
        "SELECT 'negative' AS direction, CAST(row_number() OVER "
        "(ORDER BY log_odds, word) AS INTEGER) AS rank, "
        f"word, log_odds FROM sc ORDER BY log_odds, word "
        f"LIMIT {TOP_FEATURES})"
    )


QUERIES_LATE["nb_top_features"] = q_nb_top_features
ORACLES_LATE["nb_top_features"] = _top_features_sql()


# --- confident-learning label audit (r5) -----------------------------------
#
# The training-data counterpart of uncertainty sampling: docs where
# the model CONFIDENTLY contradicts the assigned label are the prime
# label-error candidates (the core signal of confident learning /
# cleanlab, Northcutt et al. 2021 — here in its simplest binary
# margin form).  Emits the LABEL_ISSUES_K highest-margin
# disagreements; in a labeling pipeline these rows go back to
# annotators first.
#
# Same bounded TakeOrderedAndProject shape as nb_uncertainty_sample,
# opposite ordering, restricted to prediction ≠ label.

LABEL_ISSUES_K = 50


def q_nb_label_issues(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = q_nb_scores(spark, sf_dir).select(
        "doc_id",
        "label",
        (F.col("pos_score") > F.col("neg_score"))
        .cast("int")
        .alias("prediction"),
        F.round(
            F.abs(F.col("pos_score") - F.col("neg_score")), 6
        ).alias("abs_margin"),
    ).filter(F.col("prediction") != F.col("label"))
    top = s.orderBy(F.desc("abs_margin"), F.asc("doc_id")).limit(
        LABEL_ISSUES_K
    )
    w = Window.orderBy(F.desc("abs_margin"), F.asc("doc_id"))
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "doc_id",
        "label",
        "prediction",
        "abs_margin",
    )


def _label_issues_sql() -> str:
    return (
        "WITH sc AS (" + ORACLES["nb_scores"] + "), "
        "m AS (SELECT doc_id, label, "
        "CAST(pos_score > neg_score AS INTEGER) AS prediction, "
        "round(abs(pos_score - neg_score), 6) AS abs_margin FROM sc) "
        "SELECT CAST(row_number() OVER "
        "(ORDER BY abs_margin DESC, doc_id) AS INTEGER) AS rank, "
        "doc_id, label, prediction, abs_margin FROM m "
        "WHERE prediction <> label "
        f"ORDER BY abs_margin DESC, doc_id LIMIT {LABEL_ISSUES_K}"
    )


QUERIES_LATE["nb_label_issues"] = q_nb_label_issues
ORACLES_LATE["nb_label_issues"] = _label_issues_sql()


# --- label-permutation null calibration (r5) --------------------------------
#
# The leakage canary: retrain the full NB chain with labels replaced
# by a content-hash coin flip (hex32("null:" ‖ doc_id) % 2 — a
# deterministic permutation-test stand-in) and score the usual test
# split.  Any accuracy meaningfully away from 0.5 means the pipeline
# is reading the answer from somewhere other than the label — feature
# leakage, split contamination, or a metrics bug — which is exactly
# how permutation nulls are used to audit ML pipelines (Ojala &
# Garriga 2010).  The row reports the binomial 3σ band so "meaningful"
# is a number, not a vibe.
#
# Shape: the standard chain (one scalar-relay collect, broadcast
# model join) over relabeled cleaned docs; output is 1 row.


def q_nb_null_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import hex32

    # r12: derive from the cached cleaned-docs memo instead of
    # re-running the 7-regex clean chain from the raw table — the
    # cleaning is IDENTICAL (labeled_docs cleans the same column with
    # the same chain); only the label column is swapped for the
    # content-hash coin flip, so every downstream count and score is
    # bit-identical.  Before: the stats job, the vocab rollup and the
    # scoring pass each re-ran the regex chain over the raw scan
    # (~3 full cleans per call); after: all three read the memo.
    docs = labeled_docs(spark, sf_dir).select(
        "doc_id",
        F.pmod(
            hex32(F.concat(F.lit("null:"), F.col("doc_id").cast("string"))),
            F.lit(2),
        )
        .cast("int")
        .alias("label"),
        "text",
    )
    model, stats = model_for_docs(docs)
    preds = scores_for_docs(docs, model, stats).select(
        "label",
        (F.col("pos_score") > F.col("neg_score"))
        .cast("int")
        .alias("prediction"),
    )
    agg = preds.agg(
        F.count("*").cast("long").alias("n_test"),
        F.sum((F.col("prediction") == F.col("label")).cast("long"))
        .cast("long")
        .alias("n_correct"),
    )
    acc = F.col("n_correct") / F.col("n_test").cast("double")
    sigma3 = 3.0 * F.sqrt(
        F.lit(0.25) / F.col("n_test").cast("double")
    )
    return agg.select(
        "n_test",
        "n_correct",
        F.round(acc, 6).alias("accuracy"),
        F.round(F.abs(acc - 0.5), 6).alias("abs_dev_from_half"),
        F.round(sigma3, 6).alias("band_3sigma"),
        (F.round(F.abs(acc - 0.5), 6) <= F.round(sigma3, 6)).alias(
            "within_null_band"
        ),
    )


def _null_calibration_sql() -> str:
    from ..functions.hashing import hex32_sql

    h = hex32_sql("'null:' || CAST(doc_id AS VARCHAR)")
    from .common import clean_text_sql

    docs_cte = (
        f"docs AS (SELECT doc_id, CAST({h} % 2 AS INTEGER) AS label, "
        f"{clean_text_sql('text')} AS text FROM documents)"
    )
    return (
        "WITH preds AS (" + preds_sql_for(docs_cte) + ") "
        "SELECT CAST(count(*) AS BIGINT) AS n_test, "
        "CAST(sum(CASE WHEN prediction = label THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_correct, "
        "round(sum(CASE WHEN prediction = label THEN 1 ELSE 0 END) "
        "/ CAST(count(*) AS DOUBLE), 6) AS accuracy, "
        "round(abs(sum(CASE WHEN prediction = label THEN 1 ELSE 0 END) "
        "/ CAST(count(*) AS DOUBLE) - 0.5), 6) AS abs_dev_from_half, "
        "round(3.0 * sqrt(0.25 / count(*)), 6) AS band_3sigma, "
        "round(abs(sum(CASE WHEN prediction = label THEN 1 ELSE 0 END) "
        "/ CAST(count(*) AS DOUBLE) - 0.5), 6) <= "
        "round(3.0 * sqrt(0.25 / count(*)), 6) AS within_null_band "
        "FROM preds"
    )


QUERIES_LATE["nb_null_calibration"] = q_nb_null_calibration
ORACLES_LATE["nb_null_calibration"] = _null_calibration_sql()


# --- split-conformal prediction sets (r6) -----------------------------
#
# Distribution-free uncertainty for the flagship classifier (Vovk's
# split/inductive conformal, the Angelopoulos-Bates recipe): hold out
# a calibration split, take each calibration doc's nonconformity
# (minus the true class's log-odds margin), set q̂_c = the
# ⌈(n_c+1)(1−α)⌉-th smallest per class (Mondrian/class-conditional,
# so the guarantee holds per label), and emit, on the disjoint eval
# split, the prediction SET {c : s_c(x) ≤ q̂_c}.  Marginal coverage
# ≥ 1−α holds by construction — the readout shows it, plus the price
# paid in set size (abstention = both classes; empty = neither).
#
# Splits: calibration = (doc_id DIV 8) % 2 = 0, eval = 1.  The test
# split is doc_id % 8 < 2, i.e. doc_ids ≡ {0,1} (mod 8) — so a DIV-2
# or DIV-4 key is CONSTANT on it (the same trap as the % 4
# train/test gotcha); DIV-8 parity alternates per 8-block, keeping
# both label classes on both sides.
#
# Scale shape: nonconformities derive from the memoized 6-rounded
# scores (one narrow map); the exact per-class order statistic is a
# window over the CALIBRATION split only — bounded by design (a
# production pipeline calibrates on a sample, not the corpus); the
# eval pass is one broadcast of the 2-value q̂ row and a 1-row
# reduce.  All comparisons happen on 6-rounded doubles, so set
# membership cannot straddle an engine-specific float edge.

CONF_ALPHA = 0.1


def q_nb_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = q_nb_scores(spark, sf_dir).select(
        "doc_id", "label", "pos_score", "neg_score"
    )
    # nonconformity of class c = -(margin toward c); margins from the
    # 6-rounded scores are engine-identical
    nc_pos = F.round(F.col("neg_score") - F.col("pos_score"), 6)
    nc_neg = F.round(F.col("pos_score") - F.col("neg_score"), 6)
    nc_true = F.when(F.col("label") == 1, nc_pos).otherwise(nc_neg)
    half = F.expr("doc_id DIV 8") % 2
    calib = s.filter(half == 0).select(
        "doc_id", "label", nc_true.alias("nc")
    )
    wcls = Window.partitionBy("label").orderBy("nc", "doc_id")
    ranked = calib.withColumn(
        "rn", F.row_number().over(wcls).cast("long")
    )
    sizes = calib.groupBy("label").agg(
        F.count("*").cast("long").alias("n_c")
    )
    idx = F.least(
        F.col("n_c"),
        F.ceil((1.0 - CONF_ALPHA) * (F.col("n_c") + 1)).cast("long"),
    )
    qhat = (
        ranked.join(sizes, "label")
        .filter(F.col("rn") == idx)
        .groupBy()
        .agg(
            F.sum(F.when(F.col("label") == 1, F.col("nc"))).alias(
                "q_pos"
            ),
            F.sum(F.when(F.col("label") == 0, F.col("nc"))).alias(
                "q_neg"
            ),
            F.sum(F.when(F.col("label") == 1, F.col("n_c")))
            .cast("long")
            .alias("n_calib_pos"),
            F.sum(F.when(F.col("label") == 0, F.col("n_c")))
            .cast("long")
            .alias("n_calib_neg"),
        )
    )
    ev = s.filter(half == 1).crossJoin(F.broadcast(qhat))
    in_pos = (nc_pos <= F.col("q_pos")).cast("long")
    in_neg = (nc_neg <= F.col("q_neg")).cast("long")
    covered = F.when(F.col("label") == 1, in_pos).otherwise(in_neg)
    return ev.agg(
        F.max("n_calib_pos").alias("n_calib_pos"),
        F.max("n_calib_neg").alias("n_calib_neg"),
        F.round(F.max("q_pos"), 6).alias("q_hat_pos"),
        F.round(F.max("q_neg"), 6).alias("q_hat_neg"),
        F.count("*").cast("long").alias("n_eval"),
        F.round(F.avg(covered), 6).alias("coverage"),
        F.round(F.avg(in_pos + in_neg), 6).alias("avg_set_size"),
        F.round(
            F.avg(((in_pos + in_neg) == 0).cast("double")), 6
        ).alias("frac_empty"),
        F.round(
            F.avg(((in_pos + in_neg) == 2).cast("double")), 6
        ).alias("frac_both"),
    )


def _conformal_sql() -> str:
    a = 1.0 - CONF_ALPHA
    return (
        "WITH sc AS (" + ORACLES["nb_scores"] + "), "
        "s2 AS (SELECT doc_id, label, "
        "round(neg_score - pos_score, 6) AS nc_pos, "
        "round(pos_score - neg_score, 6) AS nc_neg, "
        "(doc_id // 8) % 2 AS half FROM sc), "
        "calib AS (SELECT doc_id, label, "
        "CASE WHEN label = 1 THEN nc_pos ELSE nc_neg END AS nc "
        "FROM s2 WHERE half = 0), "
        "ranked AS (SELECT label, nc, row_number() OVER "
        "(PARTITION BY label ORDER BY nc, doc_id) AS rn FROM calib), "
        "sizes AS (SELECT label, CAST(count(*) AS BIGINT) AS n_c "
        "FROM calib GROUP BY label), "
        "qh AS (SELECT "
        "sum(CASE WHEN r.label = 1 THEN nc END) AS q_pos, "
        "sum(CASE WHEN r.label = 0 THEN nc END) AS q_neg, "
        "CAST(sum(CASE WHEN r.label = 1 THEN n_c END) AS BIGINT) "
        "AS n_calib_pos, "
        "CAST(sum(CASE WHEN r.label = 0 THEN n_c END) AS BIGINT) "
        "AS n_calib_neg "
        "FROM ranked r JOIN sizes s ON r.label = s.label "
        f"AND r.rn = least(s.n_c, CAST(ceil({a} * (s.n_c + 1)) "
        "AS BIGINT))), "
        "ev AS (SELECT s2.label, "
        "CASE WHEN nc_pos <= q_pos THEN 1 ELSE 0 END AS in_pos, "
        "CASE WHEN nc_neg <= q_neg THEN 1 ELSE 0 END AS in_neg, "
        "qh.* FROM s2 CROSS JOIN qh WHERE half = 1) "
        "SELECT max(n_calib_pos) AS n_calib_pos, "
        "max(n_calib_neg) AS n_calib_neg, "
        "round(max(q_pos), 6) AS q_hat_pos, "
        "round(max(q_neg), 6) AS q_hat_neg, "
        "CAST(count(*) AS BIGINT) AS n_eval, "
        "round(avg(CASE WHEN label = 1 THEN in_pos ELSE in_neg END), 6) "
        "AS coverage, "
        "round(avg(in_pos + in_neg), 6) AS avg_set_size, "
        "round(avg(CASE WHEN in_pos + in_neg = 0 THEN 1.0 ELSE 0.0 "
        "END), 6) AS frac_empty, "
        "round(avg(CASE WHEN in_pos + in_neg = 2 THEN 1.0 ELSE 0.0 "
        "END), 6) AS frac_both FROM ev"
    )


QUERIES_LATE["nb_conformal"] = q_nb_conformal
ORACLES_LATE["nb_conformal"] = _conformal_sql()
