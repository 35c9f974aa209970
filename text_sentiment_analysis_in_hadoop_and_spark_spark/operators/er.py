"""Entity resolution: blocked fuzzy-similarity join over documents
(engine extension — the classic record-linkage shape: BLOCK on cheap
deterministic keys, then run an expensive edit-distance verify only
within blocks; Fellegi–Sunter linkage and every dedupe system since).

MinHash/SimHash (dedup.py) catch token-set overlap; edit distance
catches CHARACTER-level near-misses those miss (typo variants, OCR
noise, small in-place edits that keep length but shift many tokens).

- ``er_blocks`` — the blocking-key audit: block sizes and the
  candidate-pair count each block contributes (the quadratic cost the
  cap bounds), plus how many blocks the cap drops.
- ``er_fuzzy_pairs`` — within-block pairs (a < b) whose normalized
  64-char prefixes are within ``LEV_MAX`` edits, with the distance.

Scale shape: the block key (lang, length bucket) is an equi-join key,
so candidates form by co-partitioned self-join — never a cross
product.  Oversized blocks (> ``BLOCK_CAP`` docs) are dropped
deterministically BEFORE the quadratic verify — same discipline as
the LSH hot-bucket cap: a block that big is a boilerplate family, not
a linkage candidate set, and at 100 TB one hot block would otherwise
dominate the stage.  ``levenshtein`` is a JVM built-in (no UDF), and
the O(L²) edit-distance DP is bounded by comparing fixed 64-char
prefixes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .common import register_cache

LEN_BUCKET = 100  # n_chars DIV 100 → same-length-scale docs only
BLOCK_CAP = 500  # quadratic-verify bound per block
LEV_MAX = 10  # max edits over the compared prefix
# 32 not 64: the DP is O(len²) per candidate pair and runs
# |block|²/2 times — halving the prefix quarters the dominant cost
# (measured 21 s → ~4 s at sf0.1) while a 10-edit budget over 32
# chars still admits the typo/OCR band the operator targets
PREFIX_LEN = 32
# level-2 blocking key for over-cap blocks (r10): first chars of the
# prefix — refine instead of drop (see _fuzzy_pairs_plan)
REFINE_LEN = 4


def _blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("b_lang"),
        F.expr(f"n_chars DIV {LEN_BUCKET}").alias("b_len"),
        F.substring(F.col("text"), 1, PREFIX_LEN).alias("prefix"),
    )


def q_er_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _blocked(spark, sf_dir)
    return b.groupBy("b_lang", "b_len").agg(
        F.count("*").alias("n_docs"),
        (F.count("*") * (F.count("*") - 1) / 2).cast("long").alias(
            "n_cand_pairs"
        ),
        (F.count("*") > BLOCK_CAP).cast("int").alias("capped"),
    )


# the blocked edit-distance verify is the family's expensive stage and
# feeds FOUR consumers (pairs, entities, blocking quality, r7
# survivorship) — memoize it like dedup's banded signatures so the
# family pays the quadratic DP once per (session, sf)
_PAIRS_CACHE: dict[tuple[str, str], DataFrame] = register_cache({})

# r12 (guide §5 caching, the dedup _cc_labels precedent): er_entities
# and er_survivorship each re-ran the ITERATIVE connected-components
# loop over the same memoized fuzzy-pair table per call — the loop's
# localCheckpoint rounds are the family's dominant warm cost.  One
# converged (node, label) table per (session, sf_dir) serves both.
_ER_CC_CACHE: dict[tuple[str, str], DataFrame] = register_cache({})


def _er_cc_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import connected_components

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _ER_CC_CACHE:
        pairs = q_er_fuzzy_pairs(spark, sf_dir).select("doc_a", "doc_b")
        _ER_CC_CACHE[key] = connected_components(pairs)
    return _ER_CC_CACHE[key]


def _fuzzy_pairs_cached(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    df = _PAIRS_CACHE.get(key)
    if df is None:
        df = _fuzzy_pairs_plan(spark, sf_dir).cache()
        _PAIRS_CACHE[key] = df
    return df


def q_er_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _fuzzy_pairs_cached(spark, sf_dir)


def _fuzzy_pairs_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical blocking (r10): over-cap level-1 blocks REFINE by
    a second key (the first ``REFINE_LEN`` chars of the normalized
    prefix) instead of dropping — the blocking-key-hierarchy answer
    every production linkage system uses (a 10× corpus turned 21 of
    30 level-1 blocks over-cap in the r10 decade probe; dropping them
    silenced the operator exactly where it had work to do).  Level-2
    blocks still over the cap drop under the original discipline.
    Refinement trades the cross-sub-block pairs (docs differing in
    their first chars) for boundedness — strictly better recall than
    the drop it replaces, same worst-case cost bound."""
    b = _blocked(spark, sf_dir)
    sizes = b.groupBy("b_lang", "b_len").agg(F.count("*").alias("n"))
    keyed = b.join(F.broadcast(sizes), ["b_lang", "b_len"])
    small = keyed.filter(F.col("n") <= BLOCK_CAP).drop("n")
    big = (
        keyed.filter(F.col("n") > BLOCK_CAP)
        .drop("n")
        .withColumn("b_pre", F.substring(F.col("prefix"), 1, REFINE_LEN))
    )
    sizes2 = big.groupBy("b_lang", "b_len", "b_pre").agg(
        F.count("*").alias("n2")
    )
    small2 = big.join(
        F.broadcast(sizes2.filter(F.col("n2") <= BLOCK_CAP)),
        ["b_lang", "b_len", "b_pre"],
    ).drop("n2")

    def _pairs(members: DataFrame, keys: list[str]) -> DataFrame:
        left = members.select(
            *keys,
            F.col("doc_id").alias("doc_a"),
            F.col("prefix").alias("pref_a"),
        )
        right = members.select(
            *keys,
            F.col("doc_id").alias("doc_b"),
            F.col("prefix").alias("pref_b"),
        )
        return (
            left.join(right, keys)
            .filter(F.col("doc_a") < F.col("doc_b"))
            # threshold form runs the BANDED O(len·k) DP and returns
            # -1 past the budget — the verify kernel, not the full DP
            .withColumn(
                "lev", F.levenshtein("pref_a", "pref_b", LEV_MAX)
            )
            .filter(F.col("lev") >= 0)
            .select("doc_a", "doc_b", "b_lang", "b_len", "lev")
        )

    return _pairs(small, ["b_lang", "b_len"]).unionByName(
        _pairs(small2, ["b_lang", "b_len", "b_pre"])
    )


_BLK = (
    "blk AS (SELECT doc_id, lang AS b_lang, "
    f"n_chars // {LEN_BUCKET} AS b_len, "
    f"substr(text, 1, {PREFIX_LEN}) AS prefix FROM documents)"
)

ORACLES: dict[str, str] = {
    "er_blocks": (
        f"WITH {_BLK} "
        "SELECT b_lang, b_len, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS n_cand_pairs, "
        f"CAST(count(*) > {BLOCK_CAP} AS INTEGER) AS capped "
        "FROM blk GROUP BY 1, 2"
    ),
    # hierarchical blocking mirror (r10): level-1 blocks over the cap
    # refine by the prefix-REFINE_LEN sub-key; level-2 blocks over the
    # cap drop — identical to _fuzzy_pairs_plan
    "er_fuzzy_pairs": (
        f"WITH {_BLK}, "
        "sizes AS (SELECT b_lang, b_len, count(*) AS n FROM blk "
        "GROUP BY 1, 2), "
        "small AS (SELECT b.* FROM blk b JOIN sizes s USING (b_lang, b_len) "
        f"WHERE s.n <= {BLOCK_CAP}), "
        "big AS (SELECT b.*, "
        f"substr(b.prefix, 1, {REFINE_LEN}) AS b_pre "
        "FROM blk b JOIN sizes s USING (b_lang, b_len) "
        f"WHERE s.n > {BLOCK_CAP}), "
        "sizes2 AS (SELECT b_lang, b_len, b_pre, count(*) AS n2 "
        "FROM big GROUP BY 1, 2, 3), "
        "small2 AS (SELECT g.* FROM big g "
        "JOIN sizes2 s2 USING (b_lang, b_len, b_pre) "
        f"WHERE s2.n2 <= {BLOCK_CAP}) "
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.b_lang, a.b_len, "
        "CAST(levenshtein(a.prefix, b.prefix) AS INTEGER) AS lev "
        "FROM small a JOIN small b USING (b_lang, b_len) "
        "WHERE a.doc_id < b.doc_id "
        f"AND levenshtein(a.prefix, b.prefix) <= {LEV_MAX} "
        "UNION ALL "
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.b_lang, a.b_len, "
        "CAST(levenshtein(a.prefix, b.prefix) AS INTEGER) AS lev "
        "FROM small2 a JOIN small2 b USING (b_lang, b_len, b_pre) "
        "WHERE a.doc_id < b.doc_id "
        f"AND levenshtein(a.prefix, b.prefix) <= {LEV_MAX}"
    ),
}

QUERIES = {
    "er_blocks": q_er_blocks,
    "er_fuzzy_pairs": q_er_fuzzy_pairs,
}


# --- transitive entity consolidation (r5) ----------------------------


def q_er_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution completed: the fuzzy pair matches close
    transitively into entities (A~B, B~C ⇒ one entity even when A–C
    exceeds the edit budget — the linkage-graph semantics every
    dedupe/master-data system uses), and each entity elects ONE
    canonical record (longest text wins, doc_id tie-break) — the
    survivorship rule of MDM golden-record consolidation.

    Composition: the SAME generic connected-components loop the
    near-dup clusters use (operators/dedup.py:connected_components —
    iterates only the matched subgraph), fed by the blocked
    edit-distance pairs instead of Jaccard pairs; singletons label
    themselves.  Canonical election is one entity-partitioned window
    over the labeled corpus."""
    labels = _er_cc_labels(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    ent = docs.join(
        labels, docs.doc_id == labels.node, "left"
    ).select(
        "doc_id",
        "n_chars",
        F.coalesce("label", "doc_id").cast("long").alias("entity_id"),
    )
    w = (
        Window.partitionBy("entity_id")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ent.select(
        "doc_id",
        "entity_id",
        F.first("doc_id").over(w).cast("long").alias("canon_doc_id"),
    ).withColumn(
        "is_canon",
        (F.col("doc_id") == F.col("canon_doc_id")).cast("int"),
    )


def _er_entities_sql() -> str:
    pairs = ORACLES["er_fuzzy_pairs"]
    return (
        "WITH RECURSIVE "
        f"epairs AS (SELECT doc_a, doc_b FROM ({pairs})), "
        "eedges AS (SELECT doc_a AS src, doc_b AS dst FROM epairs "
        "UNION ALL SELECT doc_b, doc_a FROM epairs), "
        "ecc(node, label) AS (SELECT src, src FROM eedges "
        "UNION "
        "SELECT e.dst, ecc.label FROM ecc JOIN eedges e "
        "ON ecc.node = e.src), "
        "elab AS (SELECT node, min(label) AS label FROM ecc "
        "GROUP BY node), "
        "ent AS (SELECT d.doc_id, d.n_chars, "
        "CAST(coalesce(l.label, d.doc_id) AS BIGINT) AS entity_id "
        "FROM documents d LEFT JOIN elab l ON d.doc_id = l.node), "
        "can AS (SELECT entity_id, doc_id AS canon_doc_id, "
        "row_number() OVER (PARTITION BY entity_id "
        "ORDER BY n_chars DESC, doc_id) AS rn FROM ent) "
        "SELECT e.doc_id, e.entity_id, "
        "CAST(c.canon_doc_id AS BIGINT) AS canon_doc_id, "
        "CAST(e.doc_id = c.canon_doc_id AS INTEGER) AS is_canon "
        "FROM ent e JOIN can c ON e.entity_id = c.entity_id "
        "AND c.rn = 1"
    )


ORACLES["er_entities"] = _er_entities_sql()
QUERIES["er_entities"] = q_er_entities


# --- blocking-quality audit (pairs completeness / reduction ratio) ---


def q_er_blocking_quality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The two numbers every blocking scheme is judged by (Christen,
    "Data Matching"): PAIRS COMPLETENESS — of the known true matches,
    how many land with both endpoints in the same (uncapped) block —
    and REDUCTION RATIO — what fraction of the quadratic pair space
    the blocking refuses to compare.  A scheme is only good if both
    are high: completeness ~1 with reduction ~0 is brute force;
    reduction ~1 with low completeness is silently dropping matches.

    Scale honesty: at 100 TB the full truth set is uncomputable —
    the audit uses the VERIFIED token-level near-dup pairs (the
    banded MinHash index, corpus-sublinear) as the reference truth,
    which is exactly the cross-check that matters: does char-level
    blocking lose the pairs token-level dedup can find?  All counts
    integer; two broadcast-sized joins against the (tiny) pair set
    plus one block-size aggregate."""
    from .dedup import JACCARD_DUP_MIN, q_jaccard_pairs

    b = _blocked(spark, sf_dir)
    sizes = b.groupBy("b_lang", "b_len").agg(F.count("*").alias("n"))
    keyed = b.join(sizes, ["b_lang", "b_len"]).select(
        "doc_id", "b_lang", "b_len", (F.col("n") <= BLOCK_CAP).alias("ok")
    )
    truth = (
        q_jaccard_pairs(spark, sf_dir)
        .filter(F.col("jaccard") >= JACCARD_DUP_MIN)
        .select("doc_a", "doc_b")
    )
    ka = keyed.select(
        F.col("doc_id").alias("doc_a"),
        F.col("b_lang").alias("la"),
        F.col("b_len").alias("na"),
        F.col("ok").alias("ok_a"),
    )
    kb = keyed.select(
        F.col("doc_id").alias("doc_b"),
        F.col("b_lang").alias("lb"),
        F.col("b_len").alias("nb"),
        F.col("ok").alias("ok_b"),
    )
    t = truth.join(ka, "doc_a").join(kb, "doc_b")
    blocked_hit = (
        (F.col("la") == F.col("lb"))
        & (F.col("na") == F.col("nb"))
        & F.col("ok_a")
    ).cast("long")
    tr = t.agg(
        F.count("*").cast("long").alias("n_truth"),
        F.sum(blocked_hit).cast("long").alias("n_truth_blocked"),
    )
    cand = sizes.agg(
        F.sum(
            F.when(
                F.col("n") <= BLOCK_CAP,
                (F.col("n") * (F.col("n") - 1)) / 2,
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("n_cand_pairs"),
        F.sum("n").cast("long").alias("n_docs"),
    )
    return (
        tr.join(cand)
        .select(
            "n_truth",
            "n_truth_blocked",
            F.round(
                F.col("n_truth_blocked").cast("double") / F.col("n_truth"),
                6,
            ).alias("completeness"),
            "n_cand_pairs",
            F.round(
                1.0
                - F.col("n_cand_pairs").cast("double")
                / (F.col("n_docs") * (F.col("n_docs") - 1) / 2.0),
                6,
            ).alias("reduction_ratio"),
        )
    )


def _blocking_quality_sql() -> str:
    from .dedup import JACCARD_DUP_MIN, ORACLES as _D

    return (
        "WITH jp AS (" + _D["dedup_jaccard_pairs"] + "), "
        f"truth AS (SELECT doc_a, doc_b FROM jp WHERE jaccard >= {JACCARD_DUP_MIN}), "
        "blk AS (SELECT doc_id, lang AS b_lang, "
        f"n_chars // {LEN_BUCKET} AS b_len FROM documents), "
        "sizes AS (SELECT b_lang, b_len, CAST(count(*) AS BIGINT) AS n "
        "FROM blk GROUP BY 1, 2), "
        "keyed AS (SELECT b.doc_id, b.b_lang, b.b_len, "
        f"s.n <= {BLOCK_CAP} AS ok FROM blk b JOIN sizes s "
        "USING (b_lang, b_len)), "
        "t AS (SELECT CAST(count(*) AS BIGINT) AS n_truth, "
        "CAST(sum(CASE WHEN ka.b_lang = kb.b_lang "
        "AND ka.b_len = kb.b_len AND ka.ok THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_truth_blocked "
        "FROM truth JOIN keyed ka ON ka.doc_id = truth.doc_a "
        "JOIN keyed kb ON kb.doc_id = truth.doc_b), "
        "c AS (SELECT CAST(sum(CASE WHEN n <= "
        f"{BLOCK_CAP} THEN n * (n - 1) // 2 ELSE 0 END) AS BIGINT) "
        "AS n_cand_pairs, CAST(sum(n) AS BIGINT) AS n_docs FROM sizes) "
        "SELECT t.n_truth, t.n_truth_blocked, "
        "round(CAST(t.n_truth_blocked AS DOUBLE) / t.n_truth, 6) "
        "AS completeness, c.n_cand_pairs, "
        "round(1.0 - CAST(c.n_cand_pairs AS DOUBLE) / "
        "(c.n_docs * (c.n_docs - 1) / 2.0), 6) AS reduction_ratio "
        "FROM t, c"
    )


ORACLES["er_blocking_quality"] = _blocking_quality_sql()
QUERIES["er_blocking_quality"] = q_er_blocking_quality


# --- attribute-level survivorship (r7): the golden record ------------
#
# er_entities elects one canonical RECORD; real MDM survivorship
# elects per-ATTRIBUTE winners with per-attribute rules (Talend/
# Informatica-style: "longest" for free text, "most frequent" for
# categorical fields).  One entity-keyed aggregate over the labeled
# corpus — no new shuffle beyond the CC labels the entity query
# already pays for.


def q_er_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden record per entity: text provenance from the LONGEST
    member (n_chars desc, doc_id tie-break), lang and source by
    MAJORITY VOTE (count desc, value asc tie-break), plus member
    count — the per-attribute survivorship matrix of MDM
    consolidation.  Scale shape: CC labels (matched subgraph only) +
    two grouped votes + one entity window; every stage keys on
    entity_id/attribute, partial-agg friendly, no corpus² anywhere."""
    labels = _er_cc_labels(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    ent = docs.join(
        labels, docs.doc_id == labels.node, "left"
    ).select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.coalesce("label", "doc_id").cast("long").alias("entity_id"),
    )

    def vote(col: str) -> DataFrame:
        w = Window.partitionBy("entity_id").orderBy(
            F.desc("n"), F.asc(col)
        )
        return (
            ent.groupBy("entity_id", col)
            .agg(F.count("*").alias("n"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("entity_id", F.col(col).alias(f"{col}_won"))
        )

    canon_w = Window.partitionBy("entity_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    canon = (
        ent.withColumn("rn", F.row_number().over(canon_w))
        .filter(F.col("rn") == 1)
        .select(
            "entity_id",
            F.col("doc_id").alias("canon_doc_id"),
            F.col("n_chars").cast("long").alias("canon_n_chars"),
        )
    )
    members = ent.groupBy("entity_id").agg(
        F.count("*").cast("long").alias("n_members")
    )
    return (
        canon.join(vote("lang"), "entity_id")
        .join(vote("source"), "entity_id")
        .join(members, "entity_id")
        .select(
            "entity_id",
            "canon_doc_id",
            "canon_n_chars",
            F.col("lang_won").alias("lang"),
            F.col("source_won").alias("source"),
            "n_members",
        )
    )


def _er_survivorship_sql() -> str:
    pairs = ORACLES["er_fuzzy_pairs"]
    return (
        "WITH RECURSIVE "
        f"epairs AS (SELECT doc_a, doc_b FROM ({pairs})), "
        "eedges AS (SELECT doc_a AS src, doc_b AS dst FROM epairs "
        "UNION ALL SELECT doc_b, doc_a FROM epairs), "
        "ecc(node, label) AS (SELECT src, src FROM eedges "
        "UNION "
        "SELECT e.dst, ecc.label FROM ecc JOIN eedges e "
        "ON ecc.node = e.src), "
        "elab AS (SELECT node, min(label) AS label FROM ecc "
        "GROUP BY node), "
        "ent AS (SELECT d.doc_id, d.lang, d.source, d.n_chars, "
        "CAST(coalesce(l.label, d.doc_id) AS BIGINT) AS entity_id "
        "FROM documents d LEFT JOIN elab l ON d.doc_id = l.node), "
        "lv AS (SELECT entity_id, lang, count(*) AS n FROM ent "
        "GROUP BY entity_id, lang), "
        "lw AS (SELECT entity_id, lang, row_number() OVER "
        "(PARTITION BY entity_id ORDER BY n DESC, lang) AS rn FROM lv), "
        "sv AS (SELECT entity_id, source, count(*) AS n FROM ent "
        "GROUP BY entity_id, source), "
        "sw AS (SELECT entity_id, source, row_number() OVER "
        "(PARTITION BY entity_id ORDER BY n DESC, source) AS rn "
        "FROM sv), "
        "can AS (SELECT entity_id, doc_id AS canon_doc_id, "
        "n_chars AS canon_n_chars, row_number() OVER "
        "(PARTITION BY entity_id ORDER BY n_chars DESC, doc_id) AS rn "
        "FROM ent), "
        "mem AS (SELECT entity_id, CAST(count(*) AS BIGINT) AS "
        "n_members FROM ent GROUP BY entity_id) "
        "SELECT c.entity_id, CAST(c.canon_doc_id AS BIGINT) AS "
        "canon_doc_id, CAST(c.canon_n_chars AS BIGINT) AS "
        "canon_n_chars, l.lang, s.source, m.n_members "
        "FROM can c "
        "JOIN lw l ON l.entity_id = c.entity_id AND l.rn = 1 "
        "JOIN sw s ON s.entity_id = c.entity_id AND s.rn = 1 "
        "JOIN mem m ON m.entity_id = c.entity_id "
        "WHERE c.rn = 1"
    )


QUERIES_R7 = {"er_survivorship": q_er_survivorship}
ORACLES_R7 = {"er_survivorship": _er_survivorship_sql()}


# --- blocking-hierarchy audit (r10) -----------------------------------
#
# Observability twin of the r10 hierarchical blocking (the same role
# sim_bucket_occupancy_audit plays for the embedding hot-bucket cap):
# per level-1 block, its refinement posture — did it refine, into how
# many sub-blocks, how big is the worst sub-block, and how many docs
# would STILL drop at level 2.  The numbers that tell an operator
# "REFINE_LEN is too coarse for this corpus" BEFORE the verify stage
# either explodes or silently drops a block.  One pass: the level-2
# rollup aggregates to the level-1 grain; under-cap blocks report
# themselves as one un-refined sub-block.


def q_er_refinement_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _blocked(spark, sf_dir).withColumn(
        "b_pre", F.substring(F.col("prefix"), 1, REFINE_LEN)
    )
    s2 = b.groupBy("b_lang", "b_len", "b_pre").agg(
        F.count("*").alias("sub_n")
    )
    lvl1 = s2.groupBy("b_lang", "b_len").agg(
        F.sum("sub_n").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_sub_raw"),
        F.max("sub_n").cast("long").alias("max_sub_raw"),
        F.sum(
            F.when(F.col("sub_n") > BLOCK_CAP, F.col("sub_n")).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("dropped_raw"),
    )
    refined = F.col("n_docs") > BLOCK_CAP
    return lvl1.select(
        "b_lang",
        "b_len",
        "n_docs",
        refined.cast("int").alias("refined"),
        F.when(refined, F.col("n_sub_raw"))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("n_sub_blocks"),
        F.when(refined, F.col("max_sub_raw"))
        .otherwise(F.col("n_docs"))
        .cast("long")
        .alias("max_sub_block"),
        F.when(refined, F.col("dropped_raw"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("dropped_docs"),
    )


_REFINE_AUDIT_SQL = (
    f"WITH {_BLK}, "
    f"b2 AS (SELECT *, substr(prefix, 1, {REFINE_LEN}) AS b_pre FROM blk), "
    "s2 AS (SELECT b_lang, b_len, b_pre, count(*) AS sub_n FROM b2 "
    "GROUP BY 1, 2, 3), "
    "l1 AS (SELECT b_lang, b_len, CAST(sum(sub_n) AS BIGINT) AS n_docs, "
    "CAST(count(*) AS BIGINT) AS n_sub_raw, "
    "CAST(max(sub_n) AS BIGINT) AS max_sub_raw, "
    f"CAST(sum(CASE WHEN sub_n > {BLOCK_CAP} THEN sub_n ELSE 0 END) "
    "AS BIGINT) AS dropped_raw "
    "FROM s2 GROUP BY 1, 2) "
    "SELECT b_lang, b_len, n_docs, "
    f"CAST(n_docs > {BLOCK_CAP} AS INTEGER) AS refined, "
    f"CAST(CASE WHEN n_docs > {BLOCK_CAP} THEN n_sub_raw ELSE 1 END "
    "AS BIGINT) AS n_sub_blocks, "
    f"CAST(CASE WHEN n_docs > {BLOCK_CAP} THEN max_sub_raw ELSE n_docs "
    "END AS BIGINT) AS max_sub_block, "
    f"CAST(CASE WHEN n_docs > {BLOCK_CAP} THEN dropped_raw ELSE 0 END "
    "AS BIGINT) AS dropped_docs FROM l1"
)

QUERIES_R10 = {"er_refinement_audit": q_er_refinement_audit}
ORACLES_R10 = {"er_refinement_audit": _REFINE_AUDIT_SQL}
