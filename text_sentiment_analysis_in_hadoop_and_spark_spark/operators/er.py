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

LEN_BUCKET = 100  # n_chars DIV 100 → same-length-scale docs only
BLOCK_CAP = 500  # quadratic-verify bound per block
LEV_MAX = 10  # max edits over the compared prefix
# 32 not 64: the DP is O(len²) per candidate pair and runs
# |block|²/2 times — halving the prefix quarters the dominant cost
# (measured 21 s → ~4 s at sf0.1) while a 10-edit budget over 32
# chars still admits the typo/OCR band the operator targets
PREFIX_LEN = 32


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


def q_er_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _blocked(spark, sf_dir)
    sizes = b.groupBy("b_lang", "b_len").agg(F.count("*").alias("n"))
    small = b.join(
        F.broadcast(sizes.filter(F.col("n") <= BLOCK_CAP)),
        ["b_lang", "b_len"],
    ).drop("n")
    left = small.select(
        "b_lang",
        "b_len",
        F.col("doc_id").alias("doc_a"),
        F.col("prefix").alias("pref_a"),
    )
    right = small.select(
        "b_lang",
        "b_len",
        F.col("doc_id").alias("doc_b"),
        F.col("prefix").alias("pref_b"),
    )
    return (
        left.join(right, ["b_lang", "b_len"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        # threshold form runs the BANDED O(len·k) DP and returns -1
        # past the budget — the verify kernel, not the full DP
        .withColumn(
            "lev", F.levenshtein("pref_a", "pref_b", LEV_MAX)
        )
        .filter(F.col("lev") >= 0)
        .select("doc_a", "doc_b", "b_lang", "b_len", "lev")
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
    "er_fuzzy_pairs": (
        f"WITH {_BLK}, "
        "sizes AS (SELECT b_lang, b_len, count(*) AS n FROM blk "
        "GROUP BY 1, 2), "
        "small AS (SELECT b.* FROM blk b JOIN sizes s USING (b_lang, b_len) "
        f"WHERE s.n <= {BLOCK_CAP}) "
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.b_lang, a.b_len, "
        "CAST(levenshtein(a.prefix, b.prefix) AS INTEGER) AS lev "
        "FROM small a JOIN small b USING (b_lang, b_len) "
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
    from .dedup import connected_components

    pairs = q_er_fuzzy_pairs(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components(pairs)
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
