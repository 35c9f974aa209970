"""Golden fixtures for the P2→P7 cleaning chain (FIXTURES.md §2) and
Java↔RE2 URL-regex parity — the root of every downstream number.

The Spark side executes the reference's Java regex verbatim
(/root/reference/Hadoop/NB.java:67-73); the DuckDB oracle executes the
RE2 re-expression.  Both must agree on every fixture, including the
adversarial hostnames that broke the r1 ``(www\\.)?`` approximation.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from text_sentiment_analysis_in_hadoop_and_spark_spark.functions.cleaning import (
    clean_text,
    clean_text_sql,
)

GOLDEN = [
    (
        "@AnoopDoggDesai I will not be home to watch it!  I will definitely "
        "have to DVR it!!! can't wait! &lt;3",
        "i will not be home to watch it i will definitely have to dvr it "
        "can t wait",
    ),
    ("check http://www.example.com/foo now #happy day", "check now day"),
    ("a & b said hello @user1 #tag_one more", "a said hello more"),
    ("plain text no specials 123 here", "plain text no specials here"),
    ("&quot;quoted&quot; stuff", "quoted stuff"),
    ("@only_a_mention", ""),
]

# Adversarial URL shapes: Java's (?!www) lookahead vs the RE2 expansion.
# Second element = does the reference strip the URL?
URL_CASES = [
    ("pre https://wwwfoo.com/bar post", False),  # host starts www, no dot
    ("pre https://WWWFOO.com post", False),      # same, uppercased
    ("pre http://wwww.com post", False),         # starts www too
    ("pre https://www.foo.com/bar post", True),
    ("pre https://WWW.FOO.COM/q post", True),
    ("pre http://wwfoo.com post", True),         # ww but not www
    ("pre https://wwa.io post", True),           # 3-char label ww + not-w
    ("pre http://w.co post", True),              # 1-char label
    ("pre http://ab.cd post", True),
    ("pre www.foo-bar.com mid www.x.co post", True),
]


def _spark_clean(spark, texts: list[str]) -> list[str]:
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    return [
        r["cleaned"]
        for r in df.select(clean_text(F.col("text")).alias("cleaned")).collect()
    ]


def _duck_clean(texts: list[str]) -> list[str]:
    con = duckdb.connect()
    con.execute("CREATE TABLE t (text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(t,) for t in texts])
    rows = con.execute(
        f"SELECT {clean_text_sql('text')} FROM t"
    ).fetchall()
    con.close()
    return [r[0] for r in rows]


def test_golden_cleaning_spark(spark):
    got = _spark_clean(spark, [raw for raw, _ in GOLDEN])
    for (raw, want), g in zip(GOLDEN, got):
        assert g == want, f"Spark clean({raw!r}) = {g!r}, want {want!r}"


def test_golden_cleaning_duckdb():
    got = _duck_clean([raw for raw, _ in GOLDEN])
    for (raw, want), g in zip(GOLDEN, got):
        assert g == want, f"DuckDB clean({raw!r}) = {g!r}, want {want!r}"


def test_url_regex_java_re2_parity(spark):
    texts = [t for t, _ in URL_CASES]
    s = _spark_clean(spark, texts)
    d = _duck_clean(texts)
    for (raw, stripped), sv, dv in zip(URL_CASES, s, d):
        assert sv == dv, f"engine divergence on {raw!r}: spark={sv!r} duck={dv!r}"
        has_url_residue = any(
            tok in sv for tok in ("http", "www", "com", "foo", "co ")
        ) or sv.endswith("co")
        if stripped:
            assert sv == "pre post" or not has_url_residue, (
                f"expected URL stripped in {raw!r}, got {sv!r}"
            )
        else:
            assert has_url_residue, (
                f"expected URL kept (mangled) in {raw!r}, got {sv!r}"
            )


@pytest.mark.parametrize(
    "raw,want",
    [
        ("can't", "can t"),
        ("A  B\tC", "a b c"),
        ("123", ""),
        ("&lt;3", ""),
        ("&lt;3 &amp; more", "more"),
    ],
)
def test_cleaning_edge_cases_both_engines(spark, raw, want):
    assert _spark_clean(spark, [raw]) == [want]
    assert _duck_clean([raw]) == [want]


def test_cleaning_engine_parity_fuzz(spark):
    """Seeded batch fuzz of the riskiest equivalence in the repo: the
    Java-regex chain Spark executes vs the RE2 rewrite DuckDB executes
    (the URL pattern's `(?!www)` lookahead is hand-translated, see
    functions/cleaning.py).  500 adversarial strings — url-ish
    fragments, www edge labels, mentions/entities, digits, unicode,
    tabs — must clean identically through BOTH engines."""
    import random

    rng = random.Random(20260813)
    frags = [
        "http://", "https://", "www.", "ww", "www", "wwwx", "w-w.",
        "a.co", "foo.com/x?y=1", "x.io", "tweet", "@user", "#tag",
        "&amp;", "&", "can't", "no2o", "42", "3.14", "…", "naïve",
        "ПРИВЕТ", "日本語", "\t", "  ", ".", ",", "-", "_", "~", "co",
        "W", "WwW.", "HTTP://", "a" * 30, "b.c",
    ]
    texts = []
    for _ in range(500):
        n = rng.randint(0, 8)
        texts.append(" ".join(rng.choice(frags) for _ in range(n)))
    s = _spark_clean(spark, texts)
    d = _duck_clean(texts)
    diverged = [
        (raw, sv, dv) for raw, sv, dv in zip(texts, s, d) if sv != dv
    ]
    assert not diverged, diverged[:5]
