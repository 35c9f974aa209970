"""Text-cleaning expression library — the canonical scalar pipeline.

Every program in the reference applies the identical 7-step chain
(URL strip → mention/hashtag/entity strip → digit strip → punctuation
→ lowercase → trim → whitespace collapse):
/root/reference/Hadoop/NB.java:67-73 and its copies at
Hadoop/NB.java:215-221, Hadoop/Modified_NB.java:77-83,:469-475,
Spark/NB/src/main/scala/NB.scala:53-59 (and the other 3 Scala apps).

Here it is a pure-Column ``regexp_replace`` chain: zero Python UDFs,
fully inside whole-stage codegen, so it runs at JVM speed over 100 TB.
``clean_text_sql`` emits the ANSI/DuckDB-SQL equivalent so oracle
checks can recompute it independently.

RE2 caveat: the reference's URL regex uses a negative lookahead
``(?!www)`` (Java regex), which RE2 (DuckDB) does not support.  Spark
executes Java regex, so the Spark side uses the reference's pattern
verbatim; the SQL builder uses an equivalent RE2 pattern that
enumerates host labels not starting with "www" explicitly (verified
equivalent on adversarial fixtures incl. ``https://wwwfoo.com`` in
tests/test_cleaning.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Verbatim from /root/reference/Hadoop/NB.java:67 (Java regex).
URL_RE_JAVA = (
    r"(?i)(https?:\/\/(?:www\.|(?!www))[a-zA-Z0-9][a-zA-Z0-9-]+[a-zA-Z0-9]"
    r"\.[^\s]{2,}|www\.[a-zA-Z0-9][a-zA-Z0-9-]+[a-zA-Z0-9]\.[^\s]{2,}|"
    r"https?:\/\/(?:www\.|(?!www))[a-zA-Z0-9]+\.[^\s]{2,}|"
    r"www\.[a-zA-Z0-9]+\.[^\s]{2,})"
)

# RE2-safe equivalent for engines without lookahead (DuckDB oracle).
# Java's ``(?:www\.|(?!www))`` is re-expressed by enumerating host labels
# that do not *start* with "www" (classes exclude w; case-insensitive flag
# is applied by the caller, so [a-vx-z0-9] also excludes W):
#   A: 1st char != w           B: starts w, 2nd char != w
#   C: starts ww, 3rd char != w (general and exactly-3-char label forms)
_L3_NOWWW = (
    r"(?:[a-vx-z0-9][a-z0-9-]+[a-z0-9]"
    r"|w[a-vx-z0-9-][a-z0-9-]*[a-z0-9]"
    r"|ww[a-vx-z0-9-][a-z0-9-]*[a-z0-9]"
    r"|ww[a-vx-z0-9])"
)
_L1_NOWWW = r"(?:[a-vx-z0-9][a-z0-9]*|ww?(?:[a-vx-z0-9][a-z0-9]*)?)"
URL_RE_RE2 = (
    rf"(https?://(?:www\.[a-z0-9][a-z0-9-]+[a-z0-9]|{_L3_NOWWW})\.[^\s]{{2,}}|"
    r"www\.[a-z0-9][a-z0-9-]+[a-z0-9]\.[^\s]{2,}|"
    rf"https?://(?:www\.[a-z0-9]+|{_L1_NOWWW})\.[^\s]{{2,}}|"
    r"www\.[a-z0-9]+\.[^\s]{2,})"
)

# /root/reference/Hadoop/NB.java:68 — also eats HTML entities (&lt;)
# and the word after a bare '&' (verified empirically, FIXTURES.md §2).
MENTION_RE = r"(#|@|&).*?\w+"
DIGIT_RE = r"\d+"          # NB.java:69
PUNCT_RE = r"[^a-zA-Z ]"   # NB.java:70 — apostrophes become spaces
WS_RE = r"\s+"             # NB.java:73


def clean_text(col: Column) -> Column:
    """P2→P7 chain (SURVEY §2.2), bit-identical to NB.java:67-73."""
    c = F.regexp_replace(col, URL_RE_JAVA, "")
    c = F.regexp_replace(c, MENTION_RE, "")
    c = F.regexp_replace(c, DIGIT_RE, "")
    c = F.regexp_replace(c, PUNCT_RE, " ")
    c = F.lower(c)
    c = F.trim(c)
    c = F.regexp_replace(c, WS_RE, " ")
    return c


def clean_text_sql(expr: str) -> str:
    """DuckDB-SQL equivalent of :func:`clean_text` (RE2-safe URL re).

    Java applies trim before the whitespace collapse; with spaces as
    the only whitespace left after the punctuation step the two orders
    are equivalent, and SQL reads better with trim outermost.
    """
    url = URL_RE_RE2.replace("'", "''")
    return (
        "trim(regexp_replace(lower(regexp_replace(regexp_replace("
        f"regexp_replace(regexp_replace({expr}, '{url}', '', 'gi'), "
        r"'(#|@|&).*?\w+', '', 'g'), "
        r"'\d+', '', 'g'), "
        r"'[^a-zA-Z ]', ' ', 'g')), "
        r"'\s+', ' ', 'g'))"
    )


def nonempty(col: Column) -> Column:
    """Empty-text filter P8 — /root/reference/Hadoop/NB.java:90,:228."""
    return F.length(F.trim(col)) > 0


def tokenize(col: Column) -> Column:
    """Whitespace tokenize P10 — split(" ") after the collapse step,
    /root/reference/Hadoop/NB.java:92."""
    return F.split(col, " ")


def explode_tokens(col: Column) -> Column:
    """Explode tokens to one row per word (P11) —
    /root/reference/Hadoop/NB.java:94-95."""
    return F.explode(tokenize(col))
