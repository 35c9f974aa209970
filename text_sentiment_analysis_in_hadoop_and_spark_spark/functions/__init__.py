from .cleaning import (  # noqa: F401
    clean_text,
    clean_text_sql,
    explode_tokens,
    nonempty,
    tokenize,
)
from .hashing import hex32, hex32_sql, md5_fingerprint  # noqa: F401
