from .extract import (  # noqa: F401
    extract_links_udf,
    extract_text_udf,
    reference_extract_links,
    reference_extract_text,
)
from .hashing import portable_hash64_col, portable_hash64_sql, portable_hash64_py  # noqa: F401
