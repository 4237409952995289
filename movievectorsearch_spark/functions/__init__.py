"""Expression builders: pure ``pyspark.sql.Column`` factories.

Everything here compiles to JVM-side Catalyst expressions (no Python
UDFs), so the hot paths stay inside whole-stage codegen and the same
logic is mirrorable as ANSI SQL for the DuckDB oracle.
"""

from movievectorsearch_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
    l2_normalize,
    vector_lit,
)
from movievectorsearch_spark.functions.hashing import (  # noqa: F401
    int_mix,
    int_mix_sql,
    poly_hash,
    poly_hash_sql,
    minhash_permute,
)
from movievectorsearch_spark.functions.text import (  # noqa: F401
    clean_text,
    normalize_key,
    slug_id,
    tokens,
    token_count,
    word_shingles,
)
