"""Column-expression builders: the engine's scalar/aggregate vocabulary.

Everything here returns pyspark Columns built from built-in functions so the hot
path stays inside whole-stage codegen — the reference's row-at-a-time Python
ladders (isinstance checks, str.split loops) become vectorized JVM expressions.
"""

from .typeladder import (  # noqa: F401
    string_value_type,
    type_profile_exprs,
    resolve_profile,
)
from .textstats import (  # noqa: F401
    ws_token_count,
    bpe_token_count,
    punct_ratio,
    stopword_ratio,
    quality_score,
    word_fingerprint,
)
from .hashing import salted_md5, hex_hash_long  # noqa: F401
from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
