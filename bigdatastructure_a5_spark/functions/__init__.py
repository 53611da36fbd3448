"""Reusable column-expression helpers (all JVM-side, codegen-friendly)."""

from bigdatastructure_a5_spark.functions.numeric import (  # noqa: F401
    dec_sum,
    dec_sum_double,
    det_avg,
)
from bigdatastructure_a5_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
)
from bigdatastructure_a5_spark.functions.hashing import (  # noqa: F401
    word_shingles,
    word_shingles_from_tokens,
    normalized_text,
    md5_fingerprint,
)
