"""Reusable column-expression library (public API).

The engine's shared expression builders in one importable place —
everything here produces either a :class:`pyspark.sql.Column` or a
dialect-parameterized SQL fragment, built from ``pyspark.sql.functions``
and plain SQL text only (JVM-side; no UDFs):

- engine-stable numerics: :func:`money_sum` / :func:`money_avg` and
  their SQL twins — exact DECIMAL accumulation behind a double result
  (see plans/spec.py for the determinism rules).
- portable text hashing: :func:`polyhash`, :func:`words`,
  :func:`word_hashes`, :func:`shingle_hashes`,
  :func:`char_shingle_hashes`, bit helpers — identical bits in Spark
  and DuckDB (operators/texthash.py).
- vector math over ``array<float>`` embeddings: :func:`cosine_expr`
  from exact integer dot products (operators/similarity).
- deterministic sampling: :func:`hash_bucket` (0..9999 bucket for
  rate predicates and splits) and :func:`es_priority_key`
  (Efraimidis-Spirakis weighted-sample priority; see
  operators/pipeline.py) — reproducible across engines, reruns, and
  repartitionings where ``rand()``/``df.sample`` are not.

Import surface::

    from gcp_dbt_data_engineering_spark.functions import (
        money_sum, sql_money_sum, shingle_hashes, cosine_expr,
    )
"""

from __future__ import annotations

from ..operators.texthash import (  # noqa: F401
    P,
    bit,
    char_shingle_hashes,
    minhash_coeffs,
    perm_coeffs,
    polyhash,
    shiftleft_one,
    shingle_hashes,
    word_hashes,
    word_shingles,
    words,
    xor,
)
from ..plans.spec import (  # noqa: F401
    money_avg,
    money_sum,
    sql_money_avg,
    sql_money_sum,
)
from ..operators.pipeline import (  # noqa: F401
    es_priority_key,
)
from ..operators.pipeline import _bucket as hash_bucket  # noqa: F401


def cosine_expr(dot: str, norm_a: str, norm_b: str) -> str:
    """Cosine from exact integer dot/norm expressions (fixed op order,
    bit-identical across engines — operators/similarity.py)."""
    from ..operators.similarity import _cosine

    return _cosine(dot, norm_a, norm_b)


__all__ = [
    "P",
    "bit",
    "char_shingle_hashes",
    "cosine_expr",
    "es_priority_key",
    "hash_bucket",
    "money_avg",
    "money_sum",
    "minhash_coeffs",
    "perm_coeffs",
    "polyhash",
    "shiftleft_one",
    "shingle_hashes",
    "sql_money_avg",
    "sql_money_sum",
    "word_hashes",
    "word_shingles",
    "words",
    "xor",
]
