"""Vector math as Catalyst higher-order-function expressions.

Parity target: pgvector ``embedding <=> q`` cosine distance
(/root/reference/src/sifts/core.py:319-321, :558-564) and the SQLite
client-side numpy ranking (core.py:527-542). Both reduce to a cosine
similarity; we compute it with ``zip_with``/``aggregate`` so the whole
expression runs JVM-side inside codegen — no Python round-trip per row,
and TakeOrderedAndProject handles top-k without a full sort.

All arithmetic in DOUBLE: the testdata embeddings are float32, but
accumulating in float32 diverges from the DuckDB oracle (which promotes);
``cast`` early, stay double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity in [-1, 1]; null/zero-norm inputs → NULL
    (matches pgvector, which errors on zero vectors — we go NULL-safe)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def cosine_similarity_sql(a_expr: str, b_expr: str) -> str:
    """DuckDB twin. list_cosine_similarity matches zip_with/aggregate
    up to float addition order; round before hashing (the harness does)."""
    return f"list_cosine_similarity({a_expr}, {b_expr})"
