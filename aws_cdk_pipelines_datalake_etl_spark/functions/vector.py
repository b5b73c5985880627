"""Vector (embedding) column expressions — JVM-side, no UDFs.

``array<float>`` embeddings are cast to double and folded with
``aggregate``/``zip_with`` so dot products run inside codegen.  The
fold is sequential over the array, which makes the result
bit-deterministic (same input -> same double), matching a sequential
evaluation in an external oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: str) -> Column:
    return F.col(col).cast("array<double>")


def dot(a: str, b: str) -> Column:
    """Sequential-fold dot product of two array<double> columns."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double),"
        " (acc, v) -> acc + v)"
    )


def norm(a: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate({a}, cast(0.0 as double), (acc, v) -> acc + v * v)"
        )
    )


def cosine(a: str, b: str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    return dot(a, b) / (norm(a) * norm(b))


# NOTE: an unrolled known-dim codegen dot (128-term element_at chain)
# was tried for the pair-join hot path and measured ~2.5x SLOWER than
# the lambda fold at dim 64 — winnow's codegen-beats-lambda rule holds
# for small closed forms only (see SCALE.md, semantic dedup probe).
