"""Python UDTF surface (Spark 3.5+/4 ``@udtf``): one input row → many
output rows through a user-defined TABLE function, consumed with
``LATERAL``.

The engine's UDF family is otherwise complete (scalar Arrow
``pandas_udf`` q29, grouped-agg UDAF ``udaf_mad``, grouped-map
``applyInPandas``, ``mapInPandas`` multimodal); the UDTF is the last
member — the escape hatch for per-row fan-out logic that genuinely
needs imperative Python.  ``useArrow=True`` keeps transfer batched.

Scale note: like every Python surface this is the SLOW path — the
word-ngram example here has a native twin (``F.transform`` over a
token array, see operators/chunking.py) that should win whenever the
logic is expressible; the UDTF exists for when it is not, and the
oracle proves the fan-out semantics are exact, not just runnable.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, ngram string", useArrow=True)
class WordNgrams:
    """(pos, ngram) for every word n-gram of ``text`` — one output row
    per position, like posexplode over the shingle array."""

    def eval(self, text: str, n: int):  # noqa: D102
        if text is None:
            return
        words = text.lower().split(" ")
        for i in range(len(words) - n + 1):
            yield i, " ".join(words[i : i + n])


def register_udtfs(spark) -> None:
    """Idempotent SQL registration (``word_ngrams``)."""
    spark.udtf.register("word_ngrams", WordNgrams)
