"""Char-trigram Naive Bayes language identification.

Replaces the 8-stopword-per-language heuristic
(functions/text_fn.py:STOPWORDS) with the standard real approach
(Cavnar & Trenkle 1994 n-gram text categorization, NB-scored): a
character-trigram model per language, trained on an embedded
PUBLIC-DOMAIN sample (Universal Declaration of Human Rights,
Article 1 — the canonical multilingual NLP sample — plus a few
original everyday sentences per language), scored with add-one
(Laplace) smoothing.

Why this is oracle-able and engine-exact: every log-probability is
quantized to integer MICRO-NATS (``floor(ln(x) * 1e6 + 0.5)``) before
any summation — the same device as ``operators/lm.py`` — so a doc's
per-language score is an integer sum, independent of partitioning,
summation order, and engine.  The DuckDB oracle retrains the identical
model from the same embedded sample in SQL.

Scale shape: the model is a few thousand (lang, trigram) rows —
broadcast; docs explode to trigram occurrences row-locally, the
broadcast join fans out at most ``n_languages`` per occurrence, and
two hash aggregations (per (doc, lang) sum; per doc argmax) finish the
job.  No window over scored rows, no UDF, no collect.

NB math with add-one smoothing, per language L with trigram counts
``cnt(L, t)``, total trigrams ``N_L`` and GLOBAL trigram vocabulary
size ``V``::

    score(doc, L) = sum_t k_t * ln((cnt(L, t) + 1) / (N_L + V))
                  = [sum_{matched t} k_t * ln(cnt(L, t) + 1)]
                    - K_doc * ln(N_L + V)

Unmatched trigrams contribute ``ln(1) = 0`` to the first term, so only
the broadcast-join MATCHES are aggregated; the second term is a
row-local multiply against a tiny per-language constant table.

No reference-parity citation: the reference (aws-samples
aws-cdk-pipelines-datalake-etl) has no language-ID surface; Tier-E
LLM-corpus toolkit (SURVEY.md §2.6/§6).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MICRO = 1_000_000

#: Public-domain training sample per language: UDHR Article 1 plus a
#: few original everyday sentences (weather/family/food/city) to widen
#: trigram coverage beyond the declaration's register.
LANGID_SAMPLES: dict[str, str] = {
    "en": (
        "All human beings are born free and equal in dignity and "
        "rights. They are endowed with reason and conscience and "
        "should act towards one another in a spirit of brotherhood. "
        "The weather was cold this morning and the streets of the "
        "city were quiet. She bought bread and cheese at the market "
        "and walked home with her children."
    ),
    "es": (
        "Todos los seres humanos nacen libres e iguales en dignidad "
        "y derechos y, dotados como estan de razon y conciencia, "
        "deben comportarse fraternalmente los unos con los otros. "
        "Esta manana hacia frio y las calles de la ciudad estaban "
        "tranquilas. Ella compro pan y queso en el mercado y volvio "
        "a casa con sus hijos."
    ),
    "de": (
        "Alle Menschen sind frei und gleich an Wuerde und Rechten "
        "geboren. Sie sind mit Vernunft und Gewissen begabt und "
        "sollen einander im Geist der Bruederlichkeit begegnen. "
        "Heute morgen war es kalt und die Strassen der Stadt waren "
        "ruhig. Sie kaufte Brot und Kaese auf dem Markt und ging mit "
        "ihren Kindern nach Hause."
    ),
    "fr": (
        "Tous les etres humains naissent libres et egaux en dignite "
        "et en droits. Ils sont doues de raison et de conscience et "
        "doivent agir les uns envers les autres dans un esprit de "
        "fraternite. Ce matin il faisait froid et les rues de la "
        "ville etaient calmes. Elle a achete du pain et du fromage "
        "au marche et elle est rentree avec ses enfants."
    ),
    "it": (
        "Tutti gli esseri umani nascono liberi ed eguali in dignita "
        "e diritti. Essi sono dotati di ragione e di coscienza e "
        "devono agire gli uni verso gli altri in spirito di "
        "fratellanza. Questa mattina faceva freddo e le strade della "
        "citta erano tranquille. Lei ha comprato pane e formaggio al "
        "mercato ed e tornata a casa con i suoi bambini."
    ),
    "pt": (
        "Todos os seres humanos nascem livres e iguais em dignidade "
        "e em direitos. Dotados de razao e de consciencia, devem "
        "agir uns para com os outros em espirito de fraternidade. "
        "Esta manha estava frio e as ruas da cidade estavam calmas. "
        "Ela comprou pao e queijo no mercado e voltou para casa com "
        "os seus filhos."
    ),
    "nl": (
        "Alle mensen worden vrij en gelijk in waardigheid en rechten "
        "geboren. Zij zijn begiftigd met verstand en geweten, en "
        "behoren zich jegens elkander in een geest van broederschap "
        "te gedragen. Vanmorgen was het koud en de straten van de "
        "stad waren stil. Zij kocht brood en kaas op de markt en "
        "liep met haar kinderen naar huis."
    ),
}


def _norm(col) -> F.Column:
    """Shared normalization: lowercase, every non-[a-z ] char becomes
    a space, runs collapse, then one boundary space is padded on each
    side so word-initial/final trigrams carry boundary signal.
    Accented letters deliberately normalize AWAY (the samples above
    are pre-folded) — the model discriminates on letter patterns, not
    diacritics, keeping the DuckDB twin trivially identical."""
    c = F.lower(col)
    c = F.regexp_replace(c, "[^a-z ]", " ")
    c = F.trim(F.regexp_replace(c, " +", " "))
    return F.concat(F.lit(" "), c, F.lit(" "))


def _trigram_rows(d: DataFrame, key: str) -> DataFrame:
    """Explode a ``(key, _n)`` frame to one row per overlapping char
    trigram: ``(key, tri)``.

    Deliberately Generate+Project, NOT a higher-order ``transform``
    lambda (the :mod:`..dedup` winnow lesson): Catalyst's project
    collapsing inlines the whole normalization regexp chain into a
    lambda body, where codegen CSE does not apply — so the chain
    would re-evaluate once PER TRIGRAM (~300x per doc; measured 64 s
    for 1.5M trigrams at sf0.1 vs ~1 s this way).  Here ``_n`` is a
    real attribute computed once per doc in the upstream Project, the
    Generate explodes just the position sequence, and the substring
    is one codegen'd expression per output row."""
    return d.select(
        key,
        "_n",
        F.explode(
            F.when(
                F.length("_n") >= 3,
                F.sequence(F.lit(1), F.length("_n") - 2),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("i"),
    ).select(key, F.expr("substring(_n, i, 3)").alias("tri"))


def _py_norm(text: str) -> str:
    """Driver-side twin of :func:`_norm` (same char class, same
    collapse/trim/pad) — applied only to the embedded SAMPLE strings;
    corpus text is always normalized by the Catalyst expression."""
    import re

    t = re.sub(r"[^a-z ]", " ", text.lower())
    t = re.sub(r" +", " ", t).strip()
    return f" {t} "


def train_langid_model(
    spark: SparkSession, samples: dict[str, str] | None = None
) -> tuple[DataFrame, DataFrame]:
    """Build the NB model tables.  Returns ``(model, consts)``:

    - ``model``: (lang, tri, micro_logp) with ``micro_logp =
      floor(ln(cnt + 1) * 1e6 + 0.5)`` — broadcast-sized (a few
      thousand rows; grows with the SAMPLE, never the corpus);
    - ``consts``: (lang, micro_denom) with ``micro_denom =
      floor(ln(N_lang + V) * 1e6 + 0.5)`` — one row per language.

    Counting runs DRIVER-side: the training input is the embedded
    sample dict (a handful of strings), so spinning Spark jobs for it
    would only add scheduler overhead — the distributed work of this
    operator is the corpus scoring, and the model ships to it as two
    small createDataFrame tables (broadcast by the scorer).  The
    quantization (floor(ln(x) * 1e6 + 0.5), IEEE doubles) is the same
    arithmetic the DuckDB oracle's in-SQL retraining performs, so the
    tables are engine-exact either way."""
    samples = LANGID_SAMPLES if samples is None else samples
    counts: dict[tuple[str, str], int] = {}
    totals: dict[str, int] = {}
    vocab: set[str] = set()
    for lang, text in sorted(samples.items()):
        s = _py_norm(text)
        for i in range(len(s) - 2):
            tri = s[i : i + 3]
            counts[(lang, tri)] = counts.get((lang, tri), 0) + 1
            totals[lang] = totals.get(lang, 0) + 1
            vocab.add(tri)
    v = len(vocab)
    model = spark.createDataFrame(
        [
            (lang, tri, int(math.floor(math.log(c + 1) * MICRO + 0.5)))
            for (lang, tri), c in sorted(counts.items())
        ],
        "lang string, tri string, micro_logp long",
    )
    consts = spark.createDataFrame(
        [
            (lang, int(math.floor(math.log(n + v) * MICRO + 0.5)))
            for lang, n in sorted(totals.items())
        ],
        "lang string, micro_denom long",
    )
    return model, consts


def language_id_nb(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    samples: dict[str, str] | None = None,
) -> DataFrame:
    """Per-document language via the char-trigram NB model.

    Output: (id_col, lang, score_micro, n_trigrams) — ``lang`` is the
    argmax language (ties broken lexicographically; ``'und'`` with
    score 0 when no trigram survives normalization), ``score_micro``
    the winning integer micro-nat log-likelihood (more negative =
    less like ANY trained language; comparable across docs after
    dividing by ``n_trigrams``)."""
    spark = df.sparkSession
    model, consts = train_langid_model(spark, samples)

    docs = df.select(
        F.col(id_col).alias("_id"), _norm(F.col(text_col)).alias("_n")
    )
    doc_k = docs.select(
        "_id",
        F.greatest(F.lit(0), F.length("_n") - 2).alias("n_trigrams"),
    )

    occurrences = _trigram_rows(docs, "_id")
    matched = (
        occurrences.join(F.broadcast(model), "tri")
        .groupBy("_id", "lang")
        .agg(F.sum("micro_logp").alias("matched_micro"))
    )
    grid = doc_k.crossJoin(F.broadcast(consts))  # n_languages rows per doc
    scored = grid.join(matched, ["_id", "lang"], "left").select(
        "_id",
        "lang",
        "n_trigrams",
        (
            F.coalesce(F.col("matched_micro"), F.lit(0))
            - F.col("n_trigrams") * F.col("micro_denom")
        ).alias("score_micro"),
    )
    best = scored.groupBy("_id", "n_trigrams").agg(
        F.min(
            F.struct(
                (-F.col("score_micro")).alias("neg"), F.col("lang")
            )
        ).alias("_m")
    )
    return best.select(
        F.col("_id").alias(id_col),
        F.when(F.col("n_trigrams") == 0, F.lit("und"))
        .otherwise(F.col("_m.lang"))
        .alias("lang"),
        F.when(F.col("n_trigrams") == 0, F.lit(0))
        .otherwise(-F.col("_m.neg"))
        .cast("long")
        .alias("score_micro"),
        F.col("n_trigrams").cast("int").alias("n_trigrams"),
    )
