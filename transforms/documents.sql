-- Purpose-built corpus-quality rollup for a conformed `documents`
-- table (Tier-E curation expressed through the reference's
-- SQL-file-per-table transform mechanism, SURVEY §2.2 S3): per
-- (language, source, ingest-date) document counts, size stats, and a
-- cheap token-rate signal.  Any raw drop under
-- raw/corpus/documents/ flows: conform -> this SQL -> partitioned
-- purpose-built parquet, exactly like the taxi tables.
SELECT COUNT(*)                                        AS n_docs,
       lang,
       source,
       year,
       month,
       day,
       SUM(n_chars)                                    AS total_chars,
       ROUND(AVG(n_chars), 2)                          AS avg_chars,
       ROUND(AVG(SIZE(SPLIT(text, ' '))), 2)           AS avg_tokens,
       MIN(n_chars)                                    AS min_chars,
       MAX(n_chars)                                    AS max_chars
FROM corpus.documents
GROUP BY lang, source, year, month, day
