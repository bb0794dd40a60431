"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's operator set (mandated extensions): language-ID,
quality scoring, token counting, document fingerprinting — all pure
`pyspark.sql.functions` expressions (whole-stage codegen, zero Python),
each with a DuckDB-oracle twin built from the SAME constants
(see __spark_entry__.py).

Portable primitives shared with the oracles:
- hash60(s)  = first 15 hex chars of md5 → int64 (fits in 60 bits)
- fingerprint = polynomial rolling hash (acc*31 + ascii(c)) mod 1e9+7
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MOD = 1_000_000_007
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def hash60(col: Column) -> Column:
    """Portable 60-bit hash: identical in Spark and DuckDB
    (conv(substring(md5(x),1,15),16,10) == ('0x'||substr(md5(x),1,15))::bigint)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def words_col(text: Column) -> Column:
    """Lower-cased whitespace tokens, empties dropped (dialect-portable)."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != F.lit(""))


def token_counts(documents: DataFrame) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens): whitespace count + a BPE-ish
    regex token count (runs of letters / digits / single punctuation)."""
    return documents.select(
        "doc_id",
        F.size(words_col(F.col("text"))).alias("n_ws_tokens"),
        F.size(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_REGEX}', 0)")
        ).alias("n_bpe_tokens"),
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """(doc_id, n_words, avg_word_len, stopword_ratio, punct_ratio, quality).

    Heuristic quality in [0,1]: long-enough docs with natural stopword rates
    and low punctuation score high — the standard cheap pre-filter before
    expensive dedup/training stages.
    """
    words = words_col(F.col("text"))
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: w.isin(STOPWORDS)))
    n_punct = F.size(
        F.expr("regexp_extract_all(text, '[^a-zA-Z0-9 ]', 0)"))
    chars = F.length("text")
    df = documents.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(chars / F.greatest(n_words, F.lit(1)), 6).alias("avg_word_len"),
        F.round(n_stop / F.greatest(n_words, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(n_punct / F.greatest(chars, F.lit(1)), 6).alias("punct_ratio"),
    )
    quality = (
        F.least(F.col("n_words") / F.lit(50.0), F.lit(1.0)) * 0.4
        + F.least(F.col("stopword_ratio") * F.lit(4.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(F.col("punct_ratio") * F.lit(10.0), F.lit(1.0))) * 0.2
    )
    return df.withColumn("quality", F.round(quality, 6))


def language_id(documents: DataFrame) -> DataFrame:
    """(doc_id, predicted_lang): n-gram-free stopword-ratio heuristic —
    'en' when ≥8% of tokens are English stopwords, else 'other'."""
    words = words_col(F.col("text"))
    ratio = F.size(F.filter(words, lambda w: w.isin(STOPWORDS))) / F.greatest(
        F.size(words), F.lit(1)
    )
    return documents.select(
        "doc_id",
        F.when(ratio >= 0.08, F.lit("en")).otherwise(F.lit("other")).alias(
            "predicted_lang"
        ),
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    """(doc_id, fingerprint): rolling polynomial hash of the raw text —
    order-sensitive (unlike bag-of-words hashes), mod 1e9+7."""
    return documents.select(
        "doc_id",
        F.expr(
            "aggregate(filter(split(text, ''), c -> c != ''), 0L,"
            f" (acc, c) -> (acc * 31 + ascii(c)) % {MOD})"
        ).alias("fingerprint"),
    )
