"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

All four are pure built-in-function Column pipelines (JVM-side, codegen,
zero Python in the loop) and every formula is also expressible in DuckDB
SQL, so each operator has a full value-level oracle. Portable hashing is
md5-of-string — bit-identical across Spark and DuckDB — the design choice
that makes fingerprints and MinHash oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hora_spark.functions.tokenize import tokens_col

# pinned English stopword list for the language-ID heuristic (small on
# purpose: the heuristic is the operator; swapping in fastText at 100 TB
# is a UDF drop-in)
EN_STOPWORDS = (
    "the of and to a in that is for it with as on be at by this have from or "
    "one had not but what all were when we there can an which their"
).split()


def token_count_col(text: Column) -> Column:
    """Whitespace-free token count under the pinned tokenizer."""
    return F.size(tokens_col(text))


def _stopword_ratio_of(toks: Column) -> Column:
    """stopword_ratio over an already-tokenized array column."""
    stop = F.array([F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return n_stop.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def stopword_ratio_col(text: Column) -> Column:
    return _stopword_ratio_of(tokens_col(text))


def punct_ratio_col(text: Column) -> Column:
    """Non-alphanumeric, non-space chars / total chars."""
    t = F.coalesce(text, F.lit(""))
    n_punct = F.length(F.regexp_replace(F.lower(t), "[a-z0-9 ]", ""))
    return n_punct.cast("double") / F.greatest(F.length(t), F.lit(1)).cast("double")


def _mean_token_len_of(toks: Column) -> Column:
    total = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def mean_token_len_col(text: Column) -> Column:
    return _mean_token_len_of(tokens_col(text))


def _quality_of(sw: Column, pr: Column, mtl: Column) -> Column:
    """Quality formula over precomputed stopword/punct/token-len columns —
    ONE definition shared by quality_score_col and analyze()."""
    len_ok = F.when((mtl >= 3.0) & (mtl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(
        F.least(F.lit(1.0), sw * F.lit(2.0)) * F.lit(0.5) + len_ok * F.lit(0.3)
        + (F.lit(1.0) - F.least(F.lit(1.0), pr * F.lit(4.0))) * F.lit(0.2),
        6,
    )


def quality_score_col(text: Column) -> Column:
    """Composite [0,1]-ish quality score: reward stopword presence and sane
    token lengths, penalize punctuation soup. Deterministic closed form."""
    return _quality_of(stopword_ratio_col(text), punct_ratio_col(text),
                       mean_token_len_col(text))


def is_englishish_col(text: Column) -> Column:
    """Language-ID heuristic: stopword hit ratio ≥ 5%. (Real lang-ID is a
    model; the operator contract — one label column per row, computed
    vectorized — is what matters at scale.)"""
    return (stopword_ratio_col(text) >= F.lit(0.05)).cast("boolean")


def _fingerprint_of(toks: Column, shingle: int = 3) -> Column:
    """fingerprint over an already-tokenized array column."""
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - F.lit(shingle), F.lit(0)))
    shingles = F.transform(
        idx, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, shingle)))
    )
    return F.when(n >= shingle, F.array_min(shingles)).otherwise(F.md5(F.concat_ws(" ", toks)))


def fingerprint_col(text: Column, shingle: int = 3) -> Column:
    """Document fingerprint: min md5 over `shingle`-gram token windows
    (winnowing-style min-hash selection over rolling windows; the md5 of
    the joined shingle plays the rolling-hash role, portably)."""
    return _fingerprint_of(tokens_col(text), shingle)


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Same columns/values as ever, but the tokenize split and the three
    ratio sub-expressions are each computed ONCE per row through staged
    intermediate columns: Catalyst's CollapseProject declines to inline a
    non-cheap alias referenced more than once, so the former form —
    every stat column re-deriving tokens_col(text) — evaluated the
    split/lower/array_remove subtree ~8× per row (HOFs run interpreted,
    outside whole-stage-codegen subexpression elimination)."""
    t = F.col(text_col)
    staged = df.withColumn("_toks", tokens_col(t)).withColumns(
        {
            "_swr": _stopword_ratio_of(F.col("_toks")),
            "_pr": punct_ratio_col(t),
            "_mtl": _mean_token_len_of(F.col("_toks")),
        }
    )
    return staged.withColumns(
        {
            "n_tokens": F.size(F.col("_toks")),
            "stopword_ratio": F.round(F.col("_swr"), 6),
            "punct_ratio": F.round(F.col("_pr"), 6),
            "mean_token_len": F.round(F.col("_mtl"), 6),
            "quality": _quality_of(F.col("_swr"), F.col("_pr"), F.col("_mtl")),
            "is_english": (F.col("_swr") >= F.lit(0.05)).cast("boolean"),
            "fingerprint": _fingerprint_of(F.col("_toks")),
        }
    ).drop("_toks", "_swr", "_pr", "_mtl")


# ------------------------------------------------------------- SQL side ---
# DuckDB fragments mirroring each column, over {col} = text expression.
SQL_TOKENS = "list_filter(string_split_regex(lower(coalesce({col}, '')), '[^a-z0-9]+'), x -> x <> '')"
SQL_N_TOKENS = f"len({SQL_TOKENS})"
_SW = "', '".join(EN_STOPWORDS)
SQL_STOPWORD_RATIO = (
    f"CAST(len(list_filter({SQL_TOKENS}, t -> list_contains(['{_SW}'], t))) AS DOUBLE)"
    f" / greatest(len({SQL_TOKENS}), 1)"
)
SQL_PUNCT_RATIO = (
    "CAST(length(regexp_replace(lower(coalesce({col}, '')), '[a-z0-9 ]', '', 'g')) AS DOUBLE)"
    " / greatest(length(coalesce({col}, '')), 1)"
)
SQL_MEAN_TOKEN_LEN = (
    f"CAST(list_sum(list_transform({SQL_TOKENS}, t -> length(t))) AS DOUBLE)"
    f" / greatest(len({SQL_TOKENS}), 1)"
)
