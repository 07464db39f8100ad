"""Training-corpus preparation pipeline: the composed "make this corpus
trainable" operator — quality filter → exact dedup → near-dup removal →
(optionally) index build, each stage a pure DataFrame transformation with
counters, so the whole thing is one lazy plan until the final action.

This is the operator a 100 TB ingest actually runs: every stage is
shuffle-conscious (filters are narrow; exact dedup is one map-side-combined
groupBy; near-dup is banded LSH with a bucket cap; nothing collects).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hora_spark.operators import dedup, textstats


@dataclass
class PipelineReport:
    n_input: int = 0
    n_after_quality: int = 0
    n_after_exact_dedup: int = 0
    n_after_near_dedup: int = 0
    stages: list[str] = field(default_factory=list)


def prepare_training_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.3,
    min_tokens: int = 5,
    near_dup_jaccard: float = 0.85,
    lsh_hashes: int = 16,
    lsh_bands: int = 4,
    lsh_max_bucket: int | None = 64,
    count_stages: bool = True,
) -> tuple[DataFrame, PipelineReport]:
    """Returns (cleaned DataFrame, stage-count report).

    count_stages=False skips the per-stage count() actions (at scale you
    run the pipeline as ONE job and read counts from the lineage of the
    write that follows)."""
    rep = PipelineReport()
    if count_stages:
        rep.n_input = df.count()

    # 1. quality gate (pure Column expressions, narrow)
    t = F.col(text_col)
    gated = df.filter(
        (textstats.token_count_col(t) >= min_tokens)
        & (textstats.quality_score_col(t) >= min_quality)
    )
    rep.stages.append(f"quality(min_q={min_quality}, min_tokens={min_tokens})")
    if count_stages:
        rep.n_after_quality = gated.count()

    # 2. exact dedup (normalized-text hash, keep min id)
    exact = dedup.exact_dedup(gated, id_col=id_col, text_col=text_col)
    rep.stages.append("exact_dedup(md5 normalized text)")
    if count_stages:
        rep.n_after_exact_dedup = exact.count()

    # 3. near-dup removal: LSH candidates → exact Jaccard verify → drop the
    # HIGHER id of each confirmed pair (keep-first policy, deterministic).
    # NB this is PAIR-drop, not transitive-closure dedup: in a cluster
    # whose confirmed pairs are (2,3),(1,3) it keeps {1,2} where closure
    # dedup would keep {1}. Both policies are used in practice; for
    # closure semantics feed the confirmed pairs through
    # dedup.connected_components and keep cluster_id == doc_id rows.
    cands = dedup.minhash_lsh_candidates(
        exact, id_col=id_col, text_col=text_col,
        n_hashes=lsh_hashes, bands=lsh_bands, max_bucket=lsh_max_bucket,
    )
    confirmed = dedup.jaccard_pairs(exact, cands, id_col=id_col, text_col=text_col,
                                    threshold=near_dup_jaccard)
    drop = confirmed.select(F.col("doc_b").alias(id_col)).distinct()
    cleaned = exact.join(drop, id_col, "left_anti")
    rep.stages.append(f"near_dedup(jaccard>={near_dup_jaccard}, {lsh_hashes} hashes/{lsh_bands} bands)")
    if count_stages:
        rep.n_after_near_dedup = cleaned.count()
    return cleaned, rep
