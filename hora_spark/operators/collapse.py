"""Field collapsing (the ES `collapse` + `inner_hits` analog): top-k
search results keeping at most `per_group` docs per collapse-key value —
"best turn per conversation", "best doc per source".

Capability analog: the reference returns a flat top-k
(/root/reference/src/core/ann_index.rs:74-97); collapsing is the
search-engine-side diversification layer on top of it.

EXACT by construction: any matching doc could be its group's best, so the
collapse runs over the full match set (search_matches, k=None — the same
exhaustive-enumeration verb facets and significant_terms ride), joined to
the docs table for the collapse key, then reduced by two windowed
group-limits:

    rank within (query, key) by (score DESC, doc_id ASC)  → keep per_group
    rank within query       by (score DESC, doc_id ASC)  → keep k

Plan shape: one match-enumeration job (per-shard match sets, no global
sort) → join on doc_id (sort-merge at scale; broadcast when the match set
is small) → two WindowGroupLimit pairs (partial per-partition heap before
each exchange) — no driver state, no collect; output ≤ k rows per query.

Why NOT a WAND-pruned in-UDF collapse: a per-shard group-θ (θ = the k-th
best GROUP-best) is sound — a block with ub < θ can contain neither a new
top-k group nor a better best for one — and the round-5 fielded postings
would even give the UDF a doc→key map. But inverting that map means
decoding EVERY '<key_field>:*' posting in the shard, O(shard docs) work
even for a rare query whose term postings are tiny — it would regress the
engine's rare-term O(posting) guarantee for every collapsed search. The
exhaustive form costs one enumeration of the MATCH set only, which is the
honest lower bound for exact collapse without a doc-keyed sidecar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hora_spark.operators.query import search_matches
from hora_spark.sources.storage import SnapshotStore


def search_collapse(
    spark: SparkSession,
    store: SnapshotStore,
    queries: list,
    docs_df: DataFrame,
    collapse_col: str,
    k: int = 10,
    per_group: int = 1,
    id_col: str = "doc_id",
    **kw,
) -> DataFrame:
    """→ DataFrame(query_id, doc_id, score, <collapse_col>), ≤ k rows per
    query with at most per_group docs per collapse value, ordered
    (query_id, score DESC, doc_id ASC). A NULL collapse value is its own
    group (ES's missing-bucket behavior: null-keyed docs still compete,
    all nulls collapse together). Every search_topk option composes
    (modes, boolean clauses, fields/fields_not, NOT terms, deletes,
    filter_df) via **kw."""
    if k < 1 or per_group < 1:
        raise ValueError("k and per_group must be >= 1")
    matches = search_matches(spark, store, queries, **kw)
    keys = docs_df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(collapse_col).alias("_ckey"),
    )
    order = (F.desc("score"), F.asc("doc_id"))
    w_grp = Window.partitionBy("query_id", "_ckey").orderBy(*order)
    w_q = Window.partitionBy("query_id").orderBy(*order)
    return (
        matches.join(keys, "doc_id")
        .withColumn("_grp_rn", F.row_number().over(w_grp))
        .filter(F.col("_grp_rn") <= per_group)
        .withColumn("_rn", F.row_number().over(w_q))
        .filter(F.col("_rn") <= k)
        .select("query_id", "doc_id", "score",
                F.col("_ckey").alias(collapse_col))
        .orderBy("query_id", F.desc("score"), F.asc("doc_id"))
    )
