"""Brute-force full-scan BM25 top-k — the exactness oracle.

Direct capability analog of hora's BruteForceIndex (/root/reference/src/
index/bruteforce_idx.rs:47-73: full scan + bounded max-heap of size k+1,
reverse at the end), which is the recall baseline every other index is
judged against (/root/reference/src/lib.rs:89-101). Here the full scan is a
broadcast join of the (tiny) query-term table against the tf table, a
groupBy(doc_id) partial+final aggregation, and Catalyst's
TakeOrderedAndProject for the bounded top-k (the heap's exact distributed
equivalent: per-partition top-k, merged on the driver).

Everything is built-in DataFrame ops — no UDF — so the whole plan is
whole-stage-codegen and the filter on query terms is pushed into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hora_spark.config import EngineConfig
from hora_spark.functions.bm25 import score_col
from hora_spark.functions.tokenize import tokenize_py
from hora_spark.operators.corpus import Corpus


def query_terms_df(spark, query: str, corpus: Corpus, cfg: EngineConfig) -> DataFrame:
    """Tokenize the query with THE SAME tokenizer, dedup terms, attach idf.

    Duplicate query terms are scored once (standard bag-of-words BM25 over
    the distinct query vocabulary; pinned convention for all paths). The
    tokenizer mode follows the CORPUS's (one corpus, one tokenizer)."""
    terms = sorted(set(tokenize_py(query, unicode=corpus.unicode)))
    if not terms:
        terms = ["\x00__no_such_term__"]
    # an isin filter instead of a join against the full stats table: the
    # grouping-column predicate pushes BELOW the df aggregation, so only
    # the query terms' tf rows aggregate — and the downstream broadcast
    # ships ≤ |terms| rows, never the vocabulary
    return corpus.term_stats.filter(F.col("term").isin(terms))


def bruteforce_topk(
    spark,
    corpus: Corpus,
    query: str,
    k: int = 10,
    cfg: EngineConfig | None = None,
    mode: str = "any",
    exclude: str | None = None,
    min_match: int = 0,
    prefix_stems: list[str] | None = None,
    fuzzy_specs: list[tuple[str, int]] | None = None,
    wildcards: list[str] | None = None,
    boosts: dict[str, float] | None = None,
) -> DataFrame:
    """Exact top-k: (doc_id, score) ordered by (score DESC, doc_id ASC).

    The per-doc score sums contributions over matched query terms; docs
    matching no term never appear (score 0 docs are excluded, like a heap
    that never sees them). mode='all' keeps only docs matching EVERY
    distinct query term (conjunctive) — including corpus-absent terms,
    which therefore empty the result.

    exclude: NOT terms — docs containing any of them are dropped
    (left_anti against their tf rows; survivors' scores untouched).
    min_match: keep only docs matching ≥ this many distinct query terms.
    prefix_stems: extra query terms = every corpus term starting with a
    stem, each scored with its own idf (the engine's prefix rewrite).
    fuzzy_specs: [(stem, d)] — extra query terms = every corpus term
    within levenshtein distance d of a stem (the engine's fuzzy rewrite,
    here via the INDEPENDENT JVM levenshtein over the stats table).
    wildcards: '*'/'?' patterns — extra query terms = every corpus term
    the pattern matches (the engine's wildcard rewrite, here via the
    independent JVM LIKE)."""
    cfg = cfg or EngineConfig()
    q = query_terms_df(spark, query, corpus, cfg).select("term", "idf")
    if prefix_stems or fuzzy_specs or wildcards:
        from functools import reduce
        from operator import or_

        conds = [F.col("term").startswith(s) for s in (prefix_stems or [])]
        conds += [F.levenshtein(F.col("term"), F.lit(s)) <= d
                  for s, d in (fuzzy_specs or [])]
        conds += [F.col("term").like(p.replace("*", "%").replace("?", "_"))
                  for p in (wildcards or [])]
        q = q.unionByName(
            corpus.term_stats.filter(reduce(or_, conds)).select("term", "idf")
        ).dropDuplicates(["term"])
    if boosts:
        # per-term boost = scale that term's idf (same rewrite the
        # engine applies to contributions and block bounds alike)
        w = None
        for t, bw in boosts.items():
            c = F.when(F.col("term") == t, F.lit(float(bw)))
            w = c if w is None else w.when(F.col("term") == t, F.lit(float(bw)))
        q = q.withColumn("idf", F.col("idf") * F.coalesce(w, F.lit(1.0)))
    n_terms = len(set(tokenize_py(query, unicode=corpus.unicode)))
    scored = (
        corpus.tf.join(F.broadcast(q), "term", "inner")
        .withColumn(
            "contrib",
            score_col(F.col("tf"), F.col("dl"), F.col("idf"), F.lit(corpus.avgdl), cfg.bm25),
        )
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("score"),
             F.count(F.lit(1)).alias("_matched"))  # tf rows unique per (doc, term)
    )
    if mode == "all":
        scored = scored.filter(F.col("_matched") == n_terms)
    if min_match > 1:
        scored = scored.filter(F.col("_matched") >= min_match)
    if exclude:
        ex_terms = sorted(set(tokenize_py(exclude, unicode=corpus.unicode)))
        if ex_terms:
            ex_docs = (corpus.tf.filter(F.col("term").isin(ex_terms))
                       .select("doc_id").distinct())
            scored = scored.join(ex_docs, "doc_id", "left_anti")
    return (scored.drop("_matched")
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))
