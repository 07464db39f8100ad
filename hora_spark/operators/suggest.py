"""Spell suggestion — the Elasticsearch term-suggester / Lucene
DirectSpellChecker analog for the BM25 engine: for each query token,
propose the closest dictionary terms ranked by edit distance then
document frequency. (The reference ships distance kernels as its core
scalar surface — src/core/metrics.rs — recast here as the string edit
distance over the INDEX dictionary the fulltext tier needs.)

Plan shape (audited in PLANS.md):
  stats table (the dictionary: one row per index term, df attached)
  → broadcast the ≤|query| input tokens and nested-loop join under a
    length-band pre-filter + JVM `levenshtein(term, input, max_d)`
    (the threshold form early-exits, so the common case is a cheap
    length/prefix reject) — ONE parallel dictionary scan regardless of
    input count, no Python per term
  → per-input ranking (distance ASC, df DESC, term ASC) via
    row_number window over the candidate set (tiny: ≤ cap·|inputs|),
    keep rnk ≤ n.

Modes (ES suggest_mode):
  'missing' — suggest only for inputs absent from the dictionary;
  'popular' — only candidates with strictly higher df than the input;
  'always'  — rank candidates for every input (the input itself is
              never a candidate, distance ≥ 1 by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hora_spark.config import EngineConfig
from hora_spark.functions.tokenize import tokenize_py
from hora_spark.sources.storage import SnapshotStore

_OUT_SCHEMA = ("input string, suggestion string, distance int, df long, "
               "rnk int")

MODES = ("missing", "popular", "always")


def suggest_terms(
    spark: SparkSession,
    store: SnapshotStore,
    query: str,
    cfg: EngineConfig | None = None,
    n: int = 3,
    max_distance: int = 2,
    mode: str = "missing",
    version: int | None = None,
    idf_cache: dict | None = None,
) -> DataFrame:
    """DataFrame(input, suggestion, distance, df, rnk): up to `n`
    corrections per distinct query token, ranked (distance ASC, df DESC,
    suggestion ASC) — a total order, so results are deterministic.
    Inputs that need no suggestion under `mode` emit no rows."""
    cfg = cfg or EngineConfig()
    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}, got {mode!r}")
    if not (1 <= max_distance <= 2):
        raise ValueError("max_distance must be 1 or 2 (Lucene/ES bound)")
    meta = store.meta(version)
    if "avgdl" not in meta:
        raise FileNotFoundError(
            f"no built index at {store.root!r}: suggestions come from the "
            "index dictionary — run build first")
    uni = bool(meta.get("unicode", False))

    terms = sorted(set(tokenize_py(query, unicode=uni)))
    if not terms:
        return spark.createDataFrame([], _OUT_SCHEMA)

    # field terms ('lang:en') are filter vocabulary, not words a user
    # misspells — keep them out of the suggestion dictionary
    dic = (store.read("stats", version)
           .filter(~F.col("term").contains(":"))
           .select("term", "df"))
    # df of each input term (null = missing) rides the broadcast side so
    # mode filtering needs no second dictionary pass; when the engine's
    # per-snapshot dictionary cache is complete, the dfs come from it
    # with no Spark job at all
    from hora_spark.operators.query import _CACHE_DF, _cached_vocab

    if _cached_vocab(idf_cache) is not None and _CACHE_DF in idf_cache:
        df_map = idf_cache[_CACHE_DF]
        in_df = {t: df_map[t] for t in terms if t in df_map}
    else:
        in_df = {r["term"]: int(r["df"]) for r in
                 dic.filter(F.col("term").isin(terms)).collect()}
    inputs = spark.createDataFrame(
        [(t, in_df.get(t)) for t in terms], "input string, input_df long")
    if mode == "missing":
        inputs = inputs.filter(F.col("input_df").isNull())
        if not any(in_df.get(t) is None for t in terms):
            return spark.createDataFrame([], _OUT_SCHEMA)

    d = int(max_distance)
    cand = dic.join(
        F.broadcast(inputs),
        (F.abs(F.length("term") - F.length("input")) <= d)
        & (F.col("term") != F.col("input"))
        & (F.levenshtein(F.col("term"), F.col("input"), d) >= 0),
    )
    if mode == "popular":
        cand = cand.filter(F.col("df") > F.coalesce("input_df", F.lit(0)))

    w = Window.partitionBy("input").orderBy(
        F.col("distance").asc(), F.col("df").desc(), F.col("suggestion").asc())
    return (
        cand.select(
            "input",
            F.col("term").alias("suggestion"),
            F.levenshtein(F.col("term"), F.col("input")).cast("int")
            .alias("distance"),
            "df",
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= n)
        .orderBy("input", "rnk")
    )
