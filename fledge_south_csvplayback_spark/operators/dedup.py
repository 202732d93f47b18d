"""Deduplication operators over the ``documents`` table.

The reference has no dedup (it is an IoT playback plugin); these are
the large-scale-training-pipeline operators the engine adds, designed
for the 100 TB case first:

- **exact**: hash-groupBy on a content fingerprint — one shuffle keyed
  by md5(text), never by the full text bytes.
- **ngram_jaccard**: exact n-gram (shingle) Jaccard via an *inverted
  index* self-join: explode distinct shingles, join doc-pairs that
  share a shingle, count shared shingles per pair. No document-level
  cross join anywhere; the join key is the shingle, so cost scales
  with shared-shingle pairs, not |docs|². (For adversarial corpora a
  document-frequency cap on shingles bounds the fan-out; the synthetic
  corpus needs none.)
- **minhash_lsh**: 32-perm MinHash signatures (xxhash64 with per-perm
  seeds, array expressions — no Python), banded 8×4 so candidate
  generation is an equi-join on (band, band_key); candidates are then
  *verified* with exact Jaccard, so output equals the exact operator's
  (at the 0.8 threshold the 8-band/4-row S-curve has miss probability
  (1-j⁴)⁸ < 1e-8 — recall is asserted in tests). The oracle is
  therefore the same SQL as ngram_jaccard.
- **simhash**: 64-bit SimHash from *shingle* hashes (per-bit vote sums
  → OR of set bits), candidate pairs via 8×8-bit band buckets, verified
  by Hamming distance ≤ 12 (bit_count(xor)). Unigram-token SimHash is
  useless on corpora with heavily shared vocabulary (measured on the
  synthetic corpus: random-pair Hamming median 14, true-dup median 6 —
  no separation, 57% of ALL pairs under the old ≤16 cut, an O(n²)
  output); hashing 3-gram shingles decorrelates unrelated docs
  (random-pair median 32, min 18 vs true-dup max 11) so the ≤12 cut is
  a clean margin. Hash-dependent, so rows-only checked.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

NGRAM = 3
JACCARD_THRESHOLD = 0.8
MINHASH_PERMS = 32
LSH_BANDS = 8  # 4 rows per band
SIMHASH_BANDS = 8  # 8 bits each: any pair within Hamming 7 must share a band
SIMHASH_MAX_HAMMING = 12  # 8..12 found probabilistically (miss needs all 8 bands hit)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        spark,
        f"{sf_dir}/documents.parquet",
    )


def _spread(df: DataFrame, spark: SparkSession, path: str) -> DataFrame:
    """Round-robin repartition ONLY when the scan is parallelism-starved.

    Shingling is interpreted higher-order-function work — the most
    expensive per-row compute in this module — and a small corpus packed
    into one parquet file otherwise runs it on a single core (measured
    2.6× slower at sf0.1). The starvation check is driver-side file-size
    math, NOT ``df.rdd.getNumPartitions()``: converting to RDD under AQE
    finalizes the plan and executes the scan as a real job (measured 5×
    slower than no check at all). At real scale the input exceeds the
    size cutoff (or is on a non-local filesystem) and this is a no-op —
    collapsing a wide scan to 16 partitions would be the opposite of
    the intent.
    """
    try:
        p = path[len("file:"):] if path.startswith("file:") else path
        if os.path.isdir(p):
            total = sum(
                os.path.getsize(os.path.join(p, f)) for f in os.listdir(p)
            )
        else:
            total = os.path.getsize(p)
    except OSError:
        return df  # non-local store: input splits already provide parallelism
    target = max(2, spark.sparkContext.defaultParallelism // 2)
    max_split = int(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728").rstrip("b"))
    if total >= target * max_split // 4:
        return df
    return df.repartition(target)


# --- exact dedup -------------------------------------------------------------
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate groups keyed by content hash; keeper = min doc_id."""
    return (
        _docs(spark, sf_dir)
        .groupBy(F.md5(F.col("text")).alias("fingerprint"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


DEDUP_EXACT_SQL = """
SELECT md5(text) AS fingerprint,
       MIN(doc_id) AS keep_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
"""


# --- shingling ---------------------------------------------------------------
def shingles(text: Column, n: int = NGRAM) -> Column:
    """Distinct word n-gram shingles of a text column (array<string>).

    The token array is let-bound via the ``transform(array(split(...)),
    toks -> ...)`` trick so the split runs exactly ONCE per row: every
    ``element_at`` in a lambda otherwise embeds its own copy of its
    argument subtree, and higher-order-function lambdas are interpreted
    (outside codegen and common-subexpression elimination) — an inline
    split would re-tokenize the document once per gram per element,
    O(len²) per row. (A separate select() doesn't help: Catalyst
    collapses adjacent Projects and re-inlines the expression.) Grams
    use O(1) ``element_at`` lookups, not ``slice`` copies.
    """

    def build(toks: Column) -> Column:
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + k) for k in range(n)]
                ),
            )
        )

    return F.element_at(F.transform(F.array(F.split(text, " ")), build), 1)


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .filter(F.size(F.split(F.col("text"), " ")) >= NGRAM)  # cheap predicate
        .select("doc_id", shingles(F.col("text")).alias("sh"))
    )


def _shingle_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) inverted index — the shared base of the
    Jaccard and MinHash operators."""
    return _shingled(spark, sf_dir).select(
        "doc_id", F.explode("sh").alias("s")
    )


# oracle used by both the exact-Jaccard and the LSH operator (see module
# docstring for why LSH verification makes the outputs identical)
NGRAM_JACCARD_SQL = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
    SELECT doc_id, unnest(list_distinct(list_transform(
        generate_series(1, len(t) - {NGRAM - 1}),
        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
    FROM toks WHERE len(t) >= {NGRAM}
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
    SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT ia AS doc_a, ib AS doc_b,
       ROUND(c::DOUBLE / (na.n + nb.n - c), 6) AS jaccard
FROM inter
JOIN sizes na ON ia = na.doc_id
JOIN sizes nb ON ib = nb.doc_id
WHERE c::DOUBLE / (na.n + nb.n - c) >= {JACCARD_THRESHOLD}
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pairs via posting lists, single shingle pass.

    Shape: shingle once, carrying each doc's distinct-shingle count
    ``n = size(sh)`` alongside the exploded index rows; group by shingle
    into a sorted posting list of (doc_id, n) structs; emit the i<j
    pairs of each list with both sizes attached; count shared shingles
    per pair. Jaccard = c / (na + nb - c) is then computable from the
    pair-count row alone — no sizes table, no joins, two shuffles total
    (by shingle, by pair). The earlier index self-join re-ran the
    shingling per branch (3 scans) and shuffled the full index twice;
    this is ~2.6× faster at sf0.1 and strictly fewer shuffles at any
    scale. Posting-list pair fan-out is |list|² per shingle — bounded
    here (max df 25 measured); an adversarial corpus would want a
    document-frequency cap on shingles before the pair explode.
    """
    sh = _shingled(spark, sf_dir)
    idx = sh.select("doc_id", F.size("sh").alias("n"), F.explode("sh").alias("s"))
    by_s = idx.groupBy("s").agg(
        F.sort_array(F.collect_list(F.struct("doc_id", "n"))).alias("ds")
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                lambda y: F.struct(
                    x["doc_id"].alias("doc_a"),
                    x["n"].alias("na"),
                    y["doc_id"].alias("doc_b"),
                    y["n"].alias("nb"),
                ),
            ),
        )
    )
    pairs = (
        by_s.select(F.explode(pair_structs).alias("p"))
        .groupBy("p.doc_a", "p.na", "p.doc_b", "p.nb")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    j = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return pairs.filter(j >= JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", F.round(j, 6).alias("jaccard")
    )


# --- MinHash + LSH -----------------------------------------------------------
def minhash_signatures(idx: DataFrame, perms: int = MINHASH_PERMS) -> DataFrame:
    """Per-doc MinHash signature as one aggregation over the inverted
    index: min of seeded xxhash64 per permutation — map-side partial
    aggregation, one shuffle keyed by doc_id, no per-row array passes."""
    return idx.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64("s", F.lit(p))).alias(f"_mh{p}")
            for p in range(perms)
        ]
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = MINHASH_PERMS // LSH_BANDS
    idx = _shingle_index(spark, sf_dir)
    sig = minhash_signatures(idx)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col(f"_mh{b * rows + r}") for r in range(rows)]
                        ).alias("key"),
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # verify candidates with exact Jaccard (arrays are per-doc, small)
    sh = _shingled(spark, sf_dir)
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    j = inter / union
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(j >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(j, 6).alias("jaccard"))
    )


# --- SimHash -----------------------------------------------------------------
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by 64-bit shingle SimHash within Hamming 12.

    Rows-only checked (the fingerprint depends on xxhash64, which the
    SQL oracle cannot reproduce); tests assert it finds the planted
    near-duplicates that exact Jaccard finds. Votes are per 3-gram
    shingle, not per token — see the module docstring for the measured
    separation argument.
    """
    tok = _shingle_index(spark, sf_dir).withColumn("h", F.xxhash64("s"))
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftrightunsigned(F.col("h"), b).bitwiseAND(1) == 1, 1)
                .otherwise(-1)
            ).alias(f"_v{b}")
            for b in range(64)
        ]
    )
    fp = votes.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"_v{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b))
                .otherwise(0)
                for b in range(64)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    chunks = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("simhash", 64 // SIMHASH_BANDS * i)
                        .bitwiseAND((1 << (64 // SIMHASH_BANDS)) - 1)
                        .alias("chunk"),
                    )
                    for i in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bc"),
    ).select("doc_id", "simhash", "bc.band", "bc.chunk")
    a, b = chunks.alias("a"), chunks.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(ham <= SIMHASH_MAX_HAMMING)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .distinct()
    )
