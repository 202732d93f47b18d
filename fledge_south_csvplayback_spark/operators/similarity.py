"""Similarity search over the ``embeddings`` table (array<float>, 64-d).

Two paths, per the training-pipeline brief:

- **brute-force cosine top-k** (the correctness baseline): the query
  set is small and explicitly *broadcast*; every partition of the big
  side computes dot products against the broadcast queries with
  built-in array expressions (``zip_with`` + ``aggregate`` — JVM
  codegen, no Python). Per-query top-k is a window partitioned by
  query id. The only "cross" join is broadcast-nested-loop of
  |queries| × partition — the correct brute-force shape at any scale
  (cost |Q|·N with N scanned once); there is no fact×fact cartesian.
- **LSH-bucketed ANN** (the scale path): 16 deterministic random
  hyperplanes (driver-seeded, embedded as literal arrays) hashed into
  8 bands × 2 bits; a candidate must share a band bucket with the
  query, then exact cosine ranks the candidates. Bucket join is an
  equi-join on (band, key) — at 100 TB this is the difference between
  N·|Q| and (N/2^bits)·|Q| dot products. Because the hyperplanes are
  *literal* double arrays (not runtime hashes), the identical buckets
  are rebuilt in the DuckDB oracle by embedding the same literals in
  the SQL — the LSH entries are fully value-checked, with ranking on
  round(cosine, 6) in both engines so float summation order cannot
  reorder near-ties.

Arrays are cast float->double before arithmetic so Spark and DuckDB
accumulate in the same precision.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5
LSH_PLANES = 16
LSH_BANDS = 8  # 2 bits per band: high candidate recall, still prunes ~3/4
DIM = 64


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


# --- brute-force cosine top-k ------------------------------------------------
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    emb = _emb(spark, sf_dir).withColumn("norm", _norm(F.col("v")))
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    cos = _dot(F.col("v"), F.col("qv")) / (F.col("norm") * F.col("qnorm"))
    ranked = (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", cos)
        .withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(
                    F.col("cosine").desc(), F.col("vec_id")
                )
            ),
        )
        .filter(F.col("rank") <= TOP_K)
    )
    return ranked.select(
        "query_id", "rank", "vec_id", F.round("cosine", 6).alias("cosine")
    )


ANN_COSINE_TOPK_SQL = f"""
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v,
           sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
    FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM e WHERE vec_id < {N_QUERIES}),
p AS (
    SELECT q.query_id, e.vec_id,
           list_dot_product(e.v, q.qv) / (e.nrm * q.qn) AS cosine
    FROM e, q
    WHERE e.vec_id != q.query_id
),
r AS (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
    FROM p
)
SELECT query_id, rank, vec_id, ROUND(cosine, 6) AS cosine
FROM r WHERE rank <= {TOP_K}
"""


# --- LSH-bucketed ANN --------------------------------------------------------
def _hyperplanes(n: int = LSH_PLANES, dim: int = DIM) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (seeded SHA-256 stream)."""
    planes = []
    for p in range(n):
        vals: list[float] = []
        chunk = 0
        while len(vals) < dim:
            h = hashlib.sha256(f"lsh:{p}:{chunk}".encode()).digest()  # 32 bytes
            vals.extend(
                struct.unpack(">q", h[i : i + 8])[0] / 2**63
                for i in range(0, 32, 8)
            )
            chunk += 1
        planes.append(vals[:dim])
    return planes


def _lsh_bands(v: Column) -> Column:
    """Array of (band, key) structs from hyperplane sign bits."""
    planes = _hyperplanes()
    bits = [
        F.when(_dot(v, F.array(*[F.lit(x) for x in plane])) >= 0, 1).otherwise(0)
        for plane in planes
    ]
    per_band = LSH_PLANES // LSH_BANDS
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                sum(
                    [
                        bits[b * per_band + i] * (1 << i)
                        for i in range(per_band)
                    ],
                    F.lit(0),
                ).alias("key"),
            )
            for b in range(LSH_BANDS)
        ]
    )


def _case_key_sql() -> str:
    return " ".join(f"WHEN {b} THEN k{b}" for b in range(LSH_BANDS))


def _banded_sql() -> str:
    """DuckDB CTEs rebuilding the exact Spark LSH buckets: the same
    hyperplane literals, the same sign-bit band keys. Emits ``e``
    (vectors + norms) and ``banded`` (vec_id, band, key)."""
    per_band = LSH_PLANES // LSH_BANDS
    planes = _hyperplanes()
    lits = ["[" + ", ".join(repr(x) for x in p) + "]" for p in planes]
    keys = []
    for b in range(LSH_BANDS):
        bits = " + ".join(
            f"CASE WHEN list_dot_product(v, {lits[b * per_band + i]}) >= 0 "
            f"THEN {1 << i} ELSE 0 END"
            for i in range(per_band)
        )
        keys.append(f"({bits}) AS k{b}")
    case_key = _case_key_sql()
    return f"""
e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v,
           sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
    FROM embeddings
),
k AS (SELECT vec_id, v, nrm, {", ".join(keys)} FROM e),
banded AS (
    SELECT vec_id, band, CASE band {case_key} END AS key
    FROM k CROSS JOIN (SELECT unnest(range({LSH_BANDS})) AS band) b
)"""


COSINE_PAIR_THRESHOLD = 0.45  # the synthetic embeddings top out near 0.51


def embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup mining: all pairs above a cosine
    threshold, candidates from the hyperplane-LSH band buckets (no
    all-pairs cross join), verified with the exact cosine.

    Oracle-checked: the bucket assignment is rebuilt literally in SQL
    (see ``_banded_sql``), so DuckDB produces the identical candidate
    set and the identical surviving pairs.
    """
    emb = _emb(spark, sf_dir).withColumn("norm", _norm(F.col("v")))
    banded = emb.withColumn("bk", F.explode(_lsh_bands(F.col("v")))).select(
        "vec_id", "v", "norm", "bk.band", "bk.key"
    )

    # Within-bucket scoring is a dense matmul, not a pair join. A
    # band-bucket self-join evaluates a 64-d dot per matched row with
    # Catalyst expressions — higher-order functions are interpreted
    # (~13 µs/pair measured) and even an unrolled element_at sum is
    # worse (~37 µs/pair); at 4M candidate pairs (sf0.1) that was
    # 50-160 s of expression evaluation. One normalized GEMM per bucket
    # (Mn @ Mn.T, BLAS via Arrow-batched applyInPandas) scores the same
    # pairs in milliseconds, and only pairs above threshold leave
    # Python. The shuffle is `banded` grouped by (band, key) — vectors
    # cross the wire once. At larger corpora add planes/bands so
    # buckets stay bounded, and block the GEMM within a bucket; the
    # grouping plan is unchanged.
    def _bucket_pairs(pdf):
        import numpy as np
        import pandas as pd

        cols = ["vec_a", "vec_b", "cosine"]
        if len(pdf) < 2:
            return pd.DataFrame(columns=cols)
        ids = pdf["vec_id"].to_numpy()
        m = np.stack(pdf["v"].to_numpy())
        mn = m / pdf["norm"].to_numpy()[:, None]
        sim = mn @ mn.T
        iu, ju = np.triu_indices(len(ids), k=1)
        c = np.round(sim[iu, ju], 6)
        keep = c >= COSINE_PAIR_THRESHOLD
        ia, ib = ids[iu[keep]], ids[ju[keep]]
        return pd.DataFrame(
            {
                "vec_a": np.minimum(ia, ib),
                "vec_b": np.maximum(ia, ib),
                "cosine": c[keep],
            }
        )

    pairs = banded.groupBy("band", "key").applyInPandas(
        _bucket_pairs, "vec_a long, vec_b long, cosine double"
    )
    # a pair co-bucketed in several bands appears once per band with an
    # identical rounded cosine — distinct over the full row is exact
    return pairs.distinct()


def _embedding_cosine_pairs_sql() -> str:
    # mirrors the Spark plan exactly: cosine inside the band join,
    # threshold on the ROUNDED value, distinct over surviving triples
    return f"""
WITH {_banded_sql()},
eb AS (
    SELECT k.vec_id, bd.band, CASE bd.band {_case_key_sql()} END AS key,
           k.v, k.nrm
    FROM k CROSS JOIN (SELECT unnest(range({LSH_BANDS})) AS band) bd(band)
)
SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
FROM eb a JOIN eb b
  ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6)
      >= {COSINE_PAIR_THRESHOLD}
"""


EMBEDDING_COSINE_PAIRS_SQL = _embedding_cosine_pairs_sql()


# --- IVF (inverted-file) ANN -------------------------------------------------
IVF_CELLS = 16
IVF_NPROBE = 4


def ann_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: coarse-quantize into inverted lists, probe a few cells.

    The coarse centroids are the first ``IVF_CELLS`` non-query vectors —
    a deterministic, data-defined rule rather than k-means, which makes
    the whole index SQL-expressible: unlike the LSH variant this entry
    is *oracle-checked*, DuckDB rebuilding the identical inverted lists.
    Assignment is argmax-cosine over the broadcast centroids (the
    standard IVF cost: |cells|·N dots, one scan, no shuffle besides the
    per-vector argmax window); each query probes its ``IVF_NPROBE``
    nearest cells and only those lists are searched exactly. At scale
    the candidate join is an equi-join on cell_id, never all-pairs; a
    real deployment would swap the centroid rule for sampled k-means
    without touching the plan shape.
    """
    from pyspark.sql import Window as W

    emb = _emb(spark, sf_dir).withColumn("norm", _norm(F.col("v")))
    cents = emb.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + IVF_CELLS)
    ).select(
        F.col("vec_id").alias("cell_id"),
        F.col("v").alias("cv"),
        F.col("norm").alias("cnorm"),
    )
    csim = _dot(F.col("v"), F.col("cv")) / (F.col("norm") * F.col("cnorm"))
    scored = (
        emb.join(F.broadcast(cents))
        .withColumn("csim", csim)
        .withColumn(
            "r",
            F.row_number().over(
                W.partitionBy("vec_id").orderBy(
                    F.col("csim").desc(), F.col("cell_id")
                )
            ),
        )
    )
    assign = scored.filter(F.col("r") == 1).select("vec_id", "v", "norm", "cell_id")
    probes = (
        scored.filter(F.col("vec_id") < N_QUERIES)
        .filter(F.col("r") <= IVF_NPROBE)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("norm").alias("qnorm"),
            F.col("cell_id").alias("probe_cell"),
        )
    )
    cos = _dot(F.col("v"), F.col("qv")) / (F.col("norm") * F.col("qnorm"))
    ranked = (
        assign.join(
            F.broadcast(probes),
            (F.col("cell_id") == F.col("probe_cell"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn("cosine", cos)
        .withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(
                    F.col("cosine").desc(), F.col("vec_id")
                )
            ),
        )
        .filter(F.col("rank") <= TOP_K)
    )
    return ranked.select(
        "query_id", "rank", "vec_id", F.round("cosine", 6).alias("cosine")
    )


ANN_COSINE_TOPK_IVF_SQL = f"""
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v,
           sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
    FROM embeddings
),
c AS (
    SELECT vec_id AS cell_id, v AS cv, nrm AS cn FROM e
    WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + IVF_CELLS}
),
scored AS (
    SELECT e.vec_id, e.v, e.nrm, c.cell_id,
           row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_dot_product(e.v, c.cv) / (e.nrm * c.cn) DESC,
                        c.cell_id) AS r
    FROM e, c
),
a AS (SELECT vec_id, v, nrm, cell_id FROM scored WHERE r = 1),
p AS (
    SELECT vec_id AS query_id, v AS qv, nrm AS qn, cell_id
    FROM scored WHERE vec_id < {N_QUERIES} AND r <= {IVF_NPROBE}
),
cand AS (
    SELECT p.query_id, a.vec_id,
           list_dot_product(a.v, p.qv) / (a.nrm * p.qn) AS cosine
    FROM a JOIN p ON a.cell_id = p.cell_id AND a.vec_id != p.query_id
),
r AS (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
    FROM cand
)
SELECT query_id, rank, vec_id, ROUND(cosine, 6) AS cosine
FROM r WHERE rank <= {TOP_K}
"""


def ann_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    emb = _emb(spark, sf_dir).withColumn("norm", _norm(F.col("v")))
    banded = emb.withColumn("bk", F.explode(_lsh_bands(F.col("v")))).select(
        "vec_id", "v", "norm", "bk.band", "bk.key"
    )
    queries = banded.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
        F.col("band").alias("qband"),
        F.col("key").alias("qkey"),
    )
    cands = (
        banded.join(
            F.broadcast(queries),
            (F.col("band") == F.col("qband"))
            & (F.col("key") == F.col("qkey"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id", "v", "norm", "qv", "qnorm")
        .dropDuplicates(["query_id", "vec_id"])  # multi-band hits collapse
    )
    cos = _dot(F.col("v"), F.col("qv")) / (F.col("norm") * F.col("qnorm"))
    # rank on the rounded cosine so the oracle (whose float summation
    # order may differ at the last ulp) ranks identically; vec_id breaks
    # the (now more likely) exact ties deterministically
    ranked = cands.withColumn("cosine", cos).withColumn(
        "rank",
        F.row_number().over(
            W.partitionBy("query_id").orderBy(
                F.round("cosine", 6).desc(), F.col("vec_id")
            )
        ),
    )
    return ranked.filter(F.col("rank") <= TOP_K).select(
        "query_id", "rank", "vec_id", F.round("cosine", 6).alias("cosine")
    )


def _ann_cosine_topk_lsh_sql() -> str:
    return f"""
WITH {_banded_sql()},
cand AS (
    SELECT DISTINCT q.vec_id AS query_id, a.vec_id
    FROM banded a JOIN banded q
      ON a.band = q.band AND a.key = q.key
     AND q.vec_id < {N_QUERIES} AND a.vec_id != q.vec_id
),
scored AS (
    SELECT c.query_id, c.vec_id,
           ROUND(list_dot_product(ea.v, eq.v) / (ea.nrm * eq.nrm), 6) AS cosine
    FROM cand c
    JOIN e ea ON c.vec_id = ea.vec_id
    JOIN e eq ON c.query_id = eq.vec_id
),
r AS (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
    FROM scored
)
SELECT query_id, rank, vec_id, cosine FROM r WHERE rank <= {TOP_K}
"""


ANN_COSINE_TOPK_LSH_SQL = _ann_cosine_topk_lsh_sql()
