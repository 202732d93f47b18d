"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

A 100 TB training pipeline carries images/audio/video as opaque
``binary`` columns with a typed metadata struct, and runs decode /
feature-extract / frame-sample as Arrow-batched Python over
``mapInPandas``. The real codecs (PIL/ffmpeg) are not in this
container, so the *decode* step is stubbed: payloads tagged with a
real media type raise ``NotImplementedError`` (clearly marked), while
the deterministic ``text/plain`` payloads produce reproducible fake
features. Everything around the stub — the binary column build, the
metadata struct, the mapInPandas batch signature, the output schema,
the per-partition batch iteration — is the real plumbing, and the
feature math is deterministic so the whole pipeline is oracle-checked
end-to-end against DuckDB.

Scale shape: mapInPandas streams Arrow batches per partition — no
driver collect, no per-row Python calls; partitioning of the input
carries through.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_FRAMES = 3

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, head_byte int, byte_sum long"
)
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes int"


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, payload binary, meta struct).

    The payload is the UTF-8 encoding of the text — a deterministic
    stand-in for real media bytes; the metadata struct is the typed
    sidecar a real pipeline would carry (content type + declared size).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.octet_length(payload).alias("declared_bytes"),
        ).alias("meta"),
    )


def _make_decode_stub():
    """STUB factory: real decoders (image/audio/video) are absent here.

    ``text/plain`` passes bytes through (deterministic fake decode);
    any real media type fails loudly rather than fake-succeeding.
    Built via a factory so the function's qualname is not a module
    attribute: cloudpickle then serializes it BY VALUE into the
    mapInPandas closures. Executor Python workers do not share the
    driver's sys.path, so anything pickled by module reference from
    this package would fail to import on the workers.
    """

    def _decode_stub(media_type: str, payload: bytes) -> bytes:
        if media_type == "text/plain":
            return payload
        raise NotImplementedError(
            f"decode for {media_type!r} requires codec libraries not present "
            "in this environment (PIL/ffmpeg); payload left opaque by design"
        )

    return _decode_stub


_decode_stub = _make_decode_stub()


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload."""
    decode = _decode_stub  # closure capture -> pickled by value

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [
                decode(m["media_type"], p)
                for m, p in zip(pdf["meta"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [m["media_type"] for m in pdf["meta"]],
                    "n_bytes": [len(b) for b in decoded],
                    "head_byte": [b[0] if len(b) else -1 for b in decoded],
                    "byte_sum": [int(sum(b)) for b in decoded],
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = N_FRAMES) -> DataFrame:
    """Frame-sampling stub: split the payload into n contiguous chunks.

    Stands in for video frame extraction; demonstrates the 1->N batch
    fan-out shape (output rows != input rows) that real frame sampling
    needs from mapInPandas.
    """
    decode = _decode_stub  # closure capture -> pickled by value

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_bytes": []}
            for doc_id, meta, payload in zip(
                pdf["doc_id"], pdf["meta"], pdf["payload"]
            ):
                b = decode(meta["media_type"], payload)
                chunk = -(-len(b) // n_frames)  # ceil
                for i in range(n_frames):
                    frame = b[i * chunk : (i + 1) * chunk]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(len(frame))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, FRAME_SCHEMA)


# --- registered queries ------------------------------------------------------
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(media_table(spark, sf_dir))


# texts are ASCII, so octet_length == len and head_byte == ascii(first char);
# byte_sum folds over the code points (DuckDB side uses the same ASCII fact)
MULTIMODAL_FEATURES_SQL = """
SELECT doc_id,
       'text/plain' AS media_type,
       CAST(len(text) AS INTEGER) AS n_bytes,
       CAST(CASE WHEN len(text) > 0 THEN ascii(text) ELSE -1 END AS INTEGER)
           AS head_byte,
       CAST(list_sum(list_transform(string_split_regex(text, ''),
                                    c -> ascii(c))) AS BIGINT) AS byte_sum
FROM documents
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(media_table(spark, sf_dir))


MULTIMODAL_FRAMES_SQL = f"""
WITH m AS (
    SELECT doc_id, len(text) AS n,
           CAST(ceil(len(text) / {N_FRAMES}.0) AS INTEGER) AS chunk
    FROM documents
)
SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
       CAST(GREATEST(0, LEAST(chunk, n - i * chunk)) AS INTEGER) AS frame_bytes
FROM m, unnest(generate_series(0, {N_FRAMES - 1})) t(i)
"""
