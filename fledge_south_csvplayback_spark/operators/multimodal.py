"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

A 100 TB training pipeline carries images/audio/video as opaque
``binary`` columns with a typed metadata struct, and runs decode /
feature-extract / frame-sample as Arrow-batched Python over
``mapInPandas``. Formats needing codec libraries (PNG/JPEG via PIL,
audio/video via ffmpeg) are not decodable in this container, so THAT
decode path fails loudly with ``NotImplementedError`` rather than
fake-succeeding. Two decode paths are REAL: ``text/plain`` payloads
pass through byte-exact, and PPM P6 rasters go through a genuine
pure-Python parser (``image_stats``: header tokenizer with netpbm
comment handling, dimension/maxval/buffer validation, per-channel
pixel sums, 64-bit dHash) — the binary column build, the metadata
struct, the mapInPandas batch signature, the output schema, and the
per-partition batch iteration are the same plumbing a codec-backed
decoder would use, and the math is deterministic so the whole
pipeline is oracle-checked end-to-end against DuckDB.

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


# --- real raster decode: PPM (P6) + pixel stats + dHash ----------------------
# A pure-Python decodable raster needs no codec library: PPM P6 is a
# text header ("P6", width, height, maxval, '#' comments allowed per
# the netpbm spec) followed by a raw RGB byte buffer. The decoder below
# is a REAL generic parser — header tokenizer, dimension/maxval
# validation, buffer-length check — so the decode stage stops being a
# stub for this format; NotImplementedError remains only for formats
# whose codecs are genuinely absent (PNG/JPEG/audio/video).
IMG_W, IMG_H = 9, 8  # 9×8 grayscale grid = the classic dHash geometry
IMAGE_STATS_SCHEMA = (
    "doc_id long, width int, height int, maxval int, "
    "sum_r bigint, sum_g bigint, sum_b bigint, dhash string"
)


def image_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, payload binary, meta struct) where the
    payload is a complete deterministic PPM P6 image (9×8 RGB): pixel
    byte ``i`` of doc ``d`` is ``(d*131 + i*17) % 256``. Construction
    is fully declarative — the pixel bytes become a hex string
    (``transform`` + ``lpad(hex(...))``) and ``unhex`` turns it into
    the binary buffer, concatenated after the encoded header — so
    payload synthesis runs JVM-side at scan speed; only the DECODE is
    Python, which is the shape a real pipeline has (bytes arrive from
    storage, Python runs the codec)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_px = IMG_W * IMG_H * 3
    idx = F.sequence(F.lit(0), F.lit(n_px - 1))
    pix = F.transform(
        idx, lambda i: (F.col("doc_id") * 131 + i * 17) % 256
    )
    hexstr = F.concat_ws(
        "", F.transform(pix, lambda v: F.lpad(F.hex(v), 2, "0"))
    )
    header = F.encode(F.lit(f"P6\n{IMG_W} {IMG_H}\n255\n"), "UTF-8")
    payload = F.concat(header, F.unhex(hexstr))
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("image/x-portable-pixmap").alias("media_type"),
            F.octet_length(payload).alias("declared_bytes"),
        ).alias("meta"),
    )


def _make_ppm_decoder():
    """Factory (cloudpickle by-value; see ``_make_decode_stub``) for a
    generic PPM P6 parser: returns (width, height, maxval, rgb_bytes)
    or raises ValueError on malformed input. Handles '#' comments and
    arbitrary whitespace in the header per the netpbm spec; 8-bit
    (maxval <= 255) buffers only."""

    def decode_ppm(payload: bytes) -> tuple[int, int, int, bytes]:
        if payload[:2] != b"P6":
            raise ValueError(f"not a PPM P6 payload: magic {payload[:2]!r}")
        # header tokenizer: magic, width, height, maxval — '#' starts
        # a comment running to end-of-line; a single whitespace byte
        # terminates the maxval token and the raw buffer follows
        pos, toks = 2, []
        while len(toks) < 3 and pos < len(payload):
            ch = payload[pos : pos + 1]
            if ch == b"#":
                while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                    pos += 1
            elif ch.isspace():
                pos += 1
            else:
                start = pos
                while (
                    pos < len(payload)
                    and not payload[pos : pos + 1].isspace()
                ):
                    pos += 1
                toks.append(payload[start:pos])
        pos += 1  # the single whitespace after maxval
        if len(toks) < 3:
            raise ValueError("truncated PPM header")
        w, h, maxval = (int(t) for t in toks)
        if w < 1 or h < 1 or not (0 < maxval <= 255):
            raise ValueError(f"bad PPM dimensions/maxval: {w}x{h}/{maxval}")
        buf = payload[pos : pos + w * h * 3]
        if len(buf) != w * h * 3:
            raise ValueError(
                f"PPM buffer holds {len(buf)} bytes, need {w * h * 3}"
            )
        return w, h, maxval, buf

    return decode_ppm


_decode_ppm = _make_ppm_decoder()


def image_stats(media: DataFrame) -> DataFrame:
    """Decode every PPM payload and emit per-channel pixel sums plus
    the 64-bit dHash: gray[r][c] = (R+G+B)//3, bit (r, c) set when
    gray[r][c] < gray[r][c+1] — each row's 8 comparisons pack into one
    byte, hex-encoded row-major (16 lowercase chars for 9×8; H·(W-1)
    bits generally). The difference hash is the standard byte-cheap
    near-dup signature for images — two images differing by
    brightness/scale shifts keep their gradient signs, so their
    dHashes collide; a Hamming-distance band join over this column is
    the image-side analogue of the SimHash text path.

    One mapInPandas pass, no shuffle; channel sums are exact integers
    (no float tolerance in the oracle compare)."""
    decode = _decode_ppm  # closure capture -> pickled by value

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [],
                "width": [],
                "height": [],
                "maxval": [],
                "sum_r": [],
                "sum_g": [],
                "sum_b": [],
                "dhash": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, maxval, buf = decode(payload)
                gray = [
                    (buf[3 * k] + buf[3 * k + 1] + buf[3 * k + 2]) // 3
                    for k in range(w * h)
                ]
                hash_hex = []
                for r in range(h):
                    byte = 0
                    for c in range(w - 1):
                        if gray[r * w + c] < gray[r * w + c + 1]:
                            byte |= 1 << (w - 2 - c)
                    hash_hex.append(f"{byte:0{-(-(w - 1) // 4)}x}")
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["maxval"].append(maxval)
                out["sum_r"].append(sum(buf[0::3]))
                out["sum_g"].append(sum(buf[1::3]))
                out["sum_b"].append(sum(buf[2::3]))
                out["dhash"].append("".join(hash_hex))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, IMAGE_STATS_SCHEMA)


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


def multimodal_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return image_stats(image_table(spark, sf_dir))


# The oracle rebuilds the pixel formula closed-form and recomputes the
# stats + dHash from it — the Spark side must round-trip those values
# through a real binary encode -> parse -> decode to match.
MULTIMODAL_IMAGE_STATS_SQL = f"""
WITH px AS (
    SELECT doc_id,
           list_transform(range(0, {IMG_W * IMG_H * 3}),
                          i -> (doc_id * 131 + i * 17) % 256) AS p
    FROM documents
), g AS (
    SELECT doc_id, p,
           list_transform(range(0, {IMG_W * IMG_H}),
                          k -> (p[3*k+1] + p[3*k+2] + p[3*k+3]) // 3) AS gray
    FROM px
)
SELECT doc_id,
       CAST({IMG_W} AS INTEGER) AS width,
       CAST({IMG_H} AS INTEGER) AS height,
       CAST(255 AS INTEGER) AS maxval,
       CAST(list_aggregate(list_transform(range(0, {IMG_W * IMG_H}),
            k -> p[3*k+1]), 'sum') AS BIGINT) AS sum_r,
       CAST(list_aggregate(list_transform(range(0, {IMG_W * IMG_H}),
            k -> p[3*k+2]), 'sum') AS BIGINT) AS sum_g,
       CAST(list_aggregate(list_transform(range(0, {IMG_W * IMG_H}),
            k -> p[3*k+3]), 'sum') AS BIGINT) AS sum_b,
       array_to_string(list_transform(range(0, {IMG_H}), r ->
           lpad(lower(to_hex(list_aggregate(
               list_transform(range(0, {IMG_W - 1}), c ->
                   CASE WHEN gray[r*{IMG_W}+c+1] < gray[r*{IMG_W}+c+2]
                        THEN (1 << ({IMG_W} - 2 - c)) ELSE 0 END),
               'sum'))), 2, '0')), '') AS dhash
FROM g
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
