"""Multimodal plumbing: batch shapes and the loud decode stub."""

from __future__ import annotations

import pytest

from fledge_south_csvplayback_spark.operators import multimodal as M
from tests.conftest import TEST_SF_DIR


def test_decode_stub_fails_loudly_for_real_media():
    with pytest.raises(NotImplementedError):
        M._decode_stub("image/png", b"\x89PNG")


def test_frame_sample_fanout(spark):
    media = M.media_table(spark, TEST_SF_DIR)
    n_docs = media.count()
    frames = M.sample_frames(media)
    assert frames.count() == n_docs * M.N_FRAMES
    # frames partition the payload: per-doc byte sum == payload length
    tot = frames.groupBy("doc_id").sum("frame_bytes")
    feats = M.extract_features(media).select("doc_id", "n_bytes")
    joined = tot.join(feats, "doc_id")
    assert joined.filter("`sum(frame_bytes)` != n_bytes").count() == 0


# --- de-registered in round 9 (slot rotated to multimodal_image_stats):
# frame sampling keeps the driver's own value check here in pytest
def test_frame_sample_oracle_parity(spark):
    from tests.conftest import ORACLE_SF_DIR
    from tests.oracle_harness import compare

    for sf_dir in (TEST_SF_DIR, ORACLE_SF_DIR):
        df = M.multimodal_frame_sample(spark, sf_dir)
        ok, msg = compare(df, M.MULTIMODAL_FRAMES_SQL, sf_dir)
        assert ok, msg


# --- real PPM decode -----------------------------------------------------
def _ppm(w, h, pixels, maxval=255, header_extra=""):
    head = f"P6{header_extra}\n{w} {h}\n{maxval}\n".encode()
    return head + bytes(pixels)


def test_ppm_parser_roundtrip_and_comments():
    px = [(i * 7) % 256 for i in range(2 * 2 * 3)]
    w, h, maxval, buf = M._decode_ppm(_ppm(2, 2, px))
    assert (w, h, maxval) == (2, 2, 255)
    assert list(buf) == px
    # netpbm comments anywhere in the header
    payload = b"P6 # comment\n# another line\n 2\t2 # dims\n255\n" + bytes(px)
    assert M._decode_ppm(payload) == (2, 2, 255, bytes(px))


def test_ppm_parser_rejects_malformed():
    px = [0] * 12
    with pytest.raises(ValueError, match="magic"):
        M._decode_ppm(b"P5\n2 2\n255\n" + bytes(px))
    with pytest.raises(ValueError, match="buffer"):
        M._decode_ppm(_ppm(2, 2, px[:-1]))  # one byte short
    with pytest.raises(ValueError, match="maxval"):
        M._decode_ppm(_ppm(2, 2, px, maxval=65535))
    with pytest.raises(ValueError, match="truncated"):
        M._decode_ppm(b"P6\n2 2")


def test_image_stats_hand_computed(spark, tmp_path):
    """One 9x8 image decoded by hand through the same pixel formula:
    sums and dHash match the python-side recomputation bit for bit."""
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(7, "x", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    got = M.multimodal_image_stats(spark, sf_dir).collect()[0]
    px = [(7 * 131 + i * 17) % 256 for i in range(9 * 8 * 3)]
    assert (got.width, got.height, got.maxval) == (9, 8, 255)
    assert got.sum_r == sum(px[0::3])
    assert got.sum_g == sum(px[1::3])
    assert got.sum_b == sum(px[2::3])
    gray = [(px[3 * k] + px[3 * k + 1] + px[3 * k + 2]) // 3 for k in range(72)]
    want = ""
    for r in range(8):
        byte = 0
        for c in range(8):
            if gray[r * 9 + c] < gray[r * 9 + c + 1]:
                byte |= 1 << (7 - c)
        want += f"{byte:02x}"
    assert got.dhash == want


def test_image_dhash_brightness_invariant():
    """dHash keys on gradient SIGNS: a uniform brightness shift leaves
    every adjacent comparison unchanged, so the hash collides — the
    property that makes it a near-dup signature."""
    base = [(i * 13 + (i * i) % 37) % 200 for i in range(9 * 8 * 3)]
    shifted = [v + 55 for v in base]  # stays <= 255

    def dhash(px):
        gray = [
            (px[3 * k] + px[3 * k + 1] + px[3 * k + 2]) // 3 for k in range(72)
        ]
        out = ""
        for r in range(8):
            byte = 0
            for c in range(8):
                if gray[r * 9 + c] < gray[r * 9 + c + 1]:
                    byte |= 1 << (7 - c)
            out += f"{byte:02x}"
        return out

    assert dhash(base) == dhash(shifted)
    # sanity: a genuinely different image differs
    other = [(i * 91 + 3) % 256 for i in range(9 * 8 * 3)]
    assert dhash(base) != dhash(other)
