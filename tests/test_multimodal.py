"""Multimodal plumbing: batch shapes and the loud decode stub."""

from __future__ import annotations

import numpy as np
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


# --- real WAV decode -----------------------------------------------------
def test_wav_parser_roundtrip_and_malformed():
    import struct

    samples = [0, 100, -100, 32767, -32768, 5]
    data = struct.pack(f"<{len(samples)}h", *samples)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    # the decoder returns the RAW LE-PCM16 byte slice (consumers go
    # straight to np.frombuffer), not a Python int list
    assert M._decode_wav(wav) == (8000, 1, data)
    assert list(np.frombuffer(M._decode_wav(wav)[2], "<i2")) == samples
    # an extra odd-sized chunk before data exercises word alignment
    wav2 = (
        b"RIFF" + struct.pack("<I", 0) + b"WAVE"
        + b"LIST" + struct.pack("<I", 3) + b"abc\x00"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 176400, 4, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    assert M._decode_wav(wav2) == (44100, 2, data)
    with pytest.raises(ValueError, match="RIFF"):
        M._decode_wav(b"OggS" + wav[4:])
    with pytest.raises(ValueError, match="PCM16"):
        bad = wav.replace(
            struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16),
            struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32),
        )
        M._decode_wav(bad)
    with pytest.raises(ValueError, match="missing"):
        M._decode_wav(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="truncated"):
        M._decode_wav(wav[:-2])


def test_audio_stats_oracle_parity(spark):
    """End-to-end WAV encode -> parse -> stats matches the closed-form
    DuckDB recomputation (the driver's own compare; off-registry under
    the 50-entry cap)."""
    from tests.conftest import ORACLE_SF_DIR
    from tests.oracle_harness import compare

    for sf_dir in (TEST_SF_DIR, ORACLE_SF_DIR):
        df = M.multimodal_audio_stats(spark, sf_dir)
        ok, msg = compare(df, M.MULTIMODAL_AUDIO_STATS_SQL, sf_dir)
        assert ok, msg


def test_audio_stats_hand_computed(spark, tmp_path):
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(3, "x", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    got = M.multimodal_audio_stats(spark, sf_dir).collect()[0]
    s = [(3 * 7 + i * 13) % 2048 - 1024 for i in range(M.WAV_SAMPLES)]
    assert (got.sample_rate, got.channels, got.n_samples) == (
        M.WAV_RATE, 1, M.WAV_SAMPLES,
    )
    assert got.peak == max(abs(x) for x in s)
    assert got.sum_abs == sum(abs(x) for x in s)
    assert got.sum_sq == sum(x * x for x in s)
    assert got.zero_crossings == sum(
        1 for a, b in zip(s, s[1:]) if (a < 0) != (b < 0)
    )


def test_image_neardup_oracle_parity(spark):
    """Blocked dHash band join == the DuckDB oracle (same 28 tables,
    same per-band XOR popcount) at sf0.001."""
    from tests.oracle_harness import compare

    df = M.image_neardup_pairs(spark, TEST_SF_DIR)
    ok, msg = compare(df, M.IMAGE_NEARDUP_SQL, TEST_SF_DIR)
    assert ok, msg


def test_image_neardup_planted_and_validation(spark, tmp_path):
    """doc_id and doc_id+256 render the identical image (the pixel
    formula is 256-periodic in doc_id), so the pair comes back at
    Hamming 0; the exact-detection bound is enforced."""
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(d, "x", "en", "s", 1) for d in (5, 261, 1000)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    rows = {
        (r.doc_a, r.doc_b): r.hamming
        for r in M.image_neardup_pairs(spark, sf_dir).collect()
    }
    assert rows[(5, 261)] == 0
    with pytest.raises(ValueError, match="exact-detection"):
        M.image_neardup_pairs(spark, sf_dir, max_hamming=7)
    with pytest.raises(ValueError, match="1 <= m"):
        M.image_neardup_pairs(spark, sf_dir, m=0)


def _ref_image_stats(w, h, buf):
    """Pure-Python reference for image_stats' per-image math (channel
    sums + row-packed dHash with ceil((w-1)/4) hex digits per row)."""
    gray = [(buf[3 * k] + buf[3 * k + 1] + buf[3 * k + 2]) // 3 for k in range(w * h)]
    digits = -(-(w - 1) // 4)
    hh = []
    for r in range(h):
        byte = 0
        for c in range(w - 1):
            if gray[r * w + c] < gray[r * w + c + 1]:
                byte |= 1 << (w - 2 - c)
        hh.append(f"{byte:0{digits}x}")
    return (
        sum(buf[0::3]), sum(buf[1::3]), sum(buf[2::3]), "".join(hh),
    )


def test_image_stats_mixed_geometry_scalar_and_vector_paths(spark):
    """One batch mixing w=9 (vectorized numpy path) and w=5 / w=13
    (scalar fallback) images: every row matches the pure-Python
    reference byte for byte, pinning both dispatch paths and the
    per-(w,h) group split."""
    geoms = {1: (9, 8), 2: (5, 4), 3: (13, 2), 4: (9, 8), 5: (2, 2)}
    rows, want = [], {}
    for d, (w, h) in geoms.items():
        px = bytes((d * 37 + i * 11) % 256 for i in range(w * h * 3))
        rows.append((d, bytearray(_ppm(w, h, px))))
        want[d] = (w, h) + _ref_image_stats(w, h, px)
    media = spark.createDataFrame(rows, "doc_id long, payload binary").coalesce(1)
    got = {r.doc_id: r for r in M.image_stats(media).collect()}
    assert set(got) == set(want)
    for d, (w, h, sr, sg, sb, dh) in want.items():
        r = got[d]
        assert (r.width, r.height, r.maxval) == (w, h, 255), d
        assert (r.sum_r, r.sum_g, r.sum_b, r.dhash) == (sr, sg, sb, dh), d


def test_image_neardup_precomputed_stats(spark, tmp_path):
    """The ``stats=`` injection point: a precomputed (doc_id, dhash)
    frame drives the join without re-decoding, and a frame missing the
    hash column is rejected."""
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(d, "x", "en", "s", 1) for d in (5, 261, 1000)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    pre = M.image_stats(M.image_table(spark, sf_dir)).select("doc_id", "dhash")
    rows = {
        (r.doc_a, r.doc_b): r.hamming
        for r in M.image_neardup_pairs(spark, sf_dir, stats=pre).collect()
    }
    assert rows[(5, 261)] == 0
    with pytest.raises(ValueError, match="lacks column"):
        M.image_neardup_pairs(
            spark, sf_dir, stats=pre.select("doc_id")
        )


# --- audio energy-envelope fingerprint + near-dup ------------------------
def _wav(samples, rate=8000, channels=1):
    import struct

    data = struct.pack(f"<{len(samples)}h", *samples)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack(
            "<IHHIIHH", 16, 1, channels, rate, rate * 2 * channels,
            2 * channels, 16,
        )
        + b"data" + struct.pack("<I", len(data)) + data
    )


def _ref_afp(samples):
    w = len(samples) // 64
    e = [sum(x * x for x in samples[k * w : (k + 1) * w]) for k in range(64)]
    bits = [e[k] > e[(k + 1) % 64] for k in range(64)]
    out = ""
    for b in range(8):
        byte = 0
        for j in range(8):
            if bits[8 * b + j]:
                byte |= 1 << (7 - j)
        out += f"{byte:02x}"
    return out


def test_audio_fp_oracle_parity(spark):
    """End-to-end WAV encode -> parse -> fingerprint matches the
    closed-form DuckDB recomputation (driver's own compare;
    off-registry under the 50-entry cap)."""
    from tests.conftest import ORACLE_SF_DIR
    from tests.oracle_harness import compare

    for sf_dir in (TEST_SF_DIR, ORACLE_SF_DIR):
        df = M.multimodal_audio_fp(spark, sf_dir)
        ok, msg = compare(df, M.MULTIMODAL_AUDIO_FP_SQL, sf_dir)
        assert ok, msg


def test_audio_fp_gain_invariant_and_validates(spark):
    """Scaling every sample by a constant scales every window energy
    by its square, so all pairwise comparisons — and the fingerprint —
    are unchanged; a different signal differs; a sample count not
    divisible by 64 is rejected (worker-side)."""
    base = [((i * 37) % 400) - 200 for i in range(256)]
    rows = [
        (1, bytearray(_wav(base))),
        (2, bytearray(_wav([3 * x for x in base]))),
        (3, bytearray(_wav([((i * i * 11) % 500) - 250 for i in range(256)]))),
        (4, bytearray(_wav(base[:128]))),  # 128 samples: also valid
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, payload binary"
    ).coalesce(1)
    got = {r.doc_id: r.afp for r in M.audio_fingerprints(media).collect()}
    assert got[1] == _ref_afp(base)
    assert got[2] == got[1]
    assert got[3] != got[1]
    assert got[4] == _ref_afp(base[:128])
    bad = spark.createDataFrame(
        [(9, bytearray(_wav([0] * 100)))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="divisible"):
        M.audio_fingerprints(bad).collect()


def test_audio_neardup_oracle_parity_and_planted(spark, tmp_path):
    """Blocked fingerprint band join == the DuckDB oracle at sf0.001;
    the sample formula is 2048-periodic in doc_id, so docs d and
    d+2048 render identical audio and come back at Hamming 0."""
    from tests.oracle_harness import compare

    df = M.audio_neardup_pairs(spark, TEST_SF_DIR)
    ok, msg = compare(df, M.AUDIO_NEARDUP_SQL, TEST_SF_DIR)
    assert ok, msg

    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(d, "x", "en", "s", 1) for d in (5, 2053, 100000)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    rows = {
        (r.doc_a, r.doc_b): r.hamming
        for r in M.audio_neardup_pairs(spark, sf_dir).collect()
    }
    assert rows[(5, 2053)] == 0
    with pytest.raises(ValueError, match="exact-detection"):
        M.audio_neardup_pairs(spark, sf_dir, max_hamming=7)
    pre = spark.createDataFrame([(1, "00" * 8)], "doc_id long, afp string")
    assert M.audio_neardup_pairs(spark, sf_dir, stats=pre).count() == 0
    with pytest.raises(ValueError, match="lacks column"):
        M.audio_neardup_pairs(spark, sf_dir, stats=pre.select("doc_id"))


# --- real AVI video decode ------------------------------------------------
def _avi_payload(doc_id, w=M.VID_W, h=M.VID_H, nf=M.VID_FRAMES):
    """Pure-Python replica of ``video_table``'s payload build: logical
    top-down RGB formula laid out as bottom-up BGR rows padded to the
    4-byte stride."""
    import struct

    stride = ((w * 3 + 3) // 4) * 4
    out = bytearray(M._avi_header_bytes(w, h, nf))
    for f in range(nf):
        out += b"00db" + struct.pack("<I", stride * h)
        for j in range(stride * h):
            sr, o = divmod(j, stride)
            if o >= w * 3:
                out.append(0)
            else:
                r = h - 1 - sr
                c, bch = divmod(o, 3)
                i = (r * w + c) * 3 + (2 - bch)
                out.append((doc_id * 131 + f * 37 + i * 17) % 256)
    return bytes(out)


def _normalize_frame(fr, w, h, stride, bottom_up):
    """Undo padding/flip/swap by hand -> logical top-down RGB bytes."""
    logical = []
    for r in range(h):
        sr = h - 1 - r if bottom_up else r
        row = fr[sr * stride : sr * stride + w * 3]
        for c in range(w):
            b, g, rr = row[3 * c : 3 * c + 3]
            logical += [rr, g, b]
    return logical


def test_avi_parser_roundtrip_and_malformed():
    import struct

    pay = _avi_payload(3)
    w, h, bottom_up, stride, frames = M._decode_avi(pay)
    assert (w, h, bottom_up, stride) == (
        M.VID_W, M.VID_H, True, M.VID_STRIDE,
    )
    assert len(frames) == M.VID_FRAMES
    for f, fr in enumerate(frames):
        expect = [
            (3 * 131 + f * 37 + i * 17) % 256 for i in range(w * h * 3)
        ]
        assert _normalize_frame(fr, w, h, stride, bottom_up) == expect
    # malformed inputs fail loudly
    with pytest.raises(ValueError):
        M._decode_avi(b"RIFX" + pay[4:])
    with pytest.raises(ValueError):
        M._decode_avi(pay[:-10])  # truncated final frame chunk
    # avih dwTotalFrames (5th DWORD of the avih body at offset 32)
    assert struct.unpack_from("<I", pay, 48)[0] == M.VID_FRAMES
    bad = bytearray(pay)
    struct.pack_into("<I", bad, 48, 9)
    with pytest.raises(ValueError, match="declares 9 frames"):
        M._decode_avi(bytes(bad))
    # strf biBitCount (offset 14 into the strf body at offset 172)
    assert struct.unpack_from("<H", pay, 186)[0] == 24
    bad = bytearray(pay)
    struct.pack_into("<H", bad, 186, 8)
    with pytest.raises(ValueError, match="24bpp"):
        M._decode_avi(bytes(bad))


def test_avi_padding_bytes_ignored():
    """Junk in the stride padding must not reach the logical plane."""
    pay = bytearray(_avi_payload(7))
    hdr = len(M._avi_header_bytes(M.VID_W, M.VID_H, M.VID_FRAMES))
    fb = M.VID_STRIDE * M.VID_H
    for f in range(M.VID_FRAMES):
        base = hdr + f * (8 + fb) + 8
        for sr in range(M.VID_H):
            for o in range(M.VID_W * 3, M.VID_STRIDE):
                pay[base + sr * M.VID_STRIDE + o] = 0xFF
    w, h, bu, stride, frames = M._decode_avi(bytes(pay))
    _, _, _, _, clean = M._decode_avi(_avi_payload(7))
    for fr, cl in zip(frames, clean):
        assert _normalize_frame(fr, w, h, stride, bu) == _normalize_frame(
            cl, w, h, stride, bu
        )


def test_video_stats_zero_frame_avi(spark):
    """A zero-frame AVI is valid (avih declares 0, movi empty): alone
    it yields zero rows instead of an opaque lexsort ValueError, and
    in a mixed batch it must not suppress the other docs' frames."""
    empty = _avi_payload(3, nf=0)
    full = _avi_payload(5)
    media = spark.createDataFrame(
        [(3, bytearray(empty))], "doc_id long, payload binary"
    )
    assert M.video_stats(media).count() == 0
    mixed = spark.createDataFrame(
        [(3, bytearray(empty)), (5, bytearray(full))],
        "doc_id long, payload binary",
    ).repartition(1)
    rows = M.video_stats(mixed).collect()
    assert sorted({r.doc_id for r in rows}) == [5]
    assert len(rows) == M.VID_FRAMES


def test_video_stats_oracle_parity(spark):
    """End-to-end AVI encode -> parse -> per-frame stats matches the
    closed-form DuckDB recomputation of the LOGICAL pixel formula —
    any stride/flip/BGR bug in build or decode is a value mismatch."""
    from tests.conftest import ORACLE_SF_DIR
    from tests.oracle_harness import compare

    for sf_dir in (TEST_SF_DIR, ORACLE_SF_DIR):
        df = M.multimodal_video_stats(spark, sf_dir)
        ok, msg = compare(df, M.MULTIMODAL_VIDEO_STATS_SQL, sf_dir)
        assert ok, msg


def test_video_frame0_matches_image_stats(spark):
    """Frame 0's logical plane IS the PPM image's, but the two ops
    round-trip through different containers and storage layouts
    (netpbm top-down RGB vs DIB bottom-up BGR padded) — equality
    cross-checks both decoders against each other."""
    v = (
        M.multimodal_video_stats(spark, TEST_SF_DIR)
        .filter("frame_idx = 0")
        .select("doc_id", "sum_r", "sum_g", "sum_b", "dhash")
        .alias("v")
    )
    i = (
        M.multimodal_image_stats(spark, TEST_SF_DIR)
        .select("doc_id", "sum_r", "sum_g", "sum_b", "dhash")
        .alias("i")
    )
    j = v.join(i, "doc_id")
    n_docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet").count()
    assert j.count() == n_docs
    assert (
        j.filter(
            "v.sum_r != i.sum_r OR v.sum_g != i.sum_g "
            "OR v.sum_b != i.sum_b OR v.dhash != i.dhash"
        ).count()
        == 0
    )


def test_video_neardup_oracle_parity_and_planted(
    spark, tmp_path, hostile_video_sf_dir
):
    """Frame-level blocked band join + doc-pair min == the DuckDB
    oracle over the SLICED hostile corpus (round 16 — the full 500-doc
    corpus is one giant near-dup cluster under the 256-periodic
    formula: ~103k pairs, ~60 s of identical re-verification; the
    slice keeps the planted ragged shapes and the whole pipeline);
    doc_id and doc_id+256 render identical frames, so the separately
    planted pair below is Hamming 0."""
    from tests.oracle_harness import compare

    df = M.video_neardup_pairs(spark, hostile_video_sf_dir)
    ok, msg = compare(df, M.VIDEO_NEARDUP_SQL, hostile_video_sf_dir)
    assert ok, msg

    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(5, "a", "en", "s", 1), (261, "b", "en", "s", 1),
         (1000, "c", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in M.video_neardup_pairs(spark, sf_dir).collect()
    }
    assert got[(5, 261)] == 0
    # validation: bound enforcement + stats-frame schema
    with pytest.raises(ValueError, match="exact-detection bound"):
        M.video_neardup_pairs(spark, sf_dir, max_hamming=7, m=2)
    with pytest.raises(ValueError, match="lacks column"):
        M.video_neardup_pairs(
            spark, sf_dir, stats=spark.range(3).select("id")
        )


# --- round-9 review hardening ----------------------------------------------
def test_audio_ops_reject_multichannel(spark):
    """Interleaved multi-channel streams would yield wrong
    zero-crossings/fingerprints; both ops fail loudly instead."""
    stereo = _wav([0, 0, 100, -100] * 32, channels=2)
    media = spark.createDataFrame(
        [(1, bytearray(stereo))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="mono-only"):
        M.audio_stats(media).collect()
    with pytest.raises(Exception, match="mono-only"):
        M.audio_fingerprints(media).collect()


def test_audio_stats_per_channel_stereo_oracle_parity(spark):
    """End-to-end stereo WAV encode -> deinterleave -> per-channel
    stats matches the closed-form DuckDB recomputation over the
    interleaved sample formula (frame f, channel c = value 2f+c)."""
    from tests.conftest import ORACLE_SF_DIR
    from tests.oracle_harness import compare

    for sf_dir in (TEST_SF_DIR, ORACLE_SF_DIR):
        df = M.multimodal_audio_stats_stereo(spark, sf_dir)
        ok, msg = compare(df, M.MULTIMODAL_AUDIO_STATS_STEREO_SQL, sf_dir)
        assert ok, msg


def test_audio_stats_per_channel_semantics(spark):
    """Hand-planted stereo: per-channel zero-crossings differ from any
    flat scan of the interleaved stream (the exact wrongness the
    mono-only guard exists for); mono input reduces to audio_stats
    rows exactly; malformed channel layouts fail loudly."""
    # L alternates sign every frame (63 crossings over 64 frames);
    # R is the constant 50 (0 crossings). Interleaved flat scan would
    # cross at EVERY step instead.
    inter = []
    for f in range(64):
        inter += [100 if f % 2 == 0 else -100, 50]
    media = spark.createDataFrame(
        [(1, bytearray(_wav(inter, channels=2)))],
        "doc_id long, payload binary",
    )
    rows = {r.channel: r for r in M.audio_stats_per_channel(media).collect()}
    assert set(rows) == {0, 1}
    assert rows[0].zero_crossings == 63
    assert rows[1].zero_crossings == 0
    assert rows[0].peak == 100 and rows[1].peak == 50
    assert rows[0].n_frames == 64 and rows[0].channels == 2
    assert rows[1].sum_sq == 64 * 50 * 50
    # mono input: identical numbers to audio_stats, channel pinned 0
    mono_media = M.audio_table(spark, TEST_SF_DIR)
    per_ch = {
        r.doc_id: r
        for r in M.audio_stats_per_channel(mono_media).collect()
    }
    for r in M.audio_stats(mono_media).collect():
        p = per_ch[r.doc_id]
        assert (p.channel, p.channels, p.n_frames) == (0, 1, r.n_samples)
        assert (p.peak, p.sum_abs, p.sum_sq, p.zero_crossings) == (
            r.peak, r.sum_abs, r.sum_sq, r.zero_crossings,
        )
    # 3 int16 values do not deinterleave into 2 channels
    bad = spark.createDataFrame(
        [(1, bytearray(_wav([1, 2, 3], channels=2)))],
        "doc_id long, payload binary",
    )
    with pytest.raises(Exception, match="deinterleave"):
        M.audio_stats_per_channel(bad).collect()
    # the stereo fixture builder rejects channel counts that don't
    # divide the sample plane
    with pytest.raises(ValueError, match="divide"):
        M.audio_table(spark, TEST_SF_DIR, channels=3)


def test_ppm_comment_glued_to_token():
    """A '#' immediately after a header token is spec-legal (comments
    live in header whitespace); the comment's newline IS the single
    whitespace before the raster."""
    raster = bytes((i * 3) % 256 for i in range(9 * 8 * 3))
    pay = b"P6\n9# width comment\n8\n255# maxval comment\n" + raster
    w, h, maxval, buf = M._decode_ppm(pay)
    assert (w, h, maxval) == (9, 8, 255)
    assert buf == raster
    with pytest.raises(ValueError, match="non-numeric"):
        M._decode_ppm(b"P6\nab 8\n255\n" + raster)


def test_undersized_header_chunks_rejected():
    """Declared chunk sizes below the fixed header layouts fail as
    ValueError instead of leaking struct.error or reading neighbors."""
    import struct

    bad_wav = (
        b"RIFF" + struct.pack("<I", 0) + b"WAVE"
        + b"fmt " + struct.pack("<I", 8) + b"\x01\x00\x01\x00\x40\x1f\x00\x00"
        + b"data" + struct.pack("<I", 2) + b"\x00\x00"
    )
    with pytest.raises(ValueError, match="need >= 16"):
        M._decode_wav(bad_wav)
    pay = bytearray(_avi_payload(1))
    # shrink the declared avih size (offset 28 is its size field)
    assert pay[24:28] == b"avih"
    struct.pack_into("<I", pay, 28, 40)
    with pytest.raises(ValueError, match="need >= 56"):
        M._decode_avi(bytes(pay))


def test_video_scalar_dhash_matches_image_convention(spark):
    """Non-standard widths take the scalar fallback, which packs each
    row RIGHT-aligned like image_stats' scalar path (packbits would
    left-align the trailing byte and break cross-joining)."""
    w, h, nf = 5, 3, 2
    pay = _avi_payload(3, w=w, h=h, nf=nf)
    media = spark.createDataFrame(
        [(3, bytearray(pay))], "doc_id long, payload binary"
    )
    rows = {r.frame_idx: r for r in M.video_stats(media).collect()}
    assert len(rows) == nf
    nhex = -(-(w - 1) // 4)
    for f in range(nf):
        logical = [(3 * 131 + f * 37 + i * 17) % 256 for i in range(w * h * 3)]
        gray = [
            (logical[3 * k] + logical[3 * k + 1] + logical[3 * k + 2]) // 3
            for k in range(w * h)
        ]
        expect = []
        for r in range(h):
            byte = 0
            for c in range(w - 1):
                if gray[r * w + c] < gray[r * w + c + 1]:
                    byte |= 1 << (w - 2 - c)
            expect.append(f"{byte:0{nhex}x}")
        assert rows[f].dhash == "".join(expect)


def test_band_join_rejects_wrong_length_hashes(spark):
    """A fingerprint that is not 2*n_bands hex chars raises instead of
    silently NULLing the Hamming sum and dropping every pair."""
    bad = spark.createDataFrame(
        [(1, "aabb"), (2, "aabb")], "doc_id long, dhash string"
    )
    with pytest.raises(Exception, match="hex chars"):
        M.image_neardup_pairs(spark, TEST_SF_DIR, stats=bad).collect()


# --- image resize (box downsample) ----------------------------------------
def test_image_resize_pipeline_oracle_parity(spark):
    """decode -> box-resize to the dHash geometry -> re-decode ->
    stats+hash matches the closed-form DuckDB recomputation of the box
    means over the 18x16 formula plane."""
    from tests.conftest import ORACLE_SF_DIR
    from tests.oracle_harness import compare

    for sf in (TEST_SF_DIR, ORACLE_SF_DIR):
        df = M.multimodal_image_resize_stats(spark, sf)
        ok, msg = compare(df, M.MULTIMODAL_IMAGE_RESIZE_SQL, sf)
        assert ok, msg


def test_image_resize_emits_valid_ppm_and_box_means(spark):
    """The emitted payload is a parseable PPM of the target geometry
    and each output pixel is the exact floor-mean of its 2x2 block."""
    media = M.image_table_large(spark, TEST_SF_DIR).limit(3)
    rows = M.image_resize(media, M.IMG_W, M.IMG_H).collect()
    for r in rows:
        w, h, maxval, buf = M._decode_ppm(bytes(r.payload))
        assert (w, h, maxval) == (M.IMG_W, M.IMG_H, 255)
        d = r.doc_id
        src = [
            (d * 131 + i * 17) % 256
            for i in range(M.IMG2_W * M.IMG2_H * 3)
        ]
        for k in range(w * h):
            rr, cc = divmod(k, w)
            for ch in range(3):
                vals = [
                    src[((2 * rr + dr) * M.IMG2_W + 2 * cc + dc) * 3 + ch]
                    for dr in (0, 1)
                    for dc in (0, 1)
                ]
                assert buf[3 * k + ch] == sum(vals) // 4
    with pytest.raises(Exception, match="divisible"):
        M.image_resize(
            M.image_table(spark, TEST_SF_DIR).limit(1), 4, 3
        ).collect()
    with pytest.raises(ValueError, match="bad target"):
        M.image_resize(media, 0, 8)


def test_image_resize_propagates_maxval(spark):
    """A maxval-127 source must emit a maxval-127 PPM — relabeling as
    255 would silently halve normalized brightness downstream."""
    pay = _ppm(M.IMG2_W, M.IMG2_H, [100] * (M.IMG2_W * M.IMG2_H * 3),
               maxval=127)
    media = spark.createDataFrame(
        [(1, bytearray(pay))], "doc_id long, payload binary"
    )
    out = M.image_resize(media, M.IMG_W, M.IMG_H).collect()[0]
    w, h, maxval, buf = M._decode_ppm(bytes(out.payload))
    assert (w, h, maxval) == (M.IMG_W, M.IMG_H, 127)
    assert set(buf) == {100}  # box mean of a constant plane
    stats = M.image_stats(
        spark.createDataFrame(
            [(1, bytearray(bytes(out.payload)))],
            "doc_id long, payload binary",
        )
    ).collect()[0]
    assert stats.maxval == 127


# --- incremental near-dup ingest over the persisted band index ------------
def _md5hex16(i, salt=""):
    import hashlib

    return hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:16]


def _flip_bits(hex16, bits):
    v = int(hex16, 16)
    for b in bits:
        v ^= 1 << b
    return f"{v:016x}"


def test_media_neardup_ingest_matches_full_miner(spark, tmp_path):
    """The ingest gate (dedup.neardup_ingest's contract, extended to
    the Hamming family): ingest output == the full miner restricted to
    batch-touching pairs, on a diverse-hash corpus with planted
    corpus-corpus (must NOT surface), corpus-batch, and batch-batch
    near-dups."""
    split, n = 400, 500
    hashes = {i: _md5hex16(i) for i in range(n)}
    hashes[11] = _flip_bits(hashes[10], [3])          # corpus-corpus
    hashes[450] = _flip_bits(hashes[20], [0, 9, 17])  # corpus-batch
    hashes[470] = _flip_bits(hashes[460], [5, 40])    # batch-batch
    st = spark.createDataFrame(
        [(i, h) for i, h in hashes.items()], "doc_id long, dhash string"
    )
    full = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in M.image_neardup_pairs(spark, TEST_SF_DIR, stats=st).collect()
    }
    assert (10, 11, 1) in full
    want = {p for p in full if p[0] >= split or p[1] >= split}
    assert {(20, 450, 3), (460, 470, 2)} <= want
    assert (10, 11, 1) not in want

    idx = str(tmp_path / "img_idx")
    M.build_image_neardup_index(
        spark, TEST_SF_DIR, idx, max_doc_id=split, stats=st
    )
    ingest_df = M.image_neardup_ingest(spark, TEST_SF_DIR, idx, split, stats=st)
    got = {(r.doc_a, r.doc_b, r.hamming) for r in ingest_df.collect()}
    assert got == want
    # the cross probe BROADCASTS the batch bands against one scan of
    # the index — the corpus side never enters an Exchange
    plan = ingest_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    # geometry is index state: querying with the wrong hash family
    # fails loudly instead of joining to nothing
    with pytest.raises(ValueError, match="holds 'dhash'"):
        M.media_neardup_ingest(
            spark,
            idx,
            st.withColumnRenamed("dhash", "afp"),
            "afp",
            M.AFP_BANDS,
            M.AUDIO_MAX_HAMMING,
            split,
        )


def test_audio_neardup_ingest_matches_full_miner(spark, tmp_path):
    split, n = 300, 360
    hashes = {i: _md5hex16(i, "a") for i in range(n)}
    hashes[330] = _flip_bits(hashes[7], [12, 33])
    st = spark.createDataFrame(
        [(i, h) for i, h in hashes.items()], "doc_id long, afp string"
    )
    full = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in M.audio_neardup_pairs(spark, TEST_SF_DIR, stats=st).collect()
    }
    want = {p for p in full if p[0] >= split or p[1] >= split}
    assert (7, 330, 2) in want
    idx = str(tmp_path / "afp_idx")
    M.build_audio_neardup_index(
        spark, TEST_SF_DIR, idx, max_doc_id=split, stats=st
    )
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in M.audio_neardup_ingest(
            spark, TEST_SF_DIR, idx, split, stats=st
        ).collect()
    }
    assert got == want


def test_video_neardup_ingest_matches_full_miner(spark, tmp_path):
    """Frame-level index rows, doc-pair min-Hamming collapse: a batch
    clip sharing ONE frame with a corpus clip is a pair; the min over
    several matching frames is taken across cross+within."""
    split, n, nf = 80, 100, 3
    rows = []
    fh = {}
    for d in range(n):
        for f in range(nf):
            fh[(d, f)] = _md5hex16(d * 7 + f, "v")
    fh[(90, 1)] = _flip_bits(fh[(30, 2)], [8])       # corpus-batch, ham 1
    fh[(91, 0)] = _flip_bits(fh[(92, 2)], [2, 50])   # batch-batch, ham 2
    fh[(91, 2)] = fh[(92, 0)]                        # same pair, ham 0 -> min
    rows = [(d, h) for (d, _f), h in fh.items()]
    st = spark.createDataFrame(rows, "doc_id long, dhash string")
    full = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in M.video_neardup_pairs(spark, TEST_SF_DIR, stats=st).collect()
    }
    want = {p for p in full if p[0] >= split or p[1] >= split}
    assert {(30, 90, 1), (91, 92, 0)} <= want
    idx = str(tmp_path / "vid_idx")
    M.build_video_neardup_index(
        spark, TEST_SF_DIR, idx, max_doc_id=split, stats=st
    )
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in M.video_neardup_ingest(
            spark, TEST_SF_DIR, idx, split, stats=st
        ).collect()
    }
    assert got == want


def test_image_neardup_ingest_end_to_end_decode_path(spark):
    """No injected hashes: the sf0.001 decode path itself (256-periodic
    formula, so heavy genuine duplicates) through build-index + ingest
    agrees with the full miner's batch-touching restriction."""
    import tempfile

    n_docs = spark.read.parquet(
        f"{TEST_SF_DIR}/documents.parquet"
    ).count()
    split = n_docs // 2
    full = M.image_neardup_pairs(spark, TEST_SF_DIR)
    want = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in full.collect()
        if r.doc_a >= split or r.doc_b >= split
    }
    assert want  # the periodic fixture guarantees batch-touching dups
    with tempfile.TemporaryDirectory() as idx:
        M.build_image_neardup_index(spark, TEST_SF_DIR, idx, max_doc_id=split)
        got = {
            (r.doc_a, r.doc_b, r.hamming)
            for r in M.image_neardup_ingest(
                spark, TEST_SF_DIR, idx, split
            ).collect()
        }
    assert got == want


def test_media_index_diff_maintenance_reconciles(spark, tmp_path):
    """Diff-driven maintenance: applying a crawl's churn to the band
    index copy-on-write equals a full rebuild from the new snapshot
    (frame equality), the plan's keys are exactly the touched-key
    support of the rewrite, and untouched keys never appear."""
    n = 200
    old = {i: _md5hex16(i, "m") for i in range(n)}
    new = dict(old)
    del new[5]                                # removed
    new[7] = _md5hex16(7, "changed")          # changed
    new[300] = _md5hex16(300, "m")            # added
    old_st = spark.createDataFrame(
        list(old.items()), "doc_id long, dhash string"
    )
    new_st = spark.createDataFrame(
        list(new.items()), "doc_id long, dhash string"
    )
    diff = spark.createDataFrame(
        [(5, "removed"), (7, "changed"), (300, "added")],
        "doc_id long, status string",
    )
    idx = str(tmp_path / "idx")
    nxt = str(tmp_path / "next")
    M.build_image_neardup_index(spark, "unused", idx, stats=old_st)
    M.media_index_apply_diff(spark, idx, diff, new_st, nxt)
    # reconciliation: copy-on-write result == full rebuild on new snap
    rebuilt = str(tmp_path / "rebuilt")
    M.build_image_neardup_index(spark, "unused", rebuilt, stats=new_st)
    got = {
        tuple(r) for r in spark.read.parquet(f"{nxt}/bands").collect()
    }
    want = {
        tuple(r)
        for r in spark.read.parquet(f"{rebuilt}/bands").collect()
    }
    assert got == want
    assert (
        spark.read.parquet(f"{nxt}/meta").collect()
        == spark.read.parquet(f"{idx}/meta").collect()
    )
    # the plan is the exact touched-key support of the rewrite
    plan = M.media_index_maintenance_plan(spark, idx, diff, new_st)
    plan_rows = {(r.tbl, r.kk): (r.n_remove, r.n_add) for r in plan.collect()}
    before = {
        tuple(r)
        for r in spark.read.parquet(f"{idx}/bands")
        .select("tbl", "kk", "doc_id")
        .collect()
    }
    after = {
        tuple(r)
        for r in spark.read.parquet(f"{nxt}/bands")
        .select("tbl", "kk", "doc_id")
        .collect()
    }
    touched = {(t, k) for (t, k, _d) in before ^ after}
    assert set(plan_rows) == touched
    # counts: removed doc 5 + changed doc 7 leave; added 300 + changed
    # 7 enter; every key group's totals line up with the row movement
    for (t, k), (nr, na) in plan_rows.items():
        assert nr == len(
            {(t2, k2, d) for (t2, k2, d) in before - after
             if (t2, k2) == (t, k)}
        )
        assert na == len(
            {(t2, k2, d) for (t2, k2, d) in after - before
             if (t2, k2) == (t, k)}
        )
    # an ingest against the advanced index sees the new snapshot: the
    # changed doc's OLD hash no longer collides
    with pytest.raises(ValueError, match="collides"):
        M.media_index_apply_diff(spark, idx, diff, new_st, f"{idx}/sub")


def test_media_index_append_sequential_ingests(spark, tmp_path):
    """The index lifecycle end-to-end: build(corpus) + ingest(batch1)
    + append(batch1) + ingest(batch2) produces, across the two
    ingests, exactly the full miner's batch-touching pairs for each
    stage — batch2 collides against batch1 only because the append
    advanced the index."""
    s1, s2, n = 300, 400, 500
    hashes = {i: _md5hex16(i, "q") for i in range(n)}
    hashes[350] = _flip_bits(hashes[8], [4])    # corpus x batch1
    hashes[450] = _flip_bits(hashes[350], [9])  # batch1 x batch2 (!)
    st = spark.createDataFrame(
        [(i, h) for i, h in hashes.items()], "doc_id long, dhash string"
    )
    idx = str(tmp_path / "idx")
    M.build_image_neardup_index(spark, "unused", idx, max_doc_id=s1, stats=st)
    got1 = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in M.image_neardup_ingest(
            spark, "unused", idx, s1, stats=st.filter(f"doc_id < {s2}")
        ).collect()
    }
    # batch1 = [s1, s2): pairs touching it, both endpoints < s2
    full = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in M.image_neardup_pairs(spark, "unused", stats=st).collect()
    }
    want1 = {
        p for p in full
        if (s1 <= p[0] < s2 or s1 <= p[1] < s2) and p[0] < s2 and p[1] < s2
    }
    assert got1 == want1 and (8, 350, 1) in got1
    # accept batch1 -> append, then ingest batch2 = [s2, n)
    M.media_index_append(
        spark, idx, st.filter(f"doc_id >= {s1} and doc_id < {s2}")
    )
    got2 = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in M.image_neardup_ingest(spark, "unused", idx, s2, stats=st)
        .collect()
    }
    want2 = {p for p in full if p[0] >= s2 or p[1] >= s2}
    assert got2 == want2 and (350, 450, 1) in got2
    # build(corpus)+append(batch1) == build(corpus ∪ batch1) row-for-row
    rebuilt = str(tmp_path / "rb")
    M.build_image_neardup_index(
        spark, "unused", rebuilt, max_doc_id=s2, stats=st
    )
    a = {tuple(r) for r in spark.read.parquet(f"{idx}/bands").collect()}
    b = {tuple(r) for r in spark.read.parquet(f"{rebuilt}/bands").collect()}
    assert a == b


def test_media_index_append_refuses_compacted_streaming_index(spark, tmp_path):
    """A compacted STREAMING index resolves its live band table via
    bands_MANIFEST; the batch append's literal-path write would land
    in the superseded dir — invisible to every probe and deleted by
    the next sweep (round-14 advice item). It must fail loudly and
    leave the index untouched."""
    import os

    from fledge_south_csvplayback_spark.streaming import media_ingest as MI

    st = spark.createDataFrame(
        [(i, _md5hex16(i, "g")) for i in range(40)],
        "doc_id long, dhash string",
    )
    idx = str(tmp_path / "sidx")
    MI.seed_media_index(spark, st, idx)
    batch = spark.createDataFrame(
        [(100 + i, _md5hex16(100 + i, "g")) for i in range(5)],
        "doc_id long, dhash string",
    )
    MI.media_accept_batch(batch, 0, idx, str(tmp_path / "out"))
    MI.compact_media_index(spark, idx)
    assert os.path.exists(f"{idx}/bands_MANIFEST")
    live_before = {
        tuple(r) for r in spark.read.parquet(MI.media_bands_dir(idx)).collect()
    }
    with pytest.raises(ValueError, match="media_accept_batch"):
        M.media_index_append(spark, idx, st.limit(5))
    assert {
        tuple(r) for r in spark.read.parquet(MI.media_bands_dir(idx)).collect()
    } == live_before


def test_audio_downmix_stats_oracle_parity(spark):
    """decode -> floor-mean downmix -> re-encode -> decode -> stats
    matches the closed-form interleaved-formula oracle (explicit
    floor(): DuckDB's // truncates on negatives, numpy's floors)."""
    from tests.conftest import ORACLE_SF_DIR
    from tests.oracle_harness import compare

    for sf_dir in (TEST_SF_DIR, ORACLE_SF_DIR):
        df = M.multimodal_audio_downmix_stats(spark, sf_dir)
        ok, msg = compare(df, M.MULTIMODAL_AUDIO_DOWNMIX_SQL, sf_dir)
        assert ok, msg


def test_audio_downmix_hand_computed_and_validates(spark):
    """Hand-planted stereo: mono frame = floor((L+R)/2) incl. the
    negative-odd case; mono input passes through value-identical;
    malformed layouts fail loudly."""
    inter = [100, 50, -101, 50, 7, -8, -32768, 32767]  # 4 frames
    media = spark.createDataFrame(
        [(1, bytearray(_wav(inter, channels=2)))],
        "doc_id long, payload binary",
    )
    out = M.audio_downmix(media).collect()[0]
    rate, ch, data = M._decode_wav(bytes(out.payload))
    assert (rate, ch) == (8000, 1)
    got = list(np.frombuffer(data, "<i2"))
    assert got == [75, -26, -1, -1]  # floor((-101+50)/2) = -26
    mono = M.audio_table(spark, TEST_SF_DIR)
    same = M.audio_stats(M.audio_downmix(mono)).collect()
    want = {r.doc_id: r for r in M.audio_stats(mono).collect()}
    for r in same:
        w = want[r.doc_id]
        assert (r.peak, r.sum_abs, r.sum_sq, r.zero_crossings) == (
            w.peak, w.sum_abs, w.sum_sq, w.zero_crossings,
        )
    bad = spark.createDataFrame(
        [(1, bytearray(_wav([1, 2, 3], channels=2)))],
        "doc_id long, payload binary",
    )
    with pytest.raises(Exception, match="cannot downmix"):
        M.audio_downmix(bad).collect()


def test_audio_stats_null_payload_descriptive_error(spark):
    """A NULL payload fails both preparse branches; the decoder must
    name the doc rather than die on bytes(None)."""
    import pytest

    df = spark.createDataFrame(
        [(1, None)], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="NULL WAV payload for doc_id=1"):
        M.audio_stats(df).collect()
