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
