"""Multimodal plumbing: binary schema, Arrow batch shape, codec gate.
(Value correctness vs DuckDB is covered by test_oracle.py.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from data_pipelines_using_llm_spark.operators import multimodal as MM
from data_pipelines_using_llm_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _media(spark):
    return MM.media_table(load_table(spark, SF_DIR, "documents"))


def test_media_schema_binary_payload(spark):
    m = _media(spark)
    assert isinstance(m.schema["payload"].dataType, BinaryType)
    kinds = {r["kind"] for r in m.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_codec_gate_raises_without_libs(spark):
    with pytest.raises(NotImplementedError, match="image decode"):
        MM.require_codec("image")


def test_decode_stats_covers_every_row(spark):
    m = _media(spark)
    stats = MM.decode_stats(m)
    assert stats.count() == m.count()
    assert stats.filter(F.col("n_bytes") <= 0).count() == 0


def test_frame_sample_only_video_and_stride(spark):
    frames = MM.frame_sample(_media(spark))
    nos = {r["frame_no"] for r in frames.select("frame_no").distinct().collect()}
    assert nos and all(n % MM.FRAME_STRIDE == 0 for n in nos)


def test_resize_clips_to_limit(spark):
    resized = MM.resize_image(_media(spark))
    assert resized.filter(F.col("new_n_chars") > MM.RESIZE_CHARS).count() == 0
    assert resized.select("media_id").distinct().count() == resized.count()


def test_phash_pairs_identical_payloads_and_kind_isolation(spark):
    """Identical payloads of the SAME kind pair at hamming 0; identical
    payloads of different kinds never pair (dedup is per modality); a
    heavily perturbed payload does not pair at the radius."""
    from pyspark.sql import functions as F

    from data_pipelines_using_llm_spark.operators import multimodal as MM

    text = "the quick brown fox jumps over the lazy dog " * 5
    other = "zzz qqq xxx xyzzy plugh grue lantern mailbox " * 5
    docs = spark.createDataFrame(
        [
            (0, text, len(text)),   # image
            (3, text, len(text)),   # image  -> pairs with 0 at hamming 0
            (1, text, len(text)),   # audio  -> same payload, other kind
            (6, other, len(other)),  # image -> far away, no pair
        ],
        "doc_id bigint, text string, n_chars bigint",
    )
    pairs = MM.phash_pairs(MM.media_table(docs)).collect()
    keyed = {(r["media_id_a"], r["media_id_b"]): r for r in pairs}
    assert (0, 3) in keyed and keyed[(0, 3)]["hamming"] == 0
    assert all(a != 1 and b != 1 for a, b in keyed)  # kind isolation
    assert (0, 6) not in keyed and (3, 6) not in keyed
