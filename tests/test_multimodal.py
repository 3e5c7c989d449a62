# -*- coding: utf-8 -*-
"""Multimodal plumbing: resize and frame-sample Arrow UDFs."""

import os

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _media(spark, n=6):
    from rdf_converter_spark.operators.multimodal import documents_as_media

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    return documents_as_media(docs.limit(n))


def test_resize_shapes(spark):
    from rdf_converter_spark.operators.multimodal import resize_images

    rows = resize_images(_media(spark), width=8, height=8).collect()
    assert rows and all(len(r["resized"]) == 64 for r in rows)
    assert all(r["width"] == 8 and r["height"] == 8 for r in rows)


def test_frame_sampling_fanout(spark):
    from rdf_converter_spark.operators.multimodal import sample_frames

    media = _media(spark, n=5)
    rows = sample_frames(media, n_frames=4).collect()
    assert len(rows) == 5 * 4
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r["frame_no"])
    assert all(sorted(v) == [0, 1, 2, 3] for v in per.values())


def test_codec_slots_are_stubbed(spark):
    import pytest

    from rdf_converter_spark.operators.multimodal import (
        resize_images, sample_frames,
    )

    for op in (resize_images, sample_frames):
        with pytest.raises(Exception) as exc:
            op(_media(spark, n=1), use_codec=True).collect()
        assert "NotImplementedError" in str(exc.value) or isinstance(
            exc.value, NotImplementedError
        )
