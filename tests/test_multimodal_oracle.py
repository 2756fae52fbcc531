"""Multimodal plumbing vs the DuckDB oracle at sf0.01: the
mapInPandas metadata extractor and the row-expanding frame sampler,
plus the decode-stub contract."""

from __future__ import annotations

import pytest

from gcp_dbt_data_engineering_spark.operators import multimodal as mm

from .oracle_harness import compare

SF = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(mm.SPECS))
def test_multimodal_oracle_sf001(spark, name):
    spec = mm.SPECS[name]
    res = compare(spec.spark(spark, SF), spec.oracle, SF)
    assert res["match"], res


def test_decode_stubs_are_stubs():
    for fn in (mm.decode_image, mm.decode_audio, mm.decode_video):
        with pytest.raises(NotImplementedError):
            fn(b"payload")


def test_meta_covers_all_assets_and_types(spark):
    rows = mm.SPECS["multimodal_meta"].spark(spark, SF).collect()
    assert len(rows) == 500
    types = {r.media_type for r in rows}
    assert types == {"image", "audio", "video"}
    for r in rows:
        if r.media_type == "audio":
            assert r.sample_rate >= 8000 and r.duration_s > 0
        if r.media_type == "video":
            assert r.n_frames >= 1


def test_frame_sample_counts(spark):
    meta = {
        r.asset_id: r.n_frames
        for r in mm.SPECS["multimodal_meta"].spark(spark, SF).collect()
        if r.media_type == "video"
    }
    frames = mm.SPECS["multimodal_frame_sample"].spark(spark, SF).collect()
    per_asset: dict[int, int] = {}
    for r in frames:
        per_asset[r.asset_id] = per_asset.get(r.asset_id, 0) + 1
    assert set(per_asset) == set(meta)
    for aid, n in per_asset.items():
        expected = (meta[aid] + mm.FRAME_STRIDE - 1) // mm.FRAME_STRIDE
        assert n == expected
