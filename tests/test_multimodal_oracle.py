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


def test_decoders_are_real_not_stubs():
    """Round 3's decode seam was a NotImplementedError stub; the
    decoders now genuinely parse container headers — a foreign
    payload is a typed decode error, not a stub marker."""
    for fn in (mm.decode_image, mm.decode_audio, mm.decode_video):
        with pytest.raises(ValueError):
            fn(b"payload that is no known container")


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


def test_codec_round_trips():
    """Pure-Python container codecs: what encode writes, decode reads
    back exactly — including the AVI dwScale/dwRate rational that
    keeps duration free of frame-interval round-off."""
    from gcp_dbt_data_engineering_spark.operators.multimodal import (
        decode_audio,
        decode_image,
        decode_video,
        encode_avi,
        encode_bmp,
        encode_wav,
    )

    img = decode_image(encode_bmp(641, 353, b"pixeldata"))
    assert img == {"width": 641, "height": 353, "channels": 3}

    wav = decode_audio(encode_wav(11000, 48_000, b"pcm"))
    assert wav["channels"] == 1 and wav["sample_rate"] == 11000
    assert wav["n_samples"] == 48_000
    assert wav["duration_s"] == 48_000 / 11000

    avi = decode_video(encode_avi(320, 240, 241, 24, b"frames"))
    assert avi == {
        "width": 320,
        "height": 240,
        "n_frames": 241,
        "duration_s": 241 / 24,
    }


def test_codec_rejects_foreign_payloads():
    import pytest

    from gcp_dbt_data_engineering_spark.operators.multimodal import (
        decode_audio,
        decode_image,
        decode_video,
        encode_bmp,
        encode_wav,
    )

    with pytest.raises(ValueError):
        decode_image(b"not an image at all, clearly")
    with pytest.raises(ValueError):
        decode_audio(encode_bmp(4, 4, b""))
    with pytest.raises(ValueError):
        decode_video(encode_wav(8000, 10, b""))


def test_codec_round_trip_fuzz():
    """Randomized round-trips: whatever encode writes, decode reads
    back, across the parameter space (dims up to 4k, rates, frame
    counts, arbitrary body bytes including RIFF-like noise)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=150, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=4096),
        h=st.integers(min_value=1, max_value=4096),
        sr=st.integers(min_value=1, max_value=192_000),
        ns=st.integers(min_value=0, max_value=10**7),
        nf=st.integers(min_value=0, max_value=10**6),
        fps=st.integers(min_value=1, max_value=120),
        body=st.binary(max_size=64),
    )
    def check(w, h, sr, ns, nf, fps, body):
        img = mm.decode_image(mm.encode_bmp(w, h, body))
        assert (img["width"], img["height"], img["channels"]) == (w, h, 3)
        wav = mm.decode_audio(mm.encode_wav(sr, ns, body))
        assert (wav["sample_rate"], wav["n_samples"]) == (sr, ns)
        assert wav["duration_s"] == ns / sr
        avi = mm.decode_video(mm.encode_avi(w, h, nf, fps, body))
        assert (avi["width"], avi["height"], avi["n_frames"]) == (w, h, nf)
        assert avi["duration_s"] == nf / fps

    check()
