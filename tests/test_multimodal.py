"""Multimodal plumbing tests: schema, Arrow-batched decode via
mapInPandas, frame sampling, and the real-codec stub seam."""

from __future__ import annotations

import pytest

from healthcare_aihw_etl_pipeline_spark.operators.multimodal import (
    _decode_one,
    decode_media,
    encode_fake_media,
    frame_sample,
    make_fake_media,
)


def test_decode_media_features(spark):
    media = make_fake_media(spark, n=30)
    feats = decode_media(media, batch_partitions=4).collect()
    assert len(feats) == 30
    by_id = {r.media_id: r for r in feats}
    # deterministic payload → deterministic mean intensity
    r0 = by_id[0]
    w, h, fr, mean = _decode_one(encode_fake_media(0, 0, r0.width, r0.height, r0.n_frames))
    assert r0.mean_intensity == pytest.approx(mean)
    assert all(r.width >= 8 and r.height >= 6 for r in feats)
    assert all(r.n_bytes > 11 for r in feats)


def test_frame_sample_only_videos(spark):
    media = make_fake_media(spark, n=30)
    frames = frame_sample(media, every_nth=2).collect()
    video_ids = {r.media_id for r in media.where("kind = 'video'").collect()}
    assert {r.media_id for r in frames} <= video_ids
    # every kept frame has the right byte length
    feats = {r.media_id: r for r in decode_media(media.where("kind = 'video'")).collect()}
    for fr in frames:
        f = feats[fr.media_id]
        assert len(fr.frame_bytes) == f.width * f.height
        assert fr.frame_idx % 2 == 0


def test_real_codec_seam_on_wellformed_png():
    """The seam contract exercised with a VALID real PNG (encoded by the
    stdlib encoder, not by the decoding library — no circularity):
    without Pillow a well-formed image raises NotImplementedError AT THE
    SEAM; with Pillow it decodes. Either way the test reports exactly
    which codecs this container exercised via codec_support()."""
    from healthcare_aihw_etl_pipeline_spark.operators import multimodal
    from healthcare_aihw_etl_pipeline_spark.operators.multimodal import (
        codec_support,
        encode_png_gray,
    )

    png = encode_png_gray(4, 3, bytes(range(12)))
    support = codec_support()
    assert support["fakev1"] is True
    assert support["wav"] is True  # stdlib wave decode, always on
    assert support["mp4"] is False
    if not support["png"]:
        with pytest.raises(NotImplementedError):
            _decode_one(png)
    else:
        w, h, fr, mean = _decode_one(png)
        assert (w, h, fr) == (4, 3, 1)
        assert abs(mean - sum(range(12)) / 12.0) < 1e-9
    # an unrecognized container (RIFF but not WAVE) stays at the seam
    with pytest.raises(NotImplementedError):
        _decode_one(b"RIFF" + b"\x00" * 32)
    # a RIFF/WAVE header with garbage innards fails loudly, not silently
    with pytest.raises(Exception):
        _decode_one(b"RIFF\x00\x00\x00\x00WAVE" + b"\x00" * 24)
    # junk after a PNG magic fails in SOME way on both paths
    with pytest.raises(Exception):
        _decode_one(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)


def test_pillow_decode_real_png(spark):
    """Real-codec path (skip-gated like the TWS protobuf pair): a
    stdlib-encoded PNG decodes through Pillow inside the same
    mapInPandas stage and contract as FAKEv1 — dims, one frame,
    grayscale mean intensity — and a Pillow-encoded PNG agrees, so the
    two encoders cross-check each other. The skip reason names the
    codecs that could not be exercised in this container."""
    from healthcare_aihw_etl_pipeline_spark.operators.multimodal import (
        codec_support,
        encode_png_gray,
    )

    support = codec_support()
    untested = sorted(k for k, ok in support.items() if not ok)
    pil_image = pytest.importorskip(
        "PIL.Image",
        reason=(
            "Pillow not installed in this container; codecs NOT "
            f"exercised here: {untested} (fakev1 always tested; the "
            "seam contract on well-formed PNG is still asserted by "
            "test_real_codec_seam_on_wellformed_png)"
        ),
    )
    import io

    from healthcare_aihw_etl_pipeline_spark.operators.multimodal import MEDIA_SCHEMA

    stdlib_png = encode_png_gray(8, 6, bytes([100]) * 48)
    img = pil_image.new("L", (8, 6), color=100)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    df = spark.createDataFrame(
        [
            (1, "image", bytearray(stdlib_png), ("test", "image/png")),
            (2, "image", bytearray(buf.getvalue()), ("test", "image/png")),
        ],
        schema=MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in decode_media(df).collect()}
    for r in rows.values():
        assert (r.width, r.height, r.n_frames) == (8, 6, 1)
        assert abs(r.mean_intensity - 100.0) < 1e-9


def test_truncated_blob_raises():
    with pytest.raises(ValueError):
        _decode_one(b"FAKE\x00")


def test_resize_media_roundtrip(spark):
    """Resize halves dimensions, stays decodable (composes with
    decode_media), and the nearest-neighbor gather preserves exact
    source pixels (top-left pixel of every frame survives)."""
    from healthcare_aihw_etl_pipeline_spark.operators.multimodal import (
        decode_media,
        encode_fake_media,
        make_fake_media,
        resize_media,
    )

    media = make_fake_media(spark, n=12)
    resized = resize_media(media, out_w=4, out_h=3)
    feats = {r.media_id: r for r in decode_media(resized).collect()}
    assert feats, "no non-audio media produced"
    for r in feats.values():
        assert (r.width, r.height) == (4, 3)
    # exact pixel check on one constructed image
    blob = encode_fake_media(999, kind=0, width=8, height=8)
    one = spark.createDataFrame(
        [(999, "image", bytearray(blob))], "media_id long, kind string, content binary"
    )
    out = resize_media(one, out_w=2, out_h=2).collect()[0]
    src = bytes(blob)[11:]
    got = bytes(out.content)[11:]
    # nearest-neighbor with integer grid: out[y,x] = src[(y*8)//2? -> (y*h)//out_h]
    expect = bytes(
        src[((y * 8) // 2) * 8 + ((x * 8) // 2)] for y in range(2) for x in range(2)
    )
    assert got == expect


def test_wav_pcm16_roundtrip_exact_features():
    """The hand-rolled RIFF encoder and the stdlib-wave decoder agree on
    every feature, exactly — including a full-scale -32768 sample (the
    int16 edge whose abs() overflows int16 arithmetic done naively)."""
    from healthcare_aihw_etl_pipeline_spark.operators.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    samples = [0, 1, -1, 32767, -32768, 12345, -12345]
    blob = encode_wav_pcm16(samples, 8000)
    sr, ch, n, peak, sumsq = decode_wav_pcm16(blob)
    assert (sr, ch, n) == (8000, 1, len(samples))
    assert peak == 32768
    assert sumsq == sum(s * s for s in samples)
    # stereo: frames interleave, n counts every sample
    blob2 = encode_wav_pcm16([1, 2, 3, 4], 44100, n_channels=2)
    sr2, ch2, n2, _, _ = decode_wav_pcm16(blob2)
    assert (sr2, ch2, n2) == (44100, 2, 4)


def test_decode_one_handles_wav():
    """decode_media's per-blob decoder is now total over image+audio:
    WAV maps to (n_channels, sample_rate, n_samples, RMS); only video
    remains at the NotImplementedError seam."""
    import math

    from healthcare_aihw_etl_pipeline_spark.operators.multimodal import (
        codec_support,
        encode_wav_pcm16,
    )

    samples = [100, -200, 300]
    w, h, fr, mean = _decode_one(encode_wav_pcm16(samples, 16000))
    assert (w, h, fr) == (1, 16000, 3)
    assert mean == pytest.approx(
        math.sqrt(sum(s * s for s in samples) / len(samples))
    )
    assert codec_support()["wav"] is True


def test_audio_features_spark_path(spark):
    """The Arrow mapInPandas audio stage: exact integer features per
    clip, matching a driver-side recomputation."""
    import math

    from healthcare_aihw_etl_pipeline_spark.operators.multimodal import (
        audio_features,
        encode_wav_pcm16,
    )

    clips = {
        mid: [((mid * 31 + i * 17) % 65536) - 32768 for i in range(50 + mid)]
        for mid in range(6)
    }
    df = spark.createDataFrame(
        [(mid, encode_wav_pcm16(s, 8000)) for mid, s in clips.items()],
        "media_id long, content binary",
    )
    got = {r.media_id: r for r in audio_features(df, batch_partitions=3).collect()}
    assert set(got) == set(clips)
    for mid, s in clips.items():
        r = got[mid]
        assert r.n_samples == len(s)
        assert r.duration_ms == len(s) * 1000 // 8000
        assert r.peak == max(abs(x) for x in s)
        assert r.sumsq == sum(x * x for x in s)
        assert r.rms_q == int(
            math.floor(math.sqrt(r.sumsq / r.n_samples) * 1000 + 0.5)
        )


def test_avi_rgb24_roundtrip_and_conventions():
    """The hand-rolled RIFF/AVI encoder and the independent RIFF-walker
    decoder agree bit-for-bit on top-down RGB24 frames — and each
    on-disk DIB convention (BGR order, bottom-up rows, stride padding)
    is individually load-bearing: tampering with the blob at the spot a
    lazy decoder would get wrong changes the decoded frames."""
    import numpy as np

    from healthcare_aihw_etl_pipeline_spark.operators.multimodal import (
        codec_support,
        decode_avi_rgb24,
        encode_avi_rgb24,
    )

    assert codec_support()["avi"] is True
    rng = np.random.default_rng(11)
    w, h = 6, 5  # width 6 -> stride 20 exercises 4-byte row padding
    frames = [
        rng.integers(0, 256, w * h * 3, dtype=np.uint8).tobytes()
        for _ in range(4)
    ]
    blob = encode_avi_rgb24(frames, w, h, fps=10)
    gw, gh, gfps, gn, got = decode_avi_rgb24(blob)
    assert (gw, gh, gfps, gn) == (w, h, 10, 4)
    assert got == frames
    # frame bytes on disk differ from the logical frames (BGR+flip+pad),
    # so a decoder that skips the normalization cannot pass the above
    assert frames[0] not in blob
    # 1x1 and non-padded widths round-trip too
    assert decode_avi_rgb24(encode_avi_rgb24([b"\x01\x02\x03"], 1, 1))[4] == [
        b"\x01\x02\x03"
    ]
    f8 = [bytes(range(8 * 2 * 3))]  # width 8 -> stride 24, no padding
    assert decode_avi_rgb24(encode_avi_rgb24(f8, 8, 2))[4] == f8


def test_avi_compressed_seam():
    """biCompression != 0 raises at the libav seam instead of decoding
    garbage; a RIFF that is neither WAVE nor AVI stays at the seam."""
    import struct

    import pytest as _pytest

    from healthcare_aihw_etl_pipeline_spark.operators.multimodal import (
        decode_avi_rgb24,
        encode_avi_rgb24,
    )

    blob = bytearray(encode_avi_rgb24([bytes(12)], 2, 2))
    i = blob.index(b"strf") + 8  # strf data start
    blob[i + 16 : i + 20] = struct.pack("<I", 0x34363248)  # 'H264'
    with _pytest.raises(NotImplementedError):
        decode_avi_rgb24(bytes(blob))
    with _pytest.raises(ValueError):
        decode_avi_rgb24(b"RIFF" + b"\x00" * 40)


def test_video_features_spark_path(spark):
    """The Arrow mapInPandas video stage: exact integer moments per
    media matching a driver-side recomputation, with the weighted
    features sensitive to flip/channel/frame-order decode bugs."""
    import numpy as np

    from healthcare_aihw_etl_pipeline_spark.operators.multimodal import (
        encode_avi_rgb24,
        video_features,
    )

    w, h = 6, 5
    rng = np.random.default_rng(23)
    vids = {
        mid: [
            rng.integers(0, 256, w * h * 3, dtype=np.uint8)
            for _ in range(2 + mid % 3)
        ]
        for mid in range(5)
    }
    df = spark.createDataFrame(
        [
            (mid, encode_avi_rgb24([f.tobytes() for f in fs], w, h))
            for mid, fs in vids.items()
        ],
        "media_id long, content binary",
    )
    got = {r.media_id: r for r in video_features(df, batch_partitions=2).collect()}
    assert set(got) == set(vids)
    for mid, fs in vids.items():
        r = got[mid]
        arrs = [f.astype(np.int64).reshape(h, w, 3) for f in fs]
        fsums = [int(a.sum()) for a in arrs]
        assert (r.width, r.height, r.n_frames) == (w, h, len(fs))
        assert r.lum_sum == sum(fsums)
        assert r.wrow_sum == sum(
            int((a * (np.arange(1, h + 1)[:, None, None])).sum())
            for a in arrs
        )
        assert r.wchan_sum == sum(
            int((a * np.array([1, 2, 3])[None, None, :]).sum())
            for a in arrs
        )
        assert r.motion_sum == sum(
            abs(b - a) for a, b in zip(fsums, fsums[1:])
        )
