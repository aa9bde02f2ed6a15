"""Real multimodal kernels (operators/multimodal.py): PPM and WAV
round-trips, decode correctness against hand-computable cases,
malformed-payload errors, and the Spark operators end-to-end."""

import struct

import pytest

from microdata_rdf_streaming_parser_js_spark.operators.multimodal import (
    audio_features_kernel,
    encode_ppm,
    encode_wav,
    image_features_kernel,
    media_rows,
    parse_ppm,
    parse_wav,
    resize_kernel,
)


def test_ppm_roundtrip():
    rgb = bytes(range(2 * 3 * 3))
    data = encode_ppm(3, 2, rgb)
    assert parse_ppm(data) == (3, 2, rgb)


def test_ppm_parses_comments_and_whitespace():
    rgb = bytes(3)
    data = b"P6 # a comment\n# another\n 1\t1 \n255\n" + rgb
    assert parse_ppm(data) == (1, 1, rgb)


@pytest.mark.parametrize("bad", [b"", b"P5\n1 1\n255\n\0\0\0",
                                 b"P6\n2 2\n255\n\0\0\0",  # truncated raster
                                 b"P6\n1 1\n65535\n\0\0"])
def test_ppm_malformed_raises(bad):
    with pytest.raises(ValueError):
        parse_ppm(bad)


def test_image_features_solid_color():
    # solid mid-gray: every grid luma equals the mean -> no bit set;
    # channel means are exactly 128/255
    rgb = bytes([128]) * (4 * 4 * 3)
    w, h, c, phash, feats = image_features_kernel(encode_ppm(4, 4, rgb))
    assert (w, h, c) == (4, 4, 3)
    assert phash == "0" * 16
    assert feats[0] == feats[1] == feats[2] == round(128 / 255, 6)


def test_image_phash_top_bottom_split():
    # top half white, bottom half black -> top 32 grid cells above the
    # mean -> phash = 32 ones then 32 zeros
    rgb = bytes([255]) * (8 * 4 * 3) + bytes([0]) * (8 * 4 * 3)
    _, _, _, phash, _ = image_features_kernel(encode_ppm(8, 8, rgb))
    assert phash == "ffffffff00000000"


def test_resize_solid_and_dims():
    rgb = bytes([7, 8, 9]) * (5 * 3)
    out = resize_kernel(encode_ppm(5, 3, rgb), 4, 2)
    w, h, raster = parse_ppm(out)
    assert (w, h) == (4, 2)
    assert raster == bytes([7, 8, 9]) * 8


def test_resize_identity():
    rgb = bytes(((x * 3 + y * 5 + c) % 256) for y in range(4) for x in range(6)
                for c in range(3))
    src = encode_ppm(6, 4, rgb)
    assert parse_ppm(resize_kernel(src, 6, 4)) == (6, 4, rgb)


def test_wav_roundtrip_and_duration():
    samples = [0, 100, -100, 32767, -32768] * 160  # 800 samples
    data = encode_wav(16000, samples)
    rate, n_ch, bits, got = parse_wav(data)
    assert (rate, n_ch, bits) == (16000, 1, 16)
    assert got == samples
    rate2, dur, fp = audio_features_kernel(data)
    assert rate2 == 16000
    assert dur == 800 * 1000 // 16000  # exact PCM duration
    assert len(fp) == 12 and int(fp, 16) >= 0


def test_wav_chunk_walk_skips_unknown_chunks():
    samples = [5, -5] * 100
    data = encode_wav(8000, samples)
    # splice an unknown odd-sized chunk (word-aligned skip) before fmt
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = data[:12] + junk + data[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert parse_wav(spliced)[3] == samples


@pytest.mark.parametrize("bad", [b"", b"RIFF\x00\x00\x00\x00WAVX",
                                 b"RIFF\x04\x00\x00\x00WAVE"])
def test_wav_malformed_raises(bad):
    with pytest.raises(ValueError):
        parse_wav(bad)


def test_media_rows_are_real_payloads():
    rows = media_rows(30)
    kinds = {}
    for _i, _url, kind, payload, ctype, n in rows:
        kinds[kind] = kinds.get(kind, 0) + 1
        assert n == len(payload)
        if kind == "image":
            w, h, raster = parse_ppm(payload)
            assert len(raster) == w * h * 3
            assert ctype == "image/x-portable-pixmap"
        elif kind == "audio":
            rate, n_ch, bits, samples = parse_wav(payload)
            assert rate in (8000, 16000, 22050, 32000, 44100)
            assert samples and n_ch == 1 and bits == 16
    assert set(kinds) == {"image", "audio", "video"}


@pytest.mark.spark
def test_spark_operators_decode_real_media(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.multimodal import (
        decode_audio_features,
        decode_image_features,
        resize_images,
        synthesize_media,
    )

    media = synthesize_media(spark, n=24)
    imgs = decode_image_features(media).collect()
    assert len(imgs) == 8
    golden = {
        i: image_features_kernel(p)
        for i, _u, k, p, _c, _n in media_rows(24) if k == "image"
    }
    for r in imgs:
        w, h, c, ph, feats = golden[r["media_id"]]
        assert (r["width"], r["height"], r["channels"], r["phash"]) == (w, h, c, ph)
    resized = resize_images(media, 16, 16).collect()
    for r in resized:
        w, h, raster = parse_ppm(bytes(r["content"]))
        assert (w, h) == (16, 16) and len(raster) == 16 * 16 * 3
    auds = decode_audio_features(media).collect()
    assert len(auds) == 8
    for r in auds:
        assert r["sample_rate"] in (8000, 16000, 22050, 32000, 44100)
        assert r["duration_ms"] > 0 and len(r["fingerprint"]) == 12


def test_y4m_roundtrip_and_param_tolerance():
    from microdata_rdf_streaming_parser_js_spark.operators.multimodal import (
        encode_y4m,
        parse_y4m,
    )

    frames = [bytes((j * 3) % 256 for j in range(6 * 4 * 3)),
              bytes((j * 5) % 256 for j in range(6 * 4 * 3))]
    enc = encode_y4m(6, 4, 30000, 1001, frames)
    assert parse_y4m(enc) == (6, 4, 30000, 1001, frames)
    # unknown header tags and FRAME-level params are skipped per spec
    custom = (b"YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C444 XCOLORRANGE=FULL\n"
              b"FRAME Xfoo\n" + bytes(12))
    assert parse_y4m(custom)[:4] == (2, 2, 25, 1)
    assert len(parse_y4m(custom)[4]) == 1


@pytest.mark.parametrize(
    "bad",
    [
        b"RIFF....",                                   # wrong magic
        b"YUV4MPEG2 W2 H2 C444\n",                    # missing F
        b"YUV4MPEG2 W2 H2 F25:1 C420jpeg\n",          # unsupported colorspace
        b"YUV4MPEG2 W2 H2 F25:1 C444\n" + bytes(12),  # missing FRAME marker
        b"YUV4MPEG2 W2 H2 F25:1 C444\nFRAME\n" + bytes(5),  # truncated frame
    ],
)
def test_y4m_malformed_raises(bad):
    from microdata_rdf_streaming_parser_js_spark.operators.multimodal import parse_y4m

    with pytest.raises(ValueError):
        parse_y4m(bad)


def test_video_frames_kernel_sampling_and_timestamps():
    from microdata_rdf_streaming_parser_js_spark.operators.multimodal import (
        encode_y4m,
        video_frames_kernel,
    )

    w, h = 8, 8
    frames = [bytes((j + f * 7) % 256 for j in range(w * h * 3)) for f in range(5)]
    enc = encode_y4m(w, h, 30000, 1001, frames)
    out = video_frames_kernel(enc, every_nth=2)
    assert [(r[0], r[1]) for r in out] == [
        (0, 0), (2, (2 * 1000 * 1001) // 30000), (4, (4 * 1000 * 1001) // 30000)
    ]
    assert all(len(r[4]) == 16 for r in out)  # 64-bit phash hex


@pytest.mark.spark
def test_spark_decode_video_frames(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.multimodal import (
        decode_video_frames,
        media_rows,
        synthesize_media,
        video_frames_kernel,
    )

    media = synthesize_media(spark, n=24)
    got = sorted(
        (r["media_id"], r["frame_idx"], r["ts_ms"], r["width"], r["height"],
         r["frame_phash"])
        for r in decode_video_frames(media, every_nth=2).collect()
    )
    want = sorted(
        (i, idx, ts, w, h, ph)
        for i, _u, k, p, _c, _n in media_rows(24) if k == "video"
        for idx, ts, w, h, ph in video_frames_kernel(p, 2)
    )
    assert got == want


def test_y4m_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from microdata_rdf_streaming_parser_js_spark.operators.multimodal import (
        encode_y4m,
        parse_y4m,
    )

    @settings(max_examples=50, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=12),
        h=st.integers(min_value=1, max_value=10),
        fps=st.sampled_from([(1, 1), (25, 1), (30000, 1001)]),
        n_frames=st.integers(min_value=0, max_value=4),
        seed=st.integers(min_value=0, max_value=255),
    )
    def check(w, h, fps, n_frames, seed):
        frames = [
            bytes((j * 7 + f * 3 + seed) % 256 for j in range(3 * w * h))
            for f in range(n_frames)
        ]
        assert parse_y4m(encode_y4m(w, h, fps[0], fps[1], frames)) == (
            w, h, fps[0], fps[1], frames
        )

    check()
