"""Wave-17 invariants: scene-change detection flags exactly the
planted cuts, audio segmentation recovers exactly the planted silence
windows, and undecodable payloads are skipped, not fatal.
"""

import pytest

pytestmark = pytest.mark.spark


def test_scene_changes_flag_exactly_the_planted_cuts(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.multimodal import (
        _SCENE_COUNT,
        _SCENE_FRAMES,
        decode_video_frames,
        scene_changes,
        synthesize_scene_media,
    )

    media = synthesize_scene_media(spark, n_videos=6, n_audio=0)
    frames = decode_video_frames(media, every_nth=1)
    cuts = scene_changes(frames, threshold=13).collect()
    # cuts land exactly at scene starts: frame_idx = s * _SCENE_FRAMES
    want = {
        (mid, s * _SCENE_FRAMES)
        for mid in range(6)
        for s in range(1, _SCENE_COUNT)
    }
    assert {(r.media_id, r.frame_idx) for r in cuts} == want
    # and every cut is a big jump while consecutive within-scene
    # frames are near-identical
    all_d = scene_changes(frames, threshold=0).collect()
    within = [r.hamming for r in all_d if (r.media_id, r.frame_idx) not in want]
    across = [r.hamming for r in all_d if (r.media_id, r.frame_idx) in want]
    assert max(within) <= 2
    assert min(across) >= 13


def test_audio_segments_recover_planted_silence(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.multimodal import (
        active_segments,
        decode_audio_blocks,
        synthesize_scene_media,
    )

    media = synthesize_scene_media(spark, n_videos=0, n_audio=8)
    segs = active_segments(decode_audio_blocks(media)).collect()
    by_media = {}
    for r in segs:
        by_media.setdefault(r.media_id, []).append(r)
    assert set(by_media) == {1000 + i for i in range(8)}
    for mid, rows in by_media.items():
        i = mid - 1000
        s_block = 5 + (i * 7) % 30
        rows = sorted(rows, key=lambda r: r.seg_id)
        assert [(r.start_block, r.end_block) for r in rows] == [
            (0, s_block - 1),
            (s_block + 10, 48),
        ]
        assert [r.n_blocks for r in rows] == [s_block, 39 - s_block]


def test_decode_audio_blocks_skips_garbage(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.multimodal import (
        decode_audio_blocks,
    )

    rows = [(1, "u", "audio", bytearray(b"not a wav"), "audio/wav", 9)]
    df = spark.createDataFrame(
        rows,
        "media_id long, url string, kind string, content binary, "
        "content_type string, n_bytes long",
    )
    assert decode_audio_blocks(df).count() == 0


def test_active_segments_rejects_bad_threshold(spark):
    from microdata_rdf_streaming_parser_js_spark.operators.multimodal import (
        active_segments,
    )

    df = spark.createDataFrame(
        [(1, 0, 10)], "media_id long, block_idx long, energy long"
    )
    with pytest.raises(ValueError):
        active_segments(df, num=1, den=0)
