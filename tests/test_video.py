"""Video tier: real RIFF/AVI codec roundtrips, header decode, seek-based
frame sampling into the image tier, and triage features — every decode
path checked against an exact local recompute of the synthesized
frames (same discipline as the audio tier in test_media_and_retrieval)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from udacity_data_engineering_capstone_project_spark.operators.multimodal import decode_png_pixels
from udacity_data_engineering_capstone_project_spark.operators.video import (
    _sample_indices,
    decode_video_meta,
    encode_avi,
    parse_avi_meta,
    sample_video_frames,
    synthesize_avi,
    synthetic_frames,
    video_features,
)


def test_avi_roundtrip_exact():
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, size=(4, 6, 8, 3), dtype=np.uint8)
    b = encode_avi(frames, fps=25)
    assert parse_avi_meta(b) == (8, 6, 40_000, 4)
    from udacity_data_engineering_capstone_project_spark.operators.video import (
        _dib_to_frame,
        _frame_chunks,
    )

    chunks = _frame_chunks(b)
    assert len(chunks) == 4
    for i, (off, ln, comp) in enumerate(chunks):
        assert not comp  # DIB chunks are uncompressed
        np.testing.assert_array_equal(_dib_to_frame(b[off : off + ln], 8, 6), frames[i])


def test_avi_odd_width_row_padding():
    # width 5 -> 15-byte rows padded to 16; the unpadder must strip it
    frames = (np.arange(2 * 3 * 5 * 3) % 256).astype(np.uint8).reshape(2, 3, 5, 3)
    b = encode_avi(frames, fps=10)
    from udacity_data_engineering_capstone_project_spark.operators.video import (
        _dib_to_frame,
        _frame_chunks,
    )

    (off0, ln0, _c0), (off1, ln1, _c1) = _frame_chunks(b)
    assert ln0 == 16 * 3  # padded stride x height
    np.testing.assert_array_equal(_dib_to_frame(b[off1 : off1 + ln1], 5, 3), frames[1])


def test_parse_avi_rejects_non_avi():
    with pytest.raises(ValueError):
        parse_avi_meta(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        parse_avi_meta(b"\x89PNG")


def test_sample_indices_even_and_bounded():
    assert _sample_indices(1, 4) == [0]
    assert _sample_indices(9, 3) == [0, 4, 8]
    assert _sample_indices(3, 8) == [0, 1, 2]  # never more than n_frames
    assert _sample_indices(0, 4) == []


def test_decode_video_meta_matches_generator(spark):
    ids = spark.range(20)
    meta = decode_video_meta(synthesize_avi(ids, "id", fps=10), "id")
    for r in meta.collect():
        exp = synthetic_frames(r["id"])
        assert (r["n_frames"], r["height"], r["width"]) == exp.shape[:3]
        assert r["fps"] == 10.0
        assert r["duration_ms"] == exp.shape[0] * 100


def test_sampled_frames_flow_into_image_tier(spark):
    """Sampled frames are valid PNGs whose pixels equal the exact
    source frames — ties the AVI codec to the PNG codec end-to-end."""
    ids = spark.range(6)
    sampled = sample_video_frames(synthesize_avi(ids, "id"), "id", n_samples=3)
    rows = sampled.collect()
    # every id contributes min(3, n_frames) rows
    per_id: dict[int, int] = {}
    for r in rows:
        per_id[r["id"]] = per_id.get(r["id"], 0) + 1
        src = synthetic_frames(r["id"])
        w, h, ch, px = decode_png_pixels(bytes(r["payload"]))
        assert (w, h, ch) == (src.shape[2], src.shape[1], 3)
        np.testing.assert_array_equal(
            np.asarray(px, dtype=np.uint8).reshape(h, w, 3), src[r["frame_index"]]
        )
    for rid, cnt in per_id.items():
        assert cnt == min(3, synthetic_frames(rid).shape[0])


def test_video_features_match_local_recompute(spark):
    ids = spark.range(10)
    feats = video_features(synthesize_avi(ids, "id"), "id", max_frames=4)
    for r in feats.collect():
        src = synthetic_frames(r["id"]).astype(np.float64)
        idxs = _sample_indices(src.shape[0], 4)
        sub = src[idxs]
        assert r["n_frames"] == src.shape[0]
        assert r["mean_brightness"] == pytest.approx(sub.mean(), abs=1e-6)
        exp_motion = np.abs(np.diff(sub, axis=0)).mean() if len(sub) > 1 else 0.0
        assert r["motion"] == pytest.approx(exp_motion, abs=1e-6)


def test_video_ops_null_or_skip_on_garbage(spark):
    df = spark.range(3).withColumn("payload", F.encode(F.lit("not a video"), "UTF-8"))
    assert sample_video_frames(df, "id").count() == 0
    feats = video_features(df, "id").collect()
    assert all(r["n_frames"] is None for r in feats)


def test_video_ops_survive_truncated_movi(spark):
    """A payload whose headers parse but whose frame bytes are cut off
    must skip/null the ROW, not fail the Spark task (round-3 advice)."""
    from udacity_data_engineering_capstone_project_spark.operators.video import encode_avi

    frames = (np.arange(2 * 4 * 6 * 3, dtype=np.uint8)).reshape(2, 4, 6, 3)
    good = encode_avi(frames)
    truncated = good[: len(good) - 10]  # cut into the last frame chunk
    df = spark.createDataFrame(
        [(0, bytearray(good)), (1, bytearray(truncated))], ["id", "payload"]
    )
    sampled = sample_video_frames(df, "id", n_samples=2).collect()
    assert {r["id"] for r in sampled} == {0}  # bad row skipped, good row intact
    feats = {r["id"]: r for r in video_features(df, "id").collect()}
    assert feats[0]["n_frames"] == 2
    assert feats[1]["mean_brightness"] is None


# ---------------------------------------------------------------------------
# Image perceptual hash (dHash) — lives here with the rest of the
# binary-payload tier tests.

from udacity_data_engineering_capstone_project_spark.operators.multimodal import (  # noqa: E402
    encode_png,
    image_dhash,
    image_near_dup_pairs,
)


def _gradient_png(width=64, height=64, invert=False, noise_seed=None):
    x = np.arange(width) * 2
    if invert:
        x = 255 - x
    img = np.tile(x, (height, 1)).astype(np.int64)
    if noise_seed is not None:
        rng = np.random.default_rng(noise_seed)
        img = img + rng.integers(-1, 2, size=img.shape)
    img = np.clip(img, 0, 255).astype(np.uint8)
    rgb = np.repeat(img[:, :, None], 3, axis=2)
    return encode_png(width, height, rgb.tobytes(), 3)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_image_dhash_near_dup_and_far(spark):
    rows = [
        (0, _gradient_png()),
        (1, _gradient_png(noise_seed=3)),        # near-dup of 0
        (2, _gradient_png(invert=True)),         # visually opposite
        (3, b"not an image"),                    # undecodable -> null
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    hashes = {r["id"]: r["dhash"] for r in image_dhash(df, "id").collect()}
    assert hashes[3] is None
    assert _ham(hashes[0], hashes[1]) <= 3
    assert _ham(hashes[0], hashes[2]) > 30

    pairs = image_near_dup_pairs(image_dhash(df, "id"), "id", max_hamming=3)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(0, 1)}


def test_image_dhash_deterministic(spark):
    df = spark.createDataFrame([(7, _gradient_png())], "id long, payload binary")
    a = image_dhash(df, "id").collect()[0]["dhash"]
    b = image_dhash(df, "id").collect()[0]["dhash"]
    assert a == b and isinstance(a, int)


def test_video_frames_to_image_dedup_pipeline(spark):
    """End-to-end multimodal flow: sample frames from videos, then
    screen the frame images for visual near-dups — consecutive frames
    of the smooth synthetic videos hash close together."""
    frames = sample_video_frames(synthesize_avi(spark.range(4), "id"), "id", n_samples=2)
    keyed = frames.select(
        (F.col("id") * 1000 + F.col("frame_index")).alias("fid"), "payload"
    )
    hashed = image_dhash(keyed, "fid")
    assert hashed.filter(F.col("dhash").isNull()).count() == 0


def test_mp4_container_roundtrip(spark):
    """encode_mp4 -> parse_mp4_meta/mp4_sample_table roundtrip: brand,
    codec fourcc, 16.16 tkhd dimensions, mvhd timescale/duration,
    stsz count, and the exact (offset, size) of every sample — the
    seek table a codec plugin would consume."""
    from udacity_data_engineering_capstone_project_spark.operators.video import (
        encode_mp4,
        mp4_sample_table,
        parse_mp4_meta,
    )

    sizes = [100, 250, 75, 300]
    b = encode_mp4(320, 240, sizes, timescale=600, sample_delta=20)
    m = parse_mp4_meta(b)
    assert m["brand"] == "isom" and m["codec"] == "avc1"
    assert (m["width"], m["height"]) == (320, 240)
    assert m["timescale"] == 600 and m["duration"] == 4 * 20
    assert m["n_samples"] == 4

    table = mp4_sample_table(b)
    assert [s for _, s in table] == sizes
    # offsets are consecutive within the single chunk and inside mdat
    for (o1, s1), (o2, _) in zip(table, table[1:]):
        assert o2 == o1 + s1
    # first sample's first byte matches the deterministic generator
    assert b[table[0][0]] == 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="not an ISO BMFF"):
        parse_mp4_meta(b"RIFF0000AVI ")
    with _pytest.raises(ValueError, match="moov"):
        parse_mp4_meta(b[: len(b) // 4])  # ftyp+partial mdat only


def test_decode_mp4_meta_stage(spark):
    """decode_mp4_meta: Arrow-batched container decode over a binary
    column; corrupt payloads yield null rows, never task failures; the
    H.264 frame decode is the documented NotImplementedError
    boundary."""
    import pytest as _pytest

    from udacity_data_engineering_capstone_project_spark.operators.video import (
        decode_mp4_meta,
        encode_mp4,
        sample_mp4_frames,
    )

    rows = [
        (1, encode_mp4(64, 48, [10] * 25, timescale=1000, sample_delta=40)),
        (2, encode_mp4(128, 96, [7, 7], timescale=100, sample_delta=50,
                       codec=b"hvc1", brand=b"mp42")),
        (3, b"not a video at all"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id bigint, payload binary")
    got = {r["id"]: r for r in decode_mp4_meta(df, "id").collect()}
    assert (got[1]["width"], got[1]["height"]) == (64, 48)
    assert got[1]["codec"] == "avc1" and got[1]["brand"] == "isom"
    assert got[1]["fps"] == 25.0 and got[1]["duration_ms"] == 1000
    assert got[2]["codec"] == "hvc1" and got[2]["brand"] == "mp42"
    assert got[2]["n_samples"] == 2 and got[2]["duration_ms"] == 1000
    assert got[3]["width"] is None and got[4]["codec"] is None

    with _pytest.raises(NotImplementedError, match="codec"):
        sample_mp4_frames(df, "id")


def test_sample_mp4_frames_pluggable_backend(spark):
    """sample_mp4_frames (r12): the codec is a pluggable seam — the
    default backend requires PyAV (NotImplementedError at plan time in
    this container, pinned above), but the Spark-side plumbing is real
    and runs end-to-end with any injected backend: mapInPandas schema,
    per-row error guard (corrupt payload -> zero rows, not a task
    kill), PNG re-encode, and the output rows flowing straight into
    the image tier (`decode_image_meta`)."""
    import numpy as np

    from udacity_data_engineering_capstone_project_spark.operators.multimodal import (
        decode_image_meta,
    )
    from udacity_data_engineering_capstone_project_spark.operators.video import (
        sample_mp4_frames,
    )

    def fake_backend(b: bytes, n_samples: int):
        # deterministic stand-in for an H.264 decode: payload
        # "FAKE<n>" yields n flat rgb24 frames at 8x6, 40 ms apart
        if not b.startswith(b"FAKE"):
            raise ValueError("not a fake mp4")
        n = min(b[4], n_samples)
        return [
            (idx, idx * 40, 8, 6,
             np.full((6, 8, 3), idx * 10, dtype=np.uint8).tobytes())
            for idx in range(n)
        ]

    rows = [
        (1, b"FAKE" + bytes([3])),
        (2, b"FAKE" + bytes([1])),
        (3, b"not a video"),   # backend raises -> zero rows
        (4, None),             # NULL payload -> zero rows
    ]
    df = spark.createDataFrame(rows, "id bigint, payload binary")
    out = sample_mp4_frames(df, "id", n_samples=4, frame_backend=fake_backend)
    got = sorted(
        (r["id"], r["frame_index"], r["t_ms"], r["width"], r["height"])
        for r in out.collect()
    )
    assert got == [
        (1, 0, 0, 8, 6), (1, 1, 40, 8, 6), (1, 2, 80, 8, 6),
        (2, 0, 0, 8, 6),
    ]
    # the PNG payloads are image-tier citizens: decode round-trips
    meta = decode_image_meta(
        out.select(F.col("frame_index").alias("img_id"), "payload"),
        "img_id",
    ).collect()
    assert all((m["width"], m["height"]) == (8, 6) for m in meta)
    assert all(m["format"] == "png" for m in meta)


def test_mp4_parser_hostile_nested_shapes(spark):
    """Adversarial container shapes the random fuzz can't construct
    (review findings, r6): an empty mvhd at end-of-buffer must raise
    ValueError (not IndexError — mapInPandas catches only ValueError/
    struct.error), a ~100-byte stsz/stsc bomb must be rejected before
    allocating billions of list elements, and an undersized largesize
    must not yield a box whose payload starts beyond its end."""
    import struct as s

    import pytest as _pytest

    from udacity_data_engineering_capstone_project_spark.operators.video import (
        encode_mp4,
        mp4_sample_table,
        parse_mp4_meta,
    )

    def box(fourcc, payload):
        return s.pack(">I", len(payload) + 8) + fourcc + payload

    ftyp = box(b"ftyp", b"isom" + s.pack(">I", 0x200))

    # empty mvhd ending the buffer: version byte would index b[len(b)]
    empty_mvhd = ftyp + box(b"moov", box(b"mvhd", b""))
    with _pytest.raises(ValueError, match="mvhd"):
        parse_mp4_meta(empty_mvhd)

    # stsz bomb: sample_count=0xFFFFFFFF with fixed size 1 — the walk
    # must reject it (count > payload bytes), not allocate 4B entries.
    # Patch the located stsz fields (fixed at +8, count at +12 from
    # the fourcc) — a byte-pattern replace could hit another box.
    good = encode_mp4(32, 32, [5, 5, 5])
    i = good.index(b"stsz")
    bomb = (
        good[: i + 4] + s.pack(">I", 0)  # version/flags
        + s.pack(">II", 1, 0xFFFFFFFF) + good[i + 16 :]
    )
    with _pytest.raises(ValueError):
        mp4_sample_table(bomb)

    # stsc gap bomb: first_chunk run spanning ~2^32 chunks
    j = good.index(b"stsc")
    bomb2 = (
        good[: j + 4] + s.pack(">I", 0)
        + s.pack(">IIII", 1, 0xFFFFFFF0, 3, 1) + good[j + 24 :]
    )
    with _pytest.raises(ValueError):
        mp4_sample_table(bomb2)

    # largesize < 16: box header lies about covering itself
    tiny_large = ftyp + s.pack(">I", 1) + b"moov" + s.pack(">Q", 10) + b"\x00" * 8
    with _pytest.raises(ValueError):
        parse_mp4_meta(tiny_large)


def test_mjpg_avi_roundtrip_and_spark_stages(spark):
    """r7: Motion-JPEG AVIs (00dc chunks of independent baseline
    JPEGs) decode natively through the same seek-table path as DIB —
    the compressed-video boundary narrows to interframe codecs.
    Smooth-gradient frames survive JPEG within a small tolerance; the
    Spark sampler and feature stages both handle the codec; a 00dc
    chunk that is not a JPEG skips the row like any corrupt frame."""
    from udacity_data_engineering_capstone_project_spark.operators.multimodal import (
        decode_image_pixels,
    )
    from udacity_data_engineering_capstone_project_spark.operators.video import (
        _decode_frame_chunk,
        _frame_chunks,
        sample_video_frames,
        video_features,
    )

    # smooth gradients (JPEG-friendly), 3 frames of rising brightness
    h, w = 16, 24
    base = (
        np.arange(h)[:, None, None] * 4
        + np.arange(w)[None, :, None] * 2
        + np.zeros((1, 1, 3))
    )
    frames = np.stack(
        [np.clip(base + 40 * i, 0, 255).astype(np.uint8) for i in range(3)]
    )
    b = encode_avi(frames, fps=5, codec="MJPG", quality=95)
    assert parse_avi_meta(b) == (w, h, 200_000, 3)
    chunks = _frame_chunks(b)
    assert [c for _, _, c in chunks] == [True, True, True]
    for i, (off, ln, comp) in enumerate(chunks):
        got = _decode_frame_chunk(b, off, ln, comp, w, h)
        assert got.shape == (h, w, 3)
        assert np.abs(got.astype(int) - frames[i].astype(int)).mean() < 6

    df = spark.createDataFrame([(1, bytearray(b))], ["vid_id", "payload"])
    sampled = sample_video_frames(df, "vid_id", n_samples=2).collect()
    assert [r["frame_index"] for r in sampled] == [0, 2]
    # sampled PNGs flow into the image tier and keep MJPG pixel content
    px = decode_image_pixels(
        spark.createDataFrame(
            [(r["frame_index"], r["payload"]) for r in sampled],
            ["doc_id", "payload"],
        ),
        "doc_id",
    ).collect()
    assert all(p["width"] == w and p["height"] == h for p in px)

    feats = video_features(df, "vid_id").collect()[0]
    assert feats["n_frames"] == 3 and feats["motion"] > 10

    # hostile: 00dc payload that is not a JPEG -> row skipped, task alive
    evil = b.replace(b"\xff\xd8", b"\x00\x00", 1)
    df2 = spark.createDataFrame([(2, bytearray(evil))], ["vid_id", "payload"])
    assert sample_video_frames(df2, "vid_id").count() == 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="codec"):
        encode_avi(frames, codec="H264")
