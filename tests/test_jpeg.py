"""Baseline JPEG codec tests.

Roundtrip tests bound pixel error but CANNOT prove standard
conformance (a conjugate encoder/decoder bug cancels out), so the
decoder is additionally pinned against hand-constructed minimal
streams whose decoded values follow from T.81 by hand:
a DC-only block decodes to round(DC * Q[0] / 8) + 128 everywhere.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from udacity_data_engineering_capstone_project_spark.operators.jpeg import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    Q_LUMA,
    ZIGZAG,
    decode_baseline_jpeg,
    encode_baseline_jpeg,
)


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _minimal_gray_jpeg(width, height, entropy_bits: str) -> bytes:
    """Hand-assemble a baseline grayscale JPEG around a bit string of
    entropy-coded data (built by hand from the Annex K tables, NOT by
    the encoder under test)."""
    dqt = _seg(0xDB, bytes([0]) + Q_LUMA[ZIGZAG].astype(np.uint8).tobytes())
    sof = _seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", height, width) + bytes([1, 1, 0x11, 0]),
    )
    dht_dc = _seg(0xC4, bytes([0x00] + DC_LUMA_BITS + DC_LUMA_VALS))
    dht_ac = _seg(0xC4, bytes([0x10] + AC_LUMA_BITS + AC_LUMA_VALS))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    # pack bits MSB-first, pad with 1s, apply byte stuffing
    bits = entropy_bits + "1" * ((8 - len(entropy_bits) % 8) % 8)
    data = bytearray()
    for i in range(0, len(bits), 8):
        byte = int(bits[i : i + 8], 2)
        data.append(byte)
        if byte == 0xFF:
            data.append(0x00)
    return (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + bytes(data) + b"\xff\xd9"
    )


def test_dc_only_block_conformance():
    """Single 8x8 block, DC diff = 5, no AC: every pixel must equal
    round(5 * Q[0] / 8) + 128 = 5 * 16 / 8 + 128 = 138. Huffman bits
    derived by hand from Annex K: DC category 3 = '100', value 5 =
    '101', AC EOB = '1010'."""
    stream = _minimal_gray_jpeg(8, 8, "100" + "101" + "1010")
    w, h, ch, out = decode_baseline_jpeg(stream)
    assert (w, h, ch) == (8, 8, 1)
    assert out.shape == (8, 8, 1)
    assert np.all(out == 138), out[:, :, 0]


def test_dc_predictor_across_blocks():
    """Two horizontal blocks: DC diffs +5 then -3 -> absolute DC 5 and
    2 -> pixel values 138 and 132 (the decoder must carry the DC
    predictor between blocks). '-3' in category 2 is bits '00', whose
    category-2 code is '011'."""
    bits = ("100" + "101" + "1010") + ("011" + "00" + "1010")
    stream = _minimal_gray_jpeg(16, 8, bits)
    w, h, ch, out = decode_baseline_jpeg(stream)
    assert (w, h) == (16, 8)
    assert np.all(out[:, :8, 0] == 138)
    assert np.all(out[:, 8:, 0] == 132)


def test_roundtrip_error_bounds():
    """Encoder->decoder roundtrip stays within JPEG-typical error on
    smooth, flat, and adversarial (noise) content, gray and RGB,
    including non-multiple-of-8 dimensions."""
    x = np.linspace(0, 255, 64)
    grad = np.clip(np.add.outer(x, x / 2)[:48, :64], 0, 255).astype(np.uint8)
    rgb = np.stack([grad, 255 - grad, np.full_like(grad, 128)], axis=-1)
    rng = np.random.default_rng(5)
    noise = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
    flat = np.full((13, 21), 77, dtype=np.uint8)  # odd dims: edge padding

    for img, max_tol, mean_tol in [
        (grad, 4, 1.0),
        (rgb, 6, 1.5),
        (noise, 48, 8.0),
        (flat, 2, 1.5),
    ]:
        jb = encode_baseline_jpeg(img, quality=90)
        w, h, ch, out = decode_baseline_jpeg(jb)
        ref = img[:, :, None] if img.ndim == 2 else img
        assert (h, w) == ref.shape[:2] and ch == ref.shape[2]
        diff = np.abs(out.astype(int) - ref.astype(int))
        assert diff.max() <= max_tol, f"max {diff.max()}"
        assert diff.mean() <= mean_tol, f"mean {diff.mean()}"


def test_byte_stuffing_survives_roundtrip():
    """An entropy stream containing raw 0xFF bytes must be stuffed by
    the encoder and unstuffed by the decoder. Sweep seeds until a
    fixture actually exercises the path, then pin that seed."""
    for seed in range(40):
        img = np.random.default_rng(seed).integers(
            0, 256, size=(16, 16), dtype=np.uint8
        )
        jb = encode_baseline_jpeg(img, quality=95)
        body = jb[2:-2]
        if b"\xff\x00" in body:
            w, h, ch, out = decode_baseline_jpeg(jb)
            diff = np.abs(out[:, :, 0].astype(int) - img.astype(int))
            assert diff.mean() <= 10
            return
    pytest.fail("no seed produced a stuffed byte — encoder suspect")


def test_non_baseline_and_garbage_raise():
    with pytest.raises(ValueError, match="SOI"):
        decode_baseline_jpeg(b"not a jpeg at all")
    # arithmetic-coded SOF9 must be rejected, not mis-decoded
    sof9 = (
        b"\xff\xd8"
        + _seg(0xC9, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    )
    with pytest.raises(ValueError, match="non-baseline"):
        decode_baseline_jpeg(sof9)
    # progressive SOF2 is supported since round 4 — but a frame with no
    # scan at all must still raise, not return garbage
    sof2 = (
        b"\xff\xd8"
        + _seg(0xC2, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="no SOS"):
        decode_baseline_jpeg(sof2)


def test_multimodal_stack_decodes_jpeg_rows(spark):
    """The Spark-side decode stack admits baseline JPEG payloads
    without PIL: decode_image_pixels / image_dhash / resize_image all
    yield real values for a JPEG row, nulls for garbage."""
    from udacity_data_engineering_capstone_project_spark.operators.multimodal import (
        decode_image_pixels,
        image_dhash,
        resize_image,
    )

    from udacity_data_engineering_capstone_project_spark.operators.jpeg import (
        encode_progressive_jpeg,
    )

    x = np.linspace(0, 255, 32)
    img = np.clip(np.add.outer(x, x)[:32, :32], 0, 255).astype(np.uint8)
    rgb = np.stack([img, img, img], axis=-1)
    jb = encode_baseline_jpeg(rgb, quality=90)
    pj = encode_progressive_jpeg(rgb, quality=90)
    df = spark.createDataFrame(
        [(1, jb), (2, b"\xff\xd8 garbage"), (3, pj)], ["doc_id", "payload"]
    )

    px = {r["doc_id"]: r for r in decode_image_pixels(df, "doc_id").collect()}
    assert (px[1]["width"], px[1]["height"], px[1]["channels"]) == (32, 32, 3)
    assert px[2]["width"] is None
    # progressive SOF2 decodes in the Spark stack too — and bit-equals
    # the baseline decode of the same image
    assert (px[3]["width"], px[3]["height"], px[3]["channels"]) == (32, 32, 3)
    assert px[3]["pixels"] == px[1]["pixels"]

    dh = {r["doc_id"]: r["dhash"] for r in image_dhash(df, "doc_id").collect()}
    assert dh[1] is not None and dh[2] is None
    assert dh[3] == dh[1]

    rs = {r["doc_id"]: r for r in resize_image(df, "doc_id", 8, 8).collect()}
    assert rs[1]["width"] == 8 and rs[2]["payload"] is None
    assert rs[3]["width"] == 8


def test_chroma_subsampling_420_conformance():
    """Hand-built 4:2:0 stream: a 16x16 MCU of 4 luma blocks + 1 Cb +
    1 Cr, all DC-only. Y DC diff 5 then three 0-diffs -> every luma
    sample 138; Cb/Cr DC 0 -> neutral 128 chroma upsampled 2x -> the
    decoded RGB is uniform (138, 138, 138). Pins MCU block order,
    per-component DC predictors, and nearest upsampling."""
    dqt = _seg(0xDB, bytes([0]) + Q_LUMA[ZIGZAG].astype(np.uint8).tobytes())
    sof = _seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", 16, 16)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    dht_dc = _seg(0xC4, bytes([0x00] + DC_LUMA_BITS + DC_LUMA_VALS))
    dht_ac = _seg(0xC4, bytes([0x10] + AC_LUMA_BITS + AC_LUMA_VALS))
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    blk_dc5 = "100" + "101" + "1010"   # DC cat3 value 5, EOB
    blk_dc0 = "00" + "1010"            # DC cat0 (diff 0), EOB
    bits = blk_dc5 + blk_dc0 * 3 + blk_dc0 + blk_dc0  # 4xY, Cb, Cr
    padded = bits + "1" * ((8 - len(bits) % 8) % 8)
    data = bytearray()
    for i in range(0, len(padded), 8):
        byte = int(padded[i : i + 8], 2)
        data.append(byte)
        if byte == 0xFF:
            data.append(0x00)
    stream = (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + bytes(data) + b"\xff\xd9"
    )
    w, h, ch, out = decode_baseline_jpeg(stream)
    assert (w, h, ch) == (16, 16, 3)
    assert np.all(out == 138), np.unique(out)


def test_restart_markers_reset_dc_predictor():
    """DRI=1 with an RST0 between two blocks: the decoder must
    byte-align, consume the marker, and RESET the DC predictor — so an
    identical DC-diff-5 in block 2 again decodes to 138 (not 148)."""
    dqt = _seg(0xDB, bytes([0]) + Q_LUMA[ZIGZAG].astype(np.uint8).tobytes())
    sof = _seg(
        0xC0, bytes([8]) + struct.pack(">HH", 8, 16) + bytes([1, 1, 0x11, 0])
    )
    dht_dc = _seg(0xC4, bytes([0x00] + DC_LUMA_BITS + DC_LUMA_VALS))
    dht_ac = _seg(0xC4, bytes([0x10] + AC_LUMA_BITS + AC_LUMA_VALS))
    dri = _seg(0xDD, struct.pack(">H", 1))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    def pack(bits):
        padded = bits + "1" * ((8 - len(bits) % 8) % 8)
        out = bytearray()
        for i in range(0, len(padded), 8):
            b = int(padded[i : i + 8], 2)
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        return bytes(out)

    blk = "100" + "101" + "1010"  # DC diff 5, EOB
    stream = (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + dri + sos
        + pack(blk) + b"\xff\xd0" + pack(blk) + b"\xff\xd9"
    )
    w, h, ch, out = decode_baseline_jpeg(stream)
    assert (w, h) == (16, 8)
    assert np.all(out == 138), np.unique(out)


def test_pil_cross_check():
    """Wherever PIL exists, both directions must agree with libjpeg:
    PIL decodes our encoder's output within JPEG tolerance, and our
    decoder matches PIL's decode of the same stream bit-for-bit-ish
    (IDCT rounding differs by at most 1)."""
    Image = pytest.importorskip("PIL.Image")
    import io

    x = np.linspace(0, 255, 64)
    img = np.clip(np.add.outer(x, x / 2)[:48, :64], 0, 255).astype(np.uint8)
    jb = encode_baseline_jpeg(img, quality=90)
    pil_out = np.asarray(Image.open(io.BytesIO(jb)).convert("L"))
    assert np.abs(pil_out.astype(int) - img.astype(int)).max() <= 4

    w, h, ch, ours = decode_baseline_jpeg(jb)
    assert np.abs(ours[:, :, 0].astype(int) - pil_out.astype(int)).max() <= 1


# ---------------------------------------------------------------------------
# Progressive (SOF2)


def _prog_imports():
    from udacity_data_engineering_capstone_project_spark.operators.jpeg import (
        decode_jpeg,
        encode_progressive_jpeg,
    )

    return decode_jpeg, encode_progressive_jpeg


def test_progressive_equals_baseline_gray_and_rgb():
    """A complete progressive scan script (spectral selection +
    successive approximation + refinements) carries the exact same
    quantized coefficients as the baseline layout, so the decodes must
    be IDENTICAL byte-for-byte. The entropy paths share no code, so a
    bug in either breaks the equality."""
    from udacity_data_engineering_capstone_project_spark.operators.jpeg import (
        encode_baseline_jpeg as enc_base,
    )

    decode_jpeg, encode_progressive_jpeg = _prog_imports()
    x = np.linspace(0, 255, 64)
    grad = np.clip(np.add.outer(x, x / 2)[:48, :64], 0, 255).astype(np.uint8)
    rgb = np.stack([grad, 255 - grad, np.full_like(grad, 128)], axis=-1)
    noise = np.random.default_rng(7).integers(0, 256, (24, 40, 3), dtype=np.uint8)
    for img in [grad, rgb, noise, np.full((13, 21), 77, np.uint8)]:
        base = decode_jpeg(enc_base(img, quality=90))
        prog = decode_jpeg(encode_progressive_jpeg(img, quality=90))
        assert base[:3] == prog[:3]
        assert np.array_equal(base[3], prog[3]), (
            f"progressive != baseline: {np.abs(base[3].astype(int) - prog[3].astype(int)).max()}"
        )


def test_progressive_eobrun_spans_blocks():
    """A mostly-flat image makes consecutive all-zero AC bands, forcing
    EOBn symbols with n>0 (runs > 1 block) in both the first and the
    refinement AC scans; decode must still bit-equal baseline."""
    from udacity_data_engineering_capstone_project_spark.operators.jpeg import (
        encode_baseline_jpeg as enc_base,
    )

    decode_jpeg, encode_progressive_jpeg = _prog_imports()
    img = np.full((64, 64), 120, np.uint8)
    img[30:34, 30:34] = 250  # one busy patch amid many silent blocks
    pb = encode_progressive_jpeg(img, quality=85)
    base = decode_jpeg(enc_base(img, quality=85))
    prog = decode_jpeg(pb)
    assert np.array_equal(base[3], prog[3])


def test_progressive_restart_markers():
    """restart_interval=2 emits RSTn in every scan; the decoder must
    byte-align, reset DC predictors and EOB runs, and still reproduce
    the baseline decode exactly."""
    from udacity_data_engineering_capstone_project_spark.operators.jpeg import (
        encode_baseline_jpeg as enc_base,
    )

    decode_jpeg, encode_progressive_jpeg = _prog_imports()
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    pb = encode_progressive_jpeg(img, quality=90, restart_interval=2)
    assert any(bytes([0xFF, 0xD0 + i]) in pb for i in range(8)), "no RSTn emitted"
    base = decode_jpeg(enc_base(img, quality=90))
    prog = decode_jpeg(pb)
    assert np.array_equal(base[3], prog[3])


def test_progressive_truncated_script_renders_coarse():
    """Dropping the refinement scans is a LEGAL progressive stream (the
    whole point of the format): the decoder must render the Al=1
    approximation, close to but not necessarily equal to the full
    decode."""
    decode_jpeg, encode_progressive_jpeg = _prog_imports()
    x = np.linspace(0, 255, 64)
    img = np.clip(np.add.outer(x, x / 2)[:48, :64], 0, 255).astype(np.uint8)
    full = decode_jpeg(encode_progressive_jpeg(img, quality=90))
    coarse = decode_jpeg(encode_progressive_jpeg(img, quality=90, refine=False))
    diff = np.abs(full[3].astype(int) - coarse[3].astype(int))
    assert diff.mean() < 16, f"coarse pass unusable: mean {diff.mean()}"
    # and the coarse pass must still resemble the source
    src_diff = np.abs(coarse[3][:, :, 0].astype(int) - img.astype(int))
    assert src_diff.mean() < 20


def test_progressive_420_ceil_grid_conformance():
    """Hand-built 4:2:0 progressive stream for an 8x8 image: the MCU is
    16x16 so the PADDED luma grid is 2x2 blocks, but a non-interleaved
    AC scan covers only the ceil(8/8)=1x1 CEIL grid (T.81 A.2.2). The
    DC scan is interleaved (4 Y + Cb + Cr data units); the AC scan
    carries exactly ONE block: (run 0, size 2) value 2 at zigzag k=1.
    A decoder walking the padded grid would read 4 blocks and desync.
    Expected pixels computed from hand-built coefficients through the
    already-conformance-pinned IDCT."""
    from udacity_data_engineering_capstone_project_spark.operators.jpeg import (
        _idct2,
        decode_jpeg,
    )

    dqt = _seg(0xDB, bytes([0]) + Q_LUMA[ZIGZAG].astype(np.uint8).tobytes())
    sof = _seg(
        0xC2,
        bytes([8]) + struct.pack(">HH", 8, 8)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    dht_dc = _seg(0xC4, bytes([0x00] + DC_LUMA_BITS + DC_LUMA_VALS))
    dht_ac = _seg(0xC4, bytes([0x10] + AC_LUMA_BITS + AC_LUMA_VALS))

    def pack(bits):
        padded = bits + "1" * ((8 - len(bits) % 8) % 8)
        out = bytearray()
        for i in range(0, len(padded), 8):
            byte = int(padded[i : i + 8], 2)
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        return bytes(out)

    # DC-first scan (Ss=Se=0, Al=0), interleaved: Y diffs 5,0,0,0; Cb 0; Cr 0
    sos_dc = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0]))
    dc_bits = ("100" + "101") + "00" * 3 + "00" + "00"
    # AC-first scan for Y only (Ss=1, Se=63, Al=0): ONE ceil-grid block:
    # (0,2) code '01' + value 2 '10', then EOB '1010'
    sos_ac = _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0]))
    ac_bits = "01" + "10" + "1010"
    stream = (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac
        + sos_dc + pack(dc_bits) + sos_ac + pack(ac_bits) + b"\xff\xd9"
    )
    w, h, ch, out = decode_jpeg(stream)
    assert (w, h, ch) == (8, 8, 3)
    blk = np.zeros((1, 8, 8))
    blk[0, 0, 0] = 5 * 16  # DC 5 x Q[0,0]=16
    blk[0, 0, 1] = 2 * 11  # AC k=1 -> natural (0,1), Q[0,1]=11
    expected_y = np.clip(np.round(_idct2(blk)[0] + 128.0), 0, 255)
    assert np.array_equal(out[:, :, 0].astype(float), expected_y), (
        out[:, :, 0],
        expected_y,
    )
    # neutral chroma: all three channels equal
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert np.array_equal(out[:, :, 0], out[:, :, 2])


def test_progressive_corruption_totality():
    """Byte-flips anywhere in a progressive stream must either decode
    (possibly wrong pixels) or raise ValueError — never another
    exception type, never a hang."""
    decode_jpeg, encode_progressive_jpeg = _prog_imports()
    img = np.random.default_rng(3).integers(0, 256, (16, 24), dtype=np.uint8)
    pb = bytearray(encode_progressive_jpeg(img, quality=90))
    for pos in range(2, len(pb), max(1, len(pb) // 60)):
        corrupted = bytes(pb[:pos]) + bytes([pb[pos] ^ 0xA5]) + bytes(pb[pos + 1 :])
        try:
            decode_jpeg(corrupted)
        except ValueError:
            pass
    # truncations too
    for cut in range(2, len(pb), max(1, len(pb) // 40)):
        try:
            decode_jpeg(bytes(pb[:cut]))
        except ValueError:
            pass


def test_hostile_successive_approximation_params_raise():
    """Al=15 in a progressive DC scan would shift DC values past int32
    coefficient storage (numpy 2.x raises OverflowError on assignment —
    outside the ValueError totality contract); T.81 caps Ah/Al at 13,
    so the decoder must reject it up front."""
    decode_jpeg, encode_progressive_jpeg = _prog_imports()
    pb = bytearray(encode_progressive_jpeg(np.full((8, 8), 99, np.uint8)))
    # find the first SOS (DC scan) and corrupt its AhAl byte to 0x0F
    i = pb.index(bytes([0xFF, 0xDA]))
    seg_len = (pb[i + 2] << 8) | pb[i + 3]
    ahal_pos = i + 2 + seg_len - 1
    pb[ahal_pos] = 0x0F  # Ah=0, Al=15
    with pytest.raises(ValueError, match="successive-approximation"):
        decode_jpeg(bytes(pb))


# ---------------------------------------------------------------------------
# Lossless (SOF3, Annex H) — r12


def test_lossless_roundtrip_bit_exact_over_parameter_grid():
    """Lossless means EQUALITY: decode(encode(x)) must reproduce the
    samples bit-for-bit (after the declared point transform) for every
    predictor, precision, component count, and restart interval — no
    tolerance for a conjugate encoder/decoder bug to hide behind."""
    import numpy as np

    from udacity_data_engineering_capstone_project_spark.operators.jpeg import (
        decode_jpeg_lossless,
        encode_jpeg_lossless,
    )

    rng = np.random.default_rng(11)
    cases = [
        (8, (13, 17), 0, 0), (8, (13, 17, 3), 0, 0), (12, (9, 11), 0, 0),
        (16, (8, 8, 2), 0, 0), (8, (10, 10), 2, 0), (8, (12, 7), 0, 5),
        (16, (6, 6), 4, 4), (2, (5, 5), 0, 0),
    ]
    for prec, shape, pt, dri in cases:
        for pred in range(1, 8):
            img = rng.integers(0, 1 << prec, size=shape).astype(np.uint32)
            b = encode_jpeg_lossless(
                img, precision=prec, predictor=pred,
                point_transform=pt, restart_interval=dri,
            )
            w, h, nc, p2, out = decode_jpeg_lossless(b)
            want = (
                (img.reshape(shape[0], shape[1], -1).astype(np.int64) >> pt)
                << pt
            ).astype(np.uint16)
            assert (w, h, p2) == (shape[1], shape[0], prec)
            assert (out == want).all(), (prec, shape, pred, pt, dri)


def test_lossless_hand_built_stream_conformance():
    """Hand-packed SOF3 stream decoded against hand-computed Annex H
    arithmetic (predictor 1, default prediction 2^(P-1), category +
    EXTEND coding) — a conjugate encoder/decoder bug cannot satisfy a
    stream written from the standard by hand."""
    import numpy as np

    from udacity_data_engineering_capstone_project_spark.operators.jpeg import (
        LL_DIFF_BITS,
        LL_DIFF_VALS,
        decode_jpeg_lossless,
    )

    # canonical codes for the module's category table: len-3 codes
    # 000..101 for categories 0-5, len-4 '1100' for 6, len-5 '11010'
    # for 7, ...
    # samples (2x2, P=8, predictor 1): 130, 127 / 130, 20
    #  (0,0): pred 128 (default) diff +2   -> cat2 '010' + '10'
    #  (0,1): pred Ra=130        diff -3   -> cat2 '010' + '00'
    #  (1,0): pred Rb=130        diff  0   -> cat0 '000'
    #  (1,1): pred Ra=130        diff -110 -> cat7 '11010' + 7 bits of
    #         (-110 + 2^7 - 1 = 17) = '0010001'
    bitstr = "010" "10" "010" "00" "000" "11010" "0010001"
    bitstr += "1" * (-len(bitstr) % 8)  # 1-fill pad per T.81
    data = bytearray()
    for i in range(0, len(bitstr), 8):
        byte = int(bitstr[i : i + 8], 2)
        data.append(byte)
        if byte == 0xFF:  # byte stuffing — the pad byte lands on 0xFF
            data.append(0x00)
    data = bytes(data)

    n = sum(LL_DIFF_BITS)
    dht = _seg(0xC4, bytes([0x00]) + bytes(LL_DIFF_BITS) + bytes(LL_DIFF_VALS[:n]))
    sof = _seg(
        0xC3, bytes([8]) + struct.pack(">HH", 2, 2) + bytes([1, 1, 0x11, 0x00])
    )
    sos = _seg(0xDA, bytes([1, 1, 0x00, 1, 0x00, 0x00]))
    stream = b"\xff\xd8" + dht + sof + sos + data + b"\xff\xd9"
    w, h, nc, prec, out = decode_jpeg_lossless(stream)
    assert (w, h, nc, prec) == (2, 2, 1, 8)
    assert out[:, :, 0].tolist() == [[130, 127], [130, 20]]


def test_lossless_dispatch_and_hostile_streams():
    """decode_jpeg dispatches 8-bit SOF3 automatically; >8-bit directs
    to the lossless entry point; hostile headers raise ValueError (the
    mapInPandas totality contract), including the dimension bomb the
    per-sample python loop cannot survive."""
    import numpy as np
    import pytest as _pytest

    from udacity_data_engineering_capstone_project_spark.operators.jpeg import (
        decode_jpeg,
        decode_jpeg_lossless,
        encode_jpeg_lossless,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(7, 9)).astype(np.uint8)
    w, h, nc, arr = decode_jpeg(encode_jpeg_lossless(img, precision=8))
    assert (w, h, nc) == (9, 7, 1) and (arr[:, :, 0] == img).all()

    img12 = rng.integers(0, 1 << 12, size=(4, 4)).astype(np.uint16)
    with _pytest.raises(ValueError, match="decode_jpeg_lossless"):
        decode_jpeg(encode_jpeg_lossless(img12, precision=12))

    # dimension bomb: headers declaring 65535x65535 must raise, not
    # allocate 34 GB of row buffers
    bomb = (
        b"\xff\xd8"
        + _seg(0xC3, bytes([16]) + struct.pack(">HH", 65535, 65535)
               + bytes([1, 1, 0x11, 0x00]))
        + b"\xff\xd9"
    )
    with _pytest.raises(ValueError, match="implausibly large"):
        decode_jpeg_lossless(bomb)

    # subsampled lossless: legal per the standard, outside this scope
    sub = (
        b"\xff\xd8"
        + _seg(0xC3, bytes([8]) + struct.pack(">HH", 8, 8)
               + bytes([2, 1, 0x22, 0x00, 2, 0x11, 0x00]))
        + b"\xff\xd9"
    )
    with _pytest.raises(ValueError, match="1x1 only"):
        decode_jpeg_lossless(sub)

    # a DCT frame through the lossless entry point must raise cleanly
    with _pytest.raises(ValueError, match="not a lossless"):
        decode_jpeg_lossless(
            b"\xff\xd8"
            + _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8)
                   + bytes([1, 1, 0x11, 0x00]))
            + b"\xff\xd9"
        )


def test_lossless_hostile_component_counts_and_truncation():
    """r13 (ADVICE): the w*h cap alone left two allocation/hang paths
    open — a SOF3 declaring ncomp=255 inside the w*h cap (137 GB of
    int64 planes), and a truncated stream whose zero-fill EOF padding
    decodes 'validly' forever via the all-zero category-0 code. Both
    must raise ValueError (the mapInPandas totality contract)."""
    import numpy as np
    import pytest as _pytest

    from udacity_data_engineering_capstone_project_spark.operators.jpeg import (
        decode_jpeg,
        decode_jpeg_lossless,
        encode_jpeg_lossless,
    )

    # ncomp bomb: 255 components, w*h well under the old cap
    comp_specs = b"".join(bytes([i + 1, 0x11, 0x00]) for i in range(255))
    bomb = (
        b"\xff\xd8"
        + _seg(0xC3, bytes([16]) + struct.pack(">HH", 4096, 4096)
               + bytes([255]) + comp_specs)
        + b"\xff\xd9"
    )
    with _pytest.raises(ValueError, match="component count"):
        decode_jpeg_lossless(bomb)

    # total-sample bomb: ncomp=4 within scope, but w*h*ncomp over cap
    four = b"".join(bytes([i + 1, 0x11, 0x00]) for i in range(4))
    big = (
        b"\xff\xd8"
        + _seg(0xC3, bytes([16]) + struct.pack(">HH", 8192, 8192)
               + bytes([4]) + four)
        + b"\xff\xd9"
    )
    with _pytest.raises(ValueError, match="implausibly large"):
        decode_jpeg_lossless(big)

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(32, 32)).astype(np.uint8)
    good = encode_jpeg_lossless(img, precision=8)

    # oversized scan: Ns=2 against a 1-component frame must hit the
    # ns bound (it would double the per-sample loop past the SOF cap)
    sos_at = good.find(b"\xff\xda")
    assert sos_at > 0
    wide_sos = _seg(0xDA, bytes([2, 1, 0x00, 1, 0x00, 1, 0x00, 0x00]))
    sos_len = struct.unpack(">H", good[sos_at + 2 : sos_at + 4])[0]
    wide = good[:sos_at] + wide_sos + good[sos_at + 2 + sos_len:]
    with _pytest.raises(ValueError, match="scan component count"):
        decode_jpeg_lossless(wide)

    # duplicate scan component: Ns=2 both naming component 1 in a
    # 2-component frame (passes the ns bound, must still raise)
    img2 = rng.integers(0, 256, size=(8, 8, 2)).astype(np.uint8)
    good2 = encode_jpeg_lossless(img2, precision=8)
    sos2_at = good2.find(b"\xff\xda")
    assert sos2_at > 0
    dup_sos = _seg(0xDA, bytes([2, 1, 0x00, 1, 0x00, 1, 0x00, 0x00]))
    sos2_len = struct.unpack(">H", good2[sos2_at + 2 : sos2_at + 4])[0]
    dup = good2[:sos2_at] + dup_sos + good2[sos2_at + 2 + sos2_len:]
    with _pytest.raises(ValueError, match="duplicate component"):
        decode_jpeg_lossless(dup)

    # truncation: chop the entropy stream mid-scan (keep headers).
    # Without the EOF-pad check this loops the full h*w decoding
    # zero diffs from fabricated bits instead of raising.
    cut = good[: sos_at + 20]  # inside the entropy data, no EOI
    assert len(cut) < len(good) - 8
    with _pytest.raises(ValueError, match="truncated lossless"):
        decode_jpeg_lossless(cut)

    # sub-8-bit lossless dispatches through decode_jpeg (samples fit
    # uint8; the old condition lprec != 8 wrongly rejected these)
    img4 = rng.integers(0, 16, size=(6, 5)).astype(np.uint8)
    w, h, nc, arr = decode_jpeg(encode_jpeg_lossless(img4, precision=4))
    assert (w, h, nc) == (5, 6, 1) and (arr[:, :, 0] == img4).all()
