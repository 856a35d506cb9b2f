"""JPEG codec, baseline + progressive (pure Python + numpy) — closes
the honest gap that JPEG payloads were header-parse only
(`parse_image_meta`) without PIL.

Scope: baseline sequential DCT (SOF0/1) AND progressive DCT (SOF2 —
spectral selection + successive approximation, multi-scan, AC
refinement EOB runs), 8-bit, grayscale or YCbCr with 4:4:4 / 4:2:0 /
4:2:2 subsampling, restart markers, byte stuffing; PLUS lossless
DPCM (SOF3, T.81 Annex H — r12): predictors 1-7, point transform,
2-16 bit precision, 1x1 sampling, restart markers
(`decode_jpeg_lossless` / `encode_jpeg_lossless`; `decode_jpeg`
dispatches 8-bit lossless streams automatically). Arithmetic coding,
12-bit DCT, and hierarchical modes remain out of scope — they raise,
and callers fall back to their null-on-garbage contract.

Position in the decode stack (`multimodal._decode_pixels_array`):
PIL when installed (libjpeg C loops — the production path at pixel
volume) > stdlib PNG path for PNG > THIS decoder for baseline JPEG.
The pure-Python huffman bit reader is test/correctness grade, not a
100 TB hot path — that is PIL's job; this keeps the operator surface
dependency-free and the semantics pinned.

Correctness strategy (no PIL in this container to cross-check):
- the encoder/decoder roundtrip is LOSSY, so roundtrip tests bound
  pixel error, they don't prove standard conformance;
- conformance is pinned separately by hand-constructed minimal
  streams whose decoded values are computed from the standard by hand
  (DC-only blocks: pixel = round(DC * Q[0] / 8) + 128), which a
  conjugate encoder/decoder bug cannot satisfy;
- progressive conformance additionally exploits that a complete
  progressive scan script carries the SAME quantized coefficients as
  the baseline layout: decode(progressive(img)) must be bit-equal to
  decode(baseline(img)) — the entropy layouts differ entirely, so a
  decoder bug in either path breaks the equality; hand-built
  progressive streams pin the non-interleaved ceil-grid geometry;
- a PIL cross-check test runs automatically wherever PIL exists.

Reference: ITU-T T.81 (JPEG), Annex F (baseline), Annex K (example
quantization/huffman tables, used by the encoder).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Shared constants (T.81 Annex K)

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1 luminance / chrominance quantization tables (quality 50)
Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 standard huffman tables: (bits per code length 1..16, values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# 8x8 DCT-II basis: M[u, x] = c(u) * cos((2x+1) u pi / 16) / 2
_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _idct2(blocks: np.ndarray) -> np.ndarray:
    """Inverse 2-D DCT of (n, 8, 8) coefficient blocks."""
    return np.einsum("ux,nuv,vy->nxy", _M, blocks, _M, optimize=True)


def _dct2(blocks: np.ndarray) -> np.ndarray:
    """Forward 2-D DCT of (n, 8, 8) sample blocks."""
    return np.einsum("ux,nxy,vy->nuv", _M, blocks, _M, optimize=True)


# ---------------------------------------------------------------------------
# Huffman machinery


def _build_decode_table(bits, vals):
    """code (length, value-bits) -> symbol, per T.81 C.2 canonical order."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits, vals):
    dec = _build_decode_table(bits, vals)
    return {sym: (length, code) for (length, code), sym in dec.items()}


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    unstuffing; stops at any non-stuffed marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        # zero bytes synthesized because the DATA ran out (no marker
        # terminated the stream). Marker padding is the normal scan-end
        # shape and is NOT counted; EOF padding only ever happens on
        # truncated input, and pads always sit at the buffer tail, so
        # a caller observing pad_bits > nbits has CONSUMED fabricated
        # bits (see _decode_lossless_sos's totality check).
        self.pad_bits = 0

    def _fill(self):
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.buf = (self.buf << 8) | 0
                self.nbits += 8
                self.pad_bits += 8
                continue
            byte = self.data[self.pos]
            if byte == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: caller resets via sync_restart
                    self.buf = (self.buf << 8) | 0
                    self.nbits += 8
                    continue
                else:
                    # real marker (EOI etc.): pad with zeros
                    self.buf = (self.buf << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.buf = (self.buf << 8) | byte
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        bit = (self.buf >> self.nbits) & 1
        # trim consumed high bits: an unmasked Python int grows without
        # bound over a long stream (bigint ops then scale with length —
        # quadratic decode)
        self.buf &= (1 << self.nbits) - 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code in JPEG stream")

    def sync_restart(self):
        """Align to byte boundary and consume an RSTn marker."""
        self.nbits = 0
        self.buf = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected JPEG restart marker")


def _extend(v: int, n: int) -> int:
    """T.81 F.12 EXTEND: map n received bits to a signed coefficient."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _check_dc(pred: int):
    """Reject hostile DC-predictor drift before it can overflow int32
    coefficient storage (legal 8-bit streams stay within ±2047; the
    bound leaves room for the <<13 max successive-approximation shift).
    Without this, numpy 2.x raises OverflowError on assignment — an
    exception type outside the decoder's ValueError totality contract."""
    if pred < -(1 << 17) or pred > 1 << 17:
        raise ValueError("JPEG DC predictor out of range")


# ---------------------------------------------------------------------------
# Decoder — sequential (SOF0/1) and progressive (SOF2), multi-scan.
#
# Architecture: the segment loop accumulates per-component quantized
# coefficients (zigzag order, int32) across however many SOS scans the
# stream carries; dequant + IDCT + color happen once at EOI. Sequential
# streams are the one-scan special case. Progressive scan semantics
# follow T.81 Annex G.2 (spectral selection + successive approximation,
# including AC refinement EOB runs with interleaved correction bits).


def decode_jpeg(b: bytes):
    """Decode a sequential (SOF0/1) or progressive (SOF2) JPEG to
    (w, h, channels, np.uint8 array (h, w, channels)). Raises
    ValueError on anything outside that scope (12-bit, arithmetic
    coding, lossless, hierarchical)."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    n_scans = 0
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = b[pos + 1]
        if marker == 0xFF:  # fill byte padding before a marker
            pos += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM/RSTn: no length
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", b[pos + 2 : pos + 4])[0]
        if seg_len < 2:
            raise ValueError("bad JPEG segment length")
        seg = b[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables not baseline")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8)
                qtables[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                if i + 17 > len(seg):
                    raise ValueError("truncated JPEG huffman table")
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                if len(vals) < n:
                    raise ValueError("truncated JPEG huffman table")
                table = _build_decode_table(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            if frame is not None:
                raise ValueError("multiple JPEG frames unsupported")
            if len(seg) < 6:
                raise ValueError("truncated JPEG frame header")
            precision = seg[0]
            if precision != 8:
                raise ValueError("only 8-bit JPEG supported")
            h = struct.unpack(">H", seg[1:3])[0]
            w = struct.unpack(">H", seg[3:5])[0]
            ncomp = seg[5]
            if w == 0 or h == 0 or ncomp == 0 or len(seg) < 6 + 3 * ncomp:
                raise ValueError("bad JPEG frame header")
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = seg[6 + ci * 3 : 9 + ci * 3]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq}
                )
            frame = {
                "w": w,
                "h": h,
                "comps": comps,
                "progressive": marker == 0xC2,
            }
            _alloc_frame(frame)
        elif marker == 0xC3:  # SOF3 lossless (r12): delegate to Annex H path
            lw, lh, lnc, lprec, larr = decode_jpeg_lossless(b)
            if lprec > 8:
                # 2-7 bit samples fit uint8 and dispatch fine (r13);
                # only >8-bit needs the uint16 entry point
                raise ValueError(
                    "lossless JPEG precision > 8: use decode_jpeg_lossless"
                )
            return lw, lh, lnc, larr.astype(np.uint8)
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "non-baseline JPEG (arithmetic/hierarchical) unsupported"
            )
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("truncated JPEG DRI segment")
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            pos = _decode_sos(
                b, pos, seg_len, seg, frame, qtables, huff_dc, huff_ac,
                restart_interval,
            )
            n_scans += 1
            continue
        pos += 2 + seg_len
    if frame is None or n_scans == 0:
        raise ValueError("JPEG has no SOS scan")
    for c in frame["comps"]:
        if not c["scanned"]:
            raise ValueError(f"JPEG component {c['id']} never scanned")
    return _assemble(frame, qtables)


# Kept name: the original baseline-only entry point; it now decodes
# progressive streams too (the stricter name survives for callers/tests
# written against the baseline-only contract).
decode_baseline_jpeg = decode_jpeg


def _alloc_frame(frame):
    """Allocate per-component zigzag coefficient grids. Grids are
    MCU-padded (interleaved-scan geometry); non-interleaved scans cover
    the smaller ceil(comp_dim/8) grid per T.81 A.2.2 and index into the
    same storage."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    for c in comps:
        if c["h"] not in (1, 2, 4) or c["v"] not in (1, 2, 4):
            raise ValueError("unsupported JPEG sampling factors")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    frame["hmax"], frame["vmax"] = hmax, vmax
    frame["mcux"] = mcux = (w + 8 * hmax - 1) // (8 * hmax)
    frame["mcuy"] = mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        # non-interleaved (single-component-scan) block grid
        cw = (w * c["h"] + hmax - 1) // hmax
        ch = (h * c["v"] + vmax - 1) // vmax
        c["cw_blocks"] = (cw + 7) // 8
        c["ch_blocks"] = (ch + 7) // 8
        c["czz"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
        c["pred"] = 0
        c["scanned"] = False


def _decode_sos(b, pos, seg_len, seg, frame, qtables, huff_dc, huff_ac, dri):
    """Decode one scan; returns the stream position of the next marker."""
    if len(seg) < 1:
        raise ValueError("truncated JPEG scan header")
    ns = seg[0]
    if ns == 0 or len(seg) < 1 + 2 * ns + 3:
        raise ValueError("truncated JPEG scan header")
    by_id = {c["id"]: c for c in frame["comps"]}
    order = []  # (comp, dc_table_id, ac_table_id) in scan order
    for si in range(ns):
        cs, tds = seg[1 + 2 * si], seg[2 + 2 * si]
        if cs not in by_id:
            raise ValueError(f"JPEG scan references unknown component {cs}")
        c = by_id[cs]
        if c["tq"] not in qtables:
            raise ValueError("JPEG component references undefined quant table")
        order.append((c, tds >> 4, tds & 0x0F))
        c["scanned"] = True
    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
    ahal = seg[3 + 2 * ns]
    ah, al = ahal >> 4, ahal & 0x0F
    if frame["progressive"] and (ah > 13 or al > 13):
        # T.81 caps successive-approximation shifts at 13; a hostile
        # Al=15 would also push shifted DC values past int32 storage
        raise ValueError("bad JPEG successive-approximation parameters")
    reader = _BitReader(b, pos + 2 + seg_len)
    if not frame["progressive"]:
        for c, tdc, tac in order:
            if tdc not in huff_dc or tac not in huff_ac:
                raise ValueError("JPEG scan references undefined huffman table")
        _scan_sequential(reader, frame, order, huff_dc, huff_ac, dri)
    elif ss == 0:  # DC scan
        if se != 0:
            raise ValueError("progressive JPEG DC scan with Se != 0")
        if ah == 0:
            for c, tdc, _tac in order:
                if tdc not in huff_dc:
                    raise ValueError("JPEG scan references undefined huffman table")
            _scan_dc_first(reader, frame, order, huff_dc, al, dri)
        else:
            _scan_dc_refine(reader, frame, order, al, dri)
    else:  # AC scan: non-interleaved by definition (T.81 G.1.1)
        if ns != 1:
            raise ValueError("progressive JPEG AC scan must cover one component")
        if se > 63 or ss > se:
            raise ValueError("bad progressive JPEG spectral band")
        c, _tdc, tac = order[0]
        if tac not in huff_ac:
            raise ValueError("JPEG scan references undefined huffman table")
        if ah == 0:
            _scan_ac_first(reader, c, huff_ac[tac], ss, se, al, dri)
        else:
            _scan_ac_refine(reader, c, huff_ac[tac], ss, se, al, dri)
    return _next_marker(b, reader.pos)


def _next_marker(b, p):
    """Skip remaining entropy bytes (stuffing, fill, stray restarts) to
    the next real marker's 0xFF."""
    while p + 1 < len(b):
        if b[p] != 0xFF:
            p += 1
        elif b[p + 1] == 0x00:
            p += 2
        elif b[p + 1] == 0xFF:
            p += 1
        elif 0xD0 <= b[p + 1] <= 0xD7:
            p += 2
        else:
            return p
    return len(b)


def _walk_units(reader, frame, comps, dri, reset, visit):
    """Iterate the scan's data units in stream order with restart
    handling. One component => non-interleaved ceil-grid raster; more
    => MCU interleave (T.81 A.2)."""
    n = 0
    if len(comps) == 1:
        c = comps[0]
        for row in range(c["ch_blocks"]):
            for col in range(c["cw_blocks"]):
                if dri and n and n % dri == 0:
                    reader.sync_restart()
                    reset()
                n += 1
                visit(c, row * c["bw"] + col)
    else:
        for my in range(frame["mcuy"]):
            for mx in range(frame["mcux"]):
                if dri and n and n % dri == 0:
                    reader.sync_restart()
                    reset()
                n += 1
                for c in comps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            visit(
                                c,
                                (my * c["v"] + by) * c["bw"] + mx * c["h"] + bx,
                            )


def _scan_sequential(reader, frame, order, huff_dc, huff_ac, dri):
    tables = {c["id"]: (huff_dc[tdc], huff_ac[tac]) for c, tdc, tac in order}
    comps = [c for c, _, _ in order]
    for c in comps:
        c["pred"] = 0

    def reset():
        for c in comps:
            c["pred"] = 0

    def visit(c, idx):
        dct, act = tables[c["id"]]
        row = c["czz"][idx]
        ssss = reader.decode_symbol(dct)
        c["pred"] += _extend(reader.read_bits(ssss), ssss)
        _check_dc(c["pred"])
        row[0] = c["pred"]
        k = 1
        while k < 64:
            rs = reader.decode_symbol(act)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("JPEG AC run overflows block")
            row[k] = _extend(reader.read_bits(s), s)
            k += 1

    _walk_units(reader, frame, comps, dri, reset, visit)


def _scan_dc_first(reader, frame, order, huff_dc, al, dri):
    tables = {c["id"]: huff_dc[tdc] for c, tdc, _ in order}
    comps = [c for c, _, _ in order]
    for c in comps:
        c["pred"] = 0

    def reset():
        for c in comps:
            c["pred"] = 0

    def visit(c, idx):
        ssss = reader.decode_symbol(tables[c["id"]])
        c["pred"] += _extend(reader.read_bits(ssss), ssss)
        _check_dc(c["pred"])
        c["czz"][idx, 0] = c["pred"] << al

    _walk_units(reader, frame, comps, dri, reset, visit)


def _scan_dc_refine(reader, frame, order, al, dri):
    comps = [c for c, _, _ in order]
    bit = np.int32(1 << al)

    def visit(c, idx):
        if reader.read_bit():
            c["czz"][idx, 0] |= bit

    _walk_units(reader, frame, comps, dri, lambda: None, visit)


def _scan_ac_first(reader, c, act, ss, se, al, dri):
    state = {"eobrun": 0}

    def reset():
        state["eobrun"] = 0

    def visit(c, idx):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        row = c["czz"][idx]
        k = ss
        while k <= se:
            rs = reader.decode_symbol(act)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                eob = 1 << r
                if r:
                    eob += reader.read_bits(r)
                state["eobrun"] = eob - 1  # current block ends here
                break
            k += r
            if k > se:
                raise ValueError("JPEG AC run overflows band")
            row[k] = _extend(reader.read_bits(s), s) << al
            k += 1

    _walk_units(reader, {"mcuy": 0, "mcux": 0}, [c], dri, reset, visit)


def _scan_ac_refine(reader, c, act, ss, se, al, dri):
    """T.81 G.2 successive-approximation AC refinement: correction bits
    for already-nonzero coefficients are interleaved with the newly
    significant ones, including through EOB runs."""
    p1, m1 = 1 << al, -1 << al
    state = {"eobrun": 0}

    def reset():
        state["eobrun"] = 0

    def correct(row, k):
        v = int(row[k])
        if reader.read_bit() and (v & p1) == 0:
            row[k] = v + (p1 if v >= 0 else m1)

    def visit(c, idx):
        row = c["czz"][idx]
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = reader.decode_symbol(act)
                r, s = rs >> 4, rs & 0x0F
                if s:
                    if s != 1:
                        raise ValueError("invalid JPEG AC refinement symbol")
                    s = p1 if reader.read_bit() else m1
                elif r != 15:
                    eob = 1 << r
                    if r:
                        eob += reader.read_bits(r)
                    state["eobrun"] = eob
                    break  # tail of this block handled below
                # s == 0 here means ZRL: skip 16 zero-history positions
                while k <= se:
                    if row[k] != 0:
                        correct(row, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if s and k <= se:
                    row[k] = s
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if row[k] != 0:
                    correct(row, k)
                k += 1
            state["eobrun"] -= 1

    _walk_units(reader, {"mcuy": 0, "mcux": 0}, [c], dri, reset, visit)


def _assemble(frame, qtables):
    """Dequantize + IDCT + upsample + color-convert the accumulated
    coefficient grids."""
    w, h = frame["w"], frame["h"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    planes = []
    for c in frame["comps"]:
        if c["tq"] not in qtables:
            raise ValueError("JPEG component references undefined quant table")
        q = qtables[c["tq"]]
        blk = np.zeros_like(c["czz"], dtype=np.int64)
        blk[:, ZIGZAG] = c["czz"]
        pix = _idct2(blk.reshape(-1, 8, 8) * q) + 128.0
        grid = (
            pix.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # upsample to full resolution (nearest — T.81 leaves filters open)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            grid = np.repeat(np.repeat(grid, ry, axis=0), rx, axis=1)
        planes.append(grid[:h, :w])
    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return w, h, 1, out[:, :, None]
    if len(planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(planes)}")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, bl], axis=-1)
    return w, h, 3, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Lossless JPEG (SOF3, T.81 Annex H) — r12. Predictive DPCM, NOT DCT:
# each sample is Huffman-coded as a category+extend difference from one
# of the seven spatial predictors. Closes part of the documented
# non-baseline boundary (12-bit/16-bit medical/DNG-style streams are
# lossless-coded); arithmetic and hierarchical modes still raise.
# Scope: 2-16 bit precision, 1-4 components at 1x1 sampling (subsampled
# lossless is allowed by the standard but unused in practice — raises),
# predictors 1-7, point transform, restart markers (prediction resets
# to the default at each restart, the libjpeg behavior).


def _lossless_predict(ra: int, rb: int, rc: int, sel: int) -> int:
    if sel == 1:
        return ra
    if sel == 2:
        return rb
    if sel == 3:
        return rc
    if sel == 4:
        return ra + rb - rc
    if sel == 5:
        return ra + ((rb - rc) >> 1)
    if sel == 6:
        return rb + ((ra - rc) >> 1)
    return (ra + rb) >> 1  # sel == 7


def decode_jpeg_lossless(b: bytes):
    """Decode a lossless (SOF3) JPEG per T.81 Annex H.

    Returns (w, h, ncomp, precision, np.uint16 array (h, w, ncomp)).
    Raises ValueError outside the documented scope (see module
    header). The returned samples carry the point transform undone
    (value << Pt), as the standard specifies for the reconstruction.
    """
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    huff: dict[int, dict] = {}
    frame = None
    planes = None
    dri = 0
    n_scans = 0
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = b[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        seg_len = struct.unpack(">H", b[pos + 2 : pos + 4])[0]
        if seg_len < 2:
            raise ValueError("bad JPEG segment length")
        seg = b[pos + 4 : pos + 2 + seg_len]
        if marker == 0xC4:  # DHT (DC class only is meaningful here)
            i = 0
            while i < len(seg):
                if i + 17 > len(seg):
                    raise ValueError("truncated JPEG huffman table")
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                if len(vals) < n:
                    raise ValueError("truncated JPEG huffman table")
                if tc == 0:
                    huff[th] = _build_decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xC3:  # SOF3
            if frame is not None:
                raise ValueError("multiple JPEG frames unsupported")
            if len(seg) < 6:
                raise ValueError("truncated JPEG frame header")
            precision = seg[0]
            if not 2 <= precision <= 16:
                raise ValueError("bad lossless JPEG precision")
            h = struct.unpack(">H", seg[1:3])[0]
            w = struct.unpack(">H", seg[3:5])[0]
            ncomp = seg[5]
            if w == 0 or h == 0 or ncomp == 0 or len(seg) < 6 + 3 * ncomp:
                raise ValueError("bad JPEG frame header")
            if ncomp > 4:
                # encoder-scope bound (gray/RGB/RGBA); also the hostile
                # -header guard: ncomp=255 inside the w*h cap would still
                # allocate ncomp*(h,w) int64 planes (~137 GB worst case)
                raise ValueError("lossless JPEG component count > 4")
            if w * h * ncomp > (1 << 26):
                # hostile-header guard: the per-sample python loop and
                # the int64 row buffers make a 65535x65535 header an
                # allocation bomb, not a decode (fixture-grade scope)
                raise ValueError("lossless JPEG dimensions implausibly large")
            comps = []
            for ci in range(ncomp):
                cid, samp, _tq = seg[6 + ci * 3 : 9 + ci * 3]
                if samp != 0x11:
                    raise ValueError(
                        "subsampled lossless JPEG unsupported (1x1 only)"
                    )
                comps.append({"id": cid})
            frame = {"w": w, "h": h, "comps": comps, "precision": precision}
            planes = [
                np.zeros((h, w), dtype=np.int64) for _ in range(ncomp)
            ]
        elif marker in (0xC0, 0xC1, 0xC2, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("not a lossless (SOF3) JPEG")
        elif marker == 0xDD:
            if len(seg) < 2:
                raise ValueError("truncated JPEG DRI segment")
            dri = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            pos = _decode_lossless_sos(
                b, pos, seg_len, seg, frame, planes, huff, dri
            )
            n_scans += 1
            continue
        pos += 2 + seg_len
    if frame is None or n_scans == 0:
        raise ValueError("JPEG has no SOS scan")
    out = np.stack(planes, axis=-1).astype(np.uint16)
    return frame["w"], frame["h"], len(planes), frame["precision"], out


def _decode_lossless_sos(b, pos, seg_len, seg, frame, planes, huff, dri):
    """One lossless scan (possibly a component subset); returns the
    position of the next marker. Samples are reconstructed modulo
    2^16 (T.81 H.1.2.3) and written << Pt."""
    ns = seg[0]
    if len(seg) < 1 + 2 * ns + 3:
        raise ValueError("truncated JPEG scan header")
    if not 1 <= ns <= len(frame["comps"]):
        # a hostile Ns (up to 255 duplicate components) would multiply
        # the per-sample loop and the int64 row buffers past the SOF cap
        raise ValueError("bad lossless JPEG scan component count")
    by_id = {c["id"]: i for i, c in enumerate(frame["comps"])}
    scan = []
    seen_cids = set()
    for i in range(ns):
        cid, tsel = seg[1 + 2 * i], seg[2 + 2 * i]
        if cid not in by_id:
            raise ValueError("JPEG scan references unknown component")
        if cid in seen_cids:
            raise ValueError("duplicate component in JPEG scan")
        seen_cids.add(cid)
        td = tsel >> 4
        if td not in huff:
            raise ValueError("JPEG scan references missing huffman table")
        scan.append((by_id[cid], huff[td]))
    sel = seg[1 + 2 * ns]  # Ss = predictor selector
    pt = seg[3 + 2 * ns] & 0x0F  # Al = point transform
    if not 1 <= sel <= 7:
        raise ValueError("bad lossless predictor selector")
    w, h, precision = frame["w"], frame["h"], frame["precision"]
    default = 1 << (precision - pt - 1)
    m16 = (1 << 16) - 1
    reader = _BitReader(b, pos + 2 + seg_len)
    # rows of UNSHIFTED (pre-point-transform) samples per scan comp
    rows = [np.zeros((h, w), dtype=np.int64) for _ in scan]
    fresh = [True] * len(scan)  # default prediction pending (restart)
    count = 0
    for y in range(h):
        for x in range(w):
            for si, (ci, table) in enumerate(scan):
                s = reader.decode_symbol(table)
                if s == 16:
                    diff = 32768
                elif s == 0:
                    diff = 0
                else:
                    if s > 16:
                        raise ValueError("bad lossless category")
                    diff = _extend(reader.read_bits(s), s)
                r = rows[si]
                if fresh[si]:
                    pred = default
                    fresh[si] = False
                elif y == 0:
                    pred = r[0, x - 1] if x else default
                elif x == 0:
                    pred = r[y - 1, 0]
                else:
                    pred = _lossless_predict(
                        int(r[y, x - 1]), int(r[y - 1, x]),
                        int(r[y - 1, x - 1]), sel,
                    )
                r[y, x] = (int(pred) + diff) & m16
            count += 1
            if dri and count % dri == 0 and (y, x) != (h - 1, w - 1):
                reader.sync_restart()
                fresh = [True] * len(scan)
        if reader.pad_bits > reader.nbits:
            # consumed bits past the end of the DATA (not past a marker
            # — that's normal scan end): the category-0 code is often
            # all-zeros, so a truncated stream would otherwise decode
            # 'validly' forever instead of honoring the totality
            # contract. Checked per row to keep the sample loop hot.
            raise ValueError("truncated lossless JPEG entropy stream")
    for si, (ci, _t) in enumerate(scan):
        planes[ci][:, :] = (rows[si] << pt) & m16
    return _next_marker(b, reader.pos)


# ---------------------------------------------------------------------------
# Encoder (test-fixture grade: 4:4:4 or grayscale, Annex K tables)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.acc &= (1 << self.nbits) - 1  # trim emitted bits (bigint)
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per T.81


def _scale_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255)


def _quantize_image(img: np.ndarray, quality: int):
    """Shared encoder front half: color-convert, pad, DCT, quantize at
    4:4:4. Returns (gray, h, w, bw, bh, czz_list, qy, qc) where each
    czz is (bw*bh, 64) int64 quantized coefficients in ZIGZAG order."""
    img = np.asarray(img)
    gray = img.ndim == 2 or img.shape[2] == 1
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    h, w = img.shape[:2]
    qy = _scale_q(Q_LUMA.reshape(8, 8), quality)
    qc = _scale_q(Q_CHROMA.reshape(8, 8), quality)
    if gray:
        planes = [(img.astype(np.float64), qy)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [(y, qy), (cb, qc), (cr, qc)]
    bw, bh = (w + 7) // 8, (h + 7) // 8
    czz_list = []
    for plane, q in planes:
        padded = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
        blocks = (
            padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        quant = np.round(_dct2(blocks - 128.0) / q).astype(np.int64)
        czz_list.append(quant.reshape(-1, 64)[:, ZIGZAG])
    return gray, h, w, bw, bh, czz_list, qy, qc


def _emit_magnitude(writer, v, table):
    n = 0 if v == 0 else int(v).bit_length() if v > 0 else int(-v).bit_length()
    if n not in table:
        raise ValueError(f"magnitude {n} not in huffman table")
    length, code = table[n]
    writer.write(code, length)
    if n:
        writer.write(v if v >= 0 else v + (1 << n) - 1, n)


def encode_baseline_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 to baseline JPEG
    (4:4:4, Annex K tables scaled by ``quality``). Fixture-grade."""
    gray, h, w, bw, bh, czz_list, qy, qc = _quantize_image(img, quality)
    enc_dc = [
        _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
        _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    enc_ac = [
        _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS),
        _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]

    writer = _BitWriter()
    preds = [0] * len(czz_list)
    for bi in range(bh * bw):
        for ci, czz in enumerate(czz_list):
            tsel = 0 if ci == 0 else 1
            blk = czz[bi]
            diff = int(blk[0]) - preds[ci]
            preds[ci] = int(blk[0])
            _emit_magnitude(writer, diff, enc_dc[tsel])
            run = 0
            last_nz = 0
            for k in range(1, 64):
                if blk[k] != 0:
                    last_nz = k
            for k in range(1, last_nz + 1):
                v = int(blk[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    length, code = enc_ac[tsel][0xF0]
                    writer.write(code, length)
                    run -= 16
                n = v.bit_length() if v > 0 else (-v).bit_length()
                length, code = enc_ac[tsel][(run << 4) | n]
                writer.write(code, length)
                writer.write(v if v >= 0 else v + (1 << n) - 1, n)
                run = 0
            if last_nz < 63:
                length, code = enc_ac[tsel][0x00]  # EOB
                writer.write(code, length)
    writer.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def dqt(tid, q):
        # DQT payload is in zigzag order: raw[i] = natural[ZIGZAG[i]]
        z = q.reshape(64)[ZIGZAG].astype(np.uint8)
        return seg(0xDB, bytes([tid]) + z.tobytes())

    def dht(tc, th, bits, vals):
        return seg(0xC4, bytes([(tc << 4) | th] + bits + vals))

    ncomp = 1 if gray else 3
    sof_comps = b""
    sos_comps = b""
    for ci in range(ncomp):
        cid = ci + 1
        sof_comps += bytes([cid, 0x11, 0 if ci == 0 else 1])
        sos_comps += bytes([cid, 0x00 if ci == 0 else 0x11])
    out = b"\xff\xd8"
    out += dqt(0, qy)
    if not gray:
        out += dqt(1, qc)
    out += seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp]) + sof_comps)
    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    out += seg(0xDA, bytes([ncomp]) + sos_comps + bytes([0, 63, 0]))
    out += bytes(writer.out)
    out += b"\xff\xd9"
    return out


# ---------------------------------------------------------------------------
# Progressive encoder (test-fixture grade: grayscale or RGB 4:4:4).
#
# Scan script (libjpeg-style successive approximation):
#   1. DC first, all components interleaved, Al=1
#   2. per component: AC first Ss=1..5,  Al=1   (spectral selection)
#   3. per component: AC first Ss=6..63, Al=1
#   4. DC refinement, interleaved, Ah=1 -> Al=0
#   5. per component: AC refinement Ss=1..63, Ah=1 -> Al=0
# A complete script reconstructs the exact quantized coefficients, so
# decode(progressive) must bit-equal decode(baseline) for the same
# image/quality — the conformance test's backbone.
#
# The Annex K AC tables carry no EOBn (n>0) symbols, so the progressive
# scans use simple custom tables that do: 12 DC categories at 4 bits,
# and all 176 AC symbols a progressive scan can emit (EOB0..EOB14, ZRL,
# (run, size) for run 0..15 x size 1..10) at 8 bits each — canonical,
# Kraft-incomplete (176/256), decodable by any T.81 decoder.

PROG_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
PROG_DC_VALS = list(range(12))
PROG_AC_VALS = sorted(
    [r << 4 for r in range(15)]          # EOBn
    + [0xF0]                             # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(PROG_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


class _ProgressiveScanWriter:
    """Bit writer for one scan with restart-marker support: the caller
    declares unit boundaries; every `dri` units the stream is flushed,
    byte-aligned, and an RSTn emitted."""

    def __init__(self, dri: int):
        self.dri = dri
        self.w = _BitWriter()
        self.chunks: list[bytes] = []
        self.units = 0
        self.rst = 0
        self.on_restart = None  # callback: flush encoder state (EOB runs)

    def unit(self) -> bool:
        """Mark the start of a data unit; returns True if a restart was
        emitted (caller must reset DC predictors)."""
        restarted = False
        if self.dri and self.units and self.units % self.dri == 0:
            if self.on_restart is not None:
                self.on_restart()
            self.w.flush()
            self.chunks.append(bytes(self.w.out))
            self.w = _BitWriter()
            self.chunks.append(bytes([0xFF, 0xD0 + self.rst % 8]))
            self.rst += 1
            restarted = True
        self.units += 1
        return restarted

    def done(self) -> bytes:
        if self.on_restart is not None:
            self.on_restart()
        self.w.flush()
        self.chunks.append(bytes(self.w.out))
        return b"".join(self.chunks)


def _emit_prog_dc_first(czz_list, al, dri, enc_dc):
    sw = _ProgressiveScanWriter(dri)
    preds = [0] * len(czz_list)
    for bi in range(len(czz_list[0])):
        if sw.unit():
            preds = [0] * len(czz_list)
        for ci, czz in enumerate(czz_list):
            v = int(czz[bi][0]) >> al  # arithmetic shift per G.1.2.1
            _emit_magnitude(sw.w, v - preds[ci], enc_dc)
            preds[ci] = v
    return sw.done()


def _emit_prog_dc_refine(czz_list, al, dri):
    sw = _ProgressiveScanWriter(dri)
    for bi in range(len(czz_list[0])):
        sw.unit()
        for czz in czz_list:
            sw.w.write((int(czz[bi][0]) >> al) & 1, 1)
    return sw.done()


def _emit_prog_ac_first(czz, ss, se, al, dri, enc_ac):
    sw = _ProgressiveScanWriter(dri)
    state = {"eobrun": 0}

    def flush_eob():
        if state["eobrun"]:
            nb = state["eobrun"].bit_length() - 1
            length, code = enc_ac[nb << 4]
            sw.w.write(code, length)
            if nb:
                sw.w.write(state["eobrun"] - (1 << nb), nb)
            state["eobrun"] = 0

    sw.on_restart = flush_eob
    for bi in range(len(czz)):
        sw.unit()
        row = czz[bi]
        r = 0
        for k in range(ss, se + 1):
            v = int(row[k])
            v = (abs(v) >> al) * (1 if v >= 0 else -1)  # magnitude shift
            if v == 0:
                r += 1
                continue
            flush_eob()
            while r > 15:
                length, code = enc_ac[0xF0]
                sw.w.write(code, length)
                r -= 16
            n = abs(v).bit_length()
            length, code = enc_ac[(r << 4) | n]
            sw.w.write(code, length)
            sw.w.write(v if v >= 0 else v + (1 << n) - 1, n)
            r = 0
        if r > 0:
            state["eobrun"] += 1
            if state["eobrun"] == 0x7FFF:
                flush_eob()
    return sw.done()


def _emit_prog_ac_refine(czz, ss, se, al, dri, enc_ac):
    """T.81 G.1.2.3: correction bits for already-nonzero coefficients
    ride along with ZRL/newly-significant symbols and EOB runs."""
    sw = _ProgressiveScanWriter(dri)
    state = {"eobrun": 0, "pending": []}  # pending = cross-block correction bits

    def flush_eob():
        if state["eobrun"]:
            nb = state["eobrun"].bit_length() - 1
            length, code = enc_ac[nb << 4]
            sw.w.write(code, length)
            if nb:
                sw.w.write(state["eobrun"] - (1 << nb), nb)
            state["eobrun"] = 0
        for bit in state["pending"]:
            sw.w.write(bit, 1)
        state["pending"] = []

    sw.on_restart = flush_eob
    for bi in range(len(czz)):
        sw.unit()
        row = czz[bi]
        absv = [abs(int(row[k])) >> al for k in range(64)]
        eob = ss - 1  # position of last newly-significant coefficient
        for k in range(ss, se + 1):
            if absv[k] == 1:
                eob = k
        r = 0
        br: list[int] = []  # correction bits awaiting the next symbol
        for k in range(ss, se + 1):
            t = absv[k]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                flush_eob()
                length, code = enc_ac[0xF0]
                sw.w.write(code, length)
                r -= 16
                for bit in br:
                    sw.w.write(bit, 1)
                br = []
            if t > 1:  # previously nonzero: correction bit only
                br.append(t & 1)
                continue
            flush_eob()
            length, code = enc_ac[(r << 4) | 1]
            sw.w.write(code, length)
            sw.w.write(1 if int(row[k]) >= 0 else 0, 1)
            for bit in br:
                sw.w.write(bit, 1)
            br = []
            r = 0
        if r > 0 or br:
            state["eobrun"] += 1
            state["pending"].extend(br)
            if state["eobrun"] == 0x7FFF or len(state["pending"]) > 900:
                flush_eob()
    return sw.done()


def encode_progressive_jpeg(
    img: np.ndarray,
    quality: int = 90,
    restart_interval: int = 0,
    refine: bool = True,
) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 to a progressive
    (SOF2) JPEG with the successive-approximation scan script above.
    Fixture-grade (4:4:4). ``refine=False`` drops the two refinement
    scans, leaving a coarser Al=1 image — a legal truncated script that
    any progressive decoder must still render."""
    gray, h, w, bw, bh, czz_list, qy, qc = _quantize_image(img, quality)
    ncomp = 1 if gray else 3
    enc_dc = _build_encode_table(PROG_DC_BITS, PROG_DC_VALS)
    enc_ac = _build_encode_table(PROG_AC_BITS, PROG_AC_VALS)
    dri = restart_interval

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def dqt(tid, q):
        return seg(0xDB, bytes([tid]) + q.reshape(64)[ZIGZAG].astype(np.uint8).tobytes())

    out = b"\xff\xd8"
    out += dqt(0, qy)
    if not gray:
        out += dqt(1, qc)
    sof_comps = b"".join(
        bytes([ci + 1, 0x11, 0 if ci == 0 else 1]) for ci in range(ncomp)
    )
    out += seg(0xC2, bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp]) + sof_comps)
    out += seg(0xC4, bytes([0x00] + PROG_DC_BITS + PROG_DC_VALS))
    out += seg(0xC4, bytes([0x10] + PROG_AC_BITS + PROG_AC_VALS))
    if dri:
        out += seg(0xDD, struct.pack(">H", dri))

    def sos(comp_ids, ss, se, ah, al, data):
        hdr = bytes([len(comp_ids)])
        for cid in comp_ids:
            hdr += bytes([cid, 0x00])  # DC table 0 / AC table 0
        hdr += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, hdr) + data

    all_ids = list(range(1, ncomp + 1))
    # 1. DC first (interleaved), Al=1
    out += sos(all_ids, 0, 0, 0, 1, _emit_prog_dc_first(czz_list, 1, dri, enc_dc))
    # 2./3. AC first per component, split spectral bands, Al=1
    for ci, czz in enumerate(czz_list):
        out += sos([ci + 1], 1, 5, 0, 1, _emit_prog_ac_first(czz, 1, 5, 1, dri, enc_ac))
    for ci, czz in enumerate(czz_list):
        out += sos(
            [ci + 1], 6, 63, 0, 1, _emit_prog_ac_first(czz, 6, 63, 1, dri, enc_ac)
        )
    if refine:
        # 4. DC refinement (interleaved), Ah=1 -> Al=0
        out += sos(all_ids, 0, 0, 1, 0, _emit_prog_dc_refine(czz_list, 0, dri))
        # 5. AC refinement per component, full band, Ah=1 -> Al=0
        for ci, czz in enumerate(czz_list):
            out += sos(
                [ci + 1], 1, 63, 1, 0,
                _emit_prog_ac_refine(czz, 1, 63, 0, dri, enc_ac),
            )
    return out + b"\xff\xd9"


# ---------------------------------------------------------------------------
# Lossless encoder (fixture-grade twin of the Annex H decoder above).

#: Difference-category Huffman table covering SSSS 0-16 (16-bit
#: precision needs categories the Annex K DC tables stop short of):
#: canonical lengths 3 for categories 0-5, then 4..14 for 6-16.
LL_DIFF_BITS = [0, 0, 6, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0]
LL_DIFF_VALS = list(range(17))


def encode_jpeg_lossless(
    img: np.ndarray,
    precision: int = 8,
    predictor: int = 1,
    point_transform: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """Encode (h, w[, c]) unsigned samples to a lossless (SOF3) JPEG —
    T.81 Annex H DPCM with the selected predictor, point transform and
    optional restart markers. Fixture-grade: the conformance story is
    that `decode_jpeg_lossless(encode_jpeg_lossless(x)) == x >> Pt << Pt`
    must hold BIT-EXACTLY for every predictor/precision (lossless means
    the roundtrip is equality, not an error bound — a conjugate
    encoder/decoder bug cannot hide behind tolerance the way a DCT
    roundtrip can), plus hand-decoded minimal streams.
    """
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] > 4:
        raise ValueError("expected (h, w) or (h, w, c<=4) samples")
    if not 2 <= precision <= 16:
        raise ValueError("precision must be 2..16")
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1..7")
    if not 0 <= point_transform < precision:
        raise ValueError("point transform must be < precision")
    if arr.min() < 0 or arr.max() >= (1 << precision):
        raise ValueError("samples out of range for declared precision")
    h, w, ncomp = arr.shape
    samples = (arr.astype(np.int64) >> point_transform)
    default = 1 << (precision - point_transform - 1)
    m16 = (1 << 16) - 1
    enc = _build_encode_table(LL_DIFF_BITS, LL_DIFF_VALS)
    sw = _ProgressiveScanWriter(restart_interval)

    fresh = [True] * ncomp
    for y in range(h):
        for x in range(w):
            if sw.unit():
                fresh = [True] * ncomp
            for ci in range(ncomp):
                p = samples[:, :, ci]
                if fresh[ci]:
                    pred = default
                    fresh[ci] = False
                elif y == 0:
                    pred = p[0, x - 1] if x else default
                elif x == 0:
                    pred = p[y - 1, 0]
                else:
                    pred = _lossless_predict(
                        int(p[y, x - 1]), int(p[y - 1, x]),
                        int(p[y - 1, x - 1]), predictor,
                    )
                diff = (int(p[y, x]) - int(pred) + 32768) & m16
                diff -= 32768  # signed representative in [-32768, 32767]
                if diff == -32768:
                    s = 16  # category 16 carries no extra bits
                else:
                    s = abs(diff).bit_length()
                length, code = enc[s]
                sw.w.write(code, length)
                if 0 < s < 16:
                    sw.w.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    data = sw.done()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    n = sum(LL_DIFF_BITS)
    dht = seg(0xC4, bytes([0x00]) + bytes(LL_DIFF_BITS) + bytes(LL_DIFF_VALS[:n]))
    sof = seg(
        0xC3,
        bytes([precision]) + struct.pack(">HH", h, w) + bytes([ncomp])
        + b"".join(bytes([ci + 1, 0x11, 0x00]) for ci in range(ncomp)),
    )
    sos = seg(
        0xDA,
        bytes([ncomp])
        + b"".join(bytes([ci + 1, 0x00]) for ci in range(ncomp))
        + bytes([predictor, 0x00, point_transform]),
    )
    out = b"\xff\xd8" + dht + sof
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    return out + sos + data + b"\xff\xd9"
