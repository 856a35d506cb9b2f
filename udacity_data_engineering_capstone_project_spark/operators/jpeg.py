"""Baseline JPEG codec (pure Python + numpy) — closes the honest gap
that JPEG payloads were header-parse only (`parse_image_meta`) without
PIL.

Scope: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr with
4:4:4 / 4:2:0 / 4:2:2 subsampling, restart markers, byte stuffing.
Progressive (SOF2) and arithmetic coding are out of scope — they
raise, and callers fall back to their null-on-garbage contract.

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

    def _fill(self):
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.buf = (self.buf << 8) | 0
                self.nbits += 8
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


# ---------------------------------------------------------------------------
# Decoder


def decode_baseline_jpeg(b: bytes):
    """Decode a baseline-sequential JPEG to (w, h, channels,
    np.uint8 array (h, w, channels)). Raises ValueError on anything
    outside baseline scope (progressive, 12-bit, arithmetic)."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
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
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                table = _build_decode_table(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            precision = seg[0]
            if precision != 8:
                raise ValueError("only 8-bit JPEG supported")
            h = struct.unpack(">H", seg[1:3])[0]
            w = struct.unpack(">H", seg[3:5])[0]
            ncomp = seg[5]
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = seg[6 + ci * 3 : 9 + ci * 3]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("non-baseline JPEG (progressive/arith) unsupported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_sel = {}
            for si in range(ns):
                cs, tds = seg[1 + si * 2 : 3 + si * 2]
                scan_sel[cs] = (tds >> 4, tds & 0x0F)
            data_pos = pos + 2 + seg_len
            return _decode_scan(
                b, data_pos, frame, scan_sel, qtables, huff_dc, huff_ac,
                restart_interval,
            )
        pos += 2 + seg_len
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(b, pos, frame, scan_sel, qtables, huff_dc, huff_ac, dri):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    for c in comps:
        if c["id"] not in scan_sel:
            raise ValueError(f"JPEG scan missing component {c['id']}")
        tdc, tac = scan_sel[c["id"]]
        if tdc not in huff_dc or tac not in huff_ac:
            raise ValueError("JPEG scan references undefined huffman table")
        if c["tq"] not in qtables:
            raise ValueError("JPEG component references undefined quant table")
        if c["h"] not in (1, 2, 4) or c["v"] not in (1, 2, 4):
            raise ValueError("unsupported JPEG sampling factors")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    reader = _BitReader(b, pos)
    # per component: coefficient block grid
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 8, 8), dtype=np.float64)
        c["pred"] = 0
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and n_mcu and n_mcu % dri == 0:
                reader.sync_restart()
                for c in comps:
                    c["pred"] = 0
            n_mcu += 1
            for c in comps:
                tdc, tac = scan_sel[c["id"]]
                dct, act = huff_dc[tdc], huff_ac[tac]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        ssss = reader.decode_symbol(dct)
                        diff = _extend(reader.read_bits(ssss), ssss)
                        c["pred"] += diff
                        zz[0] = c["pred"]
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
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        blk = np.zeros(64, dtype=np.int64)
                        blk[ZIGZAG] = zz
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        c["coef"][row * c["bw"] + col] = blk.reshape(8, 8)
    # dequantize + IDCT + assemble planes
    planes = []
    for c in comps:
        q = qtables[c["tq"]]
        pix = _idct2(c["coef"] * q) + 128.0
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


def encode_baseline_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 to baseline JPEG
    (4:4:4, Annex K tables scaled by ``quality``). Fixture-grade."""
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
    enc_dc = [
        _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
        _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    enc_ac = [
        _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS),
        _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]

    writer = _BitWriter()
    preds = [0] * len(planes)
    quant_blocks = []
    for plane, q in planes:
        padded = np.pad(
            plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge"
        )
        blocks = (
            padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        coefs = _dct2(blocks - 128.0)
        quant_blocks.append(np.round(coefs / q).astype(np.int64))

    def emit_magnitude(writer, v, table):
        n = 0 if v == 0 else int(v).bit_length() if v > 0 else int(-v).bit_length()
        length, code = table[n] if n in table else (None, None)
        if length is None:
            raise ValueError(f"magnitude {n} not in huffman table")
        writer.write(code, length)
        if n:
            writer.write(v if v >= 0 else v + (1 << n) - 1, n)

    for bi in range(bh * bw):
        for ci, blocks in enumerate(quant_blocks):
            tsel = 0 if ci == 0 else 1
            blk = blocks[bi].reshape(64)[ZIGZAG]
            diff = int(blk[0]) - preds[ci]
            preds[ci] = int(blk[0])
            emit_magnitude(writer, diff, enc_dc[tsel])
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
