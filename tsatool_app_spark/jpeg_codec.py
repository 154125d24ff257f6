"""Dependency-free baseline JPEG (ITU-T T.81 / JFIF) codec — numpy only.

Same role for JPEG that sinks_png plays for PNG and wav_codec for audio:
the container ships no image libraries (no PIL/libjpeg), but a real corpus
is mostly JPEG, so the multimodal decode kernels
(functions/multimodal.decode_image_batch) need a native path instead of an
import-gated stub.

Scope — the overwhelmingly common profiles:
- decode: baseline sequential DCT (SOF0) AND progressive (SOF2 — spectral
  selection, successive approximation incl. AC refinement and EOB runs),
  8-bit, grayscale or YCbCr with any h/v sampling factors in {1, 2}
  (4:4:4, 4:2:2, 4:4:0, 4:2:0), multiple DQT/DHT segments, restart
  markers (DRI/RSTn).
- encode: baseline (grayscale or RGB; 4:4:4 or 4:2:0; IJG quality scaling
  of the Annex K tables; optional restart interval) and progressive
  (4:4:4; DC+AC successive approximation — coefficient-identical to the
  baseline encoder, which pins the progressive decoder bit-for-bit in
  tests).
Lossless/arithmetic/hierarchical SOFs, 12-bit, and CMYK raise ValueError
with a clear message — they are rare in training corpora and callers can
route them to quarantine.

Per-block transforms are BATCHED numpy matmuls (one einsum over all blocks
of a component); only the Huffman bitstream walk is a Python loop — this
is a per-record kernel inside mapInPandas, never a driver-side loop.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constant tables (ITU-T T.81 Annex K) ---------------------------------

# zigzag order: raster index of the i-th zigzag coefficient
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

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

# orthonormal DCT-II basis: forward F = D @ B @ D.T, inverse B = D.T @ F @ D
_K = np.arange(8).reshape(8, 1)
_N = np.arange(8).reshape(1, 8)
DCT_D = np.cos((2 * _N + 1) * _K * np.pi / 16) * 0.5
DCT_D[0, :] *= 1 / np.sqrt(2)


def _scaled_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 → scaled Annex K table, clipped 1..255."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per the canonical JPEG code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol for the bitstream walk."""
    return {(l, c): s for s, (c, l) in _canonical_codes(bits, vals).items()}


_ANNEX_K_DECODE: dict[tuple[int, int], dict[tuple[int, int], int]] = {}


def _annex_k_tables() -> dict[tuple[int, int], dict[tuple[int, int], int]]:
    """Fixed T.81 Annex-K Huffman decode tables, built lazily once — the
    fallback MJPEG demands.  MJPEG-AVI frames routinely omit the DHT
    segment; the OpenDML spec says decoders supply these (the same
    constants this module's encoder writes)."""
    if not _ANNEX_K_DECODE:
        _ANNEX_K_DECODE.update(
            {
                (0, 0): _decode_table(DC_LUMA_BITS, DC_LUMA_VALS),
                (0, 1): _decode_table(DC_CHROMA_BITS, DC_CHROMA_VALS),
                (1, 0): _decode_table(AC_LUMA_BITS, AC_LUMA_VALS),
                (1, 1): _decode_table(AC_CHROMA_BITS, AC_CHROMA_VALS),
            }
        )
    return _ANNEX_K_DECODE


def _htab(
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]], tc: int, th: int
) -> dict[tuple[int, int], int]:
    """Strict Huffman table lookup: an undefined slot is a malformed
    stream and raises the codec's ValueError contract.  The Annex-K
    MJPEG fallback is OPT-IN via decode_jpeg(..., mjpeg_tables=True) —
    seeded into ``htabs`` at SOS time — so a standalone JPEG whose DHT
    was lost to corruption raises instead of decoding to garbage pixels
    with slots 0/1 (r5 ADVICE)."""
    t = htabs.get((tc, th))
    if t is None:
        raise ValueError(
            f"scan references undefined Huffman table (class={tc}, id={th})"
        )
    return t


# --- bit I/O ----------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # 1-fill


class _BitReader:
    """Entropy-coded-segment reader: un-stuffs 0xFF00, stops AT markers
    (caller consumes RSTn and resumes)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG stream")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG stream")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                return False  # real marker — not data
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise ValueError("hit marker while expecting entropy data")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self, n: int) -> None:
        """Discard partial byte, consume the RSTn marker."""
        self.nbits = 0
        self.acc = 0
        if self.pos + 1 >= len(self.data):
            raise ValueError("truncated JPEG stream")
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != 0xD0 + (n % 8):
            raise ValueError("expected restart marker")
        self.pos += 2

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _receive_extend(r: _BitReader, size: int) -> int:
    if size == 0:
        return 0
    v = r.read_bits(size)
    if v < (1 << (size - 1)):
        v -= (1 << size) - 1
    return v


# --- color transforms -------------------------------------------------------


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0].astype(np.float64), rgb[..., 1].astype(np.float64), rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H, W multiples of 8 → (n_blocks, 8, 8), row-major MCUs."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _from_blocks(blocks: np.ndarray, h8: int, w8: int) -> np.ndarray:
    return (
        blocks.reshape(h8 // 8, w8 // 8, 8, 8).transpose(0, 2, 1, 3).reshape(h8, w8)
    )


# --- encoder -----------------------------------------------------------------


def _encode_block(
    zz: np.ndarray,
    prev_dc: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    w: _BitWriter,
) -> int:
    dc = int(zz[0])
    diff = dc - prev_dc
    size = int(diff).bit_length() if diff else 0
    code, length = dc_codes[size]
    w.write(code, length)
    if size:
        bits = diff if diff > 0 else diff + (1 << size) - 1
        w.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if i > last_nz:
            c, l = ac_codes[0x00]  # EOB
            w.write(c, l)
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l = ac_codes[0xF0]  # ZRL
            w.write(c, l)
            run -= 16
        size = int(abs(v)).bit_length()
        c, l = ac_codes[(run << 4) | size]
        w.write(c, l)
        bits = v if v > 0 else v + (1 << size) - 1
        w.write(bits, size)
        run = 0
    return dc


def encode_jpeg_baseline(
    img: np.ndarray,
    *,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """uint8 array (H, W) grayscale or (H, W, 3) RGB → baseline JFIF bytes.

    ``subsample=True`` encodes 4:2:0 (2×2 chroma subsampling by box
    average) — exercises the decoder's interleaved-MCU/upsample path;
    default 4:4:4. ``restart_interval`` > 0 emits DRI + RSTn markers every
    that many MCUs."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("expected uint8 (H, W) or (H, W, 3)")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")

    qt_l = _scaled_quant(QUANT_LUMA, quality)
    qt_c = _scaled_quant(QUANT_CHROMA, quality)

    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qts = [qt_l]
    else:
        ycc = _rgb_to_ycbcr(img)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample:
            # pad to even, 2x2 box average
            ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            def _half(p):
                pp = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
                return (pp[0::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 0::2] + pp[1::2, 1::2]) / 4.0
            planes = [y, _half(cb), _half(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        qts = [qt_l, qt_c, qt_c]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # Pad each plane to its MCU grid and produce per-block zigzag coeffs.
    comp_zz = []
    for plane, (sh, sv), qt in zip(planes, samp, qts):
        th, tw = mcus_y * sv * 8, mcus_x * sh * 8
        ph, pw = plane.shape
        pp = np.pad(plane, ((0, th - ph), (0, tw - pw)), mode="edge")
        blocks = _to_blocks(pp - 128.0)
        coefs = np.einsum("ij,njk,lk->nil", DCT_D, blocks, DCT_D)
        q = np.round(coefs / qt.reshape(8, 8)).astype(np.int64)
        zz = q.reshape(-1, 64)[:, ZIGZAG]
        comp_zz.append((zz, tw // 8, sh, sv))

    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    huff = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (len(planes) - 1)

    wtr = _BitWriter()
    prev = [0] * len(planes)
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wtr.pad_to_byte()
                wtr.out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                prev = [0] * len(planes)
            for ci, (zz, bw, sh, sv) in enumerate(comp_zz):
                for by in range(sv):
                    for bx in range(sh):
                        bi = (my * sv + by) * bw + (mx * sh + bx)
                        prev[ci] = _encode_block(
                            zz[bi], prev[ci], huff[ci][0], huff[ci][1], wtr
                        )
            mcu_count += 1
    wtr.pad_to_byte()

    # --- headers ---
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(qt_l[ZIGZAG].tolist()))
    if not gray:
        out += seg(0xDB, bytes([1]) + bytes(qt_c[ZIGZAG].tolist()))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    if not gray:
        out += seg(0xC4, bytes([0x01]) + bytes(DC_CHROMA_BITS) + bytes(DC_CHROMA_VALS))
        out += seg(0xC4, bytes([0x11]) + bytes(AC_CHROMA_BITS) + bytes(AC_CHROMA_VALS))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# Near-flat AC Huffman table covering every symbol: progressive AC scans
# need EOBn symbols (0x10..0xE0) that the Annex-K baseline tables lack
# (libjpeg always custom-optimizes tables for progressive output for the
# same reason). 255 canonical codes at length 9 plus one at length 10 stay
# inside the code space (DHT Li fields are single bytes, so 256-at-9 is
# unrepresentable anyway) and clear of the all-ones reserved code; the
# decoder reads it from DHT like any other table.
_FLAT_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
_FLAT_AC_VALS = list(range(256))


def encode_jpeg_progressive(img: np.ndarray, *, quality: int = 90) -> bytes:
    """uint8 (H, W) or (H, W, 3) → PROGRESSIVE JFIF (SOF2) bytes.

    Scan script (spectral selection + one successive-approximation step,
    the common libjpeg shape in miniature): interleaved DC first pass at
    Al=1, DC refinement, then per component an AC 1..63 first pass at
    Al=1 and an AC refinement — with real EOB-run accumulation and
    correction-bit encoding (T.81 G.7.2), so the decoder's progressive
    paths are exercised by genuine streams, not toy ones. 4:4:4 only;
    coefficient-identical to the baseline encoder at the same quality,
    which makes decode(progressive(x)) ≡ decode(baseline(x)) testable
    bit-for-bit."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("expected uint8 (H, W) or (H, W, 3)")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qt_l = _scaled_quant(QUANT_LUMA, quality)
    qt_c = _scaled_quant(QUANT_CHROMA, quality)
    if gray:
        planes = [img.astype(np.float64)]
        qts = [qt_l]
    else:
        ycc = _rgb_to_ycbcr(img)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        qts = [qt_l, qt_c, qt_c]
    ncomp = len(planes)
    mcus_x, mcus_y = -(-w // 8), -(-h // 8)
    nblocks = mcus_x * mcus_y

    comp_zz = []
    for plane, qt in zip(planes, qts):
        pp = np.pad(
            plane, ((0, mcus_y * 8 - h), (0, mcus_x * 8 - w)), mode="edge"
        )
        blocks = _to_blocks(pp - 128.0)
        coefs = np.einsum("ij,njk,lk->nil", DCT_D, blocks, DCT_D)
        q = np.round(coefs / qt.reshape(8, 8)).astype(np.int64)
        comp_zz.append(q.reshape(-1, 64)[:, ZIGZAG])

    dc_codes = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)] + [
        _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ] * (ncomp - 1)
    ac_flat = _canonical_codes(_FLAT_AC_BITS, _FLAT_AC_VALS)
    AL = 1

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def sos(comps_spec, ss, se, ah, al):
        body = bytes([len(comps_spec)])
        for cid, tsel in comps_spec:
            body += bytes([cid, tsel])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(qt_l[ZIGZAG].tolist()))
    if not gray:
        out += seg(0xDB, bytes([1]) + bytes(qt_c[ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC2, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    if not gray:
        out += seg(
            0xC4, bytes([0x01]) + bytes(DC_CHROMA_BITS) + bytes(DC_CHROMA_VALS)
        )
    out += seg(
        0xC4, bytes([0x10]) + bytes(_FLAT_AC_BITS) + bytes(_FLAT_AC_VALS)
    )

    # scan 1: DC first pass, interleaved, Al=AL
    wtr = _BitWriter()
    prev = [0] * ncomp
    for bi in range(nblocks):
        for ci in range(ncomp):
            dc = int(comp_zz[ci][bi, 0]) >> AL  # arithmetic shift, like decode
            diff = dc - prev[ci]
            prev[ci] = dc
            size = abs(diff).bit_length()
            code, ln = dc_codes[ci][size]
            wtr.write(code, ln)
            if size:
                wtr.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    wtr.pad_to_byte()
    out += sos([(ci + 1, (0x00 if ci == 0 else 0x10)) for ci in range(ncomp)],
               0, 0, 0, AL)
    out += wtr.out

    # scan 2: DC refinement, Ah=AL, Al=0 — one raw bit per block
    wtr = _BitWriter()
    for bi in range(nblocks):
        for ci in range(ncomp):
            wtr.write(int(comp_zz[ci][bi, 0]) & 1, 1)
    wtr.pad_to_byte()
    out += sos([(ci + 1, (0x00 if ci == 0 else 0x10)) for ci in range(ncomp)],
               0, 0, AL, 0)
    out += wtr.out

    # per component: AC first pass then AC refinement
    for ci in range(ncomp):
        out += sos([(ci + 1, 0x00)], 1, 63, 0, AL)
        out += _encode_ac_first(comp_zz[ci], ac_flat, AL)
        out += sos([(ci + 1, 0x00)], 1, 63, AL, 0)
        out += _encode_ac_refine(comp_zz[ci], ac_flat, AL)
    out += b"\xff\xd9"
    return bytes(out)


def _emit_eobrun(wtr, ac_codes, eobrun, pending_bits):
    if eobrun > 0:
        nbits = eobrun.bit_length() - 1
        code, ln = ac_codes[nbits << 4]
        wtr.write(code, ln)
        if nbits:
            wtr.write(eobrun - (1 << nbits), nbits)
        for b in pending_bits:
            wtr.write(b, 1)
        pending_bits.clear()
    return 0


def _encode_ac_first(zzs, ac_codes, al) -> bytes:
    """AC first pass (Ss=1..63, Ah=0): baseline-style run/size coding plus
    cross-block EOB-run accumulation."""
    wtr = _BitWriter()
    eobrun = 0
    for zz in zzs:
        vals = [
            int(v) >> al if v >= 0 else -((-int(v)) >> al) for v in zz[1:64]
        ]  # point transform truncates toward zero
        if not any(vals):
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _emit_eobrun(wtr, ac_codes, eobrun, [])
            continue
        eobrun = _emit_eobrun(wtr, ac_codes, eobrun, [])
        run = 0
        for v in vals:
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]
                wtr.write(code, ln)
                run -= 16
            s = abs(v).bit_length()
            code, ln = ac_codes[(run << 4) | s]
            wtr.write(code, ln)
            wtr.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if run > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _emit_eobrun(wtr, ac_codes, eobrun, [])
    _emit_eobrun(wtr, ac_codes, eobrun, [])
    wtr.pad_to_byte()
    return bytes(wtr.out)


def _encode_ac_refine(zzs, ac_codes, al) -> bytes:
    """AC refinement pass (Ah=al, Al=0): T.81 G.7.2 — newly-significant
    coefficients as (run, 1) symbols with sign bits, correction bits for
    already-significant coefficients interleaved in positional order,
    EOB runs carrying their buffered correction bits."""
    wtr = _BitWriter()
    pending_eob = 0
    pending_bits: list[int] = []
    for zz in zzs:
        coef = [int(v) for v in zz[1:64]]
        absv = [abs(v) for v in coef]  # >> Al with Al=0
        eobpos = -1
        for i, a in enumerate(absv):
            if a == 1:
                eobpos = i
        run = 0
        br: list[int] = []
        for i, a in enumerate(absv):
            if a == 0:
                run += 1
                continue
            while run > 15 and i <= eobpos:
                pending_eob = _emit_eobrun(wtr, ac_codes, pending_eob, pending_bits)
                code, ln = ac_codes[0xF0]
                wtr.write(code, ln)
                for b in br:
                    wtr.write(b, 1)
                br = []
                run -= 16
            if a > 1:
                br.append(a & 1)  # correction bit for already-significant coef
                continue
            pending_eob = _emit_eobrun(wtr, ac_codes, pending_eob, pending_bits)
            code, ln = ac_codes[(run << 4) | 1]
            wtr.write(code, ln)
            wtr.write(1 if coef[i] > 0 else 0, 1)
            for b in br:
                wtr.write(b, 1)
            br = []
            run = 0
        if run > 0 or br:
            pending_eob += 1
            pending_bits.extend(br)
            if pending_eob == 0x7FFF:
                pending_eob = _emit_eobrun(wtr, ac_codes, pending_eob, pending_bits)
    _emit_eobrun(wtr, ac_codes, pending_eob, pending_bits)
    wtr.pad_to_byte()
    return bytes(wtr.out)


# --- decoder -----------------------------------------------------------------


def decode_jpeg(data: bytes, *, mjpeg_tables: bool = False) -> np.ndarray:
    """JFIF bytes → uint8 ndarray (H, W, C), C = 1 or 3.

    Supports baseline sequential (SOF0) and PROGRESSIVE (SOF2) — spectral
    selection, successive approximation (DC and AC refinement scans,
    EOB-run decoding), interleaved DC scans and single-component AC
    scans, per ITU-T T.81 Annex G. See module docstring for the overall
    profile. Cited for parity: nothing in the reference decodes images —
    this is beyond-reference surface for the multimodal pipeline.

    ``mjpeg_tables=True`` enables the OpenDML MJPEG behavior: a scan
    referencing a Huffman table slot no DHT defined falls back to the
    fixed T.81 Annex-K tables (MJPEG-AVI frames routinely omit DHT).
    The default is STRICT — a standalone JPEG missing its DHT is treated
    as corrupt and raises, instead of silently decoding to garbage
    pixels with the slot-0/1 defaults; AVI frame pipelines opt in
    (functions/multimodal.decode_image_batch(mjpeg_tables=True)).

    Error contract: every malformed/truncated/unsupported stream raises
    ValueError — corpus-scale pipelines catch ONE exception type and
    route bad blobs to quarantine instead of dying on an opaque
    IndexError inside a mapInPandas batch."""
    try:
        return _decode_jpeg_impl(data, mjpeg_tables=mjpeg_tables)
    except (IndexError, struct.error):
        raise ValueError("truncated JPEG stream") from None


def _decode_jpeg_impl(data: bytes, *, mjpeg_tables: bool = False) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    progressive = False
    restart_interval = 0
    store = None
    geom = None
    eobrun_box = [0]

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        while data[pos + 1] == 0xFF:  # optional fill bytes before a marker
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):
            continue  # standalone
        (length,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2 : pos + length]
        pos += length
        if marker == 0xDB:  # DQT
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tab = np.frombuffer(body, np.uint8, 64, bp + 1).astype(np.int64)
                raster = np.empty(64, np.int64)
                raster[ZIGZAG] = tab
                qtabs[tq] = raster
                bp += 65
        elif marker == 0xC4:  # DHT
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 0x0F
                bits = list(body[bp + 1 : bp + 17])
                n = sum(bits)
                vals = list(body[bp + 17 : bp + 17 + n])
                htabs[(tc, th)] = _decode_table(bits, vals)
                bp += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = (fh, fw, comps)
            progressive = marker == 0xC2
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (SOF{marker - 0xC0}); baseline "
                "sequential (SOF0) and progressive (SOF2) only"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            frame_ids = {c["id"] for c in frame[2]}
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                if cs not in frame_ids:
                    raise ValueError(
                        f"scan references component id {cs} absent from frame"
                    )
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            if mjpeg_tables:
                # OpenDML MJPEG: undefined slots referenced by this scan
                # get the fixed Annex-K tables (a later DHT still wins
                # for later scans — DHT parsing overwrites the slot).
                for _, td, ta in scan:
                    for slot in ((0, td), (1, ta)):
                        if slot not in htabs and slot in _annex_k_tables():
                            htabs[slot] = _annex_k_tables()[slot]
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if not progressive:
                if store is None:
                    store, geom = _alloc_stores(frame)
                pos = _decode_baseline_scan(
                    data, pos, frame, scan, htabs, store, geom, restart_interval
                )
                return _reconstruct(frame, qtabs, store, geom)
            if store is None:
                store, geom = _alloc_stores(frame)
            eobrun_box[0] = 0  # EOB runs never cross scan boundaries
            pos = _decode_progressive_scan(
                data, pos, frame, scan, (ss, se, ah, al), htabs,
                store, geom, restart_interval, eobrun_box,
            )
        else:
            pass  # APPn / COM / unknown length-prefixed segments: skipped
    if progressive and store is not None:
        return _reconstruct(frame, qtabs, store, geom)
    raise ValueError("no scan data found")


# Back-compat name: the original entry point decoded baseline only; the
# same function now also handles progressive streams.
decode_jpeg_baseline = decode_jpeg


def _alloc_stores(frame):
    """Per-component zigzag coefficient arrays + shared geometry."""
    fh, fw, comps = frame
    if fh == 0 or fw == 0:
        raise ValueError("empty frame")
    if not all(c["h"] in (1, 2) and c["v"] in (1, 2) for c in comps):
        raise ValueError("sampling factors beyond 2 unsupported")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    store = {}
    for c in comps:
        bw, bh = mcus_x * c["h"], mcus_y * c["v"]
        store[c["id"]] = np.zeros((bh * bw, 64), np.int64)
    return store, (hmax, vmax, mcus_x, mcus_y)


def _decode_baseline_scan(data, pos, frame, scan, htabs, store, geom, restart_interval):
    fh, fw, comps = frame
    by_id = {c["id"]: c for c in comps}
    order = [by_id[cs] for cs, _, _ in scan]
    tables = {cs: (_htab(htabs, 0, td), _htab(htabs, 1, ta)) for cs, td, ta in scan}
    hmax, vmax, mcus_x, mcus_y = geom

    r = _BitReader(data, pos)
    prev = {c["id"]: 0 for c in comps}
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            r.align_and_expect_rst(rst)
            rst += 1
            prev = {c["id"]: 0 for c in comps}
        my, mx = divmod(mcu, mcus_x)
        for c in order:
            dc_t, ac_t = tables[c["id"]]
            zz_store = store[c["id"]]
            bw = mcus_x * c["h"]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64, np.int64)
                    size = r.decode_symbol(dc_t)
                    prev[c["id"]] += _receive_extend(r, size)
                    zz[0] = prev[c["id"]]
                    k = 1
                    while k < 64:
                        rs = r.decode_symbol(ac_t)
                        run, size = rs >> 4, rs & 0x0F
                        if size == 0:
                            if run == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += run
                        if k > 63:
                            raise ValueError("AC index overflow")
                        zz[k] = _receive_extend(r, size)
                        k += 1
                    zz_store[(my * c["v"] + by) * bw + (mx * c["h"] + bx)] = zz
    return r.pos


def _decode_progressive_scan(
    data, pos, frame, scan, band, htabs, store, geom, restart_interval, eobrun_box
):
    """One progressive scan (T.81 Annex G decode): DC scans may be
    interleaved over several components; AC scans cover exactly one
    component's own block grid. Coefficients accumulate across scans in
    ``store``; returns the stream position after the scan."""
    fh, fw, comps = frame
    ss, se, ah, al = band
    by_id = {c["id"]: c for c in comps}
    hmax, vmax, mcus_x, mcus_y = geom
    r = _BitReader(data, pos)
    rst_box = [0]

    def maybe_restart(i, reset_pred):
        if restart_interval and i and i % restart_interval == 0:
            r.align_and_expect_rst(rst_box[0])
            rst_box[0] += 1
            eobrun_box[0] = 0
            reset_pred()

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("invalid progressive scan: DC mixed with AC band")
        order = [by_id[cs] for cs, _, _ in scan]
        tables = {cs: _htab(htabs, 0, td) for cs, td, _ in scan}
        prev = {c["id"]: 0 for c in order}

        def reset():
            for cid in prev:
                prev[cid] = 0

        for mcu in range(mcus_x * mcus_y):
            maybe_restart(mcu, reset)
            my, mx = divmod(mcu, mcus_x)
            for c in order:
                zz_store = store[c["id"]]
                bw = mcus_x * c["h"]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        bi = (my * c["v"] + by) * bw + (mx * c["h"] + bx)
                        if ah == 0:
                            size = r.decode_symbol(tables[c["id"]])
                            prev[c["id"]] += _receive_extend(r, size)
                            zz_store[bi, 0] = prev[c["id"]] << al
                        elif r.read_bit():
                            zz_store[bi, 0] |= 1 << al
        return r.pos

    # AC scan: single component, its OWN block grid (non-interleaved)
    if len(scan) != 1:
        raise ValueError("progressive AC scan must cover exactly one component")
    cs, _, ta = scan[0]
    c = by_id[cs]
    ac_t = _htab(htabs, 1, ta)
    zz_store = store[cs]
    bw = mcus_x * c["h"]
    sx = -(-fw * c["h"] // hmax)  # component samples per row (ceil)
    sy = -(-fh * c["v"] // vmax)
    cw = -(-sx // 8)  # component's own block grid (non-interleaved scan)
    ch = -(-sy // 8)
    p1, m1 = 1 << al, -(1 << al)

    bi_iter = [
        by * bw + bx for by in range(ch) for bx in range(cw)
    ]
    for i, bi in enumerate(bi_iter):
        maybe_restart(i, lambda: None)
        zz = zz_store[bi]
        if ah == 0:  # first pass for this band
            if eobrun_box[0] > 0:
                eobrun_box[0] -= 1
                continue
            k = ss
            while k <= se:
                rs = r.decode_symbol(ac_t)
                run, size = rs >> 4, rs & 0x0F
                if size == 0:
                    if run == 15:
                        k += 16  # ZRL
                        continue
                    eobrun_box[0] = (1 << run) - 1
                    if run:
                        eobrun_box[0] += r.read_bits(run)
                    break
                k += run
                if k > se:
                    raise ValueError("AC index overflow")
                zz[k] = _receive_extend(r, size) << al
                k += 1
        else:  # refinement pass (T.81 G.7.2 / libjpeg-style)
            k = ss
            if eobrun_box[0] == 0:
                while k <= se:
                    rs = r.decode_symbol(ac_t)
                    run, size = rs >> 4, rs & 0x0F
                    if size == 0:
                        if run < 15:
                            # FULL count here (unlike the first-pass branch):
                            # this block still flows through the refinement
                            # tail below, whose decrement accounts for it.
                            eobrun_box[0] = 1 << run
                            if run:
                                eobrun_box[0] += r.read_bits(run)
                            break
                        val = 0  # ZRL: 16 zero-history positions
                    else:
                        if size != 1:
                            raise ValueError("invalid refinement magnitude")
                        val = p1 if r.read_bit() else m1
                    while k <= se:
                        if zz[k] != 0:
                            if r.read_bit() and (zz[k] & p1) == 0:
                                zz[k] += p1 if zz[k] > 0 else m1
                        else:
                            if run == 0:
                                if val:
                                    zz[k] = val
                                k += 1
                                break
                            run -= 1
                        k += 1
            if eobrun_box[0] > 0:
                while k <= se:
                    if zz[k] != 0 and r.read_bit() and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] > 0 else m1
                    k += 1
                eobrun_box[0] -= 1
    return r.pos


def _reconstruct(frame, qtabs, store, geom):
    """Dequant + batched IDCT + upsample + color transform."""
    fh, fw, comps = frame
    hmax, vmax, mcus_x, mcus_y = geom
    planes = {}
    for c in comps:
        qt = qtabs[c["tq"]]
        zz = store[c["id"]]
        raster = zz[:, UNZIGZAG] * qt  # back to raster order, dequantized
        blocks = raster.reshape(-1, 8, 8).astype(np.float64)
        px = np.einsum("ji,njk,kl->nil", DCT_D, blocks, DCT_D) + 128.0
        bw, bh = mcus_x * c["h"], mcus_y * c["v"]
        plane = _from_blocks(px, bh * 8, bw * 8)
        # upsample to full-resolution grid
        if c["h"] < hmax:
            plane = np.repeat(plane, hmax // c["h"], axis=1)
        if c["v"] < vmax:
            plane = np.repeat(plane, vmax // c["v"], axis=0)
        planes[c["id"]] = plane[:fh, :fw]

    if len(comps) == 1:
        y = np.clip(planes[comps[0]["id"]].round(), 0, 255).astype(np.uint8)
        return y[:, :, None]
    if len(comps) == 3:
        ids = [c["id"] for c in comps]
        return _ycbcr_to_rgb(planes[ids[0]], planes[ids[1]], planes[ids[2]])
    raise ValueError(f"{len(comps)}-component JPEG unsupported (CMYK?)")
