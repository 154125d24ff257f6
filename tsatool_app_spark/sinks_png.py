"""Dependency-free PNG encoding + timeline-Gantt rasterization (S8).

The reference draws per-condition validity timelines with matplotlib's
broken_barh (/root/reference/tsa/condition.py:448-554). matplotlib is not
available in this container, but PNG needs nothing beyond zlib (stdlib) and
the Gantt geometry is a few filled rectangles — so this module renders the
same chart natively:

- :func:`encode_png` — RGB8 ndarray → PNG bytes (IHDR/IDAT/IEND, filter 0);
- :func:`render_timeline_png` — the reference's segment rows (series ×
  [vfrom, vuntil) × color) → raster. Series labels are rendered with a
  built-in 5×7 pixel font (uppercase/digits/punctuation), time gridlines at
  day boundaries; colors are the reference's exact
  red/blue/grey (#f03b20 / #2b83ba / #bababa).

Driver-side by design: a timeline is 10¹-10⁴ runs, never raw readings.
"""

from __future__ import annotations

import struct
import zlib
from datetime import datetime, timedelta

import numpy as np

# 5x7 bitmap font (public-domain "mini" glyph shapes), one 35-bit string per
# char: rows top→bottom, 5 bits per row, '1' = pixel on.
_GLYPHS = {
    "A": "01110100011000111111100011000110001",
    "B": "11110100011000111110100011000111110",
    "C": "01110100011000010000100001000101110",
    "D": "11100100101000110001100011001011100",
    "E": "11111100001000011110100001000011111",
    "F": "11111100001000011110100001000010000",
    "G": "01110100011000010111100011000101111",
    "H": "10001100011000111111100011000110001",
    "I": "01110001000010000100001000010001110",
    "J": "00111000100001000010000101001001100",
    "K": "10001100101010011000101001001010001",
    "L": "10000100001000010000100001000011111",
    "M": "10001110111010110101100011000110001",
    "N": "10001110011010110011100011000110001",
    "O": "01110100011000110001100011000101110",
    "P": "11110100011000111110100001000010000",
    "Q": "01110100011000110001101011001001101",
    "R": "11110100011000111110101001001010001",
    "S": "01111100001000001110000010000111110",
    "T": "11111001000010000100001000010000100",
    "U": "10001100011000110001100011000101110",
    "V": "10001100011000110001100010101000100",
    "W": "10001100011000110101101011101110001",
    "X": "10001100010101000100010101000110001",
    "Y": "10001100010101000100001000010000100",
    "Z": "11111000010001000100010001000011111",
    "0": "01110100111001110101110011100101110",
    "1": "00100011000010000100001000010001110",
    "2": "01110100010000100110010001000011111",
    "3": "01110100010000100110000011000101110",
    "4": "00010001100101010010111110001000010",
    "5": "11111100001111000001000011000101110",
    "6": "00110010001000011110100011000101110",
    "7": "11111000010001000100010001000010000",
    "8": "01110100011000101110100011000101110",
    "9": "01110100011000101111000010001001100",
    "_": "00000000000000000000000000000011111",
    "-": "00000000000000001110000000000000000",
    ".": "00000000000000000000000000110001100",
    "#": "01010111110101001010010101111101010",
    " ": "00000000000000000000000000000000000",
}


def encode_png(rgb: np.ndarray) -> bytes:
    """RGB uint8 array (H, W, 3) → PNG bytes (color type 2, no filter)."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("expected (H, W, 3) uint8")
    h, w = rgb.shape[:2]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), rgb.reshape(h, w * 3)], axis=1
    ).tobytes()  # filter byte 0 per scanline
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 ndarray (H, W, C) — the inverse of
    :func:`encode_png`, but general: all five scanline filter types
    (None/Sub/Up/Average/Paeth), color types 0 (grey), 2 (RGB) and
    6 (RGBA), multiple IDAT chunks. 8-bit, non-interlaced only (the
    overwhelmingly common profile; Adam7 and 16-bit raise ValueError).

    This un-gates PNG for the multimodal decode kernels
    (functions/multimodal.py): the container has no image libraries, but
    PNG needs nothing beyond zlib."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + tag + data + crc
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        elif tag == b"PLTE":
            raise ValueError("palette PNG not supported")
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or interlace != 0 or comp != 0 or filt != 0:
        raise ValueError(f"unsupported PNG profile (depth={depth}, interlace={interlace})")
    try:
        ch = {0: 1, 2: 3, 6: 4}[color]
    except KeyError:
        raise ValueError(f"unsupported color type {color}") from None
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = ch  # bytes per pixel at depth 8
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(raw, np.uint8, stride, y * (stride + 1) + 1)
        if f == 0:  # None
            rec = line.copy()
        elif f == 2:  # Up — vectorized (uint8 addition wraps mod 256 per spec)
            rec = line + prev
        else:  # Sub/Average/Paeth need the reconstructed left neighbour
            rec = np.empty(stride, dtype=np.uint8)
            ln = line.tolist()
            pv = prev.tolist()
            rc = [0] * stride
            if f == 1:  # Sub
                for i in range(stride):
                    a = rc[i - bpp] if i >= bpp else 0
                    rc[i] = (ln[i] + a) & 0xFF
            elif f == 3:  # Average
                for i in range(stride):
                    a = rc[i - bpp] if i >= bpp else 0
                    rc[i] = (ln[i] + ((a + pv[i]) >> 1)) & 0xFF
            elif f == 4:  # Paeth
                for i in range(stride):
                    a = rc[i - bpp] if i >= bpp else 0
                    b = pv[i]
                    c = pv[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rc[i] = (ln[i] + pred) & 0xFF
            else:
                raise ValueError(f"bad filter type {f}")
            rec[:] = rc
        out[y] = rec
        prev = rec
    return out.reshape(h, w, ch)


def _hex_rgb(color: str) -> tuple[int, int, int]:
    c = color.lstrip("#")
    return int(c[0:2], 16), int(c[2:4], 16), int(c[4:6], 16)


def _draw_text(img: np.ndarray, x: int, y: int, text: str, rgb=(40, 40, 40)):
    for i, ch in enumerate(text.upper()):
        g = _GLYPHS.get(ch)
        if g is None:
            continue
        for r in range(7):
            for c in range(5):
                if g[r * 5 + c] == "1":
                    yy, xx = y + r, x + i * 6 + c
                    if 0 <= yy < img.shape[0] and 0 <= xx < img.shape[1]:
                        img[yy, xx] = rgb


def render_timeline_png(
    rows: list[dict],
    *,
    width: int = 1200,
    row_height: int = 22,
    label_width: int = 90,
) -> bytes:
    """timeline_rows output → PNG bytes.

    ``rows``: dicts with series / vfrom / vuntil / color (reports.
    timeline_rows). Layout mirrors the reference's figure: one horizontal
    band per series (block aliases then master), day gridlines, date labels
    on the axis."""
    series = list(dict.fromkeys(r["series"] for r in rows))
    if not rows or not series:
        img = np.full((40, width, 3), 255, dtype=np.uint8)
        _draw_text(img, 4, 4, "NO DATA")
        return encode_png(img)
    t0 = min(r["vfrom"] for r in rows)
    t1 = max(r["vuntil"] for r in rows)
    span = max((t1 - t0).total_seconds(), 1.0)
    axis_h = 16
    h = len(series) * row_height + axis_h + 4
    img = np.full((h, width, 3), 255, dtype=np.uint8)
    plot_w = width - label_width - 4

    def x_of(t: datetime) -> int:
        return label_width + int((t - t0).total_seconds() / span * (plot_w - 1))

    # day gridlines + date labels
    day = datetime(t0.year, t0.month, t0.day) + timedelta(days=1)
    while day < t1:
        x = x_of(day)
        img[: h - axis_h, x] = (225, 225, 225)
        day += timedelta(days=1)
    _draw_text(img, label_width, h - axis_h + 4, t0.strftime("%d.%m.%Y"))
    end_label = t1.strftime("%d.%m.%Y")
    _draw_text(img, width - 6 * len(end_label) - 4, h - axis_h + 4, end_label)

    for i, s in enumerate(series):
        y0 = i * row_height + 2
        _draw_text(img, 2, y0 + (row_height - 7) // 2, s[:14])
        for r in rows:
            if r["series"] != s:
                continue
            xa, xb = x_of(r["vfrom"]), x_of(r["vuntil"])
            img[y0 : y0 + row_height - 4, xa : max(xb, xa + 1)] = _hex_rgb(r["color"])
    return encode_png(img)
