"""Dependency-free MJPEG-AVI (RIFF) container codec — stdlib struct only.

Completes the native multimodal codec set (sinks_png, jpeg_codec,
wav_codec): Motion-JPEG inside an AVI RIFF container is a real,
widely-produced video format (capture cards, webcams, dataset dumps) whose
frames are ordinary baseline JPEGs — which this repo decodes natively
(jpeg_codec). That turns video frame sampling from an ffmpeg-gated stub
into a working path: parse the RIFF 'movi' list, pull every Nth '00dc'
chunk, and hand the JPEG bytes to the image kernels.

Inter-frame codecs (h264/vp9/av1) are out of scope — no pure-Python
implementation is realistic — and raise NotImplementedError with a clear
message so pipelines can quarantine them.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

_AVIH = struct.Struct("<IIIIIIIIII4I")  # 56 bytes
_STRH = struct.Struct("<4s4sIHHIIIIIIII4H")  # 56 bytes
_BMIH = struct.Struct("<IiiHH4sIiiII")  # BITMAPINFOHEADER, 40 bytes


def encode_avi_mjpeg(frames: list[bytes], width: int, height: int, *, fps: int = 25) -> bytes:
    """JPEG frame bytes → MJPEG AVI. ``frames`` are pre-encoded JPEGs (use
    jpeg_codec.encode_jpeg_baseline); all frames should share (width,
    height). Writes the canonical hdrl/movi/idx1 layout."""
    if not frames:
        raise ValueError("no frames")

    def chunk(tag: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return tag + struct.pack("<I", len(data)) + data + pad

    def lst(tag: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", tag + data)

    max_bytes = max(len(f) for f in frames)
    avih = _AVIH.pack(
        1_000_000 // fps, max_bytes * fps, 0, 0x10, len(frames), 0, 1,
        max_bytes, width, height, 0, 0, 0, 0,
    )
    strh = _STRH.pack(
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, len(frames), max_bytes,
        0xFFFFFFFF, 0, 0, 0, width, height,
    )
    strf = _BMIH.pack(40, width, height, 1, 24, b"MJPG",
                      width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_body = b"movi"
    idx = b""
    for f in frames:
        # idx1 offsets are from the start of the 'movi' list data (the
        # position of the ck header relative to 'movi' fourcc), the
        # convention modern demuxers expect
        idx += b"00dc" + struct.pack("<III", 0x10, len(movi_body), len(f))
        movi_body += b"00dc" + struct.pack("<I", len(f)) + f
        if len(f) % 2:
            movi_body += b"\x00"
    movi = chunk(b"LIST", movi_body)
    idx1 = chunk(b"idx1", idx)

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def iter_avi_mjpeg_frames(data: bytes) -> Iterator[bytes]:
    """Yield each video frame's JPEG bytes from an MJPEG AVI ('00dc'/'00db'
    chunks of stream 0 in the 'movi' list). Rejects non-AVI RIFFs and
    non-MJPEG streams with clear errors."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ' header missing)")
    # verify the stream handler before touching frames
    handler = _find_stream_handler(data)
    if handler not in (b"MJPG", b"mjpg", b"dmb1"):
        raise NotImplementedError(
            f"AVI stream codec {handler!r} unsupported: only MJPEG decodes "
            "natively (inter-frame codecs need ffmpeg)"
        )
    movi = _find_list(data, b"movi")
    if movi is None:
        raise ValueError("AVI has no movi list")
    pos, end = movi
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body_at = pos + 8
        if tag in (b"00dc", b"00db"):
            yield data[body_at : body_at + size]
        elif tag == b"LIST":  # 'rec ' groups — descend
            inner = data[body_at : body_at + 4]
            if inner == b"rec ":
                sub, sub_end = body_at + 4, body_at + size
                while sub + 8 <= sub_end:
                    st = data[sub : sub + 4]
                    (ss,) = struct.unpack_from("<I", data, sub + 4)
                    if st in (b"00dc", b"00db"):
                        yield data[sub + 8 : sub + 8 + ss]
                    sub += 8 + ss + (ss % 2)
        pos = body_at + size + (size % 2)


def _find_list(data: bytes, want: bytes):
    """(start, end) of the named LIST's body (after the fourcc)."""
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if tag == b"LIST" and data[pos + 8 : pos + 12] == want:
            return pos + 12, pos + 8 + size
        pos += 8 + size + (size % 2)
    return None


def _find_stream_handler(data: bytes) -> bytes:
    hdrl = _find_list(data, b"hdrl")
    if hdrl is None:
        raise ValueError("AVI has no hdrl list")
    pos, end = hdrl
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if tag == b"LIST" and data[pos + 8 : pos + 12] == b"strl":
            sub, sub_end = pos + 12, pos + 8 + size
            while sub + 8 <= sub_end:
                st = data[sub : sub + 4]
                (ss,) = struct.unpack_from("<I", data, sub + 4)
                if st == b"strh":
                    fcc_type, handler = struct.unpack_from("<4s4s", data, sub + 8)
                    if fcc_type == b"vids":
                        return handler
                sub += 8 + ss + (ss % 2)
        pos += 8 + size + (size % 2)
    raise ValueError("AVI has no video stream")
