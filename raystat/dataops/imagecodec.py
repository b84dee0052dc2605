"""Pure-NumPy image codecs (PPM / BMP / PNG) — no external imaging
libraries, which this container does not have.

These give the multimodal pipeline a REAL decode path: binary payload
bytes -> (H, W, 3) uint8 RGB arrays, byte-exact round-trips, enough to
drive feature extraction / resize stages end-to-end.  Formats:

- PPM (P6, maxval 255): header + raw RGB — the simplest interchange.
- BMP (BITMAPINFOHEADER, 24-bit uncompressed): little-endian structs,
  BGR pixel order, 4-byte-aligned rows, bottom-up.
- PNG (8-bit RGB, color type 2): zlib inflate + all five scanline
  filters (None/Sub/Up/Average/Paeth) on decode; encode uses filter 0.

Encoders exist so tests and fixtures can plant known pixels and assert
decode(encode(img)) == img exactly.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "encode_ppm", "decode_ppm",
    "encode_bmp", "decode_bmp",
    "encode_png", "decode_png",
    "decode_image", "sniff_format",
]


# -- PPM (P6) ---------------------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3, "P6 PPM is RGB"
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: magic, width, height, maxval — whitespace/comment separated
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end of line
            pos = data.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    arr = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return arr.reshape(h, w, 3).copy()


# -- BMP (24-bit, BITMAPINFOHEADER) ----------------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3
    row_bytes = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    pix = np.zeros((h, row_bytes), dtype=np.uint8)
    pix[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data_size = row_bytes * h
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    return header + info + pix.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    flip = h > 0  # positive height => bottom-up rows
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    raw = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h, offset=pix_off)
    rows = raw.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    img = rows[:, :, ::-1]  # BGR -> RGB
    return (img[::-1] if flip else img).copy()


# -- PNG (8-bit RGB) --------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload))
    )


def encode_png(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, RGB
    scan = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    scan[:, 1:] = img.reshape(h, w * 3)  # filter byte 0 per row
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scan.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(scan: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters; scan is (h, 1 + w*bpp)."""
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = int(scan[y, 0])
        cur = scan[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:  # None
            line = cur
        elif f == 2:  # Up
            line = (cur + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need a scalar sweep
            line = cur.copy()
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                if f == 1:
                    line[i] = (line[i] + a) & 0xFF
                elif f == 3:
                    line[i] = (line[i] + ((a + b) >> 1)) & 0xFF
                else:
                    cc = prev[i - bpp] if i >= bpp else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    line[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = line.astype(np.uint8)
    return out


def decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos, w = len(_PNG_SIG), 0
    idat = []
    h = bit_depth = color_type = None
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if bit_depth != 8 or color_type != 2 or interlace != 0:
                raise ValueError(
                    f"unsupported PNG (depth={bit_depth}, color={color_type})"
                )
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    raw = zlib.decompress(b"".join(idat))
    scan = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + w * 3)
    return _unfilter(scan, h, w, 3).reshape(h, w, 3)


# -- dispatch ---------------------------------------------------------------


def sniff_format(data: bytes) -> str | None:
    if data.startswith(_PNG_SIG):
        return "png"
    if data.startswith(b"BM"):
        return "bmp"
    if data.startswith(b"P6"):
        return "ppm"
    return None


def decode_image(data: bytes) -> np.ndarray:
    fmt = sniff_format(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt == "ppm":
        return decode_ppm(data)
    raise ValueError("unrecognized image payload")
