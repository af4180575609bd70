"""External golden fixtures for the media codecs.

Every other codec test round-trips a file through this repo's own
encoder, which can never catch a MIRRORED encoder/decoder
misconception (chroma ordering, LZW EarlyChange off-by-one, Rice
escape handling...).  The container ships no third-party codec tools
(no PIL/ImageMagick/libtiff/flac-cli), so these fixtures are the next
best thing: files assembled INDEPENDENTLY of the codec modules —
byte-by-byte from the published specs (GIF89a, TIFF 6.0, PNG RFC 2083,
T.81, RFC 9639), including one widely-published known-good file — and
decoded with the module under test.  None of the fixture builders
import anything from the codec modules; CRCs and bit-packing are
reimplemented here from the spec polynomials.
"""

from __future__ import annotations

import binascii
import struct
import zlib

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# GIF: the canonical minimal GIF89a — a widely published known-good file
# (1x1, 2-entry palette, white pixel).  Third-party-originated bytes.
# ---------------------------------------------------------------------------

MINIMAL_GIF = bytes(
    [
        0x47, 0x49, 0x46, 0x38, 0x39, 0x61,  # "GIF89a"
        0x01, 0x00, 0x01, 0x00,              # logical screen 1x1
        0x80, 0x00, 0x00,                    # GCT: 2 entries; bg 0; aspect 0
        0xFF, 0xFF, 0xFF,                    # palette[0] = white
        0x00, 0x00, 0x00,                    # palette[1] = black
        0x2C, 0x00, 0x00, 0x00, 0x00,        # image descriptor at (0,0)
        0x01, 0x00, 0x01, 0x00, 0x00,        # 1x1, no LCT
        0x02,                                # LZW min code size
        0x02, 0x44, 0x01,                    # codes: Clear(4), 0, EOI(5)
        0x00,                                # block terminator
        0x3B,                                # trailer
    ]
)


def test_gif_minimal_known_good_file():
    from iceberg_geo_poc_spark.operators.gif import decode_gif

    frames = decode_gif(MINIMAL_GIF)
    assert len(frames) == 1
    assert frames[0].shape == (1, 1, 3)
    assert frames[0].tolist() == [[[255, 255, 255]]]  # palette index 0


# ---------------------------------------------------------------------------
# TIFF: IFDs hand-packed with struct — both byte orders, strip layouts,
# PackBits and LZW streams derived by hand from TIFF 6.0 §7/§13.
# ---------------------------------------------------------------------------

def _tiff(entries, payload, endian="<", first_payload_at=None):
    """Assemble header + payload + one IFD.  ``entries`` are
    (tag, type, count, value-bytes[4]) tuples, must be tag-sorted."""
    ii = b"II" if endian == "<" else b"MM"
    header = ii + struct.pack(endian + "H", 42)
    payload_at = 8
    ifd_at = payload_at + len(payload)
    out = header + struct.pack(endian + "I", ifd_at) + payload
    out += struct.pack(endian + "H", len(entries))
    for tag, typ, count, raw in entries:
        assert len(raw) == 4
        out += struct.pack(endian + "HHI", tag, typ, count) + raw
    out += struct.pack(endian + "I", 0)  # no next IFD
    return out


def _short(v, endian="<"):
    return struct.pack(endian + "H", v) + b"\x00\x00"


def _long(v, endian="<"):
    return struct.pack(endian + "I", v)


def test_tiff_uncompressed_rgb_little_endian():
    from iceberg_geo_poc_spark.operators.tiff import decode_tiff

    # 2x2 RGB, one strip at offset 8 (before the IFD)
    pix = bytes(
        [255, 0, 0,  0, 255, 0,
         0, 0, 255,  10, 20, 30]
    )
    data = _tiff(
        [
            (256, 3, 1, _short(2)),        # ImageWidth
            (257, 3, 1, _short(2)),        # ImageLength
            (259, 3, 1, _short(1)),        # Compression: none
            (262, 3, 1, _short(2)),        # Photometric: RGB
            (273, 4, 1, _long(8)),         # StripOffsets
            (277, 3, 1, _short(3)),        # SamplesPerPixel
            (278, 3, 1, _short(2)),        # RowsPerStrip
            (279, 4, 1, _long(len(pix))),  # StripByteCounts
        ],
        pix,
    )
    (img,) = decode_tiff(data)
    assert img.shape == (2, 2, 3)
    assert img.reshape(-1).tolist() == list(pix)


def test_tiff_big_endian_grayscale_two_strips():
    from iceberg_geo_poc_spark.operators.tiff import decode_tiff

    # 3x2 grayscale, MM byte order, two one-row strips
    rows = [bytes([1, 2, 3]), bytes([200, 100, 50])]
    payload = rows[0] + rows[1]
    e = ">"
    data = _tiff(
        [
            (256, 3, 1, _short(3, e)),
            (257, 3, 1, _short(2, e)),
            (259, 3, 1, _short(1, e)),
            (262, 3, 1, _short(1, e)),   # BlackIsZero
            (273, 4, 2, _long(0, e)),    # patched below: offsets array
            (277, 3, 1, _short(1, e)),
            (278, 3, 1, _short(1, e)),   # one row per strip
            (279, 4, 2, _long(0, e)),    # patched below: counts array
        ],
        payload,
        endian=e,
    )
    # two-long arrays don't fit in the 4-byte value: append them and
    # patch the offsets in the raw bytes
    off_arr_at = len(data)
    data += struct.pack(e + "II", 8, 8 + len(rows[0]))
    cnt_arr_at = len(data)
    data += struct.pack(e + "II", len(rows[0]), len(rows[1]))
    data = bytearray(data)
    ifd_at = struct.unpack(e + "I", bytes(data[4:8]))[0]
    for i in range(struct.unpack(e + "H", bytes(data[ifd_at : ifd_at + 2]))[0]):
        at = ifd_at + 2 + 12 * i
        tag = struct.unpack(e + "H", bytes(data[at : at + 2]))[0]
        if tag == 273:
            data[at + 8 : at + 12] = struct.pack(e + "I", off_arr_at)
        elif tag == 279:
            data[at + 8 : at + 12] = struct.pack(e + "I", cnt_arr_at)
    (img,) = decode_tiff(bytes(data))
    assert img.shape == (2, 3, 3)
    assert img[:, :, 0].reshape(-1).tolist() == [1, 2, 3, 200, 100, 50]
    assert (img[:, :, 0] == img[:, :, 2]).all()  # gray replicated


def test_tiff_packbits_hand_derived_stream():
    from iceberg_geo_poc_spark.operators.tiff import decode_tiff

    # TIFF 6.0 §9 PackBits: (n>=0) -> copy n+1 literals; (-127..-1) ->
    # repeat next byte 1-n times; -128 is a no-op.  4x2 grayscale:
    # row0 = 7,7,7,7 row1 = 1,2,3,3  ->  [0xFD 0x07] four 7s,
    # [0x01 0x01 0x02] two literals, [0xFF 0x03] two 3s.
    comp = bytes([0xFD, 7, 0x01, 1, 2, 0xFF, 3])
    data = _tiff(
        [
            (256, 3, 1, _short(4)),
            (257, 3, 1, _short(2)),
            (259, 3, 1, _short(32773)),
            (262, 3, 1, _short(1)),
            (273, 4, 1, _long(8)),
            (277, 3, 1, _short(1)),
            (278, 3, 1, _short(2)),
            (279, 4, 1, _long(len(comp))),
        ],
        comp,
    )
    (img,) = decode_tiff(data)
    assert img[:, :, 0].reshape(-1).tolist() == [7, 7, 7, 7, 1, 2, 3, 3]


def test_tiff_lzw_hand_derived_stream():
    from iceberg_geo_poc_spark.operators.tiff import decode_tiff

    # TIFF 6.0 §13 LZW, 9-bit MSB-first codes, ClearCode=256 EOI=257.
    # Encoding [10,10,10,10] by the spec algorithm emits
    # Clear, 10, 258 ("10,10" added at first repeat), 10, EOI:
    #   100000000 000001010 100000010 000001010 100000001
    # packed MSB-first into bytes:
    comp = bytes([0x80, 0x02, 0xA0, 0x40, 0xA8, 0x08])
    data = _tiff(
        [
            (256, 3, 1, _short(2)),
            (257, 3, 1, _short(2)),
            (259, 3, 1, _short(5)),
            (262, 3, 1, _short(1)),
            (273, 4, 1, _long(8)),
            (277, 3, 1, _short(1)),
            (278, 3, 1, _short(2)),
            (279, 4, 1, _long(len(comp))),
        ],
        comp,
    )
    (img,) = decode_tiff(data)
    assert img[:, :, 0].reshape(-1).tolist() == [10, 10, 10, 10]


# ---------------------------------------------------------------------------
# PNG: chunks assembled with struct + stdlib zlib/crc32 (the compressor
# the spec delegates to), filters 0 (None) and 2 (Up) applied by hand.
# ---------------------------------------------------------------------------

def _png_chunk(typ: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + typ
        + body
        + struct.pack(">I", binascii.crc32(typ + body) & 0xFFFFFFFF)
    )


def test_png_hand_built_filters_none_and_up():
    from iceberg_geo_poc_spark.operators.multimodal import decode_image

    rows = np.array(
        [[[255, 0, 0], [0, 255, 0], [7, 8, 9]],
         [[250, 1, 2], [3, 250, 4], [17, 28, 39]]],
        dtype=np.uint8,
    )
    scan = bytes([0]) + rows[0].tobytes()  # filter None
    up = (rows[1].astype(np.int16) - rows[0].astype(np.int16)) % 256
    scan += bytes([2]) + up.astype(np.uint8).tobytes()  # filter Up
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(scan))
        + _png_chunk(b"IEND", b"")
    )
    out = decode_image(png, "png")
    assert out.shape == (2, 3, 3)
    assert (out == rows).all()


# ---------------------------------------------------------------------------
# JPEG: a baseline grayscale 8x8 DC-only file hand-assembled from T.81 —
# custom minimal Huffman tables defined in the DHT segment itself, DC
# magnitude bits computed by hand, expected pixels derived analytically
# (DC-only IDCT => uniform plane at DC/8 + 128).
# ---------------------------------------------------------------------------

def _jpeg_dc_only(entropy: bytes) -> bytes:
    seg = bytearray(b"\xff\xd8")  # SOI
    # DQT: table 0, all entries 16
    seg += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([16] * 64)
    # SOF0: 8-bit precision, 8x8, 1 component (id 1, 1x1 sampling, q0)
    seg += b"\xff\xc0" + struct.pack(">H", 11) + bytes(
        [8, 0, 8, 0, 8, 1, 1, 0x11, 0]
    )
    # DHT DC table 0: len-1 code "0"->cat 0, len-2 code "10"->cat 6
    bits_dc = [1, 1] + [0] * 14
    seg += b"\xff\xc4" + struct.pack(">H", 21) + bytes([0x00] + bits_dc + [0, 6])
    # DHT AC table 0: single len-1 code "0" -> 0x00 (EOB)
    bits_ac = [1] + [0] * 15
    seg += b"\xff\xc4" + struct.pack(">H", 20) + bytes([0x10] + bits_ac + [0x00])
    # SOS: 1 component, DC table 0 / AC table 0
    seg += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    seg += entropy
    seg += b"\xff\xd9"  # EOI
    return bytes(seg)


def test_jpeg_hand_built_zero_dc_decodes_mid_gray():
    from iceberg_geo_poc_spark.operators.jpeg import decode_jpeg

    # DC cat 0 ("0") + EOB ("0") + 1-padding = 0b00111111
    img = decode_jpeg(_jpeg_dc_only(bytes([0x3F])))
    assert img.shape == (8, 8, 3)
    assert (img == 128).all()


def test_jpeg_hand_built_nonzero_dc_decodes_uniform_200():
    from iceberg_geo_poc_spark.operators.jpeg import decode_jpeg

    # target level 200: centered 72, orthonormal DC = 72*8 = 576,
    # quantized by 16 -> 36 (category 6, magnitude bits 100100).
    # entropy: "10" (cat 6) + "100100" + EOB "0" + 1-padding
    #        = 10100100 01111111 = 0xA4 0x7F
    img = decode_jpeg(_jpeg_dc_only(bytes([0xA4, 0x7F])))
    assert img.shape == (8, 8, 3)
    assert (img == 200).all()


# ---------------------------------------------------------------------------
# FLAC: an independent spec-level writer — bit packing, CRC-8 (poly 0x07)
# and CRC-16 (poly 0x8005) reimplemented here bitwise from RFC 9639 —
# emitting VERBATIM and CONSTANT subframes the module never writes
# together in this layout.
# ---------------------------------------------------------------------------

class _Bits:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, width: int):
        self.acc = (self.acc << width) | (value & ((1 << width) - 1))
        self.n += width
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        return self

    def bytes(self) -> bytes:
        assert self.n == 0, "fixture must be byte-aligned"
        return bytes(self.buf)


def _crc8_spec(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16_spec(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
            )
    return crc


def _flac_fixture():
    rate = 8000
    frame0 = np.array([0, 1, -1, 300, -300, 32767, -32768, 12345], np.int16)
    const_val = -777
    total = len(frame0) + 4

    stream = _Bits()
    stream.put(4, 16).put(8, 16)          # min/max block size
    stream.put(0, 24).put(0, 24)          # min/max frame size unknown
    stream.put(rate, 20)                  # sample rate
    stream.put(0, 3)                      # channels - 1 (mono)
    stream.put(15, 5)                     # bits per sample - 1
    stream.put(total, 36)                 # total samples
    info = stream.bytes() + b"\x00" * 16  # MD5 unset
    out = b"fLaC" + bytes([0x80]) + len(info).to_bytes(3, "big") + info

    def frame(index: int, samples, subframe_bits) -> bytes:
        hdr = _Bits()
        hdr.put(0b11111111111110, 14)     # sync
        hdr.put(0, 1)                     # reserved
        hdr.put(0, 1)                     # fixed blocking
        hdr.put(0b0110, 4)                # block size: 8-bit value follows
        hdr.put(0b0000, 4)                # sample rate: from STREAMINFO
        hdr.put(0b0000, 4)                # mono
        hdr.put(0b100, 3)                 # 16 bps
        hdr.put(0, 1)                     # reserved
        hdr.put(index, 8)                 # UTF-8 frame number (< 0x80)
        hdr.put(len(samples) - 1, 8)      # block size - 1
        head = hdr.bytes()
        head += bytes([_crc8_spec(head)])
        body = subframe_bits.bytes()
        f = head + body
        return f + _crc16_spec(f).to_bytes(2, "big")

    sf0 = _Bits()
    sf0.put(0, 1).put(0x01, 6).put(0, 1)  # VERBATIM, no wasted bits
    for s in frame0:
        sf0.put(int(s), 16)
    out += frame(0, frame0, sf0)

    sf1 = _Bits()
    sf1.put(0, 1).put(0x00, 6).put(0, 1)  # CONSTANT
    sf1.put(const_val, 16)
    out += frame(1, [0] * 4, sf1)

    expected = np.concatenate([frame0, np.full(4, const_val, np.int16)])
    return out, expected, rate


def test_flac_independent_writer_decodes_exactly():
    from iceberg_geo_poc_spark.operators.flac import decode_flac

    data, expected, rate = _flac_fixture()
    arr, got_rate = decode_flac(data)
    assert got_rate == rate
    assert arr.shape == (len(expected), 1)
    assert arr[:, 0].tolist() == expected.tolist()


# ---------------------------------------------------------------------------
# JPEG: two widely-published third-party files (bytes produced by
# libjpeg-family encoders, circulated verbatim in public gists /
# Stack Overflow answers for years — NOT produced by this repo).
# ---------------------------------------------------------------------------

# "Smallest base64-encodable JPEG": 1x1, single gray component, quant
# table of all 255s, minimal Huffman tables.  DC derivation by hand
# from the published bytes: diff category 2, value 2 -> dequantized
# DC = 2*255 = 510 -> IDCT constant 510/8 = 63.75 -> +128 level shift
# = 191.75, so a conforming decoder emits 191-192 (integer-IDCT
# rounding is the only latitude).
PUBLISHED_1X1_GRAY_JPEG_B64 = (
    "/9j/4AAQSkZJRgABAQEASABIAAD/2wBDAP//////////////////////////////"
    "////////////////////////////////////////////////////////wAALCAAB"
    "AAEBAREA/8QAFAABAAAAAAAAAAAAAAAAAAAAAv/EABQQAQAAAAAAAAAAAAAAAAAA"
    "AAD/2gAIAQEAAD8AR//Z"
)

# The canonical 1x1 WHITE JPEG emitted by libjpeg with the full ITU-T
# T.81 Annex K example Huffman tables (the table bytes in this file ARE
# the Annex K tables — a fingerprint of a standard encoder, not of this
# repo's minimal-table writer).
PUBLISHED_1X1_WHITE_JPEG_B64 = (
    "/9j/4AAQSkZJRgABAQEAYABgAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkS"
    "Ew8UHRofHh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/2wBDAQkJ"
    "CQwLDBgNDRgyIRwhMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIy"
    "MjIyMjIyMjIyMjIyMjL/wAARCAABAAEDASIAAhEBAxEB/8QAHwAAAQUBAQEBAQEA"
    "AAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQRBRIh"
    "MUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6"
    "Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZ"
    "mqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx"
    "8vP09fb3+Pn6/8QAHwEAAwEBAQEBAQEBAQAAAAAAAAECAwQFBgcICQoL/8QAtREA"
    "AgECBAQDBAcFBAQAAQJ3AAECAxEEBSExBhJBUQdhcRMiMoEIFEKRobHBCSMzUvAV"
    "YnLRChYkNOEl8RcYGRomJygpKjU2Nzg5OkNERUZHSElKU1RVVldYWVpjZGVmZ2hp"
    "anN0dXZ3eHl6goOEhYaHiImKkpOUlZaXmJmaoqOkpaanqKmqsrO0tba3uLm6wsPE"
    "xcbHyMnK0tPU1dbX2Nna4uPk5ebn6Onq8vP09fb3+Pn6/9oADAMBAAIRAxEAPwD3"
    "+iiigD//2Q=="
)


def test_jpeg_published_1x1_gray_file():
    import base64

    from iceberg_geo_poc_spark.operators.jpeg import decode_jpeg

    img = decode_jpeg(base64.b64decode(PUBLISHED_1X1_GRAY_JPEG_B64))
    assert img.shape == (1, 1, 3)
    r, g, b = (int(v) for v in img[0, 0])
    assert r == g == b, "single-component JPEG must decode achromatic"
    assert 190 <= r <= 193, f"hand-derived DC says ~192, got {r}"


def test_jpeg_published_1x1_white_annexk_file():
    import base64

    from iceberg_geo_poc_spark.operators.jpeg import decode_jpeg

    raw = base64.b64decode(PUBLISHED_1X1_WHITE_JPEG_B64)
    # fingerprint: the file carries the Annex K typical Huffman tables
    # (DC luminance BITS run 0 1 5 1 1 1 1 1 1 0...), i.e. a standard
    # encoder wrote it — this is what makes it a third-party golden
    assert bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0]) in raw
    img = decode_jpeg(raw)
    assert img.shape == (1, 1, 3)
    r, g, b = (int(v) for v in img[0, 0])
    assert r == g == b
    assert r >= 253, f"published file is a white pixel, got {(r, g, b)}"


# ---------------------------------------------------------------------------
# Third-party cross-format goldens (VERDICT r7 task #4).
#
# The four files below are CPython's Lib/test/imghdrdata "python" logo test
# images (PSF-licensed public test data shipped with every CPython since
# 2011, present in this container under
# /root/.pyenv/versions/*/lib/python3.*/test/imghdrdata/).  They encode the
# SAME 16x16 image, were produced by real third-party tools (not by any
# module in this repo), and therefore pin our decoders against each other:
# a shared spec misconception in one codec would have to coincidentally
# reproduce the output of independently-written encoders in every other
# format.
#
# - python.ppm: binary P6, the trivially-parseable reference raster
# - python.pgm: binary P5 grayscale of the same image
# - python.tiff: uncompressed little-endian RGBA TIFF (strip layout,
#   ExtraSamples) -> RGB must equal the PPM BIT-EXACTLY
# - python.gif: GIF89a with a 64-color global table (real LZW stream);
#   its palette quantizes the source, so agreement is near-exact
#   (<= 3/255 per channel) -- still fatal to any real LZW decode bug
CPYTHON_PYTHON_PPM_B64 = (
    "UDYKMTYgMTYKMjU1CgAAAAAAAAAAAAAAAE6NwEqGukiDtER+rUB4pzxxnjdolgAAAAAAAAAAAAAA"
    "AAAAAAAAAAAAAAAAAAAAAEyKvP///0V/r0F5qD50ojpvmzZplAAAAAAAAAAAAAAAAAAAAAAAAAAA"
    "AAAAAAAAAEmFt0aAsUJ7qj51oztwnTdqljZplAAAAAAAAAAAAAAAAAAAAAAAAE6PxEyKv0iFtkN9"
    "rT10oTlsljZmkDhslzZplDZplAAAAAAAAAAAAAAAAAAAAFKRxk+NwUuIu0iDtER9rUB4pj1zoDlt"
    "mTZplDZplDZplAAAAP/iVf3dSvnVPgAAAFCPw0yJvEiEtUV/r0F5qD10oTpvmzZplDZplDZplDJg"
    "hwAAAP/eS//aQf3VNgAAAE2LvkmFt0aAsEJ7qj51oztwnDdqljZplDVokjJghwAAAOzORf/aQv/W"
    "N//TLQAAAEqHuUeBskN8qz92pTZpkxsxRQAAAAAAAAAAAAAAAOLDRf3ZQf/XOP/TLf/PIwAAAEaB"
    "skR9rUB4pjZnkQAAAPLhbv3pav/mYf/jV//fTf/bQv/XOP/TLv/PJP3LGwAAAEN9rkF5qD10oRwy"
    "S/Xjb//rbP/nYf/jV//fTf/bQ//XOf/TLv/PJP/MHPPBGgAAAEB1oz1zojpwnAAAAP/rbP/nYv/j"
    "WP/fTv/bQ//XOf/TL//PJP/MHP/MHMKaEgAAAAAAAAAAAAAAAAAAAP/nYv/jWP/fTujHPevFNOvC"
    "Kuu+Ieu7GOu7GMabEgAAAAAAAAAAAAAAAAAAAAAAAP/jWP/fTv/bRP/XOv/TMP/QJf/MHAAAAAAA"
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAP3eTv/bRP/YOv/UMP/QJv////3LGwAAAAAAAAAAAAAAAAAA"
    "AAAAAAAAAAAAAAAAAPHQP/rTOf3SL//QJv/MHPrHGcCXEgAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA=="
)

CPYTHON_PYTHON_PGM_B64 = (
    "UDUKMTYgMTYKMjU1CgAAAACDfXp1b2lhAAAAAAAAAAAAgP92cGxnYQAAAAAAAAAAAHx3cm1oYmEA"
    "AAAAAACFgXx0bGRfZGFhAAAAAACHhH96dG9rZWFhYQDe2dIAhYB7dnBsZ2FhYVkA2tfSAIF8d3Jt"
    "aGJhYFkAytfT0AB+eHNuYS4AAAAAwNbU0M0AeHRvYADc5OLf29jU0M3JAHRwbC/e5uLf29jU0M3K"
    "wABta2gA5uPf29jU0c3KypkAAAAAAOPf28TDwLy5uZoAAAAAAADf29jU0c7KAAAAAAAAAAAA2tjV"
    "0c7/yQAAAAAAAAAAAM3Qz87KxZYAAAAAAAAAAAAAAAAAAAAAAAAAAAA="
)

CPYTHON_PYTHON_TIFF_B64 = (
    "SUkqAAgEAAAAAAAAAAAAAAAAAAAAAAAATo3Ar0qGuu1Ig7T/RH6t/0B4p/88cZ73N2iWkgAAAAsA"
    "AAADAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAEyKvP//////RX+v/0F5qP8+dKL/Om+b/zZp"
    "lP8AAAAoAAAACwAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAABJhbf/RoCx/0J7qv8+daP/O3Cd"
    "/zdqlv82aZT/AAAAQQAAABUAAAAAAAAAAAAAAAAAAAAATo/EfkyKv6BIhbahQ32toz10oac5bJaq"
    "NmaQqjhsl/82aZT/NmmU/wAAAEgAAAAYAAAAAAAAAAAAAAAAUpHGvU+Nwf9LiLv/SIO0/0R9rf9A"
    "eKb/PXOg/zltmf82aZT/NmmU/zZplP8AAABI/+JV//3dSvf51T6CAAAAClCPw/9Mibz/SIS1/0V/"
    "r/9Beaj/PXSh/zpvm/82aZT/NmmU/zZplP8yYIe2AAAAQ//eS///2kH//dU27QAAACRNi77/SYW3"
    "/0aAsP9Ce6r/PnWj/ztwnP83apb/NmmU/zVokvcyYIe2AAAAT+zORYj/2kL//9Y3///TLf8AAAA9"
    "Soe5/0eBsv9DfKv/P3al/zZpk7YbMUVcAAAATAAAAEgAAABHAAAAQeLDRWv92UH3/9c4///TLf//"
    "zyP/AAAARkaBsvdEfa3/QHim/zZnkaoAAABO8uFupv3pavf/5mH//+NX///fTf//20L//9c4///T"
    "Lv//zyT//csb9wAAAEdDfa7XQXmo/z10of8cMktb9eNvs//rbP//52H//+NX///fTf//20P//9c5"
    "///TLv//zyT//8wc//PBGsIAAABBQHWjbz1zovc6cJz/AAAAS//rbP//52L//+NY///fTv//20P/"
    "/9c5///TL///zyT//8wc///MHP/CmhJ6AAAANAAAAAgAAAAhAAAAPAAAADX/52L//+NY///fTv/o"
    "xz2q68U0qevCKqnrviGp67sYqeu7GKnGmxJ5AAAAQQAAACAAAAACAAAACQAAABMAAAAS/+NY///f"
    "Tv//20T//9c6///TMP//0CX//8wc/wAAAEEAAAA1AAAALAAAAB4AAAALAAAAAAAAAAAAAAAAAAAA"
    "AP3eTvf/20T//9g6///UMP//0Cb///////3LG/cAAABAAAAAHAAAAAkAAAAFAAAAAQAAAAAAAAAA"
    "AAAAAAAAAADx0D9M+tM5zP3SL/f/0Cb//8wc//rHGdjAlxJ7AAAAOwAAABIAAAAAAAAAAAAAAAAA"
    "AAAAAAAAAAAAAAAAAAAAAAAACAAAAB0AAAA1AAAAQgAAAEcAAABFAAAAOAAAAB8AAAAIAAAAAAAA"
    "AAAAAAAAEQAAAQMAAQAAABAAAAABAQMAAQAAABAAAAACAQMABAAAANoEAAADAQMAAQAAAAEAAAAG"
    "AQMAAQAAAAIAAAAKAQMAAQAAAAEAAAANAQIADAAAACIFAAARAQQAAQAAAAgAAAASAQMAAQAAAAEA"
    "AAAVAQMAAQAAAAQAAAAWAQMAAQAAAIAAAAAXAQQAAQAAAAAEAAAcAQMAAQAAAAEAAAApAQMAAgAA"
    "AAAAAQA+AQUAAgAAABIFAAA/AQUABgAAAOIEAABSAQMAAQAAAAIAAAAAAAAACAAIAAgACAAACtej"
    "/////4DhelT/////AM3MTP////8AmpmZ/////4BmZib/////8ChcD/////+AGw1Q/////wBYOVT/"
    "////cHl0aG9uLnRpZmYA"
)

CPYTHON_PYTHON_GIF_B64 = (
    "R0lGODlhEAAQAPU/AOu7GOu+IfPBGvrHGf3LG//MHOvCKv/PI//PJP/QJf/TLevFNOjHPf/TMP/U"
    "MP3VNvrTOf/XOfnVPv/YOuzORf/aQf/bRP/eS//fTv/iVf/jWP/nYvLhbvXjb/3pav/rbDJghzZm"
    "kDZnkTZpkzdoljdqljlsljpvmzpwnDtwnDxxnj1zoj50oj92pUB4pkJ7qkN8q0N9rUV/r0aAsUeB"
    "skiDtEiFtkqGukyJvEyKvEyKv0+NwVCPw1KRxv///wAAACH/C0ltYWdlTWFnaWNrB2dhbW1hPTAA"
    "IfkEBQAAPwAsAAAAABAAEAAABpvAn/C3u81iLRVpyBTmfLMXC1VqMm1RVqo0sv50thjLFDKVqsze"
    "DleTuVSn0fmXuUh+PB1N9oKP/iA/FxUPXzY0UipnIoEUhAo/hzAuXU0VEQoHP0cuIj8cHhsZGBUT"
    "CggEPzFSPx0fGxoYFhENCAUCQispP6+xpacFBVawGAwLBgEAAF6xsw0Jwl4/shEOCT6p0j8QzwUD"
    "2uBDQQA7"
)


def _cpython_logo_rgb():
    import base64

    from iceberg_geo_poc_spark.operators.multimodal import decode_image

    return decode_image(base64.b64decode(CPYTHON_PYTHON_PPM_B64), "ppm")


def test_tiff_cpython_thirdparty_file_matches_ppm_bitexact():
    """python.tiff (uncompressed RGBA, produced outside this repo) must
    decode to exactly the RGB of python.ppm."""
    import base64

    import numpy as np

    from iceberg_geo_poc_spark.operators.tiff import decode_tiff

    frames = decode_tiff(base64.b64decode(CPYTHON_PYTHON_TIFF_B64))
    assert len(frames) == 1
    img = frames[0]
    assert img.shape == (16, 16, 3)
    assert np.array_equal(img, _cpython_logo_rgb())


def test_gif_cpython_thirdparty_lzw_stream_matches_ppm():
    """python.gif's LZW stream was produced by a real encoder; after its
    64-color palette quantization the decode must sit within 3/255 of
    the PPM on every OPAQUE pixel, with the majority of pixels exact.
    The file's GCE marks index 63 transparent and uses it on exactly 9
    scattered pixels (the encoder's alpha dither); those decode to the
    renderer's transparent fill and are excluded."""
    import base64

    import numpy as np

    from iceberg_geo_poc_spark.operators.gif import decode_gif

    frames = decode_gif(base64.b64decode(CPYTHON_PYTHON_GIF_B64))
    assert len(frames) == 1
    img = frames[0]
    assert img.shape == (16, 16, 3)
    ref = _cpython_logo_rgb()
    diff = np.abs(img.astype(int) - ref.astype(int)).max(axis=2)
    bad = diff > 3
    # exactly the 9 alpha-dither pixels diverge, all rendered as the
    # transparent fill (black); every opaque pixel is within 3/255
    assert bad.sum() == 9, bad.sum()
    assert (img[bad] == 0).all()
    assert (diff == 0).sum() >= 150  # most pixels exact


def test_ppm_pgm_cpython_grayscale_consistency():
    """python.pgm is a third-party grayscale rendering of the same
    image: the PPM's luma must track it closely (the exact grayscale
    matrix the producing tool used is unknown, so tolerance covers
    Rec.601-vs-average differences)."""
    import base64

    import numpy as np

    from iceberg_geo_poc_spark.operators.multimodal import decode_image

    g = decode_image(base64.b64decode(CPYTHON_PYTHON_PGM_B64), "pgm")
    rgb = _cpython_logo_rgb().astype(np.float64)
    luma601 = rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114
    assert g.shape == luma601.shape
    assert np.abs(g.astype(np.float64) - luma601).max() <= 8.0


# CPython Lib/test/audiodata pluck-pcm(8, 16, 24, 32).wav: the SAME stereo
# recording mastered by real tools at four PCM depths (+ a
# WAVE_FORMAT_EXTENSIBLE 24-bit variant).  Too large to embed; read from
# the container's CPython installations and skip if absent.
_PYENV_AUDIO = sorted(
    __import__("glob").glob(
        "/root/.pyenv/versions/3.1*/lib/python3.*/test/audiodata"
    )
)


@pytest.mark.skipif(not _PYENV_AUDIO, reason="CPython audiodata not present")
def test_wav_cpython_thirdparty_cross_depth_agreement():
    """Decoding the four depths of the same third-party recording and
    normalizing to [-1, 1) must agree to quantization precision:
    8-bit within 2^-7, 24/32-bit within dither distance of 16-bit, and
    24 == 32 == 24-ext exactly (same master).  Any sign-extension,
    byte-order, channel-interleave, or EXTENSIBLE-parsing bug fails."""
    import os

    import numpy as np

    from iceberg_geo_poc_spark.operators.multimodal import decode_wav_pcm

    d = _PYENV_AUDIO[-1]
    out = {}
    for name, bits in (
        ("pluck-pcm8.wav", 8), ("pluck-pcm16.wav", 16),
        ("pluck-pcm24.wav", 24), ("pluck-pcm24-ext.wav", 24),
        ("pluck-pcm32.wav", 32),
    ):
        with open(os.path.join(d, name), "rb") as f:
            s, rate, got_bits = decode_wav_pcm(f.read())
        assert got_bits == bits and rate == 11025 and s.shape == (3307, 2)
        out[name] = s.astype(np.float64) / float(2 ** (bits - 1))
    ref = out["pluck-pcm16.wav"]
    # 8-bit master was dithered: one quantization step plus dither slack
    assert np.abs(out["pluck-pcm8.wav"] - ref).max() <= 1.5 * 2.0 ** -7
    assert np.abs(out["pluck-pcm24.wav"] - ref).max() <= 2.0 ** -12
    assert np.array_equal(out["pluck-pcm24.wav"], out["pluck-pcm24-ext.wav"])
    assert np.abs(out["pluck-pcm32.wav"] - out["pluck-pcm24.wav"]).max() <= 2.0 ** -23


@pytest.mark.skipif(not _PYENV_AUDIO, reason="CPython audiodata not present")
def test_wav_stereo_downmix_pipeline_contract():
    """decode_audio on a stereo third-party file: int16 mono, floor-mean
    downmix, against a hand-computed downmix of the full-fidelity
    decode."""
    import os

    import numpy as np

    from iceberg_geo_poc_spark.operators.multimodal import (
        decode_audio,
        decode_wav_pcm,
    )

    d = _PYENV_AUDIO[-1]
    with open(os.path.join(d, "pluck-pcm24.wav"), "rb") as f:
        b = f.read()
    mono, rate = decode_audio(b, "wav")
    s, _, _ = decode_wav_pcm(b)
    want = np.floor_divide((s >> 8).sum(axis=1), 2).astype(np.int16)
    assert rate == 11025 and mono.dtype == np.int16
    assert np.array_equal(mono, want)


def test_wav_ieee_float_formats():
    """IEEE-float WAV (format 3, f32 + f64, incl. clipping at +1.0)
    rescales into the int32 caller contract."""
    import struct

    import numpy as np

    from iceberg_geo_poc_spark.operators.multimodal import decode_wav_pcm

    def make_wav(fmt, bits, data, channels=1, rate=8000):
        fc = struct.pack(
            "<HHIIHH", fmt, channels, rate,
            rate * channels * bits // 8, channels * bits // 8, bits,
        )
        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fc)) + fc
            + b"data" + struct.pack("<I", len(data)) + data
        )

    f = np.array([0.0, 0.5, -0.5, 1.0, -1.0, 2.0], dtype="<f4")
    s, rate, bits = decode_wav_pcm(make_wav(3, 32, f.tobytes()))
    assert bits == 32 and rate == 8000
    assert list(s[:, 0]) == [
        0, 1 << 30, -(1 << 30), 2147483647, -2147483648, 2147483647
    ]
    f8 = np.array([0.25, -0.75], dtype="<f8")
    s8, _, _ = decode_wav_pcm(make_wav(3, 64, f8.tobytes()))
    assert list(s8[:, 0]) == [1 << 29, -3 * (1 << 29)]
