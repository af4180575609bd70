"""TIFF 6.0 codec — spec-level baseline subset, stdlib + numpy only.

Built from the public TIFF 6.0 specification: both byte orders
("II"/"MM"), chained IFDs (multi-page files decode to a frame list),
strip organization, 8-bit grayscale and RGB, and three compressions —
none (1), LZW (5, MSB-first with the spec's EarlyChange code widening,
which differs from GIF's LZW), and PackBits (32773) — plus the
horizontal-differencing predictor (tag 317 = 2) that LZW scans usually
carry.

TIFF remains the scanned-document interchange format, so document
corpora (forms, books, archival scans) reliably contain it.  All three
compressions are lossless: round-trip tests are bit-exact, same
posture as GIF/FLAC.

Encoder (fixtures + corpus synthesis) writes II-order single- or
multi-page files in any of the three compressions with optional
predictor.
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PREDICTOR = 317


# -- TIFF-variant LZW (MSB-first, EarlyChange) -------------------------------

def _lzw_encode(data: bytes) -> bytes:
    clear, eoi = 256, 257
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    acc = 0
    nbits = 0
    out = bytearray()

    def put(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc = (acc << w) | code
        nbits += w
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
        acc &= (1 << nbits) - 1

    put(clear, width)
    prefix = b""
    for byte in data:
        trial = prefix + bytes([byte])
        if trial in table:
            prefix = trial
            continue
        put(table[prefix], width)
        table[trial] = next_code
        next_code += 1
        # EarlyChange: widen one code EARLIER than the table demands
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        elif next_code > 4093:
            put(clear, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        prefix = bytes([byte])
    if prefix:
        put(table[prefix], width)
    put(eoi, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes) -> bytes:
    clear, eoi = 256, 257
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    acc = 0
    nbits = 0
    pos = 0
    out = bytearray()
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                return bytes(out)
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        acc &= (1 << nbits) - 1
        if code == clear:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt TIFF LZW stream")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        # EarlyChange + the reader's one-entry lag behind the writer:
        # the writer widened when ITS next code hit 2^w - 1, which is
        # when our table (one entry behind) holds 2^w - 2 codes
        if len(table) >= (1 << width) - 2 and width < 12:
            width += 1
        prev = entry


# -- PackBits ----------------------------------------------------------------

def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        lit_start = i
        i += 1
        while (
            i < n
            and i - lit_start < 128
            and not (i + 1 < n and data[i] == data[i + 1])
        ):
            i += 1
        out.append(i - lit_start - 1)
        out += data[lit_start:i]
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        h = data[i]
        i += 1
        if h < 128:
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:
            out += bytes([data[i]]) * (257 - h)
            i += 1
        # 128 = no-op
    return bytes(out)


# -- predictor: horizontal differencing is applied inline (per-channel on a
# (nrows, w, spp) view) in the encoder/decoder below; a flattened-row helper
# here would mix interleaved channels, so none is provided.

# -- encoder ----------------------------------------------------------------

def encode_tiff(
    frames: list[np.ndarray],
    compression: int = 1,
    predictor: bool = False,
    rows_per_strip: int = 16,
) -> bytes:
    """frames: (h, w, 3) RGB or (h, w) grayscale uint8 arrays ->
    little-endian TIFF with chained IFDs (one per frame).
    compression: 1 = none, 5 = LZW, 32773 = PackBits."""
    if compression not in (1, 5, 32773):
        raise ValueError("compression must be 1, 5, or 32773")
    out = bytearray(b"II*\x00")
    out += struct.pack("<I", 0)  # first IFD offset patched below
    ifd_patch_at = 4
    for f in frames:
        f = np.asarray(f, dtype=np.uint8)
        gray = f.ndim == 2
        h, w = f.shape[:2]
        spp = 1 if gray else 3
        flat = f.reshape(h, w * spp)
        strips: list[bytes] = []
        for y0 in range(0, h, rows_per_strip):
            rows = flat[y0 : y0 + rows_per_strip]
            if predictor and compression != 1:
                # horizontal differencing per pixel column, per channel
                block = f[y0 : y0 + rows_per_strip].reshape(len(rows), w, spp)
                d = block.astype(np.int16)
                d[:, 1:, :] -= block[:, :-1, :]
                rows = (d & 0xFF).astype(np.uint8).reshape(len(rows), -1)
            raw = rows.tobytes()
            if compression == 5:
                strips.append(_lzw_encode(raw))
            elif compression == 32773:
                strips.append(_packbits_encode(raw))
            else:
                strips.append(raw)
        strip_offsets = []
        for s in strips:
            strip_offsets.append(len(out))
            out += s
        if len(out) % 2:
            out += b"\x00"
        entries = []

        def entry(tag: int, typ: int, count: int, value: int) -> None:
            entries.append(struct.pack("<HHII", tag, typ, count, value))

        # BitsPerSample for RGB needs an offset array (3 shorts)
        bits_off = None
        if spp == 3:
            bits_off = len(out)
            out += struct.pack("<HHH", 8, 8, 8) + b"\x00\x00"
        offsets_off = len(out)
        for off in strip_offsets:
            out += struct.pack("<I", off)
        counts_off = len(out)
        for s in strips:
            out += struct.pack("<I", len(s))
        entry(_TAG_WIDTH, 3, 1, w)
        entry(_TAG_HEIGHT, 3, 1, h)
        if spp == 3:
            entry(_TAG_BITS, 3, 3, bits_off)
        else:
            entry(_TAG_BITS, 3, 1, 8)
        entry(_TAG_COMPRESSION, 3, 1, compression)
        entry(_TAG_PHOTOMETRIC, 3, 1, 2 if spp == 3 else 1)
        entry(
            _TAG_STRIP_OFFSETS,
            4,
            len(strips),
            offsets_off if len(strips) > 1 else strip_offsets[0],
        )
        entry(_TAG_SAMPLES, 3, 1, spp)
        entry(_TAG_ROWS_PER_STRIP, 3, 1, rows_per_strip)
        entry(
            _TAG_STRIP_COUNTS,
            4,
            len(strips),
            counts_off if len(strips) > 1 else len(strips[0]),
        )
        if predictor and compression != 1:
            entry(_TAG_PREDICTOR, 3, 1, 2)
        entries.sort(key=lambda e: struct.unpack("<H", e[:2])[0])
        ifd_at = len(out)
        struct.pack_into("<I", out, ifd_patch_at, ifd_at)
        out += struct.pack("<H", len(entries))
        for e in entries:
            out += e
        ifd_patch_at = len(out)
        out += struct.pack("<I", 0)  # next IFD (patched by next frame)
    return bytes(out)


# -- decoder ----------------------------------------------------------------

def _decode_tiff_inner(data: bytes) -> list[np.ndarray]:
    """TIFF bytes -> list of (h, w, 3) uint8 RGB frames (grayscale
    replicated), following the IFD chain for multi-page files."""
    data = bytes(data)
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF (bad byte order mark)")
    if struct.unpack(e + "H", data[2:4])[0] != 42:
        raise ValueError("not a TIFF (bad magic 42)")
    ifd_off = struct.unpack(e + "I", data[4:8])[0]
    frames = []
    while ifd_off:
        n = struct.unpack(e + "H", data[ifd_off : ifd_off + 2])[0]
        tags: dict[int, tuple[int, int, bytes]] = {}
        for i in range(n):
            at = ifd_off + 2 + 12 * i
            tag, typ, count = struct.unpack(e + "HHI", data[at : at + 8])
            tags[tag] = (typ, count, data[at + 8 : at + 12])
        ifd_off = struct.unpack(
            e + "I", data[ifd_off + 2 + 12 * n : ifd_off + 6 + 12 * n]
        )[0]

        def val(tag: int, default: int | None = None) -> int:
            if tag not in tags:
                if default is None:
                    raise ValueError(f"missing required TIFF tag {tag}")
                return default
            typ, count, raw = tags[tag]
            fmt = {3: "H", 4: "I"}[typ]
            return struct.unpack(e + fmt, raw[: struct.calcsize(fmt)])[0]

        def arr(tag: int) -> list[int]:
            typ, count, raw = tags[tag]
            fmt = {3: "H", 4: "I"}[typ]
            size = struct.calcsize(fmt)
            if count * size <= 4:
                return [
                    struct.unpack(e + fmt, raw[i * size : (i + 1) * size])[0]
                    for i in range(count)
                ]
            off = struct.unpack(e + "I", raw)[0]
            return [
                struct.unpack(e + fmt, data[off + i * size : off + (i + 1) * size])[0]
                for i in range(count)
            ]

        w = val(_TAG_WIDTH)
        h = val(_TAG_HEIGHT)
        spp = val(_TAG_SAMPLES, 1)
        comp = val(_TAG_COMPRESSION, 1)
        pred = val(_TAG_PREDICTOR, 1)
        rps = val(_TAG_ROWS_PER_STRIP, h)
        bits = arr(_TAG_BITS) if _TAG_BITS in tags else [8]
        if any(b != 8 for b in bits):
            raise NotImplementedError("only 8-bit TIFF is supported")
        offsets = arr(_TAG_STRIP_OFFSETS)
        counts = arr(_TAG_STRIP_COUNTS)
        rows_out = []
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            nrows = min(rps, h - si * rps)
            expected = nrows * w * spp
            chunk = data[off : off + cnt]
            if comp == 1:
                raw = chunk[:expected]
            elif comp == 5:
                raw = _lzw_decode(chunk)[:expected]
            elif comp == 32773:
                raw = _packbits_decode(chunk, expected)
            else:
                raise NotImplementedError(f"TIFF compression {comp}")
            rows = np.frombuffer(raw, np.uint8, count=expected).reshape(
                nrows, w * spp
            )
            if pred == 2:
                block = rows.reshape(nrows, w, spp)
                block = np.cumsum(block.astype(np.uint64), axis=1).astype(np.uint8)
                rows = block.reshape(nrows, w * spp)
            rows_out.append(rows)
        img = np.concatenate(rows_out, axis=0).reshape(h, w, spp)
        if spp == 1:
            img = np.repeat(img, 3, axis=2)
        frames.append(img[:, :, :3])
    return frames


def decode_tiff(*args, **kwargs):
    """Guarded entry: corrupt or truncated input raises ValueError (so
    ingestion pipelines can catch-and-skip bad records), never a raw
    IndexError from a short buffer."""
    try:
        return _decode_tiff_inner(*args, **kwargs)
    except (IndexError, struct.error, KeyError) as exc:
        raise ValueError(f"corrupt or truncated TIFF: {exc}") from exc
