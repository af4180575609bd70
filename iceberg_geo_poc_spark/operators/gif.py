"""GIF87a/89a codec — spec-level, stdlib + numpy only.

Built from the public GIF89a specification: logical screen descriptor,
global/local color tables, graphic-control extensions (frame delay +
transparency), image descriptors with interlace support, and the
variable-width LZW entropy coding (3-12 bit codes, clear/EOI,
dictionary growth) implemented directly.

Why it earns its place in a training-data engine: GIF is the one
ANIMATED format a web corpus reliably contains, so decoding it yields
real multi-frame media for the frame-sampling operators
(operators/multimodal.py sample_media_frames) rather than synthetic
frames — and GIF is lossless over its palette, so round-trip tests are
bit-exact, no tolerance bands.

Encoder (fixtures + corpus synthesis): global palette built from the
frames' unique colors (<=256), optional interlace, per-frame
graphic-control with delay and optional transparency.  Decoder:
full-frame composition honoring disposal none/keep and transparency
over the previous frame.
"""

from __future__ import annotations

import struct

import numpy as np

_HEADER = b"GIF89a"


# -- LZW --------------------------------------------------------------------

def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW: emit clear, codes with growing width, EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    out_bits.append((clear, width))
    prefix = b""
    for sym in indices.tolist():
        trial = prefix + bytes([sym])
        if trial in table:
            prefix = trial
            continue
        out_bits.append((table[prefix], width))
        table[trial] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code > (1 << 12):
            out_bits.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([sym])
    if prefix:
        out_bits.append((table[prefix], width))
    out_bits.append((eoi, width))
    # LSB-first bit packing
    acc = 0
    nbits = 0
    data = bytearray()
    for code, w in out_bits:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    return bytes(data)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    acc = 0
    nbits = 0
    pos = 0
    out = bytearray()
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                return bytes(out)  # truncated stream: return what we have
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW stream")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


# -- interlace ---------------------------------------------------------------

def _interlace_order(h: int) -> np.ndarray:
    """GIF 4-pass interlace row order."""
    return np.concatenate([
        np.arange(0, h, 8), np.arange(4, h, 8),
        np.arange(2, h, 4), np.arange(1, h, 2),
    ]).astype(np.int64)


# -- encoder ----------------------------------------------------------------

def encode_gif(
    frames: list[np.ndarray],
    delay_cs: int = 10,
    interlace: bool = False,
    transparent_rgb: tuple[int, int, int] | None = None,
) -> bytes:
    """frames: list of (h, w, 3) uint8 sharing one <=256-color palette.

    Emits GIF89a: global color table, netscape-free (no loop ext),
    per-frame graphic control (delay, optional transparency keyed on
    ``transparent_rgb``) + image descriptor + LZW data."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames], axis=0), axis=0
    )
    if transparent_rgb is not None:
        t = np.array(transparent_rgb, np.uint8)
        if not (colors == t).all(axis=1).any():
            colors = np.concatenate([colors, t[None]], axis=0)
    if len(colors) > 256:
        raise ValueError("encoder supports <=256 unique colors")
    bits = max(1, int(np.ceil(np.log2(max(len(colors), 2)))))
    table_size = 1 << bits
    palette = np.zeros((table_size, 3), np.uint8)
    palette[: len(colors)] = colors
    # color -> index lookup via packed int
    packed = (
        colors[:, 0].astype(np.int64) << 16
    ) | (colors[:, 1].astype(np.int64) << 8) | colors[:, 2].astype(np.int64)
    lut = {int(p): i for i, p in enumerate(packed)}
    t_idx = (
        lut[(transparent_rgb[0] << 16) | (transparent_rgb[1] << 8) | transparent_rgb[2]]
        if transparent_rgb is not None
        else None
    )
    out = bytearray(_HEADER)
    out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    out.append(0x80 | (bits - 1))  # GCT flag + size
    out.append(0)  # background color index
    out.append(0)  # aspect
    out += palette.tobytes()
    min_code = max(2, bits)
    for f in frames:
        fh, fw = f.shape[:2]
        if (fh, fw) != (h, w):
            raise ValueError("all frames must share the logical screen size")
        # graphic control extension
        out += b"\x21\xf9\x04"
        flags = 0x01 if t_idx is not None else 0x00  # transparency flag
        out.append(flags)
        out += int(delay_cs).to_bytes(2, "little")
        out.append(t_idx or 0)
        out.append(0)  # terminator
        # image descriptor
        out += b"\x2c"
        out += (0).to_bytes(2, "little") * 2
        out += int(fw).to_bytes(2, "little") + int(fh).to_bytes(2, "little")
        out.append(0x40 if interlace else 0x00)
        fp = (
            f[:, :, 0].astype(np.int64) << 16
        ) | (f[:, :, 1].astype(np.int64) << 8) | f[:, :, 2].astype(np.int64)
        idx = np.vectorize(lut.__getitem__, otypes=[np.uint8])(fp)
        if interlace:
            idx = idx[_interlace_order(fh)]
        out.append(min_code)
        data = _lzw_encode(idx.reshape(-1), min_code)
        for i in range(0, len(data), 255):
            block = data[i : i + 255]
            out.append(len(block))
            out += block
        out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


# -- decoder ----------------------------------------------------------------

# Decompression-bomb guards: the logical screen size comes from 4 header
# bytes, so 2 flipped bits can declare a multi-GB canvas for a tiny
# payload.  16.7M pixels (4096x4096 RGB = 50 MB/frame) is far above any
# training-data GIF; MAX_FRAMES bounds the other bomb axis — hundreds of
# tiny highly-compressible frames each materializing a full canvas copy.
# Override per-call for legitimate outliers.
MAX_PIXELS = 1 << 24
MAX_FRAMES = 512


def _decode_gif_inner(
    data: bytes,
    max_pixels: int = MAX_PIXELS,
    max_frames: int = MAX_FRAMES,
) -> list[np.ndarray]:
    """GIF bytes -> list of composed (h, w, 3) uint8 RGB frames."""
    data = bytes(data)
    if data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF")
    w = int.from_bytes(data[6:8], "little")
    h = int.from_bytes(data[8:10], "little")
    if w * h > max_pixels:
        raise ValueError(
            f"GIF logical screen {w}x{h} exceeds max_pixels={max_pixels}"
        )
    flags = data[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    frames: list[np.ndarray] = []
    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None:
        canvas[:, :] = gct[data[11]]  # background color index
    transparent: int | None = None
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = data[pos]
                gflags = data[pos + 1]
                transparent = data[pos + 4] if gflags & 0x01 else None
                pos += 1 + size
                if data[pos] != 0:
                    raise ValueError("bad graphic control terminator")
                pos += 1
            else:  # skip sub-blocks of any other extension
                while data[pos] != 0:
                    pos += 1 + data[pos]
                pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left = int.from_bytes(data[pos : pos + 2], "little")
        top = int.from_bytes(data[pos + 2 : pos + 4], "little")
        fw = int.from_bytes(data[pos + 4 : pos + 6], "little")
        fh = int.from_bytes(data[pos + 6 : pos + 8], "little")
        iflags = data[pos + 8]
        pos += 9
        if fw * fh > max_pixels:
            raise ValueError(
                f"GIF frame {fw}x{fh} exceeds max_pixels={max_pixels}"
            )
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        else:
            table = gct
        if table is None:
            raise ValueError("GIF image without any color table")
        min_code = data[pos]
        pos += 1
        chunks = []
        while data[pos] != 0:
            ln = data[pos]
            chunks.append(data[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            _lzw_decode(b"".join(chunks), min_code), np.uint8
        )[: fw * fh].reshape(fh, fw)
        if iflags & 0x40:  # interlaced: invert the row permutation
            order = _interlace_order(fh)
            de = np.empty_like(idx)
            de[order] = idx
            idx = de
        region = canvas[top : top + fh, left : left + fw]
        rgb = table[np.minimum(idx, len(table) - 1)]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:, :] = rgb
        frames.append(canvas.copy())
        if len(frames) > max_frames:
            raise ValueError(
                f"GIF exceeds max_frames={max_frames} "
                f"(decoded output would be unbounded)"
            )
        transparent = None
    return frames


def decode_gif(*args, **kwargs):
    """Guarded entry: corrupt or truncated input raises ValueError (so
    ingestion pipelines can catch-and-skip bad records), never a raw
    IndexError from a short buffer."""
    try:
        return _decode_gif_inner(*args, **kwargs)
    except (IndexError, struct.error, KeyError) as exc:
        raise ValueError(f"corrupt or truncated GIF: {exc}") from exc
