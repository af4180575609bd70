"""FLAC codec — spec-level subset, stdlib + numpy only.

Built from the public FLAC format specification (xiph.org / RFC 9639):
stream = "fLaC" magic + metadata blocks (STREAMINFO parsed, others
skipped) + frames; frame = sync header (blocking strategy, block size,
sample rate, channel assignment, bits-per-sample, UTF-8-coded frame
number, CRC-8) + one subframe per channel + CRC-16.  Subframes:
CONSTANT, VERBATIM, FIXED orders 0-4 with partitioned Rice-coded
residuals — the complete lossless decode path for the encoder subset
below, and the decoder also handles left/side, right/side and mid/side
stereo decorrelation.

FLAC is lossless, so every round-trip test is bit-exact — same testing
posture as the GIF codec, no tolerance bands.  The encoder (fixtures +
corpus synthesis) picks the best FIXED predictor order per block by
residual magnitude and Rice-codes with a per-block parameter estimate;
compression is secondary to correctness, but typical speech-like
signals compress 2-3x.

Scale posture: decode runs per-file inside mapInPandas batches exactly
like WAV/JPEG/GIF — embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"fLaC"

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_CRC8_POLY = 0x07
_CRC16_POLY = 0x8005


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        table.append(crc & mask)
    return table


_CRC8_TABLE = _crc_table(_CRC8_POLY, 8)
_CRC16_TABLE = _crc_table(_CRC16_POLY, 16)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = (_CRC16_TABLE[((crc >> 8) ^ b) & 0xFF] ^ (crc << 8)) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, width: int) -> None:
        self.acc = (self.acc << width) | (value & ((1 << width) - 1))
        self.nbits += width
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def unary(self, q: int) -> None:
        # q zero bits then a one bit
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.put(0, 8 - self.nbits)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= width
        val = (self.acc >> self.nbits) & ((1 << width) - 1)
        self.acc &= (1 << self.nbits) - 1
        return val

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0

    def byte_pos(self) -> int:
        return self.pos - (self.nbits // 8)


def _zigzag(v: np.ndarray) -> np.ndarray:
    return np.where(v >= 0, 2 * v, -2 * v - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _rice_write(bw: _BitWriter, residual: np.ndarray) -> None:
    """One partition (order 0), parameter chosen from the mean."""
    u = _zigzag(residual.astype(np.int64))
    mean = float(u.mean()) if len(u) else 0.0
    k = 0
    # 4-bit parameter field: 15 is the escape code, so k caps at 14
    while (1 << k) < mean and k < 14:
        k += 1
    bw.put(0, 2)  # residual coding method: Rice (4-bit params)
    bw.put(0, 4)  # partition order 0
    bw.put(k, 4)
    for val in u.tolist():
        bw.unary(val >> k)
        if k:
            bw.put(val & ((1 << k) - 1), k)


def _rice_read(br: _BitReader, n: int, predictor_order: int) -> np.ndarray:
    method = br.read(2)
    if method not in (0, 1):
        raise ValueError("reserved residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = br.read(4)
    out = np.zeros(n, dtype=np.int64)
    idx = 0
    nparts = 1 << porder
    for p in range(nparts):
        cnt = (n + predictor_order) >> porder
        if p == 0:
            cnt -= predictor_order
        k = br.read(plen)
        if k == escape:
            bits = br.read(5)
            for i in range(cnt):
                out[idx + i] = _sign_extend(br.read(bits), bits) if bits else 0
        else:
            for i in range(cnt):
                q = br.unary()
                u = (q << k) | (br.read(k) if k else 0)
                out[idx + i] = _unzigzag(u)
        idx += cnt
    return out


def _sign_extend(v: int, bits: int) -> int:
    if bits and v & (1 << (bits - 1)):
        return v - (1 << bits)
    return v


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style frame number coding."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (5 * nbytes + 1)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    val = first & (mask - 1)
    for _ in range(nbytes - 1):
        val = (val << 6) | (br.read(8) & 0x3F)
    return val


# -- encoder ----------------------------------------------------------------

def encode_flac(
    samples: np.ndarray, sample_rate: int = 16000, block_size: int = 4096
) -> bytes:
    """int16 samples, shape (n,) mono or (n, channels) -> FLAC bytes.

    Independent channels, FIXED predictors (best of orders 0-2 by
    residual magnitude), single Rice partition."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if not (1 <= ch <= 8):
        raise ValueError("1-8 channels")
    # STREAMINFO
    info = _BitWriter()
    info.put(block_size, 16)  # min block size
    info.put(block_size, 16)  # max block size
    info.put(0, 24)  # min frame size unknown
    info.put(0, 24)  # max frame size unknown
    info.put(sample_rate, 20)
    info.put(ch - 1, 3)
    info.put(16 - 1, 5)  # bits per sample
    info.put(n, 36)
    info_bytes = bytes(info.out) + b"\x00" * 16  # md5 unset
    out = bytearray(_MAGIC)
    out.append(0x80 | 0x00)  # last metadata block, type 0 = STREAMINFO
    out += len(info_bytes).to_bytes(3, "big")
    out += info_bytes
    frame_no = 0
    for start in range(0, max(n, 1), block_size):
        block = s[start : start + block_size]
        bn = len(block)
        if bn == 0:
            break
        header = bytearray(b"\xff\xf8")  # sync + fixed blocksize strategy
        # block size bits: 0b0111 -> 16-bit value-1 at end of header
        # sample rate: 0b0000 -> from STREAMINFO
        header.append((0x07 << 4) | 0x00)
        header.append(((ch - 1) << 4) | (0x04 << 1))  # 16 bps (100), pad 0
        header += _utf8_number(frame_no)
        header += (bn - 1).to_bytes(2, "big")
        header.append(_crc8(bytes(header)))
        bw = _BitWriter()
        for c in range(ch):
            x = block[:, c]
            # choose FIXED order with the smallest abs residual sum
            best_order, best_res, best_cost = 0, x, None
            for order, coefs in list(_FIXED_COEFS.items())[:3]:
                if bn <= order:
                    continue
                res = x[order:].astype(np.int64)
                for j, cf in enumerate(coefs):
                    res = res - cf * x[order - 1 - j : bn - 1 - j]
                cost = int(np.abs(res).sum())
                if best_cost is None or cost < best_cost:
                    best_order, best_res, best_cost = order, res, cost
            bw.put(0, 1)  # subframe header pad
            bw.put(0x08 | best_order, 6)  # FIXED, order
            bw.put(0, 1)  # no wasted bits
            for w in block[:best_order, c].tolist():
                bw.put(int(w) & 0xFFFF, 16)  # warm-up samples
            _rice_write(bw, best_res)
        bw.align()
        frame = bytes(header) + bytes(bw.out)
        out += frame
        out += _crc16(frame).to_bytes(2, "big")
        frame_no += 1
    return bytes(out)


# -- decoder ----------------------------------------------------------------

def _decode_flac_inner(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> (int16 samples shaped (n, channels), sample_rate)."""
    data = bytes(data)
    if data[:4] != _MAGIC:
        raise ValueError("not a FLAC stream")
    pos = 4
    sample_rate = None
    channels = None
    bps = None
    total = None
    # metadata blocks
    while True:
        hdr = data[pos]
        btype = hdr & 0x7F
        last = bool(hdr & 0x80)
        size = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + size]
        if btype == 0:  # STREAMINFO
            br = _BitReader(body)
            br.read(16)
            br.read(16)
            br.read(24)
            br.read(24)
            sample_rate = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
        pos += 4 + size
        if last:
            break
    if sample_rate is None:
        raise ValueError("missing STREAMINFO")
    if bps != 16:
        raise NotImplementedError("only 16-bit FLAC is supported")
    chans: list[list[np.ndarray]] = [[] for _ in range(channels)]
    got = 0
    while pos < len(data) - 1 and (total is None or got < total):
        if data[pos] != 0xFF or (data[pos + 1] & 0xFC) != 0xF8:
            raise ValueError("lost frame sync")
        br = _BitReader(data, pos + 2)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        bps_code = br.read(3)
        br.read(1)  # reserved
        _read_utf8_number(br)
        if bs_code == 0x06:
            bn = br.read(8) + 1
        elif bs_code == 0x07:
            bn = br.read(16) + 1
        elif 0x02 <= bs_code <= 0x05:
            bn = (576, 1152, 2304, 4608)[bs_code - 2]
        elif bs_code >= 0x08:
            bn = 256 << (bs_code - 8)
        else:
            raise ValueError("reserved block size code")
        if sr_code == 0x0C:
            br.read(8)
        elif sr_code in (0x0D, 0x0E):
            br.read(16)
        br.read(8)  # header CRC (trusted; content CRC16 below validates)
        if ch_code <= 7:
            nch = ch_code + 1
            mode = "indep"
        else:
            nch = 2
            mode = {8: "left", 9: "right", 10: "mid"}[ch_code]
        sub = []
        for c in range(nch):
            extra = 1 if (
                (mode == "left" and c == 1)
                or (mode == "right" and c == 0)
                or (mode == "mid" and c == 1)
            ) else 0
            sub.append(_decode_subframe(br, bn, 16 + extra))
        br.align()
        end = br.byte_pos()
        # frame CRC16 over header+subframes must match
        if _crc16(data[pos:end]) != int.from_bytes(data[end : end + 2], "big"):
            raise ValueError("frame CRC16 mismatch")
        pos = end + 2
        if mode == "indep":
            decoded = sub
        elif mode == "left":
            left = sub[0]
            decoded = [left, left - sub[1]]
        elif mode == "right":
            right = sub[1]
            decoded = [sub[0] + right, right]
        else:  # mid/side
            side = sub[1]
            mid = (sub[0] << 1) | (side & 1)
            decoded = [(mid + side) >> 1, (mid - side) >> 1]
        for c in range(nch):
            chans[c].append(decoded[c])
        got += bn
    arr = np.stack(
        [np.concatenate(c)[: total or None] for c in chans], axis=1
    ).astype(np.int16)
    return arr, sample_rate


def _decode_subframe(br: _BitReader, bn: int, bps: int) -> np.ndarray:
    br.read(1)  # pad
    stype = br.read(6)
    wasted = 0
    if br.read(1):  # wasted bits flag
        wasted = 1 + br.unary()
        bps -= wasted
    if stype == 0x00:  # CONSTANT
        v = _sign_extend(br.read(bps), bps)
        out = np.full(bn, v, dtype=np.int64)
    elif stype == 0x01:  # VERBATIM
        out = np.fromiter(
            (_sign_extend(br.read(bps), bps) for _ in range(bn)),
            dtype=np.int64,
            count=bn,
        )
    elif 0x08 <= stype <= 0x0C:  # FIXED
        order = stype - 0x08
        warm = [_sign_extend(br.read(bps), bps) for _ in range(order)]
        res = _rice_read(br, bn - order, order)
        out = np.empty(bn, dtype=np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, bn):
            acc = res[i - order]
            for j, cf in enumerate(coefs):
                acc += cf * out[i - 1 - j]
            out[i] = acc
    elif stype >= 0x20:  # LPC
        order = (stype & 0x1F) + 1
        warm = [_sign_extend(br.read(bps), bps) for _ in range(order)]
        prec = br.read(4) + 1
        shift = _sign_extend(br.read(5), 5)
        coefs = [_sign_extend(br.read(prec), prec) for _ in range(order)]
        res = _rice_read(br, bn - order, order)
        out = np.empty(bn, dtype=np.int64)
        out[:order] = warm
        for i in range(order, bn):
            acc = 0
            for j in range(order):
                acc += coefs[j] * out[i - 1 - j]
            out[i] = res[i - order] + (acc >> shift)
    else:
        raise ValueError(f"reserved subframe type {stype}")
    return out << wasted


def decode_flac(*args, **kwargs):
    """Guarded entry: corrupt or truncated input raises ValueError (so
    ingestion pipelines can catch-and-skip bad records), never a raw
    IndexError from a short buffer."""
    try:
        return _decode_flac_inner(*args, **kwargs)
    except (IndexError, struct.error, KeyError) as exc:
        raise ValueError(f"corrupt or truncated FLAC stream: {exc}") from exc
