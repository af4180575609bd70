"""Puffin statistics file format — spec-level writer/reader.

The reference stores table statistics as Puffin files (format spec in
the Iceberg repo: ``format/puffin-spec.md``; writer/reader under
core/src/main/java/org/apache/iceberg/puffin/):

    Magic ("PFA1") | blob payloads... |
    Magic | FooterPayload (JSON) | FooterPayloadSize (4B LE) |
    Flags (4B) | Magic

FooterPayload lists every blob's ``type``, ``fields`` (column ids —
this engine uses schema position), ``snapshot-id``,
``sequence-number``, ``offset``, ``length``, and free-form
``properties``.  Flags bit 0 of byte 0 marks a compressed footer; this
writer emits uncompressed footers (the spec's default) and the reader
rejects the compressed flag explicitly rather than mis-parsing.

table/statistics.py writes NDV stats through this module, so the
statistics sidecars on disk are format-compatible with the reference's
(same magic, same footer schema) instead of ad-hoc JSON.
"""

from __future__ import annotations

import json
import struct

MAGIC = b"PFA1"


def write_puffin(
    blobs: list[dict],
    payloads: list[bytes],
    file_properties: dict[str, str] | None = None,
) -> bytes:
    """``blobs[i]`` carries type/fields/snapshot-id/sequence-number/
    properties for ``payloads[i]``; offsets/lengths are computed here."""
    if len(blobs) != len(payloads):
        raise ValueError("blobs and payloads must align")
    out = bytearray(MAGIC)
    footer_blobs = []
    for meta, payload in zip(blobs, payloads):
        entry = dict(meta)
        entry["offset"] = len(out)
        entry["length"] = len(payload)
        footer_blobs.append(entry)
        out += payload
    footer_payload = json.dumps(
        {"blobs": footer_blobs, "properties": dict(file_properties or {})}
    ).encode()
    out += MAGIC
    out += footer_payload
    out += struct.pack("<i", len(footer_payload))
    out += b"\x00\x00\x00\x00"  # flags: uncompressed footer
    out += MAGIC
    return bytes(out)


def read_puffin(data: bytes) -> tuple[dict, list[bytes]]:
    """-> (footer dict, payload bytes per blob, footer order)."""
    data = bytes(data)
    if data[:4] != MAGIC or data[-4:] != MAGIC:
        raise ValueError("not a Puffin file (bad magic)")
    flags = data[-8:-4]
    if flags[0] & 0x01:
        raise NotImplementedError(
            "compressed Puffin footers are not supported (writer never "
            "emits them; spec allows lz4/zstd)"
        )
    (size,) = struct.unpack("<i", data[-12:-8])
    footer_start = len(data) - 12 - size
    footer = json.loads(data[footer_start : footer_start + size])
    if data[footer_start - 4 : footer_start] != MAGIC:
        raise ValueError("corrupt Puffin footer (missing magic)")
    payloads = [
        data[b["offset"] : b["offset"] + b["length"]]
        for b in footer.get("blobs", [])
    ]
    return footer, payloads
