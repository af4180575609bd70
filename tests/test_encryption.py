"""AES-GCM table encryption (table/encryption.py): FIPS-197 / NIST
SP 800-38D vectors, envelope tamper detection, and an encrypted-table
round-trip with the whole metadata plane sealed behind the FileIO seam.
"""

from __future__ import annotations

import os
import uuid

import pytest
import pyspark.sql.functions as F

from iceberg_geo_poc_spark.table.encryption import (
    AesGcm,
    EncryptingFileIO,
    _encrypt_block,
    _key_schedule,
)


def test_aes_core_fips197_appendix_vectors():
    # FIPS-197 Appendix C.1 (AES-128) and C.3 (AES-256)
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    assert (
        _encrypt_block(_key_schedule(bytes(range(16))), pt).hex()
        == "69c4e0d86a7b0430d8cdb78070b4c55a"
    )
    assert (
        _encrypt_block(_key_schedule(bytes(range(32))), pt).hex()
        == "8ea2b7ca516745bfeafc49904b496089"
    )


def test_gcm_nist_test_vectors():
    # NIST GCM spec test case 1: zero key/IV, empty plaintext -> tag only
    g = AesGcm(b"\x00" * 16)
    assert g.encrypt(b"\x00" * 12, b"").hex() == (
        "58e2fccefa7e3061367f1d57a4e7455a"
    )
    # test case 2: 16 zero bytes of plaintext
    out = g.encrypt(b"\x00" * 12, b"\x00" * 16)
    assert out[:16].hex() == "0388dace60b6a392f328c2b971b2fe78"
    assert out[16:].hex() == "ab6e47d42cec13bdf53a67b21257bddf"


def test_gcm_roundtrip_sizes_and_aad():
    g = AesGcm(os.urandom(32))
    for size in (0, 1, 15, 16, 17, 4096, 100_003):
        pt = os.urandom(size)
        nonce = os.urandom(12)
        ct = g.encrypt(nonce, pt, b"ctx")
        assert len(ct) == size + 16
        assert g.decrypt(nonce, ct, b"ctx") == pt
    nonce = os.urandom(12)
    ct = g.encrypt(nonce, b"payload", b"good-aad")
    with pytest.raises(ValueError, match="tag mismatch"):
        g.decrypt(nonce, ct, b"evil-aad")


def test_envelope_tamper_and_wrong_key():
    g = AesGcm(os.urandom(16))
    sealed = g.seal(b"metadata document")
    assert g.open(sealed) == b"metadata document"
    for pos in (0, 5, len(sealed) // 2, len(sealed) - 1):
        bad = bytearray(sealed)
        bad[pos] ^= 0x40
        with pytest.raises(ValueError):
            g.open(bytes(bad))
    with pytest.raises(ValueError, match="tag mismatch"):
        AesGcm(os.urandom(16)).open(sealed)


def test_encrypted_table_roundtrip(spark, tmp_path):
    """Full table lifecycle with every metadata-plane object sealed:
    commits, reads, time travel — and the raw bytes on the inner store
    are ciphertext (reference EncryptionManager posture)."""
    import pyarrow.fs as pafs

    from iceberg_geo_poc_spark.table.catalog import Catalog
    from iceberg_geo_poc_spark.table.fileio import (
        ArrowFSFileIO,
        register_file_io,
    )

    scheme = f"enc{uuid.uuid4().hex[:6]}"
    wh = f"{scheme}://wh"
    inner = ArrowFSFileIO(pafs._MockFileSystem(), scheme)
    key = os.urandom(32)
    sealed_io = EncryptingFileIO(inner, key)
    register_file_io(wh + "/", sealed_io)

    cat = Catalog(wh, spark)
    t = cat.create_table("sec", "id BIGINT, cat STRING")
    df = spark.range(80).select(
        "id", (F.col("id") % 4).cast("string").alias("cat")
    )
    t.append(df)
    t = cat.load_table("sec")
    t.append(df.withColumn("id", F.col("id") + 1000))
    t = cat.load_table("sec")
    assert t.to_df().count() == 160
    assert len(t.meta.snapshots) == 2
    # every stored object is a sealed envelope, nothing in the clear
    paths = inner.list_files(f"{wh}/sec")
    meta_objects = [p for p in paths if "/metadata/" in p]
    assert meta_objects
    for p in meta_objects:
        raw = inner.read_bytes(p)
        assert raw[:4] == b"AGSP"
        assert b"snapshots" not in raw and b"parquet" not in raw
    # DATA files go through the same seam on object-store locations:
    # sealed at rest too (only Parquet MODULAR encryption — in-place
    # vectorized scans of encrypted parquet — is out of scope)
    data_objects = [p for p in paths if "/data/" in p]
    assert data_objects
    for p in data_objects:
        raw = inner.read_bytes(p)
        assert raw[:4] in (b"AGSP", b"AGS1") and raw[:4] != b"PAR1"
    # a reader without the key sees only ciphertext
    with pytest.raises(ValueError):
        AesGcm(os.urandom(32)).open(inner.read_bytes(meta_objects[0]))
    # time travel still works through the sealed plane
    first = t.meta.snapshots[0].snapshot_id
    assert t.to_df(snapshot_id=first).count() == 80


def test_gcm_property_roundtrip_and_tamper():
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        key=st.sampled_from([16, 24, 32]).flatmap(
            lambda n: st.binary(min_size=n, max_size=n)
        ),
        pt=st.binary(max_size=600),
        aad=st.binary(max_size=40),
        nonce=st.binary(min_size=12, max_size=12),
        flip=st.integers(min_value=0, max_value=10**9),
    )
    def check(key, pt, aad, nonce, flip):
        g = AesGcm(key)
        ct = g.encrypt(nonce, pt, aad)
        assert g.decrypt(nonce, ct, aad) == pt
        bad = bytearray(ct)
        pos = flip % len(bad)
        bad[pos] ^= 1 << (flip % 8)
        with pytest.raises(ValueError):
            g.decrypt(nonce, bytes(bad), aad)

    check()


def test_gcm_stream_roundtrip_sizes():
    gcm = AesGcm(os.urandom(16))
    for size in (0, 1, 15, 16, 17, 100, 256, 257, 512, 1000):
        pt = os.urandom(size)
        sealed = gcm.seal_stream(pt, b"aad", block_size=256)
        assert sealed[:4] == b"AGS1"
        assert gcm.open_stream(sealed, b"aad") == pt


def test_gcm_stream_range_reads():
    import numpy as np

    gcm = AesGcm(os.urandom(24))
    pt = bytes(np.random.default_rng(1).integers(0, 256, 10_000, dtype=np.uint8))
    sealed = gcm.seal_stream(pt, b"p", block_size=1024)
    rng = np.random.default_rng(2)
    for _ in range(40):
        off = int(rng.integers(0, len(pt)))
        ln = int(rng.integers(0, len(pt) - off + 1))
        assert gcm.open_stream_range(sealed, off, ln, b"p") == pt[off : off + ln]
    # out-of-range refused
    with pytest.raises(ValueError):
        gcm.open_stream_range(sealed, len(pt) - 1, 2, b"p")


def test_gcm_stream_tamper_and_block_swap():
    gcm = AesGcm(os.urandom(16))
    pt = os.urandom(3000)
    sealed = bytearray(gcm.seal_stream(pt, block_size=1024))
    # flip a byte inside block 1's ciphertext
    blk = 16 + (12 + 1024 + 16) + 12 + 5
    sealed[blk] ^= 1
    # range read NOT covering block 1 still fine
    assert gcm.open_stream_range(bytes(sealed), 0, 100) == pt[:100]
    # covering reads fail the tag
    with pytest.raises(ValueError):
        gcm.open_stream_range(bytes(sealed), 1024, 10)
    # block swap is caught by the index-bound AAD even with valid tags
    good = gcm.seal_stream(pt, block_size=1024)
    sb = 12 + 1024 + 16
    swapped = (
        good[:16]
        + good[16 + sb : 16 + 2 * sb]
        + good[16 : 16 + sb]
        + good[16 + 2 * sb :]
    )
    with pytest.raises(ValueError):
        gcm.open_stream(swapped)
    # header tamper (block size) fails every block via AAD binding
    bad_header = bytearray(good)
    bad_header[4] ^= 1
    with pytest.raises(ValueError):
        gcm.open_stream_range(bytes(bad_header), 0, 10)


def test_encrypting_fileio_stream_dispatch(tmp_path):
    import pyarrow.fs as pafs

    from iceberg_geo_poc_spark.table.fileio import ArrowFSFileIO

    scheme = f"encs{uuid.uuid4().hex[:6]}"
    inner = ArrowFSFileIO(pafs._MockFileSystem(), scheme)
    io = EncryptingFileIO(
        inner, os.urandom(32), stream_threshold=1000, stream_block=512
    )
    small, big = os.urandom(100), os.urandom(5000)
    io.write_bytes(f"{scheme}://d/small", small)
    io.write_bytes(f"{scheme}://d/big", big)
    assert inner.read_bytes(f"{scheme}://d/small")[:4] == b"AGSP"
    assert inner.read_bytes(f"{scheme}://d/big")[:4] == b"AGS1"
    assert io.read_bytes(f"{scheme}://d/small") == small
    assert io.read_bytes(f"{scheme}://d/big") == big
    # ranged reads on both forms
    assert io.read_range(f"{scheme}://d/small", 10, 20) == small[10:30]
    assert io.read_range(f"{scheme}://d/big", 1500, 600) == big[1500:2100]


def test_encrypted_table_with_dv_deletes(spark, tmp_path):
    """DV sidecars on an encrypted table: blobs are sealed at rest in
    the chunked-stream form and the scan's blob reads decrypt only the
    covering blocks (read_range), still returning exact rows."""
    import pyarrow.fs as pafs

    from iceberg_geo_poc_spark.table import E
    from iceberg_geo_poc_spark.table.catalog import Catalog
    from iceberg_geo_poc_spark.table.fileio import (
        ArrowFSFileIO,
        register_file_io,
    )

    scheme = f"encdv{uuid.uuid4().hex[:6]}"
    wh = f"{scheme}://wh"
    inner = ArrowFSFileIO(pafs._MockFileSystem(), scheme)
    sealed_io = EncryptingFileIO(
        inner, os.urandom(32), stream_threshold=64, stream_block=256
    )
    register_file_io(wh + "/", sealed_io)
    cat = Catalog(wh, spark)
    t = cat.create_table("secdv", "id BIGINT, v STRING")
    t.append(
        spark.createDataFrame(
            [(i, f"r{i}") for i in range(300)], "id BIGINT, v STRING"
        ).repartition(3)
    )
    t = cat.load_table("secdv")
    t.delete(E.lt("id", 50), mode="merge-on-read-dv")
    t = cat.load_table("secdv")
    dv_files = [p for p in inner.list_files(f"{wh}/secdv") if p.endswith(".puffin")]
    assert dv_files, "DV sidecar expected"
    for p in dv_files:
        assert inner.read_bytes(p)[:4] == b"AGS1", "sidecar not stream-sealed"
    assert sorted(r.id for r in t.to_df().collect()) == list(range(50, 300))


def test_rotate_encryption_key(spark):
    import pyarrow.fs as pafs

    from iceberg_geo_poc_spark.table.catalog import Catalog
    from iceberg_geo_poc_spark.table.encryption import rotate_encryption_key
    from iceberg_geo_poc_spark.table.fileio import (
        ArrowFSFileIO,
        io_for,
        register_file_io,
    )

    scheme = f"rot{uuid.uuid4().hex[:6]}"
    wh = f"{scheme}://wh"
    inner = ArrowFSFileIO(pafs._MockFileSystem(), scheme)
    old_key, new_key = os.urandom(32), os.urandom(32)
    register_file_io(wh + "/", EncryptingFileIO(inner, old_key))
    cat = Catalog(wh, spark)
    t = cat.create_table("r", "id BIGINT")
    t.append(spark.range(50).select("id"))
    rotate_encryption_key(wh + "/", new_key)
    # every object now opens with the new key, none with the old
    new_gcm, old_gcm = AesGcm(new_key), AesGcm(old_key)
    objs = inner.list_files(wh)
    assert objs
    for p in objs:
        raw = inner.read_bytes(p)
        assert raw[:4] in (b"AGSP", b"AGS1")
        if raw[:4] == b"AGSP":
            new_gcm.open(raw)
            with pytest.raises(ValueError):
                old_gcm.open(raw)
    # the registered IO serves the new key and the table still reads
    assert isinstance(io_for(wh + "/x"), EncryptingFileIO)
    t = cat.load_table("r")
    assert t.to_df().count() == 50
    # appends after rotation seal with the new key
    t.append(spark.range(50, 80).select("id"))
    assert cat.load_table("r").to_df().count() == 80
    # idempotent re-run
    rotate_encryption_key(wh + "/", new_key)
    assert cat.load_table("r").to_df().count() == 80


def test_gcm_stream_property_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    gcm = AesGcm(b"\x05" * 16)

    @given(
        st.binary(max_size=4096),
        st.integers(min_value=1, max_value=1500),
        st.binary(max_size=8),
    )
    @settings(max_examples=60, deadline=None)
    def check(pt, block, aad):
        sealed = gcm.seal_stream(pt, aad, block_size=block)
        assert gcm.open_stream(sealed, aad) == pt
        if len(pt) >= 2:
            mid = len(pt) // 2
            assert gcm.open_stream_range(sealed, mid, len(pt) - mid, aad) == pt[mid:]
        # wrong aad fails closed
        if pt:
            try:
                gcm.open_stream(sealed, aad + b"x")
                raise AssertionError("wrong AAD accepted")
            except ValueError:
                pass

    check()
