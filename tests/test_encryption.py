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
