"""hash directive algorithm matrix (ref: transformation/MessageHash.java:54-103).

JVM-native family (MD5/SHA-1/SHA-2/CRC32), the hashlib Arrow-UDF tail
(BLAKE2B-*, SHA3-*, SHA-512/224+256, SM3, RIPEMD160) and the stdlib Keccak
sponge are all checked against independently computed digests; the
BouncyCastle-only exotics must raise a clear compile-time error.
"""

from __future__ import annotations

import hashlib

import pytest

from wrangler_spark import Pipeline
from wrangler_spark.errors import DirectiveApplyError

TEXT = "Joltie Root"


def _run(spark, algo: str) -> str:
    df = spark.createDataFrame([(TEXT,)], ["c"])
    # quoted TEXT arg, reference grammar (MessageHash.java:113) — needed
    # for algo names containing '/'
    return Pipeline.compile(f"hash :c '{algo}'").apply(df).collect()[0]["c"]


@pytest.mark.parametrize(
    "algo,name,kwargs",
    [
        ("MD5", "md5", {}),
        ("SHA-1", "sha1", {}),
        ("SHA-256", "sha256", {}),
        ("SHA-384", "sha384", {}),
        ("SHA-512", "sha512", {}),
        ("SHA-512/224", "sha512_224", {}),
        ("SHA-512/256", "sha512_256", {}),
        ("SHA3-224", "sha3_224", {}),
        ("SHA3-256", "sha3_256", {}),
        ("SHA3-512", "sha3_512", {}),
        ("BLAKE2B-160", "blake2b", {"digest_size": 20}),
        ("BLAKE2B-512", "blake2b", {"digest_size": 64}),
    ],
)
def test_hash_matrix_vs_hashlib(spark, algo, name, kwargs):
    expect = hashlib.new(name, TEXT.encode(), **kwargs).hexdigest()
    assert _run(spark, algo) == expect


def test_hash_keccak_known_vectors(spark):
    # published Keccak-256 test vector (pre-SHA3 padding), input "abc"
    df = spark.createDataFrame([("abc",)], ["c"])
    out = Pipeline.compile("hash :c KECCAK-256").apply(df).collect()[0]["c"]
    assert out == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"


def test_hash_crc32(spark):
    import zlib

    expect = format(zlib.crc32(TEXT.encode()), "x")
    assert _run(spark, "CRC32").lstrip("0") == expect.lstrip("0")


def test_hash_binary_mode(spark):
    df = spark.createDataFrame([(TEXT,)], ["c"])
    out = Pipeline.compile("hash :c SHA-256 false").apply(df).collect()[0]["c"]
    assert bytes(out) == hashlib.sha256(TEXT.encode()).digest()


def test_hash_unsupported_raises(spark):
    df = spark.createDataFrame([(TEXT,)], ["c"])
    with pytest.raises(DirectiveApplyError, match="BouncyCastle-only"):
        Pipeline.compile("hash :c WHIRLPOOL").apply(df)


def test_hash_openssl_gap_raises_at_compile_time(spark, monkeypatch):
    """RIPEMD160/SM3 availability depends on the OpenSSL build: when
    hashlib.new refuses the name, the directive must fail on the DRIVER
    with a DirectiveApplyError, not at executor runtime inside the UDF."""
    real_new = hashlib.new

    def fake_new(name, *a, **kw):
        if name == "ripemd160":
            raise ValueError(f"unsupported hash type {name}")
        return real_new(name, *a, **kw)

    monkeypatch.setattr(hashlib, "new", fake_new)
    df = spark.createDataFrame([(TEXT,)], ["c"])
    with pytest.raises(DirectiveApplyError, match="does not provide"):
        Pipeline.compile("hash :c RIPEMD160").apply(df)
