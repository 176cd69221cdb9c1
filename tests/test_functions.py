"""Unit tests for the scalar layer (SURVEY §2.2) with literal vectors,
including every preserved quirk: exactly-4-byte calldata (P5), precompile
selector masking (P6), short ecRecover output (P7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from evmtrace_etl_spark.functions import (
    EC_PAIRING_ADDRESS,
    EC_RECOVER_ADDRESS,
    ZERO_ADDRESS,
    ZERO_SELECTOR,
    ec_recover_address,
    keccak256,
    pairing_input_size,
    selector,
    selector_masked,
    to_checksum_address,
    to_checksum_udf,
)

SOME_ADDR = "0x" + "12" * 20


def _run(spark, col, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return [r[0] for r in df.select(col).collect()]


def test_keccak_vectors():
    assert (
        keccak256(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert (
        keccak256(b"The quick brown fox jumps over the lazy dog").hex()
        == "4d741b6f1eb29cb2a9b9911c82f56fa8d73b04959d3d9d222895df6c0b28aa15"
    )


def test_eip55_vectors():
    # test vectors from the EIP-55 specification
    for want in [
        "0x5aAeb6053F3E94C9b9A09f33669435E7Ef1BeAed",
        "0xfB6916095ca1df60bB79Ce92cE3Ea74c37c5d359",
        "0xdbF03B407c01E7cD3CBea99509d93f8DDDC8C6FB",
        "0xD1220A0cf47c7B9Be7A2E6BA89F429762e7b9aDb",
    ]:
        assert to_checksum_address(want.lower()) == want


def test_selector_quirks(spark):
    rows = [
        ("0xaabbccdd00112233",),  # 8 bytes -> first 4
        ("0xaabbccdd",),  # exactly 4 bytes -> ZERO (reference `len > 4`)
        ("0xaabb",),  # short -> zero
        ("0x",),  # empty -> zero
        (None,),  # null -> zero
    ]
    got = _run(spark, selector("input"), rows, "input string")
    assert got == ["0xaabbccdd", ZERO_SELECTOR, ZERO_SELECTOR, ZERO_SELECTOR, ZERO_SELECTOR]


def test_selector_masked_for_precompiles(spark):
    rows = [
        ("0xaabbccdd00112233", SOME_ADDR),
        ("0xaabbccdd00112233", EC_RECOVER_ADDRESS),  # masked
        ("0xaabbccdd00112233", EC_PAIRING_ADDRESS),  # masked
    ]
    got = _run(
        spark,
        selector_masked("input", "to_address"),
        rows,
        "input string, to_address string",
    )
    assert got == ["0xaabbccdd", ZERO_SELECTOR, ZERO_SELECTOR]


def test_ec_recover_address(spark):
    full = "0x" + "00" * 12 + "ab" * 20  # exactly 32 bytes
    rows = [(full,), ("0x" + "aa" * 20,), (None,)]
    got = _run(spark, ec_recover_address("output"), rows, "output string")
    assert got == ["0x" + "ab" * 20, ZERO_ADDRESS, None]


def test_pairing_input_size(spark):
    rows = [("0x" + "cd" * 192,), ("0x",), (None,)]
    got = _run(spark, pairing_input_size("input"), rows, "input string")
    assert got == [192, 0, 0]


def test_checksum_udf(spark):
    df = spark.createDataFrame(
        [("0x5aaeb6053f3e94c9b9a09f33669435e7ef1beaed",)], "addr string"
    )
    got = df.select(to_checksum_udf(F.col("addr"))).collect()[0][0]
    assert got == "0x5aAeb6053F3E94C9b9A09f33669435E7Ef1BeAed"


def test_md5_long_halves_and_hash32_equivalence(spark):
    """md5_long(c,1,7) == hash32(c); the (1,8)/(9,8) halves used by the
    64-bit SimHash stay inside [0, 2^32); length bounds enforced."""
    import pytest as _pytest

    from pyspark.sql import functions as F
    from evmtrace_etl_spark.functions.text import hash32, md5_long

    df = spark.createDataFrame(
        [(f"token{i}",) for i in range(50)], "t string"
    ).select(
        hash32(F.col("t")).alias("h32"),
        md5_long(F.col("t"), 1, 7).alias("m7"),
        md5_long(F.col("t"), 1, 8).alias("lo"),
        md5_long(F.col("t"), 9, 8).alias("hi"),
    )
    for r in df.collect():
        assert r["h32"] == r["m7"]
        assert 0 <= r["lo"] < 2**32 and 0 <= r["hi"] < 2**32
    with _pytest.raises(ValueError):
        md5_long(F.col("t"), 1, 16)
