"""tier-18 interop scalars (functions/registry.py): known-constant
pins and edges the oracled entry (sql_fn_tier18) can't reach —
the fixture never exercises >32-bit byteSwap masking, every padding
class of base64URL, or the ladder boundaries exactly.
"""

from __future__ import annotations

import base64
import hashlib

from pyspark.sql import functions as F

from nutdb_spark.functions.registry import SCALAR_FNS


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_byteswap_constants_and_masking(spark):
    f = SCALAR_FNS["byteSwap"]
    assert _one(spark, f(F.lit(0x12345678))) == 0x78563412
    assert _one(spark, f(F.lit(0))) == 0
    assert _one(spark, f(F.lit(0xFF))) == 0xFF000000
    # >32-bit input: low 32 bits only (the documented UInt32 contract)
    assert _one(spark, f(F.lit(0x1_12345678))) == 0x78563412


def test_round_ladders_at_boundaries(spark):
    ra = SCALAR_FNS["roundAge"]
    for x, want in [(0, 0), (1, 17), (17, 17), (18, 18), (24, 18),
                    (25, 25), (34, 25), (35, 35), (44, 35), (45, 45),
                    (54, 45), (55, 55), (99, 55)]:
        assert _one(spark, ra(F.lit(x))) == want, x
    rd = SCALAR_FNS["roundDuration"]
    for x, want in [(0, 0), (1, 1), (9, 1), (10, 10), (59, 30),
                    (60, 60), (3599, 1800), (3600, 3600),
                    (35999, 18000), (36000, 36000), (10**6, 36000)]:
        assert _one(spark, rd(F.lit(x))) == want, x


def test_ipv4_round_trip_and_rejects(spark):
    n2s, s2n, isip = (
        SCALAR_FNS["IPv4NumToString"],
        SCALAR_FNS["IPv4StringToNum"],
        SCALAR_FNS["isIPv4String"],
    )
    for n in (0, 1, 255, 256, 3232235777, 4294967295):
        s = _one(spark, n2s(F.lit(n)))
        assert _one(spark, s2n(F.lit(s))) == n, s
    for bad in ("999.1.1.1", "1.2.3", "1.2.3.4.5", "", "a.b.c.d",
                "256.0.0.1"):
        assert _one(spark, isip(F.lit(bad))) is False, bad
        assert _one(spark, s2n(F.lit(bad))) is None, bad


def test_half_md5_matches_hashlib(spark):
    f = SCALAR_FNS["halfMD5"]
    for s in ("", "abc", "the quick brown fox"):
        want = int(hashlib.md5(s.encode()).hexdigest()[:16], 16)
        assert int(_one(spark, f(F.lit(s)))) == want, s


def test_base64url_all_padding_classes(spark):
    enc, dec = (
        SCALAR_FNS["base64URLEncode"],
        SCALAR_FNS["base64URLDecode"],
    )
    for s in ("", "a", "ab", "abc", "abcd", "a+b/c?~", "été"):
        got = _one(spark, enc(F.lit(s)))
        want = base64.urlsafe_b64encode(s.encode()).rstrip(b"=").decode()
        assert got == want, s
        assert _one(spark, dec(F.lit(got))) == s, s


def test_bit_test_variadic(spark):
    ball, bany = SCALAR_FNS["bitTestAll"], SCALAR_FNS["bitTestAny"]
    assert _one(spark, ball(F.lit(0b1011), F.lit(0))) is True
    assert _one(
        spark, ball(F.lit(0b1011), F.lit(0), F.lit(1), F.lit(3))
    ) is True
    assert _one(
        spark, ball(F.lit(0b1011), F.lit(0), F.lit(2))
    ) is False
    assert _one(
        spark, bany(F.lit(0b1000), F.lit(0), F.lit(3))
    ) is True
    assert _one(spark, bany(F.lit(0), F.lit(0), F.lit(5))) is False


def test_bit_test_zero_args_is_arity_error(spark):
    import pytest

    from nutdb_spark.engine import NutEngine

    eng = NutEngine(spark)
    for fn in ("bitTestAll", "bitTestAny"):
        with pytest.raises(ValueError, match=fn):
            eng.sql(f"SELECT {fn}(5) AS v")


# --- tier-19 ----------------------------------------------------------------


def test_crc32_matches_zlib(spark):
    import zlib

    f = SCALAR_FNS["CRC32"]
    vals = ["", "a", "abc", "hello world", "The quick brown fox!",
            '{"k": 69}/click', "0" * 64]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {
        r["s"]: r["c"]
        for r in df.select("s", f(F.col("s")).alias("c")).collect()
    }
    assert got == {v: zlib.crc32(v.encode()) for v in vals}


def test_tier19_scalars(spark):
    import datetime

    def one(col):
        return spark.range(1).select(col.alias("v")).collect()[0]["v"]

    assert one(
        SCALAR_FNS["L2SquaredDistance"](
            F.array(F.lit(1.0), F.lit(2.0)),
            F.array(F.lit(4.0), F.lit(6.0)),
        )
    ) == 25.0
    assert one(
        SCALAR_FNS["toLastDayOfWeek"](F.lit("2026-08-16"))
    ) == datetime.date(2026, 8, 22)  # Sunday -> Saturday
    assert one(
        SCALAR_FNS["toLastDayOfWeek"](F.lit("2026-08-22"))
    ) == datetime.date(2026, 8, 22)  # Saturday fixed point
    assert one(
        SCALAR_FNS["toMillisecond"](F.lit("2026-08-16 10:00:00.123"))
    ) == 123
    assert one(
        SCALAR_FNS["overlay"](F.lit("SparkSQL"), F.lit("XY"), F.lit(6))
    ) == "SparkXYL"
    assert one(
        SCALAR_FNS["notLike"](F.lit("abc"), F.lit("a%"))
    ) is False
    assert one(
        SCALAR_FNS["notILike"](F.lit("ABC"), F.lit("a%"))
    ) is False


# --- tier-20 ----------------------------------------------------------------


def test_tier20_network_scalars(spark):
    import ipaddress

    def one(col):
        return spark.range(1).select(col.alias("v")).collect()[0]["v"]

    m = SCALAR_FNS["MACStringToNum"]
    assert one(m(F.lit("ac:de:48:00:11:22"))) == 0xACDE48001122
    assert one(m(F.lit("AC:DE:48:00:11:22"))) == 0xACDE48001122
    for bad in ("zz:de:48:00:11:22", "ac:de:48:00:11", "", "acde48001122"):
        assert one(m(F.lit(bad))) is None, bad

    r = SCALAR_FNS["IPv4CIDRToRange"]
    for ip, p in ((3232235777, 24), (3232235777, 0), (3232235777, 32),
                  (0, 1), (4294967295, 31)):
        got = one(r(F.lit(ip), F.lit(p)))
        net = ipaddress.ip_network((ip, p), strict=False)
        assert got["_1"] == str(net.network_address), (ip, p)
        assert got["_2"] == str(net.broadcast_address), (ip, p)

    inr = SCALAR_FNS["isIPAddressInRange"]
    cases = [
        ("192.168.1.7", "192.168.1.0/24", True),
        ("192.168.2.7", "192.168.1.0/24", False),
        ("192.168.1.7", "192.168.1.7/32", True),
        ("192.168.1.8", "192.168.1.7/32", False),
        ("1.2.3.4", "0.0.0.0/0", True),
        ("bad", "1.2.3.0/24", False),
        ("1.2.3.4", "bad/24", False),
        ("1.2.3.4", "1.2.3.0/99", False),
    ]
    for ip, cidr, want in cases:
        assert one(inr(F.lit(ip), F.lit(cidr))) is want, (ip, cidr)
