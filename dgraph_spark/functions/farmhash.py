"""Pure-Python FarmHash Fingerprint64 + dgraph value binary encoding.

Why this exists: multi-valued (list) scalar postings are stored with
posting uid = farm.Fingerprint64(binary value) (posting/list.go:845-850,
dgraph/cmd/live/batch.go:235 fingerprintEdge) and posting lists are
sorted by uid — so the reference returns list values in FINGERPRINT
order, not value order. The JSON encoder uses this module to reproduce
that order exactly.

The hash is the public FarmHash64 "na" variant (Google farmhash
farmhashna.cc Hash64; same function exposed by go-farm as
Fingerprint64). Implemented from the published algorithm.

Binary encodings per value type follow types/conversion.go Marshal
(toID=BinaryID): string/default = UTF-8 bytes, int = 8-byte
little-endian two's-complement, float = 8-byte little-endian IEEE754,
bool = one byte 0/1, datetime = Go time.MarshalBinary (version-1
layout: version byte, 8-byte big-endian seconds since year 1, 4-byte
big-endian nanoseconds, 2-byte big-endian zone-offset minutes with -1
meaning UTC).
"""

from __future__ import annotations

import struct
from datetime import datetime, timezone

import pandas

_M = (1 << 64) - 1
_K0 = 0xC3A5C85C97CB3127
_K1 = 0xB492B66FBE98F273
_K2 = 0x9AE16A3B2F90404F


def _rot(v: int, s: int) -> int:
    return ((v >> s) | (v << (64 - s))) & _M


def _smix(v: int) -> int:
    return (v ^ (v >> 47)) & _M


def _f64(s: bytes, i: int) -> int:
    return int.from_bytes(s[i:i + 8], "little")


def _f32(s: bytes, i: int) -> int:
    return int.from_bytes(s[i:i + 4], "little")


def _h16(u: int, v: int, mul: int) -> int:
    a = ((u ^ v) * mul) & _M
    a ^= a >> 47
    b = ((v ^ a) * mul) & _M
    b ^= b >> 47
    return (b * mul) & _M


def _len0to16(s: bytes) -> int:
    n = len(s)
    if n >= 8:
        mul = (_K2 + 2 * n) & _M
        a = (_f64(s, 0) + _K2) & _M
        b = _f64(s, n - 8)
        c = (_rot(b, 37) * mul + a) & _M
        d = ((_rot(a, 25) + b) * mul) & _M
        return _h16(c, d, mul)
    if n >= 4:
        mul = (_K2 + 2 * n) & _M
        a = _f32(s, 0)
        return _h16((n + (a << 3)) & _M, _f32(s, n - 4), mul)
    if n > 0:
        a, b, c = s[0], s[n >> 1], s[n - 1]
        y = (a + (b << 8)) & 0xFFFFFFFF
        z = (n + (c << 2)) & 0xFFFFFFFF
        return (_smix((y * _K2 ^ z * _K0) & _M) * _K2) & _M
    return _K2


def _len17to32(s: bytes) -> int:
    n = len(s)
    mul = (_K2 + 2 * n) & _M
    a = (_f64(s, 0) * _K1) & _M
    b = _f64(s, 8)
    c = (_f64(s, n - 8) * mul) & _M
    d = (_f64(s, n - 16) * _K2) & _M
    return _h16((_rot((a + b) & _M, 43) + _rot(c, 30) + d) & _M,
                (a + _rot((b + _K2) & _M, 18) + c) & _M, mul)


def _len33to64(s: bytes) -> int:
    n = len(s)
    mul = (_K2 + 2 * n) & _M
    a = (_f64(s, 0) * _K2) & _M
    b = _f64(s, 8)
    c = (_f64(s, n - 8) * mul) & _M
    d = (_f64(s, n - 16) * _K2) & _M
    y = (_rot((a + b) & _M, 43) + _rot(c, 30) + d) & _M
    z = _h16(y, (a + _rot((b + _K2) & _M, 18) + c) & _M, mul)
    e = (_f64(s, 16) * mul) & _M
    f = _f64(s, 24)
    g = ((y + _f64(s, n - 32)) * mul) & _M
    h = ((z + _f64(s, n - 24)) * mul) & _M
    return _h16((_rot((e + f) & _M, 43) + _rot(g, 30) + h) & _M,
                (e + _rot((f + y) & _M, 18) + g) & _M, mul)


def _weak32(s: bytes, i: int, a: int, b: int) -> tuple[int, int]:
    w, x, y, z = _f64(s, i), _f64(s, i + 8), _f64(s, i + 16), _f64(s, i + 24)
    a = (a + w) & _M
    b = _rot((b + a + z) & _M, 21)
    c = a
    a = (a + x + y) & _M
    b = (b + _rot(a, 44)) & _M
    return (a + z) & _M, (b + c) & _M


def fingerprint64(s: bytes) -> int:
    """FarmHash64 (na) of ``s`` — matches go-farm ``Fingerprint64``."""
    n = len(s)
    if n <= 16:
        return _len0to16(s)
    if n <= 32:
        return _len17to32(s)
    if n <= 64:
        return _len33to64(s)

    seed = 81
    x = seed
    y = (seed * _K1 + 113) & _M
    z = (_smix((y * _K2 + 113) & _M) * _K2) & _M
    v0 = v1 = w0 = w1 = 0
    x = (x * _K2 + _f64(s, 0)) & _M

    end = ((n - 1) // 64) * 64
    last64 = end + ((n - 1) & 63) - 63
    i = 0
    while i != end:
        x = (_rot((x + y + v0 + _f64(s, i + 8)) & _M, 37) * _K1) & _M
        y = (_rot((y + v1 + _f64(s, i + 48)) & _M, 42) * _K1) & _M
        x ^= w1
        y = (y + v0 + _f64(s, i + 40)) & _M
        z = (_rot((z + w0) & _M, 33) * _K1) & _M
        v0, v1 = _weak32(s, i, (v1 * _K1) & _M, (x + w0) & _M)
        w0, w1 = _weak32(s, i + 32, (z + w1) & _M, (y + _f64(s, i + 16)) & _M)
        z, x = x, z
        i += 64
    mul = (_K1 + ((z & 0xFF) << 1)) & _M
    i = last64
    w0 = (w0 + ((n - 1) & 63)) & _M
    v0 = (v0 + w0) & _M
    w0 = (w0 + v0) & _M
    x = (_rot((x + y + v0 + _f64(s, i + 8)) & _M, 37) * _K1) & _M
    y = (_rot((y + v1 + _f64(s, i + 48)) & _M, 42) * _K1) & _M
    x ^= (w1 * 9) & _M
    y = (y + v0 * 9 + _f64(s, i + 40)) & _M
    z = (_rot((z + w0) & _M, 33) * _K1) & _M
    v0, v1 = _weak32(s, i, (v1 * _K1) & _M, (x + w0) & _M)
    w0, w1 = _weak32(s, i + 32, (z + w1) & _M, (y + _f64(s, i + 16)) & _M)
    z, x = x, z
    return _h16((_h16(v0, w0, mul) + _smix(y) * _K0 + z) & _M,
                (_h16(v1, w1, mul) + x) & _M, mul)


# Go epoch: seconds from Jan 1 year 1 to Jan 1 1970 (time.unixToInternal)
_UNIX_TO_INTERNAL = 62135596800


def go_time_marshal_binary(dt: datetime) -> bytes:
    """Go ``time.Time.MarshalBinary`` (version 1) for whole-second-offset
    zones. Naive datetimes are treated as UTC (that is what the
    reference's RFC3339 parser yields for untagged literals)."""
    if dt.tzinfo is None:
        off_min = -1
        sec = int(dt.replace(tzinfo=timezone.utc).timestamp()) + _UNIX_TO_INTERNAL
    else:
        off = dt.utcoffset()
        off_s = int(off.total_seconds()) if off is not None else 0
        # Go marks the UTC *location* (a "Z" literal) as offset -1;
        # an explicit "+00:00" parses to a fixed zone with offset 0
        off_min = -1 if dt.tzinfo is timezone.utc else off_s // 60
        sec = int(dt.timestamp()) + _UNIX_TO_INTERNAL
    nsec = dt.microsecond * 1000
    return (b"\x01" + struct.pack(">q", sec) + struct.pack(">i", nsec)
            + struct.pack(">h", off_min))


def _parse_rfc3339(s: str) -> datetime:
    # "...Z" must map to the Go UTC location (offset marker -1)
    if s.endswith("Z"):
        return datetime.fromisoformat(s[:-1]).replace(tzinfo=timezone.utc)
    return datetime.fromisoformat(s)


def marshal_value(v, typ: str) -> bytes:
    """types/conversion.go Marshal(..., BinaryID) for one scalar."""
    if typ == "int":
        return struct.pack("<Q", int(v) & _M)
    if typ == "float":
        return struct.pack("<d", float(v))
    if typ == "bool":
        b = v if isinstance(v, bool) else str(v).lower() == "true"
        return b"\x01" if b else b"\x00"
    if typ in ("datetime", "dateTime"):
        dt = _parse_rfc3339(v) if isinstance(v, str) else v
        return go_time_marshal_binary(dt)
    return str(v).encode("utf-8")


def posting_order_key(v, typ: str) -> int:
    """Signed sort key replicating posting-list order for list values:
    fingerprint64(binary value) compared as uint64, shifted into int64
    range so Spark's bigint ordering matches uint64 ordering."""
    return fingerprint64(marshal_value(v, typ)) - (1 << 63)


def make_posting_key_udf(typ: str):
    """Arrow-batched pandas UDF: string value column -> posting sort key.
    (pandas is imported at module scope so pandas_udf can resolve the
    stringified ``pandas.Series`` hints via this module's globals.)"""
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _key(vals: pandas.Series) -> pandas.Series:
        return vals.map(lambda v: posting_order_key(v, typ))

    return _key
