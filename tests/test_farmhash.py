"""FarmHash Fingerprint64 + posting-order key (functions/farmhash.py).

The reference stores multi-valued scalar postings keyed by
farm.Fingerprint64(binary value) (posting/list.go:845-850); these tests
pin the hash against the public farmhash `Fingerprint64` vectors and the
binary encodings against types/conversion.go Marshal + Go
time.MarshalBinary.
"""

import struct
from datetime import datetime, timezone, timedelta

from dgraph_spark.functions.farmhash import (
    fingerprint64,
    go_time_marshal_binary,
    marshal_value,
    posting_order_key,
)


def test_fingerprint64_known_vectors():
    # public vectors for farmhash Fingerprint64 (na Hash64)
    assert fingerprint64(b"") == 0x9AE16A3B2F90404F  # k2
    assert fingerprint64(b"abc") == 2640714258260161385


def test_fingerprint64_all_length_branches():
    # every branch (0-3, 4-7, 8-16, 17-32, 33-64, >64) runs and is stable
    seen = set()
    for n in (1, 3, 5, 8, 16, 17, 32, 33, 64, 65, 100, 200):
        h = fingerprint64(bytes(range(256))[:n])
        assert 0 <= h < (1 << 64)
        seen.add(h)
    assert len(seen) == 12  # no accidental collisions on this family


def test_go_time_marshal_binary_utc():
    b = go_time_marshal_binary(datetime(1933, 1, 1, tzinfo=timezone.utc))
    assert b[0] == 1 and len(b) == 15
    sec = struct.unpack(">q", b[1:9])[0]
    # Go internal seconds = unix + 62135596800
    assert sec == -1167609600 + 62135596800
    assert struct.unpack(">i", b[9:13])[0] == 0
    assert struct.unpack(">h", b[13:15])[0] == -1  # UTC marker


def test_go_time_marshal_binary_offset_zone():
    tz = timezone(timedelta(hours=5, minutes=30))
    b = go_time_marshal_binary(datetime(2020, 1, 1, tzinfo=tz))
    assert struct.unpack(">h", b[13:15])[0] == 330


def test_marshal_value_encodings():
    assert marshal_value(5, "int") == struct.pack("<q", 5)
    assert marshal_value(-1, "int") == b"\xff" * 8
    assert marshal_value(1.5, "float") == struct.pack("<d", 1.5)
    assert marshal_value(True, "bool") == b"\x01"
    assert marshal_value("xé", "string") == "xé".encode()


def test_posting_order_matches_reference_golden():
    # TestMultipleValueFilter expected order: 1935-01-01 BEFORE 1933-01-01
    # (fingerprint order, not value order) — a reference-derived oracle bit
    k35 = posting_order_key("1935-01-01T00:00:00Z", "datetime")
    k33 = posting_order_key("1933-01-01T00:00:00Z", "datetime")
    assert k35 < k33
