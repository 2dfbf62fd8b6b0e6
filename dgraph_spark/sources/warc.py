"""WARC 1.1 (ISO 28500) reader — the container format a real web
crawl (CommonCrawl) actually ships as. Pure-stdlib parse: each record
is a header block (CRLF-terminated lines, Content-Length framing)
followed by the payload; a .warc.gz file is a sequence of per-record
gzip members, which stdlib gzip.decompress handles transparently
(concatenated members).

Spark-side layout: one WARC file per task via the binaryFile source
(the standard split strategy — gzip members are not block-splittable
without an external index; CommonCrawl distributes ~1 GB files
precisely so file-granular parallelism saturates a cluster). Records
stream out through mapInPandas, so a task never materializes more
than an Arrow batch of parsed records alongside the raw file bytes.

For response records the HTTP header block is split off the payload;
the record yields (warc_type, target_uri, date, content_type,
payload bytes, http_status).
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_SCHEMA = StructType(
    [
        StructField("file", StringType()),
        StructField("record_no", LongType()),
        StructField("warc_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_type", StringType()),
        StructField("http_status", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Parse one WARC file's bytes (gzipped or plain) into records."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)    # handles concatenated members
    records = []
    i = 0
    n = len(data)
    while i < n:
        # skip inter-record blank lines
        while i < n and data[i:i + 2] == b"\r\n":
            i += 2
        if i >= n:
            break
        hdr_end = data.find(b"\r\n\r\n", i)
        if hdr_end < 0:
            raise ValueError("WARC header block not terminated")
        head = data[i:hdr_end].decode("utf-8", "replace").split("\r\n")
        if not head[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line: {head[0]!r}")
        fields = {}
        for line in head[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields["content-length"])
        except KeyError:
            raise ValueError("WARC record missing Content-Length")
        body_start = hdr_end + 4
        body = data[body_start:body_start + length]
        if len(body) != length:
            raise ValueError("WARC payload truncated")
        i = body_start + length
        rtype = fields.get("warc-type", "")
        status = None
        payload = body
        ctype = fields.get("content-type", "")
        if rtype in ("response", "revisit") and body[:5] == b"HTTP/":
            http_end = body.find(b"\r\n\r\n")
            if http_end >= 0:
                status_line = body[:body.find(b"\r\n")].decode(
                    "latin-1", "replace")
                parts = status_line.split()
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                payload = body[http_end + 4:]
        records.append({
            "warc_type": rtype,
            "target_uri": fields.get("warc-target-uri", ""),
            "warc_date": fields.get("warc-date", ""),
            "content_type": ctype,
            "http_status": status,
            "payload": payload,
        })
    return records


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of .warc / .warc.gz files -> record DataFrame.
    File-granular parallelism (binaryFile source); see module docs."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in WARC_SCHEMA.fields}
            for fname, blob in zip(pdf["path"], pdf["content"]):
                for rno, rec in enumerate(parse_warc_bytes(bytes(blob))):
                    out["file"].append(fname)
                    out["record_no"].append(rno)
                    for k, v in rec.items():
                        out[k].append(v)
            if out["file"]:
                yield pd.DataFrame(out)

    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


def build_warc(records: list[dict], gzipped: bool = True) -> bytes:
    """Assemble a spec-shaped WARC file for fixtures: each dict has
    warc_type, target_uri, date, content_type, payload (bytes), and
    optionally http_status (wraps the payload in an HTTP response).
    Gzipped output uses one gzip member per record, like real crawls."""
    members = []
    for rec in records:
        body = rec["payload"]
        if rec.get("http_status") is not None:
            body = (f"HTTP/1.1 {rec['http_status']} OK\r\n"
                    f"Content-Type: {rec.get('content_type', '')}\r\n"
                    f"Content-Length: {len(body)}\r\n\r\n"
                    ).encode("latin-1") + body
        head = (
            "WARC/1.1\r\n"
            f"WARC-Type: {rec['warc_type']}\r\n"
            f"WARC-Target-URI: {rec.get('target_uri', '')}\r\n"
            f"WARC-Date: {rec.get('date', '2026-01-01T00:00:00Z')}\r\n"
            f"Content-Type: {rec.get('content_type', '')}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode()
        raw = head + body + b"\r\n\r\n"
        members.append(gzip.compress(raw) if gzipped else raw)
    return b"".join(members)
