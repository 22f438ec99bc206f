"""Round-14 tests: archive-container ingest — RFC 1952 gzip members
and ISO 28500 WARC records (sources/archive.py)."""

from __future__ import annotations

import gzip as stdgzip

import numpy as np  # noqa: F401
import pytest

from hdfs_stream_processing_spark.sources.archive import (
    build_warc_record,
    gunzip_members,
    gzip_member,
    parse_warc_records,
    scan_gzip_text,
    scan_warc,
)


def test_gunzip_multi_member_and_stdlib_interop():
    a, b = b"hello world\n" * 100, b"second member"
    blob = gzip_member(a) + gzip_member(b)
    assert gunzip_members(blob) == [a, b]
    # stdlib reads ours; we read stdlib's (incl. its FNAME-less header)
    assert stdgzip.decompress(gzip_member(a)) == a
    assert gunzip_members(stdgzip.compress(a)) == [a]


def test_gunzip_bounds_deflate_bombs():
    big = b"\x00" * (1 << 20)
    with pytest.raises(ValueError, match="inflate bound"):
        gunzip_members(gzip_member(big), max_out=1000)


def test_gunzip_rejects_malformed():
    blob = gzip_member(b"payload")
    with pytest.raises(ValueError, match="truncated"):
        gunzip_members(blob[:-4])
    with pytest.raises(ValueError, match="truncated"):
        gunzip_members(blob[:5])
    with pytest.raises(ValueError, match="magic|method"):
        gunzip_members(b"\x1f\x8bXX" + blob[4:])
    corrupt = bytearray(blob)
    corrupt[-5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        gunzip_members(bytes(corrupt))


def test_warc_roundtrip_with_boundary_lookalike_payload():
    recs = (
        build_warc_record(
            "warcinfo", {"WARC-Record-ID": "<urn:uuid:1>"}, b"software: t"
        )
        + build_warc_record(
            "response",
            {"WARC-Target-URI": "http://x/1",
             "WARC-Date": "2026-01-01T00:00:00Z"},
            b"body with\r\n\r\nWARC/1.0\r\nlook-alikes",
        )
        + build_warc_record(
            "response", {"WARC-Target-URI": "http://x/2"}, b""
        )
    )
    out = parse_warc_records(recs)
    assert [r["headers"]["WARC-Type"] for r in out] == [
        "warcinfo", "response", "response"
    ]
    assert out[1]["payload"] == b"body with\r\n\r\nWARC/1.0\r\nlook-alikes"
    assert out[2]["payload"] == b""


def test_warc_rejects_malformed():
    recs = build_warc_record("response", {"WARC-Target-URI": "u"}, b"abc")
    with pytest.raises(ValueError, match="truncated"):
        parse_warc_records(recs[:-3])
    with pytest.raises(ValueError, match="version"):
        parse_warc_records(b"HTTP/1.0 nope\r\n\r\n")
    # missing Content-Length
    bad = b"WARC/1.0\r\nWARC-Type: response\r\n\r\n"
    with pytest.raises(ValueError, match="Content-Length|truncated"):
        parse_warc_records(bad)


def test_scan_gzip_text_end_to_end(spark):
    lines = "".join(f"{i}\tdoc {i} text\n" for i in range(10))
    blob = gzip_member(lines[:30].encode()) + gzip_member(lines[30:].encode())
    df = spark.createDataFrame(
        [("s0", bytearray(blob))], "source string, payload binary"
    )
    rows = sorted(
        (r["doc_id"], r["text"]) for r in scan_gzip_text(df).collect()
    )
    assert len(rows) == 10 and rows[3] == (3, "doc 3 text")


def test_scan_warc_skips_non_response(spark):
    stream = (
        build_warc_record("warcinfo", {}, b"x")
        + build_warc_record(
            "response",
            {"WARC-Target-URI": "http://a", "WARC-Date": "d"},
            "tëxt".encode(),
        )
        + build_warc_record("request", {"WARC-Target-URI": "http://a"}, b"GET /")
    )
    df = spark.createDataFrame(
        [("s0", bytearray(gzip_member(stream)))],
        "source string, payload binary",
    )
    rows = scan_warc(df).collect()
    assert len(rows) == 1
    assert (rows[0]["url"], rows[0]["text"]) == ("http://a", "tëxt")


def test_decompress_payload_dispatch_and_bounds():
    import bz2 as _bz2
    import lzma as _lzma

    from hdfs_stream_processing_spark.sources.archive import (
        decompress_payload,
    )

    data = b"some corpus bytes " * 50
    assert decompress_payload(gzip_member(data)) == data
    assert decompress_payload(_bz2.compress(data)) == data
    assert decompress_payload(_lzma.compress(data)) == data
    with pytest.raises(ValueError, match="unrecognized compression"):
        decompress_payload(b"PK\x03\x04zipfile")
    big = b"\x00" * (1 << 20)
    for blob, what in (
        (_bz2.compress(big), "bzip2"),
        (_lzma.compress(big), "xz"),
        (gzip_member(big), "gzip"),
    ):
        with pytest.raises(ValueError, match="bound"):
            decompress_payload(blob, max_out=1000)
    with pytest.raises(ValueError, match="truncated"):
        decompress_payload(_bz2.compress(data)[:-4])
    with pytest.raises(ValueError, match="truncated"):
        decompress_payload(_lzma.compress(data)[:-4])


def test_scan_compressed_text_mixed_families(spark):
    import bz2 as _bz2
    import lzma as _lzma

    from hdfs_stream_processing_spark.sources.archive import (
        scan_compressed_text,
    )

    lines = lambda lo, hi: "".join(
        f"{i}\tdoc {i}\n" for i in range(lo, hi)
    ).encode()
    df = spark.createDataFrame(
        [
            ("s0", bytearray(gzip_member(lines(0, 4)))),
            ("s1", bytearray(_bz2.compress(lines(4, 8)))),
            ("s2", bytearray(_lzma.compress(lines(8, 12)))),
        ],
        "source string, payload binary",
    )
    got = sorted(r["doc_id"] for r in scan_compressed_text(df).collect())
    assert got == list(range(12))
