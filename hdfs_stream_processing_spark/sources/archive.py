"""Archive-container ingest: gzip members (RFC 1952) and WARC records
(ISO 28500) — the containers web-scale text corpora actually land in
(Common Crawl ships `.warc.gz` with one gzip member per record).

Pure stdlib parsing (zlib raw-deflate + struct), Spark-side as
Arrow-batched mapInPandas over ``binaryFile`` payloads — the same
binary-column architecture as the media codecs in
``operators/multimodal.py``: no per-file driver work, decode inside
the executor batch, schema declared.

Reference parity: the reference pipeline reads already-decoded CSV
lines off a socket/topic (`data_generator/dataframe_to_kafka.py`); the
archive layer is the engine-side capability a 100 TB crawl corpus
needs before any of that text exists as rows.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame


#: Default per-file inflate cap — a crafted deflate bomb in a landing
#: zone must not OOM an executor (same policy as decode_png's bounded
#: IDAT inflate).  Real WET/WARC shards are ~1 GiB decompressed; the
#: cap is a parameter, not a constant of nature.
MAX_MEMBER_BYTES = 1 << 28  # 256 MiB


def gunzip_members(b: bytes, max_out: int = MAX_MEMBER_BYTES) -> list[bytes]:
    """Decompress a (possibly multi-member) gzip stream into one bytes
    object PER MEMBER — RFC 1952: magic 1f 8b, CM=8 (deflate), FLG
    optional fields (FEXTRA/FNAME/FCOMMENT/FHCRC) skipped by spec,
    raw-deflate body, CRC32 + ISIZE trailer verified per member.
    Multi-member streams are the norm for parallel writers and for
    WARC's one-member-per-record layout; a plain ``zlib.decompress``
    cannot see the member boundaries.  Inflation is bounded by
    ``max_out`` per member (deflate-bomb guard)."""
    if len(b) < 10:
        raise ValueError("truncated gzip stream")
    out: list[bytes] = []
    pos = 0
    while pos < len(b):
        if pos + 10 > len(b) or b[pos : pos + 2] != b"\x1f\x8b":
            raise ValueError("bad gzip member magic")
        if b[pos + 2] != 8:
            raise ValueError("unsupported gzip compression method")
        flg = b[pos + 3]
        pos += 10
        if flg & 0x04:  # FEXTRA
            if pos + 2 > len(b):
                raise ValueError("truncated gzip FEXTRA")
            (xlen,) = struct.unpack_from("<H", b, pos)
            pos += 2 + xlen
        for bit in (0x08, 0x10):  # FNAME, FCOMMENT: zero-terminated
            if flg & bit:
                end = b.find(b"\x00", pos)
                if end < 0:
                    raise ValueError("truncated gzip name/comment")
                pos = end + 1
        if flg & 0x02:  # FHCRC
            pos += 2
        if pos > len(b):
            raise ValueError("truncated gzip header")
        inf = zlib.decompressobj(-15)
        body = inf.decompress(b[pos:], max_out + 1)
        if len(body) > max_out:
            raise ValueError("gzip member exceeds inflate bound")
        if not inf.eof:
            raise ValueError("truncated gzip deflate body")
        consumed = len(b) - pos - len(inf.unused_data)
        pos += consumed
        if pos + 8 > len(b):
            raise ValueError("truncated gzip trailer")
        crc, isize = struct.unpack_from("<II", b, pos)
        pos += 8
        if zlib.crc32(body) & 0xFFFFFFFF != crc:
            raise ValueError("gzip CRC mismatch")
        if len(body) % (1 << 32) != isize:
            raise ValueError("gzip ISIZE mismatch")
        out.append(body)
    return out


def gzip_member(data: bytes) -> bytes:
    """One gzip member (RFC 1952, no name/extra fields) — the writer
    half, so fixtures self-generate and multi-member streams are plain
    concatenation."""
    comp = zlib.compressobj(9, zlib.DEFLATED, -15)
    body = comp.compress(data) + comp.flush()
    return (
        b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff"
        + body
        + struct.pack(
            "<II", zlib.crc32(data) & 0xFFFFFFFF, len(data) % (1 << 32)
        )
    )


def parse_warc_records(b: bytes) -> list[dict]:
    """Parse a concatenated WARC stream (ISO 28500) into records:
    ``WARC/1.0\\r\\n`` + header lines ``Name: value`` + blank line +
    exactly ``Content-Length`` payload bytes + ``\\r\\n\\r\\n``.
    Returns one dict per record: ``headers`` (dict, case-preserved
    keys) + ``payload`` (bytes).  Content-Length-driven, so payloads
    may contain anything, including things that look like record
    boundaries.  Truncation and malformed headers raise."""
    records: list[dict] = []
    pos = 0
    while pos < len(b):
        end = b.find(b"\r\n\r\n", pos)
        if end < 0:
            raise ValueError("truncated WARC header block")
        header_block = b[pos:end].decode("utf-8", errors="strict")
        lines = header_block.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line {lines[0]!r}")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            if ":" not in line:
                raise ValueError(f"malformed WARC header line {line!r}")
            k, v = line.split(":", 1)
            headers[k.strip()] = v.strip()
        try:
            clen = int(headers["Content-Length"])
        except (KeyError, ValueError) as e:
            raise ValueError("WARC record missing Content-Length") from e
        body_start = end + 4
        body_end = body_start + clen
        if body_end + 4 > len(b):
            raise ValueError("truncated WARC payload")
        if b[body_end : body_end + 4] != b"\r\n\r\n":
            raise ValueError("WARC record not terminated by CRLF CRLF")
        records.append({"headers": headers, "payload": b[body_start:body_end]})
        pos = body_end + 4
    return records


def build_warc_record(
    warc_type: str, headers: dict[str, str], payload: bytes
) -> bytes:
    """Serialize one WARC/1.0 record (writer half for fixtures)."""
    lines = [f"WARC/1.0", f"WARC-Type: {warc_type}"]
    lines += [f"{k}: {v}" for k, v in headers.items()]
    lines.append(f"Content-Length: {len(payload)}")
    head = "\r\n".join(lines).encode("utf-8") + b"\r\n\r\n"
    return head + payload + b"\r\n\r\n"


def scan_gzip_text(
    df: DataFrame, id_col: str = "source", payload_col: str = "payload"
) -> DataFrame:
    """Gzipped line-shard ingest: each input row is one ``.gz`` file's
    bytes; output is one row per ``doc_id<TAB>text`` line across all
    members.  Arrow-batched mapInPandas — gunzip + split inside the
    executor, no driver data path; linear in corpus bytes, zero
    shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, texts = [], []
            for payload in pdf[payload_col]:
                text = b"".join(gunzip_members(bytes(payload)))
                for line in text.decode("utf-8").splitlines():
                    if not line:
                        continue
                    doc_id, _, body = line.partition("\t")
                    ids.append(int(doc_id))
                    texts.append(body)
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    return df.mapInPandas(run, schema="doc_id bigint, text string")


def scan_warc(
    df: DataFrame, id_col: str = "source", payload_col: str = "payload"
) -> DataFrame:
    """WARC(.gz) shard ingest: each input row is one ``.warc.gz``
    file's bytes — gzip members concatenate into a WARC stream whose
    ``response`` records carry the documents (warcinfo and other
    record types are passed over, as a crawl reader must).  Output is
    one row per response record: target URI, the record's WARC-Date,
    and the payload decoded as UTF-8 text.  Same mapInPandas shape as
    the media decodes: linear, zero shuffle, no driver path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            uris, dates, texts = [], [], []
            for payload in pdf[payload_col]:
                stream = b"".join(gunzip_members(bytes(payload)))
                for rec in parse_warc_records(stream):
                    h = rec["headers"]
                    if h.get("WARC-Type") != "response":
                        continue
                    uris.append(h.get("WARC-Target-URI", ""))
                    dates.append(h.get("WARC-Date", ""))
                    texts.append(rec["payload"].decode("utf-8"))
            yield pd.DataFrame(
                {"url": uris, "warc_date": dates, "text": texts}
            )

    return df.mapInPandas(run, schema="url string, warc_date string, text string")


def decompress_payload(b: bytes, max_out: int = MAX_MEMBER_BYTES) -> bytes:
    """Magic-byte dispatch over the three stdlib compression families —
    gzip (``1f 8b``, RFC 1952, multi-member), bzip2 (``BZh``), and
    xz (``fd 37 7a 58 5a 00``, LZMA2 container) — the compression
    mirror of ``decode_payload``'s image dispatch: a landing zone
    never guarantees one format.  Output bounded by ``max_out``
    (decompression-bomb guard in every branch; bz2/xz are decompressed
    incrementally so a bomb is cut off at the bound, not after)."""
    if b[:2] == b"\x1f\x8b":
        return b"".join(gunzip_members(b, max_out=max_out))
    if b[:3] == b"BZh":
        import bz2 as _bz2

        d = _bz2.BZ2Decompressor()
        out = d.decompress(b, max_out + 1)
        if len(out) > max_out:
            raise ValueError("bzip2 payload exceeds inflate bound")
        if not d.eof:
            raise ValueError("truncated bzip2 payload")
        return out
    if b[:6] == b"\xfd7zXZ\x00":
        import lzma as _lzma

        d = _lzma.LZMADecompressor()
        out = d.decompress(b, max_out + 1)
        if len(out) > max_out:
            raise ValueError("xz payload exceeds inflate bound")
        if not d.eof:
            raise ValueError("truncated xz payload")
        return out
    raise ValueError(f"unrecognized compression magic {b[:4]!r}")


def scan_compressed_text(
    df: DataFrame, id_col: str = "source", payload_col: str = "payload"
) -> DataFrame:
    """Mixed-compression line-shard ingest: like :func:`scan_gzip_text`
    but each file may be gzip, bzip2, OR xz — resolved per file by
    :func:`decompress_payload`.  One mapInPandas stage, zero shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, texts = [], []
            for payload in pdf[payload_col]:
                text = decompress_payload(bytes(payload))
                for line in text.decode("utf-8").splitlines():
                    if not line:
                        continue
                    doc_id, _, body = line.partition("\t")
                    ids.append(int(doc_id))
                    texts.append(body)
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    return df.mapInPandas(run, schema="doc_id bigint, text string")
