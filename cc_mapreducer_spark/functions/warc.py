"""Minimal WARC (ISO 28500) reader/writer, pure stdlib — the container
web crawls actually arrive in (Common Crawl publishes WARC; a 100 TB
text pipeline's first byte is a WARC record, not a parquet row).

Scope — the subset every crawl consumer needs, implemented exactly:

  * records are `WARC/1.0\\r\\n` + named headers + `\\r\\n` + a
    Content-Length-delimited block + `\\r\\n\\r\\n`;
  * a file is a plain concatenation of records, each optionally its own
    gzip MEMBER (the `.warc.gz` convention: members concatenate, and a
    reader must resync on each member boundary);
  * `response` records carry an HTTP/1.1 message in the block; the HTTP
    status line and headers are split from the payload at the first
    `\\r\\n\\r\\n`.

  * `revisit` records (round 8) — the spec's native dedup mechanism
    (WARC 1.1 §6.7.2, identical-payload-digest profile): a re-crawl
    whose payload matched an earlier capture stores only the HTTP
    headers plus a WARC-Payload-Digest naming the original's payload;
    build_revisit_record emits them, parse_warc surfaces the
    revisit-specific headers (profile, payload digest, refers-to) on
    every record dict.

Out of scope (documented, not silently wrong): chunked
transfer-encoding inside the HTTP block and segmented (continuation)
records — the fixture pipeline never emits them and parse_warc raises
on Content-Length overruns instead of guessing.

Header names are case-insensitive per the spec; bodies are bytes (a
crawl body is NOT guaranteed utf-8). All length accounting is byte-
exact, which is what lets the registered fixture queries mirror record
geometry in closed-form SQL (operators/warc_ingest.py).
"""

from __future__ import annotations

import gzip as _gzip
import io


def build_warc_record(
    warc_type: str,
    target_uri: str | None,
    date: str,
    block: bytes,
    record_id: str,
    content_type: str = "application/http;msgtype=response",
    extra_headers: list[tuple[str, str]] | None = None,
) -> bytes:
    """One spec-shaped record. Header order is fixed so byte geometry is
    deterministic (and SQL-mirrorable for fixture-derived records);
    extra_headers (revisit profile/digest/refers-to) slot in before
    Content-Type, leaving the geometry of plain records untouched."""
    headers = [
        ("WARC-Type", warc_type),
        ("WARC-Record-ID", record_id),
        ("WARC-Date", date),
    ]
    if target_uri is not None:
        headers.append(("WARC-Target-URI", target_uri))
    for kv in extra_headers or []:
        headers.append(kv)
    headers.append(("Content-Type", content_type))
    headers.append(("Content-Length", str(len(block))))
    head = "WARC/1.0\r\n" + "".join(f"{k}: {v}\r\n" for k, v in headers)
    return head.encode("utf-8") + b"\r\n" + block + b"\r\n\r\n"


# WARC 1.1's revisit profile URI for "payload identical to an earlier
# capture" (the Common Crawl dedup case)
REVISIT_PROFILE = (
    "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"
)


def payload_digest(body: bytes) -> str:
    """labelled payload digest for WARC-Payload-Digest headers. The spec
    allows any named algorithm (sha1-base32 is merely customary);
    sha256-hex keeps the value derivable by engines without sha1."""
    import hashlib

    return "sha256:" + hashlib.sha256(body).hexdigest()


def build_revisit_record(
    target_uri: str,
    date: str,
    digest: str,
    record_id: str,
    refers_to_uri: str | None = None,
    refers_to_date: str | None = None,
    http_headers: bytes | None = None,
) -> bytes:
    """An identical-payload-digest revisit record: block carries the
    re-fetch's HTTP headers ONLY (no payload — that is the point), the
    WARC headers carry the digest naming the original capture."""
    extra = [
        ("WARC-Profile", REVISIT_PROFILE),
        ("WARC-Payload-Digest", digest),
    ]
    if refers_to_uri is not None:
        extra.append(("WARC-Refers-To-Target-URI", refers_to_uri))
    if refers_to_date is not None:
        extra.append(("WARC-Refers-To-Date", refers_to_date))
    block = (
        http_headers
        if http_headers is not None
        else build_http_response(b"")
    )
    return build_warc_record(
        "revisit",
        target_uri,
        date,
        block,
        record_id,
        extra_headers=extra,
    )


def build_http_response(
    body: bytes, status: int = 200, content_type: str = "text/html"
) -> bytes:
    """The HTTP/1.1 message a response record's block carries."""
    reason = {200: "OK", 404: "Not Found", 301: "Moved Permanently"}.get(
        status, "Status"
    )
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n"
    )
    return head.encode("utf-8") + b"\r\n" + body


def build_warc(records: list[bytes], gzip_per_record: bool = False) -> bytes:
    """Concatenate records into one WARC stream; gzip_per_record emits
    the .warc.gz member-per-record layout."""
    if not gzip_per_record:
        return b"".join(records)
    out = io.BytesIO()
    for r in records:
        # mtime pinned so the bytes are deterministic run-to-run
        with _gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as g:
            g.write(r)
    return out.getvalue()


def _split_members(b: bytes) -> list[bytes]:
    """Inflate a concatenation of gzip members, or pass plain bytes
    through as a single chunk. zlib.decompressobj(wbits=31) stops at
    each member's trailer and hands back the remainder in unused_data —
    the reliable way to resync on .warc.gz member boundaries."""
    if b[:2] != b"\x1f\x8b":
        return [b]
    import zlib

    out = []
    data = b
    while data:
        d = zlib.decompressobj(31)
        out.append(d.decompress(data))
        if not d.eof:
            raise ValueError("truncated gzip member in WARC stream")
        data = d.unused_data
    return out


def parse_warc(b: bytes) -> list[dict]:
    """Every record of a (plain or member-gzipped) WARC stream as
    {type, record_id, target_uri, date, content_length, block}. Raises
    ValueError on malformed version lines or blocks that run past the
    buffer — a truncated crawl file must fail loudly, not shrink."""
    records: list[dict] = []
    for chunk in _split_members(b):
        pos = 0
        n = len(chunk)
        while pos < n:
            # tolerate inter-record padding
            while pos < n and chunk[pos : pos + 1] in (b"\r", b"\n"):
                pos += 1
            if pos >= n:
                break
            eol = chunk.index(b"\r\n", pos)
            version = chunk[pos:eol].decode("utf-8", "replace")
            if not version.startswith("WARC/"):
                raise ValueError(f"bad WARC version line: {version!r}")
            pos = eol + 2
            headers: dict[str, str] = {}
            while True:
                eol = chunk.index(b"\r\n", pos)
                line = chunk[pos:eol]
                pos = eol + 2
                if not line:
                    break
                k, _, v = line.partition(b":")
                headers[k.decode().strip().lower()] = v.decode().strip()
            ln = int(headers["content-length"])
            if pos + ln > n:
                raise ValueError(
                    f"truncated record: block declares {ln} bytes, "
                    f"{n - pos} remain"
                )
            block = chunk[pos : pos + ln]
            pos += ln
            records.append(
                {
                    "type": headers.get("warc-type", ""),
                    "record_id": headers.get("warc-record-id", ""),
                    "target_uri": headers.get("warc-target-uri"),
                    "date": headers.get("warc-date", ""),
                    "content_length": ln,
                    "block": block,
                    # revisit surface (None on non-revisit records)
                    "profile": headers.get("warc-profile"),
                    "payload_digest": headers.get("warc-payload-digest"),
                    "refers_to_uri": headers.get("warc-refers-to-target-uri"),
                    "refers_to_date": headers.get("warc-refers-to-date"),
                }
            )
    return records


def parse_http_response(block: bytes) -> tuple[int, dict[str, str], bytes]:
    """(status, headers, body) from a response record's HTTP block."""
    sep = block.index(b"\r\n\r\n")
    head_lines = block[:sep].split(b"\r\n")
    status = int(head_lines[0].split(b" ")[1])
    headers = {}
    for line in head_lines[1:]:
        k, _, v = line.partition(b":")
        headers[k.decode().strip().lower()] = v.decode().strip()
    return status, headers, block[sep + 4 :]
