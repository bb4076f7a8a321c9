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

  * segmented records (round 8, WARC 1.0 §5.18-5.20): a logical record
    too large for one file is split into a first segment carrying
    `WARC-Segment-Number: 1` plus `continuation` records naming the
    first segment via `WARC-Segment-Origin-ID`; the final continuation
    declares `WARC-Segment-Total-Length`. segment_record emits the
    chain, reassemble_segments is the pure-python reference for the
    distributed (groupBy origin-id) reassembly in
    operators/warc_ingest.py, and both fail loudly on a missing
    segment or a total-length mismatch.

  * chunked transfer-encoding (round 8, RFC 9112 §7.1) inside the HTTP
    block: parse_http_response decodes `Transfer-Encoding: chunked`
    bodies (hex size lines with optional chunk extensions, optional
    trailer fields), raising on truncated or mis-framed chunks.

Out of scope (documented, not silently wrong): truncated containers —
parse_warc raises on Content-Length overruns instead of guessing.

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
                    # segmentation surface (None on unsegmented records)
                    "segment_number": (
                        int(headers["warc-segment-number"])
                        if "warc-segment-number" in headers
                        else None
                    ),
                    "segment_origin_id": headers.get("warc-segment-origin-id"),
                    "segment_total_length": (
                        int(headers["warc-segment-total-length"])
                        if "warc-segment-total-length" in headers
                        else None
                    ),
                }
            )
    return records


def parse_http_response(block: bytes) -> tuple[int, dict[str, str], bytes]:
    """(status, headers, body) from a response record's HTTP block.
    Bodies sent with `Transfer-Encoding: chunked` (RFC 9112 §7.1) are
    decoded to the original payload bytes; everything else is taken
    verbatim after the header/body split."""
    sep = block.index(b"\r\n\r\n")
    head_lines = block[:sep].split(b"\r\n")
    status = int(head_lines[0].split(b" ")[1])
    headers = {}
    for line in head_lines[1:]:
        k, _, v = line.partition(b":")
        headers[k.decode().strip().lower()] = v.decode().strip()
    body = block[sep + 4 :]
    if headers.get("transfer-encoding", "").lower() == "chunked":
        body = decode_chunked(body)
    return status, headers, body


def build_http_response_chunked(
    body: bytes, chunk_size: int = 100, content_type: str = "text/html"
) -> bytes:
    """An HTTP/1.1 message carrying `body` with chunked transfer-encoding
    (RFC 9112 §7.1): each chunk is a lowercase-hex size line, the bytes,
    and a CRLF; the stream ends with a zero-size chunk and an empty
    trailer section. Chunk boundaries are every `chunk_size` bytes so the
    wire geometry is a closed-form function of len(body) — which is what
    lets the fixture oracles mirror it in SQL."""
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    head = (
        "HTTP/1.1 200 OK\r\n"
        f"Content-Type: {content_type}\r\n"
        "Transfer-Encoding: chunked\r\n"
    ).encode("utf-8")
    parts = [head, b"\r\n"]
    for i in range(0, len(body), chunk_size):
        c = body[i : i + chunk_size]
        parts.append(f"{len(c):x}\r\n".encode("ascii") + c + b"\r\n")
    parts.append(b"0\r\n\r\n")
    return b"".join(parts)


def decode_chunked(data: bytes) -> bytes:
    """Decode a chunked-TE body: hex size lines (chunk extensions after
    ';' are ignored per RFC 9112), chunk bytes, terminating zero chunk,
    then optional trailer fields ended by an empty line. Raises on any
    mis-framing — a truncated chunk must fail loudly, not shrink."""
    body = bytearray()
    pos = 0
    n = len(data)
    while True:
        eol = data.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("chunked body: missing size line terminator")
        size_token = data[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_token, 16)
        except ValueError:
            raise ValueError(f"chunked body: bad size line {size_token!r}")
        pos = eol + 2
        if size == 0:
            # trailer section: zero or more header lines, then CRLF
            while True:
                eol = data.find(b"\r\n", pos)
                if eol < 0:
                    raise ValueError("chunked body: unterminated trailers")
                line = data[pos:eol]
                pos = eol + 2
                if not line:
                    return bytes(body)
        if pos + size + 2 > n:
            raise ValueError(
                f"chunked body: chunk declares {size} bytes, "
                f"{n - pos} remain"
            )
        body += data[pos : pos + size]
        if data[pos + size : pos + size + 2] != b"\r\n":
            raise ValueError("chunked body: chunk data not CRLF-terminated")
        pos += size + 2


def segment_record(
    warc_type: str,
    target_uri: str | None,
    date: str,
    block: bytes,
    record_id: str,
    segment_size: int,
    content_type: str = "application/http;msgtype=response",
) -> list[bytes]:
    """Split one logical record into a WARC segmentation chain
    (WARC 1.0 §5.18-5.20): the first segment keeps the original type,
    URI and Content-Type and carries `WARC-Segment-Number: 1`; each
    subsequent fragment is a `continuation` record naming the first
    segment through `WARC-Segment-Origin-ID`, with the final one
    declaring `WARC-Segment-Total-Length`. Blocks that fit in one
    segment come back as a single plain record (no segment headers) —
    writers only segment when they must."""
    if segment_size <= 0:
        raise ValueError("segment_size must be positive")
    if len(block) <= segment_size:
        return [
            build_warc_record(
                warc_type, target_uri, date, block, record_id,
                content_type=content_type,
            )
        ]
    frags = [
        block[i : i + segment_size]
        for i in range(0, len(block), segment_size)
    ]
    out = [
        build_warc_record(
            warc_type,
            target_uri,
            date,
            frags[0],
            record_id,
            content_type=content_type,
            extra_headers=[("WARC-Segment-Number", "1")],
        )
    ]
    base = record_id[:-1] if record_id.endswith(">") else record_id
    close = ">" if record_id.endswith(">") else ""
    for i, frag in enumerate(frags[1:], start=2):
        extra = [
            ("WARC-Segment-Origin-ID", record_id),
            ("WARC-Segment-Number", str(i)),
        ]
        if i == len(frags):
            extra.append(("WARC-Segment-Total-Length", str(len(block))))
        out.append(
            build_warc_record(
                "continuation",
                None,
                date,
                frag,
                f"{base}:seg{i}{close}",
                content_type="application/octet-stream",
                extra_headers=extra,
            )
        )
    return out


def reassemble_segments(records: list[dict]) -> list[dict]:
    """Pure-python reference for segmented-record reassembly: first
    segments keep their identity, continuations are folded into their
    origin by ascending segment number, and the reassembled block must
    match the declared WARC-Segment-Total-Length exactly. Unsegmented
    records pass through untouched. This is the replica the distributed
    (groupBy WARC-Segment-Origin-ID) operator in
    operators/warc_ingest.py is pinned against in pytest."""
    firsts: dict[str, dict] = {}
    conts: dict[str, list[dict]] = {}
    out: list[dict] = []
    for rec in records:
        seg_no = rec.get("segment_number")
        if rec["type"] == "continuation":
            origin = rec.get("segment_origin_id")
            if origin is None or seg_no is None:
                raise ValueError("continuation record missing segment headers")
            conts.setdefault(origin, []).append(rec)
        elif seg_no == 1:
            firsts[rec["record_id"]] = rec
            out.append(rec)
        else:
            rec = dict(rec)
            rec["n_segments"] = 1
            out.append(rec)
    for origin, parts in conts.items():
        first = firsts.get(origin)
        if first is None:
            raise ValueError(f"continuation without first segment: {origin}")
        parts.sort(key=lambda r: r["segment_number"])
        nums = [r["segment_number"] for r in parts]
        if nums != list(range(2, 2 + len(parts))):
            raise ValueError(f"segment gap for {origin}: have {nums}")
        block = first["block"] + b"".join(r["block"] for r in parts)
        declared = parts[-1].get("segment_total_length")
        if declared is not None and declared != len(block):
            raise ValueError(
                f"segment total-length mismatch for {origin}: "
                f"declared {declared}, reassembled {len(block)}"
            )
        first["block"] = block
        first["content_length"] = len(block)
        first["n_segments"] = 1 + len(parts)
    for rec in out:
        rec.setdefault("n_segments", 1)
    return out
