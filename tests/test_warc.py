"""WARC reader/writer (functions/warc.py) and the WARC-native
acquisition queries (operators/warc_ingest.py): spec-shaped record
round trips (plain and .warc.gz member layout), hostile-input failure
modes, request-record filtering, and oracle parity of both registered
queries — including the chain query against the BATCH chain's oracle,
proving the container round trip is a semantic no-op."""

from __future__ import annotations

import duckdb
import pytest

from cc_mapreducer_spark.functions.warc import (
    build_http_response,
    build_warc,
    build_warc_record,
    parse_http_response,
    parse_warc,
)

SF_ORACLE = "/root/testdata/sf0.01"


def _resp(uri: str, body: bytes, rid: str = "<urn:x:1>") -> bytes:
    return build_warc_record(
        "response", uri, "2026-01-01T00:00:00Z", build_http_response(body), rid
    )


def test_record_round_trip_plain_and_gzip():
    body = "héllo <b>world</b>".encode("utf-8")  # bodies are BYTES
    recs = [
        _resp("http://a.com/page-1", body),
        build_warc_record(
            "request",
            "http://a.com/page-1",
            "2026-01-01T00:00:00Z",
            b"GET / HTTP/1.1\r\n\r\n",
            "<urn:req:1>",
            content_type="application/http;msgtype=request",
        ),
        _resp("http://b.org/page-2", b"x" * 10_000, "<urn:x:2>"),
    ]
    for gz in (False, True):
        got = parse_warc(build_warc(recs, gzip_per_record=gz))
        assert [r["type"] for r in got] == ["response", "request", "response"]
        status, headers, got_body = parse_http_response(got[0]["block"])
        assert status == 200
        assert headers["content-type"] == "text/html"
        assert got_body == body
        assert got[2]["content_length"] == len(recs[2]) - len(
            recs[2].split(b"\r\n\r\n", 1)[0]
        ) - 4 - 4  # header + blank + block + trailing CRLFCRLF
        _, _, big = parse_http_response(got[2]["block"])
        assert big == b"x" * 10_000


def test_hostile_inputs_fail_loudly():
    good = _resp("http://a.com/page-1", b"ok")
    # truncated block: declared length runs past the buffer
    with pytest.raises(ValueError, match="truncated record"):
        parse_warc(good[: len(good) - 10])
    # bad version line
    with pytest.raises(ValueError, match="version"):
        parse_warc(b"HARC/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n")
    # truncated gzip member
    gz = build_warc([good], gzip_per_record=True)
    with pytest.raises(ValueError, match="gzip"):
        parse_warc(gz[: len(gz) - 6])


def test_member_resync_across_gzip_boundaries():
    """Three records, each its own gzip member, concatenated — the
    .warc.gz contract a reader must resync on."""
    recs = [_resp(f"http://a.com/page-{i}", f"body {i}".encode()) for i in range(3)]
    got = parse_warc(build_warc(recs, gzip_per_record=True))
    assert len(got) == 3
    for i, r in enumerate(got):
        _, _, body = parse_http_response(r["block"])
        assert body == f"body {i}".encode()


def test_registered_queries_match_oracles(spark):
    """Both WARC queries against their DuckDB oracles at sf0.01 —
    warc_acquisition_chain runs against the BATCH chain's oracle, so a
    container round trip that altered one byte of any body or URI would
    hash-mismatch."""
    from cc_mapreducer_spark import registry
    from tests.oracle import compare_frames

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_ORACLE}/documents.parquet'"
    )
    for key in ("warc_response_stats", "warc_acquisition_chain"):
        spdf = registry.all_queries()[key](spark, SF_ORACLE).toPandas()
        assert len(spdf) == 500  # one response row per document
        odf = con.sql(registry.all_oracles()[key]).df()
        compare_frames(spdf, odf, key)


def test_request_records_are_filtered(spark):
    """Every 7th doc plants a request record in front of its response;
    the stats query must still emit exactly one row per doc."""
    from cc_mapreducer_spark.operators.warc_ingest import warc_response_stats

    rows = warc_response_stats(spark, SF_ORACLE).collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids)) == 500
    assert all(r["http_status"] == 200 for r in rows)


def test_revisit_record_round_trip():
    """A revisit record survives build->parse with its profile, digest,
    and refers-to headers intact, headers-only block, through plain AND
    gzipped streams; plain records keep their exact prior geometry
    (extra_headers must not disturb them)."""
    from cc_mapreducer_spark.functions.warc import (
        REVISIT_PROFILE,
        build_http_response,
        build_revisit_record,
        build_warc,
        build_warc_record,
        parse_warc,
        payload_digest,
    )

    body = b"<html>hello</html>"
    digest = payload_digest(body)
    assert digest == "sha256:" + __import__("hashlib").sha256(body).hexdigest()
    resp = build_warc_record(
        "response", "https://x.org/a", "2026-01-01T00:00:00Z",
        build_http_response(body), "<urn:resp:1>",
    )
    rev = build_revisit_record(
        "https://x.org/a", "2026-02-01T00:00:00Z", digest, "<urn:rv:1>",
        refers_to_uri="https://x.org/a",
        refers_to_date="2026-01-01T00:00:00Z",
    )
    for gz in (False, True):
        recs = parse_warc(build_warc([resp, rev], gzip_per_record=gz))
        assert [r["type"] for r in recs] == ["response", "revisit"]
        r = recs[1]
        assert r["profile"] == REVISIT_PROFILE
        assert r["payload_digest"] == digest
        assert r["refers_to_uri"] == "https://x.org/a"
        assert r["refers_to_date"] == "2026-01-01T00:00:00Z"
        assert r["block"] == build_http_response(b"")  # headers only
        assert body not in r["block"]
        # non-revisit records expose the revisit surface as None
        assert recs[0]["payload_digest"] is None
        assert recs[0]["profile"] is None


def test_revisit_resolution_semantics(spark):
    """Every planted revisit (doc_id % 7 == 3) resolves to its original
    capture via the digest join; the digest matches the actual body
    bytes; savings equal the original payload length."""
    from cc_mapreducer_spark.operators.warc_ingest import (
        warc_revisit_resolution,
    )

    rows = {r["doc_id"]: r for r in warc_revisit_resolution(spark, SF_ORACLE).collect()}
    assert set(rows) == {d for d in range(500) if d % 7 == 3}
    for d, r in rows.items():
        assert r["resolved_doc"] == d
        assert r["digest"].startswith("sha256:")
        assert r["revisit_block_len"] == 63
        assert r["saved_bytes"] > 0


def test_wet_file_layout_and_roundtrip(spark):
    """The WET export writes Common Crawl's .wet.gz layout (warcinfo
    header record, then one member-gzipped `conversion` record per doc,
    text/plain blocks) and every parsed-back block equals the clean
    text that went in (wet_block_len forced equal to clean_len)."""
    from cc_mapreducer_spark.functions.warc import (
        build_warc,
        build_warc_record,
        parse_warc,
    )
    from cc_mapreducer_spark.operators.warc_ingest import (
        wet_export_roundtrip,
    )

    # unit: layout of a hand-built WET file
    info = build_warc_record(
        "warcinfo", None, "2026-01-01T00:00:00Z",
        b"software: x\r\n", "<urn:i:0>",
        content_type="application/warc-fields",
    )
    conv = build_warc_record(
        "conversion", "https://x.org/page-9", "2026-01-01T00:00:00Z",
        b"clean text here", "<urn:w:9>", content_type="text/plain",
    )
    recs = parse_warc(build_warc([info, conv], gzip_per_record=True))
    assert [r["type"] for r in recs] == ["warcinfo", "conversion"]
    assert recs[1]["block"] == b"clean text here"
    # integration: every doc comes back, byte lengths agree
    rows = wet_export_roundtrip(spark, SF_ORACLE).collect()
    assert len(rows) == 500
    for r in rows:
        assert r["wet_block_len"] == r["clean_len"]


# --------------------------------------------------------------------------
# segmented records + chunked transfer-encoding (round 8, session 2)
# --------------------------------------------------------------------------


def test_chunked_te_round_trip_and_geometry():
    from cc_mapreducer_spark.functions.warc import (
        build_http_response_chunked,
        decode_chunked,
    )

    for n in (0, 1, 99, 100, 101, 347, 500):
        body = bytes(range(256)) * 2  # binary-safe payload
        body = body[:n] if n <= len(body) else body
        msg = build_http_response_chunked(body, 100)
        status, headers, got = parse_http_response(msg)
        assert status == 200
        assert headers["transfer-encoding"] == "chunked"
        assert got == body
        # closed-form wire geometry: the formula the DuckDB oracle uses
        full, rem = len(body) // 100, len(body) % 100
        exp = 72 + full * 106 + (len(f"{rem:x}") + 4 + rem if rem else 0) + 5
        assert len(msg) == exp
    # chunk extensions and trailer fields are legal wire noise
    assert decode_chunked(b"5;ext=v\r\nhello\r\n0\r\nX-T: 1\r\n\r\n") == b"hello"


def test_chunked_te_hostile_inputs_fail_loudly():
    from cc_mapreducer_spark.functions.warc import decode_chunked

    with pytest.raises(ValueError):  # chunk longer than the buffer
        decode_chunked(b"ff\r\nshort\r\n0\r\n\r\n")
    with pytest.raises(ValueError):  # missing CRLF after chunk data
        decode_chunked(b"5\r\nhelloXX0\r\n\r\n")
    with pytest.raises(ValueError):  # garbage size line
        decode_chunked(b"zz\r\nhello\r\n")
    with pytest.raises(ValueError):  # no terminating zero chunk
        decode_chunked(b"5\r\nhello\r\n")


def test_segment_record_round_trip():
    from cc_mapreducer_spark.functions.warc import (
        reassemble_segments,
        segment_record,
    )

    block = build_http_response(b"z" * 500)
    recs = segment_record(
        "response", "http://e/x", "2026-01-01T00:00:00Z", block,
        "<urn:resp:9>", 120,
    )
    assert len(recs) == (len(block) + 119) // 120
    for gz in (False, True):
        parsed = parse_warc(build_warc(recs, gzip_per_record=gz))
        assert parsed[0]["segment_number"] == 1
        assert parsed[1]["type"] == "continuation"
        assert parsed[1]["segment_origin_id"] == "<urn:resp:9>"
        assert parsed[-1]["segment_total_length"] == len(block)
        out = reassemble_segments(parsed)
        assert len(out) == 1
        assert out[0]["block"] == block
        assert out[0]["n_segments"] == len(recs)
        assert out[0]["content_length"] == len(block)
    # small blocks are NOT segmented (writers segment only when forced)
    single = segment_record("response", "u", "d", b"small", "<urn:r:1>", 120)
    assert len(single) == 1
    assert parse_warc(single[0])[0]["segment_number"] is None


def test_segment_reassembly_failure_modes():
    from cc_mapreducer_spark.functions.warc import (
        reassemble_segments,
        segment_record,
    )

    block = build_http_response(b"q" * 500)
    recs = segment_record(
        "response", "http://e/x", "d", block, "<urn:resp:7>", 120
    )
    parsed = parse_warc(build_warc(recs))
    with pytest.raises(ValueError):  # gap: a middle segment is missing
        reassemble_segments([parsed[0]] + parsed[2:])
    with pytest.raises(ValueError):  # orphan continuation, no first segment
        reassemble_segments(parsed[1:])
    short = [dict(r) for r in parsed]
    short[-1]["segment_total_length"] = len(block) + 1
    with pytest.raises(ValueError):  # declared total disagrees
        reassemble_segments(short)


def test_chunked_inside_segmented_composes():
    from cc_mapreducer_spark.functions.warc import (
        build_http_response_chunked,
        reassemble_segments,
        segment_record,
    )

    body = bytes([i % 251 for i in range(450)])
    msg = build_http_response_chunked(body, 100)
    recs = segment_record(
        "response", "http://e/c", "d", msg, "<urn:resp:10>", 120
    )
    out = reassemble_segments(parse_warc(build_warc(recs, gzip_per_record=True)))
    status, headers, got = parse_http_response(out[0]["block"])
    assert status == 200 and got == body


def test_segment_reassembly_query_matches_oracle(spark):
    """The distributed (groupBy origin-id) reassembly against the
    closed-form oracle at sf0.01 — all four planted wire shapes."""
    from cc_mapreducer_spark.operators.warc_ingest import (
        _SEGMENT_SQL,
        warc_segment_reassembly,
    )
    from tests.oracle import compare_frames, duckdb_connection

    con = duckdb_connection(SF_ORACLE)
    got = warc_segment_reassembly(spark, SF_ORACLE).toPandas()
    exp = con.execute(_SEGMENT_SQL).df()
    compare_frames(got, exp, "warc_segment_reassembly")
    # the planted classes actually exercise multi-segment + chunked rows
    assert (got["n_segments"] > 1).any()
    assert (got["te"] == "chunked").any()
    assert (got["te"] == "identity").any()
