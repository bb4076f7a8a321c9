"""Acquisition-side operators (operators/acquisition.py): planted
messy-HTML / messy-URL fixtures with exact expected outputs, plus shape
checks of the registered fixture queries. DuckDB hash parity of the
registered queries (and their acquisition_suite legs) is covered by
tests/test_oracle_parity.py like every other oracle-backed key."""

from __future__ import annotations

from cc_mapreducer_spark.operators.acquisition import (
    canonicalize_url,
    domain_acquisition_rollup,
    html_strip_stats,
    strip_html,
    url_canonical_stats,
)

SF_ORACLE = "/root/testdata/sf0.01"


def _strip_one(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "html string")
    return strip_html(df, "html").collect()[0]["clean_text"]


def test_strip_html_planted_cases(spark):
    # script body containing '<' and a tag-in-string: naive '<[^>]*>'
    # stripping would leak from 'if (a < b)' to the next '>'
    assert (
        _strip_one(
            spark,
            '<p>keep</p><script>if (a < b) { s = "<div>"; }</script><p>me</p>',
        )
        == "keep me"
    )
    # style block, comment, uppercase tags
    assert (
        _strip_one(
            spark,
            "<STYLE>p { color: red; }</STYLE><!-- hidden -->"
            '<P CLASS="x">body</P>',
        )
        == "body"
    )
    # entities: decode after tag-strip; '&amp;lt;' is the literal text
    # '&lt;' (never resurrects into a strippable tag)
    assert (
        _strip_one(spark, "<b>a &amp;lt; b &lt;i&gt; &quot;q&quot; it&#39;s</b>")
        == 'a &lt; b <i> "q" it\'s'
    )
    # whitespace collapse + trim, tags become word boundaries
    assert _strip_one(spark, " <p>a</p>\n\t<p>b</p> ") == "a b"
    # nbsp decodes to a space and collapses with neighbors
    assert _strip_one(spark, "a&nbsp;&nbsp;b") == "a b"


def _canon_one(spark, url: str):
    df = spark.createDataFrame([(url,)], "url string")
    return canonicalize_url(df, "url").collect()[0]


def test_canonicalize_url_planted_cases(spark):
    r = _canon_one(
        spark, "HTTP://User:pw@WWW.Example.COM:80//a//b/?utm_source=x&b=2&a=1#f"
    )
    assert r["canonical_url"] == "http://example.com/a/b?a=1&b=2"
    assert r["host"] == "example.com"
    assert r["n_params"] == 2
    # https default port drops; root path renders empty
    assert (
        _canon_one(spark, "https://Sub.Host.org:443/")["canonical_url"]
        == "https://sub.host.org"
    )
    # non-default port survives; trailing slash drops
    assert (
        _canon_one(spark, "https://host.org:8443/x/")["canonical_url"]
        == "https://host.org:8443/x"
    )
    # no path, no query
    assert (
        _canon_one(spark, "http://host.com")["canonical_url"]
        == "http://host.com"
    )
    # all params tracking -> query gone entirely
    r = _canon_one(spark, "http://host.com/?utm_a=1&utm_b=2")
    assert r["canonical_url"] == "http://host.com"
    assert r["n_params"] == 0


def test_canonical_is_idempotent(spark):
    """Canonicalizing a canonical URL must be a no-op — the property a
    crawl frontier relies on when URLs re-enter from parsed pages."""
    urls = [
        "HTTP://WWW.A.COM:80//x/?b=2&a=1#f",
        "https://h.org:8443/x/",
        "http://host.com/?utm_a=1",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    first = [
        r["canonical_url"] for r in canonicalize_url(df, "url").collect()
    ]
    df2 = spark.createDataFrame([(u,) for u in first], "url string")
    second = [
        r["canonical_url"] for r in canonicalize_url(df2, "url").collect()
    ]
    assert first == second


def test_registered_fixture_queries_shapes(spark):
    html = {r["doc_id"]: r for r in html_strip_stats(spark, SF_ORACLE).collect()}
    assert len(html) == 500
    for r in html.values():
        assert 0 < r["n_chars_clean"] < r["n_chars_html"]
        assert r["n_tags"] >= 10  # the fixture plants at least this many
        assert r["clean_h"] >= 0
    url = {r["doc_id"]: r for r in url_canonical_stats(spark, SF_ORACLE).collect()}
    assert len(url) == 500
    for r in url.values():
        c = r["canonical_url"]
        assert c.startswith(("http://", "https://"))
        assert "WWW" not in c and "#" not in c and "utm_" not in c
        assert "@" not in c and ":80/" not in c
    # kept params come back sorted
    sample = next(r for r in url.values() if r["n_params"] == 2)
    q = sample["canonical_url"].split("?")[1]
    assert q in ("a=1&b=2", "y=8&z=9")


def test_domain_rollup_consistency(spark):
    rows = domain_acquisition_rollup(spark, SF_ORACLE).collect()
    assert rows
    assert sum(r["n_docs"] for r in rows) == 500
    for r in rows:
        assert r["n_unique"] + r["n_dup_docs"] == r["n_docs"]
        assert 0.0 <= r["dup_doc_frac"] <= 1.0
        assert "." in r["domain"] and r["domain"].count(".") == 1


def test_schemeless_url_nulls_not_garbage(spark):
    """A scheme-less or relative input has no authority to canonicalize:
    all three outputs must be NULL, never a '://...' garbage string that
    would silently poison a dedup key (ADVICE r6)."""
    bad = ["example.com/x?a=1", "/relative/path", "", "ftp.example.com:21"]
    df = spark.createDataFrame([(u,) for u in bad], "url string")
    for r in canonicalize_url(df, "url").collect():
        assert r["canonical_url"] is None
        assert r["host"] is None
        assert r["n_params"] is None
    # a real scheme still canonicalizes (guard must not over-trigger)
    ok = _canon_one(spark, "ftp://Host.org/x/")
    assert ok["canonical_url"] == "ftp://host.org/x"


def test_chain_composes_strip_canonicalize_tokenize(spark):
    """The composed chain (VERDICT r6 item 2): clean TEXT tokens feed the
    profile (the raw document's own tokens are a subset — title residue
    adds more), the domain comes from the canonicalized URL, and the
    rollup is an exact aggregate of the per-doc rows."""
    from pyspark.sql import functions as F

    from cc_mapreducer_spark.operators.acquisition import (
        acquisition_chain_profile,
        acquisition_chain_rollup,
    )
    from cc_mapreducer_spark.tables import load_table

    chain = acquisition_chain_profile(spark, SF_ORACLE)
    rows = chain.collect()
    assert len(rows) == 500
    # every doc got a real domain from the canonical URL, never markup
    for r in rows:
        assert r["domain"] and "." in r["domain"]
        assert r["canonical_url"].startswith(("http://", "https://"))
        assert "<" not in r["canonical_url"]
        assert r["n_distinct_tokens"] <= r["n_tokens"]
    # clean-text tokens ⊇ the raw document's tokens (strip keeps content)
    raw_tokens = {
        r["doc_id"]: r["nt"]
        for r in load_table(spark, SF_ORACLE, "documents")
        .select(
            "doc_id",
            F.size(
                F.filter(
                    F.split(
                        F.regexp_replace(F.lower("text"), "[^a-z]+", " "), " "
                    ),
                    lambda w: w != "",
                )
            ).alias("nt"),
        )
        .collect()
    }
    for r in rows:
        assert r["n_tokens"] >= raw_tokens[r["doc_id"]]
    # the rollup is the per-doc frame aggregated, nothing more
    roll = {r["domain"]: r for r in acquisition_chain_rollup(spark, SF_ORACLE).collect()}
    assert sum(r["n_docs"] for r in roll.values()) == 500
    by_dom: dict = {}
    for r in rows:
        by_dom.setdefault(r["domain"], []).append(r)
    for dom, rs in by_dom.items():
        assert roll[dom]["n_docs"] == len(rs)
        assert roll[dom]["tokens_total"] == sum(x["n_tokens"] for x in rs)
        assert roll[dom]["n_unique"] == len({x["clean_h"] for x in rs})


def test_policy_filter_labels_and_parity(spark):
    """The crawl-policy gate labels, never drops: full doc domain, all
    three verdicts present (the planted /cart/ offenders, the two
    blocked fixture domains, the rest ok), domain block wins over path,
    and the DuckDB oracle agrees."""
    import duckdb

    from cc_mapreducer_spark import registry
    from cc_mapreducer_spark.operators.acquisition import (
        _BLOCKED_DOMAINS,
        acquisition_policy_filter,
    )
    from tests.oracle import compare_frames

    rows = acquisition_policy_filter(spark, SF_ORACLE).collect()
    assert len(rows) == 500  # labeled, not dropped
    by_verdict: dict = {}
    for r in rows:
        by_verdict.setdefault(r["verdict"], []).append(r)
    assert set(by_verdict) == {"ok", "blocked_domain", "blocked_path"}
    for r in by_verdict["blocked_domain"]:
        assert any(d in r["canonical_url"] for d in _BLOCKED_DOMAINS)
    for r in by_verdict["blocked_path"]:
        assert "/cart/" in r["canonical_url"]
        # precedence: a doc on a blocked domain labels blocked_domain
        # even when its path also offends
        assert not any(d in r["canonical_url"] for d in _BLOCKED_DOMAINS)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_ORACLE}/documents.parquet'"
    )
    spdf = registry.all_queries()["acquisition_policy_filter"](
        spark, SF_ORACLE
    ).toPandas()
    odf = con.sql(registry.all_oracles()["acquisition_policy_filter"]).df()
    compare_frames(spdf, odf, "acquisition_policy_filter")


def test_robots_filter_rep_semantics(spark):
    """REP decision rule on the planted fixture: longest prefix wins,
    Allow beats Disallow only via the LONGER match, the /Docs/page-1
    prefix blocks page-10..19 too (the REP footgun), page-13x comes
    back via the longer allow, src7.org is fully disallowed, and no
    row is dropped."""
    from cc_mapreducer_spark.operators.acquisition import robots_policy_filter

    rows = {r["doc_id"]: r for r in robots_policy_filter(spark, SF_ORACLE).collect()}
    assert len(rows) == 500
    for doc_id, r in rows.items():
        url = r["canonical_url"]
        if "src7.org" in url:
            assert not r["robots_allowed"]  # blanket disallow
        if "/cart/" in url and "src7.org" not in url:
            assert not r["robots_allowed"]
            assert r["robots_rule"] == "/cart/"
        if ".com/Docs/page-13" in url:
            assert r["robots_allowed"]  # longer Allow overrides
            assert r["robots_rule"] == "/Docs/page-13"
        elif ".com/Docs/page-1" in url:
            assert not r["robots_allowed"]  # prefix catches page-10..19
        if ".org/" in url and "src7.org" not in url and "/cart/" not in url:
            assert r["robots_allowed"] and r["robots_rule"] is None


def test_robots_rule_deterministic_on_equal_length_ties(spark):
    """ADVICE r7: real robots.txt files may legally carry two matching
    prefixes of EQUAL length (even the same prefix with opposite
    verdicts). The winner column must not depend on collect_list order:
    robots_rule is the lexicographically-smallest prefix among the
    longest matches, and allow still wins the decision on the tie."""
    from cc_mapreducer_spark.operators.acquisition import robots_allowed

    canon = spark.createDataFrame(
        [
            (1, "https://ex.com/abc/page", "ex.com"),
            (2, "https://ex.com/xyz/page", "ex.com"),
        ],
        "doc_id long, canonical_url string, domain string",
    )
    rules = spark.createDataFrame(
        [
            # equal-length tie, opposite verdicts, on BOTH paths
            ("ex.com", "/abc/", False),
            ("ex.com", "/abc/", True),
            ("ex.com", "/xyz/", False),
            ("ex.com", "/xyw/", True),  # same length, non-matching
        ],
        "domain string, prefix string, allow boolean",
    )
    for _ in range(3):  # repeated evaluation must agree (order-free expr)
        rows = {r["doc_id"]: r for r in robots_allowed(canon, rules).collect()}
        assert rows[1]["robots_allowed"] is True  # allow wins the tie
        assert rows[1]["robots_rule"] == "/abc/"
        assert rows[2]["robots_allowed"] is False
        assert rows[2]["robots_rule"] == "/xyz/"


def test_admission_composes_gates_with_precedence(spark):
    """The composed admission decision: robots first (so a /cart/ URL
    reports the robots rule, not the blocklist), then the operator
    blocklist, then first-seen canonical dedup; exactly one admitted
    row per shared canonical URL; admitted == (all gates pass)."""
    from cc_mapreducer_spark.operators.acquisition import (
        _SHARED_URL,
        crawl_admission_report,
    )

    rows = crawl_admission_report(spark, SF_ORACLE).collect()
    assert len(rows) == 500
    by_dec: dict = {}
    for r in rows:
        by_dec.setdefault(r["decision"].split(":")[0], []).append(r)
        assert r["admitted"] == (r["decision"] == "admitted")
    assert set(by_dec) >= {"admitted", "robots", "duplicate_url", "blocked_domain"}
    # robots precedence: every /cart/ URL (also a blocklist path hit)
    # reports the robots rule
    for r in rows:
        if "/cart/" in r["canonical_url"] and "src7.org" not in r["canonical_url"]:
            assert r["decision"] == "robots:/cart/"
    # exactly one admitted row among the shared-URL duplicates
    shared = [r for r in rows if r["canonical_url"] == _SHARED_URL]
    assert len(shared) > 50
    winners = [r for r in shared if r["admitted"]]
    assert len(winners) == 1
    assert winners[0]["doc_id"] == min(r["doc_id"] for r in shared)


def test_robots_wildcard_rfc9309_semantics(spark):
    """RFC 9309 metacharacters on the planted fixture: the '*'-disallow
    catches any 3 after 'page-'; the LONGER '*'-allow wins page-33*
    back; the '$'-anchored allow matches page-4 exactly (page-14/-44
    keep trailing slashes or digits and stay out); /cart/ still gates
    through the regex path; unmatched paths default allowed."""
    from cc_mapreducer_spark.operators.acquisition import (
        robots_allowed_rfc9309,
        robots_wildcard_filter,
    )

    rows = {r["doc_id"]: r for r in robots_wildcard_filter(spark, SF_ORACLE).collect()}
    assert len(rows) == 500
    for d, r in rows.items():
        if d % 9 == 0:
            assert not r["robots_allowed"] and r["robots_rule"] == "/cart/"
        elif d == 4:
            assert r["robots_allowed"] and r["robots_rule"] == "/Docs/*page-4$"
        elif str(d).startswith("33"):
            assert r["robots_allowed"] and r["robots_rule"] == "/Docs/*page-33*"
        elif "3" in str(d):
            assert not r["robots_allowed"]
            assert r["robots_rule"] == "/Docs/*page-*3"
        else:
            assert r["robots_allowed"], d
    # unit: '$' does not match a longer path; equal-length wildcard tie
    # -> allow wins and the winner is order-free
    canon = spark.createDataFrame(
        [
            (1, "https://ex.com/a/page-4", "ex.com"),
            (2, "https://ex.com/a/page-41", "ex.com"),
            (3, "https://ex.com/b/x", "ex.com"),
        ],
        "doc_id long, canonical_url string, domain string",
    )
    rules = spark.createDataFrame(
        [
            ("ex.com", "/a/*-4$", True),
            ("ex.com", "/a/*", False),
            ("ex.com", "/b/*x$", False),
            ("ex.com", "/b/x*$", True),  # same length, both match -> allow
        ],
        "domain string, pattern string, allow boolean",
    )
    got = {r["doc_id"]: r for r in robots_allowed_rfc9309(canon, rules).collect()}
    assert got[1]["robots_allowed"] and got[1]["robots_rule"] == "/a/*-4$"
    assert not got[2]["robots_allowed"] and got[2]["robots_rule"] == "/a/*"
    assert got[3]["robots_allowed"]  # tie on length 6: allow wins
    assert got[3]["robots_rule"] == "/b/*x$"  # lexicographic min of the tie


def test_frontier_schedule_politeness_invariants(spark):
    """The frontier lays out exactly the admitted URLs: per-domain slots
    are a gapless 0..n-1 sequence in doc order, offsets are slot x the
    domain's delay, and non-admitted URLs never appear."""
    from cc_mapreducer_spark.operators.acquisition import (
        crawl_admission_report,
        crawl_frontier_schedule,
    )

    adm = {
        r["doc_id"]: r
        for r in crawl_admission_report(spark, SF_ORACLE).collect()
        if r["admitted"]
    }
    rows = crawl_frontier_schedule(spark, SF_ORACLE).collect()
    assert {r["doc_id"] for r in rows} == set(adm)
    by_dom: dict = {}
    for r in rows:
        by_dom.setdefault(r["domain"], []).append(r)
    for dom, rs in by_dom.items():
        delay = 500 * (1 + len(dom) % 3)
        rs.sort(key=lambda r: r["doc_id"])
        assert [r["slot"] for r in rs] == list(range(len(rs)))
        for r in rs:
            assert r["fetch_offset_ms"] == r["slot"] * delay
