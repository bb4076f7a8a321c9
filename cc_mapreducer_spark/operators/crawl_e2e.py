"""The whole crawl, one DAG: discovery-to-corpus as a single query.

Every stage below exists as its own oracle-backed operator; this module
is the witness that they COMPOSE — the acquisition funnel a 100 TB
pipeline actually runs, expressed as one Catalyst plan whose per-domain
outcome hashes green against an oracle that composes the same stages in
SQL:

  admission   robots ∘ blocklist ∘ canonical-URL first-seen
              (crawl_admission_report — window + broadcast gates)
  fetch       WARC response containers built AND parsed back for the
              admitted URLs only (the funnel order: rejected URLs are
              never fetched, so they never pay container work)
  extract     strip_html -> clean text + token profile (the §2.2
              tokenizer chain)
  quality     a distinct-token floor — the cheap gate standing in for
              the C4/extraction batteries proven elsewhere
  dedup       first-seen per clean-text hash: the content-level dedup
              that catches what URL dedup cannot (planted: every
              (12k+5)th page serves the same boilerplate body from a
              different URL)
  pack        GPT-style context packing of the SURVIVING corpus (r10):
              per (domain, shard) stream — the seqprep recipe with the
              same md5 shard rule — contexts produced, tail padding,
              and boundary-fragmented docs per domain: the numbers the
              dataloader hand-off is sized by. The report needs no bin
              explode: contexts/padding are closed-form in the stream
              length and fragments fall out of the same offset cumsum.
  report      per-domain funnel counts + shipped tokens + a corpus
              content checksum — the table a crawl operator actually
              watches

Scale shape: admission is broadcast gates + one window; the fetch/
extract stage rides the scan of the ADMITTED subset; dedup is one
window on the content hash; packing is one window on (domain, shard)
— sharded, never a whole domain on one task (seqprep's r10 rule); the
report is one partial-aggregated groupBy on domain. Nothing in the
composition adds a shuffle the stages didn't already own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cc_mapreducer_spark.operators.acquisition import (
    _ADMISSION_SQL,
    _HTML_FIXTURE_SQL,
    _URL_FIXTURE_SQL,
    _html_fixture_col,
    _strip_html_sql,
    _url_fixture_col,
    crawl_admission_report,
    strip_html,
)
from cc_mapreducer_spark.operators.seqprep import CONTEXT_LEN, N_PACK_SHARDS
from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table, spread

# every (12k+5)th URL serves this exact page — same content, different
# URL: the case URL-level dedup cannot catch and content-level dedup
# must (a constant page, because the normal html fixture embeds doc_id
# in visible text and would de-duplicate nothing)
_BOILER_TEXT = (
    "welcome to the mirror of this site all rights reserved contact the "
    "webmaster for enquiries about syndication and reuse of articles "
    "nothing on this page changes between captures"
)
_BOILER_HTML = (
    "<html><head><title>mirror</title></head><body><p>"
    + _BOILER_TEXT
    + "</p></body></html>"
)
MIN_DISTINCT_TOKENS = 20


def _e2e_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with the planted content-duplicate pages swapped in
    (local to this query — the per-family fixtures are untouched)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 12 == 5, F.lit(_BOILER_HTML))
        .otherwise(_html_fixture_col())
        .alias("html"),
        _url_fixture_col().alias("url"),
    )


_E2E_SQL = f"""
WITH adm AS (
    SELECT doc_id, canonical_url, admitted FROM ({_ADMISSION_SQL})
), pages AS (
    SELECT doc_id,
           CASE WHEN doc_id % 12 = 5 THEN '{_BOILER_HTML}'
                ELSE {_HTML_FIXTURE_SQL} END AS html,
           {_URL_FIXTURE_SQL} AS url
    FROM documents
), fetched AS (
    SELECT a.doc_id, a.canonical_url, p.html
    FROM adm a JOIN pages p USING (doc_id)
    WHERE a.admitted
), extracted AS (
    SELECT doc_id, canonical_url,
           {_strip_html_sql('html')} AS clean_text,
           regexp_extract(
               regexp_extract(canonical_url,
                   '^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?(?:www\\.)?([^/?#:]*)',
                   1),
               '[^.]+\\.[^.]+$') AS domain
    FROM fetched
), toks AS (
    SELECT doc_id, canonical_url, domain, clean_text,
           list_filter(string_split(
               regexp_replace(lower(clean_text), '[^a-z]+', ' ', 'g'), ' '),
               w -> w <> '') AS ws
    FROM extracted
), profiled AS (
    SELECT doc_id, domain,
           CAST(len(ws) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct,
           ('0x' || substr(md5(clean_text), 1, 12))::BIGINT AS clean_h
    FROM toks
), quality AS (
    SELECT *, n_distinct >= {MIN_DISTINCT_TOKENS} AS q_ok FROM profiled
), deduped AS (
    SELECT *,
           CASE WHEN q_ok THEN row_number() OVER (
               PARTITION BY q_ok, clean_h ORDER BY doc_id)
                ELSE NULL END AS rk
    FROM quality
), adm_counts AS (
    SELECT regexp_extract(
               regexp_extract(canonical_url,
                   '^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?(?:www\\.)?([^/?#:]*)',
                   1),
               '[^.]+\\.[^.]+$') AS domain,
           count(*) AS n_urls,
           count(*) FILTER (WHERE admitted) AS n_admitted
    FROM adm GROUP BY 1
), corpus AS (
    SELECT domain,
           count(*) AS n_fetched,
           count(*) FILTER (WHERE q_ok) AS n_quality_ok,
           count(*) FILTER (WHERE rk = 1) AS n_unique,
           coalesce(sum(n_tokens) FILTER (WHERE rk = 1), 0) AS tokens_shipped,
           coalesce(sum(clean_h % 100000019) FILTER (WHERE rk = 1), 0)
               AS content_sum
    FROM deduped GROUP BY domain
), surv AS (
    -- pack stage input: the docs that survived quality + dedup, with
    -- the seqprep shard rule (md5(doc_id) % N — hashed so the shard
    -- never correlates with the id assignment; see operators/seqprep)
    SELECT domain, doc_id, n_tokens,
           ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT
               % {N_PACK_SHARDS} AS shard
    FROM deduped WHERE rk = 1
), pspans AS (
    SELECT domain, shard, doc_id, n_tokens,
           coalesce(sum(n_tokens + 1) OVER (
               PARTITION BY domain, shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS pstart
    FROM surv
), pstreams AS (
    SELECT domain, shard, sum(n_tokens + 1) AS t_len,
           count(*) FILTER (WHERE (pstart + n_tokens) // {CONTEXT_LEN}
                                  > pstart // {CONTEXT_LEN}) AS n_frag
    FROM pspans GROUP BY domain, shard
), packed AS (
    SELECT domain,
           sum((t_len + {CONTEXT_LEN} - 1) // {CONTEXT_LEN})
               AS pack_contexts,
           sum(((t_len + {CONTEXT_LEN} - 1) // {CONTEXT_LEN})
               * {CONTEXT_LEN} - t_len) AS pack_padding,
           sum(n_frag) AS pack_fragments
    FROM pstreams GROUP BY domain
), rev AS (
    -- the family's revisit residue (warc_ingest._records_for_doc):
    -- every (7k+3)th ADMITTED fetch also stores a headers-only
    -- re-crawl; its digest matches its own capture's payload, so the
    -- Spark side's digest join must resolve every one, saving the
    -- payload bytes. The oracle re-derives the closed form; the Spark
    -- side EARNS it by building/parsing real WARC bytes and joining.
    -- strlen = BYTE count, matching the Spark side's len(payload bytes);
    -- length() would count characters and silently diverge on non-ASCII
    SELECT f.domain, strlen(f.html) AS saved
    FROM (SELECT a.doc_id,
                 regexp_extract(
                     regexp_extract(a.canonical_url,
                         '^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?(?:www\\.)?([^/?#:]*)',
                         1),
                     '[^.]+\\.[^.]+$') AS domain,
                 p.html
          FROM adm a JOIN pages p USING (doc_id)
          WHERE a.admitted AND a.doc_id % 7 = 3) f
), rev_counts AS (
    SELECT domain,
           count(*) AS n_revisits,
           count(*) AS n_revisit_resolved,
           sum(saved) AS revisit_saved_bytes
    FROM rev GROUP BY domain
)
SELECT a.domain,
       CAST(a.n_urls AS BIGINT) AS n_urls,
       CAST(a.n_admitted AS BIGINT) AS n_admitted,
       CAST(coalesce(c.n_fetched, 0) AS BIGINT) AS n_fetched,
       CAST(coalesce(c.n_quality_ok, 0) AS BIGINT) AS n_quality_ok,
       CAST(coalesce(c.n_unique, 0) AS BIGINT) AS n_unique,
       CAST(coalesce(c.tokens_shipped, 0) AS BIGINT) AS tokens_shipped,
       CAST(coalesce(c.content_sum, 0) AS BIGINT) AS content_sum,
       CAST(coalesce(r.n_revisits, 0) AS BIGINT) AS n_revisits,
       CAST(coalesce(r.n_revisit_resolved, 0) AS BIGINT)
           AS n_revisit_resolved,
       CAST(coalesce(r.revisit_saved_bytes, 0) AS BIGINT)
           AS revisit_saved_bytes,
       CAST(coalesce(k.pack_contexts, 0) AS BIGINT) AS pack_contexts,
       CAST(coalesce(k.pack_padding, 0) AS BIGINT) AS pack_padding,
       CAST(coalesce(k.pack_fragments, 0) AS BIGINT) AS pack_fragments
FROM adm_counts a
LEFT JOIN corpus c USING (domain)
LEFT JOIN rev_counts r USING (domain)
LEFT JOIN packed k USING (domain)
"""


@register("crawl_e2e_funnel", oracle=_E2E_SQL, driver=False)
def crawl_e2e_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discovery-to-corpus-to-contexts in one plan; see the module
    docstring. Per domain: URLs seen, admitted, fetched, passing the
    quality floor, unique after content dedup, tokens shipped, a
    modular checksum of the shipped content hashes, revisit resolution,
    and the dataloader hand-off numbers (packed contexts / padding /
    fragmented docs over the surviving corpus)."""
    from pyspark.sql import Window

    adm = crawl_admission_report(spark, sf_dir)
    host = F.regexp_extract(
        "canonical_url",
        r"^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?(?:www\.)?([^/?#:]*)",
        1,
    )
    domain = F.regexp_extract(host, r"[^.]+\.[^.]+$", 0)
    adm = adm.withColumn("domain", domain)
    adm_counts = adm.groupBy("domain").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.count(F.when(F.col("admitted"), 1)).cast("long").alias("n_admitted"),
    )

    # fetch: the admitted pages pass through a real WARC container —
    # response records built, then parsed back (mapInPandas, riding the
    # scan of the ADMITTED subset only). The oracle needs no WARC stage
    # because the round trip is byte-exact (the warc_acquisition_chain
    # precedent); a container bug would break parity here, not hide.
    import re as _re
    from typing import Iterator

    import pandas as pd

    from cc_mapreducer_spark.functions.warc import (
        build_http_response,
        build_warc,
        build_warc_record,
        parse_http_response,
        parse_warc,
    )

    def _through_warc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from cc_mapreducer_spark.functions.warc import (
            build_revisit_record,
            payload_digest,
        )

        for pdf in batches:
            if not len(pdf):
                continue
            out = {"doc_id": [], "kind": [], "html": [], "domain": [],
                   "digest": [], "nbytes": []}
            for doc_id, html, dom in zip(
                pdf["doc_id"], pdf["html"], pdf["domain"]
            ):
                body = str(html).encode("utf-8")
                uri = f"https://fetch/page-{int(doc_id)}"
                recs = [
                    build_warc_record(
                        "response",
                        uri,
                        "2026-01-01T00:00:00Z",
                        build_http_response(body),
                        f"<urn:e2e:{int(doc_id)}>",
                    )
                ]
                # the family's revisit residue (warc_ingest
                # _records_for_doc): every (7k+3)th fetch is a re-crawl
                # whose payload matched — stored headers-only with the
                # identical-payload digest; the funnel must RESOLVE it
                # by digest-joining the stored captures (r8 verdict
                # stretch #8: Common Crawl's native dedup signal inside
                # the composed DAG)
                if int(doc_id) % 7 == 3:
                    recs.append(
                        build_revisit_record(
                            uri,
                            "2026-02-01T00:00:00Z",
                            payload_digest(body),
                            f"<urn:e2e-revisit:{int(doc_id)}>",
                            refers_to_uri=uri,
                            refers_to_date="2026-01-01T00:00:00Z",
                        )
                    )
                blob = build_warc(recs, gzip_per_record=(int(doc_id) % 3 == 0))
                for parsed in parse_warc(blob):
                    m = _re.search(r"page-(\d+)", parsed["target_uri"] or "")
                    rid = int(m.group(1)) if m else None
                    if parsed["type"] == "response":
                        _, _, pbody = parse_http_response(parsed["block"])
                        out["doc_id"].append(rid)
                        out["kind"].append("response")
                        out["html"].append(pbody.decode("utf-8"))
                        out["domain"].append(dom)
                        out["digest"].append(payload_digest(pbody))
                        out["nbytes"].append(len(pbody))
                    elif parsed["type"] == "revisit":
                        out["doc_id"].append(rid)
                        out["kind"].append("revisit")
                        out["html"].append("")
                        out["domain"].append(dom)
                        out["digest"].append(parsed["payload_digest"])
                        out["nbytes"].append(0)
            yield pd.DataFrame(out)

    parsed_recs = (
        _e2e_docs(spark, sf_dir)
        .join(
            adm.filter("admitted").select("doc_id", "domain"), "doc_id"
        )
        .mapInPandas(
            _through_warc,
            "doc_id long, kind string, html string, domain string, "
            "digest string, nbytes long",
        )
        .localCheckpoint()
    )
    fetched = parsed_recs.filter(F.col("kind") == "response").select(
        "doc_id", "html", "domain"
    )
    # revisit resolution INSIDE the funnel: digest-join the headers-only
    # re-crawls against the stored captures of the same fetched set —
    # a revisit whose digest matched no stored payload would drop out
    # and shrink the resolved count (hash-checked)
    revisits = parsed_recs.filter(F.col("kind") == "revisit").select(
        "doc_id", "domain", "digest"
    )
    responses_d = parsed_recs.filter(F.col("kind") == "response").select(
        F.col("digest").alias("resp_digest"),
        F.col("nbytes").alias("resp_bytes"),
    )
    resolved = (
        revisits.join(
            responses_d, revisits["digest"] == responses_d["resp_digest"]
        )
        .groupBy("doc_id", "domain", "digest")
        .agg(F.min("resp_bytes").alias("saved"))
    )
    rev_counts = (
        revisits.groupBy("domain")
        .agg(F.count("*").cast("long").alias("n_revisits"))
        .join(
            resolved.groupBy("domain").agg(
                F.count("*").cast("long").alias("n_revisit_resolved"),
                F.sum("saved").cast("long").alias("revisit_saved_bytes"),
            ),
            "domain",
            "left",
        )
    )
    ws = F.filter(
        F.split(F.regexp_replace(F.lower("clean_text"), "[^a-z]+", " "), " "),
        lambda w: w != F.lit(""),
    )
    profiled = strip_html(fetched, "html").select(
        "doc_id",
        "domain",
        F.size(ws).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(ws)).cast("long").alias("n_distinct"),
        F.conv(F.substring(F.md5("clean_text"), 1, 12), 16, 10)
        .cast("long")
        .alias("clean_h"),
    ).withColumn("q_ok", F.col("n_distinct") >= MIN_DISTINCT_TOKENS)
    w = Window.partitionBy("q_ok", "clean_h").orderBy("doc_id")
    deduped = profiled.withColumn(
        "rk", F.when(F.col("q_ok"), F.row_number().over(w))
    )
    corpus = deduped.groupBy("domain").agg(
        F.count("*").cast("long").alias("n_fetched"),
        F.count(F.when(F.col("q_ok"), 1)).cast("long").alias("n_quality_ok"),
        F.count(F.when(F.col("rk") == 1, 1)).cast("long").alias("n_unique"),
        F.coalesce(
            F.sum(F.when(F.col("rk") == 1, F.col("n_tokens"))), F.lit(0)
        )
        .cast("long")
        .alias("tokens_shipped"),
        F.coalesce(
            F.sum(F.when(F.col("rk") == 1, F.col("clean_h") % 100000019)),
            F.lit(0),
        )
        .cast("long")
        .alias("content_sum"),
    )
    # pack stage: the surviving corpus through the seqprep recipe —
    # per (domain, shard) stream (same md5 shard rule; a raw-id modulo
    # would correlate with the fixture's id striping). contexts and
    # padding are closed-form in each stream's length; fragments come
    # from the same offset cumsum — no bin explode needed at report
    # grain. Integer `div`, not float division: exact at any offset.
    L = CONTEXT_LEN
    surv = deduped.filter(F.col("rk") == 1).select(
        "domain",
        "doc_id",
        "n_tokens",
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4),
                16,
                10,
            ).cast("long")
            % N_PACK_SHARDS
        ).alias("shard"),
    )
    pw = (
        Window.partitionBy("domain", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pstreams = (
        surv.withColumn(
            "pstart",
            F.coalesce(F.sum(F.col("n_tokens") + 1).over(pw), F.lit(0)),
        )
        .groupBy("domain", "shard")
        .agg(
            F.sum(F.col("n_tokens") + 1).alias("t_len"),
            F.count(
                F.when(
                    F.expr(f"(pstart + n_tokens) div {L} > pstart div {L}"),
                    1,
                )
            ).alias("n_frag"),
        )
    )
    packed = pstreams.groupBy("domain").agg(
        F.sum(F.expr(f"(t_len + {L} - 1) div {L}")).alias("pack_contexts"),
        F.sum(
            F.expr(f"((t_len + {L} - 1) div {L}) * {L} - t_len")
        ).alias("pack_padding"),
        F.sum("n_frag").alias("pack_fragments"),
    )
    return (
        adm_counts.join(corpus, "domain", "left")
        .join(rev_counts, "domain", "left")
        .join(packed, "domain", "left")
        .select(
            "domain",
            "n_urls",
            "n_admitted",
            F.coalesce("n_fetched", F.lit(0)).cast("long").alias("n_fetched"),
            F.coalesce("n_quality_ok", F.lit(0))
            .cast("long")
            .alias("n_quality_ok"),
            F.coalesce("n_unique", F.lit(0)).cast("long").alias("n_unique"),
            F.coalesce("tokens_shipped", F.lit(0))
            .cast("long")
            .alias("tokens_shipped"),
            F.coalesce("content_sum", F.lit(0))
            .cast("long")
            .alias("content_sum"),
            F.coalesce("n_revisits", F.lit(0))
            .cast("long")
            .alias("n_revisits"),
            F.coalesce("n_revisit_resolved", F.lit(0))
            .cast("long")
            .alias("n_revisit_resolved"),
            F.coalesce("revisit_saved_bytes", F.lit(0))
            .cast("long")
            .alias("revisit_saved_bytes"),
            F.coalesce("pack_contexts", F.lit(0))
            .cast("long")
            .alias("pack_contexts"),
            F.coalesce("pack_padding", F.lit(0))
            .cast("long")
            .alias("pack_padding"),
            F.coalesce("pack_fragments", F.lit(0))
            .cast("long")
            .alias("pack_fragments"),
        )
    )
