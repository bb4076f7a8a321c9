"""Driver-hashed evidence for the tokenizer family (r8 verdict missing
item #1: "the tokenizer family has no driver-hashed row").

The r8 verdict suggested literalizing a planted corpus' merge sequence
into the oracle. This module goes further: the TRAINERS THEMSELVES are
SQL-expressible with a fixed merge budget, so the oracle re-derives
BPE, byte-level BPE, and WordPiece training from first principles
instead of transcribing their output:

  representation  each symbol owns its delimiters — a word's state is
                  the concatenation of ' <sym> ' per symbol, so adjacent
                  symbols are separated by a DOUBLE space and
                  replace(seq, ' a  b ', ' ab ') is EXACTLY the greedy
                  leftmost merge fold (operators/bpe._MERGE_FOLD): each
                  match consumes its own boundary spaces, never the
                  neighbor's, and SQL replace scans left-to-right
                  non-overlapping — the same recurrence. Symbols never
                  contain spaces (chars of [a-z]+ words, '##' prefixes,
                  the Ġ space-byte symbol, '</w>'), so the encoding is
                  unambiguous.
  argmax          BPE/byte-BPE: count desc then (a, b) lexicographic —
                  binary string order, identical in both engines.
                  WordPiece: likelihood n_ab/(n_a*n_b) desc — ONE IEEE
                  division of exact integers (< 2^53), bit-identical in
                  both engines, no accumulation; ties fall to the same
                  lexicographic order.
  early stop      a no-op state is a fixpoint: if no pair reaches
                  min_pair_count the CASE keeps seq unchanged, and every
                  later step re-derives the same sub-threshold argmax —
                  exactly the trainers' break.
  unrolling       merge steps as generated m{{i}}/s{{i}} CTEs (the
                  binary_dedup_suite / linkgraph move). Every s{{i}} is
                  MATERIALIZED: s{{i}} is referenced by both p{{i+1}} and
                  s{{i+1}}, so inlining would be exponential.
  serving         BPE/byte-BPE train on the distinct-(pre-)token table
                  of the SAME corpus they encode, and the encoders
                  replay the same merges in the same rank order with
                  the same greedy fold — a word's final training
                  sequence IS its encoding. WordPiece serves by greedy
                  longest-match-first against the trained vocab, which
                  is NOT the training state — the oracle runs MaxMatch
                  as its own unrolled chain over a precomputed
                  (word, start, end) in-vocab substring table.

The suite key absorbs corpus_token_totals (now pytest-only) so the
driver roster stays at its 50-key cap: ``corpus:*`` legs carry that
query's exact values; ``bpe:*`` / ``bbpe:*`` / ``wp:*`` legs add each
trainer's merge table, served vocabulary, and the per-source
compression stats of the three *_token_stats queries.

Scale shape: each training cost is one corpus-sized word-frequency
shuffle plus merge rounds over the DISTINCT-(pre-)token table
(vocabulary-sized — tiny at any corpus scale); encoding rides the scan
Arrow-batched. The suite localCheckpoints each encoded table once and
reuses it across leg families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cc_mapreducer_spark.operators.bpe import encode_bpe, train_bpe
from cc_mapreducer_spark.operators.byte_bpe import (
    encode_byte_bpe,
    train_byte_bpe,
)
from cc_mapreducer_spark.operators.text_analysis import (
    _CORPUS_TOKENS_SQL,
    corpus_token_totals,
)
from cc_mapreducer_spark.operators.wordpiece import encode_wordpiece
from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table, spread

_DUCK_TOK = (
    "list_filter(string_split(regexp_replace(lower(text), '[^a-z]+', ' ', "
    "'g'), ' '), w -> w != '')"
)

# longest corpus word + markers: split-length bound for pair extraction
# (an undershoot truncates pair extraction and fails the hash loudly,
# never silently)
_MAX_SYMS = 24
# per-doc word-count bound for the positional unnest (docs here are
# <=300 words; a real corpus would raise the literal)
_MAX_WORDS = 512


def _chain_sql(
    prefix: str,
    freq_sql: str,
    seq0_expr: str,
    n_merges: int,
    fuse_sql,
    scorer: str = "count",
    min_pair: int = 2,
    max_syms: int = _MAX_SYMS,
) -> str:
    """One trainer's CTE chain, every name ``prefix``-qualified so
    several trainers coexist inside a single WITH clause. Emits:
    {p}freq, {p}s0..{p}s{n}, {p}m1..{p}m{n}, {p}merges, {p}final.
    ``fuse_sql(a, b)`` renders the fused-symbol expression from two
    scalar-subquery strings. ``scorer``: 'count' (Sennrich argmax) or
    'likelihood' (WordPiece n_ab/(n_a*n_b))."""
    p = prefix
    out = [f"""{p}freq AS MATERIALIZED (
{freq_sql}
), {p}s0 AS MATERIALIZED (
    SELECT word, cnt, {seq0_expr} AS seq FROM {p}freq
)"""]
    for i in range(1, n_merges + 1):
        prev = f"{p}s{i - 1}"
        pair_src = f"""(
        SELECT t.cnt, t.syms[k.range + 1] AS a, t.syms[k.range + 2] AS b
        FROM (SELECT cnt, string_split(trim(seq, ' '), '  ') AS syms
              FROM {prev}) t
        CROSS JOIN range(0, {max_syms}) k
        WHERE k.range + 2 <= len(t.syms)
    )"""
        if scorer == "count":
            m_body = f"""
    SELECT a, b, sum(cnt) AS n FROM {pair_src}
    GROUP BY a, b HAVING sum(cnt) >= {min_pair}
    ORDER BY n DESC, a, b LIMIT 1"""
        else:
            out.append(f""", {p}c{i} AS (
    SELECT sym, sum(cnt) AS n_s FROM (
        SELECT cnt, unnest(string_split(trim(seq, ' '), '  ')) AS sym
        FROM {prev}
    ) GROUP BY sym
)""")
            m_body = f"""
    SELECT pr.a, pr.b, pr.n,
           pr.n / CAST(ca.n_s * cb.n_s AS DOUBLE) AS score
    FROM (SELECT a, b, sum(cnt) AS n FROM {pair_src}
          GROUP BY a, b HAVING sum(cnt) >= {min_pair}) pr
    JOIN {p}c{i} ca ON ca.sym = pr.a
    JOIN {p}c{i} cb ON cb.sym = pr.b
    ORDER BY score DESC, pr.a, pr.b LIMIT 1"""
        fused = fuse_sql(f"{p}m{i}")
        out.append(f""", {p}m{i} AS MATERIALIZED ({m_body}
), {p}s{i} AS MATERIALIZED (
    SELECT word, cnt,
           CASE WHEN (SELECT count(*) FROM {p}m{i}) = 0 THEN seq
                ELSE replace(seq,
                     ' ' || (SELECT a FROM {p}m{i}) || '  '
                         || (SELECT b FROM {p}m{i}) || ' ',
                     ' ' || {fused} || ' ')
           END AS seq
    FROM {prev}
)""")
    score_col = ", score" if scorer == "likelihood" else ""
    merge_union = "\n    UNION ALL\n".join(
        f"    SELECT {i} AS step, a, b, n{score_col} FROM {p}m{i}"
        for i in range(1, n_merges + 1)
    )
    out.append(f""", {p}merges AS (
{merge_union}
), {p}final AS MATERIALIZED (
    SELECT word, cnt, string_split(trim(seq, ' '), '  ') AS syms
    FROM {p}s{n_merges}
)""")
    return "".join(out)


def _concat_fuse(m: str) -> str:
    return f"(SELECT a FROM {m}) || (SELECT b FROM {m})"


def _wp_fuse(m: str) -> str:
    # fusing drops the right side's continuation prefix
    # (wordpiece._merged_symbol)
    return (
        f"(SELECT a FROM {m}) || (SELECT CASE WHEN b LIKE '##%' "
        f"THEN b[3:] ELSE b END FROM {m})"
    )


# --- the three trainers' chains -------------------------------------------

_BPE_FREQ = f"""    SELECT word, count(*) AS cnt FROM (
        SELECT unnest({_DUCK_TOK}) AS word FROM documents
    ) GROUP BY word"""

_BPE_SEQ0 = (
    "' ' || array_to_string(string_split(word, ''), '  ') || '  </w> '"
)

# byte-level: pre-tokens carry the leading space of every non-initial
# word; GPT-2's byte->unicode bijection maps a-z to themselves and the
# space byte (0x20) to chr(288) 'Ġ', so the mapped pre-token string is
# just an optional Ġ plus the word
_BBPE_FREQ = f"""    SELECT word, count(*) AS cnt FROM (
        SELECT CASE WHEN k.range = 0 THEN t.ws[1]
                    ELSE chr(288) || t.ws[k.range + 1] END AS word
        FROM (SELECT {_DUCK_TOK} AS ws FROM documents) t
        CROSS JOIN range(0, {_MAX_WORDS}) k
        WHERE k.range < len(t.ws)
    ) GROUP BY word"""

_BBPE_SEQ0 = "' ' || array_to_string(string_split(word, ''), '  ') || ' '"

_WP_SEQ0 = (
    "' ' || substr(word, 1, 1) || CASE WHEN length(word) > 1 THEN "
    "'  ##' || array_to_string(string_split(substr(word, 2), ''), '  ##') "
    "ELSE '' END || ' '"
)


def _wp_maxmatch_sql(steps: int = _MAX_SYMS) -> str:
    """Greedy longest-match-first over the trained vocab as an unrolled
    chain (wordpiece.encode_word_wordpiece): precompute every in-vocab
    (word, start, longest end) via a substring x vocab join, then walk
    <=``steps`` matches per word (each consumes >=1 char). A position
    with no match fails the WHOLE word to [UNK] (n_tokens 1, n_unk 1),
    as does length > 100 (BERT's MAX_WORD_CHARS guard)."""
    out = [f""", wp_vocab AS MATERIALIZED (
    SELECT DISTINCT sym FROM (
        SELECT unnest(string_split(trim(seq, ' '), '  ')) AS sym
        FROM wp_s0
        UNION ALL
        SELECT a || CASE WHEN b LIKE '##%' THEN b[3:] ELSE b END
        FROM wp_merges
    )
), wp_best AS MATERIALIZED (
    -- longest in-vocab match per (word, start): MaxMatch's inner loop
    SELECT word, st, max(en) AS en FROM (
        SELECT f.word, s.range + 1 AS st, e.range + 1 AS en
        FROM wp_freq f
        CROSS JOIN range(0, {_MAX_SYMS}) s
        CROSS JOIN range(0, {_MAX_SYMS}) e
        WHERE s.range <= e.range AND e.range < length(f.word)
          AND (CASE WHEN s.range = 0 THEN '' ELSE '##' END
               || substr(f.word, CAST(s.range + 1 AS INT),
                         CAST(e.range - s.range + 1 AS INT)))
              IN (SELECT sym FROM wp_vocab)
    ) GROUP BY word, st
), wp_w0 AS MATERIALIZED (
    SELECT word, 1 AS pos, 0 AS n_toks,
           length(word) > 100 AS failed
    FROM wp_freq
)"""]
    for i in range(1, steps + 1):
        prev = f"wp_w{i - 1}"
        out.append(f""", wp_w{i} AS MATERIALIZED (
    SELECT w.word,
           CASE WHEN w.failed OR w.pos > length(w.word) THEN w.pos
                WHEN b.en IS NULL THEN w.pos
                ELSE CAST(b.en + 1 AS INT) END AS pos,
           CASE WHEN w.failed OR w.pos > length(w.word) THEN w.n_toks
                WHEN b.en IS NULL THEN w.n_toks
                ELSE w.n_toks + 1 END AS n_toks,
           w.failed OR (w.pos <= length(w.word) AND b.en IS NULL)
               AS failed
    FROM {prev} w
    LEFT JOIN wp_best b ON b.word = w.word AND b.st = w.pos
)""")
    out.append(f""", wp_enc AS MATERIALIZED (
    SELECT word,
           CASE WHEN failed THEN 1 ELSE n_toks END AS n_toks,
           CASE WHEN failed THEN 1 ELSE 0 END AS n_unk
    FROM wp_w{steps}
)""")
    return "".join(out)


# --- per-source stats over the served encodings ----------------------------

_DOC_WORDS = f"""    SELECT source, doc_id, unnest({_DUCK_TOK}) AS word
    FROM documents"""

_STATS_TAIL = f""", bpe_doc AS (
    SELECT d.source, d.doc_id, count(*) AS n_words,
           sum(len(f.syms)) AS n_tokens
    FROM ({_DOC_WORDS}) d JOIN bpe_final f USING (word)
    GROUP BY d.source, d.doc_id
), bpe_stats AS (
    SELECT s.source, CAST(s.n_docs AS BIGINT) AS n_docs,
           CAST(coalesce(t.w, 0) AS BIGINT) AS total_words,
           CAST(coalesce(t.tk, 0) AS BIGINT) AS total_tokens,
           round(t.tk / CAST(t.w AS DOUBLE), 6) AS tokens_per_word
    FROM (SELECT source, count(*) AS n_docs FROM documents
          GROUP BY source) s
    LEFT JOIN (SELECT source, sum(n_words) AS w, sum(n_tokens) AS tk
               FROM bpe_doc GROUP BY source) t USING (source)
), bb_docwords AS (
    SELECT source, doc_id,
           CASE WHEN k.range = 0 THEN t.ws[1]
                ELSE chr(288) || t.ws[k.range + 1] END AS word
    FROM (SELECT source, doc_id, {_DUCK_TOK} AS ws FROM documents) t
    CROSS JOIN range(0, {_MAX_WORDS}) k
    WHERE k.range < len(t.ws)
), bb_doc AS (
    SELECT d.source, d.doc_id,
           sum(length(d.word)) AS n_bytes,
           sum(len(f.syms)) AS n_tokens
    FROM bb_docwords d JOIN bb_final f USING (word)
    GROUP BY d.source, d.doc_id
), bb_stats AS (
    SELECT s.source, CAST(s.n_docs AS BIGINT) AS n_docs,
           CAST(coalesce(t.nb, 0) AS BIGINT) AS total_bytes,
           CAST(coalesce(t.tk, 0) AS BIGINT) AS total_tokens,
           round(t.nb / CAST(t.tk AS DOUBLE), 6) AS bytes_per_token
    FROM (SELECT source, count(*) AS n_docs FROM documents
          GROUP BY source) s
    LEFT JOIN (SELECT source, sum(n_bytes) AS nb, sum(n_tokens) AS tk
               FROM bb_doc GROUP BY source) t USING (source)
), wp_doc AS (
    SELECT d.source, d.doc_id, count(*) AS n_words,
           sum(e.n_toks) AS n_tokens, sum(e.n_unk) AS n_unk
    FROM ({_DOC_WORDS}) d JOIN wp_enc e USING (word)
    GROUP BY d.source, d.doc_id
), wp_stats AS (
    SELECT s.source, CAST(s.n_docs AS BIGINT) AS n_docs,
           CAST(coalesce(t.w, 0) AS BIGINT) AS total_words,
           CAST(coalesce(t.tk, 0) AS BIGINT) AS total_tokens,
           CAST(coalesce(t.u, 0) AS BIGINT) AS total_unk,
           round(t.tk / CAST(t.w AS DOUBLE), 6) AS tokens_per_word
    FROM (SELECT source, count(*) AS n_docs FROM documents
          GROUP BY source) s
    LEFT JOIN (SELECT source, sum(n_words) AS w, sum(n_tokens) AS tk,
                      sum(n_unk) AS u
               FROM wp_doc GROUP BY source) t USING (source)
)"""

_LEGS_SQL = """
SELECT 'corpus:docs' AS component, lang AS entity,
       CAST(n_docs AS DOUBLE) AS value FROM ({corpus})
UNION ALL
SELECT 'corpus:ws', lang, CAST(total_ws_tokens AS DOUBLE) FROM ({corpus})
UNION ALL
SELECT 'corpus:chars', lang, CAST(total_chars AS DOUBLE) FROM ({corpus})
UNION ALL
SELECT 'bpe:merge', step || '|' || a || '|' || b, CAST(n AS DOUBLE)
FROM bpe_merges
UNION ALL
SELECT 'bpe:vocab', sym, CAST(sum(cnt) AS DOUBLE) FROM (
    SELECT cnt, unnest(syms) AS sym FROM bpe_final
) GROUP BY sym
UNION ALL
SELECT 'bpe:docs', source, CAST(n_docs AS DOUBLE) FROM bpe_stats
UNION ALL
SELECT 'bpe:words', source, CAST(total_words AS DOUBLE) FROM bpe_stats
UNION ALL
SELECT 'bpe:tokens', source, CAST(total_tokens AS DOUBLE) FROM bpe_stats
UNION ALL
SELECT 'bpe:tpw', source, tokens_per_word FROM bpe_stats
UNION ALL
SELECT 'bbpe:merge', step || '|' || a || '|' || b, CAST(n AS DOUBLE)
FROM bb_merges
UNION ALL
SELECT 'bbpe:vocab', sym, CAST(sum(cnt) AS DOUBLE) FROM (
    SELECT cnt, unnest(syms) AS sym FROM bb_final
) GROUP BY sym
UNION ALL
SELECT 'bbpe:docs', source, CAST(n_docs AS DOUBLE) FROM bb_stats
UNION ALL
SELECT 'bbpe:bytes', source, CAST(total_bytes AS DOUBLE) FROM bb_stats
UNION ALL
SELECT 'bbpe:tokens', source, CAST(total_tokens AS DOUBLE) FROM bb_stats
UNION ALL
SELECT 'bbpe:bpt', source, bytes_per_token FROM bb_stats
UNION ALL
SELECT 'wp:merge', step || '|' || a || '|' || b, score FROM wp_merges
UNION ALL
SELECT 'wp:vocab', sym, 1.0 FROM wp_vocab
UNION ALL
SELECT 'wp:docs', source, CAST(n_docs AS DOUBLE) FROM wp_stats
UNION ALL
SELECT 'wp:words', source, CAST(total_words AS DOUBLE) FROM wp_stats
UNION ALL
SELECT 'wp:tokens', source, CAST(total_tokens AS DOUBLE) FROM wp_stats
UNION ALL
SELECT 'wp:unk', source, CAST(total_unk AS DOUBLE) FROM wp_stats
UNION ALL
SELECT 'wp:tpw', source, tokens_per_word FROM wp_stats
"""

_TOKENIZER_SUITE_SQL = (
    "WITH "
    + _chain_sql("bpe_", _BPE_FREQ, _BPE_SEQ0, 40, _concat_fuse)
    + ", "
    + _chain_sql("bb_", _BBPE_FREQ, _BBPE_SEQ0, 60, _concat_fuse)
    + ", "
    + _chain_sql("wp_", _BPE_FREQ, _WP_SEQ0, 40, _wp_fuse,
                 scorer="likelihood")
    + _wp_maxmatch_sql()
    + _STATS_TAIL
    + _LEGS_SQL.format(corpus=_CORPUS_TOKENS_SQL)
)


@register("tokenizer_suite", oracle=_TOKENIZER_SUITE_SQL)
def tokenizer_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver digest of the tokenizer family: the corpus token totals
    (absorbed corpus_token_totals legs) plus, for EACH of the three
    merge-based trainers (BPE, byte-level BPE, WordPiece), the full
    merge table (rank, pair, count-or-likelihood — any drift in a
    single merge decision fails the hash), the served vocabulary, and
    the per-source compression stats of the *_token_stats queries. The
    oracle re-derives all three TRAININGS plus WordPiece's MaxMatch
    serving (module docstring); unigram-LM (EM float accumulation, not
    cross-engine-exact) stays replica-pinned in pytest."""

    def leg(df: DataFrame, component: str, entity, value) -> DataFrame:
        return df.select(
            F.lit(component).alias("component"),
            entity.cast("string").alias("entity"),
            value.cast("double").alias("value"),
        )

    docs = spread(load_table(spark, sf_dir, "documents"))
    corpus = corpus_token_totals(spark, sf_dir)
    src_docs = docs.select("doc_id", "source")

    def vocab_of(enc: DataFrame) -> DataFrame:
        return (
            enc.select(F.explode("tokens").alias("sym"))
            .groupBy("sym")
            .agg(F.count("*").cast("long").alias("n"))
        )

    def merge_df(merges, val_type: str) -> DataFrame:
        return spark.createDataFrame(
            [(i + 1, a, b, v) for i, (a, b, v) in enumerate(merges)],
            f"step int, a string, b string, v {val_type}",
        )

    # BPE
    bpe_merges = train_bpe(docs)
    bpe_enc = encode_bpe(docs, bpe_merges).localCheckpoint()
    bpe_stats = src_docs.join(bpe_enc, "doc_id").groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("total_words"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(
            F.sum("n_tokens") / F.sum("n_words").cast("double"), 6
        ).alias("tokens_per_word"),
    )
    # byte-level BPE
    bb_merges = train_byte_bpe(docs)
    bb_enc = encode_byte_bpe(docs, bb_merges).localCheckpoint()
    bb_stats = src_docs.join(bb_enc, "doc_id").groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(
            F.sum("n_bytes") / F.sum("n_tokens").cast("double"), 6
        ).alias("bytes_per_token"),
    )
    # WordPiece: ONE training supplies both the merge table and the
    # vocab the MaxMatch serving encodes with (the saved-artifact
    # save/load seam is exercised by wordpiece_token_stats; re-training
    # through _model_path_for here would double the 40-round cost)
    from cc_mapreducer_spark.operators.wordpiece import train_wordpiece

    wp_merges, wp_vocab = train_wordpiece(docs)
    wp_enc = encode_wordpiece(docs, wp_vocab).localCheckpoint()
    wp_stats = src_docs.join(wp_enc, "doc_id").groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("total_words"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("n_unk").cast("bigint").alias("total_unk"),
        F.round(
            F.sum("n_tokens") / F.sum("n_words").cast("double"), 6
        ).alias("tokens_per_word"),
    )
    wp_vocab_df = spark.createDataFrame(
        [(v,) for v in wp_vocab], "sym string"
    )

    parts = [
        leg(corpus, "corpus:docs", F.col("lang"), F.col("n_docs")),
        leg(corpus, "corpus:ws", F.col("lang"), F.col("total_ws_tokens")),
        leg(corpus, "corpus:chars", F.col("lang"), F.col("total_chars")),
        leg(merge_df(bpe_merges, "long"), "bpe:merge",
            F.concat_ws("|", "step", "a", "b"), F.col("v")),
        leg(vocab_of(bpe_enc), "bpe:vocab", F.col("sym"), F.col("n")),
        leg(bpe_stats, "bpe:docs", F.col("source"), F.col("n_docs")),
        leg(bpe_stats, "bpe:words", F.col("source"), F.col("total_words")),
        leg(bpe_stats, "bpe:tokens", F.col("source"),
            F.col("total_tokens")),
        leg(bpe_stats, "bpe:tpw", F.col("source"),
            F.col("tokens_per_word")),
        leg(merge_df(bb_merges, "long"), "bbpe:merge",
            F.concat_ws("|", "step", "a", "b"), F.col("v")),
        leg(vocab_of(bb_enc), "bbpe:vocab", F.col("sym"), F.col("n")),
        leg(bb_stats, "bbpe:docs", F.col("source"), F.col("n_docs")),
        leg(bb_stats, "bbpe:bytes", F.col("source"), F.col("total_bytes")),
        leg(bb_stats, "bbpe:tokens", F.col("source"),
            F.col("total_tokens")),
        leg(bb_stats, "bbpe:bpt", F.col("source"),
            F.col("bytes_per_token")),
        leg(merge_df(wp_merges, "double"), "wp:merge",
            F.concat_ws("|", "step", "a", "b"), F.col("v")),
        leg(wp_vocab_df, "wp:vocab", F.col("sym"), F.lit(1.0)),
        leg(wp_stats, "wp:docs", F.col("source"), F.col("n_docs")),
        leg(wp_stats, "wp:words", F.col("source"), F.col("total_words")),
        leg(wp_stats, "wp:tokens", F.col("source"),
            F.col("total_tokens")),
        leg(wp_stats, "wp:unk", F.col("source"), F.col("total_unk")),
        leg(wp_stats, "wp:tpw", F.col("source"),
            F.col("tokens_per_word")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
