"""Unrolled-CTE SQL generation for the merge-based tokenizer trainers.

Shared by the per-trainer *_token_stats oracles (operators/bpe.py,
byte_bpe.py, wordpiece.py) and the tokenizer_suite digest
(operators/tokenizer_evidence.py — see ITS module docstring for the
full correctness argument: double-space symbol representation, argmax
determinism, fixpoint early stop, MATERIALIZED-or-exponential, and the
serving equivalences). This module holds only the generators and
fragments so the trainer modules can register oracle-backed singles
without importing the suite (which imports them)."""

from __future__ import annotations

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



def bpe_stats_sql() -> str:
    """Oracle for bpe_token_stats: the training chain + per-source
    compression stats (serving == final training sequences)."""
    return (
        "WITH "
        + _chain_sql("bpe_", _BPE_FREQ, _BPE_SEQ0, 40, _concat_fuse)
        + f""", bpe_doc AS (
    SELECT d.source, d.doc_id, count(*) AS n_words,
           sum(len(f.syms)) AS n_tokens
    FROM ({_DOC_WORDS}) d JOIN bpe_final f USING (word)
    GROUP BY d.source, d.doc_id
)
SELECT s.source, CAST(s.n_docs AS BIGINT) AS n_docs,
       CAST(coalesce(t.w, 0) AS BIGINT) AS total_words,
       CAST(coalesce(t.tk, 0) AS BIGINT) AS total_tokens,
       round(t.tk / CAST(t.w AS DOUBLE), 6) AS tokens_per_word
FROM (SELECT source, count(*) AS n_docs FROM documents GROUP BY source) s
LEFT JOIN (SELECT source, sum(n_words) AS w, sum(n_tokens) AS tk
           FROM bpe_doc GROUP BY source) t USING (source)
"""
    )


def bbpe_stats_sql() -> str:
    """Oracle for byte_bpe_token_stats (bytes-per-token compression)."""
    return (
        "WITH "
        + _chain_sql("bb_", _BBPE_FREQ, _BBPE_SEQ0, 60, _concat_fuse)
        + f""", bb_docwords AS (
    SELECT source, doc_id,
           CASE WHEN k.range = 0 THEN t.ws[1]
                ELSE chr(288) || t.ws[k.range + 1] END AS word
    FROM (SELECT source, doc_id, {_DUCK_TOK} AS ws FROM documents) t
    CROSS JOIN range(0, {_MAX_WORDS}) k
    WHERE k.range < len(t.ws)
), bb_doc AS (
    SELECT d.source, d.doc_id, sum(length(d.word)) AS n_bytes,
           sum(len(f.syms)) AS n_tokens
    FROM bb_docwords d JOIN bb_final f USING (word)
    GROUP BY d.source, d.doc_id
)
SELECT s.source, CAST(s.n_docs AS BIGINT) AS n_docs,
       CAST(coalesce(t.nb, 0) AS BIGINT) AS total_bytes,
       CAST(coalesce(t.tk, 0) AS BIGINT) AS total_tokens,
       round(t.nb / CAST(t.tk AS DOUBLE), 6) AS bytes_per_token
FROM (SELECT source, count(*) AS n_docs FROM documents GROUP BY source) s
LEFT JOIN (SELECT source, sum(n_bytes) AS nb, sum(n_tokens) AS tk
           FROM bb_doc GROUP BY source) t USING (source)
"""
    )


def wp_stats_sql() -> str:
    """Oracle for wordpiece_token_stats: training + MaxMatch serving."""
    return (
        "WITH "
        + _chain_sql("wp_", _BPE_FREQ, _WP_SEQ0, 40, _wp_fuse,
                     scorer="likelihood")
        + _wp_maxmatch_sql()
        + f""", wp_doc AS (
    SELECT d.source, d.doc_id, count(*) AS n_words,
           sum(e.n_toks) AS n_tokens, sum(e.n_unk) AS n_unk
    FROM ({_DOC_WORDS}) d JOIN wp_enc e USING (word)
    GROUP BY d.source, d.doc_id
)
SELECT s.source, CAST(s.n_docs AS BIGINT) AS n_docs,
       CAST(coalesce(t.w, 0) AS BIGINT) AS total_words,
       CAST(coalesce(t.tk, 0) AS BIGINT) AS total_tokens,
       CAST(coalesce(t.u, 0) AS BIGINT) AS total_unk,
       round(t.tk / CAST(t.w AS DOUBLE), 6) AS tokens_per_word
FROM (SELECT source, count(*) AS n_docs FROM documents GROUP BY source) s
LEFT JOIN (SELECT source, sum(n_words) AS w, sum(n_tokens) AS tk,
                  sum(n_unk) AS u
           FROM wp_doc GROUP BY source) t USING (source)
"""
    )
