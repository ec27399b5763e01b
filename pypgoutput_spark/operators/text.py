"""Text-analysis operators for large-scale training-data pipelines.

All four operators run over the ``documents`` table and are defined as
dual-dialect SQL (see functions/detsql.py): the Spark plan stays entirely
inside Catalyst/whole-stage-codegen (no Python UDFs — string/array
higher-order functions are JVM-side), and the DuckDB rendering of the
same expressions is the correctness oracle.

Scale: every operator is a narrow per-row map (no shuffle at all); at
100 TB it parallelizes trivially with the scan and benefits from parquet
column pruning (only ``doc_id``/``text`` are read).
"""

from __future__ import annotations

from pypgoutput_spark.functions.detsql import DUCKDB, SPARK, Dialect
from pypgoutput_spark.operators.qlib import run_sql

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")

#: deterministic marker vocabularies for the n-gram/marker language scorer
LANG_MARKERS = {
    "en": ("the", "a", "is", "and", "of"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "que", "es"),
    "fr": ("le", "la", "les", "et", "est"),
}
_BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def f_concat(prefix: str, expr: str) -> str:
    """concat('<prefix>', expr) — identical syntax in both dialects."""
    return f"concat('{prefix}', {expr})"


def _quality_exprs(d: Dialect) -> dict:
    """The per-row expressions the component queries are built from —
    shared with the corpus composites so the formulas cannot drift."""
    toks = d.split_ws("text")
    stop = d.array_lit(STOPWORDS)
    hits = d.array_len(d.array_filter(toks, f"x -> {d.array_contains(stop, 'x')}"))
    n_tok = d.array_len(toks)
    chars = d.array_transform(
        d.sequence("1", "length(text)"), "i -> ascii(substr(text, i, 1))"
    )
    fold = d.fold(
        chars, "CAST(0 AS BIGINT)", "(acc, x) -> (acc * 31 + x) % 1000000007"
    )
    lang_scores = {}
    for lang, markers in LANG_MARKERS.items():
        arr = d.array_lit(markers)
        lang_scores[lang] = d.array_len(
            d.array_filter(toks, f"x -> {d.array_contains(arr, 'x')}")
        )
    return {
        "toks": toks,
        "n_tok": n_tok,
        "hits": hits,
        "quality": (
            f"(CASE WHEN {n_tok} >= 10 THEN 1 ELSE 0 END"
            f" + CASE WHEN {hits} > 0 THEN 1 ELSE 0 END"
            f" + CASE WHEN length(text) BETWEEN 100 AND 10000 THEN 1 ELSE 0 END)"
        ),
        "fingerprint": fold,
        "lang_scores": lang_scores,
    }



def token_count_sql(d: Dialect) -> str:
    toks = d.split_ws("text")
    return f"""
SELECT doc_id,
  {d.array_len(toks)} AS n_tokens_ws,
  {d.regexp_count("text", _BPE_PATTERN)} AS n_tokens_bpe,
  length(text) AS n_chars_calc
FROM documents
WHERE n_chars > 0
""".strip()


def quality_score_sql(d: Dialect) -> str:
    e = _quality_exprs(d)
    n_tok, hits = e["n_tok"], e["hits"]
    n_punct = d.regexp_count("text", "[.,;:!?]")
    # ratios are single IEEE divisions of exact integers → deterministic
    return f"""
SELECT doc_id,
  {n_tok} AS n_tokens,
  {n_punct} AS n_punct,
  {hits} AS n_stopwords,
  CAST({n_punct} AS DOUBLE) / length(text) AS punct_ratio,
  CAST({hits} AS DOUBLE) / {n_tok} AS stopword_ratio,
  CAST(length(text) AS DOUBLE) / {n_tok} AS avg_token_len,
  {e['quality']} AS quality_score
FROM documents
WHERE n_chars > 0 AND {n_tok} > 0
""".strip()


def lang_id_sql(d: Dialect) -> str:
    scores = _quality_exprs(d)["lang_scores"]
    return f"""
WITH scored AS (
  SELECT doc_id, lang AS lang_true,
    {scores['en']} AS s_en, {scores['de']} AS s_de,
    {scores['es']} AS s_es, {scores['fr']} AS s_fr
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, lang_true, s_en, s_de, s_es, s_fr,
  CASE
    WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
    WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
    WHEN s_es >= s_fr THEN 'es'
    ELSE 'fr'
  END AS lang_pred
FROM scored
""".strip()


def fingerprint_sql(d: Dialect) -> str:
    """Polynomial rolling hash of the character stream, mod 1e9+7.

    Document fingerprinting for dedup/provenance: deterministic 30-bit
    content fingerprint; identical across engines because every step is
    exact integer arithmetic.
    """
    fold = _quality_exprs(d)["fingerprint"]
    return f"""
SELECT doc_id, length(text) AS n, {fold} AS fingerprint
FROM documents
WHERE n_chars > 0
""".strip()


#: Gopher table-A1 thresholds for the composite ``repetitive`` gate —
#: single source of truth for repetition_sql AND the training pipeline
REP_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.30,
    "dup_2gram_frac": 0.60,
    "dup_3gram_frac": 0.40,
}


def _ngram_exprs(d: Dialect, toks: str = "toks", n_toks: str = "n_toks"):
    """Word 2-gram / 3-gram arrays by index math over the token array (no
    explode). The lambda index is CAST to INT inside the lambda: when
    ``n_toks`` is BIGINT the sequence element is BIGINT, and Spark's
    element_at requires an INT index (no-op when already INT)."""
    g = lambda i: d.array_get(toks, f"CAST({i} AS INT)")  # noqa: E731
    bg = d.array_transform(
        d.sequence("1", f"{n_toks} - 1"),
        f"i -> concat({g('i')}, ' ', {g('i + 1')})",
    )
    tg = d.array_transform(
        d.sequence("1", f"{n_toks} - 2"),
        f"i -> concat({g('i')}, ' ', {g('i + 1')}, ' ', {g('i + 2')})",
    )
    return bg, tg


def _char_sum(d: Dialect, arr: str) -> str:
    # fold's accumulator type must match the element type (the DuckDB
    # rendering seeds list_reduce by prepending init) → length-transform
    # the string array to BIGINT before summing
    return d.fold(
        d.array_transform(arr, "x -> CAST(length(x) AS BIGINT)"),
        "CAST(0 AS BIGINT)", "(acc, x) -> acc + x",
    )


def _dup_frac(total: str, uniq: str) -> str:
    return (
        f"CASE WHEN {total} > 0 THEN CAST({total} - {uniq} AS DOUBLE)"
        f" / {total} ELSE CAST(0.0 AS DOUBLE) END"
    )


def _rep_count_fields(d: Dialect, lines: str = "lines", toks: str = "toks",
                      n_toks: str = "n_toks") -> dict:
    """The repetition count columns (compute ONCE in a CTE), keyed by
    their output name — shared by repetition_sql and the pipeline
    composite so the criteria cannot drift."""
    bg, tg = _ngram_exprs(d, toks, n_toks)
    return {
        "n_lines_u": d.array_len(d.array_distinct(lines)),
        "line_chars": _char_sum(d, lines),
        "line_chars_u": _char_sum(d, d.array_distinct(lines)),
        "n_bg": d.array_len(bg),
        "n_bg_u": d.array_len(d.array_distinct(bg)),
        "n_tg": d.array_len(tg),
        "n_tg_u": d.array_len(d.array_distinct(tg)),
    }


#: the four dup-fraction expressions over _rep_count_fields columns
_REP_FRACS = {
    "dup_line_frac": ("n_lines", "n_lines_u"),
    "dup_line_char_frac": ("line_chars", "line_chars_u"),
    "dup_2gram_frac": ("n_bg", "n_bg_u"),
    "dup_3gram_frac": ("n_tg", "n_tg_u"),
}


def _rep_gate() -> str:
    """The composite repetitive 0/1 gate over _rep_count_fields columns —
    ALL four Gopher criteria (not a subset)."""
    crit = " OR ".join(
        f"{_dup_frac(*_REP_FRACS[name])} > {thr}"
        for name, thr in REP_THRESHOLDS.items()
    )
    return f"CASE WHEN {crit} THEN 1 ELSE 0 END"


def repetition_sql(d: Dialect) -> str:
    """Gopher-style repetition filters (Rae et al. 2021, table A1):
    fraction of duplicate lines, fraction of characters in duplicate
    lines, and duplicate word-2gram/3gram fractions, plus the composite
    ``repetitive`` gate. Repetitious documents (boilerplate, scraped
    nav bars, degenerate generations) are a standard pre-training
    exclusion on top of cross-document dedup.

    Scale: per-row only — every array (lines, tokens, n-grams) is built
    and reduced with JVM higher-order functions inside the same codegen
    stage as the scan; zero shuffle, zero Python. n-gram construction is
    index math over the token array (no explode), so cost is O(len)
    per document and the operator parallelizes trivially with the scan.
    """
    lines = d.split_lines("text")
    toks = d.split_ws("text")
    counts = _rep_count_fields(d)
    count_cols = ",\n    ".join(f"{sql} AS {name}" for name, sql in counts.items())
    fracs = ",\n  ".join(
        f"{_dup_frac(*_REP_FRACS[name])} AS {name}" for name in REP_THRESHOLDS
    )
    return f"""
WITH x AS (
  SELECT doc_id, {lines} AS lines, {toks} AS toks
  FROM documents WHERE n_chars > 0
),
y AS (
  SELECT doc_id, lines, toks,
    {d.array_len('lines')} AS n_lines,
    {d.array_len('toks')} AS n_toks
  FROM x
),
z AS (
  SELECT doc_id, n_lines, n_toks,
    {count_cols}
  FROM y
)
SELECT doc_id, n_lines, n_toks,
  {fracs},
  {_rep_gate()} AS repetitive
FROM z
""".strip()


#: (name, regex, replacement) — applied in order; shared by the count
#: columns and the scrub so they cannot drift. Regexes restricted to
#: syntax with identical semantics in Java regex (Spark) and RE2
#: (DuckDB): classes, bounded quantifiers, \b, \d.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("hex_secret", r"\b[A-Fa-f0-9]{32,}\b", "<SECRET>"),
)


def pii_scrub_sql(d: Dialect) -> str:
    """PII / secret scrubbing — the redaction pass every public-corpus
    training pipeline runs before tokenization (emails, IP addresses,
    long hex tokens that are usually keys or hashes). Per-category match
    counts plus the scrubbed text, patterns applied in declaration order
    so overlapping matches resolve identically in both engines.

    Scale: per-row regex only — no shuffle; the scan reads just
    doc_id/text. At 100 TB this runs inside the ingest projection.
    """
    scrub = "text"
    for _name, pat, repl in PII_PATTERNS:
        scrub = d.regexp_replace_all(scrub, pat, repl)
    counts = ",\n  ".join(
        f"{d.regexp_count('text', pat)} AS n_{name}"
        for name, pat, _repl in PII_PATTERNS
    )
    total = " + ".join(f"n_{name}" for name, _p, _r in PII_PATTERNS)
    return f"""
WITH x AS (
  SELECT doc_id,
  {counts},
  {scrub} AS text_clean
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, n_email, n_ipv4, n_hex_secret,
  {total} AS n_pii,
  CASE WHEN {total} > 0 THEN 1 ELSE 0 END AS has_pii,
  length(text_clean) AS n_chars_clean,
  text_clean
FROM x
""".strip()


#: the suite's ONE train/val/test rule (per-cent thresholds on the
#: 'split:'-salted doc_id draw) — shared by corpus_sample, the training
#: pipeline, and the corpus_split manifest so no two operators can ever
#: assign a document to different splits
SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 90


def split_draw_expr(d: Dialect) -> str:
    """THE split draw: the 'split:'-salted md5 of doc_id, per-cent.
    Every operator that draws a split must call this — a second salt or
    modulus anywhere recreates cross-operator train/eval leakage."""
    return f"({d.md5_int(f_concat('split:', d.s('doc_id')))} % 100)"


def split_case_expr(d: Dialect, draw: str = "") -> str:
    """The canonical split assignment CASE over a % 100 draw expression
    (default: :func:`split_draw_expr`)."""
    if not draw:
        draw = split_draw_expr(d)
    return (
        f"CASE WHEN {draw} < {SPLIT_TRAIN_PCT} THEN 'train' "
        f"WHEN {draw} < {SPLIT_VAL_PCT} THEN 'val' ELSE 'test' END"
    )


def corpus_sample_sql(d: Dialect) -> str:
    """Deterministic stratified corpus sampling: an md5 draw on doc_id
    assigns every document a stable train/val/test split (80/10/10),
    and a second, independently-salted draw downsamples over-represented
    languages (here: keep 50% of 'en', 100% of the rest — the standard
    language-rebalancing pass). Hash-based, so the assignment is
    reproducible run-to-run, engine-to-engine, and under resharding —
    no RNG state, no ordering dependence.

    Scale: per-row hashing, zero shuffle; the split is a column, not a
    partition-by, so downstream writers can partition however they like.
    """
    doc_s = d.s("doc_id")
    draw_split = split_draw_expr(d)
    draw_keep = f"({d.md5_int(f_concat('sample:', doc_s))} % 100)"
    return f"""
WITH x AS (
  SELECT doc_id, source, lang,
    {draw_split} AS split_draw,
    {draw_keep} AS keep_draw
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, source, lang,
  {split_case_expr(d, 'split_draw')} AS split,
  CASE WHEN lang = 'en' THEN CASE WHEN keep_draw < 50 THEN 1 ELSE 0 END
       ELSE 1 END AS sampled
FROM x
""".strip()


#: production trainers use 2048-8192; the synthetic corpus carries ~1.3k
#: tokens per source, so the default exercises multiple sequences there
PACK_SEQ_LEN = 256


def pack_sequences_sql(d: Dialect, seq_len: int = PACK_SEQ_LEN) -> str:
    """Sequence packing: assign every document its position in the
    fixed-length training-sequence stream — the step that
    turns a filtered corpus into the contiguous token stream a trainer
    consumes. Deterministic: documents are laid out in doc_id order
    within each source, and a document's sequence id / offset derive
    from the running token total BEFORE it (greedy concat-and-chunk
    packing, the standard GPT-style recipe).

    Scale: ONE window shuffle, partitioned by source — each source's
    running sum is independent, so the layout parallelizes across
    sources and is reproducible under resharding. A source so large its
    partition dominates would be sub-sharded first (salt the partition
    key per N docs and offset seq_ids by a per-shard base — same
    arithmetic); the per-row math is identical.
    """
    toks = d.split_ws("text")
    n_tok = f"CAST({d.array_len(toks)} AS BIGINT)"
    return f"""
WITH t AS (
  SELECT doc_id, source, {n_tok} AS n_tok
  FROM documents WHERE n_chars > 0 AND {n_tok} > 0
),
c AS (
  SELECT doc_id, source, n_tok,
    CAST(SUM(n_tok) OVER (
      PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS BIGINT) AS cum_tokens
  FROM t
)
SELECT doc_id, source, n_tok, cum_tokens,
  {d.idiv('(cum_tokens - n_tok)', str(seq_len))} AS seq_id,
  (cum_tokens - n_tok) % {seq_len} AS seq_offset
FROM c
""".strip()


def corpus_training_ready_sql(d: Dialect) -> str:
    """The end-to-end training-data gate as ONE query: quality filter →
    language ID → exact content dedup (keep the smallest doc_id per
    content fingerprint) → the training-ready manifest.

    This is the composition a 100 TB pre-training pipeline runs nightly.
    All inputs are per-row, so the plan is ONE pass over ``text`` (no
    self-joins on doc_id — every expression computes in the same codegen
    stage as the scan) → ONE shuffle: the keep-smallest-doc_id rule is a
    ``min_by(col, doc_id)`` group on fingerprint (deterministic — doc_id
    is unique), partial-combining map-side, so the char-fold fingerprint
    is computed exactly once per row and no join or second scan exists.
    """
    e = _quality_exprs(d)
    s = e["lang_scores"]
    return f"""
WITH x AS (
  SELECT doc_id,
    {e['n_tok']} AS n_tokens,
    {e['quality']} AS quality_score,
    {e['fingerprint']} AS fingerprint,
    {s['en']} AS s_en, {s['de']} AS s_de, {s['es']} AS s_es, {s['fr']} AS s_fr
  FROM documents
  WHERE n_chars > 0 AND {e['n_tok']} > 0
),
gated AS (
  SELECT doc_id, n_tokens, quality_score, fingerprint,
    CASE
      WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
      WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
      WHEN s_es >= s_fr THEN 'es'
      ELSE 'fr'
    END AS lang_pred
  FROM x WHERE quality_score >= 2
)
SELECT min(doc_id) AS doc_id,
  min_by(lang_pred, doc_id) AS lang_pred,
  min_by(n_tokens, doc_id) AS n_tokens,
  min_by(quality_score, doc_id) AS quality_score,
  fingerprint
FROM gated GROUP BY fingerprint
""".strip()


def training_pipeline_sql(d: Dialect, seq_len: int = PACK_SEQ_LEN) -> str:
    """The WHOLE nightly training-data job as ONE query: quality gate +
    repetition gate + PII gate → exact content dedup (keep smallest
    doc_id per fingerprint) → deterministic stratified sampling →
    sequence packing. The composition every pre-training pipeline runs
    before tokenization, expressed so Catalyst plans it as ONE scan of
    ``text`` (all gates per-row, same codegen stage) → ONE dedup shuffle
    (min_by on fingerprint, map-side combining) → ONE window shuffle
    (the packing cumsum). Three stages total at any scale; every
    intermediate column is computed exactly once.

    The repetition gate is the FULL shared Gopher gate (_rep_gate over
    _rep_count_fields — dup-line, dup-line-char, 2-gram and 3-gram
    criteria), not a re-implementation, so it cannot drift from
    repetition_sql. Packing partitions by (source, split): each split's
    token stream is self-contained — seq_id/seq_offset are scoped per
    (source, split), so filtering one split yields contiguous sequences
    with no holes from other splits' documents.

    Plan shape: the CHEAP gates (quality, PII) stay in the per-row
    predicate, but the repetition gate is computed as a COLUMN in a
    projection chain and applied AFTER the dedup aggregate. Two reasons:
    (1) predicate pushdown substitutes referenced expressions with no
    cost guard, so a WHERE over the n-gram counts textually inlines the
    token array into every lambda body — ``element_at(split(text), i)``
    re-splits the document once PER ELEMENT, an O(len²) blowup measured
    at 3.8× the whole composite's wall (projection collapse, by
    contrast, keeps multiply-referenced non-cheap expressions
    materialized, so the column form computes each array once); and
    (2) the gate is content-pure while dedup groups by the content
    fingerprint, so identical-text duplicates share the gate verdict and
    filtering after the min_by aggregate is semantics-identical.
    """
    e = _quality_exprs(d)
    n_tok = f"CAST({e['n_tok']} AS BIGINT)"
    pii = " + ".join(
        d.regexp_count("text", pat) for _n, pat, _r in PII_PATTERNS
    )
    counts = _rep_count_fields(d, lines="lines", toks="toks", n_toks="n_tok")
    count_cols = ",\n    ".join(f"{sql} AS {name}" for name, sql in counts.items())
    doc_s = d.s("doc_id")
    draw_split = split_draw_expr(d)
    draw_keep = f"({d.md5_int(f_concat('sample:', doc_s))} % 100)"
    return f"""
WITH x AS (
  SELECT doc_id, source, lang, {d.split_lines('text')} AS lines,
    {e['toks']} AS toks, {n_tok} AS n_tok,
    {e['quality']} AS quality_score,
    {e['fingerprint']} AS fingerprint,
    ({pii}) AS n_pii
  FROM documents WHERE n_chars > 0 AND {e['n_tok']} > 0
),
r AS (
  SELECT doc_id, source, lang, n_tok, quality_score, fingerprint, n_pii,
    {d.array_len('lines')} AS n_lines,
    {count_cols}
  FROM x
),
g AS (
  SELECT doc_id, source, lang, n_tok, fingerprint,
    {_rep_gate()} AS repetitive
  FROM r
  WHERE quality_score >= 2 AND n_pii = 0
),
deduped AS (
  SELECT min(doc_id) AS doc_id,
    min_by(source, doc_id) AS source,
    min_by(lang, doc_id) AS lang,
    min_by(n_tok, doc_id) AS n_tok,
    min_by(repetitive, doc_id) AS repetitive,
    fingerprint
  FROM g GROUP BY fingerprint
),
survivors AS (
  SELECT doc_id, source, lang, n_tok, fingerprint
  FROM deduped WHERE repetitive = 0
),
sampled AS (
  SELECT doc_id, source, lang, n_tok,
    {split_case_expr(d, draw_split)} AS split
  FROM survivors
  WHERE CASE WHEN lang = 'en' THEN {draw_keep} < 50 ELSE TRUE END
),
packed AS (
  SELECT doc_id, source, lang, split, n_tok,
    CAST(SUM(n_tok) OVER (
      PARTITION BY source, split ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS BIGINT) AS cum_tokens
  FROM sampled
)
SELECT doc_id, source, lang, split, n_tok,
  {d.idiv('(cum_tokens - n_tok)', str(seq_len))} AS seq_id,
  (cum_tokens - n_tok) % {seq_len} AS seq_offset
FROM packed
""".strip()


def corpus_stats_sql(d: Dialect) -> str:
    """Per-(source, lang) corpus accounting: docs, token volume, distinct
    content fingerprints (the exact-dup rate) — ONE pass over ``text``
    (all inputs per-row, no joins) into one map-side-combining groupBy
    (count(DISTINCT) is Spark's standard two-phase expand). Sums are
    CAST to BIGINT in-dialect (DuckDB would otherwise widen to HUGEINT
    and break the schema match)."""
    e = _quality_exprs(d)
    toks = d.split_ws("text")
    return f"""
WITH x AS (
  SELECT source, lang,
    {d.array_len(toks)} AS n_tokens_ws,
    length(text) AS n_chars_calc,
    {e['fingerprint']} AS fingerprint
  FROM documents
  WHERE n_chars > 0
)
SELECT source, lang,
  count(*) AS n_docs,
  CAST(sum(n_tokens_ws) AS BIGINT) AS total_tokens,
  CAST(sum(n_chars_calc) AS BIGINT) AS total_chars,
  count(DISTINCT fingerprint) AS n_unique_contents
FROM x GROUP BY source, lang
""".strip()


#: grams rarer than this across the corpus are dropped — the output is
#: the corpus's *frequent-gram vocabulary*, bounded regardless of scale
NGRAM_MIN_COUNT = 5


def ngram_counts_sql(d: Dialect) -> str:
    """Corpus n-gram vocabulary: per (n, gram) total occurrences and
    document frequency for word 1/2/3-grams — the counting workload
    behind count-based LMs, contamination analysis, and tokenizer
    vocabulary induction.

    Scale shape (the canonical 100 TB map-reduce): ONE scan of ``text``
    (all three gram orders are tagged ``'<n> '``-prefixed strings in a
    single concatenated array, exploded by one generator — a UNION of
    per-order branches would re-read the corpus three times); the
    per-``(n, gram, doc_id)`` pre-aggregate collapses within-document
    repeats map-side BEFORE the exchange, so shuffled rows ∝ distinct
    grams per doc, not token count; the final ``(n, gram)`` roll-up
    then computes doc_freq as a plain count — never a COUNT(DISTINCT)
    over the full explode. The ``NGRAM_MIN_COUNT`` floor bounds the
    result like any frequency-pruned vocabulary build.
    """
    toks = d.split_ws("text")
    bg, tg = _ngram_exprs(d, toks="toks", n_toks="n_toks")
    tag = lambda n, arr: d.array_transform(arr, f"x -> concat('{n} ', x)")  # noqa: E731
    all_grams = d.array_concat(tag(1, "toks"), tag(2, bg), tag(3, tg))
    return f"""
WITH docs AS (
  SELECT doc_id, toks, {d.array_len('toks')} AS n_toks
  FROM (SELECT doc_id, {toks} AS toks FROM documents WHERE n_chars > 0)
),
tagged AS (
  SELECT doc_id, {d.unnest(all_grams)} AS tg FROM docs
),
grams AS (
  SELECT doc_id, CAST(substr(tg, 1, 1) AS INT) AS n, substr(tg, 3) AS gram
  FROM tagged
),
per_doc AS (
  SELECT n, gram, doc_id, count(*) AS c FROM grams GROUP BY n, gram, doc_id
)
SELECT n, gram,
  CAST(sum(c) AS BIGINT) AS total_count,
  count(*) AS doc_freq
FROM per_doc
GROUP BY n, gram
HAVING CAST(sum(c) AS BIGINT) >= {NGRAM_MIN_COUNT}
""".strip()


def bigram_familiarity_sql(d: Dialect) -> str:
    """Vocabulary-based document scoring: each document's mean
    integer-log2 corpus frequency of its word bigrams — the
    deterministic cousin of perplexity filtering (CCNet-style): low
    familiarity = rare phrasing (or noise), high = boilerplate — both
    tails are what a pre-training filter inspects.

    Determinism: the score is a SINGLE IEEE division of two exact
    integers; per-bigram weight is ``ilog2(freq)`` computed as
    binary-digit count, never float log (libm last-ulp drift at
    power-of-two boundaries would break Spark ≡ DuckDB).

    Scale: the vocabulary is built from a second, column-pruned pass
    (Catalyst does not dedupe scan subtrees across CTE references) and
    joined back. Deliberately NOT a ``count() OVER (PARTITION BY
    gram)`` window — that puts every occurrence of a hot gram ("of
    the") in ONE task, the classic skew hotspot. With the aggregated
    vocab broadcast (the plan here), the probe side never shuffles on
    gram at all; past broadcast size, AQE's skew-aware shuffled join
    takes over. The per-doc roll-up is the only other exchange.
    """
    toks = d.split_ws("text")
    bg, _tg = _ngram_exprs(d, toks="toks", n_toks="n_toks")
    w = d.ilog2("freq")
    return f"""
WITH docs AS (
  SELECT doc_id, toks, {d.array_len('toks')} AS n_toks
  FROM (SELECT doc_id, {toks} AS toks FROM documents WHERE n_chars > 0)
),
bigrams AS (
  SELECT doc_id, {d.unnest(bg)} AS gram FROM docs
),
vocab AS (
  SELECT gram, count(*) AS freq FROM bigrams GROUP BY gram
)
SELECT b.doc_id,
  count(*) AS n_bigrams,
  CAST(sum({w}) AS BIGINT) AS familiarity_sum,
  CAST(CAST(sum({w}) AS BIGINT) AS DOUBLE) / count(*) AS familiarity
FROM bigrams b JOIN vocab v ON b.gram = v.gram
GROUP BY b.doc_id
""".strip()


def _mixture_cte(d: Dialect) -> str:
    """The plan arithmetic BOTH mixture builders share — one definition,
    so the applied rates can never drift from the planned ones."""
    toks = d.split_ws("text")
    return f"""
per_source AS (
  SELECT source, count(*) AS n_docs,
    CAST(sum({d.array_len(toks)}) AS BIGINT) AS n_tokens
  FROM documents WHERE n_chars > 0 GROUP BY source
),
anchor AS (SELECT min(n_tokens) AS floor_tokens FROM per_source)""".strip()


def mixture_plan_sql(d: Dialect) -> str:
    """Data-mixture planning: given equal target shares across sources,
    the per-source sampling rate that realizes the mixture under the
    available token budget — the arithmetic behind Pile/Dolma-style
    mixture construction (downsample over-represented sources; a rate
    of 1.0 marks a source that must be upsampled/epoch-repeated to hit
    its share).

    The bottleneck source (smallest token count) anchors the budget:
    every source contributes ``bottleneck_tokens`` (equal shares), so
    ``rate = bottleneck / source_tokens`` ≤ 1 everywhere. Determinism:
    token counts are exact BIGINTs; the rate is one IEEE division and
    the planned count one multiply+floor of identical doubles — both
    exactly rounded, so Spark ≡ DuckDB bit-for-bit.

    Scale: one map-side-combining groupBy over the corpus scan, then
    arithmetic on an n_sources-row table. The plan feeds
    ``corpus_sample``-style md5-draw filters downstream.
    """
    return f"""
WITH {_mixture_cte(d)}
SELECT s.source, s.n_docs, s.n_tokens,
  CAST(a.floor_tokens AS DOUBLE) / s.n_tokens AS sample_rate,
  CAST(floor(CAST(a.floor_tokens AS DOUBLE) / s.n_tokens
       * CAST(s.n_tokens AS DOUBLE)) AS BIGINT) AS planned_tokens
FROM per_source s CROSS JOIN anchor a
""".strip()


def mixture_apply_sql(d: Dialect) -> str:
    """The mixture plan APPLIED: each source downsampled to its computed
    rate by a deterministic md5 draw over doc_id — plan and application
    in ONE query, so the realized per-source token counts can be read
    against the planned ones (they differ only by draw quantization).

    Scale: the rates table is n_sources rows (broadcast); the draw is a
    cheap md5 on the key column (never a higher-order-function predicate
    — those must not enter pushdown, see corpus_training_pipeline);
    second corpus pass applies the filter at the scan.
    """
    draw = d.md5_int(f_concat("mix:", d.s("doc_id")))
    return f"""
WITH {_mixture_cte(d)},
rates AS (
  SELECT s.source,
    CAST(floor(CAST(a.floor_tokens AS DOUBLE) / s.n_tokens * 1000000)
         AS BIGINT) AS keep_ppm
  FROM per_source s CROSS JOIN anchor a
)
SELECT d2.source,
  count(*) AS n_docs,
  CAST(sum({d.array_len(d.split_ws('d2.text'))}) AS BIGINT) AS sampled_tokens,
  min(r.keep_ppm) AS keep_ppm
FROM documents d2 JOIN rates r ON d2.source = r.source
WHERE d2.n_chars > 0 AND ({draw} % 1000000) < r.keep_ppm
GROUP BY d2.source
""".strip()


#: RAG-style chunking parameters: 64-token chunks, stride 48 (16-token
#: overlap) — single source of truth for chunk_sql and its tests
CHUNK_SIZE = 64
CHUNK_STRIDE = 48


def chunk_sql(d: Dialect, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE) -> str:
    """Fixed-size overlapping token chunks per document (RAG/pre-training
    sequence prep): every document becomes ``1 + ceil((n_toks - size) /
    stride)`` chunks of up to ``size`` whitespace tokens, consecutive
    chunks overlapping by ``size - stride`` tokens, each with its token
    span, text, and an md5-derived content fingerprint for downstream
    chunk-level dedup.

    Scale: one narrow per-row explode — no shuffle at all; row growth is
    bounded by ~n_toks/stride per document. At 100 TB it parallelizes
    with the scan (only doc_id/text are read) and the chunk fingerprint
    makes the output directly joinable against the dedup operators.
    The chunk count, spans, and fingerprints are exact integer/string
    computation — bit-identical in both engines.
    """
    toks = d.split_ws("text")
    n_chunks_m1 = (
        f"CASE WHEN n_toks <= {size} THEN CAST(0 AS BIGINT) "
        f"ELSE CAST({d.idiv(f'(n_toks - {size} + {stride} - 1)', str(stride))} AS BIGINT) END"
    )
    return f"""
WITH t AS (
  SELECT doc_id, {toks} AS toks,
    CAST({d.array_len(toks)} AS BIGINT) AS n_toks
  FROM documents WHERE n_chars > 0
),
idx AS (
  SELECT doc_id, toks, n_toks,
    {d.unnest(d.sequence("CAST(0 AS BIGINT)", n_chunks_m1))} AS chunk_idx
  FROM t WHERE n_toks > 0
),
spans AS (
  SELECT doc_id, toks, n_toks, CAST(chunk_idx AS BIGINT) AS chunk_idx,
    CAST(chunk_idx * {stride} + 1 AS BIGINT) AS tok_start,
    CAST(least(chunk_idx * {stride} + {size}, n_toks) AS BIGINT) AS tok_end
  FROM idx
),
chunks AS (
  SELECT doc_id, chunk_idx, tok_start, tok_end,
    {d.array_join(d.array_slice('toks', 'tok_start', 'tok_end'))} AS chunk_text
  FROM spans
)
SELECT doc_id, chunk_idx, tok_start, tok_end,
  CAST(tok_end - tok_start + 1 AS BIGINT) AS n_chunk_toks,
  chunk_text,
  {d.md5_int(f"concat({d.s('doc_id')}, ':', {d.s('chunk_idx')}, ':', chunk_text)")} AS chunk_fp
FROM chunks
""".strip()


def corpus_split_sql(d: Dialect) -> str:
    """Per-(source, split) train/val/test manifest — doc and token
    counts of THE suite's canonical split assignment
    (:func:`split_case_expr`, the identical 'split:'-salted draw and
    thresholds `corpus_sample` and the training pipeline apply), so the
    manifest can never disagree with the split the pipeline actually
    trains on.

    Scale: the assignment is a pure per-row map on the scan (doc-id-
    hash-seeded, so it is stable under repartition, backfill, and
    re-runs — the property that keeps eval sets leak-free as the corpus
    grows); the only shuffle is the tiny map-side-combining rollup.
    """
    toks = d.split_ws("text")
    return f"""
WITH assigned AS (
  SELECT source,
    CAST({d.array_len(toks)} AS BIGINT) AS n_toks,
    {split_case_expr(d)} AS split
  FROM documents WHERE n_chars > 0
)
SELECT source, split,
  count(*) AS n_docs,
  CAST(sum(n_toks) AS BIGINT) AS n_tokens
FROM assigned
GROUP BY source, split
""".strip()



def q_token_count(spark, sf_dir: str):
    return run_sql(spark, sf_dir, token_count_sql(SPARK), tables=("documents",))


def q_quality_score(spark, sf_dir: str):
    return run_sql(spark, sf_dir, quality_score_sql(SPARK), tables=("documents",))


def q_lang_id(spark, sf_dir: str):
    return run_sql(spark, sf_dir, lang_id_sql(SPARK), tables=("documents",))


def q_fingerprint(spark, sf_dir: str):
    return run_sql(spark, sf_dir, fingerprint_sql(SPARK), tables=("documents",), spread=("documents",))


def q_repetition(spark, sf_dir: str):
    return run_sql(spark, sf_dir, repetition_sql(SPARK), tables=("documents",), spread=("documents",))


def q_pii_scrub(spark, sf_dir: str):
    return run_sql(spark, sf_dir, pii_scrub_sql(SPARK), tables=("documents",), spread=("documents",))


def q_corpus_sample(spark, sf_dir: str):
    return run_sql(spark, sf_dir, corpus_sample_sql(SPARK), tables=("documents",))


def q_pack_sequences(spark, sf_dir: str):
    # no spread: the window's own hash-partition by source is the only
    # Exchange this plan needs — a pre-repartition would just be a
    # second, immediately-discarded shuffle
    return run_sql(spark, sf_dir, pack_sequences_sql(SPARK), tables=("documents",))


def q_corpus_training_ready(spark, sf_dir: str):
    return run_sql(spark, sf_dir, corpus_training_ready_sql(SPARK), tables=("documents",), spread=("documents",))


def q_training_pipeline(spark, sf_dir: str):
    return run_sql(spark, sf_dir, training_pipeline_sql(SPARK), tables=("documents",))


def q_ngram_counts(spark, sf_dir: str):
    return run_sql(spark, sf_dir, ngram_counts_sql(SPARK), tables=("documents",), spread=("documents",))


def q_mixture_plan(spark, sf_dir: str):
    return run_sql(spark, sf_dir, mixture_plan_sql(SPARK), tables=("documents",), spread=("documents",))


def q_mixture_apply(spark, sf_dir: str):
    return run_sql(spark, sf_dir, mixture_apply_sql(SPARK), tables=("documents",), spread=("documents",))


def q_bigram_familiarity(spark, sf_dir: str):
    return run_sql(spark, sf_dir, bigram_familiarity_sql(SPARK), tables=("documents",), spread=("documents",))


def q_corpus_stats(spark, sf_dir: str):
    return run_sql(spark, sf_dir, corpus_stats_sql(SPARK), tables=("documents",), spread=("documents",))


def q_chunk(spark, sf_dir: str):
    return run_sql(spark, sf_dir, chunk_sql(SPARK), tables=("documents",), spread=("documents",))


def q_corpus_split(spark, sf_dir: str):
    return run_sql(spark, sf_dir, corpus_split_sql(SPARK), tables=("documents",), spread=("documents",))


QUERIES = {
    "text_token_count": (q_token_count, token_count_sql(DUCKDB)),
    "text_quality_score": (q_quality_score, quality_score_sql(DUCKDB)),
    "text_lang_id": (q_lang_id, lang_id_sql(DUCKDB)),
    "text_fingerprint": (q_fingerprint, fingerprint_sql(DUCKDB)),
    "text_repetition": (q_repetition, repetition_sql(DUCKDB)),
    "text_pii_scrub": (q_pii_scrub, pii_scrub_sql(DUCKDB)),
    "corpus_sample": (q_corpus_sample, corpus_sample_sql(DUCKDB)),
    "corpus_pack_sequences": (q_pack_sequences, pack_sequences_sql(DUCKDB)),
    "corpus_training_pipeline": (q_training_pipeline, training_pipeline_sql(DUCKDB)),
    "corpus_training_ready": (q_corpus_training_ready, corpus_training_ready_sql(DUCKDB)),
    "corpus_stats": (q_corpus_stats, corpus_stats_sql(DUCKDB)),
    "corpus_ngram_counts": (q_ngram_counts, ngram_counts_sql(DUCKDB)),
    "text_bigram_familiarity": (q_bigram_familiarity, bigram_familiarity_sql(DUCKDB)),
    "corpus_mixture_plan": (q_mixture_plan, mixture_plan_sql(DUCKDB)),
    "corpus_mixture_apply": (q_mixture_apply, mixture_apply_sql(DUCKDB)),
    "corpus_chunk": (q_chunk, chunk_sql(DUCKDB)),
    "corpus_split": (q_corpus_split, corpus_split_sql(DUCKDB)),
}
