"""Training-corpus filter operators over `documents` (round-3
additions to the LLM-pipeline tier): Gopher-style quality gates,
n-gram repetition scoring, PII redaction, and context-window chunk
planning.

All four are pure JVM built-ins (regex/split/sequence arithmetic) —
no Python in the hot path — and fully oracle-backed: every metric is
exact integer counting plus a final long/long IEEE division, so Spark
and DuckDB agree bit-for-bit. The quality thresholds follow the
published Gopher rules (Rae et al. 2021, arXiv:2112.11446 §A1.1) and
C4 heuristics (Raffel et al. 2020) — public filter recipes,
re-expressed relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.sources.tables import load_table

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_LONGNUM_RE = r"\d{4,}"


@query(
    "text_gopher_quality",
    oracle=r"""
    WITH m AS (
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                 AS n_words,
               length(regexp_replace(text, '\s', '', 'g')) AS n_chars,
               CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS BIGINT)
                 AS n_symbols,
               CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                        w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT)
                 AS n_alpha_words
        FROM documents
    )
    SELECT doc_id, n_words,
           (n_chars / n_words) AS mean_word_len,
           (n_symbols / n_words) AS symbol_ratio,
           (n_alpha_words / n_words) AS alpha_word_frac,
           (n_words >= 10 AND n_words <= 100000
            AND (n_chars / n_words) >= 2.0 AND (n_chars / n_words) <= 12.0
            AND (n_symbols / n_words) <= 0.1
            AND (n_alpha_words / n_words) >= 0.7) AS passes_gopher
    FROM m
    """,
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality gate: word count bounds, mean
    word length window, symbol-to-word ratio, alphabetic-word
    fraction, and the combined pass/fail verdict. Every ratio is
    exact-long / exact-long, so the doubles (and the boolean cuts)
    are bit-identical across engines and partitionings."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.trim("text"), r"\s+")
    n_words = F.size(words).cast("long")
    n_chars = F.length(F.regexp_replace("text", r"\s", "")).cast("long")
    n_symbols = F.regexp_count("text", F.lit(r"#|\.\.\.")).cast("long")
    n_alpha = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    ).cast("long")
    mean_wl = n_chars / n_words
    sym_ratio = n_symbols / n_words
    alpha_frac = n_alpha / n_words
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_word_frac"),
        (
            (n_words >= 10)
            & (n_words <= 100000)
            & (mean_wl >= 2.0)
            & (mean_wl <= 12.0)
            & (sym_ratio <= 0.1)
            & (alpha_frac >= 0.7)
        ).alias("passes_gopher"),
    )


@query(
    "text_repetition_filter",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               generate_subscripts(regexp_split_to_array(lower(trim(text)), '\s+'), 1)
                 AS i,
               unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
        FROM documents
    ), grams AS (
        SELECT a.doc_id, a.tok || ' ' || b.tok AS gram
        FROM toks a JOIN toks b
          ON a.doc_id = b.doc_id AND b.i = a.i + 1
    ), counts AS (
        SELECT doc_id, gram, COUNT(*) AS c
        FROM grams GROUP BY doc_id, gram
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_grams,
           CAST(MAX(c) AS BIGINT) AS top_gram_count,
           (MAX(c) / SUM(c)) AS top_gram_frac,
           ((MAX(c) / SUM(c)) > 0.18) AS repetitive
    FROM counts GROUP BY doc_id
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition scoring (the Gopher top-2-gram rule): fraction of a
    document's 2-grams occupied by its single most frequent 2-gram;
    > 0.18 flags boilerplate/spam. Shape at scale: one explode to
    gram grain + one (doc, gram) count + one per-doc max — two
    map-side-combinable aggregations keyed by doc, no self-join (the
    adjacent token is picked up with element_at over the same array,
    not by re-joining the exploded table)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim("text")), r"\s+")
    grams = F.expr(
        "transform(sequence(1, size(toks) - 1), "
        "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
    )
    per_gram = (
        d.select("doc_id", toks.alias("toks"))
        .where(F.size("toks") >= 2)
        .select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("c"))
    )
    return per_gram.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_grams"),
        F.max("c").cast("long").alias("top_gram_count"),
        (F.max("c") / F.sum("c")).alias("top_gram_frac"),
        ((F.max("c") / F.sum("c")) > 0.18).alias("repetitive"),
    )


@query(
    "text_pii_redact",
    oracle=rf"""
    WITH aug AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com ref ' || CAST(doc_id * 7919 AS VARCHAR)
                 AS text
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(text, '{_LONGNUM_RE}')) AS BIGINT)
             AS n_long_numbers,
           md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_LONGNUM_RE}', '<NUM>', 'g')) AS redacted_fp
    FROM aug
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass: redact email addresses and long digit runs
    (account-number shaped), emit match counts plus the md5 of the
    redacted text so the full rewritten content is hash-pinned without
    shipping it to the scoreboard. Patterns restricted to syntax with
    identical RE2/Java semantics. The synthetic corpus contains no
    digits at all, so the entry first appends a deterministic
    doc_id-derived contact line on BOTH engines — otherwise the oracle
    would "pass" on a redactor that never fires (the repo's
    0-row-match rule applied to 0 replacements)."""
    d = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ref "),
        (F.col("doc_id") * 7919).cast("string"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(aug, F.lit(_EMAIL_RE), F.lit("<EMAIL>")),
        F.lit(_LONGNUM_RE),
        F.lit("<NUM>"),
    )
    return d.select(
        "doc_id",
        F.regexp_count(aug, F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(aug, F.lit(_LONGNUM_RE))
        .cast("long")
        .alias("n_long_numbers"),
        F.md5(redacted).alias("redacted_fp"),
    )


@query(
    "text_chunk_tokens",
    oracle=r"""
    WITH m AS (
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                 AS n_tokens
        FROM documents
    ), fanout AS (
        SELECT doc_id, n_tokens,
               unnest(generate_series(0,
                   greatest(CAST(ceil((n_tokens - 16.0) / 48.0) AS INTEGER), 1) - 1))
                 AS chunk_idx
        FROM m
    )
    SELECT doc_id,
           CAST(chunk_idx AS INTEGER) AS chunk_idx,
           CAST(chunk_idx * 48 AS BIGINT) AS token_start,
           CAST(least(chunk_idx * 48 + 64, n_tokens) AS BIGINT) AS token_end
    FROM fanout
    """,
)
def text_chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunk plan: fan each document out to one row per
    64-token window with 16-token overlap (stride 48), clamped to the
    document's token count — the packing step before tokenization in a
    training pipeline. Same JVM sequence+posexplode shape as the audio
    chunker: the heavy per-chunk work downstream runs on chunk-grain
    rows, spreading one huge document across a cluster."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    n_chunks = F.greatest(
        F.ceil((F.col("n_tokens") - 16.0) / 48.0).cast("int"), F.lit(1)
    )
    start = F.col("chunk_idx").cast("long") * 48
    return (
        d.select("doc_id", n_tok.alias("n_tokens"))
        .select(
            "doc_id",
            "n_tokens",
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias(
                "chunk_idx", "_i"
            ),
        )
        .select(
            "doc_id",
            "chunk_idx",
            start.alias("token_start"),
            F.least(start + 64, F.col("n_tokens")).alias("token_end"),
        )
    )


@query(
    "text_salient_terms",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT)
                 AS doc_len,
               unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, doc_len, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks GROUP BY doc_id, doc_len, term
    ), dfreq AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ), nd AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
    ), scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
               (CAST(tf.tf AS DOUBLE) / tf.doc_len)
                 * (CAST(nd.n_docs AS DOUBLE) / dfreq.df) AS score,
               CAST(row_number() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY tf.tf DESC, dfreq.df ASC, tf.term ASC
               ) AS INTEGER) AS term_rank
        FROM tf JOIN dfreq USING (term) CROSS JOIN nd
    )
    SELECT doc_id, term_rank, term, tf, df, score
    FROM scored WHERE term_rank <= 3
    """,
)
def text_salient_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document: frequent in the doc,
    rare in the corpus (tf DESC, df ASC, term ASC — an all-integer
    ranking key, so the selected set is engine/partitioning-exact),
    plus a tf-idf-style double computed as two IEEE divisions in a
    fixed order (bit-identical cross-engine; no transcendental log,
    whose libm rounding differs between engines). The df table is
    vocabulary-sized and broadcast — the corpus-sized side never
    reshuffles for the join (`operators/corpus.py:salient_terms`)."""
    from tms_etl_spark.operators.corpus import salient_terms

    return salient_terms(load_table(spark, sf_dir, "documents"), k=3)


@query(
    "dedup_shared_ngrams",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS a
        FROM documents
    ), grams AS (
        SELECT DISTINCT doc_id, a[i] || ' ' || a[i+1] || ' ' || a[i+2] AS gram
        FROM toks, unnest(generate_series(1, len(a) - 2)) AS t(i)
        WHERE len(a) >= 3
    ), counts AS (
        SELECT gram, CAST(COUNT(*) AS BIGINT) AS gram_docs
        FROM grams GROUP BY gram
    )
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN c.gram_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared,
           (CAST(SUM(CASE WHEN c.gram_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
            / CAST(COUNT(*) AS BIGINT)) AS shared_frac,
           (SUM(CASE WHEN c.gram_docs >= 2 THEN 1 ELSE 0 END) > 0) AS has_shared
    FROM grams g JOIN counts c USING (gram)
    GROUP BY g.doc_id
    """,
)
def dedup_shared_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring overlap profile (Lee et al. 2021 dedup, in
    relational form): per document, how many of its distinct word
    3-grams appear in >=2 documents, and the fraction of the document
    that is corpus-shared. Grouping on the n-gram key replaces the
    suffix array — no doc-pair comparisons anywhere; the production
    default is 8-grams with a ``max_df`` boilerplate cut, the catalog
    entry uses 3-grams so the gate checks a non-vacuous overlap (the
    synthetic corpus shares no 8-gram often enough)
    (`operators/corpus.py:shared_ngram_stats`)."""
    from tms_etl_spark.operators.corpus import shared_ngram_stats

    return shared_ngram_stats(
        load_table(spark, sf_dir, "documents"), n=3, min_docs=2
    )
