"""Text-analysis & dedup queries over the `documents` table
(training-data-pipeline surface; BASELINE.json north star).

Oracle-checkable entries use only regex/string built-ins with
identical semantics in Spark (Java regex) and DuckDB (RE2); sketch
operators (MinHash, SimHash) are engine-specific and run rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.operators.dedup import (
    exact_dedup_groups,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash,
)
from tms_etl_spark.sources.tables import load_table

STOPWORDS = "the|a|of|and|to|in|is|on|for|with"


@query(
    "text_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
           length(text) AS text_len
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting — the base unit-of-work metric for
    corpus sizing. JVM-side split; no UDF."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("text_len"),
    )


@query(
    "text_quality_score",
    oracle=rf"""
    SELECT doc_id,
           length(regexp_replace(text, '[^.!?,;]', '', 'g')) AS n_punct,
           CAST(len(regexp_extract_all(lower(text), '\b({STOPWORDS})\b')) AS BIGINT)
             AS n_stopwords,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
           (CAST(len(regexp_extract_all(lower(text), '\b({STOPWORDS})\b')) AS BIGINT)
            / CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT))
             AS stopword_ratio
    FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: punctuation count, stopword count &
    ratio — the length/punct/stopword family of corpus filters."""
    d = load_table(spark, sf_dir, "documents")
    n_stop = F.regexp_count(F.lower("text"), F.lit(rf"\b({STOPWORDS})\b")).cast("long")
    n_tok = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    return d.select(
        "doc_id",
        F.length(F.regexp_replace("text", r"[^.!?,;]", "")).cast("long").alias(
            "n_punct"
        ),
        n_stop.alias("n_stopwords"),
        n_tok.alias("n_tokens"),
        (n_stop / n_tok).alias("stopword_ratio"),
    )


@query(
    "text_lang_id",
    oracle=r"""
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN len(regexp_extract_all(lower(text), '\b(the|and|of)\b'))
                     >= len(regexp_extract_all(lower(text), '\b(scan|merge|hash)\b'))
                THEN 'en' ELSE 'tech' END AS predicted_lang
    FROM documents
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID by stopword-hit heuristic (n-gram-lexicon style):
    score per candidate lexicon, argmax wins."""
    d = load_table(spark, sf_dir, "documents")
    en = F.regexp_count(F.lower("text"), F.lit(r"\b(the|and|of)\b"))
    tech = F.regexp_count(F.lower("text"), F.lit(r"\b(scan|merge|hash)\b"))
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.when(en >= tech, "en").otherwise("tech").alias("predicted_lang"),
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id, md5(text) AS fp, substring(md5(text), 1, 8) AS fp_short
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprinting (digest-based; the rolling-hash variant
    is `dedup_simhash`'s rows-only cousin)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("fp"),
        F.substring(F.md5("text"), 1, 8).alias("fp_short"),
    )


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS fp, min(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: one shuffle on the content digest. At
    100 TB this is the cheap first pass before any near-dup work."""
    d = load_table(spark, sf_dir, "documents")
    return exact_dedup_groups(d)


@query(
    "dedup_unigram_jaccard",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')))
                 AS tok
        FROM documents WHERE doc_id < 1000
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id
    ), common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM toks a JOIN toks b USING (tok)
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           (n_common / (sa.n_tok + sb.n_tok - n_common)) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE (n_common / (sa.n_tok + sb.n_tok - n_common)) >= 0.8
    """,
)
def dedup_unigram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by unigram Jaccard ≥ 0.8 — the fully relational
    form (explode → token self-join → set arithmetic). Bounded to a
    1000-doc slice: without a df-cut the token self-join is quadratic
    in docs-per-hot-token (measured: hangs at sf0.1's 5000 docs on
    this vocabulary). The unbounded, scale-correct form is
    `dedup_jaccard_dfcut`."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 1000)
    return jaccard_pairs(d, threshold=0.8)


@query("dedup_minhash_lsh")  # sketch: engine-specific hashes → rows-only
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs (32 hashes, 8 bands, 3-shingles).
    Rows-only check: xxhash64-seeded min-hashing has no DuckDB twin.
    Verified against brute-force Jaccard in tests/test_dedup.py."""
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d)


@query("dedup_simhash")  # sketch: engine-specific hashes → rows-only
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash signatures per doc (bitwise built-ins only)."""
    d = load_table(spark, sf_dir, "documents")
    return simhash(d)


@query(
    "dedup_jaccard_dfcut",
    oracle=r"""
    WITH toks0 AS (
        SELECT doc_id,
               unnest(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')))
                 AS tok
        FROM documents
    ), hot AS (
        SELECT tok FROM toks0 GROUP BY tok
        HAVING COUNT(*) > 0.5 * (SELECT COUNT(*) FROM documents)
    ), toks AS (
        SELECT t.doc_id, t.tok FROM toks0 t
        WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.tok = t.tok)
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id
    ), common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM toks a JOIN toks b USING (tok)
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           (n_common / (sa.n_tok + sb.n_tok - n_common)) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE (n_common / (sa.n_tok + sb.n_tok - n_common)) >= 0.5
    """,
)
def dedup_jaccard_dfcut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup Jaccard with a document-frequency stopword cut
    (max_df=0.5): tokens in more than half the corpus are excluded
    from intersections AND set sizes. This is the scale-correct form —
    the df-cut bounds the token self-join's hottest key, which is
    what makes relational Jaccard viable on a 100 TB corpus."""
    d = load_table(spark, sf_dir, "documents")
    return jaccard_pairs(d, threshold=0.5, max_df=0.5)


@query(
    "split_train_test",
    oracle="""
    SELECT doc_id,
           CASE WHEN u < 0.8 THEN 'train'
                WHEN u < 0.9 THEN 'validation'
                ELSE 'test' END AS split
    FROM (
        SELECT doc_id,
               CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) / 4294967295.0 AS u
        FROM documents) t
    """,
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/validation/test assignment from an id
    digest (operators.storage.hash_split): reproducible across runs,
    partitionings, and engines — a doc keeps its split forever, which
    fraction-based sampling cannot guarantee."""
    from tms_etl_spark.operators.storage import hash_split

    d = load_table(spark, sf_dir, "documents")
    return hash_split(d, "doc_id").select("doc_id", "split")


@query(
    "dedup_clusters",
    oracle=r"""
    WITH RECURSIVE toks0 AS (
        SELECT doc_id,
               unnest(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')))
                 AS tok
        FROM documents
    ), hot AS (
        SELECT tok FROM toks0 GROUP BY tok
        HAVING COUNT(*) > 0.5 * (SELECT COUNT(*) FROM documents)
    ), toks AS (
        SELECT t.doc_id, t.tok FROM toks0 t
        WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.tok = t.tok)
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id
    ), common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM toks a JOIN toks b USING (tok)
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ), edges AS (
        SELECT doc_a, doc_b FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE (n_common / (sa.n_tok + sb.n_tok - n_common)) >= 0.5
    ), sym AS (
        SELECT doc_a AS a, doc_b AS b FROM edges
        UNION
        SELECT doc_b AS a, doc_a AS b FROM edges
    ), reach(src, dst) AS (
        SELECT a, b FROM sym
        UNION
        SELECT reach.src, s.b FROM reach JOIN sym s ON reach.dst = s.a
    )
    SELECT src AS doc_id,
           least(src, MIN(dst)) AS keeper_doc_id,
           (least(src, MIN(dst)) <> src) AS is_duplicate
    FROM reach GROUP BY src
    """,
)
def dedup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup PAIRS → duplicate CLUSTERS via iterative label
    propagation (connected components): the final step of the dedup
    ladder — one keeper per cluster, everything else droppable.
    Driver orchestrates the loop; each round is one join + one min-agg
    with pointer jumping (operators.graph), O(log diameter) rounds.

    The edge source here is the DETERMINISTIC df-cut Jaccard pair set
    (same pairs as `dedup_jaccard_dfcut`), which makes the clustering
    fully oracle-checkable: DuckDB recomputes the components via a
    recursive transitive closure and the driver hash-compares
    (doc_id, keeper, is_duplicate) row for row. The MinHash/LSH edge
    source (engine-specific sketches) drives the same operator in
    tests/test_graph.py."""
    from tms_etl_spark.operators.dedup import jaccard_pairs
    from tms_etl_spark.operators.graph import dedup_clusters

    d = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(d, threshold=0.5, max_df=0.5)
    return dedup_clusters(pairs)


@query(
    "text_bpe_token_estimate",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
                '[A-Za-z]+|[0-9]|[^A-Za-z0-9[:space:]]')) AS BIGINT)
               AS n_bpe_pieces,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT)
               AS n_word_runs
    FROM documents
    """,
)
def text_bpe_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token estimation (SURVEY 'token counting: whitespace +
    a BPE-ish regex'): pre-tokenizer pieces in the GPT-2 style —
    letter runs, single digits, punctuation marks — counted with a
    portable character-class regex (same semantics in Java regex and
    DuckDB's RE2). A letter run averages ~1.3 BPE tokens and digits
    split per-char, so piece count is the standard cheap proxy for
    tokenizer cost at corpus scale. JVM regexp_extract_all — no UDF."""
    d = load_table(spark, sf_dir, "documents")
    pieces = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(pieces), F.lit(0)))
        .cast("long")
        .alias("n_bpe_pieces"),
        F.size(F.regexp_extract_all("text", F.lit("[A-Za-z]+"), F.lit(0)))
        .cast("long")
        .alias("n_word_runs"),
    )


_WINNOW_K = 8  # k-gram length (chars)
_WINNOW_W = 4  # window width (k-grams per window)
_WINNOW_B = 1000  # analyzed prefix (chars) — bounds the explode


@query(
    "text_winnow_fingerprint",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, substr(text, 1, {_WINNOW_B}) AS t
        FROM documents WHERE length(text) >= {_WINNOW_K}
    ), g AS (
        SELECT doc_id, i,
               md5(substr(t, CAST(i AS INTEGER), {_WINNOW_K})) AS h
        FROM t, LATERAL unnest(generate_series(1,
                 length(t) - {_WINNOW_K} + 1)) AS u(i)
    ), w AS (
        SELECT doc_id,
               min(h) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN CURRENT ROW
                            AND {_WINNOW_W - 1} FOLLOWING) AS mh
        FROM g
    ), sel AS (
        SELECT DISTINCT doc_id, mh FROM w
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_fp,
           md5(string_agg(mh, '' ORDER BY mh)) AS fp_digest
    FROM sel GROUP BY doc_id
    """,
)
def text_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 — the rolling-hash fingerprinting SURVEY lists): hash
    every k-gram, keep the minimum hash of each sliding window of w
    consecutive k-grams, emit the per-doc selected-set size and a
    digest of the sorted selection. Guarantees any shared substring
    ≥ w+k-1 chars contributes a shared fingerprint — the
    plagiarism/near-dup primitive that whole-doc digests can't give.

    Cross-engine exactness: the "rolling hash" is md5 HEX compared
    LEXICOGRAPHICALLY (identical in Spark and DuckDB), and both
    sides include the trailing short windows — the oracle as ROWS
    BETWEEN CURRENT AND w-1 FOLLOWING, the Spark side as
    slice(hashes, j, w) minima computed ARRAY-SIDE in the row
    (transform + array_min, no window, no per-gram shuffle — see
    operators/dedup.py:_winnow_min_array); slice past the end
    truncates exactly like the window frame does. Digest = md5 of
    the sorted distinct concatenation on both sides. All JVM
    built-ins."""
    from tms_etl_spark.operators.dedup import winnow_digest

    d = load_table(spark, sf_dir, "documents")
    return winnow_digest(d, k=_WINNOW_K, w=_WINNOW_W, prefix=_WINNOW_B)


@query(
    "ngram_lm_counts",
    oracle=r"""
    WITH toks AS (
        SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS t
        FROM documents
        WHERE len(regexp_split_to_array(lower(trim(text)), '\s+')) >= 2
    ), g AS (
        SELECT t[CAST(i AS INTEGER)] AS context,
               t[CAST(i AS INTEGER) + 1] AS word
        FROM toks, LATERAL unnest(generate_series(1, len(t) - 1)) AS u(i)
    ), pair AS (
        SELECT context, word, CAST(COUNT(*) AS BIGINT) AS ngram_count
        FROM g GROUP BY context, word
    ), ctx AS (
        SELECT context, CAST(SUM(ngram_count) AS BIGINT) AS context_count
        FROM pair GROUP BY context
    ), cont AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS continuation_count
        FROM pair GROUP BY word
    )
    SELECT p.context, p.word, p.ngram_count, c.context_count,
           k.continuation_count
    FROM pair p JOIN ctx c USING (context) JOIN cont k USING (word)
    """,
)
def ngram_lm_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM count tables (operators.corpus.ngram_lm_counts): the
    Kneser-Ney sufficient statistics — (context, word) counts, context
    totals, continuation counts — all exact longs. The vocabulary-
    building / LM-scoring side of a training-data pipeline."""
    from tms_etl_spark.operators.corpus import ngram_lm_counts

    d = load_table(spark, sf_dir, "documents")
    return ngram_lm_counts(d, n=2)


@query(
    "subword_vocab_topk",
    oracle=r"""
    WITH words AS (
        SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
        FROM documents
    ), grams AS (
        SELECT substr(w, CAST(i AS INTEGER), 3) AS gram
        FROM (SELECT w FROM words WHERE w <> '') s,
             LATERAL unnest(generate_series(1, greatest(length(w) - 2, 1)))
               AS u(i)
    ), counts AS (
        SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt FROM grams GROUP BY gram
    ), ranked AS (
        SELECT gram, cnt,
               row_number() OVER (ORDER BY cnt DESC, gram ASC) AS vocab_rank
        FROM counts
    )
    SELECT CAST(vocab_rank AS INTEGER) AS vocab_rank, gram, cnt
    FROM ranked WHERE vocab_rank <= 100
    """,
)
def subword_vocab_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 character-trigram subword vocabulary candidates
    (operators.corpus.subword_vocab_topk) with the BPE short-word
    convention and a deterministic (cnt DESC, gram ASC) tie-break."""
    from tms_etl_spark.operators.corpus import subword_vocab_topk

    d = load_table(spark, sf_dir, "documents")
    return subword_vocab_topk(d, k=100, n=3)


@query(
    "dedup_sorted_neighborhood",
    oracle=r"""
    WITH r AS (
        SELECT doc_id,
               row_number() OVER (
                   ORDER BY substring(lower(trim(text)), 1, 16), doc_id
               ) AS rn
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(b.rn - a.rn AS INTEGER) AS rank_gap
    FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 3
    """,
)
def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández/Stolfo): candidates =
    pairs within 3 ranks of each other when sorted by the 16-char
    text prefix (`operators/dedup.py:sorted_neighborhood_pairs`).
    The engine computes the global rank bucketed (prefix buckets +
    broadcast offsets — never one ORDER BY reducer); the oracle's
    single-reducer row_number defines the same ranks, so the pair
    sets hash-match."""
    from tms_etl_spark.operators.dedup import sorted_neighborhood_pairs

    d = load_table(spark, sf_dir, "documents")
    key = F.substring(F.lower(F.trim(F.col("text"))), 1, 16)
    return sorted_neighborhood_pairs(d, key, w=3)


@query(
    "dedup_fuzzy_pairs",
    oracle=r"""
    WITH r AS (
        SELECT doc_id,
               substring(lower(trim(text)), 1, 40) AS probe,
               row_number() OVER (
                   ORDER BY substring(lower(trim(text)), 1, 16), doc_id
               ) AS rn
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.probe, b.probe) AS INTEGER) AS edit_dist
    FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 3
    WHERE levenshtein(a.probe, b.probe) <= 10
    """,
)
def dedup_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end fuzzy dedup: sorted-neighborhood candidates scored
    with Levenshtein edit distance on a 40-char probe, keeping pairs
    within distance 10 — the record-linkage pipeline (block → compare
    → match) in two relational steps. Edit distance is an exact
    integer, so the whole result hash-matches cross-engine; the
    candidate set is the SNM window (linear), never all-pairs, and
    the O(len²) distance computation runs only on candidates."""
    from tms_etl_spark.operators.dedup import sorted_neighborhood_pairs

    d = load_table(spark, sf_dir, "documents")
    key = F.substring(F.lower(F.trim(F.col("text"))), 1, 16)
    probes = d.select(
        "doc_id",
        F.substring(F.lower(F.trim(F.col("text"))), 1, 40).alias("probe"),
    )
    cand = sorted_neighborhood_pairs(d, key, w=3).drop("rank_gap")
    pa = probes.select(
        F.col("doc_id").alias("doc_a"), F.col("probe").alias("__pa")
    )
    pb = probes.select(
        F.col("doc_id").alias("doc_b"), F.col("probe").alias("__pb")
    )
    return (
        cand.join(pa, "doc_a")
        .join(pb, "doc_b")
        .withColumn(
            "edit_dist", F.levenshtein("__pa", "__pb").cast("int")
        )
        .where(F.col("edit_dist") <= 10)
        .select("doc_a", "doc_b", "edit_dist")
    )


@query(
    "dedup_jaccard_prefix",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')))
                 AS tok
        FROM documents WHERE doc_id < 1000
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id
    ), common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM toks a JOIN toks b USING (tok)
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           (n_common / (sa.n_tok + sb.n_tok - n_common)) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE (n_common / (sa.n_tok + sb.n_tok - n_common)) >= 0.8
    """,
)
def dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard ≥ 0.8 pairs via prefix filtering
    (`operators/dedup.py:jaccard_prefix_join`, AllPairs WWW'07):
    same answer as `dedup_unigram_jaccard` (the oracle is the
    brute-force definition) but candidates join only on each doc's
    rarest-token prefix — the scale path that stays EXACT where
    MinHash trades recall. Same 1000-doc slice as the brute-force
    twin so the two entries are directly comparable."""
    from tms_etl_spark.operators.dedup import jaccard_prefix_join

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 1000)
    return jaccard_prefix_join(d, threshold=0.8)


@query(
    "dedup_containment_pairs",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               regexp_split_to_array(lower(trim(text)), '\s+') AS w
        FROM documents WHERE doc_id < 1000
    ), sh AS (
        SELECT DISTINCT doc_id,
               w[CAST(i AS INTEGER)] || ' ' ||
               w[CAST(i AS INTEGER) + 1] || ' ' ||
               w[CAST(i AS INTEGER) + 2] AS shingle
        FROM t, LATERAL unnest(generate_series(1, len(w) - 2)) AS u(i)
        WHERE len(w) >= 3
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), common AS (
        SELECT a.doc_id AS doc_sub, b.doc_id AS doc_super,
               COUNT(*) AS n_common
        FROM sh a JOIN sh b USING (shingle)
        WHERE a.doc_id <> b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_sub, doc_super,
           (n_common / sz.n_sh) AS containment
    FROM common JOIN sizes sz ON sz.doc_id = doc_sub
    WHERE (n_common / sz.n_sh) >= 0.8
    """,
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-dup: shingle containment C(sub -> super) =
    |shingles(sub) ∩ shingles(super)| / |shingles(sub)| — the
    quotation/subset detector Jaccard misses (a tweet quoted inside
    an article has tiny Jaccard but containment ~1). Word 3-gram
    shingles make the signal sharp where unigram overlap saturates
    on shared vocabulary (measured: unigram containment >=0.6 on
    this corpus matches 200k pairs; shingle containment >=0.8
    matches 50). Bounded to the same 1000-doc slice as the
    relational Jaccard twin (the scale path is LSH candidates +
    per-pair scoring); one exact-bigint ratio per pair."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 1000)
    t = d.select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("w")
    ).where(F.size("w") >= 3)
    sh = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 2), i -> "
                "concat_ws(' ', element_at(w, i), element_at(w, i + 1), "
                "element_at(w, i + 2)))"
            )
        ).alias("shingle"),
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_sub"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_super"), "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("doc_sub") != F.col("doc_super"))
        .groupBy("doc_sub", "doc_super")
        .agg(F.count("*").alias("n_common"))
    )
    sz = sizes.select(
        F.col("doc_id").alias("doc_sub"), F.col("n_sh").alias("n_sub")
    )
    out = common.join(sz, "doc_sub").select(
        "doc_sub",
        "doc_super",
        (F.col("n_common") / F.col("n_sub")).alias("containment"),
    )
    return out.where(F.col("containment") >= 0.8)


@query(
    "text_lm_coverage",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
        FROM documents
    ), g AS (
        SELECT doc_id,
               t[CAST(i AS INTEGER)] AS context,
               t[CAST(i AS INTEGER) + 1] AS word
        FROM toks, LATERAL unnest(generate_series(1, len(t) - 1)) AS u(i)
        WHERE len(t) >= 2
    ), freq AS (
        SELECT context, word
        FROM (SELECT context, word, COUNT(*) AS c FROM g GROUP BY 1, 2)
        WHERE c >= 5
    )
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CASE WHEN f.context IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS covered,
           CAST(SUM(CASE WHEN f.context IS NOT NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS coverage
    FROM g LEFT JOIN freq f
      ON g.context = f.context AND g.word = f.word
    GROUP BY g.doc_id
    """,
)
def text_lm_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-coverage quality score: the share of a document's bigrams
    that are FREQUENT in the corpus (count >= 5) — the
    integer-arithmetic stand-in for LM-perplexity filtering (a doc
    whose bigrams the corpus LM has barely seen scores low; CCNet
    uses a real LM, this uses the count table the engine already
    builds). Two passes over the bigram grain: one shuffle to the
    (context, word) type table for the frequent set, then the
    doc-gram stream joins that BOUNDED set once — at 100 TB the
    frequent set is vocabulary-sized (df-cut), so the join's build
    side stays compact while docs stream through. Counts exact,
    one final division per doc."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim("text")), r"\s+")
    gram_struct = (
        "transform(sequence(1, size(__toks) - 1), "
        "i -> struct(element_at(__toks, i) AS context, "
        "element_at(__toks, i + 1) AS word))"
    )
    grams = (
        d.select("doc_id", toks.alias("__toks"))
        .where(F.size("__toks") >= 2)
        .select("doc_id", F.explode(F.expr(gram_struct)).alias("g"))
        .select("doc_id", "g.context", "g.word")
    )
    freq = (
        grams.groupBy("context", "word")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= 5)
        .select("context", F.col("word").alias("word"), F.lit(1).alias("__hit"))
    )
    joined = grams.join(freq, ["context", "word"], "left")
    covered = F.sum(F.when(F.col("__hit").isNotNull(), 1).otherwise(0))
    return joined.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        covered.cast("long").alias("covered"),
        (covered.cast("double") / F.count("*").cast("double")).alias(
            "coverage"
        ),
    )


_CHUNK_W = 12  # words per dedup unit ("line" stand-in for the corpus)


@query(
    "text_line_dedup",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    chunks AS (
        SELECT doc_id, CAST(t.i AS BIGINT) AS chunk_idx,
               array_to_string(
                   list_slice(w, t.i * {_CHUNK_W} + 1,
                              t.i * {_CHUNK_W} + {_CHUNK_W}), ' ') AS chunk
        FROM docs,
             UNNEST(range(CAST(ceil(len(w) / {_CHUNK_W}.0) AS BIGINT)))
               AS t(i)
    ),
    keep AS (
        SELECT doc_id, chunk_idx, chunk FROM (
            SELECT doc_id, chunk_idx, chunk,
                   row_number() OVER (PARTITION BY chunk
                                      ORDER BY doc_id, chunk_idx) AS rn
            FROM chunks
        ) WHERE rn = 1
    )
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(k.chunk) AS BIGINT) AS n_kept,
           COALESCE(string_agg(k.chunk, ' ' ORDER BY c.chunk_idx), '')
             AS cleaned_text
    FROM chunks c
    LEFT JOIN keep k
      ON c.doc_id = k.doc_id AND c.chunk_idx = k.chunk_idx
     AND c.chunk = k.chunk
    GROUP BY c.doc_id
    """,
)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style exact line deduplication across the WHOLE corpus
    (Raffel et al. 2020 kept each 3-sentence span once corpus-wide;
    the corpus here has no newlines, so fixed 12-word chunks stand in
    for lines): every duplicated chunk survives only at its first
    occurrence (smallest doc_id, then chunk_idx), all other docs lose
    it, and docs are reassembled from their kept chunks.

    Scale shape: chunking is ARRAY-SIDE in the row (slice of the
    split — no per-word explode). First occurrence per chunk is a
    ``min(struct(doc_id, chunk_idx))`` AGGREGATION, deliberately not
    a ``row_number() over (partition by chunk)`` window: boilerplate
    corpora concentrate millions of copies on one chunk value, and a
    window cannot map-side combine a hot key while the aggregation
    collapses each partition's copies to one candidate before the
    exchange. The winner set then joins back on (doc_id, chunk_idx)
    — DOC-keyed, so the hot chunk value never becomes a join key.
    String-only arithmetic — exact cross-engine."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(words) / F.lit(_CHUNK_W)).cast("int")
    chunks = (
        d.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n_chunks - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.slice(words, i * _CHUNK_W + 1, _CHUNK_W),
                    ),
                )
            ).alias("chunk_idx", "chunk"),
        )
        .withColumn("chunk_idx", F.col("chunk_idx").cast("long"))
    )
    winners = (
        chunks.groupBy("chunk")
        .agg(F.min(F.struct("doc_id", "chunk_idx")).alias("__w"))
        .select(
            F.col("__w.doc_id").alias("doc_id"),
            F.col("__w.chunk_idx").alias("chunk_idx"),
            F.lit(1).alias("__kept"),
        )
    )
    marked = chunks.join(
        winners, ["doc_id", "chunk_idx"], "left"
    ).withColumn("rn", F.when(F.col("__kept") == 1, 1).otherwise(2))
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.coalesce(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("rn") == 1,
                                    F.struct("chunk_idx", "chunk"),
                                )
                            )
                        ),
                        lambda s: s["chunk"],
                    ),
                ),
                F.lit(""),
            ).alias("cleaned_text"),
        )
    )


_SPAN_K = 5  # anchor gram length (tokens)
_SPAN_MIN = 12  # minimum reported span (tokens)
_SPAN_DF = 16  # df-cut: grams in more docs than this are dropped


@query(
    "dedup_substring_spans",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), grams AS (
        SELECT doc_id, i, array_to_string(t[i:i+{_SPAN_K - 1}], ' ') AS g
        FROM toks, LATERAL (SELECT unnest(generate_series(
                 1, len(t) - {_SPAN_K - 1})) AS i) s(i)
        WHERE len(t) >= {_SPAN_K}
    ), keep AS (
        SELECT g FROM (
            SELECT g, COUNT(DISTINCT doc_id) AS df FROM grams GROUP BY g
        ) WHERE df BETWEEN 2 AND {_SPAN_DF}
    ), pg AS (
        SELECT doc_id, i, g FROM grams JOIN keep USING (g)
    ), anchors AS (
        SELECT a.doc_id AS da, b.doc_id AS db, a.i AS ia,
               a.i - b.i AS diag
        FROM pg a JOIN pg b ON a.g = b.g AND a.doc_id < b.doc_id
    ), isl AS (
        SELECT da, db, diag, ia,
               ia - row_number() OVER (
                   PARTITION BY da, db, diag ORDER BY ia) AS grp
        FROM anchors
    ), spans AS (
        SELECT da, db, COUNT(*) + {_SPAN_K - 1} AS span
        FROM isl GROUP BY da, db, diag, grp
    )
    SELECT da AS doc_a, db AS doc_b,
           CAST(MAX(span) AS BIGINT) AS max_span_tokens,
           CAST(COUNT(*) FILTER (WHERE span >= {_SPAN_MIN}) AS BIGINT)
               AS n_spans
    FROM spans GROUP BY 1, 2
    HAVING MAX(span) >= {_SPAN_MIN}
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-substring dedup (Lee et al., ACL 2022, the
    suffix-array family) re-expressed relationally: shared-token-
    k-gram anchors + gaps-and-islands on (pair, diagonal) recover
    every maximal shared token run >= {_SPAN_MIN} tokens. The sixth
    candidate-generation family in the dedup ladder (exact hash,
    Jaccard, MinHash/LSH, SimHash, winnowing, sorted-neighborhood —
    and now substring spans), and the one that catches partial
    copies the document-level sketches dilute. df-cut anchors bound
    the join; islands windows are per-(pair, diagonal), never
    corpus-wide."""
    from tms_etl_spark.operators.dedup import repeated_span_pairs

    d = load_table(spark, sf_dir, "documents")
    return repeated_span_pairs(
        d, k=_SPAN_K, min_span=_SPAN_MIN, max_df=_SPAN_DF
    )


@query(
    "text_bpe_encode",
    oracle=r"""
    WITH words AS (
        SELECT doc_id, unnest(list_filter(
            regexp_split_to_array(lower(trim(text)), '\s+'),
            w -> w <> '')) AS word
        FROM documents
    ), per AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(length(word)) AS BIGINT) AS n_word_chars
        FROM words GROUP BY doc_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           CAST(SUM(n_word_chars) AS BIGINT) AS total_word_chars,
           TRUE AS tokens_within_bounds,
           TRUE AS merges_reduce
    FROM per
    """,
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-and-apply BPE over the corpus: learn merges on the
    vocabulary-bounded word-type table (operators.bpe), then encode
    every document through the broadcast (word -> n_syms) vocabulary
    — the tokenizer-application pass a training pipeline runs to
    price a corpus in real tokens rather than the regex estimate
    (`text_bpe_token_estimate`).

    Oracle strategy (the in-query-invariant pattern of the ANN
    entries): merge application is iterative and engine-specific
    (no DuckDB twin), so the oracle recomputes what IS
    SQL-expressible — doc/word/char totals under the identical
    tokenization — and pins two invariants the Spark side computes
    in-query: every document's BPE token count lies in
    [n_words, n_word_chars] (each merge only ever fuses two
    adjacent symbols), and the trained merges strictly reduce the
    corpus total vs character-level segmentation."""
    from tms_etl_spark.operators.bpe import apply_bpe, learn_bpe_merges

    d = load_table(spark, sf_dir, "documents")
    merges = learn_bpe_merges(d, n_merges=8)
    enc = apply_bpe(d, merges)
    words = d.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.trim("text")), r"\s+"),
                lambda w: w != "",
            )
        ).alias("word"),
    )
    chars = words.groupBy("doc_id").agg(
        F.sum(F.length("word")).cast("long").alias("n_word_chars")
    )
    per = enc.join(chars, "doc_id")
    return per.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.sum("n_word_chars").cast("long").alias("total_word_chars"),
        F.min(
            (F.col("n_bpe_tokens") >= F.col("n_words"))
            & (F.col("n_bpe_tokens") <= F.col("n_word_chars"))
        ).alias("tokens_within_bounds"),
        (
            (F.sum("n_bpe_tokens") < F.sum("n_word_chars"))
            | (F.lit(len(merges)) == 0)
        ).alias("merges_reduce"),
    )


@query(
    "dedup_decontaminate",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               string_split_regex(lower(text), '[^a-z0-9]+') AS t
        FROM documents
    ), grams AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, greatest(len(t) - 4, 0) + 1),
                   i -> array_to_string(t[i:i+4], ' ')
               )) AS ng
        FROM toks
    ), bench AS (
        SELECT DISTINCT ng FROM grams WHERE doc_id < 25
    )
    SELECT DISTINCT g.doc_id
    FROM grams g JOIN bench b ON g.ng = b.ng
    WHERE g.doc_id >= 25
    ORDER BY g.doc_id
    """,
)
def dedup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the GPT-3/Llama training-set
    hygiene step): flag every training document sharing ANY token
    5-gram with the held-out eval set (here: doc_id < 25 plays the
    benchmark). Scale shape: the benchmark's distinct n-grams are
    EVAL-SET-sized — tiny against a 100 TB corpus — so they
    BROADCAST and the corpus side is a map-side semi-join: one scan,
    zero corpus shuffles (the final distinct is flagged-docs-sized).
    N-grams are built array-side (transform over an index sequence,
    no per-token explode of the corpus; only matching is row-wise).
    Tokenizer + slicing semantics are the `textindex.tokens_of`
    contract, pinned bit-equal to DuckDB."""
    from tms_etl_spark.operators.textindex import tokens_of

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens_of("text").alias("t")
    )
    # docs with < 5 tokens produce no 5-grams. The filter (not a
    # greatest() clamp) matters in Spark: sequence(1, 0) infers step
    # -1 and yields [1, 0], and slice(t, 0, n) THROWS — a clamp to 0
    # crashes on short docs instead of skipping them. DuckDB's
    # range(1, 1) is empty, so the filtered form matches the oracle.
    grams = d.where(F.size("t") >= 5).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 4),
                lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, 5)),
            )
        ).alias("ng"),
    )
    bench = (
        grams.where(F.col("doc_id") < 25).select("ng").distinct()
    )
    return (
        grams.where(F.col("doc_id") >= 25)
        .join(F.broadcast(bench), "ng", "left_semi")
        .select("doc_id")
        .distinct()
        .orderBy("doc_id")
    )
