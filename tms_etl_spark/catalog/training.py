"""Training-data pipeline catalog entries: sequence packing, mixture
sampling, per-group quantile filtering, benchmark decontamination and
the inverted index. Reference analog: none — this is the north-star
LLM-pipeline surface layered on the `documents` table.

Every entry here has an EXACT DuckDB oracle (the packing oracle
replays next-fit with a recursive CTE stepping each shard in
lockstep), following the repo's exactness rules: integer/boolean
outputs wherever possible, IEEE doubles only from fixed-order
division of exact integers, arrays serialized as joined strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.sources.tables import load_table

# whitespace token count — the shared metric expression (Spark) and
# its DuckDB twin, kept adjacent so they can't drift independently
# (a function, not a module constant: building a Column needs an
# active SparkContext, and the catalog imports before any exists)
def _n_tokens():
    return F.size(F.split(F.trim("text"), r"\s+")).cast("long")


_N_TOKENS_SQL = r"CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)"
_SHARD_SQL = (
    "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
)


@query(
    "pack_sequences",
    oracle=rf"""
    WITH RECURSIVE docs AS (
        SELECT doc_id, {_N_TOKENS_SQL} AS tok, {_SHARD_SQL} % 8 AS shard
        FROM documents
    ), ordered AS (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS rn
        FROM docs
    ), steps AS (
        SELECT shard, rn, doc_id, tok,
               CAST(0 AS BIGINT) AS bin_id, tok AS run
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.shard, o.rn, o.doc_id, o.tok,
               CASE WHEN p.run + o.tok <= 128
                    THEN p.bin_id ELSE p.bin_id + 1 END,
               CASE WHEN p.run + o.tok <= 128
                    THEN p.run + o.tok ELSE o.tok END
        FROM steps p JOIN ordered o
          ON o.shard = p.shard AND o.rn = p.rn + 1
    )
    SELECT shard, bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS bin_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM steps GROUP BY shard, bin_id
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-fit sequence packing into 128-token bins across 8 md5
    shards, collapsed to per-bin summaries. The oracle replays the
    exact sequential rule with a recursive CTE — the strongest
    possible check for an inherently order-dependent operator
    (`operators/packing.py:pack_sequences`)."""
    from tms_etl_spark.operators.packing import bin_summary, pack_sequences

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", _n_tokens().alias("n_tokens")
    )
    packed = pack_sequences(d, budget=128, n_shards=8)
    return bin_summary(packed)


@query(
    "sample_mixture",
    oracle="""
    WITH counts AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY lang
    ), rates AS (
        SELECT lang,
               least(1.0, (300.0 * CASE lang
                   WHEN 'de' THEN 0.2 WHEN 'en' THEN 0.3
                   WHEN 'es' THEN 0.2 WHEN 'fr' THEN 0.15
                   WHEN 'zh' THEN 0.15 ELSE 0.0 END) / n) AS rate
        FROM counts
    )
    SELECT d.doc_id, d.lang, r.rate,
           (CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                 AS BIGINT) / 4294967295.0 < r.rate) AS sampled
    FROM documents d JOIN rates r USING (lang)
    """,
)
def sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture sampling: per-language rates sized to hit
    a 30/20/20/15/15 en/de/es/fr/zh mix under a 300-document budget
    (clamped at 1.0 — at sf0.001 every rate clamps, exercising the
    cap), keep decision a pure function of md5(doc_id)
    (`operators/sampling.py:mixture_sample`)."""
    from tms_etl_spark.operators.sampling import mixture_sample

    d = load_table(spark, sf_dir, "documents")
    return mixture_sample(
        d,
        weights={"en": 0.3, "de": 0.2, "es": 0.2, "fr": 0.15, "zh": 0.15},
        budget=300,
    )


@query(
    "quality_quantile_filter",
    oracle=rf"""
    WITH m AS (
        SELECT doc_id, lang, {_N_TOKENS_SQL} AS n_tokens FROM documents
    ), c AS (
        SELECT lang, n_tokens,
               cume_dist() OVER (PARTITION BY lang ORDER BY n_tokens) AS cd
        FROM m
    ), cut AS (
        SELECT lang, MIN(n_tokens) AS cutoff
        FROM c WHERE cd >= 0.25 GROUP BY lang
    )
    SELECT m.doc_id, m.lang, m.n_tokens, cut.cutoff,
           (m.n_tokens >= cut.cutoff) AS kept
    FROM m JOIN cut USING (lang)
    """,
)
def quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language exact p25 cutoff on token count — "drop the
    shortest quarter of each language" — via the explicit
    min-value-with-cume_dist>=p rule (engine-exact integer-ratio
    arithmetic; no percentile interpolation conventions)
    (`operators/sampling.py:quantile_threshold_filter`)."""
    from tms_etl_spark.operators.sampling import quantile_threshold_filter

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", _n_tokens().alias("n_tokens")
    )
    return quantile_threshold_filter(
        d, metric_col="n_tokens", group_col="lang", p=0.25
    )


@query(
    "contamination_check",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS a
        FROM documents
    ), grams AS (
        SELECT DISTINCT doc_id, a[i] || ' ' || a[i+1] || ' ' || a[i+2] AS gram
        FROM toks, unnest(generate_series(1, len(a) - 2)) AS t(i)
        WHERE len(a) >= 3
    ), eval_grams AS (
        SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0
    )
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_eval_shared,
           (CAST(SUM(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) / CAST(COUNT(*) AS BIGINT)) AS eval_frac,
           (SUM(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END) > 0)
             AS contaminated
    FROM grams g LEFT JOIN eval_grams e USING (gram)
    WHERE g.doc_id % 97 <> 0
    GROUP BY g.doc_id
    """,
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: 3-gram overlap of every training doc
    against the held-out eval slice (doc_id % 97 = 0 — a stand-in for
    a real benchmark table). Eval grams broadcast; the training corpus
    never shuffles on the gram key
    (`operators/corpus.py:contamination_stats`)."""
    from tms_etl_spark.operators.corpus import contamination_stats

    d = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 97 == 0
    return contamination_stats(d.where(~is_eval), d.where(is_eval), n=3)


@query(
    "inverted_index",
    oracle=r"""
    WITH toks AS (
        SELECT DISTINCT doc_id,
               unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
        FROM documents
    )
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
           array_to_string(
               list_transform(
                   list_slice(list_sort(list(doc_id)), 1, 20),
                   x -> CAST(x AS VARCHAR)), ',') AS postings
    FROM toks GROUP BY term
    """,
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term → (document frequency, first-20 posting list) keyword
    index, posting lists numerically sorted and comma-serialized for
    engine-comparable output (`operators/corpus.py:inverted_index`)."""
    from tms_etl_spark.operators.corpus import inverted_index

    return inverted_index(load_table(spark, sf_dir, "documents"), k=20)


@query(
    "epoch_shuffle",
    oracle="""
    WITH keyed AS (
        SELECT e.epoch, d.doc_id,
               md5(CAST(d.doc_id AS VARCHAR) || ':' ||
                   CAST(e.epoch AS VARCHAR)) AS shuffle_key
        FROM documents d
        CROSS JOIN (SELECT unnest([0, 1]) AS epoch) e
    )
    SELECT epoch, doc_id,
           CAST(row_number() OVER (
               PARTITION BY epoch ORDER BY shuffle_key, doc_id)
             AS BIGINT) AS position
    FROM keyed
    """,
)
def epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-epoch shuffle: every epoch gets an
    independent, reproducible global permutation of the corpus by
    ranking on md5(doc_id:epoch) — rerunning epoch 3 after a crash
    yields byte-identical order, unlike engine RNG. The rank is a
    per-epoch window; at cluster scale Spark range-partitions the sort
    so no single task sees the whole epoch, and downstream writers
    consume position-contiguous shards
    (`operators/sampling.py:epoch_shuffle`)."""
    from tms_etl_spark.operators.sampling import epoch_shuffle as op

    d = load_table(spark, sf_dir, "documents")
    return op(d, id_col="doc_id", epochs=[0, 1])


@query(
    "sample_weighted",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) / 4294967295.0)
                 / CAST(n_chars AS DOUBLE) AS priority
        FROM documents
        WHERE n_chars > 0
    )
    SELECT doc_id, n_chars
    FROM keyed
    ORDER BY priority, doc_id
    LIMIT 200
    """,
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement: priority =
    u / weight with u the same md5-uniform the mixture sampler uses,
    keep the k smallest priorities — longer documents (weight =
    n_chars) are proportionally more likely to land in the sample, and
    the draw is a pure function of doc_id. One TakeOrdered, no global
    sort materialization; exactness comes from both engines dividing
    the identical IEEE doubles (`operators/sampling.py:weighted_sample`)."""
    from tms_etl_spark.operators.sampling import weighted_sample

    d = load_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    return weighted_sample(d, id_col="doc_id", weight_col="n_chars", k=200)


@query(
    "sample_per_group",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang ORDER BY
                   (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                         AS BIGINT) / 4294967295.0),
                   doc_id) AS rk
        FROM documents
    )
    SELECT doc_id, lang FROM ranked WHERE rk <= 50
    """,
)
def sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-group sampling (50 docs per language) by ranking
    the md5-uniform within each group — reproducible reservoir
    semantics with zero RNG state, exact group quotas (Bernoulli
    sampleBy only hits k in expectation)
    (`operators/sampling.py:per_group_sample`)."""
    from tms_etl_spark.operators.sampling import per_group_sample

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return per_group_sample(d, group_col="lang", id_col="doc_id", k=50)


@query(
    "feature_winsorize",
    oracle="""
    WITH c AS (
        SELECT doc_id, lang, n_chars,
               cume_dist() OVER (PARTITION BY lang ORDER BY n_chars) AS cd
        FROM documents
    ), cuts AS (
        SELECT lang,
               MIN(CASE WHEN cd >= 0.05 THEN n_chars END) AS lo,
               MIN(CASE WHEN cd >= 0.95 THEN n_chars END) AS hi
        FROM c GROUP BY lang
    )
    SELECT d.doc_id, d.lang, d.n_chars, cuts.lo, cuts.hi,
           least(greatest(d.n_chars, cuts.lo), cuts.hi) AS clipped,
           CASE WHEN cuts.hi = cuts.lo THEN 0.0 ELSE
               (CAST(least(greatest(d.n_chars, cuts.lo), cuts.hi) AS DOUBLE)
                - CAST(cuts.lo AS DOUBLE))
               / (CAST(cuts.hi AS DOUBLE) - CAST(cuts.lo AS DOUBLE)) END
             AS norm
    FROM documents d JOIN cuts USING (lang)
    """,
)
def feature_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language robust scaling of document length: exact p05/p95
    cutoffs (cume_dist rule), clip, min-max normalize — the
    outlier-immune feature-prep step. One window exchange for both
    cutoffs, broadcast back, map-only second pass; the normalized
    value is a single IEEE division of exact integers so both engines
    agree bit-for-bit (`operators/sampling.py:winsorize_normalize`)."""
    from tms_etl_spark.operators.sampling import winsorize_normalize

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return winsorize_normalize(
        d, metric_col="n_chars", group_col="lang", p_lo=0.05, p_hi=0.95
    )


@query(
    "sample_temperature",
    oracle="""
    WITH c AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY lang
    ), s AS (
        SELECT CAST(SUM(CAST(sqrt(CAST(n AS DOUBLE)) AS DECIMAL(28,8)))
                    AS DOUBLE) AS total
        FROM c
    ), r AS (
        SELECT lang, n,
               CAST(CAST(sqrt(CAST(n AS DOUBLE)) AS DECIMAL(28,8))
                    AS DOUBLE) / s.total AS share
        FROM c, s
    ), rr AS (
        SELECT lang, share, least(1.0, (300.0 * share) / n) AS rate
        FROM r
    )
    SELECT d.doc_id, d.lang, rr.share, rr.rate,
           (CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                 AS BIGINT) / 4294967295.0 < rr.rate) AS sampled
    FROM documents d JOIN rr USING (lang)
    """,
)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (alpha=0.5) mixture sampling under a 300-doc
    budget: shares derived from sqrt(class count) — rare languages
    upweighted relative to their frequency, no explicit weight table
    (`operators/sampling.py:temperature_sample`). sqrt is the one
    power IEEE requires correctly rounded, and the share denominator
    sums through DECIMAL, so rates (and thus every keep decision)
    hash-match DuckDB exactly."""
    from tms_etl_spark.operators.sampling import temperature_sample

    d = load_table(spark, sf_dir, "documents")
    return temperature_sample(d, budget=300)


@query(
    "split_leakage_safe",
    oracle="""
    WITH grp AS (
        SELECT doc_id,
               MIN(doc_id) OVER (PARTITION BY md5(text)) AS grp_key
        FROM documents
    ), u AS (
        SELECT doc_id,
               CAST(('0x' || substring(md5(CAST(grp_key AS VARCHAR)), 1, 8))
                    AS BIGINT) / 4294967295.0 AS u
        FROM grp
    )
    SELECT doc_id,
           CASE WHEN u < 0.8 THEN 'train'
                WHEN u < 0.9 THEN 'validation'
                ELSE 'test' END AS split
    FROM u
    """,
)
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-aware train/test split: every member of an
    exact-duplicate group (same content digest) inherits the split of
    the group's min-id representative, so a document can never sit in
    train while its byte-identical twin sits in eval
    (`operators/storage.py:leakage_safe_split`). Per-id splitting
    leaks each cross-boundary dup pair with probability 2p(1-p) —
    at 100 TB that is millions of contaminated eval docs. One window
    shuffle on the content digest; the assignment itself stays a
    projection of the same md5-uniform ``split_train_test`` uses."""
    from tms_etl_spark.operators.storage import leakage_safe_split

    d = load_table(spark, sf_dir, "documents")
    return leakage_safe_split(d, "doc_id", "text").select("doc_id", "split")


@query(
    "sample_kfold_balance",
    oracle="""
    WITH folds AS (
        SELECT doc_id, n_chars,
               CAST(least(floor(
                   (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                         AS BIGINT) / 4294967295.0) * 5), 4) AS INTEGER) AS fold
        FROM documents
    )
    SELECT fold,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM folds
    GROUP BY fold
    """,
)
def sample_kfold_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold cross-validation assignment (k=5) plus the balance
    audit a pipeline runs before trusting the folds: fold = ⌊u·k⌋ of
    the md5-uniform id digest (`operators/storage.py:kfold_assign`),
    then per-fold doc and char totals. Assignment is a pure
    projection (no shuffle); the audit partial-aggregates onto a
    5-value key, so the whole check costs one map pass at any
    scale."""
    from tms_etl_spark.operators.storage import kfold_assign

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return kfold_assign(d, "doc_id", k=5).groupBy("fold").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@query(
    "corpus_prep_pipeline",
    oracle=r"""
    WITH gated AS (
        SELECT doc_id, lang, text,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                 AS n_tokens
        FROM documents
        WHERE n_chars BETWEEN 20 AND 20000
    ), kept AS (
        SELECT doc_id, lang, n_tokens
        FROM (
            SELECT doc_id, lang, n_tokens,
                   row_number() OVER (PARTITION BY md5(text)
                                      ORDER BY doc_id) AS rn
            FROM gated
            WHERE n_tokens >= 5
        ) t
        WHERE rn = 1
    )
    SELECT doc_id, lang, n_tokens,
           CASE WHEN u < 0.8 THEN 'train'
                WHEN u < 0.9 THEN 'validation'
                ELSE 'test' END AS split
    FROM (
        SELECT doc_id, lang, n_tokens,
               CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) / 4294967295.0 AS u
        FROM kept) f
    """,
)
def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus preparation in ONE composed plan — the
    flagship composition test: length gate (pushed to the scan) →
    token-count gate → exact dedup keeping the min-id representative
    (a ``min(struct)`` AGGREGATION over the content digest — not a
    digest-partitioned window, which could not map-side combine the
    hot digest of a boilerplate document duplicated millions of
    times) → deterministic train/validation/test split (a pure
    projection, via `operators/storage.py:hash_split` on the
    already-deduped ids). Catalyst fuses the gates into the scan
    filter and the pipeline costs exactly one combined shuffle (the
    dedup aggregation) at any scale; the split-after-dedup ordering
    means a duplicate can never straddle the boundary, making this
    the single-query equivalent of the filter→dedup→split ladder a
    100 TB pretraining run executes."""
    from tms_etl_spark.operators.storage import hash_split

    d = load_table(spark, sf_dir, "documents").where(
        F.col("n_chars").between(20, 20000)
    )
    gated = d.withColumn("n_tokens", _n_tokens()).where(F.col("n_tokens") >= 5)
    kept = (
        gated.groupBy(F.md5(F.col("text")).alias("__h"))
        .agg(F.min(F.struct("doc_id", "lang", "n_tokens")).alias("__w"))
        .select(
            F.col("__w.doc_id").alias("doc_id"),
            F.col("__w.lang").alias("lang"),
            F.col("__w.n_tokens").alias("n_tokens"),
        )
    )
    return hash_split(kept, "doc_id").select(
        "doc_id", "lang", "n_tokens", "split"
    )


@query(
    "sample_uniform_hashorder",
    oracle="""
    SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h
    FROM documents
    ORDER BY h, doc_id
    LIMIT 100
    """,
)
def sample_uniform_hashorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform k-sample: order by md5(id) and take the
    first k. The hash order is a fixed pseudo-random permutation of
    the corpus, so the prefix is a uniform sample that is REPRODUCIBLE
    across engines, partitionings and reruns — unlike rand()-based
    sampling — and compiles to TakeOrderedAndProject (per-partition
    heap of k, no global sort). The standard trick for carving a
    stable eval holdout out of a moving corpus."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.md5(F.col("doc_id").cast("string")).alias("h"),
        )
        .orderBy("h", "doc_id")
        .limit(100)
    )
