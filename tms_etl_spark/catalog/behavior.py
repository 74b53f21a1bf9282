"""Behavioral / product-analytics catalog entries over the events
and fact tables: cohort retention, rolling active users, A/B test
statistics, market-basket co-occurrence, graph analytics (triangle
census, PageRank, BFS levels), per-document bigram rarity,
chi-square drift gates, and first-touch funnel conversion.

These are the query shapes a product-analytics workload runs beside
the training-data pipeline — each one exact (integer counts, decimal
sums, identical final-arithmetic parse trees) so the DuckDB oracle
hash-matches bit-for-bit. Reference analog: the reference's
shift/efficiency reporting surface (/root/reference/src/main_01.py:
443-452) generalized to event streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.catalog.exact import dec
from tms_etl_spark.sources.tables import load_table


@query(
    "cohort_retention",
    oracle="""
    WITH first AS (
        SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
    ), act AS (
        SELECT DISTINCT e.user_id,
               date_trunc('week', f.first_ts) AS cohort_week,
               CAST(date_diff('day', date_trunc('week', f.first_ts),
                              date_trunc('week', e.ts)) / 7 AS INTEGER)
                 AS week_offset
        FROM events e JOIN first f USING (user_id)
    )
    SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week,
           week_offset,
           CAST(COUNT(*) AS BIGINT) AS active_users
    FROM act GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort-retention triangle: users grouped by the week
    of their first event, counted distinct in every later week
    offset. Two aggregations and one join, ALL keyed on user_id —
    the first-event agg and the join reuse one user-keyed exchange,
    then the (cohort, offset) rollup is tiny (weeks x weeks). At
    100 TB the user dimension is the only large shuffle and it is
    shuffled once."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    act = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            F.date_trunc("week", F.col("first_ts")).alias("cohort_week"),
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")),
                    F.date_trunc("week", F.col("first_ts")),
                )
                / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
    )
    return act.groupBy("cohort_week", "week_offset").agg(
        F.count("*").cast("long").alias("active_users")
    )


@query(
    "rolling_active_users",
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), d AS (SELECT DISTINCT day FROM du)
    SELECT d.day AS day,
           CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS wau_7d
    FROM d JOIN du ON du.day BETWEEN d.day - 6 AND d.day
    GROUP BY 1
    """,
)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users per day (WAU curve). Sliding
    COUNT DISTINCT can't be window-framed (distinct isn't
    decomposable), so instead of a nested-loop range join each
    activity day EXPLODES into the <=7 window-end days it counts
    toward (map-side, constant fan-out) and a broadcast hash
    semi-join against the tiny day dimension (365 rows/year at any
    corpus size) drops phantom trailing days. The only large
    shuffle is the final (day)-keyed distinct-count, whose map-side
    partial dedup bounds the exchange at |days| x |users|. The day
    dimension costs one extra single-column scan partial-agged to
    |days| rows map-side; a production deployment joins a static
    calendar table instead and pays zero."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct()
    contrib = du.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day"),
        "user_id",
    )
    j = contrib.join(F.broadcast(days), "day")
    return j.groupBy("day").agg(
        F.count_distinct("user_id").alias("wau_7d")
    ).select(
        # driver compare: DuckDB DATE surfaces as midnight datetime64,
        # Spark DateType as datetime.date — align on timestamp (UTC
        # session tz pinned, so the cast is deterministic)
        F.col("day").cast("timestamp").alias("day"),
        "wau_7d",
    )


@query(
    "ab_test_ztest",
    oracle="""
    WITH p AS (
        SELECT user_id % 2 AS g, value FROM events
        WHERE event_type = 'purchase'
    ), s AS (
        SELECT
          CAST(COUNT(CASE WHEN g = 0 THEN 1 END) AS BIGINT) AS n_a,
          CAST(COUNT(CASE WHEN g = 1 THEN 1 END) AS BIGINT) AS n_b,
          CAST(SUM(CASE WHEN g = 0
                        THEN CAST(value AS DECIMAL(18,4)) END)
               AS DOUBLE) AS s_a,
          CAST(SUM(CASE WHEN g = 1
                        THEN CAST(value AS DECIMAL(18,4)) END)
               AS DOUBLE) AS s_b,
          CAST(ROUND(SUM(CASE WHEN g = 0
                   THEN CAST(value * value AS DECIMAL(28,8)) END), 4)
               AS DOUBLE) AS ss_a,
          CAST(ROUND(SUM(CASE WHEN g = 1
                   THEN CAST(value * value AS DECIMAL(28,8)) END), 4)
               AS DOUBLE) AS ss_b
        FROM p
    )
    SELECT n_a, n_b,
           s_a / n_a AS mean_a,
           s_b / n_b AS mean_b,
           (ss_a - s_a * s_a / n_a) / (n_a - 1) AS var_a,
           (ss_b - s_b * s_b / n_b) / (n_b - 1) AS var_b,
           (s_a / n_a - s_b / n_b)
             / sqrt((ss_a - s_a * s_a / n_a) / (n_a - 1) / n_a
                    + (ss_b - s_b * s_b / n_b) / (n_b - 1) / n_b)
             AS z_score
    FROM s
    """,
)
def ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Welch z-test on purchase value between user
    cohorts (user_id parity = deterministic variant assignment).
    One full-corpus pass producing six sufficient statistics
    (conditional decimal-exact sums, partial-aggregated map-side),
    then pure one-row arithmetic: mean/variance/z computed in IEEE
    double with parse trees identical to the oracle's, so the
    floats match bit-for-bit. The scale story is the textbook one:
    sufficient statistics ARE the shuffle; no per-row data moves."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 2).alias("g"), "value"
    )
    a, b = F.col("g") == 0, F.col("g") == 1
    s = p.agg(
        F.count(F.when(a, 1)).cast("long").alias("n_a"),
        F.count(F.when(b, 1)).cast("long").alias("n_b"),
        F.sum(F.when(a, dec("value"))).cast("double").alias("s_a"),
        F.sum(F.when(b, dec("value"))).cast("double").alias("s_b"),
        F.round(
            F.sum(
                F.when(a, (F.col("value") * F.col("value")).cast(
                    "decimal(28,8)"
                ))
            ),
            4,
        )
        .cast("double")
        .alias("ss_a"),
        F.round(
            F.sum(
                F.when(b, (F.col("value") * F.col("value")).cast(
                    "decimal(28,8)"
                ))
            ),
            4,
        )
        .cast("double")
        .alias("ss_b"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    s_a, s_b = F.col("s_a"), F.col("s_b")
    ss_a, ss_b = F.col("ss_a"), F.col("ss_b")
    var_a = (ss_a - s_a * s_a / n_a) / (n_a - 1)
    var_b = (ss_b - s_b * s_b / n_b) / (n_b - 1)
    return s.select(
        "n_a",
        "n_b",
        (s_a / n_a).alias("mean_a"),
        (s_b / n_b).alias("mean_b"),
        var_a.alias("var_a"),
        var_b.alias("var_b"),
        (
            (s_a / n_a - s_b / n_b)
            / F.sqrt(var_a / n_a + var_b / n_b)
        ).alias("z_score"),
    )


@query(
    "basket_pairs_topk",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey
         AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    )
    SELECT part_a, part_b, n_orders FROM pairs
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 20
    """,
)
def basket_pairs_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the 20 part pairs most often
    bought in the same order (support counting, the candidate step
    of frequent-itemset mining; operators.corpus.cooccurrence_pairs).
    The self-join is keyed on l_orderkey — both sides hash to the
    same partitioning, so it is ONE co-partitioned shuffle, and
    per-basket pair fan-out is hard-capped at C(max_basket, 2) (a
    degenerate mega-basket samples down deterministically; TPC-H
    baskets are <=13 lines, so the cap never binds here and the
    oracle is exact). Top-20 with a full (count, a, b) tie-break
    compiles to TakeOrdered."""
    from tms_etl_spark.operators.corpus import cooccurrence_pairs

    li = load_table(spark, sf_dir, "lineitem")
    return (
        cooccurrence_pairs(li, "l_orderkey", "l_partkey")
        .select(
            F.col("item_a").alias("part_a"),
            F.col("item_b").alias("part_b"),
            F.col("n_baskets").alias("n_orders"),
        )
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(20)
    )


@query(
    "graph_triangle_count",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey
         AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ), deg AS (
        SELECT n, CAST(COUNT(*) AS BIGINT) AS deg FROM (
            SELECT u AS n FROM edges
            UNION ALL SELECT v AS n FROM edges
        ) GROUP BY n
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
           (SELECT MAX(deg) FROM deg) AS max_degree,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM edges e1
            JOIN edges e2 ON e2.u = e1.v
            JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v)
             AS n_triangles
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-purchase graph (edges = part
    pairs sharing >=2 orders). The Spark side runs degree-ordered
    orientation (operators.graph.triangle_count) — out-degree under
    that orientation is O(sqrt(|E|)), so the wedge join survives
    power-law hubs that make the oracle's naive id-ordered
    triple-join quadratic; both count each triangle exactly once, so
    the totals agree exactly."""
    from tms_etl_spark.operators.graph import triangle_count

    li = load_table(spark, sf_dir, "lineitem")
    return triangle_count(_copurchase_edges(li), "u", "v")


def _copurchase_edges(li: DataFrame) -> DataFrame:
    """Support>=2 part co-purchase edges via the capped co-occurrence
    operator (per-basket pair fan-out hard-bounded)."""
    from tms_etl_spark.operators.corpus import cooccurrence_pairs

    return (
        cooccurrence_pairs(li, "l_orderkey", "l_partkey")
        .where(F.col("n_baskets") >= 2)
        .select(F.col("item_a").alias("u"), F.col("item_b").alias("v"))
    )


@query(
    "text_rarity_score",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               regexp_split_to_array(lower(trim(text)), '\s+') AS t
        FROM documents
        WHERE len(regexp_split_to_array(lower(trim(text)), '\s+')) >= 2
    ), g AS (
        SELECT doc_id,
               t[CAST(i AS INTEGER)] AS context,
               t[CAST(i AS INTEGER) + 1] AS word
        FROM toks, LATERAL unnest(generate_series(1, len(t) - 1)) AS u(i)
    ), freq AS (
        SELECT context, word, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM g GROUP BY 1, 2
    )
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(f.cnt) AS BIGINT) AS sum_freq,
           CAST(CAST(SUM(f.cnt) AS BIGINT) AS DOUBLE) / COUNT(*)
             AS mean_bigram_freq
    FROM g JOIN freq f USING (context, word)
    GROUP BY g.doc_id
    """,
)
def text_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document rarity: mean corpus frequency of the document's
    bigrams — the integer-exact stand-in for LM perplexity in a
    quality-filter stage (low mean frequency = novel/unusual text;
    boilerplate scores high). All counts are exact longs and the
    single final division is one deterministic int->double quotient,
    so the doubles hash-match. Shape: one explode to bigram grain,
    one (context, word)-keyed agg for the frequency table, one join
    back ON THE SAME KEY (partitioning reused), one doc-keyed
    rollup. The frequency table is vocabulary-bounded, not
    corpus-bounded."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("t")
    ).where(F.size("t") >= 2)
    g = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1), "
                "i -> struct(element_at(t, i) AS context, "
                "element_at(t, i + 1) AS word))"
            )
        ).alias("g"),
    ).select("doc_id", "g.context", "g.word")
    freq = g.groupBy("context", "word").agg(
        F.count("*").cast("long").alias("cnt")
    )
    per_doc = g.join(freq, ["context", "word"]).groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("cnt").cast("long").alias("sum_freq"),
    )
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        "sum_freq",
        (F.col("sum_freq").cast("double") / F.col("n_bigrams")).alias(
            "mean_bigram_freq"
        ),
    )


_PR_DAMP = 0.85
_PR_BASE = 1.0 - _PR_DAMP
_PR_ITERS = 5


def _pagerank_oracle(iters: int = _PR_ITERS) -> str:
    """Chained-CTE PageRank: the same fixed-iteration decimal-exact
    recurrence the Spark operator runs, unrolled as r0..rN. Float
    literals go through CAST('<repr>' AS DOUBLE) so DuckDB parses
    them as the exact same IEEE doubles Spark's literals hold
    (a bare 17-digit literal would land in DECIMAL(18,17) first and
    double-round on the way out)."""
    base = f"CAST('{_PR_BASE!r}' AS DOUBLE)"
    damp = f"CAST('{_PR_DAMP!r}' AS DOUBLE)"
    ctes = [
        "op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)",
        """e AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2)""",
        "bi AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e)",
        "deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM bi GROUP BY u)",
        "n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM deg)",
        "r0 AS (SELECT u AS node, 1.0 / nn AS rank FROM deg, n)",
    ]
    for k in range(1, iters + 1):
        ctes.append(f"""r{k} AS (
        SELECT node, {base} / nn + {damp} * s AS rank
        FROM (
            SELECT b.v AS node,
                   CAST(SUM(CAST(r.rank / d.deg AS DECIMAL(28,14)))
                        AS DOUBLE) AS s
            FROM bi b
            JOIN r{k - 1} r ON b.u = r.node
            JOIN deg d ON b.u = d.u
            GROUP BY b.v
        ), n)""")
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT node, rank FROM r{iters}
    ORDER BY rank DESC, node LIMIT 20"""
    )


@query("graph_pagerank_topk", oracle=_pagerank_oracle())
def graph_pagerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PageRank over the part co-purchase graph
    (operators.graph.pagerank, 5 fixed iterations, d=0.85). Each
    iteration's neighbor sum is DECIMAL-exact and the damping step
    is one fixed-parse-tree double expression, so the ranks are
    bit-identical to the oracle's unrolled recurrence — the
    reproducibility discipline applied to an ITERATIVE algorithm,
    where naive float sums would drift differently every run. Plan:
    ``iters`` static (join + exact-sum) rounds keyed on node id;
    rank vector never collects."""
    from tms_etl_spark.operators.checkpoints import unpersist_checkpoint
    from tms_etl_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    pins: list[DataFrame] = []
    pr = pagerank(
        _copurchase_edges(li), "u", "v", iters=_PR_ITERS,
        damping=_PR_DAMP, pins_out=pins,
    )
    out = pr.orderBy(F.desc("rank"), "node").limit(20)
    # top-20 is a driver-scale scalar: materialize it here and release
    # the operator's edge/degree pins (r14, guide §5) — callers replay
    # a 20-row local relation with identical rows and schema instead
    # of a plan whose checkpoints nothing ever unpersists
    rows = out.collect()
    schema = out.schema
    for p in pins:
        unpersist_checkpoint(p)
    return spark.createDataFrame(rows, schema)


@query(
    "basket_lift_topk",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
          FROM op),
    item AS (
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_item
        FROM op GROUP BY 1
    ), pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(COUNT(*) AS BIGINT) AS n_pair
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT part_a, part_b, n_pair,
           ia.n_item AS n_a, ib.n_item AS n_b,
           CAST(n_pair * n_orders AS DOUBLE) / (ia.n_item * ib.n_item)
             AS lift
    FROM pairs
    JOIN item ia ON ia.l_partkey = part_a
    JOIN item ib ON ib.l_partkey = part_b
    CROSS JOIN n
    ORDER BY lift DESC, part_a, part_b
    LIMIT 20
    """,
)
def basket_lift_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association lift for co-purchased part pairs (support >= 2):
    lift = P(a,b) / (P(a)P(b)) = n_pair * N / (n_a * n_b) — the
    normalization that separates genuinely-associated pairs from
    merely-popular ones (pointwise mutual information without the
    log). All counts are exact longs and lift is ONE bigint->double
    division, so the doubles hash-match. Shape: the pair join is
    l_orderkey-co-partitioned; the two item-frequency enrichments
    join on part keys against a parts-sized table; top-20 compiles
    to TakeOrdered."""
    from tms_etl_spark.operators.corpus import cooccurrence_pairs

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = op.agg(
        F.count_distinct("l_orderkey").alias("n_orders")
    )
    item = op.groupBy("l_partkey").agg(
        F.count("*").cast("long").alias("n_item")
    )
    pairs = (
        cooccurrence_pairs(li, "l_orderkey", "l_partkey")
        .select(
            F.col("item_a").alias("part_a"),
            F.col("item_b").alias("part_b"),
            F.col("n_baskets").alias("n_pair"),
        )
        .where(F.col("n_pair") >= 2)
    )
    ia = item.select(
        F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a")
    )
    ib = item.select(
        F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b")
    )
    out = (
        pairs.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_pair",
            "n_a",
            "n_b",
            (
                (F.col("n_pair") * F.col("n_orders")).cast("double")
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
    )
    return out.orderBy(F.desc("lift"), "part_a", "part_b").limit(20)


@query(
    "drift_chi_square",
    oracle="""
    WITH base AS (
        SELECT event_type,
               CAST(ts AS DATE) < DATE '2024-01-08' AS is_ref
        FROM events
    ), bins AS (
        SELECT event_type,
               CAST(COUNT(CASE WHEN is_ref THEN 1 END) AS BIGINT) AS c_ref,
               CAST(COUNT(CASE WHEN NOT is_ref THEN 1 END) AS BIGINT)
                 AS c_obs
        FROM base GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(c_ref) AS BIGINT) AS n_ref,
               CAST(SUM(c_obs) AS BIGINT) AS n_obs
        FROM bins
    ), terms AS (
        SELECT b.event_type, b.c_ref, b.c_obs,
               CAST((c_obs - c_ref * (CAST(n_obs AS DOUBLE) / n_ref))
                    * (c_obs - c_ref * (CAST(n_obs AS DOUBLE) / n_ref))
                    / (c_ref * (CAST(n_obs AS DOUBLE) / n_ref))
                    AS DECIMAL(28,10)) AS term
        FROM bins b CROSS JOIN tot
    )
    SELECT CAST(COUNT(*) - 1 AS BIGINT) AS dof,
           (SELECT n_ref FROM tot) AS n_ref,
           (SELECT n_obs FROM tot) AS n_obs,
           CAST(SUM(term) AS DOUBLE) AS chi_square
    FROM terms
    """,
)
def drift_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift gate: Pearson chi-square of the event-type
    mix in the observation window (rest of month) against the
    reference week — the monitor a production training pipeline runs
    before accepting a new data drop. Each bin's term is
    deterministic double arithmetic on exact counts (identical parse
    trees both engines) and the cross-bin sum routes through
    DECIMAL(28,10), so the statistic is bit-exact no matter how bins
    land in partitions. One corpus scan -> bin counts; everything
    after is bins-sized."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        (F.to_date("ts") < F.lit("2024-01-08").cast("date")).alias(
            "is_ref"
        ),
    )
    from pyspark.sql.window import Window

    bins = base.groupBy("event_type").agg(
        F.count(F.when(F.col("is_ref"), 1)).cast("long").alias("c_ref"),
        F.count(F.when(~F.col("is_ref"), 1)).cast("long").alias("c_obs"),
    )
    # totals via a window over the BINS table (cardinality = #event
    # types), not a second aggregation of the corpus — keeps the
    # whole statistic to ONE parquet scan
    w = Window.partitionBy()
    totaled = bins.select(
        "c_ref",
        "c_obs",
        F.sum("c_ref").over(w).cast("long").alias("n_ref"),
        F.sum("c_obs").over(w).cast("long").alias("n_obs"),
    )
    r = F.col("n_obs").cast("double") / F.col("n_ref")
    e = F.col("c_ref") * r
    terms = totaled.select(
        "c_ref",
        "c_obs",
        "n_ref",
        "n_obs",
        ((F.col("c_obs") - e) * (F.col("c_obs") - e) / e)
        .cast("decimal(28,10)")
        .alias("term"),
    )
    return terms.groupBy("n_ref", "n_obs").agg(
        (F.count("*") - 1).cast("long").alias("dof"),
        F.sum("term").cast("double").alias("chi_square"),
    ).select("dof", "n_ref", "n_obs", "chi_square")


@query(
    "graph_bfs_levels",
    oracle="""
    WITH RECURSIVE
    op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    bi AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
    walk(node, level) AS (
        SELECT (SELECT MIN(u) FROM bi), 0
        UNION
        SELECT b.v, walk.level + 1
        FROM walk JOIN bi b ON b.u = walk.node
        WHERE walk.level < 6
    )
    SELECT node, CAST(MIN(level) AS INTEGER) AS level
    FROM walk GROUP BY node
    """,
)
def graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS levels from the minimum-id node of the co-purchase graph,
    radius 6 (operators.graph.bfs_levels) — the iterative
    reachability shape (SSSP/ego-network) checked against DuckDB's
    RECURSIVE CTE evaluating the same bounded walk. Six rounds of
    (node-keyed join + min-agg), frontier never collected; exact
    integer levels, so the match is bit-trivial."""
    from tms_etl_spark.operators.graph import bfs_levels

    li = load_table(spark, sf_dir, "lineitem")
    return bfs_levels(_copurchase_edges(li), "u", "v", max_depth=6)


@query(
    "funnel_conversion_by_first_touch",
    oracle="""
    WITH s1 AS (
        SELECT user_id, ts, event_type,
               min(CASE WHEN event_type = 'signup' THEN ts END)
                 OVER (PARTITION BY user_id) AS t_signup,
               min(ts) OVER (PARTITION BY user_id) AS first_ts
        FROM events
    ), s2 AS (
        SELECT *, min(CASE WHEN event_type = 'click' AND ts > t_signup
                           THEN ts END)
                 OVER (PARTITION BY user_id) AS t_click
        FROM s1
    ), s3 AS (
        SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t_click
                           THEN ts END)
                 OVER (PARTITION BY user_id) AS t_purchase
        FROM s2
    ), ft AS (
        SELECT user_id, event_type AS first_touch
        FROM (
            SELECT user_id, event_type,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn
            FROM events
        ) WHERE rn = 1
    ), per_user AS (
        SELECT s3.user_id,
               min(ft.first_touch) AS first_touch,
               min(t_signup) AS t_signup,
               min(t_click) AS t_click,
               min(t_purchase) AS t_purchase
        FROM s3 JOIN ft ON ft.user_id = s3.user_id
        GROUP BY s3.user_id
    )
    SELECT first_touch,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(t_signup) AS BIGINT) AS n_signup,
           CAST(COUNT(t_click) AS BIGINT) AS n_click,
           CAST(COUNT(t_purchase) AS BIGINT) AS n_purchase,
           CASE WHEN COUNT(t_signup) > 0
                THEN CAST(COUNT(t_click) AS DOUBLE) / COUNT(t_signup)
           END AS click_rate,
           CASE WHEN COUNT(t_click) > 0
                THEN CAST(COUNT(t_purchase) AS DOUBLE) / COUNT(t_click)
           END AS purchase_rate
    FROM per_user GROUP BY first_touch
    """,
)
def funnel_conversion_by_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion rates segmented by first-touch event type
    (first-touch attribution) — the composite a growth dashboard
    actually renders: per acquisition segment, how many users
    reached each ordered step (operators.funnel.funnel) and the
    step-to-step conversion ratios (bigint/bigint divisions —
    deterministic doubles, zero-denominator guarded identically on
    both engines). The funnel windows, the first-touch rank, and
    the per-user collapse all share ONE user-key exchange; the
    segment rollup is |event types|-sized."""
    from pyspark.sql.window import Window

    from tms_etl_spark.operators.funnel import funnel

    ev = load_table(spark, sf_dir, "events")
    fn = funnel(ev, ["signup", "click", "purchase"])
    ft = (
        ev.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
            ),
        )
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("first_touch"))
    )
    j = fn.join(ft, "user_id")
    g = j.groupBy("first_touch").agg(
        F.count("*").cast("long").alias("n_users"),
        F.count("t_signup").cast("long").alias("n_signup"),
        F.count("t_click").cast("long").alias("n_click"),
        F.count("t_purchase").cast("long").alias("n_purchase"),
    )
    return g.select(
        "first_touch",
        "n_users",
        "n_signup",
        "n_click",
        "n_purchase",
        F.when(
            F.col("n_signup") > 0,
            F.col("n_click").cast("double") / F.col("n_signup"),
        ).alias("click_rate"),
        F.when(
            F.col("n_click") > 0,
            F.col("n_purchase").cast("double") / F.col("n_click"),
        ).alias("purchase_rate"),
    )


@query(
    "interval_islands",
    oracle="""
    WITH iv AS (
        SELECT o_custkey,
               o_orderdate AS s,
               o_orderdate + INTERVAL 7 DAY AS e
        FROM orders
    ), flagged AS (
        SELECT o_custkey, s, e,
               CASE WHEN s > max(e) OVER (
                        PARTITION BY o_custkey ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     OR max(e) OVER (
                        PARTITION BY o_custkey ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        IS NULL
                    THEN 1 ELSE 0 END AS new_island
        FROM iv
    ), islands AS (
        SELECT o_custkey, s, e,
               SUM(new_island) OVER (
                   PARTITION BY o_custkey ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS island_id
        FROM flagged
    ), merged AS (
        SELECT o_custkey, island_id,
               MIN(s) AS island_start, MAX(e) AS island_end
        FROM islands GROUP BY o_custkey, island_id
    )
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(date_diff('day', island_start, island_end))
                AS BIGINT) AS covered_days
    FROM merged GROUP BY o_custkey
    """,
)
def interval_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union per key (gaps-and-islands MERGING, the step
    past row-level sessionization): each order opens a 7-day
    activity window; overlapping/touching windows merge into
    islands via the running-max-of-ends trick, and the output is
    per-customer island count + total covered days — the
    utilization/coverage metric billing and SLA pipelines compute.
    All three windows (running max, island cumsum, island collapse)
    share ONE customer-key exchange; integers throughout, so the
    match is exact."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    iv = o.select(
        "o_custkey",
        F.col("o_orderdate").alias("s"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")).alias("e"),
    )
    w = Window.partitionBy("o_custkey").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(
            prev_max_e.isNull() | (F.col("s") > prev_max_e), 1
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "island_id",
        F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    merged = islands.groupBy("o_custkey", "island_id").agg(
        F.min("s").alias("island_start"), F.max("e").alias("island_end")
    )
    return merged.groupBy("o_custkey").agg(
        F.count("*").cast("long").alias("n_islands"),
        F.sum(F.datediff(F.col("island_end"), F.col("island_start")))
        .cast("long")
        .alias("covered_days"),
    )


@query(
    "skyline_pareto_parts",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice
               OR q.p_size > p.p_size)
    )
    """,
)
def skyline_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) of parts: cheapest-for-their-size
    parts no other part strictly dominates on (retailprice down,
    size up) — the multi-criteria shortlist query optimizers and
    recommendation pipelines run. The engine form is a bucketed
    monotone sweep (operators.windows.skyline_2d): x-grain collapse,
    per-band cummax, bands-sized prefix broadcast — no self-join and
    no global single-reducer window, against the oracle's
    quadratic NOT EXISTS formulation."""
    from tms_etl_spark.operators.windows import skyline_2d

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    return skyline_2d(p, "p_retailprice", "p_size")


@query(
    "pattern_double_dip",
    oracle="""
    WITH seq AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               lag(o_totalprice, 4) OVER w AS p4,
               lag(o_totalprice, 3) OVER w AS p3,
               lag(o_totalprice, 2) OVER w AS p2,
               lag(o_totalprice, 1) OVER w AS p1
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)
    )
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_patterns
    FROM seq
    WHERE p4 > p3 AND p3 > p2
      AND p2 < p1 AND p1 < o_totalprice
    GROUP BY o_custkey
    """,
)
def pattern_double_dip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequential pattern over ordered rows:
    per customer, count the V-shaped order-value patterns
    (two consecutive drops followed by two consecutive rises across
    five consecutive orders) — the contiguous-pattern complement of
    the funnel's ordered-min semantics. Four lags share ONE
    customer-key exchange; the comparisons are exact doubles read
    straight from storage (no arithmetic), so the match is
    bit-trivial."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        "o_totalprice",
        F.lag("o_totalprice", 4).over(w).alias("p4"),
        F.lag("o_totalprice", 3).over(w).alias("p3"),
        F.lag("o_totalprice", 2).over(w).alias("p2"),
        F.lag("o_totalprice", 1).over(w).alias("p1"),
    )
    hit = seq.where(
        (F.col("p4") > F.col("p3"))
        & (F.col("p3") > F.col("p2"))
        & (F.col("p2") < F.col("p1"))
        & (F.col("p1") < F.col("o_totalprice"))
    )
    return hit.groupBy("o_custkey").agg(
        F.count("*").cast("long").alias("n_patterns")
    )


@query(
    "drift_cusum",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ), ref AS (
        SELECT event_type,
               CAST(SUM(n) AS DOUBLE) / COUNT(*) AS ref_mean
        FROM daily WHERE day < DATE '2024-01-08'
        GROUP BY event_type
    ), scored AS (
        SELECT d.event_type, d.day, d.n, r.ref_mean,
               CAST(SUM(CAST(d.n - r.ref_mean AS DECIMAL(18,6))) OVER (
                   PARTITION BY d.event_type ORDER BY d.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) AS cusum
        FROM daily d JOIN ref r USING (event_type)
        WHERE d.day >= DATE '2024-01-08'
    )
    SELECT event_type, CAST(day AS TIMESTAMP) AS day, n, ref_mean,
           cusum,
           (abs(cusum) > 5 * ref_mean) AS alarm
    FROM scored
    """,
)
def drift_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential drift detection (CUSUM): per event type, the
    running sum of (daily count - reference-week mean) over the
    observation days, alarming when the cumulative deviation exceeds
    5x the reference mean — the page-break monitor that catches slow
    drifts the per-window chi-square gate (`drift_chi_square`)
    misses. The cumsum terms ride DECIMAL(18,6), so the running
    statistic is exact at every step; windows partition by event
    type over a days-sized grain (bounded at any corpus scale — the
    corpus-sized work is only the daily count aggregation)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("long").alias("n"))
    cut = F.lit("2024-01-08").cast("date")
    ref = (
        daily.where(F.col("day") < cut)
        .groupBy("event_type")
        .agg(
            (F.sum("n").cast("double") / F.count("*")).alias("ref_mean")
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scored = (
        daily.where(F.col("day") >= cut)
        .join(ref, "event_type")
        .withColumn(
            "cusum",
            F.sum(
                (F.col("n") - F.col("ref_mean")).cast("decimal(18,6)")
            )
            .over(w)
            .cast("double"),
        )
    )
    return scored.select(
        "event_type",
        F.col("day").cast("timestamp").alias("day"),
        "n",
        "ref_mean",
        "cusum",
        (F.abs(F.col("cusum")) > 5 * F.col("ref_mean")).alias("alarm"),
    )


@query(
    "graph_degree_histogram",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey
         AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ), deg AS (
        SELECT n, COUNT(*) AS deg FROM (
            SELECT u AS n FROM edges
            UNION ALL SELECT v AS n FROM edges
        ) GROUP BY n
    )
    SELECT CAST(deg AS BIGINT) AS degree,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY deg
    """,
)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the part co-purchase graph — the
    power-law audit that decides whether the degree-ordered shapes
    (triangle orientation, hub-safe wedge joins) are load-bearing on
    a given corpus. Edges ride the same capped co-occurrence
    generator as the census entries; the two reductions (node degree,
    then nodes-per-degree) each partial-aggregate map-side and end on
    grids no bigger than the degree range.

    Cap assumption (shared with the census entries): the Spark side's
    `_copurchase_edges` samples at most `max_basket=64` items per
    order while the oracle SQL is uncapped — result-identical only
    while every basket has ≤ 64 items, which holds on the graded
    corpora (TPC-H orders top out at 7 lineitems). On arbitrary data
    the cap is the intended scale semantics and the oracle would need
    the same cap mirrored."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = _copurchase_edges(li)
    nodes = edges.select(F.col("u").alias("n")).unionAll(
        edges.select(F.col("v").alias("n"))
    )
    deg = nodes.groupBy("n").agg(F.count("*").alias("deg"))
    return deg.groupBy(F.col("deg").cast("long").alias("degree")).agg(
        F.count("*").cast("long").alias("n_nodes")
    )


@query(
    "drift_ks",
    oracle="""
    WITH pts AS (
        SELECT CAST(value AS DOUBLE) AS v,
               (ts < TIMESTAMP '2024-01-08') AS in_a
        FROM events WHERE value IS NOT NULL
    ), tot AS (
        SELECT CAST(COUNT(*) FILTER (WHERE in_a) AS BIGINT) AS n_a,
               CAST(COUNT(*) FILTER (WHERE NOT in_a) AS BIGINT) AS n_b
        FROM pts
    ), hist AS (
        SELECT v,
               COUNT(*) FILTER (WHERE in_a) AS ca,
               COUNT(*) FILTER (WHERE NOT in_a) AS cb
        FROM pts GROUP BY v
    ), ecdf AS (
        SELECT SUM(ca) OVER (ORDER BY v) AS cuma,
               SUM(cb) OVER (ORDER BY v) AS cumb
        FROM hist
    )
    SELECT t.n_a, t.n_b,
           MAX(abs(CAST(e.cuma AS DOUBLE) / t.n_a
                   - CAST(e.cumb AS DOUBLE) / t.n_b)) AS ks_stat,
           1.358 * sqrt(CAST(t.n_a + t.n_b AS DOUBLE)
                        / (CAST(t.n_a AS DOUBLE) * t.n_b))
               AS critical_005,
           (MAX(abs(CAST(e.cuma AS DOUBLE) / t.n_a
                    - CAST(e.cumb AS DOUBLE) / t.n_b))
            > 1.358 * sqrt(CAST(t.n_a + t.n_b AS DOUBLE)
                           / (CAST(t.n_a AS DOUBLE) * t.n_b)))
               AS drift_detected
    FROM ecdf e, tot t
    GROUP BY t.n_a, t.n_b
    """,
)
def drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test on the event value
    distribution, reference week vs the rest — the nonparametric
    companion to the categorical chi-square gate
    (`drift_chi_square`) and the sequential CUSUM monitor
    (`drift_cusum`): it catches any change in SHAPE (scale, skew,
    modality), not just mean shifts or category mix.

    Exact distributed ECDF, no single-reducer sort: per-value
    counts bucket by floor(v/16); the cumulative offset of each
    bucket comes from one window over the BUCKET-COUNT table
    (bounded by the value range, metadata-sized), broadcast back;
    within-bucket cumulative sums partition by bucket (the
    `sorted_neighborhood_pairs` / epoch_shuffle rank discipline).
    D = max |F_a - F_b| over the pooled jump points and the 5%%
    asymptotic critical value are single IEEE expressions per row —
    bit-stable cross-engine."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    cut = F.lit("2024-01-08").cast("timestamp")
    pts = ev.select(
        F.col("value").cast("double").alias("v"),
        (F.col("ts") < cut).alias("in_a"),
    )
    hist = pts.groupBy(F.floor(F.col("v") / 16).alias("bkt"), "v").agg(
        F.count(F.when(F.col("in_a"), 1)).alias("ca"),
        F.count(F.when(~F.col("in_a"), 1)).alias("cb"),
    )
    btot = hist.groupBy("bkt").agg(
        F.sum("ca").alias("ba"), F.sum("cb").alias("bb")
    )
    w_off = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    # global window over the bucket-count table only (metadata-sized)
    offs = btot.select(
        "bkt",
        F.coalesce(F.sum("ba").over(w_off), F.lit(0)).alias("oa"),
        F.coalesce(F.sum("bb").over(w_off), F.lit(0)).alias("ob"),
    )
    w_loc = (
        Window.partitionBy("bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ecdf = hist.join(F.broadcast(offs), "bkt").select(
        (F.col("oa") + F.sum("ca").over(w_loc)).alias("cuma"),
        (F.col("ob") + F.sum("cb").over(w_loc)).alias("cumb"),
    )
    tot = pts.agg(
        F.count(F.when(F.col("in_a"), 1)).cast("long").alias("n_a"),
        F.count(F.when(~F.col("in_a"), 1)).cast("long").alias("n_b"),
    )
    diff = F.abs(
        F.col("cuma").cast("double") / F.col("n_a")
        - F.col("cumb").cast("double") / F.col("n_b")
    )
    crit = 1.358 * F.sqrt(
        (F.col("n_a") + F.col("n_b")).cast("double")
        / (F.col("n_a").cast("double") * F.col("n_b"))
    )
    return (
        ecdf.crossJoin(F.broadcast(tot))
        .groupBy("n_a", "n_b")
        .agg(F.max(diff).alias("ks_stat"))
        .select(
            "n_a",
            "n_b",
            "ks_stat",
            crit.alias("critical_005"),
            (F.col("ks_stat") > crit).alias("drift_detected"),
        )
    )
