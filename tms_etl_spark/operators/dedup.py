"""Deduplication operators for large-scale text corpora.

Four tiers, cheapest-first — the standard pre-training-data ladder:

1. exact: hash-groupBy on content digest (one shuffle on the digest);
2. unigram/n-gram Jaccard: explode tokens → self-join on token →
   count — fully relational, no UDFs, partitions by token;
3. MinHash + LSH banding: per-doc signature via seeded xxhash64 mins
   (built-in, JVM-side), band → bucket-join so candidate pairs are
   generated per-bucket instead of all-pairs;
4. SimHash: 64-bit weighted-bit signature; near-dups share signatures
   within small Hamming distance.

All-pairs comparisons only ever happen *within a bucket/band* — the
property that keeps these viable at 100 TB (candidate generation is a
shuffle on band-hash, not an O(n²) cross join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokenize(df: DataFrame, text_col: str = "text", out: str = "tok") -> DataFrame:
    """Lowercased whitespace tokens, one row per (doc, distinct token)."""
    return df.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
        ).alias(out),
    )


def exact_dedup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by md5 digest: (fp, keeper_doc_id, n_copies)."""
    return (
        df.select("doc_id", F.md5(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count("*").alias("n_copies"))
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    max_df: float | None = None,
) -> DataFrame:
    """Unigram-Jaccard similar pairs (doc_a < doc_b, jaccard ≥ threshold).

    Relational form: explode distinct tokens, self-join on token to
    count the intersection, join per-doc set sizes, compute
    |A∩B| / (|A|+|B|-|A∩B|). The token join shuffles on token — hot
    tokens (stopwords) should be pre-filtered at real scale (df-cut),
    which is exactly what the ``max_df`` document-frequency cut
    does: tokens present in more than ``max_df`` fraction of docs are
    excluded from BOTH the intersection and the set sizes (consistent
    semantics, mirrored in the SQL oracle), bounding the token
    self-join's worst key to max_df·n docs.
    """
    toks = tokenize(df, text_col)
    if max_df is not None:
        n_docs = df.count()
        hot = (
            toks.groupBy("tok")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") > max_df * n_docs)
            .select("tok")
        )
        toks = toks.join(F.broadcast(hot), "tok", "left_anti")
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    a = toks.alias("a")
    b = toks.alias("b")
    common = (
        a.join(b, "tok")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_tok").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_tok").alias("n_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Word n-gram shingles per doc: posexplode tokens, then
    window-lead to stitch n-grams.

    Chosen over the transform+slice higher-order-function form for
    two scale reasons: (a) HOFs evaluate interpreted (no codegen) and
    measured ~4× slower; (b) the window's doc_id partitioning is
    exactly what the downstream MinHash groupBy needs, so the shuffle
    is shared — and it moves tokens, not n-times-replicated shingles.
    Duplicate shingles are kept (MinHash's min() is insensitive);
    docs shorter than ``n`` tokens yield none (exact dedup still
    covers them).
    """
    from pyspark.sql import Window

    toks = df.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
            "pos", "tok"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
    last = F.lead("tok", n - 1).over(w)
    return (
        toks.select("doc_id", F.concat_ws(" ", *parts).alias("shingle"), last.alias("_t"))
        .where(F.col("_t").isNotNull())
        .select("doc_id", "shingle")
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", num_hashes: int = 32, shingle_n: int = 3
) -> DataFrame:
    """MinHash signature per doc: sig[k] = min over shingles of
    xxhash64(k, shingle). One explode + one groupBy; all hashing is
    the built-in xxhash64 (JVM, codegen'd), no UDFs. Signature is a
    single array<long> column — one narrow column through every
    downstream shuffle instead of ``num_hashes`` wide ones."""
    sh = shingles(df, text_col, shingle_n)
    mins = [
        F.min(F.xxhash64(F.lit(k), F.col("shingle"))).alias(f"h{k}")
        for k in range(num_hashes)
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id",
        F.array(*[F.col(f"h{k}") for k in range(num_hashes)]).alias("sig"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket_docs: int = 256,
) -> DataFrame:
    """LSH candidate pairs: split the signature into bands, hash each
    band, group docs sharing a band-hash. Returns distinct candidate
    (doc_a, doc_b) pairs with the estimated Jaccard from signature
    agreement. Candidate generation is a shuffle on (band, band_hash)
    — never an all-pairs join.

    Hot-bucket bound: a degenerate corpus (thousands of identical or
    near-identical docs) lands them all in ONE band-bucket, whose
    within-bucket join would be quadratic. Buckets larger than
    ``max_bucket_docs`` are capped: the first ``max_bucket_docs``
    docs (deterministic pseudo-random order by xxhash64(doc_id))
    all-pairs as usual, and every overflow doc pairs only with the
    bucket's representative (a star). Per-bucket pair count is then
    C(cap,2) + (size-cap) — LINEAR in bucket size — while every
    bucket member stays connected through the representative, so
    downstream ``dedup_clusters`` components are unchanged. Recall
    impact: only pairs BETWEEN two overflow docs of the same hot
    bucket are not emitted directly (they remain linked via the
    star); cross-bucket recall is untouched — the planted-duplicate
    recall test (≥0.9) passes with the cap in force.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, num_hashes, shingle_n)
    band_keys = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(F.slice("sig", b * rows_per_band + 1, rows_per_band)).alias(
                    "bh"
                ),
            )
            for b in range(bands)
        ]
    )
    from pyspark.sql import Window

    banded = sig.select("doc_id", "sig", F.explode(band_keys).alias("bk"))
    # deterministic pseudo-random rank within the bucket; one window
    # on the same (bk) partitioning the join below shuffles on anyway
    rk = Window.partitionBy("bk").orderBy(F.xxhash64("doc_id"), "doc_id")
    banded = banded.withColumn("__rk", F.row_number().over(rk))
    head = banded.where(F.col("__rk") <= max_bucket_docs)
    a = head.alias("a")
    b = head.alias("b")
    core = (
        a.join(b, "bk")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
    )
    overflow = banded.where(F.col("__rk") > max_bucket_docs)
    rep = banded.where(F.col("__rk") == 1).select(
        "bk", F.col("doc_id").alias("r_id"), F.col("sig").alias("r_sig")
    )
    star = (
        overflow.join(rep, "bk")
        .select(
            F.least("doc_id", "r_id").alias("doc_a"),
            F.greatest("doc_id", "r_id").alias("doc_b"),
            F.col("sig").alias("sig_a"),
            F.col("r_sig").alias("sig_b"),
        )
        .where(F.col("doc_a") != F.col("doc_b"))
    )
    # pairs sharing several bands appear once per band; the
    # signatures are functionally dependent on the pair, so
    # dedup on the pair alone. est_jaccard is symmetric, so the
    # star's least/greatest swap of (sig_a, sig_b) is harmless.
    cand = core.unionByName(star).dropDuplicates(["doc_a", "doc_b"])
    matches = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return cand.select(
        "doc_a", "doc_b", (matches / F.lit(num_hashes)).alias("est_jaccard")
    )


def simhash(df: DataFrame, text_col: str = "text", bits: int = 64) -> DataFrame:
    """SimHash signature: per token, xxhash64 gives 64 pseudo-random
    bits; each bit votes ±1; the sign of the per-bit sum is the
    signature bit. Entirely in shiftright/bitwise built-ins; one
    groupBy per doc."""
    toks = tokenize(df, text_col)
    h = F.xxhash64("tok")
    votes = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    sig = None
    for b in range(bits):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, b)
        sig = term if sig is None else sig + term
    return agg.select("doc_id", sig.alias("simhash"))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    prefix: int | None = 1000,
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003): hash every k-gram (md5 hex — lexicographically
    comparable in any engine), keep the minimum of each sliding
    window of ``w`` consecutive k-gram hashes, return the DISTINCT
    (id, fingerprint) pairs.

    Guarantee: two documents sharing a substring of length
    ≥ w + k - 1 share at least one selected fingerprint (the shared
    substring contains a full window, and both pick its minimum) —
    pinned by a property test. ``prefix`` bounds the explode per doc
    (None = whole text).

    Scale shape: the k-gram hashes and their window minima are both
    computed ARRAY-SIDE inside the row (transform + slice +
    array_min) — ZERO exchanges until the final distinct on
    (id, fingerprint); there is no per-gram shuffle and no per-doc
    sort at all. Matching docs then join on the fingerprint —
    candidate generation on a digest key, the same discipline as
    MinHash banding.
    """
    return (
        _winnow_selected(df, text_col, id_col, k, w, prefix)
        .distinct()
        .select(F.col("__id").alias(id_col), "fingerprint")
    )


def _winnow_selected(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    w: int,
    prefix: int | None,
) -> DataFrame:
    """Window-selected (id, fingerprint) rows, WITH duplicates (one
    row per k-gram window), built from the per-row minima arrays
    (``_winnow_min_array``) — map-only up to the caller's dedup."""
    return _winnow_min_array(df, text_col, id_col, k, w, prefix).select(
        "__id", F.explode("__mins").alias("fingerprint")
    )


def _winnow_min_array(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    w: int,
    prefix: int | None,
    hash_fn: str = "md5",
) -> DataFrame:
    """(__id, __mins) where __mins[j] = min hash of k-grams j..j+w-1
    (truncated tail windows included, matching the windowed form).
    Everything happens inside the row: a transform builds the k-gram
    hash array, a second transform takes slice minima — no explode,
    no window, NO exchange. Replaces an explode + window-min plan
    that shuffled and sorted one row PER K-GRAM (~1000x the corpus
    row count). Local wall time is md5-bound either way (~4 s at
    sf0.1 on 32 cores both forms); what this buys is the cluster
    bill — the per-gram exchange moved ~60 GB/TB of corpus over the
    network, this form moves zero until the caller's dedup."""
    t = F.col(text_col)
    src = df.select(
        F.col(id_col).alias("__id"),
        (F.substring(t, 1, prefix) if prefix else t).alias("__t"),
    ).where(F.length("__t") >= k)
    if hash_fn not in ("md5", "xxhash64"):
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    hashes = F.expr(
        f"transform(sequence(1, length(__t) - {k} + 1),"
        f" i -> {hash_fn}(substring(__t, i, {k})))"
    )
    mins = F.expr(
        f"transform(sequence(1, size(__h)),"
        f" j -> array_min(slice(__h, j, {w})))"
    )
    return src.select("__id", hashes.alias("__h")).select(
        "__id", mins.alias("__mins")
    )


def winnow_digest(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    prefix: int | None = 1000,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-doc winnowing summary: (id, n_fp, fp_digest) where
    ``fp_digest`` = md5 of the sorted distinct fingerprints.

    ``hash_fn``: the k-gram rolling hash. "md5" (default) is the
    cross-engine-exact form the DuckDB oracle can reproduce
    (lexicographic hex); "xxhash64" is the PRODUCTION fast path
    (~25% less wall on the md5-bound cost; winnowing's shared-
    substring guarantee holds for any deterministic hash — only
    WHICH grams get selected changes).

    One LIGHT shuffle: the minima arrays are computed in-row
    (``_winnow_min_array``) and deduped/sorted IN-ROW first, so the
    per-id merge exchange (which preserves the contract that
    duplicate ids union their fingerprint sets, matching the
    oracle's GROUP BY) moves only each row's DISTINCT-fingerprint
    array — typically ~1/w of the gram count — instead of one row
    per k-gram with a per-doc sort as the original plan did."""
    sel = _winnow_min_array(
        df, text_col, id_col, k, w, prefix, hash_fn
    ).select(
        "__id", F.array_sort(F.array_distinct("__mins")).alias("__fps")
    )
    merged = F.array_sort(
        F.array_distinct(F.flatten(F.collect_list("__fps")))
    )
    # xxhash64 fingerprints are longs: stringify (post-sort, so the
    # ordering is numeric) before the digest concat
    digest_in = (
        merged
        if hash_fn == "md5"
        else F.transform(merged, lambda c: c.cast("string"))
    )
    return sel.groupBy("__id").agg(
        F.size(merged).cast("long").alias("n_fp"),
        F.md5(F.concat_ws("", digest_in)).alias("fp_digest"),
    ).select(F.col("__id").alias(id_col), "n_fp", "fp_digest")


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col,
    w: int = 3,
    id_col: str = "doc_id",
    bucket_chars: int = 2,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández/Stolfo, SIGMOD 1995):
    sort the corpus by a domain blocking key and emit every pair
    within a sliding window of ``w`` ranks — the fourth candidate-
    generation family next to MinHash banding, the df-cut token join
    and winnowing. Output: (doc_a, doc_b, rank_gap) with doc_a the
    lower-ranked id; pair count is exactly n·w − w(w+1)/2, LINEAR in
    the corpus.

    Scale shape: the global rank is computed BUCKETED (the
    epoch_shuffle discipline — local ranks within a key-prefix bucket
    plus broadcast cumulative offsets), never as one
    ``row_number() OVER (ORDER BY key)`` reducer. The prefix bucket
    preserves key order by construction; unlike the md5 case the
    blocking key's distribution is domain-controlled, so
    ``bucket_chars`` is the skew knob (more chars → more, smaller
    buckets). Window pairs then come from an equi-join on
    rank = rank + d for d in 1..w — a shuffle on the uniform rank
    value, and pairs across bucket boundaries fall out for free
    because ranks are global."""
    key = key_col if not isinstance(key_col, str) else F.col(key_col)
    from pyspark.sql import Window

    keyed = df.select(
        F.col(id_col), key.alias("__key")
    ).withColumn("__bucket", F.substring("__key", 1, bucket_chars))
    counts = keyed.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__n"))
    w_off = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # the offsets window is global but runs over the BUCKET-COUNT
    # table (16^bucket_chars rows), not the corpus
    offsets = counts.select(
        "__bucket",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__offset"),
    )
    w_local = Window.partitionBy("__bucket").orderBy("__key", id_col)
    ranked = (
        keyed.join(F.broadcast(offsets), "__bucket")
        .select(
            id_col,
            (F.row_number().over(w_local) + F.col("__offset"))
            .cast("long")
            .alias("__rn"),
        )
    )
    ds = F.explode(F.array(*[F.lit(d) for d in range(1, w + 1)])).alias("__d")
    probes = ranked.select(
        F.col(id_col).alias("doc_a"), "__rn", ds
    ).withColumn("__rn2", F.col("__rn") + F.col("__d"))
    partners = ranked.select(
        F.col(id_col).alias("doc_b"), F.col("__rn").alias("__rn2")
    )
    return probes.join(partners, "__rn2").select(
        "doc_a", "doc_b", F.col("__d").cast("int").alias("rank_gap")
    )


def jaccard_prefix_join(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """EXACT set-similarity join via prefix filtering (Bayardo/Ma/
    Srikant "Scaling Up All Pairs Similarity Search", WWW 2007): all
    pairs with unigram Jaccard ≥ ``threshold`` — same output as the
    brute-force ``jaccard_pairs`` (equality pinned by test), but
    candidates come from PREFIX tokens only. Order every doc's tokens
    rarest-first (global df ascending); a pair with J ≥ t must share
    a token within each doc's first ``n − ⌈t·n⌉ + 1`` tokens, so the
    join keys on the rarest slice of each doc — exactly the tokens
    with the SMALLEST groups. Unlike LSH/SNM this is a guarantee, not
    a recall trade: verification computes the exact Jaccard for every
    candidate.

    Scale shape: token df table is vocabulary-sized (broadcast); the
    prefix join shuffles on rare tokens (bounded groups by
    construction — a token in many docs is in few prefixes); exact
    verification joins candidates back to full token sets, costing
    O(candidates × avg doc tokens). The prefix length uses
    ``n − floor(t·n) + 1`` — one token longer than the tight bound,
    so float rounding of ``t·n`` can only ADD candidates, never drop
    a true pair."""
    toks = tokenize(df, text_col)
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("__df"))
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("__n"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("__df", "tok")
    ranked = (
        toks.join(F.broadcast(dfreq), "tok")
        .withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(sizes), "doc_id")
    )
    prefix_len = F.col("__n") - F.floor(F.lit(float(threshold)) * F.col("__n")) + 1
    prefix = ranked.where(F.col("__rn") <= prefix_len).select("doc_id", "tok")
    a = prefix.select(F.col("doc_id").alias("doc_a"), "tok")
    b = prefix.select(F.col("doc_id").alias("doc_b"), "tok")
    cand = (
        a.join(b, "tok")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    ta = toks.select(F.col("doc_id").alias("doc_a"), "tok")
    tb = toks.select(F.col("doc_id").alias("doc_b"), "tok")
    inter = (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "tok"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("__common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("__n").alias("__na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("__n").alias("__nb"))
    jac = F.col("__common") / (
        F.col("__na") + F.col("__nb") - F.col("__common")
    )
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def repeated_span_pairs(
    df: DataFrame,
    k: int = 5,
    min_span: int = 12,
    max_df: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact repeated-substring detection between document pairs —
    the token-level form of suffix-array training-data dedup (Lee et
    al., "Deduplicating Training Data Makes Language Models Better",
    ACL 2022): find every maximal run of >= ``min_span`` consecutive
    shared tokens between two documents, without materializing
    suffix arrays.

    Shape: shared token ``k``-grams anchor candidate positions; a
    run of shared tokens of length L produces L-k+1 consecutive
    anchors on the same DIAGONAL (pos_a - pos_b constant), so maximal
    spans fall out of a gaps-and-islands pass per (pair, diagonal):
    span_tokens = island_size + k - 1. Output: one row per pair with
    max_span_tokens >= min_span, plus the count of distinct maximal
    spans of at least that length.

    Scale: the anchor join is df-cut (grams in > ``max_df`` docs are
    dropped, the `jaccard_pairs` discipline) so boilerplate grams
    never fan out quadratically; islands windows partition by
    (pair, diagonal) — bounded by document length, never corpus-
    sized. A df-cut hole inside a true run splits it into two
    reported spans; the cut is part of the operator's contract (and
    mirrored by its oracle), trading bounded work for split spans on
    ultra-common text."""
    t = F.split(F.col(text_col), " ")
    docs = df.select(F.col(id_col).alias("__id"), t.alias("__t")).where(
        F.size("__t") >= k
    )
    # array-side gram construction: one projection, no per-gram joins
    grams = docs.select(
        "__id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("__t") - (k - 1)),
                lambda i: F.array_join(F.slice("__t", i, k), " "),
            )
        ).alias("__i0", "__g"),
    ).select("__id", (F.col("__i0") + 1).alias("__i"), "__g")
    df_counts = grams.groupBy("__g").agg(
        F.countDistinct("__id").alias("__df")
    )
    keep = df_counts.where(
        (F.col("__df") >= 2) & (F.col("__df") <= max_df)
    ).select("__g")
    pg = grams.join(keep, "__g")
    a = pg.select(F.col("__id").alias("doc_a"), F.col("__i").alias("__ia"), "__g")
    b = pg.select(F.col("__id").alias("doc_b"), F.col("__i").alias("__ib"), "__g")
    anchors = (
        a.join(b, "__g")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "__ia", (F.col("__ia") - F.col("__ib")).alias("__diag"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_a", "doc_b", "__diag").orderBy("__ia")
    islands = anchors.withColumn(
        "__grp", F.col("__ia") - F.row_number().over(w)
    )
    spans = islands.groupBy("doc_a", "doc_b", "__diag", "__grp").agg(
        (F.count("*") + (k - 1)).alias("__span")
    )
    return (
        spans.groupBy("doc_a", "doc_b")
        .agg(
            F.max("__span").cast("long").alias("max_span_tokens"),
            F.count(F.when(F.col("__span") >= min_span, 1))
            .cast("long")
            .alias("n_spans"),
        )
        .where(F.col("max_span_tokens") >= min_span)
    )
