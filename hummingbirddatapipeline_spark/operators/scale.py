"""Scale-path operators: skew salting and bucketed co-located joins
(SURVEY.md §4 shuffle/partitioning design keys; the reference is
single-machine so these have no direct analogue — they are what makes
its joins survive 1000 executors).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: the skewed side gets a deterministic
    per-row salt, the other side is replicated once per salt value, and
    the join key becomes (key, salt) — a hot key's rows spread over
    ``n_salts`` tasks instead of one straggler.

    Semantics are identical to ``skewed.join(small, key, how)`` for
    the skewed-side-preserving joins; use when one side has hot keys
    and the other is small enough to replicate ``n_salts``x (else AQE
    skew-join splitting is the zero-copy alternative — enabled in
    session.py).

    ``how`` is restricted to {'inner', 'left', 'left_semi',
    'left_anti'}: for right/full (small-side-preserving) joins the
    ``n_salts``-way replication of the small side would emit each
    unmatched small row ``n_salts`` times and each matched small key
    up to ``n_salts - 1`` spurious null-padded rows — salting the
    OTHER side is the correct construction there, so this one refuses
    rather than silently over-returning.
    """
    allowed = {"inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti"}
    if how.lower().replace("_", "") not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not skewed-side-preserving; "
            "supported: inner, left, left_semi, left_anti (salt the "
            "other input for right/full joins)"
        )
    salted = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    )
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted.join(replicated, [key, "__salt"], how)
    return out.drop("__salt")


def morton_code(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative integer keys
    into one Z-order (Morton) value — native shift/mask expressions,
    whole-stage-codegen'd, no UDF.

    Bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1, so
    sorting by the code clusters rows that are close in BOTH
    dimensions.
    """
    az = a.cast("long").bitwiseAND(F.lit((1 << bits) - 1).cast("long"))
    bz = b.cast("long").bitwiseAND(F.lit((1 << bits) - 1).cast("long"))
    out = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftleft(
            F.shiftright(az, i).bitwiseAND(F.lit(1).cast("long")), 2 * i
        )
        bbit = F.shiftleft(
            F.shiftright(bz, i).bitwiseAND(F.lit(1).cast("long")), 2 * i + 1
        )
        out = out.bitwiseOR(abit).bitwiseOR(bbit)
    return out


def zorder_layout(
    df: DataFrame,
    col_a: str,
    col_b: str,
    n_files: int = 32,
    bits: int = 16,
) -> DataFrame:
    """Z-order data layout: range-partition + sort rows by the Morton
    code of two filter columns before writing.

    The point at 100 TB: parquet footers keep per-file min/max for both
    raw columns, and Z-ordering makes those ranges TIGHT in two
    dimensions at once — a filter on either (or both) columns prunes
    most files at planning time, which a single-column sort only
    achieves for its leading column. This is the open-source form of
    Delta/Iceberg ``ZORDER BY``; downstream writers just call
    ``.write`` on the result.

    Both dimensions are range-normalized onto the full ``bits`` domain
    first — raw interleaving of keys with unequal bit-widths degenerates
    to a single-column sort (the wider key owns every significant bit).
    The min/max pass is one tiny aggregate broadcast back onto the scan.
    """
    hi = (1 << bits) - 1
    stats = df.agg(
        F.min(col_a).alias("__amin"),
        F.max(col_a).alias("__amax"),
        F.min(col_b).alias("__bmin"),
        F.max(col_b).alias("__bmax"),
    )

    def normed(col: str, lo: str, hi_c: str) -> Column:
        span = F.col(hi_c) - F.col(lo)
        return F.when(span == 0, F.lit(0).cast("long")).otherwise(
            F.floor(
                (F.col(col) - F.col(lo)).cast("double") * hi / span.cast("double")
            ).cast("long")
        )

    coded = (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            "__z",
            morton_code(
                normed(col_a, "__amin", "__amax"),
                normed(col_b, "__bmin", "__bmax"),
                bits,
            ),
        )
        .drop("__amin", "__amax", "__bmin", "__bmax")
    )
    return coded.repartitionByRange(n_files, "__z").sortWithinPartitions("__z").drop(
        "__z"
    )


def write_bucketed(
    df: DataFrame, table_name: str, key: str, n_buckets: int = 8
) -> None:
    """Bucketed at-rest layout: co-locates rows by hash(key) so joins
    and aggregations on ``key`` between same-bucketed tables need no
    shuffle (SURVEY §4 'bucket/repartition by entity key')."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — the planner
    reads bucket layout from the catalog and elides both shuffles."""
    return spark.table(left_table).join(spark.table(right_table), key)


def key_skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 5,
) -> DataFrame:
    """Join-key skew diagnostics — the report an engineer reads BEFORE
    shuffling a 100 TB fact table on ``key_col``: the ``top_k``
    heaviest keys with their row share, the global max/avg skew ratio,
    and the per-key salt factor (:func:`salted_join`'s ``n_salts``)
    that would level each hot key to an average-sized task.

    Plan: one per-key hash aggregate (map-side combined), a tiny
    4-column global aggregate over the key counts, and a top-k via
    ``orderBy(...).limit(k)`` — Spark's TakeOrdered keeps the sort a
    per-partition partial top-k, never a single-reducer full sort of
    the key space (which for a billion-user table is itself big data).

    Cross-engine determinism: every count stays an exact BIGINT and
    avg_cnt is derived as one double division n_rows / n_keys, so both
    engines evaluate bit-identical doubles (no float aggregation whose
    sum order could differ); ties in the top-k break by key.
    """
    from pyspark.sql.window import Window

    counts = df.groupBy(key_col).agg(F.count("*").alias("cnt"))
    stats = counts.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
    )
    top = counts.orderBy(F.desc("cnt"), F.col(key_col)).limit(top_k)
    avg_cnt = F.col("n_rows").cast("double") / F.col("n_keys").cast("double")
    w = Window.orderBy(F.desc("cnt"), F.col(key_col))
    return (
        top.crossJoin(F.broadcast(stats))
        .withColumn("rank", F.row_number().over(w))
        .select(
            F.col(key_col).alias("key"),
            F.col("cnt"),
            "rank",
            F.round(
                F.col("cnt").cast("double") / F.col("n_rows").cast("double"), 6
            ).alias("share"),
            F.round(F.col("max_cnt").cast("double") / avg_cnt, 4).alias(
                "skew_ratio"
            ),
            F.greatest(
                F.lit(1).cast("long"),
                F.ceil(F.col("cnt").cast("double") / avg_cnt),
            ).alias("suggested_salt"),
            F.col("n_keys"),
        )
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    lower: float = 0.01,
    upper: float = 0.99,
) -> DataFrame:
    """Winsorize (clip) a numeric feature at exact per-group
    percentiles — the robust-scaling prep step that stops a handful of
    outliers from dominating normalization or training loss.

    Returns the input plus ``p_lo``, ``p_hi``, and
    ``{value_col}_winsorized`` = value clipped into [p_lo, p_hi];
    NULL values stay NULL. With no ``group_col`` the bounds are
    global.

    Scale: one hash aggregate computes the exact interpolated
    percentiles per group (Spark's ``percentile``, the same
    ``(n-1)*p`` linear-interpolation definition as DuckDB's
    ``quantile_cont`` — verified bit-identical), and the tiny bounds
    table broadcasts back onto the scan. Exact percentiles sort within
    the aggregation buffer; for pathological single-group cardinality
    at 100 TB swap in approx_percentile with a documented tolerance —
    the operator contract (clip at [p_lo, p_hi]) is unchanged.
    """
    keys = [group_col] if group_col else []
    bounds = df.groupBy(*keys).agg(
        F.expr(f"percentile({value_col}, {lower!r})").alias("p_lo"),
        F.expr(f"percentile({value_col}, {upper!r})").alias("p_hi"),
    )
    joined = (
        df.join(F.broadcast(bounds), keys)
        if keys
        else df.crossJoin(F.broadcast(bounds))
    )
    clipped = F.least(
        F.greatest(F.col(value_col), F.col("p_lo")), F.col("p_hi")
    )
    return joined.withColumn(f"{value_col}_winsorized", clipped)


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Population Stability Index — the standard drift monitor between
    a reference sample (training window) and a current sample (serving
    window): bucket the value by the REFERENCE deciles, compare the
    two distributions, PSI = sum over buckets of
    (cur_frac - ref_frac) * ln(cur_frac / ref_frac). Rule-of-thumb
    thresholds: < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted.

    Returns one row per bucket (bucket, ref_frac, cur_frac, psi_term)
    plus the repeated ``psi_total``; fractions clamp at 1e-6 before
    the log (the standard zero-bucket guard) and round 6dp from exact
    BIGINT counts, so both engines agree bit-for-bit.

    Scale: bucket edges are ONE exact-percentile aggregate on the
    reference (a single broadcast row carrying an array); each side
    then buckets map-side via a 9-element array filter (bound column,
    O(n_buckets) per row) and one hash aggregate — no sort of either
    sample, no join between them beyond the bucket-level outer join of
    two n_buckets-row frames.
    """
    from pyspark.sql.window import Window

    qs = [i / n_buckets for i in range(1, n_buckets)]
    edges = ref.agg(
        F.expr(
            f"percentile({value_col}, array({', '.join(repr(q) for q in qs)}))"
        ).alias("__edges")
    ).select(
        # an empty/all-NULL reference has no deciles — fail loudly at
        # the one-row edge evaluation instead of emitting a clamped
        # 1e-6-everywhere "drift" report that LOOKS plausible
        F.when(F.col("__edges").isNotNull(), F.col("__edges"))
        .otherwise(
            F.raise_error(
                F.lit(
                    "psi_drift: reference sample is empty (or all-NULL) "
                    "— PSI is undefined without reference deciles"
                )
            ).cast("array<double>")
        )
        .alias("__edges")
    )
    # Lineage cuts (guide §1.2): ``edges`` is referenced by BOTH sides'
    # bucketing passes and ``counts`` by its own total, and Catalyst
    # inlines every reference — the executed plan held FIVE sample
    # scans per pass (SQL-tab audit at sf0.1). Both frames are bounded
    # (1 row; <= n_buckets rows); checkpointed, a pass pays exactly the
    # documented two data scans (one bucketing pass per side).
    edges = edges.localCheckpoint(eager=False)

    def frac(df: DataFrame, name: str) -> DataFrame:
        bucket = F.size(
            F.filter("__edges", lambda e: F.col(value_col) > e)
        )
        counts = (
            df.crossJoin(F.broadcast(edges))
            .select(bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count("*").alias("__c"))
            .localCheckpoint(eager=False)
        )
        total = counts.agg(F.sum("__c").alias("__t"))
        return counts.crossJoin(F.broadcast(total)).select(
            "bucket",
            (F.col("__c").cast("double") / F.col("__t").cast("double")).alias(
                name
            ),
        )
    all_buckets = ref.sparkSession.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket")
    )
    clamp = lambda c: F.greatest(F.coalesce(c, F.lit(0.0)), F.lit(1e-6))  # noqa: E731
    joined = (
        all_buckets.join(frac(ref, "__rf"), "bucket", "left")
        .join(frac(cur, "__cf"), "bucket", "left")
        .select(
            "bucket",
            F.round(clamp(F.col("__rf")), 6).alias("ref_frac"),
            F.round(clamp(F.col("__cf")), 6).alias("cur_frac"),
        )
    )
    term = (F.col("cur_frac") - F.col("ref_frac")) * F.log(
        F.col("cur_frac") / F.col("ref_frac")
    )
    w = Window.partitionBy()
    return (
        joined.withColumn("psi_term", F.round(term, 6))
        .withColumn("psi_total", F.round(F.sum(term).over(w), 6))
    )


def impute_median(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Median imputation per group — the robust NULL-fill for numeric
    features before training (median, not mean: one outlier moves the
    mean arbitrarily; reference parity: the pipelines' completeness
    gates drop rows instead, which wastes partially-observed entities
    at corpus scale).

    Returns the input plus ``{value_col}_imputed`` (original where
    present, the group's exact median of NON-NULL values where NULL)
    and ``{value_col}_was_null``. Groups that are entirely NULL stay
    NULL (flagged, not fabricated). With no ``group_col`` the median
    is global.

    Scale: one exact-percentile aggregate per group (same
    bit-identical ``percentile`` / ``quantile_cont`` parity as
    :func:`winsorize`) broadcast back onto the scan.
    """
    keys = [group_col] if group_col else []
    med = df.groupBy(*keys).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("__med")
    )
    joined = (
        df.join(F.broadcast(med), keys)
        if keys
        else df.crossJoin(F.broadcast(med))
    )
    return joined.select(
        *df.columns,
        F.coalesce(F.col(value_col), F.col("__med")).alias(
            f"{value_col}_imputed"
        ),
        F.col(value_col).isNull().alias(f"{value_col}_was_null"),
    )


def quantile_transform(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Quantile (percent-rank) feature scaling: each value maps to its
    exact empirical CDF position in [0, 1] within its group — the
    rank-based normalization that is immune to outliers and
    distribution shape (sklearn's QuantileTransformer, exact form).

    Adds ``{value_col}_qt`` = percent_rank (ties share a rank; NULLs
    stay NULL and are excluded from ranking), rounded 6dp from exact
    rank integers so both engines agree bit-for-bit.

    One shuffle on the group key for the rank window. A global (no
    ``group_col``) transform is a single-partition sort at this
    operator's level — at 100 TB compute it per natural shard or swap
    in approx-percentile inverse lookup; per-group is the common
    feature-prep shape and parallelizes on the key.
    """
    from pyspark.sql.window import Window

    part = [group_col] if group_col else []
    w = Window.partitionBy(*part).orderBy(value_col)
    ranked = df.filter(F.col(value_col).isNotNull()).withColumn(
        f"{value_col}_qt", F.round(F.percent_rank().over(w), 6)
    )
    nulls = df.filter(F.col(value_col).isNull()).withColumn(
        f"{value_col}_qt", F.lit(None).cast("double")
    )
    return ranked.unionByName(nulls)


def target_encode(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    alpha: float = 20.0,
) -> DataFrame:
    """Smoothed target (mean) encoding of a categorical feature:
    enc(c) = (sum_label(c) + alpha * prior) / (n(c) + alpha), with
    prior = the global label mean — the standard high-cardinality
    categorical encoder; ``alpha`` pulls rare categories toward the
    prior instead of memorizing noise.

    Returns one row per category: (category, n, sum_label, prior,
    encoding). The caller broadcast-joins it back onto the feature
    frame (kept separate so the tiny encoder table is the persisted
    training artifact — at serving time the join is against the FROZEN
    encoder, exactly like the dedup store).

    Cross-engine exactness: label sums stay exact when the label is
    integral (0/1 indicators, integer cents); prior and encoding are
    single double divisions of exact sums, rounded 6dp.
    """
    per_cat = df.groupBy(cat_col).agg(
        F.count(label_col).alias("n"),
        F.sum(label_col).cast("double").alias("sum_label"),
    )
    glob = df.agg(
        (F.sum(label_col).cast("double") / F.count(label_col)).alias(
            "__prior"
        )
    )
    return per_cat.crossJoin(F.broadcast(glob)).select(
        F.col(cat_col).alias("category"),
        "n",
        "sum_label",
        F.round(F.col("__prior"), 6).alias("prior"),
        F.round(
            (F.col("sum_label") + alpha * F.col("__prior"))
            / (F.col("n") + alpha),
            6,
        ).alias("encoding"),
    )


def histogram_quantile_error(
    df: DataFrame,
    value_col: str,
    quantiles_e6: tuple[int, ...] = (500000, 900000, 990000),
    n_bins: int = 4096,
) -> DataFrame:
    """Equi-width histogram quantile estimator WITH its exact rank
    error — the quantile member of the observe-don't-trust sketch
    family (sketch_countmin_error / sketch_hll_error): the report that
    picks n_bins before a native approximate percentile is trusted at
    scale. ``value_col`` must be an integer column (quantize floats to
    cents/e6 first — the repo's exact-arithmetic rule).

    Estimator: one map-side pass bins every value into ``n_bins``
    equi-width buckets over the observed [min, max] (the bin index is
    pure integer arithmetic, so both engines agree bit-for-bit); the
    q-quantile estimate is the bin whose cumulative count crosses
    ceil(q*n), linearly interpolated INSIDE the bin by rank — closed
    form, no global sort anywhere (an exact distributed quantile needs
    a full range exchange; this is the 100 TB alternative and the
    report quantifies exactly what that trade costs).

    Verification: a second single-pass aggregate counts values below
    each estimate, giving the estimate's TRUE rank; the output's
    ``rank_err_e6`` is |rank - q| in 1e-6 units. Returns one row per
    requested quantile: (q_e6, est_value, n_below, rank_err_e6) —
    all BIGINT, hash-stable cross-engine.

    Scale shape: pass 1 = scalar min/max/count broadcast + map-side
    bin aggregate (<= n_bins rows); the crossing-bin pick and the
    interpolation run on the bounded histogram; pass 2 = one
    conditional-count aggregate with the K estimate rows riding a
    broadcast. Nothing after the scans exceeds n_bins + K rows.
    """
    vals = df.select(F.col(value_col).cast("long").alias("v")).filter(
        F.col("v").isNotNull()
    )
    # stats is referenced twice (the binning pass + the target rows)
    # and cum twice (crossing-bin pick + in-bin interpolation);
    # Catalyst inlines each reference, so the plan re-scanned the
    # value column four times per pass (SQL tab: four parquet scans).
    # Both frames are bounded model state (1 row; <= n_bins rows) —
    # checkpoint them and the pass pays the documented two data scans
    # (binning + verification).
    stats = vals.agg(
        F.min("v").alias("mn"), F.max("v").alias("mx"),
        F.count("*").alias("n"),
    ).localCheckpoint(eager=False)
    hist = (
        vals.crossJoin(F.broadcast(stats))
        .select(
            F.expr(f"(v - mn) * {n_bins} DIV (mx - mn + 1)").alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").alias("c"))
    )
    cum = hist.select(
        "bin", "c",
        F.sum("c").over(
            Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum"),
    ).localCheckpoint(eager=False)
    spark = df.sparkSession
    # inline_rows, not createDataFrame: the parallelize-backed scan of
    # this 3-row frame ran Python-worker tasks on every pass (guide §4
    # — eliminate the Python boundary; measured in the SQL tab)
    from hummingbirddatapipeline_spark.tables import inline_rows

    qf = inline_rows(
        spark, [(int(q),) for q in quantiles_e6], "q_e6 long"
    )
    targets = qf.crossJoin(F.broadcast(stats)).select(
        "q_e6", "mn", "n",
        F.expr("(mx - mn + 1)").alias("span"),
        F.expr("(q_e6 * n + 999999) DIV 1000000").alias("tgt"),
    )
    # crossing bin: first bin whose cumulative count reaches the target
    # rank; struct-min over the <= n_bins x K candidate rows picks it
    picked = (
        targets.join(cum, F.col("cum") >= F.col("tgt"))
        .groupBy("q_e6", "mn", "span", "n", "tgt")
        .agg(F.min(F.struct("bin", "c", "cum")).alias("__b"))
        .select(
            "q_e6", "n",
            F.col("__b.bin").alias("bin"), F.col("__b.c").alias("c"),
            (F.col("__b.cum") - F.col("__b.c")).alias("cum_before"),
            F.expr(f"mn + (__b.bin * span) DIV {n_bins}").alias("lo"),
            F.expr(
                f"(mn + ((__b.bin + 1) * span) DIV {n_bins})"
                f" - (mn + (__b.bin * span) DIV {n_bins})"
            ).alias("binspan"),
            "tgt",
        )
    )
    ests = picked.select(
        "q_e6", "n",
        F.expr(
            "lo + ((tgt - cum_before - 1) * binspan) DIV c"
        ).alias("est_value"),
    )
    below = (
        vals.crossJoin(F.broadcast(ests))
        .groupBy("q_e6", "n", "est_value")
        .agg(
            F.sum(
                F.when(F.col("v") < F.col("est_value"), 1).otherwise(0)
            ).alias("n_below")
        )
    )
    return below.select(
        "q_e6",
        "est_value",
        "n_below",
        F.expr(
            "abs((n_below * 1000000) DIV n - q_e6)"
        ).alias("rank_err_e6"),
    )


def shard_of(key: Column, n_shards: int, seed: str = "shard0") -> Column:
    """Deterministic training-shard assignment: the 52-bit md5 integer
    of ``key:seed`` (the repo's content-hash uniform — never an RNG)
    mod ``n_shards``. Rerun-, repartition-, and resize-stable: a doc's
    shard is recomputable from its key alone, on any engine."""
    hex13 = F.substring(
        F.md5(F.concat(key.cast("string"), F.lit(":" + seed))), 1, 13
    )
    return F.pmod(F.conv(hex13, 16, 10).cast("long"), F.lit(n_shards))


def shard_manifest(
    docs: DataFrame,
    id_col: str = "doc_id",
    token_col: str | None = None,
    n_shards: int = 16,
    seed: str = "shard0",
) -> DataFrame:
    """Training-shard layout + audit manifest — the step that turns a
    curated corpus into the N files a trainer actually reads. Each doc
    lands in :func:`shard_of` its id; the manifest reports one row per
    shard: (shard_id, n_docs, n_tokens, fingerprint) where
    ``fingerprint`` is the BIT_XOR of every member's 52-bit content
    hash — ORDER-INSENSITIVE and overflow-free, so the same shard
    contents produce the same fingerprint on any engine, any
    partitioning, any row order (the property that lets a 1000-node
    writer and a single-node auditor agree without sorting anything).
    Empty shards are absent (0 of N appearing is itself auditable
    against COUNT(DISTINCT shard_id) = N expectations downstream).

    Scale shape: ONE map-side projection (shard + hash are pure
    expressions at the scan) + ONE hash aggregate on shard_id; the
    manifest is n_shards rows of bounded audit state. The physical
    write would `partitionBy(shard_id)` the same projection.
    """
    hash52 = F.conv(
        F.substring(
            F.md5(
                F.concat(F.col(id_col).cast("string"), F.lit(":" + seed))
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    toks = (
        F.col(token_col).cast("long")
        if token_col
        else F.lit(None).cast("long")
    )
    return (
        docs.select(
            shard_of(F.col(id_col), n_shards, seed).alias("shard_id"),
            hash52.alias("__h"),
            toks.alias("__t"),
        )
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__t").alias("n_tokens"),
            F.expr("bit_xor(__h)").alias("fingerprint"),
        )
    )


def rendezvous_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    n_shards_new: int | None = None,
    seed: str = "hrw0",
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment — Thaler &
    Ravishankar 1996, the consistent-placement alternative to
    ``hash mod n``: each key scores every shard with
    ``md5("<key>:<shard>:<seed>")`` and lands on the argmax. The
    property mod-sharding lacks: growing the fleet moves ONLY the keys
    whose new argmax IS the new shard (~1/(n+1) of them) — a 100 TB
    partition-by-shard layout resizes by copying one shard's worth of
    data instead of reshuffling everything.

    Fixed-length lowercase-hex md5 compares lexicographically exactly
    as it compares numerically, so the argmax is a pure string max —
    deterministic and identical in ANSI SQL; ties (never observed at
    128 bits, handled anyway) break to the LOWEST shard id via a
    (hash, -shard) struct max.

    With ``n_shards_new`` set, emits the before/after comparison::

        (key, shard, shard_new, moved)

    and the HRW contract — ``moved`` implies ``shard_new`` is one of
    the ADDED shards — is pinned constructively in tests. Without it,
    just (key, shard).

    Scale shape: pure map-side expressions — n_shards md5 calls per
    row, no shuffle, no state; the shard table is implicit in the
    hash, which is the whole point (nothing to rebalance, broadcast,
    or version).
    """

    def argmax(n: int) -> Column:
        return (
            -F.array_max(
                F.array(
                    *[
                        F.struct(
                            F.md5(
                                F.concat(
                                    F.col(key_col).cast("string"),
                                    F.lit(f":{s}:{seed}"),
                                )
                            ).alias("h"),
                            F.lit(-s).alias("neg_s"),
                        )
                        for s in range(n)
                    ]
                )
            )["neg_s"]
        ).cast("int")

    out = df.select(F.col(key_col), argmax(n_shards).alias("shard"))
    if n_shards_new is None:
        return out
    return df.select(
        F.col(key_col),
        argmax(n_shards).alias("shard"),
        argmax(n_shards_new).alias("shard_new"),
    ).withColumn("moved", F.col("shard") != F.col("shard_new"))
