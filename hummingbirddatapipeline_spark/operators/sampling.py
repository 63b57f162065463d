"""Deterministic sampling for training-data curation (north-star
extension).

Every primitive here is CONTENT-HASH based (md5 of the stable key plus
a seed string), never RNG based, because at 100 TB the properties that
matter are:

- **Reproducibility**: the same (key, seed) always lands on the same
  side of the cut — reruns, retries, and speculative tasks agree, and
  the sample is stable under repartitioning and cluster resizing
  (Spark's ``df.sample`` is none of these across partition changes).
- **Lineage joins**: a membership decision can be recomputed from the
  key alone, so "was this row in the training mix?" is a filter, not a
  lookup table.
- **Engine portability**: md5 hex is identical everywhere, which also
  makes every operator below exactly oracle-checkable against DuckDB.

Sampling granularity is 1/65536 (first 4 hex digits of the hash);
that's the contract, not an approximation bound.

Reference scope: the reference engine samples ad hoc in pandas
(head/slice during exploration); these operators are the scale-correct
generalization a training-data pipeline needs (quota mixing, per-source
caps, stable eval holdouts).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _bucket_hex(key: Column, seed: str) -> Column:
    """First 4 hex chars of md5("<key>:<seed>") — a uniform draw from
    65536 buckets, comparable as a string against a threshold."""
    return F.substring(
        F.md5(F.concat(key.cast("string"), F.lit(":" + seed))), 1, 4
    )


def _threshold_hex(fraction: float) -> str:
    """Hex threshold such that P(bucket < threshold) == round(fraction
    * 65536) / 65536 for a uniform hash. fraction >= 1 returns 'g',
    which compares above every hex digit (keep everything)."""
    frac16 = int(round(min(max(fraction, 0.0), 1.0) * 0x10000))
    return format(frac16, "04x") if frac16 <= 0xFFFF else "g"


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    seed: str = "s0",
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by content hash of
    ``key_col``. Map-side only: no shuffle, no state, prunes at the
    scan's filter stage."""
    return df.filter(_bucket_hex(F.col(key_col), seed) < F.lit(_threshold_hex(fraction)))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    seed: str = "s0",
) -> DataFrame:
    """Per-stratum deterministic sampling — the curation quota-mixing
    primitive (e.g. keep 20% of English, 5% of everything else).

    Still map-side only: the per-row threshold is a CASE over the
    stratum value; no shuffle, no per-stratum pass.
    """
    thresh: Column = F.lit(_threshold_hex(default_fraction))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == value, F.lit(_threshold_hex(frac))
        ).otherwise(thresh)
    return df.filter(_bucket_hex(F.col(key_col), seed) < thresh)


def sample_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    n: int,
    seed: str = "s0",
) -> DataFrame:
    """Deterministic fixed-size sample per group (per-source caps,
    eval-set drawing): rank rows inside each group by content hash and
    keep the first ``n``.

    This is the distributed form of reservoir sampling with a
    hash-order reservoir: one shuffle on ``group_col``, bounded output
    per group, and the same rows win regardless of partitioning or
    cluster size. Ties (hash collisions) break on the key itself, so
    the result is total-order deterministic.
    """
    w = Window.partitionBy(group_col).orderBy(
        _bucket_hex(F.col(key_col), seed),
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(":" + seed))),
        F.col(key_col),
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__rk")
    )


def sample_token_budget(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    text_col: str,
    budgets: Mapping[str, int],
    default_budget: int,
    seed: str = "s0",
) -> DataFrame:
    """Token-budget corpus mixing: per stratum, admit documents in
    content-hash order until the stratum's token budget is exhausted
    (the document that crosses the budget line is excluded).

    The curation primitive behind "N billion tokens of code, M of
    English": budgets are in TOKENS, not documents, and membership is
    deterministic — rerunning with a bigger budget strictly extends the
    previous sample (hash order is a fixed priority), so mixes are
    reproducible and monotone.

    Scale: one shuffle on the stratum key; the running total is a
    cumulative window sum, and the admitted set is a filter on it.
    Output adds ``n_tokens`` and ``cum_tokens``.
    """
    from hummingbirddatapipeline_spark.functions.text import ws_token_count

    budget: Column = F.lit(int(default_budget))
    for value, b in sorted(budgets.items()):
        budget = F.when(F.col(strata_col) == value, F.lit(int(b))).otherwise(budget)
    w = (
        Window.partitionBy(strata_col)
        .orderBy(
            _bucket_hex(F.col(key_col), seed),
            F.md5(F.concat(F.col(key_col).cast("string"), F.lit(":" + seed))),
            F.col(key_col),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn(
        "n_tokens", ws_token_count(F.col(text_col)).cast("long")
    ).withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return out.filter(F.col("cum_tokens") <= budget)


def sample_temperature_mix(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    text_col: str,
    total_budget: int,
    alpha: float = 0.3,
    seed: str = "tmix",
) -> DataFrame:
    """Temperature-weighted mixture sampling (XLM-R, Conneau et al.
    2020 §3.1): stratum sampling probability ``p_s = n_s^alpha /
    sum(n_m^alpha)`` over token counts, flattening the natural skew so
    low-resource strata are upweighted (alpha=1 keeps natural
    proportions, alpha->0 approaches uniform). Each stratum gets a
    token quota ``floor(total_budget * p_s)`` and admits documents in
    content-hash priority order until the quota is spent — the same
    deterministic, monotone admission rule as
    :func:`sample_token_budget`, with the budget COMPUTED from the
    corpus instead of hand-set.

    Quota arithmetic is rounded to 6dp before the floor so both
    engines agree despite last-ulp ``pow`` differences. Scale: one
    stratum-total aggregation (a handful of rows, broadcast back) and
    one cumulative-sum window per stratum — no extra corpus shuffle
    beyond the stratum partition.

    Output adds ``n_tokens``, ``cum_tokens``, ``quota``.
    """
    from hummingbirddatapipeline_spark.functions.text import ws_token_count

    toks = df.withColumn(
        "n_tokens", ws_token_count(F.col(text_col)).cast("long")
    )
    tot = toks.groupBy(strata_col).agg(
        F.sum("n_tokens").cast("double").alias("__nt")
    )
    z = tot.agg(F.sum(F.pow("__nt", F.lit(alpha))).alias("__z"))
    quota = (
        tot.crossJoin(F.broadcast(z))
        .select(
            strata_col,
            F.floor(
                F.round(
                    F.lit(float(total_budget))
                    * F.pow("__nt", F.lit(alpha))
                    / F.col("__z"),
                    6,
                )
            )
            .cast("long")
            .alias("quota"),
        )
    )
    w = (
        Window.partitionBy(strata_col)
        .orderBy(
            _bucket_hex(F.col(key_col), seed),
            F.md5(F.concat(F.col(key_col).cast("string"), F.lit(":" + seed))),
            F.col(key_col),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .join(F.broadcast(quota), strata_col)
    )
    return out.filter(F.col("cum_tokens") <= F.col("quota"))


def split_train_holdout(
    df: DataFrame,
    key_col: str,
    holdout_fraction: float = 0.01,
    seed: str = "holdout",
) -> DataFrame:
    """Tag each row with a stable train/holdout split — the eval
    holdout that must never drift between pipeline runs. Returns the
    input plus a ``split`` column ('train' | 'holdout')."""
    is_holdout = _bucket_hex(F.col(key_col), seed) < F.lit(
        _threshold_hex(holdout_fraction)
    )
    return df.withColumn(
        "split", F.when(is_holdout, "holdout").otherwise("train")
    )


def split_leakfree(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    val_fraction: float = 0.1,
    seed: str = "split0",
    id_a: str = "id_a",
    id_b: str = "id_b",
    labels: DataFrame | None = None,
) -> DataFrame:
    """Leak-free train/validation split: near-dup CLUSTERS, not docs,
    are the unit of assignment, so a validation doc can never have a
    near-duplicate in train (the standard eval-contamination guard when
    corpora are deduplicated at-threshold rather than exactly).

    ``pairs`` is the near-dup edge list (any generator: exact Jaccard,
    MinHash-LSH, embedding LSH). Docs are joined to their connected
    component (operators.graph); singletons form their own cluster.
    The split is the deterministic md5 bucket of the CLUSTER id — same
    idiom as the rest of the sampling family, so membership is stable
    under reruns and repartitioning and both engines can recompute it.

    ``labels`` optionally supplies a precomputed (node, cluster_id)
    closure of ``pairs`` (r15: the shared catalog CC fixture) so
    callers sharing one graph don't re-run the closure; must equal
    ``connected_components(pairs)``.

    Returns docs + (cluster_id, split in {'train','val'}).
    """
    from hummingbirddatapipeline_spark.operators.graph import (
        connected_components,
    )

    cc = (
        labels
        if labels is not None
        else connected_components(pairs, id_a, id_b)
    ).withColumnRenamed("node", id_col)
    joined = docs.join(cc, id_col, "left")
    cluster = F.coalesce(F.col("cluster_id"), F.col(id_col))
    is_val = _bucket_hex(cluster, seed) < F.lit(_threshold_hex(val_fraction))
    return joined.select(
        *[F.col(c) for c in docs.columns],
        cluster.alias("cluster_id"),
        F.when(is_val, F.lit("val")).otherwise(F.lit("train")).alias("split"),
    )


def split_ngram_overlap(
    docs: DataFrame,
    split_assign: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Cross-split n-gram leakage audit — the measurement that PROVES a
    train/val split is leak-free (Lee et al. 2022's argument for dedup
    before splitting): how many distinct word n-grams of the val side
    also occur on the train side.

    ``split_assign`` maps ``id_col`` to 'train' | 'val' (any splitter:
    :func:`split_leakfree`, a naive doc-hash split). Returns ONE row:
    (n_train_docs, n_val_docs, n_val_grams, n_overlap_grams,
    overlap_frac). Run it on two splitters and compare — cluster-unit
    assignment should strictly reduce overlap vs doc-unit assignment.

    Plan: one corpus scan explodes n-grams (hashed to 8-byte longs
    post-explode, the contamination operator's trick — a cross-gram
    xxhash64 collision needs ~2^32 distinct grams for birthday odds),
    ONE hash aggregate on the gram computes per-gram train/val
    membership flags, and a scalar aggregate reduces to the report row
    — no gram self-join, no second scan. Doc counts ride the standard
    single-row crossJoin.
    """
    from hummingbirddatapipeline_spark.operators.contamination import (
        word_ngrams,
    )

    tagged = docs.select(id_col, text_col).join(
        split_assign.select(id_col, split_col), id_col
    )
    flags = (
        tagged.select(
            F.col(split_col),
            F.explode(word_ngrams(F.col(text_col), n)).alias("g"),
        )
        .select(split_col, F.xxhash64("g").alias("gh"))
        .groupBy("gh")
        .agg(
            F.max(
                F.when(F.col(split_col) == "train", 1).otherwise(0)
            ).alias("in_train"),
            F.max(F.when(F.col(split_col) == "val", 1).otherwise(0)).alias(
                "in_val"
            ),
        )
    )
    gram_row = flags.agg(
        F.sum("in_val").cast("long").alias("n_val_grams"),
        F.sum(F.col("in_val") * F.col("in_train"))
        .cast("long")
        .alias("n_overlap_grams"),
    )
    doc_row = tagged.agg(
        F.sum(F.when(F.col(split_col) == "train", 1).otherwise(0))
        .cast("long")
        .alias("n_train_docs"),
        F.sum(F.when(F.col(split_col) == "val", 1).otherwise(0))
        .cast("long")
        .alias("n_val_docs"),
    )
    return (
        doc_row.crossJoin(F.broadcast(gram_row))
        .select(
            "n_train_docs",
            "n_val_docs",
            "n_val_grams",
            "n_overlap_grams",
            F.round(
                F.col("n_overlap_grams").cast("double")
                / F.col("n_val_grams").cast("double"),
                6,
            ).alias("overlap_frac"),
        )
    )


def split_ngram_overlap_multi(
    docs: DataFrame,
    assigns: "list[tuple[str, DataFrame]]",
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """:func:`split_ngram_overlap` for SEVERAL splitters over ONE gram
    explode — the side-by-side audit (leak-free cluster split vs naive
    doc-hash split) without re-exploding the corpus per splitter.

    ``assigns`` is ``[(method_name, assignment_df), ...]``; each
    assignment maps ``id_col`` to 'train' | 'val'. Returns one row per
    method: (split_method, n_train_docs, n_val_docs, n_val_grams,
    n_overlap_grams, overlap_frac) — identical values to running
    :func:`split_ngram_overlap` per assignment (pinned in
    tests/test_sampling.py).

    Plan: every assignment joins onto the corpus ONCE (skinny id ->
    split maps — broadcast at scale), the n-gram explode runs ONCE
    with all K split labels riding each gram row, one hash aggregate
    computes per-gram train/val membership for every method, and a
    scalar aggregate + per-method struct explode emits the K report
    rows. The doc-count pass re-reads only the id/split columns
    (column-pruned scan — no second pass over text). The pre-r11
    catalog row ran the single-splitter audit twice = 2 corpus gram
    explodes (flagged by tools/scan_audit.py; fix move per PLANS.md
    "Deferred to r11")."""
    from hummingbirddatapipeline_spark.operators.contamination import (
        word_ngrams,
    )

    if not assigns:
        raise ValueError("assigns must name at least one splitter")
    names = [m for m, _ in assigns]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate split method names: {names}")

    tagged = docs.select(id_col, text_col)
    for m, a in assigns:
        tagged = tagged.join(
            a.select(F.col(id_col), F.col(split_col).alias(f"__s_{m}")),
            id_col,
        )
    flags = (
        tagged.select(
            *[F.col(f"__s_{m}") for m in names],
            F.explode(word_ngrams(F.col(text_col), n)).alias("g"),
        )
        .select(*[f"__s_{m}" for m in names], F.xxhash64("g").alias("gh"))
        .groupBy("gh")
        .agg(
            *[
                agg
                for m in names
                for agg in (
                    F.max(
                        F.when(F.col(f"__s_{m}") == "train", 1).otherwise(0)
                    ).alias(f"__tr_{m}"),
                    F.max(
                        F.when(F.col(f"__s_{m}") == "val", 1).otherwise(0)
                    ).alias(f"__va_{m}"),
                )
            ]
        )
    )
    gram_row = flags.agg(
        *[
            agg
            for m in names
            for agg in (
                F.sum(f"__va_{m}").cast("long").alias(f"__vg_{m}"),
                F.sum(F.col(f"__va_{m}") * F.col(f"__tr_{m}"))
                .cast("long")
                .alias(f"__og_{m}"),
            )
        ]
    )
    doc_row = tagged.agg(
        *[
            agg
            for m in names
            for agg in (
                F.sum(F.when(F.col(f"__s_{m}") == "train", 1).otherwise(0))
                .cast("long")
                .alias(f"__td_{m}"),
                F.sum(F.when(F.col(f"__s_{m}") == "val", 1).otherwise(0))
                .cast("long")
                .alias(f"__vd_{m}"),
            )
        ]
    )
    per_method = F.array(
        *[
            F.struct(
                F.lit(m).alias("split_method"),
                F.col(f"__td_{m}").alias("n_train_docs"),
                F.col(f"__vd_{m}").alias("n_val_docs"),
                F.col(f"__vg_{m}").alias("n_val_grams"),
                F.col(f"__og_{m}").alias("n_overlap_grams"),
                F.round(
                    F.col(f"__og_{m}").cast("double")
                    / F.col(f"__vg_{m}").cast("double"),
                    6,
                ).alias("overlap_frac"),
            )
            for m in names
        ]
    )
    return (
        doc_row.crossJoin(F.broadcast(gram_row))
        .select(F.explode(per_method).alias("r"))
        .select("r.*")
    )


def weighted_sample_topk(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    seed: str = "w0",
    strata_col: str | None = None,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
    2006, A-ES): each row draws a deterministic uniform u from its
    content hash and ranks by ``-ln(u) / w`` ascending; the k smallest
    ranks per stratum are an exact weighted-without-replacement sample
    — the primitive behind quality-weighted corpus subsampling ("keep
    50k docs, proportional to quality score").

    Like the rest of this module the randomness is CONTENT-HASH
    derived, never RNG: u is built from the first 13 hex digits (52
    bits, exactly representable in a double) of md5(key:seed), so the
    sample is rerun/repartition-stable, membership is recomputable
    from the key alone, and the identical arithmetic runs in ANSI SQL
    (CAST('0x' || hex AS BIGINT) — exactly oracle-checkable).

    Rows with NULL or non-positive weight are excluded (A-ES is
    defined for w > 0). Returns the input columns plus
    ``sample_rank`` (1..k per stratum). One window shuffle on the
    stratum key; with no ``strata_col`` the global top-k still uses
    the rank window (single partition) — at cluster scale pass a
    stratum or pre-aggregate, exactly as with any global top-k.
    """
    hex13 = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(":" + seed))),
        1,
        13,
    )
    val = F.conv(hex13, 16, 10).cast("long").cast("double")
    u = (val + F.lit(0.5)) / F.lit(float(1 << 52))
    rank_key = -F.log(u) / F.col(weight_col).cast("double")
    part = [strata_col] if strata_col else []
    w = Window.partitionBy(*part).orderBy(
        rank_key.asc(), F.col(key_col).asc()
    )
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def contrastive_negatives(
    items: DataFrame,
    id_col: str,
    k: int,
    seed: str = "neg0",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    item draws ``k`` pseudo-random OTHER items as negatives —
    (id, neg_rank 1..k, neg_id) — with the draw derived from content
    hashes, never an RNG, so the pairing is rerun/repartition-stable
    and exactly reproducible in ANSI SQL.

    Construction: items are ranked 1..n by id (one window pass); draw
    j for item x is ``1 + md5_52bit(x:j:seed) mod (n-1)`` over the
    OTHER ranks (values >= own rank shift up by one — the classic
    skip-self trick, uniform over the n-1 others), then an equi-join
    on rank resolves the id. Two narrow shuffles (rank window + rank
    join) and a k-element explode — no cross join; at 100 TB both
    sides are skinny (id, rank) frames. The global row_number is the
    one single-reducer step — at billions of items replace it with a
    precomputed dense-id mapping (zipWithIndex-style two-phase rank)
    and the rest of the plan is unchanged; the ranking is
    per-retraining-set work, not per-query. Draws for one item are
    independent; duplicates among an item's k negatives are possible
    (sampling WITH replacement across draws) and expected at
    k << n — the standard contrastive regime.
    """
    n_items = items.select(id_col).count()
    if n_items < 2:
        raise ValueError("contrastive_negatives needs >= 2 items")
    w = Window.orderBy(id_col)
    ranked = items.select(id_col).withColumn(
        "__rank", F.row_number().over(w).cast("long")
    )
    draws = ranked.select(
        id_col,
        "__rank",
        F.explode(
            F.array(*[F.lit(j) for j in range(1, k + 1)])
        ).alias("neg_rank"),
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col(id_col).cast("string"),
                    F.lit(":"),
                    F.col("neg_rank").cast("string"),
                    F.lit(":" + seed),
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    raw = (h % F.lit(n_items - 1)) + 1  # 1..n-1
    target = F.when(raw >= F.col("__rank"), raw + 1).otherwise(raw)
    drawn = draws.withColumn("__neg_rank_idx", target)
    lookup = ranked.select(
        F.col("__rank").alias("__neg_rank_idx"),
        F.col(id_col).alias("neg_id"),
    )
    return drawn.join(lookup, "__neg_rank_idx").select(
        id_col, "neg_rank", "neg_id"
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 100,
    n_buckets: int = 4096,
    smoothing: float = 1.0,
    seed: str = "dsir0",
    target_pred: Column | None = None,
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al., NeurIPS
    2023, "Data Selection for Language Models via Importance
    Resampling" — the DSIR pipeline): fit bag-of-hashed-ngram unigram
    models over a small TARGET corpus and the RAW pool, weight every
    raw document by its importance log-ratio, and draw a k-document
    sample with Gumbel-top-k — the published recipe for "select
    pretraining data that looks like the target domain".

    Features are hashed unigram+bigram counts into ``n_buckets``
    buckets (md5-derived buckets here so the identical arithmetic runs
    in ANSI SQL; swap the hash for xxhash64 at 100 TB — one line, no
    shape change). Per-bucket probabilities use add-``smoothing``
    estimates; a raw doc's log-weight is sum over its gram occurrences
    of ln(p_target(b)) - ln(p_raw(b)). The Gumbel noise is the
    repo's content-hash uniform (52-bit md5 — rerun/repartition-stable,
    never an RNG), so the selection is deterministic and exactly
    reproducible cross-engine; weights and keys round 6dp.

    Scale shape: ONE corpus-scale gram pass (the raw stream is
    materialized once and feeds both the raw model fit and the
    per-doc weight sum — r15) plus the small target fit, ONE broadcast
    join of the <= n_buckets log-ratio table onto that stream, and one
    rank window for the top-k. The target side is small by definition (the
    domain exemplar set); nothing ever joins corpus-to-corpus. For a
    sharded global top-k at extreme scale, rank within strata and
    merge, exactly as with weighted_sample_topk.

    Returns the k selected rows: (id, dsir_logweight, gumbel_key,
    sample_rank).
    """
    from hummingbirddatapipeline_spark.functions.text import ws_tokens

    def grams(df: DataFrame, *keep: str) -> DataFrame:
        toks = ws_tokens(F.lower(F.col(text_col)))
        n = F.size(toks)
        bigrams = F.zip_with(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        g = F.explode(F.concat(toks, bigrams)).alias("__g")
        bucket = (
            F.conv(F.substring(F.md5(F.col("__g")), 1, 13), 16, 10)
            .cast("long")
            % n_buckets
        )
        return df.select(*keep, g).select(*keep, bucket.alias("bucket"))

    B = float(n_buckets)
    s = float(smoothing)
    # One corpus gram pass, not two (r15, guide §1.2): the raw gram
    # stream feeds BOTH the raw model fit and the per-doc weight sum —
    # materialize it once and let both read the blocks. Identical
    # arithmetic (same occurrence multiset, same sums); the checkpoint
    # is skinny (id, bucket) longs. At 100 TB this frame is the thing
    # you'd persist between the fit and the weighting pass anyway.
    #
    # When the TARGET is a predicate-defined subset of raw
    # (``target_pred`` — e.g. the catalog row's lang = 'en' exemplars),
    # the target fit ALSO reads this stream: the gram multiset of
    # ``raw.filter(pred)`` is exactly the pred-flagged slice of the raw
    # stream, so carrying one boolean through the checkpoint replaces
    # two further corpus-subset scans (the fit, plus the empty-target
    # guard's re-evaluation — Catalyst inlines repeated references)
    # with zero. Measured at sf0.1: 3 full md5-gram passes -> 1.
    # The two bucket-count tables are checkpointed too (r15 second
    # pass, guide §1.2): the log-ratio table's lineage references
    # t_counts and r_counts TWICE each (the ratio join + each side's
    # total), and Catalyst inlines every reference — measured at
    # sf0.1, the final plan re-read and re-aggregated the 49 MB gram
    # checkpoint FIVE times per pass (profiler: five 32-task stages,
    # in=49.2MB each). Each table is <= n_buckets rows of (bucket,
    # count) — bounded model state, the same class as the collected
    # vocab stores.
    if target_pred is not None:
        raw_grams = grams(
            raw.withColumn("__t", target_pred), id_col, "__t"
        ).localCheckpoint(eager=False)
        t_counts = (
            raw_grams.filter(F.col("__t"))
            .groupBy("bucket")
            .agg(F.count("*").cast("double").alias("t_n"))
            .localCheckpoint(eager=False)
        )
    else:
        if target is None:
            raise ValueError(
                "dsir_select: pass a target DataFrame or target_pred"
            )
        raw_grams = grams(raw, id_col).localCheckpoint(eager=False)
        t_counts = grams(target).groupBy("bucket").agg(
            F.count("*").cast("double").alias("t_n")
        ).localCheckpoint(eager=False)
    # loud guard, not silent degeneracy: an empty/gram-less target
    # would NULL t_total and every weight with it (the PSI empty-
    # reference lesson); the probe is one bounded action on the small
    # exemplar side (and, in the subset regime, doubles as the
    # checkpoint's materializing action)
    if not t_counts.take(1):
        raise ValueError(
            "dsir_select: target corpus has no grams — cannot fit the "
            "target model"
        )
    r_counts = raw_grams.groupBy("bucket").agg(
        F.count("*").cast("double").alias("r_n")
    ).localCheckpoint(eager=False)
    t_total = t_counts.agg(F.sum("t_n").alias("t_total"))
    r_total = r_counts.agg(F.sum("r_n").alias("r_total"))
    # raw-side buckets drive the join: a raw gram always has r_n >= 1;
    # buckets unseen in the target get the smoothed floor. The totals
    # ride single-row scalar broadcasts so a missing target bucket
    # never NULLs the denominator.
    ratio = (
        r_counts.join(t_counts, "bucket", "left")
        .crossJoin(F.broadcast(t_total))
        .crossJoin(F.broadcast(r_total))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("t_n"), F.lit(0.0)) + s)
                    / (F.col("t_total") + s * B)
                )
                - F.log((F.col("r_n") + s) / (F.col("r_total") + s * B))
            ).alias("log_ratio"),
        )
    )
    doc_w = (
        raw_grams
        .join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(F.round(F.sum("log_ratio"), 6).alias("dsir_logweight"))
    )
    hex13 = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + seed))),
        1,
        13,
    )
    val = F.conv(hex13, 16, 10).cast("long").cast("double")
    u = (val + F.lit(0.5)) / F.lit(float(1 << 52))
    gumbel = -F.log(-F.log(u))
    keyed = doc_w.withColumn(
        "gumbel_key", F.round(F.col("dsir_logweight") + gumbel, 6)
    )
    w = Window.orderBy(F.col("gumbel_key").desc(), F.col(id_col))
    return (
        keyed.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def doremi_reweight(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    lr: float = 100.0,
    eps: float = 0.3,
    token_budget: int = 1_000_000,
) -> DataFrame:
    """DoReMi-shaped domain-mixture reweighting (Xie et al. 2023,
    arXiv:2305.10429, one multiplicative-weights step): upweight
    domains with EXCESS LOSS relative to the corpus, smooth with the
    uniform mixture, and emit per-domain token targets for the next
    mixing pass — the step that turns "sample by natural proportions"
    (:func:`sample_temperature_mix`) into "sample by where the model
    has the most to learn".

    The excess-loss proxy is fully in-engine (the paper uses a proxy
    model; any per-domain loss signal slots into the same update): the
    corpus unigram LM's per-domain cross-entropy ``ce_d = mean over
    domain token occurrences of -ln(c_w / T)`` minus the corpus-wide
    ``ce``, clipped at 0. The update is the paper's exponentiated
    gradient step::

        w_d    ∝ ref_d * exp(lr * excess_d)       ref_d = n_d / N
        share_d = (1 - eps) * w_d / Z + eps / K    (uniform smoothing)

    Determinism: per-token surprisal is rounded to 10dp and summed as
    DECIMAL(20,10) — exact, associative, overflow-free at any corpus
    size — so ``ce_d`` is bit-identical on any engine and any
    partitioning (the pagerank exact-longs regime, applied from day
    one); ce/excess round 6dp; the share rounds 6dp after the
    (K-domain, tiny) normalization. ``lr`` is the DoReMi step size —
    at unigram-CE spreads (~1e-2 nats) a demonstration lr of ~1e2
    separates domains; a real proxy-loss feed uses the paper's 1.0.

    Scale shape: ONE corpus token explode + broadcast count join (the
    unigram_logprob plan), ONE hash aggregate to K domain rows, then
    K-row arithmetic — the corpus never shuffles at document width.

    Output: (domain, n_tokens, ce, excess, doremi_share,
    target_tokens = floor(round(token_budget * share, 6))).
    """
    from hummingbirddatapipeline_spark.functions.text import ws_tokens

    toks = df.select(
        F.col(domain_col).alias("domain"),
        F.explode(ws_tokens(F.col(text_col))).alias("w"),
    )
    # vocabulary-sized count table consumed by the scoring join AND the
    # corpus total — checkpoint so each reference does not re-inline
    # the corpus explode (the bigram_logprob move)
    counts = (
        toks.groupBy("w")
        .agg(F.count("*").cast("double").alias("c"))
        .localCheckpoint(eager=False)
    )
    total = counts.agg(F.sum("c").alias("t"))
    term = (
        toks.join(F.broadcast(counts), "w")
        .crossJoin(F.broadcast(total))
        .select(
            "domain",
            F.round(-F.log(F.col("c") / F.col("t")), 10)
            .cast("decimal(20,10)")
            .alias("__nll"),
        )
    )
    # K rows of bounded model state consumed by the corpus-total
    # aggregate AND the per-domain arithmetic: without a checkpoint
    # each downstream reference re-inlined the WHOLE corpus lineage —
    # the executed plan held 12 corpus text scans (r11 scan audit,
    # caught at registration); now 2 (count table + scoring pass, the
    # documented two-pass LM shape)
    dom = term.groupBy("domain").agg(
        F.count("*").alias("n_tokens"), F.sum("__nll").alias("__s")
    ).localCheckpoint(eager=False)
    tot = dom.agg(
        F.sum("__s").alias("__sum_all"),
        F.sum("n_tokens").alias("__n_all"),
        F.count("*").alias("__n_dom"),
    )
    ce_d = F.round(F.col("__s").cast("double") / F.col("n_tokens"), 6)
    ce_all = F.round(
        F.col("__sum_all").cast("double") / F.col("__n_all"), 6
    )
    excess = F.greatest(F.lit(0.0), F.round(ce_d - ce_all, 6))
    wgt = (F.col("n_tokens") / F.col("__n_all")) * F.exp(
        F.lit(lr) * excess
    )
    pre = dom.crossJoin(F.broadcast(tot)).select(
        "domain",
        "n_tokens",
        ce_d.alias("ce"),
        excess.alias("excess"),
        wgt.alias("__w"),
        "__n_dom",
    )
    z = pre.agg(F.sum("__w").alias("__z_norm"))
    share = (F.lit(1.0 - eps) * F.col("__w") / F.col("__z_norm")) + (
        F.lit(eps) / F.col("__n_dom")
    )
    return pre.crossJoin(F.broadcast(z)).select(
        "domain",
        "n_tokens",
        "ce",
        "excess",
        F.round(share, 6).alias("doremi_share"),
        F.floor(F.round(F.lit(float(token_budget)) * share, 6))
        .cast("long")
        .alias("target_tokens"),
    )


def unimax_allocation(
    df: DataFrame,
    token_budget: int,
    n_epochs: float = 4.0,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """UniMax language-budget allocation (Chung et al. 2023,
    arXiv:2304.09151): spread ``token_budget`` as UNIFORMLY as
    possible across languages subject to the per-language repeat cap
    ``cap_l = floor(n_epochs * n_l)`` — low-resource languages get
    everything they can contribute without exceeding ``n_epochs``
    passes over their corpus, and the residual budget splits equally
    among the uncapped high-resource ones. The paper's alternative to
    temperature sampling (:func:`sample_temperature_mix`): no tuned
    temperature, and over-repetition of small languages is bounded by
    construction.

    The closed form is classic waterfilling, computed WITHOUT the
    sequential scan: with languages sorted by cap ascending (ties ->
    language name), language i is capped iff
    ``cap_i * (K - i + 1) <= budget - prefix_cap_{i-1}`` — that test
    is non-increasing along the sort order (caps ascend), so the
    per-row window test reproduces the sequential greedy exactly.
    Every comparison is BIGINT (multiply, never divide) and the
    uncapped share is integer floor division, so the whole allocation
    is exact, associative, and engine-portable; at most
    ``n_uncapped - 1`` tokens of the budget go unallocated (reported
    via the alloc column sum, never silently over-spent).

    Scale shape: ONE hash aggregate to K language rows (token counts
    come from :func:`ws_token_count`, no explode), then K-row window
    arithmetic — the corpus is touched once at (lang, count) width.

    Output: (lang, n_tokens, cap_tokens, is_capped, alloc_tokens,
    epochs_used = round(alloc / n_tokens, 6)), one row per language.
    """
    from hummingbirddatapipeline_spark.functions.text import ws_token_count

    langs = (
        df.select(
            F.col(lang_col).alias("lang"),
            ws_token_count(F.col(text_col)).cast("long").alias("__t"),
        )
        .groupBy("lang")
        .agg(F.sum("__t").alias("n_tokens"))
        # K rows of model state: materialize so the waterfilling's
        # self-references (totals, stats) never rescan the corpus —
        # "touched once" is a plan contract, not a hope
        .localCheckpoint()
    )
    base = langs.select(
        "lang",
        "n_tokens",
        F.floor(F.round(F.lit(float(n_epochs)) * F.col("n_tokens"), 6))
        .cast("long")
        .alias("cap_tokens"),
    )
    # K-row model state: the single-partition window is over language
    # rows (bounded), never over the corpus
    w = Window.orderBy("cap_tokens", "lang")
    tot = base.agg(F.count("*").alias("__k"))
    ranked = base.crossJoin(F.broadcast(tot)).select(
        "*",
        F.row_number().over(w).alias("__i"),
        (F.sum("cap_tokens").over(w) - F.col("cap_tokens")).alias("__pfx"),
    )
    budget = F.lit(int(token_budget)).cast("long")
    capped = (
        F.col("cap_tokens") * (F.col("__k") - F.col("__i") + 1)
        <= budget - F.col("__pfx")
    )
    tagged = ranked.select("*", capped.alias("is_capped"))
    stats = tagged.agg(
        F.coalesce(
            F.sum(F.when(F.col("is_capped"), F.col("cap_tokens"))), F.lit(0)
        ).alias("__csum"),
        F.coalesce(
            F.sum(F.when(F.col("is_capped"), F.lit(1))), F.lit(0)
        ).alias("__ncap"),
    )
    n_unc = F.col("__k") - F.col("__ncap")
    share = F.when(
        n_unc > 0,
        F.floor((budget - F.col("__csum")) / n_unc).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    alloc = F.when(F.col("is_capped"), F.col("cap_tokens")).otherwise(share)
    return tagged.crossJoin(F.broadcast(stats)).select(
        "lang",
        "n_tokens",
        "cap_tokens",
        "is_capped",
        alloc.alias("alloc_tokens"),
        F.round(alloc / F.col("n_tokens"), 6).alias("epochs_used"),
    )


def interleave_order(
    docs: DataFrame,
    weights: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "mix0",
) -> DataFrame:
    """Deterministic stride-scheduled mixture ordering — the
    reproducible TRAINING-ORDER file. Every data loader that mixes
    sources by weight needs a total order over the corpus in which
    source ``s`` appears with long-run frequency proportional to
    ``weights[s]``; stride scheduling (Waldspurger & Weihl, OSDI '95 —
    the deterministic counterpart of multinomial sampling) gives it:
    the ``i``-th document of source ``s`` (1-based, in content-hash
    shuffled order) gets virtual time ``i / w_s``, and the global
    order sorts by (virtual time, source, i).

    The scale insight: that global sort NEVER RUNS. Because virtual
    times are rationals with per-source constant denominators, the
    global position of (s, i) is a CLOSED FORM over the K sources::

        seq(s, i) = 1 + sum_s' min(n_s', (i*w_s' - 1) div w_s)
                      + sum_{s' < s} [ i*w_s' mod w_s = 0
                                       and (i*w_s' div w_s) <= n_s' ]

    (strict predecessors by cross-multiplied exact-integer compare,
    plus tie predecessors from lexically-smaller sources) — all BIGINT
    ``div``/``mod``, no floats, no global exchange: ONE source-keyed
    exchange for the within-source row_number, then a map-side
    K-term aggregate per row. The (weight, count) table is K rows of
    bounded model state (the unimax K-languages class).

    Within-source shuffle order is the repo's content-hash uniform
    (full md5 hex of ``"<id>:<seed>"``, id tiebreak) — rerun- and
    partitioning-stable, reproducible in ANSI SQL.

    Returns (id, source, src_seq, global_seq): global_seq is a
    permutation of 1..N (pinned in tests), and any prefix of it is
    itself weight-proportional — resumable mid-epoch at any step.
    """
    if not weights:
        raise ValueError("interleave_order: weights must be non-empty")
    for s, w in weights.items():
        if int(w) <= 0:
            raise ValueError(
                f"interleave_order: weight for {s!r} must be a positive "
                f"integer, got {w!r}"
            )
    counts = {
        r["s"]: r["n"]
        for r in docs.groupBy(F.col(source_col).alias("s"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    missing = sorted(set(counts) - set(weights))
    if missing:
        raise ValueError(
            f"interleave_order: no weight for sources {missing}"
        )
    entries = ", ".join(
        f"named_struct('s', '{s}', 'w', CAST({int(weights[s])} AS BIGINT),"
        f" 'n', CAST({int(counts[s])} AS BIGINT))"
        for s in sorted(counts)
    )
    wo = Window.partitionBy(source_col).orderBy(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + seed))),
        id_col,
    )
    ranked = docs.select(
        id_col,
        F.col(source_col).alias("source"),
        F.row_number().over(wo).cast("long").alias("src_seq"),
    )
    wmap = F.create_map(
        *[
            c
            for s in sorted(counts)
            for c in (F.lit(s), F.lit(int(weights[s])).cast("long"))
        ]
    )
    gseq = F.expr(
        f"""aggregate(array({entries}), CAST(1 AS BIGINT), (acc, e) ->
          acc + least(e.n, (src_seq * e.w - 1) div __w)
              + CASE WHEN e.s < source
                          AND (src_seq * e.w) % __w = 0
                          AND (src_seq * e.w) div __w <= e.n
                     THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)"""
    )
    return (
        ranked.withColumn("__w", F.element_at(wmap, F.col("source")))
        .select(
            id_col,
            "source",
            "src_seq",
            gseq.alias("global_seq"),
        )
    )


def epoch_plan(
    docs: DataFrame,
    token_budget: int,
    n_epochs: float = 4.0,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "ep0",
) -> DataFrame:
    """The BUDGET -> ORDER composition: UniMax waterfilling decides
    how many tokens each language contributes to the epoch
    (:func:`unimax_allocation`), and stride scheduling turns those
    allocations into the deterministic global training order
    (:func:`interleave_order` with the allocations as weights) — the
    complete epoch manifest a data loader replays byte-for-byte.
    Languages whose allocation is zero are simply not in this epoch
    (stride weight must be positive), which is exactly UniMax's
    verdict for them.

    Because interleave prefixes are weight-proportional, ANY prefix of
    the plan respects the UniMax mixture — a run stopped at 40% of the
    budget consumed ~40% of every language's allocation, the property
    that makes mid-epoch checkpoint/resume safe.

    Returns (id, lang, lang_seq, global_seq). Scale shape: UniMax's
    one corpus aggregate to K language rows, the K-row allocation
    collect (bounded model state, the unimax class), then
    interleave_order's ONE language-keyed exchange + closed-form
    map-side position arithmetic — no global sort, end to end.
    """
    alloc = unimax_allocation(
        docs, token_budget, n_epochs, lang_col=lang_col, text_col=text_col
    )
    weights = {
        r["lang"]: int(r["alloc_tokens"])
        for r in alloc.select("lang", "alloc_tokens").collect()
        if int(r["alloc_tokens"]) > 0
    }
    if not weights:
        raise ValueError("epoch_plan: budget funds no language")
    sub = docs.filter(F.col(lang_col).isin(list(weights)))
    out = interleave_order(
        sub, weights, source_col=lang_col, id_col=id_col, seed=seed
    )
    return out.select(
        F.col(id_col),
        F.col("source").alias("lang"),
        F.col("src_seq").alias("lang_seq"),
        "global_seq",
    )


def priority_weighted_sample(
    docs: DataFrame,
    k: int = 50,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    seed: str = "pw0",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via exponential priorities
    (Efraimidis & Spirakis 2006, the exponential-clocks form): each
    item draws key = -ln(u)/w and the k SMALLEST keys win — inclusion
    probability proportional to weight, one pass, no global state
    beyond the top-k. The deterministic core: u comes from the
    portable 52-bit md5 of the id (u = (h + 1) / 2^52, never 0), so
    the sample is content-addressed — rerun/repartition-stable and
    engine-replayable, the same no-RNG rule every sampling row in this
    repo follows.

    Keys are rounded to 6dp BEFORE the (key asc, id asc) cut (ln is
    the one libm call — the unigram_logprob precedent), so the
    selection is cross-engine deterministic. Zero- or negative-weight
    items are excluded (they have no sampling mass).

    Returns the k winners: (id, weight, priority, rank).

    Scale shape: priorities are map-side; the top-k is a
    TakeOrderedAndProject-shaped rank window — at real scale the
    standard per-partition top-k + merge; no shuffle of the corpus,
    only k rows survive.
    """
    if k < 1:
        raise ValueError("priority_weighted_sample: k >= 1")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col(id_col).cast("string"), F.lit(":" + seed)
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(1 << 52))
    w = F.col(weight_col).cast("double")
    priority = F.round(-F.log(u) / w, 6)
    base = docs.filter(F.col(weight_col) > 0).select(
        F.col(id_col),
        F.col(weight_col).cast("long").alias("weight"),
        priority.alias("priority"),
    )
    win = Window.orderBy(F.col("priority").asc(), F.col(id_col))
    return base.withColumn(
        "rank", F.row_number().over(win)
    ).filter(F.col("rank") <= k)
