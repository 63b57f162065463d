"""Training-corpus curation pipeline (north-star composite): the
standard LLM-data funnel — metadata/language filter -> heuristic
quality gate -> exact dedup -> near-dup dedup -> clean corpus + a
per-stage attrition report.

Composes the engine's text/dedup operators into one job; every stage
is native expressions, and the stats funnel is DuckDB-oracled through
the catalog (curation_funnel). At 100 TB the near-dup stage swaps the
exact inverted-index join for the MinHash-LSH path
(operators.dedup.near_dup_pairs_minhash) — same drop rule, bounded
candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hummingbirddatapipeline_spark.functions.text import fingerprint, quality_score
from hummingbirddatapipeline_spark.operators.dedup import (
    jaccard_pairs_prefix,
    near_dup_pairs_minhash,
)


def curate_corpus(
    docs: DataFrame,
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.6,
    jaccard_threshold: float = 0.85,
    use_lsh: bool = False,
    use_clusters: bool = False,
    max_top_gram_char_frac: float | None = None,
    nll_band: tuple[float, float] | None = None,
    precomputed_pairs: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (clean_corpus, funnel_stats).

    Stages: language whitelist -> quality gate -> exact dedup on the
    normalized-text fingerprint (keep lowest doc_id) -> near-dup drop
    (for each pair over the Jaccard threshold, drop the higher id —
    the greedy keep-first rule). ``use_lsh`` switches the pair
    generator to MinHash-LSH for scale.

    ``use_clusters=True`` replaces the greedy drop with connected-
    components dedup (operators.graph): pairs close into clusters and
    exactly the min-id representative of each cluster survives. The
    greedy rule under-drops transitive chains — a doc whose every edge
    points at a LARGER id is never an id_b, so it survives even though
    it is (transitively) a near-dup of the cluster representative;
    clustering drops it. Costs O(log n) extra shuffle rounds.

    ``max_top_gram_char_frac`` (e.g. the Gopher 2-gram threshold 0.20)
    inserts a repetition gate after the quality gate: docs whose top
    word-2-gram covers more than that fraction of characters are
    dropped (functions.text.repetition_stats), adding a
    ``repetition_kept`` funnel stage.

    ``nll_band=(lo, hi)`` inserts the perplexity-filter shape (CCNet
    "keep the middle" rule) after the repetition gate: docs whose mean
    corpus-unigram surprisal (operators.retrieval.unigram_logprob,
    scored against the FULL input corpus so the reference distribution
    is gate-independent) falls outside the band are dropped — too low
    is boilerplate, too high is noise. Adds an ``nll_kept`` stage.

    ``precomputed_pairs`` reuses an existing near-dup pair set for the
    WHOLE corpus (e.g. dedup_q.shared_jaccard_pairs) instead of
    re-running pair generation on the gated survivors. Sound because
    pairwise Jaccard is pair-local: the pair set of a subset equals
    the full pair set restricted to pairs whose BOTH endpoints
    survive — which is exactly the semi-join applied here. The caller
    must ensure the precomputed set used the same threshold and
    shingling as this funnel's near-dup stage.

    Plan shape (the r10 rewrite): every per-doc gate is a COLUMN over
    ONE corpus scan — a skinny localCheckpointed flags frame
    (doc_id, gate booleans, fingerprint) — and the per-stage funnel
    counts are conditional sums over that frame in a single
    aggregate. The previous shape derived each stage DataFrame from
    the last and counted each one, so Catalyst re-inlined the whole
    gate lineage per stage count: the gated funnel's physical plan
    held 27 corpus text scans; this one holds the irreducible few
    (the flags scan, the two the corpus-LM nll gate needs, and — only
    when pairs are not precomputed — the pair generator's). The
    near-dup stage and the clean-corpus output run on ids-only frames
    against the checkpoint, never on text.
    """
    q6 = lambda x: F.floor(x * 1000000 + 0.5) / 1000000  # noqa: E731

    cols = [
        F.col("doc_id"),
        F.col("lang").isin(list(langs)).alias("__lang_ok"),
        (F.round(quality_score(F.col("text")), 2) >= min_quality).alias(
            "__q_ok"
        ),
        fingerprint(F.col("text")).alias("__fp"),
    ]
    if max_top_gram_char_frac is not None:
        from hummingbirddatapipeline_spark.functions.text import (
            gram_run_stats,
            word_gram_array,
        )

        cols += [
            F.length(F.col("text")).alias("__chars"),
            word_gram_array(F.col("text"), 2).alias("__g"),
        ]
    flags = docs.select(*cols)

    stages = ["lang_kept", "quality_kept"]
    gate = F.col("__lang_ok") & F.col("__q_ok")
    flags = flags.withColumn("__s_quality_kept", gate).withColumn(
        "__s_lang_kept", F.col("__lang_ok")
    )
    if max_top_gram_char_frac is not None:
        # same arithmetic as functions.text.repetition_stats
        # (top_gram_char_frac, 6dp floor-quantized, gram-less docs 0.0)
        s = gram_run_stats("__g")
        flags = flags.withColumn("__rs", s)
        topchars = F.col("__rs")["top"]["c"] * F.col("__rs")["top"]["l"]
        frac = F.coalesce(
            q6(topchars / F.nullif(F.col("__chars"), F.lit(0))), F.lit(0.0)
        )
        flags = flags.withColumn(
            "__s_repetition_kept", gate & (frac <= max_top_gram_char_frac)
        ).drop("__g", "__rs", "__chars")
        # rebind to the materialized column: the frac expression
        # references __rs/__chars, which are dropped above
        gate = F.col("__s_repetition_kept")
        stages.append("repetition_kept")
    if nll_band is not None:
        from hummingbirddatapipeline_spark.operators.retrieval import (
            unigram_logprob,
        )

        lo, hi = nll_band
        nll = unigram_logprob(docs).select("doc_id", "mean_nll")
        flags = flags.join(nll, "doc_id", "left")
        flags = flags.withColumn(
            "__s_nll_kept",
            gate
            & F.coalesce(
                F.col("mean_nll").between(F.lit(lo), F.lit(hi)), F.lit(False)
            ),
        ).drop("mean_nll")
        gate = F.col("__s_nll_kept")
        stages.append("nll_kept")

    # exact dedup: among fully-gated docs, keep the min id per
    # fingerprint — a window min over the fp partition (min skips the
    # NULLs the when() assigns to gate-failing rows)
    win = Window.partitionBy("__fp")
    flags = flags.withColumn("__pass", gate).withColumn(
        "__s_exact_deduped",
        F.col("__pass")
        & (
            F.col("doc_id")
            == F.min(F.when(F.col("__pass"), F.col("doc_id"))).over(win)
        ),
    )
    stages.append("exact_deduped")
    # one materialization of the skinny flags (id + booleans + fp):
    # the stats aggregate, the near-dup id set, and the clean-corpus
    # semi-join all reuse it instead of re-running the corpus scan.
    # eager=True is deliberate (r10 ADVICE weighed and DECLINED): the
    # scan-audit receipts inspect the PLAN without executing, and a
    # lazy checkpoint leaves the full corpus lineage inlined under
    # every consumer until the first action — the executed-plan "0
    # text scans" contract depends on materialize-at-build. The cost
    # lands once per (session, sf_dir) via the catalog plan cache.
    flags = flags.localCheckpoint(eager=True)

    exact_ids = flags.filter(F.col("__s_exact_deduped")).select("doc_id")
    if precomputed_pairs is not None:
        pairs = (
            precomputed_pairs.join(
                exact_ids.withColumnRenamed("doc_id", "id_a"),
                "id_a",
                "left_semi",
            ).join(
                exact_ids.withColumnRenamed("doc_id", "id_b"),
                "id_b",
                "left_semi",
            )
        )
    else:
        pair_fn = near_dup_pairs_minhash if use_lsh else jaccard_pairs_prefix
        pairs = pair_fn(
            docs.join(exact_ids, "doc_id", "left_semi"),
            "text",
            "doc_id",
            threshold=jaccard_threshold,
            shingle_size=1,
        )
    if use_clusters:
        from hummingbirddatapipeline_spark.operators.graph import (
            connected_components,
        )

        losers = (
            connected_components(pairs)
            .filter(F.col("node") != F.col("cluster_id"))
            .select(F.col("node").alias("doc_id"))
        )
    else:
        drops = pairs.select(F.col("id_b").alias("doc_id")).distinct()
        losers = drops
    clean_ids = exact_ids.join(losers, "doc_id", "left_anti")
    clean = docs.join(clean_ids, "doc_id", "left_semi")

    counts = flags.agg(
        F.count("*").alias("input"),
        # coalesce: SUM over zero rows is NULL — an EMPTY input corpus
        # must still report every stage as 0, not NULL (r10 ADVICE)
        *[
            F.coalesce(F.sum(F.col(f"__s_{s}").cast("int")), F.lit(0))
            .cast("long")
            .alias(s)
            for s in stages
        ],
    )
    stack_args = ", ".join(
        f"'{s}', {s}" for s in ["input", *stages]
    )
    stats = counts.selectExpr(
        f"stack({len(stages) + 1}, {stack_args}) AS (stage, n)"
    ).unionByName(
        clean_ids.select(F.count("*").alias("n")).withColumn(
            "stage", F.lit("near_deduped")
        ).select("stage", "n")
    )
    return clean, stats.select("stage", "n")


def corpus_stats(docs: DataFrame) -> DataFrame:
    """Per-source dataset card — the summary table a corpus release
    ships with (datasheet/data-card practice; Gebru et al. 2021): doc
    and token volume, mean heuristic quality, language spread (distinct
    langs + Shannon entropy of the language mix), and the exact-dup
    rate (1 - distinct fingerprints / docs).

    Plan: one scan computes quality/token/fingerprint columns, then two
    hash aggregates keyed on source and (source, lang) — both map-side
    combined; the per-source table (thousands of rows at worst) joins
    back broadcast. Cross-engine determinism: all counts stay exact
    BIGINTs; only the final ratios divide, and entropy/mean-quality are
    rounded (6dp/4dp) against summation-order drift.
    """
    from hummingbirddatapipeline_spark.functions.text import ws_token_count

    base = docs.select(
        "source",
        "lang",
        F.round(quality_score(F.col("text")), 2).alias("q"),
        ws_token_count(F.col("text")).cast("long").alias("n_tok"),
        fingerprint(F.col("text")).alias("f"),
    )
    per_src = base.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.round(F.avg("q"), 4).alias("mean_quality"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("f").alias("n_unique"),
    )
    # Shannon entropy via H = ln(n) - sum(c * ln c) / n: algebraically
    # identical to -sum(p ln p) but needs only the (source, lang)
    # counts — no join back to the per-source totals, so the heavy
    # quality/fingerprint branch is computed exactly once
    lc = base.groupBy("source", "lang").agg(F.count("*").alias("c"))
    c_d = F.col("c").cast("double")
    ent = lc.groupBy("source").agg(
        F.round(
            F.log(F.sum("c").cast("double"))
            - F.sum(c_d * F.log(c_d)) / F.sum("c").cast("double"),
            6,
        ).alias("lang_entropy")
    )
    return (
        per_src.join(ent, "source")
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "mean_quality",
            "n_langs",
            F.round(
                F.lit(1.0)
                - F.col("n_unique").cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("dup_rate"),
            "lang_entropy",
        )
    )


def source_gate(
    docs: DataFrame,
    pairs: DataFrame,
    min_mean_quality: float = 0.87,
    max_near_dup_frac: float = 0.80,
) -> tuple[DataFrame, DataFrame]:
    """Domain-level curation gate (the FineWeb/RefinedWeb move): score
    each SOURCE by its aggregate signals — mean heuristic quality and
    the fraction of its docs involved in near-dup pairs — and drop
    whole sources below the bar, on the logic that a domain that is
    mostly boilerplate or cross-duplicated is bad at the domain level,
    not per-document.

    ``pairs`` is the corpus near-dup edge list (id_a, id_b) from any
    generator (exact Jaccard, MinHash-LSH). Returns (kept_docs,
    verdicts) where verdicts is one row per source: (source, n_docs,
    mean_quality, near_dup_frac, kept).

    Plan: near-dup membership is a distinct over the pair endpoints
    (skinny ids-only shuffle), one per-source aggregate, and the
    surviving-source set — tiny by construction — broadcasts back as a
    semi-join filter on the corpus scan. Counts stay exact BIGINTs so
    both engines evaluate identical ratio doubles.
    """
    nd_docs = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .union(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
        .withColumn("__nd", F.lit(1).cast("long"))
    )
    base = docs.select(
        "doc_id", "source", F.round(quality_score(F.col("text")), 2).alias("q")
    )
    verdicts = (
        base.join(nd_docs, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("q"), 4).alias("mean_quality"),
            F.round(
                F.sum(F.coalesce(F.col("__nd"), F.lit(0))).cast("double")
                / F.count("*").cast("double"),
                6,
            ).alias("near_dup_frac"),
        )
        .withColumn(
            "kept",
            (F.col("mean_quality") >= min_mean_quality)
            & (F.col("near_dup_frac") <= max_near_dup_frac),
        )
    )
    kept_docs = docs.join(
        F.broadcast(verdicts.filter(F.col("kept")).select("source")),
        "source",
        "left_semi",
    )
    return kept_docs, verdicts


def distill_quality_stump(
    scored: DataFrame,
    id_col: str = "doc_id",
    teacher_col: str = "teacher",
    student_col: str = "student",
    top_frac: float = 0.3,
    strata_col: str | None = None,
) -> DataFrame:
    """Quality-classifier score distillation (the FineWeb-Edu /
    DCLM-shape move, reduced to its deterministic core): an expensive
    TEACHER score labels the corpus (top ``top_frac`` by global
    percent-rank = positive), and a single cheap STUDENT feature is
    distilled into the best decision stump — the (threshold,
    direction) over observed student values maximizing training
    agreement with the teacher. At 100 TB the teacher (an LLM judge or
    a big classifier) is run once on a slice; the distilled stump (or
    its big sibling, a fastText-class model behind the same contract)
    is what actually gates the corpus.

    Fully exact across engines: teacher labels use percent_rank's
    integer arithmetic ((rank-1)/(n-1), id tiebreak); candidate
    thresholds are the distinct student values; per-threshold
    agreement counts are cumulative-sum integer arithmetic over the
    sorted distinct values ("predict positive when student >= t" and
    "when student <= t" both scored); ties break to direction '>='
    then lowest threshold. No floats enter the argmax.

    Scale shape: one window over teacher scores, one hash aggregate to
    distinct student values, one window over that (tiny) value table,
    one broadcast of the single winning stump row back onto the
    corpus. ``strata_col`` is the 100 TB lever: the registered catalog
    fixture passes ``strata_col="source"`` (since r12 — the r11
    fixture ranked globally, a single-partition window whose 100x
    receipt showed it dominating at 39.9 s; r11 VERDICT item 2), so
    the teacher percentile is per-stratum — the FineWeb-Edu
    per-domain-percentile practice — and the window exchange keys on
    the stratum instead of moving the corpus to one reducer. The stump
    search itself is unchanged (global over distinct student values;
    candidate table is vocabulary-sized either way).

    Output: one row per doc — (id, student, teacher_label,
    student_label, threshold, direction, n_correct, n_docs) where
    student_label is the stump's verdict and n_correct/n_docs is the
    training agreement of the chosen stump.
    """
    n_p = Window.partitionBy()
    w_teacher = (
        Window.partitionBy(strata_col) if strata_col is not None else n_p
    )
    labeled = scored.select(
        F.col(id_col),
        F.col(student_col).alias("student"),
        (
            F.percent_rank().over(
                w_teacher.orderBy(F.col(teacher_col), F.col(id_col))
            )
            >= F.lit(1.0 - top_frac)
        ).alias("teacher_label"),
    )
    # skinny (id, student, teacher_label) consumed by the candidate
    # build AND the final apply — checkpoint so the corpus scan +
    # teacher window run once, not per reference (r11 scan audit)
    labeled = labeled.localCheckpoint(eager=False)
    per_val = labeled.groupBy("student").agg(
        F.count("*").alias("n"),
        F.sum(F.col("teacher_label").cast("long")).alias("pos"),
    )
    w_cum = n_p.orderBy("student").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_val.select(
        "student",
        "n",
        "pos",
        F.sum("n").over(w_cum).alias("cum_n"),
        F.sum("pos").over(w_cum).alias("cum_pos"),
        F.sum("n").over(n_p.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )).alias("n_all"),
        F.sum("pos").over(n_p.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )).alias("pos_all"),
    )
    # agreement counts for both stump directions at threshold = value
    ge_correct = (
        F.col("pos_all") - (F.col("cum_pos") - F.col("pos"))  # pos, s >= t
        + (F.col("cum_n") - F.col("n"))                       # neg, s < t
        - (F.col("cum_pos") - F.col("pos"))
    )
    le_correct = (
        F.col("cum_pos")                                      # pos, s <= t
        + (F.col("n_all") - F.col("pos_all"))                 # neg, s > t
        - (F.col("cum_n") - F.col("cum_pos"))
    )
    cands = cum.select(
        F.col("student").alias("threshold"),
        F.explode(
            F.array(
                F.struct(
                    F.lit(">=").alias("direction"),
                    ge_correct.cast("long").alias("n_correct"),
                ),
                F.struct(
                    F.lit("<=").alias("direction"),
                    le_correct.cast("long").alias("n_correct"),
                ),
            )
        ).alias("c"),
        F.col("n_all").cast("long").alias("n_docs"),
    ).select("threshold", "c.direction", "c.n_correct", "n_docs")
    w_best = n_p.orderBy(
        F.col("n_correct").desc(),
        F.col("direction").desc(),  # '>=' sorts after '<=' lexically
        F.col("threshold"),
    )
    best = (
        cands.withColumn("__rk", F.row_number().over(w_best))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )
    return labeled.crossJoin(F.broadcast(best)).select(
        id_col,
        "student",
        "teacher_label",
        F.when(F.col("direction") == ">=", F.col("student") >= F.col("threshold"))
        .otherwise(F.col("student") <= F.col("threshold"))
        .alias("student_label"),
        "threshold",
        "direction",
        "n_correct",
        "n_docs",
    )


def logreg_quality_train(
    feats: DataFrame,
    feature_cols: "list[str]",
    id_col: str = "doc_id",
    label_col: str = "teacher_label",
    lr: float = 1.0,
    n_iter: int = 3,
) -> DataFrame:
    """In-engine quality-classifier TRAINING: full-batch gradient
    descent on a logistic-regression-shaped model over heuristic
    quality features, labeled by the teacher percentile (the same
    FineWeb-Edu / DCLM distillation setting as
    :func:`distill_quality_stump`, upgraded from a one-feature stump
    to a trained linear model) — the supervised completion of the
    repo's in-engine training arc (kmeans_refine, pca_power_top1, PQ
    codebooks).

    Deterministic cross-engine regime (the kmeans/pagerank playbook):

    - features quantized to 6dp; standardization stats from EXACT
      decimal sums (mean 8dp, variance 8dp with a 1e-12 floor,
      stddev = ROUND(SQRT(...), 8)); z-scores 6dp;
    - the link is the RATIONAL sigmoid s = 0.5 + 0.5*m/(1+|m|)
      (documented deviation from exp-sigmoid: +,*,/,ABS are IEEE
      correctly-rounded on BOTH engines, so there is NO exp/ln ULP
      tie-window at all — same class of deviation as CDC's order-free
      gear sum); margin and sigmoid are RAW fixed-order double
      arithmetic with no intermediate rounding — identical inputs give
      bit-identical doubles, while re-rounding already-quantized
      values would manufacture decimal .5 ties;
    - per-iteration gradients are SUMs of 10dp-rounded per-row
      residual terms accumulated as DECIMAL(38,10) — exact and
      associative under any partitioning (the pagerank exact-longs
      regime); weight update ROUND(w + lr*grad/n, 8) computed INSIDE
      the aggregate expression so the driver never does arithmetic —
      it only ferries the (k+1)-value weight vector between
      iterations (the documented bounded-model-state collect class,
      kmeans_refine:~k*dim).

    Scale shape: ONE localCheckpointed standardized frame; per
    iteration ONE hash aggregate over it (map-side partial sums, k+1
    decimal accumulators) — no shuffle of the corpus, no join; n_iter
    bounded. Identical loop shape to spark.ml's LogisticRegression
    aggregator, expressed as pure SQL so DuckDB replays the entire
    trajectory (catalog/curation_q._logreg_quality_sql unrolls every
    iteration as chained CTEs).

    Returns one row per doc: (id, score, pred, label_col, correct).
    """
    k = len(feature_cols)
    base = feats.select(
        F.col(id_col),
        F.col(label_col).cast("boolean").alias("__yb"),
        *[
            F.round(F.col(c).cast("double"), 6).alias(f"__x{j}")
            for j, c in enumerate(feature_cols)
        ],
    )
    sums = base.groupBy().agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(F.col(f"__x{j}").cast("decimal(26,6)")).alias(f"__s{j}")
            for j in range(k)
        ],
        *[
            F.sum(
                F.round(F.col(f"__x{j}") * F.col(f"__x{j}"), 12).cast(
                    "decimal(38,12)"
                )
            ).alias(f"__q{j}")
            for j in range(k)
        ],
    )
    mu = sums.select(
        "__n",
        *[F.col(f"__q{j}") for j in range(k)],
        *[
            F.round(
                F.col(f"__s{j}").cast("double") / F.col("__n"), 8
            ).alias(f"__mu{j}")
            for j in range(k)
        ],
    )
    st = mu.select(
        *[F.col(f"__mu{j}") for j in range(k)],
        *[
            F.round(
                F.sqrt(
                    F.greatest(
                        F.round(
                            F.col(f"__q{j}").cast("double") / F.col("__n")
                            - F.col(f"__mu{j}") * F.col(f"__mu{j}"),
                            8,
                        ),
                        F.lit(1e-12),
                    )
                ),
                8,
            ).alias(f"__sd{j}")
            for j in range(k)
        ],
    )
    zf = (
        base.crossJoin(F.broadcast(st))
        .select(
            id_col,
            "__yb",
            F.when(F.col("__yb"), F.lit(1.0)).otherwise(F.lit(0.0)).alias(
                "__yd"
            ),
            *[
                F.round(
                    (F.col(f"__x{j}") - F.col(f"__mu{j}"))
                    / F.col(f"__sd{j}"),
                    6,
                ).alias(f"__z{j}")
                for j in range(k)
            ],
        )
        .localCheckpoint(eager=True)
    )

    # margin and sigmoid carry NO intermediate rounding: +,*,/,ABS on
    # identical double inputs are IEEE-correctly-rounded and therefore
    # bit-identical on both engines, while re-rounding already-quantized
    # values manufactures exact decimal .5 ties (~1%/row) that engine
    # ROUND implementations break differently — rounding exists ONLY
    # where summation order varies (the decimal gradient sums below)
    def margin(w: "list[float]"):
        m = F.lit(float(w[0]))
        for j in range(k):
            m = m + F.lit(float(w[j + 1])) * F.col(f"__z{j}")
        return m

    def sig(m):
        return F.lit(0.5) + F.lit(0.5) * m / (F.lit(1.0) + F.abs(m))

    w = [0.0] * (k + 1)
    for _ in range(n_iter):
        resid = F.col("__yd") - sig(margin(w))
        exprs = [
            F.round(
                F.lit(float(w[0]))
                + F.lit(float(lr))
                * F.sum(F.round(resid, 10).cast("decimal(38,10)")).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                8,
            ).alias("__w0")
        ] + [
            F.round(
                F.lit(float(w[j + 1]))
                + F.lit(float(lr))
                * F.sum(
                    F.round(resid * F.col(f"__z{j}"), 10).cast(
                        "decimal(38,10)"
                    )
                ).cast("double")
                / F.count(F.lit(1)),
                8,
            ).alias(f"__w{j + 1}")
            for j in range(k)
        ]
        row = zf.groupBy().agg(*exprs).collect()[0]
        w = [float(row[f"__w{j}"]) for j in range(k + 1)]

    # the raw double score is emitted as-is (identical bits on both
    # engines; the compare harness quantizes floats itself)
    score = sig(margin(w))
    return zf.select(
        F.col(id_col),
        score.alias("score"),
        (score >= 0.5).alias("pred"),
        F.col("__yb").alias(label_col),
        ((score >= 0.5) == F.col("__yb")).alias("correct"),
    )
