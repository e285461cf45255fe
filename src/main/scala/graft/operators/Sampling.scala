package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixes. A training corpus
  * is assembled by DOWN-weighting over-represented sources and
  * up-keeping scarce ones; the sampling must be reproducible across
  * runs, engines and partitionings or the mix is unauditable.
  *
  * Mechanism: a row is kept when the first 8 hex digits of
  * md5(salt || key) sort lexicographically below the rate's 8-digit
  * hex threshold (fixed-width lowercase hex, so string order ==
  * numeric order). Pure row-local expression: no shuffle, no RNG
  * state, identical decisions on any cluster layout — and replicable
  * verbatim in ANSI SQL (DuckDB's md5 matches Spark's), so the
  * driver oracle verifies the exact kept set, not just its size.
  */
object Sampling {

  /** 8-hex-digit threshold for a rate in [0, 1]. "g" sorts above
    * every hex digit, making rate 1.0 keep all rows.
    */
  private[operators] def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0, 1]")
    if (rate >= 1.0) "g" else f"${(rate * 4294967296.0).toLong}%08x"
  }

  private def hashPrefix(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt), key.cast("string"))), 1, 8)

  /** Uniform deterministic sample at `rate`. */
  def deterministic(df: DataFrame, keyCol: String, rate: Double,
                    salt: String = "graft"): DataFrame =
    df.filter(hashPrefix(col(keyCol), salt) < lit(thresholdHex(rate)))

  /** Per-stratum deterministic rates — the data-mixing primitive:
    * strata absent from `rates` keep `defaultRate`.
    */
  def stratified(df: DataFrame, strataCol: String, keyCol: String,
                 rates: Map[String, Double], defaultRate: Double = 1.0,
                 salt: String = "graft"): DataFrame = {
    val thresholdCol = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(thresholdHex(defaultRate))) { case (acc, (stratum, r)) =>
        when(col(strataCol) === stratum, lit(thresholdHex(r))).otherwise(acc)
      }
    df.filter(hashPrefix(col(keyCol), salt) < thresholdCol)
  }

  /** Deterministic train/holdout split keyed on NORMALIZED CONTENT,
    * not row id: byte-identical (after whitespace/case normalization)
    * documents always land in the SAME split, so an exact duplicate
    * can never straddle train and holdout and leak evaluation data —
    * the property an id-keyed split cannot give. Same hex-prefix
    * mechanism as [[deterministic]]: pure row-local projection, no
    * shuffle, no RNG state, identical assignment on any cluster
    * layout or reprocessing run, replicable verbatim in ANSI SQL.
    * Distinct `salt`s give independent splits for separate
    * experiments. Null-text rows are excluded (no content to key on).
    * Adds a `split` column: 'holdout' or 'train'.
    */
  def hashSplit(df: DataFrame, textCol: String, holdoutRate: Double,
                salt: String = "graft"): DataFrame = {
    require(holdoutRate >= 0.0 && holdoutRate <= 1.0,
      s"holdoutRate $holdoutRate outside [0, 1]")
    val key = graft.functions.TextFunctions.normalizeText(col(textCol))
    df.filter(col(textCol).isNotNull)
      .withColumn("split",
        when(hashPrefix(key, salt) < lit(thresholdHex(holdoutRate)),
          lit("holdout")).otherwise(lit("train")))
  }

  /** Token-BUDGET mixing: downsample each source so its kept token
    * mass lands on a target budget — the way a training mix is
    * actually specified ("300 B tokens web, 50 B code"), as opposed
    * to [[stratified]]'s a-priori rates. Each source's keep rate is
    * `min(1, budget / total_tokens)`, computed IN the plan (one
    * partial-aggregated groupBy over the corpus, broadcast back), and
    * the keep decision is the same md5-threshold row-local predicate
    * as [[stratified]] — reproducible on any partitioning, and
    * replicable verbatim in the DuckDB oracle including the
    * rate-to-threshold arithmetic (double division and the 2^32
    * scaling truncate identically in both engines).
    *
    * Sources absent from `budgets` are EXCLUDED (a mix is a
    * whitelist: an unbudgeted source contributing tokens would skew
    * the mix silently). Rate sampling targets the budget in
    * expectation; the kept token mass concentrates tightly around it
    * for any corpus whose per-document token count is small relative
    * to the budget.
    */
  def mixByTokenBudget(df: DataFrame, sourceCol: String, keyCol: String,
                       tokenCol: Column, budgets: Map[String, Long],
                       salt: String = "graft"): DataFrame = {
    require(budgets.nonEmpty, "empty budget map would drop the whole corpus")
    require(budgets.values.forall(_ >= 0), s"negative budget in $budgets")
    val spark = df.sparkSession
    import spark.implicits._
    val budgetDf = budgets.toSeq.toDF(sourceCol, "__budget")
    val rates = df.groupBy(col(sourceCol))
      .agg(sum(tokenCol).cast("double").as("__total_tokens"))
      .join(budgetDf, Seq(sourceCol))
      // a zero-token-mass source contributes nothing to a TOKEN
      // budget: rate 0 (drop), guarded explicitly — unguarded, the
      // double division gives +Inf and least() would keep-all
      .select(col(sourceCol),
        when(col("__total_tokens") > 0.0,
            least(lit(1.0), col("__budget") / col("__total_tokens")))
          .otherwise(lit(0.0)).as("__rate"))
    // thresholdHex, but computed in-plan from the joined rate: "g"
    // sorts above every hex digit (keep-all); otherwise the rate
    // scaled to 2^32 as 8 fixed-width lowercase hex digits
    val thr = when(col("__rate") >= 1.0, lit("g"))
      .otherwise(lpad(lower(hex((col("__rate") * lit(4294967296.0)).cast("long"))), 8, "0"))
    df.join(broadcast(rates), Seq(sourceCol))
      .filter(hashPrefix(col(keyCol), salt) < thr)
      .drop("__rate")
  }

  /** REPEAT-FACTOR upsampling (r11): per-source target epoch counts
    * — the UP-weighting face of the mix family ([[mixByTokenBudget]]
    * and [[mixByTemperature]] can only down-sample; a scarce
    * high-quality source in a real training mix is repeated 2-5
    * epochs). Factor f: every doc emits floor(f) copies plus one
    * more with probability frac(f), decided by the same
    * salted-md5-threshold trick as the down-samplers (distinct salt
    * — the extra-copy decision must not correlate with any keep
    * decision) — so the realized mix hits the target in expectation,
    * every decision is a pure function of (source, key), and the
    * whole expansion replays in SQL. Sources absent from `factors`
    * keep one copy. Output: input columns + `copy_idx` (0-based;
    * consumers shuffling epochs feed (key, copy_idx) to
    * [[graft.operators.Sharding.deterministicShards]]).
    *
    * Scale shape: the per-source (floor, threshold) frame broadcasts
    * (bounded by source count); the expansion is a row-local
    * explode(sequence) — no shuffle, output bytes = the target mix
    * by construction.
    */
  def repeatFactor(df: DataFrame, sourceCol: String, keyCol: String,
                   factors: Map[String, Double],
                   salt: String = "graft-rep"): DataFrame = {
    require(factors.nonEmpty, "empty factor map: nothing to upsample")
    require(factors.values.forall(f => f >= 0.0 && f <= 100.0),
      s"factor outside [0, 100] in $factors")
    val spark = df.sparkSession
    import spark.implicits._
    val rows = factors.toSeq.map { case (s, f) =>
      val fl = math.floor(f).toLong
      (s, fl, thresholdHex(f - fl))
    }
    val factorDf = rows.toDF(sourceCol, "__floor", "__thr")
    df.join(broadcast(factorDf), Seq(sourceCol), "left_outer")
      .withColumn("__n",
        coalesce(col("__floor"), lit(1L)) +
          when(hashPrefix(col(keyCol), salt) <
               coalesce(col("__thr"), lit("0")), 1L).otherwise(0L))
      // sequence() steps DOWNWARD for n = 0 — guard to an empty array
      .withColumn("copy_idx",
        explode(when(col("__n") >= 1,
            sequence(lit(0L), col("__n") - 1))
          .otherwise(expr("cast(array() as array<bigint>)"))))
      .drop("__floor", "__thr", "__n")
  }

  /** Deterministic EXACTLY-k-per-group sample — the fixed-budget
    * variant of [[stratified]] (which keeps a RATE; a human-review
    * queue or an eval slice wants "exactly 20 per source" however
    * big the source is). Semantically: rank each group's rows by
    * md5(salt || key) (key breaks hash ties) and keep ranks ≤ k —
    * a seeded reservoir that is reproducible on any partitioning,
    * any engine, any rerun.
    *
    * Scale shape — exact top-k-per-group WITHOUT sorting the corpus:
    *
    *  1. per-group counts: one partial-aggregated groupBy, collected
    *     (bounded by `maxGroups`, loud overflow — same low-
    *     cardinality precondition discipline as Rank.keyedRank);
    *  2. PREFILTER at a margined hash threshold (min(1, margin·k/n_g)
    *     per group, broadcast threshold frame): hash < t selects
    *     exactly a PREFIX of the group's (hash, key) order, so ranks
    *     computed over survivors equal global ranks whenever every
    *     group keeps ≥ min(k, n_g) survivors. The corpus is scanned,
    *     never shuffled; only ~margin·k rows per group continue;
    *  3. exact rank via a window over the survivor frame — bounded
    *     by construction (Binomial(n_g, margin·k/n_g) concentrates
    *     hard around margin·k), so the per-group window sorts
    *     thousands of rows, not the corpus;
    *  4. the prefix-coverage guard is CHECKED, not assumed: if any
    *     group's survivor count fell below min(k, n_g) (probability
    *     ~e^-k at margin 4, but a guard beats a prayer), fail loudly
    *     naming the margin to raise.
    *
    * Output: input columns + `rk` (1-based within-group rank).
    */
  def reservoirByGroup(df: DataFrame, groupCol: String, keyCol: String,
                       k: Int, salt: String = "graft-rsv",
                       margin: Double = 4.0,
                       maxGroups: Int = 4096): DataFrame = {
    require(k > 0, s"k $k must be positive")
    require(margin >= 2.0, s"margin $margin < 2: the prefix-coverage " +
      "guard would trip routinely; use >= 2 (4 is comfortable)")
    require(df.schema(groupCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"reservoirByGroup: group column $groupCol must be a string " +
        "(the driver-built threshold frame joins on it)")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n_g"))
      .limit(maxGroups + 1).collect()
    require(counts.length <= maxGroups,
      s"reservoirByGroup: more than $maxGroups groups — the per-group " +
        "threshold frame is driver-built under a low-cardinality " +
        "precondition; for high-cardinality groups use " +
        "Window.partitionBy(group) row_number directly")
    val thrRows = counts.toSeq.map { r =>
      val n = r.getLong(1)
      (r.getString(0), n, thresholdHex(math.min(1.0, margin * k / n.toDouble)))
    }
    val thrDf = thrRows.toDF(groupCol, "__n_g", "__thr")
    val hp = hashPrefix(col(keyCol), salt)
    val survivors = df
      .join(broadcast(thrDf.drop("__n_g")), Seq(groupCol))
      .filter(hp < col("__thr"))
      .withColumn("__hp", hp)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__hp"), col(keyCol))
    val ranked = survivors
      .withColumn("rk", row_number().over(w).cast("long"))
      .persist()
    // prefix-coverage guard, CHECKED against the full group list (a
    // group with zero survivors is absent from the ranked frame and
    // must still fail): every group keeps >= min(k, n_g) survivors,
    // else the margined prefilter cut into the would-be sample and
    // the ranks below are not global ranks
    val gotMap = ranked.groupBy(col(groupCol))
      .agg(max(col("rk")).as("__kept")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val short = thrRows.filter { case (g, n, _) =>
      gotMap.getOrElse(g, 0L) < math.min(k.toLong, n)
    }
    require(short.isEmpty,
      s"reservoirByGroup: margin $margin left ${short.length} group(s) " +
        s"with fewer than min(k, n) survivors " +
        s"(${short.take(3).map(_._1).mkString(", ")}) — raise margin")
    ranked.filter(col("rk") <= k).drop("__hp", "__thr")
  }

  /** WEIGHT-PROPORTIONAL sample of exactly k rows without
    * replacement (Efraimidis-Spirtakis 2006), deterministic and
    * hash-exact: a row with integer weight w gets key =
    * min over i in 1..w of md5(salt || key || '#' || i), and the k
    * smallest keys win. The min of w iid uniforms is Beta(1, w) —
    * stochastically smaller for larger w — which is precisely the
    * E-S u^(1/w) scheme re-expressed so BOTH engines can replay the
    * exact selected set (u^(1/w) needs pow/log whose last-ulp
    * differences could flip ranks; a min of md5 prefixes cannot).
    * The quality-weighted corpus sample: weight = quality tier,
    * higher tiers proportionally more likely, no duplicates.
    *
    * Scale shape, same prefilter discipline as [[reservoirByGroup]]:
    * P(key < t) = 1-(1-t)^w ~ w*t, so at t = margin*k/Σw the
    * expected survivor count is margin*k — the global rank window
    * sorts a k-bounded frame, never the corpus, and survivorship
    * (>= k) is CHECKED loudly. Per-row cost is w md5s (Σw total —
    * linear in total weight, the algorithm's floor); weights are
    * required integral in [1, maxWeight] by a one-pass integer agg
    * that also supplies Σw.
    *
    * Output: input columns + `rk` (1-based, k rows).
    */
  def weightedTopK(df: DataFrame, keyCol: String, weightCol: String,
                   k: Int, salt: String = "graft-wrs",
                   margin: Double = 4.0, maxWeight: Int = 16): DataFrame = {
    require(k > 0, s"k $k must be positive")
    require(margin >= 2.0, s"margin $margin < 2: the coverage guard " +
      "would trip routinely; use >= 2 (4 is comfortable)")
    val stats = df.agg(
      sum(col(weightCol)).cast("long").as("sw"),
      min(col(weightCol)).cast("long").as("mn"),
      max(col(weightCol)).cast("long").as("mx"),
      count(lit(1)).as("n")).collect()(0)
    require(stats.getLong(3) >= k,
      s"weightedTopK: corpus has ${stats.getLong(3)} rows < k=$k")
    require(stats.getLong(1) >= 1 && stats.getLong(2) <= maxWeight,
      s"weightedTopK: weights must be integers in [1, $maxWeight], " +
        s"got [${stats.getLong(1)}, ${stats.getLong(2)}] — per-row " +
        "cost is WEIGHT md5 evaluations; rescale tiers, don't pass " +
        "raw magnitudes")
    val sumW = stats.getLong(0)
    val t = thresholdHex(math.min(1.0, margin * k / sumW.toDouble))
    val keyExpr = array_min(transform(
      sequence(lit(1), col(weightCol).cast("int")),
      i => substring(md5(concat(lit(salt), col(keyCol).cast("string"),
        lit("#"), i.cast("string"))), 1, 8)))
    val survivors = df
      .withColumn("__key", keyExpr)
      .filter(col("__key") < lit(t))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__key"), col(keyCol))
    // the empty-partitionBy window is deliberate: it ranks the
    // margined survivor frame (~margin*k rows, Binomial-concentrated
    // around margin*k by construction), never the corpus
    val ranked = survivors
      .withColumn("rk", row_number().over(w).cast("long"))
      .persist()
    val got = ranked.count()
    require(got >= k,
      s"weightedTopK: margin $margin left $got survivors < k=$k — " +
        "raise margin (coverage guard: ranks below are only global " +
        "when every top-k key clears the threshold, which holding " +
        s">= k survivors certifies)")
    ranked.filter(col("rk") <= k).drop("__key")
  }

  /** TEMPERATURE mixing (the multilingual-training recipe): given
    * per-source token shares p_s, the target mix is q_s ∝ p_s^α —
    * α = 1 keeps natural proportions, α → 0 flattens toward uniform,
    * up-weighting scarce sources RELATIVE to dominant ones. Since
    * sampling can only down-weight, keep rates are
    * r_s = p_s^(α−1) / max_j p_j^(α−1): the scarcest source keeps
    * everything and the rest scale down to match the tempered
    * distribution in expectation.
    *
    * Same scale shape as [[mixByTokenBudget]]: one partial-aggregated
    * groupBy computes shares, the tiny per-source rate frame
    * broadcasts back, and the keep decision is the row-local
    * md5-threshold predicate. Rates round to 6 decimals before the
    * threshold scaling so the DuckDB oracle's pow() (which may differ
    * from the JVM's in the last ulp) lands on the identical
    * threshold.
    */
  def mixByTemperature(df: DataFrame, sourceCol: String, keyCol: String,
                       tokenCol: Column, alpha: Double,
                       salt: String = "graft"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha $alpha outside (0, 1]")
    val totals = df.groupBy(col(sourceCol))
      .agg(sum(tokenCol).cast("double").as("__t"))
      .filter(col("__t") > 0.0)
    val grand = totals.agg(sum(col("__t")).as("__grand"))
    val weights = totals.crossJoin(broadcast(grand))
      .select(col(sourceCol),
        pow(col("__t") / col("__grand"), lit(alpha - 1.0)).as("__w"))
    val wMax = weights.agg(max(col("__w")).as("__wmax"))
    val rates = weights.crossJoin(broadcast(wMax))
      .select(col(sourceCol),
        round(col("__w") / col("__wmax"), 6).as("__rate"))
    val thr = when(col("__rate") >= 1.0, lit("g"))
      .otherwise(lpad(lower(hex((col("__rate") * lit(4294967296.0)).cast("long"))), 8, "0"))
    df.join(broadcast(rates), Seq(sourceCol))
      .filter(hashPrefix(col(keyCol), salt) < thr)
      .drop("__rate")
  }
}
