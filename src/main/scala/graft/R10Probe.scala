package graft

import graft.functions.{TextFunctions => T}
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 oracle-upgrade probe (dev tool): empirically tests, on the
  * fixed gate corpus, the set equalities that would let rows-only
  * queries bind against exact SQL oracles —
  *  - minhash est>=0.5 candidate set == exact jaccard>=0.8 pair set;
  *  - simhash hamming<=3 set == identical-fingerprint pair set;
  *  - dedup_embedding_lsh (0.4) == dedup_embedding (delegation);
  *  - dedup_embedding_lsh_strict (0.9) == planted pair set;
  *  - semdedup planted pairs co-cluster, orig survives, copy drops;
  *  - ann_ivf / ann_ivf_indexed / ann_pq / ann_pq_indexed == exact
  *    brute-force top-k.
  * `tools/runmain.sh graft.R10Probe [sfDir]`.
  */
object R10Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.ensureRegistered(spark)

    def pairSet(df: DataFrame, a: String = "id_a", b: String = "id_b"): Set[(Long, Long)] =
      df.select(col(a).cast("long"), col(b).cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def report(name: String, left: Set[(Long, Long)], right: Set[(Long, Long)]): Unit = {
      val lOnly = left -- right; val rOnly = right -- left
      println(s"[probe] $name: left=${left.size} right=${right.size} " +
        s"leftOnly=${lOnly.size} rightOnly=${rOnly.size} equal=${left == right}")
      if (lOnly.nonEmpty) println(s"        leftOnly sample: ${lOnly.take(5)}")
      if (rOnly.nonEmpty) println(s"        rightOnly sample: ${rOnly.take(5)}")
    }

    val docs = {
      val base = Tables.documents(spark, dir)
      base.select(col("doc_id"), col("text")).union(
        base.filter(col("doc_id") < 50)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
    }

    // 1. minhash candidates vs exact inverted-index jaccard >= 0.8
    val mh = pairSet(Dedup.minhashPairs(docs, "doc_id", "text")
      .filter(col("est_jaccard") >= 0.5))
    val sh = docs
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("doc_id"), T.shingles(col("text"), 3).as("sh"))
      .persist()
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("tok"))
    val exact08 = pairSet(ex.select(col("doc_id").as("id_a"), col("tok"))
      .join(ex.select(col("doc_id").as("id_b"), col("tok")), Seq("tok"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("c"))
      .join(sh.select(col("doc_id").as("id_a"), size(col("sh")).as("na")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), size(col("sh")).as("nb")), Seq("id_b"))
      .filter(col("c").cast("double") / (col("na") + col("nb") - col("c")) >= 0.8))
    report("minhash(est>=0.5) vs jaccard>=0.8", mh, exact08)

    // 2. simhash hamming<=3 vs identical-fingerprint pairs
    val sim = Dedup.simhashPairs(docs, "doc_id", "text")
    println("[probe] simhash hamming histogram:")
    sim.groupBy(col("hamming")).count().orderBy(col("hamming")).show()
    val simSet = pairSet(sim)
    val fp = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), T.fingerprint(col("text")).as("fp"))
    val fpPairs = pairSet(fp.select(col("fp"), col("doc_id").as("id_a"))
      .join(fp.select(col("fp"), col("doc_id").as("id_b")), Seq("fp"))
      .filter(col("id_a") < col("id_b")))
    report("simhash(h<=3) vs same-fp", simSet, fpPairs)

    // 3. lsh 0.4 delegation vs exact pairs (incl. cos values)
    val lshRows = SparkEntry.queries("dedup_embedding_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exactRows = SparkEntry.queries("dedup_embedding")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    println(s"[probe] lsh0.4 vs exact0.4 (with cos): lsh=${lshRows.size} " +
      s"exact=${exactRows.size} equal=${lshRows == exactRows}")

    // 4. lsh_strict vs planted pairs
    val strict = pairSet(SparkEntry.queries("dedup_embedding_lsh_strict")(spark, dir))
    val nVec = Tables.embeddings(spark, dir).count()
    val planted = Tables.embeddings(spark, dir).filter(col("vec_id") < 50)
      .select(col("vec_id")).collect().map(_.getLong(0))
      .map(v => (v, v + 1000000L)).toSet
    report(s"lsh_strict vs planted (nVec=$nVec)", strict, planted)

    // 5. semdedup planted-pair outcomes
    val sd = graft.operators.SemDedup.semdedup(
      graft.queries.DedupQueries.embsWithNearDups(spark, dir),
      "vec_id", "embedding", nlist = 16, minCosine = 0.9)
    val sdRows = sd.select(col("vec_id"), col("list_id"), col("is_survivor"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    val bad = planted.flatMap { case (o, c) =>
      (sdRows.get(o), sdRows.get(c)) match {
        case (Some((lo, so)), Some((lc, sc))) =>
          if (lo == lc && so && !sc) None
          else Some(s"orig=$o list=$lo surv=$so copy=$c list=$lc surv=$sc")
        case other => Some(s"missing rows for ($o,$c): $other")
      }
    }
    println(s"[probe] semdedup planted outcomes: ${planted.size} pairs, " +
      s"violations=${bad.size}")
    bad.take(5).foreach(v => println(s"        $v"))

    // 6. ANN variants vs exact brute-force top-10. (After the r10
    // oracle upgrades the ivf/pq_indexed QUERIES return recall
    // summaries, so this probes the operators directly — the same
    // comparison that motivated each query's oracle form.)
    val bf = SparkEntry.queries("ann_bruteforce")(spark, dir)
      .select(col("vec_id").cast("long"), col("cos")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val others = Tables.embeddings(spark, dir).filter(col("vec_id") =!= 0)
    val qv = Tables.embeddings(spark, dir).filter(col("vec_id") === 0)
    val cents = graft.operators.Ann.trainCentroids(
      Tables.embeddings(spark, dir), "embedding", nlist = 8, iters = 5)
    val ivf = graft.operators.Ann.ivfSearch(
        graft.operators.Ann.assignLists(others, "vec_id", "embedding", cents),
        qv, "vec_id", "embedding", cents, k = 10, nprobe = 4)
      .select(col("vec_id").cast("long"), col("cos")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    println(s"[probe] ivfSearch(nprobe=4/8) hits in exact top-10: " +
      s"${(ivf.map(_._1) intersect bf.map(_._1)).size}/10")
    val cb = graft.operators.Pq.train(others, "embedding", m = 16, ksub = 32,
      iters = 10)
    val pq = graft.operators.Pq.searchRefined(
        graft.operators.Pq.encode(others, "vec_id", "embedding", cb),
        others, qv, "vec_id", "embedding", cb, k = 10, shortlist = 100)
      .select(col("vec_id").cast("long"), col("cos")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    println(s"[probe] pq searchRefined == bruteforce: ${pq == bf}")

    // 7. ann_lsh / knn_join shape (context only). r11: the gate
    // queries now emit contract summaries, so the shape probe reads
    // the operator directly
    println(s"[probe] ann_lsh rows=${SparkEntry.queries("ann_lsh")(spark, dir).count()}")
    graft.operators.Ann.knnJoin(
        Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", k = 3, probeBits = 1)
      .groupBy(col("id_a")).count()
      .groupBy(col("count")).count().orderBy(col("count")).show()
    spark.stop()
  }
}
