package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Johnson-Lindenstrauss RANDOM-PROJECTION dimensionality reduction
  * with a hash-derived ±1 sign matrix — the cheap-ANN prelude that
  * shrinks an embedding column before indexing (a 4x dim cut is a 4x
  * cut in every downstream distance kernel, IVF list and PQ code).
  * The reference has no vector surface at all; this extends the
  * engine's embedding family (SURVEY §2).
  *
  * Determinism over randomness: the matrix entry s(i, j) is ±1 by
  * the first hex nibble of md5("graft-rp" + i + "x" + j) — a pure
  * function of the coordinates, so the projection is reproducible
  * across runs, engines and cluster layouts (no seeded RNG whose
  * stream order could differ), and a SQL oracle can rebuild the
  * identical matrix. Components are computed in INTEGER micro-units
  * (inputs e6-quantized first, then summed with ±1 weights), so the
  * distributed arithmetic is order-independent and hash-verifiable.
  *
  * Scale shape: entirely ROW-LOCAL — the sign matrix is compiled
  * into the expression as literal arrays (dIn x dOut ints; fine into
  * the thousands), each output component one zip_with + aggregate
  * over the input vector, no explode fan-out, no join, no shuffle.
  * For matrices too large to inline (say 4096x512), the alternative
  * is the broadcast-matrix join form: posexplode the vector, join
  * the (i, j, s) frame, one map-side-combined groupBy — one
  * exchange of ALREADY-REDUCED rows.
  */
object RandomProjection {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** dIn x dOut ±1 matrix; entry (i, j) is +1 iff the first hex
    * nibble of md5(seed + i + "x" + j) is 0-7 (P = 1/2 per entry).
    */
  def signMatrix(dIn: Int, dOut: Int,
                 seed: String = "graft-rp"): Array[Array[Int]] = {
    require(dIn > 0 && dOut > 0, s"need positive dims, got $dIn x $dOut")
    Array.tabulate(dIn, dOut) { (i, j) =>
      if ("01234567".contains(md5Hex(s"$seed${i}x$j").charAt(0))) 1 else -1
    }
  }

  /** Long-form reduced vectors: (idCol, j, comp_e6) — component j is
    * Σ_i round(x_i * 1e6) * s(i, j). Vectors whose length is not
    * `dIn`, null vectors, AND vectors containing null ELEMENTS are
    * all dropped — a ragged or holed input would silently project
    * garbage (and a null element would null the whole Spark sum
    * while SQL engines' sum() skips nulls, a cross-engine
    * divergence for the hash-verified oracle — r11 advice).
    */
  def reduce(embs: DataFrame, idCol: String, vecCol: String,
             dIn: Int, dOut: Int,
             seed: String = "graft-rp"): DataFrame = {
    val signs = signMatrix(dIn, dOut, seed)
    val xe = transform(col(vecCol),
      x => floor(x.cast("double") * 1000000.0 + lit(0.5)).cast("long"))
    val comps = array((0 until dOut).map { j =>
      val sCol = array(signs.map(row => lit(row(j).toLong)): _*)
      aggregate(zip_with(xe, sCol, (a, b) => a * b),
        lit(0L), (acc, v) => acc + v)
    }: _*)
    embs
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dIn &&
        !exists(col(vecCol), x => x.isNull))
      .select(col(idCol), posexplode(comps).as(Seq("j", "comp_e6")))
      .select(col(idCol), col("j").cast("int").as("j"), col("comp_e6"))
  }

  /** The BROADCAST-MATRIX JOIN form of [[reduce]] — identical output
    * on a DISTINCT-id input (spec-pinned), different plan for
    * matrices too large to inline as literal arrays (say 4096x512 =
    * 2M expression nodes). Precondition, shared with every consumer
    * of the reduced table: `idCol` must be unique — this form's
    * (id, j) aggregation would SUM duplicate ids' projections into
    * one vector where [[reduce]] emits one projection per row, so on
    * a dup-id frame the two forms diverge silently. Dedup first
    * (the reduced table is keyed by id downstream anyway). The
    * (i, j, s) sign frame is a broadcast side (dIn*dOut rows of three
    * ints — megabytes into the thousands of dims), the vector
    * posexplodes to (id, i, xe), the join is broadcast-hash, and the
    * (id, j) aggregation ships ALREADY map-side-combined partial sums
    * — one exchange of reduced rows, still no corpus-x-corpus work.
    * Same drop rules as [[reduce]].
    */
  def reduceViaJoin(embs: DataFrame, idCol: String, vecCol: String,
                    dIn: Int, dOut: Int,
                    seed: String = "graft-rp"): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val signs = signMatrix(dIn, dOut, seed)
    val entries = for { i <- 0 until dIn; j <- 0 until dOut }
      yield (i, j, signs(i)(j).toLong)
    val m = entries.toDF("i", "j", "s")
    val xe = transform(col(vecCol),
      x => floor(x.cast("double") * 1000000.0 + lit(0.5)).cast("long"))
    embs
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dIn &&
        !exists(col(vecCol), x => x.isNull))
      .select(col(idCol), posexplode(xe).as(Seq("i", "xe")))
      .join(broadcast(m), Seq("i"))
      .groupBy(col(idCol), col("j"))
      .agg(sum(col("xe") * col("s")).as("comp_e6"))
      .select(col(idCol), col("j").cast("int").as("j"), col("comp_e6"))
  }
}
