package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–Min sketch heavy hitters (Cormode & Muthukrishnan 2005 — the
  * streaming/sub-linear frequency summary behind every "top terms
  * without an exact group-by" pipeline; the sibling of
  * [[BloomJoin]]'s membership summary).
  *
  * Why it matters at 100 TB: an exact term count shuffles the full
  * vocabulary — unbounded keys, skew, a wide exchange. The CMS build
  * shuffles onto AT MOST depth × width counter cells (a few thousand
  * keys, fixed up front), with map-side combine collapsing each
  * partition's tokens into the bounded grid before the exchange. The
  * probe side then reads estimates from a broadcast of the finished
  * grid. Estimates only ever OVER-count (collisions add, never
  * subtract), so est ≥ true is a structural invariant — the spec and
  * the graded query both pin `n_under = 0`, the [[BloomJoin]]
  * n_missed discipline.
  *
  * Engine-reproducible like BloomJoin: row i's column for a key is hex
  * window i of md5(key) — no private hash, so a DuckDB oracle rebuilds
  * the identical grid bit-for-bit and the whole build→probe→top-k
  * chain is gradeable.
  */
object Sketches {

  val Depth = 3        // d independent rows of the counter grid
  val HexPerCell = 3   // md5 hex chars per row's column index
  val Width = 1 << (HexPerCell * 4) // 4096 counters per row, DERIVED
                       // from the window width so they cannot drift

  /** Row-i column index for a key: the i-th disjoint HexPerCell-char
    * window of md5(key), the BloomJoin window idiom. */
  private def cols(key: Column): Seq[Column] = {
    require(Depth * HexPerCell <= 32,
      "md5 has 32 hex chars; column windows must fit")
    (0 until Depth).map { i =>
      conv(substring(md5(key.cast("string")),
        i * HexPerCell + 1, HexPerCell), 16, 10).cast("long")
    }
  }

  /** Build the depth×width counter grid from one row per OCCURRENCE.
    * The only corpus-sized exchange is the partial agg onto ≤
    * Depth·Width cells — map-side combine does the heavy lifting. */
  def cmsBuild(occurrences: DataFrame, keyCol: String): DataFrame =
    occurrences
      .select(posexplode(array(cols(col(keyCol)): _*)).as(Seq("row", "cell")))
      .groupBy("row", "cell").agg(count(lit(1)).as("c"))

  /** Top-k keys by CMS-estimated frequency, audited against the exact
    * count: (rank, <keyCol>, est, cnt, overcount). `overcount =
    * est − cnt ≥ 0` always (CMS never under-counts; `over` itself is a
    * DuckDB keyword); the exact-count join exists to GRADE the
    * estimate — a production 100 TB run reads only the sketch path,
    * the exact twin is the audit.
    *
    * Scale shape: grid build as above; candidates are the DISTINCT
    * keys (one key-frame shuffle, the q9 shrink — at true scale the
    * candidate set is external: trending keys, a sample, a prior
    * window); each candidate probes its Depth cells against the
    * BROADCAST grid (≤ Depth·Width rows ≈ 12k) and takes the min;
    * global top-k via [[TopK.ranked]] heaps, never a global sort.
    */
  def cmsTopK(occurrences: DataFrame, keyCol: String, k: Int): DataFrame = {
    val grid = broadcast(cmsBuild(occurrences, keyCol))
    val exact = occurrences.groupBy(keyCol)
      .agg(count(lit(1)).as("cnt"))
    val est = exact
      .select(col(keyCol), col("cnt"),
        posexplode(array(cols(col(keyCol)): _*)).as(Seq("row", "cell")))
      .join(grid, Seq("row", "cell"))
      .groupBy(keyCol, "cnt").agg(min("c").as("est"))
    TopK.ranked(
      est.select(col(keyCol), col("est"), col("cnt"),
        (col("est") - col("cnt")).as("overcount")),
      k, col("est").desc, col(keyCol).asc)
  }
}
