package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join splitting isn't available (e.g. a non-AQE sink, or skew in
  * the *build* side). A hot key that lands one shuffle partition with
  * 100x the data stalls the whole stage at 100 TB; salting spreads it.
  *
  *  - the large (skewed) side gets a deterministic salt in [0, buckets):
  *    a hash of the whole row, so no rand() nondeterminism, stable under
  *    retries;
  *  - the small side is exploded `buckets`x, once per salt value;
  *  - the join key becomes (key..., salt) — uniform by construction.
  *
  * Cost model: small side inflates by `buckets`; pick buckets ≈ ratio of
  * hottest-key share to average-partition share.
  */
object SkewJoin {

  def saltedJoin(large: DataFrame, small: DataFrame, key: Seq[String],
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    // the salting construction is only correct viewed from the large
    // side: a right/full outer join would surface `buckets` duplicate
    // unmatched rows per small-side row (one per salt replica)
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left joins from the large side, got $joinType")
    val saltExpr = pmod(xxhash64(large.columns.toSeq.map(col): _*), lit(buckets))
    val l = large.withColumn("__salt", saltExpr)
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    l.join(s, key :+ "__salt", joinType).drop("__salt")
  }
}
