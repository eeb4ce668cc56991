package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension maintenance: absorb a full snapshot
  * into a versioned history table, closing changed/deleted versions and
  * opening new ones.
  *
  * The reference's status-update flows (UpdateVariantStatus.java:15-41
  * rewrites rows in place and loses history) are the type-1 shape; this
  * is the audit-preserving alternative a warehouse actually wants.
  *
  * Shape at scale: closed versions pass through untouched (no shuffle);
  * the open slice full-outer-joins the snapshot on the natural key —
  * ONE key-partitioned exchange each side, same as VariantMerge's
  * classify — and the verdict is a row-local CASE. Nothing driver-side,
  * nothing quadratic; history growth is one closed row per actual
  * change, not per batch.
  */
object Scd2 {

  /** Merge a full `snapshot` into `history` at time `batchTs`.
    *
    * `history` columns: key ++ attrs ++ (valid_from, valid_to) where an
    * open version has valid_to NULL. `snapshot` columns: key ++ attrs.
    * Exactly one open version per key is assumed (the invariant this
    * function preserves).
    *
    * Emitted per key:
    *  - attrs unchanged → open version carried as-is;
    *  - attrs changed   → old version closed at `batchTs` + new open
    *    version from `batchTs`;
    *  - key absent from snapshot → version closed at `batchTs` (delete);
    *  - key new in snapshot → open version from `batchTs`.
    */
  /** Point-in-time reconstruction — the temporal AS OF query a type-2
    * dimension exists to answer ("what did this customer look like
    * last quarter"): the versions valid AT `t`, i.e.
    * valid_from ≤ t < valid_to (open versions have no upper bound).
    * A half-open read, so an as-of at exactly a batch time sees the
    * POST-batch state — the convention warehouse time travel uses.
    * Pure narrow filter: pushes into the history scan (at scale, onto
    * the valid_from/valid_to zone maps). */
  def asOf(history: DataFrame, t: Long): DataFrame =
    history.where(col("valid_from") <= t &&
      (col("valid_to").isNull || col("valid_to") > t))

  def absorbSnapshot(history: DataFrame, snapshot: DataFrame,
                     key: Seq[String], attrs: Seq[String],
                     batchTs: Long): DataFrame = {
    val closed = history.where(col("valid_to").isNotNull)
    val open = history.where(col("valid_to").isNull)

    val h = open.select((key ++ attrs).map(c => col(c).as(s"h_$c")) :+
      col("valid_from").as("h_valid_from") :+ lit(true).as("h_present"): _*)
    val s = snapshot.select((key ++ attrs).map(c => col(c).as(s"s_$c")) :+
      lit(true).as("s_present"): _*)
    val joinCond = key.map(k => col(s"h_$k") <=> col(s"s_$k")).reduce(_ && _)
    val j = h.join(s, joinCond, "full_outer")

    // explicit presence markers, NOT key-column nullability: the join is
    // null-safe (<=>), so a legitimately-NULL key part would otherwise
    // read as "absent" on both sides and the version would vanish
    val inHistory = col("h_present").isNotNull
    val inSnapshot = col("s_present").isNotNull
    val changed = attrs.map(a => !(col(s"h_$a") <=> col(s"s_$a")))
      .reduce(_ || _)

    def emit(keySide: String, attrSide: String, from: Column,
             to: Column): Seq[Column] =
      key.map(k => col(s"${keySide}_$k").as(k)) ++
        attrs.map(a => col(s"${attrSide}_$a").as(a)) :+
        from.as("valid_from") :+ to.as("valid_to")

    // carried/closed version of the pre-existing row (null row when the
    // key is brand new)
    val oldOut = j.where(inHistory).select(emit("h", "h",
      col("h_valid_from"),
      when(!inSnapshot || changed, lit(batchTs))): _*)
    // freshly opened version on change or insert
    val newOut = j.where(inSnapshot && (!inHistory || changed))
      .select(emit("s", "s", lit(batchTs), lit(null).cast("long")): _*)

    closed.select((key ++ attrs).map(col) :+ col("valid_from") :+
        col("valid_to"): _*)
      .unionByName(oldOut)
      .unionByName(newOut)
  }
}
