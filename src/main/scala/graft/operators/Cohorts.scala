package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort analytics over event logs: retention matrices and RFM
  * (recency / frequency / monetary) segmentation — the two classic
  * product-analytics aggregates (Fader & Hardie's RFM literature;
  * cohort retention as popularized by the AARRR canon).
  *
  * Both take timestamps as exact integer epoch values (the events
  * table's nanos ride in as longs — see [[graft.Tables.events]]); all
  * bucketing is integer division, so results are bit-deterministic
  * across engines and retries.
  */
object Cohorts {

  private val WeekUs = 604800000000L // 7 * 86400 * 1e6 µs

  /** Exact integer floor-division of a non-negative long column (Column
    * `/` is double division — a naive `ts / d` then cast could land an
    * ulp above/below the true quotient and truncate to the wrong
    * bucket): snap to an exact multiple of `d` first, so the one double
    * division is of an exact-multiple numerator and yields the exact
    * integer quotient. Callers pass epoch MICROSECONDS (~1.7e15 < 2⁵³,
    * exactly representable; nanos would NOT be — convert with
    * `ts DIV 1000` first, exact long arithmetic). */
  private def idiv(c: Column, d: Long): Column =
    ((c - pmod(c, lit(d))) / d).cast("long")

  /** Weekly cohort retention matrix: users are cohorted by the absolute
    * week of their first event; each later active week counts toward
    * (cohort_week, week_offset). `retention` is the share of the cohort
    * active at that offset (offset 0 is 1.0 by construction — every
    * user is active in their own first week).
    *
    * Scale shape: the (user, week) activity frame is ONE distinct
    * shuffle on the user key; the per-user cohort min re-aggregates that
    * reduced frame and joins back CO-PARTITIONED on the same key (the
    * exchange is reused — no second scan of the raw events); the final
    * matrix agg is vocabulary-sized (weeks × offsets). Cohort sizes come
    * from the matrix itself (offset-0 rows) via a broadcast join, not
    * another pass.
    *
    * @param tsUs event time as exact epoch MICROSECONDS (long)
    * @return (cohort_week, week_offset, n_users, retention)
    */
  def retentionMatrix(events: DataFrame, userCol: String,
                      tsUs: Column): DataFrame = {
    val weeks = events.select(col(userCol).as("u"),
      idiv(tsUs.cast("long"), WeekUs).as("week")).distinct()
    val cohorts = weeks.groupBy("u").agg(min("week").as("cohort_week"))
    val matrix = weeks.join(cohorts, "u")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      // (u, week) is distinct, so count(*) IS the distinct-user count
      .agg(count(lit(1)).as("n_users"))
    val sizes = matrix.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_users").as("cohort_size"))
    matrix.join(broadcast(sizes), "cohort_week")
      // UNROUNDED since r7 (the su4-family .00005 tie rule)
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        (col("n_users").cast("double") / col("cohort_size"))
          .as("retention"))
  }

  /** RFM segmentation: per-user recency (last-active day), frequency
    * (event count) and monetary (exact integer cents) metrics, each
    * scored 1–5 against the population's exact quintile boundaries,
    * rolled up to per-(r, f, m) segment counts.
    *
    * Scale shape: ONE partial-agg shuffle on the user key builds the
    * metric frame; quintile boundaries are a sort-based exact
    * `percentile` aggregate (the corpus_stats discipline — boundaries
    * rounded to 4 dp so interpolation ulps can't flip a comparison)
    * riding in as a broadcast 1-row frame; score assignment is NARROW
    * comparisons — deliberately NOT an `ntile` window, which would
    * funnel every user through one partition at scale; the final rollup
    * is ≤125 rows.
    *
    * Monetary sums exact integer cents (`round(value*100)` per event)
    * so neither engine's float summation order can shift a boundary.
    *
    * @param tsUs event time as exact epoch MICROSECONDS (long)
    * @return (r_score, f_score, m_score, n_users) — higher = better
    */
  def rfmSegments(events: DataFrame, userCol: String, tsUs: Column,
                  valueCol: Column): DataFrame = {
    val users = events.groupBy(col(userCol).as("u"))
      .agg(idiv(max(tsUs.cast("long")), 86400000000L).as("rec_day"),
        count(lit(1)).as("freq"),
        sum(round(valueCol * 100).cast("long")).as("mon_c"))
    // quantile literals as STRINGS so both engines parse the same
    // decimal (Scala's 0.2*(i+1) would stringify as 0.6000000000000001)
    val ps = Seq("0.2", "0.4", "0.6", "0.8")
    val qs = Seq("rec_day", "freq", "mon_c").map { m =>
      ps.zipWithIndex.map { case (p, i) =>
        round(expr(s"percentile($m, ${p}D)"), 4).as(s"${m}_b$i")
      }
    }
    val bounds = broadcast(users.agg(qs.flatten.head, qs.flatten.tail: _*))
    def score(m: String): Column =
      (lit(1) +: (0 until 4).map(i =>
        when(col(m) > col(s"${m}_b$i"), 1).otherwise(0)))
        .reduce(_ + _)
    users.crossJoin(bounds)
      .select(score("rec_day").as("r_score"), score("freq").as("f_score"),
        score("mon_c").as("m_score"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_users"))
  }
}
