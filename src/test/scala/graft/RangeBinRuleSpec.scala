package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class RangeBinRuleSpec extends AnyFunSuite {

  test("natural theta range join is rewritten to a binned equi-join") {
    TestSpark.spark // shared context up first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.rangejoin.binWidth", "64")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    try {
      import spark.implicits._
      val rnd = new scala.util.Random(11)
      val points = (1 to 400).map(_ => rnd.nextInt(5000).toLong).toDF("p")
      val ivs = (1 to 40).map { i =>
        val s = rnd.nextInt(4800).toLong
        (i.toLong, s, s + rnd.nextInt(300))
      }.toDF("iv", "s", "e")

      val joined = points.join(ivs, $"s" <= $"p" && $"p" <= $"e")

      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("__graft_bin"), s"rule did not fire:\n$plan")

      val got = joined.select("p", "iv").as[(Long, Long)].collect().sorted

      spark.conf.set("spark.graft.rangejoin.enabled", "false")
      val naive = points.join(ivs, $"s" <= $"p" && $"p" <= $"e")
        .select("p", "iv").as[(Long, Long)].collect().sorted
      assert(naive.nonEmpty && got.toSeq == naive.toSeq)
      val planOff = points.join(ivs, $"s" <= $"p" && $"p" <= $"e")
        .queryExecution.optimizedPlan.toString
      assert(!planOff.contains("__graft_bin"))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(TestSpark.spark)
      SparkSession.setActiveSession(TestSpark.spark)
    }
  }
}
