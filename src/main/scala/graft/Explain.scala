package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: print the physical plan of named
  * `SparkEntry.queries` entries (all of them with no names given).
  *
  *   sbt "runMain graft.Explain /root/testdata/sf0.01 feature_count"
  *
  * Two views per query:
  *  - the executed plan with `*(n)` whole-stage-codegen stage markers —
  *    an operator WITHOUT a `*(n)` prefix runs interpreted (row-at-a-time
  *    `InternalRow` eval), which is the first thing to look for when a
  *    query is mysteriously slow;
  *  - a codegen summary (subtree count + generated-method sizes via
  *    `debug.codegenStringSeq`), which surfaces Janino giant-method
  *    problems that the formatted plan hides.
  *
  * Use it after touching an operator: the plan you ship should be the
  * plan you wanted — broadcasts on dim sides, pushed filters, no
  * unpartitioned windows, whole-stage codegen over the hot path.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).toSet
    val unknown = only -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown query name(s): ${unknown.toSeq.sorted}")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        try {
          val df = fn(spark, sfDir)
          // run the query first: with AQE the plan (and its codegen
          // subtrees) is only final after execution — inspecting the
          // unexecuted AdaptiveSparkPlan reports 0 subtrees for everything.
          // Execute THIS df's QueryExecution (count() would build a
          // separate plan and leave this one unfinalized), but via its
          // RDD so no result rows land in the driver heap — a no-filter
          // sweep at a big sf dir would otherwise collect every query's
          // full output.
          df.queryExecution.toRdd.foreach(_ => ())
          // executedPlan.toString carries the `*(id)` codegen markers that
          // explain("formatted") drops — interpreted stages have no star
          println(df.queryExecution.executedPlan.toString)
          val subtrees =
            org.apache.spark.sql.execution.debug.codegenStringSeq(
              df.queryExecution.executedPlan)
          println(s"-- codegen: ${subtrees.size} whole-stage subtree(s)")
          subtrees.zipWithIndex.foreach { case ((tree, _, stats), i) =>
            val head = tree.linesIterator.take(1).mkString
            println(s"   subtree ${i + 1}: $head | " +
              s"maxMethod ${stats.maxMethodCodeSize}B, " +
              s"constPool ${stats.maxConstPoolSize}, " +
              s"innerClasses ${stats.numInnerClasses}")
          }
          if (subtrees.isEmpty)
            println("   (NO whole-stage codegen subtrees — fully interpreted)")
        } catch {
          case e: Throwable => println(s"[explain] failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
