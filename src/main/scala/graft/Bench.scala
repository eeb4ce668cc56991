package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Lets the sf dir ride in as an argument like Verify's positional
    * sfDir (Bench-only convention: any `/`-prefixed arg, last one wins;
    * Verify itself stays strictly positional `sfDir outDir names...`).
    * Everything else is a query-name filter; env var
    * `SPARK_GRAFT_SF_DIR` still works when no path arg is given. */
  def parseArgs(args: Array[String]): (Option[String], Set[String]) = {
    val (paths, names) = args.partition(_.startsWith("/"))
    (paths.lastOption, names.toSet)
  }

  /** Quiet-box floor for [[sentinelOnce]] (seconds, local[32], measured
    * best-of-3 on an idle machine). A contended machine inflates the
    * sentinel the same way it inflates every query, so
    * sentinel > 2x floor marks the whole run's timings untrustworthy —
    * BENCH_r06.json shipped 55x phantom regressions precisely because
    * nothing in the artifact recorded the machine state. */
  val SentinelFloorSec = 0.15

  /** Fixed data-independent CPU-bound probe: same work every run, so its
    * time moves only with machine contention, never with code under test. */
  def sentinelOnce(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(1L << 26).selectExpr("bit_xor(id * 2654435761) AS s")
      .collect()
    (System.nanoTime() - t0) / 1e9
  }

  def loadAvg1(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val (pathArg, only) = parseArgs(args)
    val sfDir = pathArg.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // outside load, read before our own executors start contributing
    val loadPre = loadAvg1()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: session init, codegen compiler, parquet reader paths — so
    // per-query timings reflect steady state, not first-query startup
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    // probe once warmed (so it measures contention, not codegen startup)
    // and again after the suite; the min is the best view of outside load
    val sentinelPre = math.min(sentinelOnce(spark), sentinelOnce(spark))
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    def timeOnce(name: String,
        fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Option[Double] = {
      // queries that persist intermediates (corpus_mix) register plans in
      // the CacheManager, which matches by logical plan — without this a
      // repeat run would read the previous run's cached blocks and
      // best-of-3 would report a mostly-cached time
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      // a throwing query must NOT time at all — the r8 events-family
      // breakage benchmarked as 14 sub-0.1 s "wins", and even
      // elapsed-to-throw contaminates the total (ADVICE r9); a failure
      // surfaces ONLY through the errors array
      try { fn(spark, sfDir).count()
        Some((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          if (failed.add(name))
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          None
      }
    }
    // best of three runs per query: the first pays Janino compilation of
    // that query's generated code, and one extra repeat absorbs transient
    // machine load (observed run-to-run variance up to ~4x on small
    // queries under contention)
    // a typo'd name would otherwise silently benchmark nothing and print
    // a success-looking zero total
    val unknown = only -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown query name(s): ${unknown.toSeq.sorted}")
    // The r9 run shipped 16 >2x-floor flags that were almost certainly
    // one mid-run load burst — invisible to a pre/post-only sentinel.
    // Probe every ~20 queries so a burst lands in the artifact next to
    // the band of queries it poisoned, and stamp each query with the
    // 1-min loadavg at its start (diagnostic only: our own executors
    // drive loadavg up, so it doesn't feed the contamination flag).
    val midSentinels = scala.collection.mutable.ArrayBuffer[Double]()
    val loadPerQuery =
      scala.collection.mutable.LinkedHashMap[String, Double]()
    var sinceProbe = 0
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .flatMap { case (name, fn) =>
        if (sinceProbe >= 20) { midSentinels += sentinelOnce(spark)
          sinceProbe = 0 }
        sinceProbe += 1
        loadPerQuery(name) = loadAvg1()
        val times = Seq.fill(3)(timeOnce(name, fn)).flatten
        // any throw disqualifies the query's number entirely
        if (times.size == 3) Some(name -> times.min) else None
      }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    def fmt(v: Double): String =
      "%.4f".formatLocal(java.util.Locale.ROOT, v)
    // the probe is JIT-sensitive (fresh ~0.18-0.24 s, hot ~0.09-0.18 s
    // on a QUIET box) so a single post sample is a loose floor
    // estimator; min over three hot samples tightens it below the
    // 1.25x threshold whenever the box genuinely is quiet
    val sentinel = math.min(sentinelPre,
      Seq.fill(3)(sentinelOnce(spark)).min)
    // strict on purpose: BENCH_r07 carried sentinel 1.35x floor at
    // loadavg 5.62 yet stamped clean, and 11 sub-second queries read
    // >2x their floors from box load alone. Either signal poisons the
    // artifact: sentinel over 1.25x its quiet floor, or pre-existing
    // load above cpus/4 before our executors started.
    // Mid-run probes run in post-query heap/JIT state and measure
    // 0.3-0.46 s even on a PROVABLY quiet box (r10: loadavg 0.63,
    // pre/post sentinel 0.059) — an absolute threshold against the
    // idle floor false-positives every run. A burst shows as a SPIKE
    // against the run's own mid baseline (3x median), or as an
    // extreme absolute sample (8x floor — the level a concurrent
    // 32-thread job produces); uniform mid samples are just the
    // steady mid-suite state.
    val midMax = if (midSentinels.isEmpty) 0.0 else midSentinels.max
    val midMedian = if (midSentinels.isEmpty) 0.0
      else midSentinels.toSeq.sorted.apply(midSentinels.size / 2)
    val contaminated = sentinel > 1.25 * SentinelFloorSec ||
      (midSentinels.nonEmpty && (midMax > 3.0 * midMedian ||
        midMax > 8.0 * SentinelFloorSec)) ||
      (loadPre >= 0 && loadPre > Runtime.getRuntime.availableProcessors / 4.0)
    def arr(xs: Seq[Double]): String =
      xs.map(fmt).mkString("[", ",", "]")
    val meta = s""""sf":"$sfDir","loadavg_pre":$loadPre,"sentinel_sec":$sentinel,"sentinel_floor_sec":$SentinelFloorSec,"sentinel_mid":${arr(midSentinels.toSeq)},"contaminated":$contaminated,"errors":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")}"""
    // Full per-query map to a file: the driver records only the LAST
    // 2000 chars of this run's output, and 140 queries at full double
    // precision are ~4.5 KB — every BENCH_r{1..8}.json shipped with
    // parsed:null because the one JSON line never fit the capture
    // window (ADVICE r8). The file carries the complete map; stdout
    // carries a compact line that provably fits.
    val loadQs = loadPerQuery.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_FULL.json"),
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"loadavg_per_query":$loadQs,$meta}""".getBytes("UTF-8"))
    // Compact final line: slowest queries first (the ones perf grading
    // cares about), 4 dp each, cut off at a byte budget that leaves
    // room for the sbt epilogue inside the 2000-char tail window.
    val entryBudget = 1400
    val sb = new StringBuilder
    var kept = 0
    var keptSec = 0.0
    val bySlowest = results.toSeq.sortBy { case (n, s) => (-s, n) }
    bySlowest.iterator.takeWhile { case (n, s) =>
      val piece = (if (kept == 0) "" else ",") + "\"" + n + "\":" + fmt(s)
      val fits = sb.length + piece.length <= entryBudget
      if (fits) { sb.append(piece); kept += 1; keptSec += s }
      fits
    }.foreach(_ => ())
    val omitted = results.size - kept
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":{$sb},"n_queries":${results.size},"omitted_fastest":$omitted,"omitted_sec":${fmt(total - keptSec)},"full":"BENCH_FULL.json",$meta}""")
    spark.stop()
  }
}
