package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Bench, Tables}
import graft.operators.Similarity

/** Fixed-batch ANN scale rehearsal (r14, VERDICT r13 item 1).
  *
  * The GRADED probe queries derive their query batch as a corpus
  * FRACTION (`vec_id % 50 = 0`, `% 7 = 3`) so the oracle stays
  * volume-free — which makes their measured cost super-linear in
  * corpus size BY CONSTRUCTION (batch × list size ∝ n²), saying
  * nothing about the serving plan itself. Production serving is the
  * other shape: a FIXED query batch against a growing index. This tool
  * measures that shape: the batch is pinned to the BASE COPY's queries
  * (`vec_id < ScaleUp.Offset`, the ids every scaled dir shares), so
  * the same ~40 queries probe a 10x/100x index and the curve isolates
  * index growth — list size ∝ n with nprobe lists probed, so the
  * expected probe asymptote is LINEAR in corpus, while the one-off
  * build pass is linear by construction.
  *
  * Usage: runMain graft.tools.AnnRehearsal <sfDir>
  * Prints one JSON line: build (once, fresh table) + probe and
  * fixed-batch brute-force top-k (best-of-3 each), with the Bench
  * sentinel/loadavg/contamination protocol.
  */
object AnnRehearsal {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val loadPre = Bench.loadAvg1()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, dir)
    val cent = Similarity.ivfQuantizer(16, 64)
    // the base copy's query ids — identical at every scale factor
    val batch = emb.filter(col("vec_id") % 50 === 0 &&
      col("vec_id") < ScaleUp.Offset)
    val nVec = emb.count()
    val nQ = batch.count()
    val sentinelPre = math.min(Bench.sentinelOnce(spark),
      Bench.sentinelOnce(spark))

    def best3(fn: () => Unit): Double =
      Seq.fill(3) {
        val t0 = System.nanoTime()
        fn()
        (System.nanoTime() - t0) / 1e9
      }.min

    // build: fresh table each iteration (DROP first), so this times the
    // full corpus-sized assignment + bucketed write every time
    val table = Similarity.ivfIndexTable(dir) + "_rehearsal"
    val buildSec = best3 { () =>
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      Similarity.ivfWriteIndex(emb, "vec_id", "embedding", cent,
        table = table, buckets = 64)
    }
    // probe: the fixed batch against the persisted index
    val probeSec = best3 { () =>
      Similarity.ivfProbeIndex(spark, table, batch, "vec_id", "embedding",
        cent, k = 5, nprobe = 2).count()
    }
    // brute force: the fixed batch against the whole corpus (the
    // recall-audit truth side — linear in corpus at fixed batch)
    val bruteSec = best3 { () =>
      Similarity.cosineTopK(emb, batch, "vec_id", "embedding", k = 5)
        .count()
    }
    // TRAINED-quantizer arm (the production path the graded queries
    // can't take because DuckDB needs centroid literals): ivfTrain's
    // bounded-sample k-means balances the lists, so the hot-list probe
    // straggler the fixed md5 quantizer manufactures (one list = one
    // bucket = one task; at sf10 its imbalance_factor 2.5 put 52% of
    // all scored rows in a single task) should disappear — this arm
    // measures exactly that claim
    val trained = Similarity.ivfTrain(emb, "vec_id", "embedding",
      numCentroids = 16, iterations = 5, maxSample = 10000)
    val tTable = table + "_trained"
    val buildTrainedSec = best3 { () =>
      spark.sql(s"DROP TABLE IF EXISTS `$tTable`")
      Similarity.ivfWriteIndex(emb, "vec_id", "embedding", trained,
        table = tTable, buckets = 64)
    }
    val probeTrainedSec = best3 { () =>
      Similarity.ivfProbeIndex(spark, tTable, batch, "vec_id", "embedding",
        trained, k = 5, nprobe = 2).count()
    }
    val sentinel = math.min(sentinelPre,
      Seq.fill(3)(Bench.sentinelOnce(spark)).min)
    val contaminated = Bench.contaminatedFlag(sentinel, Nil, loadPre,
      Runtime.getRuntime.availableProcessors)
    def fmt(v: Double) = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"metric":"ann_rehearsal","sf":"$dir","n_vec":$nVec,""" +
      s""""n_queries":$nQ,"build_sec":${fmt(buildSec)},""" +
      s""""probe_sec":${fmt(probeSec)},"brute_sec":${fmt(bruteSec)},""" +
      s""""build_trained_sec":${fmt(buildTrainedSec)},""" +
      s""""probe_trained_sec":${fmt(probeTrainedSec)},""" +
      s""""loadavg_pre":$loadPre,"sentinel_sec":${fmt(sentinel)},""" +
      s""""contaminated":$contaminated}""")
    spark.stop()
  }
}
