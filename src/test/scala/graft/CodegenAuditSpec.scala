package graft

import org.apache.spark.sql.catalyst.expressions.HigherOrderFunction
import org.scalatest.funsuite.AnyFunSuite

/** Suite-wide interpreted-stage audit (VERDICT r11 item 6) — the two
  * ways a "codegen'd" plan silently runs slow at corpus scale:
  *
  *  1. a generated method above HotSpot's 8 KB JIT bailout
  *     (-XX:DontCompileHugeMethods default): the stage still claims
  *     WholeStageCodegen but executes as interpreter bytecode;
  *  2. a higher-order function (aggregate/transform/filter/zip_with):
  *     `CodegenFallback` — the surrounding stage codegens but the fold
  *     itself evaluates row-at-a-time interpreted. Fine over a bounded
  *     array; a scale bug over corpus-sized data (the r12 Sam lesson:
  *     an `aggregate` CIGAR fold was the suite's most expensive stage).
  *
  * Both are asserted structurally over EVERY graded query with AQE off
  * (an unexecuted adaptive plan reports zero codegen subtrees, so the
  * audit would silently pass; with AQE off the codegen tree is final
  * without running any data). The HOF whitelist is two-sided like the
  * window whitelist: each entry documents its bound, and stale entries
  * fail so the list cannot rot into a blanket pass.
  */
class CodegenAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Queries whose plans apply higher-order functions to PROVABLY
    * BOUNDED arrays — name → the bound. The interpreted cost is
    * O(rows × bound); every bound below is either a constant (embedding
    * dim, centroid count), per-row input length (a ~10²-token synthetic
    * document — same order as the explode the query already pays), or a
    * driver-scale frame. A HOF over an UNBOUNDED corpus-sized array
    * (the r12 Sam CIGAR fold) must move to a codegen kernel or
    * mapPartitions pass instead of joining this list. */
  private val hofWhitelist: Map[String, String] = Map(
    "ann_ivf" -> "sort/transform over nprobe-of-16 coarse centroid list",
    "ann_ivf_probe_disk" -> "sort/transform over nprobe-of-16 coarse centroid list (the ann_ivf probe side, query rows only)",
    "ann_ivf_probe_batch" -> "sort/transform over nprobe-of-16 coarse centroid list (the ann_ivf probe side, query rows only)",
    "events_mase_baseline" -> "fold over per-type day series (calendar-bounded, the events_holt class)",
    "events_mase" -> "both parents' folds over ONE densified per-type day series (calendar-bounded, the events_holt class)",
    "text_compression_proxy" -> "transform over per-document trigram index sequence (≤ text length ~102)",
    "ann_ivf_pq" -> "sort/transform over 16-entry centroid list",
    "ann_recall_audit" -> "sort/transform over 16-entry centroid list",
    "corpus_budget_select" -> "fold over bin-totals frame (score-range/binWidth rows; the documented two-phase prefix-sum phase-1 output)",
    "corpus_mix_temperature" -> "filter over vocabulary-sized source list",
    "dna_debruijn_stats" -> "transform over per-document k-mer array (≤ text length ~102)",
    "dna_kmer_canonical" -> "transform over per-document k-mer array (≤ text length ~102)",
    "dna_minimizers" -> "transform over per-document k-mer array (≤ text length ~102)",
    "dna_orf_finder" -> "transform over the 32-char derived-DNA codon array (≤ 30 elements)",
    "dna_kmer_spectrum" -> "transform over per-document k-mer array (≤ text length ~102)",
    "dna_palindrome_sites" -> "transform over per-document k-mer array (≤ text length ~102)",
    "text_jm_ppl" -> "transform over per-document bigram array (≤ text length ~102)",
    "embed_covariance" -> "transform over the 64-dim embedding vector",
    "embedding_stats" -> "fold over the 64-dim embedding vector",
    "events_ewma" -> "fold over per-type day series (calendar-bounded)",
    "events_holt" -> "fold over per-type day series (calendar-bounded)",
    "events_holt_backtest" -> "fold over per-type day series (calendar-bounded)",
    "events_holt_winters" -> "fold over per-type day series (calendar-bounded)",
    "quality_classifier" -> "fold over per-document token array (≤ text length ~102)",
    "fastq_read_stats" -> "fold over the per-read 32-char quality string (bounded by read length)",
    "text_bigram_ppl" -> "transform over per-document bigram array (≤ text length ~102)",
    "text_collocations" -> "transform over per-document bigram array (≤ text length ~102)",
    "text_kn_ppl" -> "transform over per-document bigram array (≤ text length ~102)",
    "vcf_merge_multisample" -> "sort/transform over per-site sample list (bounded by strain count)",
    "vocab_growth" -> "transform over the driver-scale checkpoint frame (the documented bounded window frame)")

  private def withAqeOff[A](f: => A): A = {
    val key = "spark.sql.adaptive.enabled"
    val old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try f finally spark.conf.set(key, old)
  }

  test("no generated method above the 8KB JIT threshold in any query") {
    withAqeOff {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          val plan = fn(spark, dir).queryExecution.executedPlan
          val subtrees =
            org.apache.spark.sql.execution.debug.codegenStringSeq(plan)
          val big = subtrees.collect {
            case (_, _, stats) if stats.maxMethodCodeSize > 8000 =>
              stats.maxMethodCodeSize
          }
          if (big.nonEmpty) Some(s"$name(${big.max}B)") else None
      }
      assert(offenders.isEmpty, s"over-JIT-limit methods in: $offenders")
    }
  }

  test("higher-order folds only over documented bounded frames") {
    withAqeOff {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          val plan = fn(spark, dir).queryExecution.optimizedPlan
          val hofs = plan.flatMap(_.expressions.flatMap(_.collect {
            case h: HigherOrderFunction => h.prettyName
          }))
          if (hofs.nonEmpty) Some(name -> hofs.distinct.sorted) else None
      }
      val names = offenders.map(_._1).toSet
      assert(names.subsetOf(hofWhitelist.keySet),
        s"undocumented higher-order fold in: " +
          offenders.filterNot(o => hofWhitelist.contains(o._1)))
      assert(hofWhitelist.keySet.subsetOf(names),
        s"stale HOF whitelist entries: ${hofWhitelist.keySet -- names}")
    }
  }
}
