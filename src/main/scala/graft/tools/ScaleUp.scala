package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal data generator: replicates an existing testdata sf
  * directory `factor`x with key-consistent offsets, so the same bench
  * queries run unmodified at 10x the volume (VERDICT r10 next-round #3:
  * "every 100 TB claim is a plan argument proved at sf0.1 — turn it
  * into a curve").
  *
  * Replication is NOT naive row duplication — that would change
  * operator semantics, not just volume:
  *  - every foreign key gets the SAME per-copy offset on both sides
  *    (orders.o_custkey and customer.c_custkey shift together), so join
  *    selectivities are preserved;
  *  - document text gets a per-copy word-suffix rewrite (`w` -> `w~i`),
  *    so copies share NO shingles/grams — otherwise every doc would
  *    acquire factor-1 exact near-dups and the dedup family's candidate
  *    volume would grow quadratically instead of linearly;
  *  - embeddings get a per-copy cyclic rotation (norm-preserving), so
  *    ANN clusters scale in count, not density;
  *  - event user_ids shift per copy but timestamps stay in the same
  *    window: the stream gets denser in users, matching how a bigger
  *    corpus actually looks (more users, same wall-clock span).
  *
  * Dim tables region/nation stay fixed (they are bounded vocabularies,
  * like chromosome lists — scale does not grow them).
  *
  * Usage: runMain graft.tools.ScaleUp <srcSfDir> <dstDir> <factor> [mode]
  *
  * `mode` (default `star`):
  *  - `star`: every table except region/nation replicates with
  *    consistent key offsets — the TPC-H-style "everything grows"
  *    scale-up.
  *  - `facts`: only the fact tables (orders/lineitem/events/documents/
  *    embeddings) replicate; customer/supplier/part stay at base size
  *    and the copies' foreign keys keep pointing INTO the base key
  *    space. This is the genomics/world-model scaling: more variants,
  *    samples and events over the SAME bounded gene models and dims —
  *    the first sf1 run showed the interval-annotation family scaling
  *    quadratically under `star` purely because gene density over the
  *    fixed coordinate space grew 10x, which real genomes do not do.
  *
  * Document text per copy i>0 is CAESAR-ROTATED per letter (i mod 26),
  * not word-suffixed: suffixing leaves interior CHARACTER shingles
  * identical, so minhash banded the copies into ever-denser near-dup
  * clusters (quadratic pair growth — the first rehearsal's 28x on
  * dedup_minhash_pairs was that artifact, not the operator).
  */
object ScaleUp {
  /** Key offset between copies: far above any real key, divisible by
    * most small moduli the queries use for synthetic column derivation
    * (2..13 all divide 720720 = lcm(1..13)*?; actually 720720 =
    * 2^4*3^2*5*7*11*13) so `key % m` distributions are IDENTICAL per
    * copy for every modulus m <= 13 and 16 used in the query bodies. */
  val Offset = 720720L * 100L // 72,072,000

  private def copies(spark: SparkSession, factor: Int): DataFrame =
    spark.range(factor).select(col("id").cast("int").as("__copy"))

  /** Cross-join the frame with copy ids 0..factor-1; caller then maps
    * per-copy columns. The copy frame is 1-row-per-copy and broadcast,
    * so the replication is a narrow map over the source scan. */
  private def replicate(df: DataFrame, factor: Int): DataFrame =
    df.crossJoin(broadcast(copies(df.sparkSession, factor)))

  private def off(c: String) = col(c) + col("__copy") * Offset

  def main(args: Array[String]): Unit = {
    val Array(src, dst, factorS) = args.take(3)
    val factor = factorS.toInt
    val factsOnly = args.lift(3).contains("facts")
    val cpus = Runtime.getRuntime.availableProcessors
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scaleup")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(name: String) = spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$dst/$name.parquet")

    // a dim-side FK: offsets in star mode, stays in base space in facts
    // mode (the copies re-point at the bounded base dims)
    def dimFk(c: String) = if (factsOnly) col(c) else off(c)

    // fixed dims: copy through unchanged
    write(read("region"), "region", 1)
    write(read("nation"), "nation", 1)

    if (factsOnly) {
      write(read("customer"), "customer", 4)
      write(read("supplier"), "supplier", 2)
      write(read("part"), "part", 4)
    } else {
      write(replicate(read("customer"), factor)
        .select(off("c_custkey").as("c_custkey"),
          concat(col("c_name"), lit("_"), col("__copy")).as("c_name"),
          col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")),
        "customer", 4)

      write(replicate(read("supplier"), factor)
        .select(off("s_suppkey").as("s_suppkey"),
          concat(col("s_name"), lit("_"), col("__copy")).as("s_name"),
          col("s_nationkey"), col("s_acctbal")),
        "supplier", 2)

      write(replicate(read("part"), factor)
        .select(off("p_partkey").as("p_partkey"),
          concat(col("p_name"), lit("_"), col("__copy")).as("p_name"),
          col("p_brand"), col("p_type"), col("p_size"),
          col("p_retailprice")),
        "part", 4)
    }

    write(replicate(read("orders"), factor)
      .select(off("o_orderkey").as("o_orderkey"),
        dimFk("o_custkey").as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority")),
      "orders", 8)

    write(replicate(read("lineitem"), factor)
      .select(off("l_orderkey").as("l_orderkey"),
        dimFk("l_partkey").as("l_partkey"),
        dimFk("l_suppkey").as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate")),
      "lineitem", 32)

    write(replicate(read("events"), factor)
      .select(off("event_id").as("event_id"), col("ts"),
        off("user_id").as("user_id"),
        col("event_type"), col("value"), col("props")),
      "events", 16)

    // Per-copy SEEDED LETTER PERMUTATION: copy 0 is the original corpus
    // verbatim; copy i>0 maps a..z through an i-seeded shuffle, which
    // changes EVERY character shingle (a word suffix leaves interior
    // shingles shared and the LSH family then banded copies into
    // ever-denser near-dup clusters — quadratic pair growth by
    // construction). r13: a permutation, not the old Caesar rotation —
    // rotation collides at i ≡ j (mod 26), so any factor > 26 (the sf10
    // build is factor 100) manufactured EXACT duplicate texts across
    // copies and the dedup family's pair volume exploded by artifact.
    // 100 seeded shuffles of 26! permutations collide with probability
    // ~0; shared shingles between distinct permutations require the two
    // permutations to agree on a 3-letter window — rare and unsystematic.
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def perm(i: Int): String = {
      val r = new scala.util.Random(i * 7919L)
      r.shuffle(alpha.toList).mkString
    }
    val rotTxt = (1 until factor).foldLeft(col("text")) { (acc, i) =>
      when(col("__copy") === i, translate(col("text"), alpha, perm(i)))
        .otherwise(acc)
    }
    write(replicate(read("documents"), factor)
      .select(off("doc_id").as("doc_id"), rotTxt.as("text"), col("lang"),
        col("source"), length(rotTxt).cast("long").as("n_chars")),
      "documents", 16)

    // cyclic rotation by copy index composed with per-(copy, dim)
    // xxhash sign flips: norm-preserving, cluster-remapping. r13: the
    // sign flips break the rotation's collision at i ≡ j (mod dim) —
    // factor 100 > dim 64 would otherwise manufacture EXACT duplicate
    // vectors across copies (the text Caesar artifact, vector edition)
    // copy 0 stays VERBATIM (rotation by 0, flip gated off) so a
    // factor-1 run is an identity replication, matching the text path's
    // copy-0 invariant (r13 ADVICE: the ungated flip scrambled copy 0)
    val dim = size(col("embedding"))
    val rot = transform(sequence(lit(0), dim - 1), i =>
      element_at(col("embedding"),
        (pmod(i + col("__copy"), dim) + 1).cast("int"))
      * when(col("__copy") === 0, lit(1.0f))
        .otherwise(lit(1.0f) - lit(2.0f)
          * pmod(xxhash64(col("__copy"), i), lit(2L)).cast("float")))
    write(replicate(read("embeddings"), factor)
      .select(off("vec_id").as("vec_id"),
        rot.cast("array<float>").as("embedding"), col("label")),
      "embeddings", 8)

    spark.stop()
  }
}
