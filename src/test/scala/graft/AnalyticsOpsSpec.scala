package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Dna
import graft.operators.{EventOps, Intervals, Selection, Similarity, TextAnalysis}

/** Specs for the round-7 analytics additions: interval coverage sweep,
  * full-corpus k-means step, perplexity bucketing, vocabulary growth,
  * k-mer expansion. */
class AnalyticsOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("coverageSegments: overlap, gap, adjacency, per-key isolation") {
    // chr 0: [10,19] and [15,24] overlap on [15,19]; [30,34] after a gap
    // chr 1: [10,19] alone — keys sweep independently
    val iv = Seq((0L, 10L, 19L), (0L, 15L, 24L), (0L, 30L, 34L),
      (1L, 10L, 19L)).toDF("chr", "s", "e")
    val segs = Intervals.coverageSegments(iv, Seq("chr"), col("s"), col("e"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(segs == Set(
      (0L, 10L, 15L, 1L, 5L), (0L, 15L, 20L, 2L, 5L), (0L, 20L, 25L, 1L, 5L),
      (0L, 25L, 30L, 0L, 5L), // the inter-interval gap is a depth-0 segment
      (0L, 30L, 35L, 1L, 5L),
      (1L, 10L, 20L, 1L, 10L)))
    val hist = Intervals.coverageHistogram(iv, Seq("chr"), col("s"), col("e"))
      .as[(Long, Long, Long)].collect().toSet
    assert(hist == Set((0L, 1L, 5L), (1L, 4L, 25L), (2L, 1L, 5L)))
    // two intervals meeting exactly (stop+1 == start) cancel their
    // breakpoint: one merged-depth segment, no zero-length artifact
    val adj = Seq((0L, 1L, 5L), (0L, 6L, 9L)).toDF("chr", "s", "e")
    val a = Intervals.coverageSegments(adj, Seq("chr"), col("s"), col("e"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(a == Set((0L, 1L, 10L, 1L, 9L)))
  }

  test("overlapJoined equals the naive theta join, duplicate-free across bins") {
    import graft.operators.RangeJoin
    // intervals spanning multiple 10-wide bins force the report-once
    // rule to matter: (1,25)x(8,40) share bins 0,1,2
    val iv = Seq((0L, 1L, 1L, 25L), (0L, 2L, 8L, 40L), (0L, 3L, 26L, 30L),
      (0L, 4L, 90L, 95L), (1L, 5L, 1L, 25L)).toDF("chr", "id", "s", "e")
    val aSide = iv.select(col("chr"), col("id").as("id_a"),
      col("s").as("a_s"), col("e").as("a_e"))
    val bSide = iv.select(col("chr"), col("id").as("id_b"),
      col("s").as("b_s"), col("e").as("b_e"))
    val got = RangeJoin.overlapJoined(aSide, bSide, "a_s", "a_e",
        "b_s", "b_e", keys = Seq("chr"), binWidth = 10)
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toList
    // EXACTLY once each (toList, not toSet: duplicates must not hide)
    assert(got.sorted == List((1L, 2L), (2L, 3L)))
    // naive quadratic twin on the same data
    val rows = iv.as[(Long, Long, Long, Long)].collect()
    val naive = (for {
      (c1, i1, s1, e1) <- rows; (c2, i2, s2, e2) <- rows
      if c1 == c2 && i1 < i2 && s1 <= e2 && s2 <= e1
    } yield (i1, i2)).toList.sorted
    assert(got.sorted == naive)
  }

  test("coverage conservation laws on random interval sets") {
    // Σ depth·bp over segments == Σ interval lengths (every covered
    // base is counted exactly its depth), per key — the sweep's
    // accounting identity, on deterministic pseudo-random intervals
    val rnd = new scala.util.Random(42)
    val iv = Seq.tabulate(200) { i =>
      val chr = (i % 3).toLong
      val s = rnd.nextInt(1000).toLong
      (chr, s, s + 1 + rnd.nextInt(120))
    }.toDF("chr", "s", "e")
    val segs = Intervals.coverageSegments(iv, Seq("chr"), col("s"), col("e"))
    val lhs = segs.select(sum(col("depth") * col("bp"))).as[Long].head()
    val rhs = iv.select(sum(col("e") - col("s") + 1)).as[Long].head()
    assert(lhs == rhs)
    // segments within a key tile the swept span without gap or overlap
    val rows = segs.orderBy("chr", "pos")
      .as[(Long, Long, Long, Long, Long)].collect()
    rows.groupBy(_._1).values.foreach { g =>
      g.sliding(2).foreach {
        case Array(a, b) => assert(a._3 == b._2, s"tile break at $a -> $b")
        case _ =>
      }
    }
  }

  test("aHash: hand image, perturbation locality, blocked pairs == brute force") {
    import graft.operators.Multimodal
    import graft.operators.Multimodal.MediaCodec
    // 8x8 image, left half black, right half white -> bits = right half
    val half = MediaCodec.bmpWithPixels(8, 8,
      (x, _) => if (x < 4) 0x000000 else 0xFFFFFF)
    val h = MediaCodec.aHashBmp(half).get
    assert(java.lang.Long.bitCount(h) == 32)
    // row-major packing, bit 63 = top-left: each row byte is 0000 1111
    assert(((h >>> 56) & 0xffL) == 0x0fL)
    // all-same image -> no cell above the mean -> hash 0
    assert(MediaCodec.aHashBmp(
      MediaCodec.bmpWithPixels(8, 8, (_, _) => 0xFFFFFF)).contains(0L))
    // undersized and non-BMP payloads quarantine
    assert(MediaCodec.aHashBmp(MediaCodec.bmpBytes(4, 4)).isEmpty)
    assert(MediaCodec.aHashBmp(MediaCodec.wavBytes(8000, 1)).isEmpty)
    // a one-pixel flip moves hamming by at most a few bits
    val flip = MediaCodec.bmpWithPixels(8, 8,
      (x, y) => if (x < 4 ^ (x == 0 && y == 0)) 0x000000 else 0xFFFFFF)
    val hf = MediaCodec.aHashBmp(flip).get
    assert(java.lang.Long.bitCount(h ^ hf) <= 2)
    // top-down BMP (negative stored height, rows first-to-last): same
    // image, same hash — not a vertical flip
    val gradient = MediaCodec.bmpWithPixels(8, 8,
      (x, y) => if (y < 2 || x + y > 9) 0xFFFFFF else 0x000000)
    val td = gradient.clone()
    val negH = -8
    td(22) = (negH & 0xff).toByte; td(23) = ((negH >> 8) & 0xff).toByte
    td(24) = ((negH >> 16) & 0xff).toByte; td(25) = ((negH >> 24) & 0xff).toByte
    val rowSize = 24 // 8px * 3B, already word-aligned
    for (r <- 0 until 4; i <- 0 until rowSize) {
      val a = 54 + r * rowSize + i; val b = 54 + (7 - r) * rowSize + i
      val t = td(a); td(a) = td(b); td(b) = t
    }
    assert(MediaCodec.aHashBmp(td) == MediaCodec.aHashBmp(gradient))
    assert(MediaCodec.aHashBmp(gradient).get != 0L)
    // blocked candidate pairs equal the brute-force hamming join
    val imgs = Multimodal.syntheticImages(
      spark.range(0, 48).toDF("doc_id"), "doc_id")
    val hashes = Multimodal.imageHashes(imgs)
    val hs = hashes.collect().map(r => r.media_id -> r.ahash).toMap
    val brute = (for {
      a <- hs.keys; b <- hs.keys if a < b
      d = java.lang.Long.bitCount(hs(a) ^ hs(b)) if d <= 3
    } yield (a, b, d.toLong)).toSet
    val got = Multimodal.imageNearDupPairs(hashes, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute)
    assert(got.size == 12 * 6) // 12 groups x C(4,2) within-group pairs
  }

  test("WAV round-trips arbitrary sample arrays bit-exactly") {
    import graft.operators.Multimodal.MediaCodec
    val rnd = new scala.util.Random(7)
    for (n <- Seq(0, 1, 2, 255, 256, 1001)) {
      val s = Array.fill(n)((rnd.nextInt(65536) - 32768).toShort)
      val back = MediaCodec.wavSamples(MediaCodec.wavWithSamples(44100, 1, s))
      assert(back.exists { case (r, c, got) =>
        r == 44100 && c == 1 && got.sameElements(s) }, s"n=$n")
    }
  }

  test("powerIteration converges to the dominant axis and stays unit-norm") {
    // 30 vectors along x (magnitude 5) vs 5 along y (magnitude 1):
    // the Gram matrix's top eigenvector is the x axis
    val vecs = (Seq.fill(30)(Array(5f, 0f)) ++ Seq.fill(5)(Array(0f, 1f)))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val v = Similarity.powerIteration(vecs, "embedding", dim = 2,
      iterations = 6)
    assert(math.abs(math.abs(v(0)) - 1.0) < 1e-6, v.toSeq.toString)
    assert(math.abs(v(1)) < 1e-6)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-12) // unit norm
    // zero iterations: the uniform start vector
    val v0 = Similarity.powerIteration(vecs, "embedding", 2, 0)
    assert(v0.toSeq == Seq(1.0 / math.sqrt(2.0), 1.0 / math.sqrt(2.0)))
  }

  test("kmeansStep: exact per-cluster per-dim means against hand assignment") {
    // 2 centroids in 2-d: c0=(0,0), c1=(10,10); points split by geometry
    val cents = Array(Array(0f, 0f), Array(10f, 10f))
    val vecs = Seq(
      (1L, Array(1f, 2f)), (2L, Array(2f, 1f)),     // -> c0
      (3L, Array(9f, 9f)), (4L, Array(11f, 10f))    // -> c1
    ).toDF("vec_id", "embedding")
    val out = Similarity.kmeansStep(vecs, "embedding", cents)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out == Map(
      (0L, 0L) -> ((2L, 1.5)), (0L, 1L) -> ((2L, 1.5)),
      (1L, 0L) -> ((2L, 10.0)), (1L, 1L) -> ((2L, 9.5))))
  }

  test("kmeansTrainFull converges to the true means from a bad init") {
    val vecs = (Seq.tabulate(20)(i => Array(0f + i % 3, 1f + i % 3)) ++
      Seq.tabulate(20)(i => Array(30f + i % 3, 31f + i % 3)))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    // both init centroids sit in cluster 1's half-space, one closer to
    // cluster 2 — Lloyd must walk it over
    val init = Array(Array(0f, 0f), Array(8f, 8f))
    val out = Similarity.kmeansTrainFull(vecs, "embedding", init, 5)
    // per-cluster true mean of i%3 over 20 pts: (1*7 + 2*6)/20 = 0.95
    // (the x1e6 integer scale divides exactly: 19e6/20 = 950000)
    assert(out(0).toSeq == Seq(0.95f, 1.95f))
    assert(out(1).toSeq == Seq(30.95f, 31.95f))
    // zero iterations returns the init untouched
    assert(Similarity.kmeansTrainFull(vecs, "embedding", init, 0)
      .map(_.toSeq).toSeq == init.map(_.toSeq).toSeq)
  }

  test("StreamAnomaly scores before folding, independent of trigger chop") {
    import graft.streaming.StreamAnomaly
    import graft.streaming.StreamAnomaly.{Anomaly, Obs, Profile}
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def st() = TestGroupState.create[Profile](
      org.apache.spark.api.java.Optional.empty[Profile](),
      GroupStateTimeout.NoTimeout, 1000L,
      org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    val quiet = (0 until 9).map(d => Obs("a", d, 10.0 + (d % 3)))
    val spike = Obs("a", 9, 100.0)
    // one trigger with everything
    val s1 = st()
    val one = StreamAnomaly.update(3.0, 3)("a",
      (quiet :+ spike).iterator, s1).toList
    assert(one.map(a => (a.bin, a.value)) == List((9L, 100.0)))
    // same stream chopped into three triggers -> same flags, same state
    val s2 = st()
    val chopped =
      StreamAnomaly.update(3.0, 3)("a", quiet.take(4).iterator, s2).toList ++
        StreamAnomaly.update(3.0, 3)("a", quiet.drop(4).iterator, s2).toList ++
        StreamAnomaly.update(3.0, 3)("a", Iterator(spike), s2).toList
    assert(chopped.map(a => (a.bin, a.value)) == List((9L, 100.0)))
    assert(s1.get.n == s2.get.n && s1.get.mean == s2.get.mean &&
      math.abs(s1.get.m2 - s2.get.m2) < 1e-9)
    // under-history keys never flag
    val s3 = st()
    assert(StreamAnomaly.update(3.0, 3)("b",
      Iterator(Obs("b", 0, 1.0), Obs("b", 1, 99.0)), s3).isEmpty)
  }

  test("pagerank: path-graph centrality, mass conservation, zero-iter init") {
    import graft.operators.Graphs
    // undirected path 1-2-3: the middle node collects from both ends
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
    val pr = Graphs.pagerank(edges, "src", "dst", iterations = 10)
      .as[(Long, Double)].collect().toMap
    assert(pr(2L) > pr(1L) && pr(1L) == pr(3L)) // symmetry + centrality
    // total mass stays ~1 (rounding loss bounded by edges x 1e-12)
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
    // zero iterations: the uniform init
    val init = Graphs.pagerank(edges, "src", "dst", iterations = 0)
      .as[(Long, Double)].collect().toMap
    assert(init.values.forall(_ == 1.0 / 3))
  }

  test("pagerank: directed chain keeps zero-in-degree nodes; dangling " +
      "flag conserves mass through a sink") {
    import graft.operators.Graphs
    // 1 -> 2 -> 3: node 1 has no in-edges, node 3 is a sink
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val pr = Graphs.pagerank(edges, "src", "dst", iterations = 3)
      .as[(Long, Double)].collect().toMap
    // the zero-in-degree source survives every iteration at teleport-only
    // mass (it used to vanish after iteration 1)
    assert(pr.keySet == Set(1L, 2L, 3L))
    assert(math.abs(pr(1L) - 0.05) < 1e-12)
    // default (no dangling handling): the sink swallows mass
    assert(pr.values.sum < 1.0 - 1e-3)
    // dangling redistribution: total mass stays 1 every round
    val prd = Graphs.pagerank(edges, "src", "dst", iterations = 3,
      handleDangling = true).as[(Long, Double)].collect().toMap
    assert(math.abs(prd.values.sum - 1.0) < 1e-9)
    // hand-checked first iteration: pr'(2) = 0.05 + 0.85*(1/3 + (1/3)/3)
    val pr1 = Graphs.pagerank(edges, "src", "dst", iterations = 1,
      handleDangling = true).as[(Long, Double)].collect().toMap
    assert(math.abs(pr1(2L) - (0.05 + 0.85 * (1.0 / 3 + 1.0 / 9))) < 1e-9)
    assert(math.abs(pr1(1L) - (0.05 + 0.85 / 9)) < 1e-9)
  }

  test("TopK.ranked: window-free rank matches the row_number contract " +
      "and plans as TakeOrderedAndProject") {
    import graft.operators.TopK
    val df = Seq(("a", 3L), ("b", 9L), ("c", 9L), ("d", 1L), ("e", 5L))
      .toDF("k", "v")
    val top = TopK.ranked(df, 3, col("v").desc, col("k").asc)
      .as[(Long, String, Long)].collect().toList
    assert(top == List((1L, "b", 9L), (2L, "c", 9L), (3L, "e", 5L)))
    // the heavy part is a sort+limit -> per-partition heaps, never a
    // single-partition window
    val plan = df.orderBy(col("v").desc, col("k").asc).limit(3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // k past the row count: every row ranked, no padding
    assert(TopK.ranked(df, 99, col("v").desc, col("k").asc).count() == 5)
  }

  test("pplBuckets: tercile labels per group, boundary goes low") {
    val scored = (1 to 9).map(i => (i.toLong, "en", i.toDouble))
      .toDF("id", "lang", "score")
    val out = Selection.pplBuckets(scored, "id", "lang", "score")
      .select("id", "bucket").as[(Long, String)].collect().toMap
    // percentile(1..9, 1/3)≈3.6667, (2/3)≈6.3333: 1-3 head, 4-6 middle
    assert((1L to 3L).forall(out(_) == "head"))
    assert((4L to 6L).forall(out(_) == "middle"))
    assert((7L to 9L).forall(out(_) == "tail"))
    // a score exactly on a rounded boundary labels LOW (<= semantics)
    val tie = Seq((1L, "x", 1.0), (2L, "x", 2.0), (3L, "x", 3.0))
      .toDF("id", "lang", "score")
    val t = Selection.pplBuckets(tie, "id", "lang", "score")
      .select("id", "bucket").as[(Long, String)].collect().toMap
    assert(t == Map(1L -> "head", 2L -> "middle", 3L -> "tail"))
  }

  test("vocabGrowth bins tokens by first-occurrence checkpoint") {
    // doc 0 introduces a b; doc 1 re-uses a, introduces c; doc 25 only
    // re-uses; doc 30 introduces d (second checkpoint at step=25)
    val docs = Seq((0L, Seq("a", "b")), (1L, Seq("a", "c")),
      (25L, Seq("b", "c")), (30L, Seq("d"))).toDF("doc_id", "toks")
    val out = TextAnalysis.vocabGrowth(docs, "doc_id", col("toks"), 25L)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toList
    assert(out == List((25L, 3L, 3L), (50L, 1L, 4L)))
  }

  test("BpeOps.encode: chained merges, rank priority, same-char pairs, word isolation") {
    import graft.functions.BpeOps
    import graft.functions.BpeOps.BpeModel
    def enc(m: BpeModel, s: String): List[String] =
      BpeOps.encode(org.apache.spark.unsafe.types.UTF8String.fromString(s), m)
        .toArray[AnyRef](org.apache.spark.sql.types.StringType)
        .map(_.toString).toList
    // chained: t+a -> ta, then ta+b -> tab
    val chain = BpeModel(Seq(("t", "a"), ("ta", "b")))
    assert(enc(chain, "tab") == List("tab"))
    assert(enc(chain, "bat") == List("b", "a", "t")) // no pair present
    // rank priority: ("a","b") outranks ("b","c") -> "abc" = ab + c
    assert(enc(BpeModel(Seq(("a", "b"), ("b", "c"))), "abc") == List("ab", "c"))
    assert(enc(BpeModel(Seq(("b", "c"), ("a", "b"))), "abc") == List("a", "bc"))
    // same-char pair merges left-to-right non-overlapping
    assert(enc(BpeModel(Seq(("a", "a"))), "aaaa") == List("aa", "aa"))
    assert(enc(BpeModel(Seq(("a", "a"))), "aaa") == List("aa", "a"))
    // words tokenize independently; normalization applies first
    assert(enc(chain, "  TAB  ta ") == List("tab", "ta"))
    // reference implementation cross-check over the synthetic vocabulary
    val model = BpeModel(Seq(("t", "a"), ("ta", "b"), ("s", "c"), ("a", "n"),
      ("sc", "an"), ("r", "o"), ("ro", "w"), ("k", "e"), ("ke", "y"), ("a", "g")))
    def reference(word: String): List[String] = {
      var parts = word.map(_.toString).toList
      var changed = true
      while (changed && parts.size > 1) {
        val ranked = parts.zip(parts.tail).zipWithIndex.flatMap {
          case ((x, y), i) =>
            model.merges.indexOf((x, y)) match {
              case -1 => Nil; case r => Seq((r, i))
            }
        }
        if (ranked.isEmpty) changed = false
        else {
          val best = ranked.minBy(_._1)._1
          val (a, b) = model.merges(best)
          val out = scala.collection.mutable.ListBuffer[String]()
          var k = 0
          while (k < parts.size) {
            if (k < parts.size - 1 && parts(k) == a && parts(k + 1) == b) {
              out += (a + b); k += 2
            } else { out += parts(k); k += 1 }
          }
          parts = out.toList
        }
      }
      parts
    }
    val vocab = Seq("key", "agg", "row", "scan", "slow", "fast", "table",
      "value", "part", "hash", "merge", "batch", "window", "spark", "tab")
    vocab.foreach { w =>
      assert(enc(model, w) == reference(w), s"word $w")
    }
  }

  test("bpePairCounts: corpus-weighted pair counts with total-order ranks") {
    // "ab ab abc d": pair 'ab' from ab(x2, freq-weighted) + abc(x1) = 3;
    // 'bc' = 1; 1-char word d contributes nothing
    val docs = Seq("ab ab abc", "d ab").toDF("text")
    val out = TextAnalysis.bpePairCounts(docs, "text", topK = 10)
      .as[(Long, String, Long)].collect().toList.sortBy(_._1)
    assert(out == List((1L, "ab", 4L), (2L, "bc", 1L)))
    // topK truncates on the (cnt desc, pair asc) total order
    val top1 = TextAnalysis.bpePairCounts(docs, "text", topK = 1)
      .as[(Long, String, Long)].collect().toList
    assert(top1 == List((1L, "ab", 4L)))
  }

  test("bigramSurprisal: add-1 smoothed conditional bits, hand-checked") {
    // bigrams: "a b" x3, "a c" x1; V=3; c1(a)=4
    // p(b|a)=(3+1)/(4+3) -> su4=round(log2(7/4)*1e4)=8074
    // p(c|a)=(1+1)/7     -> su4=round(log2(7/2)*1e4)=18074
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramSurprisal(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((1L, 0.8074)) && out(2L) == out(1L))
    assert(out(4L) == ((1L, 1.8074)))
  }

  test("dailyEwma runs the recurrence in day order with s0 = x0") {
    val dayUs = 86400000000L
    // days arrive out of order; counts per day: d0=10, d1=20, d2=40
    val rows = (0 until 40).map(i => ("a", 2 * dayUs + i)) ++
      (0 until 10).map(i => ("a", 0 * dayUs + i)) ++
      (0 until 20).map(i => ("a", 1 * dayUs + i))
    val out = EventOps.dailyEwma(rows.toDF("event_type", "ts_us"),
        "event_type", col("ts_us"), alpha = 0.3)
      .as[(String, Long, Long, Double)].collect().toList
    val expected = 0.3 * 40.0 + 0.7 * (0.3 * 20.0 + 0.7 * 10.0)
    assert(out == List(("a", 3L, 2L, expected)))
    // single-day series: ewma = that day's count (the s0 rule)
    val one = EventOps.dailyEwma(Seq(("b", 5L)).toDF("event_type", "ts_us"),
        "event_type", col("ts_us"), alpha = 0.3)
      .as[(String, Long, Long, Double)].collect().toList
    assert(one == List(("b", 1L, 0L, 1.0)))
  }

  test("dailyAnomaliesMad catches a spike the z-score's own outlier masks") {
    val dayUs = 86400000000L
    // per-day counts 8,9,10,11,12,100: the spike inflates stddev to
    // ~36.8 so its z is only ~2.04 — but med=10.5, mad=1.5 flag it
    val counts = Seq(8, 9, 10, 11, 12, 100)
    val rows = counts.zipWithIndex.flatMap { case (n, d) =>
      (0 until n).map(i => ("a", d * dayUs + i)) }
    val ev = rows.toDF("event_type", "ts_us")
    val mad = EventOps.dailyAnomaliesMad(ev, "event_type", col("ts_us"), k = 3.0)
      .as[(String, Long, Long, Double, Double)].collect().toList
    assert(mad == List(("a", 5L, 100L, 10.5, 1.5)))
    assert(EventOps.dailyAnomalies(ev, "event_type", col("ts_us"),
      zThresh = 3.0).count() == 0L) // the z-score path is blind here
  }

  test("WAV PCM round-trip and framed energy, quarantine on non-audio") {
    import graft.operators.Multimodal
    import graft.operators.Multimodal.{MediaCodec, MediaRow}
    val samples = Array[Short](3, -4, 1000, -32768)
    val wav = MediaCodec.wavWithSamples(8000, 1, samples)
    assert(MediaCodec.wavSamples(wav).contains((8000, 1, samples)) ||
      MediaCodec.wavSamples(wav).exists { case (r, c, s) =>
        r == 8000 && c == 1 && s.sameElements(samples) })
    // header-only WAV decodes to ZERO samples (empty data chunk — and
    // audioEnergy then emits zero frames); BMP payloads quarantine
    assert(MediaCodec.wavSamples(MediaCodec.wavBytes(8000, 1))
      .exists { case (_, _, s) => s.isEmpty })
    assert(MediaCodec.wavSamples(MediaCodec.bmpBytes(4, 4)).isEmpty)
    val media = Seq(MediaRow(7L, "audio", wav),
      MediaRow(8L, "image", MediaCodec.bmpBytes(4, 4))).toDS()
    val frames = Multimodal.audioEnergy(media, frameSize = 3)
      .collect().map(f => (f.media_id, f.frame_idx, f.n_samples, f.sum_sq))
      .toList
    // frame 0: 9+16+1000000; ragged frame 1: 32768^2; image -> no rows
    assert(frames == List((7L, 0, 3, 1000025L), (7L, 1, 1, 1073741824L)))
  }

  test("hweChi4 exact at equilibrium and against a hand-computed departure") {
    import graft.operators.PopGen
    val sites = Seq(
      (1L, 100L, 36L, 48L, 16L), // p=0.4, perfectly at HWE -> chi2 = 0
      (2L, 100L, 50L, 20L, 30L)  // p=0.4: 196/36 + 784/48 + 196/16
    ).toDF("site", "n", "n0", "n1", "n2")
    val out = sites.select(col("site"),
        PopGen.hweChi4(col("n"), col("n0"), col("n1"), col("n2")).as("chi4"))
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == 0L)
    assert(out(2L) == 340278L) // 34.02777... x 1e4
    val ts = Seq(("A", "G"), ("G", "A"), ("C", "T"), ("T", "C"))
    val tv = Seq(("A", "C"), ("A", "T"), ("G", "C"), ("G", "T"))
    val tt = (ts ++ tv).toDF("r", "v")
      .select(col("r"), col("v"),
        PopGen.isTransition(col("r"), col("v")).as("is_ts"))
      .as[(String, String, Boolean)].collect()
    assert(tt.forall { case (r, v, f) => f == ts.contains((r, v)) })
  }

  test("wordBigrams + Dna.kmers expansion and short-input guards") {
    val bg = Seq("one two  three", "solo", "").toDF("t")
      .select(TextAnalysis.wordBigrams(col("t")).as("b"))
      .as[Seq[String]].collect().toList
    assert(bg == List(Seq("one two", "two three"), Seq(), Seq()))
    val km = Seq("ACGTA", "ACG", "AC").toDF("dna")
      .select(Dna.kmers(col("dna"), 3).as("k"))
      .as[Seq[String]].collect().toList
    // multiplicity preserved, shorter-than-k input yields empty
    assert(km == List(Seq("ACG", "CGT", "GTA"), Seq("ACG"), Seq()))
  }
}
