package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming twins of the batch event operators: watermarked exact dedup
  * and the chained stream-stream join + aggregation attribution pipeline.
  */
class StreamingDedupSpec extends SparkSpecBase {
  import spark.implicits._

  test("streamingDedup keeps first arrival per key within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "k", "v")
    val q = graft.streaming.EventsOps.streamingDedup(events, Seq("k"), "1 hour")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      mem.addData(
        (ts("2024-01-01 10:00:00"), "a", 1.0),
        (ts("2024-01-01 10:05:00"), "a", 2.0), // dup within watermark -> dropped
        (ts("2024-01-01 10:10:00"), "b", 3.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT k, v FROM dedup ORDER BY k")
        .as[(String, Double)].collect().toSeq
      assert(rows == Seq(("a", 1.0), ("b", 3.0)))
      // batch twin: dropDuplicates over the same data
      val batch = Seq(
        (ts("2024-01-01 10:00:00"), "a", 1.0),
        (ts("2024-01-01 10:05:00"), "a", 2.0),
        (ts("2024-01-01 10:10:00"), "b", 3.0)).toDF("ts", "k", "v")
        .orderBy("ts").dropDuplicates("k")
        .select("k", "v").orderBy("k").as[(String, Double)].collect().toSeq
      assert(batch == rows)
    } finally q.stop()
  }

  test("streamingCorpusIngest: classify vs index, novel docs fold in, replays don't double-append") {
    import graft.operators.Dedup
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("sci").toString
    val idxPath = s"$dir/index"; val decPath = s"$dir/decisions"
    // seed corpus -> saved index
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely unrelated text about distributed query engines")
    ).toDF("doc_id", "text")
    Dedup.saveLshIndex(Dedup.buildLshIndex(corpus, "text", "doc_id"), idxPath)
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.DedupOps.streamingCorpusIngest(
        mem.toDF().toDF("doc_id", "text"), "text", "doc_id", 0.5,
        idxPath, decPath)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      // batch 1: one novel doc, one near-dup of corpus doc 1
      mem.addData(
        (10L, "spark catalyst optimizer rewrites logical plans into physical ones"),
        (11L, "the quick brown fox jumps over the lazy dog again and again"))
      q.processAllAvailable()
      // batch 2: near-dup of batch-1's NOVEL doc (proves the index grew)
      // plus a replay of doc 10 itself (retry shape)
      mem.addData(
        (20L, "spark catalyst optimizer rewrites logical plans into physical stages"),
        (10L, "spark catalyst optimizer rewrites logical plans into physical ones"))
      q.processAllAvailable()
    } finally q.stop()
    // epoch_id is a partition column (epoch-overwrite replay safety) —
    // cast the inferred int to the long the assertions key on
    val dec = spark.read.parquet(decPath)
      .withColumn("epoch_id", col("epoch_id").cast("long"))
      .collect()
      .map(r => (r.getAs[Long]("epoch_id"), r.getAs[Long]("new_id")) ->
        (Option(r.getAs[java.lang.Long]("matched_id")).map(_.longValue),
          r.getAs[Boolean]("is_novel"))).toMap
    assert(dec((0L, 10L)) == (None, true))
    assert(dec((0L, 11L)) == (Some(1L), false))
    assert(dec((1L, 20L)) == (Some(10L), false)) // matched the GROWN index
    assert(dec((1L, 10L)) == (Some(10L), false)) // replay: dup of itself
    // index state: exactly {1, 2, 10}, one shingle row each — the
    // replayed 10 was anti-joined out, 11/20 never entered
    val ids = spark.read.parquet(s"$idxPath/shingles")
      .groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ids == Map(1L -> 1L, 2L -> 1L, 10L -> 1L))
  }

  test("streamingSemanticIngest: index grows with survivors, replays idempotent") {
    import graft.operators.SemanticIndex
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ssi").toString
    val idxPath = s"$dir/semindex"; val decPath = s"$dir/decisions"
    // seed corpus e1, e2 -> saved index (dim and banding pinned in meta)
    SemanticIndex.build(
      Seq((1L, Seq(1.0, 0.0, 0.0, 0.0)), (2L, Seq(0.0, 1.0, 0.0, 0.0)))
        .toDF("id", "v"),
      "id", "v", dim = 4, idxPath, nBits = 4, nTables = 8)
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.DedupOps.streamingSemanticIngest(
        mem.toDF().toDF("id", "v"), "id", "v", 0.9,
        idxPath, decPath)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      // batch 1: novel e3 twice (within-batch dup, min id 10 survives)
      // plus a scaled copy of corpus e1 (corpus dup)
      mem.addData(
        (10L, Seq(0.0, 0.0, 1.0, 0.0)),
        (12L, Seq(0.0, 0.0, 2.0, 0.0)),
        (11L, Seq(3.0, 0.0, 0.0, 0.0)))
      q.processAllAvailable()
      // batch 2: near-dup of batch-1's SURVIVOR (proves the index
      // grew) plus a re-sent id 10 (retry shape). The classification
      // never matches a row against its OWN indexed id (genuine
      // replays reproduce their original decisions), so the re-sent 10
      // beats 20 as the min-id within-batch survivor — and the
      // idempotent append still refuses to double-insert it
      mem.addData(
        (20L, Seq(0.0, 0.0, 5.0, 0.0)),
        (10L, Seq(0.0, 0.0, 1.0, 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val dec = spark.read.parquet(decPath)
      .withColumn("epoch_id", col("epoch_id").cast("long"))
      .collect()
      .map(r => (r.getAs[Long]("epoch_id"), r.getAs[Long]("id")) ->
        r.getAs[Boolean]("is_novel")).toMap
    assert(dec == Map(
      (0L, 10L) -> true, (0L, 12L) -> false, (0L, 11L) -> false,
      (1L, 20L) -> false, (1L, 10L) -> true), s"got $dec")
    // index state: exactly the seed + the one survivor, appended once
    // (8 key rows each — one per table), never double-appended
    val ids = spark.read.parquet(s"$idxPath/keys").groupBy("id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ids == Map(1L -> 8L, 2L -> 8L, 10L -> 8L), s"got $ids")
  }
}

class StreamingPsiWindowSpec extends SparkSpecBase {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  test("streamingPsi matches the batch PSI window by window") {
    import graft.operators.Stats
    val ref = Seq.tabulate(1000)(i => Tuple1((i % 100).toDouble)).toDF("v")
    val (edges, shares) = Stats.psiReference(ref, "v", 10)
    assert(edges.size == 9 && shares.sum > 0.999)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val q = graft.streaming.StreamingDrift.streamingPsi(
        mem.toDF().toDF("ts", "v"), "ts", "v", edges, shares, "1 hour",
        lateness = "1 second")
      .writeStream.format("memory").queryName("spsi").outputMode("append")
      .start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      // window A: matches the reference shape; window B: +50 shift
      val winA = (0 until 200).map(i =>
        (ts("2024-01-01 10:00:05"), (i % 100).toDouble))
      val winB = (0 until 200).map(i =>
        (ts("2024-01-01 11:00:05"), (i % 100) + 50.0))
      mem.addData(winA ++ winB: _*)
      mem.addData((ts("2024-01-01 13:00:00"), 1.0)) // advance watermark
      q.processAllAvailable()
      val rows = spark.sql("SELECT window_start, n, psi FROM spsi ORDER BY 1")
        .collect()
      assert(rows.length == 2)
      val psiA = rows(0).getAs[Double]("psi")
      val psiB = rows(1).getAs[Double]("psi")
      // bit-identical to the batch operator on the same rows + reference
      def batchPsi(rows: Seq[(java.sql.Timestamp, Double)]): Double =
        Stats.psi(ref, rows.map(_._2).map(Tuple1(_)).toDF("v"), "v", 10)
          .head().getAs[Double]("psi")
      assert(psiA == batchPsi(winA), s"window A: $psiA")
      assert(psiB == batchPsi(winB), s"window B: $psiB")
      assert(psiA < 0.01 && psiB > 0.25)
    } finally q.stop()
  }
}

class StreamingMmdSpec extends SparkSpecBase {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  test("streamingMmd matches the batch mmdDrift window by window") {
    import graft.operators.Similarity
    // 4-d reference cloud; window A draws from the same generator
    // (statistic ~ the 1/n floor), window B is shifted (+1 on every
    // coordinate) and must score far higher — and BOTH closed windows
    // must equal the batch operator on the same rows bit-for-bit.
    def vec(i: Int, shift: Double) = Seq(
      math.sin(i * 0.7) + shift, math.cos(i * 1.3) + shift,
      math.sin(i * 2.1) * 0.5 + shift, math.cos(i * 0.4) * 0.25 + shift)
    val ref = (0 until 300).map(i => Tuple1(vec(i, 0.0))).toDF("v")
    val (refMeans, refN) = Similarity.rffMeans(ref, "v", 4)
    assert(refN == 300L)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Seq[Double])]
    val q = graft.streaming.StreamingDrift.streamingMmd(
        mem.toDF().toDF("ts", "v"), "ts", "v", 4, refMeans.toSeq, "1 hour",
        lateness = "1 second")
      .writeStream.format("memory").queryName("smmd").outputMode("append")
      .start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      val winA = (1000 until 1200).map(i => (ts("2024-01-01 10:00:05"), vec(i, 0.0)))
      val winB = (2000 until 2200).map(i => (ts("2024-01-01 11:00:05"), vec(i, 1.0)))
      mem.addData(winA ++ winB: _*)
      mem.addData((ts("2024-01-01 13:00:00"), vec(0, 0.0))) // advance watermark
      q.processAllAvailable()
      val rows = spark.sql("SELECT window_start, n, mmd2 FROM smmd ORDER BY 1")
        .collect()
      assert(rows.length == 2)
      assert(rows.forall(_.getAs[Long]("n") == 200L))
      val mA = rows(0).getAs[Double]("mmd2")
      val mB = rows(1).getAs[Double]("mmd2")
      def batchMmd(rows: Seq[(java.sql.Timestamp, Seq[Double])]): Double =
        Similarity.mmdDrift(rows.map(r => Tuple1(r._2)).toDF("v"), ref, "v", 4)
          .head().getAs[Double]("mmd2")
      assert(mA == batchMmd(winA), s"window A: $mA vs ${batchMmd(winA)}")
      assert(mB == batchMmd(winB), s"window B: $mB vs ${batchMmd(winB)}")
      assert(mB > 10 * mA, s"shifted window must dominate: $mB vs $mA")
    } finally q.stop()
  }
}

class StreamingPqStalenessSpec extends SparkSpecBase {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  test("streamingPqStaleness matches the batch reconstructionDrift window by window") {
    import graft.operators.Pq
    // 2 subspaces x 2 dims on a planted grid; window A sits on-grid
    // (tiny jitter), window B shifts subspace 1 off the codebook — its
    // mse must jump while subspace 0 stays put, and every closed
    // (window, subspace) mse must equal the batch operator bit-for-bit.
    val books: Array[Array[Array[Double]]] = Array(
      Array(Array(0.0, 0.0), Array(4.0, 4.0)),
      Array(Array(1.0, -1.0), Array(-3.0, 5.0)))
    def vec(i: Int, shift: Double) = Seq(
      (if (i % 2 == 0) 0.0 else 4.0) + 0.001 * i,
      (if (i % 2 == 0) 0.0 else 4.0) - 0.001 * i,
      1.0 + shift, -1.0 + shift)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Seq[Double])]
    val q = graft.streaming.StreamingDrift.streamingPqStaleness(
        mem.toDF().toDF("ts", "v"), "ts", "v", books, "1 hour",
        lateness = "1 second")
      .writeStream.format("memory").queryName("spq").outputMode("append")
      .start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      val winA = (0 until 80).map(i => (ts("2024-01-01 10:00:05"), vec(i, 0.0)))
      val winB = (0 until 80).map(i => (ts("2024-01-01 11:00:05"), vec(i, 0.7)))
      mem.addData(winA ++ winB: _*)
      mem.addData((ts("2024-01-01 13:00:00"), vec(0, 0.0))) // advance watermark
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT window_start, subspace, n, mse FROM spq ORDER BY 1, 2").collect()
      assert(rows.length == 4)
      assert(rows.forall(_.getAs[Long]("n") == 80L))
      def batch(win: Seq[(java.sql.Timestamp, Seq[Double])]): Map[Long, Double] =
        Pq.reconstructionDrift(win.map(r => Tuple1(r._2)).toDF("v"), "v", books)
          .collect().map(r => r.getLong(0) -> r.getAs[Double]("mse")).toMap
      val bA = batch(winA); val bB = batch(winB)
      assert(rows(0).getAs[Double]("mse") == bA(0L))
      assert(rows(1).getAs[Double]("mse") == bA(1L))
      assert(rows(2).getAs[Double]("mse") == bB(0L))
      assert(rows(3).getAs[Double]("mse") == bB(1L))
      // the drift localizes: subspace 1's window-B error dominates both
      // its window-A self and subspace 0's window-B value
      assert(bB(1L) > 100 * bA(1L) && bB(1L) > 100 * bB(0L),
        s"shifted subspace must alarm: $bB vs $bA")
    } finally q.stop()
  }
}

class StreamingCellDriftSpec extends SparkSpecBase {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  test("streamingCellDrift matches the batch cellMassDrift window by window") {
    import graft.operators.Similarity
    // two clean 2-d clusters; reference 50/50. Window A keeps the mix
    // (psi ~ 0), window B starves cluster 0 (cell 0 must alarm) — and
    // every closed (window, cell) psi_term must equal the batch
    // operator oriented (window, reference) on the same rows.
    def vec(i: Int, c: Int) = Seq(
      if (c == 0) 10.0 + 0.01 * i else 0.3,
      if (c == 1) 10.0 - 0.01 * i else 0.2)
    val ref = (0 until 200).map(i => Tuple1(vec(i, i % 2))).toDF("v")
    val cents = Array(Array(10.0, 0.0), Array(0.0, 10.0))
    // reference shares = the batch operator's own rounded shares
    val refShares = Similarity.cellMassDrift(ref, ref, "v", cents)
      .orderBy("cell").collect().map(_.getAs[Double]("share1")).toSeq
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Seq[Double])]
    val q = graft.streaming.StreamingDrift.streamingCellDrift(
        mem.toDF().toDF("ts", "v"), "ts", "v", cents, refShares, "1 hour",
        lateness = "1 second")
      .writeStream.format("memory").queryName("scell").outputMode("append")
      .start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      val winA = (0 until 100).map(i => (ts("2024-01-01 10:00:05"), vec(i, i % 2)))
      val winB = (0 until 100).map(i =>
        (ts("2024-01-01 11:00:05"), vec(i, if (i % 10 == 0) 0 else 1)))
      mem.addData(winA ++ winB: _*)
      mem.addData((ts("2024-01-01 13:00:00"), vec(0, 0))) // advance watermark
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT window_start, cell, n, share, psi_term FROM scell ORDER BY 1, 2")
        .collect()
      assert(rows.length == 4)
      def batch(win: Seq[(java.sql.Timestamp, Seq[Double])]): Map[Long, Double] =
        Similarity.cellMassDrift(win.map(r => Tuple1(r._2)).toDF("v"), ref, "v", cents)
          .collect().map(r => r.getLong(0) -> r.getAs[Double]("psi_term")).toMap
      val bA = batch(winA); val bB = batch(winB)
      assert(rows(0).getAs[Double]("psi_term") == bA(0L))
      assert(rows(1).getAs[Double]("psi_term") == bA(1L))
      assert(rows(2).getAs[Double]("psi_term") == bB(0L))
      assert(rows(3).getAs[Double]("psi_term") == bB(1L))
      // the starved cell alarms; the steady window stays near zero
      assert(rows(2).getAs[Double]("psi_term") > 0.2)
      assert(math.abs(rows(0).getAs[Double]("psi_term")) < 0.01)
    } finally q.stop()
  }
}

class StreamingEntropySpec extends SparkSpecBase {
  import spark.implicits._

  test("streamingEntropy matches batch categoricalEntropy window by window") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val q = graft.streaming.StreamingDrift.streamingEntropy(
        mem.toDF().toDF("ts", "cat"), "ts", "cat",
        Seq("x", "y"), refEntropy = 0.5, "1 hour", lateness = "1 second")
      .writeStream.format("memory").queryName("sent").outputMode("append")
      .start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      // window A: uniform two-category mix; window B: skewed + an
      // UNSEEN category (folds into "other")
      val winA = Seq("x", "x", "y", "y").map((ts("2024-01-01 10:00:05"), _))
      val winB = Seq("x", "x", "x", "z").map((ts("2024-01-01 11:00:05"), _))
      mem.addData(winA ++ winB: _*)
      mem.addData((ts("2024-01-01 13:00:00"), "x")) // advance watermark
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT window_start, n, entropy, entropy_delta FROM sent ORDER BY 1")
        .collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Long]("n") == 4L)
      assert(rows(0).getAs[Double]("entropy") == 0.693147) // ln 2
      assert(rows(0).getAs[Double]("entropy_delta") == 0.193147)
      // bit-identical to the batch operator with the same "other" fold
      def batch(cats: Seq[String]): Double =
        graft.operators.Stats.categoricalEntropy(
            cats.map(c => ("g", if (Seq("x", "y").contains(c)) c else "other"))
              .toDF("g", "c"), "g", "c")
          .head().getAs[Double]("entropy")
      assert(rows(0).getAs[Double]("entropy") == batch(Seq("x", "x", "y", "y")))
      assert(rows(1).getAs[Double]("entropy") == batch(Seq("x", "x", "x", "z")))
      assert(rows(1).getAs[Double]("entropy") == 0.562335)
    } finally q.stop()
  }
}

class StreamingJsdSpec extends SparkSpecBase {
  import spark.implicits._

  test("streamingJsDivergence matches the batch operator window by window") {
    implicit val sqlCtx = spark.sqlContext
    // reference shares chosen to be exact double ratios of counts
    // {x:2, y:2} so the batch twin reproduces them bit-exactly
    val refCounts = Seq("x", "x", "y", "y")
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val q = graft.streaming.StreamingDrift.streamingJsDivergence(
        mem.toDF().toDF("ts", "cat"), "ts", "cat",
        Map("x" -> 0.5, "y" -> 0.5), "1 hour", lateness = "1 second")
      .writeStream.format("memory").queryName("sjsd").outputMode("append")
      .start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      // window A: same mix as the reference (JSD exactly 0); window B:
      // skewed with an UNSEEN category (ref-share-0 "other" stays finite)
      val winA = Seq("x", "x", "y", "y").map((ts("2024-01-01 10:00:05"), _))
      val winB = Seq("x", "x", "x", "z").map((ts("2024-01-01 11:00:05"), _))
      mem.addData(winA ++ winB: _*)
      mem.addData((ts("2024-01-01 13:00:00"), "x"))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT window_start, n, jsd FROM sjsd ORDER BY 1").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Long]("n") == 4L)
      assert(rows(0).getAs[Double]("jsd") == 0.0)
      assert(rows(1).getAs[Double]("jsd") > 0.1)
      // bit-identical to the batch operator over the same rows with the
      // same "other" collapse
      def batch(cur: Seq[String]): Double =
        graft.operators.Stats.jsDivergence(
            refCounts.toDF("c"),
            cur.map(c => if (Seq("x", "y").contains(c)) c else "other")
              .toDF("c"), "c")
          .head().getAs[Double]("jsd")
      assert(rows(0).getAs[Double]("jsd") == batch(Seq("x", "x", "y", "y")))
      assert(rows(1).getAs[Double]("jsd") ==
        batch(Seq("x", "x", "x", "z")))
    } finally q.stop()
  }
}

class StreamingHoltSpec extends SparkSpecBase {
  import spark.implicits._

  test("streaming Holt trajectory is bit-identical to the batch fold across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    val q = graft.streaming.StreamingHolt(
        mem.toDF().toDF("series_key", "t", "v"), 0.3, 0.1)
      .writeStream.format("memory").queryName("sholt").outputMode("update")
      .start()
    try {
      val ys = Seq.tabulate(10)(i => 5.0 + 3.0 * i + (i % 3))
      // two micro-batches, in order — state carries the recursion over
      mem.addData(ys.take(4).zipWithIndex.map { case (v, i) => ("m1", i.toLong, v) }: _*)
      q.processAllAvailable()
      mem.addData(ys.drop(4).zipWithIndex.map { case (v, i) => ("m1", (i + 4).toLong, v) }: _*)
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT t, value, level, trend, fitted, residual FROM sholt ORDER BY t")
        .collect()
      val want = graft.operators.Stats.holtSmooth(
          ys.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("t", "v"),
          "t", "v", 0.3, 0.1)
        .select("t", "value", "level", "trend", "fitted", "residual")
        .orderBy("t").collect()
      assert(got.length == want.length)
      got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }
      // a second key gets its own independent state
      mem.addData(("m2", 0L, 1.0), ("m2", 1L, 2.0))
      q.processAllAvailable()
      val m2 = spark.sql(
        "SELECT trend FROM sholt WHERE series_key = 'm2' ORDER BY t").collect()
      assert(m2.length == 2 && m2.forall(_.getDouble(0) == 1.0))
    } finally q.stop()
  }
}

class StreamingBotScoreSpec extends SparkSpecBase {
  import spark.implicits._

  test("streaming bot verdicts are bit-identical to the batch fold across batches") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // same fixtures as the batch spec: a metronome, a bursty human
    val bot = (0 until 25).map(i => (1L, i.toLong, ts(1000L + i * 60)))
    val human = (0 until 25).scanLeft((2L, 100L, 1000L)) { case ((u, id, t), i) =>
      (u, id + 1, t + (if (i % 2 == 0) 10 else 600))
    }.tail.map { case (u, id, t) => (u, id, ts(t)) }
    val all = (bot ++ human).map { case (u, id, t) => (u, id, t, s"t${id % 3}") }
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp, String)]
    val q = graft.streaming.StreamingBotScore(
        mem.toDF().toDF("user_id", "event_id", "ts", "event_type"))
      .writeStream.format("memory").queryName("sbot").outputMode("update")
      .start()
    try {
      // split in event-time order per user — state carries the fold over
      val (b1, b2) = all.partition(_._3.getTime < 1000L * 1700)
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      // latest verdict per user = the row with the full event count
      val got = spark.sql(
        """SELECT user_id, n_events, span_s, events_per_minute, gap_cv,
          |  n_types, bot_flag FROM sbot a
          |WHERE n_events = (SELECT max(n_events) FROM sbot b
          |  WHERE b.user_id = a.user_id) ORDER BY user_id""".stripMargin)
        .collect()
      val want = graft.operators.EventAnalytics.botScore(
          all.toDF("user_id", "event_id", "ts", "event_type"))
        .select("user_id", "n_events", "span_s", "events_per_minute",
          "gap_cv", "n_types", "bot_flag")
        .orderBy("user_id").collect()
      assert(got.length == want.length && got.nonEmpty)
      got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }
    } finally q.stop()
  }
}

class StreamingSrmSpec extends SparkSpecBase {
  import spark.implicits._

  test("streamingSrm matches the batch srmCheck chi2 window by window; unknown arms counted") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val q = graft.streaming.StreamingDrift.streamingSrm(
        mem.toDF().toDF("ts", "arm"), "ts", "arm",
        Map("A" -> 0.5, "B" -> 0.5), "1 hour", lateness = "1 second")
      .writeStream.format("memory").queryName("ssrm").outputMode("append")
      .start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      // window A: perfect 50/50 (chi2 exactly 0); window B: 15/5 skew
      // with one off-design arm that must count as unknown, not silently
      // shrink the test
      val winA = (Seq.fill(10)("A") ++ Seq.fill(10)("B"))
        .map((ts("2024-01-01 10:00:05"), _))
      val winB = (Seq.fill(15)("A") ++ Seq.fill(5)("B") ++ Seq("typo"))
        .map((ts("2024-01-01 11:00:05"), _))
      mem.addData(winA ++ winB: _*)
      mem.addData((ts("2024-01-01 13:00:00"), "A")) // advance watermark
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT * FROM ssrm ORDER BY window_start").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Long]("n") == 20L)
      assert(rows(0).getAs[Double]("chi2") == 0.0)
      assert(!rows(0).getAs[Boolean]("srm_flag"))
      assert(rows(0).getAs[Long]("n_unknown") == 0L)
      // (15-10)^2/10 + (5-10)^2/10 = 5.0 > 3.841459
      assert(rows(1).getAs[Long]("n") == 20L)
      assert(rows(1).getAs[Long]("n_unknown") == 1L)
      assert(rows(1).getAs[Double]("chi2") == 5.0)
      assert(rows(1).getAs[Boolean]("srm_flag"))
      // bit-identical to the batch operator on the designed arms
      def batchChi2(arms: Seq[String]): Double =
        graft.operators.Experiment.srmCheck(arms.toDF("arm"), "arm",
          Map("A" -> 0.5, "B" -> 0.5)).head().getAs[Double]("chi2")
      assert(rows(1).getAs[Double]("chi2") ==
        batchChi2(Seq.fill(15)("A") ++ Seq.fill(5)("B")))
      assert(rows(0).getAs[Int]("dof") == 1)
    } finally q.stop()
  }
}

class StreamingCompactLatestSpec extends SparkSpecBase {
  import spark.implicits._

  test("streaming compaction converges to the batch latest-per-key, late data included") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[(Long, Long, String, Double, java.sql.Timestamp)]
    val events = mem.toDF().toDF("event_id", "user_id", "event_type", "value", "ts")
    val q = graft.streaming.StreamingCompactLatest(events)
      .writeStream.format("memory").queryName("compact").outputMode("update").start()
    try {
      mem.addData(
        (1L, 1L, "a", 1.0, ts("2024-01-01 10:00:00")),
        (2L, 1L, "b", 2.0, ts("2024-01-01 11:00:00")),
        (3L, 2L, "x", 3.0, ts("2024-01-01 10:30:00")))
      q.processAllAvailable()
      mem.addData(
        // LATE arrival for user 1, but older than the reigning winner
        (4L, 1L, "late-old", 9.0, ts("2024-01-01 10:30:00")),
        // genuine newer record for user 2
        (5L, 2L, "y", 4.0, ts("2024-01-01 12:00:00")),
        // same-ts tie for user 2: higher event_id must win
        (6L, 2L, "z", 5.0, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      // memory sink in update mode appends each batch's updates: the
      // LAST row per key is the current state
      val state = spark.sql("SELECT * FROM compact")
        .as[(Long, Long, String, Double, java.sql.Timestamp)].collect()
        .zipWithIndex.groupBy(_._1._1)
        .map { case (u, rows) => u -> rows.maxBy(_._2)._1 }
      val batch = graft.operators.ChangeCapture.compactLatest(
        Seq(
          (1L, 1L, "a", 1.0, ts("2024-01-01 10:00:00")),
          (2L, 1L, "b", 2.0, ts("2024-01-01 11:00:00")),
          (3L, 2L, "x", 3.0, ts("2024-01-01 10:30:00")),
          (4L, 1L, "late-old", 9.0, ts("2024-01-01 10:30:00")),
          (5L, 2L, "y", 4.0, ts("2024-01-01 12:00:00")),
          (6L, 2L, "z", 5.0, ts("2024-01-01 12:00:00")))
          .toDF("event_id", "user_id", "event_type", "value", "ts"),
        "user_id", "ts", "event_id")
        .as[(Long, Long, String, Double, java.sql.Timestamp)].collect()
        .map(r => r._2 -> r).toMap
      assert(state.keySet == batch.keySet)
      // streaming rows are (user_id, event_id, type, value, ts); batch
      // keeps input order (event_id, user_id, type, value, ts)
      state.foreach { case (u, s) =>
        val b = batch(u)
        assert((s._2, s._3, s._4) == (b._1, b._3, b._4), s"user $u")
      }
      assert(state(1L)._3 == "b")   // late-old never displaced the winner
      assert(state(2L)._3 == "z")   // tie broken by event_id
    } finally q.stop()
  }
}

class StreamingTransitionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("streaming transitions accumulate to the batch Markov counts across batches") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val all = Seq(
      (1L, 1L, "a", ts("2024-01-01 10:00:00")),
      (2L, 1L, "b", ts("2024-01-01 10:01:00")),
      (3L, 1L, "a", ts("2024-01-01 10:02:00")),   // crosses the batch split
      (4L, 2L, "x", ts("2024-01-01 10:00:30")),
      (5L, 2L, "x", ts("2024-01-01 10:01:30")))
    val mem = MemoryStream[(Long, Long, String, java.sql.Timestamp)]
    val events = mem.toDF().toDF("event_id", "user_id", "event_type", "ts")
    val q = graft.streaming.StreamingTransitions(events)
      .writeStream.format("memory").queryName("trans").outputMode("append").start()
    try {
      mem.addData(all.take(2): _*); q.processAllAvailable()
      mem.addData(all.drop(2): _*); q.processAllAvailable()
      val streamed = spark.sql("SELECT from_type, to_type FROM trans")
        .as[(String, String)].collect().groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
      val batch = graft.operators.EventAnalytics.transitionMatrix(
        all.toDF("event_id", "user_id", "event_type", "ts"))
        .select("from_type", "to_type", "n")
        .as[(String, String, Long)].collect()
        .map(r => ((r._1, r._2), r._3)).toMap
      assert(streamed == batch)
      assert(batch(("b", "a")) == 1L) // the cross-batch pair was chained via state
    } finally q.stop()
  }
}

class StreamingHeavyHittersSpec extends SparkSpecBase {
  import spark.implicits._

  test("space-saving finds every true heavy key with bounded counters and valid bounds") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    // skewed stream: keys 1..3 heavy (300/200/100), keys 1000.. light noise
    val heavy = Seq.fill(300)(1L) ++ Seq.fill(200)(2L) ++ Seq.fill(100)(3L)
    val noise = (0 until 400).map(i => 1000L + i)
    val data = scala.util.Random.shuffle(heavy ++ noise) // order must not matter
    val events = mem.toDF().toDF("k")
    val q = graft.streaming.StreamingHeavyHitters(events, "k", m = 16, nBuckets = 4)
      .writeStream.format("memory").queryName("hh").outputMode("update").start()
    try {
      val (b1, b2) = data.splitAt(data.size / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      // latest emission per key is the current estimate
      val est = spark.sql("SELECT * FROM hh")
        .collect().zipWithIndex.groupBy(_._1.getLong(0))
        .map { case (k, rows) => k -> rows.maxBy(_._2)._1 }
      val truth = Map(1L -> 300L, 2L -> 200L, 3L -> 100L)
      truth.foreach { case (k, n) =>
        assert(est.contains(k), s"heavy key $k must be tracked")
        val r = est(k)
        val (count, err) = (r.getLong(1), r.getLong(2))
        assert(count >= n && count - err <= n,
          s"key $k: true $n must lie in [${count - err}, $count]")
      }
      // update-mode sink accumulates across batches (evicted keys keep
      // their old rows), so bound the CONFIDENT set instead: keys whose
      // lower bound clears the noise floor are exactly the heavy ones
      val confident = est.collect {
        case (k, r) if r.getLong(1) - r.getLong(2) >= 50 => k
      }.toSet
      assert(confident == truth.keySet,
        s"lower-bound-confident set must be the true heavy keys, got $confident")
    } finally q.stop()
  }

  test("globalTopK merges per-bucket summaries into a top-k whose bounds bracket the truth") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val heavy = Seq.fill(400)(7L) ++ Seq.fill(250)(8L) ++ Seq.fill(120)(9L)
    val noise = (0 until 300).map(i => 5000L + i)
    val data = scala.util.Random.shuffle(heavy ++ noise)
    val events = mem.toDF().toDF("k")
    val q = graft.streaming.StreamingHeavyHitters(events, "k", m = 16, nBuckets = 4)
      .writeStream.format("memory").queryName("hh_merge").outputMode("update").start()
    try {
      val (b1, b2) = data.splitAt(data.size / 3)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val merged = graft.streaming.StreamingHeavyHitters
        .globalTopK(spark.sql("SELECT * FROM hh_merge"), 3)
        .collect()
      // top-3 by estimated count must be exactly the true heavy keys,
      // ordered, each with true_count ∈ [count − err, count]
      val truth = Seq(7L -> 400L, 8L -> 250L, 9L -> 120L)
      assert(merged.map(_.getLong(0)).toSeq == truth.map(_._1),
        s"global top-3 keys: ${merged.map(_.getLong(0)).mkString(",")}")
      truth.zip(merged).foreach { case ((k, n), r) =>
        val (count, err) = (r.getLong(1), r.getLong(2))
        assert(count >= n && count - err <= n,
          s"key $k: true $n must lie in [${count - err}, $count]")
      }
    } finally q.stop()
  }

  test("space-saving at capacity >= distinct keys EQUALS the batch heavyHitters exactly") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    // 8 distinct keys, m=16 per bucket: no evictions anywhere, so every
    // estimate is exact (err = 0) and the streaming summary must agree
    // with the batch operator's exact counts key for key
    val data = scala.util.Random.shuffle(
      (1L to 8L).flatMap(k => Seq.fill(k.toInt * 20)(k)))
    val events = mem.toDF().toDF("k")
    val q = graft.streaming.StreamingHeavyHitters(events, "k", m = 16, nBuckets = 4)
      .writeStream.format("memory").queryName("hh_exact").outputMode("update").start()
    try {
      val (b1, b2) = data.splitAt(data.size / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val est = spark.sql("SELECT * FROM hh_exact")
        .collect().zipWithIndex.groupBy(_._1.getLong(0))
        .map { case (k, rows) => k -> rows.maxBy(_._2)._1 }
      assert(est.values.forall(_.getLong(2) == 0L), "no evictions -> err 0")
      // batch twin at support 0.1: keys with count > 0.1 * 720 = 72
      val batch = graft.operators.EventAnalytics
        .heavyHitters(data.toDF("k"), "k", 0.1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(batch.nonEmpty, "batch twin must find heavy keys")
      batch.foreach { case (k, n) =>
        assert(est(k).getLong(1) == n,
          s"key $k: streaming ${est(k).getLong(1)} != batch exact $n")
      }
      // and the full streaming summary carries the exact count of EVERY key
      val truth = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      truth.foreach { case (k, n) => assert(est(k).getLong(1) == n, s"key $k") }
    } finally q.stop()
  }

  test("streaming rolling anomaly matches the batch twin on an in-order spiky stream") {
    implicit val sqlCtx = spark.sqlContext
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:00:$i%02d")
    // key 1: steady 10/12 alternation, then a spike at event 15
    val data = (0 until 15).map(i =>
      (1L, i.toLong, ts(i), if (i % 2 == 0) 10.0 else 12.0)) :+
      (1L, 15L, ts(15), 500.0)
    val batch = graft.operators.EventAnalytics.rollingAnomaly(
      data.toDF("user_id", "event_id", "ts", "value"),
      "user_id", "value", n = 10, threshold = 3.0)
      .select($"event_id", $"z", $"is_anomaly")
      .as[(Long, Option[Double], Boolean)].collect().sortBy(_._1)

    val mem = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "event_id", "ts", "value")
    val q = graft.streaming.StreamingRollingAnomaly(
      events, "user_id", "value", n = 10, threshold = 3.0)
      .writeStream.format("memory").queryName("roll_anom")
      .outputMode("append").start()
    try {
      val (b1, b2) = data.splitAt(8)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val stream = spark.sql("SELECT event_id, z, is_anomaly FROM roll_anom")
        .as[(Long, Option[Double], Boolean)].collect().sortBy(_._1)
      assert(stream.toSeq == batch.toSeq,
        s"stream ${stream.toSeq} != batch ${batch.toSeq}")
      // the spike is flagged, and only the spike
      assert(stream.count(_._3) == 1 && stream.find(_._3).get._1 == 15L)
    } finally q.stop()
  }

  test("streamingExactDedup drops cross-batch duplicates within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val events = mem.toDF().toDF("event_id", "ts", "payload")
    val q = graft.streaming.EventsOps
      .streamingExactDedup(events, Seq("event_id"), lateness = "1 hour")
      .writeStream.format("memory").queryName("dedup_twin")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 10:00:00"), "first"),
        (2L, ts("2024-01-01 10:01:00"), "second"),
        (1L, ts("2024-01-01 10:02:00"), "dup-in-batch"))
      q.processAllAvailable()
      mem.addData(
        (2L, ts("2024-01-01 10:10:00"), "dup-across-batches"),
        (3L, ts("2024-01-01 10:11:00"), "third"))
      q.processAllAvailable()
      val got = spark.sql("SELECT event_id, payload FROM dedup_twin")
        .collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
      assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L), s"got ${got.toSeq}")
      // the FIRST arrival wins; later duplicates (same or later batch) drop
      assert(got.toMap == Map(1L -> "first", 2L -> "second", 3L -> "third"))
    } finally q.stop()
  }

  test("streamingNewUsers matches the batch first-appearance counts on an in-order stream") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val events = mem.toDF().toDF("user_id", "ts")
    val q = graft.streaming.EventsOps
      .streamingNewUsers(events, lateness = "1 hour")
      .writeStream.format("memory").queryName("new_users_twin")
      .outputMode("append").start()
    val batchRows = scala.collection.mutable.ArrayBuffer
      .empty[(Long, java.sql.Timestamp)]
    try {
      val b1 = Seq(
        (1L, ts("2024-01-01 08:00:00")), (2L, ts("2024-01-01 09:00:00")),
        (1L, ts("2024-01-01 10:00:00")))                    // repeat: not new
      val b2 = Seq(
        (3L, ts("2024-01-02 08:00:00")),                    // new on day 2
        (2L, ts("2024-01-02 09:00:00")),                    // repeat across days
        (4L, ts("2024-01-02 10:00:00")))
      val closer = Seq((4L, ts("2024-01-03 13:00:00")))     // advances watermark
      batchRows ++= b1 ++= b2 ++= closer
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(closer: _*); q.processAllAvailable()
      val got = spark.sql("SELECT CAST(day AS DATE) AS day, new_users FROM new_users_twin")
        .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      // batch twin on the same rows (closed days only: 01-01 and 01-02)
      import spark.implicits._
      val batch = graft.operators.EventAnalytics
        .cumulativeDistinctDaily(batchRows.toSeq.toDF("user_id", "ts"))
        .select($"day".cast("string"), $"new_users")
        .as[(String, Long)].collect().toMap
      assert(got.keySet == Set("2024-01-01", "2024-01-02"), s"got $got")
      got.foreach { case (d, n) => assert(batch(d) == n, s"day $d: $n vs ${batch(d)}") }
      // dedup semantics: repeats never recount (user 2 on day 2)
      assert(got("2024-01-02") == 2L)
    } finally q.stop()
  }

  test("non-numeric keys are dropped after the long cast instead of NPE-ing the encoder") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val events = mem.toDF().toDF("k")
    val q = graft.streaming.StreamingHeavyHitters(events, "k", m = 4, nBuckets = 2)
      .writeStream.format("memory").queryName("hh_nulls").outputMode("update").start()
    try {
      mem.addData("alpha", "beta", "alpha", "42", "42")
      q.processAllAvailable()
      // castable "42" survives; "alpha"/"beta" null out and are filtered
      val rows = spark.sql("SELECT * FROM hh_nulls").collect()
      assert(rows.map(_.getLong(0)).toSet == Set(42L))
      assert(rows.exists(r => r.getLong(0) == 42L && r.getLong(1) == 2L))
    } finally q.stop()
  }
}

class StreamingAttributionSpec extends SparkSpecBase {
  import spark.implicits._

  test("streaming attribution (join + agg chain, append mode) matches batch") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val real = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "click", 1.0),
      (2L, 1L, ts("2024-01-01 10:20:00"), "click", 2.0),
      (100L, 1L, ts("2024-01-01 10:30:00"), "purchase", 50.0),
      (3L, 2L, ts("2024-01-01 09:00:00"), "click", 3.0),
      (200L, 2L, ts("2024-01-01 10:00:00"), "purchase", 60.0)) // click 60m old > horizon

    val mem = MemoryStream[(Long, Long, java.sql.Timestamp, String, Double)]
    val events = mem.toDF().toDF("event_id", "user_id", "ts", "event_type", "value")
    val q = graft.streaming.EventsOps
      .streamingPurchaseAttribution(events, horizonMinutes = 30, lateness = "10 minutes")
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    try {
      mem.addData(real: _*)
      q.processAllAvailable()
      // two sentinel batches push the watermark past the real data so the
      // join results flow into the aggregation and the group finalizes
      // (wm used by batch N = max event time through batch N-1 - lateness)
      mem.addData((900L, 98L, ts("2024-01-02 10:00:00"), "click", 0.0),
        (901L, 99L, ts("2024-01-02 10:00:00"), "purchase", 0.0))
      q.processAllAvailable()
      mem.addData((902L, 98L, ts("2024-01-02 12:00:00"), "click", 0.0),
        (903L, 99L, ts("2024-01-02 12:00:00"), "purchase", 0.0))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT event_id, user_id, n_prior_clicks, last_click_value FROM attr ORDER BY event_id")
        .as[(Long, Long, Long, Double)].collect().toSeq
      assert(got == Seq((100L, 1L, 2L, 2.0)), got.toString)

      val batchDf = real.toDF("event_id", "user_id", "ts", "event_type", "value")
      val batch = graft.streaming.EventsOps.purchaseAttribution(
          batchDf.filter($"event_type" === "purchase"),
          batchDf.filter($"event_type" === "click"), 30)
        .select("event_id", "user_id", "n_prior_clicks", "last_click_value")
        .orderBy("event_id").as[(Long, Long, Long, Double)].collect().toSeq
      assert(batch == got, s"batch=$batch stream=$got")
    } finally q.stop()
  }
}

class StreamingOuterJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("watermarked left-outer stream-stream join emits zero-click purchases") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp, String, Double)]
    val events = mem.toDF().toDF("event_id", "user_id", "ts", "event_type", "value")
    val purchases = events.filter($"event_type" === "purchase")
      .withWatermark("ts", "10 minutes")
    val clicks = events.filter($"event_type" === "click")
      .withWatermark("ts", "10 minutes")
    // the raw outer join (pre-aggregation): unmatched purchases surface
    // once the watermark passes their horizon
    val p = purchases.select($"event_id", $"user_id".as("p_user"), $"ts".as("p_ts"))
    val c = clicks.select($"user_id".as("c_user"), $"ts".as("c_ts"), $"value".as("c_value"))
    val joined = p.join(c,
      $"p_user" === $"c_user" && $"c_ts" <= $"p_ts" &&
        $"c_ts" >= $"p_ts" - org.apache.spark.sql.functions.expr("INTERVAL 30 MINUTES"),
      "left_outer")
    val q = joined.writeStream.format("memory").queryName("outer_attr")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, 1L, ts("2024-01-01 10:20:00"), "click", 2.0),
        (100L, 1L, ts("2024-01-01 10:30:00"), "purchase", 50.0),
        (200L, 2L, ts("2024-01-01 10:00:00"), "purchase", 60.0)) // no click at all
      mem.addData((9L, 9L, ts("2024-01-01 13:00:00"), "click", 0.0)) // advance watermark
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT event_id, c_value FROM outer_attr ORDER BY event_id")
        .as[(Long, Option[Double])].collect().toSeq
      assert(rows == Seq((100L, Some(2.0)), (200L, None)))
      // batch twin over the same events
      val ev = Seq(
        (1L, 1L, ts("2024-01-01 10:20:00"), "click", 2.0),
        (100L, 1L, ts("2024-01-01 10:30:00"), "purchase", 50.0),
        (200L, 2L, ts("2024-01-01 10:00:00"), "purchase", 60.0),
        (9L, 9L, ts("2024-01-01 13:00:00"), "click", 0.0))
        .toDF("event_id", "user_id", "ts", "event_type", "value")
      val batch = graft.streaming.EventsOps.purchaseAttributionOuter(
          ev.filter($"event_type" === "purchase"),
          ev.filter($"event_type" === "click"), 30)
        .select($"event_id", $"n_prior_clicks")
        .as[(Long, Long)].collect().toMap
      assert(batch == Map(100L -> 1L, 200L -> 0L))
    } finally q.stop()
  }
}

class StreamStaticJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("stream-static enrichment join is stateless and matches batch") {
    implicit val sqlCtx = spark.sqlContext
    // static dimension: user -> segment (broadcast per micro-batch, no state)
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "segment")
    val mem = MemoryStream[(Long, Long, Double)]
    val events = mem.toDF().toDF("event_id", "user_id", "value")
    val q = events.join(broadcast(dim), Seq("user_id"), "left")
      .withColumn("segment", coalesce($"segment", lit("unknown")))
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    try {
      mem.addData((10L, 1L, 5.0), (11L, 2L, 6.0), (12L, 99L, 7.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_id, segment FROM enriched ORDER BY event_id")
        .as[(Long, String)].collect().toSeq
      assert(rows == Seq((10L, "gold"), (11L, "silver"), (12L, "unknown")))
    } finally q.stop()
  }
}

class StreamingGapFillSpec extends SparkSpecBase {
  import spark.implicits._

  test("streaming gap fill emits zero rows for closed gap days, matching batch") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val events = mem.toDF().toDF("user_id", "ts")
    val q = graft.streaming.StreamingGapFill(events, lateness = "1 day")
      .writeStream.format("memory").queryName("gapfill").outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 10:00:00")),
        (1L, ts("2024-01-01 12:00:00")),
        (1L, ts("2024-01-03 09:00:00"))) // 01-02 is a gap day
      q.processAllAvailable()
      // watermark still at 01-02: nothing finalized yet
      mem.addData((99L, ts("2024-01-05 00:00:00"))) // advance watermark to 01-04
      q.processAllAvailable()
      mem.addData((98L, ts("2024-01-09 00:00:00"))) // fire pending timeouts
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, CAST(day AS STRING), n_events FROM gapfill WHERE user_id = 1 ORDER BY day")
        .as[(Long, String, Long)].collect().toSeq
      assert(rows == Seq(
        (1L, "2024-01-01", 2L), (1L, "2024-01-02", 0L), (1L, "2024-01-03", 1L)))
      // batch twin over the same user-1 events emits exactly these rows
      val ev = Seq((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 12:00:00")),
        (1L, ts("2024-01-03 09:00:00"))).toDF("user_id", "ts")
      val batch = graft.streaming.EventsOps.dailyGapFill(ev)
        .select($"user_id", $"day".cast("string"), $"n_events")
        .as[(Long, String, Long)].collect().toSeq.sortBy(_._2)
      assert(batch == rows)
    } finally q.stop()
  }
}

class StreamingHllSpec extends SparkSpecBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("streaming HLL registers are bit-identical to the batch sketch; estimate matches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val q = graft.streaming.StreamingHll(mem.toDF().toDF("k"), "k")
      .writeStream.format("memory").queryName("hll_twin")
      .outputMode("update").start()
    try {
      mem.addData(0L until 800L: _*); q.processAllAvailable()
      mem.addData(600L until 1500L: _*); q.processAllAvailable()
      val emitted = spark.sql("SELECT bucket, register FROM hll_twin")
      // the merge view's dense registers == the batch sketch of the union
      val streamed = emitted.groupBy("bucket").agg(max("register").as("register"))
      val batch = graft.operators.Hll.registers((0L until 1500L).toDF("k"), "k")
        .filter($"register" > 0)
      assert(streamed.orderBy("bucket").collect().toSeq ==
        batch.orderBy("bucket").collect().toSeq)
      val estStream = graft.operators.Hll.estimateFromEmissions(emitted)
        .as[Double].collect()(0)
      val estBatch = graft.operators.Hll
        .estimate(graft.operators.Hll.registers((0L until 1500L).toDF("k"), "k"))
        .as[Double].collect()(0)
      assert(estStream == estBatch, s"$estStream != $estBatch")
    } finally q.stop()
  }
}

class StreamingPsiSpec extends SparkSpecBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("streaming histogram == batch fixed-grid counts; psiFromCounts flags drift") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Double]
    val q = graft.streaming.StreamingPsi(mem.toDF().toDF("v"), "v", 0.0, 100.0)
      .writeStream.format("memory").queryName("psi_twin")
      .outputMode("update").start()
    try {
      mem.addData((0 until 500).map(i => (i % 100).toDouble): _*)
      q.processAllAvailable()
      mem.addData((0 until 400).map(i => (i % 30).toDouble): _*)
      q.processAllAvailable()
      // counts are monotone per bin: latest emission = max = current
      val emitted = spark.sql("SELECT bin, n FROM psi_twin")
        .groupBy("bin").agg(max("n").as("n"))
        .as[(Long, Long)].collect().toMap
      val all = ((0 until 500).map(i => (i % 100).toDouble) ++
        (0 until 400).map(i => (i % 30).toDouble)).toDF("v")
      val batch = all
        .select(graft.operators.Distribution.fixedBin($"v", 0.0, 100.0, 10).as("bin"))
        .groupBy("bin").count().as[(Long, Long)].collect().toMap
      assert(emitted == batch, s"stream $emitted != batch $batch")
      val obs = (0 until 10).map(i => emitted.getOrElse(i.toLong, 0L))
      assert(graft.operators.Distribution.psiFromCounts(obs, obs) == 0.0)
      // vs a uniform reference the low-bin pileup must flag
      assert(graft.operators.Distribution.psiFromCounts(obs, Seq.fill(10)(90L)) > 0.1)
    } finally q.stop()
  }
}

class StreamingDriftSpec extends SparkSpecBase {
  import spark.implicits._

  test("streaming drift equals the batch dataDrift's stream-side half, dupes collapse") {
    implicit val sqlCtx = spark.sqlContext
    val reference = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Double)]
    val stream = mem.toDF().toDF("k", "s", "v")
    val mon = graft.streaming.StreamingDrift.monitor(stream, reference)
    val q = mon.drift
      .writeStream.format("memory").queryName("drift_twin")
      .outputMode("append").start()
    try {
      mem.addData((1L, "a", 10.0), (2L, "B", 20.0), (4L, "d", 40.0))
      q.processAllAvailable()
      // cross-batch duplicate of (2,B) must NOT re-emit; (3,c) matches ref
      mem.addData((2L, "B", 20.0), (3L, "c", 30.0), (5L, "e", 50.0))
      q.processAllAvailable()
      val got = spark.sql("SELECT k, s, v FROM drift_twin")
        .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
      assert(got == Seq((2L, "B", 20.0), (4L, "d", 40.0), (5L, "e", 50.0)))

      // exact agreement with the batch operator's stream-side rows
      val streamed = Seq((1L, "a", 10.0), (2L, "B", 20.0), (4L, "d", 40.0),
        (2L, "B", 20.0), (3L, "c", 30.0), (5L, "e", 50.0)).toDF("k", "s", "v")
      val batch = new graft.operators.DriftCompare(spark,
        graft.sources.MemorySide("db1", Map("t" -> reference)),
        graft.sources.MemorySide("db2", Map("t" -> streamed)))
        .dataDrift("t").get
        .filter(org.apache.spark.sql.functions.col("observed_in") === "db2")
        .select("k", "s", "v")
        .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
      assert(got == batch)

      // the monitor owns its cached reference plan: unpersist releases
      // exactly this plan, not the whole session cache
      assert(mon.referenceHashes.storageLevel.useMemory ||
        mon.referenceHashes.storageLevel.useDisk, "reference must be persisted")
      mon.unpersist()
      assert(!mon.referenceHashes.storageLevel.useMemory &&
        !mon.referenceHashes.storageLevel.useDisk, "unpersist must release it")
    } finally q.stop()
  }
}

class StreamingSessionWindowSpec extends SparkSpecBase {
  import spark.implicits._

  test("built-in streaming session_window closes watermark-expired sessions matching batch") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp)]
    val events = mem.toDF().toDF("user_id", "ts")
    val q = events
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "session_end", "n_events")
      .writeStream.format("memory").queryName("sw_twin")
      .outputMode("append").start()
    try {
      // session A: two events 10 min apart; session B: separate user
      mem.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:10:00")),
        (2L, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      // advance event time far past gap + watermark: closes both sessions,
      // and opens a new one for user 1
      mem.addData((1L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      mem.addData((3L, ts("2024-01-01 14:00:00")))
      q.processAllAvailable()
      val emitted = spark.sql("SELECT * FROM sw_twin")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
        .collect().toSet
      // the three sessions whose end passed the watermark are closed and
      // appended exactly once; the in-flight 14:00 session is not emitted
      val batch = graft.streaming.EventsOps.sessionize(
        Seq((1L, 1L, ts("2024-01-01 10:00:00")), (2L, 1L, ts("2024-01-01 10:10:00")),
          (3L, 2L, ts("2024-01-01 10:05:00")), (4L, 1L, ts("2024-01-01 12:00:00")))
          .toDF("event_id", "user_id", "ts"), 30)
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"))
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
        .collect().toSet
      assert(emitted == batch,
        s"closed streaming sessions must equal the batch sessions:\n$emitted\nvs\n$batch")
    } finally q.stop()
  }
}

class StreamingHoppingSpec extends SparkSpecBase {
  import spark.implicits._

  test("streaming hopping-window counts equal the batch hop expansion") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, String)]
    val events = mem.toDF().toDF("ts", "event_type")
    val q = events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n_events"))
      .writeStream.format("memory").queryName("hops")
      .outputMode("complete").start()
    try {
      val data = Seq((ts("2024-01-01 10:05:00"), "click"),
        (ts("2024-01-01 10:20:00"), "click"), (ts("2024-01-01 10:20:00"), "view"))
      mem.addData(data: _*)
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM hops")
        .as[(java.sql.Timestamp, String, Long)].collect().toSet
      val batch = data.toDF("ts", "event_type")
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("w.start").as("win_start"), col("event_type"), col("n_events"))
        .as[(java.sql.Timestamp, String, Long)].collect().toSet
      assert(got == batch, s"streaming hops must equal batch:\n$got\nvs\n$batch")
      // each event contributes to exactly 4 hops
      assert(got.toSeq.map(_._3).sum == data.size * 4)
    } finally q.stop()
  }
}

/** Streaming twin of the incremental-aggregate maintenance operator:
  * a foreachBatch sink that folds each micro-batch into the running
  * snapshot via IncrementalAgg.merge must end exactly equal to the
  * from-scratch batch rollup over all rows — the 100 TB pattern where
  * the stream maintains the nightly aggregate instead of rescanning
  * history.
  */
class StreamingIncrementalAggSpec extends SparkSpecBase {
  import spark.implicits._

  test("foreachBatch merge chain equals the from-scratch aggregate") {
    import graft.operators.IncrementalAgg
    import IncrementalAgg.Spec
    implicit val sqlCtx = spark.sqlContext
    val specs = Seq(Spec("count", "", "n"), Spec("sum", "v", "s"),
      Spec("min", "v", "mn"), Spec("max", "v", "mx"))
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)]
    @volatile var snapshot: org.apache.spark.sql.DataFrame = null
    val q = mem.toDF().toDF("k", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        // localCheckpoint: the batch frame is only valid inside this
        // call, and the snapshot must not grow lineage per batch
        snapshot =
          (if (snapshot == null) IncrementalAgg.aggregate(batch, Seq("k"), specs)
           else IncrementalAgg.merge(snapshot, batch, Seq("k"), specs))
            .localCheckpoint(eager = true)
      }
      .start()
    try {
      val b1 = Seq((1L, 10.25), (1L, 0.50), (2L, 3.75))
      val b2 = Seq((1L, 7.00), (3L, 1.25))
      val b3 = Seq((2L, -2.50), (3L, 8.00), (3L, 0.25))
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
      val got = snapshot
        .select(col("k"), col("n"), col("s").cast("double"), col("mn"), col("mx"))
        .as[(Long, Long, Double, Double, Double)].collect().toSet
      val batchTruth = IncrementalAgg
        .aggregate((b1 ++ b2 ++ b3).toDF("k", "v"), Seq("k"), specs)
        .select(col("k"), col("n"), col("s").cast("double"), col("mn"), col("mx"))
        .as[(Long, Long, Double, Double, Double)].collect().toSet
      assert(got == batchTruth, s"merged snapshot must equal batch:\n$got\nvs\n$batchTruth")
      assert(got.size == 3)
    } finally q.stop()
  }
}

/** Streaming twin of the finite-horizon EWMA: bit-equality with the
  * batch lag-ladder operator on an in-order stream, across batch
  * boundaries (state carries the trailing ring between micro-batches).
  */
class StreamingEwmaSpec extends SparkSpecBase {
  import spark.implicits._

  test("streaming EWMA equals the batch operator bit-for-bit across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    def ts(i: Int) = new java.sql.Timestamp(1700000000000L + i * 1000L)
    val all = (0 until 30).map(i =>
      (i.toLong % 3, i.toLong, ts(i), math.sin(i.toDouble) * 7.0))
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val q = graft.streaming.StreamingEwma(
        mem.toDF().toDF("user_id", "event_id", "ts", "value"),
        "user_id", "value")
      .writeStream.format("memory").queryName("ewma_twin")
      .outputMode("append").start()
    try {
      mem.addData(all.take(13): _*); q.processAllAvailable()
      mem.addData(all.drop(13): _*); q.processAllAvailable()
      val got = spark.sql("SELECT key, event_id, ewma FROM ewma_twin")
        .as[(Long, Long, Option[Double])].collect()
        .map(r => r._2 -> r._3).toMap
      val batch = graft.operators.EventAnalytics.ewmaSmooth(
          all.toDF("user_id", "event_id", "ts", "value"),
          "user_id", "ts", "event_id", "value")
        .select(col("event_id"), col("ewma"))
        .as[(Long, Option[Double])].collect().toMap
      assert(got.size == 30 && batch.size == 30)
      all.foreach { case (_, id, _, _) =>
        assert(got(id) == batch(id), s"event $id: ${got(id)} vs ${batch(id)}")
      }
    } finally q.stop()
  }
}

/** Streaming maintenance of the seasonal slot moments: the limb
  * component sums are plain long adds, so a foreachBatch merge chain of
  * per-batch slot tables must equal the from-scratch slot table EXACTLY
  * (bit-equal longs — no float drift, any batch boundary).
  */
class StreamingSeasonalMomentsSpec extends SparkSpecBase {
  import spark.implicits._

  test("foreachBatch slot-moment merge chain equals the from-scratch table") {
    import graft.operators.EventAnalytics
    implicit val sqlCtx = spark.sqlContext
    def ts(i: Int) = new java.sql.Timestamp(1700000000000L + i * 977000L)
    val all = (0 until 300).map(i =>
      (i.toLong, if (i % 3 == 0) "click" else "view", ts(i),
        (i % 47).toDouble + 0.25))
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, java.sql.Timestamp, Double)]
    @volatile var slots: org.apache.spark.sql.DataFrame = null
    val q = mem.toDF().toDF("event_id", "event_type", "ts", "value")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val b = EventAnalytics.seasonalSlotMoments(batch, "event_type", "ts", "value")
        slots =
          (if (slots == null) b
           else EventAnalytics.mergeSlotMoments(slots, b, "event_type"))
            .localCheckpoint(eager = true)
      }
      .start()
    try {
      mem.addData(all.take(100): _*); q.processAllAvailable()
      mem.addData(all.slice(100, 220): _*); q.processAllAvailable()
      mem.addData(all.drop(220): _*); q.processAllAvailable()
      val got = slots.collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2)) -> r.toSeq.drop(3)).toMap
      val truth = EventAnalytics.seasonalSlotMoments(
          all.toDF("event_id", "event_type", "ts", "value"),
          "event_type", "ts", "value")
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2)) -> r.toSeq.drop(3)).toMap
      assert(got.keySet == truth.keySet && got.keySet.nonEmpty)
      got.keySet.foreach(k => assert(got(k) == truth(k), s"slot $k diverged"))
    } finally q.stop()
  }
}

class StreamingCusumSpec extends SparkSpecBase {
  import spark.implicits._

  test("streaming CUSUM folds to the exact batch control statistics") {
    implicit val sqlCtx = spark.sqlContext
    // batch: level shift fixture, batch operator computes z internally
    val vals = Seq.fill(12)(10.0) ++ Seq.fill(8)(14.0)
    val series = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("t", "v")
    val batch = graft.operators.Stats.cusum(series, "t", "v",
      slack = 0.5, threshold = 2.0)
      .select($"t", $"z", $"s_plus", $"s_minus", $"flag")
      .as[(Long, Double, Double, Double, Boolean)].collect().sortBy(_._1)

    // stream the SAME standardized z points (reference-window contract)
    val mem = MemoryStream[(String, Long, Double)]
    val pts = mem.toDF().toDF("k", "t", "z")
    val q = graft.streaming.StreamingCusum(pts, "k", "t", "z",
      slack = 0.5, threshold = 2.0)
      .writeStream.format("memory").queryName("cusum_twin")
      .outputMode("update").start()
    try {
      val zs = batch.map { case (t, z, _, _, _) => ("s", t, z) }
      val (b1, b2) = zs.splitAt(9)
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      // a stale replay of an already-folded point must be dropped
      mem.addData(("s", 3L, 99.0)); q.processAllAvailable()
      mem.addData(b2.toSeq: _*); q.processAllAvailable()
      val stream = spark.sql(
        "SELECT t, z, sPlus, sMinus, flag FROM cusum_twin")
        .as[(Long, Double, Double, Double, Boolean)].collect().sortBy(_._1)
      assert(stream.toSeq == batch.toSeq,
        s"stream ${stream.toSeq} != batch ${batch.toSeq}")
    } finally q.stop()
  }
}

/** Streaming trigram extraction equals the batch lead-window grams,
  * including chaining across micro-batch boundaries through state.
  */
class StreamingTrigramsSpec extends SparkSpecBase {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  test("streaming trigrams match the batch window extraction across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, java.sql.Timestamp)]
    val events = mem.toDF().toDF("user_id", "event_id", "event_type", "ts")
    val q = graft.streaming.StreamingTrigrams(events)
      .writeStream.format("memory").queryName("tri").outputMode("append").start()
    try {
      def ts(i: Int) = new java.sql.Timestamp(1700000000000L + i * 60000L)
      // user 1: a b | c d across two batches -> trigrams abc, bcd chain
      // through the last-two state; user 2: x y (no trigram)
      mem.addData((1L, 1L, "a", ts(1)), (1L, 2L, "b", ts(2)),
        (2L, 10L, "x", ts(1)), (2L, 11L, "y", ts(2)))
      q.processAllAvailable()
      mem.addData((1L, 3L, "c", ts(3)), (1L, 4L, "d", ts(4)))
      q.processAllAvailable()
      val got = spark.sql("SELECT user_id, t1, t2, t3 FROM tri")
        .as[(Long, String, String, String)].collect().toSet
      assert(got == Set((1L, "a", "b", "c"), (1L, "b", "c", "d")))
      // batch twin: the same grams from the lead window
      val batch = Seq((1L, 1L, "a", ts(1)), (1L, 2L, "b", ts(2)),
        (1L, 3L, "c", ts(3)), (1L, 4L, "d", ts(4)),
        (2L, 10L, "x", ts(1)), (2L, 11L, "y", ts(2)))
        .toDF("user_id", "event_id", "event_type", "ts")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val exp = batch.withColumn("t2", lead("event_type", 1).over(w))
        .withColumn("t3", lead("event_type", 2).over(w))
        .filter(col("t3").isNotNull)
        .select(col("user_id"), col("event_type"), col("t2"), col("t3"))
        .as[(Long, String, String, String)].collect().toSet
      assert(got == exp)
    } finally q.stop()
  }
}

/** Windowed DP release: streaming equals batch bit-for-bit (same
  * content-addressed noise), replays don't refresh the noise.
  */
class StreamingDpSpec extends SparkSpecBase {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  test("streaming windowed DP release equals the batch run on the same data") {
    implicit val sqlCtx = spark.sqlContext
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")
    // time-ordered feed: batch 2 starts at/after batch 1's max event
    // time, so nothing arrives below the 1 h watermark (the twin
    // contract every watermarked operator here documents)
    val data = (1 to 40).map(i =>
      (ts(10 + i % 3, i % 50), s"g${i % 4}", (i % 30).toDouble))
      .sortBy(_._1.getTime)
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "g", "v")
    val q = graft.streaming.DpOps.dpWindowedRelease(events, "g", col("v"),
        epsilon = 1.0, clip = 10.0)
      .writeStream.format("memory").queryName("dpw").outputMode("append").start()
    try {
      mem.addData(data.take(25): _*)
      q.processAllAvailable()
      mem.addData(data.drop(25): _*)
      // advance the watermark far enough to close every data window
      mem.addData((ts(23, 0), "g0", 0.0))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT window_start, g, noisy_count, noisy_sum FROM dpw")
        .as[(java.sql.Timestamp, String, Double, Double)].collect().toSet
      // compare CLOSED windows only (the 23:00 flush window never closes)
      val batch = graft.streaming.DpOps.dpWindowedRelease(
          (data :+ ((ts(23, 0), "g0", 0.0))).toDF("ts", "g", "v"),
          "g", col("v"), epsilon = 1.0, clip = 10.0, streaming = false)
        .as[(java.sql.Timestamp, String, Double, Double)].collect().toSet
        .filter(_._1.getTime < ts(23, 0).getTime)
      assert(got == batch, s"streaming $got\nbatch $batch")
      assert(got.nonEmpty)
      // the release never carries the true count column
      assert(!got.exists { case (_, _, nc, _) => nc == math.rint(nc) } ||
        got.exists { case (_, _, nc, _) => nc != math.rint(nc) })
    } finally q.stop()
  }
}
