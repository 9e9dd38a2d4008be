package graft

import graft.operators.{SemanticIndex, Similarity}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted hyperplane-LSH index: batch-sized incremental semantic
  * dedup whose decisions match the in-memory operator, with idempotent
  * appends, meta-only refinement refresh, and a self-healing compact.
  */
class SemanticIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString + "/idx"

  /** axis-heavy corpus: id i points at axis i%8 with 8 noise dims */
  private def corpus(ids: Seq[Long], dim: Int = 8): DataFrame =
    ids.map { i =>
      val v = Array.tabulate(dim)(d =>
        (if (d == (i % dim).toInt) 10.0 else 0.0) +
          0.01 * math.sin(i.toDouble + d))
      (i, v.toSeq)
    }.toDF("id", "v")

  private def scaled(df: DataFrame, idShift: Long, factor: Double): DataFrame =
    df.select((col("id") + lit(idShift)).as("id"),
      transform(col("v"), x => x * lit(factor)).as("v"))

  test("dedupAgainstIndex matches semanticDedupIncrement on the same fixture") {
    val base = corpus(0L until 30L)
    val batch = scaled(base.filter(col("id") % 3 === 0), 1000L, 2.0) // corpus dups
      .unionByName(corpus(2000L until 2006L)
        .select(col("id"), transform(col("v"), x => -x).as("v"))) // novel
      .unionByName(scaled(corpus(2000L until 2006L), 3000L, 5.0)
        .select(col("id"), transform(col("v"), x => -x).as("v"))) // batch dups of the novel
    val expect = Similarity
      .semanticDedupIncrement(batch, base, "id", "v", 0.9, 8)
      .select("id").as[Long].collect().sorted
    val path = tmp("semidx_eq")
    SemanticIndex.build(base, "id", "v", dim = 8, path, nBits = 4, nTables = 8)
    val got = SemanticIndex
      .dedupAgainstIndex(batch, "id", "v", 0.9, path)
      .select("id").as[Long].collect().sorted
    assert(got.sameElements(expect), s"index ${got.toSeq} vs inc ${expect.toSeq}")
    // sanity on the fixture: corpus dups dropped, one of each novel pair kept
    assert(got.forall(_ >= 2000L) && got.length == 6)
  }

  test("append-then-dedup == fresh-build dedup; double append is harmless") {
    val seed = corpus(0L until 20L)
    val extra = corpus(100L until 110L)
      .select(col("id"), transform(col("v"), x => -x).as("v"))
    val probe = scaled(extra, 5000L, 3.0) // near-dups of extra only
    val grown = tmp("semidx_grow"); val fresh = tmp("semidx_fresh")
    SemanticIndex.build(seed, "id", "v", dim = 8, grown, nBits = 4, nTables = 8)
    SemanticIndex.append(extra, "id", "v", grown)
    SemanticIndex.append(extra, "id", "v", grown) // retry replay
    SemanticIndex.build(seed.unionByName(extra), "id", "v", dim = 8, fresh,
      nBits = 4, nTables = 8)
    val a = SemanticIndex.dedupAgainstIndex(probe, "id", "v", 0.9, grown)
      .select("id").as[Long].collect().sorted
    val b = SemanticIndex.dedupAgainstIndex(probe, "id", "v", 0.9, fresh)
      .select("id").as[Long].collect().sorted
    assert(a.sameElements(b))
    assert(a.isEmpty, "every probe row near-dups an appended vector")
    // double append never double-inserted: one key row per (id, table)
    val counts = spark.read.parquet(s"$grown/keys")
      .groupBy("id").count().select("count").as[Long].collect()
    assert(counts.forall(_ == 8L), s"got ${counts.toSeq.distinct}")
  }

  test("refreshRefineBits re-tightens from meta only; keys match across sides") {
    // tiny maxBucket forces refinement once the corpus outgrows it:
    // parallel vectors (same signs in every table) all share one bucket
    val seed = (0L until 8L).map(i =>
      (i, Seq.tabulate(8)(d => (d + 1.0) * (i + 1.0)))).toDF("id", "v")
    val path = tmp("semidx_rb")
    SemanticIndex.build(seed, "id", "v", dim = 8, path,
      nBits = 2, nTables = 4, maxBucket = 2)
    val m0 = SemanticIndex.loadMeta(spark, path)
    assert(m0.refineBits > 0, s"8 colliding rows over maxBucket=2: $m0")
    // grow 4x, refresh: refinement deepens without touching the keys
    val more = (100L until 124L).map(i =>
      (i, Seq.tabulate(8)(d => (d + 1.0) * (i + 1.0)))).toDF("id", "v")
    SemanticIndex.append(more, "id", "v", path)
    val before = spark.read.parquet(s"$path/keys")
      .agg(count(lit(1)), sum(col("rk16"))).collect()(0)
    val rb = SemanticIndex.refreshRefineBits(spark, path)
    assert(rb >= m0.refineBits, s"refresh loosened: $m0 -> $rb")
    val after = spark.read.parquet(s"$path/keys")
      .agg(count(lit(1)), sum(col("rk16"))).collect()(0)
    assert(before == after, "refresh must be meta-only")
    // the deepened sub-key still matches batch keys to corpus keys:
    // a scaled copy of id 0 is found as a corpus dup
    val probe = Seq((9000L, Seq.tabulate(8)(d => (d + 1.0) * 2.0)))
      .toDF("id", "v") // = 2x id 0's direction: cosine ~1 to every row here
    val kept = SemanticIndex.dedupAgainstIndex(probe, "id", "v", 0.95, path)
    assert(kept.count() == 0L)
  }

  test("compact heals duplicate key rows and partial appends") {
    val seed = corpus(0L until 12L)
    val path = tmp("semidx_cp")
    SemanticIndex.build(seed, "id", "v", dim = 8, path, nBits = 4, nTables = 8)
    // damage 1: duplicate every key row of id 3 (a partially-failed
    // append retried by a non-idempotent writer)
    val dup = spark.read.parquet(s"$path/keys").filter(col("id") === 3L)
    dup.write.mode("append").partitionBy("t", "bucket").parquet(s"$path/keys")
    // damage 2: a partial append left id 50 with ONE of its 8 table rows
    val part = Seq((50L, Seq.tabulate(8)(d => if (d == 2) -10.0 else 0.0)))
      .toDF("id", "v")
    val m = SemanticIndex.loadMeta(spark, path)
    // hand-build one key row the way the index would (table 0 only)
    val one = part.select(col("id"),
      Similarity.hyperplaneKey(col("v"), 8, m.nBits, 42L).as("bucket"),
      Similarity.hyperplaneKey(col("v"), 8, SemanticIndex.RefineWidth,
        104729L).as("rk16"),
      Similarity.asDouble(col("v")).as("v"))
      .select(lit(0).as("t"), col("bucket"), col("id"), col("rk16"), col("v"))
    one.write.mode("append").partitionBy("t", "bucket").parquet(s"$path/keys")
    SemanticIndex.compact(spark, path)
    val counts = spark.read.parquet(s"$path/keys")
      .groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ == 8L), s"got $counts")
    assert(counts.contains(50L) && counts.size == 13)
    // healed index classifies like a fresh build
    val probe = scaled(seed.filter(col("id") === 3L), 7000L, 4.0)
    assert(SemanticIndex.dedupAgainstIndex(probe, "id", "v", 0.9, path)
      .count() == 0L)
  }

  test("compact re-shards to a wider nBits; decisions match a fresh build") {
    val seed = corpus(0L until 30L)
    val path = tmp("semidx_reshard"); val fresh = tmp("semidx_fresh6")
    SemanticIndex.build(seed, "id", "v", dim = 8, path, nBits = 3, nTables = 8)
    SemanticIndex.compact(spark, path, newNBits = Some(6))
    assert(SemanticIndex.loadMeta(spark, path).nBits == 6)
    SemanticIndex.build(seed, "id", "v", dim = 8, fresh, nBits = 6, nTables = 8)
    val probe = scaled(seed.filter(col("id") % 5 === 0), 5000L, 2.0)
      .unionByName(corpus(2000L until 2005L)
        .select(col("id"), transform(col("v"), x => -x).as("v")))
    val a = SemanticIndex.dedupAgainstIndex(probe, "id", "v", 0.9, path)
      .select("id").as[Long].collect().sorted
    val b = SemanticIndex.dedupAgainstIndex(probe, "id", "v", 0.9, fresh)
      .select("id").as[Long].collect().sorted
    assert(a.sameElements(b), s"resharded ${a.toSeq} vs fresh ${b.toSeq}")
    assert(a.forall(_ >= 2000L), "scaled copies of the corpus must drop")
  }

  test("plan audit: batch side broadcasts and the keys read is explicit-path pruned") {
    val base = corpus(0L until 40L)
    val path = tmp("semidx_plan")
    SemanticIndex.build(base, "id", "v", dim = 8, path, nBits = 4, nTables = 8)
    val batch = scaled(base.limit(4), 9000L, 2.0)
    // r18: the collision join and the pruned keys scan now execute
    // inside the eager dupOfCorpus checkpoint DURING construction (the
    // index scan runs once, not once per consumer), so the final plan
    // only shows the checkpoint RDD. Capture every executed plan with a
    // QueryExecutionListener and audit the one that read the index.
    val plans = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val out = SemanticIndex.dedupAgainstIndex(batch, "id", "v", 0.9, path)
      out.count()
      // the listener bus is async: poll until the collision-join plan
      // (keys FileScan) has been delivered
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      def snapshot(): Seq[String] = {
        plans.synchronized {
          scala.jdk.CollectionConverters.ListHasAsScala(plans).asScala.toVector
        }
      }
      def keysScanLine(ps: Seq[String]): Option[String] = ps.iterator
        .flatMap(_.linesIterator)
        .find(l => l.contains("FileScan parquet") && l.contains("keys"))
      var captured = snapshot()
      while (keysScanLine(captured).isEmpty && System.nanoTime() < deadline) {
        Thread.sleep(100); captured = snapshot()
      }
      assert(captured.exists(p => !p.contains("isFinalPlan=false") ||
        p.contains("BroadcastHashJoin")), "captured executed plans")
      val collisionPlan = captured
        .find(p => p.linesIterator.exists(l =>
          l.contains("FileScan parquet") && l.contains("keys")))
        .getOrElse(fail(s"no keys FileScan in any of ${captured.size} plans"))
      assert(collisionPlan.contains("BroadcastHashJoin"),
        "batch keys must broadcast into the collision join")
      captured.foreach { p =>
        assert(!p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin"), "never all-pairs")
      }
      // the keys scan must read the CONSTRUCTED touched directories (≤
      // batch × nTables = 32 roots), never a discovery listing of all
      // 8 × 16 = 128 partition directories — the file index path count
      // is the witness
      val scanLine = keysScanLine(Seq(collisionPlan)).get
      val pathCount = "InMemoryFileIndex\\((\\d+) paths\\)".r
        .findFirstMatchIn(scanLine).map(_.group(1).toInt)
        .getOrElse(fail(s"no InMemoryFileIndex path count in:\n$scanLine"))
      assert(pathCount <= 32,
        s"keys read must be touched-sized (≤ 32 roots), got $pathCount:\n$scanLine")
    } finally spark.listenerManager.unregister(listener)
  }
}
