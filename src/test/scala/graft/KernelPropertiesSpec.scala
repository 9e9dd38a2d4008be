package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-form invariants of the native pairwise kernels, checked by
  * evaluating the expressions through Spark over generated data (so the
  * CODEGEN path is what's exercised, not just interpreted eval).
  */
class KernelPropertiesSpec extends SparkSpecBase {
  import spark.implicits._

  private def forAllGen[T](gen: Gen[T], n: Int = 60)(check: T => Unit): Unit = {
    var seed = Seed(7L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(check)
      seed = seed.next
      i += 1
    }
  }

  private val tokGen: Gen[List[String]] =
    Gen.listOf(Gen.oneOf((1 to 30).map(i => s"t$i"))).map(_.take(40))

  test("SortedJaccardSim on sorted-distinct arrays == ArrayJaccardSim (hash-set)") {
    val cases = scala.collection.mutable.ArrayBuffer.empty[(Seq[String], Seq[String])]
    forAllGen(Gen.zip(tokGen, tokGen)) { case (a, b) =>
      cases += ((a.distinct.sorted, b.distinct.sorted))
    }
    val df = cases.toSeq.toDF("a", "b")
    val out = df.select(
      graft.functions.SortedJaccardSim(col("a"), col("b")).as("m"),
      graft.functions.ArrayJaccardSim(col("a"), col("b")).as("h"))
      .as[(Double, Double)].collect()
    out.foreach { case (m, h) => assert(m == h) }
  }

  test("containment/jaccard bounds: j <= c(a,b), c in [0,1], c(a,a) == 1 for non-empty") {
    val cases = scala.collection.mutable.ArrayBuffer.empty[(Seq[String], Seq[String])]
    forAllGen(Gen.zip(tokGen, tokGen)) { case (a, b) =>
      cases += ((a.distinct.sorted, b.distinct.sorted))
    }
    val df = cases.toSeq.toDF("a", "b")
    val out = df.select(
      graft.functions.SortedJaccardSim(col("a"), col("b")).as("j"),
      graft.functions.SortedContainmentSim(col("a"), col("b")).as("c"),
      graft.functions.SortedContainmentSim(col("a"), col("a")).as("self"),
      size(col("a")).as("na"))
      .as[(Double, Double, Double, Int)].collect()
    out.foreach { case (j, c, self, na) =>
      assert(c >= 0.0 && c <= 1.0)
      assert(j <= c + 1e-15, s"jaccard $j > containment $c")
      if (na > 0) assert(self == 1.0)
    }
  }

  test("quantizeInt8 round-trips within half a quantization step") {
    val vecGen = Gen.listOfN(16, Gen.choose(-5.0, 5.0)).map(_.map(_.toFloat))
    val cases = scala.collection.mutable.ArrayBuffer.empty[Seq[Float]]
    forAllGen(vecGen)(v => cases += v)
    val df = cases.toSeq.toDF("embedding")
    val (q, scale) = graft.operators.Similarity.quantizeInt8(col("embedding"))
    val out = df.select(col("embedding"), q.as("q"), scale.as("s"))
      .as[(Seq[Float], Seq[Long], Double)].collect()
    out.foreach { case (v, qs, s) =>
      if (s > 0) v.zip(qs).foreach { case (x, qi) =>
        val back = qi / s
        assert(math.abs(back - x) <= 0.5 / s + 1e-12,
          s"dequant error ${math.abs(back - x)} > half step ${0.5 / s}")
      }
    }
  }

  test("minhash signature: identical arrays share all bands; signature is permutation-invariant input order") {
    val df = Seq(
      ("a b c d e f g h", "h g f e d c b a"),
      ("x y z", "z y x")).toDF("t1", "t2")
    val out = df.select(
      graft.functions.MinHashSignature(graft.functions.TokenSet(col("t1")), 32).as("s1"),
      graft.functions.MinHashSignature(graft.functions.TokenSet(col("t2")), 32).as("s2"))
      .as[(Seq[Long], Seq[Long])].collect()
    out.foreach { case (s1, s2) => assert(s1 == s2) }
  }
}

/** Generated-input invariants for the text pipeline operators. */
class TextPropertiesSpec extends SparkSpecBase {
  import spark.implicits._

  private def forAllGen[T](gen: org.scalacheck.Gen[T], n: Int = 60)(check: T => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(11L)
    var i = 0
    while (i < n) {
      gen.apply(org.scalacheck.Gen.Parameters.default, seed).foreach(check)
      seed = seed.next
      i += 1
    }
  }

  private val textGen = org.scalacheck.Gen.listOf(org.scalacheck.Gen.oneOf(
    org.scalacheck.Gen.alphaNumStr.map(_.take(6)),
    org.scalacheck.Gen.oneOf(" ", "  ", ",", "!", "?", "É", "\t")))
    .map(_.mkString(" ").take(200))

  test("normalizeText is idempotent and emits only [a-z0-9 ]") {
    val cases = scala.collection.mutable.ArrayBuffer.empty[String]
    forAllGen(textGen)(cases += _)
    val df = cases.toSeq.toDF("text")
    val out = df.select(
      graft.operators.TextAnalysis.normalizeText($"text").as("n1"))
      .select($"n1",
        graft.operators.TextAnalysis.normalizeText($"n1").as("n2"))
      .as[(String, String)].collect()
    out.foreach { case (n1, n2) =>
      assert(n1 == n2, s"not idempotent: '$n1' -> '$n2'")
      assert(n1.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == ' '))
      assert(!n1.startsWith(" ") && !n1.endsWith(" ") && !n1.contains("  "))
    }
  }

  test("chunkDocuments covers every token exactly; chunk count matches ceil(n/step)") {
    val docGen = org.scalacheck.Gen.choose(0, 60).map(n => (1 to n).map(i => s"w$i").mkString(" "))
    val cases = scala.collection.mutable.ArrayBuffer.empty[String]
    forAllGen(docGen, 40)(cases += _)
    val df = cases.toSeq.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val chunkTokens = 7; val overlap = 3; val step = chunkTokens - overlap
    val out = graft.operators.TextAnalysis
      .chunkDocuments(df, "text", "doc_id", chunkTokens, overlap)
      .as[(Long, Int, String, Int)].collect().groupBy(_._1)
    cases.zipWithIndex.foreach { case (t, i) =>
      val toks = t.split(" ").filter(_.nonEmpty)
      val chunks = out.getOrElse(i.toLong, Array.empty)
      if (toks.isEmpty) assert(chunks.isEmpty)
      else {
        assert(chunks.length == (toks.length + step - 1) / step,
          s"doc $i: ${toks.length} tokens, ${chunks.length} chunks")
        val covered = chunks.flatMap(_._3.split(" ")).toSet
        assert(covered == toks.toSet)
      }
    }
  }

  test("hashSplit fractions converge to the configured percentages") {
    val n = 200000L
    val counts = spark.range(n)
      .select(graft.operators.TextAnalysis.hashSplit($"id", 80, 10).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("train") / n.toDouble - 0.80) < 0.01, counts.toString)
    assert(math.abs(counts("val") / n.toDouble - 0.10) < 0.01, counts.toString)
    assert(math.abs(counts("test") / n.toDouble - 0.10) < 0.01, counts.toString)
  }

  test("every custom kernel compiles under CODEGEN_ONLY (no silent interpreter fallback)") {
    // Spark's default behavior on a doGenCode that emits uncompilable
    // Java is to log an ERROR and fall back to interpreted eval — every
    // value-level test still passes (this bit StringDistance: a
    // Kernels$.MODULE$ reference Janino can't see). Force codegen so a
    // compile failure in ANY kernel fails the suite.
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      import graft.functions._
      val df = spark.range(64).select(
        $"id",
        concat(lit("text t"), $"id" % 9, lit(" u"), $"id" % 7).as("s"),
        array(($"id" % 5).cast("double"), lit(1.0), ($"id" % 3).cast("double")).as("v"),
        array(lit(1.0), ($"id" % 4).cast("double"), lit(0.5)).as("w"))
      val out = df.select(
        CosineSim($"v", $"w").as("cos"),
        DotProduct($"v", $"w").as("dot"),
        HilbertKey2($"id", $"id" + 1, 10).as("h2"),
        HilbertKey3($"id", $"id" + 1, $"id" + 2, 8).as("h3"),
        TokenArray($"s").as("toks"),
        WordShingles($"s", 2).as("sh"),
        SortedJaccardSim(array_sort(split($"s", " ")),
          array_sort(split($"s", " "))).as("jac"),
        CanonicalRowHash(struct($"id", $"s")).as("h"),
        DamerauLevenshtein($"s", concat($"s", lit("x"))).as("dl"),
        JaroWinkler($"s", $"s").as("jw"))
        .collect()
      assert(out.length == 64)
      assert(out.forall(r => r.getInt(r.fieldIndex("dl")) == 1))
      assert(out.forall(r => r.getDouble(r.fieldIndex("jw")) == 1.0))
      assert(out.forall(r => r.getDouble(r.fieldIndex("jac")) == 1.0))
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.fallback", "true")
    }
  }

  test("bootstrap splitmix-60 draw: limb-multiply Column chain == BigInt reference") {
    import graft.operators.Stats.{BootstrapThresholds => BT}
    val m60 = BigInt(1) << 60
    def ref(seed: Long, r: Long): Long = {
      def mul(x: BigInt, k: Long): BigInt = (x * k) % m60
      var x = (BigInt(seed) + mul(BigInt(r), BT.weylStep)) % m60
      x = mul(x ^ (x >> 30), BT.mix1)
      x = mul(x ^ (x >> 27), BT.mix2)
      (x ^ (x >> 31)).toLong
    }
    // adversarial seeds: 0, all-ones-60, high/low limb extremes, plus a
    // spread of md5-like values; r spans the allowed [1, 10000]
    val seeds = Seq(0L, (1L << 60) - 1, (1L << 30) - 1, 1L << 30,
      0x7FFFFFFFL << 29, 0xE3779B97F4A7C15L, 123456789L) ++
      (0 until 50).map(i =>
        BigInt(1, java.security.MessageDigest.getInstance("MD5")
          .digest(i.toString.getBytes)).toLong.abs % (1L << 60))
    val rs = Seq(1L, 2L, 7L, 199L, 200L, 9999L, 10000L)
    val rows = for (s <- seeds; r <- rs) yield (s, r)
    val out = rows.toDF("seed", "r")
      .select($"seed", $"r", BT.drawColumn($"seed", $"r").as("x"))
      .collect()
    out.foreach { row =>
      val (s, r) = (row.getLong(0), row.getLong(1))
      assert(row.getLong(2) == ref(s, r),
        s"draw($s, $r): column=${row.getLong(2)} ref=${ref(s, r)}")
    }
  }
}
