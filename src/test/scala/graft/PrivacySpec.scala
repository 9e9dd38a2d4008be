package graft

import graft.operators.Privacy

/** Kernel invariants for the re-identification audits: violating-group
  * selection, summary arithmetic, null-key and null-sensitive handling.
  */
class PrivacySpec extends SparkSpecBase {
  import spark.implicits._

  test("kAnonymity flags exactly the sub-k groups and sums the risk") {
    // group (a, x): 3 rows; (a, y): 1 row; (b, x): 2 rows — k = 3
    val df = Seq(("a", "x"), ("a", "x"), ("a", "x"), ("a", "y"),
      ("b", "x"), ("b", "x")).toDF("seg", "nat")
    val out = Privacy.kAnonymity(df, Seq("seg", "nat"), 3).collect()
    assert(out.length == 2)
    val byKey = out.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(byKey(("a", "y")).getAs[Long]("n") == 1L)
    assert(byKey(("b", "x")).getAs[Long]("n") == 2L)
    assert(out.forall(_.getAs[Long]("n_groups") == 3L))
    assert(out.forall(_.getAs[Long]("n_violating") == 2L))
    assert(out.forall(_.getAs[Long]("rows_at_risk") == 3L))
    assert(out.forall(_.getAs[Long]("anonymity") == 1L))
  }

  test("kAnonymity: a fully k-anonymous table yields no rows but real k") {
    val df = Seq.fill(4)("g").toDF("seg")
    assert(Privacy.kAnonymity(df, Seq("seg"), 3).isEmpty)
  }

  test("kAnonymity keys NULL quasi values as their own group") {
    val df = Seq[(String, Int)](("a", 1), ("a", 1), (null, 1))
      .toDF("seg", "v")
    val out = Privacy.kAnonymity(df, Seq("seg"), 2).collect()
    assert(out.length == 1 && out.head.isNullAt(0))
    assert(out.head.getAs[Long]("n") == 1L)
  }

  test("pseudonymize is deterministic, salt-keyed, null-passing, join-safe") {
    val df = Seq((1L, "alice", "A"), (2L, "bob", "B"), (3L, null, "C"),
      (4L, "alice", "D")).toDF("id", "name", "keep")
    val out = Privacy.pseudonymize(df, Seq("name"), "s1")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // same input -> same pseudonym (joins survive); null stays null
    assert(out(1L) == out(4L) && out(1L).isDefined)
    assert(out(3L).isEmpty)
    assert(out(1L) != out(2L))
    assert(out(1L).get.matches("[0-9a-f]{64}"))
    // a different salt produces unlinkable pseudonyms
    val out2 = Privacy.pseudonymize(df, Seq("name"), "s2")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) != out2(1L))
    // untouched columns pass through with schema order preserved
    val row = Privacy.pseudonymize(df, Seq("name"), "s1").columns.toSeq
    assert(row == Seq("id", "name", "keep"))
  }

  test("lDiversity flags low-diversity groups; nulls don't add diversity") {
    // group a: sensitive {s1, s2} (plus a null) — diverse at l=2;
    // group b: sensitive {s1} only — violates l=2
    val df = Seq(("a", "s1"), ("a", "s2"), ("a", null),
      ("b", "s1"), ("b", "s1")).toDF("q", "s")
    val out = Privacy.lDiversity(df, Seq("q"), "s", 2).collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "b")
    assert(out.head.getAs[Long]("n") == 2L)
    assert(out.head.getAs[Long]("diversity") == 1L)
    assert(out.head.getAs[Long]("n_groups") == 2L)
    assert(out.head.getAs[Long]("rows_at_risk") == 2L)
    assert(out.head.getAs[Long]("min_diversity") == 1L)
  }

  test("tCloseness: hand-derived TVD incl. absent-value mass; NULLs excluded") {
    // group a: 10 x (lacks y entirely — absent mass path);
    // group b: 10 x + 10 y. Global: 20 x, 10 y -> p = (2/3, 1/3).
    // TVD(a) = (|1 - 2/3| + |0 - 1/3|) / 2 = 1/3
    // TVD(b) = (|1/2 - 2/3| + |1/2 - 1/3|) / 2 = 1/6
    val rows = Seq.fill(10)(("a", "x")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(10)(("b", "y")) ++
      Seq(("a", null: String)) // NULL sensitive: excluded from both sides
    val out = Privacy.tCloseness(rows.toDF("q", "s"), Seq("q"), "s", 0.3)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "a")
    assert(r.getAs[Long]("n") == 10L) // the null row does not count
    assert(r.getAs[Double]("tvd") == 0.333333)
    assert(r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Long]("n_violating") == 1L)
    assert(r.getAs[Long]("rows_at_risk") == 10L)
    assert(r.getAs[Double]("max_tvd") == 0.333333)
    // at a loose threshold nothing violates, so the audit is empty
    assert(Privacy.tCloseness(rows.toDF("q", "s"), Seq("q"), "s", 0.5)
      .count() == 0)
  }
}

/** Invariants for the Laplace-mechanism DP release: determinism,
  * bounded sensitivity under clipping, and threshold suppression.
  */
class DpReleaseSpec extends SparkSpecBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val base = (1 to 200).map(i => (s"g${i % 4}", i.toDouble))

  test("dpRelease is a pure function of (salt, data): re-runs agree, salts differ") {
    val df = base.toDF("g", "v")
    val a = Privacy.dpRelease(df, "g", col("v"), epsilon = 1.0, clip = 10.0)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val b = Privacy.dpRelease(df, "g", col("v"), epsilon = 1.0, clip = 10.0)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(a == b && a.size == 4)
    val rot = Privacy.dpRelease(df, "g", col("v"), epsilon = 1.0,
      clip = 10.0, salt = "dp2")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(a.keySet == rot.keySet && a != rot)
    // the release is noisy: no group's noisy_count equals its true 50
    assert(a.values.forall(_._1 != 50.0))
  }

  test("dpRelease sensitivity: one extra huge-value row moves the sums by exactly clip") {
    val df = base.toDF("g", "v")
    val plus = (base :+ ("g0", 1e9)).toDF("g", "v")
    val a = Privacy.dpRelease(df, "g", col("v"), epsilon = 1.0, clip = 10.0)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val b = Privacy.dpRelease(plus, "g", col("v"), epsilon = 1.0, clip = 10.0)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // same seeds -> the count moves by exactly 1, the sum by exactly clip
    assert(b("g0")._1 - a("g0")._1 == 1.0)
    assert(BigDecimal(b("g0")._2 - a("g0")._2).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble == 10.0)
    assert(b("g1") == a("g1")) // untouched groups are bit-identical
  }

  test("dpRelease threshold suppresses below-threshold groups") {
    val df = (base ++ Seq(("rare", 1.0))).toDF("g", "v")
    val out = Privacy.dpRelease(df, "g", col("v"), epsilon = 1.0,
      clip = 10.0, threshold = 20.0)
      .collect().map(_.getString(0)).toSet
    assert(!out.contains("rare") && out.size == 4)
  }
}

/** Exponential-mechanism DP quantile: concentration at high epsilon,
  * determinism, and the bounded-candidate guard.
  */
class DpQuantileSpec extends SparkSpecBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("dpQuantile: high epsilon concentrates on the true rank; runs are deterministic") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    // score gap between the argmax and its neighbor is eps/2 = 500,
    // far beyond any Gumbel draw (|g| <= ln 2^60 ~ 42): deterministic
    val r = Privacy.dpQuantile(df, col("v"), q = 0.5, epsilon = 1000.0).head()
    assert(r.getDouble(0) == 51.0) // below(51) = 50 = q*n exactly
    assert(r.getAs[Long]("n") == 100L && r.getAs[Long]("n_bins") == 100L)
    val again = Privacy.dpQuantile(df, col("v"), q = 0.5, epsilon = 1000.0)
      .head().getDouble(0)
    assert(again == 51.0)
    // a different salt re-draws the noise but stays a valid value
    val other = Privacy.dpQuantile(df, col("v"), q = 0.5, epsilon = 0.01,
      salt = "dpq2").head().getDouble(0)
    assert(other >= 1.0 && other <= 100.0)
  }

  test("dpQuantile: the maxBins guard names the pre-binning remedy") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val e = intercept[IllegalArgumentException] {
      Privacy.dpQuantile(df, col("v"), q = 0.5, epsilon = 1.0, maxBins = 10L)
    }
    assert(e.getMessage.contains("pre-bin"))
  }
}
