package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{EventAnalytics, Graph, Stats, TextAnalysis}

class LinkageOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("activityIslands: consecutive days collapse, gaps split, dup days ignored") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-02 09:00:00")),
      (1L, ts("2024-01-03 23:59:59")), (1L, ts("2024-01-05 00:00:01")),
      (2L, ts("2024-01-01 01:00:00")), (2L, ts("2024-01-01 22:00:00")))
      .toDF("user_id", "ts")
    val out = EventAnalytics.activityIslands(events, "user_id", "ts")
      .select(col("entity"), col("island_start").cast("string"),
        col("island_end").cast("string"), col("n_days"))
      .as[(Long, String, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      (1L, "2024-01-01", "2024-01-03", 3L),
      (1L, "2024-01-05", "2024-01-05", 1L),
      (2L, "2024-01-01", "2024-01-01", 1L)))
  }

  test("rocAuc: tie-aware rank identity matches the pairwise definition") {
    // pos scores {3, 2}, neg scores {1, 2}: pairwise AUC = 3.5/4 = 0.875
    val df = Seq(("g", 3.0, "p"), ("g", 2.0, "p"), ("g", 1.0, "n"), ("g", 2.0, "n"))
      .toDF("grp", "score", "lbl")
    val out = EventAnalytics.rocAuc(df, "grp", "score", col("lbl") === "p")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(("g", 2L, 2L, 0.875)))
  }

  test("rocAuc: perfect and inverted separations hit 1 and 0") {
    val df = Seq(("a", 2.0, true), ("a", 1.0, false),
                 ("b", 1.0, true), ("b", 2.0, false))
      .toDF("grp", "score", "lbl")
    val out = EventAnalytics.rocAuc(df, "grp", "score", col("lbl"))
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq(("a", 1L, 1L, 1.0), ("b", 1L, 1L, 0.0)))
  }

  test("weightedMedian: smallest value reaching half the total weight") {
    val df = Seq(("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 2.0),
                 ("b", 10.0, 5.0), ("b", 20.0, 1.0))
      .toDF("grp", "v", "w")
    val out = Stats.weightedMedian(df, "grp", "v", "w")
      .as[(String, Double)].collect().sortBy(_._1).toSeq
    // a: cum(1)=1, cum(2)=2, cum(3)=4, tot=4 -> first 2*cum>=tot is v=2
    assert(out == Seq(("a", 2.0), ("b", 10.0)))
  }

  test("concentration: equal shares give gini 0, 90/10 split gives 0.4") {
    val df = Seq(("eq", 1, 5.0), ("eq", 2, 5.0), ("sk", 1, 1.0), ("sk", 2, 9.0))
      .toDF("grp", "member", "x")
    val out = Stats.concentration(df, "grp", "member", "x")
      .as[(String, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq(("eq", 2L, 0.5, 0.0), ("sk", 2L, 0.82, 0.4)))
  }

  test("maxDrawdown: peak-to-trough fall over the running max") {
    val df = Seq(("g", 1, 10.0), ("g", 2, 8.0), ("g", 3, 12.0), ("g", 4, 7.0))
      .toDF("grp", "t", "v")
    val out = Stats.maxDrawdown(df, "grp", "t", "v")
      .as[(String, Double, Double)].collect().toSeq
    assert(out == Seq(("g", 5.0, 0.416667)))
  }

  test("adamicAdar: shared-feature scores, degree cap excludes hub features") {
    val inc = Seq(
      ("e1", "f1"), ("e2", "f1"),                     // deg 2
      ("e1", "f2"), ("e2", "f2"), ("e3", "f2"),       // deg 3
      ("e1", "hub"), ("e2", "hub"), ("e3", "hub"), ("e4", "hub")) // deg 4: capped
      .toDF("ent", "feat")
    val out = Graph.adamicAdar(inc, "ent", "feat",
        minCommon = 1L, maxFeatureDegree = 3L)
      .as[(String, String, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    // 1/ln2 -> 1.442695041, 1/ln3 -> 0.910239227 (9-dp quantized)
    assert(out == Seq(
      ("e1", "e2", 2L, 2.352934268),
      ("e1", "e3", 1L, 0.910239227),
      ("e2", "e3", 1L, 0.910239227)))
    // e4 appears only via the capped hub: no pair row at all
  }

  test("damerauJoin: integer gate accepts the transposed twin, jw scores it") {
    val clean = Seq((1L, "martha"), (2L, "zzzzzz")).toDF("id", "name")
    val dirty = Seq((10L, "marhta"), (20L, "qqqqqq")).toDF("id", "name")
    val out = graft.operators.FuzzyJoin.damerauJoin(
        clean, "id", "name", dirty, "id", "name",
        k => k.substr(lit(1), lit(1)), maxEdits = 1)
      .select("l_id", "r_id", "dist", "jw")
      .as[(Long, Long, Int, Double)].collect().toSeq
    // only (martha, marhta) share a block AND pass the gate: one
    // transposition = dist 1, jw = the DuckDB-calibrated 0.961111
    assert(out == Seq((1L, 10L, 1, 0.961111)))
  }

  test("categoricalEntropy: uniform two-category split normalizes to 1, singleton to null") {
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("a", "y"), ("b", "x"))
      .toDF("grp", "cat")
    val out = Stats.categoricalEntropy(df, "grp", "cat")
      .as[(String, Long, Long, Double, Option[Double])].collect().sortBy(_._1).toSeq
    assert(out == Seq(("a", 4L, 2L, 0.693147, Some(1.0)),
                      ("b", 1L, 1L, 0.0, None)))
  }

  test("vocabOverlap: pairwise vocabulary Jaccard over distinct token sets") {
    val docs = Seq(("s1", "a b c"), ("s2", "b c d"), ("s2", "b"), ("s3", "e"))
      .toDF("src", "text")
    val out = TextAnalysis.vocabOverlap(docs, "src", "text")
      .as[(String, String, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    // s1 {a,b,c} vs s2 {b,c,d}: 2 common of 4 union; s3 disjoint (no row)
    assert(out == Seq(("s1", "s2", 2L, 0.5)))
  }

  test("invertedIndex: df gates and sorted capped postings") {
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "a b"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(docs, "doc_id", "text",
        minDf = 2L, maxDf = 10L, maxPostings = 2)
      .as[(String, Long, String)].collect().sortBy(_._1).toSeq
    // c has df 1 (gated); a's postings capped at 2 of its 3 docs
    assert(out == Seq(("a", 3L, "1,2"), ("b", 2L, "1,3")))
  }

  test("anovaF: textbook two-group case by hand") {
    // a: {1,2,3}, b: {2,3,4} -> SSB = 1.5, SSW = 4, F = 1.5
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
                 ("b", 2.0), ("b", 3.0), ("b", 4.0)).toDF("grp", "v")
    val out = Stats.anovaF(df, "grp", "v")
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    assert(out == ((2L, 6L, 1.5, 4.0, 1.5, 0.272727)))
  }

  test("kruskalWallis: tie correction divides H by 1 - sum(t^3-t)/(n^3-n)") {
    // a: {1,1}, b: {2,2}: midranks (1.5,1.5,3.5,3.5) -> H = 2.4,
    // ties 12/60 -> C = 0.8 -> corrected 3.0
    val df = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0))
      .toDF("grp", "v")
    val out = Stats.kruskalWallis(df, "grp", "v")
      .as[(Long, Long, Double, Double)].collect().head
    assert(out == ((2L, 4L, 2.4, 3.0)))
  }

  test("clusteringCoefficient: triangle closes, pendant undefined") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.clusteringCoefficient(edges)
      .as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 2L, 1L, Some(1.0)), (2L, 2L, 1L, Some(1.0)),
      (3L, 3L, 1L, Some(0.333333)), (4L, 1L, 0L, None)))
  }

  test("cramersV: balanced 2x2 with moderate association") {
    // cells 3/1/1/3, all expected 2: chi2 = 2, V = sqrt(2/(8*1)) = 0.5
    val df = Seq(("a", "x"), ("a", "x"), ("a", "x"), ("a", "y"),
                 ("b", "x"), ("b", "y"), ("b", "y"), ("b", "y"))
      .toDF("r", "c")
    val out = Stats.cramersV(df, "r", "c")
      .as[(Double, Long, Long, Double)].collect().head
    assert(out == ((2.0, 8L, 1L, 0.5)))
  }

  test("associationRules: support/confidence/lift over pruned pairs, both directions") {
    val df = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "x"), (3L, "z"))
      .toDF("basket", "item")
    val out = EventAnalytics.associationRules(df, "basket", "item", 2L)
      .as[(String, String, Long, Double, Double, Double)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    // z is infrequent (pruned before pairing); confidence is asymmetric
    assert(out == Seq(
      ("x", "y", 2L, 0.666667, 0.666667, 1.0),
      ("y", "x", 2L, 0.666667, 1.0, 1.0)))
  }
}
