package graft

import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private val lastToken = (c: org.apache.spark.sql.Column) => substring_index(c, " ", -1)

  test("fuzzyJoin matches within blocks up to maxEdits, with exact distances") {
    val clean = Seq((1L, "red widget"), (2L, "blue widget"), (3L, "red bolt"))
      .toDF("id", "nm")
    val dirty = Seq((10L, "xed widget"), (11L, "red  bolt"), (12L, "red gear"))
      .toDF("id", "nm")
    val out = FuzzyJoin.fuzzyJoin(dirty, "id", "nm", clean, "id", "nm", lastToken, 1)
      .select("l_id", "r_id", "dist")
      .as[(Long, Long, Int)].collect().sortBy(p => (p._1, p._2)).toSeq
    // 10 "xed widget" ~ 1 "red widget" (1 edit); NOT 2 "blue widget" (3 edits).
    // 11 "red  bolt" blocks on "bolt" and is 1 insertion from "red bolt".
    // 12 "red gear": no clean record in block "gear" -> no match.
    assert(out == Seq((10L, 1L, 1), (11L, 3L, 1)))
  }

  test("fuzzyJoin is blocked: an in-distance pair in different blocks does not match") {
    val clean = Seq((1L, "red widget")).toDF("id", "nm")
    val dirty = Seq((10L, "red widgex")).toDF("id", "nm") // dist 1 but block differs
    val out = FuzzyJoin.fuzzyJoin(dirty, "id", "nm", clean, "id", "nm", lastToken, 1)
    assert(out.isEmpty)
  }

  test("editJoin has FULL recall: equals the brute-force edit-distance join") {
    // substitutions, insertions, deletions (shifted segments), short keys,
    // and plenty of non-matches
    val names = Seq(
      "red widget", "xed widget", "red widgets", "rd widget", "red widget",
      "blue bolt", "blue bolts", "bolt", "bl", "b", "",
      "hot gear", "hot bear", "got hear", "tiny gizmo", "tiny gizmos",
      "aaaaaaaa", "aaaabaaa", "aabaaaba")
    val df = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("id", "nm")
    for (e <- Seq(1, 2)) {
      val ours = graft.operators.FuzzyJoin
        .editJoin(df, "id", "nm", df, "id", "nm", e)
        .select("l_id", "r_id", "dist")
        .as[(Long, Long, Int)].collect().sortBy(p => (p._1, p._2)).toSeq
      val brute = df.select(col("id").as("l_id"), col("nm").as("l_nm"))
        .crossJoin(df.select(col("id").as("r_id"), col("nm").as("r_nm")))
        .withColumn("dist", levenshtein(col("l_nm"), col("r_nm")))
        .filter(col("dist") <= e)
        .select("l_id", "r_id", "dist")
        .as[(Long, Long, Int)].collect().sortBy(p => (p._1, p._2)).toSeq
      assert(ours == brute, s"editJoin != brute force at maxEdits=$e")
    }
  }

  test("editJoin candidate keys are constant per row (no block blowup)") {
    // with near-unique keys the candidate count stays close to the true
    // match count — the property token-blocking loses on small domains
    val df = (0L until 500L).map(i => (i, s"name-$i suffix-${i % 97}")).toDF("id", "nm")
    val pairs = graft.operators.FuzzyJoin.editJoin(df, "id", "nm", df, "id", "nm", 1)
    // every id matches at least itself at dist 0; far fewer than 500^2 total
    val n = pairs.count()
    assert(n >= 500 && n < 5000, s"unexpected candidate/match volume: $n")
  }

  test("resolveEntities clusters typo variants and keeps singletons") {
    val df = Seq(
      (1L, "red widget"), (2L, "xed widget"),  // one entity via 1-edit match
      (3L, "red widget"),                      // exact dup joins the cluster
      (4L, "blue bolt"),                       // singleton
      (5L, "hot gear"), (6L, "hot gearx"))     // 1 edit apart but different blocks
      .toDF("id", "nm")
    val out = FuzzyJoin.resolveEntities(df, "id", "nm", lastToken, 1)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L),
      (5L, 5L), (6L, 6L))) // 6 blocks on "gearx": blocking bounds recall, by design
  }

  test("resolveEntitiesDamerau: a transposition is ONE edit (levenshtein needs two)") {
    import org.apache.spark.sql.functions.substring
    val df = Seq((1L, "martha"), (2L, "marhta"), (3L, "marcos"))
      .toDF("id", "nm")
    val firstThree = (k: org.apache.spark.sql.Column) => substring(k, 1, 3)
    // damerau at maxEdits = 1: the swapped pair merges, marcos stays out
    val dl = FuzzyJoin.resolveEntitiesDamerau(df, "id", "nm", firstThree, 1)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(dl == Seq((1L, 1L), (2L, 1L), (3L, 3L)))
    // plain levenshtein at the same budget sees distance 2: no merge
    val lev = FuzzyJoin.resolveEntities(df, "id", "nm", firstThree, 1)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(lev == Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }
}

/** Sorted-neighborhood matching: suffix corruption caught, the two
  * documented misses (prefix-range split, window overflow) missed.
  */
class SortedNeighborhoodSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.operators.FuzzyJoin

  test("sortedNeighborhood: suffix twins match; prefix-range and window misses are honest") {
    val df = Seq(
      (1L, "alpha one"), (2L, "alpha onz"),   // suffix twin: caught
      (3L, "beta two"), (4L, "bexa two"),     // 2nd char differs: range split, missed
      (5L, "cat a"), (6L, "cat b"), (7L, "cat c") // rank gap 2 > window-1
    ).toDF("id", "nm")
    val out = FuzzyJoin.sortedNeighborhood(df, "id", "nm",
        window = 2, maxEdits = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(out((1L, 2L)) == 1L)
    assert(out.contains((5L, 6L)) && out.contains((6L, 7L)))
    assert(!out.contains((3L, 4L)), "cross-range pair must be missed (documented)")
    assert(!out.contains((5L, 7L)), "beyond-window pair must be missed (documented)")
    assert(out.size == 3)
  }

  test("sortedNeighborhood: exact duplicates pair at dist 0; ids canonical ascending") {
    val df = Seq((10L, "same key"), (3L, "same key")).toDF("id", "nm")
    val r = FuzzyJoin.sortedNeighborhood(df, "id", "nm",
      window = 3, maxEdits = 1).head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 10L && r.getLong(4) == 0L)
    assert(r.getString(2) == "same key" && r.getString(3) == "same key")
  }
}

/** Multi-pass SNM recovers the prefix-corruption miss of a single pass. */
class SnmMultiPassSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.operators.FuzzyJoin

  test("reversed-key second pass catches prefix twins; dedup keeps pairs unique") {
    val df = Seq(
      (1L, "alpha one"), (2L, "alpha onz"), // suffix twin: pass 1
      (3L, "beta two"), (4L, "bexa two")    // 2nd-char twin: pass 2 only
    ).toDF("id", "nm")
    val single = FuzzyJoin.sortedNeighborhood(df, "id", "nm",
      window = 4, maxEdits = 1).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(single == Set((1L, 2L)))
    val multi = FuzzyJoin.sortedNeighborhoodMultiPass(df, "id", "nm",
      window = 4, maxEdits = 1).collect()
    assert(multi.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L), (3L, 4L)))
    assert(multi.length == 2, "pairs found by both passes must dedup")
    // keys come back un-reversed
    val p34 = multi.find(r => r.getLong(0) == 3L).get
    assert(p34.getString(2) == "beta two" && p34.getString(3) == "bexa two")
  }
}
