package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{DamerauLevenshtein, JaroWinkler, StringDistanceKernels}

/** Expected constants below are calibrated against DuckDB 1.0's
  * `damerau_levenshtein` / `jaro_winkler_similarity` (the oracle
  * implementation), captured from a live session — byte-level, true-DL,
  * boost-threshold semantics and all.
  */
class StringDistanceSpec extends SparkSpecBase {
  import spark.implicits._

  private def dl(a: String, b: String): Int =
    StringDistanceKernels.damerau(UTF8String.fromString(a), UTF8String.fromString(b))
  private def jw(a: String, b: String): Double =
    StringDistanceKernels.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  test("damerau: true (unrestricted) transposition semantics") {
    // the OSA/true-DL discriminator: OSA gives 3, true DL gives 2
    assert(dl("ca", "abc") == 2)
    assert(dl("abcd", "acbd") == 1) // one adjacent transposition
    assert(dl("abcd", "abcd") == 0)
    assert(dl("kitten", "sitting") == 3) // pure Levenshtein case agrees
  }

  test("damerau: empty and byte-level unicode cases match the oracle") {
    assert(dl("", "abc") == 3)
    assert(dl("", "") == 0)
    // UTF-8 bytes, not code points: é is 2 bytes -> sub + insert
    assert(dl("héllo", "hello") == 2)
    // 語 is 3 bytes
    assert(dl("日本語", "日本") == 3)
  }

  test("jaroWinkler: textbook pairs match DuckDB to 1e-12") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("prefixes", "prefixed") - 0.95) < 1e-12)
    assert(math.abs(jw("abcdxx", "abcdyyyy") - 0.8333333333333334) < 1e-12)
    assert(math.abs(jw("abcdef", "fedcba") - 0.38888888888888884) < 1e-12)
  }

  test("jaroWinkler: boost gating, ties, empties, case, unicode") {
    // prefix boost only above jaro 0.7: this pair has jaro 0.444 and
    // a 1-byte common prefix -- must stay unboosted
    assert(math.abs(jw("aXXXXX", "aYYYYY") - 0.4444444444444444) < 1e-12)
    // jaro above threshold but zero common prefix -> unchanged
    assert(math.abs(jw("crate", "trace") - 0.7333333333333334) < 1e-12)
    // window 0: no matches despite shared characters
    assert(jw("ab", "ba") == 0.0)
    assert(jw("a", "a") == 1.0)
    assert(jw("", "a") == 0.0)
    assert(jw("", "") == 0.0) // DuckDB: empty-vs-empty is 0, not 1
    assert(jw("ABC", "abc") == 0.0) // case-sensitive
    assert(math.abs(jw("héllo", "hello") - 0.8400000000000001) < 1e-12)
  }

  test("column API evaluates through codegen with null propagation") {
    // forbid the silent interpreter fallback: a doGenCode that emits
    // Java Janino cannot compile would otherwise pass this test on eval
    // (exactly what happened with the Kernels$.MODULE$ reference —
    // caught in a bench log, not here). CODEGEN_ONLY turns that
    // fallback into a hard failure.
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try testCodegenColumn()
    finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.fallback", "true")
    }
  }

  private def testCodegenColumn(): Unit = {
    // a Range source (not a LocalRelation, no exchange): the projection
    // can neither be constant-folded away at plan time nor wrapped in an
    // AdaptiveSparkPlan, so the codegen span is visible in the plan
    val df = spark.range(3)
      .select(col("id"),
        when(col("id") === 0, "martha").when(col("id") === 1, "ca").as("a"),
        when(col("id") === 0, "marhta").when(col("id") === 1, "abc").as("b"))
      .select(col("id"),
        DamerauLevenshtein(col("a"), col("b")).as("dl"),
        JaroWinkler(col("a"), col("b")).as("jw"))
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows(0).getInt(1) == 1 && math.abs(rows(0).getDouble(2) - 0.9611111111111111) < 1e-12)
    assert(rows(1).getInt(1) == 2)
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
    // both kernels are codegen'd: the projection carries the
    // whole-stage-codegen stage marker `*(1)` (spark renders
    // WholeStageCodegenExec as a `*(stageId)` prefix in simpleString),
    // i.e. no UDF and no CodegenFallback broke the span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") &&
      plan.contains("damerau_levenshtein") && plan.contains("jaro_winkler"),
      plan)
  }
}
