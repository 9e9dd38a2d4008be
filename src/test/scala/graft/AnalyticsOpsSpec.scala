package graft

import org.apache.spark.sql.functions._
import graft.operators.{BloomPrune, ChangeCapture, EventAnalytics}

class ChangeCaptureSpec extends SparkSpecBase {
  import spark.implicits._

  test("rowChanges classifies added/removed/changed/unchanged with column attribution") {
    val oldDf = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("pk", "s", "v")
    val newDf = Seq(
      (1L, "a", 10.0),          // unchanged
      (2L, "B", 21.0),          // both columns changed
      (4L, "d", 41.0),          // one column changed
      (5L, "e", 50.0))          // added (3 removed)
      .toDF("pk", "s", "v")
    val out = ChangeCapture.rowChanges(oldDf, newDf, "pk")
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "unchanged", "", 0L),
      (2L, "changed", "s,v", 2L),
      (3L, "removed", "", 0L),
      (4L, "changed", "v", 1L),
      (5L, "added", "", 0L)))
  }

  test("rowChanges compares null-safely and ignores non-shared columns") {
    val oldDf = Seq((1L, Option("x"), Option(1)), (2L, None: Option[String], Option(2)))
      .toDF("pk", "s", "old_only")
    val newDf = Seq((1L, None: Option[String], Option(9)), (2L, None: Option[String], Option(9)))
      .toDF("pk", "s", "new_only")
    val out = ChangeCapture.rowChanges(oldDf, newDf, "pk")
      .select("pk", "change_type", "changed_cols")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    // old_only/new_only are schema drift, not row drift: ignored here
    assert(out == Seq((1L, "changed", "s"), (2L, "unchanged", "")))
  }

  test("mergeInto applies update/insert/guarded-delete with standard clause order") {
    val target = Seq((1L, "keep", 10.0), (2L, "update-me", 20.0),
      (3L, "delete-me", 30.0)).toDF("pk", "s", "v")
    val source = Seq(
      (2L, "updated", 21.0),      // matched -> update
      (3L, "DEL", 31.0),          // matched + deleteWhen -> delete
      (4L, "inserted", 40.0),     // unmatched -> insert
      (5L, "DEL", 50.0))          // unmatched + deleteWhen -> STILL inserts
      .toDF("pk", "s", "v")
    val out = ChangeCapture.mergeInto(target, source, "pk",
        deleteWhen = Some(col("s") === "DEL"))
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1L, "keep", 10.0), (2L, "updated", 21.0),
      (4L, "inserted", 40.0), (5L, "DEL", 50.0)))
  }

  test("mergeInto without deleteWhen is a pure upsert and rejects schema drift") {
    val target = Seq((1L, "a")).toDF("pk", "s")
    val source = Seq((1L, "b"), (2L, "c")).toDF("pk", "s")
    val out = ChangeCapture.mergeInto(target, source, "pk")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1L, "b"), (2L, "c")))
    val bad = Seq((1L, 9.0)).toDF("pk", "other")
    assertThrows[IllegalArgumentException] {
      ChangeCapture.mergeInto(target, bad, "pk")
    }
  }

  test("foreignKeyViolations lists orphaned child rows; NULL keys are not violations") {
    import graft.operators.Expectations
    val parent = Seq(1L, 2L).toDF("pid")
    val child = Seq((10L, Some(1L)), (11L, Some(3L)), (12L, None))
      .toDF("id", "fk")
    val out = Expectations.foreignKeyViolations(child, "fk", parent, "pid")
      .select("id").as[Long].collect().toSeq
    assert(out == Seq(11L)) // fk=3 orphaned; fk=NULL skipped per SQL FK semantics
  }

  test("functionalDependencyViolations is empty iff the dependency holds") {
    import graft.operators.Expectations
    val holds = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("det", "dep")
    assert(Expectations.functionalDependencyViolations(holds, "det", "dep").count() == 0)
    val broken = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("det", "dep")
    val v = Expectations.functionalDependencyViolations(broken, "det", "dep")
      .as[(Long, Long)].collect().toSeq
    assert(v == Seq((1L, 2L)))
  }

  test("mergeInto rejects a source with duplicate keys (MERGE cardinality violation)") {
    val target = Seq((1L, "a")).toDF("pk", "s")
    val dupSource = Seq((1L, "b"), (1L, "c")).toDF("pk", "s")
    assertThrows[IllegalArgumentException] {
      ChangeCapture.mergeInto(target, dupSource, "pk")
    }
    // the check is skippable for pre-deduplicated feeds
    val out = ChangeCapture.mergeInto(target, dupSource, "pk",
      verifySourceUnique = false)
    assert(out.count() == 2) // documented hazard: duplicates pass through
  }

  test("mergeInto opt-in target-uniqueness guard catches a duplicated target key") {
    // documented precondition: a duplicated TARGET key would collapse to
    // one row (SQL MERGE would update both) — the opt-in guard rejects it
    val dupTarget = Seq((1L, "a"), (1L, "a2"), (2L, "b")).toDF("pk", "s")
    val source = Seq((1L, "new")).toDF("pk", "s")
    assertThrows[IllegalArgumentException] {
      ChangeCapture.mergeInto(dupTarget, source, "pk", verifyTargetUnique = true)
    }
    // default skips the big-side scan; the divergence is documented
    assert(ChangeCapture.mergeInto(dupTarget, source, "pk").count() == 2)
  }
}

class EventAnalyticsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ev(rows: (Long, String, Int)*): org.apache.spark.sql.DataFrame =
    rows.map { case (u, t, m) =>
      (u, t, java.sql.Timestamp.valueOf(f"2026-01-01 00:$m%02d:00"))
    }.toDF("user_id", "event_type", "ts")

  test("funnel enforces step ORDER, not mere presence") {
    val events = ev(
      (1L, "view", 1), (1L, "click", 2), (1L, "purchase", 3),  // full conversion
      (2L, "view", 1), (2L, "click", 2),                        // stops at click
      (3L, "click", 1), (3L, "view", 2),                        // click BEFORE view: no click conversion
      (4L, "purchase", 1), (4L, "view", 2))                     // purchase before view: view only
    val out = EventAnalytics.funnel(events, Seq("view", "click", "purchase"))
      .orderBy("step_idx")
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(out == Seq(
      (0L, "view", 4L, 1.0),
      (1L, "click", 2L, 0.5),
      (2L, "purchase", 1L, 0.25)))
  }

  test("funnel counts same-timestamp step completion (>= semantics)") {
    val events = ev((1L, "view", 5), (1L, "click", 5))
    val out = EventAnalytics.funnel(events, Seq("view", "click"))
      .orderBy("step_idx").select("users").as[Long].collect().toSeq
    assert(out == Seq(1L, 1L))
  }

  test("long funnels persist intermediates: same answer as the lazy path, no cache leak") {
    // 10 steps s0..s9; user u completes the first (10 - u) steps in order,
    // so reach at step i is exactly the users with u <= 10 - (i+1) + ... :
    // user u performs steps 0..(9-u) at minutes 1..(10-u).
    val events = (0L until 10L).flatMap { u =>
      (0 to (9 - u).toInt).map(i => (u, s"s$i", i + 1))
    }
    val df = ev(events: _*)
    val steps = (0 until 10).map(i => s"s$i")
    // leak detector scoped to THIS operator: a global persisted-RDD
    // count races with concurrently running suites (observed flake);
    // cached RDD toStrings carry their creation site, so filter to the
    // funnel's source files instead
    def ownedCaches: Iterable[String] =
      spark.sparkContext.getPersistentRDDs.values.map(_.toString)
        .filter(s => s.contains("EventAnalytics.scala") ||
          s.contains("AnalyticsOpsSpec.scala"))
    // positive control: the detector must actually see a cache created
    // from this call path before we trust its silence
    val probe = df.persist(); probe.count()
    assert(ownedCaches.nonEmpty, "leak detector failed its positive control")
    probe.unpersist(blocking = true)
    assert(ownedCaches.isEmpty)
    val eager = EventAnalytics.funnel(df, steps) // size 10 > threshold 6
      .orderBy("step_idx")
      .as[(Long, String, Long, Double)].collect().toSeq
    // every intermediate reach was unpersisted once its successor materialized
    assert(ownedCaches.isEmpty, s"leaked funnel caches: $ownedCaches")
    val lazyPath = EventAnalytics.funnel(df, steps, persistThreshold = 100)
      .orderBy("step_idx")
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(eager == lazyPath)
    // step i is reached by users 0..(9-i): 10-i users
    assert(eager.map(_._3) == (10L to 1L by -1L).toSeq)
  }

  test("retentionCohorts buckets whole weeks since the user's first day") {
    val events = Seq(
      (1L, "2026-01-05"), (1L, "2026-01-07"),  // offset 0 twice -> one row
      (1L, "2026-01-13"),                      // day 8 -> offset 1
      (2L, "2026-01-05"), (2L, "2026-01-26"))  // day 21 -> offset 3
      .map { case (u, d) => (u, java.sql.Timestamp.valueOf(d + " 10:00:00")) }
      .toDF("user_id", "ts")
    val out = EventAnalytics.retentionCohorts(events)
      .orderBy("cohort_day", "week_offset")
      .select(col("cohort_day").cast("string"), col("week_offset"), col("n_users"))
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("2026-01-05", 0L, 2L),
      ("2026-01-05", 1L, 1L),
      ("2026-01-05", 3L, 1L)))
  }

  test("heavyHitters equals the brute-force exact answer") {
    val df = Tables.events(spark, sfDir)
    val support = 0.07 // sf0.001: 5 of 15 users are above 70 events
    val total = df.count()
    val brute = df.groupBy("user_id").agg(count(lit(1)).as("n"))
      .filter(col("n") > lit(support) * lit(total.toDouble))
      .select("user_id", "n")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val ours = EventAnalytics.heavyHitters(df, "user_id", support)
      .select("user_id", "n")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(ours == brute)
    // the fixture must exercise BOTH sides of the threshold
    assert(ours.nonEmpty && ours.size < df.select("user_id").distinct().count())
  }

  test("compactLatest keeps exactly the latest record per key with id tie-break") {
    val log = Seq(
      (1L, 1L, "a", 1), (2L, 1L, "b", 3), (3L, 1L, "c", 2),   // winner: b (ts 3)
      (5L, 2L, "x", 4), (4L, 2L, "y", 4),                      // tie ts: higher id wins
      (6L, 3L, "only", 1))
      .map { case (id, u, t, m) =>
        (id, u, t, java.sql.Timestamp.valueOf(f"2026-01-01 00:$m%02d:00"))
      }.toDF("event_id", "user_id", "event_type", "ts")
    val out = graft.operators.ChangeCapture
      .compactLatest(log, "user_id", "ts", "event_id")
      .select("user_id", "event_id", "event_type")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 2L, "b"), (2L, 5L, "x"), (3L, 6L, "only")))
  }

  test("scdHistory builds contiguous validity intervals with one current version") {
    val log = Seq(
      (1L, 1L, 1), (2L, 1L, 3), (3L, 1L, 2),   // user 1: versions at minutes 1,2,3
      (4L, 2L, 5))                              // user 2: single version
      .map { case (id, u, m) =>
        (id, u, java.sql.Timestamp.valueOf(f"2026-01-01 00:$m%02d:00"))
      }.toDF("event_id", "user_id", "ts")
    val out = graft.operators.ChangeCapture.scdHistory(log, "user_id", "ts", "event_id")
      .select("user_id", "event_id", "version", "is_current")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(out == Seq(
      (1L, 1L, 1L, false), (1L, 3L, 2L, false), (1L, 2L, 3L, true),
      (2L, 4L, 1L, true)))
    // interval chaining: each valid_to equals the next version's valid_from
    val iv = graft.operators.ChangeCapture.scdHistory(log, "user_id", "ts", "event_id")
      .filter($"user_id" === 1L).orderBy("version")
      .select("valid_from", "valid_to")
      .as[(java.sql.Timestamp, Option[java.sql.Timestamp])].collect().toSeq
    assert(iv(0)._2.contains(iv(1)._1) && iv(1)._2.contains(iv(2)._1) && iv(2)._2.isEmpty)
  }

  test("featureHash is deterministic, sparse, and count-preserving up to sign") {
    val docs = Seq((1L, "alpha alpha"), (2L, "alpha"), (3L, ""),
      (4L, null.asInstanceOf[String]), (5L, "beta")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.featureHash(docs, "text", "doc_id", 16)
      .as[(Long, Long, Long)].collect().toSeq
    val byDoc = out.groupBy(_._1)
    // single-term docs land in exactly one bucket with |weight| 1
    assert(byDoc(2L).size == 1 && math.abs(byDoc(2L).head._3) == 1)
    assert(byDoc(5L).size == 1 && math.abs(byDoc(5L).head._3) == 1)
    // same term -> same bucket and sign: doc 1 is exactly 2x doc 2
    assert(byDoc(1L) == byDoc(2L).map(r => (1L, r._2, 2 * r._3)))
    // empty/null docs emit nothing
    assert(!byDoc.contains(3L) && !byDoc.contains(4L))
    // buckets within range
    assert(out.forall(r => r._2 >= 0 && r._2 < 16))
  }

  test("coOccurrence counts baskets containing both items, within-basket dups collapse") {
    val baskets = Seq(
      (10L, "apple"), (10L, "beer"), (10L, "beer"),  // dup item collapses
      (11L, "apple"), (11L, "beer"), (11L, "chips"),
      (12L, "apple"), (12L, "chips"))
      .toDF("basket", "item")
    val out = EventAnalytics.coOccurrence(baskets, "basket", "item", 1)
      .as[(String, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      ("apple", "beer", 2L),     // baskets 10, 11
      ("apple", "chips", 2L),    // baskets 11, 12
      ("beer", "chips", 1L)))    // basket 11
    // support filter
    assert(EventAnalytics.coOccurrence(baskets, "basket", "item", 2).count() == 2)
  }

  test("groupedQuantiles interpolates exactly per group") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 10.0), ("b", 20.0)).toDF("g", "v")
    val out = EventAnalytics.groupedQuantiles(df, "g", "v", Seq(0.5, 0.75))
      .as[(String, Double, Double)].collect().sortBy(_._1).toSeq
    // a: p50 = 2.5, p75 = 3.25 (linear interpolation); b: p50 = 15, p75 = 17.5
    assert(out == Seq(("a", 2.5, 3.25), ("b", 15.0, 17.5)))
  }

  test("cohortLtv accumulates decimal-exact revenue per cohort week") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // user 1: first active Jan 5 (view), buys 10.10 in week 0, 20.20 in week 1
      (1L, 1L, "view", 0.0, ts("2026-01-05 09:00:00")),
      (2L, 1L, "purchase", 10.10, ts("2026-01-06 10:00:00")),
      (3L, 1L, "purchase", 20.20, ts("2026-01-13 10:00:00")),
      // user 2: same cohort day, never buys
      (4L, 2L, "view", 0.0, ts("2026-01-05 11:00:00")),
      // user 3: later cohort, buys 5.00 in its week 0
      (5L, 3L, "signup", 0.0, ts("2026-01-20 09:00:00")),
      (6L, 3L, "purchase", 5.00, ts("2026-01-20 12:00:00")))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val out = EventAnalytics.cohortLtv(events)
      .select(col("cohort_day").cast("string"), col("week_offset"),
        col("week_rev"), col("cum_rev"), col("n_users"), col("ltv_per_user"))
      .as[(String, Long, Double, Double, Long, Double)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      ("2026-01-05", 0L, 10.10, 10.10, 2L, 5.05),
      ("2026-01-05", 1L, 20.20, 30.30, 2L, 15.15),
      ("2026-01-20", 0L, 5.00, 5.00, 1L, 5.00)))
  }

  test("expectations report flags each planted violation class") {
    import graft.operators.Expectations._
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val df = Seq(
      (1L, Option("A"), 10.0, Option(1L)),
      (2L, Option("B"), -5.0, Option(2L)),      // range violation
      (2L, None, 20.0, Option(9L)),             // null status, dup key, orphan fk
      (4L, Option("ok"), 30.0, None))           // regex violation, null fk ignored
      .toDF("id", "status", "price", "fk")
    val out = validate(df, Seq(
      NotNull("status", maxNullFrac = 0.1),
      InRange("price", 0.0, 100.0),
      MatchesRegex("status", "^[A-Z]$"),
      InSet("status", Set("A", "B")),           // "ok" violates; null skipped
      Unique("id"),
      RefIntegrity("fk", dim, "k")))
      .as[(String, String, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("not_null")._3 == 0.25 && !out("not_null")._5)   // 1/4 > 0.1
    assert(out("in_range")._3 == 1.0 && !out("in_range")._5)
    assert(out("matches_regex")._3 == 1.0 && !out("matches_regex")._5)
    assert(out("in_set")._3 == 1.0 && !out("in_set")._5)
    // native-type accepted values: a numeric set on a numeric column
    // compares on the column's type (dbt quote:false), no string render
    val numeric = validate(Seq((1L, 1.0), (2L, 2.5)).toDF("id", "price"),
      Seq(InSet("price", Set(1.0, 2.5))))
      .as[(String, String, Double, Double, Boolean)].head()
    assert(numeric._3 == 0.0 && numeric._5, s"clean numeric InSet failed: $numeric")
    assert(out("unique")._3 == 1.0 && !out("unique")._5)        // one dup pair
    assert(out("ref_integrity")._3 == 1.0 && !out("ref_integrity")._5) // fk=9
    // a clean table passes everything
    val clean = validate(Seq((1L, "A", 1.0, 1L)).toDF("id", "status", "price", "fk"),
      Seq(NotNull("status"), InRange("price", 0, 10), Unique("id"),
        RefIntegrity("fk", dim, "k")))
    assert(clean.filter(!col("ok")).count() == 0)
  }

  test("frequentTriples: Apriori pruning returns exactly the supported triples") {
    // {1,2,3} in 3 baskets; {1,2,4} once; {5,6,7} once -> only (1,2,3)
    // at minSupport 2; duplicate rows within a basket must not inflate
    // support
    val rows = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L), (10L, 3L),
      (11L, 1L), (11L, 2L), (11L, 3L),
      (12L, 1L), (12L, 2L), (12L, 3L), (12L, 4L),
      (13L, 5L), (13L, 6L), (13L, 7L)).toDF("b", "i")
    val out = EventAnalytics.frequentTriples(rows, "b", "i", 2).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (1L, 2L, 3L, 3L))
    // minSupport 1 keeps every distinct triple
    assert(EventAnalytics.frequentTriples(rows, "b", "i", 1).count() == 5)
  }

  test("drift expectation passes a same-shape batch and fails a shifted one") {
    import graft.operators.Expectations._
    val ref = Seq.tabulate(200)(i => (i % 100).toDouble).toDF("v")
    // same distribution (another sample of the same values): d = 0
    val same = Seq.tabulate(100)(i => i.toDouble).toDF("v")
    val ok = validate(same, Seq(Drift("v", ref, maxD = 0.1)))
      .as[(String, String, Double, Double, Boolean)].head()
    assert(ok._1 == "drift" && ok._3 == 0.0 && ok._5)
    // a +50 location shift: D = 0.5 > 0.1 -> rule fails
    val shifted = Seq.tabulate(100)(i => i + 50.0).toDF("v")
    val bad = validate(shifted, Seq(Drift("v", ref, maxD = 0.1)))
      .as[(String, String, Double, Double, Boolean)].head()
    assert(bad._3 == 0.5 && !bad._5)
    // drift composes with row rules in one report
    val combo = validate(shifted, Seq(NotNull("v"), Drift("v", ref, 0.1)))
      .as[(String, String, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(combo == Map("not_null" -> true, "drift" -> false))
    // an all-null current batch is an UNDEFINED comparison: the gate
    // must FAIL loudly (metric 1.0), never emit a null-poisoned ok
    val allNull = Seq[Option[Double]](None, None).toDF("v")
    val undef = validate(allNull, Seq(Drift("v", ref, maxD = 0.1)))
      .as[(String, String, Double, Double, Boolean)].head()
    assert(undef._3 == 1.0 && !undef._5)
  }

  test("duplicate Unique rules on one column stay unambiguous (fused-branch regression)") {
    // two rules naming the same column: the fused single-pass branch
    // used to project the column twice, making every later reference an
    // AMBIGUOUS_REFERENCE AnalysisException
    import graft.operators.Expectations._
    val df = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("id", "v")
    val out = validate(df, Seq(
      Unique("id"), Unique("id", name = "unique_again"),
      Unique("v", name = "unique_v")))
      .as[(String, String, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("unique")._3 == 1.0 && !out("unique")._5)
    assert(out("unique_again")._3 == 1.0 && !out("unique_again")._5)
    assert(out("unique")._2 == "id" && out("unique_again")._2 == "id")
    assert(out.size == 3)
  }

  test("UniqueApprox agrees with exact Unique on a clean column and flags " +
       "duplication only past its tolerance") {
    import graft.operators.Expectations._
    // clean: 2000 distinct ids — both variants pass (tolerance 0.1 > 2*rsd)
    val clean = (1L to 2000L).toDF("id")
    val cleanOut = validate(clean, Seq(Unique("id"), UniqueApprox("id", 0.1)))
      .as[(String, String, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(cleanOut("unique")._5 && cleanOut("unique_approx")._5)
    assert(cleanOut("unique_approx")._3 <= 0.1,
      s"clean dup-frac estimate ${cleanOut("unique_approx")._3}")
    // 50% duplicated: every id appears twice — far outside tolerance 0.1,
    // but inside a loose tolerance 0.7
    val dup = ((1L to 1000L) ++ (1L to 1000L)).toDF("id")
    val dupOut = validate(dup,
      Seq(UniqueApprox("id", 0.1), UniqueApprox("id", 0.7)))
      .as[(String, String, Double, Double, Boolean)].collect()
    val strict = dupOut.find(_._4 == 0.1).get
    val loose = dupOut.find(_._4 == 0.7).get
    assert(!strict._5, s"50% dup must fail tolerance 0.1 (est ${strict._3})")
    assert(loose._5, s"50% dup must pass tolerance 0.7 (est ${loose._3})")
    assert(math.abs(strict._3 - 0.5) < 0.1, s"estimate ${strict._3} ~ 0.5")
  }

  test("rfmSegments scores quintiles with recency inverted") {
    // 10 users: user u purchases u times, value 10*u each, last purchase
    // u days before the corpus max -> frequency/monetary rise with u,
    // recency WORSENS with u
    val rows = for (u <- 1 to 10; i <- 1 to u) yield
      (u * 100L + i, u.toLong, "purchase", 10.0 * u,
        java.sql.Timestamp.valueOf(f"2026-01-${31 - u}%02d 12:00:00"))
    val events = rows.toDF("event_id", "user_id", "event_type", "value", "ts")
      .unionByName(Seq((9999L, 1L, "view", 1.0,
        java.sql.Timestamp.valueOf("2026-01-31 00:00:00")))
        .toDF("event_id", "user_id", "event_type", "value", "ts")) // non-purchase ignored
    val out = EventAnalytics.rfmSegments(events)
      .as[(Long, Long, Long, Double, Int, Int, Int, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(out.size == 10)
    // user 10: top frequency/monetary, worst recency
    assert(out(10L)._6 == 5 && out(10L)._7 == 5 && out(10L)._5 == 1)
    // user 1: most recent, lowest frequency/monetary
    assert(out(1L)._5 == 5 && out(1L)._6 == 1 && out(1L)._7 == 1)
    // monotone in u for f/m, antitone for r; segment is the score concat
    val us = (1 to 10).map(u => out(u.toLong))
    assert(us.sliding(2).forall { case Seq(a, b) =>
      b._6 >= a._6 && b._7 >= a._7 && b._5 <= a._5 })
    assert(us.forall(r => r._8 == s"${r._5}${r._6}${r._7}"))
  }

  test("topPaths counts ordered event-type prefixes across users") {
    val events = Seq(
      // users 1,2: same path a>b>c ; user 3: b>a (tie ts broken by id)
      (1L, 1L, "a", 1), (2L, 1L, "b", 2), (3L, 1L, "c", 3),
      (4L, 2L, "a", 1), (5L, 2L, "b", 2), (6L, 2L, "c", 3),
      (8L, 3L, "a", 5), (7L, 3L, "b", 5))
      .map { case (id, u, t, m) =>
        (id, u, t, java.sql.Timestamp.valueOf(f"2026-01-01 00:$m%02d:00"))
      }.toDF("event_id", "user_id", "event_type", "ts")
    val out = EventAnalytics.topPaths(events, pathLen = 2, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("a>b", 2L), ("b>a", 1L)))
    // prefix truncation: pathLen 1 collapses users 1..2 and 3
    val short = EventAnalytics.topPaths(events, pathLen = 1, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(short == Seq(("a", 2L), ("b", 1L)))
  }

  test("transitionMatrix counts consecutive pairs per user with deterministic tie-break") {
    val events = Seq(
      // user 1: a -> b -> a (ordered by ts)
      (1L, 1L, "a", 1), (2L, 1L, "b", 2), (3L, 1L, "a", 3),
      // user 2: a -> b
      (4L, 2L, "a", 1), (5L, 2L, "b", 2),
      // user 3: two events at the SAME ts — event_id breaks the tie: b -> a
      (7L, 3L, "a", 5), (6L, 3L, "b", 5))
      .map { case (id, u, t, m) =>
        (id, u, t, java.sql.Timestamp.valueOf(f"2026-01-01 00:$m%02d:00"))
      }.toDF("event_id", "user_id", "event_type", "ts")
    val out = EventAnalytics.transitionMatrix(events)
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("a", "b", 2L, 1.0),     // both a-transitions go to b
      ("b", "a", 2L, 1.0)))    // user 1's b->a plus user 3's tie-broken b->a
  }

  test("rollingAnomaly flags a spike against the trailing window, nulls otherwise") {
    // key 1: nine 10.0s with a little jitter, then a spike
    val base = (1 to 9).map(i => (i.toLong, 1L, if (i % 2 == 0) 10.5 else 9.5, i))
    val rows = (base :+ (10L, 1L, 100.0, 10)) ++
      // key 2: constant values -> zero trailing variance -> null z
      (1 to 5).map(i => (100L + i, 2L, 7.0, i))
    val events = rows.map { case (id, u, v, m) =>
      (id, u, v, java.sql.Timestamp.valueOf(f"2026-01-01 00:$m%02d:00"))
    }.toDF("event_id", "user_id", "value", "ts")
    val keyed = EventAnalytics.rollingAnomaly(events, "user_id", "value",
        n = 4, threshold = 3.0)
      .orderBy("event_id")
      .as[(Long, Long, Double, Option[Double], Boolean)].collect().toSeq
    // first 4 rows of key 1 lack a full window -> null z, not anomalous
    assert(keyed.take(4).forall(r => r._4.isEmpty && !r._5))
    // rows 5..9 are in-band jitter: defined z, not anomalous
    assert(keyed.slice(4, 9).forall(r => r._4.isDefined && !r._5))
    // the spike is flagged
    val spike = keyed.find(_._2 == 10L).get
    assert(spike._4.exists(_ > 3.0) && spike._5)
    // constant key: zero variance -> null z everywhere
    assert(keyed.filter(_._1 == 2L).forall(r => r._4.isEmpty && !r._5))
  }
}

class BloomPruneSpec extends SparkSpecBase {
  import spark.implicits._

  test("prunedSemiJoin output is exactly the plain left-semi join") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val hi = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_totalprice") > 400000.0)
    val plain = li.join(hi.select("o_orderkey").distinct(),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_partkey", "l_suppkey")
      .as[(Long, Long, Long)].collect().sortBy(identity).toSeq
    val pruned = BloomPrune.prunedSemiJoin(li, "l_orderkey", hi, "o_orderkey",
        expectedItems = 10000L, fpp = 0.01)
      .select("l_orderkey", "l_partkey", "l_suppkey")
      .as[(Long, Long, Long)].collect().sortBy(identity).toSeq
    assert(pruned == plain)
    assert(plain.nonEmpty)
  }

  test("candidateFilter prunes most non-matching rows and keeps all matches") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val hi = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_totalprice") > 400000.0)
    val bigN = li.count()
    val semiN = li.join(hi.select("o_orderkey").distinct(),
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    val candN = li.filter(BloomPrune.candidateFilter(
      hi, "o_orderkey", col("l_orderkey"), 10000L, 0.01)).count()
    assert(candN >= semiN)          // no false negatives, ever
    assert(candN <= semiN + (bigN * 0.05).toLong) // fpp 1% with slack
    assert(candN < bigN)            // it actually pruned
  }
}

class CumulativeDistinctSpec extends SparkSpecBase {
  import spark.implicits._

  private val ev = Seq(
    (1L, "2024-01-01 10:00:00", "a"), (1L, "2024-01-02 10:00:00", "a"),
    (2L, "2024-01-02 10:00:00", "a"), (3L, "2024-01-03 10:00:00", "b"),
    (1L, "2024-01-03 10:00:00", "b"), (2L, "2024-01-03 12:00:00", "a")
  ).toDF("user_id", "ts", "seg").withColumn("ts", col("ts").cast("timestamp"))

  test("cumulative distinct equals brute-force prefix countDistinct") {
    val got = EventAnalytics.cumulativeDistinctDaily(ev)
      .select("day", "new_users", "cum_users")
      .as[(java.sql.Date, Long, Long)].collect().sortBy(_._1.toString).toSeq
    assert(got.map(r => (r._1.toString, r._2, r._3)) ==
      Seq(("2024-01-01", 1L, 1L), ("2024-01-02", 1L, 2L), ("2024-01-03", 1L, 3L)))
    // brute force: distinct users up to each day
    for ((d, _, cum) <- got) {
      val brute = ev.filter(to_date($"ts") <= lit(d)).select("user_id")
        .distinct().count()
      assert(brute == cum, s"day $d")
    }
  }

  test("segmented variant keys first-appearance per segment") {
    val got = EventAnalytics
      .cumulativeDistinctDaily(ev, segmentCols = Seq("seg"))
      .select("seg", "day", "cum_users")
      .as[(String, java.sql.Date, Long)].collect()
      .map(r => (r._1, r._2.toString, r._3)).sortBy(t => (t._1, t._2)).toSeq
    // only days with NEW users in the segment emit a row (the curve's
    // support — flat days carry no information and are reconstructible)
    assert(got == Seq(
      ("a", "2024-01-01", 1L), ("a", "2024-01-02", 2L),
      ("b", "2024-01-03", 2L)))
  }
}

class RobustOutliersSpec extends SparkSpecBase {
  import spark.implicits._

  test("robust z-score flags the planted spike; MAD ignores it") {
    // 99 values in [0, 10] plus one wild spike: mean/stddev would be
    // dragged; median/MAD must not be
    val vals = (1 to 99).map(i => ("g", i.toLong, (i % 11).toDouble)) :+
      (("g", 100L, 1e6))
    val out = EventAnalytics.robustOutliers(
        vals.toDF("g", "id", "v"), "g", "v", 3.5)
      .select("id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(out(100L))
    assert((1 to 99).forall(i => !out(i.toLong)))
  }

  test("constant groups (MAD = 0) flag nothing") {
    val df = (1 to 10).map(i => ("c", i.toLong, 5.0)).toDF("g", "id", "v")
    val out = EventAnalytics.robustOutliers(df, "g", "v", 3.5)
    assert(out.filter($"is_outlier").count() == 0)
    assert(out.count() == 10)
  }
}

class DriftLocalizeSpec extends SparkSpecBase {
  import spark.implicits._

  test("bucketed drift counts reconstruct the total and localize the run") {
    import graft.sources.MemorySide
    val li = Tables.t(spark, sfDir, "lineitem")
    val s1 = MemorySide("db1", Map("lineitem" -> li.filter("l_orderkey % 97 != 0")))
    val s2 = MemorySide("db2", Map("lineitem" -> li.filter("l_orderkey % 89 != 0")))
    val c = new graft.operators.DriftCompare(spark, s1, s2)
    val drift = c.dataDrift("lineitem").get
    val loc = c.driftLocalize(drift, "l_orderkey", 500L)
      .as[(Long, String, Long)].collect().toSeq
    assert(loc.map(_._3).sum == drift.count())
    // buckets are aligned and nonnegative-count
    assert(loc.forall(r => r._1 % 500L == 0 && r._3 > 0))
  }
}

class IncrementalAggSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.operators.IncrementalAgg
  import graft.operators.IncrementalAgg.Spec

  private val specs = Seq(Spec("count", "", "n"), Spec("sum", "v", "sv"),
    Spec("min", "v", "mn"), Spec("max", "v", "mx"))

  private def rows(ids: Range) =
    ids.map(i => ((i % 7).toLong, i * 1.01)).toDF("k", "v")

  private def canon(df: org.apache.spark.sql.DataFrame) = df
    .select(col("k"), col("n").cast("long"), col("sv").cast("decimal(38,2)"),
      col("mn"), col("mx"))
    .as[(Long, Long, BigDecimal, Double, Double)].collect().sortBy(_._1).toSeq

  test("merge(aggregate(a), b) == aggregate(a ++ b), exactly") {
    val a = rows(1 to 400)
    val b = rows(401 to 1000)
    val merged = IncrementalAgg.merge(
      IncrementalAgg.aggregate(a, Seq("k"), specs), b, Seq("k"), specs)
    val full = IncrementalAgg.aggregate(rows(1 to 1000), Seq("k"), specs)
    assert(canon(merged) == canon(full))
  }

  test("merge chains associatively: ((s+d1)+d2) == aggregate(all)") {
    val s0 = IncrementalAgg.aggregate(rows(1 to 300), Seq("k"), specs)
    val s1 = IncrementalAgg.merge(s0, rows(301 to 600), Seq("k"), specs)
    val s2 = IncrementalAgg.merge(s1, rows(601 to 900), Seq("k"), specs)
    val full = IncrementalAgg.aggregate(rows(1 to 900), Seq("k"), specs)
    assert(canon(s2) == canon(full))
  }

  test("a delta with NEW keys lands in the merged snapshot") {
    val snap = IncrementalAgg.aggregate(
      Seq((1L, 2.0)).toDF("k", "v"), Seq("k"), specs)
    val merged = IncrementalAgg.merge(snap,
      Seq((9L, 5.0)).toDF("k", "v"), Seq("k"), specs)
    assert(merged.count() == 2)
    assert(merged.filter($"k" === 9L).select($"n".cast("long"))
      .as[Long].collect().head == 1L)
  }

  test("merge round-trips through parquet (snapshot persistence)") {
    val p = java.nio.file.Files.createTempDirectory("incr").toString
    IncrementalAgg.aggregate(rows(1 to 500), Seq("k"), specs)
      .write.mode("overwrite").parquet(p)
    val merged = IncrementalAgg.merge(spark.read.parquet(p),
      rows(501 to 1000), Seq("k"), specs)
    val full = IncrementalAgg.aggregate(rows(1 to 1000), Seq("k"), specs)
    assert(canon(merged) == canon(full))
  }
}

class ColumnDriftProfileSpec extends SparkSpecBase {
  import spark.implicits._

  test("profile counts per-column diffs plus added/removed keys; clean columns vanish") {
    val oldDf = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("pk", "s", "v")
    val newDf = Seq((1L, "a", 9.0), (2L, "B", 9.0), (4L, "d", 4.0))
      .toDF("pk", "s", "v")
    val out = ChangeCapture.columnDriftProfile(oldDf, newDf, "pk")
      .as[(String, Long)].collect().toMap
    assert(out == Map("(added rows)" -> 1L, "(removed rows)" -> 1L,
      "s" -> 1L, "v" -> 2L))
  }

  test("identical sides produce an empty profile") {
    val df = Seq((1L, "a")).toDF("pk", "s")
    assert(ChangeCapture.columnDriftProfile(df, df, "pk").count() == 0)
  }
}

class KaplanMeierSpec extends SparkSpecBase {
  import spark.implicits._

  test("kaplanMeier matches the hand-computed censored fixture") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"1970-01-${day + 1}%02d 12:00:00")
    // observation end = day 20; censorDays = 5 => churned iff last <= 15
    // A: t=2 churn; B: t=2 churn; C: t=5 churn; D: 10..18 t=8 censored;
    // E: 0..20 t=20 censored
    val ev = (Seq((1L, 0), (1L, 2), (2L, 5), (2L, 7), (3L, 0), (3L, 5),
      (4L, 10), (4L, 18), (5L, 0), (5L, 20)))
      .map { case (u, d) => (u, ts(d)) }.toDF("u", "ts")
    val out = EventAnalytics.kaplanMeier(ev, "u", "ts", censorDays = 5)
      .orderBy("t").collect()
    assert(out.map(_.getAs[Int]("t")).toSeq == Seq(2, 5, 8, 20))
    assert(out.map(_.getAs[Long]("n_risk")).toSeq == Seq(5L, 3L, 2L, 1L))
    assert(out.map(_.getAs[Long]("n_events")).toSeq == Seq(2L, 1L, 0L, 0L))
    assert(out.map(_.getAs[Long]("n_censored")).toSeq == Seq(0L, 0L, 1L, 1L))
    // survival replay with the operator's exact rounding policy
    def r6(v: Double) = java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val f2 = r6(3.0 / 5); val f5 = r6(2.0 / 3)
    val s2 = r6(math.exp(r6(math.log(f2))))
    val s5 = r6(math.exp(
      BigDecimal(r6(math.log(f2))).+(BigDecimal(r6(math.log(f5)))).toDouble))
    assert(out.map(_.getAs[Double]("survival")).toSeq ==
      Seq(s2, s5, s5, s5))
  }

  test("kaplanMeier: total churn at one lifetime zeroes survival after it") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"1970-01-${day + 1}%02d 00:00:00")
    // maxDay 20 via a churned long-liver? No: keep one censored anchor
    // at day 20 whose OWN lifetime is the last row; everyone else
    // churns at t=1
    val ev = Seq((1L, 0), (1L, 1), (2L, 3), (2L, 4), (3L, 20), (3L, 20))
      .map { case (u, d) => (u, ts(d)) }.toDF("u", "ts")
    val out = EventAnalytics.kaplanMeier(ev, "u", "ts", censorDays = 5)
      .orderBy("t").collect()
    // t=0: the anchor (censored, lifetime 0); t=1: both churners
    assert(out.map(_.getAs[Int]("t")).toSeq == Seq(0, 1))
    val last = out.last
    assert(last.getAs[Long]("n_risk") == 2L &&
      last.getAs[Long]("n_events") == 2L)
    assert(last.getAs[Double]("survival") == 0.0)
  }
}

class DwellTimesSpec extends SparkSpecBase {
  import spark.implicits._

  test("dwell is the capped gap to the next event of the SAME user, keyed to the leading type") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, 10L, "view", ts("2024-01-01 10:00:00")),
      (2L, 10L, "click", ts("2024-01-01 10:00:30")),   // view dwell = 30s
      (3L, 10L, "buy", ts("2024-01-01 12:00:00")),     // click gap 119.5min > cap: dropped
      (4L, 20L, "view", ts("2024-01-01 10:00:00")),
      (5L, 20L, "view", ts("2024-01-01 10:01:00"))     // view dwell = 60s
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = EventAnalytics.dwellTimes(ev, 30)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    // 'buy' and user 10's 'click' have no in-cap follower; user 20's last view neither
    assert(got.map(_._1).sorted == Seq("view"))
    val v = got.head
    assert(v._2 == 2L && v._3 == 45.0 && v._4 == 45.0) // mean and median of {30, 60}
  }
}

/** Hand-derived fixture for the frequent contiguous-sequence miner:
  * distinct-user support, the directed/unordered distinction, and the
  * lossless Apriori prune.
  */
class FrequentSequencesSpec extends SparkSpecBase {
  import spark.implicits._

  private def ev(u: Long, seq: String*): Seq[(Long, Long, java.sql.Timestamp, String)] =
    seq.zipWithIndex.map { case (t, i) =>
      (u * 100 + i, u, java.sql.Timestamp.valueOf(f"2024-01-01 00:${i}%02d:00"), t)
    }

  test("frequentSequences: distinct-user support, direction matters, loops vote once") {
    // u1: a b c   u2: a b c   u3: a b a b (loop: one vote for a>b)
    // u4: b a     -> a>b support 3, b>c 2, b>a 2 (u3 + u4), a>b>c 2
    val events = (ev(1, "a", "b", "c") ++ ev(2, "a", "b", "c") ++
      ev(3, "a", "b", "a", "b") ++ ev(4, "b", "a"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = EventAnalytics.frequentSequences(events, minShare = 0.5)
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(out("a>b") == (2, 3L))
    assert(out("b>c") == (2, 2L))
    assert(out("b>a") == (2, 2L)) // directed: b>a is NOT a>b
    assert(out("a>b>c") == (3, 2L))
    assert(!out.contains("b>a>b")) // support 1 (u3 only) < 2
    assert(out.size == 4)
  }

  test("frequentSequences: the Apriori prune is lossless vs the unpruned count") {
    // c>a occurs for u1 only -> infrequent at 50%; no trigram through it
    // can be frequent, and none is reported missing relative to brute force
    val events = (ev(1, "a", "b", "c", "a") ++ ev(2, "a", "b", "c") ++
      ev(3, "c", "b")).toDF("event_id", "user_id", "ts", "event_type")
    val out = EventAnalytics.frequentSequences(events, minShare = 0.6)
      .collect().map(_.getString(0)).toSet
    // support >= ceil(0.6*3) = 2: a>b (u1,u2), b>c (u1,u2), a>b>c (u1,u2)
    assert(out == Set("a>b", "b>c", "a>b>c"))
  }
}

/** Hand-derived absorbing-chain fixture for Markov removal-effect
  * attribution (exact on a DAG, so the fixed-iterate definition and
  * the closed form coincide).
  */
class MarkovAttributionSpec extends SparkSpecBase {
  import spark.implicits._

  test("markovAttribution: removal effects, shares and credit on a worked chain") {
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:${i}%02d:00")
    // u1: click view purchase | u2: click purchase | u3: view | u4: purchase
    // -> pNone = 0.75, eff(click) = 0.375, eff(view) = 0.25, nConv = 3
    val ev = Seq(
      (1L, 1L, "click", ts(1)), (1L, 2L, "view", ts(2)), (1L, 3L, "purchase", ts(3)),
      (2L, 4L, "click", ts(1)), (2L, 5L, "purchase", ts(2)),
      (3L, 6L, "view", ts(1)),
      (4L, 7L, "purchase", ts(1)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = EventAnalytics.markovAttribution(ev, "purchase")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("click", "view"))
    val c = out("click"); val v = out("view")
    assert(c.getAs[Double]("p_conv") == 0.75)
    assert(c.getAs[Long]("n_conversions") == 3L)
    assert(c.getAs[Double]("removal_effect") == 0.5)      // 0.375 / 0.75
    assert(v.getAs[Double]("removal_effect") == 0.333333) // 0.25  / 0.75
    assert(c.getAs[Double]("share") == 0.6 && v.getAs[Double]("share") == 0.4)
    assert(c.getAs[Double]("attributed") == 1.8)
    assert(v.getAs[Double]("attributed") == 1.2)
  }

  test("markovAttribution: no conversions gives NULL effects, zero credit base") {
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:${i}%02d:00")
    val ev = Seq((1L, 1L, "click", ts(1)), (2L, 2L, "view", ts(1)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = EventAnalytics.markovAttribution(ev, "purchase").collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("n_conversions") == 0L))
    assert(out.forall(_.getAs[Double]("p_conv") == 0.0))
    assert(out.forall(_.isNullAt(1))) // removal_effect undefined at p = 0
  }

  test("logRank: hand-derived two-group table with censoring") {
    // lifetimes: g1 users churn at t=10,20; g0 churns at t=10, one g0
    // user censored at the horizon (l=100 > maxDay-5).
    //   t=10: d=2 d1=1 n=4 n1=2 -> e1=1.0,    v=2*2*2*2/(16*3)=0.333333
    //   t=20: d=1 d1=1 n=2 n1=1 -> e1=0.5,    v=1/4 = 0.25
    //   t=100: censored only -> zero terms
    // O=2, E=1.5, V=0.583333
    def ev(u: Long, d: String, ty: String) =
      (u, java.sql.Timestamp.valueOf(s"$d 00:00:00"), ty)
    val df = Seq(
      ev(1, "1970-01-01", "purchase"), ev(1, "1970-01-11", "click"),
      ev(2, "1970-01-01", "purchase"), ev(2, "1970-01-21", "click"),
      ev(3, "1970-01-01", "click"), ev(3, "1970-01-11", "click"),
      ev(4, "1970-01-01", "click"), ev(4, "1970-04-11", "click"))
      .toDF("user_id", "ts", "event_type")
    val r = EventAnalytics.logRank(df).head()
    assert(r.getAs[Long]("users_1") == 2L && r.getAs[Long]("users_0") == 2L)
    assert(r.getAs[Long]("observed_1") == 2L)
    assert(r.getAs[Double]("expected_1") == 1.5)
    assert(r.getAs[Double]("variance") == 0.583333)
    def r6(v: Double) = java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    assert(r.getAs[Double]("z") == r6(0.5 / math.sqrt(0.583333)))
    assert(r.getAs[Double]("chi2") == r6(0.25 / 0.583333))
  }

  test("entropyRate: deterministic chains read zero; hand mixed case exact") {
    def ev(u: Long, i: Long, ty: String) =
      (u, i, new java.sql.Timestamp(i * 60000L), ty)
    // strict a->b->a->b alternation: next state fully determined
    val det = Seq(ev(1, 1, "a"), ev(1, 2, "b"), ev(1, 3, "a"),
      ev(1, 4, "b")).toDF("user_id", "event_id", "ts", "event_type")
    val d = EventAnalytics.entropyRate(det).head()
    assert(d.getAs[Double]("entropy_rate_nats") == 0.0)
    assert(d.getAs[Double]("perplexity") == 1.0)
    // cells ab:2 ba:1 aa:1 -> H = .5 ln 1.5 + 0 + .25 ln 3 = 0.477386
    val mix = Seq(ev(1, 1, "a"), ev(1, 2, "b"), ev(1, 3, "a"),
      ev(1, 4, "b"), ev(2, 1, "a"), ev(2, 2, "a"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val m = EventAnalytics.entropyRate(mix).head()
    assert(m.getAs[Long]("n_transitions") == 4L)
    assert(m.getAs[Long]("n_cells") == 3L)
    assert(m.getAs[Double]("entropy_rate_nats") == 0.477386)
  }

  test("bestSplit: a perfectly separating value wins with zero impurity") {
    val rows = (1 to 10).map(_ => (1.0, 0)) ++ (1 to 10).map(_ => (2.0, 1))
    val df = rows.toDF("x", "y")
    val r = graft.operators.Classifier.bestSplit(df, "x", col("y") === 1)
      .head()
    assert(r.getAs[Double]("split_value") == 1.0)
    assert(r.getAs[Long]("n_left") == 10L && r.getAs[Long]("n_right") == 10L)
    assert(r.getAs[Double]("gini_split") == 0.0)
    assert(r.getAs[Double]("gini_base") == 0.5)
    assert(r.getAs[Double]("gini_gain") == 0.5)
    // the candidate guard names the binning remedy
    val guard = intercept[IllegalArgumentException] {
      graft.operators.Classifier.bestSplit(df, "x", col("y") === 1,
        maxCandidates = 1L)
    }
    assert(guard.getMessage.contains("bin the feature"))
  }

  test("captureRecapture: Chapman estimate on a hand-built two-sighting split") {
    // span 0..10 -> mid 5. capture1 = {1,2,3}, capture2 = {3,4}, m = {3}
    // Chapman: (3+1)(2+1)/(1+1) - 1 = 5; Seber var = 4*3*2*1/(4*3) = 2
    def ev(u: Long, d: Int, ty: String) =
      (u, new java.sql.Timestamp(d * 86400000L), ty)
    val df = Seq(
      ev(1, 1, "purchase"), ev(2, 2, "purchase"), ev(3, 3, "purchase"),
      ev(3, 8, "purchase"), ev(4, 9, "purchase"),
      ev(5, 0, "click"), ev(6, 10, "click"))
      .toDF("user_id", "ts", "event_type")
    val r = EventAnalytics.captureRecapture(df,
      col("event_type") === "purchase").head()
    assert((r.getAs[Long]("n1"), r.getAs[Long]("n2"),
      r.getAs[Long]("m")) == ((3L, 2L, 1L)))
    assert(r.getAs[Double]("n_hat") == 5.0)
    def r6(v: Double) = java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    assert(r.getAs[Double]("se") == r6(math.sqrt(2.0)))
    // no overlap: the method has no information -> NULL estimates
    val disjoint = Seq(
      ev(1, 1, "purchase"), ev(2, 9, "purchase"),
      ev(5, 0, "click"), ev(6, 10, "click"))
      .toDF("user_id", "ts", "event_type")
    val z = EventAnalytics.captureRecapture(disjoint,
      col("event_type") === "purchase").head()
    assert(z.getAs[Long]("m") == 0L)
    assert(z.isNullAt(z.fieldIndex("n_hat")))
  }

  test("nelsonAalen: hand-derived cumulative hazard and Klein variance") {
    // lifetimes 10 (2 churn), 20 (1 churn), 100 (censored):
    //   H = 2/4, then +1/2 -> (0.5, 1.0, 1.0)
    //   V = 2/16, then +1/4 -> (0.125, 0.375, 0.375)
    def ev(u: Long, d: String) =
      (u, java.sql.Timestamp.valueOf(s"$d 00:00:00"), "click")
    val df = Seq(
      ev(1, "1970-01-01"), ev(1, "1970-01-11"),
      ev(2, "1970-01-01"), ev(2, "1970-01-11"),
      ev(3, "1970-01-01"), ev(3, "1970-01-21"),
      ev(4, "1970-01-01"), ev(4, "1970-04-11"))
      .toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.nelsonAalen(df).orderBy("t").collect()
    assert(out.map(_.getAs[Int]("t")).toSeq == Seq(10, 20, 100))
    assert(out.map(_.getAs[Long]("n_risk")).toSeq == Seq(4L, 2L, 1L))
    assert(out.map(_.getAs[Double]("cum_hazard")).toSeq ==
      Seq(0.5, 1.0, 1.0))
    assert(out.map(_.getAs[Double]("cum_hazard_var")).toSeq ==
      Seq(0.125, 0.375, 0.375))
    // survival sanity: exp(-H) tracks the KM curve's direction
    assert(math.exp(-1.0) < math.exp(-0.5))
  }

  test("botScore: metronome flagged, jittery human and short sessions not") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // bot: 25 events exactly 60 s apart -> gap variance 0 -> CV 0
    val bot = (0 until 25).map(i => (1L, i.toLong, ts(1000L + i * 60)))
    // human: 25 events with bursty bimodal gaps (10 s / 600 s, CV ~0.99)
    val human = (0 until 25).scanLeft((2L, 100L, 1000L)) { case ((u, id, t), i) =>
      (u, id + 1, t + (if (i % 2 == 0) 10 else 600))
    }.tail.map { case (u, id, t) => (u, id, ts(t)) }
    // regular but short: only 5 events -> below minEvents
    val short5 = (0 until 5).map(i => (3L, 200L + i, ts(5000L + i * 60)))
    val ev = (bot ++ human ++ short5)
      .toDF("user_id", "event_id", "ts")
      .withColumn("event_type", concat(lit("t"), $"event_id" % 3))
    val out = graft.operators.EventAnalytics.botScore(ev)
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out(1L).getAs[Double]("gap_cv") == 0.0)
    assert(out(1L).getAs[Boolean]("bot_flag"))
    assert(out(2L).getAs[Double]("gap_cv") > 0.5)
    assert(!out(2L).getAs[Boolean]("bot_flag"))
    assert(!out(3L).getAs[Boolean]("bot_flag")) // regular but < minEvents
    assert(out(1L).getAs[Double]("events_per_minute") == 1.041667) // 25/24min
  }

  test("missingnessPatterns: every observed pattern with exact shares") {
    val rows = Seq[(java.lang.Long, java.lang.Long, java.lang.Long)](
      (1L, 1L, 1L), (2L, null, 1L), (3L, null, null), (4L, 1L, 1L))
      .toDF("id", "a", "b")
    val out = graft.operators.Profile.missingnessPatterns(rows, Seq("a", "b"))
      .collect().map(r => r.getAs[String]("missing_cols") -> r).toMap
    assert(out("(complete)").getAs[Long]("n") == 2L)
    assert(out("a").getAs[Long]("n") == 1L)
    assert(out("a,b").getAs[Long]("n") == 1L)
    assert(out("(complete)").getAs[Double]("share") == 0.5)
    intercept[IllegalArgumentException] {
      graft.operators.Profile.missingnessPatterns(rows, (1 to 13).map(_ => "a"))
    }
  }

  test("logRank: no uncensored churn yields NULL z, never a crash") {
    // both users' last events sit inside the censor window
    def ev(u: Long, d: String, ty: String) =
      (u, java.sql.Timestamp.valueOf(s"$d 00:00:00"), ty)
    val df = Seq(
      ev(1, "1970-01-01", "purchase"), ev(1, "1970-01-05", "click"),
      ev(2, "1970-01-01", "click"), ev(2, "1970-01-06", "click"))
      .toDF("user_id", "ts", "event_type")
    val r = EventAnalytics.logRank(df).head()
    assert(r.getAs[Long]("observed_1") == 0L)
    assert(r.getAs[Double]("variance") == 0.0)
    assert(r.isNullAt(r.fieldIndex("z")))
    assert(r.isNullAt(r.fieldIndex("chi2")))
  }
}
