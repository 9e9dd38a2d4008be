package graft

import graft.functions.CanonicalHash.canonicalString
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-form statements of the invariants the reference encodes as
  * examples (reference: test/data_drift_test.py:374-437): hash stability
  * under object key order, array order, and scalar-to-string collapse.
  * (Plain ScalaCheck generators driven by a deterministic seed; the
  * scalatest-scalacheck bridge is not on the offline classpath.)
  */
class HashPropertiesSpec extends AnyFunSuite {

  private def forAllGen[T](gen: Gen[T], n: Int = 200)(check: T => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(check)
      seed = seed.next
      i += 1
    }
  }

  private val keyGen = Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(8))
  private val objGen: Gen[List[(String, Long)]] =
    Gen.nonEmptyListOf(Gen.zip(keyGen, Gen.choose(-1000000L, 1000000L)))
      .map(_.distinctBy(_._1))

  private def renderObj(fields: List[(String, Long)]): String =
    fields.map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")

  private val rnd = new scala.util.Random(7)

  test("object hash is invariant under key permutation") {
    forAllGen(objGen) { fields =>
      val shuffled = rnd.shuffle(fields)
      assert(canonicalString(renderObj(fields)) == canonicalString(renderObj(shuffled)))
    }
  }

  test("array hash is invariant under element permutation") {
    forAllGen(Gen.nonEmptyListOf(Gen.choose(-1000L, 1000L))) { xs =>
      val shuffled = rnd.shuffle(xs)
      assert(canonicalString(xs.mkString("[", ",", "]")) ==
        canonicalString(shuffled.mkString("[", ",", "]")))
    }
  }

  test("numeric values hash equal to their Python string forms") {
    forAllGen(Gen.choose(-1000000L, 1000000L)) { v =>
      assert(canonicalString(s"""{"a": $v}""") == canonicalString(s"""{"a": "$v"}"""))
    }
  }

  test("distinct single-key objects collide only when values collide") {
    forAllGen(Gen.zip(Gen.choose(0L, 100000L), Gen.choose(0L, 100000L))) { case (a, b) =>
      val ha = canonicalString(s"""{"k": $a}""")
      val hb = canonicalString(s"""{"k": $b}""")
      assert((ha == hb) == (a == b))
    }
  }

  test("JSON-string-encoded vs native nested objects agree") {
    forAllGen(objGen) { fields =>
      val inner = renderObj(fields)
      val quoted = inner.replace("\\", "\\\\").replace("\"", "\\\"")
      assert(canonicalString(s"""{"outer": $inner}""") ==
        canonicalString(s"""{"outer": "$quoted"}"""))
    }
  }

  test("unicode keys and values sort by code point consistently") {
    forAllGen(Gen.listOfN(3, Gen.oneOf("é", "z", "Z", "1", "中", "a"))) { ks =>
      val fields = ks.distinct.zipWithIndex.map { case (k, i) => (k, i.toLong) }
      if (fields.nonEmpty) {
        val shuffled = rnd.shuffle(fields)
        assert(canonicalString(renderObj(fields)) == canonicalString(renderObj(shuffled)))
      }
    }
  }
}

/** The zero-allocation double writer must render byte-identically to
  * PyFormat.pyDouble for every double (verified over uniform bit patterns,
  * magnitudes across the exponent range, and the known edge cases).
  */
class PyDoubleWriterSpec extends AnyFunSuite {

  private def viaBuffer(d: Double): String = {
    // drive the buffer path through the public hash: hash a 1-field struct
    // both ways and compare full hashes (covers escaping + assembly too)
    graft.functions.CanonicalHash.canonicalSpark(
      org.apache.spark.sql.catalyst.InternalRow(d),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.DoubleType))))
  }

  private def viaString(d: Double): String =
    graft.functions.CanonicalHash.xxh64Hex(
      s"""{"a":"${graft.functions.PyFormat.pyDouble(d)}"}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private val rnd = new scala.util.Random(11L)

  test("buffer double writer matches pyDouble on random bit patterns") {
    (0 until 20000).foreach { _ =>
      val d = java.lang.Double.longBitsToDouble(rnd.nextLong())
      if (!d.isNaN || true) assert(viaBuffer(d) == viaString(d), s"bits of $d")
    }
  }

  test("buffer double writer matches pyDouble across magnitudes") {
    (-320 to 320).foreach { e =>
      val base = math.pow(10.0, e)
      Seq(1.0, 1.5, 2.25, 9.999999, 1.0000001, 7.3).foreach { m =>
        val d = m * base
        assert(viaBuffer(d) == viaString(d), s"$m * 10^$e")
        assert(viaBuffer(-d) == viaString(-d), s"-$m * 10^$e")
      }
    }
  }

  test("buffer double writer edge cases") {
    Seq(0.0, -0.0, Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      Double.MinPositiveValue, Double.MaxValue, Double.MinValue,
      1e16, 1e15, 9.999999999999998e15, 1e-4, 1e-5, 0.1, 100.0, 123456789.123,
      1.0, -1.0, 2.5e-10, 3.14159e300).foreach { d =>
      assert(viaBuffer(d) == viaString(d), s"edge $d")
    }
  }
}
