package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for graft's custom expressions.
  *
  * Use [[GraftFunctions.registerAll]] on a live session, or ship the
  * library with `spark.sql.extensions=graft.functions.GraftExtensions`
  * so every session on the cluster gets the functions at startup.
  */
object GraftFunctions {

  /** name -> (builder, usage) for every graft SQL function. */
  val all: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("get_row_hash", (e: Seq[Expression]) => CanonicalRowHash(e.head),
      "get_row_hash(expr) - canonical order/type-insensitive row hash (xxh64 hex)"),
    ("cosine_sim", (e: Seq[Expression]) => CosineSim(e.head, e(1)),
      "cosine_sim(a, b) - cosine similarity of two float/double arrays"),
    ("dot_product", (e: Seq[Expression]) => DotProduct(e.head, e(1)),
      "dot_product(a, b) - left-fold dot product of two numeric arrays"),
    ("array_jaccard_sim", (e: Seq[Expression]) => ArrayJaccardSim(e.head, e(1)),
      "array_jaccard_sim(a, b) - set Jaccard similarity of two string arrays"),
    ("sorted_jaccard_sim", (e: Seq[Expression]) => SortedJaccardSim(e.head, e(1)),
      "sorted_jaccard_sim(a, b) - merge-scan Jaccard of sorted distinct arrays"),
    ("token_set", (e: Seq[Expression]) => TokenSet(e.head),
      "token_set(text) - sorted distinct lowercase word tokens"),
    ("token_array", (e: Seq[Expression]) => TokenArray(e.head),
      "token_array(text) - ordered lowercase word tokens"),
    ("word_shingles", (e: Seq[Expression]) =>
        WordShingles(e.head, e(1).eval().asInstanceOf[Int]),
      "word_shingles(text, n) - sorted distinct word n-gram shingles"),
    ("minhash_signature", (e: Seq[Expression]) =>
        MinHashSignature(e.head, e(1).eval().asInstanceOf[Int]),
      "minhash_signature(arr, numPerm) - MinHash signature of a string array"),
    ("simhash64", (e: Seq[Expression]) => SimHash64(e.head),
      "simhash64(arr) - 64-bit SimHash of a string array"),
    ("sorted_containment_sim", (e: Seq[Expression]) => SortedContainmentSim(e.head, e(1)),
      "sorted_containment_sim(a, b) - |a ∩ b| / |a| of sorted distinct arrays"))

  /** Register every function on a live session (temp functions). */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, builder, _) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}

/** `spark.sql.extensions` entry point: injects all graft functions into
  * every session built with this extension.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder, usage) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name, usage), builder))
    }
}
