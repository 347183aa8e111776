package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BpeTokenCount64, Hash64, JaccardShingles1000, LangId, LshBandKeys, SimHash64}

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions as SQL functions. Activate per session with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (or the
  * equivalent spark-submit conf) — the supported extension route, no
  * internal registry access.
  *
  * SQL surface: graft_simhash64(str), graft_hash64(str),
  * graft_bpe_token_count(str), graft_lang_id(str).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftExtensions.register(ext)
}

object GraftExtensions {

  private def one(name: String)(build: Expression => Expression)
  : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$name expects exactly one argument")
        build(args.head)
      })

  private def two(name: String)(build: (Expression, Expression) => Expression)
  : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"$name expects exactly two arguments")
        build(args.head, args(1))
      })

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    one("graft_simhash64")(SimHash64),
    one("graft_hash64")(Hash64),
    one("graft_bpe_token_count")(BpeTokenCount64),
    one("graft_lang_id")(LangId),
    one("graft_lsh_band_keys")(LshBandKeys(_, 3, 64, 16)),
    two("graft_jaccard_shingles")(JaccardShingles1000(_, _, 3)))

  def register(ext: SparkSessionExtensions): Unit = functions.foreach(ext.injectFunction)
}
