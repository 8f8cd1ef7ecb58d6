package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** SparkSessionExtensions entry point: registers the graft native
  * expressions as SQL functions, so `spark.sql("... vec_dot(a, b)")`
  * works next to the Column API.
  *
  * Enable with:
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"), VecDot.info,
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, "vec_dot(a, b) takes 2 arguments")
        VecDot(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_norm_sq"), VecNormSq.info,
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 1, "vec_norm_sq(a) takes 1 argument")
        VecNormSq(args(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("token_shingles"), TokenShingles.info,
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, "token_shingles(tokens, n) takes 2 arguments")
        val n = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"token_shingles width must be an integer literal, got $other")
        }
        TokenShingles(args(0), n)
      }))
  }
}
