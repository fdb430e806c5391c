package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SparkSessionExtensions hook registering every graft native kernel as a
  * SQL function — `spark.sql.extensions=graft.plans.GraftExtensions`, or
  * programmatic registration via `GraftExtensions.functions`.
  *
  * Scalar-config arguments (salt, k, n, w) are taken as integer literals
  * at call sites: e.g. `winnow(norm_text(text), 8, 4)`,
  * `md5_prefix32(s, 7)`, `minhash_shingles(norm_text(text), 8, 3)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def fn(name: String, clazz: Class[_],
                 builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder)

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    fn("project_to_line", classOf[ProjectToLine],
      c => ProjectToLine(c(0), c(1))),
    fn("cosine_sim", classOf[CosineSim], c => CosineSim(c(0), c(1))),
    fn("norm_text", classOf[NormText], c => NormText(c(0))),
    fn("count_in_vocab", classOf[CountInVocab], c =>
      CountInVocab(c(0), c.drop(1).map {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
        case other => throw new IllegalArgumentException(
          s"count_in_vocab vocab must be string literals, got $other")
      })),
    fn("simhash16", classOf[SimHash16], c => SimHash16(c(0))),
    fn("simhash64", classOf[SimHash64], c => SimHash64(c(0))),
    fn("minhash_shingles", classOf[MinHashShingles], c =>
      MinHashShingles(c(0), intLit(c(1), "k"), intLit(c(2), "n"))),
    fn("winnow", classOf[WinnowFingerprints], c =>
      WinnowFingerprints(c(0), intLit(c(1), "k"), intLit(c(2), "w"))),
    fn("md5_prefix32", classOf[Md5Prefix32], c =>
      Md5Prefix32(c(0), s"${intLit(c(1), "salt")}:")),
    fn("md5_prefix16", classOf[Md5Prefix16], c => Md5Prefix16(c(0))),
    fn("sec_to_time", classOf[SecToTime], c => SecToTime(c(0))),
    fn("time_to_sec", classOf[TimeToSec], c => TimeToSec(c(0))),
    fn("point_in_polygon", classOf[PointInPolygon], c =>
      PointInPolygon(c(0), c(1), c(2))))

  /** Register all kernels into a live session (the spec-time equivalent of
    * the spark.sql.extensions config path).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
