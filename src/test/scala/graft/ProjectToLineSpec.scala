package graft

import org.apache.spark.sql.functions._
import graft.plans.ProjectToLine
import graft.extract.GeoKernels

/** The native Catalyst expression vs the pure kernel, plus SQL
  * registration through GraftExtensions.
  */
class ProjectToLineSpec extends SparkTestBase {
  import spark.implicits._

  private val line = Seq(Seq(0.0, 0.0), Seq(1.0, 0.0), Seq(1.0, 1.0))

  test("expression matches the pure kernel (eval + codegen paths)") {
    val pts = Seq(Seq(0.5, 0.1), Seq(1.2, 0.5), Seq(-0.5, 0.0))
    val got = pts.map(p => (p, line)).toDF("p", "l")
      .select(ProjectToLine.projectToLine(col("p"), col("l")).as("r"))
      .select("r.frac_idx", "r.dist_m").as[(Double, Double)].collect()
    pts.zip(got).foreach { case (p, (fi, d)) =>
      val (wantFi, wantD) = GeoKernels.projectPointToLine(
        (p(0), p(1)), line.map(c => (c(0), c(1))).toIndexedSeq)
      assert(fi == wantFi, s"frac_idx for $p")
      assert(d == wantD, s"dist for $p")
    }
  }

  test("null inputs yield null") {
    val r = Seq((Option.empty[Seq[Double]], Option(line))).toDF("p", "l")
      .select(ProjectToLine.projectToLine(col("p"), col("l")).as("r"))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("registers as a SQL function via SparkSessionExtensions") {
    // register directly on the live session's registry (GraftExtensions
    // does exactly this at session build time via injectFunction)
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("project_to_line"),
      new ExpressionInfo(classOf[ProjectToLine].getName, "project_to_line"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ProjectToLine(children(0), children(1)))
    val r = spark.sql(
      "SELECT project_to_line(array(0.5D, 0.0D), " +
        "array(array(0.0D, 0.0D), array(1.0D, 0.0D))).frac_idx AS fi")
      .as[Double].head()
    assert(r == 0.5)
  }
}
