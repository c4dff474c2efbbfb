package graft

import org.apache.spark.sql.functions._
import graft.catalyst.StatFunctions

/** Native stat expressions: interpreted + codegen paths agree with the
  * Dist kernels, and SQL registration via GraftExtensions works. */
class CatalystSpec extends SparkSpec {
  import spark.implicits._

  test("native expressions match Dist and survive codegen") {
    val df = Seq((1.96, 3.8414588206941245, 2.2281388519862735, 0.5, 12L))
      .toDF("z", "chi", "t", "r", "n")
    val row = df.select(
      StatFunctions.pnorm(col("z")).as("p1"),
      StatFunctions.chisqTail(col("chi"), lit(1.0)).as("p2"),
      StatFunctions.tTail2(col("t"), lit(10.0)).as("p3"),
      StatFunctions.corrPValue(col("r"), col("n")).as("p4")).head()
    assert(math.abs(row.getDouble(0) - 0.9750021048517795) < 1e-9)
    assert(math.abs(row.getDouble(1) - 0.05) < 1e-9)
    assert(math.abs(row.getDouble(2) - 0.05) < 1e-9)
    assert(math.abs(row.getDouble(3) -
      graft.stats.Dist.corrPValue(0.5, 12)) < 1e-12)
    // nulls propagate
    val n = Seq((Option.empty[Double], 1.0)).toDF("x", "df")
      .select(StatFunctions.chisqTail(col("x"), col("df"))).head()
    assert(n.isNullAt(0))
  }

  test("GraftExtensions.register exposes the SQL functions") {
    graft.catalyst.GraftExtensions.register(spark)
    val v = spark.sql(
      "SELECT graft_pnorm(1.96) AS p, graft_corr_p(0.5, 12L) AS cp, " +
        "graft_chisq_tail(3.841458820694124, 1) AS ct, " +
        "graft_t_tail2(2.2281388519862735, 10) AS tt").head()
    assert(math.abs(v.getDouble(0) - 0.9750021048517795) < 1e-9)
    assert(v.getDouble(1) > 0 && v.getDouble(1) < 1)
    assert(math.abs(v.getDouble(2) - 0.05) < 1e-9)
    assert(math.abs(v.getDouble(3) - 0.05) < 1e-9)
  }
}
