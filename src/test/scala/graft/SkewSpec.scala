package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew
import graft.sources.Timeseries

class SkewSpec extends AnyFunSuite {
  import SparkTestSession._

  test("salted join returns exactly the plain join's rows") {
    val li = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables(spark, sf, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val plain = li.join(o, Seq("l_orderkey"), "inner")
    val salted = Skew.saltedJoin(li, o, Seq("l_orderkey"), 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("aux assembly round-trips a long-format aux frame") {
    import spark.implicits._
    val long = Seq(
      (1, 2, 3, 4, 730000, 100.0f, 5, 180, 0.5f, 2.0f, 1),
      (1, 2, 3, 4, 730010, 100.0f, 5, 180, 0.5f, 2.0f, 1),
      (1, 2, 9, 9, 730000, 50.0f, 2, 90, 0.1f, 1.0f, 0))
      .toDF("cx", "cy", "px", "py", "date", "dem", "trends", "aspect",
        "posidex", "slope", "mpw")
    val aux = Timeseries.assembleAux(long)
    assert(aux.count() == 2)
    val row = aux.filter(col("px") === 3).head()
    assert(row.dates == Seq(730010, 730000), "dates descending")
    assert(row.trends == Seq(5, 5))
    assert(row.dem.get == Seq(100.0f, 100.0f))
  }
}
