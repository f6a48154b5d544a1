package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Salting

/** Salted join equals the plain join, row for row. */
class SaltingSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  test("salted join matches unsalted join results") {
    val dir = TestSpark.sfDir
    val lineitem = Tables.load(spark, dir, "lineitem")
      .withColumnRenamed("l_orderkey", "okey")
    val orders = Tables.load(spark, dir, "orders")
      .withColumnRenamed("o_orderkey", "okey")

    val plain = lineitem.join(orders, Seq("okey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"),
        sum("l_quantity").as("q"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

    val salted = Salting.saltedJoin(lineitem, orders, "okey",
        salts = 8, saltBy = concat(col("okey"), lit("_"), col("l_linenumber")))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"),
        sum("l_quantity").as("q"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

    assert(plain.keySet == salted.keySet)
    plain.foreach { case (k, (n, q)) =>
      assert(salted(k)._1 == n, s"count mismatch for $k")
      assert(math.abs(salted(k)._2 - q) < 1e-6, s"sum mismatch for $k")
    }
  }
}
