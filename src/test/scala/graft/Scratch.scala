package graft
/** Throwaway scratch main for interactive probes. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    import graft.operators.DataSkipping

    val lin = DataSkipping.ensureLinear(spark, dir)
    val (f1, t1, d1) = DataSkipping.prunedRangeRead(spark, lin,
      "custkey", 100L, 220L)
    println(s"LIN custkey[100,220]: files $f1/$t1 rows ${d1.count()}")
    val (f2, t2, d2) = DataSkipping.prunedRangeRead(spark, lin,
      "orderdate", java.sql.Date.valueOf("1995-01-01"),
      java.sql.Date.valueOf("1995-03-31"))
    println(s"LIN date[95Q1]: files $f2/$t2 rows ${d2.count()}")

    val z = DataSkipping.ensureZorder(spark, dir)
    val (f3, t3, d3) = DataSkipping.prunedRangeRead(spark, z,
      "orderdate", java.sql.Date.valueOf("1995-01-01"),
      java.sql.Date.valueOf("1995-03-31"))
    println(s"Z date[95Q1]: files $f3/$t3 rows ${d3.count()}")
    val (f4, t4, d4) = DataSkipping.prunedRangeRead(spark, z,
      "custkey", 100L, 220L)
    println(s"Z custkey[100,220]: files $f4/$t4 rows ${d4.count()}")

    val (f5, t5, d5) = DataSkipping.prunedBloomRead(spark, lin,
      Seq(1L, 7L, 32L, 321L, 888L, 1203L, 1497L))
    println(s"BLOOM 7 keys: files $f5/$t5 rows ${d5.count()}")
    d5.show(10, false)
    spark.stop()
  }
}
