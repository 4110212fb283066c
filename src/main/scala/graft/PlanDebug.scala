package graft
import org.apache.spark.sql.SparkSession
object PlanDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.tables.Tables.register(spark, "/root/testdata/sf0.1")
    def time(name: String, sql: String): Unit = {
      spark.sql(sql).write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        spark.sql(sql).write.format("noop").mode("overwrite").save()
        (System.nanoTime()-t0)/1e9
      }.sorted
      println(f"$name%-12s ${ts(1)}%.3f s")
    }
    time("base", "SELECT o_orderkey FROM orders ORDER BY o_orderkey")
    time("td", "SELECT o_orderkey, try_divide(o_totalprice, o_orderkey % 3) AS td FROM orders ORDER BY o_orderkey")
    time("tc", "SELECT o_orderkey, try_cast(CASE WHEN o_orderkey % 2 = 0 THEN substr(CAST(o_orderkey AS STRING), 1, 3) ELSE substr(o_orderpriority, 3, 3) END AS INT) AS tc FROM orders ORDER BY o_orderkey")
    time("te", "SELECT o_orderkey, try_element_at(array(o_orderkey), CAST(1 + o_orderkey % 3 AS INT)) AS te FROM orders ORDER BY o_orderkey")
    time("te_alone", "SELECT try_element_at(array(o_orderkey), CAST(1 + o_orderkey % 3 AS INT)) AS te FROM orders")
    spark.stop()
  }
}
