package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = BenchHarness.executeFully(SparkEntry.queries(args(0))(spark, dir))
      println(s"RUN$i ${args(0)} rows=$n secs=${(System.nanoTime()-t0)/1e9}")
    }
    spark.stop()
  }
}
