package graft.tools

object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("entry-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n")
    spark.stop()
  }
}
