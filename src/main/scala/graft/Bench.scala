package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.windowExec.buffer.in.memory.threshold", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session before timing: JIT, codegen cache, FS metadata —
    // otherwise the alphabetically-first query absorbs ~8s of startup cost
    try {
      spark.range(1000).selectExpr("sum(id)").count()
      SparkEntry.queries.headOption.foreach(_._2(spark, sfDir).count())
    } catch { case _: Throwable => () }

    // optional comma-separated filter for local iteration
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    def measure(round: Int, name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // noop sink: materializes every output column (count() would let
      // Catalyst prune computed columns — windows/projections would be
      // optimized away and the bench would under-measure)
      val ok = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
          false
      }
      val secs = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] r$round $name%-24s $secs%8.2fs  ok=$ok")
      secs
    }

    // two interleaved rounds, per-query minimum: this host suffers episodic
    // hypervisor CPU-steal storms lasting ~1-2 min (measured via /proc/stat)
    // that inflate whatever runs inside them 10-40x; interleaving means a
    // storm covering round 1's tail is hedged by round 2's clean measurement.
    // Round 2 stops once the wall budget is spent so the driver's timeout is
    // never at risk — remaining queries keep their round-1 numbers.
    val budget = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "300").toInt
    val tStart = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - tStart) / 1e9
    val r1 = selected.map { case (n, fn) => n -> measure(1, n, fn) }
    val r2 = selected.map { case (n, fn) =>
      n -> (if (elapsed < budget) Some(measure(2, n, fn)) else None)
    }
    val results = r1.zip(r2).map { case ((n, a), (_, b)) =>
      n -> math.min(a, b.getOrElse(a))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // print + flush BEFORE teardown: stdout is fully buffered when
    // redirected, and a hung shutdown would otherwise take the JSON with it
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    System.out.flush()
    // streaming state-store maintenance can make spark.stop() crawl for
    // minutes; stop streams explicitly and bound the shutdown with a watchdog
    spark.streams.active.foreach(q => try q.stop() catch { case _: Throwable => () })
    val watchdog = new Thread(() => {
      Thread.sleep(30000); Runtime.getRuntime.halt(0)
    })
    watchdog.setDaemon(true)
    watchdog.start()
    spark.stop()
  }
}
