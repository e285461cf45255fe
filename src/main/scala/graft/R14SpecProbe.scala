package graft
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerSpeculativeTaskSubmitted, SparkListenerTaskStart}
import org.apache.spark.sql.SparkSession

/** Measures what "forced speculation" can actually observe on ONE
  * machine: an 8-task stage with a deliberate 5 s straggler under the
  * most aggressive speculation settings Spark has. Finding (r14,
  * INFO-log verified): the straggler IS marked speculatable
  * ("Marking task 7 ... as speculatable because it ran more than
  * 548.0 ms"), but zero speculative copies launch — a copy may only
  * run on a host with no running attempt of the task
  * (TaskSetManager.dequeueSpeculativeTask), and every local-cluster
  * executor shares localhost. Hence [[R14Determinism]]'s speculation
  * pass asserts the MARKED count (scheduler engagement), not
  * launches. Run via:
  *   SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *     tools/runmain.sh graft.R14SpecProbe
  *
  * Dev/measurement probe — not part of the library surface.
  */
object R14SpecProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master("local-cluster[2,4,1024]")
      .appName("spec-probe")
      .config("spark.executor.extraClassPath",
        "/root/repo/target/scala-2.13/classes")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.speculation", "true")
      .config("spark.speculation.interval", "20ms")
      .config("spark.speculation.multiplier", "1.0")
      .config("spark.speculation.quantile", "0.0")
      .config("spark.speculation.minTaskRuntime", "0ms")
      .config("spark.speculation.efficiency.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("INFO")
    val launched = new AtomicLong(0)
    val marked = new AtomicLong(0)
    s.sparkContext.addSparkListener(new SparkListener {
      override def onTaskStart(e: SparkListenerTaskStart): Unit =
        if (e.taskInfo.speculative) launched.incrementAndGet()
      override def onSpeculativeTaskSubmitted(
          e: SparkListenerSpeculativeTaskSubmitted): Unit =
        marked.incrementAndGet()
    })
    // 8 tasks: partition 7 sleeps 5s, the rest 100ms -> a clear straggler
    val r = s.sparkContext.parallelize(0 until 8, 8).map { i =>
      Thread.sleep(if (i == 7) 5000 else 100); i
    }.collect().sum
    Thread.sleep(1000)
    println(s"RESULT sum=$r marked=${marked.get()} launched=${launched.get()}")
    s.stop()
  }
}
