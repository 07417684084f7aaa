package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev measurement utility (optimization guide §1): decompose a named
  * gate's wall time into Spark jobs / stages / tasks / shuffle bytes so
  * optimization targets the real cost, not a guess.  Runs each named
  * gate once for warmup, then `SPARK_GRAFT_BENCH_RUNS` (default 3)
  * timed repetitions under the SAME session shape as [[Bench]]
  * (local[$SPARK_GRAFT_CPUS], shuffle.partitions = cpus, AQE on), and
  * prints per-gate: median wall seconds, jobs, stages, tasks, summed
  * executor task time, shuffle read/write bytes, and the slowest
  * stages by executor-time share.  Never used by the driver — a
  * diagnostic twin of Bench, not a replacement.
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = GraftSession.withHive(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { t =>
      try Tables.load(spark, sfDir, t).limit(1).count()
      catch { case _: Throwable => }
    }
    final case class StageAgg(var name: String = "", var tasks: Int = 0,
      var execMs: Long = 0L, var shufReadB: Long = 0L, var shufWriteB: Long = 0L,
      var wallMs: Long = 0L, var gcMs: Long = 0L)
    val stages = mutable.Map.empty[Int, StageAgg]
    var jobs = 0
    // one monitor (stages) for BOTH the listener-bus writes and the
    // main thread's clear/aggregate reads — `this.synchronized` in the
    // overrides vs `stages.synchronized` in main was two different
    // locks, i.e. no mutual exclusion at all (r16 ADVICE)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        stages.synchronized { jobs += 1 }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = stages.synchronized {
        val a = stages.getOrElseUpdate(te.stageId, StageAgg())
        a.tasks += 1
        val m = te.taskMetrics
        if (m != null) {
          a.execMs += m.executorRunTime
          a.gcMs += m.jvmGCTime
          a.shufReadB += m.shuffleReadMetrics.totalBytesRead
          a.shufWriteB += m.shuffleWriteMetrics.bytesWritten
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages.synchronized {
          val i = sc.stageInfo
          val a = stages.getOrElseUpdate(i.stageId, StageAgg())
          a.name = i.name.linesIterator.nextOption().getOrElse("").take(90)
          a.wallMs += (for (s <- i.submissionTime; c <- i.completionTime)
            yield c - s).getOrElse(0L)
        }
    }
    spark.sparkContext.addSparkListener(listener)
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      try fn(spark, sfDir).count() catch { case e: Throwable =>
        println(s"== $name WARMUP ERR ${e.getMessage.take(200)}"); }
      // settle listener events from warmup, then reset counters
      Thread.sleep(400)
      stages.synchronized { stages.clear(); jobs = 0 }
      val walls = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      Thread.sleep(400)
      val med = walls.sorted.apply(walls.size / 2)
      val (nst, ntk, exec, gc, sr, sw) = stages.synchronized {
        (stages.size, stages.values.map(_.tasks).sum,
          stages.values.map(_.execMs).sum,
          stages.values.map(_.gcMs).sum,
          stages.values.map(_.shufReadB).sum,
          stages.values.map(_.shufWriteB).sum)
      }
      println(f"== $name%-28s wall=${med}%7.3fs (all=${walls.map(w => f"$w%.2f").mkString(",")})" +
        f" jobs=${jobs / runs}%3d stages=${nst / runs}%4d tasks=${ntk / runs}%5d" +
        f" execTime=${exec / 1e3 / runs}%7.2fs gc=${gc / 1e3 / runs}%6.2fs shufR=${sr / 1e6 / runs}%8.2fMB shufW=${sw / 1e6 / runs}%8.2fMB")
      val top = stages.synchronized {
        stages.toSeq.sortBy(-_._2.execMs).take(8)
      }
      top.foreach { case (id, a) =>
        println(f"     stage $id%5d exec=${a.execMs / 1e3}%7.2fs wall=${a.wallMs / 1e3}%7.2fs tasks=${a.tasks}%4d " +
          f"shufR=${a.shufReadB / 1e6}%7.2fMB shufW=${a.shufWriteB / 1e6}%7.2fMB  ${a.name}")
      }
    }
    spark.stop()
  }
}
