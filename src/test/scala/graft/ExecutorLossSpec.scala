package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.sys.process._

/** Drives [[graft.Chaos]] — the executor-loss resilience harness — as
  * a SEPARATE driver JVM running local-cluster[2,1,1024] (two real
  * executor processes). A subprocess because a local-cluster context
  * cannot coexist with the suite's shared local[4] context in one JVM.
  *
  * What this proves that no local[n] test can: task closures, custom
  * expressions and checkpoint blocks actually SERIALIZE across a JVM
  * boundary, the scheduler survives SIGKILLed executors, and
  * `Stabilize`'s reliable-checkpoint mode recovers where
  * localCheckpoint (by contract) cannot.
  */
class ExecutorLossSpec extends AnyFunSuite {

  /** Launch graft.Chaos in its own JVM with the given phase list;
    * returns (exit code, combined output).
    */
  private def runChaos(phases: String): (Int, String) = {
    val classesDir = new java.io.File("target/scala-2.13/classes")
    assert(classesDir.isDirectory, "compiled classes expected")
    // Same JDK17 module options sbt's forked JVMs use (build.sbt).
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq("java") ++ addOpens ++ Seq(
      "-Xmx2g",
      "-Dspark.ui.enabled=false",
      "-cp", s"${classesDir.getAbsolutePath}:/opt/spark/jars/*",
      "graft.Chaos", phases)
    // stdout and stderr are pumped by two concurrent threads;
    // StringBuilder is not thread-safe and unsynchronized appends have
    // been observed to DROP whole lines (a stdout marker lost inside a
    // noisy executor-stderr burst — the fetch_failed_observed flake).
    val out = new StringBuilder
    val logger = ProcessLogger(
      line => out.synchronized { out.append(line).append('\n'): Unit },
      line => out.synchronized { out.append(line).append('\n'): Unit })
    // SPARK_HOME lets the in-process standalone Worker launch executor
    // JVMs; SPARK_SCALA_VERSION is what bin/load-spark-env.sh would
    // set — without it the launcher's executor-command builder falls
    // back to dev-build directory detection and fails.
    val rc = Process(cmd, new java.io.File("."),
      "SPARK_HOME" -> "/opt/spark",
      "SPARK_SCALA_VERSION" -> "2.13").!(logger)
    (rc, out.toString)
  }

  test("executor SIGKILL: between-jobs recovery, mid-shuffle FetchFailed " +
      "resubmission, and mid-microbatch streaming exactly-once all hold") {
    val (rc, text) = runChaos("recovery,fetch,stream")
    def marker(k: String): Boolean = text.contains(s"$k=true")
    withClue(text.linesIterator.filter(_.contains("=")).mkString("\n")) {
      assert(marker("plain_recovered"), "plain recompute must survive executor loss")
      assert(marker("local_ckpt_ok_before"))
      assert(marker("local_ckpt_failed_after_loss"),
        "localCheckpoint blocks must die with their executors (Stabilize's documented trade)")
      assert(marker("reliable_ok_before"))
      assert(marker("reliable_recovered"),
        "reliable-checkpoint mode must recover after every executor died")
      // mid-job loss: shuffle map outputs die with their executor,
      // FetchFailed surfaces, the DAGScheduler resubmits the map stage
      assert(marker("fetch_failed_observed"),
        "the mid-stage kill must actually surface a FetchFailed/stage re-attempt")
      assert(marker("fetch_failed_recovered"),
        "the two-stage job must still answer after losing registered map outputs")
      // mid-microbatch loss + checkpoint restart: the RocksDB-backed
      // streaming aggregate must converge to the batch oracle
      assert(marker("stream_rocksdb"),
        "streaming phase must actually run on the RocksDB state store")
      assert(marker("stream_killed_midway"),
        "the executor kill must land while microbatches were still flowing")
      assert(marker("stream_recovered"),
        "streaming sink must converge to the batch oracle through kill + restart")
      assert(rc == 0, s"chaos harness exited $rc")
    }
  }

  test("executor SIGKILL mid-narrowing: the quantile loop's DISK_ONLY " +
      "hot subset recomputes from lineage and the median stays exact") {
    val (rc, text) = runChaos("quantile")
    def marker(k: String): Boolean = text.contains(s"$k=true")
    withClue(text.linesIterator.filter(_.contains("=")).mkString("\n")) {
      assert(marker("quantile_nokill_exact"),
        "the no-kill narrowing median must hit the closed form")
      assert(marker("quantile_kill_observed"),
        "the SIGKILL must land while narrowing passes were still running")
      assert(marker("quantile_recovered_after_kill"),
        "the killed run must equal the no-kill run bit-for-bit " +
          "(persisted hot-subset blocks recompute from lineage)")
      assert(rc == 0, s"chaos harness exited $rc")
    }
  }

  test("DRIVER crash-halt mid-stream: a fresh driver JVM resumes the " +
      "RocksDB-changelog checkpoint exactly-once") {
    // Leg A: executor killed mid-flight, then the DRIVER JVM is
    // Runtime.halt'ed with batches still pending — no shutdown hooks,
    // no stop(), nothing but the checkpoint survives. rc is 0 by
    // construction (halt(0)); the marker proves the halt path ran.
    val (rcA, textA) = runChaos("streamA")
    withClue(textA.linesIterator.filter(_.contains("=")).mkString("\n")) {
      assert(textA.contains("streamA_halted=true"),
        "leg A must crash-halt mid-stream")
      assert(rcA == 0)
    }
    // Leg B: a brand-new JVM (fresh standalone master, fresh executor
    // JVMs) resumes from the crashed driver's checkpoint, absorbs the
    // uncommitted tail, drains the backlog plus 4 new files, and must
    // land exactly the batch-oracle totals.
    val (rcB, textB) = runChaos("streamB")
    withClue(textB.linesIterator.filter(_.contains("=")).mkString("\n")) {
      assert(textB.contains("stream_driver_restart_recovered=true"),
        "fresh driver must resume the checkpoint exactly-once")
      assert(rcB == 0, s"leg B exited $rcB")
    }
  }
}
