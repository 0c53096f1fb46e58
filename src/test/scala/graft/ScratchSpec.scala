package graft

import org.apache.spark.sql.functions._

/** Scratch lifetime guard (VERDICT r14 item 5): `dir(tag)` hands out
  * generation-numbered paths, deleting only the PREVIOUS generation —
  * so two interleaved invocations of the same gate can never silently
  * cross-read each other's artifacts. The dangerous order (hold a lazy
  * plan over generation N, re-invoke the gate, then execute the stale
  * plan) fails loudly on missing files instead of returning generation
  * N+1's data under generation N's plan.
  */
class ScratchSpec extends SparkSpec {
  import spark.implicits._

  test("dir(tag) returns a fresh path per call and keeps one generation on disk") {
    val d1 = Scratch.dir("spec_gen")
    val d2 = Scratch.dir("spec_gen")
    assert(d1 != d2)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(d1)))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(d2)))
  }

  test("a stale lazy plan over a prior generation fails loudly, not silently") {
    val d1 = Scratch.dir("spec_stale")
    Seq((1L, "gen1")).toDF("id", "v").write.parquet(s"$d1/t.parquet")
    // The hazard: an unmaterialized frame over the first invocation's
    // artifact, held across a second invocation of the same gate.
    val stale = spark.read.parquet(s"$d1/t.parquet")
    val d2 = Scratch.dir("spec_stale")
    Seq((2L, "gen2")).toDF("id", "v").write.parquet(s"$d2/t.parquet")
    // Executing the stale plan must throw (its files are gone) — the
    // silent failure mode would be returning gen2's row here.
    val err = intercept[Exception] { stale.collect() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(err).exists { t =>
      t.isInstanceOf[java.io.FileNotFoundException] ||
        Option(t.getMessage).exists(m =>
          m.contains("FileNotFound") || m.contains("does not exist") ||
            m.contains("PATH_NOT_FOUND"))
    }, s"expected a missing-file failure, got: $err")
    // The fresh generation reads its own data exactly.
    val rows = spark.read.parquet(s"$d2/t.parquet").collect()
    assert(rows.length == 1 && rows(0).getString(1) == "gen2")
  }
}
