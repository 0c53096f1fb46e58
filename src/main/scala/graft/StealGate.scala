package graft

/** Shared CPU-steal gating for every measurement main (Bench, the Soak
  * family, IndexSoak). This host is a VM with intermittent hypervisor
  * steal (0.6k quiet → 10k+ noisy jiffies per ~90 s window — the
  * round-14/15 forensics), so a wall-clock number is only evidence when
  * its window's cumulative-steal delta is known. Round 15 put the gate
  * into Bench; round 16 hoists it here because the threshold was
  * env-configurable in Bench (`SPARK_GRAFT_STEAL_RATE`) but HARDCODED
  * in IndexSoak and Soak — overriding the gate changed one of three
  * surfaces (ADVICE r15).
  *
  * Unknown ≠ quiet (ADVICE r15): if /proc/stat is unreadable,
  * `stealNow()` returns -1 on both samples and the naive `s1 - s0`
  * delta is 0 — which would mark every window quiet on a host where
  * steal was never measured. `delta` maps any failed sample to -1 and
  * `quietWindow` rejects negative deltas, so an unmeasurable window is
  * reported noisy (the conservative direction: it can only demand
  * retries, never bless a contaminated number).
  */
object StealGate {

  /** Jiffies-per-second-of-window threshold; quiet runs measure <10/s,
    * contaminated ones >100/s (round-15 calibration). Env-overridable
    * everywhere via SPARK_GRAFT_STEAL_RATE.
    */
  val rate: Double = sys.env.get("SPARK_GRAFT_STEAL_RATE")
    .map(_.toDouble).getOrElse(25.0)

  /** Sub-20 s windows aren't gated on noise blips. */
  val floorJiffies: Double = 500.0

  /** Cumulative steal jiffies (field 8 of /proc/stat's cpu line);
    * -1 when the read fails.
    */
  def stealNow(): Long = try {
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/stat"))).linesIterator
      .next().trim.split("\\s+")(8).toLong
  } catch { case _: Exception => -1L }

  /** Window delta from two samples; -1 (unknown) if either failed. */
  def delta(s0: Long, s1: Long): Long =
    if (s0 < 0 || s1 < 0) -1L else s1 - s0

  /** A window is quiet when its steal delta is KNOWN and stays under
    * rate*sec (with the short-window floor). delta < 0 — including
    * the unknown -1 — is never quiet.
    */
  def quietWindow(stealDelta: Long, sec: Double): Boolean =
    stealDelta >= 0 && stealDelta <= math.max(floorJiffies, rate * sec)

  /** Time `body`, returning (seconds, steal delta, quiet). */
  def timedWindow[A](body: => A): (A, Double, Long, Boolean) = {
    val s0 = stealNow(); val t0 = System.nanoTime()
    val a = body
    val sec = (System.nanoTime() - t0) / 1e9
    val sd = delta(s0, stealNow())
    (a, sec, sd, quietWindow(sd, sec))
  }
}
