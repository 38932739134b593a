package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** Drives [[Bench.runPasses]] with a fake clock and fake measurements —
  * no SparkSession. Pins the round-15 verdict's budget contract: pass 1
  * always completes, passes >= 2 check the budget BEFORE each query and
  * stop mid-pass, every query keeps at least one sample, and
  * even-sample medians report the lower-middle (for 2 samples, the
  * min) so a budget-shortened run reports conservatively.
  */
class BenchSpec extends AnyFunSuite {

  /** A clock that advances by each measured duration, like the real
    * wall clock does over real queries. */
  private final class FakeRun(durations: Map[String, Double]) {
    var now = 0.0
    val trace = mutable.ArrayBuffer.empty[(Int, String)]
    private var currentPass = 0
    val samples = mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    val capped = mutable.LinkedHashSet.empty[String]
    def measure(name: String): Double = {
      val sec = durations(name)
      now += sec
      trace += ((currentPass, name))
      sec
    }
    def run(names: Seq[String], runs: Int, budgetSec: Double,
        queryCapSec: Double = Double.MaxValue): Bench.PassOutcome =
      Bench.runPasses(names, measure, samples, capped, runs, budgetSec,
        queryCapSec, () => now,
        onPassStart = () => currentPass += 1)
  }

  private val names = Seq("qa", "qb", "qc")

  test("median of an odd sample count is the middle value") {
    assert(Bench.medianOf(Seq(9.0, 1.0, 4.0)) == 4.0)
    assert(Bench.medianOf(Seq(7.0)) == 7.0)
  }

  test("median of 2 samples is the MIN (lower-middle), not the max") {
    // r15: the driver reported q124 at 175 s because the upper-middle
    // of {13.3, 175.4} is the worst sample
    assert(Bench.medianOf(Seq(175.4, 13.3)) == 13.3)
    assert(Bench.medianOf(Seq(1.0, 2.0, 3.0, 100.0)) == 2.0)
  }

  test("pass 1 always completes even with a zero budget " +
      "(one-sample-per-query guarantee)") {
    val r = new FakeRun(Map("qa" -> 10.0, "qb" -> 10.0, "qc" -> 10.0))
    val out = r.run(names, runs = 3, budgetSec = 0.0)
    assert(names.forall(n => r.samples(n).size == 1))
    assert(out.passes == 1)
    assert(out.budgetExceeded)
    assert(!out.stoppedMidPass) // tripped between passes, not mid-pass
  }

  test("pass 2 stops MID-PASS once the budget is crossed; " +
      "every query keeps >= 1 sample") {
    // pass 1 = 3 x 100 s = 300 s (under 450 s budget, so pass 2
    // launches); the r15 failure mode was pass 2 then running all the
    // way to 600 s — here the pre-query check must stop it after qb
    // crosses the budget mid-pass
    val r = new FakeRun(Map("qa" -> 100.0, "qb" -> 100.0, "qc" -> 100.0))
    val out = r.run(names, runs = 3, budgetSec = 450.0)
    assert(out.budgetExceeded && out.stoppedMidPass)
    assert(out.passes == 2)
    // pass 2 ran qa (elapsed 300 <= 450) and qb (elapsed 400 <= 450),
    // then stopped before qc (elapsed 500 > 450): NOT a full pass
    assert(r.trace.count(_._1 == 2) == 2)
    assert(r.samples("qc").size == 1) // pass-1 sample retained
    assert(names.forall(n => r.samples(n).nonEmpty))
    // total wall-clock overshoot is bounded by one query, not one pass
    assert(r.now == 500.0)
  }

  test("under budget, all passes run and medians use 3 samples") {
    val r = new FakeRun(Map("qa" -> 1.0, "qb" -> 1.0, "qc" -> 1.0))
    val out = r.run(names, runs = 3, budgetSec = 1e9)
    assert(out.passes == 3 && !out.budgetExceeded && !out.stoppedMidPass)
    assert(names.forall(n => r.samples(n).size == 3))
  }

  test("a query over the per-query cap keeps its sample but runs " +
      "no further passes; others are unaffected") {
    val r = new FakeRun(Map("qa" -> 1.0, "qb" -> 99.0, "qc" -> 1.0))
    val out = r.run(names, runs = 3, budgetSec = 1e9, queryCapSec = 60.0)
    assert(out.passes == 3)
    assert(r.capped.toSeq == Seq("qb"))
    assert(r.samples("qb").size == 1)
    assert(r.samples("qa").size == 3 && r.samples("qc").size == 3)
  }

  test("budget crossed during pass 1 skips pass 2 entirely " +
      "(between-pass check still present)") {
    val r = new FakeRun(Map("qa" -> 200.0, "qb" -> 200.0, "qc" -> 200.0))
    val out = r.run(names, runs = 3, budgetSec = 450.0)
    assert(out.passes == 1 && out.budgetExceeded && !out.stoppedMidPass)
    assert(r.trace.size == 3)
  }

  test("only a clean finished run writes the official artifact path; " +
      "degraded runs land on the _partial sibling") {
    // r16: the driver's 1-pass budget-exceeded run overwrote the
    // committed clean headline artifact in the working tree — anyone
    // reading the tree saw the cold-sample noise as "latest"
    val official = "BENCH_HEADLINE_latest.json"
    assert(Bench.partialSibling(official)
      === "BENCH_HEADLINE_latest_partial.json")
    assert(Bench.partialSibling("noext") === "noext_partial")
    assert(Bench.finalOutPath(official, budgetExceeded = false,
      cappedCount = 0) === official)
    assert(Bench.finalOutPath(official, budgetExceeded = true,
      cappedCount = 0) === "BENCH_HEADLINE_latest_partial.json")
    assert(Bench.finalOutPath(official, budgetExceeded = false,
      cappedCount = 2) === "BENCH_HEADLINE_latest_partial.json")
  }

  test("the artifact JSON carries n_samples, the statistic name, and the calibration") {
    // r16 verdict item 1 + the advisor's statistic-naming finding: a
    // one-pass driver artifact must be gradable from its own fields —
    // per-query sample counts, which order statistic the figures are,
    // and a machine-speed reference to normalize by
    val json = Bench.renderArtifactJson(
      results = Seq(("qa", 1.0, 1.5, 9.0, 3), ("qb", 2.0, 2.0, 2.0, 1)),
      calCpuSec = 0.4, calScanSec = 0.6, sfDir = "/tmp/sf", mode = "headline",
      nQueries = 2, passes = 3, passStartedAt = Seq("t1", "t2", "t3"),
      budgetSec = 600.0, budgetExceeded = false, partialPass = false,
      queryCapSec = 60.0, capped = Nil)
    assert(json.contains("\"n_samples\":{\"qa\":3,\"qb\":1}"), json)
    assert(json.contains("\"statistic\":\"median_lower_middle\""), json)
    assert(json.contains("\"calibration_sec\":1.0"), json)
    assert(json.contains("\"calibration\":{\"cpu_sec\":0.4,\"scan_sec\":0.6}"),
      json)
    assert(json.contains("\"queries\":{\"qa\":1.5,\"qb\":2.0}"), json)
  }

  test("the CPU calibration probe measures fixed work and returns wall seconds") {
    // data-independent by construction; just pin that it runs, returns
    // a plausible positive duration, and is repeatable within an order
    // of magnitude on one machine (the artifact's cross-machine use
    // only needs it to scale with machine speed)
    val a = Bench.cpuProbe()
    val b = Bench.cpuProbe()
    assert(a > 0.0 && b > 0.0)
    assert(a / b < 10.0 && b / a < 10.0)
  }
}
