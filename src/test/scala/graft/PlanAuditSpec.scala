package graft

import org.scalatest.funsuite.AnyFunSuite

/** Automated plan-shape regression guard: every non-eager registered query
  * must plan WITHOUT a `CartesianProduct` — the unambiguous scale-killer
  * (an all-pairs physical join grows O(n·m) with no partitioning escape).
  * This turns the per-round manual `graft.Explain ALL` audit's headline
  * invariant into a permanent test, so a future query (or an optimizer
  * behavior change) that silently plans a cartesian join fails the suite
  * instead of shipping. Bounded-build-side `BroadcastNestedLoopJoin`s are
  * deliberately NOT banned here — the ANN audit slices and singleton
  * totals use them correctly; their per-query justification lives in the
  * Explain audit notes (SURVEY §8). Eager queries (manifest lifecycles,
  * checkpoint round-trips, iterative fixpoints) execute work at plan
  * construction and stay audited through their own specs, same policy as
  * `Explain.eager`. */
class PlanAuditSpec extends AnyFunSuite {
  import TestSpark._

  test("no registered non-eager query plans a CartesianProduct") {
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(n => n.startsWith("q_stream") || Explain.eager(n))
    assert(names.size > 150, s"audit should cover the registry, saw ${names.size}")
    val offenders = names.flatMap { n =>
      val plan = SparkEntry.queries(n)(spark, sf).queryExecution.executedPlan
      if (plan.toString.contains("CartesianProduct")) Some(n) else None
    }
    assert(offenders.isEmpty,
      s"queries planning CartesianProduct: ${offenders.mkString(", ")}")
  }

  test("sf1 audit: no non-eager query plans a CartesianProduct at 10x scale") {
    // runs only when the GenScale-produced sf1 fixture is present (SF1.md's
    // recipe: `graft.GenScale /root/testdata/sf0.1 /tmp/graft_sf1 10`) —
    // plan shape can flip with input statistics, so the cartesian invariant
    // must hold at the largest fixture we can build, not just the test SF
    val sf1 = "/tmp/graft_sf1"
    assume(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(sf1, "lineitem.parquet")), "sf1 fixture absent")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(n => n.startsWith("q_stream") || Explain.eager(n))
    val offenders = names.flatMap { n =>
      val plan = SparkEntry.queries(n)(spark, sf1).queryExecution.executedPlan
      if (plan.toString.contains("CartesianProduct")) Some(n) else None
    }
    assert(offenders.isEmpty,
      s"queries planning CartesianProduct at sf1: ${offenders.mkString(", ")}")
  }

  test("sf10 audit: no non-eager query plans a CartesianProduct at 100x scale") {
    // runs only when the 100x fixture exists (SF1.md's round-9 recipe:
    // `graft.GenScale /root/testdata/sf0.1 /tmp/graft_sf10 100`) — the
    // largest scale at which a statistics-driven plan flip to a
    // scale-killer could be observed in this sandbox
    val sf10 = "/tmp/graft_sf10"
    assume(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(sf10, "lineitem.parquet")), "sf10 fixture absent")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(n => n.startsWith("q_stream") || Explain.eager(n))
    val offenders = names.flatMap { n =>
      val plan = SparkEntry.queries(n)(spark, sf10).queryExecution.executedPlan
      if (plan.toString.contains("CartesianProduct")) Some(n) else None
    }
    assert(offenders.isEmpty,
      s"queries planning CartesianProduct at sf10: ${offenders.mkString(", ")}")
  }

  test("q_rfm: no global ntile; every row_number window is bucket-partitioned") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val plan = SparkEntry.queries("q_rfm")(spark, sf).queryExecution.optimizedPlan
    assert(!plan.toString.contains("ntile("),
      "q_rfm must compute quartiles from exact bucketed ranks, not a global ntile")
    val windows = plan.collect { case w: LWindow => w }
    val unpartRowNum = windows.filter(w =>
      w.windowExpressions.exists(_.toString.contains("row_number")) &&
        w.partitionSpec.isEmpty)
    assert(windows.nonEmpty && unpartRowNum.isEmpty,
      "an unpartitioned row_number window would single-partition-sort all customers")
  }
}
