package graft.frontier

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PolitenessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("claimPrioritized: budget goes to high-rank rows, ties fall back to BFS order, salting is exact") {
    val rows = Seq(
      // url, host, depth, urlHash, priority
      ("http://a/1", "a", 1, 11L, 7L),
      ("http://a/2", "a", 0, 12L, 1L),
      ("http://a/3", "a", 2, 13L, 9L),
      ("http://a/4", "a", 0, 14L, 1L),
      ("http://a/5", "a", 0, 10L, 1L),
      ("http://b/1", "b", 3, 21L, 5L),
      ("http://b/2", "b", 0, 22L, 5L)
    ).toDF("url", "host", "depth", "urlHash", "priority")
    // host a budget-2 by priority desc → a/3 (9), a/1 (7) — NOT the BFS
    // front-runners a/5 and a/2; host b ties at 5 → BFS order b/2 first;
    // global top-3 by (priority desc, BFS) → a/3, a/1, b/2
    val got = Politeness.claimPrioritized(rows, hostBudget = 2, remaining = 3)
      .select("url").collect().map(_.getString(0)).toSet
    assert(got == Set("http://a/3", "http://a/1", "http://b/2"))
    // the two-phase salted claim is EXACT for the priority order too:
    // every salt split yields the same per-host top-k
    def claimed(buckets: Int) =
      Politeness.claimPrioritized(rows, 2, 100, saltBuckets = buckets)
        .select("url").collect().map(_.getString(0)).toSet
    assert(claimed(1) == claimed(16))
    // plain claim is unchanged by the refactor: canonical BFS order
    val bfs = Politeness.claim(rows, hostBudget = 2, remaining = 100)
      .select("url").collect().map(_.getString(0)).toSet
    assert(bfs == Set("http://a/5", "http://a/2", "http://b/2", "http://b/1"))
  }

  test("claimWithHostBudgets: overrides cap, clamp to default, absent hosts keep default, <=0 claims none") {
    val rows = (for (h <- Seq("a", "b", "c", "z"); i <- 0 until 4)
      yield (s"http://$h/$i", h, 0, (h + i).hashCode.toLong.abs % 1000, "p"))
      .toDF("url", "host", "depth", "urlHash", "parentUrl")
    val budgets = Seq(("a", 1), ("b", 99), ("z", 0)).toDF("host", "budget")
    val got = Politeness.claimWithHostBudgets(rows, hostBudget = 3,
      budgets, remaining = 100)
      .select("host").collect().map(_.getString(0))
      .groupBy(identity).view.mapValues(_.length).toMap
    // a: override 1; b: 99 clamps to default 3; c: absent → 3; z: 0 → none
    assert(got == Map("a" -> 1, "b" -> 3, "c" -> 3), got.toString)
    // salt-invariance: the per-host-k containment argument per budget
    def claimed(buckets: Int) = Politeness.claimWithHostBudgets(
      rows, 3, budgets, remaining = 100, saltBuckets = buckets)
      .select("url").collect().map(_.getString(0)).toSet
    assert(claimed(1) == claimed(16))
    // within a host, the claimed rows are the canonical BFS front
    val aClaims = Politeness.claimWithHostBudgets(rows, 3, budgets, 100)
      .filter($"host" === "a").select("url").collect().map(_.getString(0)).toSeq
    val aFront = rows.filter($"host" === "a")
      .orderBy($"depth", $"urlHash", $"url").limit(1)
      .select("url").collect().map(_.getString(0)).toSeq
    assert(aClaims == aFront)
  }
}
