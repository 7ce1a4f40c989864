package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: every query runs on sf0.001 and returns rows;
  * every oracle key exists in queries; entry (flagship crawl) yields docs.
  */
class SparkEntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("oracleSql keys ⊆ queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  // known-empty-by-construction results at tiny scale
  private val mayBeEmpty = Set("q_j1_seen_antijoin", "q_p1_include")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs on sf0.001") {
      val df = fn(spark, dir)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
      assert(df.columns.nonEmpty)
    }
  }

  test("entry returns extracted crawl docs") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("title"))
  }
}
