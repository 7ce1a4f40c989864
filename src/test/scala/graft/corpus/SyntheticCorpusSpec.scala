package graft.corpus

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.UrlOps

class SyntheticCorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("generation is deterministic and partitioning-independent") {
    val a = SyntheticCorpus.Builder(n = 500).corpus(spark)
      .repartition(2).collect().sortBy(_.doc_id)
    val b = SyntheticCorpus.Builder(n = 500).corpus(spark)
      .repartition(7).collect().sortBy(_.doc_id)
    assert(a.length == 500 && a.toSeq == b.toSeq)
  }

  test("pages are well-formed: canonical ids, dense offsets, resolvable links") {
    val pages = SyntheticCorpus.Builder(n = 300).corpus(spark).collect()
    val ids = pages.map(_.doc_id).toSet
    assert(ids.size == 300)
    pages.foreach { p =>
      assert(p.doc_id == UrlOps.canonicalize(p.doc_id))
      assert(p.spans.map(_.offset) == p.spans.indices)
      // every outgoing link canonicalizes to an existing page or self
      val targets = p.spans.filter(s => s.kind == "a" || s.kind == "sitemap-loc")
        .flatMap(s => Option(s.media_ref)).map(UrlOps.canonicalize)
      targets.foreach(t => assert(ids.contains(t), s"dangling link $t from ${p.doc_id}"))
    }
  }

  test("host distribution is zipf-skewed (hot host >> median host)") {
    val pages = SyntheticCorpus.Builder(n = 2000, hostCount = 50).corpus(spark).collect()
    val byHost = pages.groupBy(_.host).view.mapValues(_.length).toMap
    val counts = byHost.values.toSeq.sorted.reverse
    assert(byHost(SyntheticCorpus.hostName(0)) == counts.head)
    assert(counts.head > 8 * counts(counts.size / 2), s"skew too weak: $counts")
  }

  test("sitemap pages carry only sitemap-loc links and live under /sitemap/") {
    val pages = SyntheticCorpus.Builder(n = 300).corpus(spark).collect()
    val sitemaps = pages.filter(_.doc_id.contains("/sitemap/"))
    assert(sitemaps.nonEmpty)
    sitemaps.foreach { p =>
      assert(p.spans.exists(_.kind == "sitemap-loc"))
      assert(!p.spans.exists(_.kind == "a"))
    }
  }
}
