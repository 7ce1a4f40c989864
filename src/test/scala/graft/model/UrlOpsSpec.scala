package graft.model

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.TestSpark

class UrlOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val messyUrls: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTP", "https", "Https")
    host <- Gen.oneOf("h1.Example.COM", "fess.codelibs.example", "A.b.C")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    path <- Gen.oneOf("", "/", "/page/12", "/Page/12/", "/a//b", "/x?q=1&r=2")
    frag <- Gen.oneOf("", "#", "#frag", "#a/b")
    pad <- Gen.oneOf("", " ", "  ")
  } yield s"$pad$scheme://$host$port$path$frag$pad"

  test("canonicalize examples (F13 semantics)") {
    assert(UrlOps.canonicalize("HTTP://H1.Example.COM:80/page/1#x") ==
      "http://h1.example.com/page/1")
    assert(UrlOps.canonicalize("http://h/") == "http://h")
    assert(UrlOps.canonicalize("https://H:443/a/") == "https://h/a")
    assert(UrlOps.canonicalize("http://h:8080/a") == "http://h:8080/a")
    // path case preserved, only scheme/host lowered
    assert(UrlOps.canonicalize("http://H/Page/One") == "http://h/Page/One")
  }

  /** deterministic scalacheck sampling (no scalatestplus offline). */
  private def samples(n: Int): Seq[String] =
    Gen.listOfN(n, messyUrls).apply(org.scalacheck.Gen.Parameters.default, Seed(42L)).get

  test("canonicalize is idempotent") {
    samples(500).foreach { u =>
      val once = UrlOps.canonicalize(u)
      assert(UrlOps.canonicalize(once) == once, s"idempotence on $u")
    }
  }

  test("Column twin agrees with pure-Scala canonicalize + host + hash") {
    val urls = samples(300)
    val df = urls.toDF("u").select(
      col("u"),
      UrlOps.canonicalizeCol(col("u")).as("canon"))
      .withColumn("host", UrlOps.hostCol(col("canon")))
      .withColumn("h", UrlOps.urlHashCol(col("canon")))
    df.collect().foreach { r =>
      val u = r.getString(0)
      val expected = UrlOps.canonicalize(u)
      assert(r.getString(1) == expected, s"canonicalizeCol($u)")
      assert(r.getString(2) == UrlOps.host(expected), s"hostCol($u)")
      assert(r.getLong(3) == UrlOps.urlHash(expected), s"urlHashCol($u)")
    }
  }
}
