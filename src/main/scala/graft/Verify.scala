package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev-only subset filter (tools/check_oracles.py loop); driver leaves
    // the env unset and always dumps every query
    val only = sys.env.get("GRAFT_VERIFY_ONLY").map(_.split(",").toSet)
    SparkEntry.queries.filter(kv => only.forall(_.contains(kv._1))).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Publish the oracle SQL in EVERY shape a harness might read (round-1
    // driver keyed its results by the artifact name "q_x.parquet" while we
    // published bare "q_x" → all 51 queries read "no_oracle"):
    //  1. oracle_sql.json keyed BOTH "q_x" and "q_x.parquet"
    //  2. per-query sidecars  $outDir/q_x.sql  and  $outDir/q_x.parquet.sql
    //  3. queries.json manifest [{"name","parquet","oracle_sql"}]
    val oracle = SparkEntry.oracleSql
    val json = oracle.flatMap { case (k, v) =>
      Seq(s"${q(k)}: ${q(v)}", s"${q(k + ".parquet")}: ${q(v)}")
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    oracle.foreach { case (k, v) =>
      Files.writeString(Paths.get(s"$outDir/$k.sql"), v)
      Files.writeString(Paths.get(s"$outDir/$k.parquet.sql"), v)
    }
    val manifest = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val sql = oracle.get(name).map(q).getOrElse("null")
      s"""{"name":${q(name)},"parquet":${q(name + ".parquet")},"oracle_sql":$sql}"""
    }.mkString("[", ",", "]")
    Files.writeString(Paths.get(s"$outDir/queries.json"), manifest)
    spark.stop()
  }
}
