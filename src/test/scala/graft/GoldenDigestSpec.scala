package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Canonical result digests for the queries that have no DuckDB oracle
  * (not ANSI-SQL-expressible: generator-fed stateful folds, sketch
  * internals, stubbed media codecs). They are all DETERMINISTIC for a
  * fixed input — seeded generators, fixed sketch parameters, exact
  * integer arithmetic in every aggregate — so a regression used to be
  * invisible ("no_oracle" forever); now it flips this spec.
  *
  * Digest: columns sorted by name, every value canonicalized exactly
  * like tools/check_parity.py's `norm` (floats at 9 significant
  * digits, bytes as hex, NULL literal), rows sorted as strings,
  * sha-256 over the joined block. Independent of column order, row
  * order, partitioning and thread count.
  *
  * To regenerate after an INTENDED output change:
  *   sbt 'Test/runMain graft.GoldenDigest'
  * rewrites src/test/resources/golden-digests-sf0.01.properties;
  * commit the diff alongside the change that caused it.
  */
object GoldenDigest {

  /** The rows-only query surface (everything in SparkEntry.queries
    * with no oracleSql entry, minus nothing — kept explicit so adding
    * a rows-only query without a digest fails the completeness test).
    */
  val queries: Seq[String] = Seq(
    "q20_pipeline_detections", "q21_pipeline_segments",
    "q22_pipeline_stats", "q23_pipeline_rates",
    "q27_approx_distinct", "q38_approx_percentiles",
    "q60_media_features", "q61_media_frame_sample", "q62_media_resize")

  val sf = "/root/testdata/sf0.01"
  val fixturePath = "src/test/resources/golden-digests-sf0.01.properties"

  /** check_parity.py `norm` twin (Locale-proof 9-sig-digit floats). */
  private def norm(v: Any): String = v match {
    case null => "NULL"
    case d: Double =>
      if (d.isNaN) "NaN" else String.format(java.util.Locale.ROOT, "%.9g", Double.box(d))
    case f: Float =>
      if (f.isNaN) "NaN" else String.format(java.util.Locale.ROOT, "%.9g", Double.box(f.toDouble))
    case b: Array[Byte] => b.map("%02x".format(_)).mkString
    case s: collection.Seq[_] => s.map(norm).mkString("[", ",", "]")
    case a: Array[_] => a.map(norm).mkString("[", ",", "]")
    case r: Row => r.toSeq.map(norm).mkString("{", ",", "}")
    case m: collection.Map[_, _] =>
      m.map { case (k, x) => s"${norm(k)}:${norm(x)}" }.toSeq.sorted.mkString("{", ",", "}")
    case other => other.toString
  }

  def digest(df: DataFrame): String = {
    val cols = df.columns.sorted
    val proj = df.select(
      cols.toIndexedSeq.map(org.apache.spark.sql.functions.col): _*)
    val lines = proj.collect().map(_.toSeq.map(norm).mkString("")).sorted
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update((cols.mkString("") + "\n").getBytes("UTF-8"))
    lines.foreach(l => md.update((l + "\n").getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  def loadFixture(): Map[String, String] = {
    val p = new java.util.Properties()
    val in = new java.io.FileInputStream(fixturePath)
    try p.load(in) finally in.close()
    import scala.jdk.CollectionConverters._
    p.asScala.toMap
  }

  /** Regeneration entry point — rewrites the fixture from the current
    * engine output. Run deliberately, never from CI.
    */
  def main(args: Array[String]): Unit = {
    // SPARK_GRAFT_CPUS override: rerunning at a different thread count
    // must reproduce the same digests (they are partition-order-
    // independent by construction) — the cross-check used before
    // trusting a regenerated fixture
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lines = queries.map { name =>
      val d = digest(SparkEntry.queries(name)(spark, sf))
      println(s"[golden] $name = $d")
      s"$name=$d"
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(fixturePath),
      (("# Canonical sha-256 digests of the rows-only queries at sf0.01.\n" +
        "# Regenerate: sbt 'Test/runMain graft.GoldenDigest'\n") +
        lines.mkString("", "\n", "\n")).getBytes("UTF-8"))
    spark.stop()
  }
}

class GoldenDigestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("golden digest list covers exactly the queries without an oracle") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly === GoldenDigest.queries.toSet,
      s"rows-only queries changed; update GoldenDigest.queries and regenerate: " +
        s"missing digest=${rowsOnly -- GoldenDigest.queries.toSet} " +
        s"stale digest=${GoldenDigest.queries.toSet -- rowsOnly}")
  }

  test("every rows-only query matches its checked-in digest at sf0.01") {
    val fixture = GoldenDigest.loadFixture()
    val mismatches = GoldenDigest.queries.flatMap { name =>
      val got = GoldenDigest.digest(
        SparkEntry.queries(name)(spark, GoldenDigest.sf))
      fixture.get(name) match {
        case Some(want) if want == got => None
        case Some(want) => Some(s"$name: fixture=$want got=$got")
        case None => Some(s"$name: no fixture entry (regenerate)")
      }
    }
    assert(mismatches.isEmpty,
      ("rows-only query output changed — if intended, regenerate via " +
        "sbt 'Test/runMain graft.GoldenDigest' and commit:\n") +
        mismatches.mkString("\n"))
  }
}
