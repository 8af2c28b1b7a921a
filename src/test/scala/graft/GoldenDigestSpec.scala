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
  * Pinned at TWO scale factors (sf0.01 and sf0.1) and asserted at TWO
  * shuffle-partition counts (4 and 32) per SF — partition-order
  * sensitivity that happens to cancel at one configuration cannot
  * hide at both. Thread-count independence additionally cross-checks
  * in a separate JVM: `SPARK_GRAFT_CPUS=32 sbt 'Test/runMain
  * graft.GoldenDigest --check'` (wired into the verify skill).
  *
  * To regenerate after an INTENDED output change:
  *   sbt 'Test/runMain graft.GoldenDigest'
  * rewrites src/test/resources/golden-digests-sf*.properties;
  * commit the diff alongside the change that caused it.
  */
object GoldenDigest {

  /** The rows-only query surface (everything in SparkEntry.queries
    * with no oracleSql entry, minus nothing — kept explicit so adding
    * a rows-only query without a digest fails the completeness test).
    */
  val queries: Seq[String] = Seq(
    // EMPTY as of round 9: every query carries a DuckDB oracle.
    // q27/q38 graduated in round 8 (HLL-register / integer-histogram
    // replays); q20-q23 and q60-q62 graduated in round 9 (relational
    // replay of the pipeline fold, synthetic detector, segment/key
    // scheme, and media-stub byte arithmetic from deterministic
    // frames/media dumps). The machinery stays for any future
    // rows-only query.
  )

  val sfs: Seq[String] = Seq("0.01", "0.1")
  def sfDir(sf: String) = s"/root/testdata/sf$sf"
  def fixturePathFor(sf: String) =
    s"src/test/resources/golden-digests-sf$sf.properties"

  // Back-compat aliases (sf0.01 was the original single pin)
  val sf: String = sfDir("0.01")
  val fixturePath: String = fixturePathFor("0.01")

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
    // \u0001 separator (written as an escape on purpose — a literal
    // control char here once vanished in an edit and silently changed
    // every digest) keeps adjacent values from colliding across
    // column boundaries
    val lines = proj.collect().map(_.toSeq.map(norm).mkString("\u0001")).sorted
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update((cols.mkString("\u0001") + "\n").getBytes("UTF-8"))
    lines.foreach(l => md.update((l + "\n").getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  def loadFixture(sf: String): Map[String, String] = {
    val p = new java.util.Properties()
    val in = new java.io.FileInputStream(fixturePathFor(sf))
    try p.load(in) finally in.close()
    import scala.jdk.CollectionConverters._
    p.asScala.toMap
  }

  def loadFixture(): Map[String, String] = loadFixture("0.01")

  /** Regeneration entry point — rewrites the per-SF fixtures from the
    * current engine output. Run deliberately, never from CI. With
    * `--check` it VERIFIES the checked-in fixtures instead (exit 1 on
    * any mismatch) — run under a different SPARK_GRAFT_CPUS for the
    * cross-JVM thread-count independence check.
    */
  def main(args: Array[String]): Unit = {
    val check = args.contains("--check")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var bad = 0
    for (sf <- sfs) {
      val fixture = if (check) loadFixture(sf) else Map.empty[String, String]
      val lines = queries.map { name =>
        val d = digest(SparkEntry.queries(name)(spark, sfDir(sf)))
        if (check) {
          val ok = fixture.get(name).contains(d)
          if (!ok) bad += 1
          println(s"[golden] sf$sf $name ${if (ok) "OK" else s"MISMATCH got=$d want=${fixture.get(name)}"}")
        } else println(s"[golden] sf$sf $name = $d")
        s"$name=$d"
      }
      if (!check)
        java.nio.file.Files.write(java.nio.file.Paths.get(fixturePathFor(sf)),
          ((s"# Canonical sha-256 digests of the rows-only queries at sf$sf.\n" +
            "# Regenerate: sbt 'Test/runMain graft.GoldenDigest'\n") +
            lines.mkString("", "\n", "\n")).getBytes("UTF-8"))
    }
    spark.stop()
    if (check && bad > 0) sys.exit(1)
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

  // 2 SFs × 2 shuffle-partition counts: the digests are partition-
  // count-independent by construction (exact arithmetic, sorted
  // canonicalization) — assert it rather than argue it. The partition
  // override is session-scoped per block (plans are built inside).
  for (sf <- GoldenDigest.sfs; parts <- Seq(4, 32))
    test(s"every rows-only query matches its checked-in digest at sf$sf, $parts shuffle partitions") {
      val saved = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try {
        val fixture = GoldenDigest.loadFixture(sf)
        val mismatches = GoldenDigest.queries.flatMap { name =>
          val got = GoldenDigest.digest(
            SparkEntry.queries(name)(spark, GoldenDigest.sfDir(sf)))
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
      } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
    }
}
