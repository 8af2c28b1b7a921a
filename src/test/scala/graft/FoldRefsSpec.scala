package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}

/** Pins tools/fold_refs.py's ref-lifecycle policy (round-8 verdict
  * item 1): min-fold for unchanged definitions, RESET (replace, never
  * min-fold) when a query's source span changed since its ref was
  * recorded, and the Bench-basis guard (round-8 ADVICE: a Probe or
  * hand-made pass file must be refused — the session-5 wrong-basis
  * fold had to be undone by hand).
  *
  * Shells out to python3 against a synthetic repo layout in a temp
  * cwd; each scenario is end-to-end through the real tool.
  */
class FoldRefsSpec extends AnyFunSuite {

  private val tool = new java.io.File("tools/fold_refs.py").getAbsolutePath

  /** Build a temp repo: a fake QueryDef source file, a ref/fp pair,
    * and a pass file; run the tool; return (exitCode, refAfter, out).
    */
  private def run(srcBody: String, ref: String, fp: Option[String],
      pass: String, extraArgs: Seq[String] = Seq.empty)
      : (Int, String, String) = {
    val dir = Files.createTempDirectory("foldrefs")
    val src = dir.resolve("src/main/scala/graft")
    Files.createDirectories(src)
    Files.writeString(src.resolve("Q.scala"), srcBody)
    val refPath = dir.resolve("bench_ref.json")
    Files.writeString(refPath, ref)
    fp.foreach(s => Files.writeString(dir.resolve("bench_ref_fp.json"), s))
    val passPath = dir.resolve("pass1.json")
    Files.writeString(passPath, pass)
    val out = new StringBuilder
    val exit = scala.sys.process.Process(
      Seq("python3", tool, refPath.toString, passPath.toString) ++ extraArgs,
      dir.toFile).!(scala.sys.process.ProcessLogger(
        l => out.append(l).append('\n'), l => out.append(l).append('\n')))
    (exit, Files.readString(refPath), out.toString)
  }

  private def benchPass(name: String, warm: Double): String =
    s"""{"metric":"total","value":$warm,"cold_total":${warm * 2},
       |"host_factor":1.0,
       |"queries":{"$name":{"cold":${warm * 2},"warm":$warm}}}""".stripMargin

  private def srcWith(body: String): String =
    s"""object Q { QueryDef("q1_x", $body) }"""

  test("unchanged definition: min-fold only tightens, never loosens") {
    val fp0 = fpOf(srcWith("versionA"))
    // slower pass (0.5 > ref 0.2) with matching fingerprint: no change
    val (e1, ref1, _) = run(srcWith("versionA"), """{"q1_x": 0.2}""",
      Some(s"""{"q1_x": "$fp0"}"""), benchPass("q1_x", 0.5))
    assert(e1 == 0 && ref1.contains("0.2") && !ref1.contains("0.5"))
    // faster pass tightens
    val (e2, ref2, _) = run(srcWith("versionA"), """{"q1_x": 0.2}""",
      Some(s"""{"q1_x": "$fp0"}"""), benchPass("q1_x", 0.1))
    assert(e2 == 0 && ref2.contains("0.1"))
  }

  test("changed definition: ref RESETS to the new measurement") {
    val fpOld = fpOf(srcWith("versionA"))
    // source now says versionB but the fp file records versionA's hash:
    // the 0.5 s measurement REPLACES the stale 0.2 s ref (a rewritten,
    // heavier query must not keep reading as a permanent regression)
    val (e, ref, out) = run(srcWith("versionB"), """{"q1_x": 0.2}""",
      Some(s"""{"q1_x": "$fpOld"}"""), benchPass("q1_x", 0.5))
    assert(e == 0, out)
    assert(ref.contains("0.5") && !ref.contains("0.2"), ref)
    assert(out.contains("fingerprint"), out)
  }

  test("--reset forces a replace even with matching fingerprint") {
    val fp0 = fpOf(srcWith("versionA"))
    val (e, ref, out) = run(srcWith("versionA"), """{"q1_x": 0.2}""",
      Some(s"""{"q1_x": "$fp0"}"""), benchPass("q1_x", 0.5),
      Seq("--reset", "q1_x"))
    assert(e == 0 && ref.contains("0.5") && !ref.contains("0.2"), out)
  }

  test("basis guard: a pass file without Bench markers is refused") {
    // Probe-shaped artifact: has queries/warm but no cold_total/
    // host_factor run markers
    val probe = """{"value":0.5,"queries":{"q1_x":{"warm":0.5}}}"""
    val (e, ref, out) = run(srcWith("versionA"), """{"q1_x": 0.2}""",
      None, probe)
    assert(e != 0, "must refuse a non-Bench basis")
    assert(out.contains("REFUSED"), out)
    assert(ref.contains("0.2"), "ref must be untouched after refusal")
  }

  test("new query: first entry added and fingerprint recorded") {
    val (e, ref, _) = run(srcWith("versionA"), "{}", None,
      benchPass("q1_x", 0.3))
    assert(e == 0 && ref.contains("\"q1_x\": 0.3"), ref)
  }

  /** The tool's own span hash, reproduced for fixture setup. */
  private def fpOf(src: String): String = {
    val start = src.indexOf("QueryDef(")
    val span = src.substring(start)
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(span.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString.take(16)
  }
}
