package graft

import graft.operators.OracleDump
import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite

/** The round-9 failure class under test: an oracle side-file observed
  * half-written (or mid-overwrite) at DuckDB-compare time zeroed the
  * round's correctness artifact. OracleDump's contract: publication is
  * one atomic rename, so any reader at any moment sees either no dump
  * or a COMPLETE dump — never a partial directory.
  */
class OracleDumpSpec extends AnyFunSuite {

  private def listNames(p: Path): Set[String] = {
    val s = Files.list(p)
    try {
      val it = s.iterator()
      val b = Set.newBuilder[String]
      while (it.hasNext) b += it.next().getFileName.toString
      b.result()
    } finally s.close()
  }

  private def slowWrite(nFiles: Int)(dir: String): Unit = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    (1 to nFiles).foreach { i =>
      Files.writeString(d.resolve(f"part-$i%05d"), s"content-$i")
      Thread.sleep(2) // widen the window a concurrent reader could hit
    }
  }

  test("ensure: write-once — concurrent callers produce exactly one write") {
    val writes = new AtomicInteger(0)
    val name = s"dump_once_${System.nanoTime()}"
    val threads = (1 to 8).map { _ =>
      new Thread(() => OracleDump.ensure(name) { tmp =>
        writes.incrementAndGet(); slowWrite(5)(tmp)
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(writes.get() == 1, "ensure must write exactly once per JVM")
    assert(listNames(Paths.get(OracleDump.path(name))).size == 5)
  }

  test("a reader never observes a partially-published dump") {
    val name = s"dump_atomic_${System.nanoTime()}"
    val target = Paths.get(OracleDump.path(name))
    @volatile var done = false
    @volatile var partialSeen: Option[Int] = None
    val reader = new Thread(() => {
      while (!done && partialSeen.isEmpty) {
        if (Files.exists(target)) {
          val n = listNames(target).size
          if (n != 20) partialSeen = Some(n)
        }
      }
    })
    reader.start()
    OracleDump.publish(name)(slowWrite(20))
    done = true
    reader.join()
    assert(partialSeen.isEmpty,
      s"reader saw a partial dump with ${partialSeen.getOrElse(-1)}/20 files")
    assert(listNames(target).size == 20)
  }

  test("publish: always rewrites, replacing stale content atomically") {
    val name = s"dump_pub_${System.nanoTime()}"
    OracleDump.publish(name) { d =>
      Files.createDirectories(Paths.get(d))
      Files.writeString(Paths.get(d, "old"), "stale")
    }
    OracleDump.publish(name) { d =>
      Files.createDirectories(Paths.get(d))
      Files.writeString(Paths.get(d, "new"), "fresh")
    }
    assert(listNames(Paths.get(OracleDump.path(name))) == Set("new"),
      "stale files must not survive a publish")
  }

  test("no writer temp directories leak after publication") {
    val name = s"dump_clean_${System.nanoTime()}"
    OracleDump.ensure(name)(slowWrite(3))
    val parent = Paths.get(OracleDump.path(name)).getParent
    assert(listNames(parent).forall(!_.contains(".tmp-")),
      "tmp staging dirs must be renamed away or deleted")
  }

  test("isPublished: true only for THIS JVM's publications, never for " +
      "a mere on-disk leftover") {
    val name = s"dump_pubq_${System.nanoTime()}"
    assert(!OracleDump.isPublished(name))
    // simulate a PRIOR process's leftover at the same path: existence
    // alone must not flip isPublished — Verify's store safety net
    // gates on it to avoid pinning stale edges at a reused outDir
    val leftover = Paths.get(OracleDump.path(s"${name}_prior"))
    Files.createDirectories(leftover)
    Files.writeString(leftover.resolve("part-00000"), "stale")
    assert(!OracleDump.isPublished(s"${name}_prior"))
    OracleDump.publish(name) { d =>
      Files.createDirectories(Paths.get(d))
      Files.writeString(Paths.get(d, "a"), "x")
    }
    assert(OracleDump.isPublished(name))
  }

  test("token resolution rewrites dump references for the compare artifact") {
    val sql = s"SELECT * FROM '${OracleDump.DirToken}/x.parquet/*.parquet' " +
      s"JOIN '${OracleDump.DirToken}/store_${OracleDump.SfToken}/*.parquet'"
    val r = OracleDump.resolveSql(sql, "/out/dir", "sf0.01")
    assert(r == "SELECT * FROM '/out/dir/x.parquet/*.parquet' " +
      "JOIN '/out/dir/store_sf0.01/*.parquet'")
  }
}
