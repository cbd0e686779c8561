package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executable form of the "Hive metastore integration" north star: the
  * graft.* DDL is durable across a FULL engine restart when the session
  * is metastore-backed. Each phase runs in its own child JVM (the only
  * honest restart — any same-JVM scheme shares SparkContext/SharedState
  * and would prove nothing about durability); both point at the same
  * derby metastore files. Phase 2 runs zero DDL: every table and the c3
  * view it sees came from the metastore phase 1 wrote.
  */
class HiveCatalogSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def runPhase(phase: String, base: String): String = {
    val (rc, out) =
      ChildJvm.run("graft.HiveRoundTrip", Seq(phase, base, sfDir))
    assert(rc == 0, s"$phase exited $rc:\n${out.takeRight(4000)}")
    out
  }

  private def parse(out: String): Map[String, String] = {
    val line = out.linesIterator.find(_.startsWith("HIVE_RT"))
      .getOrElse(fail(s"no HIVE_RT line in:\n${out.takeRight(4000)}"))
    line.split("\\s+").drop(1)
      .map(_.split("=")).map(kv => kv(0) -> kv(1)).toMap
  }

  test("graft.* tables and the c3 view survive an engine restart on a Hive metastore") {
    val base = graft.Scratch.tempDir("hive")
    val p1 = parse(runPhase("phase1", base))
    val p2 = parse(runPhase("phase2", base))
    // The restarted engine sees the same catalog the first one built...
    assert(p2("tables") == p1("tables"),
      s"table count changed across restart: $p1 vs $p2")
    assert(p2("hasView") == "true", s"c3 view lost across restart: $p2")
    // ... and the tables still read the same data (external parquet:
    // metadata in the metastore, storage untouched in the fixture dir).
    assert(p2("orders") == p1("orders") && p2("orders").toLong > 0)
    assert(p2("view") == p1("view") && p2("view").toLong > 0)
  }
}
