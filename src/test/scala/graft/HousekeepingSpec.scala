package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Housekeeping

/** Gate hermeticity: the exit sweep removes exactly THIS app's on-disk gate
  * artifacts — tmp dirs and warehouse table data — while sparing other
  * sessions' artifacts and the `graft_keep_` namespace (read by DuckDB after
  * the JVM exits). Proves a crashed gate leaves no residue: the sweep is the
  * JVM shutdown hook's body, so anything the gate wrote before throwing is
  * covered the same as a clean run's artifacts.
  */
class HousekeepingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def mkDirWithFile(parent: java.io.File, name: String): java.io.File = {
    val d = new java.io.File(parent, name)
    d.mkdirs()
    java.nio.file.Files.writeString(d.toPath.resolve("part-0"), "x")
    d
  }

  test("sweepAppArtifacts removes own-tag tmp+warehouse dirs, spares others and keep-prefix") {
    val tag = "testtag_12345"
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val wh = java.nio.file.Files.createTempDirectory("graft_hk_wh_spec").toFile

    // a "crashed gate": artifacts written, no cleanup ran
    val ownTmp = mkDirWithFile(tmp, s"graft_gate_xo_$tag")
    val ownWh = mkDirWithFile(wh, s"graft_gate_bkt_orders_$tag")
    val keep = mkDirWithFile(tmp, s"graft_keep_schema_drift_$tag")
    val other = mkDirWithFile(tmp, "graft_gate_xo_othertag_999")
    try {
      Housekeeping.sweepAppArtifacts(tag, Some(wh))
      assert(!ownTmp.exists(), "own tmp artifact must be swept")
      assert(!ownWh.exists(), "own warehouse table data must be swept")
      assert(keep.exists(), "graft_keep_ artifacts are read post-exit and must survive")
      assert(other.exists(), "another session's artifacts must survive")
    } finally {
      Seq(keep, other, ownTmp, ownWh).foreach { f =>
        def rm(x: java.io.File): Unit = {
          Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
          x.delete()
        }
        rm(f)
      }
      wh.delete()
    }
  }

  test("warehouseDir resolves file: URIs and bare paths; remote schemes → None") {
    val resolved = Housekeeping.warehouseDir(spark)
    assert(resolved.nonEmpty, "test session warehouse is local")
    assert(resolved.get.getPath.contains("graft_wh"),
      s"expected the test warehouse, got ${resolved.get}")
  }

  test("appTag is filesystem/table-name safe") {
    val tag = Housekeeping.appTag(spark)
    assert(tag.matches("[a-zA-Z0-9_]+"), s"unsafe tag: $tag")
  }
}
