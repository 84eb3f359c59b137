package graft

import java.nio.file.Files
import java.nio.charset.StandardCharsets.UTF_8

/** Round-15 pins for the fixed-width source: byte-range slicing with
  * right-trim-only padding removal, the short-line NULL/flag contract,
  * and spec validation. */
class FwfReaderSpec extends SparkSpecBase {

  private def write(lines: String*): String = {
    val p = Files.createTempFile("graft-fwf-spec", ".txt")
    Files.write(p, lines.mkString("", "\n", "\n").getBytes(UTF_8))
    p.toString
  }

  test("slices by (start, width), right-trims, preserves leading spaces") {
    val path = write(
      "AB  x 42",
      "CD y   7")
    val got = graft.io.FwfReader.read(spark, path,
        Seq(("k", 1, 2), ("v", 3, 4), ("n", 7, 2)))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getBoolean(3)))
    // v spans chars 3..6: "  x " → right-trim keeps the LEADING pad.
    assert(got.toSeq == Seq(
      ("AB", "  x", "42", false),
      ("CD", " y", " 7", false)))
  }

  test("short lines NULL unreachable columns and raise _short_line") {
    val path = write("ABCDEF", "AB")
    val got = graft.io.FwfReader.read(spark, path,
        Seq(("a", 1, 2), ("b", 5, 4)))
      .orderBy("a").collect()
    val full = got(0)
    assert(full.getString(0) == "AB" && full.getString(1) == "EF")
    assert(full.getBoolean(2), "line 1 (6 chars) < full extent 8 — flagged")
    val short = got(1)
    assert(short.getString(0) == "AB" && short.isNullAt(1),
      "column starting past EOL reads NULL")
    assert(short.getBoolean(2))
  }

  test("rejects zero-based or non-positive specs") {
    intercept[IllegalArgumentException] {
      graft.io.FwfReader.read(spark, "/dev/null", Seq(("a", 0, 2)))
    }
    intercept[IllegalArgumentException] {
      graft.io.FwfReader.read(spark, "/dev/null", Seq.empty)
    }
  }
}
