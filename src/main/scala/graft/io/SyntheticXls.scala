package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

/** Synthetic legacy-XLS (BIFF8-in-CFB) builder — deterministic fixtures for
  * specs and registry queries exercising the S3 scan path without any real
  * Excel artifact in the repo. */
object SyntheticXls {

  // ---- minimal BIFF8 record builders
  def rec(t: Int, body: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(4 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(t.toShort).putShort(body.length.toShort).put(body)
    b.array()
  }
  def bof(dt: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(0x600.toShort).putShort(dt.toShort)
    rec(0x809, b.array())
  }
  def biffString(s: String): Array[Byte] = {
    val chars = s.getBytes("ISO-8859-1")
    val b = ByteBuffer.allocate(3 + chars.length).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(s.length.toShort).put(0.toByte).put(chars)
    b.array()
  }
  def sst(strings: Seq[String]): Array[Byte] = {
    val payload = strings.map(biffString).foldLeft(Array.emptyByteArray)(_ ++ _)
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(strings.length).putInt(strings.length)
    rec(0xFC, b.array() ++ payload)
  }
  def labelSst(row: Int, col: Int, isst: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(10).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(row.toShort).putShort(col.toShort).putShort(0).putInt(isst)
    rec(0xFD, b.array())
  }
  def number(row: Int, col: Int, v: Double): Array[Byte] = {
    val b = ByteBuffer.allocate(14).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(row.toShort).putShort(col.toShort).putShort(0).putDouble(v)
    rec(0x203, b.array())
  }
  def rk(row: Int, col: Int, intVal: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(10).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(row.toShort).putShort(col.toShort).putShort(0)
    b.putInt((intVal << 2) | 2) // integer RK encoding
    rec(0x27E, b.array())
  }
  val eof: Array[Byte] = rec(0x0A, Array.emptyByteArray)

  /** Wrap a stream in a one-stream CFB container (regular FAT chain; the
    * stream is padded past the 4096-byte mini cutoff). */
  def cfb(streamName: String, stream0: Array[Byte]): Array[Byte] = {
    val stream = stream0 ++ new Array[Byte](math.max(0, 4096 - stream0.length))
    val sectorSize = 512
    val streamSectors = (stream.length + sectorSize - 1) / sectorSize
    val totalSectors = 2 + streamSectors // FAT, dir, stream...
    val out = ByteBuffer.allocate(512 + totalSectors * sectorSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    // header
    out.putLong(0, 0xE11AB1A1E011CFD0L)
    out.putShort(24, 0x3E.toShort); out.putShort(26, 3.toShort) // version
    out.putShort(28, 0xFFFE.toShort) // little-endian
    out.putShort(30, 9.toShort); out.putShort(32, 6.toShort)   // 512 / 64
    out.putInt(44, 1)        // one FAT sector
    out.putInt(48, 1)        // dir starts at sector 1
    out.putInt(56, 4096)     // mini cutoff
    out.putInt(60, -2); out.putInt(64, 0)   // no mini FAT
    out.putInt(68, -2); out.putInt(72, 0)   // no DIFAT chain
    out.putInt(76, 0)        // DIFAT[0] -> FAT at sector 0
    for (i <- 1 until 109) out.putInt(76 + i * 4, -1)
    // FAT (sector 0)
    val fatOff = 512
    out.putInt(fatOff, -3)      // sector 0: FATSECT
    out.putInt(fatOff + 4, -2)  // sector 1: dir (end of chain)
    for (i <- 0 until streamSectors)
      out.putInt(fatOff + 8 + i * 4, if (i == streamSectors - 1) -2 else 2 + i + 1)
    for (i <- 2 + streamSectors until sectorSize / 4) out.putInt(fatOff + i * 4, -1)
    // directory (sector 1): root + stream
    def dirEntry(idx: Int, name: String, typ: Int, start: Int, size: Long): Unit = {
      val off = 512 + sectorSize + idx * 128
      val utf = name.getBytes("UTF-16LE")
      out.position(off); out.put(utf)
      out.putShort(off + 64, (utf.length + 2).toShort)
      out.put(off + 66, typ.toByte); out.put(off + 67, 1.toByte)
      out.putInt(off + 68, -1); out.putInt(off + 72, -1)
      out.putInt(off + 76, if (typ == 5) 1 else -1) // root's child = stream
      out.putInt(off + 116, start)
      out.putLong(off + 120, size)
    }
    dirEntry(0, "Root Entry", 5, -2, 0L)
    dirEntry(1, streamName, 2, 2, stream.length.toLong)
    // stream sectors (2..)
    out.position(512 + 2 * sectorSize); out.put(stream)
    out.array()
  }


  /** CFB container for streams of ANY size (the plain [[cfb]] writes one
    * FAT sector = 64 KB max): allocates as many FAT sectors as the file
    * needs, spilling FAT ids past the header's 109 DIFAT slots into
    * chained DIFAT sectors (MS-CFB 2.5) — the layout real multi-MB Excel
    * files use, which is exactly what the envelope-ceiling exercise needs
    * the reader to chew through. Sector order: DIFAT*, FAT*, dir, stream. */
  def cfbLarge(streamName: String, stream0: Array[Byte]): Array[Byte] = {
    val stream = stream0 ++ new Array[Byte](math.max(0, 4096 - stream0.length))
    val sectorSize = 512
    val perFat = sectorSize / 4            // 128 FAT entries per sector
    val perDifat = perFat - 1              // 127 FAT ids + next pointer
    val s = (stream.length + sectorSize - 1) / sectorSize
    // Fixpoint: more FAT sectors -> more total sectors -> maybe more FAT.
    var f = 1; var d = 0; var stable = false
    while (!stable) {
      val total = d + f + 1 + s
      val nf = (total + perFat - 1) / perFat
      val nd = if (nf <= 109) 0 else (nf - 109 + perDifat - 1) / perDifat
      stable = nf == f && nd == d
      f = nf; d = nd
    }
    val dirSector = d + f
    val streamStart = dirSector + 1
    val total = d + f + 1 + s
    val out = ByteBuffer.allocate(512 + total * sectorSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    // header
    out.putLong(0, 0xE11AB1A1E011CFD0L)
    out.putShort(24, 0x3E.toShort); out.putShort(26, 3.toShort)
    out.putShort(28, 0xFFFE.toShort)
    out.putShort(30, 9.toShort); out.putShort(32, 6.toShort)
    out.putInt(44, f)
    out.putInt(48, dirSector)
    out.putInt(56, 4096)
    out.putInt(60, -2); out.putInt(64, 0)          // no mini FAT
    out.putInt(68, if (d > 0) 0 else -2); out.putInt(72, d)
    for (i <- 0 until 109)
      out.putInt(76 + i * 4, if (i < f) d + i else -1)
    def sectorOff(sec: Int) = 512 + sec * sectorSize
    // chained DIFAT sectors carry FAT ids 109, 109+127, ...
    for (di <- 0 until d) {
      val off = sectorOff(di)
      for (j <- 0 until perDifat) {
        val fatIdx = 109 + di * perDifat + j
        out.putInt(off + j * 4, if (fatIdx < f) d + fatIdx else -1)
      }
      out.putInt(off + perDifat * 4, if (di == d - 1) -2 else di + 1)
    }
    // FAT
    def fatEntry(sec: Int): Int =
      if (sec < d) -4                                   // DIFSECT
      else if (sec < d + f) -3                          // FATSECT
      else if (sec == dirSector) -2                     // dir: 1-sector chain
      else if (sec < streamStart + s)
        if (sec == streamStart + s - 1) -2 else sec + 1 // stream chain
      else -1
    for (sec <- 0 until f * perFat)
      out.putInt(sectorOff(d) + sec * 4, if (sec < total) fatEntry(sec) else -1)
    // directory
    def dirEntry(idx: Int, name: String, typ: Int, start: Int, size: Long): Unit = {
      val off = sectorOff(dirSector) + idx * 128
      val utf = name.getBytes("UTF-16LE")
      out.position(off); out.put(utf)
      out.putShort(off + 64, (utf.length + 2).toShort)
      out.put(off + 66, typ.toByte); out.put(off + 67, 1.toByte)
      out.putInt(off + 68, -1); out.putInt(off + 72, -1)
      out.putInt(off + 76, if (typ == 5) 1 else -1)
      out.putInt(off + 116, start)
      out.putLong(off + 120, size)
    }
    dirEntry(0, "Root Entry", 5, -2, 0L)
    dirEntry(1, streamName, 2, streamStart, stream.length.toLong)
    out.position(sectorOff(streamStart)); out.put(stream)
    out.array()
  }

  /** NCCI_PTP-shaped BIFF8 workbook at (up to) the format's 65,536-row
    * ceiling — same dirt profile as IngestScale's CSV (title junk row,
    * header row, every-10,000th row empty, ~1% duplicate keys, ~0.5%
    * missing required key, ~0.25% missing modifier) so the full pipeline
    * exercises the legacy-Excel bridge at the largest sheet BIFF8 can
    * express. Records are streamed into one buffer (naive Array ++ per
    * record would be quadratic at 450k records). Missing cells are simply
    * not emitted — the reader pads the grid, which lands them as "" like
    * the CSV's empty fields. */
  def ncciPtpCeiling(path: String, totalRows: Int = 65536): Unit = {
    require(totalRows >= 3 && totalRows <= 65536,
      s"BIFF8 row ceiling is 65536, got $totalRows")
    val rationales = Array("Misuse of column two with column one",
      "Standards of medical / surgical practice",
      "Mutually exclusive procedures",
      "CPT Manual or CMS manual coding instructions")
    val strings = Seq(
      "National Correct Coding Initiative PTP Edits",           // 0 title
      "Column 1", "Column 2", "Modifier", "Effective Date",     // 1-4
      "Deletion Date", "PTP Edit Rationale",                    // 5-6
      "*=in existence prior to 1996",                           // 7
      "20240101", "20250101", "*") ++ rationales                // 8-10, 11-14
    val body = new java.io.ByteArrayOutputStream(1 << 22)
    body.write(bof(0x05)); body.write(sst(strings)); body.write(eof)
    body.write(bof(0x10))
    body.write(labelSst(0, 0, 0))
    for (c <- 0 until 7) body.write(labelSst(1, c, 1 + c))
    val nData = totalRows - 2
    var i = 0
    while (i < nData) {
      val row = i + 2
      if (i % 10000 == 9999) {
        // empty row: emit nothing — the grid read-back pads it
      } else {
        val k = if (i % 100 == 99) i - 1 else i
        body.write(rk(row, 0, 10000 + k / 97))
        if (i % 200 != 137) body.write(rk(row, 1, 20000 + k % 97997))
        if (i % 400 != 211) body.write(rk(row, 2, i % 3))
        body.write(labelSst(row, 3, 8))
        body.write(labelSst(row, 4, if (i % 7 == 0) 9 else 10))
        body.write(labelSst(row, 5, 11 + i % 4))
        if (i % 11 == 0) body.write(labelSst(row, 6, 10))
      }
      i += 1
    }
    body.write(eof)
    Files.write(java.nio.file.Paths.get(path),
      cfbLarge("Workbook", body.toByteArray))
  }

  /** The standard 3x2 fixture used by spec + registry: header row from the
    * shared-string table, a NUMBER cell, and an RK-encoded integer. */
  def standardFixture(): String = {
    val workbook =
      bof(0x05) ++ sst(Seq("HCPCS", "MOD", "99213", "A1234")) ++ eof ++
      bof(0x10) ++
        labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++
        labelSst(1, 0, 2) ++ number(1, 1, 1.5) ++
        labelSst(2, 0, 3) ++ rk(2, 1, 42) ++
      eof
    val p = Files.createTempFile("graft-xls", ".xls")
    Files.write(p, cfb("Workbook", workbook))
    p.toString
  }
}
