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
