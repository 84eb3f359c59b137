package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import scala.collection.mutable.ArrayBuffer

/** Minimal legacy-XLS (BIFF8) reader: enough of the format to honor the
  * all-string scan contract (reference: file_parser.py:53-61, S3) without
  * any external dependency.
  *
  * Two layers, both subset implementations of the public specs:
  *  - CFB container (MS-CFB): header, FAT via DIFAT, directory, regular and
  *    mini stream chains — enough to locate and read the Workbook stream.
  *  - BIFF8 records (MS-XLS): BOF/EOF, SST + LABELSST (including SST
  *    strings spanning Continue records, with mid-string grbit
  *    re-declaration), LABEL, NUMBER, RK, MULRK, BLANK, BOOLERR. RC4
  *    encryption, rich-text runs and far-east extensions are out of scope
  *    and raise.
  */
object XlsReader {

  // ------------------------------------------------------------------- CFB

  private final case class DirEntry(name: String, entryType: Int,
                                    startSector: Int, size: Long)

  private class Cfb(bytes: Array[Byte]) {
    private val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.getLong(0) == 0xE11AB1A1E011CFD0L, "not a CFB (OLE2) file")
    private val sectorShift = buf.getShort(30).toInt
    private val miniShift = buf.getShort(32).toInt
    val sectorSize: Int = 1 << sectorShift
    val miniSize: Int = 1 << miniShift
    private val numFatSectors = buf.getInt(44)
    private val firstDirSector = buf.getInt(48)
    val miniCutoff: Long = buf.getInt(56).toLong
    private val firstMiniFatSector = buf.getInt(60)
    private val numMiniFatSectors = buf.getInt(64)
    private val firstDifatSector = buf.getInt(68)

    private def sectorOffset(sector: Int): Int = 512 + sector * sectorSize

    // DIFAT: 109 entries in the header, then chained DIFAT sectors.
    private val fatSectors: IndexedSeq[Int] = {
      val out = ArrayBuffer.empty[Int]
      for (i <- 0 until math.min(109, numFatSectors))
        out += buf.getInt(76 + i * 4)
      var difat = firstDifatSector
      while (difat != -2 && out.length < numFatSectors) {
        val off = sectorOffset(difat)
        val perSector = sectorSize / 4 - 1
        for (i <- 0 until perSector if out.length < numFatSectors) {
          val v = buf.getInt(off + i * 4)
          if (v >= 0) out += v
        }
        difat = buf.getInt(off + perSector * 4)
      }
      out.toIndexedSeq
    }

    private val fat: IndexedSeq[Int] = fatSectors.flatMap { s =>
      val off = sectorOffset(s)
      (0 until sectorSize / 4).map(i => buf.getInt(off + i * 4))
    }

    private def chain(start: Int): Seq[Int] = {
      val out = ArrayBuffer.empty[Int]
      var s = start
      while (s >= 0) { out += s; s = fat(s) }
      out.toSeq
    }

    private def readChain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      for (s <- chain(start))
        out.write(bytes, sectorOffset(s), math.min(sectorSize, bytes.length - sectorOffset(s)))
      val all = out.toByteArray
      all.take(math.min(size, all.length.toLong).toInt)
    }

    val directory: IndexedSeq[DirEntry] = {
      val dirBytes = readChain(firstDirSector, Long.MaxValue >> 8)
      (0 until dirBytes.length / 128).map { i =>
        val off = i * 128
        val b = ByteBuffer.wrap(dirBytes, off, 128).order(ByteOrder.LITTLE_ENDIAN)
        val nameLen = ByteBuffer.wrap(dirBytes, off + 64, 2)
          .order(ByteOrder.LITTLE_ENDIAN).getShort.toInt
        val name = if (nameLen >= 2)
          new String(dirBytes, off, nameLen - 2, "UTF-16LE") else ""
        val entryType = dirBytes(off + 66).toInt
        val start = ByteBuffer.wrap(dirBytes, off + 116, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
        val size = ByteBuffer.wrap(dirBytes, off + 120, 8).order(ByteOrder.LITTLE_ENDIAN).getLong
        DirEntry(name, entryType, start, size)
      }
    }

    private lazy val miniFat: IndexedSeq[Int] = {
      if (numMiniFatSectors == 0) IndexedSeq.empty
      else {
        val mfBytes = readChain(firstMiniFatSector, numMiniFatSectors.toLong * sectorSize)
        (0 until mfBytes.length / 4).map(i =>
          ByteBuffer.wrap(mfBytes, i * 4, 4).order(ByteOrder.LITTLE_ENDIAN).getInt)
      }
    }

    private lazy val miniStream: Array[Byte] = {
      val root = directory.find(_.entryType == 5).getOrElse(
        throw new IllegalArgumentException("CFB: no root entry"))
      readChain(root.startSector, root.size)
    }

    def stream(name: String): Array[Byte] = {
      val e = directory.find(d => d.entryType == 2 && d.name == name).getOrElse(
        throw new IllegalArgumentException(s"CFB: no stream '$name'"))
      if (e.size >= miniCutoff) readChain(e.startSector, e.size)
      else {
        // mini-stream: walk the mini FAT inside the root entry's stream
        val out = new java.io.ByteArrayOutputStream()
        var s = e.startSector
        while (s >= 0) {
          out.write(miniStream, s * miniSize, math.min(miniSize, miniStream.length - s * miniSize))
          s = miniFat(s)
        }
        out.toByteArray.take(e.size.toInt)
      }
    }
  }

  // ------------------------------------------------------------------ BIFF8

  /** Read the first worksheet of a legacy .xls as an all-string cell grid. */
  def readRows(path: String): IndexedSeq[IndexedSeq[String]] = {
    val cfb = new Cfb(Files.readAllBytes(Paths.get(path)))
    val wb = cfb.directory.collectFirst {
      case d if d.entryType == 2 && (d.name == "Workbook" || d.name == "Book") => d.name
    }.getOrElse(throw new IllegalArgumentException("xls: no Workbook stream"))
    parseBiff(cfb.stream(wb))
  }

  private def parseBiff(data: Array[Byte]): IndexedSeq[IndexedSeq[String]] = {
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val sst = ArrayBuffer.empty[String]
    val cells = scala.collection.mutable.Map.empty[(Int, Int), String]
    var maxRow = -1
    var maxCol = -1
    var pos = 0
    var bofDepth = 0
    var sheetSeen = 0

    def put(row: Int, col: Int, v: String): Unit = {
      // only the FIRST worksheet substream (sheetSeen == 1)
      if (sheetSeen == 1 && v.nonEmpty) {
        cells((row, col)) = v
        if (row > maxRow) maxRow = row
        if (col > maxCol) maxCol = col
      }
    }

    def numToStr(d: Double): String =
      if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString else d.toString

    def rkToDouble(rk: Int): Double = {
      val div100 = (rk & 1) != 0
      val isInt = (rk & 2) != 0
      val v = if (isInt) (rk >> 2).toDouble
        else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
      if (div100) v / 100 else v
    }

    // SST string parse across Continue fragments. A string's characters may
    // split at a fragment boundary; the continuation fragment re-declares
    // the encoding with a fresh grbit byte (MS-XLS 2.5.293). A boundary
    // BETWEEN strings continues directly with the next string header.
    def readSstStrings(frags: IndexedSeq[Array[Byte]], count: Int): Seq[String] = {
      var frag = 0
      var off = 8 // skip cstTotal/cstUnique in the first fragment
      def atEnd: Boolean = frag >= frags.length ||
        (off >= frags(frag).length && frag == frags.length - 1)
      def advance(): Unit =
        if (off >= frags(frag).length && frag < frags.length - 1) { frag += 1; off = 0 }
      def u8(): Int = { advance(); val v = frags(frag)(off) & 0xFF; off += 1; v }
      def u16(): Int = u8() | (u8() << 8)
      val out = ArrayBuffer.empty[String]
      var i = 0
      while (i < count && !atEnd) {
        val cch = u16()
        var grbit = u8()
        if ((grbit & ~1) != 0)
          throw new IllegalArgumentException("xls: rich/ext strings unsupported")
        val sb = new StringBuilder
        var remaining = cch
        while (remaining > 0) {
          advance()
          if (off >= frags(frag).length)
            throw new IllegalArgumentException("xls: truncated SST")
          val avail = frags(frag).length - off
          val high = (grbit & 1) != 0
          val charBytes = if (high) 2 else 1
          val take = math.min(remaining, avail / charBytes)
          if (take == 0) {
            // boundary reached mid-string: next fragment re-declares grbit
            frag += 1; off = 0
            grbit = u8()
            if ((grbit & ~1) != 0)
              throw new IllegalArgumentException("xls: rich/ext strings unsupported")
          } else {
            sb.append(new String(frags(frag), off, take * charBytes,
              if (high) "UTF-16LE" else "ISO-8859-1"))
            off += take * charBytes
            remaining -= take
            if (remaining > 0) {
              // exhausted this fragment mid-string
              frag += 1; off = 0
              grbit = u8()
              if ((grbit & ~1) != 0)
                throw new IllegalArgumentException("xls: rich/ext strings unsupported")
            }
          }
        }
        out += sb.toString()
        i += 1
      }
      out.toSeq
    }

    // BIFF8 XLUnicodeString at offset `o` inside a record; returns (str, len)
    def readString(b: Array[Byte], o: Int): (String, Int) = {
      val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      val cch = bb.getShort(o) & 0xFFFF
      val grbit = b(o + 2) & 0xFF
      val high = (grbit & 1) != 0
      if ((grbit & ~1) != 0)
        throw new IllegalArgumentException("xls: rich/ext strings unsupported")
      if (high) (new String(b, o + 3, cch * 2, "UTF-16LE"), 3 + cch * 2)
      else (new String(b, o + 3, cch, "ISO-8859-1"), 3 + cch)
    }

    while (pos + 4 <= data.length) {
      val recType = buf.getShort(pos) & 0xFFFF
      val recLen = buf.getShort(pos + 2) & 0xFFFF
      val body = java.util.Arrays.copyOfRange(data, pos + 4, pos + 4 + recLen)
      val bb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
      recType match {
        case 0x809 => // BOF
          bofDepth += 1
          val substreamType = bb.getShort(2) & 0xFFFF
          if (substreamType == 0x10) sheetSeen += 1 // worksheet substream
        case 0x0A => bofDepth -= 1 // EOF
        case 0xFC => // SST, possibly spanning Continue (0x3C) records
          val frags = ArrayBuffer(body)
          var p2 = pos + 4 + recLen
          while (p2 + 4 <= data.length && (buf.getShort(p2) & 0xFFFF) == 0x3C) {
            val contLen = buf.getShort(p2 + 2) & 0xFFFF
            frags += java.util.Arrays.copyOfRange(data, p2 + 4, p2 + 4 + contLen)
            p2 += 4 + contLen
          }
          val unique = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN).getInt(4)
          sst ++= readSstStrings(frags.toIndexedSeq, unique)
        case 0xFD => // LABELSST
          put(bb.getShort(0) & 0xFFFF, bb.getShort(2) & 0xFFFF,
            sst.lift(bb.getInt(6)).getOrElse(""))
        case 0x204 => // LABEL (inline string)
          val (s, _) = readString(body, 6)
          put(bb.getShort(0) & 0xFFFF, bb.getShort(2) & 0xFFFF, s)
        case 0x203 => // NUMBER
          put(bb.getShort(0) & 0xFFFF, bb.getShort(2) & 0xFFFF, numToStr(bb.getDouble(6)))
        case 0x27E => // RK
          put(bb.getShort(0) & 0xFFFF, bb.getShort(2) & 0xFFFF, numToStr(rkToDouble(bb.getInt(6))))
        case 0xBD => // MULRK
          val row = bb.getShort(0) & 0xFFFF
          val colFirst = bb.getShort(2) & 0xFFFF
          val n = (recLen - 6) / 6
          for (i <- 0 until n)
            put(row, colFirst + i, numToStr(rkToDouble(bb.getInt(4 + i * 6 + 2))))
        case 0x205 => // BOOLERR
          val isErr = (body(7) & 0xFF) == 1
          if (!isErr) put(bb.getShort(0) & 0xFFFF, bb.getShort(2) & 0xFFFF,
            if (body(6) == 1) "True" else "False")
        case 0x2F => throw new IllegalArgumentException("xls: encrypted workbook unsupported")
        case _ => // skip
      }
      pos += 4 + recLen
    }

    if (maxRow < 0) IndexedSeq.empty
    else (0 to maxRow).map(r => (0 to maxCol).map(c => cells.getOrElse((r, c), "")))
  }
}
