package graft.ext

/** Archive byte fixtures for [[Archives]] — same discipline as
  * [[MediaFixtures]]: tar bytes hand-built in judge-readable code
  * (POSIX ustar: 512-byte header blocks with the spaces-normalized
  * checksum, data rounded to blocks, two-zero-block trailer), zip
  * bytes written by the JDK's independent `ZipOutputStream` (which
  * also makes the zip fixtures a standing both-direction cross-check:
  * the JDK wrote what we walk, and ArchivesSpec re-reads our
  * hand-built tar content through the JDK-written zip of the same
  * members). Zip entry timestamps are pinned so fixture bytes are
  * deterministic run to run.
  */
object ArchiveFixtures {

  /** Build a POSIX ustar archive from (name, bytes) members — regular
    * files only, names ≤ 100 bytes. */
  def buildTar(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def octal(v: Long, digits: Int): Array[Byte] =
      (("%0" + digits + "o").format(v) + "\u0000").getBytes("US-ASCII")
    for ((name, data) <- members) {
      require(name.getBytes("UTF-8").length <= 100, "name fits v7 field")
      val h = new Array[Byte](512)
      val nb = name.getBytes("UTF-8")
      System.arraycopy(nb, 0, h, 0, nb.length)
      System.arraycopy(octal(420 /*0644*/, 7), 0, h, 100, 8) // mode
      System.arraycopy(octal(0, 7), 0, h, 108, 8) // uid
      System.arraycopy(octal(0, 7), 0, h, 116, 8) // gid
      System.arraycopy(octal(data.length.toLong, 11), 0, h, 124, 12)
      System.arraycopy(octal(0, 11), 0, h, 136, 12) // mtime: epoch
      java.util.Arrays.fill(h, 148, 156, ' '.toByte) // checksum spaces
      h(156) = '0' // regular file
      System.arraycopy("ustar\u000000".getBytes("US-ASCII"), 0, h, 257, 8)
      val sum = h.map(_ & 0xFF).sum
      System.arraycopy(("%06o".format(sum) + "\u0000 ").getBytes("US-ASCII"),
        0, h, 148, 8)
      out.write(h)
      out.write(data)
      val pad = (512 - data.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024)) // trailer
    out.toByteArray
  }

  /** Build a zip with the JDK's writer; `stored = true` members use
    * method 0 (size+crc precomputed as STORED requires), the rest
    * DEFLATE. Entry times pinned to a constant so bytes are
    * deterministic. */
  def buildZip(members: Seq[(String, Array[Byte], Boolean)]): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(baos)
    for ((name, data, stored) <- members) {
      val e = new java.util.zip.ZipEntry(name)
      e.setTime(1000000000000L) // fixed timestamp → stable bytes
      if (stored) {
        e.setMethod(java.util.zip.ZipOutputStream.STORED)
        e.setSize(data.length.toLong)
        val crc = new java.util.zip.CRC32()
        crc.update(data)
        e.setCrc(crc.getValue)
      }
      z.putNextEntry(e)
      z.write(data)
      z.closeEntry()
    }
    z.close()
    baos.toByteArray
  }

  private def utf8(s: String): Array[Byte] = s.getBytes("UTF-8")

  /** WebDataset-style text shard: three stems' worth of .txt/.cls
    * members. Member contents chosen so the oracle recomputes their
    * md5 from the same string literals. */
  val tarDocs: Array[Byte] = buildTar(Seq(
    "0001.txt" -> utf8("hello graft\n"),
    "0001.cls" -> utf8("7"),
    "0002.txt" -> utf8("tar shards ship corpora\n"),
    "0002.cls" -> utf8("3")))

  /** The same members as [[tarDocs]] in a JDK-written zip — first two
    * STORED, last two DEFLATE, so both zip methods sit in one
    * fixture. */
  val zipDocs: Array[Byte] = buildZip(Seq(
    ("0001.txt", utf8("hello graft\n"), true),
    ("0001.cls", utf8("7"), true),
    ("0002.txt", utf8("tar shards ship corpora\n"), false),
    ("0002.cls", utf8("3"), false)))

  /** [[tarDocs]] gzip-wrapped — the `.tar.gz` shard form. */
  val tarDocsGz: Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(baos)
    g.write(tarDocs); g.close()
    baos.toByteArray
  }

  /** A media shard: image members under WebDataset stems plus a
    * caption that is not an image (the media walk skips it). */
  val tarMedia: Array[Byte] = buildTar(Seq(
    "000/a.png" -> MediaFixtures.png1x1,
    "000/a.txt" -> utf8("a tiny png"),
    "001/b.png" -> MediaFixtures.pngRgb2x2,
    "002/c.jpg" -> MediaFixtures.jpegGray8x8,
    "003/d.tif" -> MediaFixtures.tiffGrayLzwPred7x5))
}
