package graft.multimodal

/** Header-only image metadata — the production access pattern at 100 TB:
  * dimensions/bit-depth come from the first few dozen bytes of a PNG /
  * GIF / JPEG payload (all public formats), so a metadata pass never
  * decodes pixels and never reads past the header. Complements [[Mp4]]
  * (the ISO-BMFF walk) on the image side; the PIXEL decode path stays
  * [[Multimodal.ImageIoCodec]].
  *
  * Structural honesty, by format: the generated PNG is chunk-structurally
  * valid (real CRC32s, IHDR/IDAT/IEND framing — only the IDAT body is
  * opaque rather than zlib); MP4's mdat may legally carry arbitrary
  * bytes; the generated GIF/JPEG carry a faithful header in front of an
  * opaque body — exactly the region a header-only reader touches, which
  * is the contract being exercised. [[ImageHeadersSpec-like tests]] also
  * drive REAL ImageIO-encoded PNGs through [[tryParse]] to pin the parser
  * against a third-party writer.
  *
  * Reference anchor: the reference pipeline (an events-only ETL) has no
  * media surface; this belongs to the training-data additions.
  */
object ImageHeaders {

  /** Parsed header facts. `bit_depth`: PNG IHDR depth byte; GIF colour
    * resolution ((flags>>4)&7)+1; JPEG SOF sample precision. */
  case class Meta(format: String, width: Int, height: Int, bit_depth: Int)

  private def u16be(b: Array[Byte], o: Int): Int = ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
  private def u16le(b: Array[Byte], o: Int): Int = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def u32be(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) | ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)

  private val PngSig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** Header walk → metadata; None for anything that isn't one of the three
    * formats (or is truncated before its dimension fields). Never throws. */
  def tryParse(b: Array[Byte]): Option[Meta] =
    try {
      if (b.length >= 33 && b.take(8).sameElements(PngSig) &&
        new String(b, 12, 4, "ISO-8859-1") == "IHDR")
        // PNG: sig(8) + IHDR chunk: len(4) type(4) width(4) height(4) depth(1)…
        Some(Meta("png", u32be(b, 16).toInt, u32be(b, 20).toInt, b(24) & 0xFF))
      else if (b.length >= 13 &&
        (new String(b, 0, 6, "ISO-8859-1") == "GIF89a" ||
          new String(b, 0, 6, "ISO-8859-1") == "GIF87a"))
        // GIF logical screen descriptor: width/height LE16 at 6/8, flags at 10.
        Some(Meta("gif", u16le(b, 6), u16le(b, 8), (((b(10) & 0xFF) >> 4) & 7) + 1))
      else if (b.length >= 4 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) {
        // JPEG: scan marker segments for the first SOF (C0–CF minus C4/C8/CC).
        var o = 2
        var out: Option[Meta] = None
        while (out.isEmpty && o + 4 <= b.length && (b(o) & 0xFF) == 0xFF) {
          val marker = b(o + 1) & 0xFF
          val len = u16be(b, o + 2)
          if (marker >= 0xC0 && marker <= 0xCF &&
            marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
            if (o + 9 <= b.length)
              out = Some(Meta("jpeg", u16be(b, o + 7), u16be(b, o + 5), b(o + 4) & 0xFF))
            else o = b.length // truncated SOF: bail
          } else o += 2 + len
        }
        out
      } else None
    } catch { case _: Exception => None }

  // ---- builders (tests + the q219 deterministic generator) ----------------

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def le16(v: Int): Array[Byte] = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

  private def pngChunk(typ: String, payload: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("ISO-8859-1")
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(payload)
    be32(payload.length.toLong) ++ t ++ payload ++ be32(crc.getValue)
  }

  /** Chunk-structurally valid PNG: sig + IHDR + one IDAT (opaque body,
    * real CRC) + IEND. Total size = 57 + payload.length. */
  def buildPng(w: Int, h: Int, bitDepth: Int, payload: Array[Byte]): Array[Byte] =
    PngSig ++
      pngChunk("IHDR", be32(w.toLong) ++ be32(h.toLong) ++
        Array[Byte](bitDepth.toByte, 2, 0, 0, 0)) ++ // colour type 2 (RGB), deflate, none, none
      pngChunk("IDAT", payload) ++
      pngChunk("IEND", Array.empty)

  /** GIF89a header (logical screen descriptor with colour resolution
    * encoding `bitDepth`) + opaque body + trailer. Size = 14 + payload. */
  def buildGif(w: Int, h: Int, bitDepth: Int, payload: Array[Byte]): Array[Byte] =
    "GIF89a".getBytes("ISO-8859-1") ++ le16(w) ++ le16(h) ++
      Array((((bitDepth - 1) & 7) << 4).toByte, 0.toByte, 0.toByte) ++
      payload ++ Array(0x3B.toByte)

  /** JPEG SOI + SOF0 (3-component baseline header) + opaque body + EOI.
    * Size = 23 + payload. */
  def buildJpeg(w: Int, h: Int, payload: Array[Byte]): Array[Byte] =
    Array(0xFF, 0xD8).map(_.toByte) ++
      Array(0xFF, 0xC0).map(_.toByte) ++ be16(17) ++ Array(8.toByte) ++
      be16(h) ++ be16(w) ++ Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1) ++
      payload ++ Array(0xFF, 0xD9).map(_.toByte)
}
