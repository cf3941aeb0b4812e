package graft

import graft.functions.Multimodal
import graft.functions.Multimodal.MediaRow
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Real media decode: actual PNG/BMP byte payloads flow through the same
  * per-partition decode path q31 uses, with javax.imageio (JDK-built-in)
  * in place of the stub — proving the multimodal plumbing carries real
  * codecs, not just the deterministic fake. */
class MediaDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def imageBytes(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) { img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff); y += 1 }
      x += 1
    }
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, bos), s"no JDK writer for $format")
    bos.toByteArray
  }

  test("real PNG and BMP payloads decode to true pixel dimensions per-partition") {
    val rows = Seq(
      MediaRow(1L, imageBytes(17, 9, "png")),
      MediaRow(2L, imageBytes(5, 23, "bmp")),
      MediaRow(3L, imageBytes(64, 64, "png")))
    val out = Multimodal.decodeBatchPartitions(rows.toDS(), () => Multimodal.decodeImage)
      .collect().map(d => d.doc_id -> ((d.width, d.height))).toMap
    assert(out == Map(1L -> ((17, 9)), 2L -> ((5, 23)), 3L -> ((64, 64))))
  }

  test("undecodable payloads are dropped, decodable ones survive (error split)") {
    val rows = Seq(
      MediaRow(1L, imageBytes(8, 8, "png")),
      MediaRow(2L, "this is not an image".getBytes("UTF-8")),
      MediaRow(3L, Array.empty[Byte]))
    val out = Multimodal.decodeBatchPartitions(rows.toDS(), () => Multimodal.decodeImage)
      .collect()
    assert(out.map(_.doc_id).toSet == Set(1L))
    assert(out.head.checksum.length == 32) // md5 hex of the payload
  }

  test("decodeSplit routes rejects to the error side with payloads intact") {
    val good = imageBytes(6, 7, "png")
    val bad = "not an image".getBytes("UTF-8")
    val (ok, rejected, tagged) = Multimodal.decodeSplit(
      Seq(MediaRow(1L, good), MediaRow(2L, bad)).toDS(), () => Multimodal.decodeImage)
    assert(ok.collect().map(d => d.doc_id -> ((d.width, d.height))).toMap ==
      Map(1L -> ((6, 7))))
    val rej = rejected.collect()
    assert(rej.map(_.doc_id).toSeq == Seq(2L))
    assert(java.util.Arrays.equals(rej.head.payload, bad),
      "dead-letter side must carry the original payload")
    tagged.unpersist()
  }

  test("truncated PNG (valid magic, corrupt body) maps to None, not an exception") {
    val full = imageBytes(16, 16, "png")
    val truncated = full.take(30) // keeps the PNG signature, cuts the body
    assert(Multimodal.decodeImage(truncated).isEmpty)
  }

  test("decode checksum matches md5 of the raw payload bytes") {
    val payload = imageBytes(3, 4, "png")
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(payload).map("%02x".format(_)).mkString
    val meta = Multimodal.decodeImage(payload).get
    assert(meta.checksum == expected && meta.width == 3 && meta.height == 4)
  }
}
