package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real image codec over the JDK's built-in readers (PNG/BMP/GIF/JPEG via
  * `javax.imageio` — pure JVM, no native libs, works headless). This backs
  * the multimodal pipeline's decode stage for image kinds; formats the
  * JDK can't read fall back to [[Multimodal.StubCodec]], keeping the
  * pipeline total.
  *
  * Features derive from DECODED PIXELS, not payload bytes, so results are
  * encoder-invariant: any valid PNG of the same image yields identical
  * features under any partitioning — the reproducibility property a
  * 100 TB decode run needs. All-integer arithmetic; values bounded well
  * under 2^31 per item so ANSI-mode Long sums can't overflow at scale.
  */
object ImageCodec {
  ImageIO.setUseCache(false) // in-memory streams; never spool to temp files

  /** Fixed 8-dim integer feature vector (matches StubCodec.Dim):
    * [width, height, meanR, meanG, meanB, darkLuma, midLuma, brightLuma].
    */
  val Dim = 8

  def decode(payload: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(payload)))
    catch { case _: Exception => None }

  def features(img: BufferedImage): Array[Long] = {
    val w = img.getWidth
    val h = img.getHeight
    val rgb = img.getRGB(0, 0, w, h, null, 0, w)
    var sr = 0L; var sg = 0L; var sb = 0L
    val hist = new Array[Long](3) // luma terciles: <85, 85-169, >=170
    var i = 0
    while (i < rgb.length) {
      val p = rgb(i)
      val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
      sr += r; sg += g; sb += b
      // ITU-R BT.709 integer luma
      val luma = (2126 * r + 7152 * g + 722 * b) / 10000
      hist(if (luma < 85) 0 else if (luma < 170) 1 else 2) += 1
      i += 1
    }
    val n = math.max(rgb.length, 1).toLong
    Array(w.toLong, h.toLong, sr / n, sg / n, sb / n, hist(0), hist(1), hist(2))
  }

  /** Deterministic PNG encode of packed-RGB pixels — used to synthesize
    * image payloads in tests and the m02 image path. */
  def encodePng(width: Int, height: Int, rgb: Array[Int]): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, width, height, rgb, 0, width)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Decode every frame of a (possibly animated) image payload. A still
    * PNG/BMP/JPEG yields one frame; an animated GIF yields all of them.
    * None when no installed reader claims the bytes or decode fails. */
  def decodeFrames(payload: Array[Byte]): Option[IndexedSeq[BufferedImage]] =
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val rd = readers.next()
          rd.setInput(iis)
          try Some((0 until rd.getNumImages(true)).map(rd.read))
          finally rd.dispose()
        }
      } finally iis.close() // memory-backed (setUseCache(false)), but this
                            // runs once per media item — don't lean on GC
    } catch { case _: Exception => None }

  /** Rolling hash over decoded RGB pixels — the frame identity used by the
    * sampling pipeline. Bounded < 2^31 so Long sums over billions of frames
    * can't overflow under ANSI mode. */
  def pixelChecksum(img: BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val rgb = img.getRGB(0, 0, w, h, null, 0, w)
    var hsh = 5381L
    var i = 0
    while (i < rgb.length) { hsh = (hsh * 33 + (rgb(i) & 0xffffff)) % 2147483647L; i += 1 }
    hsh
  }

  /** Multi-frame animated GIF encode of 8-bit grayscale frames. A GIF
    * palette holds 256 entries, so grayscale round-trips EXACTLY through
    * the JDK writer (verified in MultimodalSpec) — which is what lets the
    * frame-sampling pipeline assert on decoded pixel values rather than
    * container bytes. */
  def encodeGif(width: Int, height: Int, frames: Seq[Array[Int]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val wr = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(out)
    wr.setOutput(ios)
    wr.prepareWriteSequence(null)
    frames.foreach { gray =>
      val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var i = 0
      while (i < gray.length) { raster.setSample(i % width, i / width, 0, gray(i) & 0xff); i += 1 }
      wr.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    wr.endWriteSequence()
    ios.close()
    wr.dispose()
    out.toByteArray
  }

  /** Same, as BMP — a second real container format for coverage. */
  def encodeBmp(width: Int, height: Int, rgb: Array[Int]): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, width, height, rgb, 0, width)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "bmp", out)
    out.toByteArray
  }
}
