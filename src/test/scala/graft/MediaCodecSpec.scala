package graft

import graft.functions.MediaCodec
import org.scalatest.funsuite.AnyFunSuite

/** MediaCodec is judged against INDEPENDENT referees: the JDK's own
  * readers (`javax.imageio.ImageIO`, `javax.sound.sampled.AudioSystem`)
  * must accept what our encoders write — down to pixel values and
  * sample-frame counts — and our decoders must correctly parse files
  * the JDK encoded (JPEG/GIF, which we deliberately only read). Plus
  * malformed-input behavior: truncation, CRC corruption, and garbage
  * all decode to None, never throw.
  */
class MediaCodecSpec extends AnyFunSuite {

  private val src: Array[Byte] =
    (0 until 1013).map(i => ((i * 131 + 7) % 251).toByte).toArray

  test("decodeImagePixels round-trips pngGray and bmp24 pixel-for-pixel") {
    val (w, h) = (37, 21)
    // PNG gray: pixel (x,y) = src[(y*w+x) mod L], via REAL inflate +
    // filter-byte strip.
    val png = MediaCodec.decodeImagePixels(MediaCodec.pngGray(w, h, src)).get
    assert(png.format == "png" && png.width == w && png.height == h)
    for (y <- 0 until h; x <- 0 until w)
      assert(png.get(x, y) == (src((y * w + x) % src.length) & 0xFF), s"png ($x,$y)")
    // BMP 24-bit: the blue channel at (x,y) = src[(y*w*3 + x*3) mod L],
    // through the bottom-up padded row layout.
    val bmp = MediaCodec.decodeImagePixels(MediaCodec.bmp24(w, h, src)).get
    assert(bmp.format == "bmp" && bmp.width == w && bmp.height == h)
    for (y <- 0 until h; x <- 0 until w)
      assert(bmp.get(x, y) == (src((y * w * 3 + x * 3) % src.length) & 0xFF), s"bmp ($x,$y)")
    // Unsupported/garbage inputs return None, never throw or lie.
    assert(MediaCodec.decodeImagePixels("not an image at all....".getBytes).isEmpty)
    assert(MediaCodec.decodeImagePixels(
      MediaCodec.pngGray(w, h, src).take(40)).isEmpty)
    assert(MediaCodec.decodeImagePixels(
      MediaCodec.wavPcm16(1, 8000, src)).isEmpty)
  }

  test("pngGray writes a PNG that ImageIO accepts, pixel-identical; decode reads IHDR") {
    val (w, h) = (123, 77)
    val png = MediaCodec.pngGray(w, h, src)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null, "ImageIO rejected our PNG")
    assert(img.getWidth == w && img.getHeight == h)
    val raster = img.getRaster
    for (y <- Seq(0, 1, 38, 76); x <- Seq(0, 1, 61, 122))
      assert(raster.getSample(x, y, 0) == (src((y * w + x) % src.length) & 0xFF),
        s"pixel ($x,$y) mismatch — scanline filtering or deflate is wrong")
    val m = MediaCodec.decode(png).get
    assert(m == MediaCodec.Meta("png", Some(w), Some(h),
      channels = Some(1), nFrames = Some(1L)))
  }

  test("bmp24 writes a BMP that ImageIO accepts, pixel-identical; decode reads the DIB header") {
    val (w, h) = (21, 13) // w*3 = 63: exercises row padding to 64
    val bmp = MediaCodec.bmp24(w, h, src)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    assert(img != null, "ImageIO rejected our BMP")
    assert(img.getWidth == w && img.getHeight == h)
    // BMP stores BGR bottom-up; we fill channel bytes from src in storage order.
    for (y <- Seq(0, 5, 12); x <- Seq(0, 7, 20)) {
      val base = y.toLong * w * 3 + x * 3
      val expB = src((base % src.length).toInt) & 0xFF
      val expG = src(((base + 1) % src.length).toInt) & 0xFF
      val expR = src(((base + 2) % src.length).toInt) & 0xFF
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xFF) == expR && ((rgb >> 8) & 0xFF) == expG && (rgb & 0xFF) == expB,
        s"pixel ($x,$y) mismatch — BGR order, padding, or bottom-up rows wrong")
    }
    val m = MediaCodec.decode(bmp).get
    assert(m == MediaCodec.Meta("bmp", Some(w), Some(h),
      channels = Some(3), nFrames = Some(1L)))
  }

  test("wavPcm16 writes a WAV that AudioSystem accepts; decode reads fmt/data") {
    val (ch, rate) = (2, 16000)
    val wav = MediaCodec.wavPcm16(ch, rate, src) // 1013 bytes → 253 frames of 4
    val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(wav))
    val fmt = aff.getFormat
    assert(fmt.getChannels == ch && fmt.getSampleRate == rate.toFloat
      && fmt.getSampleSizeInBits == 16)
    assert(aff.getFrameLength == 253, "frame count per the JDK's RIFF reader")
    val m = MediaCodec.decode(wav).get
    assert(m == MediaCodec.Meta("wav", channels = Some(ch), sampleRate = Some(rate),
      nFrames = Some(253L), durationMs = Some(253L * 1000 / rate)))
  }

  test("decodePcm16 round-trips wavPcm16 sample-exact; AudioSystem referees the stream") {
    // Mono and stereo, with a payload whose tail is truncated to whole
    // frames by the writer (1013 bytes: mono keeps 506 samples, stereo
    // 253 frames x 2).
    for (ch <- Seq(1, 2)) {
      val wav = MediaCodec.wavPcm16(ch, 8000, src)
      val (pch, samples) = MediaCodec.decodePcm16(wav).get
      assert(pch == ch)
      val kept = src.length - src.length % (2 * ch)
      assert(samples.length == kept / 2)
      // Expected samples straight from the payload bytes (LE signed).
      val expected = (0 until kept / 2).map(i =>
        ((src(2 * i) & 0xff) | (src(2 * i + 1) << 8)).toShort)
      assert(samples.toSeq == expected)
      // Referee: the JDK's own RIFF reader yields the identical PCM
      // byte stream.
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      val ref = ais.readAllBytes()
      assert(ref.length == kept)
      val refSamples = (0 until kept / 2).map(i =>
        ((ref(2 * i) & 0xff) | (ref(2 * i + 1) << 8)).toShort)
      assert(samples.toSeq == refSamples)
    }
  }

  test("decodePcm16 refuses garbage, truncation, and foreign containers") {
    assert(MediaCodec.decodePcm16("definitely not audio bytes".getBytes).isEmpty)
    val wav = MediaCodec.wavPcm16(2, 8000, src)
    assert(MediaCodec.decodePcm16(wav.take(30)).isEmpty) // truncated mid-header
    // A size field pointing past the buffer must refuse, not crash.
    val corrupt = wav.clone()
    corrupt(42) = 0x7f.toByte // blow up the data chunk length
    assert(MediaCodec.decodePcm16(corrupt).isEmpty)
    // Foreign container: a PNG is not audio.
    assert(MediaCodec.decodePcm16(MediaCodec.pngGray(8, 8, src)).isEmpty)
  }

  test("decode parses a JPEG the JDK encoded (SOF segment walk)") {
    val img = new java.awt.image.BufferedImage(200, 150,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(3, 4, 0xCAFE42)
    val bos = new java.io.ByteArrayOutputStream
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val m = MediaCodec.decode(bos.toByteArray).get
    assert(m.format == "jpeg" && m.width == Some(200) && m.height == Some(150)
      && m.channels == Some(3))
  }

  test("decode parses a GIF the JDK encoded (block walk, frame count)") {
    val img = new java.awt.image.BufferedImage(64, 48,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val m = MediaCodec.decode(bos.toByteArray).get
    assert(m.format == "gif" && m.width == Some(64) && m.height == Some(48)
      && m.nFrames == Some(1L))
  }

  test("avi round-trips through the RIFF tree walk") {
    val m = MediaCodec.decode(MediaCodec.avi(320, 240, 17, 40000, src)).get
    assert(m == MediaCodec.Meta("avi", Some(320), Some(240),
      nFrames = Some(17L), durationMs = Some(17L * 40)))
  }

  test("malformed inputs decode to None, never throw") {
    val png = MediaCodec.pngGray(32, 32, src)
    assert(MediaCodec.decode(null).isEmpty)
    assert(MediaCodec.decode(Array.emptyByteArray).isEmpty)
    assert(MediaCodec.decode(src).isEmpty, "arbitrary bytes must not sniff as media")
    assert(MediaCodec.decode(png.take(20)).isEmpty, "truncated PNG")
    val corrupt = png.clone
    corrupt(17) = (corrupt(17) ^ 0x7F).toByte // flip a width byte → CRC mismatch
    assert(MediaCodec.decode(corrupt).isEmpty, "IHDR CRC corruption must be caught")
    val truncWav = MediaCodec.wavPcm16(1, 8000, src).take(30)
    assert(MediaCodec.decode(truncWav).isEmpty, "WAV truncated before data chunk")
  }
}
