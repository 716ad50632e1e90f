package graft

/** Shared PNG fixtures for the image-dedup specs: structured 64×64
  * grayscale images (smooth gradients with one distinctive region) — the
  * shape perceptual dHash is built for, where resizes preserve the
  * gradient field. One definition so the multimodal and streaming specs
  * cannot drift onto different images. */
object ImageFixtures {

  def render(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 64).foreach(y => (0 until 64).foreach { x =>
      val v = f(x, y) & 0xff; img.setRGB(x, y, (v << 16) | (v << 8) | v)
    })
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Diagonal gradient with a bright square. */
  val photo: Array[Byte] = render((x, y) =>
    if (x > 40 && x < 56 && y > 8 && y < 24) 250 else (x * 2 + y) / 2)

  /** Reversed gradient with a dark corner — far from [[photo]] in dHash. */
  val other: Array[Byte] = render((x, y) =>
    if (x < 24 && y > 40) 10 else 255 - (x + y * 2) / 2)
}
