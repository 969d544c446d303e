package graft

import org.scalatest.funsuite.AnyFunSuite

/** The real-codec (javax.imageio) PNG path behind q_mm_png_decode: PNG is
  * lossless for 8-bit grayscale, so the decoded raster must equal the
  * generated splitmix64 pixels PER-PIXEL — a stronger claim than the
  * avg_pixel the DuckDB oracle hash-checks. If a JDK ever ships a lossy
  * or colorspace-converting gray PNG path, this fails before the oracle
  * gate does.
  */
class MultimodalSpec extends AnyFunSuite {

  private val side = 16

  private def pixels(id: Long): Array[Int] =
    Array.tabulate(side * side) { i =>
      (org.apache.spark.sql.graft.NativeExpressions
        .splitmix64Long(id * 256L + i) & 0xffL).toInt
    }

  test("PNG encode/decode roundtrip is per-pixel lossless") {
    javax.imageio.ImageIO.setUseCache(false)
    for (id <- Seq(0L, 1L, 7L, 12345L)) {
      val expected = pixels(id)
      val img = new java.awt.image.BufferedImage(side, side,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val r = img.getRaster
      expected.zipWithIndex.foreach { case (v, i) =>
        r.setSample(i % side, i / side, 0, v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val dec = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      assert(dec.getWidth == side && dec.getHeight == side)
      val r2 = dec.getRaster
      val got = Array.tabulate(side * side)(i =>
        r2.getSample(i % side, i / side, 0))
      assert(got.toSeq == expected.toSeq)
    }
  }

  test("WAV encode/decode roundtrip is per-sample lossless") {
    for (id <- Seq(0L, 3L, 999L)) {
      val n = 512
      val pcm = Array.tabulate(n) { i =>
        (org.apache.spark.sql.graft.NativeExpressions
          .splitmix64Long(id * 1024L + i) & 0xffL).toByte
      }
      // the hand-assembled container must be byte-identical to what the
      // JDK's own WAV writer emits for this format — the contract that
      // keeps writeWav honest
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      val wav = graft.operators.MultimodalQueries.writeWav(pcm)
      assert(wav.toSeq == bos.toByteArray.toSeq)
      // and the real JDK reader must decode it back to the exact samples
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      assert(in.getFormat.getSampleSizeInBits == 8)
      assert(in.getFormat.getSampleRate == 8000f)
      assert(in.readAllBytes().toSeq == pcm.toSeq)
    }
  }

  test("q_mm_audio_frames replays the splitmix PCM feature arithmetic") {
    import SparkFixture.{spark, sfDir}
    import org.apache.spark.sql.graft.NativeExpressions
    val out = SparkEntry.queries("q_mm_audio_frames")(spark, sfDir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val nDocs = graft.engine.Tables.documents(spark, sfDir).count()
    assert(out.size == nDocs * 8, "8 frames per document")
    // brute-force replay for a handful of docs
    out.keys.map(_._1).toSeq.distinct.sorted.take(5).foreach { id =>
      val sv = Array.tabulate(512) { i =>
        ((NativeExpressions.splitmix64Long(id * 1024L + i) & 0xffL)
          - 128L).toInt
      }
      (0 until 8).foreach { f =>
        val fr = sv.slice(f * 64, f * 64 + 64)
        val energy = fr.map(s => s.toLong * s).sum
        val zcr = fr.zip(fr.drop(1)).count { case (a, b) => a * b < 0 }
        val peak = fr.map(math.abs).max
        assert(out((id, f.toLong)) == ((energy, zcr.toLong, peak.toLong)),
          s"doc $id frame $f")
      }
    }
  }

  test("q_mm_png_decode emits one row per document with in-range stats") {
    import SparkFixture.{spark, sfDir}
    val out = SparkEntry.queries("q_mm_png_decode")(spark, sfDir).collect()
    val nDocs = graft.engine.Tables.documents(spark, sfDir).count()
    assert(out.length == nDocs)
    assert(out.forall(r => r.getInt(1) == side && r.getInt(2) == side &&
      r.getBoolean(3) && r.getDouble(4) >= 0.0 && r.getDouble(4) <= 255.0))
  }

  test("q_mm_resize_real survives two codec round-trips per-pixel") {
    import SparkFixture.{spark, sfDir}
    val out = SparkEntry.queries("q_mm_resize_real")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getString(4))).toMap
    out.foreach { case (id, (w, h, sum, gotMd5)) =>
      assert(w == 8 && h == 8)
      // NN-downsample of the splitmix raster: out(k) = in((2·(k/8))·16
      // + 2·(k%8)) — the exact contract the operator and oracle share
      val px = pixels(id)
      val sampled = Array.tabulate(64)(k => px((2 * (k / 8)) * 16 + 2 * (k % 8)))
      assert(sum == sampled.map(_.toLong).sum, s"doc $id pixel sum")
      val hex = sampled.map(v => f"$v%02x").mkString
      val expMd5 = java.security.MessageDigest.getInstance("MD5")
        .digest(hex.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      assert(gotMd5 == expMd5, s"doc $id raster digest")
    }
  }
}
