package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus batch-shaped decode and
  * feature extraction.
  *
  * All three modalities are REAL end-to-end over pure-JVM parsers of
  * actual payload bytes — images via javax.imageio
  * ([[decodeImagesBatched]], [[imageHashesBatched]],
  * [[imageFeaturesBatched]]), audio via the bounded RIFF/PCM WAV parser
  * ([[decodeWavBatched]], [[audioFingerprintsBatched]]), video via the
  * bounded YUV4MPEG2 parser ([[decodeY4mBatched]],
  * [[frameSampleBatched]], [[videoFingerprintsBatched]]). A JNI/FFmpeg
  * codec for compressed containers would drop into the same
  * mapPartitions batch seam.
  */
object Multimodal {

  /** Canonical asset schema: payload + typed metadata, the layout a
    * 100 TB media lake would use (payload column pruned away unless a
    * stage actually touches bytes). */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType, nullable = false),
      StructField("source", StringType, nullable = true),
      StructField("header_md5", StringType, nullable = true))), nullable = true)))

  /** Decode an image payload with a HEADER-ONLY size pre-check: the
    * format header's declared dimensions are read before any pixel
    * allocation, and anything past `maxPixels` (default 2^26 ≈ 67 MP,
    * ~256 MB of ARGB ints) is rejected as undecodable. Without the
    * check, a decompression-bomb PNG declaring 100000×100000 makes
    * ImageIO.read allocate ~40 GB and die with OutOfMemoryError —
    * killing the task, not degrading the row, which breaks the
    * corrupt-object contract every batched decode op documents. Shared
    * by the hash and feature seams. */
  private[graft] def readImageBounded(bytes: Array[Byte],
                                      maxPixels: Long = 1L << 26): Option[java.awt.image.BufferedImage] = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    // createImageInputStream is documented to return null when no SPI
    // can wrap the input — degrade, don't NPE in the finally close()
    if (in == null) return None
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(in)
          val w = r.getWidth(0).toLong; val h = r.getHeight(0).toLong
          if (w <= 0 || h <= 0 || w * h > maxPixels) None
          else Option(r.read(0))
        } finally r.dispose()
      }
    } finally in.close()
  }

  /** Wrap a text table as binary assets (the driver's documents stand in
    * for media payloads; byte-identical round trip). */
  def toAssets(docs: DataFrame, idCol: String, textCol: String, sourceCol: String): DataFrame =
    docs.select(
      col(idCol).as("asset_id"),
      lit("text/plain").as("media_type"),
      col(textCol).cast(BinaryType).as("payload"),
      struct(
        length(col(textCol).cast(BinaryType)).cast(LongType).as("n_bytes"),
        col(sourceCol).as("source"),
        md5(substring(col(textCol).cast(BinaryType), 1, 16)).as("header_md5")).as("meta"))

  /** Content-prefix features of an OPAQUE payload (no media decode —
    * these are honest byte-level features, useful as a cheap pre-filter
    * before any codec runs): the first 4 character code points of the
    * UTF-8-decoded payload, scaled by 1/255 (ASCII lands in [0, 1];
    * higher code points exceed it). Decoding the whole
    * payload then indexing CHARACTERS (not a byte prefix) avoids
    * splitting a multi-byte sequence. Built-ins only → stays in codegen. */
  def byteFeatures(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(sequence(lit(1), lit(4)), i =>
      coalesce(ascii(payload.cast(StringType).substr(i.cast(IntegerType), lit(1))),
        lit(0)).cast(DoubleType) / 255.0)

  /** Deterministic IMAGE assets derived from a driver table: each row id
    * becomes a real PNG (javax.imageio encoder, pure JVM) whose
    * dimensions derive from the id — `width = 16 + id % 8`,
    * `height = 8 + id % 4` — and whose pixels are a solid id-derived
    * color. The derivation is what makes the REAL decode oracle-checkable:
    * DuckDB can't read a PNG, but it can recompute `16 + id % 8`.
    * Generated on executors inside mapPartitions (batch-amortized like
    * the decode seam; no driver-side loop). */
  def toImageAssets(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = 16 + (id % 8).toInt
          val h = 8 + (id % 4).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val rgb = (id * 2654435761L & 0xFFFFFF).toInt
          var y = 0
          while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          (id, "image/png", out.toByteArray)
        }
      }.toDF("asset_id", "media_type", "payload")
  }

  /** REAL pure-JVM media decode behind the batched seam (the r6 backlog's
    * "stop stubbing the decoder"): for image-typed payloads, javax.imageio
    * parses the actual bytes and reports pixel dimensions plus the
    * decoded format name; non-image or undecodable payloads yield nulls
    * (a corrupt object in a 100 TB lake must degrade to a null row, not
    * kill the batch). Same mapPartitions batch shape as
    * [[imageFeaturesBatched]] — a JNI/FFmpeg decoder drops into the
    * same loop. */
  def decodeImagesBatched(assets: DataFrame, batchSize: Int = 256): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, mediaType, payload) =>
            val bytes = Option(payload).getOrElse(Array.empty[Byte])
            val decoded: Option[(Int, Int, String)] =
              if (mediaType == null || !mediaType.startsWith("image/")) None
              else try {
                val in = javax.imageio.ImageIO.createImageInputStream(
                  new java.io.ByteArrayInputStream(bytes))
                try {
                  val readers = javax.imageio.ImageIO.getImageReaders(in)
                  if (!readers.hasNext) None
                  else {
                    val r = readers.next()
                    try {
                      r.setInput(in)
                      // header-only decode: dimensions come from the
                      // format header without materializing pixel data —
                      // the cheap metadata pass a lake-wide audit wants
                      Some((r.getWidth(0), r.getHeight(0), r.getFormatName.toLowerCase))
                    } finally r.dispose()
                  }
                } finally in.close()
              } catch { case _: Exception => None }
            (id, bytes.length.toLong,
              decoded.map(_._1), decoded.map(_._2), decoded.map(_._3))
          }
        }
      }.toDF("asset_id", "n_bytes", "width", "height", "format")
  }

  /** Deterministic PATTERNED image assets for the perceptual-hash path:
    * a 9×8 grid (the dHash geometry) where every channel of cell (x, y)
    * is `gray(id, x, y) = (id*(1 + x + 9*y) + x*7 + y*13) % 256` —
    * id-derivable
    * arithmetic, so the DuckDB oracle can recompute the exact hash a
    * correct decode of the real PNG bytes must produce (same trick as
    * [[toImageAssets]]' dimension derivation). `scale` > 1 writes each
    * grid cell as a scale×scale pixel block: the decoded image then has
    * real downscaling work to do, and its hash must equal the scale=1
    * hash bit-for-bit (ImageHashSpec pins this). */
  def toPatternedImageAssets(docs: DataFrame, idCol: String, scale: Int = 1): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val img = new java.awt.image.BufferedImage(
            9 * scale, 8 * scale, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var gy = 0
          while (gy < 8) {
            var gx = 0
            while (gx < 9) {
              val g = ((id * (1 + gx + 9 * gy) + gx * 7 + gy * 13) % 256).toInt
              val rgb = (g << 16) | (g << 8) | g
              var dy = 0
              while (dy < scale) {
                var dx = 0
                while (dx < scale) {
                  img.setRGB(gx * scale + dx, gy * scale + dy, rgb)
                  dx += 1
                }
                dy += 1
              }
              gx += 1
            }
            gy += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          (id, "image/png", out.toByteArray)
        }
      }.toDF("asset_id", "media_type", "payload")
  }

  /** Perceptual image hashes over the REAL decode path (r9 — closes the
    * multimodal loop from decode to dedup): for each image payload,
    * ImageIO decodes the actual pixels, an integer box-average downscales
    * them to the canonical 9×8 grid, and two public perceptual hashes
    * pack into 64-bit longs:
    *
    *  - `dhash` (difference hash): bit y*8+x = gray(x+1, y) > gray(x, y)
    *    — gradient direction, robust to uniform brightness shifts.
    *  - `ahash` (average hash): over the grid's 8×8 left block, bit
    *    y*8+x = gray(x, y) > mean — coarse luminance layout.
    *
    * All arithmetic is integer (luma = (299r + 587g + 114b)/1000, means
    * are floor divisions), so the hash is bit-deterministic across JVMs
    * and recomputable in SQL by the oracle. Undecodable/non-image/too-
    * small payloads degrade to null hashes per row, like
    * [[decodeImagesBatched]]. Same mapPartitions batch seam. */
  def imageHashesBatched(assets: DataFrame, batchSize: Int = 256): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, mediaType, payload) =>
            val hashes: Option[(Long, Long)] =
              if (mediaType == null || !mediaType.startsWith("image/")) None
              else try {
                Multimodal.readImageBounded(Option(payload).getOrElse(Array.empty[Byte]))
                  .filter(img => img.getWidth >= 9 && img.getHeight >= 8)
                  .map(Multimodal.perceptualHashes)
              } catch { case _: Exception => None }
            (id, hashes.map(_._1), hashes.map(_._2))
          }
        }
      }.toDF("asset_id", "dhash", "ahash")
  }

  /** The grid + packing shared by the batched op above: pure integer
    * math on the decoded pixels. Package-visible for ImageHashSpec. */
  private[graft] def perceptualHashes(img: java.awt.image.BufferedImage): (Long, Long) = {
    val w = img.getWidth; val h = img.getHeight
    val grid = Array.ofDim[Int](8, 9) // [y][x] integer box-average luma
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 9) {
        val x0 = gx * w / 9; val x1 = (gx + 1) * w / 9
        val y0 = gy * h / 8; val y1 = (gy + 1) * h / 8
        var sum = 0L; var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
            sum += (299 * r + 587 * g + 114 * b) / 1000
            n += 1
            x += 1
          }
          y += 1
        }
        grid(gy)(gx) = (sum / n).toInt
        gx += 1
      }
      gy += 1
    }
    var dhash = 0L; var ahash = 0L
    var aSum = 0L
    var yy = 0
    while (yy < 8) {
      var xx = 0
      while (xx < 8) { aSum += grid(yy)(xx); xx += 1 }
      yy += 1
    }
    val mean = aSum / 64
    yy = 0
    while (yy < 8) {
      var xx = 0
      while (xx < 8) {
        val bit = yy * 8 + xx
        if (grid(yy)(xx + 1) > grid(yy)(xx)) dhash |= (1L << bit)
        if (grid(yy)(xx) > mean) ahash |= (1L << bit)
        xx += 1
      }
      yy += 1
    }
    (dhash, ahash)
  }

  /** REAL image feature vectors over the real decode (closes the last
    * fake component from r11): ImageIO parses the payload pixels, then two
    * classical global descriptors concatenate into one `array<double>`:
    *
    *  - pooled-luma grid (`gridH` × `gridW` integer box-averages of the
    *    luma plane, row-major, normalized /255) — coarse spatial layout,
    *    the same downscale geometry as [[perceptualHashes]];
    *  - per-channel color histogram (`histBins` equal-width bins per R/G/B
    *    channel, as pixel fractions) — global color distribution.
    *
    * All binning is integer arithmetic (luma = (299r+587g+114b)/1000,
    * pooled cell = floor(sum/n), bin = c*histBins/256) so the vector is
    * bit-deterministic across JVMs and SQL-recomputable by the oracle on
    * the patterned synthetic PNGs. Undecodable / non-image / sub-grid
    * payloads degrade to a null row (a corrupt object in a 100 TB lake
    * must not kill the batch). Same mapPartitions batch seam as the other
    * decode ops — a native (JNI/FFmpeg) batch decoder drops into the same
    * loop. Output: (asset_id, width, height, features). */
  def imageFeaturesBatched(
      assets: DataFrame,
      gridW: Int = 3,
      gridH: Int = 2,
      histBins: Int = 4,
      batchSize: Int = 256): DataFrame = {
    require(gridW > 0 && gridH > 0 && histBins > 0 && 256 % histBins == 0,
      s"grid must be positive and histBins must divide 256, got ${(gridW, gridH, histBins)}")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, mediaType, payload) =>
            val decoded: Option[(Int, Int, Array[Double])] =
              if (mediaType == null || !mediaType.startsWith("image/")) None
              else try {
                Multimodal.readImageBounded(Option(payload).getOrElse(Array.empty[Byte]))
                  .filter(img => img.getWidth >= gridW && img.getHeight >= gridH)
                  .map(img => (img.getWidth, img.getHeight,
                    Multimodal.imageFeatures(img, gridW, gridH, histBins)))
              } catch { case _: Exception => None }
            (id, decoded.map(_._1), decoded.map(_._2), decoded.map(_._3))
          }
        }
      }.toDF("asset_id", "width", "height", "features")
  }

  /** The descriptor math shared by the batched op above: pure integer
    * binning on decoded pixels. Package-visible for the spec. Layout:
    * positions [0, gridW*gridH) pooled luma row-major; then histBins
    * red fractions, histBins green, histBins blue. */
  private[graft] def imageFeatures(
      img: java.awt.image.BufferedImage,
      gridW: Int, gridH: Int, histBins: Int): Array[Double] = {
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Double](gridW * gridH + 3 * histBins)
    var gy = 0
    while (gy < gridH) {
      var gx = 0
      while (gx < gridW) {
        val x0 = gx * w / gridW; val x1 = (gx + 1) * w / gridW
        val y0 = gy * h / gridH; val y1 = (gy + 1) * h / gridH
        var sum = 0L; var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
            sum += (299 * r + 587 * g + 114 * b) / 1000
            n += 1
            x += 1
          }
          y += 1
        }
        out(gy * gridW + gx) = (sum / n).toDouble / 255.0
        gx += 1
      }
      gy += 1
    }
    val counts = Array.ofDim[Long](3, histBins)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        counts(0)((((rgb >> 16) & 0xFF) * histBins) / 256) += 1
        counts(1)((((rgb >> 8) & 0xFF) * histBins) / 256) += 1
        counts(2)(((rgb & 0xFF) * histBins) / 256) += 1
        x += 1
      }
      y += 1
    }
    val total = (w.toLong * h).toDouble
    var ch = 0
    while (ch < 3) {
      var b = 0
      while (b < histBins) {
        out(gridW * gridH + ch * histBins + b) = counts(ch)(b).toDouble / total
        b += 1
      }
      ch += 1
    }
    out
  }

  // ------------------------------------------------- audio (r13)

  /** Deterministic AUDIO assets (r13 — the second real modality): each
    * row id becomes a real RIFF/WAVE file — canonical 44-byte header +
    * 16-bit mono PCM — whose content is pure id arithmetic, which is
    * what makes the REAL byte-level decode oracle-checkable (DuckDB
    * can't parse a WAV, but it can recompute `8000 + id % 4 * 4000`):
    *   - sample rate: 8000 + (id % 4) · 4000 Hz
    *   - (48 + id % 3) windows of 160 samples each
    *   - window `w` is a period-8 square wave at amplitude
    *     A(id, w) = 4000 + (((id % 16)·31 + w·17) % 89) · 64, so ids
    *     congruent mod 16 share an amplitude ENVELOPE (the planted
    *     near-dup groups [[audioFingerprintsBatched]] pairs up), and
    *     ids ≡ 0 (mod 80) perturb one window by +5000 — larger than
    *     both envelope step sizes (+17·64 / −72·64), so depending on
    *     the neighboring step directions it flips 0, 1, or 2 delta
    *     bits: the near-but-not-exact fingerprint class
    *   - ids ≡ 3 (mod 10) are STEREO (r15 — VERDICT task 6: the r14
    *     per-frame channel downmix finally meets generator bytes): two
    *     interleaved 16-bit channels, L playing the asset's own
    *     amplitude law A(id, w) and R playing the NEXT window's
    *     A(id, w+1) — so the downmixed frame energy is exactly
    *     ⌊(A(id,w) + A(id,w+1)) / 2⌋, a genuinely different envelope
    *     (a moving average) the oracle recomputes with one CASE
    *   - ids ≡ 0 (mod 101) are CORRUPT (payload truncated to 10 bytes):
    *     every decode-side op must degrade them to null rows
    * Generated on executors inside mapPartitions, like
    * [[toImageAssets]]. */
  def toWavAssets(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val rate = 8000 + (id % 4).toInt * 4000
          val nWindows = 48 + (id % 3).toInt
          val channels = if (id % 10 == 3) 2 else 1
          val nFrames = nWindows * 160
          val data = new Array[Byte](nFrames * 2 * channels)
          var w = 0
          while (w < nWindows) {
            // channel c of window w plays A(id, w + c): mono keeps the
            // pre-r15 bytes EXACTLY; stereo's R channel leads by one
            // window so the cross-channel mean is a moving average
            val amps = Array.tabulate(channels)(c => wavAmplitude(id, w + c))
            var t = 0
            while (t < 160) {
              var c = 0
              while (c < channels) {
                val s = if ((t / 4) % 2 == 0) amps(c) else -amps(c)
                val i = ((w * 160 + t) * channels + c) * 2
                data(i) = (s & 0xFF).toByte
                data(i + 1) = ((s >> 8) & 0xFF).toByte
                c += 1
              }
              t += 1
            }
            w += 1
          }
          val full = wavBytes(rate, data, channels)
          val payload = if (id % 101 == 0) full.take(10) else full
          (id, "audio/wav", payload)
        }
      }.toDF("asset_id", "media_type", "payload")
  }

  /** The per-window amplitude law of [[toWavAssets]] — one definition
    * shared by the generator and the spec's hand-computed expectations. */
  private[graft] def wavAmplitude(id: Long, w: Int): Int = {
    val base = 4000 + ((((id % 16) * 31 + w * 17) % 89) * 64).toInt
    if (id % 80 == 0 && w == (id % 47).toInt + 1) base + 5000 else base
  }

  /** Canonical 44-byte PCM WAV envelope around a 16-bit interleaved
    * sample payload (mono or stereo). */
  private def wavBytes(sampleRate: Int, data: Array[Byte],
                       channels: Int = 1): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val blockAlign = 2 * channels
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort) // PCM
      .putInt(sampleRate).putInt(sampleRate * blockAlign)
      .putShort(blockAlign.toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(data.length)
      .put(data)
    out.array()
  }

  /** Bounded RIFF/WAVE parse (the [[readImageBounded]] contract for
    * audio): walks the chunk list, validates the fmt chunk (16-bit
    * mono/stereo PCM only), and rejects payloads whose DECLARED data
    * size exceeds `maxBytes` BEFORE allocating samples — a hostile
    * header claiming 4 GB must degrade the row, not OOM the task.
    * Returns (sampleRate, channels, bitsPerSample, samples). */
  private[graft] def readWavBounded(bytes: Array[Byte],
                                    maxBytes: Long = 1L << 26): Option[(Int, Int, Int, Array[Short])] = {
    if (bytes == null || bytes.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(at: Int): String =
      new String(bytes, at, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None // (rate, channels, bits)
    var data: Option[(Int, Int)] = None // (offset, size)
    while (pos + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(pos)
      val size = bb.getInt(pos + 4)
      if (size < 0 || pos + 8 + size.toLong > bytes.length) return None
      id match {
        case "fmt " if size >= 16 =>
          val audioFormat = bb.getShort(pos + 8).toInt
          val channels = bb.getShort(pos + 10).toInt
          val rate = bb.getInt(pos + 12)
          val bits = bb.getShort(pos + 22).toInt
          if (audioFormat != 1 || bits != 16 || channels < 1 || channels > 2 ||
            rate <= 0) return None
          fmt = Some((rate, channels, bits))
        case "data" =>
          if (size.toLong > maxBytes) return None
          data = Some((pos + 8, size))
        case _ => ()
      }
      pos += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    for ((rate, channels, bits) <- fmt; (off, size) <- data) yield {
      val n = size / 2
      val samples = new Array[Short](n)
      var i = 0
      while (i < n) { samples(i) = bb.getShort(off + i * 2); i += 1 }
      (rate, channels, bits, samples)
    }
  }

  /** REAL audio decode behind the batched seam: the RIFF header and PCM
    * payload of each asset are parsed from the actual bytes; corrupt /
    * non-audio payloads degrade to a null row. Output: (asset_id,
    * sample_rate, n_channels, bits_per_sample, n_samples, duration_ms)
    * — all BIGINT so the oracle compares without width coercion. */
  def decodeWavBatched(assets: DataFrame, batchSize: Int = 256): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, mediaType, payload) =>
            val decoded =
              if (mediaType == null || !mediaType.startsWith("audio/")) None
              else try readWavBounded(payload)
              catch { case _: Exception => None }
            decoded match {
              case Some((rate, ch, bits, samples)) =>
                val n = samples.length.toLong / ch
                (id, Some(rate.toLong), Some(ch.toLong), Some(bits.toLong),
                  Some(n), Some(n * 1000L / rate))
              case None => (id, None, None, None, None, None)
            }
          }
        }
      }.toDF("asset_id", "sample_rate", "n_channels", "bits_per_sample",
        "n_samples", "duration_ms")
  }

  /** Energy-envelope audio fingerprint: mean |sample| per 160-FRAME
    * window (pure integer — a constant-amplitude window's mean IS its
    * amplitude, exactly), then a 47-bit delta code (bit w = 1 iff
    * energy(w) > energy(w−1), w ∈ [1, 47]) packed into a long. Similar
    * loudness CONTOURS — the thing that survives re-encoding — map to
    * small hamming distances, so near-dup detection is
    * [[graft.ops.Dedup.hammingPairs]] over the `afp` column (the
    * dHash/phash_pairs shape, hot-block caps and all). Corrupt payloads
    * degrade to a null fingerprint, which the pair stage filters.
    *
    * Channel contract (r14, ADVICE): windows count FRAMES, and a
    * frame's energy contribution is the mean |sample| ACROSS channels —
    * a stereo asset's loudness contour, not an interleaved L/R zigzag
    * (windowing the raw interleaved array would silently halve every
    * window and mix channel phases). Mono output is bit-identical to
    * the pre-r14 definition (ch = 1 makes frames ≡ samples); a stereo
    * file whose channels are identical fingerprints exactly like its
    * mono downmix (AudioSpec pins both). */
  def audioFingerprintsBatched(assets: DataFrame, windowSamples: Int = 160,
                               batchSize: Int = 256): DataFrame = {
    require(windowSamples > 0, s"windowSamples must be positive: $windowSamples")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, mediaType, payload) =>
            val decoded =
              if (mediaType == null || !mediaType.startsWith("audio/")) None
              else try readWavBounded(payload)
              catch { case _: Exception => None }
            decoded match {
              case Some((_, ch, _, samples))
                  if samples.length / ch >= 2 * windowSamples =>
                // frames, not raw interleaved samples: window w covers
                // frames [w·W, (w+1)·W); its energy is the mean |sample|
                // over windowSamples·ch interleaved values — exact
                // integer math, and ≡ the old definition when ch == 1
                val nW = samples.length / ch / windowSamples
                val energy = Array.tabulate(nW) { w =>
                  var sum = 0L
                  var t = w * windowSamples * ch
                  val end = t + windowSamples * ch
                  while (t < end) { sum += math.abs(samples(t).toLong); t += 1 }
                  sum / (windowSamples.toLong * ch)
                }
                var fp = 0L
                var w = 1
                while (w < nW && w <= 47) {
                  if (energy(w) > energy(w - 1)) fp |= 1L << w
                  w += 1
                }
                (id, Some(nW.toLong), Some(fp))
              case _ => (id, None, None)
            }
          }
        }
      }.toDF("asset_id", "n_windows", "afp")
  }

  // ------------------------------------------------------------ video

  /** Deterministic VIDEO assets (r14 — the third real modality,
    * completing image/audio/video): each row id becomes a real
    * YUV4MPEG2 (Y4M) stream — the public uncompressed interchange
    * format every video toolchain reads (plain ASCII header
    * `YUV4MPEG2 W.. H.. F..:.. ...` + per-frame `FRAME\n` markers +
    * raw planar 4:2:0 YUV), chosen for the same reason as WAV: the
    * bytes are REAL (a drifting parser fails loudly) while the content
    * is pure id arithmetic DuckDB can recompute:
    *   - 16×16 at F(24 + (id % 4)·6):1 — fps 24/30/36/42
    *   - 48 + id % 3 frames
    *   - frame `f` is a ±4 checkerboard around luma
    *     L(id, f) = 16 + (((id % 16)·31 + f·17) % 89)·2, so a frame's
    *     MEAN luma is exactly L (128 pixels each side of the
    *     checkerboard — the decoder must actually read the plane), ids
    *     congruent mod 16 share a luma ENVELOPE (the planted near-dup
    *     groups), and ids ≡ 0 (mod 80) perturb one frame by +40
    *   - chroma planes constant 128 (present, parsed, skipped)
    *   - ids ≡ 0 (mod 101) are CORRUPT (payload truncated to 10 bytes)
    * Generated on executors inside mapPartitions, like [[toWavAssets]]. */
  def toY4mAssets(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val full = y4mStream(24 + (id % 4).toInt * 6, 48 + (id % 3).toInt,
            f => videoLuma(id, f))
          val payload = if (id % 101 == 0) full.take(10) else full
          (id, "video/x-yuv4mpeg", payload)
        }
      }.toDF("asset_id", "media_type", "payload")
  }

  /** ONE Y4M byte-format writer (16×16, 4:2:0, ±4 checkerboard around a
    * per-frame luma) shared by [[toY4mAssets]] and [[toY4mTrimmedAssets]]
    * — two copies of the header/marker/plane layout would have to drift
    * together or silently break the trim/base byte parity the frame-dup
    * gate depends on (r15 review). */
  private def y4mStream(fps: Int, nFrames: Int, lumaOf: Int => Int): Array[Byte] = {
    val w = 16; val h = 16
    val header = s"YUV4MPEG2 W$w H$h F$fps:1 Ip A1:1 C420jpeg\n"
      .getBytes("US-ASCII")
    val frameBytes = w * h + 2 * (w / 2) * (h / 2)
    val marker = "FRAME\n".getBytes("US-ASCII")
    val out = java.nio.ByteBuffer.allocate(
      header.length + nFrames * (marker.length + frameBytes))
    out.put(header)
    var f = 0
    while (f < nFrames) {
      out.put(marker)
      val luma = lumaOf(f)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = if ((x + y) % 2 == 0) luma + 4 else luma - 4
          out.put(v.toByte)
          x += 1
        }
        y += 1
      }
      var c = 0
      while (c < 2 * (w / 2) * (h / 2)) { out.put(128.toByte); c += 1 }
      f += 1
    }
    out.array()
  }

  /** TRIMMED-CLIP plants (r15 — VERDICT task 3): for each input id, a
    * new asset (`id + idOffset`) whose content is the SAME clip with its
    * first `dropFrames` frames cut — local frame f plays the base law's
    * frame f + dropFrames, and the frame count shrinks accordingly. The
    * whole-asset luma-envelope fingerprint provably misses these (the
    * 47-bit delta code shifts by dropFrames positions — VideoSpec pins
    * hamming > maxHamming for every planted pair), which is exactly the
    * blindness the FRAME-level q_video_framedup_pairs gate exists to
    * catch. Corruption follows the BASE id's rule (a trim of a corrupt
    * asset is corrupt) so the oracle's id arithmetic stays one modulus. */
  def toY4mTrimmedAssets(docs: DataFrame, idCol: String,
                         dropFrames: Int, idOffset: Long): DataFrame = {
    require(dropFrames >= 1 && dropFrames <= 40,
      s"dropFrames=$dropFrames must leave a non-trivial clip (1..40)")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions { ids =>
        ids.map { base =>
          val full = y4mStream(24 + (base % 4).toInt * 6,
            48 + (base % 3).toInt - dropFrames,
            f => videoLuma(base, f + dropFrames))
          val payload = if (base % 101 == 0) full.take(10) else full
          (base + idOffset, "video/x-yuv4mpeg", payload)
        }
      }.toDF("asset_id", "media_type", "payload")
  }

  /** The per-frame mean-luma law of [[toY4mAssets]] — one definition
    * shared by the generator and the spec's expectations. */
  private[graft] def videoLuma(id: Long, f: Int): Int = {
    val base = 16 + ((((id % 16) * 31 + f * 17) % 89) * 2).toInt
    if (id % 80 == 0 && f == (id % 47).toInt + 1) base + 40 else base
  }

  /** Bounded YUV4MPEG2 parse (the [[readWavBounded]] contract for
    * video): reads the ASCII header (W/H/F required, 4:2:0 colorspaces
    * only), validates the declared geometry BEFORE allocating planes (a
    * hostile header claiming an 8K×8K frame must degrade the row, not
    * OOM the task), then walks `FRAME` markers extracting each Y plane;
    * any truncated or malformed frame degrades the whole asset to None.
    * Returns (width, height, fpsNum, fpsDen, yPlanes). */
  private[graft] def readY4mBounded(bytes: Array[Byte],
                                    maxBytes: Long = 1L << 26): Option[(Int, Int, Int, Int, Array[Array[Byte]])] = {
    if (bytes == null || bytes.length < 10) return None
    // header line: bounded scan — a payload with no newline in the
    // first 256 bytes is not a Y4M stream
    val hEnd = bytes.indexOf('\n'.toByte)
    if (hEnd < 9 || hEnd > 256) return None
    val header = new String(bytes, 0, hEnd, "US-ASCII")
    val parts = header.split(" ")
    if (parts.head != "YUV4MPEG2") return None
    var w = -1; var h = -1; var fn = -1; var fd = -1
    var cs = "C420jpeg"
    try parts.tail.foreach { p =>
      if (p.nonEmpty) p.charAt(0) match {
        case 'W' => w = p.substring(1).toInt
        case 'H' => h = p.substring(1).toInt
        case 'F' =>
          val Array(a, b) = p.substring(1).split(":", 2)
          fn = a.toInt; fd = b.toInt
        case 'C' => cs = p
        case _   => () // interlace/aspect/extension tags: tolerated
      }
    } catch { case _: Exception => return None }
    if (w <= 0 || h <= 0 || fn <= 0 || fd <= 0) return None
    if (!cs.startsWith("C420")) return None // 4:2:0 family only
    if (w % 2 != 0 || h % 2 != 0) return None
    val frameBytes = w.toLong * h + 2L * (w / 2) * (h / 2)
    if (frameBytes > maxBytes) return None
    val planes = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var pos = hEnd + 1
    while (pos < bytes.length) {
      // FRAME marker, optional parameters, terminated by '\n'
      if (pos + 5 > bytes.length ||
          new String(bytes, pos, 5, "US-ASCII") != "FRAME") return None
      var mEnd = pos + 5
      while (mEnd < bytes.length && bytes(mEnd) != '\n'.toByte) mEnd += 1
      if (mEnd >= bytes.length) return None
      val dataStart = mEnd + 1
      if (dataStart + frameBytes > bytes.length) return None
      planes += java.util.Arrays.copyOfRange(bytes, dataStart, dataStart + w * h)
      pos = dataStart + frameBytes.toInt
    }
    if (planes.isEmpty) return None
    Some((w, h, fn, fd, planes.toArray))
  }

  /** REAL video decode behind the batched seam: header + frame walk
    * over the actual bytes; corrupt / non-video payloads degrade to a
    * null row. Output: (asset_id, width, height, fps_num, fps_den,
    * n_frames, duration_ms) — all BIGINT for the oracle compare. */
  def decodeY4mBatched(assets: DataFrame, batchSize: Int = 256): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, mediaType, payload) =>
            decodedY4m(mediaType, payload) match {
              case Some((w, h, fn, fd, planes)) =>
                val n = planes.length.toLong
                (id, Some(w.toLong), Some(h.toLong), Some(fn.toLong),
                  Some(fd.toLong), Some(n), Some(n * 1000L * fd / fn))
              case None => (id, None, None, None, None, None, None)
            }
          }
        }
      }.toDF("asset_id", "width", "height", "fps_num", "fps_den",
        "n_frames", "duration_ms")
  }

  private def decodedY4m(mediaType: String, payload: Array[Byte])
      : Option[(Int, Int, Int, Int, Array[Array[Byte]])] =
    if (mediaType == null || !mediaType.startsWith("video/")) None
    else try readY4mBounded(payload)
    catch { case _: Exception => None }

  /** Frame sampling — the training-pipeline primitive (every Nth frame
    * of every asset, as rows): (asset_id, frame_idx, mean_luma), where
    * mean_luma is the integer mean of the frame's Y plane (unsigned).
    * Corrupt assets surface as ONE (id, null, null) row — the
    * [[imageFeaturesBatched]] convention — never vanish. The real
    * decode-and-subsample shape: payloads are read ONCE, only sampled
    * frames produce rows, and downstream per-frame featurization joins
    * on (asset_id, frame_idx). */
  def frameSampleBatched(assets: DataFrame, everyNth: Int = 3,
                         batchSize: Int = 256): DataFrame = {
    require(everyNth > 0, s"everyNth must be positive: $everyNth")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.flatMap { case (id, mediaType, payload) =>
            decodedY4m(mediaType, payload) match {
              case Some((w, h, _, _, planes)) =>
                (0 until planes.length by everyNth).map { f =>
                  (id, Some(f.toLong), Some(planeMeanLuma(planes(f), w, h)))
                }
              case None => Seq((id, Option.empty[Long], Option.empty[Long]))
            }
          }
        }
      }.toDF("asset_id", "frame_idx", "mean_luma")
  }

  /** Integer mean luma of one Y plane (unsigned bytes) — ONE definition
    * shared by [[frameSampleBatched]] and [[videoFingerprintsBatched]]
    * so the two gates can never desynchronize on rounding or unsigned
    * handling (r14 review). */
  private def planeMeanLuma(pl: Array[Byte], w: Int, h: Int): Long = {
    var sum = 0L
    var i = 0
    while (i < pl.length) { sum += pl(i) & 0xFF; i += 1 }
    sum / (w.toLong * h)
  }

  /** Luma-envelope video fingerprint: per-frame integer mean luma, then
    * the 47-bit delta code of [[audioFingerprintsBatched]] (bit f = 1
    * iff luma(f) > luma(f−1)) packed into a long — similar BRIGHTNESS
    * CONTOURS (the signal that survives re-encoding) land at small
    * hamming distances, so near-dup detection is the same banded
    * [[graft.ops.Dedup.hammingPairs]] as images and audio. Corrupt
    * payloads degrade to a null fingerprint. */
  def videoFingerprintsBatched(assets: DataFrame,
                               batchSize: Int = 256): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, mediaType, payload) =>
            decodedY4m(mediaType, payload) match {
              case Some((w, h, _, _, planes)) if planes.length >= 2 =>
                val luma = planes.map(planeMeanLuma(_, w, h))
                var fp = 0L
                var f = 1
                while (f < luma.length && f <= 47) {
                  if (luma(f) > luma(f - 1)) fp |= 1L << f
                  f += 1
                }
                (id, Some(planes.length.toLong), Some(fp))
              case _ => (id, None, None)
            }
          }
        }
      }.toDF("asset_id", "n_frames", "vfp")
  }
}
