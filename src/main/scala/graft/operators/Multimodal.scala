package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column support (SURVEY.md §2.11):
  * media travels as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extraction runs per-partition in batches.
  *
  * The actual codecs are NOT available in this environment, so
  * [[decodeStub]] is a clearly-marked deterministic fake — but the
  * Spark-side plumbing (schema, batch shape, partition iteration,
  * metadata extraction) is real and is exactly what a libjpeg/ffmpeg
  * call would plug into.
  */
object Multimodal {

  /** Typed metadata carried alongside every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("sha256", StringType)))

  /** Pack a string column into a binary payload column (stand-in for
    * reading raw bytes from object storage).
    */
  def packBinary(c: Column): Column = encode(c, "UTF-8")

  /** Magic-byte mime sniffing on the binary payload (real headers:
    * JPEG ff d8 ff, PNG 89 50 4e 47, RIFF/WAV 52 49 46 46).
    */
  def sniffMime(bin: Column): Column = {
    val head = hex(substring(bin, 1, 4))
    when(head.startsWith("FFD8FF"), "image/jpeg")
      .when(head.startsWith("89504E47"), "image/png")
      .when(head.startsWith("52494646"), "audio/wav")
      .otherwise("application/octet-stream")
  }

  /** Metadata struct for a binary payload — pure projection. */
  def mediaMeta(bin: Column): Column = struct(
    sniffMime(bin).as("mime"),
    length(bin).cast("long").as("n_bytes"),
    sha2(bin, 256).as("sha256"))

  /** Output schema of the (stubbed) image decode. */
  val decodedType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("mean_intensity", DoubleType)))

  /** Batched per-partition "decode": iterates the partition in
    * `batchSize` groups (the shape a vectorized codec needs) and emits
    * deterministic fake dimensions/statistics derived from the bytes.
    *
    * STUB — replace the body of `fakeDecode` with the real codec call;
    * everything around it (batching, schema, null passthrough) stays.
    */
  def decodeStub(df: DataFrame, binCol: String, batchSize: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("decoded", decodedType))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // -- begin codec stub (deterministic fake) --
        // dimensions/statistics derived from sha256(payload) + byte
        // length, so an external oracle can reproduce them exactly
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        def fakeDecode(bytes: Array[Byte]): Row =
          if (bytes == null) null
          else {
            val n = bytes.length
            val sha = digest.digest(bytes)
            val w = 16 + (sha(0) & 0xff) % 64
            val h = 16 + (n % 64)
            val mean = (sha(1) & 0xff).toDouble
            Row(w, h, 3, mean)
          }
        // -- end codec stub --
        batch.iterator.map { r =>
          Row.fromSeq(r.toSeq :+ fakeDecode(r.getAs[Array[Byte]](binIdx)))
        }
      }
    }(enc)
  }

  /** REAL image decode in the decode slot — `javax.imageio` ships in
    * the JDK and decodes PNG/BMP/JPEG/GIF with zero native libraries.
    * Same batched per-partition shape (and output schema) as
    * [[decodeStub]]: the batching is where a vectorized native codec
    * (libjpeg-turbo, nvJPEG) would slot in; ImageIO decodes one image
    * per call, so the batch loop simply iterates. `mean_intensity` is
    * the mean over every pixel sample in every band. Null or
    * undecodable payloads yield a null struct (corrupt bytes must not
    * fail a 100 TB scan).
    */
  def decodeImages(df: DataFrame, binCol: String, batchSize: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("decoded", decodedType))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      def decodeOne(bytes: Array[Byte]): Row =
        if (bytes == null) null
        else {
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: java.io.IOException => null }
          if (img == null) null
          else {
            val raster = img.getRaster
            val w = img.getWidth; val h = img.getHeight
            val bands = raster.getNumBands
            val rowBuf = new Array[Int](w * bands)
            var sum = 0.0
            var y = 0
            while (y < h) {
              raster.getPixels(0, y, w, 1, rowBuf)
              var i = 0
              while (i < rowBuf.length) { sum += rowBuf(i); i += 1 }
              y += 1
            }
            Row(w, h, bands, sum / (w.toDouble * h * bands))
          }
        }
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          Row.fromSeq(r.toSeq :+ decodeOne(r.getAs[Array[Byte]](binIdx)))
        }
      }
    }(enc)
  }

  /** 64-bit difference hash (dHash) over encoded images — the
    * perceptual near-dup signature for image corpora: decode, box-
    * average the grayscale onto a 9×8 grid, and set bit `r·8+c` iff
    * cell (r,c) is darker than its right neighbor. Row-wise gradient
    * direction survives re-encoding, mild recompression, and global
    * brightness shifts, which byte-level hashing does not — pair it
    * with [[Dedup.hamming64NearDuplicates]] for the banded near-dup
    * join.
    *
    * Everything after the codec is INTEGER arithmetic (pixel sums,
    * floor-divide averages, comparisons), so the hash is a
    * deterministic function of the decoded pixels — reproducible
    * across partitionings and restatable by an external oracle from
    * the image generator's parameters. `mapPartitions` because no
    * Catalyst expression can host the ImageIO codec (the
    * [[decodeImages]] rationale); appends `phash64` (null for
    * undecodable payloads).
    */
  def dHash64(df: DataFrame, binCol: String, batchSize: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("phash64", org.apache.spark.sql.types.LongType))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      val (gw, gh) = (9, 8)
      def hashOne(bytes: Array[Byte]): Any =
        if (bytes == null) null
        else {
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: java.io.IOException => null }
          if (img == null || img.getWidth < gw || img.getHeight < gh) null
          else {
            val raster = img.getRaster
            val w = img.getWidth; val h = img.getHeight
            val bands = raster.getNumBands
            val rowBuf = new Array[Int](w * bands)
            // integer grayscale sums per grid cell: cell (r,c) covers
            // pixel rows [r·h/gh, (r+1)·h/gh) × cols [c·w/gw, (c+1)·w/gw)
            val sums = Array.ofDim[Long](gh, gw)
            val cnts = Array.ofDim[Long](gh, gw)
            var y = 0
            while (y < h) {
              raster.getPixels(0, y, w, 1, rowBuf)
              val r = y * gh / h
              var x = 0
              while (x < w) {
                var g = 0L; var b = 0
                while (b < bands) { g += rowBuf(x * bands + b); b += 1 }
                val c = x * gw / w
                sums(r)(c) += g / bands // integer gray: floor mean band
                cnts(r)(c) += 1L
                x += 1
              }
              y += 1
            }
            var hash = 0L
            var r = 0
            while (r < gh) {
              var c = 0
              while (c < gw - 1) {
                val a = sums(r)(c) / cnts(r)(c)
                val d = sums(r)(c + 1) / cnts(r)(c + 1)
                if (a < d) hash |= 1L << (r * 8 + c)
                c += 1
              }
              r += 1
            }
            hash
          }
        }
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          Row.fromSeq(r.toSeq :+ hashOne(r.getAs[Array[Byte]](binIdx)))
        }
      }
    }(enc)
  }

  /** Deterministic frame sampling over a binary "video" payload: every
    * `stride`-th `frameBytes`-sized slice becomes one frame row
    * (explode-shaped, no driver round-trip).
    */
  def frameSample(bin: Column, frameBytes: Int, stride: Int): Column =
    transform(
      sequence(lit(0),
        greatest((length(bin) / (frameBytes * stride)).cast("int") - 1, lit(0))),
      i => struct(
        i.as("frame_id"),
        substring(bin, i * frameBytes * stride + 1, lit(frameBytes)).as("frame")))

  /** REAL image resize: decode (ImageIO) → scale to `targetW`×`targetH`
    * (Graphics2D bilinear; any convex interpolation maps a constant
    * image to the same constant, which is what the oracle exploits) →
    * re-encode as PNG. Same batched per-partition shape as
    * [[decodeImages]]; null/undecodable payloads yield a null output
    * column rather than failing the scan. The output binary column
    * `<binCol>_resized` feeds [[decodeImages]]/[[sniffMime]] unchanged.
    */
  def resizeImages(df: DataFrame, binCol: String, targetW: Int,
      targetH: Int, batchSize: Int = 64): DataFrame = {
    require(targetW > 0 && targetH > 0, "target dimensions must be positive")
    val schema = StructType(
      df.schema.fields :+ StructField(s"${binCol}_resized", BinaryType))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      // one PNG ImageWriter per partition: ImageIO.write does a
      // ServiceRegistry writer lookup (and allocates a fresh
      // ImageOutputStream adapter) per call — per-image cost that
      // dominates small encodes. ImageWriter is not thread-safe, but a
      // partition is processed by exactly one task thread.
      val pngWriter =
        javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      def resizeOne(bytes: Array[Byte]): Array[Byte] =
        if (bytes == null) null
        else {
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: java.io.IOException => null }
          if (img == null) null
          else {
            val out = new java.awt.image.BufferedImage(
              targetW, targetH, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
            val gfx = out.createGraphics()
            gfx.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            gfx.drawImage(img, 0, 0, targetW, targetH, null)
            gfx.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
            pngWriter.setOutput(ios)
            pngWriter.write(out)
            ios.close()
            bos.toByteArray
          }
        }
      val out = rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          Row.fromSeq(r.toSeq :+ resizeOne(r.getAs[Array[Byte]](binIdx)))
        }
      }
      // completion iterator: release the writer's native resources when
      // the partition is exhausted (instead of retaining them until GC)
      new scala.collection.AbstractIterator[Row] {
        private var disposed = false
        override def hasNext: Boolean = {
          val h = out.hasNext
          if (!h && !disposed) {
            disposed = true
            pngWriter.setOutput(null)
            pngWriter.dispose()
          }
          h
        }
        override def next(): Row = out.next()
      }
    }(enc)
  }

  /** Little-endian unsigned integer from `n` bytes of `bin` starting at
    * 1-based `pos` — per-byte hex→decimal arithmetic, fully codegen'd.
    */
  private def leUInt(bin: Column, pos: Int, n: Int): Column =
    (0 until n).map { i =>
      conv(hex(substring(bin, pos + i, 1)), 16, 10).cast("long") *
        lit(1L << (8 * i))
    }.reduce(_ + _)

  /** Output schema of [[wavMeta]]. */
  val wavMetaType: StructType = StructType(Seq(
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("data_bytes", LongType),
    StructField("duration_secs", DoubleType)))

  /** REAL audio metadata: parse a canonical 44-byte RIFF/WAVE PCM
    * header (fmt chunk at offset 12, data chunk at 36) straight out of
    * the binary column — channels, sample rate, bit depth, payload
    * size, duration — as pure Column arithmetic: zero UDFs, zero
    * shuffles, whole-stage codegen keeps it in the scan projection.
    * Non-WAV / truncated payloads yield a null struct.
    */
  def wavMeta(bin: Column): Column = {
    val isWav = length(bin) >= 44 &&
      hex(substring(bin, 1, 4)) === "52494646" && // "RIFF"
      hex(substring(bin, 9, 4)) === "57415645"    // "WAVE"
    val channels = leUInt(bin, 23, 2).cast("int")
    val rate = leUInt(bin, 25, 4).cast("int")
    val bits = leUInt(bin, 35, 2).cast("int")
    val dataBytes = leUInt(bin, 41, 4)
    val bytesPerSec = leUInt(bin, 29, 4)
    when(isWav, struct(
      channels.as("channels"),
      rate.as("sample_rate"),
      bits.as("bits_per_sample"),
      dataBytes.as("data_bytes"),
      (dataBytes.cast("double") / bytesPerSec).as("duration_secs")))
      .otherwise(lit(null).cast(wavMetaType))
  }
}
