package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed record for an opaque media payload: the engine's multimodal column
  * convention is `binary` payload + typed metadata, so image/audio/video
  * travel through shuffles/scans as plain columns with no codec coupling. */
case class MediaRecord(
    doc_id: Long,
    kind: String, // "image" | "audio" | "video" (derived deterministically here)
    payload: Array[Byte],
    n_bytes: Long)

/** Audio-branch statistics record (see `Multimodal.audioStats`). */
case class AudioStats(
    doc_id: Long,
    kind: String,
    n_samples: Long,
    duration_ms: Long,
    rms_permille: Long)

/** Decoded-feature record produced by the (stubbed) decoder. */
case class MediaFeatures(
    doc_id: Long,
    kind: String,
    width: Int,
    height: Int,
    n_frames: Int,
    feature: Array[Float])

/** Multimodal column plumbing: binary payloads with typed metadata, a
  * batched decode/feature-extract stage, and frame sampling.
  *
  * The decode step itself is a STUB — this container has no image/audio
  * codecs — but everything Spark-cares-about is real: the schema
  * (BinaryType + metadata), the partition-parallel `mapPartitions` decode
  * (the Scala analogue of a `mapInPandas` batch UDF: one iterator per
  * partition, amortizing per-batch decoder setup), and the explode-based
  * frame sampling. Swapping `decodeStub` for a real codec changes no plan
  * shape.
  *
  * Scale notes: payloads are opaque bytes, so Parquet stores them
  * untouched; decode is embarrassingly parallel per partition with no
  * shuffle; `spark.sql.files.maxPartitionBytes` bounds decoder memory.
  */
object Multimodal {

  /** Manufacture a media table from the documents corpus: the text bytes
    * stand in for an encoded payload (deterministic fake). kind cycles by
    * doc_id so all three modalities appear. */
  def mediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))

  /** Partition-batched decode with an injectable codec: `init` runs once
    * per non-empty partition (where a real libjpeg/ffmpeg handle lives),
    * `decode` runs per record, and `close` releases the handle when the
    * task completes. The plan shape — an embarrassingly-parallel
    * mapPartitions over opaque binary columns — is identical for any
    * codec. Generic in the output record type so every modality branch
    * (image features, audio stats, …) shares the one seam. */
  def decodeWith[C, O: org.apache.spark.sql.Encoder](media: Dataset[MediaRecord])(
      init: () => C, close: C => Unit = (_: C) => ())(
      decode: (C, MediaRecord) => O): Dataset[O] = {
    media.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val codec = init()
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => close(codec)))
        it.map(m => decode(codec, m))
      }
    }
  }

  /** STUB decoder: derives deterministic pseudo-features from the payload
    * bytes in place of a real codec (this container has none). Swapping in
    * a real one is `decodeWith(media)(() => realCodecHandle)(realDecode)` —
    * no plan change. */
  def decodeStub(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    decodeWith(media)(() => ())((_, m) => {
      val b0 = if (m.payload.nonEmpty) m.payload(0) & 0xff else 0
      val b1 = if (m.payload.length > 1) m.payload(1) & 0xff else 0
      val feature = Array.tabulate(8)(i =>
        ((m.payload.length * (i + 1) + b0 * 31 + b1 * 7) % 1000) / 1000.0f)
      MediaFeatures(
        doc_id = m.doc_id,
        kind = m.kind,
        width = 16 + b0 % 64,
        height = 16 + b1 % 64,
        n_frames = if (m.kind == "video") 1 + (m.payload.length % 30) else 1,
        feature = feature)
    })
  }

  /** REAL image decode through the same [[decodeWith]] plumbing, using the
    * JDK's `javax.imageio` (PNG/BMP/GIF/JPEG readers ship with every JVM —
    * no native codec dependency). Proves the injectable-codec seam with an
    * actual decoder: per-partition `init` allocates the reusable pixel
    * buffer, `decode` parses real image bytes, and the plan shape is
    * byte-identical to [[decodeStub]]'s.
    *
    * Decode policy mirrors S8's LogAndContinue: a payload ImageIO cannot
    * parse (or a non-`image` kind — this decoder only claims the image
    * modality) yields a sentinel record (`width = height = 0`, zero
    * feature vector) instead of failing the task, so one corrupt blob in
    * 100 TB cannot kill a stage.
    *
    * The feature vector is a `featureDim`-bin luminance histogram,
    * normalized to the pixel count — deterministic for a given payload,
    * and bounded work per record (one pass over the pixels). */
  def decodeImages(media: Dataset[MediaRecord], featureDim: Int = 8): Dataset[MediaFeatures] = {
    require(featureDim > 0, s"featureDim must be positive, got $featureDim")
    val dim = featureDim
    import media.sparkSession.implicits._
    decodeWith(media)(() => {
      // bytes are already in memory: stop ImageIO from spooling every
      // record through a temp file in java.io.tmpdir (its default cache)
      javax.imageio.ImageIO.setUseCache(false)
      new Array[Int](dim)
    })((hist, m) => {
      def fallback = MediaFeatures(m.doc_id, m.kind, 0, 0, 1, new Array[Float](dim))
      if (m.kind != "image") fallback
      else {
        // NonFatal, not just IOException: the JDK readers throw unchecked
        // exceptions (AIOOBE, NegativeArraySize, IllegalArgument) on
        // fuzzed/truncated images — any of them must mean "skip", or one
        // corrupt blob kills the stage
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) fallback // undecodable bytes: skip, don't fail the task
        else {
          java.util.Arrays.fill(hist, 0)
          val (w, h) = (img.getWidth, img.getHeight)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
              hist(lum * dim / 256) += 1
              x += 1
            }
            y += 1
          }
          val n = (w.toLong * h).toFloat
          MediaFeatures(m.doc_id, m.kind, w, h, 1, hist.map(_ / n))
        }
      }
    })
  }

  /** Audio-branch waveform statistics through the same [[decodeWith]]
    * seam, with a STUB codec: the synthetic corpus payloads are text
    * bytes, not real audio containers, so this branch derives
    * deterministic closed-form stats from the payload bytes (fake 16 kHz
    * sample count, the duration it implies, a byte-derived RMS stand-in)
    * — integer math throughout, so the m04 oracle reproduces it exactly.
    * The REAL decoder for actual audio containers is [[decodeAudio]];
    * both run the identical plan. Non-audio kinds get a sentinel record
    * (the decoder claims one modality, like the image branch). */
  def audioStats(media: Dataset[MediaRecord]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    decodeWith(media)(() => ())((_, m) =>
      if (m.kind != "audio") AudioStats(m.doc_id, m.kind, 0L, 0L, 0L)
      else {
        val b0 = if (m.payload.nonEmpty) m.payload(0) & 0xff else 0
        val b1 = if (m.payload.length > 1) m.payload(1) & 0xff else 0
        val nSamples = m.n_bytes * 4 // stub: 4 samples per payload byte
        AudioStats(
          doc_id = m.doc_id,
          kind = m.kind,
          n_samples = nSamples,
          duration_ms = nSamples * 1000L / 16000L, // 16 kHz stub rate
          rms_permille = (b0 * 7L + b1 * 13L + m.n_bytes) % 1000L)
      })
  }

  /** REAL audio decode through the same [[decodeWith]] seam, using the
    * JDK's `javax.sound.sampled` (WAV/AIFF/AU PCM readers ship with every
    * JVM — no native codec dependency), mirroring what [[decodeImages]]
    * did for the image branch. Per-partition `init` allocates the
    * reusable frame buffer; `decode` parses the container header, streams
    * the PCM frames once, and reports:
    *
    *   - `n_samples`: sample frames actually decoded,
    *   - `duration_ms`: `n_samples * 1000 / sampleRate` (floor),
    *   - `rms_permille`: root-mean-square amplitude of channel 0,
    *     normalized to full scale ×1000 (so a full-scale square wave is
    *     1000, digital silence is 0) — integer at rest, like every
    *     engine-surface aggregate.
    *
    * Decode policy mirrors S8's LogAndContinue (same as the image
    * branch): undecodable payloads and non-`audio` kinds yield the
    * all-zero sentinel record instead of failing the task, so one corrupt
    * blob in 100 TB cannot kill a stage. Supports signed PCM 8/16-bit
    * (little- or big-endian), any channel count (channel 0 is measured).
    */
  def decodeAudio(media: Dataset[MediaRecord]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    decodeWith(media)(() => new Array[Byte](1 << 16))((buf, m) => {
      def sentinel = AudioStats(m.doc_id, m.kind, 0L, 0L, 0L)
      if (m.kind != "audio") sentinel
      else {
        // NonFatal, not just UnsupportedAudioFileException: fuzzed headers
        // can drive the JDK parsers into unchecked failures (AIOOBE,
        // NegativeArraySize) — any of them must mean "skip"
        val ais =
          try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(m.payload))
          catch { case scala.util.control.NonFatal(_) => null }
        if (ais == null) sentinel
        else try {
          val fmt = ais.getFormat
          val bits = fmt.getSampleSizeInBits
          val bytesPerSample = bits / 8
          val frameSize = fmt.getFrameSize
          val enc = fmt.getEncoding
          val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          // WAV's native 8-bit form is unsigned; 16-bit is signed — accept
          // both, measured as offsets from their respective zero points.
          // bits must be exactly 8/16 (12-bit would integer-divide to 1 byte
          // and silently mis-decode), and the frame must be wide enough for
          // every channel — an undersized reported frameSize would walk the
          // reused buffer past this record's fill region into stale bytes
          val ok = ((signed && (bits == 8 || bits == 16)) ||
            (unsigned && bits == 8)) &&
            frameSize >= fmt.getChannels * bytesPerSample &&
            fmt.getChannels > 0 && fmt.getSampleRate > 0
          if (!ok) sentinel
          else {
            var frames = 0L
            var sumSq = 0.0 // sum of squared full-scale-normalized samples
            val fullScale = if (bytesPerSample == 2) 32768.0 else 128.0
            var leftover = 0
            var eof = false
            while (!eof) {
              val n = ais.read(buf, leftover, buf.length - leftover)
              if (n <= 0) eof = true // 0 = stream can't fill a frame: stop
              else {
                val avail = leftover + n
                val nFrames = avail / frameSize
                var i = 0
                while (i < nFrames) {
                  val off = i * frameSize // channel 0 leads each frame
                  val s =
                    if (bytesPerSample == 1)
                      (if (unsigned) (buf(off) & 0xff) - 128 else buf(off): Int).toDouble
                    else {
                      val (lo, hi) = if (fmt.isBigEndian) (off + 1, off) else (off, off + 1)
                      ((buf(hi) << 8) | (buf(lo) & 0xff)).toDouble
                    }
                  sumSq += (s / fullScale) * (s / fullScale)
                  i += 1
                }
                frames += nFrames
                // carry a partial trailing frame into the next read
                leftover = avail - nFrames * frameSize
                if (leftover > 0)
                  System.arraycopy(buf, nFrames * frameSize, buf, 0, leftover)
              }
            }
            if (frames == 0L) sentinel
            else AudioStats(
              doc_id = m.doc_id,
              kind = m.kind,
              n_samples = frames,
              duration_ms = frames * 1000L / fmt.getSampleRate.toLong,
              rms_permille = math.round(math.sqrt(sumSq / frames) * 1000.0))
          }
        } catch { case scala.util.control.NonFatal(_) => sentinel }
        finally { try ais.close() catch { case scala.util.control.NonFatal(_) => () } }
      }
    })
  }

  /** Deterministic frame sampling: every `stride`-th frame index of each
    * video, exploded to one row per sampled frame. */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int): DataFrame = {
    val df = features.toDF()
    df.select(col("doc_id"), col("kind"), col("n_frames"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
  }

  def mediaDataset(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    mediaFromDocs(docs).as[MediaRecord]
  }

  /** Gradient (dHash-style) perceptual hash over a decoder's feature
    * vector: bit `i` set iff `feature[i+1] > feature[i]` — the relative-
    * gradient signature that survives brightness/scale shifts where raw
    * byte digests don't. With [[decodeImages]] the features are the
    * luminance histogram, so this is the classic dHash shape; with the
    * stub codec it hashes the stub's closed-form features (oracle-exact).
    * A plain codegen'd expression — no HOF, no UDF. */
  def dHash(feature: Column): Column =
    (0 until 7).map { i =>
      when(element_at(feature, i + 2) > element_at(feature, i + 1), lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** Scene-cut detection over a video's frame stream: per sampled frame,
    * the permille feature-distance to the previous frame
    * (`Σ_i |p_t[i] − p_{t−1}[i]|`), flagged a cut when it exceeds
    * `threshold` — the shot-boundary pass a video curation pipeline runs
    * before picking representative frames.
    *
    * Per-frame features come from the decoder seam: with the stub codec
    * they are a deterministic arithmetic schedule over the media feature
    * (`p_t[i] = (m_i · (t+i+1)) mod 1000`, `m_i` the micro-rounded media
    * feature — oracle-exact); a real codec supplies true per-frame
    * vectors through the same shape. The Spark plumbing is the real
    * thing either way: frames AND their deltas derive from one media
    * row (a per-row fold over the frame sequence — NO window over a
    * frames table, NO shuffle; the classic lag-per-frame formulation
    * re-partitions every frame of every video by doc_id).
    *
    * @return (doc_id, frame_idx ≥ 1, delta_permille, is_cut 0/1) for
    *         videos with at least two frames
    */
  def sceneCuts(features: DataFrame, threshold: Long = 2600L): DataFrame = {
    require(threshold >= 0, s"threshold must be >= 0, got $threshold")
    features.toDF()
      .filter(col("kind") === "video" && col("n_frames") >= 2)
      .withColumn("m", expr("transform(feature, x -> CAST(ROUND(1000*x) AS BIGINT))"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, n_frames - 1), t -> named_struct(" +
          "'frame_idx', CAST(t AS BIGINT), " +
          "'delta', aggregate(sequence(0, size(m) - 1), CAST(0 AS BIGINT), (acc, i) -> " +
          "acc + abs((element_at(m, i + 1) * (t + i + 1)) % 1000 " +
          "- (element_at(m, i + 1) * (t + i)) % 1000))))")).as("f"))
      .select(col("doc_id"), col("f.frame_idx").as("frame_idx"),
        col("f.delta").as("delta_permille"),
        (col("f.delta") > threshold).cast("long").as("is_cut"))
  }

  /** Perceptual-duplicate candidate buckets: images sharing a [[dHash]]
    * value, with cluster size and the canonical (min) doc. Like LSH bands,
    * the hash buckets CANDIDATES — a byte-exact or feature-distance verify
    * runs downstream on each bucket, never across buckets, which is what
    * keeps image dedup linear at 100 TB (no image×image comparison). */
  def perceptualDupClusters(features: DataFrame): DataFrame =
    features
      .withColumn("dhash", dHash(col("feature")))
      .groupBy(col("dhash"))
      .agg(count(lit(1)).as("n_images"), min(col("doc_id")).as("canonical_doc"))
      .filter(col("n_images") >= 2)
}
