package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for the training-data pipeline: image/audio/video
  * as opaque `binary` columns with typed metadata, plus batched
  * decode / feature-extract / resize / frame-sample operators.
  *
  * The Spark-side plumbing is real and tested: schema, partitioning,
  * per-partition batch shape, amortized decoder setup inside
  * `mapPartitions` (the Scala counterpart of a `mapInPandas` batch UDF).
  * The actual media codec is a STUB — no image/audio libraries exist in
  * this container — replaced by a deterministic fake container format
  * (`GMM1`) whose header/payload the operators genuinely parse, so
  * every byte-level path (header decode, bounds checks, truncation
  * errors) is exercised for real. Swapping [[FakeCodec]] for a real
  * decoder changes no operator code.
  */
object Multimodal {

  final case class MediaAsset(
      asset_id: Long,
      kind: String, // image | audio | video
      data: Array[Byte],
      source: String)

  final case class MediaMeta(
      asset_id: Long,
      kind: String,
      width: Int, // image/video frame width; 0 for audio
      height: Int,
      sample_rate: Int, // audio; 0 otherwise
      n_frames: Int, // video frames / audio samples / 1 for image
      payload_bytes: Int,
      valid: Boolean)

  final case class MediaFeature(
      asset_id: Long,
      kind: String,
      feature: Array[Float]) // 32-bin byte histogram, L1-normalized

  /** Deterministic fake container: "GMM1" magic, kind byte, 3×int32
    * header fields, then payload bytes. A real pipeline would swap this
    * object for an actual codec (??? in production terms) — the
    * operator plumbing is identical.
    */
  object FakeCodec {
    val Magic: Array[Byte] = "GMM1".getBytes("US-ASCII")

    private def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }

    private def putInt(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
      b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
    }
    private def getInt(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

    /** Deterministic asset: kind from id, header + pseudo-random payload. */
    def synth(id: Long): (String, Array[Byte]) = {
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val (a, b, nPayload) = kind match {
        case "image" =>
          val w = 16 + (mix(id) & 0x3f).toInt // 16..79
          val h = 16 + (mix(id + 1) & 0x3f).toInt
          (w, h, w * h)
        case "audio" =>
          val sr = 8000 + ((mix(id) & 0x3) * 8000).toInt
          val n = 256 + (mix(id + 1) & 0xff).toInt
          (sr, n, n)
        case _ =>
          val w = 8 + (mix(id) & 0xf).toInt
          val frames = 4 + (mix(id + 1) & 0x7).toInt
          (w, frames, w * w * frames)
      }
      val buf = new Array[Byte](4 + 1 + 12 + nPayload)
      System.arraycopy(Magic, 0, buf, 0, 4)
      buf(4) = kind.head.toByte
      putInt(buf, 5, a); putInt(buf, 9, b); putInt(buf, 13, nPayload)
      var i = 0
      while (i < nPayload) {
        buf(17 + i) = (mix(id * 1000003L + i) & 0xff).toByte
        i += 1
      }
      (kind, buf)
    }

    /** Parse header → MediaMeta; malformed input yields valid=false
      * rather than throwing (poison-media must not kill a 100 TB scan). */
    def decodeMeta(id: Long, data: Array[Byte]): MediaMeta = {
      if (data == null || data.length < 17 ||
          !data.take(4).sameElements(Magic))
        return MediaMeta(id, "unknown", 0, 0, 0, 0,
          if (data == null) 0 else data.length, valid = false)
      val kind = data(4).toChar match {
        case 'i' => "image"; case 'a' => "audio"; case 'v' => "video"
        case _ => "unknown"
      }
      val a = getInt(data, 5); val b = getInt(data, 9)
      val n = getInt(data, 13)
      if (kind == "unknown" || n < 0 || data.length - 17 < n)
        return MediaMeta(id, kind, 0, 0, 0, 0, data.length, valid = false)
      kind match {
        case "image" => MediaMeta(id, kind, a, b, 0, 1, n, valid = true)
        case "audio" => MediaMeta(id, kind, 0, 0, a, b, n, valid = true)
        case _ => MediaMeta(id, kind, a, a, 0, b, n, valid = true)
      }
    }

    def payload(data: Array[Byte]): Array[Byte] = data.drop(17)
  }

  /** Deterministic synthetic asset table — distributed generation, no
    * driver materialization. */
  def dataset(spark: SparkSession, n: Long): Dataset[MediaAsset] = {
    import spark.implicits._
    spark.range(0, n).map { id =>
      val (kind, data) = FakeCodec.synth(id)
      MediaAsset(id, kind, data, "synth")
    }
  }

  /** Batched metadata decode. The decoder handle is constructed once
    * per partition (amortized setup — the mapInPandas batch contract). */
  def decodeMeta(assets: Dataset[MediaAsset]): Dataset[MediaMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val codec = FakeCodec // stand-in for expensive decoder init
      it.map(a => codec.decodeMeta(a.asset_id, a.data))
    }
  }

  /** Batched feature extraction: 32-bin byte histogram of the payload,
    * L1-normalized — a real computation standing where an embedding
    * model would run. */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeature] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val hist = new Array[Int](32) // reused per partition
      it.map { a =>
        java.util.Arrays.fill(hist, 0)
        val p = FakeCodec.payload(a.data)
        var i = 0
        while (i < p.length) { hist((p(i) & 0xff) >>> 3) += 1; i += 1 }
        val total = math.max(1, p.length).toFloat
        MediaFeature(a.asset_id, a.kind, hist.map(_ / total))
      }
    }
  }

  /** Image resize (2× box downsample) on the fake pixel grid — byte
    * arithmetic identical in shape to a real resize kernel. */
  def resizeImages(assets: Dataset[MediaAsset]): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "image").mapPartitions { it =>
      it.map { a =>
        val m = FakeCodec.decodeMeta(a.asset_id, a.data)
        if (!m.valid) a
        else {
          val p = FakeCodec.payload(a.data)
          val (w, h) = (m.width, m.height)
          val (nw, nh) = (w / 2, h / 2)
          val out = new Array[Byte](nw * nh)
          var y = 0
          while (y < nh) {
            var x = 0
            while (x < nw) {
              val s = (p(2 * y * w + 2 * x) & 0xff) +
                (p(2 * y * w + 2 * x + 1) & 0xff) +
                (p((2 * y + 1) * w + 2 * x) & 0xff) +
                (p((2 * y + 1) * w + 2 * x + 1) & 0xff)
              out(y * nw + x) = (s / 4).toByte
              x += 1
            }
            y += 1
          }
          val hdr = new Array[Byte](17 + out.length)
          System.arraycopy(a.data, 0, hdr, 0, 17)
          // rewrite dims + payload length
          def putInt(b: Array[Byte], off: Int, v: Int): Unit = {
            b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
            b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
          }
          putInt(hdr, 5, nw); putInt(hdr, 9, nh); putInt(hdr, 13, out.length)
          System.arraycopy(out, 0, hdr, 17, out.length)
          a.copy(data = hdr)
        }
      }
    }
  }

  /** Video frame sampling: keep every k-th frame of the fake container. */
  def sampleFrames(assets: Dataset[MediaAsset], k: Int): DataFrame = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").mapPartitions { it =>
      it.flatMap { a =>
        val m = FakeCodec.decodeMeta(a.asset_id, a.data)
        if (!m.valid) Iterator.empty
        else {
          val p = FakeCodec.payload(a.data)
          val frameLen = m.width * m.height
          (0 until m.n_frames by k).iterator.map { f =>
            (a.asset_id, f, p.slice(f * frameLen, (f + 1) * frameLen))
          }
        }
      }
    }.toDF("asset_id", "frame_idx", "frame")
  }
}
