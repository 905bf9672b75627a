package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

case class MediaMeta(format: String, width: Int, height: Int, n_frames: Int)
case class MediaRec(media_id: Long, payload: Array[Byte], meta: MediaMeta)
case class MediaFeat(media_id: Long, payload: Array[Byte], meta: MediaMeta,
  features: Array[Float])

/** Multimodal column plumbing for training-data pipelines: image/audio/video
  * payloads as opaque `binary` columns with typed metadata, plus
  * decode / feature-extract / frame-sample operators.
  *
  * The Spark-side plumbing (schema, batch iteration via mapPartitions,
  * partition sizing) is real and tested; the codec itself is STUBBED with a
  * deterministic fake (`StubCodec`) because no image/audio libraries ship
  * in this environment — swap `StubCodec` for a real decoder binding at
  * deployment. Payloads stream through executors partition-by-partition;
  * nothing is collected to the driver, so the operators hold at 100 TB of
  * media given sane `spark.sql.files.maxPartitionBytes`.
  */
object Media {

  /** Typed metadata carried next to every binary payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", metaSchema)))

  /** Wrap any string column as a media table: payload = UTF-8 bytes, with
    * deterministic fake metadata derived from the payload length. Used by
    * tests and demos to exercise the plumbing without real media files.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit("fake/raw").as("format"),
        (octet_length(col(textCol)) % 1024).cast("int").as("width"),
        (octet_length(col(textCol)) % 768).cast("int").as("height"),
        (octet_length(col(textCol)) % 16 + 1).cast("int").as("n_frames"))
        .as("meta"))

  /** The stub codec: deterministic payload → fixed-width float features.
    * Replace with a real decoder (JNI/FFI binding) in production; the
    * signature — bytes in, fixed-dim float vector out, pure, per-record —
    * is the contract the pipeline depends on.
    */
  object StubCodec {
    val featureDim = 8
    def decodeFeatures(payload: Array[Byte]): Array[Float] = {
      val f = new Array[Float](featureDim)
      if (payload == null) return f // null media: zero features, not an NPE
      var i = 0
      while (i < payload.length) {
        f(i % featureDim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      f
    }
    /** Frame sampling stub: every k-th slice of the payload. */
    def sampleFrames(payload: Array[Byte], nFrames: Int, every: Int): Seq[Array[Byte]] = {
      if (payload == null || nFrames <= 0 || payload.isEmpty) Seq.empty
      else {
        val frameLen = math.max(1, payload.length / nFrames)
        (0 until nFrames by every).map { k =>
          payload.slice(k * frameLen, math.min((k + 1) * frameLen, payload.length))
        }
      }
    }
  }

  /** Decode features for every payload — partition-streamed via a typed
    * mapPartitions (the Scala analog of a pandas-UDF batch loop: one
    * iterator pass per partition, constant memory, executor-side only).
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("meta"))
      .as[MediaRec]
      .mapPartitions { it =>
        it.map(r => MediaFeat(r.media_id, r.payload, r.meta,
          StubCodec.decodeFeatures(r.payload)))
      }
      .toDF()
  }

  /** Row-level frame sampling: one output row per sampled frame. */
  def sampleFrames(media: DataFrame, every: Int): DataFrame = {
    // every = 0 would throw "step cannot be 0" per row on executors, and
    // a negative step would silently drop every frame
    require(every > 0, "every must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte], Int)] = media
      .select(col("media_id"), col("payload"), col("meta.n_frames"))
      .as[(Long, Array[Byte], Int)]
    ds.flatMap { case (id, payload, nFrames) =>
      StubCodec.sampleFrames(payload, nFrames, every)
        .zipWithIndex.map { case (frame, idx) => (id, idx, frame) }
    }.toDF("media_id", "frame_idx", "frame")
  }
}
