package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing — extension tier (SURVEY.md §7 step 5).
  *
  * Images/audio/video are carried as opaque `binary` payload columns with
  * a typed metadata struct alongside. The Spark-side machinery (schema,
  * partitioning, per-partition batched processing, frame sampling) is
  * real and tested; the codec itself is a deterministic stand-in —
  * the execution container has no image/audio libraries, so `decodeStub`
  * marks exactly where a real decoder (e.g. via JNI/javacv) would slot
  * in, and derives features from raw bytes instead.
  */
object Multimodal {

  /** Typed row for the per-partition feature extraction path. */
  final case class Asset(doc_id: Long, payload: Array[Byte])
  final case class AssetFeatures(doc_id: Long, n_bytes: Long,
                                 byte_mean: Double, features: Array[Float])

  /** Build an asset table from the documents fixture: the UTF-8 text
    * bytes stand in for an encoded media payload; width/height/channels
    * are deterministic functions of doc_id (multiplicative-hash mod a
    * prime) so metadata handling is oracle-checkable. */
  def assets(docs: DataFrame, idCol: String = "doc_id",
             textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        (lit(64) + (col(idCol) * 2654435761L) % 193).cast("int").as("width"),
        (lit(64) + (col(idCol) * 40503L) % 151).cast("int").as("height"),
        (lit(1) + col(idCol) % 3).cast("int").as("channels"),
        lit("fake/raw").as("format")).as("meta"))

  /** Metadata projection (flat, oracle-checkable): payload size + the
    * typed struct fields. */
  def metaTable(docs: DataFrame): DataFrame =
    assets(docs).select(
      col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      col("meta.channels").as("channels"))
      .orderBy(col("doc_id"))

  /** STUB — real media decode goes here. Deterministic stand-in: a
    * 16-bin byte histogram (normalized) plus the byte mean. Signature
    * and batch shape (Iterator per partition → Iterator of features)
    * are exactly what a real codec integration needs: per-partition
    * setup happens once per task, rows stream through without
    * collecting. */
  def decodeStub(payload: Array[Byte]): (Double, Array[Float]) = {
    // ??? real codec (JPEG/PNG/audio frames) would decode here; the
    // container ships no media libs, so derive features from raw bytes.
    if (payload.isEmpty) (0.0, Array.fill(16)(0.0f))
    else {
      val hist = new Array[Float](16)
      var sum = 0L
      var i = 0
      while (i < payload.length) {
        val b = payload(i) & 0xff
        hist(b >> 4) += 1.0f
        sum += b
        i += 1
      }
      var j = 0
      while (j < 16) { hist(j) /= payload.length.toFloat; j += 1 }
      (sum.toDouble / payload.length, hist)
    }
  }

  /** Feature extraction over the asset table: repartition by doc_id so
    * downstream joins on doc_id are co-partitioned, then run the codec
    * stub per partition (mapPartitions — the per-partition iterator is
    * where a real decoder would amortize its setup). */
  def extractFeatures(assetDf: DataFrame, partitions: Int = 0): Dataset[AssetFeatures] = {
    implicit val inEnc = Encoders.product[Asset]
    implicit val outEnc = Encoders.product[AssetFeatures]
    val typed = (if (partitions > 0)
      assetDf.repartition(partitions, col("doc_id")) else assetDf)
      .select(col("doc_id"), col("payload")).as[Asset]
    typed.mapPartitions { it =>
      // per-partition: real codecs would initialize native state here
      it.map { a =>
        val (mean, feats) = decodeStub(a.payload)
        AssetFeatures(a.doc_id, a.payload.length.toLong, mean, feats)
      }
    }
  }

  /** Frame sampling: slice the payload into `n` evenly-spaced fixed-size
    * "frames" (stand-in for video frame extraction), as pure column
    * expressions — binary substring is codegen'd, no UDF. */
  def sampleFrames(assetDf: DataFrame, n: Int = 4, frameLen: Int = 32): DataFrame =
    assetDf.select(
      col("doc_id"),
      posexplode(
        transform(sequence(lit(0), lit(n - 1)),
          i => col("payload").substr(
            (i * greatest((length(col("payload")) - lit(frameLen)) / n, lit(1)) + 1)
              .cast("int"), lit(frameLen)))))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame_bytes")
}
