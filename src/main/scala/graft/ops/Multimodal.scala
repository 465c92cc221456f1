package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media payloads ride as opaque `binary`
  * columns with typed metadata structs; decode / feature-extraction /
  * resize / frame-sampling run per-partition in bounded batches.
  *
  * All byte-level work happens behind the pluggable [[MediaCodec]]
  * boundary. The default instance is [[StubMediaCodec]] (deterministic,
  * oracle-reproducible — what the correctness queries anchor on);
  * [[ImageCodec]] is the production instance for real image payloads
  * (javax.imageio: PNG/JPEG/BMP/GIF decode, pixel resize, grid feature
  * vectors). The Spark-side plumbing — schema, binary transport,
  * partition-batched processing, metadata struct shape — is identical
  * for both; swapping in a further JNI/FFI codec (ffmpeg, ONNX encoder)
  * is a parameter, not an operator edit.
  */
object Multimodal {

  /** Typed metadata produced by decode (row shape of [[MediaMeta]]). */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  private def metaRow(m: MediaMeta): Row =
    Row(m.byteLen, m.width, m.height, m.nFrames, m.format)

  /** Attach a binary payload column (here: the UTF-8 bytes of a text
    * column standing in for real media bytes) plus a modality tag. */
  def withPayload(df: DataFrame, srcCol: String, modality: String): DataFrame =
    df.withColumn("payload", col(srcCol).cast("binary"))
      .withColumn("modality", lit(modality))

  /** Decode payloads partition-by-partition in bounded batches (the shape
    * a Pandas-UDF / mapInPandas pipeline has in PySpark: per-batch
    * amortized codec setup, no driver involvement, no shuffle). */
  def decode(df: DataFrame, batchSize: Int = 64,
             codec: MediaCodec = StubMediaCodec): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields.filterNot(_.name == "payload") :+
      StructField("media", mediaMetaSchema, nullable = false))
    val payloadIdx = inSchema.fieldIndex("payload")
    val modalityIdx = inSchema.fieldIndex("modality")
    val keepIdx = inSchema.fields.indices.filterNot(_ == payloadIdx)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      // batch to amortize per-batch codec initialization
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val meta = codec.decode(row.getAs[Array[Byte]](payloadIdx),
            row.getString(modalityIdx))
          Row.fromSeq(keepIdx.map(row.get) :+ metaRow(meta))
        }
      }
    }(enc)
  }

  /** Frame sampling plumbing: returns one row per sampled frame index for
    * video payloads (every `stride`-th frame) — the exploded shape a real
    * frame extractor emits. */
  def sampleFrames(decoded: DataFrame, stride: Int = 2): DataFrame =
    decoded
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("media.n_frames") - 1, lit(stride))))

  /** Resize: batched per-partition kernel rewriting (payload, media) to
    * the target dimensions via [[MediaCodec.resize]]. Expects the
    * `decode` output PLUS the original payload (use
    * `decode(df.withColumn("payload_keep", col("payload")))` or call on a
    * frame that still carries `payload`). */
  def resize(df: DataFrame, width: Int, height: Int,
             batchSize: Int = 64,
             codec: MediaCodec = StubMediaCodec): DataFrame = {
    val inSchema = df.schema
    val payloadIdx = inSchema.fieldIndex("payload")
    // modality is optional for resize (callers often drop it after
    // decode); codecs see null when absent
    val modalityIdx = inSchema.fieldNames.indexOf("modality")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(inSchema)
    val resized = df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val modality =
            if (modalityIdx >= 0) row.getString(modalityIdx) else null
          Row.fromSeq(row.toSeq.updated(payloadIdx,
            codec.resize(row.getAs[Array[Byte]](payloadIdx),
              modality, width, height)))
        }
      }
    }(enc)
    // byte_len is re-derived from the rewritten payload (a transcoding
    // codec changes it; the stale pre-resize value would lie), while
    // width/height are stamped to the TARGET dims — the declared
    // transform semantics. A codec that passes an undecodable payload
    // through untouched keeps its true byte_len but still shows the
    // target dims here; run decode() again after resize when exact
    // per-row post-transform metadata matters (its format/dims come
    // from the actual bytes).
    if (resized.columns.contains("media"))
      resized.withColumn("media", struct(
        coalesce(length(col("payload")).cast("long"), lit(0L)).as("byte_len"),
        lit(width).as("width"), lit(height).as("height"),
        col("media.n_frames").as("n_frames"),
        col("media.format").as("format")))
    else resized
  }

  /** Feature extraction: per-payload embedding vector via
    * [[MediaCodec.embed]], computed in bounded batches per partition (the
    * shape a CLIP/audio-encoder step has). With the default
    * [[StubMediaCodec]] the whole multimodal chain is engine-reproducible
    * (the DuckDB oracle recomputes identical vectors). Output feeds the
    * ANN operators directly. */
  def featureExtract(df: DataFrame, dim: Int = 16,
                     batchSize: Int = 64,
                     codec: MediaCodec = StubMediaCodec): DataFrame = {
    require(dim > 0 && dim <= 256, "feature dim must be in (0, 256]")
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("features", ArrayType(DoubleType, containsNull = false),
        nullable = false))
    val payloadIdx = inSchema.fieldIndex("payload")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val feats = codec.embed(row.getAs[Array[Byte]](payloadIdx), dim)
          Row.fromSeq(row.toSeq :+ feats.toSeq)
        }
      }
    }(enc)
  }
}
