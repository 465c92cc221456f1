package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media payloads ride as opaque `binary`
  * columns with typed metadata structs; decode / feature-extraction /
  * resize / frame-sampling run per-partition in bounded batches.
  *
  * The actual codecs are NOT available in this environment, so the decode
  * kernel is a clearly-marked deterministic STUB (`stubDecode`); the
  * Spark-side plumbing — schema, binary transport, partition-batched
  * processing, metadata struct shape — is real and tested. Swapping the
  * stub for a JNI/FFI codec keeps every other line unchanged.
  */
object Multimodal {

  /** Typed metadata produced by decode. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Attach a binary payload column (here: the UTF-8 bytes of a text
    * column standing in for real media bytes) plus a modality tag. */
  def withPayload(df: DataFrame, srcCol: String, modality: String): DataFrame =
    df.withColumn("payload", col(srcCol).cast("binary"))
      .withColumn("modality", lit(modality))

  /** STUB decode kernel: deterministic pseudo-metadata from the raw bytes.
    * A real implementation would parse the container header / decode
    * frames here; everything around it (batching, schema, partitioning)
    * is production-shaped.
    */
  def stubDecode(payload: Array[Byte], modality: String): Row = {
    // null payload decodes as empty media (one corrupt row must not
    // fail the partition)
    val n = if (payload == null) 0L else payload.length.toLong
    // ??? real codec goes here — deterministic fake derived from length:
    val width = 64 + (n % 577).toInt
    val height = 64 + ((n * 31) % 353).toInt
    val frames = if (modality == "video") 1 + (n % 7).toInt else 1
    Row(n, width, height, frames, modality match {
      case "image" => "png"
      case "audio" => "wav"
      case "video" => "mp4"
      case _       => "bin"
    })
  }

  /** Decode payloads partition-by-partition in bounded batches (the shape
    * a Pandas-UDF / mapInPandas pipeline has in PySpark: per-batch
    * amortized codec setup, no driver involvement, no shuffle). */
  def decode(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields.filterNot(_.name == "payload") :+
      StructField("media", mediaMetaSchema, nullable = false))
    val payloadIdx = inSchema.fieldIndex("payload")
    val modalityIdx = inSchema.fieldIndex("modality")
    val keepIdx = inSchema.fields.indices.filterNot(_ == payloadIdx)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      // batch to amortize per-batch codec initialization (stubbed)
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val meta = stubDecode(row.getAs[Array[Byte]](payloadIdx),
            row.getString(modalityIdx))
          Row.fromSeq(keepIdx.map(row.get) :+ meta)
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

  /** Resize plumbing: batched per-partition kernel rewriting
    * (payload, media) to the target dimensions. The byte transform is the
    * documented stub (payload passes through; a real implementation
    * transcodes here); the batching, schema and metadata update are the
    * production shape. Expects the `decode` output PLUS the original
    * payload (use `decode(df.withColumn("payload_keep", col("payload")))`
    * or call on a frame that still carries `payload`). */
  def resize(df: DataFrame, width: Int, height: Int,
             batchSize: Int = 64): DataFrame = {
    val inSchema = df.schema
    val payloadIdx = inSchema.fieldIndex("payload")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(inSchema)
    val resized = df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // ??? real scaler goes here — the stub keeps bytes unchanged
        batch.iterator.map { row =>
          Row.fromSeq(row.toSeq.updated(payloadIdx,
            row.getAs[Array[Byte]](payloadIdx)))
        }
      }
    }(enc)
    if (resized.columns.contains("media"))
      resized.withColumn("media", struct(
        col("media.byte_len").as("byte_len"),
        lit(width).as("width"), lit(height).as("height"),
        col("media.n_frames").as("n_frames"),
        col("media.format").as("format")))
    else resized
  }

  /** Feature-extraction plumbing: per-payload embedding vector, computed
    * in bounded batches per partition (the shape a CLIP/audio-encoder
    * step has). The encoder is a deterministic md5-derived STUB —
    * feature j = first 32 bits of md5(j + "|" + md5(payload)) scaled to
    * [0,1) — which makes the WHOLE multimodal chain engine-reproducible
    * (the DuckDB oracle recomputes identical vectors), while a real
    * encoder swaps in behind the same signature. Output feeds the ANN
    * operators directly. */
  def featureExtract(df: DataFrame, dim: Int = 16,
                     batchSize: Int = 64): DataFrame = {
    require(dim > 0 && dim <= 256, "feature dim must be in (0, 256]")
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("features", ArrayType(DoubleType, containsNull = false),
        nullable = false))
    val payloadIdx = inSchema.fieldIndex("payload")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // ??? real encoder forward pass goes here (batched) — stub:
        batch.iterator.map { row =>
          val payload = row.getAs[Array[Byte]](payloadIdx)
          val base =
            if (payload == null) graft.functions.TextKernels.md5Hex("")
            else graft.functions.TextKernels.md5Hex2(Array.empty[Byte], payload)
          val feats = Array.tabulate(dim) { j =>
            val h = graft.functions.TextKernels.md5Hex(s"$j|$base")
            java.lang.Long.parseLong(h.substring(0, 8), 16).toDouble / 4294967296.0
          }
          Row.fromSeq(row.toSeq :+ feats.toSeq)
        }
      }
    }(enc)
  }
}
