package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators for training-data pipelines: image/audio/
  * video ride as opaque `binary` columns plus typed metadata; decode /
  * feature-extract / resize / frame-sample run per partition in bounded
  * batches.
  *
  * The actual media decoding is STUBBED (this container ships no image or
  * audio codecs): `StubCodec` derives deterministic pseudo-metadata and
  * pseudo-pixels from the bytes. Everything around it — the schemas, the
  * `mapPartitions` batch shape, null handling, partition preservation —
  * is the real plumbing a production decoder (JNI / Python worker via
  * `mapInPandas`-style batching) would plug into.
  */
object Multimodal {

  /** Output schema of decodeMeta — the typed metadata struct a real
    * decoder would produce.
    */
  val MetaSchema: StructType = StructType(Seq(
    StructField("byte_len", IntegerType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** STUB decoder: deterministic pseudo metadata from content bytes. A real
    * implementation replaces ONLY this object.
    */
  object StubCodec {
    private val Formats = Array("jpeg", "png", "webp")

    def sniff(bytes: Array[Byte]): Row = {
      if (bytes == null) return null
      var h = 1125899906842597L
      var i = 0
      while (i < math.min(bytes.length, 64)) { h = 31 * h + bytes(i); i += 1 }
      val pos = ((h % Formats.length) + Formats.length) % Formats.length
      Row(bytes.length, Formats(pos.toInt),
        (math.abs(h / 7) % 1920 + 1).toInt, (math.abs(h / 13) % 1080 + 1).toInt)
    }

    /** Pseudo "resize": deterministic byte fold to the target size. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      if (bytes == null) return null
      val out = new Array[Byte](math.min(w * h, 4096))
      var i = 0
      while (i < out.length) { out(i) = bytes(i % math.max(bytes.length, 1)); i += 1 }
      out
    }
  }

  /** Decode metadata for a binary column via per-partition batching: rows
    * stream through in bounded groups (the shape a vectorized/Python
    * decoder needs), no driver collection, partitioning preserved.
    */
  def decodeMeta(df: DataFrame, binCol: String, batchSize: Int = 256): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("media_meta", MetaSchema))
    val binIdx = df.schema.fieldIndex(binCol)
    val out = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real decoder would submit `batch` to the codec worker here
        batch.iterator.map { r =>
          Row.fromSeq(r.toSeq :+ StubCodec.sniff(r.getAs[Array[Byte]](binIdx)))
        }
      }
    }
    df.sparkSession.createDataFrame(out, schema)
  }

  /** Pseudo-resize a binary column (same batched partition shape). */
  def resizeBinary(df: DataFrame, binCol: String, w: Int, h: Int,
                   outCol: String = "resized", batchSize: Int = 256): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, BinaryType))
    val binIdx = df.schema.fieldIndex(binCol)
    val out = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.iterator.map { r =>
        Row.fromSeq(r.toSeq :+ StubCodec.resize(r.getAs[Array[Byte]](binIdx), w, h))
      })
    }
    df.sparkSession.createDataFrame(out, schema)
  }

  /** Frame-sample: every k-th element of an array<binary> column (video
    * frames), columnar — no UDF needed.
    */
  def sampleFrames(framesCol: String, k: Int): org.apache.spark.sql.Column =
    filter(col(framesCol), (_, i) => i % k === 0)

  /** 64-bit sampled-threshold perceptual hash of an opaque media blob —
    * the aHash/pHash SHAPE (a fixed-size bit signature whose hamming
    * distance tracks content similarity) with the codec replaced by a
    * deterministic byte probe, per the stub-decode doctrine: bit i
    * tests the LOW-NIBBLE PARITY of the byte at offset ⌊i·n/64⌋ — 64
    * evenly spaced samples whatever the blob size, so same-length
    * blobs differing in k bytes differ in ≤ k sampled bits (the
    * locality a perceptual hash exists for; a real deployment swaps
    * the probe for decoded 8×8 luma means, the banding downstream is
    * unchanged). Low nibble, not high: ASCII-range test bytes never
    * set the high bit, which would collapse every hash to zero. Pure
    * per-row expression over the hex rendering (the engine-portable
    * byte accessor m02/m03 established): no UDF, no shuffle. Pair via
    * [[graft.operators.Dedup.hamming64Pairs]].
    */
  def phash64(blob: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    phash64FromHex(lower(hex(blob)), octet_length(blob).cast("long"))

  /** [[phash64]] over a pre-rendered lowercase-hex column + byte length.
    * Use THIS form (with the hex projection materialized first — e.g.
    * `.localCheckpoint()`, the d11 pattern) whenever the blob is itself
    * a non-trivial expression: the 64 bit samples each reference the
    * hex input, and Catalyst's project-collapse would otherwise inline
    * a 64-fold copy of the blob expression tree into the projection —
    * measured 4.85 s → 0.5 s on m04, where the planted blob chains 8
    * md5s + concat + encode (subexpression elimination does not rescue
    * an expression this wide). Against a materialized attribute the 64
    * references are plain reads of one row value.
    */
  def phash64FromHex(h: org.apache.spark.sql.Column,
                     n: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val oddNibbles = Seq("1", "3", "5", "7", "9", "b", "d", "f")
    (0 until 64).map { i =>
      // low-nibble hex char of 0-based byte ⌊i·n/64⌋ sits at 1-based
      // hex index 2·⌊i·n/64⌋ + 2
      val idx = (floor(n * i / 64).cast("int") * 2 + 2)
      when(substr(h, idx, lit(1)).isin(oddNibbles: _*),
        lit(1L << (63 - i))).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** 64-bit energy-delta fingerprint of a decoded sample array — the
    * chromaprint/audio SHAPE: overlapping window energies
    * e_i = Σ codes[i·hop+1 .. i·hop+win], fingerprint bit i = [e_i >
    * e_{i+1}]. Delta signs are GAIN INVARIANT: a constant added to
    * every sample shifts each energy by win·gain and no strict
    * comparison moves — volume-normalized re-encodes collide, the
    * property acoustic fingerprints exist for. A localized k-byte
    * glitch touches ≤ ⌈win/hop⌉ energies → ≤ ⌈win/hop⌉+1 bits, so
    * hamming tracks corruption locally. Pure per-row expression; the
    * codes→energies→bits chain nests inside single-element `transform`
    * lambdas (a poor man's LET binding) so each stage evaluates ONCE
    * per row instead of re-inlining per downstream reference — the
    * m04 project-collapse lesson, solved in-expression this time.
    * Pair via [[graft.operators.Dedup.hamming64Pairs]].
    *
    * `codes` is array<int> (decoded PCM-ish samples; in the stub-codec
    * doctrine, byte values). Needs codes length ≥ 64·hop + win.
    */
  def audioFp64(codes: org.apache.spark.sql.Column,
                win: Int = 8, hop: Int = 4): org.apache.spark.sql.Column = {
    val pw = (0 until 64).map(i => lit(1L << (63 - i)))
    element_at(transform(array(codes), cs => {
      val en = transform(sequence(lit(0), lit(64)), i =>
        aggregate(slice(cs, i * hop + 1, lit(win)), lit(0), _ + _))
      element_at(transform(array(en), e =>
        (0 until 64).map(i =>
          when(element_at(e, i + 1) > element_at(e, i + 2), pw(i))
            .otherwise(lit(0L))).reduce(_ + _)), 1)
    }), 1)
  }
}
