package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** M6 — multimodal-column plumbing (builder-prompt north star). Media
  * payloads are opaque `binary` columns with typed metadata alongside —
  * the layout a 100 TB training-data pipeline uses for image/audio/video
  * shards. No media codecs exist in this environment, so the DECODE step
  * is a clearly-marked deterministic STUB; everything around it — the
  * schema, the batch iteration shape, the partition-parallel execution,
  * the feature-column contract — is real Spark and really tested.
  *
  * Design notes:
  *   - `m1` builds the media table relationally (cast to binary +
  *     metadata struct) — codegen'd, oracle-checkable on the metadata.
  *   - `m2` is the decode/feature-extract path: `mapPartitions` over a
  *     typed Dataset, draining each partition in fixed-size batches
  *     (the shape a vectorized decoder — or a Python `mapInPandas`
  *     worker in a PySpark deployment — would consume). One task per
  *     input partition, no shuffle, constant memory per batch.
  *   - At 100 TB: payloads live in parquet binary columns (or pointers
  *     into object-store shards); decode parallelism == partition count;
  *     feature columns append behind the same doc_id key.
  */
object Multimodal extends QueryModule {

  /** Typed row for the decode path. */
  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features (decode STUB output) + resize plan: target
    * dimensions for a 224-max-edge aspect-preserving resize — the
    * resize COMPUTATION is part of the decode stub (no codecs here);
    * the dimension arithmetic and column contract are real. */
  final case class MediaFeatures(
    doc_id: Long, media_type: String, n_bytes: Long,
    width: Int, height: Int, out_width: Int, out_height: Int, checksum: Long)

  /** STUB decoder — stands in for an image/audio codec, which is not
    * available in this container. Deterministic in the payload bytes so
    * tests and the rows-only driver check are stable. A real deployment
    * replaces ONLY this function (same signature, same batch shape). */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Long) = {
    var cs = 1125899906842597L
    var i = 0
    while (i < payload.length) { cs = 31 * cs + (payload(i) & 0xFF); i += 1 }
    val w = 64 + math.floorMod(cs, 512).toInt
    val h = 64 + math.floorMod(cs >> 9, 512).toInt
    (w, h, cs)
  }

  /** m1 — the media catalog: binary payloads + typed metadata, built
    * from `documents` (payload = utf-8 text bytes standing in for an
    * encoded frame). */
  private def m1(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .select($"doc_id",
        when($"doc_id" % 3 === 0, "image")
          .when($"doc_id" % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        $"text".cast("binary").as("payload"),
        octet_length($"text".cast("binary")).cast("long").as("n_bytes"),
        $"source")
      .select($"doc_id", $"media_type", $"n_bytes", $"source")
      .orderBy($"doc_id")
  }

  /** m2 — partition-parallel batched decode (STUB) + feature extract.
    * Rows-only driver check (the stub is not SQL-expressible); the
    * batch/partition mechanics are asserted in ScalaTest. */
  private def m2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaRow] = Tables(spark, dir).documents
      .select($"doc_id",
        when($"doc_id" % 3 === 0, "image")
          .when($"doc_id" % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        $"text".cast("binary").as("payload"))
      .as[MediaRow]

    media.mapPartitions { rows =>
      // Fixed-size batches: the contract a vectorized decoder consumes.
      rows.grouped(32).flatMap { batch =>
        batch.map { r =>
          val (w, h, cs) = decodeStub(r.payload)
          // Aspect-preserving resize to a 224 max edge (scale-down only).
          val scale = math.min(1.0, 224.0 / math.max(w, h))
          val (ow, oh) = (math.round(w * scale).toInt, math.round(h * scale).toInt)
          MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong, w, h, ow, oh, cs)
        }
      }
    }.toDF().orderBy($"doc_id")
  }

  /** m3 — frame sampling: chop each payload into fixed 256-byte frames,
    * keep every 4th (the video keyframe-sampling shape: per-row explode
    * with a stride, no shuffle; at 100 TB frame extraction parallelizes
    * per payload and the stride bounds the output volume). */
  private def m3(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nBytes = octet_length($"text".cast("binary")).cast("long")
    val nFrames = ceil(nBytes.cast("double") / 256.0).cast("long")
    // Guard the zero-length payload: sequence(0, -1) would step DOWN to
    // [0, -1] and leak a spurious frame 0, while the oracle's range(0, 0)
    // emits nothing. Empty payload => empty frame list on both engines.
    val frameIdxs = when(nFrames > 0, sequence(lit(0L), nFrames - 1))
      .otherwise(array().cast("array<bigint>"))
    Tables(spark, dir).documents
      .select($"doc_id", nBytes.as("n_bytes"),
        explode(frameIdxs).as("frame_idx"))
      .filter($"frame_idx" % 4 === 0)
      .select($"doc_id", $"frame_idx",
        least(lit(256L), $"n_bytes" - $"frame_idx" * 256).as("frame_len"))
      .orderBy($"doc_id", $"frame_idx")
  }

  /** m4 — frame-sampling accounting: per media item, how many frames
    * the stride keeps and how many bytes they cover (the numbers a
    * video-ingest budget is planned against). Same explode as m3 folded
    * straight into a map-combined aggregate — the explode never hits a
    * shuffle, only its (doc_id-keyed) partial aggregates do. */
  private def m4(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nBytes = octet_length($"text".cast("binary")).cast("long")
    val nFrames = ceil(nBytes.cast("double") / 256.0).cast("long")
    val frameIdxs = when(nFrames > 0, sequence(lit(0L), nFrames - 1))
      .otherwise(array().cast("array<bigint>"))
    Tables(spark, dir).documents
      .select($"doc_id", nBytes.as("n_bytes"),
        explode(frameIdxs).as("frame_idx"))
      .filter($"frame_idx" % 4 === 0)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_sampled"),
        sum(least(lit(256L), $"n_bytes" - $"frame_idx" * 256)).as("bytes_sampled"))
      .orderBy($"doc_id")
  }

  /** m5 — per-modality STORAGE BUDGET: the capacity-planning rollup
    * over the media catalog (count, total/mean bytes, p95 payload) —
    * what decides bucket sizing, tiering, and scan parallelism before
    * any 100 TB multimodal ingest. Payload sizes are integers →
    * percentile state is discrete (catalog rule) and the p95
    * interpolation runs on identical rank doubles in both engines;
    * sum(BIGINT) gets the BIGINT cast in the oracle (HUGEINT rule). */
  private def m5(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .select(
        when($"doc_id" % 3 === 0, "image")
          .when($"doc_id" % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        octet_length($"text".cast("binary")).cast("long").as("n_bytes"))
      .groupBy($"media_type")
      .agg(count(lit(1)).as("n_items"),
        sum($"n_bytes").as("total_bytes"),
        round(avg($"n_bytes"), 6).as("mean_bytes"),
        round(percentile($"n_bytes", lit(0.95)), 6).as("p95_bytes"))
      .orderBy($"media_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m5_storage_budget"   -> (m5 _),
    "m1_media_catalog"    -> (m1 _),
    "m2_media_features"   -> (m2 _),
    "m3_frame_sample"     -> (m3 _),
    "m4_frame_stats"      -> (m4 _))

  val oracles: Map[String, String] = Map(
    "m5_storage_budget" ->
      """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
        |            WHEN doc_id % 3 = 1 THEN 'audio'
        |            ELSE 'video' END AS media_type,
        |       count(*) AS n_items,
        |       CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
        |       round(avg(octet_length(CAST(text AS BLOB))), 6) AS mean_bytes,
        |       round(quantile_cont(octet_length(CAST(text AS BLOB)), 0.95), 6)
        |         AS p95_bytes
        |FROM documents GROUP BY 1 ORDER BY media_type""".stripMargin,
    "m1_media_catalog" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id % 3 = 0 THEN 'image'
        |            WHEN doc_id % 3 = 1 THEN 'audio'
        |            ELSE 'video' END AS media_type,
        |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |       source
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m4_frame_stats" ->
      """WITH f AS (
        |  SELECT doc_id,
        |         CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |         unnest(range(0, CAST(ceil(octet_length(CAST(text AS BLOB)) / 256.0) AS BIGINT)))
        |           AS frame_idx
        |  FROM documents)
        |SELECT doc_id, count(*) AS n_sampled,
        |       CAST(sum(least(256, n_bytes - frame_idx * 256)) AS BIGINT)
        |         AS bytes_sampled
        |FROM f WHERE frame_idx % 4 = 0
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "m3_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id,
        |         CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |         unnest(range(0, CAST(ceil(octet_length(CAST(text AS BLOB)) / 256.0) AS BIGINT)))
        |           AS frame_idx
        |  FROM documents)
        |SELECT doc_id, frame_idx,
        |       least(256, n_bytes - frame_idx * 256) AS frame_len
        |FROM f WHERE frame_idx % 4 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin)
}
