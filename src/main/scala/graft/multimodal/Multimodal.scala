package graft.multimodal

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column handling (north-star extension): media as opaque
  * `binary` columns + typed metadata, with decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The container has no image/audio codecs, so the *decode kernel* is
  * STUBBED with a deterministic fake (byte-length arithmetic). The
  * Spark-side plumbing is real and is the part that matters at scale:
  * binary column schema, typed Dataset encoders, batched
  * `mapPartitions` (the JVM analogue of `mapInPandas` — decode
  * amortized over batches, not per-row calls), and the explode shape
  * for frame sampling.
  */
object Multimodal {

  /** A packed multimodal record: payload is the raw media bytes. */
  case class MediaRecord(
      doc_id: Long, payload: Array[Byte], lang: String, source: String,
      label: Int, embedding: Array[Float])

  /** Decoded media metadata. STUB: real impl would run an image codec;
    * the fake derives dimensions from byte length deterministically so
    * the pipeline is oracle-checkable.
    */
  case class DecodedMedia(
      doc_id: Long, byte_len: Long, width: Long, height: Long,
      n_frames: Long, out_w: Long, out_h: Long)

  /** STUB decode kernel — deterministic fake of an image header parse.
    * Real deployments replace the body with a codec call; the
    * signature (bytes in, metadata out, called once per element inside
    * a batched iterator) is the real contract.
    */
  def fakeDecode(docId: Long, payload: Array[Byte]): DecodedMedia = {
    val n = payload.length.toLong
    val width = 64L + n % 512L
    val height = 64L + (n * 7L) % 512L
    val frames = 1L + n % 8L
    // "resize" to fit 224 on the long edge, aspect preserved
    val longEdge = math.max(width, height)
    val outW = width * 224L / longEdge
    val outH = height * 224L / longEdge
    DecodedMedia(docId, n, width, height, frames, outW, outH)
  }

  /** documents ⋈ embeddings packed into one multimodal frame. The join
    * key is doc_id=vec_id (1:1); embeddings is the smaller relation →
    * broadcast; text bytes become the opaque payload column.
    */
  def pack(s: SparkSession, d: String, spreadDocs: Boolean = false)
      : DataFrame = {
    // spread applies to the raw SCAN, not the joined frame: calling
    // Tables.spread on a broadcast-join plan would materialize the
    // broadcast during planning (df.rdd prepares the exchange) and
    // again at execution; on a pure scan .rdd builds the RDD without
    // running a job, and the broadcast join preserves the streamed
    // side's partitioning so the downstream kernel still fans out
    val docs0 = Tables.load(s, d, "documents")
    val docs = if (spreadDocs) Tables.spread(docs0) else docs0
    val embs = Tables.load(s, d, "embeddings")
    docs.join(broadcast(embs), docs("doc_id") === embs("vec_id"))
      .select(docs("doc_id"),
        docs("text").cast("binary").as("payload"),
        docs("lang"), docs("source"), embs("label"), embs("embedding"))
  }

  /** The decode kernel's input: just the id and the raw bytes. A codec
    * needs nothing else, and dragging lang/source/label/embedding
    * through the encoder would serialize every embedding into each
    * decode batch for no reason.
    */
  case class MediaPayload(doc_id: Long, payload: Array[Byte])

  /** A decode kernel: one *vectorized* call per batch of records.
    * Production swaps in a codec/GPU/JNI implementation; the default
    * maps the deterministic stub. Must be serializable (runs on
    * executors).
    */
  type DecodeKernel = Seq[MediaPayload] => Seq[DecodedMedia]

  val stubKernel: DecodeKernel =
    batch => batch.map(r => fakeDecode(r.doc_id, r.payload))

  /** Batched decode over the packed frame: typed mapPartitions pulling
    * fixed-size batches through the kernel — the shape a vectorized
    * decoder needs (decode cost amortizes over `batchSize` elements,
    * not per-row calls). Stays fully distributed: no collect, no
    * driver involvement.
    *
    * Partitioning is the CALLER's concern: decode inherits the input
    * split layout (the spec relies on this to count batches). Query
    * entry points repartition before calling so a single-file local
    * scan doesn't pin the CPU-heavy kernel to one core.
    */
  def decode(packed: DataFrame, batchSize: Int = 64,
      kernel: DecodeKernel = stubKernel): DataFrame = {
    val s = packed.sparkSession
    import s.implicits._
    packed.select("doc_id", "payload")
      .as[MediaPayload]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(batch => kernel(batch))
      }
      .toDF()
  }

  /** Batched embedding-inference output: an exact integer count
    * vector in the stub (letter histogram), so the pipeline is
    * oracle-checkable; a real encoder returns floats through the same
    * seam.
    */
  case class EmbeddedMedia(doc_id: Long, embedding: Array[Long])

  /** An embedding-inference kernel: batched like DecodeKernel — the
    * seam a GPU/ONNX encoder plugs into (batch in, vectors out,
    * amortized over batchSize elements). Must be serializable.
    */
  type EmbedKernel = Seq[MediaPayload] => Seq[EmbeddedMedia]

  /** STUB encoder: 26-dim lowercase-letter histogram of the payload
    * bytes — deterministic and integer-exact (ASCII corpus).
    */
  val stubEmbedKernel: EmbedKernel = batch => batch.map { r =>
    val counts = new Array[Long](26)
    r.payload.foreach { b =>
      val c = (b | 0x20).toChar
      if (c >= 'a' && c <= 'z') counts(c - 'a') += 1
    }
    EmbeddedMedia(r.doc_id, counts)
  }

  /** Batched embedding inference over the packed frame — the encoder
    * twin of [[decode]]: same typed mapPartitions/grouped-batch shape,
    * same partitioning contract (callers spread single-split scans).
    */
  def embed(packed: DataFrame, batchSize: Int = 64,
      kernel: EmbedKernel = stubEmbedKernel): DataFrame = {
    val s = packed.sparkSession
    import s.implicits._
    packed.select("doc_id", "payload")
      .as[MediaPayload]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(batch => kernel(batch))
      }
      .toDF()
  }

  def queries: Map[String, Q] = Map(
    // Perceptual-hash near-dup — the media twin of dedup_simhash: a
    // 52-bit two-plane sign hash over the encoder's feature vector (bit i set
    // iff dim i sits above the vector mean, bit 26+i iff above twice
    // it — cross-multiplied 26·vᵢ > Σv / 13·vᵢ > Σv, no division),
    // banded 18/17/17 so any pair within
    // Hamming ≤ 2 shares at least one exact band (pigeonhole: 3
    // bands, ≤ 2 differing bits), then exact bit_count verification
    // on candidates only. Blocking is by band equality → one
    // (band, bval) shuffle, candidate fan-out bounded by bucket
    // occupancy; never all-pairs. Runs on the stub letter-histogram
    // kernel (deterministic, SQL-replayable → fully oracle-checked);
    // a real image encoder flows through the identical seam and
    // bit-arithmetic.
    "mm_phash_dedup" -> ((s, d) => {
      import s.implicits._
      val h = embed(pack(s, d, spreadDocs = true))
        .withColumn("tot",
          aggregate($"embedding", lit(0L), (a, x) => a + x))
        .withColumn("ph", expr(
          """aggregate(sequence(0, 25), 0L, (acc, i) ->
             acc + IF(26 * element_at(embedding, i + 1) > tot,
               shiftleft(1L, i), 0L)
                 + IF(13 * element_at(embedding, i + 1) > tot,
               shiftleft(1L, i + 26), 0L))"""))
        .select($"doc_id", $"ph")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bands = h.select($"doc_id", $"ph",
        posexplode(array(expr("ph & 262143"),
          expr("shiftright(ph, 18) & 131071"),
          expr("shiftright(ph, 35)")))
          .as(Seq("band", "bval")))
      bands.select($"band", $"bval", $"doc_id".as("doc_a"),
          $"ph".as("ha"))
        .join(bands.select($"band", $"bval", $"doc_id".as("doc_b"),
          $"ph".as("hb")), Seq("band", "bval"))
        .filter($"doc_a" < $"doc_b")
        .select($"doc_a", $"doc_b", $"ha", $"hb").distinct()
        .withColumn("hamming",
          expr("cast(bit_count(ha ^ hb) as bigint)"))
        .filter($"hamming" <= 2)
        .select($"doc_a", $"doc_b", $"hamming")
        .orderBy($"doc_a", $"doc_b")
    }),

    // the inference seam end-to-end: pack → batched encoder kernel →
    // vector postprocessing (dim / L1 norm / content fingerprint of
    // the vector itself), all row-local after the kernel
    "mm_embed" -> ((s, d) => {
      import s.implicits._
      embed(pack(s, d, spreadDocs = true))
        .select(
          $"doc_id",
          size($"embedding").cast("long").as("dim"),
          aggregate($"embedding", lit(0L), (acc, x) => acc + x).as("l1"),
          md5(concat_ws(",", transform($"embedding", _.cast("string"))))
            .as("vec_fp"))
        .orderBy($"doc_id")
    }),
    "mm_pack" -> ((s, d) => {
      import s.implicits._
      pack(s, d).select(
        $"doc_id",
        length($"payload").cast("long").as("payload_bytes"),
        $"lang", $"source",
        $"label",
        size($"embedding").cast("long").as("emb_dim"))
        .orderBy($"doc_id")
    }),
    "mm_decode" -> ((s, d) => {
      import s.implicits._
      // single-file local scan → one split → spread the kernel stage
      // across cores; Tables.spread skips the exchange entirely when
      // the scan already has >= session-parallelism splits (100 TB)
      decode(pack(s, d, spreadDocs = true))
        .orderBy($"doc_id")
    }),

    // ABR resolution-ladder budget — the transcode plan every video
    // corpus commits to before a training ingest: for each ladder
    // rung at or below the asset's native short edge, the output dims
    // (aspect preserved, integer truncation) and the pixel budget.
    // Builds on the REAL decode seam (dims come through the batched
    // kernel, never recomputed inline); rung choice and output dims
    // are ROW-LOCAL integer arithmetic, the rollup is ladder-bounded
    // (5 rows), and reach_milli divides on the broadcast asset total.
    // Headline: total_pixels per rung IS the transcode cost curve.
    "mm_resolution_ladder" -> ((s, d) => {
      import s.implicits._
      val dims = decode(pack(s, d, spreadDocs = true))
        .select($"doc_id",
          least($"width", $"height").as("short"),
          greatest($"width", $"height").as("long"))
      val tot = dims.agg(count(lit(1)).as("n_assets_total"))
      dims
        .select($"doc_id", $"short", $"long", explode(array(
          lit(96L), lit(144L), lit(240L), lit(360L), lit(480L)))
          .as("rung"))
        .filter($"rung" <= $"short")
        .select($"rung",
          expr("long * rung div short").as("out_long"))
        .groupBy($"rung")
        .agg(count(lit(1)).as("n_assets"),
          sum($"rung" * $"out_long").as("total_pixels"))
        .crossJoin(broadcast(tot))
        .select($"rung", $"n_assets", $"total_pixels",
          expr("total_pixels div n_assets").as("mean_pixels"),
          expr("n_assets * 1000 div n_assets_total").as("reach_milli"))
        .orderBy($"rung")
    }),
    "mm_features" -> ((s, d) => {
      import s.implicits._
      // feature-extract stage: a deterministic character-class
      // histogram over the payload — the stub stand-in for an image
      // feature vector; real deployments swap in a model encoder.
      // Kept scalar-per-class (array outputs break the hash gate).
      val txt = lower($"text")
      Tables.load(s, d, "documents")
        .select(
          $"doc_id",
          size(regexp_extract_all(txt, lit("[a-z]"), lit(0))).cast("long")
            .as("f_alpha"),
          size(regexp_extract_all(txt, lit("[0-9]"), lit(0))).cast("long")
            .as("f_digit"),
          size(regexp_extract_all(txt, lit("\\s"), lit(0))).cast("long")
            .as("f_space"),
          length($"text").cast("long").as("f_len"))
        .orderBy($"doc_id")
    }),

    // Exact multimodal dedup across fetches: a re-crawl delivers
    // byte-identical payloads under new fetch ids (derived here from
    // the snapshot for doc_id%7==0 — the fixtures ship one crawl; the
    // pipeline_cdc_apply precedent), and the dedup keeps the earliest
    // (fetch, doc) per content digest. Payload bytes never shuffle:
    // the digest is computed in the scan projection and ONLY the
    // digest + ids ride the groupBy exchange — at 100 TB of media
    // that is the difference between shuffling terabytes and
    // megabytes. One key shuffle, map-side combinable aggregates.
    "mm_dedup" -> ((s, d) => {
      import s.implicits._
      def m = pack(s, d).select($"doc_id", $"payload")
      val crawl0 = m
      val recrawl = m.filter($"doc_id" % 7 === 0)
      // keeper = min(doc_id): every digest group contains its fetch-0
      // row, so the general min-(fetch, doc) tuple collapses to the
      // doc minimum (the tuple form is q48's min_by pattern)
      crawl0.unionByName(recrawl)
        .select($"doc_id", md5($"payload").as("digest"))
        .groupBy($"digest")
        .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("doc_id"))
        .select($"doc_id", $"digest", $"n_copies")
        .orderBy($"doc_id")
    }),

    "mm_frame_sample" -> ((s, d) => {
      import s.implicits._
      // sample every 2nd frame of each decoded media item
      decode(pack(s, d, spreadDocs = true))
        .select($"doc_id", $"n_frames",
          explode(sequence(lit(0L), $"n_frames" - 1L, lit(2L)))
            .as("frame_idx"))
        .orderBy($"doc_id", $"frame_idx")
    }),

    // Energy-threshold voice-activity detection over the audio seam:
    // 160-byte frames (10 ms at 16 kHz/8-bit — the standard VAD hop),
    // per-item adaptive threshold (integer mean frame energy), voiced
    // segments as runs of above-threshold frames. The segmentation
    // every speech pipeline runs before transcription — silence is
    // most of raw audio, and shipping it to an ASR model is the
    // multimodal analogue of training on boilerplate. Runs through
    // the SAME batched kernel seam as decode/embed (a real
    // energy/spectral VAD swaps in); the stub energy is the byte sum
    // per frame — pure integer arithmetic DuckDB replays from ascii()
    // (ASCII corpus: chars == bytes), so the whole op is
    // oracle-checked end to end. Entirely row-local — the only
    // shuffle is the display sort.
    "mm_audio_vad" -> ((s, d) => {
      import s.implicits._
      vad(pack(s, d, spreadDocs = true)
        .filter(length($"payload") > 0))
        .orderBy($"doc_id")
    }),

    // Scene-cut detection — the VISUAL segmentation twin of
    // mm_audio_vad: consecutive-frame signature differences above an
    // adaptive (integer-mean) threshold mark shot boundaries, the
    // pass a video pipeline runs before per-shot frame sampling
    // (mm_frame_sample's uniform stride wastes decode budget inside
    // static shots). Same batched kernel seam; the stub frame
    // signature is the 160-byte-frame byte sum, so the whole op
    // replays in DuckDB and is oracle-exact; a real histogram/SSIM
    // detector swaps into the seam.
    "mm_scene_cut" -> ((s, d) => {
      import s.implicits._
      sceneCuts(pack(s, d, spreadDocs = true)
        .filter(length($"payload") > 0))
        .orderBy($"doc_id")
    }),

    // Modality-coverage audit: per (lang, source), how many documents
    // actually HAVE an embedding — the completeness read before any
    // multimodal training run (pack() inner-joins, silently dropping
    // uncovered docs; at sf0.1 only 40% of documents carry vectors,
    // which is exactly the kind of gap this surfaces). One broadcast
    // existence join + an enum-bounded rollup; coverage is a single
    // display divide.
    "mm_coverage" -> ((s, d) => {
      import s.implicits._
      val emb = Tables.load(s, d, "embeddings")
        .select($"vec_id".as("doc_id")).withColumn("has_emb", lit(1L))
      Tables.spread(Tables.load(s, d, "documents"))
        .join(broadcast(emb), Seq("doc_id"), "left")
        .groupBy($"lang", $"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce($"has_emb", lit(0L))).as("n_with_embedding"),
          sum($"n_chars").as("n_chars"))
        .select($"lang", $"source", $"n_docs", $"n_with_embedding",
          $"n_chars",
          round($"n_with_embedding".cast("double") /
            $"n_docs".cast("double"), 6).as("coverage"))
        .orderBy($"lang", $"source")
    }))

  /** Per-item VAD output: frame count, voiced-frame count, voiced
    * segments (runs), longest segment — all exact integers.
    */
  case class VadResult(
      doc_id: Long, n_frames: Long, n_voiced: Long, n_segments: Long,
      max_segment: Long)

  /** A VAD kernel: batched like DecodeKernel — the seam a real
    * energy/spectral VAD (webrtcvad, silero) plugs into. The stub
    * frames the payload at 160 bytes, takes byte-sum energies, and
    * thresholds at the integer mean.
    */
  type VadKernel = Seq[MediaPayload] => Seq[VadResult]

  val stubVadKernel: VadKernel = batch => batch.map { r =>
    val energies = r.payload.grouped(160)
      .map(_.map(b => (b & 0xff).toLong).sum).toArray
    val n = energies.length.toLong
    if (n == 0L) VadResult(r.doc_id, 0L, 0L, 0L, 0L)
    else {
      val thresh = energies.sum / n // integer floor mean
      var nVoiced = 0L; var nSeg = 0L; var cur = 0L; var maxSeg = 0L
      energies.foreach { e =>
        if (e > thresh) {
          nVoiced += 1; cur += 1
          if (cur == 1L) nSeg += 1
          if (cur > maxSeg) maxSeg = cur
        } else cur = 0L
      }
      VadResult(r.doc_id, n, nVoiced, nSeg, maxSeg)
    }
  }

  /** Batched VAD over the packed frame — the third consumer of the
    * kernel seam (decode, embed, vad): same typed
    * mapPartitions/grouped-batch shape, same partitioning contract.
    */
  def vad(packed: DataFrame, batchSize: Int = 64,
      kernel: VadKernel = stubVadKernel): DataFrame = {
    val s = packed.sparkSession
    import s.implicits._
    packed.select("doc_id", "payload")
      .as[MediaPayload]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(batch => kernel(batch))
      }
      .toDF()
  }

  /** Per-item scene-cut output: frame count, boundary count, floor
    * mean shot length — all exact integers.
    */
  case class SceneCuts(
      doc_id: Long, n_frames: Long, n_cuts: Long, mean_shot_len: Long)

  /** A scene-cut kernel (histogram/SSIM detectors plug in): the stub
    * takes 160-byte-frame byte-sum signatures and thresholds the
    * consecutive-frame absolute difference at its integer mean.
    */
  type SceneKernel = Seq[MediaPayload] => Seq[SceneCuts]

  val stubSceneKernel: SceneKernel = batch => batch.map { r =>
    val e = r.payload.grouped(160)
      .map(_.map(b => (b & 0xff).toLong).sum).toArray
    val n = e.length.toLong
    if (n <= 1L) SceneCuts(r.doc_id, n, 0L, n)
    else {
      val diffs = e.sliding(2).map {
        case Array(a, b) => math.abs(b - a)
        case _ => 0L
      }.toArray
      val th = diffs.sum / diffs.length
      val cuts = diffs.count(_ > th).toLong
      SceneCuts(r.doc_id, n, cuts, n / (cuts + 1L))
    }
  }

  /** Batched scene-cut detection — fourth consumer of the kernel
    * seam; same shape and partitioning contract as decode/embed/vad.
    */
  def sceneCuts(packed: DataFrame, batchSize: Int = 64,
      kernel: SceneKernel = stubSceneKernel): DataFrame = {
    val s = packed.sparkSession
    import s.implicits._
    packed.select("doc_id", "payload")
      .as[MediaPayload]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(batch => kernel(batch))
      }
      .toDF()
  }

  /** Byte-length contract sites (payload_bytes, decode dims, frame
    * counts) replay via strlen = BYTE length; the per-character
    * kernels (scene_cut/vad/embed frame folds) still index chars —
    * equal to bytes on the ASCII fixture, documented divergence on
    * non-ASCII corpora (the real kernels consume raw payload bytes).
    */
  /** Letter-count list literal for the mm_embed oracle (generated —
    * 26 hand-written regexp_extract_all calls would drift).
    */
  private val letterCounts: String = ('a' to 'z').map(c =>
    s"CAST(len(regexp_extract_all(lower(text), '$c')) AS BIGINT)")
    .mkString(", ")

  def oracles: Map[String, String] = Map(

    "mm_coverage" ->
      """SELECT d.lang, d.source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_with_embedding,
           CAST(sum(d.n_chars) AS BIGINT) AS n_chars,
           round(CAST(sum(CASE WHEN e.vec_id IS NOT NULL THEN 1
               ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             AS coverage
         FROM documents d
         LEFT JOIN embeddings e ON e.vec_id = d.doc_id
         GROUP BY 1, 2 ORDER BY 1, 2""",

    // The VAD frame CTE with consecutive-diff lists instead of the
    // threshold flags; all integer.
    "mm_scene_cut" ->
      """WITH m AS (
           SELECT d.doc_id, d.text
           FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
         f AS (
           SELECT doc_id,
             list_transform(range(0, (len(text) + 159) // 160), fr ->
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(
                   range(fr * 160 + 1,
                     least((fr + 1) * 160, len(text)) + 1),
                   i -> CAST(ascii(text[i]) AS BIGINT))),
                 (a, b) -> a + b)) AS fe
           FROM m WHERE len(text) > 0),
         dl AS (
           SELECT doc_id, CAST(len(fe) AS BIGINT) AS n_frames,
             list_transform(range(2, len(fe) + 1),
               i -> abs(fe[i] - fe[i - 1])) AS diffs
           FROM f),
         c AS (
           SELECT doc_id, n_frames,
             CASE WHEN n_frames <= 1 THEN 0
               ELSE len(list_filter(diffs, x ->
                 x > list_reduce(list_prepend(CAST(0 AS BIGINT),
                   diffs), (a, b) -> a + b) // len(diffs)))
             END AS n_cuts
           FROM dl)
         SELECT doc_id, n_frames, CAST(n_cuts AS BIGINT) AS n_cuts,
           CAST(n_frames // (n_cuts + 1) AS BIGINT) AS mean_shot_len
         FROM c ORDER BY doc_id""",

    // Frame energies from ascii() byte sums (chars == bytes on the
    // ASCII corpus), integer-mean threshold, then the q113
    // gaps-and-islands decomposition over the unnested voiced flags.
    "mm_audio_vad" ->
      """WITH m AS (
           SELECT d.doc_id, d.text
           FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
         f AS (
           SELECT doc_id,
             list_transform(range(0, (len(text) + 159) // 160), fr ->
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(
                   range(fr * 160 + 1,
                     least((fr + 1) * 160, len(text)) + 1),
                   i -> CAST(ascii(text[i]) AS BIGINT))),
                 (a, b) -> a + b)) AS fe
           FROM m WHERE len(text) > 0),
         t AS (
           SELECT doc_id, fe, CAST(len(fe) AS BIGINT) AS n_frames,
             list_reduce(list_prepend(CAST(0 AS BIGINT), fe),
               (a, b) -> a + b) // len(fe) AS th
           FROM f),
         vl AS (
           -- voiced flags stay a LIST here; unnesting in the same
           -- projection as the th-capturing lambda binds as a LATERAL
           -- join, which DuckDB rejects under the later window
           SELECT doc_id, n_frames,
             list_transform(fe, e ->
               CASE WHEN e > th THEN 1 ELSE 0 END) AS vos
           FROM t),
         v AS MATERIALIZED (
           SELECT doc_id, n_frames, unnest(vos) AS vo,
             unnest(range(1, n_frames + 1)) AS idx
           FROM vl),
         nf AS MATERIALIZED (
           -- slim doc-level frame for the final join: joining the
           -- lambda-bearing t against the windowed runs re-triggers
           -- the LATERAL binder error
           SELECT DISTINCT doc_id, n_frames FROM v),
         g AS MATERIALIZED (
           SELECT doc_id,
             idx - row_number() OVER (PARTITION BY doc_id
                                      ORDER BY idx) AS grp
           FROM v WHERE vo = 1),
         runs AS (
           SELECT doc_id, grp, CAST(count(*) AS BIGINT) AS seg_len
           FROM g GROUP BY doc_id, grp)
         SELECT nf.doc_id, nf.n_frames,
           CAST(coalesce(sum(r.seg_len), 0) AS BIGINT) AS n_voiced,
           CAST(count(r.grp) AS BIGINT) AS n_segments,
           CAST(coalesce(max(r.seg_len), 0) AS BIGINT) AS max_segment
         FROM nf LEFT JOIN runs r ON r.doc_id = nf.doc_id
         GROUP BY nf.doc_id, nf.n_frames
         ORDER BY nf.doc_id""",

    // same 26-dim histogram → same sign bits → same bands; DuckDB
    // bit-ops (xor, bit_count, >>, &) mirror Spark's
    "mm_phash_dedup" ->
      s"""WITH m AS (
           SELECT d.doc_id, d.text
           FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
         c AS (SELECT doc_id, [$letterCounts] AS v FROM m),
         h AS (
           SELECT doc_id,
             list_sum(list_transform(range(0, 26),
               i -> (CASE WHEN 26 * v[i + 1] > list_sum(v)
                     THEN 1::BIGINT << i ELSE 0::BIGINT END)
                  + (CASE WHEN 13 * v[i + 1] > list_sum(v)
                     THEN 1::BIGINT << (i + 26) ELSE 0::BIGINT END)))
               AS ph
           FROM c),
         b AS (
           SELECT doc_id, ph, unnest([0, 1, 2]) AS band,
             unnest([ph & 262143, (ph >> 18) & 131071, ph >> 35])
               AS bval
           FROM h),
         cand AS (
           SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
             x.ph AS ha, y.ph AS hb
           FROM b x JOIN b y
             ON x.band = y.band AND x.bval = y.bval
              AND x.doc_id < y.doc_id)
         SELECT doc_a, doc_b,
           CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
         FROM cand
         WHERE bit_count(xor(ha, hb)) <= 2
         ORDER BY doc_a, doc_b""",
    "mm_embed" ->
      s"""WITH m AS (
           SELECT d.doc_id, d.text
           FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
         c AS (SELECT doc_id, [$letterCounts] AS v FROM m)
         SELECT doc_id, CAST(len(v) AS BIGINT) AS dim,
           CAST(list_sum(v) AS BIGINT) AS l1,
           md5(array_to_string(v, ',')) AS vec_fp
         FROM c ORDER BY doc_id""",
    "mm_pack" ->
      """SELECT d.doc_id, CAST(strlen(d.text) AS BIGINT) AS payload_bytes,
         d.lang, d.source, e.label, CAST(len(e.embedding) AS BIGINT) AS emb_dim
         FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
         ORDER BY d.doc_id""",
    "mm_decode" ->
      """WITH m AS (SELECT d.doc_id, CAST(strlen(d.text) AS BIGINT) AS n
           FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id)
         SELECT doc_id, n AS byte_len,
           64 + n % 512 AS width, 64 + (n * 7) % 512 AS height,
           1 + n % 8 AS n_frames,
           (64 + n % 512) * 224 // greatest(64 + n % 512, 64 + (n * 7) % 512) AS out_w,
           (64 + (n * 7) % 512) * 224 // greatest(64 + n % 512, 64 + (n * 7) % 512) AS out_h
         FROM m ORDER BY doc_id""",
    "mm_resolution_ladder" ->
      // strlen = BYTE length (the decode kernel measures UTF-8
      // payload bytes; char count diverges on non-ASCII corpora)
      """WITH m AS (SELECT d.doc_id, CAST(strlen(d.text) AS BIGINT) AS n
           FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
         dims AS (
           SELECT doc_id,
             least(64 + n % 512, 64 + (n * 7) % 512) AS s,
             greatest(64 + n % 512, 64 + (n * 7) % 512) AS l
           FROM m),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n_assets_total
                 FROM dims),
         r AS (
           SELECT d.doc_id, d.s, d.l, rung.rung
           FROM dims d, (SELECT unnest([96, 144, 240, 360, 480])
             AS rung) rung
           WHERE rung.rung <= d.s),
         agg AS (
           SELECT CAST(rung AS BIGINT) AS rung,
             CAST(count(*) AS BIGINT) AS n_assets,
             CAST(sum(rung * (l * rung // s)) AS BIGINT)
               AS total_pixels
           FROM r GROUP BY 1)
         SELECT rung, n_assets, total_pixels,
           CAST(total_pixels // n_assets AS BIGINT) AS mean_pixels,
           CAST(n_assets * 1000 // n_assets_total AS BIGINT)
             AS reach_milli
         FROM agg, tot ORDER BY rung""",
    "mm_features" ->
      """SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '[a-z]')) AS BIGINT) AS f_alpha,
         CAST(len(regexp_extract_all(lower(text), '[0-9]')) AS BIGINT) AS f_digit,
         CAST(len(regexp_extract_all(lower(text), '\s')) AS BIGINT) AS f_space,
         CAST(length(text) AS BIGINT) AS f_len
         FROM documents ORDER BY doc_id""",
    "mm_dedup" ->
      """WITH m AS (SELECT d.doc_id, d.text
           FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
         crawls AS (
           SELECT doc_id, text FROM m
           UNION ALL
           SELECT doc_id, text FROM m WHERE doc_id % 7 = 0),
         g AS (
           SELECT md5(text) AS digest, CAST(count(*) AS BIGINT) AS n_copies,
             min(doc_id) AS doc_id
           FROM crawls GROUP BY 1)
         SELECT doc_id, digest, n_copies
         FROM g ORDER BY doc_id""",
    "mm_frame_sample" ->
      """WITH m AS (SELECT d.doc_id,
           1 + CAST(strlen(d.text) AS BIGINT) % 8 AS n_frames
           FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id)
         SELECT doc_id, n_frames, CAST(f AS BIGINT) AS frame_idx
         FROM m, LATERAL (SELECT unnest(range(0, n_frames, 2)) AS f)
         ORDER BY doc_id, frame_idx""")
}
