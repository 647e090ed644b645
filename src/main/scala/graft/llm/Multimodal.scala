package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing (north-star operator): media as opaque
  * `binary` columns with typed metadata, plus a batched decode /
  * feature-extract path.
  *
  * Native image/audio codecs aren't in this environment, so the decode
  * tier targets binary PPM (netpbm P6) — a real raster format a JVM can
  * parse from first principles ([[decodePpm]]: ASCII header + raw RGB
  * raster, strict truncation handling, per-channel sums). The Spark
  * plumbing is what matters at 100 TB:
  *  - media rides in a `BinaryType` column next to a metadata struct
  *    (format/width/height), so scans prune it unless the query touches it;
  *  - decode runs through `Dataset.mapPartitions` with explicit batching
  *    (`grouped(64)`) — the JVM analog of an Arrow-batched `mapInPandas`
  *    decode: one codec init per batch, vectorizable body, no per-row
  *    driver involvement, output schema declared by the `PpmFeat` encoder;
  *  - rejects stay in-band (`fmt_ok = false`, null features) — the
  *    dead-letter shape, so one mangled crawl can't fail a 100 TB stage;
  *  - everything downstream of decode is ordinary columnar DataFrame work.
  *
  * Payloads are synthesized from `documents.text` bytes (UTF-8 raster),
  * so the DuckDB oracle recomputes every decoded feature from the text
  * itself — header math and channel sums, identical in both engines.
  */
object Multimodal {

  /** Input row for the decode stage: key + raw media bytes. */
  final case class MediaIn(doc_id: Long, payload: Array[Byte])

  /** Decoded image features: header fields + per-channel raster sums.
    * Nullable fields are None when the payload doesn't decode
    * (`fmt_ok = false`) — the dead-letter shape, kept in-band so the
    * pipeline can quarantine rejects instead of throwing. */
  final case class PpmFeat(doc_id: Long, fmt_ok: Boolean,
                           width: Option[Int], height: Option[Int],
                           maxval: Option[Int], n_px: Option[Long],
                           sum_r: Option[Long], sum_g: Option[Long],
                           sum_b: Option[Long])

  /** REAL pure-JVM decoder for binary PPM (netpbm P6): parses the ASCII
    * header (magic, width, height, maxval — whitespace-separated), then
    * reads the raw RGB raster and folds per-channel byte sums. Strict on
    * the raster length (a truncated payload is a reject, not a partial
    * decode) — the failure mode that matters when the corpus carries
    * mangled crawls. No native codecs: P6 is the deliberate choice of a
    * format a JVM can decode from first principles. */
  def decodePpm(m: MediaIn): PpmFeat = {
    val b = m.payload
    val bad = PpmFeat(m.doc_id, fmt_ok = false, None, None, None, None, None, None, None)
    def isWs(c: Byte) = c == ' ' || c == '\n' || c == '\t' || c == '\r'
    var i = 2
    // parse one whitespace-preceded ASCII unsigned int; -1 = malformed
    def parseInt(): Long = {
      while (i < b.length && isWs(b(i))) i += 1
      val st = i
      var v = 0L
      while (i < b.length && b(i) >= '0' && b(i) <= '9' && v <= Int.MaxValue) {
        v = v * 10 + (b(i) - '0'); i += 1
      }
      if (i == st || v > Int.MaxValue) -1L else v
    }
    if (b.length < 2 || b(0) != 'P' || b(1) != '6') return bad
    val (w, h, mv) = (parseInt(), parseInt(), parseInt())
    if (w < 0 || h < 0 || mv <= 0 || mv > 255) return bad
    // exactly ONE whitespace byte separates maxval from the raster (spec);
    // then the raster must be complete
    if (i >= b.length || !isWs(b(i))) return bad
    i += 1
    val need = w * h * 3
    if (i + need > b.length) return bad
    var (sr, sg, sb) = (0L, 0L, 0L)
    var j = i
    val end = i + need.toInt
    while (j < end) {
      sr += b(j) & 0xff
      sg += b(j + 1) & 0xff
      sb += b(j + 2) & 0xff
      j += 3
    }
    PpmFeat(m.doc_id, fmt_ok = true, Some(w.toInt), Some(h.toInt),
      Some(mv.toInt), Some(w * h), Some(sr), Some(sg), Some(sb))
  }

  /** The batched decode operator: binary rows in, feature rows out.
    * Batching bounds per-batch codec state; partitions stream through. */
  def decodeBatched(in: Dataset[MediaIn])(implicit s: SparkSession): Dataset[PpmFeat] = {
    import s.implicits._
    in.mapPartitions(_.grouped(64).flatMap(_.map(decodePpm)))
  }

  /** Perceptual (near-dup) media dedup: SimHash-32 over the payload's
    * byte-3-gram rolling hashes (`graft_bytesimhash` — one compiled pass
    * per payload), banded 4×8-bit for candidates, hamming ≤ 3 verify —
    * the [[graft.llm.Dedup]] SimHash machinery applied to media BYTES, so
    * re-encoded/trimmed/lightly-edited copies of the same asset match
    * where `q_llm_media_dedup`'s exact md5 cannot (the case that actually
    * occurs in crawled corpora). Candidates come ONLY from the band
    * equi-join (never all-pairs); the payload itself never shuffles —
    * only the 1-long fingerprint does. */
  private[graft] def mediaNearDupOf(d: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(d.sparkSession)
    // ASCII payloads: byte stream == codepoint stream (decodeStub note),
    // so the fingerprint reads the text column the payload was encoded
    // from — one kernel call, no byte-array materialization
    val fp = d.selectExpr("doc_id", "graft_bytesimhash(text) AS fp")
      .localCheckpoint() // band self-join sides + two re-attach joins
    val bandStructs = (0 until 4).map(bd =>
      s"named_struct('band_idx', $bd, 'band_key', shiftright(fp, ${bd * 8}) & 255L)")
      .mkString(", ")
    val bands = fp.selectExpr("doc_id", s"explode(array($bandStructs)) AS band")
      .selectExpr("doc_id", "band.band_idx AS band_idx", "band.band_key AS band_key")
    // stop-bucket cap: letter-trigram statistics CONVERGE across long
    // texts of the same language, so without the cap whole-corpus band
    // buckets appear and the pair join goes quadratic (Dedup.BandCapFloor
    // scaladoc has the measurement); both engines cap identically
    val kept = Dedup.capSimBands(bands,
      d.agg(count(lit(1)).as("n_corpus"))).localCheckpoint()
    val cand = kept.alias("a").join(kept.alias("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(fp.select(col("doc_id").as("doc_a"), col("fp").as("fa")), "doc_a")
      .join(fp.select(col("doc_id").as("doc_b"), col("fp").as("fb")), "doc_b")
      .selectExpr("doc_a", "doc_b", "CAST(bit_count(fa ^ fb) AS INT) AS hamming")
      .where(col("hamming") <= 3)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Perceptual media near-dup (see [[mediaNearDupOf]]): byte-level
    // SimHash banding over payloads — catches byte-perturbed duplicates
    // exact content hashing misses.
    "q_llm_media_neardup" -> ((s, dir) =>
      mediaNearDupOf(Tables.load(s, dir, "documents"))),

    // Frame-level clip dedup: find pairs of media items that SHARE frames
    // — re-posted clips embedded in longer videos, intros/outros stitched
    // onto different content — which whole-payload hashing (exact or
    // perceptual) cannot see because the containers differ. Each item
    // explodes into ceil(len/100)-byte frames (the media_frames
    // convention; ceil so no empty tail frame), each frame gets an exact
    // content fingerprint, and pairs come ONLY from the per-fingerprint
    // equi-join: fingerprints seen in just one item can't pair (df >= 2
    // prunes the join input to the shared tail), and fingerprints in more
    // than greatest(50, N DIV 100) items are stop-frames (color bars,
    // silence — the corpus-relative stop-shingle cap applied to frame
    // geometry; without it one ubiquitous frame makes the join
    // quadratic). Per-pair report: shared frame count, both lengths,
    // overlap vs the shorter item, and an integer-arithmetic verdict.
    // The payload never shuffles — only (doc_id, fp) rows do.
    "q_llm_media_clip_dedup" -> { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val d = Tables.load(s, dir, "documents")
      val frames = d
        .selectExpr("doc_id", "text", "(length(text) + 99) DIV 100 AS nf")
        .selectExpr("doc_id", "text", "nf", "explode(sequence(0, nf - 1)) AS i")
        .selectExpr("doc_id", "nf",
          "graft_charhash(substring(text, CAST(i * 100 + 1 AS INT), 100)) AS fp")
        .distinct() // set semantics: a frame repeated within one item counts once
        .localCheckpoint() // feeds the df count AND both join sides
      val n = d.agg(count(lit(1)).as("n_corpus"))
      val pairable = frames.groupBy(col("fp")).agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(n))
        .where(expr("df >= 2 AND df <= greatest(50, n_corpus DIV 100)"))
        .select("fp")
      val kept = frames.join(pairable, "fp")
      kept.alias("a").join(kept.alias("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(max(col("a.nf")).as("nf_a"), max(col("b.nf")).as("nf_b"),
          count(lit(1)).as("shared_frames"))
        .withColumn("overlap", graft.util.Exact.fix(
          expr("CAST(shared_frames AS DOUBLE) / least(nf_a, nf_b)"), 4))
        .withColumn("verdict",
          expr("CASE WHEN 2 * shared_frames >= least(nf_a, nf_b) " +
            "THEN 'clip_dup' ELSE 'partial' END"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // Media metadata projection: binary payload + typed metadata struct;
    // the scan only materializes payload length, format, and dimensions.
    "q_llm_media_meta" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .selectExpr("doc_id",
          "encode(text, 'UTF-8') AS payload",
          "named_struct('fmt', CASE WHEN doc_id % 3 = 0 THEN 'png' WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'wav' END, " +
            "'width', 32 + (doc_id % 97) * 4, 'height', 32 + (doc_id % 53) * 4) AS meta")
        .selectExpr("doc_id", "meta.fmt AS fmt", "meta.width AS width",
          "meta.height AS height", "length(payload) AS n_bytes",
          "length(payload) div 100 + 1 AS n_frames")
        .orderBy(col("doc_id"))),

    // Frame sampling: explode each media item into its frames (the
    // expand -> per-frame work -> re-aggregate multimodal shape), with a
    // deterministic per-frame feature; verified against the closed-form
    // aggregate (sum of 0..nf-1 = nf(nf-1)/2) so the explode path is
    // provably lossless.
    "q_llm_media_frames" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .selectExpr("doc_id",
          "CASE WHEN doc_id % 3 = 0 THEN 'png' WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'wav' END AS fmt",
          "length(encode(text, 'UTF-8')) div 100 + 1 AS n_frames")
        .selectExpr("doc_id", "fmt", "explode_outer(sequence(0, n_frames - 1)) AS frame_idx")
        .groupBy(col("fmt"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_frames_total"),
          sum(col("frame_idx")).as("frame_idx_sum"))
        .orderBy(col("fmt"))),

    // Exact media dedup by content hash — the first dedup stage of every
    // multimodal pipeline (byte-identical re-crawls/re-encodes of the
    // same asset): hash the raw payload BYTES (md5 + length, never the
    // decoded content), elect the min-id copy canonical, flag the rest
    // as drops. One scan + one hash-partitioned window; the payload
    // itself never shuffles (only the 32-hex hash does).
    "q_llm_media_dedup" -> { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("content_hash"))
      Tables.load(s, dir, "documents")
        .selectExpr("doc_id", "encode(text, 'UTF-8') AS payload")
        .selectExpr("doc_id", "md5(payload) AS content_hash",
          "length(payload) AS n_bytes")
        .withColumn("canonical_id", min(col("doc_id")).over(w))
        .withColumn("n_copies", count(lit(1)).over(w))
        .selectExpr("doc_id", "content_hash", "n_bytes", "canonical_id",
          "n_copies", "doc_id = canonical_id AS keep")
        .orderBy(col("doc_id"))
    },

    // Batched REAL decode: synthesize a binary PPM (P6) per document —
    // ASCII header + the text's bytes as the RGB raster, w = min(npx, 16)
    // columns — then run the pure-JVM parser through the batched
    // mapPartitions path and return header fields + per-channel raster
    // sums. Every ~53rd payload gets a corrupted magic, so the reject
    // (dead-letter) arm is exercised in-band: fmt_ok=false, null fields.
    // The oracle recomputes header math and channel sums from the same
    // text bytes (i % 3 picks the channel), so the decode is checked
    // against first principles, not against another decoder.
    "q_llm_media_decode" -> { (s, dir) =>
      implicit val sp: SparkSession = s
      import s.implicits._
      val in = Tables.load(s, dir, "documents")
        .selectExpr("doc_id", "text",
          "CAST(length(encode(text, 'UTF-8')) AS BIGINT) DIV 3 AS npx0")
        .selectExpr("doc_id", "text", "npx0", "least(npx0, 16L) AS w")
        .selectExpr("doc_id", "text", "w",
          "IF(w = 0, 0L, npx0 DIV w) AS h")
        .selectExpr("doc_id",
          "concat(encode(concat(" +
            "CASE WHEN doc_id % 53 = 0 THEN 'XX' ELSE 'P6' END, '\\n', " +
            "CAST(w AS STRING), ' ', CAST(h AS STRING), '\\n255\\n'), 'UTF-8'), " +
            "substring(encode(text, 'UTF-8'), 1, CAST(w * h * 3 AS INT))) AS payload")
        .as[MediaIn]
      decodeBatched(in).toDF()
        .orderBy(col("doc_id"))
    })

  def oracleSql: Map[String, String] = Map(
    // relational mirror of graft_bytesimhash + banding: byte array ->
    // 3-gram shingle unnest -> 32 majority sums -> 4x8-bit bands ->
    // hamming <= 3. Docs under 3 bytes have no 3-grams and fingerprint
    // to 0 (the LEFT JOIN + coalesce arm).
    "q_llm_media_neardup" -> {
      val bandUnion = (0 until 4).map(bd =>
        s"SELECT doc_id, $bd AS band_idx, (fp >> ${bd * 8}) & 255 AS band_key FROM fp")
        .mkString("\n        UNION ALL ")
      s"""
      WITH bv AS (
        SELECT doc_id,
               list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)) AS bs
        FROM documents),
      sg AS (
        SELECT doc_id, unnest(${XHash.duckShingles("bs")}) AS h
        FROM bv WHERE len(bs) >= 3),
      bitsums AS (
        SELECT doc_id,
               ${Dedup.simhashSums}
        FROM sg GROUP BY doc_id),
      fp0 AS (SELECT doc_id, ${Dedup.simhashVal} AS fp FROM bitsums),
      fp AS (
        SELECT d.doc_id, coalesce(f.fp, CAST(0 AS BIGINT)) AS fp
        FROM documents d LEFT JOIN fp0 f ON d.doc_id = f.doc_id),
      bands AS (
        $bandUnion),
      ${Dedup.duckCapBandCtes("documents")},
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bkept a JOIN bkept b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b,
             CAST(bit_count(xor(fa.fp, fb.fp)) AS INT) AS hamming
      FROM cand
      JOIN fp fa ON fa.doc_id = doc_a
      JOIN fp fb ON fb.doc_id = doc_b
      WHERE bit_count(xor(fa.fp, fb.fp)) <= 3
      ORDER BY doc_a, doc_b"""
    },

    // frame slices via unnest(range), same ceil(len/100) frame count,
    // same df window [2, greatest(50, N DIV 100)], same exact per-frame
    // fingerprint (charhash of the ASCII slice == byte slice)
    "q_llm_media_clip_dedup" -> s"""
      WITH f0 AS (
        SELECT doc_id, (length(text) + 99) // 100 AS nf, text FROM documents),
      fr AS (
        SELECT DISTINCT doc_id, nf,
               ${XHash.duckCharHash("substring(text, CAST(i * 100 + 1 AS INT), 100)")} AS fp
        FROM (SELECT doc_id, nf, text, unnest(range(0, nf)) AS i FROM f0)),
      n AS (SELECT count(*) AS n_corpus FROM documents),
      pairable AS (
        SELECT fp FROM fr CROSS JOIN n
        GROUP BY fp, n_corpus
        HAVING count(*) >= 2 AND count(*) <= greatest(50, n_corpus // 100)),
      kept AS (SELECT fr.* FROM fr JOIN pairable USING (fp)),
      p AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               max(a.nf) AS nf_a, max(b.nf) AS nf_b,
               count(*) AS shared_frames
        FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id)
      SELECT doc_a, doc_b, nf_a, nf_b, shared_frames,
             ${graft.util.Exact.sqlFix(
               "CAST(shared_frames AS DOUBLE) / least(nf_a, nf_b)", 4)} AS overlap,
             CASE WHEN 2 * shared_frames >= least(nf_a, nf_b)
                  THEN 'clip_dup' ELSE 'partial' END AS verdict
      FROM p ORDER BY doc_a, doc_b""",

    "q_llm_media_meta" -> """
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'png' WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'wav' END AS fmt,
             32 + (doc_id % 97) * 4 AS width,
             32 + (doc_id % 53) * 4 AS height,
             CAST(octet_length(encode(text)) AS INT) AS n_bytes,
             CAST(octet_length(encode(text)) AS BIGINT) // 100 + 1 AS n_frames
      FROM documents ORDER BY doc_id""",

    "q_llm_media_frames" -> """
      WITH f AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'png' WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'wav' END AS fmt,
               CAST(octet_length(encode(text)) AS BIGINT) // 100 + 1 AS nf
        FROM documents)
      SELECT fmt, count(*) AS n_docs,
             CAST(sum(nf) AS BIGINT) AS n_frames_total,
             CAST(sum(nf * (nf - 1) / 2) AS BIGINT) AS frame_idx_sum
      FROM f GROUP BY fmt ORDER BY fmt""",

    "q_llm_media_dedup" -> """
      WITH h AS (
        SELECT doc_id, md5(text) AS content_hash,
               CAST(octet_length(encode(text)) AS INT) AS n_bytes
        FROM documents)
      SELECT doc_id, content_hash, n_bytes,
             min(doc_id) OVER (PARTITION BY content_hash) AS canonical_id,
             count(*) OVER (PARTITION BY content_hash) AS n_copies,
             doc_id = min(doc_id) OVER (PARTITION BY content_hash) AS keep
      FROM h ORDER BY doc_id""",

    // first-principles mirror of the P6 decode: same w = least(n//3, 16),
    // h = npx0 // w header math, per-channel sums from ascii codes of the
    // raster slice (byte i lands in channel i % 3; ASCII text ⇒ byte ==
    // codepoint), corrupt-magic docs (% 53) as the null dead-letter arm
    "q_llm_media_decode" -> """
      WITH dims AS (
        SELECT doc_id, text,
               CAST(octet_length(encode(text)) AS BIGINT) // 3 AS npx0,
               least(CAST(octet_length(encode(text)) AS BIGINT) // 3, 16) AS w,
               doc_id % 53 = 0 AS corrupt
        FROM documents),
      d2 AS (
        SELECT doc_id, text, w, corrupt,
               CASE WHEN w = 0 THEN 0 ELSE npx0 // w END AS h
        FROM dims),
      px AS (
        SELECT doc_id, i % 3 AS c,
               ascii(substring(text, CAST(i + 1 AS INT), 1)) AS v
        FROM (SELECT doc_id, text, unnest(range(0, w * h * 3)) AS i
              FROM d2 WHERE NOT corrupt)),
      sums AS (
        SELECT doc_id,
               sum(CASE WHEN c = 0 THEN v END) AS sr,
               sum(CASE WHEN c = 1 THEN v END) AS sg,
               sum(CASE WHEN c = 2 THEN v END) AS sb
        FROM px GROUP BY doc_id)
      SELECT d.doc_id,
             NOT d.corrupt AS fmt_ok,
             CASE WHEN d.corrupt THEN NULL ELSE CAST(d.w AS INT) END AS width,
             CASE WHEN d.corrupt THEN NULL ELSE CAST(d.h AS INT) END AS height,
             CASE WHEN d.corrupt THEN NULL ELSE 255 END AS maxval,
             CASE WHEN d.corrupt THEN NULL ELSE CAST(d.w * d.h AS BIGINT) END AS n_px,
             CASE WHEN d.corrupt THEN NULL ELSE CAST(coalesce(s.sr, 0) AS BIGINT) END AS sum_r,
             CASE WHEN d.corrupt THEN NULL ELSE CAST(coalesce(s.sg, 0) AS BIGINT) END AS sum_g,
             CASE WHEN d.corrupt THEN NULL ELSE CAST(coalesce(s.sb, 0) AS BIGINT) END AS sum_b
      FROM d2 d LEFT JOIN sums s USING (doc_id)
      ORDER BY d.doc_id""")
}
