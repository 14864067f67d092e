package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Multimodal family: binary image columns decoded with the
  * in-JDK codec — metadata, frame sampling, resize, aHash, banded
  * image near-dup (see [[Multimodal]]).
  *
  * Moved verbatim from `PipelineQueries` (round 14, VERDICT r13 #5 —
  * a pure file split along the family seams; shared helpers, artifacts
  * and oracle CTE fragments stay in [[PipelineQueries]] and arrive via
  * the wildcard import). Registered through [[PipelineQueries.queries]]
  * / [[PipelineQueries.oracleSql]], so the driver contract is unchanged.
  */
private[operators] object MultimodalQueries {
  import PipelineQueries._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ----- multimodal: binary asset column + partition-wise decode -----
    // Stage 1 renders each document into a REAL tiny PNG (deterministic
    // pixels — see [[Multimodal]]); stage 2 decodes those bytes with the
    // in-JDK codec (javax.imageio) and reads dimensions + a weighted
    // pixel checksum. Both stages are mapPartitions batch iteration over
    // a binary column — the exact plumbing a production decoder drops
    // into — and the oracle reproduces the decoded values relationally
    // (PNG is lossless), so the decode is end-to-end verified.
    "q30_multimodal_meta" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val assets = t.documents
        .select($"doc_id", length($"text").cast("int").as("text_len"))
        // The codec stages are CPU-bound: spread them across every core
        // instead of inheriting the scan's (often single-file, single
        // partition) parallelism. The shuffled payload is 12 bytes/doc —
        // the image bytes are born AFTER the repartition.
        .repartition(s.sparkContext.defaultParallelism)
        .as[(Long, Int)]
        .mapPartitions(_.map { case (docId, n) =>
          (docId, Multimodal.encodePng(docId, n))
        })
      assets.mapPartitions { it =>
        it.map { case (docId, bytes) => Multimodal.decodeMeta(docId, bytes) }
      }.toDF()
        .select($"doc_id", $"width", $"height", $"n_pixels", $"pix_checksum")
        .orderBy($"doc_id")
    },


    // ----- multimodal: frame sampling (one asset → many frames) -----
    // The flatMap shape of a video frame extractor over genuinely
    // decoded images: every 2nd row of each decoded PNG is a "frame"
    // with a rolling pixel checksum. Map-only until the final sort;
    // frames per asset bound memory, not corpus size.
    "q41_frame_sample" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val assets = t.documents
        .select($"doc_id", length($"text").cast("int").as("text_len"))
        // The codec stages are CPU-bound: spread them across every core
        // instead of inheriting the scan's (often single-file, single
        // partition) parallelism. The shuffled payload is 12 bytes/doc —
        // the image bytes are born AFTER the repartition.
        .repartition(s.sparkContext.defaultParallelism)
        .as[(Long, Int)]
        .mapPartitions(_.map { case (docId, n) =>
          (docId, Multimodal.encodePng(docId, n))
        })
      assets.mapPartitions { it =>
        it.flatMap { case (docId, bytes) =>
          Multimodal.frameSample(docId, bytes, every = 2)
        }
      }.toDF()
        .select($"doc_id", $"frame_idx", $"n_px", $"frame_checksum")
        .orderBy($"doc_id", $"frame_idx")
    },


    // ----- multimodal: resize (decode → nearest-neighbor thumbnail) -----
    // Real decode + real downsample: each PNG shrinks to a 16×16
    // nearest-neighbor thumbnail (deterministic across JVMs, unlike
    // Graphics2D filtering) whose row-major checksum the oracle mirrors.
    "q42_resize" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val assets = t.documents
        .select($"doc_id", length($"text").cast("int").as("text_len"))
        // The codec stages are CPU-bound: spread them across every core
        // instead of inheriting the scan's (often single-file, single
        // partition) parallelism. The shuffled payload is 12 bytes/doc —
        // the image bytes are born AFTER the repartition.
        .repartition(s.sparkContext.defaultParallelism)
        .as[(Long, Int)]
        .mapPartitions(_.map { case (docId, n) =>
          (docId, Multimodal.encodePng(docId, n))
        })
      assets.mapPartitions { it =>
        it.map { case (docId, bytes) =>
          Multimodal.resizeThumb(docId, bytes, target = 16)
        }
      }.toDF()
        .select($"doc_id", $"width", $"height", $"thumb_checksum")
        .orderBy($"doc_id")
    },


    // ----- image perceptual hash (aHash) over real decoded pixels -----
    // The image-dedup feature extractor: render→PNG-encode→REAL
    // decode→8×8 average-hash per asset ([[Multimodal.aHash]] — exact
    // integer thresholding, two 32-bit halves). Same mapPartitions
    // codec shape as q30/q41/q42 (codec state amortized per partition,
    // 12 bytes/doc shuffle before the bytes are born); swap the
    // formula renderer for camera bytes and the plan is unchanged —
    // the downstream Hamming-bucket join is q24's simhash shape.
    "q126_image_ahash" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val assets = t.documents
        .select($"doc_id", length($"text").cast("int").as("text_len"))
        .repartition(s.sparkContext.defaultParallelism)
        .as[(Long, Int)]
        .mapPartitions(_.map { case (docId, n) =>
          (docId, Multimodal.encodePng(docId, n))
        })
      assets.mapPartitions { it =>
        it.map { case (docId, bytes) => Multimodal.aHash(docId, bytes) }
      }.toDF()
        .select($"doc_id", $"width", $"height",
          $"hash_hi", $"hash_lo", $"n_above")
        .orderBy($"doc_id")
    },


    // ----- image near-dup: banded aHash Hamming join -----
    // q126's perceptual hashes put to work: the 64-bit aHash splits
    // into FOUR disjoint 16-bit bands, candidates agree on at least one
    // band, and exact Hamming ≤ 3 verifies. Unlike q24's simhash
    // prefix-bucket (a recall heuristic), this screen is COMPLETE by
    // pigeonhole: 3 differing bits can dirty at most 3 of 4 disjoint
    // bands, so every qualifying pair shares a clean band (property-
    // tested on random 64-bit pairs in `Round11OpsSpec`). Hashes come
    // from the REAL decode pipeline (cached — the codec runs once, not
    // once per self-join side); the join shuffles 16-byte hash rows,
    // never pixels. Hot-band handling: a degenerate band value (e.g.
    // all-dark thumbnails) would concentrate one reducer, so candidates
    // come from [[saltedBandPairs]] — over-cap buckets triangle-split
    // across group cells with identical pair output (g = 1 plain path
    // at test scale; the g > 1 path is pinned by BandSaltSpec).
    "q131_image_neardup" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val hashes = t.documents
        .select($"doc_id", length($"text").cast("int").as("text_len"))
        .repartition(s.sparkContext.defaultParallelism)
        .as[(Long, Int)]
        .mapPartitions(_.map { case (docId, n) =>
          Multimodal.aHash(docId, Multimodal.encodePng(docId, n))
        }).toDF()
        .select($"doc_id", $"hash_hi", $"hash_lo")
        .cache()
      val bands = hashes.select($"doc_id", $"hash_hi", $"hash_lo",
        posexplode(expr(
          """array(hash_lo % 65536, hash_lo div 65536,
                   hash_hi % 65536, hash_hi div 65536)"""))
          .as(Seq("band", "sig")))
        .select($"band", $"sig", $"doc_id", $"hash_hi", $"hash_lo")
      saltedBandPairs(bands, bandSaltCap)
        .select($"doc_a", $"doc_b",
          expr("""CAST(bit_count(pa.hash_hi ^ pb.hash_hi)
                     + bit_count(pa.hash_lo ^ pb.hash_lo) AS INT)""").as("hd"))
        .filter($"hd" <= 3)
        .distinct()
        .orderBy($"doc_a", $"doc_b")
    },
  )

  def oracleSql: Map[String, String] = Map(

      // Oracle twin of the REAL image pipeline: dimensions and pixels
      // are pure functions of (doc_id, length(text)) — see Multimodal —
      // and PNG is lossless, so SQL over those formulas predicts the
      // decoded frames exactly. Frame = every 2nd image row, rolling
      // checksum over the row's pixel weights v = r + 2g + 3b.
      "q41_frame_sample" -> """
        WITH dims AS (
          SELECT doc_id, CAST(doc_id % 256 AS BIGINT) d,
                 CAST(length(text) % 64 + 16 AS INT) w,
                 CAST((length(text) * 7) % 48 + 16 AS INT) h
          FROM documents),
        f AS (SELECT doc_id, d, w, unnest(range(0, h)) y FROM dims),
        s AS (SELECT doc_id, d, w, y FROM f WHERE y % 2 = 0)
        SELECT doc_id, CAST(y AS INT) AS frame_idx, w AS n_px,
               list_reduce(
                 list_prepend(0::BIGINT,
                   list_transform(range(0, w),
                     x -> (x * 31 + y * 7 + d) % 256
                        + 2 * ((x * 13 + y * 11 + 2 * d) % 256)
                        + 3 * ((x * 5 + y * 3 + 3 * d) % 256))),
                 (acc, c) -> (acc * 31 + c) % 1000000007) AS frame_checksum
        FROM s
        ORDER BY doc_id, frame_idx""",


      // 16x16 nearest-neighbor thumbnail of the decoded image: source
      // pixel (sx, sy) = (tx*w/16, ty*h/16), row-major rolling checksum
      // over the 256 sampled pixel weights.
      "q42_resize" -> """
        WITH dims AS (
          SELECT doc_id, CAST(doc_id % 256 AS BIGINT) d,
                 CAST(length(text) % 64 + 16 AS INT) w,
                 CAST((length(text) * 7) % 48 + 16 AS INT) h
          FROM documents)
        SELECT doc_id, w AS width, h AS height,
               list_reduce(
                 list_prepend(0::BIGINT,
                   list_transform(range(0, 256),
                     j -> ((((j % 16) * w) // 16) * 31 + (((j // 16) * h) // 16) * 7 + d) % 256
                        + 2 * (((((j % 16) * w) // 16) * 13 + (((j // 16) * h) // 16) * 11 + 2 * d) % 256)
                        + 3 * (((((j % 16) * w) // 16) * 5 + (((j // 16) * h) // 16) * 3 + 3 * d) % 256))),
                 (acc, c) -> (acc * 31 + c) % 1000000007) AS thumb_checksum
        FROM dims
        ORDER BY doc_id""",


      // Full-image positionally weighted checksum over pixel weights
      // v(x, y, d) in row-major order p = y*w + x, weight p % 97 + 1.
      "q30_multimodal_meta" -> """
        WITH dims AS (
          SELECT doc_id, CAST(doc_id % 256 AS BIGINT) d,
                 CAST(length(text) % 64 + 16 AS INT) w,
                 CAST((length(text) * 7) % 48 + 16 AS INT) h
          FROM documents),
        px AS (SELECT doc_id, d, w, h, unnest(range(0, w * h)) p FROM dims),
        v AS (SELECT doc_id, w, h, p,
                     ((p % w) * 31 + (p // w) * 7 + d) % 256
                     + 2 * (((p % w) * 13 + (p // w) * 11 + 2 * d) % 256)
                     + 3 * (((p % w) * 5 + (p // w) * 3 + 3 * d) % 256) AS vw
              FROM px)
        SELECT doc_id, w AS width, h AS height, CAST(w * h AS INT) AS n_pixels,
               CAST(sum(vw * (p % 97 + 1)) AS BIGINT) AS pix_checksum
        FROM v
        GROUP BY doc_id, w, h
        ORDER BY doc_id""",


      // Every bit reproduced relationally from the deterministic pixel
      // formula (q30/q42's argument): 64·v > Σv is exact integer
      // arithmetic in both engines, so one mis-sampled pixel on the
      // Spark decode side flips bits and fails the compare.
      "q126_image_ahash" -> """
        WITH dims AS (
          SELECT doc_id, CAST(doc_id % 256 AS BIGINT) d,
                 CAST(length(text) % 64 + 16 AS INT) w,
                 CAST((length(text) * 7) % 48 + 16 AS INT) h
          FROM documents),
        px AS (SELECT doc_id, w, h, j,
                 CAST(((((j % 8) * w) // 8) * 31
                       + (((j // 8) * h) // 8) * 7 + d) % 256
                  + 2 * (((((j % 8) * w) // 8) * 13
                          + (((j // 8) * h) // 8) * 11 + 2 * d) % 256)
                  + 3 * (((((j % 8) * w) // 8) * 5
                          + (((j // 8) * h) // 8) * 3 + 3 * d) % 256)
                  AS BIGINT) v
               FROM dims, (SELECT unnest(range(0, 64)) j)),
        s AS (SELECT doc_id, sum(v) s FROM px GROUP BY 1),
        bits AS (SELECT px.doc_id, px.w, px.h, j,
                        CASE WHEN 64 * v > s.s
                             THEN 1::BIGINT ELSE 0::BIGINT END b
                 FROM px JOIN s USING (doc_id))
        SELECT doc_id, min(w) AS width, min(h) AS height,
               CAST(sum(CASE WHEN j >= 32
                             THEN b * (1::BIGINT << (j - 32))
                             ELSE 0 END) AS BIGINT) AS hash_hi,
               CAST(sum(CASE WHEN j < 32
                             THEN b * (1::BIGINT << j)
                             ELSE 0 END) AS BIGINT) AS hash_lo,
               CAST(sum(b) AS INT) AS n_above
        FROM bits GROUP BY doc_id ORDER BY doc_id""",


      // q126's relational hash reproduction feeding the same 4×16-bit
      // banding and exact Hamming verify as the Spark side.
      "q131_image_neardup" -> """
        WITH dims AS (
          SELECT doc_id, CAST(doc_id % 256 AS BIGINT) d,
                 CAST(length(text) % 64 + 16 AS INT) w,
                 CAST((length(text) * 7) % 48 + 16 AS INT) h
          FROM documents),
        px AS (SELECT doc_id, w, h, j,
                 CAST(((((j % 8) * w) // 8) * 31
                       + (((j // 8) * h) // 8) * 7 + d) % 256
                  + 2 * (((((j % 8) * w) // 8) * 13
                          + (((j // 8) * h) // 8) * 11 + 2 * d) % 256)
                  + 3 * (((((j % 8) * w) // 8) * 5
                          + (((j // 8) * h) // 8) * 3 + 3 * d) % 256)
                  AS BIGINT) v
               FROM dims, (SELECT unnest(range(0, 64)) j)),
        s AS (SELECT doc_id, sum(v) s FROM px GROUP BY 1),
        bits AS (SELECT px.doc_id, j,
                        CASE WHEN 64 * v > s.s
                             THEN 1::BIGINT ELSE 0::BIGINT END b
                 FROM px JOIN s USING (doc_id)),
        ah AS (SELECT doc_id,
                      CAST(sum(CASE WHEN j >= 32
                                    THEN b * (1::BIGINT << (j - 32))
                                    ELSE 0 END) AS BIGINT) hash_hi,
                      CAST(sum(CASE WHEN j < 32
                                    THEN b * (1::BIGINT << j)
                                    ELSE 0 END) AS BIGINT) hash_lo
               FROM bits GROUP BY doc_id),
        bands AS (SELECT doc_id, hash_hi, hash_lo, bb.band,
                         CASE bb.band WHEN 0 THEN hash_lo % 65536
                                      WHEN 1 THEN hash_lo // 65536
                                      WHEN 2 THEN hash_hi % 65536
                                      ELSE hash_hi // 65536 END sig
                  FROM ah CROSS JOIN
                    (SELECT unnest(range(0, 4)) band) bb),
        cand AS (SELECT DISTINCT a.doc_id da, b.doc_id db,
                        a.hash_hi ha, a.hash_lo la,
                        b.hash_hi hb, b.hash_lo lb
                 FROM bands a JOIN bands b
                   ON a.band = b.band AND a.sig = b.sig
                  AND a.doc_id < b.doc_id)
        SELECT da AS doc_a, db AS doc_b,
               CAST(bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) AS INT)
                 AS hd
        FROM cand
        WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 3
        ORDER BY doc_a, doc_b""",
  )
}
