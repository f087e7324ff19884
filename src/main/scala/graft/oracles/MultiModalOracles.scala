package graft

import graft.OracleCtes._

/** DuckDB twins for the [[MultiModalQueries]] family — see the [[Oracles]]
  * scaladoc for the cross-engine determinism rules every entry obeys.
  */
private[graft] object MultiModalOracles {

  // The scene fixture's pixel grid replayed in SQL (mirrors
  // MultiModal.sceneGray): three LCG rounds in 2^31 space, high bits
  // xor'd, per-doc brightness shift, every-5th-doc pixel bump. Final
  // relation px(doc_id, x, y, g) over the 9×8 grid — shared by
  // dedup_image_phash and mm_resize_real.
  private val scenePxCtes: String =
    """lcg AS (
      |  SELECT doc_id, x, y,
      |         (((doc_id // 8) * 72 + y * 9 + x) * 1103515245 + 12345)
      |           % 2147483648 AS h1
      |  FROM documents
      |  CROSS JOIN generate_series(0, 8) gx(x)
      |  CROSS JOIN generate_series(0, 7) gy(y)),
      |lcg2 AS (SELECT doc_id, x, y,
      |           (h1 * 1103515245 + 12345) % 2147483648 AS h2 FROM lcg),
      |px AS (
      |  SELECT doc_id, x, y,
      |         (xor(h2 >> 16,
      |              ((h2 * 1103515245 + 12345) % 2147483648) >> 8) % 200
      |          + (doc_id % 8) * 3
      |          + CASE WHEN doc_id % 5 = 0 AND x = doc_id % 9
      |                      AND y = (doc_id * 3) % 8
      |                 THEN 30 ELSE 0 END) AS g
      |  FROM lcg2)""".stripMargin

  val map: Map[String, String] = Map(
    // Mirrors MultiModal.imageResizeReal over the scene fixture: the
    // nearest-neighbor source index is the same floor mapping
    // (xo·w_in DIV w_out), so a CORRECT decode+resample must hand back
    // exactly the scene arithmetic at the mapped coordinates.
    "mm_resize_real" ->
      s"""WITH $scenePxCtes,
         |o AS (SELECT doc_id, xo, yo,
         |        (xo * 9) // 4 AS sx, (yo * 8) // 4 AS sy
         |      FROM documents
         |      CROSS JOIN generate_series(0, 3) go(xo)
         |      CROSS JOIN generate_series(0, 3) gp(yo)),
         |r AS (SELECT o.doc_id, o.xo, o.yo, px.g
         |      FROM o JOIN px ON px.doc_id = o.doc_id
         |                    AND px.x = o.sx AND px.y = o.sy)
         |SELECT doc_id,
         |       CAST(9 AS INTEGER) AS w_in, CAST(8 AS INTEGER) AS h_in,
         |       CAST(4 AS INTEGER) AS w_out, CAST(4 AS INTEGER) AS h_out,
         |       CAST(max(CASE WHEN xo = 0 AND yo = 0 THEN g END) AS INTEGER) AS tl,
         |       CAST(max(CASE WHEN xo = 3 AND yo = 0 THEN g END) AS INTEGER) AS tr,
         |       CAST(max(CASE WHEN xo = 0 AND yo = 3 THEN g END) AS INTEGER) AS bl,
         |       CAST(max(CASE WHEN xo = 3 AND yo = 3 THEN g END) AS INTEGER) AS br,
         |       CAST(sum(g) AS BIGINT) AS sum_samples
         |FROM r GROUP BY doc_id""".stripMargin,
    // Mirrors MultiModal.audioRoundTrip: the WAV synthesis chooses
    // rate/frames/samples as pure functions of doc_id and PCM WAV is
    // lossless, so a CORRECT javax.sound.sampled decode must hand
    // exactly these back — format fields arithmetically, sample stats
    // via the sawtooth formula summed over generate_series.
    "mm_audio_meta" ->
      """WITH p AS (
        |  SELECT doc_id,
        |         CAST(8000 + (doc_id % 5) * 2000 AS BIGINT) AS rate,
        |         CAST(400 + (doc_id % 7) * 100 AS BIGINT) AS frames,
        |         (doc_id % 11) + 3 AS k
        |  FROM documents),
        |s AS (SELECT doc_id,
        |        CAST(sum(((i * k) % 2048) - 1024) AS BIGINT) AS sum_samples
        |      FROM (SELECT doc_id, k,
        |              unnest(generate_series(0, frames - 1)) AS i FROM p)
        |      GROUP BY doc_id)
        |SELECT p.doc_id,
        |       CAST(rate AS INTEGER) AS sample_rate,
        |       CAST(1 AS INTEGER) AS channels,
        |       CAST(16 AS INTEGER) AS bits,
        |       frames AS n_frames,
        |       CAST(frames * 1000 // rate AS BIGINT) AS duration_ms,
        |       CAST(-1024 AS INTEGER) AS first_sample,
        |       CAST((((frames - 1) * k) % 2048) - 1024 AS INTEGER) AS last_sample,
        |       sum_samples
        |FROM p JOIN s USING (doc_id)""".stripMargin,

    // Mirrors dedupAudioFp: the WAV synthesis chooses every sample as
    // a pure function of doc_id and PCM WAV is lossless, so a CORRECT
    // decode + 65-frame energy-contour hash must reproduce exactly
    // this arithmetic; the exact-dup groups follow by grouping the
    // fingerprints. Bit 63 wraps to signed BIGINT min as usual.
    "dedup_audio_fp" ->
      """WITH p AS (SELECT doc_id,
        |        CAST(400 + (doc_id % 7) * 100 AS BIGINT) AS frames,
        |        (doc_id % 11) + 3 AS k FROM documents),
        |s AS (SELECT doc_id, k, frames,
        |        unnest(generate_series(0, frames - 1)) AS i FROM p),
        |e AS (SELECT doc_id, (i * 65) // frames AS f,
        |        CAST(sum((((i * k) % 2048) - 1024)
        |                 * (((i * k) % 2048) - 1024)) AS BIGINT) AS en
        |      FROM s GROUP BY 1, 2),
        |b AS (SELECT a.doc_id, a.f,
        |        CASE WHEN nb.en > a.en THEN 1 ELSE 0 END AS bit
        |      FROM e a JOIN e nb ON nb.doc_id = a.doc_id AND nb.f = a.f + 1
        |      WHERE a.f < 64),
        |h AS (SELECT doc_id,
        |        sum(CASE WHEN bit = 1 THEN
        |              CASE WHEN f = 63 THEN -9223372036854775807 - 1
        |                   ELSE (1::BIGINT << f) END
        |            ELSE 0 END)::BIGINT AS afp
        |      FROM b GROUP BY 1),
        |g AS (SELECT afp, min(doc_id) AS keep_id,
        |             CAST(count(*) AS BIGINT) AS n_dups FROM h GROUP BY 1)
        |SELECT doc_id, afp, keep_id, n_dups FROM h JOIN g USING (afp)""".stripMargin,

    // Mirrors dedupImagePhash: the scene fixture's pixels are pure
    // integer functions of doc_id and PNG is lossless, so a CORRECT
    // javax.imageio decode + 9x8 dHash must reproduce exactly this
    // arithmetic; combination banding has recall 1.0 at Hamming <= 3
    // and the exact verify kills false candidates, so the operator
    // output == the all-pairs Hamming filter (same argument as
    // dedup_simhash). Bit 63 wraps to the signed BIGINT min like the
    // simhash oracle does.
    "dedup_image_phash" ->
      s"""WITH $scenePxCtes,
        |bits AS (
        |  SELECT a.doc_id, a.x, a.y,
        |         CASE WHEN b.g > a.g THEN 1 ELSE 0 END AS bit
        |  FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.y = a.y
        |                     AND b.x = a.x + 1
        |  WHERE a.x < 8),
        |ph AS (SELECT doc_id,
        |         sum(CASE WHEN bit = 1 THEN
        |               CASE WHEN y * 8 + x = 63 THEN -9223372036854775807 - 1
        |                    ELSE (1::BIGINT << (y * 8 + x)) END
        |             ELSE 0 END)::BIGINT AS ph
        |       FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       bit_count(xor(a.ph, b.ph))::INTEGER AS hamming
        |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.ph, b.ph)) <= 3""".stripMargin,

    "mm_payload_meta" ->
      """SELECT doc_id,
        |       CAST(strlen(text) AS BIGINT) AS n_bytes,
        |       CAST(strlen(text) % 640 + 1 AS INTEGER) AS width,
        |       CAST(strlen(text) * 7 % 480 + 1 AS INTEGER) AS height,
        |       CAST(3 AS INTEGER) AS channels,
        |       CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_byte
        |FROM documents""".stripMargin,

    // Mirrors MultiModal.resizePlan: stub geometry fit into a 224-box
    // with the same exact integral arithmetic (// ≡ Spark DIV on
    // non-negatives), floored at 1.
    "mm_resize" ->
      """WITH m AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        |             CAST(strlen(text) % 640 + 1 AS BIGINT) AS w_in,
        |             CAST(strlen(text) * 7 % 480 + 1 AS BIGINT) AS h_in
        |           FROM documents),
        |r AS (SELECT doc_id, n_bytes, w_in, h_in,
        |        greatest(1, (w_in * 224) // greatest(w_in, h_in)) AS w_out,
        |        greatest(1, (h_in * 224) // greatest(w_in, h_in)) AS h_out
        |      FROM m)
        |SELECT doc_id, n_bytes, w_in, h_in, w_out, h_out,
        |       greatest(1, (n_bytes * (w_out * h_out)) // (w_in * h_in))
        |         AS n_bytes_out
        |FROM r""".stripMargin,

    // Mirrors MultiModal.frameSamplePlan: n_bytes DIV 64 full frames,
    // every 4th frame's index and byte offset; short payloads yield no
    // rows.
    "mm_frame_sample" ->
      """SELECT doc_id, n_frames, frame_idx,
        |       frame_idx * 64 AS byte_off
        |FROM (
        |  SELECT doc_id, n_frames,
        |         unnest(generate_series(0, n_frames - 1, 4)) AS frame_idx
        |  FROM (SELECT doc_id, CAST(strlen(text) // 64 AS BIGINT) AS n_frames
        |        FROM documents)
        |  WHERE n_frames > 0)""".stripMargin,

    // Mirrors MultiModal.StubDecoder byte-exactly: the geometry columns
    // are pure functions of payload length, and the rolling checksum
    // (ck = ck*31 + byte, wrapping signed 64-bit) is a HUGEINT
    // list_reduce mod 2^64 mapped back to the signed range. ord() ==
    // byte value because the corpus is ASCII (payload = utf-8 of text);
    // the `<> ''` guard keeps a hypothetical empty payload at the seed
    // (DuckDB splits '' into [''] and ord('') is -1).
    "mm_decode_features" ->
      """SELECT doc_id,
        |       CAST(strlen(text) AS BIGINT) AS n_bytes,
        |       CAST(strlen(text) % 640 + 1 AS INTEGER) AS width,
        |       CAST(strlen(text) * 7 % 480 + 1 AS INTEGER) AS height,
        |       CAST(3 AS INTEGER) AS channels,
        |       CAST(CASE WHEN ck >= 9223372036854775808::HUGEINT
        |                 THEN ck - 18446744073709551616::HUGEINT
        |                 ELSE ck END AS BIGINT) AS checksum
        |FROM (
        |  -- fold UTF-8 BYTES (via the blob hex dump), not codepoints:
        |  -- the engine checksums payload bytes, and ord(char) only
        |  -- coincides with the byte on ASCII (fuzz-caught divergence)
        |  SELECT doc_id, text, list_reduce(
        |           list_prepend(1125899906842597::HUGEINT,
        |             [ ('0x' || substr(hex(encode(text)), 2*i - 1, 2))::BIGINT::HUGEINT
        |               for i in generate_series(1, strlen(text)) ]),
        |           (acc, b) -> (acc * 31 + b) % 18446744073709551616::HUGEINT) AS ck
        |  FROM documents)""".stripMargin,

    // Mirrors MultiModal.imageRoundTrip: the PNG encode chooses every
    // value as a pure function of doc_id (geometry id%31+2 × id%23+2,
    // uniform fill (id%256, 3id%256, 7id%256), 3-band RGB), so a
    // CORRECT javax.imageio decode must hand exactly these back —
    // the oracle needs no codec, just the arithmetic. PNG is lossless;
    // any fabricated geometry or pixel drift hash-mismatches.
    "mm_imageio_decode" ->
      """SELECT doc_id,
        |       CAST(doc_id % 31 + 2 AS INTEGER) AS width,
        |       CAST(doc_id % 23 + 2 AS INTEGER) AS height,
        |       CAST(3 AS INTEGER) AS channels,
        |       CAST(doc_id % 256 AS INTEGER) AS r_first,
        |       CAST(doc_id * 3 % 256 AS INTEGER) AS g_first,
        |       CAST(doc_id * 7 % 256 AS INTEGER) AS b_first,
        |       CAST(doc_id % 256 AS INTEGER) AS r_last,
        |       CAST(doc_id * 3 % 256 AS INTEGER) AS g_last,
        |       CAST(doc_id * 7 % 256 AS INTEGER) AS b_last
        |FROM documents""".stripMargin
  )
}
