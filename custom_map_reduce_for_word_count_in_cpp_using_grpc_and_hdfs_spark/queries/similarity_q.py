"""Similarity-search + multimodal queries (operators/similarity.py,
operators/multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.functions.vector import cosine_sql
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import multimodal as MM
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import similarity as S
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import query
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table, read_binary_dir

#: Query set: every 50th vector (10 queries at sf0.01).
QUERY_PRED = "vec_id % 50 = 0"
TOP_K = 10


def _scratch_dir(sf_dir: str, kind: str) -> str:
    """Repo-local staging root (binaryFile ingest fixture, stored IVF
    index), keyed by the sf_dir's ABSOLUTE path (basename for
    readability + an 8-hex path hash so two sf dirs sharing a basename
    never collide — ADVICE r7; override the root with
    $SPARK_GRAFT_SCRATCH). CWD-independent: anchored at the repo root
    derived from the package location."""
    import hashlib
    import os

    # __file__ = <repo>/<package>/queries/similarity_q.py -> 3 dirnames up
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    scratch = os.environ.get("SPARK_GRAFT_SCRATCH", os.path.join(repo_root, ".scratch"))
    norm = os.path.normpath(os.path.abspath(sf_dir))
    tag = f"{os.path.basename(norm)}-{hashlib.sha1(norm.encode()).hexdigest()[:8]}"
    return os.path.join(scratch, kind, tag)


def _mm_ingest_dir(sf_dir: str) -> str:
    return _scratch_dir(sf_dir, "mm_ingest")


@query(
    "ann_topk_bruteforce",
    oracle=f"""
    SELECT query_id, neighbor_id, rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {cosine_sql('q.embedding', 'c.embedding')} DESC, c.vec_id ASC
               ) AS rank
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.{QUERY_PRED}
    ) WHERE rank <= {TOP_K}
    """,
)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors for the query set — broadcast
    queries × streamed corpus, bounded-heap rank window."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.expr(QUERY_PRED))
    return S.brute_force_topk(queries, emb, TOP_K)


def _recall_invariant(approx: DataFrame, exact: DataFrame, queries: DataFrame, bound: float, flag: str) -> DataFrame:
    """One driver-checkable row for an approximate top-k result: every
    count the oracle can know exactly (n_queries, k) plus the recall
    bound computed in-plan against the exact top-k — the
    (exact, within-tolerance) pattern of rel_sketch_suite."""
    n_q = queries.agg(F.count(F.lit(1)).alias("n_queries"))
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    n_hits = (
        approx.join(exact, ["query_id", "neighbor_id"], "left_semi")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        n_q.crossJoin(n_exact)
        .crossJoin(n_hits)
        .select(
            "n_queries",
            F.lit(TOP_K).cast("long").alias("k"),
            (F.col("n_hits") >= bound * F.col("n_exact")).alias(flag),
        )
    )


_ANN_INVARIANT_ORACLE = """
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST({k} AS BIGINT) AS k,
           true AS {flag}
    FROM embeddings WHERE {pred}
"""


@query(
    "ann_topk_lsh",
    oracle=_ANN_INVARIANT_ORACLE.format(k=TOP_K, flag="recall_ge_0_6", pred=QUERY_PRED),
)
def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH candidates + exact rescoring.

    The hyperplane projections are float-fold-order dependent (not
    oracle-expressible), so the driver row is the invariant computed
    in-plan: (n_queries, k, recall vs the exact brute-force top-k ≥ 0.6).
    Margin under the ≥ 0.7 recall asserted in
    tests/test_dedup_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.expr(QUERY_PRED))
    approx = S.lsh_topk(queries, emb, TOP_K).select("query_id", "neighbor_id")
    exact = S.brute_force_topk(queries, emb, TOP_K).select("query_id", "neighbor_id")
    return _recall_invariant(approx, exact, queries, 0.6, "recall_ge_0_6")


@query(
    "ann_topk_ivf",
    oracle=_ANN_INVARIANT_ORACLE.format(k=TOP_K, flag="recall_ge_0_65", pred=QUERY_PRED),
)
def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF variant, COST-AWARE since round 12 (VERDICT r11 item 1):
    routes through ``plans/cost.py`` like the edge/skew/state seams —
    below the measured corpus-size crossover the live in-plan route
    (k=16 Lloyd training + in-plan assignment, nprobe 10); above it the
    scale route (√N sampled-k-means centroids, write-once
    hive-partitioned index under the repo scratch dir, partition-pruned
    probes at nprobe = k/4 — 8.5×/decade measured vs the live route's
    18.5×, SCALE_R11_ANN.json).

    K-means bucket boundaries are float-order-sensitive, so as with the
    LSH path the driver row is the in-plan invariant: (n_queries, k,
    recall vs exact brute force ≥ 0.65) — margin under the ≥ 0.8
    asserted in tests, and cleared by BOTH routes (the stored route's
    uniform-fixture operating point measures ≈ 0.83)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.expr(QUERY_PRED))
    approx, _decision = S.auto_ivf_topk(
        queries, emb, index_root=_scratch_dir(sf_dir, "ivf_auto")
    )
    approx = approx.select("query_id", "neighbor_id")
    exact = S.brute_force_topk(queries, emb, TOP_K).select("query_id", "neighbor_id")
    return _recall_invariant(approx, exact, queries, 0.65, "recall_ge_0_65")


@query(
    "mm_suite",
    oracle=f"""
    WITH decoded AS (
        SELECT doc_id,
               md5(text) AS payload_md5,  -- DuckDB md5 takes VARCHAR; same utf-8 bytes as the payload
               'text' AS modality,
               octet_length(encode(text))::BIGINT AS byte_len,
               64 + octet_length(encode(text))::BIGINT % 193 AS width,
               64 + octet_length(encode(text))::BIGINT % 149 AS height,
               1 + octet_length(encode(text))::BIGINT % 7 AS n_frames
        FROM documents
    ),
    dims AS (
        SELECT doc_id,
               CAST(4 + doc_id % {MM.PPM_W_MOD} AS BIGINT) AS width,
               CAST(4 + doc_id % {MM.PPM_H_MOD} AS BIGINT) AS height
        FROM documents
    ), px AS (
        SELECT doc_id, width, height,
               unnest(generate_series(0, width*height*3 - 1)) AS i
        FROM dims
    ), rsize AS (
        -- nearest-neighbor resize geometry: aspect-preserving fit into
        -- an 8-box (small so the oracle's per-output-pixel expansion
        -- stays bounded; the kernel is box-size-independent), never
        -- upscaling — same integer math as multimodal.resize_fit
        SELECT doc_id, width, height,
               CASE WHEN greatest(width, height) <= 8 THEN width
                    ELSE greatest(1, width * 8 // greatest(width, height)) END AS ow,
               CASE WHEN greatest(width, height) <= 8 THEN height
                    ELSE greatest(1, height * 8 // greatest(width, height)) END AS oh
        FROM dims
    ), rsums AS (
        -- output pixel (oy, ox, c) reads fixture flat index
        -- 3*((oy*h//oh)*w + (ox*w//ow)) + c — the NN kernel IS the
        -- index arithmetic, so the oracle checks the kernel itself
        SELECT doc_id,
               CAST(SUM(v) AS BIGINT) AS pixel_sum,
               CAST(SUM(CASE WHEN c = 0 THEN v ELSE 0 END) AS BIGINT) AS r_sum,
               CAST(SUM(CASE WHEN c = 1 THEN v ELSE 0 END) AS BIGINT) AS g_sum,
               CAST(SUM(CASE WHEN c = 2 THEN v ELSE 0 END) AS BIGINT) AS b_sum
        FROM (
            SELECT r.doc_id, c,
                   (7*r.doc_id + 31*(3*((oy*r.height//r.oh)*r.width + (ox*r.width//r.ow)) + c)) % 256 AS v
            FROM rsize r,
                 unnest(generate_series(0, r.oh - 1)) AS goy(oy),
                 unnest(generate_series(0, r.ow - 1)) AS gox(ox),
                 unnest(generate_series(0, 2)) AS gc(c)
        )
        GROUP BY doc_id
    ), aud AS (
        -- WAV fixture geometry: arithmetic on doc_id (same 1-in-10 sample)
        SELECT doc_id,
               CAST(8000 + 100 * (doc_id % 5) AS BIGINT) AS rate,
               CAST(1 + doc_id % 2 AS BIGINT) AS ch,
               CAST(40 + doc_id % 23 AS BIGINT) AS n
        FROM documents WHERE doc_id % 10 = 0
    ), asums AS (
        -- interleaved sample at flat i = ((13*d + 29*i) mod 4096) - 2048;
        -- channel of i = i mod ch (SUM over an empty CASE set = NULL, so
        -- ch1_sum is NULL for mono exactly like the engine emits).
        -- q_* are the FLOOR-256 quantized sums (what the unsigned-8-bit
        -- PCM container preserves: (v>>8)<<8, an arithmetic shift =
        -- floor). Written as v - positive_remainder because DuckDB's
        -- integer // truncates toward zero on negatives (round 11)
        SELECT a.doc_id,
               CAST(SUM(CASE WHEN i % a.ch = 0 THEN v END) AS BIGINT) AS ch0_sum,
               CAST(SUM(CASE WHEN i % a.ch = 1 THEN v END) AS BIGINT) AS ch1_sum,
               CAST(SUM(ABS(v)) AS BIGINT) AS abs_sum,
               CAST(SUM(CASE WHEN i % a.ch = 0 THEN v - ((v % 256 + 256) % 256) END) AS BIGINT) AS q_ch0_sum,
               CAST(SUM(CASE WHEN i % a.ch = 1 THEN v - ((v % 256 + 256) % 256) END) AS BIGINT) AS q_ch1_sum,
               CAST(SUM(ABS(v - ((v % 256 + 256) % 256))) AS BIGINT) AS q_abs_sum
        FROM (
            SELECT a.doc_id, a.ch, i, ((13*a.doc_id + 29*i) % 4096) - 2048 AS v
            FROM aud a, unnest(generate_series(0, a.ch * a.n - 1)) AS gi(i)
        ) a
        GROUP BY a.doc_id
    ), gq AS (
        -- G.711 A-law quantizer q(v), bit-exact to the engine's
        -- compress+expand pair (g711.c; exhaustively pinned vs audioop
        -- in tests): 13-bit magnitude, 8-segment CASE, low-nibble
        -- reconstruction with the +8 midpoint and the seg>=1 boost
        SELECT a.doc_id, i % a.ch AS c,
               (CASE WHEN v >= 0 THEN 1 ELSE -1 END) *
               (CASE WHEN sg = 0 THEN ((mag // 2) % 16) * 16 + 8
                     ELSE (((mag // (1 << sg)) % 16) * 16 + 8 + 256) * (1 << (sg - 1)) END) AS qv
        FROM (
            SELECT a.doc_id, a.ch, i, v, mag,
                   CASE WHEN mag <= 31 THEN 0 WHEN mag <= 63 THEN 1
                        WHEN mag <= 127 THEN 2 WHEN mag <= 255 THEN 3
                        WHEN mag <= 511 THEN 4 WHEN mag <= 1023 THEN 5
                        WHEN mag <= 2047 THEN 6 ELSE 7 END AS sg
            FROM (
                SELECT a.doc_id, a.ch, i,
                       ((13*a.doc_id + 29*i) % 4096) - 2048 AS v,
                       CASE WHEN ((13*a.doc_id + 29*i) % 4096) - 2048 >= 0
                            THEN (((13*a.doc_id + 29*i) % 4096) - 2048) // 8
                            ELSE (-(((13*a.doc_id + 29*i) % 4096) - 2048) - 1) // 8 END AS mag
                FROM aud a, unnest(generate_series(0, a.ch * a.n - 1)) AS gi(i)
            ) a
        ) a
    ), gsums AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN c = 0 THEN qv END) AS BIGINT) AS ch0_sum,
               CAST(SUM(CASE WHEN c = 1 THEN qv END) AS BIGINT) AS ch1_sum,
               CAST(SUM(ABS(qv)) AS BIGINT) AS abs_sum
        FROM gq GROUP BY doc_id
    ), vid AS (
        -- Y4M fixture geometry: arithmetic on doc_id (sampled 1-in-10
        -- like the jpeg branch)
        SELECT doc_id,
               CAST(4 + doc_id % 5 AS BIGINT) AS w,
               CAST(4 + doc_id % 3 AS BIGINT) AS h,
               CAST(2 + doc_id % 5 AS BIGINT) AS n
        FROM documents WHERE doc_id % 10 = 0
    ), vsums AS (
        -- per-plane byte sums over the SAMPLED frames (every
        -- {MM.FRAME_STRIDE}-th): byte(f,p,i) = (11*d + 17*f + 23*p + 31*i) mod 256
        SELECT v.doc_id,
               CAST(SUM(CASE WHEN p = 0 THEN (11*v.doc_id + 17*f + 23*p + 31*i) % 256 ELSE 0 END) AS BIGINT) AS y_sum,
               CAST(SUM(CASE WHEN p = 1 THEN (11*v.doc_id + 17*f + 23*p + 31*i) % 256 ELSE 0 END) AS BIGINT) AS cb_sum,
               CAST(SUM(CASE WHEN p = 2 THEN (11*v.doc_id + 17*f + 23*p + 31*i) % 256 ELSE 0 END) AS BIGINT) AS cr_sum
        FROM vid v,
             unnest(generate_series(0, v.n - 1, {MM.FRAME_STRIDE})) AS gf(f),
             unnest(generate_series(0, 2)) AS gp(p),
             unnest(generate_series(0, v.w * v.h - 1)) AS gi(i)
        GROUP BY v.doc_id
    ), pxsums AS (
        SELECT doc_id, width, height,
               CAST(SUM((7*doc_id + 31*i) % 256) AS BIGINT) AS pixel_sum,
               CAST(SUM(CASE WHEN i % 3 = 0 THEN (7*doc_id + 31*i) % 256 ELSE 0 END) AS BIGINT) AS r_sum,
               CAST(SUM(CASE WHEN i % 3 = 1 THEN (7*doc_id + 31*i) % 256 ELSE 0 END) AS BIGINT) AS g_sum,
               CAST(SUM(CASE WHEN i % 3 = 2 THEN (7*doc_id + 31*i) % 256 ELSE 0 END) AS BIGINT) AS b_sum
        FROM px GROUP BY doc_id, width, height
    ), mdims AS (
        -- MJPEG/DIB video fixture geometry: the still-image dims plus
        -- the 2..6 frame count (same 1-in-10 sample as jpeg_decode)
        SELECT doc_id, width, height, CAST(2 + doc_id % 5 AS BIGINT) AS n
        FROM dims WHERE doc_id % 10 = 0
    ), dibsums AS (
        -- lossless DIB decode: frame pixel at (f, flat j) =
        -- (7*d + 17*f + 31*j) mod 256, channel j mod 3, summed over the
        -- SAMPLED frames (every {MM.FRAME_STRIDE}-th)
        SELECT m.doc_id,
               CAST(SUM(CASE WHEN j % 3 = 0 THEN v ELSE 0 END) AS BIGINT) AS r_sum,
               CAST(SUM(CASE WHEN j % 3 = 1 THEN v ELSE 0 END) AS BIGINT) AS g_sum,
               CAST(SUM(CASE WHEN j % 3 = 2 THEN v ELSE 0 END) AS BIGINT) AS b_sum
        FROM (
            SELECT m.doc_id, j, (7*m.doc_id + 17*f + 31*j) % 256 AS v
            FROM mdims m,
                 unnest(generate_series(0, m.n - 1, {MM.FRAME_STRIDE})) AS gf(f),
                 unnest(generate_series(0, m.width * m.height * 3 - 1)) AS gj(j)
        ) m
        GROUP BY m.doc_id
    )
    SELECT 'meta_decode' AS op, doc_id, payload_md5, modality, byte_len, width, height,
           n_frames,
           (width * {MM.RESIZE_BOX}) // greatest(width, height) AS resized_w,
           (height * {MM.RESIZE_BOX}) // greatest(width, height) AS resized_h,
           array_to_string(generate_series(0, n_frames - 1, {MM.FRAME_STRIDE}), ',') AS sampled_frames,
           CAST(NULL AS BIGINT) AS maxval, CAST(NULL AS BIGINT) AS pixel_sum,
           CAST(NULL AS BIGINT) AS r_sum, CAST(NULL AS BIGINT) AS g_sum,
           CAST(NULL AS BIGINT) AS b_sum, CAST(NULL AS BOOLEAN) AS decode_ok,
           CAST(NULL AS VARCHAR) AS status
    FROM decoded
  UNION ALL
    SELECT 'real_decode', doc_id, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS BIGINT), width, height, CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(255 AS BIGINT), pixel_sum, r_sum, g_sum, b_sum,
           CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR)
    FROM pxsums
  UNION ALL
    SELECT 'png_decode', doc_id, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS BIGINT), width, height, CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(255 AS BIGINT), pixel_sum, r_sum, g_sum, b_sum,
           CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR)
    FROM pxsums
  UNION ALL
    -- jpeg is LOSSY: exact values are the header dims; the pixel check
    -- is the in-plan decode_ok bound (recall-invariant pattern). Sampled
    -- 1-in-10 to bound the Python entropy-decode cost at large SF.
    SELECT 'jpeg_decode', doc_id, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS BIGINT), width, height, CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), true,
           CAST(NULL AS VARCHAR)
    FROM dims WHERE doc_id % 10 = 0
  UNION ALL
    -- raw-file ingest: byte_len is the true on-disk PPM size (ASCII
    -- header "P6\\n<w> <h>\\n255\\n" + w*h*3 raster bytes), arithmetic in
    -- the header token widths, so the oracle proves the binaryFile
    -- source read every payload byte-complete
    SELECT 'binary_ingest', doc_id, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(9 + length(CAST(width AS VARCHAR)) + length(CAST(height AS VARCHAR))
                + width * height * 3 AS BIGINT),
           width, height, CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(255 AS BIGINT), pixel_sum, r_sum, g_sum, b_sum,
           CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR)
    FROM pxsums WHERE doc_id % 10 = 0
  UNION ALL
    -- quarantine (round 8): good PPMs decode to exact stats + status='ok';
    -- the three planted failure classes (truncated stream,
    -- arithmetic-coded JPEG, unknown magic) surface as null-stat rows tagged with the
    -- exception class — the job-survives-bad-payloads contract, driver-
    -- checked. Classes are doc_id arithmetic, so fully SQL-expressible.
    SELECT 'quarantine', doc_id, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS BIGINT), width, height, CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(255 AS BIGINT), pixel_sum, r_sum, g_sum, b_sum,
           CAST(NULL AS BOOLEAN), 'ok'
    FROM pxsums WHERE doc_id % 10 = 0 AND doc_id % 100 NOT IN (0, 30, 60)
  UNION ALL
    SELECT 'quarantine', doc_id, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BOOLEAN),
           CASE WHEN doc_id % 100 = 0 THEN 'quarantined:ValueError'
                ELSE 'quarantined:NotImplementedError' END
    FROM dims WHERE doc_id % 10 = 0 AND doc_id % 100 IN (0, 30, 60)
  UNION ALL
    -- quarantine_summary (round 9): per-status doc counts over the same
    -- planted batch — the rollup operator's driver-stable projection
    SELECT 'quarantine_summary', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(count(*) AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BOOLEAN),
           CASE WHEN doc_id % 100 = 0 THEN 'quarantined:ValueError'
                WHEN doc_id % 100 IN (30, 60) THEN 'quarantined:NotImplementedError'
                ELSE 'ok' END
    FROM dims WHERE doc_id % 10 = 0
    GROUP BY CASE WHEN doc_id % 100 = 0 THEN 'quarantined:ValueError'
                  WHEN doc_id % 100 IN (30, 60) THEN 'quarantined:NotImplementedError'
                  ELSE 'ok' END
  UNION ALL
    -- video_y4m (round 9): native raw-video container decode — exact
    -- byte length (ASCII header + n frames of 'FRAME\\n' + 3 planes),
    -- frame-sampled per-plane sums carried in the r/g/b slots
    SELECT 'video_y4m', v.doc_id, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(length('YUV4MPEG2 W' || v.w || ' H' || v.h || ' F25:1 Ip A1:1 C444') + 1
                + v.n * (6 + 3 * v.w * v.h) AS BIGINT),
           v.w, v.h, v.n,
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           array_to_string(generate_series(0, CAST(v.n AS INTEGER) - 1, {MM.FRAME_STRIDE}), ','),
           CAST(NULL AS BIGINT),
           s.y_sum + s.cb_sum + s.cr_sum,
           s.y_sum, s.cb_sum, s.cr_sum,
           CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR)
    FROM vid v JOIN vsums s USING (doc_id)
  UNION ALL
    -- audio_wav (round 9; container variants round 11): native RIFF/PCM
    -- decode over FOUR real layouts cycled by (doc_id//10)%4 —
    -- 0: canonical 16-byte-fmt s16 (44 + 2chn bytes)
    -- 1: WAVE_FORMAT_EXTENSIBLE s16 (40-byte fmt: 68 + 2chn)
    -- 2: 24-bit PCM, low byte zero (44 + 3chn + pad; decodes bit-exact)
    -- 3: unsigned 8-bit PCM (44 + chn + pad; decodes to the floor-256
    --    quantization, whose sums the q_* columns re-render)
    SELECT 'audio_wav', a.doc_id, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(CASE (a.doc_id // 10) % 4
                WHEN 0 THEN 44 + 2 * a.ch * a.n
                WHEN 1 THEN 68 + 2 * a.ch * a.n
                WHEN 2 THEN 44 + 3 * a.ch * a.n + (3 * a.ch * a.n) % 2
                ELSE 44 + a.ch * a.n + (a.ch * a.n) % 2 END AS BIGINT),
           a.rate, a.ch, a.n,
           a.n * 1000000 // a.rate, CAST(NULL AS BIGINT),
           CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
           CASE WHEN (a.doc_id // 10) % 4 = 3 THEN s.q_abs_sum ELSE s.abs_sum END,
           CASE WHEN (a.doc_id // 10) % 4 = 3 THEN s.q_ch0_sum ELSE s.ch0_sum END,
           CASE WHEN (a.doc_id // 10) % 4 = 3 THEN s.q_ch1_sum ELSE s.ch1_sum END,
           CAST(NULL AS BIGINT),
           CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR)
    FROM aud a JOIN asums s USING (doc_id)
  UNION ALL
    -- image_resize (round 9): the REAL resize kernel (decode -> NN
    -- resample into an 8-box fit), resized dims in resized_w/h and the
    -- RESIZED raster's sums in the pixel columns
    SELECT 'image_resize', r.doc_id, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS BIGINT), r.width, r.height, CAST(NULL AS BIGINT),
           r.ow, r.oh, CAST(NULL AS VARCHAR),
           CAST(NULL AS BIGINT),
           s.pixel_sum, s.r_sum, s.g_sum, s.b_sum,
           CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR)
    FROM rsize r JOIN rsums s USING (doc_id)
  UNION ALL
    -- audio_g711 (round 10): COMPRESSED audio decoded natively — the
    -- same fixture samples companded through G.711 A-law (tag 6, with
    -- the fact chunk and odd-size data padding) and expanded back by
    -- the native decoder; the oracle recomputes the QUANTIZED channel
    -- sums through the SQL rendering of the same quantizer (gq above),
    -- so compander, container walk and de-interleave are all
    -- value-checked cross-engine
    SELECT 'audio_g711', a.doc_id, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(56 + a.ch * a.n + (a.ch * a.n) % 2 AS BIGINT),
           a.rate, a.ch, a.n,
           a.n * 1000000 // a.rate, CAST(NULL AS BIGINT),
           CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
           s.abs_sum, s.ch0_sum, s.ch1_sum, CAST(NULL AS BIGINT),
           CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR)
    FROM aud a JOIN gsums s USING (doc_id)
  UNION ALL
    -- video_mjpeg (round 10): COMPRESSED video container — MJPEG-in-AVI
    -- (RIFF walk + per-frame JPEG decode). JPEG is lossy, so the exact
    -- driver values are the avih geometry, frame count and sampled
    -- indices; the pixel check is the in-plan decode_ok bound over the
    -- sampled frames (decode_jpeg_check pattern across the container).
    SELECT 'video_mjpeg', d.doc_id, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS BIGINT), d.width, d.height,
           CAST(2 + d.doc_id % 5 AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           array_to_string(generate_series(0, CAST(2 + d.doc_id % 5 AS INTEGER) - 1, {MM.FRAME_STRIDE}), ','),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), true,
           CAST(NULL AS VARCHAR)
    FROM dims d WHERE d.doc_id % 10 = 0
  UNION ALL
    -- audio_f32 (round 11): IEEE-float WAV decoded natively. Fixture
    -- floats are k/2^15 (exact dyadics) so the round-trip is bit-exact
    -- and the PCM sums apply verbatim; byte_len counts 4-byte samples
    -- plus the fact chunk (12 RIFF + 24 fmt + 12 fact + 8 data hdr)
    SELECT 'audio_f32', a.doc_id, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(56 + 4 * a.ch * a.n AS BIGINT),
           a.rate, a.ch, a.n,
           a.n * 1000000 // a.rate, CAST(NULL AS BIGINT),
           CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
           s.abs_sum, s.ch0_sum, s.ch1_sum, CAST(NULL AS BIGINT),
           CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR)
    FROM aud a JOIN asums s USING (doc_id)
  UNION ALL
    -- audio_flac (round 12): FLAC decoded NATIVELY — Rice entropy
    -- coding over fixed-order linear-prediction residuals, stereo docs
    -- cycling all four channel assignments (independent / left-side /
    -- right-side / mid-side by (doc_id//10)%4). LOSSLESS, so the PCM
    -- arithmetic oracle applies VERBATIM to the decoded samples — the
    -- bitreader, Rice decode, predictor and decorrelation must all be
    -- exact to reproduce these sums. byte_len is NULL on both sides:
    -- Rice code lengths aren't SQL-expressible (that's the point of an
    -- entropy codec); the container self-verifies via CRC-8/16 + MD5.
    SELECT 'audio_flac', a.doc_id, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS BIGINT),
           a.rate, a.ch, a.n,
           a.n * 1000000 // a.rate, CAST(NULL AS BIGINT),
           CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
           s.abs_sum, s.ch0_sum, s.ch1_sum, CAST(NULL AS BIGINT),
           CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR)
    FROM aud a JOIN asums s USING (doc_id)
  UNION ALL
    -- audio_adpcm (round 11): IMA-ADPCM (tag 0x11) decoded natively.
    -- Lossy differential codec, so the exact values are the container
    -- geometry — byte_len = 60 header bytes + ceil(n/17) blocks of
    -- 12*ch bytes (4-byte per-channel state header + 8 nibble bytes
    -- per channel at 17 samples/block) — and sample correctness is the
    -- in-plan decode_ok bound vs the triangle-wave reference
    SELECT 'audio_adpcm', a.doc_id, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(60 + ((a.n + 16) // 17) * 12 * a.ch AS BIGINT),
           a.rate, a.ch, a.n,
           a.n * 1000000 // a.rate, CAST(NULL AS BIGINT),
           CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), true, CAST(NULL AS VARCHAR)
    FROM aud a
  UNION ALL
    -- video_dib (round 11): UNCOMPRESSED raw-RGB AVI — lossless, so
    -- per-channel sums over the sampled frames are exact: pixel v at
    -- (frame f, flat j) = (7*d + 17*f + 31*j) mod 256, channel j mod 3
    -- (the MJPEG fixture pixels through a lossless container).
    -- byte_len = 12 RIFF + 200 hdrl + 12 movi list hdr + per frame
    -- (8 + h * 4-byte-padded row bytes)
    SELECT 'video_dib', m.doc_id, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(224 + m.n * (8 + m.height * ((m.width * 3 + 3) // 4 * 4)) AS BIGINT),
           m.width, m.height, m.n,
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           array_to_string(generate_series(0, CAST(m.n AS INTEGER) - 1, {MM.FRAME_STRIDE}), ','),
           CAST(NULL AS BIGINT),
           s.r_sum + s.g_sum + s.b_sum,
           s.r_sum, s.g_sum, s.b_sum,
           CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR)
    FROM mdims m JOIN dibsums s USING (doc_id)
    """,
)
def mm_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal surface end to end, one tagged union (round-4
    registry consolidation of the former mm_suite + mm_real_decode):

    - op='meta_decode': rows carry (payload: binary, meta: struct) —
      payload proven byte-exact via md5 over the bytes on both engines,
      metadata projected from the struct — then the deterministic
      stand-in codec decodes, resizes (aspect-preserving integer fit
      into a 224-box) and frame-samples each Arrow batch via mapInPandas
      (see operators/multimodal.py).
    - op='real_decode': REAL image decode end to end — per document,
      render an actual binary PPM (P6) payload executor-side (pixel
      values a deterministic arithmetic function of doc_id), then DECODE
      THE BYTES with the pure-numpy PPM parser — header grammar, raster
      layout — and emit decoded dimensions + whole-image and per-channel
      pixel sums. The oracle regenerates every pixel arithmetically via
      generate_series, so any codec bug (header mis-parse, offset slip,
      channel-order swap) is a hash mismatch. Both stages are
      Arrow-batched mapInPandas: binary payloads are born and consumed
      on executors, never on the driver — the exact plumbing a
      JPEG/ffmpeg pipeline uses at 100 TB (see
      operators/multimodal.py decode_image_real for the dispatch seam).
    - op='png_decode' (round 5): the SAME fixture pixels through a real
      COMPRESSED container — zlib-PNG with per-row filter cycling and
      CRC'd chunks (operators/multimodal.py decode_png, stdlib zlib
      only). Inflate + defilter must reproduce the arithmetic pixel
      sums bit-exactly, so the compressed-codec seam is proven, not
      stubbed.
    - op='jpeg_decode' (round 6; progressive round 8): the fixture
      pixels through a real TRANSFORM codec — JFIF (multimodal.py
      encode_jpeg / decode_jpeg: DCT, canonical Huffman from the DHT
      segments, byte stuffing, YCbCr), with every fourth JPEG doc
      rendered as an 8-scan PROGRESSIVE (SOF2) stream — successive
      approximation + EOB-run coding per T.81 Annex G, decoded by the
      same decoder. JPEG is lossy by design, so the driver-exact values
      are the decoded dimensions and the pixel check is in-plan:
      decode_ok = max |decoded - arithmetic reference| <= JPEG_TOLERANCE
      (the recall-invariant pattern; the tolerance is the measured
      unit-quant round-trip bound, tests/test_multimodal.py — and a
      progressive stream decodes EXACTLY equal to its baseline
      encoding, pinned there too). Sampled doc_id % 10 == 0 to bound
      Python entropy-decode cost at scale. The remaining
      NotImplementedError seams: arithmetic-coded JPEG and video
      (PIL/libvips/ffmpeg drop in at decode_image_real).
    - op='quarantine' (round 8): the safe-decode route. Three failure
      classes a real 100 TB ingest hits — truncated stream,
      arithmetic-coded JPEG (SOF9, real-but-unsupported), unknown
      container magic — planted by doc_id arithmetic among good PPMs in
      the same Arrow batches; decode_image_stats(safe=True) turns them
      into status='quarantined:<ExceptionClass>' rows with null stats
      while the good neighbors decode to hash-exact pixel sums. No
      stage-killing decode path remains: strict mode stays the
      fixture-pipeline default, safe mode is the production ingest
      posture.
    - op='quarantine_summary' (round 9): the one-pass per-status rollup
      (operators/multimodal.py quarantine_summary) over the same
      safe-decode output — per-status doc counts, driver-checked, so
      the quarantine RATE is a first-class observable next to the
      decode itself.
    - op='video_y4m' (round 9): REAL video-container decode — raw
      YUV4MPEG2 streams (the mjpegtools/ffmpeg raw-video interchange
      format) rendered executor-side, parsed natively (header parameter
      scan, length-based FRAME split), frame-sampled every
      FRAME_STRIDE-th, per-plane Y/Cb/Cr byte sums + exact container
      byte length vs the arithmetic oracle. Moves the video seam from
      "all video" to COMPRESSED video only (H.264 etc. remain at the
      ffmpeg drop-in behind the same mapInPandas batch iterator).
    - op='audio_wav' (round 9): REAL audio-container decode — RIFF/WAVE
      16-bit PCM, chunk-walked (LIST/fact chunks and odd-size padding
      handled), mono and stereo both exercised; features are exact
      integers (container bytes, duration µs, per-channel sums, L1
      energy) vs the arithmetic oracle. With images and Y4M video, all
      three media modalities now decode REAL containers natively;
      compressed audio (MP3/AAC) remains at the libsndfile/ffmpeg seam.
    - op='video_mjpeg' (round 10): COMPRESSED video-container decode —
      MJPEG-in-AVI (the webcam/capture interchange format): RIFF chunk
      walk (LIST hdrl → avih geometry + strh/strf codec check, LIST
      movi → '00dc' frame chunks) composed with the native decode_jpeg
      per frame, frame-sampled every FRAME_STRIDE-th. Exact driver
      values are the avih geometry + frame count + sampled indices;
      pixels ride the in-plan bounded-error invariant (decode_ok, the
      jpeg_decode pattern — JPEG is lossy by design). Non-MJPEG AVIs
      raise at the declared seam, shrinking the video gap to
      INTER-frame codecs (H.264/VP9 → ffmpeg adapter) only.
    - op='audio_g711' (round 10): COMPRESSED audio decoded NATIVELY —
      the fixture samples companded through G.711 A-law into real tag-6
      RIFF/WAVE containers (fact chunk, odd-size data padding) and
      expanded back by decode_wav's exhaustively-pinned compander; the
      oracle re-renders the quantizer itself in SQL (13-bit magnitude,
      8-segment CASE, midpoint + segment boost) and matches the
      quantized channel/L1 sums exactly — compander, container walk and
      de-interleave all value-checked cross-engine. µ-law rides the
      same native path (pytest-pinned); float/ADPCM went native in
      round 11 (op='audio_f32' / op='audio_adpcm' below).
    - op='image_resize' (round 9): the REAL resize kernel — decode +
      aspect-preserving nearest-neighbor fit (no upscale), the resized
      raster's per-channel sums hash-checked against the oracle's
      re-derivation of every output pixel (NN resampling is pure index
      arithmetic, so the KERNEL is verified, not just the geometry).
    - op='audio_f32' (round 11): IEEE-float WAV (tag 3) decoded
      natively — fixture values k/2^15 are exact dyadics, so the
      float32 container round-trips bit-exactly into the same PCM
      arithmetic oracle (byte_len switches to 4-byte samples + fact).
    - op='audio_adpcm' (round 11): IMA-ADPCM WAV (tag 0x11) decoded
      natively — the block-structured 4-bit DIFFERENTIAL codec (decoder
      pinned bit-exact vs audioop's IMA state machine in tests;
      multi-block, carried step index, fact-trimmed final block at
      every fixture doc). Lossy, so exact driver values are the
      container geometry (block-arithmetic byte_len, rate/ch/n/
      duration) and samples ride decode_ok ≤ ADPCM_TOLERANCE vs the
      triangle-wave reference — the jpeg_decode pattern at the audio
      seam.
    - op='video_dib' (round 11): UNCOMPRESSED AVI — raw-RGB DIB frames
      (bottom-up BGR rows, 4-byte padding: the BMP raster through the
      AVI chunk walk). Lossless, so unlike video_mjpeg the per-channel
      pixel sums are exact oracle values, not a bounded invariant.
      With these three the native A/V seam shrank to ENTROPY-coded
      formats; round 12's audio_flac moves it to PERCEPTUAL formats
      only (MP3/AAC, H.264/VP9 — the ffmpeg adapter).
    """
    docs = load_table(spark, sf_dir, "documents")
    with_payload = MM.attach_payload(docs)
    meta = with_payload.select(
        "doc_id",
        F.md5("payload").alias("payload_md5"),
        F.col("meta.modality").alias("modality"),
    )
    decoded = MM.fake_decode_meta(with_payload)
    nb = F.lit(None).cast("long")
    ns = F.lit(None).cast("string")
    nflag = F.lit(None).cast("boolean")
    meta_rows = meta.join(decoded, "doc_id").select(
        F.lit("meta_decode").alias("op"),
        "doc_id", "payload_md5", "modality", "byte_len", "width", "height", "n_frames",
        "resized_w", "resized_h", "sampled_frames",
        nb.alias("maxval"), nb.alias("pixel_sum"),
        nb.alias("r_sum"), nb.alias("g_sum"), nb.alias("b_sum"),
        nflag.alias("decode_ok"), ns.alias("status"),
    )
    def decoded_rows(op: str, rendered: DataFrame) -> DataFrame:
        return MM.decode_image_stats(rendered).select(
            F.lit(op).alias("op"),
            "doc_id", ns.alias("payload_md5"), ns.alias("modality"), nb.alias("byte_len"),
            "width", "height", nb.alias("n_frames"),
            nb.alias("resized_w"), nb.alias("resized_h"), ns.alias("sampled_frames"),
            "maxval", "pixel_sum", "r_sum", "g_sum", "b_sum",
            nflag.alias("decode_ok"), ns.alias("status"),
        )

    real_rows = decoded_rows("real_decode", MM.render_ppm_payloads(docs))
    png_rows = decoded_rows("png_decode", MM.render_png_payloads(docs))
    jpeg_docs = docs.where(F.col("doc_id") % 10 == 0)
    jpeg_rows = MM.decode_jpeg_check(MM.render_jpeg_payloads(jpeg_docs)).select(
        F.lit("jpeg_decode").alias("op"),
        "doc_id", ns.alias("payload_md5"), ns.alias("modality"), nb.alias("byte_len"),
        "width", "height", nb.alias("n_frames"),
        nb.alias("resized_w"), nb.alias("resized_h"), ns.alias("sampled_frames"),
        nb.alias("maxval"), nb.alias("pixel_sum"),
        nb.alias("r_sum"), nb.alias("g_sum"), nb.alias("b_sum"),
        "decode_ok", ns.alias("status"),
    )
    # op='quarantine' (round 8, VERDICT r7 item 1): safe-mode decode over
    # a batch with three planted failure classes (truncated PPM,
    # arithmetic-coded JPEG, unknown magic). The job completes, good rows stay
    # hash-exact, bad rows surface as status='quarantined:<ExcType>' —
    # the posture a 100 TB ingest needs (one corrupt file among billions
    # must not kill the stage). The free-text error column is dropped
    # here (kept for triage in the operator output): exception MESSAGES
    # can vary across numpy versions, exception CLASSES cannot.
    q_stats = MM.decode_image_stats(MM.render_quarantine_payloads(jpeg_docs), safe=True)
    quarantine_rows = q_stats.select(
        F.lit("quarantine").alias("op"),
        "doc_id", ns.alias("payload_md5"), ns.alias("modality"), nb.alias("byte_len"),
        "width", "height", nb.alias("n_frames"),
        nb.alias("resized_w"), nb.alias("resized_h"), ns.alias("sampled_frames"),
        "maxval", "pixel_sum", "r_sum", "g_sum", "b_sum",
        nflag.alias("decode_ok"), "status",
    )
    # op='quarantine_summary' (round 9, VERDICT r8 item 7): the one-pass
    # quarantine-rate rollup a 100 TB ingest watches next to the decode —
    # per-status doc counts (in byte_len) over the same safe-decode
    # output. The operator also emits share + a triage example error;
    # the driver row keeps the driver-stable columns (counts + status —
    # error MESSAGES vary across numpy versions, counts and CLASSES
    # cannot).
    # op='video_y4m' (round 9): REAL video-container decode — one raw
    # YUV4MPEG2 stream per sampled doc rendered executor-side, parsed by
    # the native Y4M decoder (header parameter scan + length-based FRAME
    # split), every FRAME_STRIDE-th frame kept, per-plane byte sums over
    # the sampled frames. Exact end to end (the fixture bytes ARE the
    # planes — no color conversion), so the oracle regenerates every
    # byte arithmetically: byte_len = exact container size, pixel_sum =
    # y+cb+cr, and the r/g/b columns carry the Y/Cb/Cr plane sums.
    video_rows = MM.video_frame_stats(MM.render_y4m_payloads(jpeg_docs)).select(
        F.lit("video_y4m").alias("op"),
        "doc_id", ns.alias("payload_md5"), ns.alias("modality"), "byte_len",
        "width", "height", "n_frames",
        nb.alias("resized_w"), nb.alias("resized_h"), "sampled_frames",
        nb.alias("maxval"),
        (F.col("y_sum") + F.col("cb_sum") + F.col("cr_sum")).alias("pixel_sum"),
        F.col("y_sum").alias("r_sum"), F.col("cb_sum").alias("g_sum"),
        F.col("cr_sum").alias("b_sum"),
        nflag.alias("decode_ok"), ns.alias("status"),
    )
    # op='audio_wav' (round 9): REAL audio-container decode — one RIFF/
    # WAVE (16-bit PCM) per sampled doc, chunk-walked by the native WAV
    # parser, per-document features all integers. Union-schema mapping
    # (documented here because the tagged union reuses column slots):
    # width=sample_rate, height=n_channels, n_frames=n_samples,
    # resized_w=duration_us, pixel_sum=abs_sum (L1 energy),
    # r_sum=ch0_sum, g_sum=ch1_sum (NULL for mono).
    audio_rows = MM.audio_features(MM.render_pcm_variant_payloads(jpeg_docs)).select(
        F.lit("audio_wav").alias("op"),
        "doc_id", ns.alias("payload_md5"), ns.alias("modality"), "byte_len",
        F.col("sample_rate").alias("width"), F.col("n_channels").alias("height"),
        F.col("n_samples").alias("n_frames"),
        F.col("duration_us").alias("resized_w"), nb.alias("resized_h"),
        ns.alias("sampled_frames"), nb.alias("maxval"),
        F.col("abs_sum").alias("pixel_sum"),
        F.col("ch0_sum").alias("r_sum"), F.col("ch1_sum").alias("g_sum"),
        nb.alias("b_sum"),
        nflag.alias("decode_ok"), ns.alias("status"),
    )
    # op='image_resize' (round 9): decode -> REAL nearest-neighbor
    # resize (aspect-preserving 8-box fit, no upscale) -> sums of the
    # RESIZED raster. NN resampling is pure index arithmetic, so the
    # oracle re-derives every output pixel — the resize KERNEL is
    # hash-checked, not just the plumbing (fake_decode_meta's resized_w/h
    # checked only the geometry arithmetic).
    resize_rows = MM.resized_image_stats(MM.render_ppm_payloads(docs), box=8).select(
        F.lit("image_resize").alias("op"),
        "doc_id", ns.alias("payload_md5"), ns.alias("modality"), nb.alias("byte_len"),
        "width", "height", nb.alias("n_frames"),
        F.col("resized_w"), F.col("resized_h"), ns.alias("sampled_frames"),
        nb.alias("maxval"), "pixel_sum", "r_sum", "g_sum", "b_sum",
        nflag.alias("decode_ok"), ns.alias("status"),
    )
    # op='audio_g711' (round 10): COMPRESSED audio decoded natively —
    # A-law (tag 6) containers of the same fixture samples, expanded by
    # the exhaustively-pinned compander inside decode_wav; the oracle
    # recomputes the quantized sums via the SQL quantizer, so the
    # compander itself is value-checked cross-engine. Same union-slot
    # mapping as audio_wav.
    g711_rows = MM.audio_features(MM.render_g711_payloads(jpeg_docs)).select(
        F.lit("audio_g711").alias("op"),
        "doc_id", ns.alias("payload_md5"), ns.alias("modality"), "byte_len",
        F.col("sample_rate").alias("width"), F.col("n_channels").alias("height"),
        F.col("n_samples").alias("n_frames"),
        F.col("duration_us").alias("resized_w"), nb.alias("resized_h"),
        ns.alias("sampled_frames"), nb.alias("maxval"),
        F.col("abs_sum").alias("pixel_sum"),
        F.col("ch0_sum").alias("r_sum"), F.col("ch1_sum").alias("g_sum"),
        nb.alias("b_sum"),
        nflag.alias("decode_ok"), ns.alias("status"),
    )
    # op='video_mjpeg' (round 10): compressed-container video — RIFF/AVI
    # walk + per-frame JPEG decode; exact geometry/count/indices, pixel
    # correctness via the in-plan bounded-error invariant (decode_ok).
    mjpeg_rows = MM.mjpeg_frame_check(MM.render_avi_payloads(jpeg_docs)).select(
        F.lit("video_mjpeg").alias("op"),
        "doc_id", ns.alias("payload_md5"), ns.alias("modality"), nb.alias("byte_len"),
        "width", "height", "n_frames",
        nb.alias("resized_w"), nb.alias("resized_h"), "sampled_frames",
        nb.alias("maxval"), nb.alias("pixel_sum"),
        nb.alias("r_sum"), nb.alias("g_sum"), nb.alias("b_sum"),
        "decode_ok", ns.alias("status"),
    )
    # op='audio_f32' (round 11): IEEE-float WAV (tag 3) decoded natively
    # — fixture values k/2^15 are exact dyadics, so the float round-trip
    # is bit-exact and the PCM arithmetic oracle applies verbatim; only
    # byte_len changes (4-byte samples + the fact chunk). Same
    # union-slot mapping as audio_wav.
    f32_rows = MM.audio_features(MM.render_f32_payloads(jpeg_docs)).select(
        F.lit("audio_f32").alias("op"),
        "doc_id", ns.alias("payload_md5"), ns.alias("modality"), "byte_len",
        F.col("sample_rate").alias("width"), F.col("n_channels").alias("height"),
        F.col("n_samples").alias("n_frames"),
        F.col("duration_us").alias("resized_w"), nb.alias("resized_h"),
        ns.alias("sampled_frames"), nb.alias("maxval"),
        F.col("abs_sum").alias("pixel_sum"),
        F.col("ch0_sum").alias("r_sum"), F.col("ch1_sum").alias("g_sum"),
        nb.alias("b_sum"),
        nflag.alias("decode_ok"), ns.alias("status"),
    )
    # op='audio_flac' (round 12): FLAC decoded NATIVELY — the entropy
    # codec milestone: Rice-coded fixed-prediction residuals, all four
    # stereo channel assignments cycled by doc arithmetic, CRC-8/16 and
    # STREAMINFO-MD5 self-verified in the decoder. Lossless, so the
    # exact PCM sums apply verbatim (same union-slot mapping as
    # audio_wav); byte_len is NULL — Rice lengths aren't
    # SQL-expressible, which is precisely what distinguishes an entropy
    # container from the fixed-layout ones.
    flac_rows = MM.audio_features(MM.render_flac_payloads(jpeg_docs)).select(
        F.lit("audio_flac").alias("op"),
        "doc_id", ns.alias("payload_md5"), ns.alias("modality"), nb.alias("byte_len"),
        F.col("sample_rate").alias("width"), F.col("n_channels").alias("height"),
        F.col("n_samples").alias("n_frames"),
        F.col("duration_us").alias("resized_w"), nb.alias("resized_h"),
        ns.alias("sampled_frames"), nb.alias("maxval"),
        F.col("abs_sum").alias("pixel_sum"),
        F.col("ch0_sum").alias("r_sum"), F.col("ch1_sum").alias("g_sum"),
        nb.alias("b_sum"),
        nflag.alias("decode_ok"), ns.alias("status"),
    )
    # op='audio_adpcm' (round 11): IMA-ADPCM WAV (tag 0x11) decoded
    # natively — block-structured 4-bit differential codec, multi-block
    # with carried step index and fact-trimmed padding at every fixture
    # doc. ADPCM is LOSSY, so exact driver values are the container
    # geometry (byte_len from the block arithmetic, rate/ch/n/duration)
    # and sample correctness is the in-plan bounded-error invariant
    # (decode_ok ≤ ADPCM_TOLERANCE vs the triangle-wave reference — the
    # jpeg_decode pattern at the audio seam).
    adpcm_rows = MM.adpcm_roundtrip_check(MM.render_adpcm_payloads(jpeg_docs)).select(
        F.lit("audio_adpcm").alias("op"),
        "doc_id", ns.alias("payload_md5"), ns.alias("modality"), "byte_len",
        F.col("sample_rate").alias("width"), F.col("n_channels").alias("height"),
        F.col("n_samples").alias("n_frames"),
        F.col("duration_us").alias("resized_w"), nb.alias("resized_h"),
        ns.alias("sampled_frames"), nb.alias("maxval"),
        nb.alias("pixel_sum"), nb.alias("r_sum"), nb.alias("g_sum"), nb.alias("b_sum"),
        "decode_ok", ns.alias("status"),
    )
    # op='video_dib' (round 11): UNCOMPRESSED AVI — raw-RGB DIB frames
    # through the same RIFF walk (BMP row layout: bottom-up, BGR, 4-byte
    # padding). Lossless, so unlike video_mjpeg every output is an exact
    # integer: container bytes, geometry, and per-channel sums over the
    # sampled frames, all re-derived arithmetically by the oracle.
    dib_rows = MM.dib_frame_stats(MM.render_dib_payloads(jpeg_docs)).select(
        F.lit("video_dib").alias("op"),
        "doc_id", ns.alias("payload_md5"), ns.alias("modality"), "byte_len",
        "width", "height", "n_frames",
        nb.alias("resized_w"), nb.alias("resized_h"), "sampled_frames",
        nb.alias("maxval"),
        (F.col("r_sum") + F.col("g_sum") + F.col("b_sum")).alias("pixel_sum"),
        "r_sum", "g_sum", "b_sum",
        nflag.alias("decode_ok"), ns.alias("status"),
    )
    summary_rows = MM.quarantine_summary(q_stats).select(
        F.lit("quarantine_summary").alias("op"),
        nb.alias("doc_id"), ns.alias("payload_md5"), ns.alias("modality"),
        F.col("n_docs").alias("byte_len"),
        nb.alias("width"), nb.alias("height"), nb.alias("n_frames"),
        nb.alias("resized_w"), nb.alias("resized_h"), ns.alias("sampled_frames"),
        nb.alias("maxval"), nb.alias("pixel_sum"),
        nb.alias("r_sum"), nb.alias("g_sum"), nb.alias("b_sum"),
        nflag.alias("decode_ok"), "status",
    )
    # op='binary_ingest' (round 7, VERDICT r6 item 3): the raw-FILE edge.
    # Real .ppm files staged once per sf_dir (executor-written, marker-
    # gated), read back through Spark's binaryFile source, id parsed from
    # the path, and the BYTES decoded through the same codec seam — so
    # the driver hash-checks the whole ingest path: listing, glob prune,
    # byte-complete reads (byte_len), and content (pixel sums).
    ingest_path = MM.stage_ppm_ingest_dir(jpeg_docs.select("doc_id"), _mm_ingest_dir(sf_dir))
    parsed = read_binary_dir(spark, ingest_path, glob="*.ppm").select(
        F.regexp_extract("path", r"(\d+)\.ppm$", 1).cast("long").alias("doc_id"),
        F.col("length").cast("long").alias("byte_len"),
        F.col("content").alias("img"),
    )
    ingest_rows = MM.decode_image_stats(parsed).join(
        parsed.select("doc_id", "byte_len"), "doc_id"
    ).select(
        F.lit("binary_ingest").alias("op"),
        "doc_id", ns.alias("payload_md5"), ns.alias("modality"), "byte_len",
        "width", "height", nb.alias("n_frames"),
        nb.alias("resized_w"), nb.alias("resized_h"), ns.alias("sampled_frames"),
        "maxval", "pixel_sum", "r_sum", "g_sum", "b_sum",
        nflag.alias("decode_ok"), ns.alias("status"),
    )
    return (
        meta_rows.unionAll(real_rows)
        .unionAll(png_rows)
        .unionAll(jpeg_rows)
        .unionAll(ingest_rows)
        .unionAll(quarantine_rows)
        .unionAll(summary_rows)
        .unionAll(video_rows)
        .unionAll(audio_rows)
        .unionAll(resize_rows)
        .unionAll(mjpeg_rows)
        .unionAll(g711_rows)
        .unionAll(f32_rows)
        .unionAll(flac_rows)
        .unionAll(adpcm_rows)
        .unionAll(dib_rows)
    )
