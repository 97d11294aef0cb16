"""Multimodal-column queries with DuckDB oracles.

The driver testdata has no binary media table, so both sides derive one
deterministically from ``documents``: payload = UTF-8 bytes of ``text``,
kind = round-robin image/audio/video by ``doc_id``, duration seeded from
``n_chars``. The Spark side then runs the REAL multimodal plumbing —
``operators/multimodal.py``'s mapInPandas feature kernels and the
JVM-side frame-sampling plan — while the oracle recomputes every
SQL-expressible output column (byte length, md5 fingerprint, feature
dimensionality, unit norm, frame explosion) so CORRECTNESS_r{N}.json
shows value-hash parity for the multimodal family, not just rows-only.
``multimodal_bmp_pixel_features`` goes further: it synthesizes real
24-bit BMP payloads per document, decodes them with the stdlib BMP
parser, and value-hashes every feature DIMENSION against a closed-form
SQL recomputation — genuine pixel decode, verified in this codec-less
sandbox.

Reference parity note: the reference pipeline treats payloads as opaque
bytes end-to-end (publisher/internal/api/handler.go:59-81 forwards the
raw body; publisher/internal/kafka/publisher.go:59-63 takes ``value
[]byte``); this module extends that opaque-binary discipline to media
columns per the tier-C mandate (SURVEY.md §2 C-tier, multimodal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import round4
from ..plans.materialize import materialize
from ..operators import multimodal as M
from ..registry import query
from ..tables import load_table


def _media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from documents (both engines can)."""
    docs = load_table(spark, sf_dir, "documents")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("payload"),
        ((F.coalesce(F.col("n_chars"), F.lit(0)) % 10 + 1) * 1000)
        .cast("int")
        .alias("duration_ms"),
    )


@query(
    "multimodal_media_features",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) AS media_id,
           ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
           CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes,
           md5(coalesce(text, '')) AS payload_md5,
           16 AS feat_dim,
           CAST(1.0 AS DOUBLE) AS feat_norm
    FROM documents
    """,
    description="Multimodal: binary payload column -> Arrow-batched "
    "mapInPandas decode/feature-extract kernel (deterministic fake decoder; "
    "real codecs are a kernel-body swap). Oracle checks byte length, md5 "
    "fingerprint, feature width, and unit norm of the extracted vector.",
)
def multimodal_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media_from_documents(spark, sf_dir).withColumn(
        "payload_md5", F.md5(F.col("payload"))
    )
    # md5 is computed JVM-side in the same scan and carried through the
    # kernel — no second read of the table, no join, zero shuffles
    feats = M.extract_features(media, fake=True, carry=("payload_md5",))
    # float32 kernel output -> cast to double before the sequential fold so
    # the norm lands within round4's epsilon of the oracle's exact 1.0
    sq_sum = F.aggregate(
        "feature",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return feats.select(
        "media_id",
        "kind",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "payload_md5",
        F.size("feature").alias("feat_dim"),
        round4(F.sqrt(sq_sum)).alias("feat_norm"),
    )


@query(
    "multimodal_bmp_pixel_features",
    oracle="""
    WITH px AS (
      SELECT CAST(doc_id AS VARCHAR) AS media_id, doc_id AS d
      FROM documents
    ),
    blocks AS (
      SELECT media_id,
        list_transform(range(16), k ->
          (list_sum(list_transform(range(48), i ->
             CASE WHEN ((i // 6) * 4 // 8) = (k // 4)
                   AND ((i % 6) * 4 // 6) = (k % 4)
                  THEN CAST((d * 37 + (i // 6) * 11 + (i % 6) * 5) % 256
                            AS DOUBLE)
                  ELSE 0.0 END))
           / list_sum(list_transform(range(48), i ->
             CASE WHEN ((i // 6) * 4 // 8) = (k // 4)
                   AND ((i % 6) * 4 // 6) = (k % 4)
                  THEN 1.0 ELSE 0.0 END)))
          / 255.0
        ) AS v
      FROM px
    ),
    normed AS (
      SELECT media_id, v,
        sqrt(list_reduce(list_transform(v, x -> x * x),
                         (a, b) -> a + b)) AS nrm
      FROM blocks
    )
    SELECT media_id, CAST(k AS INT) AS dim,
           (FLOOR((v[k + 1] / nrm) * 10000.0 + 0.5 + 0.000001)
            / 10000.0) AS feat_val
    FROM normed CROSS JOIN (SELECT unnest(range(16)) AS k) dims
    ORDER BY media_id, dim
    """,
    description="Multimodal with REAL pixel decode, no codec libs: each "
    "doc deterministically becomes an 8x6 24-bit BMP (gray gradient "
    "seeded by doc_id, written by operators/multimodal.make_bmp with "
    "bottom-up rows + stride padding), then the stdlib BMP parser "
    "(_bmp_decode) recovers the pixels and emits the 4x4 block-mean "
    "unit-normed feature. The oracle recomputes every feature component "
    "in closed form from doc_id — so a green row proves the byte-level "
    "encode/decode roundtrip AND the resize/normalize arithmetic, "
    "value-hashed per dimension. Encode+decode run fused in one Arrow "
    "mapInPandas stage, so payload bytes never visit the driver and never "
    "pay an Arrow transfer between stages.",
)
def multimodal_bmp_pixel_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # The 8x6 image is a pure function of (doc_id*37) mod 256, so the
    # corpus holds at most 256 distinct payloads however many docs there
    # are. Decide-with-small-rows (guide §8): run the encode+decode
    # kernel once per DISTINCT residue and broadcast-join the features
    # back — the doc rows never enter Python and never shuffle.
    res = docs.select(
        F.pmod(F.col("doc_id") * 37, F.lit(256)).alias("r")
    ).distinct().repartition(spark.sparkContext.defaultParallelism, "r")

    yy, xx = np.mgrid[0:8, 0:6]
    grad = (yy * 11 + xx * 5).astype(np.int64)  # per-pixel part, fixed

    def build_and_decode(batches):
        # One Python stage: encode to real BMP bytes, decode them back,
        # featurize — the byte-level roundtrip happens entirely inside the
        # worker, so the payload column never pays an Arrow transfer.
        for pdf in batches:
            feats = [
                M.decode_image(
                    M.make_bmp(
                        np.repeat(
                            ((int(r) + grad) % 256)
                            .astype(np.uint8)[:, :, None],
                            3,
                            axis=2,
                        )
                    )
                ).tolist()
                for r in pdf["r"]
            ]
            yield pd.DataFrame({"r": pdf["r"], "feature": feats})

    rfeats = res.mapInPandas(build_and_decode, "r long, feature array<double>")
    feats = docs.join(
        F.broadcast(rfeats),
        F.pmod(F.col("doc_id") * 37, F.lit(256)) == F.col("r"),
    ).select(F.col("doc_id").cast("string").alias("media_id"), "feature")
    # Sort at doc grain, not exploded grain (r13, guide §2.2): posexplode
    # emits dim ascending within each row and Generate preserves row
    # order, so range-sorting the per-doc rows BEFORE the explode yields
    # the identical (media_id, dim) total order while the range exchange
    # moves |docs| rows instead of |docs|x|dims| (collect()-equal, probed).
    return (
        feats.repartitionByRange("media_id")
        .sortWithinPartitions("media_id")
        .select("media_id", F.posexplode("feature").alias("dim", "val"))
        .select("media_id", "dim", round4(F.col("val")).alias("feat_val"))
    )


@query(
    "multimodal_image_dhash_pairs",
    oracle="""
    WITH cells AS (
      SELECT doc_id,
        list_transform(range(20), k ->
          (list_sum(list_transform(range(48), i ->
             CASE WHEN ((i // 6) * 4 // 8) = (k // 5)
                   AND ((i % 6) * 5 // 6) = (k % 5)
                  THEN CAST(((doc_id * 37 + (i // 6) * 11 + (i % 6) * 5)
                             * (doc_id * 37 + (i // 6) * 11 + (i % 6) * 5))
                            % 256 AS DOUBLE)
                  ELSE 0.0 END))
           / list_sum(list_transform(range(48), i ->
             CASE WHEN ((i // 6) * 4 // 8) = (k // 5)
                   AND ((i % 6) * 5 // 6) = (k % 5)
                  THEN 1.0 ELSE 0.0 END)))
        ) AS cm
      FROM documents
    ),
    dh AS (
      SELECT doc_id,
        list_sum(list_transform(range(16), k ->
          CASE WHEN cm[(k // 4) * 5 + (k % 4) + 1]
                    > cm[(k // 4) * 5 + (k % 4) + 2]
               THEN CAST(1 AS BIGINT) << k ELSE 0 END)) AS dhash
      FROM cells
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
    FROM dh a JOIN dh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 2
    ORDER BY id_a, id_b
    """,
    description="Multimodal dedup: perceptual difference-hash (dHash) "
    "near-duplicate pairs over REAL image bytes — each doc becomes an "
    "8x6 BMP (nonlinear squared-gradient pixels so hashes vary), the "
    "stdlib parser reduces it to a 4x5 grayscale grid, bit k compares "
    "horizontally adjacent cells, and pairs within Hamming<=2 come from "
    "the SAME pigeonhole banding operator the SimHash family uses "
    "(simhash_hamming_pairs on the dhash column) — an equi-join on "
    "(band, band_bits), never all-pairs. The crawl-pipeline way to "
    "dedup images: byte digests miss re-encoded/brightness-shifted "
    "copies, dHash doesn't. Oracle recomputes the hash closed-form "
    "from doc_id and verifies pairs by exact xor popcount.",
)
def multimodal_image_dhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # The squared-gradient image depends on doc_id only through
    # (doc_id*37) mod 256: hash once per distinct residue, broadcast-join
    # the hashes back (guide §8 decide-with-small-rows, as in the
    # pixel-feature queries).
    res = docs.select(
        F.pmod(F.col("doc_id") * 37, F.lit(256)).alias("r")
    ).distinct().repartition(spark.sparkContext.defaultParallelism, "r")
    yy, xx = np.mgrid[0:8, 0:6]
    lin = (yy * 11 + xx * 5).astype(np.int64)

    def build_and_hash(batches):
        for pdf in batches:
            rs, hashes = [], []
            for r in pdf["r"]:
                x = int(r) + lin
                g = ((x * x) % 256).astype(np.uint8)
                bmp = M.make_bmp(np.repeat(g[:, :, None], 3, axis=2))
                rs.append(int(r))
                hashes.append(M.image_dhash(bmp))
            yield pd.DataFrame({"r": rs, "dhash": hashes})

    rhash = res.mapInPandas(build_and_hash, "r long, dhash long")
    fp = materialize(
        docs.join(
            F.broadcast(rhash),
            F.pmod(F.col("doc_id") * 37, F.lit(256)) == F.col("r"),
        ).select("doc_id", "dhash"),
        "dhash_fp",
    )
    from ..operators.dedup import simhash_hamming_pairs

    return simhash_hamming_pairs(
        fp, "doc_id", fp_col="dhash", max_hamming=2, bits=16
    ).orderBy("id_a", "id_b")


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH v AS (
        SELECT CAST(doc_id AS VARCHAR) AS media_id,
               (coalesce(n_chars, 0) % 10 + 1) AS n_frames
        FROM documents
        WHERE doc_id % 3 = 2
    ),
    fr AS (
        SELECT media_id,
               unnest(generate_series(0, n_frames - 1)) AS frame_idx
        FROM v
    )
    SELECT media_id,
           CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(frame_idx * 1000 AS BIGINT) AS frame_offset_ms
    FROM fr
    """,
    description="Multimodal: video frame-sampling plan — pure JVM metadata "
    "arithmetic (sequence+explode) that turns one long video row into N "
    "parallel decode tasks; decode itself stays in the mapInPandas kernel.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media_from_documents(spark, sf_dir)
    plan = M.frame_sample_plan(media, every_ms=1000)
    return plan.select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.col("frame_offset_ms").cast("long").alias("frame_offset_ms"),
    )


@query(
    "multimodal_png_pixel_features",
    oracle="""
    WITH px AS (
      SELECT CAST(doc_id AS VARCHAR) AS media_id, doc_id AS d
      FROM documents
    ),
    blocks AS (
      SELECT media_id,
        list_transform(range(16), k ->
          (list_sum(list_transform(range(48), i ->
             CASE WHEN ((i // 6) * 4 // 8) = (k // 4)
                   AND ((i % 6) * 4 // 6) = (k % 4)
                  THEN CAST((d * 41 + (i // 6) * 7 + (i % 6) * 13) % 256
                            AS DOUBLE)
                  ELSE 0.0 END))
           / list_sum(list_transform(range(48), i ->
             CASE WHEN ((i // 6) * 4 // 8) = (k // 4)
                   AND ((i % 6) * 4 // 6) = (k % 4)
                  THEN 1.0 ELSE 0.0 END)))
          / 255.0
        ) AS v
      FROM px
    ),
    normed AS (
      SELECT media_id, v,
        sqrt(list_reduce(list_transform(v, x -> x * x),
                         (a, b) -> a + b)) AS nrm
      FROM blocks
    )
    SELECT media_id, CAST(k AS INT) AS dim,
           (FLOOR((v[k + 1] / nrm) * 10000.0 + 0.5 + 0.000001)
            / 10000.0) AS feat_val
    FROM normed CROSS JOIN (SELECT unnest(range(16)) AS k) dims
    ORDER BY media_id, dim
    """,
    description="Multimodal with REAL PNG pixel decode, no codec libs: "
    "each doc deterministically becomes an 8x6 8-bit truecolor PNG (gray "
    "gradient seeded by doc_id; make_png cycles the filter type per row, "
    "so every unfilter branch — None/Sub/Up/Average/Paeth — and the zlib "
    "inflate run on every payload), then the stdlib PNG parser "
    "(_png_gray) recovers the pixels and emits the same 4x4 block-mean "
    "unit-normed feature as the BMP kernel. The oracle recomputes every "
    "feature component closed-form from the gradient — a value-hashed "
    "proof the decoded pixels are exactly right.",
)
def multimodal_png_pixel_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # Same decide-with-small-rows shape as the BMP/JPEG twins (guide §8):
    # the image is a pure function of (doc_id*41) mod 256, so the inflate
    # +unfilter decode runs once per distinct residue, not once per doc.
    res = docs.select(
        F.pmod(F.col("doc_id") * 41, F.lit(256)).alias("r")
    ).distinct().repartition(spark.sparkContext.defaultParallelism, "r")

    yy, xx = np.mgrid[0:8, 0:6]
    grad = (yy * 7 + xx * 13).astype(np.int64)  # distinct from the BMP mix

    def build_and_decode(batches):
        for pdf in batches:
            feats = [
                M.decode_image(
                    M.make_png(
                        np.repeat(
                            ((int(r) + grad) % 256)
                            .astype(np.uint8)[:, :, None],
                            3,
                            axis=2,
                        )
                    )
                ).tolist()
                for r in pdf["r"]
            ]
            yield pd.DataFrame({"r": pdf["r"], "feature": feats})

    rfeats = res.mapInPandas(build_and_decode, "r long, feature array<double>")
    feats = docs.join(
        F.broadcast(rfeats),
        F.pmod(F.col("doc_id") * 41, F.lit(256)) == F.col("r"),
    ).select(F.col("doc_id").cast("string").alias("media_id"), "feature")
    # Sort at doc grain, not exploded grain (r13, guide §2.2): posexplode
    # emits dim ascending within each row and Generate preserves row
    # order, so range-sorting the per-doc rows BEFORE the explode yields
    # the identical (media_id, dim) total order while the range exchange
    # moves |docs| rows instead of |docs|x|dims| (collect()-equal, probed).
    return (
        feats.repartitionByRange("media_id")
        .sortWithinPartitions("media_id")
        .select("media_id", F.posexplode("feature").alias("dim", "val"))
        .select("media_id", "dim", round4(F.col("val")).alias("feat_val"))
    )


@query(
    "multimodal_jpeg_pixel_features",
    oracle="""
    WITH px AS (
      SELECT CAST(doc_id AS VARCHAR) AS media_id, doc_id AS d
      FROM documents
    ),
    blocks AS (
      SELECT media_id,
        list_transform(range(16), k ->
          CAST((d * 53 + ((k // 4) // 2) * 17 + ((k % 4) // 2) * 29) % 256
               AS DOUBLE) / 255.0
        ) AS v
      FROM px
    ),
    normed AS (
      SELECT media_id, v,
        sqrt(list_reduce(list_transform(v, x -> x * x),
                         (a, b) -> a + b)) AS nrm
      FROM blocks
    )
    SELECT media_id, CAST(k AS INT) AS dim,
           (FLOOR((v[k + 1] / nrm) * 10000.0 + 0.5 + 0.000001)
            / 10000.0) AS feat_val
    FROM normed CROSS JOIN (SELECT unnest(range(16)) AS k) dims
    ORDER BY media_id, dim
    """,
    description="Multimodal with REAL baseline-JPEG decode, no codec "
    "libs: each doc becomes a 16x16 grayscale JPEG of four 8x8 "
    "constant blocks seeded by doc_id (operators/jpeg.py make_jpeg, "
    "quant table all ones), then the stdlib+numpy baseline decoder — "
    "marker parse, canonical Huffman with FF00 unstuffing, DC "
    "prediction + EXTEND, dequant, inverse zigzag, IDCT — recovers the "
    "pixels and emits the same 4x4 block-mean unit-norm feature as the "
    "BMP/PNG kernels. Block-constant + quant-1 makes the lossy format "
    "exactly invertible (DC-only blocks), so the oracle recomputes "
    "every feature dimension in closed form from doc_id: a value-hashed "
    "proof of real entropy-coded JPEG decode. The general AC path is "
    "pinned separately (tests/test_multimodal: arbitrary images "
    "roundtrip within one gray level at quant 1).",
)
def multimodal_jpeg_pixel_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # The 16x16 image is a pure function of (doc_id*53) mod 256 — at most
    # 256 distinct payloads whatever the corpus size. Decide-with-small-
    # rows (guide §8): the real encode+Huffman-decode kernel runs once
    # per DISTINCT residue (<=256 rows through Python) and the features
    # broadcast-join back onto the corpus map-side.
    res = docs.select(
        F.pmod(F.col("doc_id") * 53, F.lit(256)).alias("r")
    ).distinct().repartition(spark.sparkContext.defaultParallelism, "r")

    bi, bj = np.mgrid[0:2, 0:2]
    block_mix = (bi * 17 + bj * 29).astype(np.int64)  # per-block part, fixed

    def build_and_decode(batches):
        # One fused Python stage: encode real JPEG bytes, Huffman-decode
        # them back, featurize — payloads never visit the driver.
        for pdf in batches:
            payloads = (
                M.make_jpeg(
                    np.repeat(np.repeat(v, 8, axis=0), 8, axis=1).astype(
                        np.uint8
                    )
                )
                for v in ((int(r) + block_mix) % 256 for r in pdf["r"])
            )
            feats = [M.decode_image(p).tolist() for p in payloads]
            yield pd.DataFrame({"r": pdf["r"], "feature": feats})

    rfeats = res.mapInPandas(build_and_decode, "r long, feature array<double>")
    feats = docs.join(
        F.broadcast(rfeats),
        F.pmod(F.col("doc_id") * 53, F.lit(256)) == F.col("r"),
    ).select(F.col("doc_id").cast("string").alias("media_id"), "feature")
    # Sort at doc grain, not exploded grain (r13, guide §2.2): posexplode
    # emits dim ascending within each row and Generate preserves row
    # order, so range-sorting the per-doc rows BEFORE the explode yields
    # the identical (media_id, dim) total order while the range exchange
    # moves |docs| rows instead of |docs|x|dims| (collect()-equal, probed).
    return (
        feats.repartitionByRange("media_id")
        .sortWithinPartitions("media_id")
        .select("media_id", F.posexplode("feature").alias("dim", "val"))
        .select("media_id", "dim", round4(F.col("val")).alias("feat_val"))
    )


@query(
    "multimodal_crossformat_dhash_pairs",
    oracle="""
    WITH cells AS (
      SELECT doc_id,
        list_transform(range(16), k ->
          CAST((doc_id * doc_id * 7 + doc_id * (k // 4) * 13
                + (k // 4) * 31 + (k % 4) * (k % 4) * 11
                + doc_id * (k % 4) * 17) % 256 AS DOUBLE)) AS cm
      FROM documents
    ),
    dh AS (
      SELECT doc_id,
        list_sum(list_transform(range(12), k ->
          CASE WHEN cm[(k // 3) * 4 + (k % 3) + 1]
                    > cm[(k // 3) * 4 + (k % 3) + 2]
               THEN CAST(1 AS BIGINT) << k ELSE 0 END)) AS dhash
      FROM cells
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
    FROM dh a JOIN dh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 2
    ORDER BY id_a, id_b
    """,
    description="Multimodal dedup ACROSS serialization formats — the "
    "actual dHash use case: each doc's 32x32 block-constant image (4x4 grid of 8x8 constant "
    "blocks) is written as BMP, PNG, or baseline JPEG by doc_id % 3, and the "
    "format-dispatching gray decoder (image_gray) must land all three "
    "on IDENTICAL pixels (block-constant quant-1 JPEG roundtrips "
    "exactly), so the oracle's closed-form dHash needs no format term "
    "at all. A re-encoded copy therefore hashes identically and pairs "
    "via the same pigeonhole banding equi-join as the single-format "
    "query (never all-pairs). A green row = three independent codec "
    "paths byte-exact on the same pixels + the banding join.",
)
def multimodal_crossformat_dhash_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import numpy as np
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # Pixels depend on doc_id only mod 256 and the format choice on
    # doc_id mod 3, so doc_id mod 768 (= lcm) determines the payload:
    # encode+hash once per distinct residue, broadcast-join back
    # (guide §8, as in the single-format dhash query).
    res = (
        docs.select(F.pmod(F.col("doc_id"), F.lit(768)).alias("r"))
        .distinct()
        .repartition(spark.sparkContext.defaultParallelism, "r")
    )
    bi, bj = np.mgrid[0:4, 0:4]

    def build_and_hash(batches):
        for pdf in batches:
            rs, hashes = [], []
            for r in pdf["r"]:
                d = int(r)
                vals = (
                    d * d * 7 + d * bi * 13 + bi * 31
                    + bj * bj * 11 + d * bj * 17
                ) % 256
                g = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(
                    np.uint8
                )
                fmt = d % 3
                if fmt == 0:
                    payload = M.make_bmp(np.repeat(g[:, :, None], 3, axis=2))
                elif fmt == 1:
                    payload = M.make_png(np.repeat(g[:, :, None], 3, axis=2))
                else:
                    payload = M.make_jpeg(g)
                rs.append(d)
                hashes.append(M.image_dhash(payload, gw=4, gh=4))
            yield pd.DataFrame({"r": rs, "dhash": hashes})

    rhash = res.mapInPandas(build_and_hash, "r long, dhash long")
    fp = materialize(
        docs.join(
            F.broadcast(rhash),
            F.pmod(F.col("doc_id"), F.lit(768)) == F.col("r"),
        ).select("doc_id", "dhash"),
        "crossformat_dhash_fp",
    )
    from ..operators.dedup import simhash_hamming_pairs

    return simhash_hamming_pairs(
        fp, "doc_id", fp_col="dhash", max_hamming=2, bits=12
    ).orderBy("id_a", "id_b")


def _wav_dft_sql() -> str:
    """Closed-form SQL replay of the WAV spectral kernel: resynthesize
    the int16 samples (trunc + libm sin — bit-identical to Python's, as
    the kernel docstring pins), then the same sequential DFT folds."""
    def mag(k: int) -> str:
        re = (
            f"list_reduce(list_transform(range(800), t -> "
            f"xs[t + 1] * cos(2 * pi() * {k} * t / 800)), (a, b) -> a + b)"
        )
        im = (
            f"list_reduce(list_transform(range(800), t -> "
            f"xs[t + 1] * sin(2 * pi() * {k} * t / 800)), (a, b) -> a + b)"
        )
        return f"sqrt(({re}) * ({re}) + ({im}) * ({im}))"

    r4 = lambda e: f"(FLOOR(({e}) * 10000.0 + 0.5 + 0.000001) / 10000.0)"
    lms = ", ".join(f"{r4(f'ln(1 + m{k})')} AS lm{k}" for k in (1, 2, 3, 4))
    return f"""
    WITH au AS (
      SELECT CAST(doc_id AS VARCHAR) AS media_id,
             10.0 * (1 + doc_id % 4) AS f
      FROM documents WHERE doc_id % 5 = 0
    ),
    x AS (
      SELECT media_id,
             list_transform(range(800),
               t -> TRUNC(20000 * sin(2 * pi() * f * t / 8000))) AS xs
      FROM au
    ),
    dft AS (
      SELECT media_id,
             {mag(1)} AS m1, {mag(2)} AS m2,
             {mag(3)} AS m3, {mag(4)} AS m4
      FROM x
    ),
    lm AS (SELECT media_id, {lms} FROM dft)
    SELECT media_id, CAST(800 AS BIGINT) AS n_samples,
           lm1, lm2, lm3, lm4,
           CAST(CASE WHEN lm1 >= lm2 AND lm1 >= lm3 AND lm1 >= lm4 THEN 1
                     WHEN lm2 >= lm3 AND lm2 >= lm4 THEN 2
                     WHEN lm3 >= lm4 THEN 3 ELSE 4 END AS BIGINT)
             AS peak_bin
    FROM lm
    ORDER BY media_id
    """


@query(
    "multimodal_wav_spectral_features",
    oracle=_wav_dft_sql(),
    description="C-multimodal: REAL audio decode + spectral analysis, "
    "value-hashed per dimension — each audio doc synthesizes a tone WAV "
    "(10/20/30/40 Hz by doc_id), decodes it through the stdlib wave "
    "module inside the Arrow kernel, and computes closed-form DFT "
    "magnitudes at bins 1-4 (explicit sequential sums, not an FFT, so "
    "the oracle replays them exactly; trig factors use libm on both "
    "engines — bit-parity pinned by this very gate). log-magnitudes "
    "export round4-snapped; peak_bin recovers the synthesized tone "
    "(bin k == k*10 Hz), so decode+DFT correctness is semantically "
    "visible, not just hash-stable.",
)
def multimodal_wav_spectral_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 5 == 0
    )
    au = docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        (10.0 * (1 + F.col("doc_id") % 4)).alias("freq"),
    )
    feats = M.wav_spectral_features(au)
    lm = feats.select(
        "media_id",
        "n_samples",
        *[
            round4(F.log(F.lit(1.0) + F.col(f"m{k}"))).alias(f"lm{k}")
            for k in (1, 2, 3, 4)
        ],
    )
    l1, l2, l3, l4 = (F.col(f"lm{k}") for k in (1, 2, 3, 4))
    peak = (
        F.when((l1 >= l2) & (l1 >= l3) & (l1 >= l4), 1)
        .when((l2 >= l3) & (l2 >= l4), 2)
        .when(l3 >= l4, 3)
        .otherwise(4)
    )
    return lm.select(
        "media_id",
        "n_samples",
        "lm1",
        "lm2",
        "lm3",
        "lm4",
        peak.cast("long").alias("peak_bin"),
    ).orderBy("media_id")


_VID_FRAMES = 8
_VID_SCENE_LEN = 3  # scene id = frame_idx // 3 -> changes at frames 3 and 6


@query(
    "multimodal_video_scene_changes",
    oracle=f"""
    WITH vids AS (
      SELECT doc_id FROM documents WHERE doc_id % 3 = 2
    ),
    frames AS (
      SELECT v.doc_id, f.f
      FROM vids v, (SELECT UNNEST(range({_VID_FRAMES})) AS f) f
    ),
    cells AS (
      SELECT doc_id, f,
        list_transform(range(20), k ->
          (list_sum(list_transform(range(48), i ->
             CASE WHEN ((i // 6) * 4 // 8) = (k // 5)
                   AND ((i % 6) * 5 // 6) = (k % 5)
                  THEN CAST(((doc_id * 37 + (f // {_VID_SCENE_LEN}) * 97
                              + (i // 6) * 11 + (i % 6) * 5)
                             * (doc_id * 37 + (f // {_VID_SCENE_LEN}) * 97
                                + (i // 6) * 11 + (i % 6) * 5))
                            % 256 AS DOUBLE)
                  ELSE 0.0 END))
           / list_sum(list_transform(range(48), i ->
             CASE WHEN ((i // 6) * 4 // 8) = (k // 5)
                   AND ((i % 6) * 5 // 6) = (k % 5)
                  THEN 1.0 ELSE 0.0 END)))
        ) AS cm
      FROM frames
    ),
    dh AS (
      SELECT doc_id, f,
        list_sum(list_transform(range(16), k ->
          CASE WHEN cm[(k // 4) * 5 + (k % 4) + 1]
                    > cm[(k // 4) * 5 + (k % 4) + 2]
               THEN CAST(1 AS BIGINT) << k ELSE 0 END)) AS dhash
      FROM cells
    ),
    lagged AS (
      SELECT CAST(doc_id AS VARCHAR) AS media_id,
             CAST(f AS BIGINT) AS frame_idx, dhash,
             LAG(dhash) OVER (PARTITION BY doc_id ORDER BY f) AS prev
      FROM dh
    )
    SELECT media_id, frame_idx, dhash,
           CAST(COALESCE(bit_count(xor(dhash, prev)), -1) AS INT)
             AS hamming_prev,
           CAST(CASE WHEN prev IS NOT NULL
                      AND bit_count(xor(dhash, prev)) > 4
                     THEN 1 ELSE 0 END AS INT) AS is_scene_change
    FROM lagged
    ORDER BY media_id, frame_idx
    """,
    description="Multimodal video: scene-change detection over a REAL "
    "container — each video doc synthesizes an 8-frame container "
    "(magic + length-prefixed BMP frames), the kernel PARSES the bytes "
    "back, decodes every frame through the stdlib BMP parser, and "
    "dHashes it; consecutive-frame Hamming distance (JVM bit_count over "
    "a per-video LAG window, <= 8 rows per video) flags cuts where the "
    "hash jumps > 4 bits. Frames share pixels within a 3-frame scene "
    "and jump at scene boundaries, so the detector's output is "
    "semantically checkable; the oracle recomputes each frame's hash "
    "closed-form from (doc_id, frame//3). The shot-boundary pass every "
    "video-curation pipeline runs before frame sampling.",
)
def multimodal_video_scene_changes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import struct

    import numpy as np
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 3 == 2
    ).select("doc_id")
    yy, xx = np.mgrid[0:8, 0:6]
    lin = (yy * 11 + xx * 5).astype(np.int64)

    def build_parse_hash(batches):
        for pdf in batches:
            mids, fids, hashes = [], [], []
            for d in pdf["doc_id"]:
                d = int(d)
                # build the container: real bytes, length-prefixed frames
                blobs = []
                for f in range(_VID_FRAMES):
                    v = d * 37 + (f // _VID_SCENE_LEN) * 97 + lin
                    g = ((v * v) % 256).astype(np.uint8)
                    blobs.append(
                        M.make_bmp(np.repeat(g[:, :, None], 3, axis=2))
                    )
                payload = b"VID0" + struct.pack("<I", len(blobs))
                for b in blobs:
                    payload += struct.pack("<I", len(b)) + b
                # parse it back (the decode path a real pipeline runs)
                assert payload[:4] == b"VID0"
                (nf,) = struct.unpack_from("<I", payload, 4)
                off = 8
                for f in range(nf):
                    (ln,) = struct.unpack_from("<I", payload, off)
                    off += 4
                    frame = payload[off : off + ln]
                    off += ln
                    mids.append(str(d))
                    fids.append(f)
                    hashes.append(M.image_dhash(frame))
            yield pd.DataFrame(
                {"media_id": mids, "frame_idx": fids, "dhash": hashes}
            )

    fp = docs.mapInPandas(
        build_parse_hash, "media_id string, frame_idx long, dhash long"
    )
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    prev = F.lag("dhash").over(w)
    ham = F.bit_count(F.col("dhash").bitwiseXOR(prev))
    return fp.select(
        "media_id",
        "frame_idx",
        "dhash",
        F.coalesce(ham, F.lit(-1)).cast("int").alias("hamming_prev"),
        (prev.isNotNull() & (ham > 4)).cast("int").alias("is_scene_change"),
    ).orderBy("media_id", "frame_idx")
