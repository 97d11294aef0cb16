"""Multimodal plumbing tests: binary columns + Arrow-batched kernels.

Two decode kernels are REAL here with zero codec libs — stdlib WAV
(audio) and stdlib uncompressed 24-bit BMP (image); other image formats
fall back to PIL when importable else the digest stand-in. Under test:
the byte-level parsers, dispatch order, and the engine-side contract
(schema, mapInPandas batching, feature shape, determinism, frame plan)."""

from __future__ import annotations

import pytest

from kafka_clickhouse_ingest_pipeline_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    return M.make_fake_media(spark, n=30)


def test_real_decoder_explicit_request_matches_environment():
    """fake=False demands the real codec: raises where PIL is absent,
    decodes where present."""
    if not M.HAVE_PIL:
        with pytest.raises(NotImplementedError):
            M.decode_image(b"\x89PNG...", fake=False)
    else:
        vec = M.decode_image(b"not an image", fake=False)
        assert len(vec) == M.FEATURE_DIM  # undecodable → zero vector
        assert float(abs(vec).sum()) == 0.0


def test_decode_auto_path_available_in_any_environment():
    """fake=None exercises whichever codec path the environment has
    (VERDICT #8): real PIL decode, or the deterministic stand-in."""
    vec = M.decode_image(b"payload-bytes")
    assert len(vec) == M.FEATURE_DIM
    if M.HAVE_PIL:
        import io

        img = M._PILImage.new("L", (8, 6), color=200)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        real = M.decode_image(buf.getvalue())
        assert len(real) == M.FEATURE_DIM
        assert float(abs(real).sum()) > 0  # decoded, not zero-vector
    else:
        # stand-in is deterministic and content-keyed
        assert (vec == M.decode_image(b"payload-bytes")).all()
        assert not (vec == M.decode_image(b"other-bytes")).all()


def test_audio_decode_is_real_wav_path(spark, media):
    """Audio rows carry real PCM WAV; the stdlib wave decode produces
    energy features — deterministic, content-keyed, and distinct from
    the digest stub."""
    import numpy as np

    w1 = M.make_wav(220.0)
    w2 = M.make_wav(880.0)
    a1 = M.decode_audio(w1)
    assert len(a1) == M.FEATURE_DIM
    assert float(np.abs(a1).sum()) > 0  # decoded, not zero vector
    assert (a1 == M.decode_audio(w1)).all()  # deterministic
    assert not (a1 == M.decode_audio(w2)).all()  # content-keyed
    assert (M.decode_audio(b"not a wav") == 0).all()  # drop-don't-fail
    # kind-aware kernel: the auto path decodes audio for real
    feats = {
        r.media_id: r.feature
        for r in M.extract_features(media, fake=None).collect()
    }
    fake_feats = {
        r.media_id: r.feature
        for r in M.extract_features(media, fake=True).collect()
    }
    audio_ids = [r.media_id for r in media.where("kind = 'audio'").collect()]
    assert any(feats[i] != fake_feats[i] for i in audio_ids)


def test_extract_features_shape_and_schema(spark, media):
    out = M.extract_features(media, fake=True)
    assert out.schema == M.DECODED_SCHEMA
    rows = out.collect()
    assert len(rows) == 30
    assert all(len(r.feature) == M.FEATURE_DIM for r in rows)
    assert all(r.n_bytes > 0 for r in rows)


def test_features_deterministic_and_content_keyed(spark, media):
    a = {r.media_id: tuple(r.feature) for r in M.extract_features(media, fake=True).collect()}
    b = {r.media_id: tuple(r.feature) for r in M.extract_features(media, fake=True).collect()}
    assert a == b
    # distinct payloads → distinct features
    assert len(set(a.values())) == len(a)


def test_features_feed_similarity_operators(spark, media):
    """Decoded features plug straight into the ANN stack (C10)."""
    from pyspark.sql import functions as F

    from kafka_clickhouse_ingest_pipeline_spark.operators import similarity as S

    feats = M.extract_features(media, fake=True).withColumn(
        "vec_id", F.monotonically_increasing_id()
    )
    q = feats.limit(1)
    top = S.brute_force_topk(feats, q, k=3, vec_col="feature", id_col="media_id")
    assert top.count() == 3


def test_frame_sample_plan_explodes_videos_only(spark, media):
    plan = M.frame_sample_plan(media, every_ms=1000)
    rows = plan.collect()
    assert rows, "videos must produce frame tasks"
    assert all(r.media_id.startswith("m") for r in rows)
    # 5000 ms at 1 frame/s → 5 frames per video
    per_video = {}
    for r in rows:
        per_video.setdefault(r.media_id, []).append(r.frame_offset_ms)
    for offsets in per_video.values():
        assert sorted(offsets) == [0, 1000, 2000, 3000, 4000]
    # plan stage is pure metadata: no python eval in the plan
    plan_str = plan._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan_str


def test_bmp_decode_roundtrip_exact_pixels():
    """make_bmp -> _bmp_decode recovers exactly the closed-form block
    means: proves offset/stride/padding/bottom-up parsing on real
    bytes (the image twin of the WAV test)."""
    import math

    import numpy as np

    yy, xx = np.mgrid[0:8, 0:6]
    g = ((7 * 37 + yy * 11 + xx * 5) % 256).astype(np.uint8)
    feat = M._bmp_decode(M.make_bmp(np.stack([g, g, g], axis=-1)))

    v = np.empty(16)
    ys, xs = (np.arange(8) * 4) // 8, (np.arange(6) * 4) // 6
    for by in range(4):
        for bx in range(4):
            blk = g[ys == by][:, xs == bx].astype(np.int64)
            v[by * 4 + bx] = blk.sum() / blk.size
    v = v / 255.0
    acc = 0.0
    for x in v:
        acc += float(x) * float(x)
    assert all(a == b for a, b in zip(feat, v / math.sqrt(acc)))


def test_bmp_decode_top_down_and_junk():
    """Negative height = top-down row order; malformed/unsupported
    payloads yield the zero vector, never an exception."""
    import numpy as np

    yy, xx = np.mgrid[0:8, 0:6]
    g = ((yy * 31 + xx * 7) % 256).astype(np.uint8)
    bmp = M.make_bmp(np.stack([g, g, g], axis=-1))
    off, stride = 54, (6 * 3 + 3) // 4 * 4
    body = bmp[off:]
    rows = [body[i * stride : (i + 1) * stride] for i in range(8)]
    neg = bytearray(bmp[:off]) + b"".join(reversed(rows))
    neg[22:26] = (-8).to_bytes(4, "little", signed=True)
    assert (M._bmp_decode(bytes(neg)) == M._bmp_decode(bmp)).all()

    assert float(abs(M._bmp_decode(b"BM short")).sum()) == 0.0
    assert float(abs(M._bmp_decode(b"\x89PNG" + b"\x00" * 60)).sum()) == 0.0
    # truncated pixel array
    assert float(abs(M._bmp_decode(bmp[: len(bmp) // 2])).sum()) == 0.0


def test_bmp_dispatch_beats_stub_and_pil():
    """BMP-magic payloads always take the stdlib parser — engine-pinned
    values regardless of installed codec libs; fake=False no longer
    raises for BMPs in a codec-less environment."""
    import numpy as np

    yy, xx = np.mgrid[0:8, 0:6]
    g = ((yy * 3 + xx) % 256).astype(np.uint8)
    bmp = M.make_bmp(np.stack([g, g, g], axis=-1))
    auto = M.decode_image(bmp)
    real = M.decode_image(bmp, fake=False)
    assert (auto == real).all()
    assert (real == M._bmp_decode(bmp)).all()
    assert not (real == M._fake_decode(bmp)).all()


def test_image_rows_in_fake_media_decode_for_real(spark, media):
    """make_fake_media image payloads are genuine BMPs: the auto decode
    path (fake=None) produces non-zero, non-stub features via
    mapInPandas."""
    from pyspark.sql import functions as F

    feats = M.extract_features(media.where(F.col("kind") == "image"), fake=None)
    rows = feats.collect()
    assert rows and all(
        abs(sum(x * x for x in r["feature"]) - 1.0) < 1e-5 for r in rows
    )
    stub = {
        r["media_id"]: r["feature"]
        for r in M.extract_features(
            media.where(F.col("kind") == "image"), fake=True
        ).collect()
    }
    assert all(list(r["feature"]) != list(stub[r["media_id"]]) for r in rows)


def test_dhash_invariant_to_brightness_shift():
    """The dedup claim: dHash compares adjacent cells, so a uniform
    brightness shift (re-encode/gamma tweak) keeps the hash — byte
    digests would miss such copies."""
    import numpy as np

    yy, xx = np.mgrid[0:8, 0:6]
    x = 5 * 37 + yy * 11 + xx * 5
    g = ((x * x) % 256).astype(np.int64)
    base = M.make_bmp(np.repeat(g.astype(np.uint8)[:, :, None], 3, axis=2))
    shifted_g = np.clip(g + 10, 0, 255).astype(np.uint8)
    shifted = M.make_bmp(np.repeat(shifted_g[:, :, None], 3, axis=2))
    h0 = M.image_dhash(base)
    assert h0 != 0
    assert M.image_dhash(shifted) == h0
    # a genuinely different image hashes differently
    other_g = (((x + 3) * (x + 7)) % 256).astype(np.uint8)
    other = M.make_bmp(np.repeat(other_g[:, :, None], 3, axis=2))
    assert M.image_dhash(other) != h0


def test_dhash_rejects_small_or_junk_payloads():
    import numpy as np

    assert M.image_dhash(b"not a bmp") == 0
    tiny = M.make_bmp(np.zeros((2, 2, 3), dtype=np.uint8))
    assert M.image_dhash(tiny) == 0  # grid exceeds image -> undecodable


class TestPngCodec:
    """Stdlib PNG decode (round 4): zlib inflate + all five unfilters,
    same feature arithmetic as the BMP kernel."""

    def test_roundtrip_exact_pixels_all_filters(self):
        import numpy as np

        from kafka_clickhouse_ingest_pipeline_spark.operators import (
            multimodal as M,
        )

        rng = np.random.RandomState(3)
        px = rng.randint(0, 256, (10, 7, 3)).astype(np.uint8)
        # filter_mix cycles None/Sub/Up/Average/Paeth across rows
        g = M._png_gray(M.make_png(px, filter_mix=True))
        assert np.array_equal(g, px.astype(np.int64).sum(axis=2) / 3.0)
        g0 = M._png_gray(M.make_png(px, filter_mix=False))
        assert np.array_equal(g0, g)

    def test_png_and_bmp_features_agree_on_same_pixels(self):
        import numpy as np

        from kafka_clickhouse_ingest_pipeline_spark.operators import (
            multimodal as M,
        )

        rng = np.random.RandomState(5)
        px = rng.randint(0, 256, (8, 6, 3)).astype(np.uint8)
        assert np.array_equal(
            M.decode_image(M.make_bmp(px)), M.decode_image(M.make_png(px))
        )

    def test_undecodable_png_falls_through_not_raises(self):
        import numpy as np

        from kafka_clickhouse_ingest_pipeline_spark.operators import (
            multimodal as M,
        )

        whole = M.make_png(np.zeros((8, 6, 3), dtype=np.uint8))
        for bad in (whole[:20], b"\x89PNG\r\n\x1a\njunk"):
            # stdlib parser declines; dispatch falls through to the
            # PIL/stand-in path per the decode_image contract
            assert M._png_gray(bad) is None
            v = M.decode_image(bad)  # must not raise with fake=None auto
            assert v.shape == (M.FEATURE_DIM,)

    def test_interlaced_or_16bit_refused_by_stdlib_path(self):
        import zlib

        import numpy as np

        from kafka_clickhouse_ingest_pipeline_spark.operators import (
            multimodal as M,
        )

        def chunk(t, b):
            crc = zlib.crc32(t + b) & 0xFFFFFFFF
            return len(b).to_bytes(4, "big") + t + b + crc.to_bytes(4, "big")

        # interlace=1: the stdlib parser must decline (-> PIL/stub path)
        ihdr = (6).to_bytes(4, "big") + (8).to_bytes(4, "big") + bytes(
            [8, 2, 0, 0, 1]
        )
        png = (
            M._PNG_MAGIC
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 19 * 8))
            + chunk(b"IEND", b"")
        )
        assert M._png_gray(png) is None


class TestJpegCodec:
    """Baseline JPEG codec (operators/jpeg.py): stdlib+numpy encode and
    entropy-coded decode, no codec libraries."""

    def test_block_constant_roundtrip_exact(self):
        # per-8x8-block constant + quant 1 => DC-only blocks, an exactly
        # invertible corner of the lossy format — the oracle contract
        # behind multimodal_jpeg_pixel_features
        import numpy as np
        from kafka_clickhouse_ingest_pipeline_spark.operators import jpeg as J

        rng = np.random.default_rng(11)
        vals = rng.integers(0, 256, size=(3, 2))
        img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
        out = J.jpeg_gray(J.make_jpeg(img))
        assert out is not None and out.shape == img.shape
        assert np.array_equal(out, img.astype(float))

    def test_arbitrary_gray_roundtrips_within_one_level(self):
        # full AC Huffman path: runs, ZRL, EOB, every magnitude class the
        # noise hits; quant-1 error budget is IDCT rounding only
        import numpy as np
        from kafka_clickhouse_ingest_pipeline_spark.operators import jpeg as J

        rng = np.random.default_rng(12)
        img = rng.integers(0, 256, size=(24, 17)).astype(np.uint8)  # pad path
        out = J.jpeg_gray(J.make_jpeg(img))
        assert out.shape == (24, 17)
        assert np.abs(out - img).max() <= 1.0

    def test_rgb_color_path_within_channel_rounding(self):
        import numpy as np
        from kafka_clickhouse_ingest_pipeline_spark.operators import jpeg as J

        rng = np.random.default_rng(13)
        img = rng.integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
        out = J.jpeg_gray(J.make_jpeg(img))
        gray = img.astype(float).sum(axis=2) / 3.0
        # YCbCr forward/backward + per-channel rounding: <=1 per channel,
        # so <=4/3 on the 3-channel mean, plus quant-1 IDCT rounding
        assert np.abs(out - gray).max() <= 2.5

    def test_undecodable_or_unsupported_returns_none(self):
        import numpy as np
        from kafka_clickhouse_ingest_pipeline_spark.operators import jpeg as J

        img = np.zeros((8, 8), dtype=np.uint8)
        good = J.make_jpeg(img)
        assert J.jpeg_gray(None) is None
        assert J.jpeg_gray(b"") is None
        assert J.jpeg_gray(b"\xff\xd8\xff\xe0junk") is None
        assert J.jpeg_gray(good[:40]) is None  # truncated mid-marker
        # truncation anywhere INSIDE the entropy-coded scan must also
        # refuse (the 1-padding quickly hits an invalid Huffman code or
        # coefficient-run overflow), never return silently-wrong pixels
        import numpy as _np

        big = J.make_jpeg(
            _np.random.default_rng(3).integers(0, 256, (32, 32)).astype(
                _np.uint8
            )
        )
        sos = big.find(b"\xff\xda")
        for cut in (sos + 20, len(big) // 2, len(big) - 10):
            assert J.jpeg_gray(big[:cut]) is None
        # progressive (SOF2) must refuse -> dispatch falls through to PIL
        prog = bytearray(good)
        sof = prog.find(b"\xff\xc0")
        prog[sof + 1] = 0xC2
        assert J.jpeg_gray(bytes(prog)) is None

    def test_decode_image_dispatches_jpeg_before_stub(self):
        # the real decoder must win over the digest stand-in: features of
        # a gray-gradient JPEG match the BMP kernel on the same pixels
        import numpy as np
        from kafka_clickhouse_ingest_pipeline_spark.operators import jpeg as J

        yy, xx = np.mgrid[0:8, 0:8]
        vals = ((yy // 8 * 50 + xx // 8 * 30 + 99) % 256).astype(np.uint8)
        g = np.repeat(np.repeat(vals, 2, axis=0), 2, axis=1)
        jf = M.decode_image(J.make_jpeg(g))
        bf = M.decode_image(M.make_bmp(np.repeat(g[:, :, None], 3, axis=2)))
        assert np.allclose(jf, bf)
        assert float(np.abs(jf).sum()) > 0


def test_dhash_is_invariant_to_serialization_format():
    """The re-encoded-copy claim, directly: one block-constant image
    written as BMP, PNG, and baseline JPEG must produce the SAME dHash
    (all three stdlib decoders land on identical pixels), and a
    different image must not."""
    import numpy as np
    from kafka_clickhouse_ingest_pipeline_spark.operators import jpeg as J

    bi, bj = np.mgrid[0:4, 0:4]
    vals = (11 * 7 + 11 * bi * 13 + bi * 31 + bj * bj * 11 + 11 * bj * 17) % 256
    g = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
    rgb = np.repeat(g[:, :, None], 3, axis=2)
    h_bmp = M.image_dhash(M.make_bmp(rgb), gw=4, gh=4)
    h_png = M.image_dhash(M.make_png(rgb), gw=4, gh=4)
    h_jpg = M.image_dhash(J.make_jpeg(g), gw=4, gh=4)
    assert h_bmp == h_png == h_jpg != 0
    other = np.repeat(
        np.repeat((vals[::-1, ::-1] + 97) % 256, 8, axis=0), 8, axis=1
    ).astype(np.uint8)
    assert M.image_dhash(J.make_jpeg(other), gw=4, gh=4) != h_jpg


def test_feature_extraction_runs_in_flight_on_a_stream(spark, tmp_path):
    """Multimodal decode as a STREAMING stage: the same mapInPandas
    feature kernel runs inside Structured Streaming (decode-in-flight —
    payloads featurized as they arrive, never parked for a batch job),
    and per-row features equal the batch run on identical payloads."""
    import numpy as np
    from kafka_clickhouse_ingest_pipeline_spark.operators import jpeg as J

    rows = []
    for d in range(12):
        vals = (d * 53 + np.add.outer(
            np.arange(2) * 17, np.arange(2) * 29
        )) % 256
        g = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
        payload = (
            M.make_bmp(np.repeat(g[:, :, None], 3, axis=2))
            if d % 2
            else bytes(J.make_jpeg(g))
        )
        rows.append((str(d), "image", bytearray(payload)))
    src = spark.createDataFrame(
        rows, "media_id string, kind string, payload binary"
    )
    src_dir = str(tmp_path / "mediasrc")
    src.repartition(3).write.parquet(src_dir)

    batch = {
        r.media_id: r.feature
        for r in M.extract_features(
            spark.read.parquet(src_dir), fake=False
        ).collect()
    }

    stream = spark.readStream.schema(src.schema).parquet(src_dir)
    out = str(tmp_path / "mediafeat")

    def sink(df, _bid):
        df.write.mode("append").parquet(out)

    q = (
        M.extract_features(stream, fake=False)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "mediackpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r.media_id: r.feature for r in spark.read.parquet(out).collect()
    }
    assert set(streamed) == set(batch)
    for mid, feat in streamed.items():
        assert feat == batch[mid]
        # float32 feature storage: unit norm within fp32 rounding
        assert abs(sum(x * x for x in feat) - 1.0) < 1e-5  # real decode


class TestJpegSamplingAndRestarts:
    """The decoder's generic-sampling and restart paths, driven by real
    bitstreams from the encoder's 4:2:0 and DRI modes."""

    def test_420_subsampled_color_roundtrips(self):
        import numpy as np
        from kafka_clickhouse_ingest_pipeline_spark.operators import jpeg as J

        c = np.full((16, 16, 3), [200, 30, 90], dtype=np.uint8)
        out = J.jpeg_gray(J.make_jpeg(c, subsampling="420"))
        want = c.astype(float).sum(axis=2) / 3.0
        # constant chroma survives subsampling exactly; /3 rounding only
        assert np.abs(out - want).max() <= 0.5

        yy, xx = np.mgrid[0:32, 0:24]
        img = np.stack(
            [(yy * 3) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256], axis=2
        ).astype(np.uint8)
        out2 = J.jpeg_gray(J.make_jpeg(img, subsampling="420"))
        want2 = img.astype(float).sum(axis=2) / 3.0
        assert out2.shape == want2.shape
        # chroma at quarter resolution: smooth gradients stay within a
        # few gray levels after nearest-neighbor upsampling
        assert np.abs(out2 - want2).max() <= 4.0
        # and the stream really is subsampled: smaller than 4:4:4
        assert len(J.make_jpeg(img, subsampling="420")) < len(J.make_jpeg(img))

    def test_restart_markers_roundtrip_and_reset_predictors(self):
        import numpy as np
        from kafka_clickhouse_ingest_pipeline_spark.operators import jpeg as J

        rng = np.random.default_rng(5)
        g = rng.integers(0, 256, size=(40, 40)).astype(np.uint8)
        payload = J.make_jpeg(g, restart_interval=3)
        # DRI marker present, RSTn markers actually emitted
        assert b"\xff\xdd" in payload
        n_rst = sum(
            payload.count(bytes([0xFF, 0xD0 + i])) for i in range(8)
        )
        assert n_rst >= 7  # 25 MCUs, interval 3
        out = J.jpeg_gray(payload)
        assert np.abs(out - g).max() <= 1.0

    def test_no_trailing_rst_when_mcu_count_divides_interval(self):
        """ADVICE r4: when the MCU count is an exact multiple of the
        restart interval, T.81 still places RSTn only BETWEEN intervals —
        a marker after the final MCU would sit between entropy data and
        EOI and strict third-party decoders reject it. 24x24 gray = 9
        MCUs, interval 3 -> exactly 2 markers (after MCU 3 and 6), none
        after MCU 9; the stream still decodes."""
        import numpy as np
        from kafka_clickhouse_ingest_pipeline_spark.operators import jpeg as J

        rng = np.random.default_rng(11)
        g = rng.integers(0, 256, size=(24, 24)).astype(np.uint8)
        payload = J.make_jpeg(g, restart_interval=3)
        # RST0..7 = FF D0..D7; entropy stuffing only ever writes FF 00,
        # so counting marker pairs over the whole stream is exact
        n_rst = sum(payload.count(bytes([0xFF, 0xD0 + i])) for i in range(8))
        assert n_rst == 2  # 9 MCUs / 3 per interval -> 2 interior markers
        # no RSTn directly before EOI
        assert payload[-4:-2] not in {bytes([0xFF, 0xD0 + i]) for i in range(8)}
        out = J.jpeg_gray(payload)
        assert np.abs(out - g).max() <= 1.0
        # 4:2:0 path shares maybe_restart: 32x32 color = 4 MCUs, interval 2
        c = rng.integers(0, 256, size=(32, 32, 3)).astype(np.uint8)
        p420 = J.make_jpeg(c, subsampling="420", restart_interval=2)
        n420 = sum(p420.count(bytes([0xFF, 0xD0 + i])) for i in range(8))
        assert n420 == 1  # after MCU 2 only, not after the final MCU 4

    def test_420_with_restarts_combined(self):
        import numpy as np
        from kafka_clickhouse_ingest_pipeline_spark.operators import jpeg as J

        yy, xx = np.mgrid[0:32, 0:24]
        img = np.stack(
            [(yy * 3) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256], axis=2
        ).astype(np.uint8)
        out = J.jpeg_gray(J.make_jpeg(img, subsampling="420", restart_interval=2))
        want = img.astype(float).sum(axis=2) / 3.0
        assert np.abs(out - want).max() <= 4.0


def test_jpeg_encoder_survives_every_dct_extreme():
    """The adversarial encoder bound: for each of the 64 basis functions,
    the sign-aligned 0/255 block maximizes that coefficient (~1020, just
    under the size-10 Huffman limit). All 64 extremes must encode and
    roundtrip within one gray level — no uint8 image can overflow the
    Annex K tables."""
    import numpy as np
    from kafka_clickhouse_ingest_pipeline_spark.operators import jpeg as J

    T = J._T
    for u in range(8):
        for v in range(8):
            block = np.where(np.outer(T[u], T[v]) >= 0, 255, 0).astype(
                np.uint8
            )
            out = J.jpeg_gray(J.make_jpeg(block))
            assert out is not None
            assert float(np.abs(out - block).max()) <= 1.0


def test_wav_spectral_peak_recovers_the_synthesized_tone(spark, sf_dir):
    """Semantic check on the real decode+DFT chain: each doc synthesizes
    a tone at 10*(1 + doc_id%4) Hz and DFT bin k sits at k*10 Hz, so the
    peak bin must equal 1 + doc_id%4 for EVERY audio doc — a wrong
    decode, factor table, or magnitude fold breaks this immediately."""
    from kafka_clickhouse_ingest_pipeline_spark.queries.multimodal import (
        multimodal_wav_spectral_features,
    )

    rows = multimodal_wav_spectral_features(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.peak_bin == 1 + int(r.media_id) % 4, r
        # and the peak is decisive, not a tie artifact
        others = sorted(
            [r.lm1, r.lm2, r.lm3, r.lm4], reverse=True
        )
        assert others[0] > others[1] + 1.0  # ~e gap in log-magnitude


def test_video_scene_changes_fire_at_scene_boundaries_only(spark, sf_dir):
    """Semantic check on the container-parse + per-frame-decode chain:
    frames within a 3-frame scene are pixel-identical (hamming 0, no
    change) and cuts can only fire at frames 3 and 6. At least half the
    videos must actually detect both cuts — the synthetic scene jump is
    designed to move the hash."""
    from kafka_clickhouse_ingest_pipeline_spark.queries.multimodal import (
        multimodal_video_scene_changes,
    )

    rows = multimodal_video_scene_changes(spark, sf_dir).collect()
    per_vid: dict[str, dict[int, tuple[int, int]]] = {}
    for r in rows:
        per_vid.setdefault(r.media_id, {})[r.frame_idx] = (
            r.hamming_prev,
            r.is_scene_change,
        )
    assert per_vid
    detected_both = 0
    for frames in per_vid.values():
        assert sorted(frames) == list(range(8))
        for f, (ham, chg) in frames.items():
            if f == 0:
                assert ham == -1 and chg == 0
            elif f not in (3, 6):
                assert ham == 0 and chg == 0, (f, ham)  # same scene
            else:
                assert chg == (1 if ham > 4 else 0)
        if frames[3][1] == 1 and frames[6][1] == 1:
            detected_both += 1
    assert detected_both >= len(per_vid) // 2
