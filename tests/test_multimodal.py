"""Multimodal (binary image/audio/video column) operators."""

import numpy as np
import pytest

from olx_spark.fixtures.images import decode_image, make_image_corpus, phash64
from olx_spark.operators.multimodal import (
    audio_sample_frames,
    image_features,
    resize_images,
    video_sample_frames,
)


@pytest.fixture(scope="module")
def images_df(spark):
    rows = make_image_corpus(30, seed=21)
    df = spark.createDataFrame(
        [(r["image_id"], r["bytes"], r["fmt"]) for r in rows],
        "image_id string, bytes binary, fmt string",
    )
    return rows, df


def test_image_features_match_ground_truth(spark, images_df):
    rows, df = images_df
    got = {r["image_id"]: r for r in image_features(df).collect()}
    assert len(got) == 30
    for r in rows:
        g = got[r["image_id"]]
        arr = decode_image(r["bytes"], r["fmt"])
        assert g["decode_ok"] == 1
        assert g["w"] == arr.shape[1] and g["h"] == arr.shape[0]
        assert abs(g["mean_r"] - arr[..., 0].mean()) < 1e-6
        assert g["phash"] == phash64(arr)


def test_jpeg_decodes_and_corrupt_bytes_degrade_gracefully(spark):
    """Real baseline JPEG decodes in the distributed scanner with
    ground-truth features; corrupt bytes (a certainty in a 100-TB
    crawl corpus) flag decode_ok=0 instead of failing the job."""
    from olx_spark.fixtures.jpeg import jpeg_decode, jpeg_encode

    arr = np.random.default_rng(9).integers(0, 256, (32, 48, 3)).astype(np.uint8)
    good = jpeg_encode(arr)
    df = spark.createDataFrame(
        [("good", good, "jpeg"), ("bad", b"\xff\xd8\xff\xe0fakejpeg", "jpeg")],
        "image_id string, bytes binary, fmt string",
    )
    got = {r["image_id"]: r for r in image_features(df).collect()}
    dec = jpeg_decode(good)
    assert got["good"]["decode_ok"] == 1
    assert got["good"]["w"] == 48 and got["good"]["h"] == 32
    assert abs(got["good"]["mean_r"] - dec[..., 0].mean()) < 1e-9
    assert got["good"]["phash"] == phash64(dec)
    assert got["bad"]["decode_ok"] == 0
    assert got["bad"]["phash"] is None


def test_unknown_fmt_value_fails_loudly_not_flagged(spark):
    """An unknown fmt VALUE is a schema/config error: it must raise,
    never be silently absorbed as decode_ok=0 (ADVICE r4 — the wide
    except was masking systematic decoder/config bugs)."""
    import pytest

    df = spark.createDataFrame(
        [("x", b"\x00\x01", "bmp")], "image_id string, bytes binary, fmt string"
    )
    with pytest.raises(Exception, match="unknown fmt"):
        image_features(df).collect()


def test_resize_images(spark, images_df):
    rows, df = images_df
    out = {r["image_id"]: r for r in resize_images(df, 16, 16, "raw").collect()}
    for r in rows[:5]:
        g = out[r["image_id"]]
        arr = decode_image(bytes(g["bytes"]), "raw")
        assert arr.shape == (16, 16, 3)
        # nearest-neighbor of the original at sampled coords
        src = decode_image(r["bytes"], r["fmt"])
        ys = (np.arange(16) * src.shape[0] // 16).clip(0, src.shape[0] - 1)
        xs = (np.arange(16) * src.shape[1] // 16).clip(0, src.shape[1] - 1)
        assert np.array_equal(arr, src[np.ix_(ys, xs)])


def test_phash_near_dups_finds_planted_pairs_and_equals_brute_force(spark):
    """Image dedup: the banded phash pairing must equal the numpy
    brute-force pair set (complete recall at the advertised radius)
    and recover a healthy share of the PLANTED near-dup pairs (odd
    index = perturbed copy of its predecessor)."""
    from olx_spark.fixtures.images import (
        decode_image,
        encode_image,
        make_near_dup_image_corpus,
        near_dup_pixels,
        phash64,
    )
    from olx_spark.operators.multimodal import phash_near_dups

    n, seed, max_dist = 64, 11, 6
    rows = make_near_dup_image_corpus(n, seed=seed)
    df = spark.createDataFrame(
        [(r["image_id"], r["bytes"], r["fmt"]) for r in rows],
        "image_id string, bytes binary, fmt string",
    )
    got = {(r["id_a"], r["id_b"], r["dist"]) for r in phash_near_dups(df, max_dist).collect()}

    # independent numpy brute force over decoded pixels
    ph = {}
    for i in range(n):
        fmt, arr = near_dup_pixels(i, seed)
        ph[f"nd-{i:05d}"] = phash64(decode_image(encode_image(arr, fmt), fmt))
    ids = sorted(ph)
    want = set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            d = bin((ph[ids[x]] ^ ph[ids[y]]) & ((1 << 64) - 1)).count("1")
            if d <= max_dist:
                want.add((ids[x], ids[y], d))
    assert got == want
    planted = {(f"nd-{i - 1:05d}", f"nd-{i:05d}") for i in range(1, n, 2)}
    found_planted = {(a, b) for a, b, _ in got} & planted
    assert len(found_planted) >= len(planted) * 0.5, (
        f"only {len(found_planted)}/{len(planted)} planted pairs found"
    )


def test_phash_mega_bucket_guard_on_degenerate_image_corpus(spark, caplog):
    """Hundreds of IDENTICAL (near-constant) images collapse into one
    phash band bucket per band — the 100-TB failure shape for image
    dedup. The guard must drop those buckets (bounded pair-join input:
    no flat-x-flat pair ever materializes), log the drop count, and
    still pair the planted distinct near-dup that lives in small
    buckets."""
    import logging

    from olx_spark.fixtures.images import encode_image, phash64
    from olx_spark.operators.multimodal import phash_near_dups

    base = np.full((32, 32, 3), 128, dtype=np.uint8)
    rows = [(f"flat-{i:04d}", encode_image(base, "raw"), "raw") for i in range(300)]
    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, size=(32, 32, 3)).astype(np.uint8)
    b = a.copy()
    b[:2, :2] ^= 3  # tiny perturbation -> small phash distance
    rows += [("pair-a", encode_image(a, "raw"), "raw"),
             ("pair-b", encode_image(b, "raw"), "raw")]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    d_ab = bin((phash64(a) ^ phash64(b)) & ((1 << 64) - 1)).count("1")
    assert d_ab <= 6, "fixture drifted: planted pair no longer near"
    with caplog.at_level(logging.WARNING, logger="olx_spark.operators.similarity"):
        got = {
            (r["id_a"], r["id_b"], r["dist"])
            for r in phash_near_dups(df, max_dist=6, max_bucket=50).collect()
        }
    assert any("hamming_near_dup_pairs: dropped" in r.message for r in caplog.records)
    assert not any(x.startswith("flat") or y.startswith("flat") for x, y, _ in got)
    assert got == {("pair-a", "pair-b", d_ab)}


def test_avi_container_roundtrip_both_codecs():
    """fixtures/video.py: DIB streams round-trip losslessly; MJPG
    streams round-trip within the T.81 codec's PSNR floor; fps and
    frame count survive the container."""
    import numpy as np

    from olx_spark.fixtures.images import psnr
    from olx_spark.fixtures.video import avi_decode, avi_encode, make_video_pixels

    for i in (0, 1, 2, 3):
        codec, fps, frames = make_video_pixels(i, seed=23)
        out, fps2 = avi_decode(avi_encode(frames, fps=fps, codec=codec))
        assert fps2 == fps and len(out) == len(frames)
        for a, b in zip(frames, out):
            if codec == "dib":
                assert np.array_equal(a, b)
            else:
                assert psnr(a, b) >= 40.0


def test_avi_decode_rejects_garbage():
    from olx_spark.fixtures.video import avi_decode, avi_encode, make_video_pixels

    _, fps, frames = make_video_pixels(0, seed=23)
    good = avi_encode(frames, fps=fps, codec="mjpg")
    for bad in (
        b"",
        b"not a container",
        b"RIFF\x04\x00\x00\x00WAVE",  # right magic, wrong form type
        good[:64],  # truncated mid-header
        # unknown codec: both strh fccHandler and strf biCompression
        good[:4] + good[4:].replace(b"MJPG", b"H264"),
    ):
        with pytest.raises(ValueError):
            avi_decode(bad)


def test_video_features_match_ground_truth_and_flag_garbage(spark):
    """The former ffmpeg stub, un-stubbed: distributed per-clip
    features equal an independent driver-side decode; garbage flags
    decode_ok=0; an unknown fmt VALUE fails loudly."""
    import numpy as np

    from olx_spark.fixtures.video import avi_decode, make_video_corpus
    from olx_spark.operators.multimodal import video_features

    corpus = make_video_corpus(8, seed=23)
    rows = [(r["video_id"], r["bytes"], r["fmt"]) for r in corpus]
    rows += [("garbage", b"\x00\x01 not riff at all", "avi")]
    df = spark.createDataFrame(rows, "video_id string, bytes binary, fmt string")
    got = {r["video_id"]: r for r in video_features(df).collect()}
    assert len(got) == 9
    for r in corpus:
        frames, fps = avi_decode(r["bytes"])
        g = got[r["video_id"]]
        assert g["decode_ok"] == 1
        assert g["fps"] == fps and g["n_frames"] == len(frames)
        assert (g["h"], g["w"]) == frames[0].shape[:2]
        assert abs(g["duration_s"] - len(frames) / fps) < 1e-12
        grays = [
            float((f.astype(np.float64) @ np.array([0.299, 0.587, 0.114])).mean())
            for f in frames
        ]
        assert abs(g["mean_gray"] - float(np.mean(grays))) < 1e-9
    assert got["garbage"]["decode_ok"] == 0 and got["garbage"]["fps"] is None
    with pytest.raises(Exception, match="unknown video fmt"):
        video_features(
            spark.createDataFrame(
                [("x", b"\x00", "mp4")], "video_id string, bytes binary, fmt string"
            )
        ).collect()


def test_video_sample_frames_every_n(spark):
    """Frame sampler: every_n stride + max_frames cap select exactly
    the expected frame indices with driver-equal channel means and
    phash; undecodable clips emit zero rows."""
    from olx_spark.fixtures.images import phash64
    from olx_spark.fixtures.video import avi_decode, make_video_corpus

    corpus = make_video_corpus(4, seed=31)
    rows = [(r["video_id"], r["bytes"], r["fmt"]) for r in corpus]
    rows += [("bad", b"junk", "avi")]
    df = spark.createDataFrame(rows, "video_id string, bytes binary, fmt string")
    out = video_sample_frames(df, every_n=3, max_frames=2).collect()
    assert "bad" not in {r["video_id"] for r in out}
    by_clip: dict = {}
    for r in out:
        by_clip.setdefault(r["video_id"], []).append(r)
    for r in corpus:
        frames, fps = avi_decode(r["bytes"])
        expect = frames[::3][:2]
        got = sorted(by_clip[r["video_id"]], key=lambda x: x["frame_idx"])
        assert [g["frame_idx"] for g in got] == [i * 3 for i in range(len(expect))]
        for g, f in zip(got, expect):
            assert abs(g["t_s"] - g["frame_idx"] / fps) < 1e-12
            assert abs(g["mean_r"] - float(f[..., 0].mean())) < 1e-9
            assert g["phash"] == phash64(f)
    with pytest.raises(ValueError, match="every_n"):
        video_sample_frames(df, every_n=0)


def test_audio_features_match_ground_truth_and_flag_garbage(spark):
    """PCM/WAV scanner (VERDICT r4 #4): distributed features equal an
    independent driver-side decode of the same bytes; garbage and
    non-16-bit payloads flag decode_ok=0, never crash; an unknown fmt
    VALUE fails loudly (schema error)."""
    from olx_spark.fixtures.audio import (
        audio_feature_row,
        make_audio_corpus,
        wav_decode,
    )
    from olx_spark.operators.multimodal import audio_features

    corpus = make_audio_corpus(12, seed=5)
    rows = [(r["audio_id"], r["bytes"], r["fmt"]) for r in corpus]
    rows += [("garbage", b"\x00\x01 definitely not riff", "wav"),
             ("truncated", b"RIFF\x08\x00\x00\x00WAVE", "wav")]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")
    got = {r["audio_id"]: r for r in audio_features(df).collect()}
    assert len(got) == 14
    for r in corpus:
        samples, sr = wav_decode(r["bytes"])
        exp = audio_feature_row(samples, sr)
        g = got[r["audio_id"]]
        assert g["decode_ok"] == 1
        assert g["sr"] == exp["sr"] and g["channels"] == exp["channels"]
        assert g["n_samples"] == exp["n_samples"]
        for k in ("duration_s", "rms", "zcr", "spectral_centroid"):
            assert abs(g[k] - exp[k]) < 1e-12, (r["audio_id"], k)
    for bad in ("garbage", "truncated"):
        assert got[bad]["decode_ok"] == 0 and got[bad]["rms"] is None
    with pytest.raises(Exception, match="unknown audio fmt"):
        audio_features(
            spark.createDataFrame(
                [("x", b"\x00", "mp3")], "audio_id string, bytes binary, fmt string"
            )
        ).collect()


def test_audio_sample_frames_windows(spark):
    """Frame sampler: row count = floor(n/frame) per clip, frame values
    equal the driver-side window computation, undecodable clips emit
    zero rows."""
    import numpy as np

    from olx_spark.fixtures.audio import make_audio_array, wav_encode
    from olx_spark.operators.multimodal import audio_sample_frames

    sr, n = 16000, 16000 // 3
    arr = make_audio_array(np.random.default_rng(3), n, 2)
    df = spark.createDataFrame(
        [("clip", wav_encode(arr, sr), "wav"), ("bad", b"junk", "wav")],
        "audio_id string, bytes binary, fmt string",
    )
    out = audio_sample_frames(df, frame_ms=25).collect()
    frame = sr * 25 // 1000
    assert {r["audio_id"] for r in out} == {"clip"}
    assert len(out) == n // frame
    mono = arr.astype(np.float64).mean(axis=1) / 32768.0
    by_idx = {r["frame_idx"]: r for r in out}
    for i in (0, len(out) - 1):
        w = mono[i * frame:(i + 1) * frame]
        assert abs(by_idx[i]["rms"] - float(np.sqrt((w**2).mean()))) < 1e-12
        signs = np.signbit(w)
        assert abs(by_idx[i]["zcr"] - float((signs[1:] != signs[:-1]).mean())) < 1e-12
        assert abs(by_idx[i]["start_s"] - i * frame / sr) < 1e-12


def test_jpeg_hot_path_guard_modes(spark):
    """VERDICT r4 #5: a jpeg-heavy corpus must not silently run through
    the pure-Python T.81 Huffman coder. jpeg_guard='error' raises at
    the configured row fraction; 'off' opts in explicitly; small
    (sub-floor) oracle corpora never trip."""
    from olx_spark.fixtures.images import encode_image, make_image_array

    rng = np.random.default_rng(2)
    jpg = encode_image(make_image_array(rng, 16, 16), "jpeg")
    bulk = [(f"j{i:04d}", jpg, "jpeg") for i in range(128)]
    # one partition -> one Arrow batch above the 64-row guard floor
    # (the shape a real bulk scan's 10k-row batches always have)
    df = spark.createDataFrame(
        bulk, "image_id string, bytes binary, fmt string"
    ).repartition(1)
    with pytest.raises(Exception, match="pure-Python baseline T.81"):
        image_features(df, jpeg_guard="error").collect()
    got = image_features(df, jpeg_guard="off").collect()
    assert len(got) == 128 and all(r["decode_ok"] == 1 for r in got)
    # sub-floor corpus (the 48-row oracle shape): error mode stays quiet
    small = spark.createDataFrame(
        bulk[:48], "image_id string, bytes binary, fmt string"
    ).repartition(1)
    assert len(image_features(small, jpeg_guard="error").collect()) == 48
    with pytest.raises(ValueError, match="jpeg_guard"):
        image_features(df, jpeg_guard="loud")


# ---------------------------------------------------- image_sharpness ----

def test_sharpness_ground_truth_flat_vs_noise(spark):
    import numpy as np

    from olx_spark.fixtures.images import encode_image
    from olx_spark.operators.multimodal import image_sharpness

    flat = np.full((16, 16, 3), 77, dtype=np.uint8)
    rng = np.random.default_rng(3)
    noisy = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    # checkerboard: maximal Laplacian response
    cb = (np.indices((16, 16)).sum(axis=0) % 2 * 255).astype(np.uint8)
    board = np.stack([cb, cb, cb], axis=-1)
    df = spark.createDataFrame(
        [("flat", encode_image(flat, "png"), "png"),
         ("noisy", encode_image(noisy, "png"), "png"),
         ("board", encode_image(board, "png"), "png")],
        "image_id string, bytes binary, fmt string",
    )
    out = {r.image_id: r for r in image_sharpness(df).collect()}
    assert out["flat"].var_lap == 0.0 and out["flat"].is_blurry == 1
    assert out["flat"].sum_lap == 0 and out["flat"].sum_lap2 == 0
    assert out["noisy"].var_lap > 100.0 and out["noisy"].is_blurry == 0
    assert out["board"].var_lap > out["noisy"].var_lap
    # exact-integer replay of the noisy image
    g = noisy.astype(np.int64).sum(axis=2)
    lap = g[:-2, 1:-1] + g[2:, 1:-1] + g[1:-1, :-2] + g[1:-1, 2:] - 4 * g[1:-1, 1:-1]
    assert out["noisy"].n_lap == lap.size
    assert out["noisy"].sum_lap == int(lap.sum())
    assert out["noisy"].sum_lap2 == int((lap * lap).sum())


def test_sharpness_tiny_and_corrupt(spark):
    import numpy as np

    from olx_spark.fixtures.images import encode_image
    from olx_spark.operators.multimodal import image_sharpness

    tiny = np.full((2, 5, 3), 10, dtype=np.uint8)
    df = spark.createDataFrame(
        [("tiny", encode_image(tiny, "png"), "png"),
         ("bad", b"\x00garbage", "png")],
        "image_id string, bytes binary, fmt string",
    )
    out = {r.image_id: r for r in image_sharpness(df).collect()}
    assert out["tiny"].n_lap == 0 and out["tiny"].is_blurry == 1
    assert out["tiny"].decode_ok == 1
    assert out["bad"].decode_ok == 0 and out["bad"].n_lap == 0
    # unknown fmt is a schema error, not corrupt data: must raise
    import pytest as _pytest

    bad_fmt = spark.createDataFrame(
        [("x", encode_image(tiny, "png"), "webp")],
        "image_id string, bytes binary, fmt string",
    )
    with _pytest.raises(Exception):
        image_sharpness(bad_fmt).collect()


# -------------------------------------------------- image_borders ----

def test_borders_planted_ground_truth(spark):
    import numpy as np

    from olx_spark.fixtures.images import encode_image
    from olx_spark.operators.multimodal import image_borders

    rng = np.random.default_rng(3)
    base = rng.integers(1, 255, size=(60, 40, 3), dtype=np.uint8)
    letter = base.copy(); letter[:10] = 0; letter[-10:] = 0
    pillar = base.copy(); pillar[:, :8] = 255; pillar[:, -8:] = 255
    flat = np.full((60, 40, 3), 7, dtype=np.uint8)
    rows = [
        ("letter", encode_image(letter, "raw"), "raw"),
        ("pillar", encode_image(pillar, "png"), "png"),
        ("flat", encode_image(flat, "raw"), "raw"),
        ("clean", encode_image(base, "png"), "png"),
        ("corrupt", b"\x01\x02", "raw"),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    out = {r.image_id: r for r in image_borders(df).collect()}

    le = out["letter"]
    assert (le.border_top, le.border_bottom) == (10, 10)
    assert le.is_boxed == 1  # 4*20 >= 60
    assert le.content_frac == round(40 * 40 / (40 * 60), 6)

    pi = out["pillar"]
    assert (pi.border_left, pi.border_right) == (8, 8)
    assert pi.is_boxed == 1  # 4*16 >= 40

    fl = out["flat"]
    assert (fl.border_top, fl.border_bottom) == (60, 60)
    assert (fl.border_left, fl.border_right) == (40, 40)
    assert fl.content_frac == 0.0 and fl.is_boxed == 1

    cl = out["clean"]
    assert cl.is_boxed == 0 and cl.decode_ok == 1

    co = out["corrupt"]
    assert co.decode_ok == 0 and co.is_boxed == 0 and co.w == 0


def test_borders_unknown_fmt_raises(spark):
    from olx_spark.operators.multimodal import image_borders

    df = spark.createDataFrame(
        [("x", b"\x00", "webp")], "image_id string, bytes binary, fmt string"
    )
    with pytest.raises(Exception, match="unknown fmt"):
        image_borders(df).collect()


def test_borders_zero_shuffle_plan(spark):
    import numpy as np

    from olx_spark.fixtures.images import encode_image
    from olx_spark.operators.multimodal import image_borders

    arr = np.zeros((8, 8, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [("a", encode_image(arr, "raw"), "raw")],
        "image_id string, bytes binary, fmt string",
    )
    plan = image_borders(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # mapInPandas inherits partitioning


class TestJpegQualityTriage:
    def test_estimator_inverts_encoder_exactly(self):
        import numpy as np

        from olx_spark.fixtures.images import make_image_array
        from olx_spark.fixtures.jpeg import jpeg_encode
        from olx_spark.operators.multimodal import (
            _scan_dqt,
            estimate_jpeg_quality,
        )

        rng = np.random.default_rng(5)
        arr = make_image_array(rng, 24, 24)
        for q in range(5, 101):
            luma, n_tables = _scan_dqt(jpeg_encode(arr, quality=q, step_cap=None))
            assert n_tables == 2
            assert estimate_jpeg_quality(luma) == q, f"quality {q}"

    def test_sixteen_bit_dqt_parsed(self):
        # Pq=1 (16-bit steps) hand-built segment: same table twice-wide
        vals = list(range(1, 65))
        seg = bytes([0x10]) + b"".join(v.to_bytes(2, "big") for v in vals)
        blob = (
            b"\xff\xd8"
            + b"\xff\xdb" + (len(seg) + 2).to_bytes(2, "big") + seg
            + b"\xff\xd9"
        )
        from olx_spark.operators.multimodal import _scan_dqt

        luma, n = _scan_dqt(blob)
        assert n == 1 and luma == vals

    def test_stats_operator_and_garbage(self, spark):
        import numpy as np

        from olx_spark.fixtures.images import make_image_array
        from olx_spark.fixtures.jpeg import jpeg_encode
        from olx_spark.operators.multimodal import jpeg_quality_stats

        rng = np.random.default_rng(6)
        rows = [
            ("a", jpeg_encode(make_image_array(rng, 16, 16), quality=75, step_cap=None)),
            ("b", jpeg_encode(make_image_array(rng, 16, 16), quality=40, step_cap=None)),
            ("junk", b"\xff\xd8\x00nope"),
            ("empty", b""),
        ]
        df = spark.createDataFrame(rows, "image_id string, bytes binary")
        got = {r["image_id"]: r.asDict() for r in jpeg_quality_stats(df).collect()}
        assert got["a"]["q_est"] == 75 and got["a"]["parse_ok"] == 1
        assert got["b"]["q_est"] == 40
        assert got["b"]["luma_sum"] > got["a"]["luma_sum"]  # harsher table
        assert got["junk"]["parse_ok"] == 0 and got["junk"]["q_est"] is None
        assert got["empty"]["parse_ok"] == 0


class TestColorfulness:
    def test_metric_ground_truth(self):
        import numpy as np

        from olx_spark.operators.multimodal import colorfulness_metric

        # pure gray: rg = yb = 0 everywhere -> M exactly 0
        gray = np.full((8, 8, 3), 128, dtype=np.uint8)
        m, br = colorfulness_metric(gray)
        assert m == 0.0 and br == 128.0
        # saturated red/green checkerboard: large opponent variance
        x = np.zeros((8, 8, 3), dtype=np.uint8)
        x[::2, :, 0] = 255   # red rows
        x[1::2, :, 1] = 255  # green rows
        m2, _ = colorfulness_metric(x)
        assert m2 > 100.0
        # mild tint sits between
        tint = np.full((8, 8, 3), 120, dtype=np.uint8)
        tint[..., 0] = 140
        m3, _ = colorfulness_metric(tint)
        assert 0.0 < m3 < m2

    def test_stats_operator(self, spark):
        import numpy as np

        from olx_spark.fixtures.images import encode_image
        from olx_spark.operators.multimodal import colorfulness_stats

        gray = np.full((8, 8, 3), 50, dtype=np.uint8)
        loud = np.zeros((8, 8, 3), dtype=np.uint8)
        loud[..., 0] = 250
        loud[:, ::2, 2] = 240
        rows = [
            ("g", encode_image(gray, "png"), "png"),
            ("c", encode_image(loud, "raw"), "raw"),
            ("junk", b"\x00\x01", "png"),
        ]
        df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
        got = {r["image_id"]: r.asDict() for r in colorfulness_stats(df).collect()}
        assert got["g"]["is_low_color"] == 1 and got["g"]["colorfulness"] == 0.0
        assert got["c"]["is_low_color"] == 0 and got["c"]["colorfulness"] > 50
        assert got["junk"]["decode_ok"] == 0 and got["junk"]["colorfulness"] is None

    def test_unknown_fmt_raises(self, spark):
        from olx_spark.operators.multimodal import colorfulness_stats

        df = spark.createDataFrame(
            [("x", b"abc", "tiff")], "image_id string, bytes binary, fmt string"
        )
        import pytest as _pytest

        with _pytest.raises(Exception, match="unknown fmt"):
            colorfulness_stats(df).collect()


class TestSsimVerify:
    def test_ssim_ground_truth(self):
        import numpy as np

        from olx_spark.operators.multimodal import ssim_global

        rng = np.random.default_rng(2)
        a = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        assert ssim_global(a, a) == 1.0
        # mild noise: high but < 1
        noisy = np.clip(a.astype(int) + rng.integers(-6, 7, a.shape), 0, 255).astype(np.uint8)
        s = ssim_global(a, noisy)
        assert 0.8 < s < 1.0
        # unrelated content: low
        b = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        assert ssim_global(a, b) < 0.5
        import pytest as _pytest
        with _pytest.raises(ValueError, match="shape"):
            ssim_global(a, b[:8])

    def test_verify_confirms_planted_pairs(self, spark):
        from olx_spark.operators.multimodal import ssim_verify_pairs

        import __spark_entry__ as entry

        df = spark.createDataFrame(
            entry._image_corpus_rows("near_dup", 48, 11),
            "image_id string, bytes binary, fmt string",
        )
        got = ssim_verify_pairs(df).collect()
        assert got, "no candidate pairs"
        planted = [
            r for r in got
            if int(r["id_a"][3:]) % 2 == 0
            and int(r["id_b"][3:]) == int(r["id_a"][3:]) + 1
        ]
        assert planted
        # planted perturbed copies verify as the same image
        assert all(r["same_image"] == 1 for r in planted)
        assert all(0.0 <= r["ssim"] <= 1.0 for r in got)


class TestEdgeDensity:
    def test_text_like_beats_photo_like(self, spark):
        import numpy as np

        from olx_spark.fixtures.images import encode_image
        from olx_spark.operators.multimodal import edge_density

        stripes = np.zeros((32, 32, 3), np.uint8)
        stripes[:, ::4] = 255
        smooth = np.tile(
            np.linspace(0, 255, 32, dtype=np.uint8)[None, :, None], (32, 1, 3)
        )
        df = spark.createDataFrame(
            [("text", bytearray(encode_image(stripes, "png")), "png"),
             ("photo", bytearray(encode_image(smooth, "png")), "png"),
             ("bad", bytearray(b"xx"), "png")],
            "image_id string, bytes binary, fmt string",
        )
        got = {r["image_id"]: r for r in edge_density(df).collect()}
        assert got["text"]["edge_frac"] == 0.5
        assert got["photo"]["edge_frac"] == 0.0
        assert got["text"]["mean_grad"] > got["photo"]["mean_grad"]
        assert got["bad"]["decode_ok"] == 0 and got["bad"]["edge_frac"] is None

    def test_matches_driver_computation(self, spark):
        from olx_spark.fixtures.images import decode_image, make_image_corpus
        from olx_spark.operators.multimodal import edge_density, edge_stats_np

        rows = make_image_corpus(12)
        df = spark.createDataFrame(
            [(r["image_id"], bytearray(r["bytes"]), r["fmt"]) for r in rows],
            "image_id string, bytes binary, fmt string",
        )
        got = {r["image_id"]: r for r in edge_density(df).collect()}
        for r in rows:
            ef, mg = edge_stats_np(decode_image(r["bytes"], r["fmt"]))
            assert got[r["image_id"]]["edge_frac"] == ef
            assert got[r["image_id"]]["mean_grad"] == mg
