"""Multimodal plumbing: binary payloads + mapInPandas decode stubs.

Codec libraries aren't installed here, so the fake container formats
exercise the REAL Spark plumbing (binary schema, Arrow batches, UDF
signatures, row expansion) with deterministic pure-Python codecs; an
unknown format must fail loudly with NotImplementedError naming the
missing library.
"""

from __future__ import annotations

import pytest

from news_data_pipeline_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def images(spark):
    rows = [
        (1, mm.fake_image_bytes("a", 8, 4)),
        (2, mm.fake_image_bytes("b", 6, 6)),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_media_manifest_jvm_only(spark, images):
    man = {r["doc_id"]: r for r in mm.media_manifest(images, "doc_id", "payload").collect()}
    assert man[1]["n_bytes"] == 12 + 32
    assert man[1]["media_type"] == "image/x-fake"
    assert len(man[1]["content_hash"]) == 32
    # sniffing real magic bytes too
    png = spark.createDataFrame(
        [(9, b"\x89PNG\r\n\x1a\n....")], "doc_id long, payload binary"
    )
    assert (
        mm.media_manifest(png, "doc_id", "payload").first()["media_type"]
        == "image/png"
    )


def test_decode_images(spark, images):
    out = {r["id"]: r for r in mm.decode_images(images, "doc_id", "payload").collect()}
    assert (out[1]["width"], out[1]["height"]) == (8, 4)
    assert (out[2]["width"], out[2]["height"]) == (6, 6)
    assert 0.0 <= out[1]["mean_pixel"] <= 255.0
    # deterministic: same seed -> same pixel hash
    assert out[1]["pixel_hash"] == {
        r["id"]: r for r in mm.decode_images(images, "doc_id", "payload").collect()
    }[1]["pixel_hash"]


def test_resize_halves_dimensions(spark, images):
    resized = mm.resize_images(images, "doc_id", "payload", scale=2)
    dims = {
        r["id"]: (r["width"], r["height"])
        for r in mm.decode_images(resized, "id", "payload").collect()
    }
    assert dims[1] == (4, 2)
    assert dims[2] == (3, 3)


def test_frame_sampling_explodes_bounded(spark):
    vids = spark.createDataFrame(
        [(7, mm.fake_video_bytes("v", 6, 4, 2))], "vid long, payload binary"
    )
    frames = mm.sample_frames(vids, "vid", "payload", every=2)
    rows = frames.collect()
    assert [r["frame_no"] for r in rows] == [0, 2, 4]
    # sampled frames decode as images downstream
    decoded = mm.decode_images(frames, "id", "payload").collect()
    assert all((r["width"], r["height"]) == (4, 2) for r in decoded)


def test_audio_features(spark):
    clips = spark.createDataFrame(
        [(3, mm.fake_audio_bytes("s", 8000, 16000))], "clip long, payload binary"
    )
    r = mm.audio_features(clips, "clip", "payload").first()
    assert r["sample_rate"] == 8000
    assert r["duration_sec"] == 2.0
    assert 0.0 <= r["mean_amplitude"] <= 255.0


def test_unknown_format_fails_loudly(spark):
    df = spark.createDataFrame(
        [(1, b"\xff\xd8\xff\xe0 jpeg-ish")], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="PIL|NotImplementedError"):
        mm.decode_images(df, "doc_id", "payload").collect()


def test_image_embeddings_feed_similarity_search(spark):
    """Decode -> embed -> ANN end-to-end: near-identical images must be
    nearest neighbors under cosine over the histogram embeddings."""
    from news_data_pipeline_spark.operators import similarity

    rows = [
        (1, mm.fake_image_bytes("seed-a", 16, 16)),
        (2, mm.fake_image_bytes("seed-a", 16, 16)),  # identical content
        (3, mm.fake_image_bytes("zzz-different", 16, 16)),
    ]
    imgs = spark.createDataFrame(rows, "img_id long, payload binary")
    emb = mm.image_embeddings(imgs, "img_id", "payload", dim=8)
    assert dict(emb.dtypes)["embedding"] == "array<double>"
    top = similarity.cosine_topk(
        emb, emb.where("id = 1"), id_col="id", vec_col="embedding", k=1
    ).first()
    assert top["neighbor_id"] == 2
    assert top["cosine_sim"] == 1.0


def test_sniff_real_world_magic_bytes(spark):
    rows = [
        (1, b"\xff\xd8\xff\xe0JFIF...."),   # JFIF jpeg
        (2, b"\xff\xd8\xff\xe1Exif...."),   # EXIF jpeg
        (3, b"RIFF\x00\x00\x00\x00WAVEfmt "),
        (4, b"RIFF\x00\x00\x00\x00WEBPVP8 "),
        (5, b"RIFF\x00\x00\x00\x00AVI LIST"),
        (6, b"RIFF\x00\x00\x00\x00????...."),
        (7, b"\x89PNG\r\n\x1a\n"),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {r["id"]: r["media_type"]
           for r in mm.media_manifest(df, "id", "payload").collect()}
    assert got[1] == got[2] == "image/jpeg"
    assert got[3] == "audio/wav"
    assert got[4] == "image/webp"
    assert got[5] == "video/avi"
    assert got[6] == "application/octet-stream"
    assert got[7] == "image/png"


def test_text_tower_matches_image_tower(spark):
    """The joint-space contract: a text's embedding equals the image
    tower's embedding of that text's rendering — per id, with the
    per-id render geometry both towers share. No payload ever exists
    on the text path."""
    import pandas as pd

    import pyspark.sql.functions as F

    from news_data_pipeline_spark.operators import multimodal as mm
    from news_data_pipeline_spark.operators.fanout import fan_out

    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, ""), (2, "gamma delta epsilon")],
        "doc_id long, text string",
    )

    def build(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        mm.fake_image_bytes(
                            t or "", 4 + int(i) % 8, 4 + int(i) % 4
                        )
                        for i, t in zip(pdf["doc_id"], pdf["text"])
                    ],
                }
            )

    images = fan_out(docs).mapInPandas(
        build, "doc_id long, payload binary"
    )
    img = {
        r.id: r.embedding
        for r in mm.image_embeddings(
            images, "doc_id", "payload", dim=16
        ).collect()
    }
    txt = {
        r.id: r.embedding
        for r in mm.text_embeddings(
            docs.withColumn(
                "w", (F.lit(4) + F.col("doc_id") % 8).cast("int")
            ).withColumn(
                "h", (F.lit(4) + F.col("doc_id") % 4).cast("int")
            ),
            "doc_id",
            "text",
            "w",
            "h",
            dim=16,
        ).collect()
    }
    assert txt == img
    assert all(abs(sum(v) - 1.0) < 1e-4 for v in txt.values())


def test_real_codec_escape_hatch_with_pil(spark):
    """Exercises the PIL arm of ``_decode_image_bytes``
    (multimodal.py) — the real-codec escape hatch behind the FIMG fake
    container. SKIPPED (not absent) where PIL is missing, so the day
    the environment carries it the hatch is tested automatically:
    a real PNG decodes to the same (width, height, grayscale bytes)
    contract the fake container satisfies, both directly and through
    the Arrow-batched Spark path."""
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    from PIL import Image

    img = Image.new("L", (5, 3))
    img.putdata(list(range(15)))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    png = buf.getvalue()

    w, h, px = mm._decode_image_bytes(png)
    assert (w, h) == (5, 3)
    assert px == bytes(range(15))

    df = spark.createDataFrame([(1, png)], "doc_id long, payload binary")
    r = mm.decode_images(df, "doc_id", "payload").first()
    assert (r["width"], r["height"]) == (5, 3)
    assert r["mean_pixel"] == sum(range(15)) / 15.0
