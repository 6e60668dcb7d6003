"""Bronze sources: JSON landing-dir ingestion (the at-scale path)."""

from __future__ import annotations

import json

from news_data_pipeline_spark.sources import rest


def test_ingest_json_landing(spark, tmp_path):
    # Two landed API-response files, as a fetch-and-land worker would write.
    articles = [
        {
            "source": {"name": "BBC"},
            "author": "alice",
            "title": "t1",
            "description": "d",
            "url": "https://bbc.com/1",
            "urlToImage": None,
            "publishedAt": "2024-03-01T08:00:00",
            "content": "c1",
        },
        {
            "source": {"name": "CNN"},
            "author": None,
            "title": "t2",
            "description": None,
            "url": "https://cnn.com/2",
            "urlToImage": None,
            "publishedAt": "2024-03-01T09:00:00",
            "content": "c2",
        },
    ]
    for i, art in enumerate(articles):
        (tmp_path / f"page_{i}.json").write_text(json.dumps(art))

    bronze = rest.ingest_json_landing(
        spark, str(tmp_path), country="us", ingestion_time="2024-03-01 10:00:00"
    )
    rows = {r["url"]: r for r in bronze.collect()}
    assert len(rows) == 2
    # declared schema enforced (not inferred): nested struct + cast
    assert rows["https://bbc.com/1"]["source"]["name"] == "BBC"
    assert bronze.schema["publishedAt"].dataType.typeName() == "timestamp"
    assert all(r["country"] == "us" for r in rows.values())
    # fields absent from a landed file arrive as nulls, not errors
    (tmp_path / "page_sparse.json").write_text(json.dumps({"url": "https://x.com/3"}))
    sparse = rest.ingest_json_landing(
        spark, str(tmp_path), country="us", ingestion_time="2024-03-01 10:00:00"
    )
    assert sparse.count() == 3
    assert sparse.where("url = 'https://x.com/3'").first()["title"] is None
