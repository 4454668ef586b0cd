"""S3 catalog backend: pagination + key parsing with an injected client."""

from __future__ import annotations

from real_value_etl_spark.sources.resolver import list_s3_catalog, resolve_dates


class FakeS3Client:
    """Two-page listing, mixed valid/invalid keys."""

    def __init__(self):
        self.pages = [
            {
                "Contents": [
                    {"Key": "offers_data/domclick_20241201.csv"},
                    {"Key": "offers_data/domclick_20241214.csv"},
                    {"Key": "offers_data/notes.txt"},
                ],
                "IsTruncated": True,
                "NextContinuationToken": "t1",
            },
            {
                "Contents": [
                    {"Key": "offers_data/yandex_20241208.csv"},
                    {"Key": "offers_data/yandex_99999999.csv"},  # bad date
                    {"Key": "offers_data/unknown_20240101.csv"},  # bad platform
                ],
                "IsTruncated": False,
            },
        ]
        self.calls = []

    def list_objects_v2(self, **kwargs):
        self.calls.append(kwargs)
        return self.pages[len(self.calls) - 1]


def test_s3_catalog_paginates_and_parses():
    client = FakeS3Client()
    cat = list_s3_catalog(
        "bkt", "offers_data/", ["domclick", "yandex", "avito"], client=client
    )
    assert cat == {
        "domclick": ["20241201", "20241214"],
        "yandex": ["20241208"],
        "avito": [],
    }
    assert len(client.calls) == 2
    assert client.calls[1]["ContinuationToken"] == "t1"


def test_s3_catalog_resolution_end_to_end():
    cat = list_s3_catalog(
        "bkt", "offers_data/", ["domclick", "yandex", "avito"],
        client=FakeS3Client(),
    )
    resolved = resolve_dates(
        {"domclick": "latest", "yandex": "20241208", "avito": "latest"}, cat
    )
    assert resolved == {
        "domclick": "20241214",
        "yandex": "20241208",
        "avito": None,  # no snapshots -> skip
    }
