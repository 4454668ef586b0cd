"""Snapshot-date resolution over the platform file catalog.

Reference: PlatformsDateResolver (src/utils/checking_s3_data.py:57-144) —
list the S3 bucket, regex-parse `offers_data/<platform>_<YYYYMMDD>.csv`
keys, track max date per platform, then resolve a request of
{platform: 'latest' | 'skip' | 'YYYYMMDD' | None} to concrete dates,
rejecting dates newer than the latest available.

This is control-plane code (runs on the driver, lists a catalog — not a
Spark job; SURVEY §2.1/S7). The listing backend is pluggable: local glob
for tests, S3 listing in production. At warehouse scale the same policy
applies to a partitioned layout (platform=/date=) where `latest` is a
max over partition values and Catalyst prunes the scan.
"""

from __future__ import annotations

import os
import re
from collections.abc import Iterable
from datetime import datetime

KEY_RE = re.compile(r"(?P<platform>[a-z]+)_(?P<date>\d{8})\.csv$")
DATE_FMT = "%Y%m%d"


class ResolutionError(ValueError):
    pass


def parse_catalog(keys: Iterable[str], platforms: Iterable[str]) -> dict[str, list[str]]:
    """Map platform -> sorted snapshot dates from catalog keys
    (checking_s3_data.py:57-92)."""
    dates: dict[str, list[str]] = {p: [] for p in platforms}
    for key in keys:
        m = KEY_RE.search(key)
        if not m:
            continue
        p, d = m.group("platform"), m.group("date")
        if p in dates:
            try:
                datetime.strptime(d, DATE_FMT)
            except ValueError:
                continue
            dates[p].append(d)
    return {p: sorted(v) for p, v in dates.items()}


def list_local_catalog(folder: str, platforms: Iterable[str]) -> dict[str, list[str]]:
    """Local-directory catalog backend (test mode)."""
    try:
        keys = os.listdir(folder)
    except FileNotFoundError:
        keys = []
    return parse_catalog(keys, platforms)


def list_s3_catalog(
    bucket: str,
    prefix: str,
    platforms: Iterable[str],
    client=None,
) -> dict[str, list[str]]:
    """S3 catalog backend (reference checking_s3_data.py:57-92): paginate
    `list_objects_v2` under the snapshot prefix and parse platform/date
    keys. `client` is injectable for tests; defaults to boto3 (which is a
    control-plane dependency only — executors never touch it: the actual
    data reads go through Spark's s3a connector)."""
    if client is None:  # pragma: no cover - needs live credentials
        import boto3

        client = boto3.client("s3")
    keys: list[str] = []
    token: str | None = None
    while True:
        kwargs = {"Bucket": bucket, "Prefix": prefix}
        if token:
            kwargs["ContinuationToken"] = token
        resp = client.list_objects_v2(**kwargs)
        keys.extend(obj["Key"] for obj in resp.get("Contents", []))
        if not resp.get("IsTruncated"):
            break
        token = resp.get("NextContinuationToken")
    return parse_catalog(keys, platforms)


def resolve_dates(
    request: dict[str, str | None], catalog: dict[str, list[str]]
) -> dict[str, str | None]:
    """Resolve {platform: 'latest'|'skip'|'YYYYMMDD'|None} -> concrete dates
    (checking_s3_data.py:94-144). None result == skip that platform.

    - 'latest' / None -> max available date (None if platform has no files)
    - 'skip' -> None
    - explicit date -> validated; a date with no snapshot or newer than the
      latest available raises ResolutionError (reference rejects
      future-dated requests, :136-141).
    """
    resolved: dict[str, str | None] = {}
    for platform, want in request.items():
        if platform not in catalog:
            raise ResolutionError(f"unknown platform: {platform}")
        available = catalog[platform]
        latest = available[-1] if available else None
        if want in (None, "latest"):
            resolved[platform] = latest
        elif want == "skip":
            resolved[platform] = None
        else:
            try:
                datetime.strptime(want, DATE_FMT)
            except ValueError as exc:
                raise ResolutionError(f"bad date {want!r} for {platform}") from exc
            if latest is None or want > latest:
                raise ResolutionError(
                    f"{platform}: requested {want} is newer than latest {latest}"
                )
            if want not in available:
                raise ResolutionError(f"{platform}: no snapshot for {want}")
            resolved[platform] = want
    return resolved
