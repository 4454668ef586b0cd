"""Versioned parquet table: snapshot isolation, time travel, rollback.

The reference's refresh model is TRUNCATE + full re-insert (reference
src/etl/loading.py:49-60): one bad run destroys the previous state with
no way back. The lakehouse answer is a manifest-pointer table format —
data files are immutable; each commit writes the NEW files plus a tiny
JSON manifest listing every file in the new snapshot, and readers resolve
a manifest, never a directory listing. This module is that mechanism in
its minimal honest form (single writer, local/HDFS rename atomicity;
object-store deployments swap the pointer in a catalog instead):

- `commit_append` / `commit_overwrite` — stage parquet via a normal
  distributed write, move files into `data/`, publish manifest vN+1
  (os.replace = atomic; a crash before publish leaves orphan files, never
  a corrupt table);
- `read_snapshot(..., version=k)` — time travel to any retained version;
- `rollback` — a NEW commit whose file list is an old version's (history
  is append-only; nothing is rewritten);
- `vacuum` — delete data files unreferenced by any retained manifest.

Readers of version k are isolated from concurrent commits: their file
list is frozen in the manifest, and files are never mutated in place.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "_manifests")


def versions(path: str) -> list[int]:
    ms = glob.glob(os.path.join(_manifest_dir(path), "v*.json"))
    return sorted(int(os.path.basename(m)[1:-5]) for m in ms)


def _read_manifest(path: str, version: int) -> dict:
    with open(os.path.join(_manifest_dir(path), f"v{version}.json")) as f:
        return json.load(f)


def _publish(path: str, manifest: dict) -> int:
    os.makedirs(_manifest_dir(path), exist_ok=True)
    v = (versions(path) or [0])[-1] + 1
    manifest["version"] = v
    tmp = os.path.join(_manifest_dir(path), f".v{v}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(_manifest_dir(path), f"v{v}.json"))
    return v


def _stage_files(df: DataFrame, path: str) -> list[str]:
    """Distributed write to a staging dir, then move the parts into
    data/ under a fresh commit id. Files are immutable once moved."""
    commit = uuid.uuid4().hex[:12]
    stage = os.path.join(path, f"_stage_{commit}")
    df.write.mode("overwrite").parquet(stage)
    data = os.path.join(path, "data")
    os.makedirs(data, exist_ok=True)
    names = []
    for i, part in enumerate(sorted(glob.glob(os.path.join(stage, "*.parquet")))):
        name = f"{commit}-{i:05d}.parquet"
        os.replace(part, os.path.join(data, name))
        names.append(name)
    shutil.rmtree(stage, ignore_errors=True)
    return names


def commit_append(df: DataFrame, path: str) -> int:
    prev = versions(path)
    files = _read_manifest(path, prev[-1])["files"] if prev else []
    new = _stage_files(df, path)
    return _publish(
        path,
        {"op": "append", "files": files + new, "schema": df.schema.json()},
    )


def commit_overwrite(df: DataFrame, path: str) -> int:
    new = _stage_files(df, path)
    return _publish(
        path, {"op": "overwrite", "files": new, "schema": df.schema.json()}
    )


def rollback(path: str, to_version: int) -> int:
    m = _read_manifest(path, to_version)
    return _publish(
        path,
        {"op": "rollback", "files": m["files"], "schema": m["schema"],
         "restores": to_version},
    )


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    vs = versions(path)
    if not vs:
        raise FileNotFoundError(f"no snapshots at {path}")
    m = _read_manifest(path, version if version is not None else vs[-1])
    if not m["files"]:
        schema = StructType.fromJson(json.loads(m["schema"]))
        return spark.createDataFrame([], schema)
    return spark.read.parquet(
        *[os.path.join(path, "data", f) for f in m["files"]]
    )


def vacuum(path: str, keep_last: int = 2) -> list[str]:
    """Drop manifests older than the last `keep_last` and delete data
    files no retained manifest references. Returns deleted file names."""
    vs = versions(path)
    kept, dropped = vs[-keep_last:], vs[:-keep_last]
    live: set[str] = set()
    for v in kept:
        live.update(_read_manifest(path, v)["files"])
    for v in dropped:
        os.remove(os.path.join(_manifest_dir(path), f"v{v}.json"))
    deleted = []
    for f in glob.glob(os.path.join(path, "data", "*.parquet")):
        if os.path.basename(f) not in live:
            os.remove(f)
            deleted.append(os.path.basename(f))
    return deleted
