"""Object-store client over the local filesystem.

Port of ``MinioS3Client`` (/root/reference/src/S3Client/MinioS3Client.cs:10-190)
and its ``IS3Client`` 6-verb surface: upload, download, list (paginated),
copy, delete (single + bulk), plus idempotent bucket creation
(TrinoIcebergStack.cs:264-277). "Buckets" are directories under a root;
keys are slash-separated object names. The same interface fronts S3/HDFS in
a cluster deployment via fsspec — here the local implementation is enough
because Spark reads/writes the warehouse through ordinary paths.
"""

from __future__ import annotations

import dataclasses
import datetime as dt
import hashlib
import os
import shutil

from .errors import StorageError

__all__ = ["ObjectInfo", "FsClient"]


@dataclasses.dataclass(frozen=True)
class ObjectInfo:
    """S3ObjectInfo equivalent (/root/reference/src/S3Client/Models/S3ObjectInfo.cs:10)."""

    key: str
    size: int
    last_modified: dt.datetime
    etag: str


class FsClient:
    """Bucket-scoped object operations (MinioS3Client.cs:10-190)."""

    def __init__(self, root: str, bucket: str):
        self.root = os.path.abspath(root)
        self.bucket = bucket

    # -- paths -----------------------------------------------------------
    def bucket_dir(self, bucket: str | None = None) -> str:
        return os.path.join(self.root, bucket or self.bucket)

    def _path(self, key: str, bucket: str | None = None) -> str:
        norm = os.path.normpath(key.lstrip("/"))
        if norm.startswith(".."):
            raise StorageError(f"key escapes bucket: {key!r}")
        return os.path.join(self.bucket_dir(bucket), norm)

    def create_bucket(self, bucket: str | None = None) -> None:
        """Idempotent, like ``mc mb -p ... || true`` (TrinoIcebergStack.cs:264-277)."""
        os.makedirs(self.bucket_dir(bucket), exist_ok=True)

    # -- verbs -----------------------------------------------------------
    def upload_file(self, local_path: str, key: str) -> None:
        """MinioS3Client.cs:56-74."""
        if not os.path.isfile(local_path):
            raise StorageError(f"local file not found: {local_path}")
        dest = self._path(key)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        shutil.copyfile(local_path, dest)

    def download_file(self, key: str, local_path: str) -> None:
        """MinioS3Client.cs:77-94 (creates the target directory)."""
        src = self._path(key)
        if not os.path.isfile(src):
            raise StorageError(f"object not found: {self.bucket}/{key}")
        target_dir = os.path.dirname(os.path.abspath(local_path))
        if target_dir:
            os.makedirs(target_dir, exist_ok=True)
        shutil.copyfile(src, local_path)

    def list_files(self, prefix: str = "", bucket: str | None = None) -> list[ObjectInfo]:
        """MinioS3Client.cs:97-130 — full listing under prefix, sorted by key.

        (The reference paginates over a continuation token; a local walk
        needs none, but the result contract — every key under the prefix,
        with size/mtime/etag — is identical.)
        """
        bdir = self.bucket_dir(bucket)
        if not os.path.isdir(bdir):
            return []
        out: list[ObjectInfo] = []
        for dirpath, _dirnames, filenames in os.walk(bdir):
            for fn in filenames:
                full = os.path.join(dirpath, fn)
                key = os.path.relpath(full, bdir).replace(os.sep, "/")
                if prefix and not key.startswith(prefix):
                    continue
                st = os.stat(full)
                with open(full, "rb") as fh:
                    etag = hashlib.md5(fh.read(1024 * 1024)).hexdigest()
                out.append(
                    ObjectInfo(
                        key=key,
                        size=st.st_size,
                        last_modified=dt.datetime.fromtimestamp(st.st_mtime, dt.timezone.utc),
                        etag=etag,
                    )
                )
        out.sort(key=lambda o: o.key)
        return out

    def copy_object(
        self, source_key: str, dest_key: str, dest_bucket: str | None = None
    ) -> None:
        """Server-side copy (MinioS3Client.cs:133-151); cross-bucket supported
        (AthenaClientTests.cs:277-345 exercises cross-bucket UNLOAD)."""
        src = self._path(source_key)
        if not os.path.isfile(src):
            raise StorageError(f"object not found: {self.bucket}/{source_key}")
        dest = self._path(dest_key, bucket=dest_bucket)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        shutil.copyfile(src, dest)

    def delete_object(self, key: str) -> None:
        """MinioS3Client.cs:154-161."""
        path = self._path(key)
        if os.path.isfile(path):
            os.remove(path)

    def delete_objects(self, keys: list[str]) -> None:
        """Bulk delete; no-op on empty list (MinioS3Client.cs:164-181)."""
        for key in keys:
            self.delete_object(key)
