"""Archive transfer to remote object stores (hw_cloud_helper parity).

The reference uploads the benchmark workspace to Huawei cloud S3 via
``moxing`` (``zeus/common/util/hw_cloud_helper.py:51-66``:
``sync_data_to_s3`` / ``sync_data_from_s3``, gated on the ``moxing``
import).  The TPU-native equivalent keeps the same shape — a pair of
``sync_out`` / ``sync_in`` calls gated on whichever object-store client
is importable — but is scheme-pluggable instead of Huawei-only:

* ``file://`` or a bare path → parallel local copy (``shutil`` over a
  thread pool, the ``mox.file.copy_parallel`` analog).
* ``s3://`` / ``obs://`` → ``boto3`` when importable (obs:// is
  S3-compatible), else a clear error.  Never a hard dependency: this
  image has no object-store client and no egress, exactly like running
  the reference outside Huawei cloud, where ``mox is None``.
* ``gs://`` → ``google.cloud.storage`` when importable (the TPU-pod
  deployment target), else a clear error.

New schemes register with :func:`register_scheme`.
"""

from __future__ import annotations

import os
import shutil
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Tuple
from urllib.parse import urlparse

# scheme -> (sync_out(local, url), sync_in(url, local))
_TRANSPORTS: Dict[str, Tuple[Callable, Callable]] = {}


def register_scheme(scheme: str, sync_out: Callable, sync_in: Callable):
    """Register transfer callables for a URL scheme (plugin point)."""
    _TRANSPORTS[scheme] = (sync_out, sync_in)


def _iter_files(root: str):
    if os.path.isfile(root):
        yield root, os.path.basename(root)
        return
    for dirpath, _, names in os.walk(root):
        for n in names:
            full = os.path.join(dirpath, n)
            yield full, os.path.relpath(full, root)


def _local_sync_out(local: str, url: str) -> None:
    dest = urlparse(url).path if url.startswith("file://") else url
    files = list(_iter_files(local))
    with ThreadPoolExecutor(max_workers=8) as pool:
        futures = []
        for src, rel in files:
            out = os.path.join(dest, rel)
            os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
            futures.append(pool.submit(shutil.copy2, src, out))
        for f in futures:
            f.result()   # surface ENOSPC/EACCES etc. — never report a
                         # truncated sync as success


def _local_sync_in(url: str, local: str) -> None:
    src = urlparse(url).path if url.startswith("file://") else url
    _local_sync_out(src, local)


register_scheme("file", _local_sync_out, _local_sync_in)
register_scheme("", _local_sync_out, _local_sync_in)  # bare paths


def _require_boto3():
    try:
        import boto3  # noqa: F401  (not in this image — deployment-only)
        return boto3
    except ImportError as err:
        raise RuntimeError(
            "s3:// archive sync needs boto3 (not installed). Install it in "
            "the deployment image, or pass a file:// / posix destination."
        ) from err


def _safe_dest(local: str, rel: str) -> str:
    """Join an object key's relative path under ``local``, refusing keys
    whose ``..`` components would escape the destination directory (a
    hostile bucket listing must not write outside the sync root)."""
    dest = os.path.realpath(os.path.join(local, rel))
    root = os.path.realpath(local)
    if os.path.commonpath([dest, root]) != root:
        raise ValueError(
            f"object key escapes sync destination: {rel!r}")
    return dest


def _s3_sync_out(local: str, url: str) -> None:
    boto3 = _require_boto3()
    parsed = urlparse(url)
    client = boto3.client("s3")
    prefix = parsed.path.lstrip("/")
    for src, rel in _iter_files(local):
        client.upload_file(src, parsed.netloc, os.path.join(prefix, rel))


def _s3_sync_in(url: str, local: str) -> None:
    boto3 = _require_boto3()
    parsed = urlparse(url)
    client = boto3.client("s3")
    prefix = parsed.path.lstrip("/")
    if prefix and not prefix.endswith("/"):
        prefix += "/"   # 'runs/exp1' must not match sibling 'runs/exp10'
    pages = client.get_paginator("list_objects_v2").paginate(
        Bucket=parsed.netloc, Prefix=prefix)
    for page in pages:
        for obj in page.get("Contents", []):
            rel = os.path.relpath(obj["Key"], prefix)
            dest = _safe_dest(local, rel)
            os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
            client.download_file(parsed.netloc, obj["Key"], dest)


register_scheme("s3", _s3_sync_out, _s3_sync_in)
register_scheme("obs", _s3_sync_out, _s3_sync_in)


def _gs_sync_out(local: str, url: str) -> None:
    try:
        from google.cloud import storage
    except ImportError as err:
        raise RuntimeError(
            "gs:// archive sync needs google-cloud-storage (not installed)."
        ) from err
    parsed = urlparse(url)
    bucket = storage.Client().bucket(parsed.netloc)
    prefix = parsed.path.lstrip("/")
    for src, rel in _iter_files(local):
        bucket.blob(os.path.join(prefix, rel)).upload_from_filename(src)


def _gs_sync_in(url: str, local: str) -> None:
    try:
        from google.cloud import storage
    except ImportError as err:
        raise RuntimeError(
            "gs:// archive sync needs google-cloud-storage (not installed)."
        ) from err
    parsed = urlparse(url)
    bucket = storage.Client().bucket(parsed.netloc)
    prefix = parsed.path.lstrip("/")
    if prefix and not prefix.endswith("/"):
        prefix += "/"   # delimit: don't match sibling prefixes
    for blob in bucket.list_blobs(prefix=prefix):
        rel = os.path.relpath(blob.name, prefix)
        dest = _safe_dest(local, rel)
        os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
        blob.download_to_filename(dest)


register_scheme("gs", _gs_sync_out, _gs_sync_in)


def _transport(url: str):
    scheme = urlparse(url).scheme
    if scheme not in _TRANSPORTS:
        raise ValueError(
            f"no archive transport registered for scheme {scheme!r} "
            f"(known: {sorted(s or '<path>' for s in _TRANSPORTS)})")
    return _TRANSPORTS[scheme]


def sync_out(local_path: str, dest_url: str) -> None:
    """Upload a file or directory tree (``sync_data_to_s3`` parity)."""
    _transport(dest_url)[0](local_path, dest_url)


def sync_in(src_url: str, local_dest: str) -> None:
    """Download a file or directory tree (``sync_data_from_s3`` parity)."""
    _transport(src_url)[1](src_url, local_dest)
