"""Era-file discovery + range planning (SURVEY §2.A6-A8).

Discovery is driver-side metadata work (listing a few 10^5 names), so it
stays plain Python; the heavy lifting (download/read) happens in tasks via
the s3a/http Hadoop filesystems when given remote URIs.

The reference's three discovery modes (remote_downloader.py:135-437) are
reproduced with *injectable* clients so every loop runs under test:

* ``discover_s3`` — ListObjectsV2 pagination, 1000 keys/page with
  continuation tokens (the reference's fast path: 2000 files ~2s).
* ``discover_http`` — HTML directory-listing scrape.
* ``probe_http_eras`` — parallel HEAD probing fallback for servers with
  no listing (reference ``_discover_parallel``/``_url_exists``), with
  the open-ended early-stop after consecutive empty batches.

Only the default client constructors touch boto3/requests (absent in
this environment); pass any object with the same call shape.
"""

from __future__ import annotations

import concurrent.futures
import glob as _glob
import os
import re
from typing import Callable

from era_parser_spark.config.networks import parse_era_filename

ERA_RANGE = re.compile(r"^(\d+)(?:-(\d+)|(\+))?$")
S3_PAGE_KEYS = 1000  # reference remote_downloader.py:155 max-keys
PROBE_BATCH = 100  # reference remote_downloader.py:307
PROBE_WORKERS = 20  # reference remote_downloader.py:376
EMPTY_BATCHES_STOP = 3  # reference remote_downloader.py:321-324


def parse_era_range(spec: str) -> tuple[int, int | None]:
    """Reference grammar (commands/remote.py:159-183): '1082' -> one era,
    '1082-1100' -> inclusive range, '1082+' -> open-ended."""
    m = ERA_RANGE.match(spec.strip())
    if not m:
        raise ValueError(f"bad era range {spec!r}; expected N, N-M or N+")
    start = int(m.group(1))
    if m.group(2) is not None:
        end = int(m.group(2))
        if end < start:
            raise ValueError(f"era range end before start: {spec}")
        return start, end
    if m.group(3) is not None:
        return start, None
    return start, start


def discover_local(base_dir: str, network: str | None = None) -> list[tuple[int, str]]:
    """(era_number, path) from a local directory, sorted by era (A6)."""
    out = []
    for path in _glob.glob(os.path.join(base_dir, "*.era")):
        meta = parse_era_filename(path)
        if meta is None:
            continue
        if network and meta["network"] != network:
            continue
        out.append((meta["era_number"], path))
    return sorted(out)


def filter_era_range(
    found: list[tuple[int, str]], spec: str | None
) -> list[tuple[int, str]]:
    if spec is None:
        return found
    start, end = parse_era_range(spec)
    return [(e, p) for e, p in found if e >= start and (end is None or e <= end)]


def _default_s3_client():
    try:
        import boto3  # type: ignore
    except ImportError as exc:  # pragma: no cover - boto3 absent here
        raise NotImplementedError(
            "S3 discovery needs boto3 (not in this environment) or an "
            "injected client; or pass s3a:// paths straight to "
            "read_era_blocks (the Hadoop s3a filesystem lists and reads)"
        ) from exc
    return boto3.client("s3")  # pragma: no cover


def discover_s3(
    bucket: str,
    prefix: str,
    network: str,
    client=None,
    page_keys: int = S3_PAGE_KEYS,
) -> list[tuple[int, str]]:
    """A7: bulk ListObjectsV2 with continuation-token pagination.

    ``client`` needs one method, boto3-shaped:
    ``list_objects_v2(Bucket=, Prefix=, MaxKeys=, ContinuationToken=?) ->
    {"Contents": [{"Key": ...}], "IsTruncated": bool,
    "NextContinuationToken": str?}``.
    """
    if client is None:
        client = _default_s3_client()
    out: list[tuple[int, str]] = []
    token: str | None = None
    while True:
        kw = {"Bucket": bucket, "Prefix": prefix, "MaxKeys": page_keys}
        if token:
            kw["ContinuationToken"] = token
        page = client.list_objects_v2(**kw)
        for obj in page.get("Contents", []):
            meta = parse_era_filename(obj["Key"])
            if meta and meta["network"] == network:
                out.append((meta["era_number"], f"s3a://{bucket}/{obj['Key']}"))
        if not page.get("IsTruncated"):
            return sorted(out)
        token = page.get("NextContinuationToken")


def _default_http_get() -> Callable[[str], str]:
    # stdlib urllib: no optional dependency for the reference's primary
    # public source (an https file server)
    import urllib.request

    def _get(url: str) -> str:
        with urllib.request.urlopen(url, timeout=30) as resp:
            return resp.read().decode("utf-8", "replace")

    return _get


def discover_http(
    base_url: str,
    network: str,
    http_get: Callable[[str], str] | None = None,
) -> list[tuple[int, str]]:
    """A7 fallback: HTML directory-listing scrape.

    ``http_get(url) -> body`` (raises on HTTP errors)."""
    if http_get is None:
        http_get = _default_http_get()
    body = http_get(base_url)
    out = []
    for name in re.findall(r'href="([^"]+\.era)"', body):
        meta = parse_era_filename(name)
        if meta and meta["network"] == network:
            out.append((meta["era_number"], base_url.rstrip("/") + "/" + name))
    return sorted(out)


def _default_http_head() -> Callable[[str], bool]:
    import urllib.request

    def _head(url: str) -> bool:
        try:
            req = urllib.request.Request(url, method="HEAD")
            with urllib.request.urlopen(req, timeout=5) as resp:
                return 200 <= resp.status < 300
        except Exception:
            return False

    return _head


def probe_http_eras(
    base_url: str,
    network: str,
    start_era: int,
    end_era: int | None,
    http_head: Callable[[str], bool] | None = None,
    max_workers: int = PROBE_WORKERS,
    batch_size: int = PROBE_BATCH,
    open_end_limit: int = 10_000,
) -> list[tuple[int, str]]:
    """A7 last resort: parallel HEAD probing for servers with no listing
    (reference _discover_parallel, remote_downloader.py:295-327).

    Probes ``{base_url}/{network}-{era:05d}.era`` in batches; an
    open-ended range stops after EMPTY_BATCHES_STOP consecutive batches
    with no hits. ``http_head(url) -> exists`` is injectable.
    """
    if http_head is None:
        http_head = _default_http_head()
    base = base_url.rstrip("/")
    last = end_era if end_era is not None else start_era + open_end_limit
    found: list[tuple[int, str]] = []
    empty_run = 0
    for batch_start in range(start_era, last + 1, batch_size):
        batch = range(batch_start, min(batch_start + batch_size, last + 1))
        urls = {era: f"{base}/{network}-{era:05d}.era" for era in batch}
        hits = 0
        with concurrent.futures.ThreadPoolExecutor(max_workers=max_workers) as pool:
            for era, ok in zip(urls, pool.map(http_head, urls.values())):
                if ok:
                    found.append((era, urls[era]))
                    hits += 1
        if end_era is None:
            empty_run = empty_run + 1 if hits == 0 else 0
            if empty_run >= EMPTY_BATCHES_STOP:
                break
    return sorted(found)


def discover_auto(
    source: str,
    network: str,
    s3_client=None,
    http_get: Callable[[str], str] | None = None,
) -> list[tuple[int, str]]:
    """Scheme-dispatching discovery: one entry point for the reference's
    `--remote` flow and local dirs alike.

    * ``s3://bucket/prefix`` -> ListObjectsV2 (returns s3a:// paths for
      the Hadoop reader)
    * ``http(s)://...`` -> HTML listing scrape (urllib; era bytes are then
      fetched task-side by the kernel)
    * anything else -> local directory glob
    """
    if source.startswith("s3://"):
        bucket, _, prefix = source[len("s3://"):].partition("/")
        return discover_s3(bucket, prefix, network, client=s3_client)
    if source.startswith(("http://", "https://")):
        return discover_http(source, network, http_get=http_get)
    return discover_local(source, network)
