"""Archive ingest: tar / zip corpora → one row per member file.

Document corpora routinely ship as archives (a tarball of .txt/.json
files per shard, a zip per book) — the same opaque-file harvest
surface the reference routes through its parser plugins
(`src/minerva/harvest/plugins.py` / `fileprocessor.py` semantics: a
delivery is a set of files, each handed whole to a format parser).
This module is that parser for tar (+gz/bz2/xz) and zip, both
directions, pure stdlib (``tarfile``/``zipfile``/``io``).

Scale posture — identical to the WARC edge (SCALE.md "Crawl ingest
edge"): ``spark.read.format("binaryFile")`` yields one row per
archive, so each archive is decoded whole inside its owning task.
That is the RIGHT unit: tar has no central directory at all
(members are discovered by streaming) and a compressed tar is one
solid stream, so member-level splits are impossible without an
external index; zip's central directory would allow ranged reads,
but member payloads are small and the archive-per-task layout keeps
zero shuffles and perfect locality.  100 TB of 1 GB shards = 100k
independent tasks.  Size executors for the largest archive, not the
corpus.  The writer mirrors the reader (one archive per group,
written by the owning task) so curated re-export costs one grouping
exchange total.

Member bytes are surfaced raw (``binary``) plus a best-effort utf-8
text twin — the decode split lets downstream pick: text operators
take ``text``, media codecs take ``content``.
"""

from __future__ import annotations

import io
import os
import posixpath
import tarfile
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

ARCHIVE_SCHEMA = (
    "archive string, member string, size bigint, content binary, "
    "text string"
)

#: tar compression suffixes → tarfile mode token
_TAR_MODES = {
    ".tar": "", ".tgz": "gz", ".gz": "gz", ".tbz2": "bz2",
    ".bz2": "bz2", ".txz": "xz", ".xz": "xz",
}


def _kind(path: str) -> str:
    """'zip' | 'tar' | '' (unknown) from the file name."""
    lower = path.lower()
    if lower.endswith(".zip"):
        return "zip"
    root, ext = posixpath.splitext(lower)
    if ext in _TAR_MODES:
        if ext in (".gz", ".bz2", ".xz") and not root.endswith(".tar"):
            return ""  # plain .gz of a non-tar: not an archive
        return "tar"
    return ""


def iter_members(path: str, blob: bytes) -> Iterator[tuple[str, bytes]]:
    """(member_name, member_bytes) for every REGULAR file member of a
    tar/zip blob; directories and special members are skipped.
    Raises ``ValueError`` for unrecognized or corrupt archives."""
    kind = _kind(path)
    if kind == "" and blob[:4] == b"PK\x03\x04":
        kind = "zip"  # extension lies; magic doesn't
    # member-data corruption raises zlib.error (zip deflate) or
    # EOFError/OSError (truncated gzip/bz2/xz), NOT BadZipFile/
    # TarError — all must land in the same ValueError class or
    # read_archives' on_error='skip' cannot skip the dirty archive
    import lzma
    import zlib

    _corrupt = (zlib.error, lzma.LZMAError, EOFError, OSError)
    if kind == "zip":
        try:
            with zipfile.ZipFile(io.BytesIO(blob)) as zf:
                for info in zf.infolist():
                    if info.is_dir():
                        continue
                    yield info.filename, zf.read(info)
        except (zipfile.BadZipFile, *_corrupt) as e:
            raise ValueError(f"corrupt zip archive {path}: {e}") from e
        return
    try:
        with tarfile.open(fileobj=io.BytesIO(blob), mode="r:*") as tf:
            for info in tf:
                if not info.isreg():
                    continue
                f = tf.extractfile(info)
                yield info.name, f.read() if f is not None else b""
    except (tarfile.TarError, *_corrupt) as e:
        raise ValueError(f"not a tar/zip archive {path}: {e}") from e


def read_archives(
    spark: SparkSession,
    path: str,
    members_glob: str | None = None,
    on_error: str = "fail",
) -> DataFrame:
    """Read archive file(s) into the :data:`ARCHIVE_SCHEMA` frame —
    one row per member, one TASK per archive.

    ``members_glob`` filters member names (fnmatch, e.g. ``*.txt``)
    INSIDE the task, before bytes leave it.  ``on_error='skip'``
    drops unreadable archives (dirty-delivery mode)."""
    import fnmatch

    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(str(p))
                try:
                    members = list(iter_members(str(p), bytes(blob)))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                for mname, data in members:
                    if members_glob and not fnmatch.fnmatch(
                        mname, members_glob
                    ):
                        continue
                    try:
                        text = data.decode("utf-8")
                    except UnicodeDecodeError:
                        text = None
                    rows.append((name, mname, len(data), data, text))
            yield pd.DataFrame(
                rows,
                columns=["archive", "member", "size", "content", "text"],
            )

    return files.select("path", "content").mapInPandas(
        parse, ARCHIVE_SCHEMA
    )


def write_archives(
    df: DataFrame,
    out_dir: str,
    archive_col: str = "archive",
    member_col: str = "member",
    content_col: str = "content",
) -> DataFrame:
    """Export (archive, member, content) rows as one archive per
    distinct ``archive_col`` value — ``.zip`` names get a zip,
    anything else a (possibly compressed) tar, inferred from the
    name.  The task owning a group writes its file; returns
    (archive, n_members, n_bytes) per archive written.  Members are
    written in sorted-name order, so plain-tar and zip output bytes
    are deterministic (gzip/bz2/xz containers embed an mtime — their
    CONTENT round-trips deterministically, their bytes do not)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        name = str(pdf[archive_col].iloc[0])
        dest = os.path.join(out_dir, name)
        pdf = pdf.sort_values(member_col, kind="mergesort")
        if _kind(name) == "zip":
            with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
                for r in pdf.itertuples():
                    zf.writestr(getattr(r, member_col),
                                bytes(getattr(r, content_col)))
        else:
            mode = _TAR_MODES.get(
                posixpath.splitext(name.lower())[1], ""
            )
            with tarfile.open(dest, f"w:{mode}") as tf:
                for r in pdf.itertuples():
                    data = bytes(getattr(r, content_col))
                    info = tarfile.TarInfo(getattr(r, member_col))
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
        return pd.DataFrame(
            {
                "archive": [name],
                "n_members": [len(pdf)],
                "n_bytes": [os.path.getsize(dest)],
            }
        )

    return df.groupBy(archive_col).applyInPandas(
        write_group, "archive string, n_members bigint, n_bytes bigint"
    )


def _archive_reader(spark: SparkSession, path: str, config) -> DataFrame:
    glob = (config or {}).get("members_glob") if isinstance(
        config, dict
    ) else None
    return read_archives(spark, path, members_glob=glob)


def register() -> None:
    from minerva_etl_spark.sources.plugins import register_plugin

    register_plugin("tar", _archive_reader)
    register_plugin("zip", _archive_reader)


register()
