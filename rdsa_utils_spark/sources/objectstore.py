"""Object-store file management behind one interface.

Capability parity: the reference ships three parallel helper suites —
S3 (``cdp/helpers/s3_utils.py``, 30 fns), GCS
(``gcp/helpers/gcp_utils.py``, 18 fns), HDFS
(``cdp/helpers/hdfs_utils.py``, 17 fns) — each exposing the same
verbs: validate names, check existence, upload/download, copy, move,
delete (file/folder), list, size, rename, zip. Ours collapses them
into one ``FileSystemClient`` protocol with a local implementation
(tests/CI) and a Hadoop-FS implementation that routes through the
JVM's ``FileSystem`` API, so the SAME verbs work on ``s3a://``,
``gs://``, ``hdfs://`` and ``file://`` URIs — credentials/connector
jars are deployment concerns, not code changes.
"""

from __future__ import annotations

import os
import re
import shutil
import zipfile
from pathlib import Path
from typing import List, Optional

from rdsa_utils_spark.exceptions import InvalidBucketNameError, InvalidS3FilePathError

_BUCKET_RE = re.compile(r"^[a-z0-9][a-z0-9.\-]{1,61}[a-z0-9]$")


def validate_bucket_name(name: str) -> str:
    """S3/GCS bucket-name rules: 3-63 chars, lowercase alnum/.-,
    no leading/trailing dot/dash, no '..', not IP-like."""
    if not _BUCKET_RE.match(name) or ".." in name:
        raise InvalidBucketNameError(f"Invalid bucket name: {name!r}")
    if re.fullmatch(r"(\d+\.){3}\d+", name):
        raise InvalidBucketNameError(f"Bucket name must not look like an IP: {name!r}")
    return name


def remove_leading_slash(path: str) -> str:
    return path.lstrip("/")


def validate_file_path(path: str) -> str:
    """Object key sanity: non-empty, no backslashes, no traversal."""
    if not path or "\\" in path or ".." in path.split("/"):
        raise InvalidS3FilePathError(f"Invalid object path: {path!r}")
    return path


def create_uri(bucket: str, key: str, scheme: str = "s3") -> str:
    """Bucket + key → object-store URI (reference:
    cdp/helpers/s3_utils.py:1984 ``create_s3_uri``; any scheme —
    s3/s3a/gs/hdfs)."""
    return f"{scheme}://{validate_bucket_name(bucket)}/{remove_leading_slash(key)}"


def split_uri(uri: str) -> tuple:
    """Object-store URI → (bucket, key) (reference:
    cdp/helpers/s3_utils.py:2012 ``split_s3_uri``)."""
    rest = uri.split("://", 1)
    if len(rest) != 2 or not rest[1]:
        raise InvalidS3FilePathError(f"Not an object-store URI: {uri!r}")
    bucket, _, key = rest[1].partition("/")
    return bucket, key


class LocalFileSystemClient:
    """Local-FS implementation of the object-store verb set."""

    def file_exists(self, path: str) -> bool:
        return Path(path).is_file()

    def folder_exists(self, path: str) -> bool:
        return Path(path).is_dir()

    def file_size(self, path: str) -> int:
        return Path(path).stat().st_size

    def create_folder(self, path: str) -> None:
        Path(path).mkdir(parents=True, exist_ok=True)

    def copy_file(self, src: str, dst: str, overwrite: bool = False) -> None:
        if Path(dst).exists() and not overwrite:
            raise FileExistsError(dst)
        Path(dst).parent.mkdir(parents=True, exist_ok=True)
        shutil.copy2(src, dst)

    def move_file(self, src: str, dst: str, overwrite: bool = False) -> None:
        # An existing dst directory would make shutil.move nest src
        # INSIDE it rather than replace it — remove any target first.
        if Path(dst).exists():
            if not overwrite:
                raise FileExistsError(dst)
            if Path(dst).is_dir():
                shutil.rmtree(dst)
            else:
                Path(dst).unlink()
        Path(dst).parent.mkdir(parents=True, exist_ok=True)
        shutil.move(src, dst)

    def rename_file(self, src: str, dst: str, overwrite: bool = False) -> None:
        self.move_file(src, dst, overwrite)

    def replace_file(self, src: str, dst: str) -> None:
        """ATOMICALLY swap ``dst`` to ``src`` (``os.replace``): at
        every instant dst is either the old file or the new one —
        the primitive commit protocols (versioned snapshots' manifest
        swap) need, which ``move_file``'s delete-then-move cannot
        give."""
        Path(dst).parent.mkdir(parents=True, exist_ok=True)
        os.replace(src, dst)

    def delete_file(self, path: str) -> None:
        Path(path).unlink()

    def delete_folder(self, path: str) -> None:
        shutil.rmtree(path)

    def list_files(self, path: str, pattern: str = "*") -> List[str]:
        return sorted(str(p) for p in Path(path).glob(pattern) if p.is_file())

    def list_folders(self, path: str) -> List[str]:
        """Immediate subdirectories (reference:
        cdp/helpers/hdfs_utils.py:362 ``read_dir`` directory rows)."""
        return sorted(str(p) for p in Path(path).iterdir() if p.is_dir())

    def walk(self, path: str) -> List[str]:
        return sorted(str(p) for p in Path(path).rglob("*") if p.is_file())

    def read_text(self, path: str) -> str:
        return Path(path).read_text()

    def write_text(self, path: str, text: str, overwrite: bool = True) -> None:
        if Path(path).exists() and not overwrite:
            raise FileExistsError(path)
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_text(text)

    def zip_folder(self, source_dir: str, output_filename: str, overwrite: bool = False) -> bool:
        out = Path(output_filename)
        if out.exists() and not overwrite:
            raise FileExistsError(output_filename)
        src = Path(source_dir)
        if not src.is_dir():
            raise NotADirectoryError(source_dir)
        with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
            for f in sorted(src.rglob("*")):
                if f.is_file():
                    zf.write(f, f.relative_to(src))
        return True

    def get_date_modified(self, path: str):
        """Last-modified time as ``datetime`` (reference:
        cdp/helpers/hdfs_utils.py:304 — `hadoop fs -stat %y`)."""
        from datetime import datetime

        return datetime.fromtimestamp(Path(path).stat().st_mtime)

    def change_permissions(self, path: str, permission: str, recursive: bool = False) -> bool:
        """Octal-string chmod, optionally recursive (reference:
        cdp/helpers/hdfs_utils.py:48 — symbolic modes like 'go+rwx'
        are not supported; pass octal, e.g. '755')."""
        mode = int(permission, 8)
        targets = [Path(path)]
        if recursive:
            targets += list(Path(path).rglob("*"))
        for t in targets:
            t.chmod(mode)
        return True

    def delete_old_files(self, path: str, older_than_days: float, dry_run: bool = False) -> List[str]:
        """Delete files under ``path`` older than N days; returns the
        affected paths (reference: cdp/helpers/s3_utils.py:1601
        ``delete_old_objects_and_folders`` — age strings become a
        day count here; ``dry_run`` lists without deleting)."""
        import time

        cutoff = time.time() - older_than_days * 86400.0
        victims = [p for p in Path(path).rglob("*") if p.is_file() and p.stat().st_mtime < cutoff]
        if not dry_run:
            for p in victims:
                p.unlink()
        return sorted(str(p) for p in victims)


class HadoopFileSystemClient:
    """Same verbs over Hadoop's ``FileSystem`` (s3a/gs/hdfs/file URIs).

    Uses the SparkSession's JVM gateway — the public-adjacent route the
    reference reached via ``hadoop fs`` subprocesses; no extra Python
    SDKs (boto3 / google-cloud-storage) required on executors.
    """

    def __init__(self, spark) -> None:
        self._spark = spark
        self._jvm = spark.sparkContext._jvm
        self._conf = spark.sparkContext._jsc.hadoopConfiguration()

    def _fs(self, path: str):
        uri = self._jvm.java.net.URI.create(path)
        return self._jvm.org.apache.hadoop.fs.FileSystem.get(uri, self._conf)

    def _path(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def file_exists(self, path: str) -> bool:
        fs, p = self._fs(path), self._path(path)
        return bool(fs.exists(p)) and bool(fs.getFileStatus(p).isFile())

    def folder_exists(self, path: str) -> bool:
        """Directory-specific existence (reference:
        cdp/helpers/hdfs_utils.py — `hadoop fs -test -d`)."""
        fs, p = self._fs(path), self._path(path)
        return bool(fs.exists(p)) and bool(fs.getFileStatus(p).isDirectory())

    def file_size(self, path: str) -> int:
        return int(self._fs(path).getFileStatus(self._path(path)).getLen())

    def create_folder(self, path: str) -> None:
        self._fs(path).mkdirs(self._path(path))

    def delete_file(self, path: str) -> None:
        self._fs(path).delete(self._path(path), False)

    def delete_folder(self, path: str) -> None:
        self._fs(path).delete(self._path(path), True)

    def move_file(self, src: str, dst: str, overwrite: bool = False) -> None:
        # Check any existing target (file OR directory): Hadoop's
        # rename silently nests src INSIDE an existing dst directory
        # instead of replacing it, so a dir target must be detected
        # and either rejected or recursively removed first.
        fs, p = self._fs(dst), self._path(dst)
        if bool(fs.exists(p)):
            if not overwrite:
                raise FileExistsError(dst)
            fs.delete(p, True)
        self._fs(src).rename(self._path(src), self._path(dst))

    rename_file = move_file

    def copy_file(self, src: str, dst: str, overwrite: bool = False) -> None:
        util = self._jvm.org.apache.hadoop.fs.FileUtil
        util.copy(
            self._fs(src), self._path(src),
            self._fs(dst), self._path(dst),
            False, bool(overwrite), self._conf,
        )

    def list_files(self, path: str, pattern: Optional[str] = None) -> List[str]:
        fs = self._fs(path)
        statuses = fs.listStatus(self._path(path))
        names = [s.getPath().toString() for s in statuses if s.isFile()]
        if pattern:
            import fnmatch

            names = [n for n in names if fnmatch.fnmatch(n.rsplit("/", 1)[-1], pattern)]
        return sorted(names)

    def list_folders(self, path: str) -> List[str]:
        """Immediate subdirectories (reference:
        cdp/helpers/hdfs_utils.py:362 ``read_dir`` directory rows)."""
        fs = self._fs(path)
        statuses = fs.listStatus(self._path(path))
        return sorted(s.getPath().toString() for s in statuses if s.isDirectory())

    def walk(self, path: str) -> List[str]:
        """All files under ``path``, recursively (reference:
        cdp/helpers/hdfs_utils.py:384 ``read_dir_files_recursive``,
        cdp/helpers/s3_utils.py:217 ``s3_walk``)."""
        it = self._fs(path).listFiles(self._path(path), True)
        names = []
        while it.hasNext():
            names.append(it.next().getPath().toString())
        return sorted(names)

    def read_text(self, path: str) -> str:
        """File contents as a string, streamed through the JVM
        FileSystem (reference: cdp/helpers/s3_utils.py:491
        ``read_string_from_file``)."""
        return bytes(self.read_bytes(path)).decode("utf-8")

    def read_bytes(self, path: str) -> bytes:
        stream = self._fs(path).open(self._path(path))
        try:
            out = self._jvm.java.io.ByteArrayOutputStream()
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, out, 65536, False)
            return bytes(out.toByteArray())
        finally:
            stream.close()

    def write_text(self, path: str, text: str, overwrite: bool = True) -> None:
        """String → file (reference: cdp/helpers/s3_utils.py:539
        ``write_string_to_file``)."""
        self.write_bytes(path, text.encode("utf-8"), overwrite=overwrite)

    def write_bytes(self, path: str, data: bytes, overwrite: bool = True) -> None:
        if not overwrite and self.file_exists(path):
            raise FileExistsError(path)
        stream = self._fs(path).create(self._path(path), True)
        try:
            stream.write(bytearray(data))
        finally:
            stream.close()

    def zip_folder(self, source_dir: str, output_filename: str, overwrite: bool = False) -> bool:
        """Zip every file under ``source_dir`` into a single archive at
        ``output_filename`` on the same (or any) Hadoop FS. The archive
        is STREAMED straight into the output FSDataOutputStream (the
        zip container is never buffered whole); driver memory is
        bounded by the largest single member, which is materialized
        once per file via :meth:`read_bytes`. No executor involvement
        (reference: cdp/helpers/hdfs_utils.py zip flow; mirrors
        LocalFileSystemClient.zip_folder)."""
        import zipfile

        if not overwrite and self.file_exists(output_filename):
            raise FileExistsError(output_filename)
        if not self.folder_exists(source_dir):
            raise NotADirectoryError(source_dir)
        # Normalize the base through the FS so prefix-stripping matches
        # walk()'s URI form (Hadoop renders file:// as file:/).
        norm = self._fs(source_dir).getFileStatus(self._path(source_dir)).getPath().toString()
        base = norm.rstrip("/") + "/"

        class _JvmSink:
            """Unseekable write-only adapter over FSDataOutputStream —
            zipfile detects seekable()=False and emits data
            descriptors, so no rewind is ever needed."""

            def __init__(self, stream):
                self._stream = stream
                self._pos = 0

            def write(self, b):
                if b:
                    self._stream.write(bytearray(b))
                    self._pos += len(b)
                return len(b)

            def tell(self):
                return self._pos

            def flush(self):
                self._stream.flush()

            def seekable(self):
                return False

        out = self._fs(output_filename).create(self._path(output_filename), True)
        try:
            with zipfile.ZipFile(_JvmSink(out), "w", zipfile.ZIP_DEFLATED) as zf:
                for name in self.walk(source_dir):
                    arcname = name.split(base, 1)[1] if base in name else name.rsplit("/", 1)[-1]
                    zf.writestr(arcname, self.read_bytes(name))
        finally:
            out.close()
        return True

    def get_date_modified(self, path: str):
        """Last-modified time as ``datetime`` (reference:
        cdp/helpers/hdfs_utils.py:304)."""
        from datetime import datetime

        millis = self._fs(path).getFileStatus(self._path(path)).getModificationTime()
        return datetime.fromtimestamp(millis / 1000.0)

    def change_permissions(self, path: str, permission: str, recursive: bool = False) -> bool:
        """Octal-string chmod via ``FsPermission`` (reference:
        cdp/helpers/hdfs_utils.py:48)."""
        perm = self._jvm.org.apache.hadoop.fs.permission.FsPermission(
            int(permission, 8),
        )
        fs = self._fs(path)
        targets = [self._path(path)]
        if recursive:
            it = fs.listFiles(self._path(path), True)
            while it.hasNext():
                targets.append(it.next().getPath())
        for t in targets:
            fs.setPermission(t, perm)
        return True

    def delete_old_files(self, path: str, older_than_days: float, dry_run: bool = False) -> List[str]:
        """Age-based cleanup (reference: cdp/helpers/s3_utils.py:1601)."""
        import time

        cutoff_ms = (time.time() - older_than_days * 86400.0) * 1000.0
        fs = self._fs(path)
        victims = []
        it = fs.listFiles(self._path(path), True)
        while it.hasNext():
            status = it.next()
            if status.getModificationTime() < cutoff_ms:
                victims.append(status.getPath())
        names = sorted(p.toString() for p in victims)
        if not dry_run:
            for p in victims:
                fs.delete(p, False)
        return names


# ------------------------------------------------------------- pandas file IO
# Reference parity: the small-data pandas paths of s3_utils
# (load_csv :1215, load_json :1368, write_csv :1450, write_excel :1526)
# — driver-side conveniences for files that never warrant a Spark job.
# They route through a FileSystemClient so the same code covers local,
# S3, GCS and HDFS deployments.


def load_pandas_csv(client, path: str, **read_csv_kwargs):
    """Small CSV → pandas via the client (driver-side; use
    ``readers.load_csv`` for anything that should scale)."""
    import io

    import pandas as pd

    return pd.read_csv(io.StringIO(client.read_text(path)), **read_csv_kwargs)


def load_pandas_json(client, path: str, multi_line: bool = False):
    """JSON document (or NDJSON when ``multi_line``) → dict / pandas."""
    import io
    import json

    import pandas as pd

    text = client.read_text(path)
    if multi_line:
        return pd.read_json(io.StringIO(text), lines=True)
    return json.loads(text)


def write_pandas_csv(client, df, path: str, overwrite: bool = True, **to_csv_kwargs):
    """pandas → CSV text via the client."""
    to_csv_kwargs.setdefault("index", False)
    client.write_text(path, df.to_csv(**to_csv_kwargs), overwrite=overwrite)


def write_pandas_excel(client, df, path: str, overwrite: bool = True, **to_excel_kwargs):
    """pandas → Excel. Requires an Excel engine (openpyxl/xlsxwriter);
    raises ImportError with guidance when absent (not bundled here)."""
    import io

    try:
        buf = io.BytesIO()
        to_excel_kwargs.setdefault("index", False)
        df.to_excel(buf, **to_excel_kwargs)
    except ImportError as exc:  # no engine in this environment
        raise ImportError(
            "write_pandas_excel needs openpyxl or xlsxwriter installed",
        ) from exc
    if not overwrite and client.file_exists(path):
        raise FileExistsError(path)
    Path(path).write_bytes(buf.getvalue())
