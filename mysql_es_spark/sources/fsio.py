"""Filesystem abstraction for observability / snapshot tooling.

The index data path (build, query, CDC) goes through Spark's own
readers/writers and therefore already speaks every Hadoop filesystem.
The *driver-side* tooling — ``index_stats`` byte counts, ``disk_usage``
footer reads, the snapshot repository — used ``os.walk``/``open`` and
silently assumed a local POSIX tree, which breaks the moment an index
lives on object storage (s3a://, hdfs://, gs://). This module routes
those operations through the right backend:

- :class:`LocalFs` — plain ``os`` calls for scheme-less paths (the
  sandbox/test default; zero overhead, no JVM round-trips).
- :class:`HadoopFs` — the Hadoop ``FileSystem`` API via the active
  SparkSession's JVM for any ``scheme://`` path. Byte transfers ride
  py4j's byte[]-return fast path (``IOUtils.toByteArray``), and
  :meth:`HadoopFs.open_seekable` exposes a seekable Python file over
  ``FSDataInputStream`` so pyarrow can read parquet FOOTERS without
  downloading whole files.

All of this is operational tooling off the query/build data path, so
driver-side streaming is the right cost model (what ES's repository
plugins do too — reference parallel: the ES cluster the reference feeds
snapshots to S3 through the same blob-store abstraction).
"""

from __future__ import annotations

import io
import os
import re
import shutil
from collections.abc import Iterator

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*:/")

_CHUNK = 1 << 20


def has_scheme(path: str) -> bool:
    return bool(_SCHEME_RE.match(path))


def fs_for(path: str):
    """The backend for ``path``: LocalFs for plain paths, HadoopFs for
    ``scheme://`` URIs (including ``file:`` — useful to exercise the
    Hadoop code path against local data)."""
    return HadoopFs(path) if has_scheme(path) else LocalFs()


def join(path: str, *parts: str) -> str:
    """Path join that never mangles URI schemes (os.path.join is fine on
    POSIX but normalization elsewhere isn't; keep URI joins explicit)."""
    out = path.rstrip("/")
    for part in parts:
        out = f"{out}/{part.strip('/')}" if part else out
    return out


def absolute(path: str) -> str:
    """Scheme-safe absolutization: ``os.path.abspath`` would mangle a
    ``scheme://`` URI (it treats it as a relative path and prepends the
    cwd); URIs are absolute already and only get their trailing slash
    normalized."""
    return path.rstrip("/") if has_scheme(path) else os.path.abspath(path)


# --- module-level one-shot helpers -----------------------------------------
# Control-plane files (alias pointers, ILM state, merge markers, river
# coordinates) are tiny and read/written from the driver; these dispatch
# per call so a plain path stays pure-`os` (zero JVM round trips) while
# any scheme:// path rides the Hadoop backend.

def exists(path: str) -> bool:
    return fs_for(path).exists(path)


def isdir(path: str) -> bool:
    return fs_for(path).isdir(path)


def isfile(path: str) -> bool:
    fs = fs_for(path)
    return fs.exists(path) and not fs.isdir(path)


def listdir(path: str) -> list[str]:
    return fs_for(path).listdir(path)


def makedirs(path: str) -> None:
    fs_for(path).makedirs(path)


def remove(path: str) -> None:
    fs_for(path).remove(path)


def rmtree(path: str) -> None:
    """Recursive delete, missing-ok, either backend."""
    fs = fs_for(path)
    if isinstance(fs, LocalFs):
        shutil.rmtree(path, ignore_errors=True)
    elif fs.exists(path):
        fs.delete_recursive(path)


def rename(src: str, dst: str) -> None:
    """Directory/file rename (no implicit overwrite), either backend."""
    fs = fs_for(src)
    if isinstance(fs, LocalFs):
        os.rename(src, dst)
    elif not fs.rename(src, dst):
        raise OSError(f"rename failed: {src} -> {dst}")


def read_text(path: str) -> str:
    return fs_for(path).read_all(path).decode("utf-8")


def write_text(path: str, text: str) -> None:
    """Atomic (write-then-rename) text write on either backend."""
    fs_for(path).write_atomic(path, text.encode("utf-8"))


def relpath(path: str, root: str, fs=None) -> str:
    """Relative path of ``path`` under ``root`` for either backend.

    Hadoop status paths come back fully qualified (``file:///x``
    normalizes to ``file:/x``; ``hdfs://`` gains the default port), so a
    raw string-prefix check against the caller's spelling of ``root``
    fails. When either side is schemed, both are first qualified through
    the same FileSystem (``fs.makeQualified``) so the prefix comparison
    sees one canonical form. Pass the backend as ``fs`` to reuse it."""
    if has_scheme(root) or has_scheme(path):
        if fs is None:
            fs = fs_for(root if has_scheme(root) else path)
        if isinstance(fs, HadoopFs):
            path, root = fs.qualify(path), fs.qualify(root)
        r = root.rstrip("/") + "/"
        if not path.startswith(r):
            raise ValueError(f"{path!r} is not under {root!r}")
        return path[len(r):]
    return os.path.relpath(path, root)


class LocalFs:
    """POSIX backend — straight ``os``/``shutil``, no JVM."""

    def qualify(self, p: str) -> str:
        return p

    def exists(self, p: str) -> bool:
        return os.path.exists(p)

    def isdir(self, p: str) -> bool:
        return os.path.isdir(p)

    def getsize(self, p: str) -> int:
        return os.path.getsize(p)

    def listdir(self, p: str) -> list[str]:
        return os.listdir(p)

    def makedirs(self, p: str) -> None:
        os.makedirs(p, exist_ok=True)

    def remove(self, p: str) -> None:
        os.remove(p)

    def rename_replace(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def walk_files(self, root: str) -> Iterator[tuple[str, int]]:
        for r, _dirs, files in os.walk(root):
            for f in files:
                p = os.path.join(r, f)
                yield p, os.path.getsize(p)

    def read_chunks(self, p: str, chunk: int = _CHUNK) -> Iterator[bytes]:
        with open(p, "rb") as f:
            yield from iter(lambda: f.read(chunk), b"")

    def read_all(self, p: str) -> bytes:
        with open(p, "rb") as f:
            return f.read()

    def open_seekable(self, p: str):
        return open(p, "rb")

    def write_atomic(self, p: str, chunks) -> None:
        """Write-then-rename: a crash never leaves a short file at ``p``."""
        if isinstance(chunks, (bytes, bytearray)):
            chunks = [chunks]
        tmp = p + ".tmp"
        with open(tmp, "wb") as f:
            for c in chunks:
                f.write(c)
        os.replace(tmp, p)

    def copy_file(self, src: str, dst: str) -> None:
        tmp = dst + ".tmp"
        shutil.copyfile(src, tmp)
        os.replace(tmp, dst)


class _HdfsSeekable(io.RawIOBase):
    """Seekable read-only Python file over a Hadoop FSDataInputStream —
    enough surface for pyarrow's footer reader (seek/tell/read/size via
    seek-to-end). Byte transfers return as py4j byte[] → Python bytes in
    one protocol message."""

    def __init__(self, jvm, stream, length: int):
        self._jvm = jvm
        self._s = stream
        self._len = int(length)
        self._pos = 0

    def seekable(self) -> bool:
        return True

    def readable(self) -> bool:
        return True

    def seek(self, offset: int, whence: int = 0) -> int:
        if whence == 0:
            self._pos = offset
        elif whence == 1:
            self._pos += offset
        elif whence == 2:
            self._pos = self._len + offset
        else:
            raise ValueError(f"bad whence {whence}")
        self._pos = max(0, min(self._pos, self._len))
        self._s.seek(self._pos)
        return self._pos

    def tell(self) -> int:
        return self._pos

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            n = self._len - self._pos
        n = min(n, self._len - self._pos)
        if n <= 0:
            return b""
        self._s.seek(self._pos)
        data = bytes(
            self._jvm.org.apache.commons.io.IOUtils.toByteArray(self._s, n)
        )
        self._pos += len(data)
        return data

    def close(self) -> None:
        try:
            self._s.close()
        finally:
            super().close()


class HadoopFs:
    """Hadoop FileSystem backend for ``scheme://`` paths, resolved from
    the active SparkSession's JVM + hadoopConfiguration (so credentials,
    endpoints and committers configured for the session apply here too)."""

    def __init__(self, sample_path: str):
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                f"a {sample_path.split(':', 1)[0]}:// path needs an active SparkSession"
            )
        self._jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        uri = self._jvm.java.net.URI(sample_path)
        self._fs = self._jvm.org.apache.hadoop.fs.FileSystem.get(uri, conf)

    def _p(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def qualify(self, p: str) -> str:
        """Canonical fully-qualified form — the spelling listFiles status
        paths use (file:///x → file:/x, default ports filled in)."""
        return self._fs.makeQualified(self._p(p)).toString()

    def exists(self, p: str) -> bool:
        return bool(self._fs.exists(self._p(p)))

    def isdir(self, p: str) -> bool:
        jp = self._p(p)
        return bool(self._fs.exists(jp) and self._fs.getFileStatus(jp).isDirectory())

    def getsize(self, p: str) -> int:
        return int(self._fs.getFileStatus(self._p(p)).getLen())

    def listdir(self, p: str) -> list[str]:
        return [
            st.getPath().getName() for st in self._fs.listStatus(self._p(p))
        ]

    def makedirs(self, p: str) -> None:
        self._fs.mkdirs(self._p(p))

    def remove(self, p: str) -> None:
        self._fs.delete(self._p(p), False)

    def rename_replace(self, src: str, dst: str) -> None:
        jd = self._p(dst)
        if self._fs.exists(jd):
            self._fs.delete(jd, False)
        if not self._fs.rename(self._p(src), jd):
            raise OSError(f"rename failed: {src} -> {dst}")

    def rename(self, src: str, dst: str) -> bool:
        return bool(self._fs.rename(self._p(src), self._p(dst)))

    def delete_recursive(self, p: str) -> None:
        self._fs.delete(self._p(p), True)

    def walk_files(self, root: str) -> Iterator[tuple[str, int]]:
        it = self._fs.listFiles(self._p(root), True)
        while it.hasNext():
            st = it.next()
            yield st.getPath().toString(), int(st.getLen())

    def read_chunks(self, p: str, chunk: int = _CHUNK) -> Iterator[bytes]:
        f = self.open_seekable(p)
        try:
            yield from iter(lambda: f.read(chunk), b"")
        finally:
            f.close()

    def read_all(self, p: str) -> bytes:
        s = self._fs.open(self._p(p))
        try:
            return bytes(self._jvm.org.apache.commons.io.IOUtils.toByteArray(s))
        finally:
            s.close()

    def open_seekable(self, p: str):
        length = self.getsize(p)
        return _HdfsSeekable(self._jvm, self._fs.open(self._p(p)), length)

    def write_atomic(self, p: str, chunks) -> None:
        if isinstance(chunks, (bytes, bytearray)):
            chunks = [chunks]
        tmp = p + ".tmp"
        out = self._fs.create(self._p(tmp), True)
        try:
            for c in chunks:
                out.write(bytes(c))
        finally:
            out.close()
        self.rename_replace(tmp, p)

    def copy_file(self, src: str, dst: str) -> None:
        self.write_atomic(dst, self.read_chunks(src))


def copy_between(src_fs, src: str, dst_fs, dst: str) -> None:
    """Cross-backend copy (e.g. local index → s3a snapshot repo):
    stream chunks through the driver, atomic at the destination."""
    if type(src_fs) is type(dst_fs) is LocalFs:
        src_fs.copy_file(src, dst)
        return
    dst_fs.write_atomic(dst, src_fs.read_chunks(src))
