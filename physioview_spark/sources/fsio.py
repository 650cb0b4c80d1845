"""Driver-side bounded file IO through the Hadoop FileSystem API.

Small metadata probes (file listings, header sniffs, format magic) must
not launch Spark jobs or read whole files: at 100 TB a "read line 1 of
every CSV" implemented as a per-file Spark job pays O(files) scheduler
round trips, and one implemented as a full scan pays O(corpus bytes).
Everything here is a direct FileSystem call — one RPC per listing, one
bounded positioned read per probe — for ANY scheme Spark can read
(file, hdfs, s3a, ...), with a plain ``open()`` fast path for local
files.

``open_seekable`` adapts an ``FSDataInputStream`` to a Python file-like
object (buffered, seekable) so stdlib parsers that need random access —
``zipfile`` reading a central directory from the END of an archive —
can probe remote containers while transferring only the byte ranges
they touch.
"""

from __future__ import annotations

import io
from urllib.parse import unquote, urlparse


def local_path(uri: str) -> str | None:
    """Local filesystem path for ``uri``, or None if it is not local.

    Handles bare paths, ``file:/p``, ``file:///p`` and
    ``file://localhost/p``; a ``file://host/p`` URI with a real
    authority is NOT collapsed to ``/host/p`` (it goes through the
    Hadoop route instead)."""
    parsed = urlparse(uri)
    if parsed.scheme in ("", "file"):
        if parsed.netloc not in ("", "localhost"):
            return None
        return unquote(parsed.path) if parsed.scheme else uri
    return None


def _hadoop_fs(spark, uri: str):
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(uri)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return jvm, fs, jpath


def list_files(spark, path: str | list[str],
               suffix: str | None = None) -> list[str]:
    """Deterministic (sorted) file listing for paths/globs/directories —
    one metadata RPC per path, any scheme. Directories expand one level,
    matching ``spark.read``'s top-level behavior."""
    uris: list[str] = []
    for p in ([path] if isinstance(path, str) else list(path)):
        _, fs, hpath = _hadoop_fs(spark, p)
        matched = fs.globStatus(hpath)
        for st in (list(matched) if matched is not None else []):
            files = (fs.listStatus(st.getPath())
                     if st.isDirectory() else [st])
            uris += [f.getPath().toString() for f in files if f.isFile()]
    if suffix:
        uris = [u for u in uris if u.endswith(suffix)]
    return sorted(set(uris))


def file_length(spark, uri: str) -> int:
    lp = local_path(uri)
    if lp is not None:
        import os

        return os.path.getsize(lp)
    _, fs, jpath = _hadoop_fs(spark, uri)
    return int(fs.getFileStatus(jpath).getLen())


def read_range(spark, uri: str, offset: int, length: int) -> bytes:
    """Read exactly [offset, offset+length) (clamped to EOF)."""
    lp = local_path(uri)
    if lp is not None:
        with open(lp, "rb") as fh:
            fh.seek(offset)
            return fh.read(length)
    jvm, fs, jpath = _hadoop_fs(spark, uri)
    n = max(0, min(length, int(fs.getFileStatus(jpath).getLen()) - offset))
    if n == 0:
        return b""
    stream = fs.open(jpath)
    try:
        stream.seek(offset)
        return bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(stream, n))
    finally:
        stream.close()


def read_head(spark, uri: str, max_bytes: int = 65536) -> bytes:
    """First ``max_bytes`` of a file — the bounded header-sniff read."""
    return read_range(spark, uri, 0, max_bytes)


class _HadoopRaw(io.RawIOBase):
    """Seekable raw stream over a Hadoop ``FSDataInputStream``."""

    def __init__(self, spark, uri: str):
        self._jvm, fs, jpath = _hadoop_fs(spark, uri)
        self._len = int(fs.getFileStatus(jpath).getLen())
        self._stream = fs.open(jpath)
        self._pos = 0

    def readable(self):
        return True

    def seekable(self):
        return True

    def seek(self, pos, whence=io.SEEK_SET):
        if whence == io.SEEK_SET:
            self._pos = pos
        elif whence == io.SEEK_CUR:
            self._pos += pos
        elif whence == io.SEEK_END:
            self._pos = self._len + pos
        else:
            raise ValueError(f"whence: {whence}")
        self._pos = max(0, min(self._pos, self._len))
        return self._pos

    def tell(self):
        return self._pos

    def readinto(self, b):
        n = min(len(b), self._len - self._pos)
        if n <= 0:
            return 0
        self._stream.seek(self._pos)
        data = bytes(
            self._jvm.org.apache.commons.io.IOUtils.toByteArray(
                self._stream, n))
        b[:len(data)] = data
        self._pos += len(data)
        return len(data)

    def close(self):
        if not self.closed:
            self._stream.close()
        super().close()


def open_seekable(spark, uri: str, buffer_size: int = 65536):
    """Buffered, seekable, read-only file object for any scheme.

    Local files use plain ``open``; remote files wrap the Hadoop stream
    with positioned reads, so e.g. ``zipfile.ZipFile`` on a remote
    archive transfers only the central directory and the member bytes
    actually read — never the whole container."""
    lp = local_path(uri)
    if lp is not None:
        return open(lp, "rb")
    return io.BufferedReader(_HadoopRaw(spark, uri), buffer_size)
