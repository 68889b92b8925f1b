"""Thin wrappers over the Hadoop FileSystem API (the JVM-side
``org.apache.hadoop.fs.FileSystem`` Spark already carries) so state
layers (warehouse snapshots/logs, persisted indexes) manage their
files on ANY supported scheme — ``file:/`` locally, HDFS/S3A/GCS on a
cluster — instead of the driver's local ``os``/``shutil`` module,
which silently binds a component to a single machine's disk.

Semantics notes:
- paths without a scheme resolve against ``fs.defaultFS`` (local
  Spark: ``file:///``), exactly like every DataFrame read/write —
  so the warehouse and the frames it stores always agree on where
  the bytes live.
- ``rename`` is atomic on HDFS and local filesystems (the property
  the compaction protocols rely on); on S3A it is a copy+delete —
  object-store deployments should point state roots at a consistent
  store (HDFS/GCS) or an S3 layout whose readers tolerate the
  rename window, same as every Hadoop-rename-based committer.
- sidecar files (``_MANIFEST``) are written via create(overwrite)
  then read back whole; they are tiny (a JSON list of dir names).
- every operation takes a LOCAL fast path when the resolved scheme is
  the driver's local filesystem: one py4j Hadoop-FS round trip costs
  ~2.8 ms (measured r15) against ~2.5 µs for the ``os`` equivalent,
  and the index lifecycles make dozens-to-hundreds of these calls per
  fold/append (per-cluster staged swaps, manifest probes). Any
  non-local scheme — or a scheme-less path when ``fs.defaultFS`` is
  not ``file:`` — keeps the Hadoop code path unchanged, so cluster
  deployments are unaffected.
"""

from __future__ import annotations

import json
import os as _os
import shutil as _shutil
from urllib.parse import urlparse as _urlparse

# fs.defaultFS per JVM gateway (one py4j read, then cached): decides
# whether a scheme-less path is the driver-local filesystem.
_DEFAULT_FS: dict[int, str] = {}


def _local_path(spark, path: str) -> str | None:
    """The driver-local OS path for ``path``, or None when it lives on
    a non-local filesystem (HDFS/S3A/GCS — or scheme-less with a
    non-local ``fs.defaultFS``)."""
    u = _urlparse(path)
    if u.scheme == "file":
        return u.path
    if u.scheme:
        return None
    key = id(spark._jvm)
    default = _DEFAULT_FS.get(key)
    if default is None:
        default = str(
            spark._jsc.hadoopConfiguration().get("fs.defaultFS", "file:///")
        )
        _DEFAULT_FS[key] = default
    return path if default.startswith("file:") else None


def hadoop_fs(spark, path: str):
    """(FileSystem, Path) for ``path`` — the same helper shape the
    index modules use (operators/similarity.py:_hadoop_fs)."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def join(base: str, *parts: str) -> str:
    """Scheme-safe path join: plain '/' concatenation (os.path.join
    would mangle nothing on posix but reads as local-only; URIs like
    ``file:///root`` must never hit ``os.path``)."""
    out = base.rstrip("/")
    for p in parts:
        out += "/" + p.strip("/")
    return out


def exists(spark, path: str) -> bool:
    lp = _local_path(spark, path)
    if lp is not None:
        return _os.path.exists(lp)
    fs, p = hadoop_fs(spark, path)
    return bool(fs.exists(p))


def mkdirs(spark, path: str) -> None:
    lp = _local_path(spark, path)
    if lp is not None:
        _os.makedirs(lp, exist_ok=True)
        return
    fs, p = hadoop_fs(spark, path)
    fs.mkdirs(p)


def delete(spark, path: str) -> None:
    """Recursive delete; missing paths are a no-op (shutil.rmtree
    ignore_errors analog)."""
    lp = _local_path(spark, path)
    if lp is not None:
        if _os.path.isdir(lp) and not _os.path.islink(lp):
            _shutil.rmtree(lp)
        elif _os.path.lexists(lp):
            _os.remove(lp)
        return
    fs, p = hadoop_fs(spark, path)
    if fs.exists(p):
        fs.delete(p, True)


def rename(spark, src: str, dst: str) -> None:
    """Rename ``src`` to ``dst``, raising on failure.

    ``FileSystem.rename`` reports most failures (dst exists, parent
    missing, S3A copy+delete partial failure) by returning ``false``
    rather than raising — unlike the ``os.rename`` it replaces here.
    Every caller in this repo treats the rename as the commit point of
    a staged-write protocol, where a silently-skipped rename followed
    by source cleanup is unrecoverable data loss, so a ``False`` result
    is always an error.

    Concurrency note: the local fast path is check-then-act (exists
    probe, then ``os.rename``, which silently REPLACES a file created
    in between — the Hadoop path would return false and raise). Every
    call site is serialized by its index/compaction lock, which is
    what makes the window unreachable; a new caller outside a lock
    must not rely on rename-onto-existing failing loudly here."""
    ls, ld = _local_path(spark, src), _local_path(spark, dst)
    if ls is not None and ld is not None and not _os.path.exists(ld):
        # staged-commit shape (dst absent): plain os.rename, which
        # raises on failure. A pre-existing dst falls through to the
        # Hadoop path so its move-into-directory semantics are kept.
        _os.rename(ls, ld)
        return
    fs, s = hadoop_fs(spark, src)
    _, d = hadoop_fs(spark, dst)
    if not bool(fs.rename(s, d)):
        raise IOError(f"rename failed: {src} -> {dst}")


def child_entries(spark, path: str) -> list[tuple[str, bool]]:
    """(name, is_dir) for each direct child of ``path``; [] when the
    directory does not exist (os.listdir raises; callers here always
    want the empty answer)."""
    lp = _local_path(spark, path)
    if lp is not None:
        if not _os.path.isdir(lp):
            return []
        return sorted(
            (e.name, e.is_dir()) for e in _os.scandir(lp)
        )
    fs, p = hadoop_fs(spark, path)
    if not fs.exists(p):
        return []
    return sorted(
        (s.getPath().getName(), bool(s.isDirectory()))
        for s in fs.listStatus(p)
    )


def child_names(spark, path: str) -> list[str]:
    return [n for n, _ in child_entries(spark, path)]


def mtime_ms(spark, path: str) -> int:
    lp = _local_path(spark, path)
    if lp is not None:
        # java File.lastModified() is ms-truncated; match it EXACTLY:
        # st_mtime is a float64 of seconds whose rounding can disagree
        # with integer-nanosecond truncation by 1 ms at the boundary —
        # and warehouse log ordering compares these across both paths
        return _os.stat(lp).st_mtime_ns // 1_000_000
    fs, p = hadoop_fs(spark, path)
    return int(fs.getFileStatus(p).getModificationTime())


def file_size(spark, path: str) -> int:
    """Size in bytes of a single file (0 when missing — sizing
    heuristics want a lower bound, not an exception)."""
    lp = _local_path(spark, path)
    if lp is not None:
        try:
            return _os.stat(lp).st_size
        except OSError:
            return 0
    fs, p = hadoop_fs(spark, path)
    if not fs.exists(p):
        return 0
    return int(fs.getFileStatus(p).getLen())


def any_file_with_suffix(spark, path: str, suffix: str) -> bool:
    """True if any file under ``path`` (recursive) ends with
    ``suffix`` — the os.walk probe for 'does this log hold data'."""
    lp = _local_path(spark, path)
    if lp is not None:
        for root, _dirs, files in _os.walk(lp):
            if any(f.endswith(suffix) for f in files):
                return True
        return False
    fs, p = hadoop_fs(spark, path)
    if not fs.exists(p):
        return False
    it = fs.listFiles(p, True)
    while it.hasNext():
        if it.next().getPath().getName().endswith(suffix):
            return True
    return False


def write_text(spark, path: str, text: str) -> None:
    lp = _local_path(spark, path)
    if lp is not None:
        _os.makedirs(_os.path.dirname(lp), exist_ok=True)
        with open(lp, "w", encoding="utf-8") as f:
            f.write(text)
        return
    fs, p = hadoop_fs(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(spark, path: str) -> str:
    lp = _local_path(spark, path)
    if lp is not None:
        with open(lp, encoding="utf-8") as f:
            return f.read()
    fs, p = hadoop_fs(spark, path)
    stream = fs.open(p)
    try:
        data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return bytes(data).decode("utf-8")


def write_json(spark, path: str, obj) -> None:
    write_text(spark, path, json.dumps(obj))


def read_json(spark, path: str):
    return json.loads(read_text(spark, path))


def read_small_parquet_rows(spark, path: str) -> list:
    """Collect a TINY flat parquet table (index metadata: ``config``,
    ``centroids``, ``codebooks``, ``rotation`` — KB-sized, bounded row
    counts by construction) WITHOUT scheduling a Spark job.

    Every lifecycle operator (append, probe, state read) re-reads a
    few of these tables per call; through ``spark.read.parquet(...)
    .collect()`` each read is a full scheduler round-trip (~50-150 ms
    of driver latency per action, measured r15) for a table that fits
    in one page. Local ``file:``/scheme-less paths are read
    driver-side with pyarrow; any other scheme (HDFS/S3A/GCS) falls
    back to the distributed collect, so cluster deployments keep the
    remote-FS code path. Values are identical either way — both stacks
    decode the same parquet pages to the same Python objects.

    Only for FLAT directories of ``*.parquet`` files (no partition
    subdirectories); returns :class:`pyspark.sql.Row` objects sorted
    the way the caller sorts a ``collect()`` result (i.e. not at all —
    callers keep their own sort keys)."""
    # routed through _local_path (NOT a bare scheme check): a
    # scheme-less path resolves against fs.defaultFS, so on a cluster
    # whose defaultFS is hdfs:// it must take the distributed read —
    # globbing it on the driver's local disk could silently read a
    # same-named local directory instead of the real remote table
    local = _local_path(spark, path)
    if local is None:
        return spark.read.parquet(path).collect()
    import glob
    import os

    files = sorted(glob.glob(os.path.join(local, "*.parquet")))
    if not files:
        # unexpected layout (no suffixed part files): let Spark decide
        return spark.read.parquet(path).collect()
    import pyarrow.parquet as pq
    from pyspark.sql import Row

    rows: list = []
    for f in files:
        rows.extend(Row(**rec) for rec in pq.read_table(f).to_pylist())
    return rows
