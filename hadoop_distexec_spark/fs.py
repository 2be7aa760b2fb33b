"""Minimal filesystem abstraction for the pipe executor.

The reference operates on *any* Hadoop ``FileSystem`` URI — sources, the
destination, and the log dir are all resolved through
``path.getFileSystem(job)`` (reference DistExec.java:229;
ExecFilesMapper.java:114). Round 1 of this engine walked and wrote with
bare ``os.*``/``open()``, restricting the pipe executor to local/NFS
paths. This module routes every stat/list/open/rename the executor does
through a small interface with three implementations:

- ``LocalFS`` — the ``os``-backed fast path (zero overhead vs round 1);
- ``FsspecFS`` — adapter over ``fsspec`` (hdfs/s3/gcs/...) gated behind an
  import-try: this container has no fsspec, a real cluster would;
- ``MappedFS`` — a scheme-prefixed FS backed by a local directory. It is
  the test stand-in for a remote store here (fsspec's ``memory://`` is
  unavailable): paths look like ``mock://bucket/key`` — bare ``os.*``
  calls on them fail — so a green run under MappedFS proves the executor
  never bypasses the interface.

Instances must be **picklable** (they are captured in executor closures;
Python workers are separate processes even in local mode). ``FsspecFS``
therefore instantiates its backend lazily per-process.

Semantics notes for object stores: ``replace`` is only atomic where the
backend offers rename (local, HDFS). On S3-like stores fsspec implements
mv as copy+delete — the tmp+rename commit then degrades to
read-committed-ish, the same caveat Hadoop's S3A DistCp carries.
"""

from __future__ import annotations

import os
import posixpath
import shutil
import stat as statmod
from dataclasses import dataclass, field
from typing import BinaryIO, Optional
from urllib.parse import urlsplit


@dataclass(frozen=True)
class FileStat:
    size: int
    is_dir: bool
    mtime_epoch: Optional[float]
    is_link: bool = False
    mode: Optional[int] = None  # POSIX permission bits; None where absent


class FileSystem:
    """The operations the executor needs — nothing more."""

    def handles(self, path: str) -> bool:
        """Whether this FS claims ``path``'s URI scheme. ``resolve_fs``
        consults this so an explicitly-passed FS serves only its own
        scheme in mixed-scheme runs (Hadoop's per-path getFileSystem
        dispatch); the base default claims everything, preserving the
        single-FS behavior for custom implementations."""
        return True

    def open(self, path: str, mode: str = "rb", buffering: int = -1) -> BinaryIO:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def stat(self, path: str) -> FileStat:
        raise NotImplementedError

    def listdir(self, path: str) -> list[str]:
        """Full child paths, sorted."""
        raise NotImplementedError

    def mkdirs(self, path: str) -> None:
        raise NotImplementedError

    def remove(self, path: str) -> None:
        raise NotImplementedError

    def rmdir(self, path: str) -> None:
        raise NotImplementedError

    def replace(self, src: str, dst: str) -> None:
        """Rename, clobbering dst (atomic where the backend allows)."""
        raise NotImplementedError

    def rmtree(self, path: str) -> None:
        raise NotImplementedError

    # -- attribute preservation (the -p pass, reference DistCp heritage
    #    DistCp.java:662-712); optional: object stores have no POSIX modes --

    def set_mode(self, path: str, mode: int) -> None:
        raise NotImplementedError(f"{type(self).__name__} cannot set permissions")

    def set_mtime(self, path: str, mtime_epoch: float) -> None:
        raise NotImplementedError(f"{type(self).__name__} cannot set mtimes")

    # -- path algebra (URIs are posix-joined on the path part) --

    def join(self, base: str, *parts: str) -> str:
        return posixpath.join(base, *parts)

    def dirname(self, path: str) -> str:
        return posixpath.dirname(path)

    def normalize(self, path: str) -> str:
        """Absolutize/canonicalize driver-supplied paths."""
        return path


class LocalFS(FileSystem):
    """``os``-backed local/NFS filesystem — the default fast path.

    Accepts both bare paths and ``file://`` URIs (the scheme it claims in
    ``handles``): every operation strips the URI prefix before touching
    ``os.*``, so a -f list mixing ``file://`` lines with bare paths works.
    """

    def handles(self, path: str) -> bool:
        scheme = urlsplit(path).scheme
        return scheme in ("", "file") or len(scheme) == 1  # 1: drive letter

    @staticmethod
    def _p(path: str) -> str:
        """file:// URI -> plain local path (no-op for bare paths)."""
        if not path.startswith("file:"):
            return path
        parts = urlsplit(path)
        if parts.netloc not in ("", "localhost"):
            raise ValueError(f"non-local file URI host {parts.netloc!r}: {path!r}")
        return parts.path or "/"

    def open(self, path, mode="rb", buffering=-1):
        return open(self._p(path), mode, buffering=buffering)

    def exists(self, path):
        return os.path.exists(self._p(path))

    def stat(self, path):
        st = os.stat(self._p(path))
        return FileStat(
            size=int(st.st_size),
            is_dir=statmod.S_ISDIR(st.st_mode),
            mtime_epoch=float(st.st_mtime),
            is_link=os.path.islink(self._p(path)),
            mode=st.st_mode & 0o7777,
        )

    def listdir(self, path):
        p = self._p(path)
        return [os.path.join(p, n) for n in sorted(os.listdir(p))]

    def mkdirs(self, path):
        os.makedirs(self._p(path), exist_ok=True)

    def remove(self, path):
        os.remove(self._p(path))

    def rmdir(self, path):
        os.rmdir(self._p(path))

    def replace(self, src, dst):
        os.replace(self._p(src), self._p(dst))

    def rmtree(self, path):
        shutil.rmtree(self._p(path), ignore_errors=True)

    def set_mode(self, path, mode):
        os.chmod(self._p(path), mode)

    def set_mtime(self, path, mtime_epoch):
        os.utime(self._p(path), (mtime_epoch, mtime_epoch))

    def join(self, base, *parts):
        return os.path.join(base, *parts)

    def dirname(self, path):
        return os.path.dirname(self._p(path))

    def normalize(self, path):
        return os.path.abspath(self._p(path))


@dataclass
class MappedFS(FileSystem):
    """Scheme-prefixed FS over a local root: ``<scheme>://x`` <-> ``<root>/x``.

    Backed by real disk so it works across driver/executor *processes*,
    but its paths are URIs that bare ``os.*`` cannot touch — running the
    pipe suite under it proves every I/O goes through the interface.
    """

    scheme: str
    root: str
    _local: LocalFS = field(default_factory=LocalFS, repr=False)

    def handles(self, path: str) -> bool:
        return urlsplit(path).scheme == self.scheme

    def _to_local(self, path: str) -> str:
        prefix = f"{self.scheme}://"
        if not path.startswith(prefix):
            raise ValueError(f"{path!r} is not a {prefix} path")
        rel = path[len(prefix):].lstrip("/")
        return os.path.join(self.root, rel) if rel else self.root

    def _to_uri(self, local: str) -> str:
        rel = os.path.relpath(local, self.root)
        return f"{self.scheme}://" + ("" if rel == "." else rel.replace(os.sep, "/"))

    def open(self, path, mode="rb", buffering=-1):
        return self._local.open(self._to_local(path), mode, buffering)

    def exists(self, path):
        return self._local.exists(self._to_local(path))

    def stat(self, path):
        return self._local.stat(self._to_local(path))

    def listdir(self, path):
        return [self._to_uri(p) for p in self._local.listdir(self._to_local(path))]

    def mkdirs(self, path):
        self._local.mkdirs(self._to_local(path))

    def remove(self, path):
        self._local.remove(self._to_local(path))

    def rmdir(self, path):
        self._local.rmdir(self._to_local(path))

    def replace(self, src, dst):
        self._local.replace(self._to_local(src), self._to_local(dst))

    def rmtree(self, path):
        self._local.rmtree(self._to_local(path))

    def set_mode(self, path, mode):
        self._local.set_mode(self._to_local(path), mode)

    def set_mtime(self, path, mtime_epoch):
        self._local.set_mtime(self._to_local(path), mtime_epoch)


@dataclass
class FsspecFS(FileSystem):
    """Adapter over ``fsspec`` for hdfs://, s3://, gs://, ... Lazily
    instantiates the backend per-process (fs objects don't pickle)."""

    protocol: str
    options: dict = field(default_factory=dict)

    # Hadoop-side scheme spellings that name the same store family; an
    # FsspecFS('s3', creds) must claim s3a:// paths (s3fs accepts them)
    # instead of losing them to a fabricated credential-less adapter.
    _SCHEME_CANON = {"s3a": "s3", "s3n": "s3", "gcs": "gs", "abfss": "abfs"}

    def handles(self, path: str) -> bool:
        scheme = urlsplit(path).scheme
        canon = self._SCHEME_CANON.get
        return canon(scheme, scheme) == canon(self.protocol, self.protocol)

    def __getstate__(self):
        return {"protocol": self.protocol, "options": self.options}

    def __setstate__(self, state):
        self.protocol = state["protocol"]
        self.options = state["options"]

    def _fs(self):
        cached = getattr(self, "_backend", None)
        if cached is None:
            import fsspec  # gated: absent in this container, present on clusters

            cached = fsspec.filesystem(self.protocol, **self.options)
            object.__setattr__(self, "_backend", cached)
        return cached

    def open(self, path, mode="rb", buffering=-1):
        return self._fs().open(path, mode)

    def exists(self, path):
        return self._fs().exists(path)

    def stat(self, path):
        info = self._fs().info(path)
        mtime = info.get("mtime")
        if hasattr(mtime, "timestamp"):
            mtime = mtime.timestamp()
        return FileStat(
            size=int(info.get("size") or 0),
            is_dir=info.get("type") == "directory",
            mtime_epoch=float(mtime) if mtime is not None else None,
            is_link=False,
        )

    def listdir(self, path):
        fs = self._fs()
        proto = f"{self.protocol}://"
        out = []
        for p in sorted(fs.ls(path, detail=False)):
            out.append(p if p.startswith(proto) else proto + p.lstrip("/"))
        return out

    def mkdirs(self, path):
        self._fs().makedirs(path, exist_ok=True)

    def remove(self, path):
        self._fs().rm_file(path)

    def rmdir(self, path):
        self._fs().rmdir(path)

    def replace(self, src, dst):
        fs = self._fs()
        if fs.exists(dst):
            fs.rm_file(dst)
        fs.mv(src, dst)

    def rmtree(self, path):
        try:
            self._fs().rm(path, recursive=True)
        except FileNotFoundError:
            pass


def executor_mutation_safe(spark, fs: FileSystem) -> bool:
    """True when executor-side mutations (mkdir/remove) through ``fs`` hit
    the same store the driver sees: always for remote filesystems, and for
    LocalFS only under a local[*] master — on a real cluster executor-local
    ``os.*`` writes would target worker disks (ADVICE r01 #5). Callers fall
    back to driver-side application when this is False."""
    if not isinstance(fs, LocalFS):
        return True
    return spark.sparkContext.master.startswith("local")


def resolve_fs(path: str, fs: FileSystem | None = None) -> FileSystem:
    """FS for ``path``: an explicit ``fs`` wins for the schemes it claims
    (``FileSystem.handles``); otherwise no scheme (or file://) is local and
    any other scheme goes to fsspec. Mirrors the reference's per-path
    ``path.getFileSystem(conf)`` dispatch (DistExec.java:229) — in a
    mixed-scheme run (e.g. a -f list of file:// and mock:// lines with an
    explicit MappedFS) each path reaches the store that owns it.

    For a *remote* scheme the explicit fs does not claim, the explicit fs
    still wins: fabricating a fresh ``FsspecFS(scheme)`` here would drop
    the caller's credentials/endpoint options on the floor and fail late
    (or hit the wrong endpoint) — better to hand the path to the supplied
    backend and fail loudly if it truly cannot serve it."""
    if fs is not None and fs.handles(path):
        return fs
    scheme = urlsplit(path).scheme
    if scheme in ("", "file") or len(scheme) == 1:  # len==1: windows drive letter
        return LocalFS()
    return fs if fs is not None else FsspecFS(scheme)
