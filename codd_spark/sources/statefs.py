"""Filesystem adapters for the persistent dedup state store.

``_BucketedMinhashState`` (operators/dedup.py) keeps restart-surviving
MinHash state as bucketed parquet tables plus a tiny JSON manifest whose
commit IS the durability point. Until round 8 the manifest/sweep
protocol was hard-wired to POSIX (``os.replace`` commit, ``os.listdir``
discovery, ``shutil.rmtree`` sweeps), which rejected every ``hdfs://``
or object-store URI — a deployment blocker for a 100 TB crawl pipeline
whose dedup state cannot live on one box. This module is the documented
extension point made real: two small adapters behind one interface.

- :class:`PosixStateFS` — the local fast path, byte-for-byte the r8
  behavior (same ``manifest.json``, same atomic-rename commit). Existing
  state dirs keep working with zero migration.
- :class:`HadoopStateFS` — routes every metadata operation through the
  JVM's ``org.apache.hadoop.fs.FileSystem`` resolved from the session's
  Hadoop configuration, so any HCFS scheme Spark itself can read
  (``hdfs://``, ``viewfs://``, ``s3a://`` with the connector on the
  classpath, ...) works for the state dir too. The manifest commit uses
  a WRITE-ONCE VERSIONED protocol instead of rename-onto: object stores
  do not give atomic rename-over-existing (S3 rename is copy+delete),
  but creating a NEW key is atomic everywhere — so commit N writes
  ``manifest-v{N}.json.tmp``, renames it to the never-before-used name
  ``manifest-v{N}.json`` (a rename to a fresh destination; its worst
  crash outcome is a stray tmp, never a torn current manifest), and
  readers take the highest version that parses. Older versions are
  swept best-effort, keeping a small tail as a debugging trail.

Single-writer contract unchanged: neither backend adds coordination;
two concurrent writers corrupt the generation protocol on any
filesystem. Reference behavior parity: the reference engine has no
persistent dedup state at all — this store is part of the LLM-pipeline
extension surface (SURVEY.md §2 extensions).
"""

from __future__ import annotations

import json
import os
import re
import shutil

_MANIFEST_V_RE = re.compile(r"^manifest-v(\d{1,20})\.json$")
_MANIFEST_KEEP_TAIL = 3  # committed versions kept behind the head
_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*)://")


def resolve_statefs(spark, state_dir: str):
    """Pick the backend for ``state_dir``: plain paths and ``file://``
    URIs get :class:`PosixStateFS` (identical behavior and on-disk
    format to r8); every other scheme gets :class:`HadoopStateFS`
    resolved from the session's Hadoop configuration. Unknown schemes
    fail here with Hadoop's own "No FileSystem for scheme" error rather
    than subtly later."""
    m = _SCHEME_RE.match(state_dir)
    if m is None or m.group(1).lower() == "file":
        d = state_dir[len(m.group(0)) :] if m else state_dir
        if m and not d.startswith("/"):
            raise ValueError(
                f"file:// state_dir must be an absolute local path "
                f"(file:///abs/path), got authority/relative form {d!r}"
            )
        return PosixStateFS(os.path.abspath(d))
    return HadoopStateFS(spark, state_dir)


class PosixStateFS:
    """Local-disk backend: POSIX rename-atomic ``manifest.json`` commit,
    ``os``/``shutil`` metadata ops. Identical on-disk format to r8."""

    scheme = "file"

    def __init__(self, state_dir: str):
        # state_dir arrives already scheme-stripped and absolute
        self.state_dir = state_dir
        self._manifest_path = os.path.join(state_dir, "manifest.json")

    # -- manifest ---------------------------------------------------------
    def manifest_exists(self) -> bool:
        return os.path.exists(self._manifest_path)

    def read_manifest(self) -> dict:
        with open(self._manifest_path) as f:
            return json.load(f)

    def commit_manifest(self, m: dict) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._manifest_path)

    # -- sidecar binary blobs ----------------------------------------------
    def write_bytes(self, path: str, data: bytes) -> None:
        with open(path, "wb") as f:
            f.write(data)

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    # -- metadata ops -----------------------------------------------------
    def mkdirs(self) -> None:
        os.makedirs(self.state_dir, exist_ok=True)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        """Child names of ``path``; [] when it does not exist."""
        if not os.path.isdir(path):
            return []
        return os.listdir(path)

    def delete_recursive(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def join(self, *parts: str) -> str:
        return os.path.join(*parts)

    def table_location(self, sub: str) -> str:
        """Path to interpolate into CREATE TABLE ... LOCATION."""
        return f"{self.state_dir}/{sub}"


class HadoopStateFS:
    """HCFS backend: all metadata ops via the JVM Hadoop ``FileSystem``
    for the state dir's URI, resolved against the live session's Hadoop
    configuration (so ``spark.hadoop.*`` connector settings apply).

    Manifest durability: write-once versioned files (module docstring).
    A crash between the tmp write and its rename leaves a stray
    ``*.tmp`` that the next open sweeps; a crash after the rename has
    already committed. No operation ever rewrites an existing manifest
    version, so a reader can never observe a torn manifest even on
    stores without atomic rename."""

    def __init__(self, spark, state_dir: str):
        self.spark = spark
        self.state_dir = state_dir.rstrip("/")
        jvm = spark._jvm
        self._jPath = jvm.org.apache.hadoop.fs.Path
        self._jvm = jvm
        try:
            self._fs = jvm.org.apache.hadoop.fs.FileSystem.get(
                jvm.java.net.URI(self.state_dir),
                spark._jsc.hadoopConfiguration(),
            )
        except Exception as e:
            raise ValueError(
                f"state_dir {self.state_dir!r}: the JVM cannot resolve a "
                "Hadoop FileSystem for this scheme — the scheme's "
                "connector must be on Spark's classpath and configured "
                "(e.g. hadoop-aws + fs.s3a.* for s3a://). Original "
                f"error: {e}"
            ) from e
        self.scheme = self._fs.getUri().getScheme()

    # -- raw helpers ------------------------------------------------------
    def _read_text(self, path: str) -> str:
        ins = self._fs.open(self._jPath(path))
        bos = self._jvm.java.io.ByteArrayOutputStream()
        # copyBytes closes the input stream (4th arg True)
        self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(ins, bos, 8192, True)
        return bos.toString("UTF-8")

    def _write_text(self, path: str, text: str) -> None:
        out = self._fs.create(self._jPath(path), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    # -- manifest ---------------------------------------------------------
    def _manifest_versions(self) -> list[int]:
        out = []
        for name in self.listdir(self.state_dir):
            m = _MANIFEST_V_RE.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def manifest_exists(self) -> bool:
        return bool(self._manifest_versions())

    def read_manifest(self) -> dict:
        """Highest version that parses as complete JSON. A partially
        written version (possible only for the head, and only on stores
        where create+close is not atomic) falls back to its
        predecessor — which described a consistent committed state.

        Fallback is ONLY for decode errors (truncated/torn content that
        was READ successfully). An IO/py4j error reading a version is
        re-raised after bounded retries: a transient HDFS/S3A blip must
        not masquerade as a torn write — silently regressing to an
        older committed_gen would let the next open's orphan sweep
        delete generation directories a NEWER manifest had committed,
        turning a read blip into permanent state loss."""
        versions = self._manifest_versions()
        if not versions:
            raise FileNotFoundError(f"no manifest versions in {self.state_dir}")
        last: Exception | None = None
        for v in reversed(versions):
            path = self.join(self.state_dir, f"manifest-v{v}.json")
            text = None
            io_err: Exception | None = None
            for _attempt in range(3):  # bounded retry for transient IO
                try:
                    text = self._read_text(path)
                    io_err = None
                    break
                except Exception as e:
                    io_err = e
            if io_err is not None:
                raise IOError(
                    f"reading {path} failed after retries — refusing to "
                    "fall back to an older manifest version on an IO "
                    "error (that would regress committed_gen and expose "
                    "newer committed generations to the orphan sweep): "
                    f"{io_err}"
                ) from io_err
            try:
                return json.loads(text)
            except (json.JSONDecodeError, UnicodeDecodeError) as e:
                last = e  # torn/partial content: predecessor is the
                continue  # last consistent committed state
        raise RuntimeError(
            f"every manifest version in {self.state_dir} is torn/undecodable: {last}"
        )

    def commit_manifest(self, m: dict) -> None:
        versions = self._manifest_versions()
        n = (versions[-1] + 1) if versions else 0
        final = self.join(self.state_dir, f"manifest-v{n}.json")
        tmp = final + ".tmp"
        self._write_text(tmp, json.dumps(m))
        if not self._fs.rename(self._jPath(tmp), self._jPath(final)):
            raise IOError(
                f"manifest commit failed: rename {tmp} -> {final} returned "
                "false (concurrent writer? read-only store?)"
            )
        # best-effort housekeeping: stray tmps + versions behind the tail.
        # Failures here never lose data — old versions are inert.
        for name in self.listdir(self.state_dir):
            if name.endswith(".json.tmp"):
                self._delete(self.join(self.state_dir, name))
        for v in versions[: max(0, len(versions) - _MANIFEST_KEEP_TAIL)]:
            self._delete(self.join(self.state_dir, f"manifest-v{v}.json"))

    def _delete(self, path: str) -> None:
        try:
            self._fs.delete(self._jPath(path), True)
        except Exception:
            pass

    # -- sidecar binary blobs ----------------------------------------------
    def write_bytes(self, path: str, data: bytes) -> None:
        out = self._fs.create(self._jPath(path), True)
        try:
            out.write(bytearray(data))
        finally:
            out.close()

    def read_bytes(self, path: str) -> bytes:
        ins = self._fs.open(self._jPath(path))
        bos = self._jvm.java.io.ByteArrayOutputStream()
        self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(ins, bos, 8192, True)
        return bytes(bos.toByteArray())

    # -- metadata ops -----------------------------------------------------
    def mkdirs(self) -> None:
        self._fs.mkdirs(self._jPath(self.state_dir))

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._jPath(path)))

    def is_dir(self, path: str) -> bool:
        p = self._jPath(path)
        return bool(self._fs.exists(p)) and bool(self._fs.getFileStatus(p).isDirectory())

    def listdir(self, path: str) -> list[str]:
        p = self._jPath(path)
        if not self._fs.exists(p):
            return []
        return [st.getPath().getName() for st in self._fs.listStatus(p)]

    def delete_recursive(self, path: str) -> None:
        self._delete(path)

    def join(self, *parts: str) -> str:
        return "/".join(x.rstrip("/") for x in parts[:-1]) + "/" + parts[-1]

    def table_location(self, sub: str) -> str:
        return f"{self.state_dir}/{sub}"
