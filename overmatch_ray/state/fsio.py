"""fsspec-style URI support for the sinks (S16 / VERDICT r4 #7).

Every sink path may be a plain local path (fast path: ``os`` +
atomic tmp-file rename) or an fsspec URI (``file://``, ``s3://``,
``gs://``, …) — the object-store upload story is one config value, not a
separate uploader. URI-backed writes go DIRECTLY to the final key (object
stores have no rename; a single-request PUT is atomic on S3): that is
safe here because every consumer of these files already tolerates torn
writes — a manifest that fails to parse is treated as incomplete and the
partition is rewritten on resume, and the partition parquet is written
BEFORE its manifest entry, so a torn part file can never be marked
complete.
"""

from __future__ import annotations

import os


def split(path: str):
    """(filesystem, plain_path) — filesystem is None for local paths."""
    if "://" in str(path):
        import fsspec

        fs, p = fsspec.core.url_to_fs(path)
        return fs, p
    return None, path


def makedirs(path: str) -> None:
    fs, p = split(path)
    if fs is None:
        os.makedirs(p, exist_ok=True)
    else:
        fs.makedirs(p, exist_ok=True)


def exists(path: str) -> bool:
    fs, p = split(path)
    return os.path.exists(p) if fs is None else fs.exists(p)


def isdir(path: str) -> bool:
    fs, p = split(path)
    return os.path.isdir(p) if fs is None else fs.isdir(p)


def listdir(path: str) -> "list[str]":
    """Basenames of the directory's entries (empty if absent)."""
    fs, p = split(path)
    if fs is None:
        return os.listdir(p) if os.path.isdir(p) else []
    if not fs.isdir(p):
        return []
    return [e.rstrip("/").rsplit("/", 1)[-1] for e in fs.ls(p, detail=False)]


def open_read(path: str, mode: str = "rb"):
    fs, p = split(path)
    return open(p, mode) if fs is None else fs.open(p, mode)


def read_json(path: str):
    import json

    with open_read(path, "r") as f:
        return json.load(f)


def write_bytes_atomic(path: str, data: bytes) -> None:
    """Local: tmp file + os.replace (POSIX-atomic). URI: direct write
    (PUT-atomic on object stores; torn-write-tolerant consumers)."""
    import uuid

    fs, p = split(path)
    if fs is None:
        tmp = p + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, p)
    else:
        with fs.open(p, "wb") as f:
            f.write(data)


def open_write_atomic(path: str):
    """Context manager yielding a writable binary stream. Local: tmp file
    + os.replace on clean exit. URI: direct fs.open (see module note)."""
    import uuid
    from contextlib import contextmanager

    fs, p = split(path)

    @contextmanager
    def _cm():
        if fs is None:
            tmp = p + f".tmp-{uuid.uuid4().hex[:8]}"
            f = open(tmp, "wb")
            try:
                yield f
            except BaseException:
                f.close()
                if os.path.exists(tmp):
                    os.remove(tmp)
                raise
            f.close()
            os.replace(tmp, p)
        else:
            with fs.open(p, "wb") as f:
                yield f

    return _cm()


def write_json_atomic(path: str, obj) -> None:
    import json

    write_bytes_atomic(path, json.dumps(obj).encode())


def ray_path(path: str) -> str:
    """Path form consumable by ray.data readers: ``file://`` URIs collapse
    to plain local paths (pyarrow's path resolver rejects them when an
    explicit schema rides along); every other scheme passes through —
    ray.data reads s3:// / gs:// natively."""
    p = str(path)
    return p[len("file://"):] if p.startswith("file://") else p


def join(base: str, *parts: str) -> str:
    """Path join that keeps URI schemes intact."""
    if "://" in str(base):
        return "/".join([str(base).rstrip("/")] + [str(x) for x in parts])
    return os.path.join(base, *parts)
