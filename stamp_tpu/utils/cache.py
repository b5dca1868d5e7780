"""Weight-download cache and artifact code-hash versioning.

Behavioral parity with reference src/stamp/utils/cache.py:16-55, sharing the
same ``~/.cache/stamp`` directory so pre-seeded weight files work for both
installs.  Two concerns live here:

* a sha256-verified download cache for published model weights — verified
  once at download time, trusted as-is afterwards (weight files run to
  gigabytes; re-hashing them on every run would dominate startup);
* a deterministic hash over the ``*.py`` sources in a module's directory,
  embedded into output artifact directory names so features produced by
  different code versions never silently mix.
"""

import hashlib
import os
import shutil
import urllib.request
from functools import cache
from pathlib import Path


def _cache_root() -> Path:
    base = os.environ.get("XDG_CACHE_HOME")
    return (Path(base) if base else Path.home() / ".cache") / "stamp"


# created lazily by the functions that write into it, so importing this
# module never touches the filesystem
STAMP_CACHE_DIR: Path = _cache_root()


def _sha256(path: Path) -> "hashlib._Hash":
    with path.open("rb") as fp:
        return hashlib.file_digest(fp, "sha256")


def file_digest(file: str | Path) -> str:
    """Hex sha256 of a file's contents (streamed, not slurped)."""
    return _sha256(Path(file)).hexdigest()


def download_file(*, url: str, file_name: str, sha256sum: str) -> Path:
    """Fetch ``url`` into the stamp cache, verifying its checksum once.

    A file already present under ``file_name`` is returned as-is without
    re-verification.
    """
    target = STAMP_CACHE_DIR / file_name
    if target.is_file():
        return target

    STAMP_CACHE_DIR.mkdir(parents=True, exist_ok=True)
    tmp_path, _headers = urllib.request.urlretrieve(url)
    actual = _sha256(Path(tmp_path)).hexdigest()
    if actual != sha256sum:
        raise RuntimeError(
            f"checksum mismatch for {file_name}: expected {sha256sum}, "
            f"got {actual}"
        )
    shutil.move(tmp_path, target)
    return target


@cache
def get_processing_code_hash(file_path: Path) -> str:
    """Combined hash of every ``*.py`` source sitting next to ``file_path``.

    Output artifact directories carry the first characters of this value
    (e.g. ``uni2-<hash8>/``), making features extracted by different code
    versions distinguishable after the fact.
    """
    combined = hashlib.sha256()
    for source in sorted(file_path.parent.glob("*.py")):
        combined.update(_sha256(source).digest())
    return combined.hexdigest()
