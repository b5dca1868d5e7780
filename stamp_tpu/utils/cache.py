"""Download cache and code-hash artifact versioning.

Parity with reference src/stamp/utils/cache.py:16-55: sha256-verified weight
downloads into ``~/.cache/stamp`` (same directory, so caches are shared with
the reference install) and a directory-level code hash used to version output
artifact directories.
"""

import hashlib
import os
import shutil
import urllib.request
from functools import cache
from pathlib import Path
from typing import Final

STAMP_CACHE_DIR: Final[Path] = (
    Path(os.environ.get("XDG_CACHE_HOME") or (Path.home() / ".cache")) / "stamp"
)


def download_file(*, url: str, file_name: str, sha256sum: str) -> Path:
    """Downloads a file, or loads it from cache if present.

    The checksum is only verified on the initial download.
    """
    STAMP_CACHE_DIR.mkdir(exist_ok=True, parents=True)
    outfile_path = STAMP_CACHE_DIR / file_name
    if outfile_path.is_file():
        return outfile_path

    filename, _ = urllib.request.urlretrieve(url)
    with open(filename, "rb") as weight_file:
        digest = hashlib.file_digest(weight_file, "sha256")
    if digest.hexdigest() != sha256sum:
        raise RuntimeError("hash of downloaded file did not match")
    shutil.move(filename, outfile_path)
    return outfile_path


def file_digest(file: str | Path) -> str:
    with open(file, "rb") as fp:
        return hashlib.file_digest(fp, "sha256").hexdigest()


@cache
def get_processing_code_hash(file_path: Path) -> str:
    """Hash over all ``*.py`` sources next to ``file_path``.

    Used to tag output artifact directories so features extracted with
    different code versions are distinguishable (reference
    src/stamp/utils/cache.py:42-55).
    """
    hasher = hashlib.sha256()
    for py_file in sorted(file_path.parent.glob("*.py")):
        with open(py_file, "rb") as fp:
            hasher.update(hashlib.file_digest(fp, "sha256").digest())
    return hasher.hexdigest()
