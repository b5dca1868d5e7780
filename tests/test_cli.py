"""CLI surface tests (subprocess through ``python -m stamp_tpu``)."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(*args, cwd=REPO):
    return subprocess.run(
        [sys.executable, "-m", "stamp_tpu", *args],
        cwd=cwd,
        capture_output=True,
        text=True,
        timeout=120,
    )


def test_cli_help():
    res = _run("--help")
    assert res.returncode == 0
    for cmd in [
        "init",
        "preprocess",
        "encode_slides",
        "encode_patients",
        "train",
        "crossval",
        "deploy",
        "statistics",
        "config",
        "heatmaps",
    ]:
        assert cmd in res.stdout


def test_cli_no_command_exits_nonzero():
    res = _run()
    assert res.returncode == 1
    assert "usage" in res.stdout.lower()


def test_cli_init_and_config_roundtrip(tmp_path):
    cfg = tmp_path / "config.yaml"
    res = _run("-c", str(cfg), "init")
    assert res.returncode == 0
    assert cfg.exists()

    # second init refuses to overwrite
    res = _run("-c", str(cfg), "init")
    assert "Refusing to overwrite" in res.stderr

    res = _run("-c", str(cfg), "config")
    assert res.returncode == 0
    assert "advanced_config" in res.stdout


def test_cli_rejects_unknown_config_key(tmp_path):
    cfg = tmp_path / "config.yaml"
    cfg.write_text("crossval:\n  bogus_key: 1\n")
    res = _run("-c", str(cfg), "crossval")
    assert res.returncode == 1
    assert "bogus_key" in res.stderr
