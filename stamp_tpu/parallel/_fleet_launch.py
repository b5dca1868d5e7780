"""Shared local-fleet process launcher for the dry-run harnesses.

``_dist_dryrun`` (training fleet) and ``_extract_fleet_dryrun`` (extraction
fleet) both spawn N OS processes joined through ``jax.distributed`` on a
free localhost port; this module owns the common mechanics — port grab,
environment scrubbing, worker spawn, output collection, and the per-worker
OK-sentinel check."""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from collections.abc import Iterable, Sequence
from pathlib import Path


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def launch_fleet(
    worker_module: str,
    worker_args: Sequence[str],
    *,
    n_processes: int,
    timeout: float,
    ok_sentinel: str,
    expect_ok: Iterable[int] | None = None,
    env_extra: dict[str, str] | None = None,
    env_drop: Iterable[str] = (),
) -> str:
    """Spawn ``n_processes`` workers of ``python -m worker_module <pid>
    <nproc> <port> *worker_args``; return their combined output.

    Raises if any worker exits nonzero or if a pid in ``expect_ok``
    (default: all) is missing ``"{ok_sentinel} pid={pid}"`` in the output.
    """
    port = free_port()
    repo_root = Path(__file__).resolve().parents[2]
    env = dict(os.environ)
    for k in (
        "STAMP_COORDINATOR_ADDRESS",
        "STAMP_NUM_PROCESSES",
        "STAMP_PROCESS_ID",
        *env_drop,
    ):
        env.pop(k, None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [str(repo_root), env.get("PYTHONPATH")] if p
    )
    env.update(env_extra or {})

    procs = [
        subprocess.Popen(
            [
                sys.executable,
                "-m",
                worker_module,
                str(pid),
                str(n_processes),
                str(port),
                *worker_args,
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=repo_root,
        )
        for pid in range(n_processes)
    ]
    outputs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outputs.append(out)
            if p.returncode != 0:
                raise RuntimeError(
                    f"fleet worker failed (rc={p.returncode}):\n{out}"
                )
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    combined = "\n".join(outputs)
    for pid in expect_ok if expect_ok is not None else range(n_processes):
        if f"{ok_sentinel} pid={pid}" not in combined:
            raise RuntimeError(
                f"worker {pid} missing OK sentinel in output:\n{combined}"
            )
    return combined
