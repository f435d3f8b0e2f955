"""Stage checkpoints with lineage manifests (north_rule: resumable builds,
per-partition lineage + metrics).

Each pipeline stage that persists a dataset does so through
:class:`StageCheckpoint`: the Parquet files land under ``<dir>/``, and a
``_MANIFEST.json`` is written *after* the write completes (write-then-rename
for atomicity).  On a re-run, a stage whose manifest exists is skipped and
its output is re-read — the reference's resume story
(``makeindex.py:296-319``: header ``is_complete`` + high-water mark)
re-expressed at the dataset level.  An interrupted stage leaves no manifest;
resume wipes the partial files and recomputes (idempotent).

The manifest records per-file lineage: path, rows, bytes — plus stage wall
time and arbitrary stats.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow.parquet as pq
import ray.data

MANIFEST = "_MANIFEST.json"


class CheckpointValidationError(RuntimeError):
    """A stage write left unreadable Parquet files (observed in practice:
    a task retried after a worker crash re-opened the SAME output filename
    on shared local storage and truncated the completed file the first
    attempt had already closed — the sink reports success, the footer is
    gone).  Raised only after the write has been retried."""


def invalid_parquet_files(path: str) -> list[str]:
    """Relative paths of ``*.parquet`` files under ``path`` whose footer
    does not parse (truncated / partial / zero-byte)."""
    bad = []
    for root_, _, names in os.walk(path):
        for n in sorted(names):
            if not n.endswith(".parquet"):
                continue
            p = os.path.join(root_, n)
            try:
                pq.ParquetFile(p).metadata  # noqa: B018 — footer parse
            except Exception:  # noqa: BLE001 — any unreadable footer
                bad.append(os.path.relpath(p, path))
    return bad


class StageCheckpoint:
    def __init__(self, root: str, name: str) -> None:
        self.dir = os.path.join(root, name)
        self.name = name

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.dir, MANIFEST)

    def is_complete(self) -> bool:
        return os.path.exists(self.manifest_path)

    def load_manifest(self) -> dict:
        with open(self.manifest_path) as f:
            return json.load(f)

    def read(self) -> ray.data.Dataset:
        return ray.data.read_parquet(self.dir)

    def write(
        self, ds: ray.data.Dataset, _write_attempts: int = 2, **stats
    ) -> ray.data.Dataset:
        """Write ``ds`` (wiping any partial previous attempt), then commit
        the manifest.  Returns a fresh dataset reading the checkpoint (so
        downstream stages consume Parquet, not a re-executed lineage).

        Every staged file's footer is validated before the rename: a Ray
        task retry racing its crashed predecessor on the same output path
        can truncate a completed file while the sink still reports success
        (seen once on a 7.68M-page build).  An invalid staging is wiped and
        the write re-executed (``ds`` is lazy lineage, so this re-runs the
        stage); after ``_write_attempts`` failures the error surfaces as
        :class:`CheckpointValidationError` naming the files."""
        # write to a side dir first: ``ds`` may lazily read the current
        # checkpoint (e.g. rewriting docs with link-graph scores)
        staging = self.dir + ".staging"
        t0 = time.perf_counter()
        for attempt in range(_write_attempts):
            if os.path.exists(staging):
                shutil.rmtree(staging)
            os.makedirs(staging, exist_ok=True)
            ds.write_parquet(staging)
            bad = invalid_parquet_files(staging)
            if not bad:
                break
            if attempt + 1 >= _write_attempts:
                raise CheckpointValidationError(
                    f"stage '{self.name}': unreadable Parquet after "
                    f"{_write_attempts} write attempts: {bad[:5]}"
                    + ("..." if len(bad) > 5 else "")
                )
            print(
                f"[checkpoint] stage '{self.name}': {len(bad)} unreadable "
                f"file(s) in staging ({bad[:3]}...); re-executing the write",
                flush=True,
            )
        wall = time.perf_counter() - t0
        if os.path.exists(self.dir):
            shutil.rmtree(self.dir)
        os.rename(staging, self.dir)
        self.commit(wall_s=wall, **stats)
        return self.read()

    def commit(self, **stats) -> None:
        """Write the manifest from whatever Parquet files are present."""
        files = []
        for root_, _, names in os.walk(self.dir):
            for n in sorted(names):
                if not n.endswith(".parquet"):
                    continue
                p = os.path.join(root_, n)
                meta = pq.ParquetFile(p).metadata
                files.append(
                    {
                        "path": os.path.relpath(p, self.dir),
                        "rows": meta.num_rows,
                        "bytes": os.path.getsize(p),
                    }
                )
        manifest = {
            "stage": self.name,
            "completed_at": time.time(),
            "files": files,
            "total_rows": sum(f["rows"] for f in files),
            "total_bytes": sum(f["bytes"] for f in files),
            **stats,
        }
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self.manifest_path)
