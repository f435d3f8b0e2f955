"""Mid-pipeline resume: a build interrupted after the extract checkpoint
must reuse it and produce an identical index (north_rule: resumable from
per-partition checkpoints with lineage)."""

import json
import os
import shutil

import pyarrow.parquet as pq
import ray.data

from searchengine_ray.pipelines.build import build_index
from searchengine_ray.sources.pages import synthesize_pages
from searchengine_ray.stages.postings import decode_segment_row


def _postings_map(segments_dir):
    out = {}
    for row in pq.read_table(segments_dir).to_pylist():
        d, t, i = decode_segment_row(row)
        out[row["term"]] = list(zip(d.tolist(), t.tolist(), i.tolist()))
    return out


def test_resume_after_extract(ray_session, tmp_path):
    table = synthesize_pages(120)
    ds = ray.data.from_arrow(table).repartition(4)

    full = build_index(ds, str(tmp_path / "full"))

    # simulate a crash right after the extract checkpoint committed:
    # copy only the extracted stage, then resume
    resumed_dir = tmp_path / "resumed"
    resumed_dir.mkdir()
    shutil.copytree(tmp_path / "full" / "extracted", resumed_dir / "extracted")
    r2 = build_index(ds, str(resumed_dir))

    assert r2.num_docs == full.num_docs
    assert r2.num_terms == full.num_terms
    assert _postings_map(r2.segments_dir) == _postings_map(full.segments_dir)
    d1 = pq.read_table(full.docs_dir).sort_by("docid")
    d2 = pq.read_table(r2.docs_dir).sort_by("docid")
    assert d1["url"].to_pylist() == d2["url"].to_pylist()


def test_lineage_manifests_recorded(ray_session, tmp_path):
    table = synthesize_pages(80)
    result = build_index(
        ray.data.from_arrow(table).repartition(2), str(tmp_path / "idx")
    )
    for stage in ["extracted", "docs", "edges", "segments", "texts"]:
        mpath = os.path.join(result.out_dir, stage, "_MANIFEST.json")
        assert os.path.exists(mpath), stage
        m = json.load(open(mpath))
        assert m["stage"] == stage
        assert m["files"], stage
        for f in m["files"]:
            assert f["rows"] >= 0 and f["bytes"] > 0
        assert m["total_rows"] == sum(f["rows"] for f in m["files"])


def test_interrupted_stage_recomputes(ray_session, tmp_path):
    """A stage directory without its manifest (simulated crash mid-write)
    is wiped and recomputed, not trusted."""
    table = synthesize_pages(80)
    ds = ray.data.from_arrow(table).repartition(2)
    out = tmp_path / "idx2"
    full = build_index(ds, str(out))
    # corrupt: drop the docs manifest and a data file, remove global manifest
    os.remove(out / "docs" / "_MANIFEST.json")
    for f in list((out / "docs").iterdir())[:1]:
        f.unlink()
    os.remove(out / "manifest.json")
    r2 = build_index(ds, str(out))
    assert r2.num_docs == full.num_docs
    got = pq.read_table(r2.docs_dir)
    assert got.num_rows == full.num_docs


def test_invalid_parquet_detection(tmp_path):
    """Footer validation catches the truncated-file failure mode (a task
    retry truncating a completed file on shared local storage)."""
    import pyarrow as pa

    from searchengine_ray.state.checkpoint import invalid_parquet_files

    d = tmp_path / "stage"
    d.mkdir()
    pq.write_table(pa.table({"a": [1, 2, 3]}), str(d / "good.parquet"))
    # truncate a real file mid-body: footer gone
    full = (d / "good.parquet").read_bytes()
    (d / "trunc.parquet").write_bytes(full[: len(full) // 2])
    (d / "empty.parquet").write_bytes(b"")
    (d / "notes.txt").write_text("ignored")
    assert invalid_parquet_files(str(d)) == ["empty.parquet", "trunc.parquet"]


def test_checkpoint_write_retries_then_raises(tmp_path):
    """StageCheckpoint.write re-executes the stage when staging validation
    fails, and surfaces CheckpointValidationError when every attempt does."""
    import pyarrow as pa
    import pytest

    from searchengine_ray.state import checkpoint as ckpt

    class FlakyDs:
        """write_parquet leaves a truncated file for the first n calls."""

        def __init__(self, bad_times):
            self.bad_times = bad_times
            self.calls = 0

        def write_parquet(self, path):
            self.calls += 1
            pq.write_table(pa.table({"a": [1, 2]}), os.path.join(path, "ok.parquet"))
            if self.calls <= self.bad_times:
                with open(os.path.join(path, "bad.parquet"), "wb") as f:
                    f.write(b"PAR1garbage")

    ck = ckpt.StageCheckpoint(str(tmp_path / "a"), "docs")
    flaky = FlakyDs(bad_times=1)
    ck.write(flaky)  # first attempt invalid, retry clean
    assert flaky.calls == 2
    assert ck.is_complete()
    assert ck.load_manifest()["total_rows"] == 2
    assert not os.path.exists(ck.dir + ".staging")

    ck2 = ckpt.StageCheckpoint(str(tmp_path / "b"), "docs")
    with pytest.raises(ckpt.CheckpointValidationError, match="bad.parquet"):
        ck2.write(FlakyDs(bad_times=99))
    assert not ck2.is_complete()
