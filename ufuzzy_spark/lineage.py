"""Stage checkpointing with lineage + resume.

Every materialized stage writes:
    <dir>/<stage>/           parquet (per-partition files + _SUCCESS)
    <dir>/<stage>.lineage.json   {stage, config_hash, rows, n_files,
                                  wall_ms, ts}
    <dir>/lineage.jsonl          append-only run log (the lineage table)

Resume rule (the prefixCache idea at pipeline scale,
demos/compare.html:562-601): a stage is reused iff its _SUCCESS marker
exists AND its recorded config_hash matches the current run's — config
drift forces recompute, which is what makes "recall at the same
shingle/signature config" machine-checkable (SURVEY.md §1 schema
system).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class StageRunner:
    def __init__(
        self,
        spark: SparkSession,
        checkpoint_dir: str | None,
        config_hash: str,
        resume: bool = True,
    ):
        self.spark = spark
        self.dir = Path(checkpoint_dir) if checkpoint_dir else None
        self.config_hash = config_hash
        self.resume = resume
        self.metrics: dict[str, dict] = {}
        if self.dir:
            self.dir.mkdir(parents=True, exist_ok=True)

    def _stage_meta(self, name: str) -> dict | None:
        meta_p = self.dir / f"{name}.lineage.json"
        if not meta_p.exists():
            return None
        try:
            return json.loads(meta_p.read_text())
        except (json.JSONDecodeError, OSError):
            return None

    def materialize(self, name: str, df_fn) -> DataFrame:
        """Compute-or-reuse a stage; records lineage either way."""
        if self.dir is None:
            df = df_fn()
            return df

        path = self.dir / name
        meta = self._stage_meta(name)
        if (
            self.resume
            and meta is not None
            and meta.get("config_hash") == self.config_hash
            and (path / "_SUCCESS").exists()
        ):
            self.metrics[name] = {**meta, "resumed": True}
            self._log({**meta, "resumed": True, "ts": time.time()})
            return self.spark.read.parquet(str(path))

        t0 = time.time()
        df = df_fn()
        df.write.mode("overwrite").parquet(str(path))
        out = self.spark.read.parquet(str(path))
        rows = out.count()
        meta = {
            "stage": name,
            "config_hash": self.config_hash,
            "rows": rows,
            "n_files": len(list(path.glob("part-*"))),
            "wall_ms": int((time.time() - t0) * 1000),
            "ts": time.time(),
            "resumed": False,
        }
        (self.dir / f"{name}.lineage.json").write_text(json.dumps(meta))
        self._log(meta)
        self.metrics[name] = meta
        return out

    def _log(self, rec: dict) -> None:
        with open(self.dir / "lineage.jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")
